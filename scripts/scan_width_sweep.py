"""Discovery pass for the scan-width plan-smell dimension (r16 depth,
R17_PLAN item 3): for every registered query, walk the pre-AQE physical
plan (`sparkPlan` — FileSourceScanExec nodes are not yet wrapped by
AdaptiveSparkPlanExec there) and report every scan over one of the ten
base test tables whose requiredSchema is the table's FULL width. Column
pruning that never reached the scan is invisible in row counts and only
hurts at 100 TB — a 16-column lineitem scan behind a 4-column
aggregation reads 4x the bytes it needs.

Usage: python scripts/scan_width_sweep.py [sf_dir]
Prints one line per full-width base-table scan: op, table, width.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.session import get_spark
from xml_to_parquet_spark.tables import TABLE_NAMES


def file_scans(jplan):
    """[(root_path, [field, ...])] for every FileSourceScanExec under
    ``jplan`` (pre-AQE tree), including subquery/broadcast subtrees."""
    out = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        cname = node.getClass().getSimpleName()
        if cname == "FileSourceScanExec":
            fields = [
                node.requiredSchema().fields()[i].name()
                for i in range(node.requiredSchema().size())
            ]
            loc = node.relation().location().rootPaths().apply(0).toString()
            out.append((loc, fields))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                stack.append(sq.apply(i))
        except Exception:
            pass
    return out


def base_table_of(path: str) -> str | None:
    for t in TABLE_NAMES:
        if path.rstrip("/").endswith(f"/{t}.parquet") or path.rstrip("/").endswith(
            f"/{t}"
        ):
            return t
    return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    widths = {}
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            widths[t] = len(spark.read.parquet(p).schema)
    print(f"table widths: {widths}", file=sys.stderr)

    findings = []
    errors = []
    for name, qd in sorted(load_all().items()):
        try:
            df = qd.fn(spark, sf_dir)
            scans = file_scans(df._jdf.queryExecution().sparkPlan())
        except Exception as e:  # noqa: BLE001 — discovery: report, keep going
            errors.append(f"{name}: {e!r:.160}")
            continue
        for loc, fields in scans:
            t = base_table_of(loc)
            if t and widths.get(t) and len(fields) >= widths[t]:
                findings.append((name, t, len(fields), widths[t]))
    for name, t, got, full in findings:
        print(f"FULLWIDTH {name} {t} read={got} full={full}")
    print(f"-- {len(findings)} full-width base-table scans", file=sys.stderr)
    if errors:
        print("-- errors:", file=sys.stderr)
        for e in errors:
            print("   " + e, file=sys.stderr)


if __name__ == "__main__":
    main()
