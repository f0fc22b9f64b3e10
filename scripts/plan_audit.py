"""Full-registry duplicated-subtree audit (r16-opt method): for every
registered query, build the DataFrame at the given SF and count FileScan
and Exchange nodes in the formatted physical plan, plus per-base-table
scan counts. A table scanned N>1 times inside one query is either a
legitimate star/correlated shape or a lazy subtree fanning into N
consumers — the optimization worklist generator.

Usage: python scripts/plan_audit.py [sf_dir] [op ...]
Prints one tab-separated line per op: name, n_filescan, n_exchange,
per-table counts for tables scanned more than once.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.registry import load_all


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    reg = load_all()
    for name in sorted(reg):
        if only and name not in only:
            continue
        try:
            df = reg[name].fn(spark, sf)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"{name}\tERR\t{type(e).__name__}: {e}")
            continue
        scans = txt.count("Scan parquet")
        exch = len(re.findall(r"\bExchange\b", txt))
        tables = re.findall(r"Scan parquet \[?([A-Za-z0-9_./-]*)", txt)
        locs = re.findall(r"Location: InMemoryFileIndex[^\n]*\[([^\]]*)", txt)
        per = {}
        for loc in locs:
            t = os.path.basename(loc.rstrip("/").split(",")[0])
            per[t] = per.get(t, 0) + 1
        dup = {t: c for t, c in sorted(per.items()) if c > 1}
        print(f"{name}\t{scans}\t{exch}\t{dup if dup else ''}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
