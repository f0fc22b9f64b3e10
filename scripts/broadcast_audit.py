"""Discovery pass for the data-sized-broadcast plan smell (r16): an
EXPLICIT F.broadcast() hint on a fact-table side with no
aggregation/limit reducing it forces a data-sized broadcast at any
scale. Catalyst auto-broadcasts are NOT flagged - they are
statistics-driven and re-plan at scale. Detection walks the OPTIMIZED
LOGICAL plan, where the hint lives on the Join node (the physical
BroadcastExchange only exists in the executed plan, and the join-node
buildSide in sparkPlan conflates hint- and stats-chosen broadcasts).

Usage: python scripts/broadcast_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.session import get_spark
from xml_to_parquet_spark.tables import BROADCAST_TABLES, TABLE_NAMES

FACT_TABLES = [t for t in TABLE_NAMES if t not in BROADCAST_TABLES]
REDUCERS = {"Aggregate", "GlobalLimit", "LocalLimit"}


def unreduced_fact_rels(node, reduced=False):
    cname = node.getClass().getSimpleName()
    if cname in REDUCERS:
        reduced = True
    hits = []
    if cname == "LogicalRelation" and not reduced:
        try:
            loc = node.relation().location().rootPaths().apply(0).toString()
        except Exception:
            loc = ""
        path = loc.removeprefix("file:").rstrip("/")
        for t in FACT_TABLES:
            if path.endswith(f"/{t}.parquet"):
                hits.append(t)
    ch = node.children()
    for i in range(ch.size()):
        hits += unreduced_fact_rels(ch.apply(i), reduced)
    return hits


def hinted_broadcast_facts(jqe):
    hits = []
    stack = [jqe.optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Join":
            hint = node.hint().toString()
            ch = node.children()
            if "leftHint=(strategy=broadcast" in hint:
                hits += unreduced_fact_rels(ch.apply(0))
            if "rightHint=(strategy=broadcast" in hint:
                hits += unreduced_fact_rels(ch.apply(1))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        try:  # scalar/EXISTS subquery plans can carry hints too
            sq = node.subqueries()
            for i in range(sq.size()):
                stack.append(sq.apply(i))
        except Exception:  # noqa: BLE001
            pass
    return hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    findings, errors = [], []
    for name, qd in sorted(load_all().items()):
        try:
            jqe = qd.fn(spark, sf_dir)._jdf.queryExecution()
            for t in hinted_broadcast_facts(jqe):
                findings.append((name, t))
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: {e!r:.160}")
    for name, t in findings:
        print(f"HINTED_DATA_SIZED_BROADCAST {name} {t}")
    print(f"-- {len(findings)} hinted unreduced fact broadcasts", file=sys.stderr)
    for e in errors:
        print("   " + e, file=sys.stderr)


if __name__ == "__main__":
    main()
