"""Dump .explain("formatted") of bench queries to plans/r<N>/<name>_<tag>.txt.

Usage: python scripts/dump_plans.py <round> <tag> [query ...]

<tag> is "before" or "after"; with no query list, every BENCH_QUERIES entry
is dumped. Building a DataFrame for the iterative operators executes their
per-round localCheckpoints, so do not run this concurrently with a bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES
from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.registry import load_all


def main() -> None:
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or BENCH_QUERIES
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    reg = load_all()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", f"r{rnd}")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = reg[name].fn(spark, sf)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure in the file
            txt = f"plan unavailable: {type(e).__name__}: {e}\n"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
