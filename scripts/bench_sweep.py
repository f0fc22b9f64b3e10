"""Time EVERY registered query at a scale factor (not just the bench
subset) and print the slowest-first table — the outlier hunt behind
BENCH_r{N}: a query can be correctness-green yet carry a plan that will
not survive a 100× scale-up; wall-clock at sf0.1 is the cheapest smoke
signal for that.

Usage: python scripts/bench_sweep.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.registry import load_all


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("bench_sweep")
    registry = load_all()
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, qd in registry.items():
        try:
            # warm codegen at the smallest SF
            qd.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}  {name}")
    for name, err in errors.items():
        print(f"   ERROR  {name}: {err.splitlines()[0][:160]}")
    print(
        json.dumps(
            {
                "total": round(sum(times.values()), 3),
                "n": len(times),
                "errors": len(errors),
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
