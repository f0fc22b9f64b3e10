"""Ad-hoc interleaved profiler for specific registry ops at one SF.

Usage: python scripts/profile_ops.py <sf_dir> op1 op2 ... [--reps N]
Warm-up pass per op, then REPS interleaved timed passes (noop sink),
printing per-op medians — the bench protocol without the full entry list.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.registry import load_all


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir, ops = args[0], args[1:]
    spark = get_spark()
    reg = load_all()
    for name in ops:
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times = {name: [] for name in ops}
    for _ in range(reps):
        for name in ops:
            t0 = time.monotonic()
            reg[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(time.monotonic() - t0)
    out = {
        name: {
            "median": round(statistics.median(v), 3),
            "reps": [round(x, 3) for x in v],
        }
        for name, v in times.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
