"""Ad-hoc interleaved profiler for specific registry ops at one SF.

Usage: python scripts/profile_ops.py <sf_dir> op1 op2 ... [--reps N]
Warm-up pass per op, then REPS interleaved timed passes (noop sink),
printing per-op medians — the bench protocol without the full entry list.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.registry import load_all


def parse_args(argv=None):
    # argparse handles both --reps=N and --reps N (ADVICE r11: the manual
    # split('=') parser crashed on the space-separated form and swallowed
    # the bare N as an op name)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("sf_dir")
    parser.add_argument("ops", nargs="+")
    parser.add_argument("--reps", type=int, default=3)
    return parser.parse_args(argv)


def main() -> None:
    args = parse_args()
    sf_dir, ops, reps = args.sf_dir, args.ops, args.reps
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
