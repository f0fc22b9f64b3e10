"""Stage-level profile of one registry op: run it (noop sink) in a session
with the UI enabled, then dump per-stage metrics from the UI REST API.

Usage: python scripts/profile_stages.py <sf_dir> <op> [--reps N] [--cpus N]

Prints one line per stage (completed runs only), sorted by executorRunTime,
with shuffle read/write bytes and the first line of the stage's name — the
attribution the Spark UI would give, without a browser (guide §7.1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark.registry import load_all


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sf_dir")
    p.add_argument("op")
    p.add_argument("--reps", type=int, default=1)
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from xml_to_parquet_spark.session import get_spark

    # same confs as get_spark but with the UI on for the REST API
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    builder_spark = get_spark("profile-stages")
    builder_spark.stop()
    spark = (
        SparkSession.builder.appName("profile-stages-ui")
        .master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    reg = load_all()
    fn = reg[args.op].fn
    # warm pass (untimed, not attributed)
    fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    with urllib.request.urlopen(f"{base}/stages") as r:
        warm_ids = {s["stageId"] for s in json.load(r)}
    t0 = time.perf_counter()
    for _ in range(args.reps):
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        stages = [s for s in json.load(r) if s["stageId"] not in warm_ids]
    stages.sort(key=lambda s: -s["executorRunTime"])
    total_run = sum(s["executorRunTime"] for s in stages)
    print(f"op={args.op} reps={args.reps} wall={wall:.3f}s "
          f"stages={len(stages)} sum_executorRunTime={total_run}ms")
    for s in stages[:25]:
        nm = s["name"].splitlines()[0][:80]
        print(
            f"  run={s['executorRunTime']:>7}ms cpu={s['executorCpuTime']//1_000_000:>7}ms "
            f"tasks={s['numCompleteTasks']:>4} "
            f"shR={s['shuffleReadBytes']:>10} shW={s['shuffleWriteBytes']:>10} "
            f"in={s['inputBytes']:>10} {nm}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
