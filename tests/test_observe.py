"""Observation metrics: per-job counters collected DURING execution (no
second pass) — how a production pipeline exports row-count / quality
metrics without re-scanning 100 TB."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from xml_to_parquet_spark.tables import table


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    obs = Observation("q1_metrics")
    df = (
        li.filter(F.col("l_quantity") > 0)
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")).alias(
                "price_cents"
            ),
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = {r["l_returnflag"]: r["n"] for r in df.collect()}
    metrics = obs.get
    assert metrics["rows_in"] == sum(out.values())
    # cross-check the observed sum against a direct aggregation
    direct = li.filter(F.col("l_quantity") > 0).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint"))
    ).collect()[0][0]
    assert metrics["price_cents"] == direct
