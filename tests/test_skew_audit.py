"""Forced-skew audit (r16, second entry in the fresh hunt class opened
after the representation-boundary drain): the skew ops' DuckDB oracles
prove the REWRITES are semantically neutral, but nothing yet proved the
MECHANISMS — that salting actually spreads a hot key across reducers,
and that AQE's skew-join split actually fires on a skewed sort-merge
join. Both are pinned here on a deliberately skewed synthetic (one key
holding ~95% of rows), because at 100 TB the mitigation IS the
operator: a salted join whose salt doesn't spread, or an AQE config
that never triggers, melts one executor while 999 idle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.scale_patterns import SALT_BUCKETS

HOT_ROWS = 20_000
COLD_KEYS = 50
COLD_ROWS = 10


def _skewed(spark):
    hot = spark.range(HOT_ROWS).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = (
        spark.range(COLD_KEYS * COLD_ROWS)
        .select(
            (F.col("id") % COLD_KEYS + 1).cast("long").alias("k"),
            F.col("id").alias("v"),
        )
    )
    return hot.unionAll(cold)


def _max_partition_rows(df, n_parts, cols):
    counts = (
        df.repartition(n_parts, *cols)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    return max(r["count"] for r in counts)


def test_salting_spreads_the_hot_key(spark):
    """Hash-partitioning the skewed input by its key alone leaves one
    reducer holding all HOT_ROWS; adding the deterministic salt must cut
    the largest reducer by ~SALT_BUCKETS. The salt column is computed
    exactly as join_skew_salted's probe side computes it."""
    df = _skewed(spark).withColumn(
        "salt", (F.col("v") % SALT_BUCKETS).cast("int")
    )
    unsalted_max = _max_partition_rows(df, 16, ["k"])
    salted_max = _max_partition_rows(df, 16, ["k", "salt"])
    assert unsalted_max >= HOT_ROWS  # the hot key melts one reducer
    # each (hot key, salt) cell holds HOT_ROWS/SALT_BUCKETS; allow two
    # cells hashing to one partition plus cold stragglers
    assert salted_max <= 2 * (HOT_ROWS // SALT_BUCKETS) + COLD_KEYS * COLD_ROWS
    assert salted_max < unsalted_max / 2


def test_aqe_skew_join_split_fires(spark):
    """join_skew_aqe's device: AQE must detect and SPLIT the skewed
    partition of a sort-merge join. Thresholds are scoped down so the
    ~20k-row hot partition qualifies at test scale; the executed
    adaptive plan must carry the skew=true marker on the join."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # the 20k-row hot partition compresses to a few KB of map
        # output, so the thresholds must sit BELOW that to qualify it
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        left = _skewed(spark)
        right = spark.range(COLD_KEYS + 1).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        # bare join: an aggregation on the join key downstream would make
        # AQE REFUSE the split (it preserves required distributions), so
        # the device under test is the join itself
        joined = left.join(right, "k").select("k", "w")
        rows = joined.collect()
        assert len(rows) == HOT_ROWS + COLD_KEYS * COLD_ROWS
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not mark the skewed join partition for splitting - "
            "the scoped thresholds no longer trigger OptimizeSkewedJoin:\n"
            + plan[:2000]
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_plain_join_on_forced_skew(spark):
    """End-to-end on the forced-skew synthetic: the full salted-join
    pattern (explode build side x SALT_BUCKETS, equi-join on key+salt)
    returns exactly the plain join's aggregate — the oracle property at
    a skew level the sf test data never exhibits."""
    left = _skewed(spark)
    right = spark.range(COLD_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("w")
    )
    plain = (
        left.join(right, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        .collect()
    )
    lefts = left.withColumn("salt", (F.col("v") % SALT_BUCKETS).cast("int"))
    rights = right.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    salted = (
        lefts.join(rights, ["k", "salt"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
