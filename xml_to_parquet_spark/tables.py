"""Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).

All [EXT] operators take (spark, sf_dir) and read parquet from here. Reads
are plain ``spark.read.parquet`` so Catalyst gets full pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast in joins at any SF:
# their cardinality is fixed (region=5, nation=25) or grows sub-linearly.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def _fix_nanos(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS); normalize it to a session-tz
    TIMESTAMP at micros precision (truncating, matching DuckDB's
    nanos→micros read) regardless of how this Spark version surfaces it:

    - Spark ≤4.0 with spark.sql.legacy.parquet.nanosAsLong=true: LongType
      nanos → timestamp_micros(ns div 1000).
    - Spark 4.1+: TIMESTAMP(NANOS) arrives natively as TIMESTAMP_NTZ
      (wall-clock, no zone). The session tz is pinned to UTC
      (session.py), so casting NTZ → timestamp is lossless and keeps
      oracle parity with DuckDB's UTC read.
    """
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ensure_nanos_conf(spark: SparkSession) -> None:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark rejects unless
    nanosAsLong is set. The conf is runtime-settable, so set it at read
    time instead of relying on session-build config — callers (e.g. a test
    harness) may hand us a vanilla SparkSession."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception as e:  # read-only conf in some environments
        import warnings

        warnings.warn(
            "could not set spark.sql.legacy.parquet.nanosAsLong=true "
            f"({e!r}); reading events.parquet (TIMESTAMP(NANOS)) will "
            "likely fail — set the conf at session build time instead"
        )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        ensure_nanos_conf(spark)
    return _fix_nanos(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for the SQL API."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
