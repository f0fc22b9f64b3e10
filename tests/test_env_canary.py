"""Environment canary (VERDICT r4 #4): the events table's parquet
TIMESTAMP(NANOS) column has already shifted representation once across
Spark upgrades (≤4.0 nanosAsLong → LongType; 4.1+ → TIMESTAMP_NTZ). This
test pins the POST-``_fix_nanos`` contract — ``ts`` must behave as a
session-tz TIMESTAMP usable by ``unix_micros`` and ``withWatermark`` — so
the NEXT engine drift is caught by the suite in seconds, not by a bench
crash mid-round.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from xml_to_parquet_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


def test_events_ts_is_session_tz_timestamp(spark):
    ev = table(spark, SF_DIR, "events")
    (ts_field,) = [f for f in ev.schema.fields if f.name == "ts"]
    assert isinstance(ts_field.dataType, T.TimestampType), (
        f"events.ts post-_fix_nanos is {ts_field.dataType}; every event-time "
        "operator (sessionize, as-of joins, streaming watermarks) requires "
        "session-tz TIMESTAMP — extend tables._fix_nanos for this engine's "
        "raw representation"
    )


def test_events_ts_usable_by_unix_micros(spark):
    ev = table(spark, SF_DIR, "events")
    row = ev.select(F.unix_micros("ts").alias("us")).limit(1).collect()
    assert row and row[0]["us"] is not None


def test_events_ts_usable_by_watermark(spark):
    # withWatermark analysis rejects NTZ; batch DataFrames accept the call
    # and run full analysis, so this catches the drift without a stream.
    ev = table(spark, SF_DIR, "events")
    out = ev.withWatermark("ts", "10 minutes").groupBy(
        F.window("ts", "1 hour")
    ).count()
    assert out.limit(1).count() >= 0


def test_events_ts_values_match_duckdb_micros(spark):
    """Value-level parity: Spark's min/max of ts must equal DuckDB's
    nanos→micros read of the same file (what every oracle compares
    against)."""
    import duckdb

    got = (
        table(spark, SF_DIR, "events")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("mn"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("mx"),
        )
        .collect()[0]
    )
    want = duckdb.sql(
        "SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS mn, "
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS mx "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()
    assert (got["mn"], got["mx"]) == want
