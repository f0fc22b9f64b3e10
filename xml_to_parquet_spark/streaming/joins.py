"""Stream-stream join + streaming dedup [EXT] — SURVEY.md §2.2 streaming
row (the reference has no streaming surface).

Both run genuinely through the Structured Streaming engine (readStream →
availableNow → memory sink) and are batch-reproducible for a finite
replay, so they carry full DuckDB oracles:

  * the inner stream-stream join emits every match once both sides are
    processed; the time-bound join condition is what lets the engine
    eventually evict state (here the replay is one availableNow pass, so
    nothing is evicted before matching);
  * the streaming dedup projects only the key columns, so "first arrival
    wins" nondeterminism can't leak into the result values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_to_parquet_spark.registry import register, register_staged
from xml_to_parquet_spark.streaming.windows import _drain, _events_stream


@register(
    "stream_stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream inner join: purchases within 1h after a click by the
    same user. Both sides carry watermarks and the join condition bounds
    event time on both ends — that's the contract that lets the engine
    bound join state (evict a click once the purchase watermark passes
    click_ts + 1h). State is hash-partitioned on user_id across executors."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("click_id", "purchase_id", "user_id")
    return _drain(joined, ["click_id", "purchase_id", "user_id"], mode="append")


@register(
    "stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup(spark, sf_dir):
    """Streaming dropDuplicates on (user_id, event_type): state keeps one
    entry per seen key, arriving duplicates are suppressed. Projecting only
    the key columns keeps the result set deterministic (which *row* wins is
    arrival-order dependent; the key set is not). Unbounded key state is
    the scale hazard — production pipelines bound it with
    dropDuplicatesWithinWatermark or a TTL'd key domain."""
    ev = _events_stream(spark, sf_dir).select("user_id", "event_type")
    deduped = ev.dropDuplicates(["user_id", "event_type"])
    return _drain(deduped, ["user_id", "event_type"], mode="append")


@register(
    "stream_foreach_batch",
    """
    SELECT event_type, count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(24,8))), 4) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_foreach_batch(spark, sf_dir):
    """foreachBatch sink: the escape hatch for sinks Structured Streaming
    lacks natively (JDBC upserts, multi-table writes) — each micro-batch
    arrives as a batch DataFrame with exactly-once semantics via the
    (batch_id, checkpoint) pair. Here each batch appends to a parquet
    staging dir; the returned aggregate reads the staged data back, so the
    whole sink path is oracle-checked."""
    import os
    import shutil
    import uuid

    out = f"/tmp/xml_to_parquet_spark_febatch/{uuid.uuid4().hex[:8]}"
    os.makedirs(out, exist_ok=True)
    try:
        ev = _events_stream(spark, sf_dir).select("event_type", "value")

        def _write_batch(bdf, batch_id):
            bdf.write.mode("append").parquet(out)

        q = (
            ev.writeStream.foreachBatch(_write_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        staged = spark.read.parquet(out)
        return (
            staged.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("value").cast("decimal(24,8)")), 4)
                .cast("double")
                .alias("total_value"),
            )
            .localCheckpoint()  # materialize before the staging dir is removed
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "stream_static_join",
    """
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_events,
           CAST(round(sum(CAST(e.value AS DECIMAL(24,8))), 4) AS DOUBLE)
               AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id + 1
    GROUP BY c.c_mktsegment
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream-static join: the streaming events feed enriched against a
    static dimension (customer) — Spark re-plans the static side per
    micro-batch and broadcasts it (no state store involvement, unlike
    stream-stream joins). This is the standard streaming-enrichment shape:
    dimension updates are picked up at the next micro-batch without
    restarting the query. Decimal-sum + round keeps the aggregate exactly
    batch-reproducible for the oracle."""
    from xml_to_parquet_spark.tables import table

    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(
        F.broadcast(cust), cust.c_custkey == ev.user_id + 1
    )
    agg = joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(24,8)")), 4)
        .cast("double")
        .alias("total_value"),
    )
    return _drain(agg, ["mktsegment", "n_events", "total_value"])


@register(
    "stream_dedup_watermark",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark — the BOUNDED-state production
    variant of stream_dedup: state for a key is evicted once the
    watermark passes its event time + delay, so memory is
    O(keys-per-watermark-window), not O(all keys ever) — the difference
    between a pipeline that runs for years and one that OOMs in a week.
    Under the one-batch availableNow replay no key ever ages out
    mid-run, so the emitted key set equals the full distinct — same
    value oracle as stream_dedup, different (bounded) state contract.
    A production deployment keeps this exact plan and only the watermark
    delay is tuned to the real dup-arrival spread."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour").select(
        "user_id", "event_type", "ts"
    )
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    return _drain(deduped, ["user_id", "event_type"], mode="append")


@register(
    "stream_stream_outer",
    """
    WITH mx AS (
      -- Global watermark = min over BOTH inputs' watermarks. If either
      -- side saw no data its watermark never advances past -inf and
      -- nothing is evicted — but SQL least() IGNORES NULL (it is not
      -- min-with-null-propagation), so the one-sided case must be gated
      -- explicitly or the oracle would evict on the populated side's max
      -- alone (ADVICE r9).
      SELECT CASE
               WHEN max(ts) FILTER (event_type = 'click') IS NULL
                 OR max(ts) FILTER (event_type = 'purchase') IS NULL
               THEN NULL
               ELSE least(
                      date_trunc('milliseconds',
                          max(ts) FILTER (event_type = 'click')),
                      date_trunc('milliseconds',
                          max(ts) FILTER (event_type = 'purchase'))
                    ) - INTERVAL 2 HOUR
             END AS wm
      FROM events
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.click_id, p.purchase_id, c.user_id, c.cts
      FROM c LEFT JOIN p
        ON p.p_user_id = c.user_id
       AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
    )
    SELECT j.click_id, j.purchase_id, j.user_id
    FROM j, mx
    WHERE j.purchase_id IS NOT NULL OR j.cts + INTERVAL 1 HOUR < mx.wm
    """,
)
def stream_stream_outer(spark, sf_dir):
    """Stream-stream LEFT OUTER join (VERDICT r8 #6): clicks joined to
    purchases within 1h, and clicks that never matched are emitted with
    NULL purchase columns ONCE THE WATERMARK CLOSES their join window —
    state eviction *produces* output, the stateful behavior the inner
    join never exercises. Under availableNow replay the data batch finds
    every match (watermark starts at -inf, nothing evicted early), then
    the trailing no-data micro-batch (noDataMicroBatches, on by default)
    advances the watermark to max(event time) - 2h and flushes the
    expired-unmatched clicks.

    The deterministic replay contract, mirrored by the oracle: a NULL row
    appears exactly for unmatched clicks with cts + 1h < final watermark,
    where the final GLOBAL watermark is the MIN over the two inputs'
    watermarks — each side's max observed event time (post-filter, so the
    purchase side's max purchase ts, not the global max) truncated to
    whole milliseconds, minus the 2h delay. The first oracle draft used
    max(ts) over all events and was exactly 2 rows off at sf0.01 — the
    two clicks inside the 5-minute gap between the last purchase and the
    last click; unmatched clicks younger than the final watermark stay
    in state and are NOT emitted. State is
    hash-partitioned on user_id and bounded by the same 2h window as the
    inner join — outer emission adds no state, only an eviction-time
    output path. RocksDB state store via _drain's scoped confs, like the
    rest of the streaming suite."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("click_id", "purchase_id", "user_id")
    return _drain(joined, ["click_id", "purchase_id", "user_id"], mode="append")


@register_staged(
    "stream_stream_full_outer",
    """
    WITH mx AS (
      SELECT CASE
               WHEN max(ts) FILTER (event_type = 'click') IS NULL
                 OR max(ts) FILTER (event_type = 'purchase') IS NULL
               THEN NULL
               ELSE least(
                      date_trunc('milliseconds',
                          max(ts) FILTER (event_type = 'click')),
                      date_trunc('milliseconds',
                          max(ts) FILTER (event_type = 'purchase'))
                    ) - INTERVAL 2 HOUR
             END AS wm
      FROM events
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.click_id, p.purchase_id,
             coalesce(c.user_id, p.p_user_id) AS user_id, c.cts, p.pts
      FROM c FULL JOIN p
        ON p.p_user_id = c.user_id
       AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
    )
    SELECT j.click_id, j.purchase_id, j.user_id
    FROM j, mx
    WHERE (j.click_id IS NOT NULL AND j.purchase_id IS NOT NULL)
       OR (j.purchase_id IS NULL AND j.cts + INTERVAL 1 HOUR < mx.wm)
       OR (j.click_id IS NULL AND j.pts < mx.wm)
    """,
)
def stream_stream_full_outer(spark, sf_dir):
    """Stream-stream FULL OUTER join (VERDICT r9 #6): completes the join
    family — eviction produces output on BOTH state stores, the behavior
    the left-outer (click-side only) never exercises on the purchase
    store. Matched pairs are the inner interval join; unmatched CLICKS
    flush with NULL purchase columns once the global watermark passes
    cts + 1h (a later purchase could have matched until then); unmatched
    PURCHASES flush once the watermark passes pts — NOT pts + 1h, because
    a purchase only matches clicks at or before its own event time, so
    its match window closes the moment no older click can arrive. The two
    eviction boundaries differ by exactly the join interval; that
    asymmetry is the state-watermark calculus made visible, and the
    oracle encodes it verbatim (empirically pinned: at sf0.001 the
    pts < wm rule reproduces the engine's 194 evicted purchases exactly,
    pts + 1h < wm is 1 off). Global watermark = min over the two inputs'
    ms-truncated maxes minus the 2h delay, NULL-gated for one-sided
    corpora like the left-outer's oracle (ADVICE r9).

    Scale shape: identical state bound to the inner join — state is
    hash-partitioned on user_id, each row held only until its side's
    eviction boundary, and outer emission adds an output path at eviction
    time, not extra state. RocksDB provider via _drain's scoped confs."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
            "fullOuter",
        )
        .select(
            "click_id",
            "purchase_id",
            F.coalesce("user_id", "p_user_id").alias("user_id"),
        )
    )
    return _drain(joined, ["click_id", "purchase_id", "user_id"], mode="append")
