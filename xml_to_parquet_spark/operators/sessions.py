"""Event-time operators [EXT]: gap-based sessionization (batch), as-of join
direction variants, and deterministic hash sampling.

The reference has no query surface at all (SURVEY.md §2.2); these extend
the engine's time-series toolkit beyond `timeseries_rollup` / `join_asof`
with the shapes a behavioral-events pipeline needs. All are single-shuffle
window compositions — partition by user, sort by time, carry state along
the sort — the same linear-scale design as `join_asof`
(operators/relational.py:457): no range self-joins anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.dedup import _hexval
from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table
from xml_to_parquet_spark.materialize import materialize

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "sessionize_events",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM ordered
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark, sf_dir):
    """Gap-based sessionization in batch: a session breaks after 30 min of
    user inactivity. lag() marks session starts, a running sum over the same
    (user, time) sort numbers them, then one agg per session — the classic
    sessionization composition (what `session_window()` does in streaming,
    here with a value oracle).

    Scale shape: both window functions share one window spec, so Catalyst
    plans a single shuffle on user_id + one sort; the final agg re-uses the
    same hash partitioning. Ties broken by event_id for determinism."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev)) > SESSION_GAP_US),
        1,
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_new)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_idx"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


def _tagged_events(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )


@register(
    "join_asof_forward",
    """
    SELECT c.event_id, c.user_id, c.ts,
           min(p.ts) AS next_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id AND p.ts > c.ts
    GROUP BY c.event_id, c.user_id, c.ts
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of join: for each click, the EARLIEST strictly-later
    purchase by the same user. Same union-sort-carry composition as the
    backward `join_asof` — purchases sort before clicks at equal ts, so the
    current-row→following frame sees only strictly later purchases. One
    shuffle on user_id, no range explosion."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("event_type"))  # purchase before click at same ts
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return (
        _tagged_events(spark, sf_dir)
        .withColumn("next_purchase_ts", F.min("p_ts").over(w))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "next_purchase_ts")
    )


@register(
    "join_asof_nearest",
    """
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
         p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         b AS (SELECT c.event_id, max(p.ts) AS bt FROM c LEFT JOIN p
                 ON p.user_id = c.user_id AND p.ts <= c.ts GROUP BY c.event_id),
         f AS (SELECT c.event_id, min(p.ts) AS ft FROM c LEFT JOIN p
                 ON p.user_id = c.user_id AND p.ts > c.ts GROUP BY c.event_id)
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN bt IS NULL THEN ft
                WHEN ft IS NULL THEN bt
                WHEN epoch_us(c.ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(c.ts)
                THEN bt ELSE ft END AS nearest_purchase_ts
    FROM c JOIN b USING (event_id) JOIN f USING (event_id)
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of join: the purchase closest in time to each click,
    either direction; ties go to the earlier (backward) match. Both
    directions come out of ONE sorted window pass (two frames over the same
    sort), so the cost is identical to a single-direction as-of join."""
    base = W.partitionBy("user_id").orderBy("ts", F.desc("event_type"))
    wb = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    clicks = (
        _tagged_events(spark, sf_dir)
        .withColumn("bt", F.max("p_ts").over(wb))
        .withColumn("ft", F.min("p_ts").over(wf))
        .filter(F.col("event_type") == "click")
    )
    back_gap = F.unix_micros("ts") - F.unix_micros("bt")
    fwd_gap = F.unix_micros("ft") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("bt").isNull(), F.col("ft"))
        .when(F.col("ft").isNull(), F.col("bt"))
        .when(back_gap <= fwd_gap, F.col("bt"))
        .otherwise(F.col("ft"))
    )
    return clicks.select(
        "event_id", "user_id", "ts", nearest.alias("nearest_purchase_ts")
    )


@register(
    "sample_hash_deterministic",
    f"""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ({_hexval("md5(CAST(event_id AS VARCHAR))", "strpos")}) % 100 < 10
    """,
)
def sample_hash_deterministic(spark, sf_dir):
    """Deterministic 10% Bernoulli sample keyed on md5(event_id) — the
    reproducible-sampling pattern for training-data pipelines (same rows
    selected on every run, every engine, any partitioning; unlike
    TABLESAMPLE / rand()-based sampling, which is why `table_sample` is
    rows-only but this gets a full value oracle). Map-only: the predicate
    is a codegen'd expression on a projected column, no shuffle."""
    ev = table(spark, sf_dir, "events")
    bucket = F.expr(_hexval("md5(CAST(event_id AS STRING))", "instr")) % 100
    return ev.filter(bucket < 10).select("event_id", "user_id", "event_type", "value")


@register(
    "join_asof_tolerance",
    """
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
         p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         b AS (SELECT c.event_id, c.user_id, c.ts, max(p.ts) AS prev_ts
               FROM c LEFT JOIN p
                 ON p.user_id = c.user_id AND p.ts <= c.ts
               GROUP BY c.event_id, c.user_id, c.ts)
    SELECT event_id, user_id, ts,
           CASE WHEN prev_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(prev_ts) <= 3600000000
                THEN prev_ts END AS prev_purchase_ts
    FROM b
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """Backward as-of join with a staleness tolerance: latest purchase at
    or before each click by the same user, but only if within 1 hour —
    stale matches become NULL instead of silently joining week-old state
    (pandas ``merge_asof(tolerance=...)`` semantics; the reference has no
    join surface, [EXT]).

    Same single-shuffle union-sort-carry composition as ``join_asof`` —
    the tolerance is a post-window column expression, so the physical cost
    is identical to the untolerated as-of join (one shuffle on user_id, no
    per-row range probe)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("event_type"))  # purchase before click at same ts
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = (
        F.unix_micros("ts") - F.unix_micros("prev_ts") <= 3600 * 1000 * 1000
    )
    return (
        _tagged_events(spark, sf_dir)
        .withColumn("prev_ts", F.max("p_ts").over(w))
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("prev_ts").isNotNull() & within, F.col("prev_ts")).alias(
                "prev_purchase_ts"
            ),
        )
    )


@register(
    "funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view_users,
           (SELECT count(*) FROM c) AS n_click_users,
           (SELECT count(*) FROM p) AS n_purchase_users,
           round((SELECT count(*) FROM c) /
                 CAST((SELECT count(*) FROM v) AS DOUBLE), 4) AS view_to_click,
           round((SELECT count(*) FROM p) /
                 CAST((SELECT count(*) FROM c) AS DOUBLE), 4) AS click_to_purchase,
           round((SELECT count(*) FROM p) /
                 CAST((SELECT count(*) FROM v) AS DOUBLE), 4) AS overall
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered-funnel conversion (view → click-after-view →
    purchase-after-click) — the product-analytics staple. Each stage is
    "first qualifying event strictly after the previous stage's
    timestamp", so sequence matters: a purchase before the first view
    does not count.

    Scale shape: three stage aggregations, each an equi-join + min-agg
    keyed on user_id. After the first groupBy the data is hash-
    partitioned by user_id and every later join/agg reuses that
    partitioning (Exchange reuse — no re-shuffle per stage); the stage
    tables shrink monotonically, so AQE broadcasts the later joins. The
    final 1-row summary is three count aggregates cross-joined — constant
    data movement regardless of corpus size. Never a per-user
    collect_list (unbounded state) or a range self-join (quadratic).

    r16-opt (guide §2.4): each stage table fans into the next stage AND
    its own funnel count, so the lazy chain re-ran the view stage four
    times and the click stage twice (before-plan: 12 FileScans / 26
    Exchanges — the events scan once per re-evaluation). The two reused
    stage tables (user-keyed min-timestamp grids) checkpoint once each;
    each stage filter now scans events exactly once. Results identical
    (oracle re-verified both SFs)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .transform(materialize)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .transform(materialize)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view_users"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_users"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_users"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            F.round(
                F.col("n_click_users") / F.col("n_view_users").cast("double"), 4
            ).alias("view_to_click"),
            F.round(
                F.col("n_purchase_users") / F.col("n_click_users").cast("double"),
                4,
            ).alias("click_to_purchase"),
            F.round(
                F.col("n_purchase_users") / F.col("n_view_users").cast("double"), 4
            ).alias("overall"),
        )
    )


# ---------------------------------------------------------------------------
# CEP-style sequence pattern matching (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

CEP_PATTERN = "v+c+p"  # one-or-more views, one-or-more clicks, a purchase


@register(
    "event_pattern_match",
    f"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id, substr(event_type, 1, 1))
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, '{CEP_PATTERN}')) AS BIGINT)
             AS n_matches,
           len(regexp_extract_all(seq, '{CEP_PATTERN}')) > 0 AS converted
    FROM seqs
    """,
)
def event_pattern_match(spark, sf_dir):
    """Complex-event-processing pattern detection (SQL MATCH_RECOGNIZE /
    Flink CEP-lite): each user's event history becomes a compact symbol
    string (first letter of event_type, ordered by ts with event_id
    tiebreak) and the behavioral pattern CEP_PATTERN — one-or-more views,
    one-or-more clicks, then a purchase — is counted as non-overlapping
    regex matches. Where funnel_conversion answers 'did stage N follow
    stage N-1', this detects CONTIGUOUS episodes: intervening noise
    events break the match, which is the CEP semantics. Both engines run
    leftmost non-overlapping greedy matching, so counts agree exactly.

    Scale shape: ONE user_id shuffle builds the per-user sequence
    (array_sort over collect_list of (ts, event_id, symbol) structs —
    deterministic regardless of partitioning); the regex runs codegen'd
    per user row. Per-user sequences are bounded (session-scoped in a
    real pipeline); nothing driver-side. At 100 TB the symbol string is
    ~1 byte/event — 1000x smaller than the events it summarizes."""
    seqs = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct("
                "ts, event_id, substring(event_type, 1, 1) AS ini))), "
                "x -> x.ini), '')"
            ).alias("seq")
        )
    )
    n_matches = F.expr(f"size(regexp_extract_all(seq, '{CEP_PATTERN}', 0))")
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        n_matches.cast("bigint").alias("n_matches"),
        (n_matches > 0).alias("converted"),
    )
