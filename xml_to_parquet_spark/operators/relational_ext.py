"""Relational primitive completions [EXT] — SURVEY.md §2.2 rows not yet
covered by operators/relational.py: remaining join types, window frame
variants, ALL-flavored set ops, subquery forms, map/regexp scalar families.

Same contract as relational.py: thin declarative DataFrame code, DuckDB
oracle with identical aliases, deterministic orderings/rounding.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xml_to_parquet_spark.operators.relational import _davg_sql, davg
from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table
from xml_to_parquet_spark.materialize import materialize


def _t(spark, sf_dir, name):
    return table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@register(
    "join_right",
    """
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 450000
    """,
)
def join_right(spark, sf_dir):
    """Right outer join with a join-side predicate (kept in the ON clause —
    moving it to WHERE would change outer-join semantics)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return orders.join(
        cust,
        (orders.o_custkey == cust.c_custkey) & (orders.o_totalprice > 450000),
        "right",
    ).select("o_orderkey", "o_totalprice", "c_name")


@register(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark, sf_dir):
    """Cartesian product — legitimate only for tiny dims (5 × 25 here).
    At scale a cross join is always broadcast-nested-loop with the small
    side broadcast; anything else is a plan bug."""
    reg = _t(spark, sf_dir, "region")
    nat = _t(spark, sf_dir, "nation")
    return reg.crossJoin(F.broadcast(nat)).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# window frame variants
# ---------------------------------------------------------------------------


@register(
    "window_ntile_dist",
    """
    SELECT o_orderkey, o_custkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 8) AS pct_rank,
           round(cume_dist()    OVER w, 8) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ntile_dist(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cdist"),
    )


@register(
    "window_range_frame",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
               AS n_within_10k
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based, tie-inclusive): number of orders within
    $10k below each order's price. RANGE frames include peers, so the
    result is deterministic even with duplicate prices."""
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
    )


@register(
    "window_first_last",
    """
    SELECT user_id, event_id,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING)
               AS last_event,
           nth_value(event_id, 2) OVER w AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark, sf_dir):
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.nth_value("event_id", 2).over(w).alias("second_event"),
    )


# ---------------------------------------------------------------------------
# set operations (ALL variants)
# ---------------------------------------------------------------------------


@register(
    "set_intersect_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect_all(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except_all(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# subquery forms
# ---------------------------------------------------------------------------


@register(
    "in_subquery",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def in_subquery(spark, sf_dir):
    """IN-subquery through the SQL API — Catalyst plans a left-semi join
    (broadcast here: the negative-balance customer list is tiny)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_in_sq")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_in_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders_in_sq
        WHERE o_custkey IN (SELECT c_custkey FROM customer_in_sq
                            WHERE c_acctbal < 0)
        """
    )


@register(
    "scalar_subquery",
    f"""
    SELECT o_orderkey,
           round(o_totalprice / (SELECT {_davg_sql('o_totalprice')} FROM orders), 6)
               AS price_ratio
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT {_davg_sql('o_totalprice')} FROM orders)
    """,
)
def scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery: price relative to the global average.
    The 1-row aggregate broadcasts; davg keeps the average bit-identical
    across engines so the 1.5× threshold can't flip borderline rows."""
    orders = _t(spark, sf_dir, "orders")
    avg_df = orders.agg(davg(F.col("o_totalprice")).alias("gavg"))
    return (
        orders.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > 1.5 * F.col("gavg"))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") / F.col("gavg"), 6).alias("price_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# scalar families: map + regexp/split
# ---------------------------------------------------------------------------


@register(
    "scalar_map_fns",
    """
    SELECT event_id,
           'k' AS first_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           1 AS n_keys
    FROM events
    """,
)
def scalar_map_fns(spark, sf_dir):
    """MapType surface: parse the JSON props payload into a native
    map<string,bigint>, then interrogate it with map functions. The oracle
    side reads the same facts via DuckDB's JSON functions (DuckDB has no
    Spark-style map type; the payload is single-key by construction,
    TESTDATA.md)."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.sort_array(F.map_keys(m)).getItem(0).alias("first_key"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    )


@register(
    "scalar_regexp_split",
    """
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g')   AS name_novowel,
           regexp_matches(p_name, '^[a-z]+ [a-z]+$')     AS two_words,
           array_to_string(string_split(p_name, ' '), '|') AS name_parts,
           len(string_split(p_name, ' '))                AS n_parts
    FROM part
    """,
)
def scalar_regexp_split(spark, sf_dir):
    """Split result serialized with '|' so every output cell is a hashable
    scalar (list cells break order-insensitive canonicalization in generic
    harnesses; same contract as mm_feature_extract)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_novowel"),
        F.col("p_name").rlike("^[a-z]+ [a-z]+$").alias("two_words"),
        F.concat_ws("|", F.split("p_name", " ")).alias("name_parts"),
        F.size(F.split("p_name", " ")).alias("n_parts"),
    )


@register(
    "explode_unnest",
    """
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part
    """,
)
def explode_unnest(spark, sf_dir):
    """Array explode / UNNEST: one output row per array element — the
    flatten step every tokenization pipeline starts with."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@register("table_sample", None)
def table_sample(spark, sf_dir):
    """Bernoulli TABLESAMPLE with a fixed seed — deterministic within
    Spark but engine-specific RNG, so rows-only check. At 100 TB sampling
    happens at the scan (no full materialization)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# modern SQL surfaces: recursive CTE, LATERAL, union-by-name
# ---------------------------------------------------------------------------


@register(
    "recursive_cte",
    """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01 00:00:00'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01 00:00:00'
    )
    SELECT m AS month_start, count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    """,
)
def recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4.x): generate the order-date month calendar by
    recursion, then left-join order counts onto it — the gap-filling time
    series pattern. Recursion depth is the calendar length (80 iterations),
    each a tiny driver-side step; the join is one broadcast of the
    generated axis."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01 00:00:00'
        )
        SELECT m AS month_start, count(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders_rec ON date_trunc('MONTH', o_orderdate) = m
        GROUP BY m
        """
    )


@register(
    "lateral_topk",
    """
    SELECT c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer, LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                            WHERE o_custkey = c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
    """,
)
def lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with per-row ORDER BY/LIMIT — top-2
    orders per customer. Catalyst decorrelates this into the same
    window-rank plan as topk_per_group; the surface matters for SQL users
    migrating from engines where LATERAL is the idiom."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c_custkey, l.o_orderkey, l.o_totalprice
        FROM customer_lat,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
                      WHERE o_custkey = c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        """
    )


@register(
    "union_by_name",
    """
    SELECT k, n_cust, NULL AS n_supp FROM
      (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1)
    UNION ALL
    SELECT k, NULL AS n_cust, n_supp FROM
      (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
    """,
)
def union_by_name(spark, sf_dir):
    """unionByName(allowMissingColumns=True): schema-aligned union that
    matches columns by name and null-fills the gaps — the safe union for
    evolving lake schemas (positional UNION silently mismatches)."""
    a = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    b = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# aggregation completions: ordered string collect, null semantics, rollups
# ---------------------------------------------------------------------------


@register(
    "agg_string_collect",
    """
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
               AS segments,
           count(DISTINCT c_mktsegment) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_string_collect(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/STRING_AGG): collect → sort →
    join, so the concatenated value is deterministic under any partition
    arrival order — collect_list alone is not."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


@register(
    "agg_null_semantics",
    """
    SELECT count(*)                                      AS n_all,
           count(nullif(l_returnflag, 'A'))              AS n_nonnull,
           count(DISTINCT nullif(l_returnflag, 'A'))     AS n_distinct,
           sum(CASE WHEN false THEN 1 END)               AS empty_sum,
           max(CASE WHEN l_returnflag = 'Z' THEN l_quantity END) AS max_never,
           CAST(coalesce(sum(CASE WHEN false THEN 1 END), -1) AS BIGINT) AS empty_sum_coalesced
    FROM lineitem
    """,
)
def agg_null_semantics(spark, sf_dir):
    """SQL null-handling contract in one row: count(*) vs count(col),
    DISTINCT over nulls, empty-set aggregates returning NULL (not 0) —
    the semantics every engine must agree on exactly for correctness
    parity to mean anything."""
    li = _t(spark, sf_dir, "lineitem")
    nullable = F.nullif(F.col("l_returnflag"), F.lit("A"))
    return li.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(nullable).alias("n_nonnull"),
        F.countDistinct(nullable).alias("n_distinct"),
        F.sum(F.when(F.lit(False), 1)).alias("empty_sum"),
        F.max(F.when(F.col("l_returnflag") == "Z", F.col("l_quantity"))).alias(
            "max_never"
        ),
        F.coalesce(F.sum(F.when(F.lit(False), 1)), F.lit(-1)).alias(
            "empty_sum_coalesced"
        ),
    )


@register(
    "timeseries_rollup",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket, count(*) AS n,
             sum(CAST(value AS DECIMAL(24,8))) AS total
      FROM events GROUP BY 1
    ), daily AS (
      -- CAST: DuckDB's sum(BIGINT) returns HUGEINT; uncast it would promote
      -- the unioned n column and materialize as float64 in pandas (364.0 vs
      -- Spark's int64 364), breaking the driver's value hash.
      SELECT date_trunc('day', bucket) AS bucket,
             CAST(sum(n) AS BIGINT) AS n, sum(total) AS total
      FROM hourly GROUP BY 1
    )
    SELECT 'hour' AS res, bucket, n,
           CAST(round(total, 4) AS DOUBLE) AS total FROM hourly
    UNION ALL
    SELECT 'day' AS res, bucket, n,
           CAST(round(total, 4) AS DOUBLE) AS total FROM daily
    """,
)
def timeseries_rollup(spark, sf_dir):
    """Hypertable-style hierarchical rollup: the daily resolution is
    re-aggregated FROM the hourly aggregate, not from raw events — the
    continuous-aggregate pattern (each coarser tier reads the finer tier,
    so raw data is scanned exactly once no matter how many tiers).
    Decimal partials re-aggregate exactly; rounding happens only at emit.

    r16-opt (guide §2.4): "scanned exactly once" was only true eagerly —
    lazy, the hourly tier fans into the daily re-aggregate AND the
    union emit, re-running the events pass (before-plan: 4 FileScans).
    Checkpointing the hour grid makes the docstring's claim literal."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(24,8)")).alias("total"),
        )
        .transform(materialize)
    )
    daily = hourly.groupBy(F.date_trunc("day", "bucket").alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    )
    emit = lambda df, res: df.select(  # noqa: E731
        F.lit(res).alias("res"),
        "bucket",
        "n",
        F.round("total", 4).cast("double").alias("total"),
    )
    return emit(hourly, "hour").unionAll(emit(daily, "day"))


# ---------------------------------------------------------------------------
# semi-structured: VARIANT, xpath function family
# ---------------------------------------------------------------------------


@register(
    "variant_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
)
def variant_json(spark, sf_dir):
    """VARIANT (Spark 4 semi-structured type): parse once into the binary
    variant encoding, extract typed paths — the open-lake answer to schema
    drift (one parse, many cheap typed reads; columns shred at the storage
    layer on Delta/Iceberg). Missing paths yield NULL, same as the JSON
    oracle."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_val"),
    )


@register(
    "scalar_xpath_fns",
    """
    SELECT o_orderkey,
           o_orderkey                AS xp_key,
           o_orderstatus             AS xp_status,
           o_totalprice              AS xp_price,
           o_orderkey % 2 = 0        AS xp_even
    FROM orders
    """,
)
def scalar_xpath_fns(spark, sf_dir):
    """XPath extraction over XML text — the query-side complement of the
    conversion surface: rows are serialized to XML fragments, read back
    via xpath, and the oracle is the identity on the source columns, so
    any parsing/serialization defect breaks the match.

    Scale-critical shape: ONE ``xpath()`` array call extracts every field
    in a single DOM parse; typed casts happen JVM-side afterwards. Each
    additional xpath_* column re-parses the document per row — measured
    4.1× slower with 4 typed extractors (29.0s vs 7.1s at sf0.1; at 100 TB
    that's the whole job). Spark's subexpression elimination collapses the
    repeated ``arr`` references to one evaluation (plan-verified). The
    typed xpath_long/string/double/boolean extractors stay API-covered by
    tests/test_operators.py::test_xpath_typed_extractors.

    Positional-shift guard: ``/o/*/text()`` drops the text() node of an
    EMPTY element, which would silently shift later fields into the wrong
    slots; when size(arr) != 3 the whole row nulls out instead, so a
    shift breaks oracle parity loudly rather than misassigning values
    (orders columns are non-empty by TPC-H contract, so the guard is
    inert here by design). The guard is applied through the INDEX
    (element_at(arr, NULL) → NULL), never by wrapping the array in a
    CASE: Spark's subexpression elimination skips conditional branches,
    so a CASE-wrapped array re-evaluates the xpath parse per output
    column — measured 2.2× the whole query (16.0s vs 7.3s at sf0.1)."""
    # the single-file orders scan arrives as one split; xpath parsing is
    # CPU-bound, so spread it (minhash_signatures rationale) — measured
    # 7.4s -> ~1s at sf0.1
    o = _t(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey"),
        F.lit("</k><st>"), F.col("o_orderstatus"),
        F.lit("</st><p>"), F.col("o_totalprice"),
        F.lit("</p></o>"),
    )
    arr = F.xpath(xml, F.lit("/o/*/text()"))
    ok = F.size(arr) == 3

    def at(i):
        return F.element_at(arr, F.when(ok, F.lit(i)))

    key = at(1).cast("long")
    return o.select(
        "o_orderkey",
        key.alias("xp_key"),
        at(2).alias("xp_status"),
        at(3).cast("double").alias("xp_price"),
        (key % 2 == 0).alias("xp_even"),
    )


@register(
    "agg_histogram",
    """
    -- width_bucket(x, 0, 600000, 12) for non-negative x (DuckDB has no
    -- width_bucket): floor(x/50000)+1, overflow bucket 13
    SELECT LEAST(CAST(floor(o_totalprice / 50000) AS BIGINT) + 1, 13) AS bucket,
           count(*) AS n
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Equi-width histogram via width_bucket — the single-pass, shuffle-
    by-bucket shape (never a sort) for distribution profiling."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias(
                "bucket"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@register(
    "scalar_try_arith",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_extendedprice / l_discount, 4) END AS price_per_disc,
           try_cast(CASE WHEN l_linenumber = 7 THEN l_returnflag
                         ELSE CAST(l_orderkey AS VARCHAR) END AS BIGINT)
               AS dirty_as_int
    FROM lineitem
    """,
)
def scalar_try_arith(spark, sf_dir):
    """Error-safe arithmetic under ANSI mode: try_divide / try_cast return
    NULL where strict evaluation would raise — the contract that keeps a
    100 TB job from dying on one bad row.

    Scale note: try_cast pays a caught JVM exception per FAILING row
    (~9µs) — measured 5.6s over 600k all-failing rows vs 0.87s when only
    ~14% are dirty. It belongs on rarely-dirty columns (this query models
    that: one line number in seven carries a non-numeric value); a column
    that never parses should be gated with a cheap rlike predicate
    instead."""
    li = _t(spark, sf_dir, "lineitem")
    dirty = F.when(
        F.col("l_linenumber") == 7, F.col("l_returnflag")
    ).otherwise(F.col("l_orderkey").cast("string"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0))),
            4,
        ).alias("price_per_disc"),
        dirty.try_cast("bigint").alias("dirty_as_int"),
    )


@register(
    "scalar_levenshtein",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey <= 20 AND b.p_partkey <= 20
    """,
)
def scalar_levenshtein(spark, sf_dir):
    """Edit distance over a bounded candidate set (20×20 upper triangle) —
    the fuzzy-match primitive; at scale always behind a blocking key, never
    all-pairs."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 20)
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b", F.levenshtein("name_a", "name_b").alias("edit_dist")
        )
    )


@register(
    "agg_bitwise",
    """
    SELECT l_returnflag,
           bit_and(l_orderkey) AS k_and,
           bit_or(l_orderkey)  AS k_or,
           bit_xor(l_orderkey) AS k_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitwise(spark, sf_dir):
    """Bitwise aggregates — order-independent by algebra, so they need no
    determinism scaffolding at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("k_and"),
        F.bit_or("l_orderkey").alias("k_or"),
        F.bit_xor("l_orderkey").alias("k_xor"),
    )


@register(
    "agg_percentile_array",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS q50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_array(spark, sf_dir):
    """Multi-quantile in ONE pass: percentile(col, array(...)) sorts each
    group once for all three cut points (three separate percentile calls
    would sort three times)."""
    li = _t(spark, sf_dir, "lineitem")
    qs = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
    return li.groupBy("l_returnflag").agg(
        F.round(qs.getItem(0), 4).alias("q25"),
        F.round(qs.getItem(1), 4).alias("q50"),
        F.round(qs.getItem(2), 4).alias("q75"),
    )


@register(
    "join_null_safe",
    """
    WITH a AS (SELECT event_id, CASE WHEN event_type = 'view' THEN NULL
                                     ELSE event_type END AS k FROM events),
         b AS (SELECT DISTINCT CASE WHEN event_type = 'view' THEN NULL
                                    ELSE event_type END AS k FROM events)
    SELECT a.event_id, a.k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — ordinary equi-join machinery applies (hash on the
    null-safe key), unlike `=` where NULL rows silently vanish."""
    ev = _t(spark, sf_dir, "events")
    k = F.when(F.col("event_type") == "view", None).otherwise(F.col("event_type"))
    a = ev.select("event_id", k.alias("k"))
    b = a.select("k").distinct().select(F.col("k").alias("bk"))
    return a.join(b, a.k.eqNullSafe(F.col("bk"))).select("event_id", "k")


# Shared population-moment formulas (POWER SUMS → one double expression):
# the same SQL text runs on Spark AND DuckDB, over EXACT decimal power
# sums, so both engines execute the identical float operations in the
# identical order — bit-reproducible under any partition layout.
# sqrt-based (never pow: libm pow differs between JVM and C).
_SKEW_EXPR = (
    "round(((s3 / n) - 3 * (s1 / n) * (s2 / n)"
    " + 2 * (s1 / n) * (s1 / n) * (s1 / n))"
    " / (((s2 / n) - (s1 / n) * (s1 / n))"
    " * sqrt((s2 / n) - (s1 / n) * (s1 / n))), 6)"
)
_KURT_EXPR = (
    "round(((s4 / n) - 4 * (s1 / n) * (s3 / n)"
    " + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
    " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))"
    " / (((s2 / n) - (s1 / n) * (s1 / n))"
    " * ((s2 / n) - (s1 / n) * (s1 / n))) - 3, 4)"
)


@register(
    "agg_skew_kurtosis",
    f"""
    WITH p AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS x
      FROM lineitem
    ), q AS (
      -- one operand widened past precision 18 per product: DuckDB's
      -- physical int64 decimal path overflows otherwise (the values are
      -- identical to Spark's; only the storage widths differ)
      SELECT l_returnflag,
             CAST(CAST(x AS DECIMAL(25,2)) * x AS DECIMAL(18,4)) AS x2,
             CAST(CAST(x AS DECIMAL(12,2))
                  * CAST(CAST(x AS DECIMAL(25,2)) * x AS DECIMAL(25,4))
                  AS DECIMAL(38,6)) AS x3,
             x
      FROM p
    ), s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE)        AS n,
             CAST(sum(x) AS DOUBLE)          AS s1,
             CAST(sum(x2) AS DOUBLE)         AS s2,
             CAST(sum(x3) AS DOUBLE)         AS s3,
             CAST(sum(CAST(CAST(x2 AS DECIMAL(19,4)) * x2 AS DECIMAL(37,8)))
                  AS DOUBLE) AS s4
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, {_SKEW_EXPR} AS sk, {_KURT_EXPR} AS ku FROM s
    """,
)
def agg_skew_kurtosis(spark, sf_dir):
    """Higher-moment aggregates via EXACT decimal power sums — the only
    partition-order-invariant formulation. Spark's skewness()/kurtosis()
    accumulate central moments in float, so their last decimals depend
    on the partial-merge order: the r16 AQE-off registry sweep measured
    the same data flipping from -0.029997 to -0.029975 (sk) between
    partition layouts, i.e. the builtin-vs-builtin oracle match was
    container luck. Here Σx, Σx², Σx³, Σx⁴ accumulate as decimals
    (exact: prices are 2dp; every product is typed to stay under
    precision 38 — x² (18,4), x³ = (12,2)×(25,4) → (38,6), x⁴ =
    (18,4)² → (37,8)), and one shared double expression (_SKEW_EXPR /
    _KURT_EXPR, sqrt-based, identical text on both engines) computes
    population skewness g1 = m3/m2^1.5 and excess kurtosis m4/m2²−3
    from the exact sums. One rounding per sum at the decimal→double
    cast, then identical IEEE arithmetic → bit-reproducible anywhere.
    Σx⁴ fits DECIMAL(38,8) to ~1e11 rows per group (≈20 TB of
    lineitem); past that, pre-scale prices or widen the split.
    Population (not sample-corrected) moments by design: the two
    engines' builtins disagree on small-sample corrections anyway."""
    li = _t(spark, sf_dir, "lineitem")
    p = li.select(
        "l_returnflag",
        F.expr("CAST(l_extendedprice AS DECIMAL(18,2))").alias("x"),
    )
    q = p.select(
        "l_returnflag",
        "x",
        F.expr("CAST(x * x AS DECIMAL(18,4))").alias("x2"),
        F.expr(
            "CAST(CAST(x AS DECIMAL(12,2)) * CAST(x * x AS DECIMAL(25,4))"
            " AS DECIMAL(38,6))"
        ).alias("x3"),
    )
    s = q.groupBy("l_returnflag").agg(
        F.expr("CAST(count(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(sum(x) AS DOUBLE)").alias("s1"),
        F.expr("CAST(sum(x2) AS DOUBLE)").alias("s2"),
        F.expr("CAST(sum(x3) AS DOUBLE)").alias("s3"),
        F.expr("CAST(sum(CAST(x2 * x2 AS DECIMAL(37,8))) AS DOUBLE)").alias(
            "s4"
        ),
    )
    return s.select(
        "l_returnflag",
        F.expr(_SKEW_EXPR).alias("sk"),
        F.expr(_KURT_EXPR).alias("ku"),
    )


@register(
    "scalar_date_fns2",
    """
    SELECT o_orderkey,
           quarter(o_orderdate)                       AS qtr,
           weekofyear(o_orderdate)                    AS iso_week,
           dayofweek(o_orderdate) + 1                 AS dow,
           last_day(o_orderdate)                      AS month_end,
           o_orderdate + INTERVAL 3 MONTH             AS plus3m,
           CAST(epoch(o_orderdate) AS BIGINT)         AS epoch_s
    FROM orders
    """,
)
def scalar_date_fns2(spark, sf_dir):
    """Second date family. Convention notes baked into the oracle:
    DuckDB dayofweek is 0-based Sunday, Spark 1-based (+1 aligns);
    quarter/ISO-week agree natively."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus3m"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "scalar_string_fns2",
    """
    SELECT p_partkey,
           upper(substr(p_name, 1, 1)) || substr(p_name, 2) AS name_cap,
           translate(p_brand, '#', '-')                     AS brand_tr,
           repeat('*', p_size % 5)                          AS stars,
           instr(p_type, 'O')                               AS o_pos,
           left(p_type, 3)                                  AS type3,
           right(p_brand, 2)                                AS brand2
    FROM part
    """,
)
def scalar_string_fns2(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
        ).alias("name_cap"),
        F.translate("p_brand", "#", "-").alias("brand_tr"),
        F.expr("repeat('*', p_size % 5)").alias("stars"),
        F.instr(F.col("p_type"), "O").cast("bigint").alias("o_pos"),
        F.expr("left(p_type, 3)").alias("type3"),
        F.expr("right(p_brand, 2)").alias("brand2"),
    )


@register(
    "agg_grouping_id",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_id(spark, sf_dir):
    """grouping()/grouping_id(): disambiguates real NULL group keys from
    rollup super-aggregate rows — required for correct BI consumption of
    grouping-set output."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gid")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n
        FROM lineitem_gid
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "scalar_array_fns2",
    """
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS u,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
                    x -> list_contains(b, x))), ','), '')                    AS i,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
                    x -> NOT list_contains(b, x))), ','), '')                AS e,
           coalesce(array_to_string(a[2:4], ','), '')                        AS sl,
           array_to_string(list_reverse(a), ',')                             AS rev
    FROM (SELECT p_partkey,
                 range(1, p_size % 8 + 2) AS a,
                 range(3, 11) AS b
          FROM part) t
    """,
)
def scalar_array_fns2(spark, sf_dir):
    """Set-algebra array family (union/intersect/except/slice/reverse) —
    outputs sorted so the value hash is independent of each engine's
    first-seen ordering, then comma-serialized so every cell is a hashable
    scalar (DuckDB's array_to_string yields NULL for empty lists while
    Spark's concat_ws yields '', hence the coalesce on the emptiable
    columns)."""
    join = lambda c: F.concat_ws(  # noqa: E731
        ",", F.transform(c, lambda x: x.cast("string"))
    )
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.sequence(F.lit(1), F.col("p_size") % 8 + 1).alias("a"),
        F.sequence(F.lit(3), F.lit(10)).alias("b"),
    )
    return p.select(
        "p_partkey",
        join(F.array_sort(F.array_union("a", "b"))).alias("u"),
        join(F.array_sort(F.array_intersect("a", "b"))).alias("i"),
        join(F.array_sort(F.array_except("a", "b"))).alias("e"),
        join(F.slice("a", 2, 3)).alias("sl"),
        join(F.reverse("a")).alias("rev"),
    )


# ---------------------------------------------------------------------------
# data-quality operators
# ---------------------------------------------------------------------------


@register(
    "dq_profile",
    """
    SELECT count(*)                       AS n_rows,
           count(l_shipdate)              AS shipdate_nonnull,
           count(DISTINCT l_orderkey)     AS orderkey_card,
           count(DISTINCT l_returnflag)   AS returnflag_card,
           round(min(l_extendedprice), 2) AS price_min,
           round(max(l_extendedprice), 2) AS price_max,
           CAST(min(l_shipdate) AS TIMESTAMP) AS shipdate_min,
           CAST(max(l_shipdate) AS TIMESTAMP) AS shipdate_max
    FROM lineitem
    """,
)
def dq_profile(spark, sf_dir):
    """Column profiling in one pass: null counts, cardinalities, ranges —
    the pre-flight check every ingestion pipeline runs. All aggregates
    map-side partial; one 1-row exchange."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_shipdate").alias("shipdate_nonnull"),
        F.countDistinct("l_orderkey").alias("orderkey_card"),
        F.countDistinct("l_returnflag").alias("returnflag_card"),
        F.round(F.min("l_extendedprice"), 2).alias("price_min"),
        F.round(F.max("l_extendedprice"), 2).alias("price_max"),
        F.min("l_shipdate").alias("shipdate_min"),
        F.max("l_shipdate").alias("shipdate_max"),
    )


@register(
    "dq_constraints",
    """
    SELECT
      (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                             GROUP BY o_orderkey HAVING count(*) > 1) d)
          AS pk_violations,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey))
          AS fk_orphans,
      (SELECT count(*) FROM lineitem WHERE l_quantity <= 0 OR l_discount < 0
                                        OR l_discount > 1)
          AS domain_violations
    """,
)
def dq_constraints(spark, sf_dir):
    """Constraint validation: primary-key uniqueness, referential
    integrity (anti-join orphan count), and domain bounds — three checks,
    each an aggregate the optimizer can run as pure map-side counting
    (the FK check is a broadcast anti-join against the dim)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("pk_violations"))
    )
    fk = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    dom = li.filter(
        (F.col("l_quantity") <= 0)
        | (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1)
    ).agg(F.count(F.lit(1)).alias("domain_violations"))
    return pk.crossJoin(fk).crossJoin(dom)


@register("sample_stratified", None)
def sample_stratified(spark, sf_dir):
    """Stratified sampling (sampleBy): per-stratum fractions with a fixed
    seed — the class-balancing primitive for training-data curation.
    Engine-specific RNG → rows-only check."""
    li = _t(spark, sf_dir, "lineitem")
    return li.sampleBy(
        "l_returnflag", {"A": 0.05, "N": 0.02, "R": 0.05}, seed=42
    ).select("l_orderkey", "l_linenumber", "l_returnflag")


@register(
    "agg_min_max_by",
    """
    SELECT o_custkey,
           arg_max(o_orderkey, o_orderdate) AS latest_order,
           arg_min(o_orderkey, o_orderdate) AS first_order
    FROM (SELECT o_custkey, o_orderkey, o_orderdate + o_orderkey * INTERVAL 1 SECOND
              AS o_orderdate FROM orders) t
    GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark, sf_dir):
    """arg_max/arg_min (max_by/min_by): the latest/first order id per
    customer without a self-join or window. The ordering key is made
    unique (date + orderkey-seconds) because ties make arg_max engine-
    nondeterministic — the same discipline every top-1 query here uses."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (
            F.col("o_orderdate")
            + (F.col("o_orderkey") * F.expr("INTERVAL 1 SECOND"))
        ).alias("o_orderdate"),
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_orderdate").alias("latest_order"),
        F.min_by("o_orderkey", "o_orderdate").alias("first_order"),
    )


@register(
    "agg_mode_deterministic",
    """
    WITH counts AS (
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY n DESC, l_linestatus) AS rn
      FROM counts
    )
    SELECT l_returnflag, l_linestatus AS modal_status, n AS modal_count
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark, sf_dir):
    """Mode (most frequent value) per group with a DETERMINISTIC tie-break
    (count desc, then value asc) — unlike built-in mode()/F.mode, whose
    tie order is engine-arbitrary and therefore un-oracle-able. Two-phase:
    count per (group, value) — map-side partial agg — then a per-group
    top-1 window over the (tiny) distinct-value set."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("l_returnflag").orderBy(F.desc("n"), "l_linestatus")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("modal_status"),
            F.col("n").alias("modal_count"),
        )
    )


@register(
    "merge_upsert",
    """
    WITH source AS (
      -- CDC batch: updates for keys ending in 000..004, plus new rows
      SELECT o_orderkey AS key, o_totalprice + 1000 AS price, 'update' AS op
      FROM orders WHERE o_orderkey % 1000 < 5
      UNION ALL
      SELECT o_orderkey + 100000000 AS key, 42.0 AS price, 'insert' AS op
      FROM orders WHERE o_orderkey % 1000 = 5
    ), target AS (
      SELECT o_orderkey AS key, o_totalprice AS price FROM orders
    )
    SELECT coalesce(s.key, t.key)                       AS key,
           CAST(round(coalesce(s.price, t.price), 2) AS DOUBLE) AS price,
           CASE WHEN s.key IS NULL THEN 'unchanged'
                WHEN t.key IS NULL THEN 'inserted'
                ELSE 'updated' END                      AS merge_action
    FROM target t FULL OUTER JOIN source s ON s.key = t.key
    WHERE coalesce(s.key, t.key) % 1000 IN (0, 1, 2, 3, 4, 5)
    """,
)
def merge_upsert(spark, sf_dir):
    """MERGE/upsert as a batch operator (the CDC apply pattern on plain
    parquet — what Delta/Iceberg MERGE INTO compiles to): full outer join
    of target and source on the key, matched rows take the source value,
    unmatched-source rows insert, unmatched-target rows carry through.
    The WHERE keeps the verifiable slice small. One shuffle on the merge
    key; at scale the join benefits from pre-bucketing both sides on it
    (see join_bucketed)."""
    o = _t(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 1000 < 5).select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice") + 1000).alias("price"),
        F.lit("update").alias("op"),
    )
    inserts = o.filter(F.col("o_orderkey") % 1000 == 5).select(
        (F.col("o_orderkey") + 100000000).alias("key"),
        F.lit(42.0).alias("price"),
        F.lit("insert").alias("op"),
    )
    source = updates.unionAll(inserts)
    target = o.select(F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price"))
    merged = target.alias("t").join(
        source.alias("s"), F.col("s.key") == F.col("t.key"), "full_outer"
    )
    return merged.select(
        F.coalesce(F.col("s.key"), F.col("t.key")).alias("key"),
        F.round(F.coalesce(F.col("s.price"), F.col("t.price")), 2)
        .cast("double")
        .alias("price"),
        F.when(F.col("s.key").isNull(), "unchanged")
        .when(F.col("t.key").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    ).filter((F.col("key") % 1000).isin(0, 1, 2, 3, 4, 5))


@register(
    "agg_count_if_filter",
    """
    SELECT l_returnflag,
           count(*)                                            AS n_all,
           count(*) FILTER (WHERE l_quantity > 25)             AS n_bulk,
           count(*) FILTER (WHERE l_discount >= 0.05)          AS n_discounted,
           CAST(round(CAST(sum(l_extendedprice) FILTER (WHERE l_discount >= 0.05)
                 AS DECIMAL(24,4)), 2) AS DOUBLE)              AS disc_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_if_filter(spark, sf_dir):
    """Conditional aggregation (SQL FILTER clause / count_if): multiple
    differently-filtered aggregates in ONE scan + one partial agg — the
    alternative is N self-joined subqueries, which at 100 TB means N scans.
    Spark expresses FILTER as when()-guarded aggregates; identical
    semantics, still a single map-side combine."""
    li = _t(spark, sf_dir, "lineitem")
    bulk = F.when(F.col("l_quantity") > 25, 1)
    disc = F.when(F.col("l_discount") >= 0.05, 1)
    disc_rev = F.when(F.col("l_discount") >= 0.05, F.col("l_extendedprice"))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(bulk).alias("n_bulk"),
        F.count(disc).alias("n_discounted"),
        F.round(F.sum(disc_rev).cast("decimal(24,4)"), 2)
        .cast("double")
        .alias("disc_revenue"),
    )


@register(
    "window_count_distinct",
    """
    SELECT o_custkey, o_orderkey,
           count(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey)
               AS n_priorities,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    """,
)
def window_count_distinct(spark, sf_dir):
    """Distinct count over a window partition. Spark disallows
    COUNT(DISTINCT) as a window function outright — the standard rewrite
    is size(collect_set()) over the same partition, which keeps one
    shuffle and a bounded per-group set (priority domain is tiny). For
    high-cardinality columns the scale path is approx_count_distinct over
    a groupBy joined back, not a per-row window."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("bigint")
        .alias("n_priorities"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    )


@register(
    "dq_anomaly_zscore",
    """
    WITH s AS (SELECT event_type,
                      avg(value)         AS m,
                      stddev_samp(value) AS sd
               FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round(e.value, 4)                 AS value,
           round((e.value - s.m) / s.sd, 3)  AS z
    FROM events e JOIN s USING (event_type)
    WHERE s.sd > 0 AND abs(e.value - s.m) / s.sd > 2.5
    """,
)
def dq_anomaly_zscore(spark, sf_dir):
    """Statistical anomaly detection: events whose value is > 2.5 sample
    standard deviations from their event_type's mean — the data-quality
    outlier gate an ingestion pipeline runs before training-data curation.

    Scale shape: the stats table is |event_type|-sized (tiny), so it's a
    map-side-combinable aggregate followed by a BROADCAST join back onto
    the fact — never a window over partitionBy(event_type), which would
    shuffle the whole fact by a low-cardinality (skew-prone) key."""
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("sd") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 3).alias("z"),
        )
    )


@register(
    "scalar_url_fns",
    """
    WITH u AS (SELECT doc_id,
                      'https://' || source || '.example.com/docs/' ||
                      CAST(doc_id AS VARCHAR) || '?lang=' || lang ||
                      '&ref=spark' AS url
               FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^https://([^/]+)/', 1)   AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)    AS lang_param
    FROM u
    """,
)
def scalar_url_fns(spark, sf_dir):
    """URL parsing surface (web-crawl pipelines live on this): build a
    canonical URL per document, then extract host / path / query param
    with Spark's JVM-side ``parse_url`` — oracle twin uses regexes that
    match parse_url's RFC semantics for these shapes. Pure map-only
    projection, zero shuffles."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&ref=spark"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "agg_bitmap_distinct",
    """
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counting via roaring-style bitmap aggregates
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_count, Spark 3.5+) — the scale pattern BETWEEN naive
    count(distinct) and HLL sketches: exact like the former, mergeable
    fixed-width state like the latter. At 100 TB the per-(group, bucket)
    bitmaps are buildable once, persistable, and any rollup lattice is
    served by OR-merging them (the same serving shape as
    agg_hll_mergeable but with zero error, for bounded-int keys).

    Two map-side-combinable shuffles: (group, bucket) → 4 KB bitmap
    blobs, then group → summed cardinalities; the exchange carries
    bitmaps, never raw keys. Oracle is the exact distinct count — this
    is the rare 'approximate-shaped' plan with an exact answer.

    Exec note (r15): bitmap_construct_agg's binary buffer is neither
    HashAggregate- nor ObjectHashAggregate-eligible, so both phases plan
    as SortAggregate. Acceptable here — the input is one sorted-once
    scan projection — but for a sort-hostile fan-out use the 64-bit
    word-packed bit_or variant instead (graph_harmonic_landmarks' le3,
    A/B'd 20% faster there), which stays in codegen'd HashAggregate."""
    li = _t(spark, sf_dir, "lineitem")
    per_bucket = (
        li.select(
            "l_returnflag",
            F.expr("bitmap_bucket_number(l_orderkey)").alias("bkt"),
            F.expr("bitmap_bit_position(l_orderkey)").alias("pos"),
        )
        .groupBy("l_returnflag", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_distinct")
        )
    )


@register(
    "cdc_scd2_build",
    """
    WITH ch AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ), changes AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey FROM ch
      WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    )
    SELECT o_custkey                        AS custkey,
           o_orderstatus                    AS status,
           o_orderdate                      AS valid_from,
           lead(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                                            AS valid_to,
           lead(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             IS NULL                        AS is_current
    FROM changes
    """,
)
def cdc_scd2_build(spark, sf_dir):
    """Slowly-changing-dimension type 2 build — collapse a change stream
    (per-customer order-status history) into validity intervals
    [valid_from, valid_to) with an is_current flag: the warehouse pattern
    every CDC ingestion lands in. Composition: change detection (lag ≠
    current → gaps-and-islands edge) then interval closing (lead), BOTH
    window passes over the same (custkey, date, key) ordering — Spark
    plans ONE exchange + sort and evaluates both Window operators on the
    co-sorted stream, so the whole build is a single shuffle at any
    scale. Ties on o_orderdate are broken by o_orderkey, making the
    intervals deterministic under any partitioning."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select(
            "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey",
            F.lag("o_orderstatus").over(w).alias("prev_status"),
        )
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w2)
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "join_range_binned",
    """
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sigma
      FROM hourly GROUP BY 1
    ), incidents AS (
      SELECT h.event_type, h.h AS w_start,
             h.h + INTERVAL '90 minutes' AS w_end
      FROM hourly h JOIN stats s USING (event_type)
      WHERE s.sigma > 0 AND (h.n - s.mu) / s.sigma >= 2.0
    )
    SELECT i.event_type                  AS incident_type,
           i.w_start                     AS window_start,
           count(*)                      AS n_events,
           count(DISTINCT e.event_type)  AS n_types
    FROM incidents i JOIN events e
      ON e.ts >= i.w_start AND e.ts < i.w_end
    GROUP BY 1, 2
    """,
)
def join_range_binned(spark, sf_dir):
    """Point-in-interval join with NO equi-key — the shape that, written
    naively, is a broadcast-nested-loop over the fact table. The scale
    rewrite: quantize time into 30-minute bins (gcd of the hour-aligned
    starts and 90-minute length), EXPLODE each interval into the ≤3 bins
    it covers, equi-join events on their bin, then apply the exact
    range predicate as a residual filter. The cross product is replaced
    by a hash shuffle keyed on time bins whose fan-out is (intervals
    overlapping each bin), and the residual runs codegen-side. The same
    bin-quantization trick generalizes to any bounded-length interval
    join (IP ranges, genomic intervals, ad attribution windows).

    The intervals themselves are derived, not synthetic: per-type hourly
    z-scores >= 2 flag 'incident' hours (the dq_anomaly_zscore chassis),
    and the join asks which events — of ANY type — fell inside each
    incident's 90-minute blast window.

    r16-opt (guide §2.4): the hourly grid fans into the stats aggregate
    AND the incidents join, so its events scan+aggregate ran twice (plus
    the probe-side scan: 6 FileScans before). One localCheckpoint of the
    (type, hour) grid leaves exactly two events passes — the aggregate
    and the probe — which is the floor for this two-grain shape."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(materialize)
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sigma")
    )
    incidents = (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(
            (F.col("sigma") > 0)
            & ((F.col("n") - F.col("mu")) / F.col("sigma") >= 2.0)
        )
        .select(
            "event_type",
            F.col("h").alias("w_start"),
            (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("w_end"),
        )
    )
    # explode each interval into the 30-min bins it covers (3 bins: the
    # interval is 90 min and starts on an hour boundary)
    binned_i = incidents.select(
        "event_type", "w_start", "w_end",
        F.explode(
            F.sequence(
                F.col("w_start"),
                F.col("w_end") - F.expr("INTERVAL 30 MINUTES"),
                F.expr("INTERVAL 30 MINUTES"),
            )
        ).alias("bin"),
    )
    binned_e = ev.select(
        "ts",
        F.col("event_type").alias("e_type"),
        F.timestamp_seconds(
            (F.unix_timestamp("ts") / 1800).cast("bigint") * 1800
        ).alias("bin"),
    )
    return (
        binned_i.join(binned_e, "bin")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .groupBy(
            F.col("event_type").alias("incident_type"),
            F.col("w_start").alias("window_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("e_type").alias("n_types"),
        )
    )


@register(
    "timeseries_gap_fill",
    """
    WITH base AS (
      SELECT user_id, date_trunc('day', ts) AS bucket,
             count(*) AS n_events,
             arg_max(value, event_id) AS last_value
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM base GROUP BY 1
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket
      FROM spans
    ), joined AS (
      SELECT s.user_id, s.bucket,
             CAST(COALESCE(b.n_events, 0) AS BIGINT) AS n_events,
             b.last_value,
             b.bucket IS NULL AS is_gap
      FROM spine s LEFT JOIN base b
        ON b.user_id = s.user_id AND b.bucket = s.bucket
    )
    SELECT user_id, bucket, n_events, is_gap,
           last_value(last_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM joined
    """,
)
def timeseries_gap_fill(spark, sf_dir):
    """Gap-filled daily series with forward fill — the time-series
    resample every metrics/feature pipeline needs: per user, a dense
    daily spine from their first to last active day (sequence + explode —
    bounded fan-out, never a calendar cross join), left-joined to the
    observed per-day aggregate; missing days carry n_events = 0, an
    is_gap flag, and the last observed value forward-filled by a
    last(ignorenulls) running window. 'Last observed' is pinned
    deterministically to the max event_id within the bucket (max_by), so
    both engines agree bit-for-bit without timestamp tie-break hazards.

    Scale shape: the per-day aggregate and the span bounds are combinable
    groupBys; the spine explode fans out at most span-days per user; the
    fill is a window partitioned BY USER — cardinality = user count, so
    the sort spreads across executors and no global sort exists. At 100
    TB (billions of users × bounded spans) every stage keys on user_id —
    one co-partitioned lineage end-to-end.

    r16-opt (guide §2.4): the per-(user, day) base grid fans into the
    span aggregate AND the spine's left join — lazy, the events pass ran
    twice (before-plan: 4 FileScans). Checkpoint the active-user-day
    grid once; one pass over the data."""
    ev = _t(spark, sf_dir, "events")
    base = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("value", "event_id").alias("last_value"),
        )
        .transform(materialize)
    )
    spans = base.groupBy("user_id").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    spine = spans.select(
        "user_id",
        F.explode(F.sequence("b0", "b1", F.expr("interval 1 day"))).alias(
            "bucket"
        ),
    )
    joined = spine.join(base, ["user_id", "bucket"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
        F.last("last_value", ignorenulls=True).over(w).alias("value_filled"),
    )


# ---------------------------------------------------------------------------
# Interval-overlap join: BOTH sides are intervals (join_range_binned's
# point-in-interval cousin) — ad-attribution / genomic / incident-overlap
# shape.
# ---------------------------------------------------------------------------

IVL_LEN_MIN = 45  # both interval families are 45 minutes long
_IVL_W_US = IVL_LEN_MIN * 60 * 1_000_000  # bin width == max interval length


@register(
    "join_interval_overlap",
    f"""
    WITH a AS (
      SELECT event_id AS a_id, user_id, ts AS a_start,
             ts + INTERVAL {IVL_LEN_MIN} MINUTE AS a_end
      FROM events WHERE event_type = 'error'
    ), b AS (
      SELECT event_id AS b_id, user_id, ts AS b_start,
             ts + INTERVAL {IVL_LEN_MIN} MINUTE AS b_end
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.a_id, b.b_id, a.user_id,
           epoch_us(least(a.a_end, b.b_end))
             - epoch_us(greatest(a.a_start, b.b_start)) AS overlap_us
    FROM a JOIN b
      ON a.user_id = b.user_id
     AND a.a_start <= b.b_end AND b.b_start <= a.a_end
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap equi-ish join: per user, every (error window ×
    purchase window) pair of 45-minute intervals that overlap — BOTH
    sides are ranges, so even with the user equi-key the time predicate
    is pure inequality and a naive plan degenerates into a per-user
    nested loop (quadratic in events-per-user; fatal for the heavy-user
    tail at 100 TB).

    The scale rewrite: quantize time into bins of width == the maximum
    interval length, explode each interval into the <= 2 bins it touches,
    hash-join on (user, bin), then apply the exact overlap predicate as
    a codegen residual. Every overlapping pair shares the bin containing
    max(a_start, b_start), so each pair is emitted EXACTLY ONCE by
    keeping only that canonical reporting bin — no distinct, no
    post-shuffle dedup (the trick that makes the fan-out join
    duplicate-free by construction). Overlap length is integer
    microseconds (unix_micros ≡ epoch_us) — exact in both engines; the
    oracle is the naive inequality join, proving the binned plan loses
    and invents nothing."""
    ev = _t(spark, sf_dir, "events")
    end = F.col("ts") + F.expr(f"INTERVAL {IVL_LEN_MIN} MINUTE")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("ts").alias("a_start"),
        end.alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_start"),
        end.alias("b_end"),
    )

    def binned(df, start, endc):
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start)) / _IVL_W_US),
                    F.floor(F.unix_micros(F.col(endc)) / _IVL_W_US),
                )
            ),
        )

    ab = binned(a, "a_start", "a_end")
    bb = binned(b, "b_start", "b_end")
    canonical = F.floor(
        F.greatest(F.unix_micros("a_start"), F.unix_micros("b_start")) / _IVL_W_US
    )
    return (
        ab.join(bb, (ab.user_id == bb.b_user) & (ab.bin == bb.bin))
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
            & (ab.bin == canonical)
        )
        .select(
            "a_id",
            "b_id",
            "user_id",
            (
                F.unix_micros(F.least("a_end", "b_end"))
                - F.unix_micros(F.greatest("a_start", "b_start"))
            ).alias("overlap_us"),
        )
    )


# ---------------------------------------------------------------------------
# Histogram drift between snapshots — the data-quality monitor that
# catches DISTRIBUTION change where dq_anomaly_zscore only sees volume.
# ---------------------------------------------------------------------------

DRIFT_CUTOFF = "2024-01-16"  # reference window = first half of the month
DRIFT_BINS = 16
DRIFT_BIN_W = 32  # value range is [0, ~500); 16 bins of width 32


@register(
    "dq_drift_histogram",
    f"""
    WITH binned AS (
      SELECT event_type,
             least({DRIFT_BINS - 1}, CAST(floor(value / {DRIFT_BIN_W}) AS INT))
                 AS bin,
             CASE WHEN ts < TIMESTAMP '{DRIFT_CUTOFF}' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ), cnt AS (
      SELECT event_type, bin,
             CAST(sum(is_ref) AS BIGINT)     AS c_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS c_cur
      FROM binned GROUP BY event_type, bin
    ), tot AS (
      SELECT event_type,
             CAST(sum(c_ref) AS BIGINT) AS n_ref,
             CAST(sum(c_cur) AS BIGINT) AS n_cur
      FROM cnt GROUP BY event_type
    )
    SELECT c.event_type,
           t.n_ref, t.n_cur,
           CAST(sum(abs(c.c_ref * t.n_cur - c.c_cur * t.n_ref)) AS BIGINT)
               AS l1_num,
           CAST(max(abs(c.c_ref * t.n_cur - c.c_cur * t.n_ref)) AS BIGINT)
               AS worst_num,
           round(sum(abs(c.c_ref * t.n_cur - c.c_cur * t.n_ref))
                 / CAST(t.n_ref * t.n_cur AS DOUBLE), 6)        AS l1_drift
    FROM cnt c JOIN tot t USING (event_type)
    WHERE t.n_ref > 0 AND t.n_cur > 0
    GROUP BY c.event_type, t.n_ref, t.n_cur
    """,
)
def dq_drift_histogram(spark, sf_dir):
    """Distribution-drift monitor: per event type, the L1 (total
    variation ×2) distance between the `value` histograms of a reference
    window (before {DRIFT_CUTOFF}) and the current window — the
    train/serve skew check every feature pipeline runs, here over fixed
    equi-width bins so the two snapshots are comparable without a
    quantile pass.

    Determinism device: the drift Σ|p_i − q_i| is computed as the
    INTEGER sum Σ|c_ref_i·N_cur − c_cur_i·N_ref| with a single final
    division by N_ref·N_cur — no float accumulation anywhere, so both
    engines agree bit-for-bit before the one rounded division.

    Scale shape: one combinable (type, bin) count — the histogram is
    |types|×|bins| rows regardless of corpus size — then a broadcast
    totals join and a second tiny aggregation; the events scan reads
    three columns and everything wide is map-side partial-aggregated.
    PSI would need ln(p/q) (banned transcendental in both-engine
    chains); L1 carries the same signal for monitoring thresholds."""
    ev = _t(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.least(
            F.lit(DRIFT_BINS - 1),
            F.floor(F.col("value") / DRIFT_BIN_W).cast("int"),
        ).alias("bin"),
        F.when(F.col("ts") < F.lit(DRIFT_CUTOFF).cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    # r16-opt (guide §2.4): the histogram grid fans into the totals
    # aggregate AND the decoration join — lazy, the events pass ran
    # twice (before-plan: 4 FileScans). Checkpoint the |types|x|bins|
    # grid once; one pass over the data.
    cnt = (
        binned.groupBy("event_type", "bin")
        .agg(
            F.sum("is_ref").alias("c_ref"),
            F.sum(1 - F.col("is_ref")).alias("c_cur"),
        )
        .transform(materialize)
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    diff = F.abs(F.col("c_ref") * F.col("n_cur") - F.col("c_cur") * F.col("n_ref"))
    return (
        cnt.join(F.broadcast(tot), "event_type")
        .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(
            F.sum(diff).alias("l1_num"),
            F.max(diff).alias("worst_num"),
            F.round(
                F.sum(diff) / (F.col("n_ref") * F.col("n_cur")).cast("double"), 6
            ).alias("l1_drift"),
        )
        .select(
            "event_type", "n_ref", "n_cur", "l1_num", "worst_num", "l1_drift"
        )
    )


@register(
    "agg_least_squares",
    """
    WITH pts AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT)      AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ), s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT)    AS n,
             CAST(sum(x) AS BIGINT)      AS sx,
             CAST(sum(y) AS BIGINT)      AS sy,
             CAST(sum(x * x) AS BIGINT)  AS sxx,
             CAST(sum(x * y) AS BIGINT)  AS sxy
      FROM pts GROUP BY 1
    )
    SELECT l_returnflag, n, sx, sy, sxx, sxy,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
               AS intercept
    FROM s
    """,
)
def agg_least_squares(spark, sf_dir):
    """Exact simple linear regression (price ~ quantity per return flag)
    via the integer normal equations — the regr_slope/regr_intercept
    surface, but EXACT: x and y are integer-rounded, the five sufficient
    statistics (n, Sx, Sy, Sxx, Sxy) are exact int64 sums, and slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) divides two identical integers in
    both engines, so even the doubles hash-match (IEEE division of equal
    operands; the one float op happens LAST, the proven device — unlike
    native regr_* whose running-mean float accumulation is
    summation-order-dependent and engine-specific).

    Scale shape: one map-side-combinable groupBy carrying five int64
    partials — the canonical distributed-regression shape (any number of
    partitions, one tiny exchange). Overflow headroom at the tested
    scales: |n*Sxy| < 5e17 at sf0.1 with ~2e18 int64 margin; a 100 TB
    deployment lifts the partials to DECIMAL(38,0) (Spark and DuckDB
    both support it for exact sums) or centers x/y first — noted here
    because the sufficient-statistics SHAPE is what survives scale, not
    the int64 width."""
    pts = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round("l_extendedprice").cast("bigint").alias("y"),
    )
    s = pts.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return s.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "dq_expectation_suite",
    """
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS null_cust,
             CAST(count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
                  AS BIGINT) AS bad_status,
             CAST(count(*) FILTER (o_totalprice < 0) AS BIGINT) AS neg_price,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
             CAST(count(*) FILTER (o_orderdate < TIMESTAMP '1990-01-01')
                  AS BIGINT) AS stale_dates,
             CAST(count(*) FILTER (o_orderdate >= TIMESTAMP '2000-01-01')
                  AS BIGINT) AS post_y2k
      FROM orders
    )
    SELECT e.expectation, e.observed, e.threshold, e.op,
           CASE WHEN e.op = 'ge' THEN e.observed >= e.threshold
                ELSE e.observed <= e.threshold END AS passed
    FROM m, LATERAL (VALUES
      ('row_count_min',        m.n_rows,      CAST(1000 AS BIGINT), 'ge'),
      ('custkey_not_null',     m.null_cust,   CAST(0 AS BIGINT),    'le'),
      ('status_in_set',        m.bad_status,  CAST(0 AS BIGINT),    'le'),
      ('totalprice_nonneg',    m.neg_price,   CAST(0 AS BIGINT),    'le'),
      ('orderkey_unique',      m.dup_keys,    CAST(0 AS BIGINT),    'le'),
      ('orderdate_not_stale',  m.stale_dates, CAST(0 AS BIGINT),    'le'),
      ('orderdate_before_y2k', m.post_y2k,    CAST(0 AS BIGINT),    'le')
    ) AS e(expectation, observed, threshold, op)
    """,
)
def dq_expectation_suite(spark, sf_dir):
    """Great-Expectations-style expectation SUITE — the dq family's batch
    shape: seven named expectations (row-count floor, completeness,
    set-membership, range, uniqueness, staleness, and a deliberately
    failing freshness bound, so the verdict column is demonstrably not
    hardcoded) evaluated in ONE pass over the table and emitted
    long-format as (expectation, observed, threshold, op, passed) — the
    layout a quality dashboard or circuit-breaker consumes. Differs from
    dq_constraints (one wide row, three cross-table checks): this is the
    n-expectations-one-scan pattern where adding an expectation adds a
    conditional aggregate, not a job.

    Scale shape: every metric is a conditional count fused into a single
    aggregate over one scan (count(DISTINCT) rides the same exchange via
    expand), then a 1-row→7-row explode — driver never sees data, adding
    expectations never adds scans. At 100 TB this is the difference
    between a nightly DQ job that reads the table once and one that reads
    it per-check."""
    o = table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(F.col("o_custkey").isNull()).cast("bigint").alias("null_cust"),
        F.count_if(~F.col("o_orderstatus").isin("O", "F", "P"))
        .cast("bigint")
        .alias("bad_status"),
        F.count_if(F.col("o_totalprice") < 0).cast("bigint").alias("neg_price"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_keys"),
        F.count_if(F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("stale_dates"),
        F.count_if(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("post_y2k"),
    )
    rows = [
        ("row_count_min", "n_rows", 1000, "ge"),
        ("custkey_not_null", "null_cust", 0, "le"),
        ("status_in_set", "bad_status", 0, "le"),
        ("totalprice_nonneg", "neg_price", 0, "le"),
        ("orderkey_unique", "dup_keys", 0, "le"),
        ("orderdate_not_stale", "stale_dates", 0, "le"),
        ("orderdate_before_y2k", "post_y2k", 0, "le"),
    ]
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("expectation"),
                F.col(col).alias("observed"),
                F.lit(thr).cast("bigint").alias("threshold"),
                F.lit(op).alias("op"),
            )
            for name, col, thr, op in rows
        ]
    )
    e = m.select(F.explode(structs).alias("e")).select("e.*")
    return e.withColumn(
        "passed",
        F.when(F.col("op") == "ge", F.col("observed") >= F.col("threshold")).otherwise(
            F.col("observed") <= F.col("threshold")
        ),
    )


# ---------------------------------------------------------------------------
# Spatial grid join — 2-D proximity pairs via cell binning + one-side
# replication (the geospatial radius-join shape)
# ---------------------------------------------------------------------------

GRID_SPAN = 1000  # points live on a [0, 1000) x [0, 1000) plane
CHEB_R = 16  # pair iff Chebyshev (L-inf) distance <= R; cell width == R
SPATIAL_PT_MOD = 5  # points = events with event_id % 5 == 0


@register(
    "join_spatial_grid",
    f"""
    WITH pts AS (
      SELECT event_id AS id,
             (user_id * 37 + event_id * 13) % {GRID_SPAN} AS x,
             (event_id * 59 + user_id * 7) % {GRID_SPAN} AS y
      FROM events WHERE event_id % {SPATIAL_PT_MOD} = 0
    )
    SELECT a.id AS a_id, b.id AS b_id,
           greatest(abs(a.x - b.x), abs(a.y - b.y)) AS cheb
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND abs(a.x - b.x) <= {CHEB_R} AND abs(a.y - b.y) <= {CHEB_R}
    """,
)
def join_spatial_grid(spark, sf_dir):
    """Spatial proximity self-join — the geospatial radius-join shape
    (store/competitor proximity, sensor clustering, geo-dedup): all point
    pairs within Chebyshev distance CHEB_R on a {GRID_SPAN}x{GRID_SPAN}
    plane (points derived deterministically from events). The naive form
    is a quadratic inequality join; the scale rewrite extends
    join_interval_overlap's binning to 2-D: the plane is tiled into
    cells of width CHEB_R, the LEFT side keeps only its home cell, the
    RIGHT side replicates into its 3x3 cell neighborhood (bounded 9x
    fan-out), candidates meet in an equi-join on (cell_x, cell_y), and
    the exact |dx|<=R AND |dy|<=R predicate runs as a codegen residual.
    Exactly-once by construction: a qualifying pair (a.id < b.id) meets
    in precisely ONE cell — a's unique home cell, which b's replicas
    cover because cell width == R — so no distinct / post-join dedup.
    The oracle is the naive inequality join, proving the grid plan loses
    and invents nothing.

    Scale shape: one shuffle per side on the compound cell key (hash
    join, never a nested loop — the plan a 100 TB geo table needs);
    replication factor is a constant 9 on one side only (choose the
    smaller side in production — here the join is a self-join so it's
    symmetric); per-cell occupancy is bounded by point density x R², the
    knob a real deployment tunes by picking cell width ~ radius. Skewed
    hot cells (urban centers) would AQE-split like any skewed hash key
    (join_skew_aqe's device)."""
    pts = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % SPATIAL_PT_MOD == 0)
        .select(
            F.col("event_id").alias("id"),
            ((F.col("user_id") * 37 + F.col("event_id") * 13) % GRID_SPAN)
            .alias("x"),
            ((F.col("event_id") * 59 + F.col("user_id") * 7) % GRID_SPAN)
            .alias("y"),
        )
    )
    left = pts.select(
        F.col("id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.floor(F.col("x") / CHEB_R).alias("cx"),
        F.floor(F.col("y") / CHEB_R).alias("cy"),
    )
    right = (
        pts.select(
            F.col("id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.explode(
                F.sequence(
                    F.floor(F.col("x") / CHEB_R) - 1,
                    F.floor(F.col("x") / CHEB_R) + 1,
                )
            ).alias("rcx"),
            F.col("y").alias("_y2"),
        )
        .select(
            "b_id", "bx", "by", "rcx",
            F.explode(
                F.sequence(
                    F.floor(F.col("_y2") / CHEB_R) - 1,
                    F.floor(F.col("_y2") / CHEB_R) + 1,
                )
            ).alias("rcy"),
        )
    )
    return (
        left.join(
            right,
            (F.col("cx") == F.col("rcx"))
            & (F.col("cy") == F.col("rcy"))
            & (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("ax") - F.col("bx")) <= CHEB_R)
            & (F.abs(F.col("ay") - F.col("by")) <= CHEB_R),
        )
        .select(
            "a_id",
            "b_id",
            F.greatest(
                F.abs(F.col("ax") - F.col("bx")),
                F.abs(F.col("ay") - F.col("by")),
            ).alias("cheb"),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov distance — exact distribution-shift monitor
# ---------------------------------------------------------------------------

KS_REF_TYPE = "view"  # reference distribution; every other type compares to it


@register(
    "dq_ks_distance",
    f"""
    WITH ev AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    ref AS (
      SELECT x, CAST(count(*) AS BIGINT) AS cref
      FROM ev WHERE event_type = '{KS_REF_TYPE}' GROUP BY 1
    ),
    cur AS (
      SELECT event_type, x, CAST(count(*) AS BIGINT) AS ccur
      FROM ev WHERE event_type <> '{KS_REF_TYPE}' GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM cur),
    grid AS (
      SELECT event_type, x,
             CAST(sum(cref) AS BIGINT) AS cref,
             CAST(sum(ccur) AS BIGINT) AS ccur
      FROM (
        SELECT t.event_type, r.x, r.cref, CAST(0 AS BIGINT) AS ccur
        FROM types t, ref r
        UNION ALL
        SELECT event_type, x, CAST(0 AS BIGINT) AS cref, ccur FROM cur
      ) GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, x,
             CAST(sum(cref) OVER (PARTITION BY event_type ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cumref,
             CAST(sum(ccur) OVER (PARTITION BY event_type ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cumcur,
             CAST(sum(cref) OVER (PARTITION BY event_type) AS BIGINT) AS n_ref,
             CAST(sum(ccur) OVER (PARTITION BY event_type) AS BIGINT) AS n_cur
      FROM grid
    ),
    d AS (
      SELECT event_type, x, n_ref, n_cur,
             abs(n_cur * cumref - n_ref * cumcur) AS ks_num
      FROM scored
    ),
    pick AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY ks_num DESC, x ASC) AS rn
      FROM d
    )
    SELECT event_type, n_ref, n_cur, ks_num,
           x AS ks_at_x_scaled,
           round(ks_num / (n_ref * n_cur), 6) AS ks_stat
    FROM pick WHERE rn = 1 AND n_ref > 0 AND n_cur > 0
    """,
)
def dq_ks_distance(spark, sf_dir):
    """EXACT two-sample Kolmogorov–Smirnov distance between each event
    type's `value` distribution and the reference type's ('view') — the
    classic training/serving distribution-shift monitor, computed without
    any float ECDF: values are fixed-point int64 (cents), and the KS
    supremum is maximized over the scaled integer
    D_num(x) = |n_cur·cumref(x) − n_ref·cumcur(x)| (the ECDF difference
    times n_ref·n_cur), so Spark and DuckDB compare identical integers;
    the single float op — ks_stat = D_num / (n_ref·n_cur) — divides two
    identical int64s LAST (the proven device). The argmax x is
    deterministic (min x among maxima). Both totals and cumulatives ride
    ONE window partition per type (unbounded frame for n, running frame
    for the ECDF), so no totals join exists.

    Scale shape: the raw table collapses FIRST through a map-side-
    combinable groupBy on (type, value-cent) — at 100 TB the window input
    is |value domain| rows per type (bounded fixed-point grid, ~10^3
    here, ≤10^6 for any real 2-decimal metric), not event rows; the
    per-type window sort is over that tiny grid. One-sided corpora emit
    nothing (gated on n_ref>0 AND n_cur>0) rather than a divide-by-zero,
    matching the oracle exactly.

    r16-opt (guide §2.4): ref and cur were complementary filters over
    the same scan, and cur additionally fanned into the types-distinct
    AND the grid union — THREE full events passes for one bounded grid
    (before-plan: 6 FileScans). The (type, cent) groupBy now runs ONCE
    and checkpoints (grid-sized); ref/cur/types are filters over it.
    Counts partitioned by a filter on the group key are the same counts,
    so the grid — and everything downstream — is bit-identical."""
    g = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(materialize)
    )
    ref = g.filter(F.col("event_type") == KS_REF_TYPE).select(
        "x", F.col("c").alias("cref")
    )
    cur = g.filter(F.col("event_type") != KS_REF_TYPE).select(
        "event_type", "x", F.col("c").alias("ccur")
    )
    types = cur.select("event_type").distinct()
    grid = (
        F.broadcast(types)
        .crossJoin(ref)
        .select(
            "event_type", "x", "cref", F.lit(0).cast("bigint").alias("ccur")
        )
        .unionByName(
            cur.select(
                "event_type", "x", F.lit(0).cast("bigint").alias("cref"), "ccur"
            )
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cref").alias("cref"), F.sum("ccur").alias("ccur"))
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("event_type")
    scored = grid.select(
        "event_type",
        "x",
        F.sum("cref").over(wcum).alias("cumref"),
        F.sum("ccur").over(wcum).alias("cumcur"),
        F.sum("cref").over(wall).alias("n_ref"),
        F.sum("ccur").over(wall).alias("n_cur"),
    ).withColumn(
        "ks_num",
        F.abs(F.col("n_cur") * F.col("cumref") - F.col("n_ref") * F.col("cumcur")),
    )
    wpick = W.partitionBy("event_type").orderBy(F.desc("ks_num"), F.asc("x"))
    return (
        scored.withColumn("rn", F.row_number().over(wpick))
        .filter((F.col("rn") == 1) & (F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            "ks_num",
            F.col("x").alias("ks_at_x_scaled"),
            F.round(F.col("ks_num") / (F.col("n_ref") * F.col("n_cur")), 6).alias(
                "ks_stat"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Semi-structured schema drift — JSON key-set inference between time halves
# ---------------------------------------------------------------------------

DRIFT_SPLIT = "2024-01-16 00:00:00"  # the simulated producer-v2 deploy time
DRIFT_PP_NUM, DRIFT_PP_DEN = 1, 20  # drifted iff presence ratio moves > 5pp


def _drift_payload_sql() -> str:
    """The derived JSON payload, shared verbatim (modulo dialect) by both
    engines: a producer emitting {"k":1} plus type-gated fields, with a
    v2 field deployed, a legacy field retired, and an experiment key
    ramped 30%→50% at DRIFT_SPLIT — the tpch_derived device
    (deterministically derive the relation the op needs; the DETECTOR
    below is what's under test and is fully data-driven)."""
    return f"""
      SELECT event_type, ts,
             '{{"k":1'
             || CASE WHEN event_type = 'purchase'
                     THEN ',"amount":' ||
                          CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
                     ELSE '' END
             || CASE WHEN CAST(round(value * 100) AS BIGINT) >= 750
                     THEN ',"flag":true' ELSE '' END
             || CASE WHEN user_id % 7 = 0
                     THEN ',"sess":' || CAST(user_id AS VARCHAR)
                     ELSE '' END
             || CASE WHEN ts >= TIMESTAMP '{DRIFT_SPLIT}'
                     THEN ',"v2":"b"' ELSE '' END
             || CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}'
                      AND event_type = 'signup'
                     THEN ',"legacy":0' ELSE '' END
             || CASE WHEN user_id % 10 <
                          CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}'
                               THEN 3 ELSE 5 END
                     THEN ',"exp":1' ELSE '' END
             || '}}' AS payload
      FROM events
    """


@register(
    "dq_schema_drift",
    f"""
    WITH pay AS ({_drift_payload_sql()}),
    keyed AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 2 END AS half,
             unnest(json_keys(payload)) AS prop_key
      FROM pay
    ),
    kc AS (
      SELECT event_type, prop_key,
             CAST(count(*) FILTER (half = 1) AS BIGINT) AS c1,
             CAST(count(*) FILTER (half = 2) AS BIGINT) AS c2
      FROM keyed GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type,
             CAST(count(*) FILTER (ts < TIMESTAMP '{DRIFT_SPLIT}') AS BIGINT)
                 AS n1,
             CAST(count(*) FILTER (ts >= TIMESTAMP '{DRIFT_SPLIT}') AS BIGINT)
                 AS n2
      FROM events GROUP BY 1
    )
    SELECT kc.event_type, kc.prop_key, kc.c1, tot.n1, kc.c2, tot.n2,
           CASE WHEN kc.c1 = 0 AND kc.c2 > 0 THEN 'added'
                WHEN kc.c1 > 0 AND kc.c2 = 0 THEN 'removed'
                WHEN {DRIFT_PP_DEN} * abs(kc.c1 * tot.n2 - kc.c2 * tot.n1)
                     > {DRIFT_PP_NUM} * tot.n1 * tot.n2 THEN 'drifted'
                ELSE 'stable' END AS status
    FROM kc JOIN tot ON tot.event_type = kc.event_type
    """,
)
def dq_schema_drift(spark, sf_dir):
    """Semi-structured SCHEMA-DRIFT monitor: infer each event type's JSON
    key set from the payloads themselves (no declared schema — the
    real-world shape of event-bus / webhook feeds), split the corpus at a
    deploy boundary, and classify every (event_type, key) as
    added / removed / drifted / stable. The payload simulates a producer
    migration (a v2 field appears, a legacy field retires, and an
    experiment key ramps 30%→50% of users at DRIFT_SPLIT — exercising
    every status) via a derived relation both engines compute identically
    (the tpch_derived device); the DETECTOR — key-set inference via
    from_json→map_keys (Spark) vs json_keys (DuckDB), presence counts,
    and the integer drift test 20·|c1·n2 − c2·n1| > n1·n2 (presence ratio
    moved more than 5 percentage points, no float division) — is fully
    data-driven. Output is the long-format audit a schema registry or
    ingestion circuit-breaker consumes.

    Scale shape: one scan, key explode (bounded by keys-per-doc, ≤7
    here), then a map-side-combinable groupBy on (type, key) whose output
    is |observed schema| rows — at 100 TB the shuffle carries the SCHEMA,
    not the data; per-type totals are a 5-row broadcast join. Adding a
    monitored feed adds rows, never scans."""
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    payload = F.concat(
        F.lit('{"k":1'),
        F.when(
            F.col("event_type") == "purchase",
            F.concat(F.lit(',"amount":'), cents.cast("string")),
        ).otherwise(F.lit("")),
        F.when(cents >= 750, F.lit(',"flag":true')).otherwise(F.lit("")),
        F.when(
            F.col("user_id") % 7 == 0,
            F.concat(F.lit(',"sess":'), F.col("user_id").cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.col("ts") >= split, F.lit(',"v2":"b"')).otherwise(F.lit("")),
        F.when(
            (F.col("ts") < split) & (F.col("event_type") == "signup"),
            F.lit(',"legacy":0'),
        ).otherwise(F.lit("")),
        F.when(
            F.col("user_id") % 10
            < F.when(F.col("ts") < split, F.lit(3)).otherwise(F.lit(5)),
            F.lit(',"exp":1'),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    keyed = ev.select(
        "event_type",
        F.when(F.col("ts") < split, F.lit(1)).otherwise(F.lit(2)).alias("half"),
        F.explode(
            F.map_keys(F.from_json(payload, "map<string,string>"))
        ).alias("prop_key"),
    )
    # r16-opt (guide §2.4): the totals were a SECOND full events pass
    # (before-plan: 4 FileScans). Every payload contains the constant
    # key "k" exactly once by construction ('{"k":1' is the invariant
    # prefix), so the per-type row totals ARE the key grid's 'k' row:
    # n1/n2 = c1/c2 at prop_key = 'k' — bit-identical, zero extra
    # passes. The key grid itself fans into that derivation AND the
    # decoration join, so it checkpoints (|types|x|keys| rows).
    kc = (
        keyed.groupBy("event_type", "prop_key")
        .agg(
            F.count_if(F.col("half") == 1).cast("bigint").alias("c1"),
            F.count_if(F.col("half") == 2).cast("bigint").alias("c2"),
        )
        .transform(materialize)
    )
    tot = kc.filter(F.col("prop_key") == "k").select(
        "event_type",
        F.col("c1").alias("n1"),
        F.col("c2").alias("n2"),
    )
    joined = kc.join(F.broadcast(tot), "event_type")
    drift_num = DRIFT_PP_DEN * F.abs(
        F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")
    )
    return joined.select(
        "event_type",
        "prop_key",
        "c1",
        "n1",
        "c2",
        "n2",
        F.when((F.col("c1") == 0) & (F.col("c2") > 0), F.lit("added"))
        .when((F.col("c1") > 0) & (F.col("c2") == 0), F.lit("removed"))
        .when(
            drift_num > DRIFT_PP_NUM * F.col("n1") * F.col("n2"), F.lit("drifted")
        )
        .otherwise(F.lit("stable"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Association-rule mining — a-priori support/confidence/lift over baskets
# ---------------------------------------------------------------------------

AR_MINSUP = 2  # absolute pair-support floor (see scale note in docstring)


@register(
    "mine_assoc_rules",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li),
    items AS (
      SELECT p, CAST(count(*) AS BIGINT) AS s_item FROM li GROUP BY 1
    ),
    freq AS (SELECT p FROM items WHERE s_item >= {AR_MINSUP}),
    fb AS (SELECT li.o, li.p FROM li JOIN freq ON freq.p = li.p),
    pairs AS (
      SELECT a.p AS x, b.p AS y, CAST(count(*) AS BIGINT) AS s_pair
      FROM fb a JOIN fb b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
      HAVING count(*) >= {AR_MINSUP}
    ),
    rules AS (
      SELECT x AS antecedent, y AS consequent, s_pair FROM pairs
      UNION ALL
      SELECT y AS antecedent, x AS consequent, s_pair FROM pairs
    )
    SELECT r.antecedent, r.consequent, r.s_pair,
           ia.s_item AS s_ante, ic.s_item AS s_cons, n.n_orders,
           round(r.s_pair / ia.s_item, 6) AS confidence,
           round((r.s_pair * n.n_orders) / (ia.s_item * ic.s_item), 6) AS lift
    FROM rules r
    JOIN items ia ON ia.p = r.antecedent
    JOIN items ic ON ic.p = r.consequent
    CROSS JOIN n
    """,
)
def mine_assoc_rules(spark, sf_dir):
    """Association-rule mining over order baskets (the A-PRIORI shape:
    Agrawal & Srikant, VLDB'94): emit every rule antecedent→consequent
    whose PAIR support clears AR_MINSUP, with exact support counts and
    confidence = supp(a,b)/supp(a), lift = supp(a,b)·N/(supp(a)·supp(b)).
    All supports are exact int64 counts; each ratio is ONE division of
    identical integer products in both engines (numerators/denominators
    stay int64: s_pair·N < 2^63 at any plausible basket scale), so the
    doubles hash-match — the proven last-op-float device.

    Scale shape: the a-priori ladder in DataFrame form — (1) item
    supports from a combinable groupBy; (2) the frequent-item filter
    SEMI-JOINS the basket table BEFORE any pair is generated (here a
    broadcast of |frequent parts|; at 100 TB item supports are
    Zipf-concentrated so this prune is the workhorse, discarding the
    long tail before the quadratic step); (3) pair generation is the
    per-order self-join with C(basket, 2) bounded fan-out (TPC-H ≤7-item
    baskets — the same bound triangle counting rides), partially
    aggregated map-side; (4) rule expansion is a 2× projection union and
    the support lookups are broadcast hash joins against the item table.
    AR_MINSUP is absolute here because the synthetic baskets are uniform
    (support ceiling ~5); production mining sets it RELATIVE
    (s_pair·DEN >= N·NUM, the integer form) — same plan, one literal.
    Nothing is driver-side; no candidate set is ever collected (the
    classic a-priori candidate-generation loop is replaced by the
    shuffle-side HAVING).

    r16-opt (guide §2.4/§3.3): the distinct basket table fans into SIX
    consumers (n_orders, the items support table — itself read three
    times via the freq/ia/ic broadcasts — and both sides of the pair
    self-join), and as one lazy Catalyst subtree it re-ran the lineitem
    scan + distinct once PER consumer: the before-plan carries 22
    FileScans / 58 Exchanges. It now materializes ONCE, o-partitioned
    (repartition("o") before the dedup: HashPartitioning(o) satisfies
    the (o,p) dedup's ClusteredDistribution, so the dedup costs no
    second exchange, and when the stored layout survives — AQE coalesces
    the tiny-SF shuffle away, losing the partitioning info — it also
    co-partitions the pair self-join). The pair join itself is planned
    by size: broadcast when a side's estimate is small, otherwise the
    o-keyed SMJ (the right plan for an SF-linear side; the r13 plan pin
    now asserts the KEYING, not the strategy). The item-support grid
    checkpoints too (three consumers), and so does the rule grid (both
    union orientations — else the quadratic self-join itself runs
    twice). After-plan: 22 FileScans -> 0 (everything reads the
    checkpoints). Interleaved A/B at sf0.1 (median-of-5, same session,
    parity-checked 7146 rows identical): 3.06 -> 2.43 s (first two
    checkpoints), 3.22 -> 2.53 s (final shape, separate session)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .repartition("o")
        .dropDuplicates()
        .transform(materialize)
    )
    n = li.agg(F.countDistinct("o").cast("bigint").alias("n_orders"))
    # the item-support table likewise fans into three consumers (the freq
    # prune plus the ia/ic rule-decoration broadcasts) — materialize the
    # part-count-sized grid once instead of re-aggregating li per consumer
    items = (
        li.groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s_item"))
        .transform(materialize)
    )
    freq = items.filter(F.col("s_item") >= AR_MINSUP).select("p")
    fb = li.join(F.broadcast(freq), "p")
    a = fb.select(F.col("o"), F.col("p").alias("x"))
    b = fb.select(F.col("o"), F.col("p").alias("y"))
    # the rule grid is read by BOTH union orientations — without the
    # checkpoint the quadratic pair self-join itself ran twice (the
    # second SortMergeJoin the r13 plan pin caught at tiny SFs)
    pairs = (
        a.join(b, "o")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s_pair"))
        .filter(F.col("s_pair") >= AR_MINSUP)
        .transform(materialize)
    )
    rules = pairs.select(
        F.col("x").alias("antecedent"), F.col("y").alias("consequent"), "s_pair"
    ).unionAll(
        pairs.select(
            F.col("y").alias("antecedent"), F.col("x").alias("consequent"), "s_pair"
        )
    )
    ia = items.select(F.col("p").alias("antecedent"), F.col("s_item").alias("s_ante"))
    ic = items.select(F.col("p").alias("consequent"), F.col("s_item").alias("s_cons"))
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(n)
        .select(
            "antecedent",
            "consequent",
            "s_pair",
            "s_ante",
            "s_cons",
            "n_orders",
            F.round(F.col("s_pair") / F.col("s_ante"), 6).alias("confidence"),
            F.round(
                (F.col("s_pair") * F.col("n_orders"))
                / (F.col("s_ante") * F.col("s_cons")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Linear interpolation resample — the gap_fill sibling for continuous
# metrics (forward fill answers "what was the state"; interpolation
# answers "what was the level")
# ---------------------------------------------------------------------------


@register(
    "timeseries_interpolate",
    """
    WITH base AS (
      SELECT user_id, date_trunc('day', ts) AS bucket,
             CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM base GROUP BY 1
    ), spine AS (
      SELECT user_id,
             unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket
      FROM spans
    ), joined AS (
      SELECT s.user_id, s.bucket,
             date_diff('day', TIMESTAMP '1970-01-01', s.bucket) AS day,
             b.cents AS obs,
             b.bucket IS NULL AS is_gap
      FROM spine s LEFT JOIN base b
        ON b.user_id = s.user_id AND b.bucket = s.bucket
    ), anchored AS (
      SELECT user_id, bucket, day, obs, is_gap,
             last_value(obs IGNORE NULLS) OVER wp AS prev_c,
             last_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
                 OVER wp AS prev_d,
             first_value(obs IGNORE NULLS) OVER wn AS next_c,
             first_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
                 OVER wn AS next_d
      FROM joined
      WINDOW wp AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket, is_gap,
           CASE WHEN obs IS NOT NULL THEN obs
                WHEN prev_c IS NOT NULL AND next_c IS NOT NULL
                THEN prev_c + ((next_c - prev_c) * (day - prev_d))
                              // (next_d - prev_d)
                ELSE NULL END AS cents_interp
    FROM anchored
    """,
)
def timeseries_interpolate(spark, sf_dir):
    """LINEAR-interpolation resample (the TimescaleDB `interpolate` /
    pandas `interpolate` contract, sibling of timeseries_gap_fill's
    forward fill): per user, a dense daily spine where every missing day
    gets prev + (next − prev)·(t − t_prev)/(t_next − t_prev) between its
    surrounding observations, exact in int64 cents — and days outside
    the observed range stay NULL rather than inventing level.
    Cross-engine exactness: the delta numerator CAN be negative, and
    BOTH engines' integer division truncates toward zero (DuckDB
    `-7 // 2 = -3`, empirically pinned, same as Spark's `div`), so the
    quotient is identical with no floor/truncate gap to bridge. Both
    anchors ride one partition's two mirrored windows (last IGNORE NULLS
    over preceding / first IGNORE NULLS over following).

    Scale shape: identical to gap_fill's — combinable per-day groupBy,
    bounded spine explode (span-days per user, never a calendar cross
    join), windows partitioned by user so the sort spreads by key
    cardinality. The interpolation adds NO pass: both anchor columns and
    the arithmetic live in the same two window frames over the same
    exchange.

    r16-opt (guide §2.4): same base-grid fan-out as timeseries_gap_fill
    (span aggregate + spine join) — the checkpoint makes it one events
    pass (before-plan: 4 FileScans)."""
    ev = _t(spark, sf_dir, "events")
    base = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.round(F.expr("max_by(value, event_id)") * 100)
            .cast("bigint")
            .alias("cents")
        )
        .transform(materialize)
    )
    spans = base.groupBy("user_id").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    spine = spans.select(
        "user_id",
        F.explode(
            F.sequence("b0", "b1", F.expr("INTERVAL 1 DAY"))
        ).alias("bucket"),
    )
    joined = spine.join(base, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.datediff("bucket", F.lit("1970-01-01")).alias("day"),
        F.col("cents").alias("obs"),
        F.col("cents").isNull().alias("is_gap"),
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("obs").isNotNull(), F.col("day"))
    anchored = joined.select(
        "user_id",
        "bucket",
        "day",
        "obs",
        "is_gap",
        F.last("obs", ignorenulls=True).over(wp).alias("prev_c"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("obs", ignorenulls=True).over(wn).alias("next_c"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("next_d"),
    )
    lerp = F.expr("((next_c - prev_c) * (day - prev_d)) div (next_d - prev_d)")
    return anchored.select(
        "user_id",
        "bucket",
        "is_gap",
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(
            F.col("prev_c").isNotNull() & F.col("next_c").isNotNull(),
            F.col("prev_c") + lerp,
        )
        .alias("cents_interp"),
    )


# ---------------------------------------------------------------------------
# Mann–Whitney rank-sum test — the rank-based two-sample companion to
# dq_ks_distance (KS asks "do the CDFs differ anywhere"; U asks "does one
# sample stochastically dominate")
# ---------------------------------------------------------------------------


@register(
    "dq_mann_whitney",
    f"""
    WITH ev AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    ref AS (
      SELECT x, CAST(count(*) AS BIGINT) AS cref
      FROM ev WHERE event_type = '{KS_REF_TYPE}' GROUP BY 1
    ),
    cur AS (
      SELECT event_type, x, CAST(count(*) AS BIGINT) AS ccur
      FROM ev WHERE event_type <> '{KS_REF_TYPE}' GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM cur),
    grid AS (
      SELECT event_type, x,
             CAST(sum(cref) AS BIGINT) AS cref,
             CAST(sum(ccur) AS BIGINT) AS ccur
      FROM (
        SELECT t.event_type, r.x, r.cref, CAST(0 AS BIGINT) AS ccur
        FROM types t, ref r
        UNION ALL
        SELECT event_type, x, CAST(0 AS BIGINT) AS cref, ccur FROM cur
      ) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, x, cref, ccur,
             CAST(sum(cref + ccur) OVER (PARTITION BY event_type ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS below
      FROM grid
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(cref) AS BIGINT) AS n_ref,
             CAST(sum(ccur) AS BIGINT) AS n_cur,
             CAST(sum(cref * (2 * COALESCE(below, 0) + (cref + ccur) + 1))
                  AS BIGINT) AS r2_ref,
             CAST(sum(ccur * (2 * COALESCE(below, 0) + (cref + ccur) + 1))
                  AS BIGINT) AS r2_cur
      FROM ranked GROUP BY 1
    )
    SELECT event_type, n_ref, n_cur,
           r2_ref - n_ref * (n_ref + 1) AS u2_ref,
           r2_cur - n_cur * (n_cur + 1) AS u2_cur,
           round((r2_cur - n_cur * (n_cur + 1)) / (2 * n_ref * n_cur), 6)
               AS cles
    FROM agg WHERE n_ref > 0 AND n_cur > 0
    """,
)
def dq_mann_whitney(spark, sf_dir):
    """EXACT Mann–Whitney U (Wilcoxon rank-sum) per event type vs the
    reference distribution — the rank-based location-shift companion to
    dq_ks_distance's sup-CDF statistic. Tie handling is midrank-exact
    without a single float: with counts per distinct value, twice the
    average rank of value x is 2·below(x) + c(x) + 1 (an integer), so
    2R = Σ c_s(x)·(2·below + c + 1) and 2U = 2R − n_s(n_s+1) are exact
    int64 in both engines; the common-language effect size
    CLES = U/(n_ref·n_cur) = P(cur > ref) + ½P(cur = ref) is the ONE
    float — a division of identical integers, LAST. The engine emits
    BOTH sides' 2U; their identity 2U_ref + 2U_cur = 2·n_ref·n_cur holds
    exactly under midranks and is pytest-pinned (a self-checking
    statistic). below(x) is a prefix-exclusive running sum (window to
    1 PRECEDING); totals and the R2 reduction ride the same grouped
    aggregate.

    Scale shape: identical to dq_ks_distance — the raw table collapses
    through a combinable (type, value-cent) groupBy FIRST, so the window
    and final aggregate see the bounded value GRID, not event rows; at
    100 TB the only data-sized operation is the first partial-aggregated
    count. One-sided corpora emit nothing (n gates), matching the
    oracle.

    r16-opt (guide §2.4): same single-pass rewrite as dq_ks_distance
    (see its docstring) — the (type, cent) groupBy runs ONCE and
    checkpoints; ref/cur/types filter the grid instead of re-scanning
    events (before-plan: 6 FileScans -> 0). Bit-identical counts."""
    g = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(materialize)
    )
    ref = g.filter(F.col("event_type") == KS_REF_TYPE).select(
        "x", F.col("c").alias("cref")
    )
    cur = g.filter(F.col("event_type") != KS_REF_TYPE).select(
        "event_type", "x", F.col("c").alias("ccur")
    )
    types = cur.select("event_type").distinct()
    grid = (
        F.broadcast(types)
        .crossJoin(ref)
        .select(
            "event_type", "x", "cref", F.lit(0).cast("bigint").alias("ccur")
        )
        .unionByName(
            cur.select(
                "event_type", "x", F.lit(0).cast("bigint").alias("cref"), "ccur"
            )
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cref").alias("cref"), F.sum("ccur").alias("ccur"))
    )
    wbelow = (
        W.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = grid.withColumn(
        "below",
        F.coalesce(
            F.sum(F.col("cref") + F.col("ccur")).over(wbelow),
            F.lit(0).cast("bigint"),
        ),
    )
    two_avg_rank = 2 * F.col("below") + (F.col("cref") + F.col("ccur")) + 1
    agg = ranked.groupBy("event_type").agg(
        F.sum("cref").cast("bigint").alias("n_ref"),
        F.sum("ccur").cast("bigint").alias("n_cur"),
        F.sum(F.col("cref") * two_avg_rank).cast("bigint").alias("r2_ref"),
        F.sum(F.col("ccur") * two_avg_rank).cast("bigint").alias("r2_cur"),
    )
    u2_ref = F.col("r2_ref") - F.col("n_ref") * (F.col("n_ref") + 1)
    u2_cur = F.col("r2_cur") - F.col("n_cur") * (F.col("n_cur") + 1)
    return agg.filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0)).select(
        "event_type",
        "n_ref",
        "n_cur",
        u2_ref.alias("u2_ref"),
        u2_cur.alias("u2_cur"),
        F.round(u2_cur / (2 * F.col("n_ref") * F.col("n_cur")), 6).alias("cles"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit law — fraud/synthetic-data detector for financial
# columns (Nigrini's digital analysis; the classic audit DQ test)
# ---------------------------------------------------------------------------

# Expected Benford shares log10(1 + 1/d), frozen as 12-decimal string
# literals embedded IDENTICALLY into the Spark expression and the DuckDB
# oracle: both engines parse the same literal and run the same double
# multiply, so there is no cross-engine libm log10 ulp hazard at all.
import math as _math

BENFORD_P = {d: f"{_math.log10(1 + 1 / d):.12f}" for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN CAST('{p}' AS DOUBLE)" for d, p in BENFORD_P.items())
    + " END"
)


def _benford_oracle() -> str:
    def per_col(col_sql: str, src: str, label: str) -> str:
        return f"""
      SELECT '{label}' AS col, CAST(substr(CAST(CAST(floor({col_sql}) AS BIGINT)
                 AS VARCHAR), 1, 1) AS INT) AS digit
      FROM {src} WHERE {col_sql} >= 1"""

    return f"""
    WITH d AS ({per_col("l_extendedprice", "lineitem", "l_extendedprice")}
      UNION ALL {per_col("o_totalprice", "orders", "o_totalprice")}
    ),
    c AS (
      SELECT col, digit, CAST(count(*) AS BIGINT) AS obs FROM d GROUP BY 1, 2
    ),
    t AS (SELECT col, CAST(sum(obs) AS BIGINT) AS n FROM c GROUP BY 1),
    j AS (SELECT c.col, c.digit, c.obs, t.n FROM c JOIN t ON t.col = c.col),
    e AS (
      SELECT col, digit, obs, n,
             CAST(n AS DOUBLE) * {_BENFORD_CASE} AS exp_cnt
      FROM j
    )
    SELECT col, digit, obs, n, round(exp_cnt, 6) AS exp_cnt,
           round((CAST(obs AS DOUBLE) - exp_cnt) * (CAST(obs AS DOUBLE) - exp_cnt)
                 / exp_cnt, 6) AS chi2_term
    FROM e
    """


@register("dq_benford", _benford_oracle())
def dq_benford(spark, sf_dir):
    """Benford first-digit conformance per financial column — Nigrini's
    digital-analysis audit test: genuine multiplicative-growth amounts
    have first significant digit d with probability log10(1 + 1/d);
    fabricated or truncated-range data doesn't. Emits, per (column,
    digit): the observed count, the column total, the Benford-expected
    count, and the χ² term (obs − exp)²/exp — the per-digit evidence an
    auditor reads (digit 1 under-representation is the classic
    fabrication tell). The expected shares are 12-decimal literals
    frozen at module import and embedded IDENTICALLY in both engines'
    expressions, so the only floats are one multiply and one
    squared-difference ratio over bit-identical operands, rounded LAST;
    everything upstream is exact int64 (first digit via bigint→string,
    no float log in the data path — values ≥ 1 gate the digit
    extraction).

    Scale shape: each column contributes a map-only digit projection
    (scan-pruned to the one column) into a 9-key combinable groupBy —
    partial aggregation reduces 100 TB to ≤ 9 rows per column
    map-side; the total-join is 9×2 rows. Adding a column adds one
    union branch, never a second scan of an unrelated table.

    r16-opt (guide §2.4): the ≤18-row digit grid fans into the
    per-column total AND the decoration join; lazy, that re-ran both
    scans + the data-sized aggregate twice (before-plan: 8 FileScans).
    One localCheckpoint of the grid makes it one pass over the data
    (after-plan: 0 FileScans — both branch scans run exactly once, at
    checkpoint time). Interleaved A/B at sf0.1 (median-of-5,
    parity-checked 18 rows): 1.85s -> 1.57s."""
    def per_col(tbl: str, col: str):
        return (
            _t(spark, sf_dir, tbl)
            .filter(F.col(col) >= 1)
            .select(
                F.lit(col).alias("col"),
                F.substring(
                    F.floor(F.col(col)).cast("bigint").cast("string"), 1, 1
                )
                .cast("int")
                .alias("digit"),
            )
        )

    d = per_col("lineitem", "l_extendedprice").unionByName(
        per_col("orders", "o_totalprice")
    )
    c = (
        d.groupBy("col", "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
        .transform(materialize)
    )
    t = c.groupBy("col").agg(F.sum("obs").cast("bigint").alias("n"))
    j = c.join(F.broadcast(t), "col")
    exp_cnt = F.col("n").cast("double") * F.expr(_BENFORD_CASE)
    e = j.select("col", "digit", "obs", "n", exp_cnt.alias("exp_cnt"))
    obs_d = F.col("obs").cast("double")
    return e.select(
        "col",
        "digit",
        "obs",
        "n",
        F.round(F.col("exp_cnt"), 6).alias("exp_cnt"),
        F.round(
            (obs_d - F.col("exp_cnt")) * (obs_d - F.col("exp_cnt"))
            / F.col("exp_cnt"),
            6,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# first-order Markov transition matrix over per-customer order sequences —
# the SEQUENTIAL companion to mine_assoc_rules' co-occurrence baskets
# ---------------------------------------------------------------------------


@register(
    "mine_transition_matrix",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderpriority,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_priority
      FROM orders
    ),
    tr AS (
      SELECT prev_priority, o_orderpriority AS next_priority,
             CAST(count(*) AS BIGINT) AS cnt
      FROM seq WHERE prev_priority IS NOT NULL GROUP BY 1, 2
    ),
    nr AS (
      SELECT prev_priority, next_priority, cnt,
             CAST(sum(cnt) OVER (PARTITION BY prev_priority) AS BIGINT)
                 AS n_from
      FROM tr
    )
    SELECT prev_priority, next_priority, cnt, n_from,
           round(cnt / CAST(n_from AS DOUBLE), 6) AS prob
    FROM nr
    """,
)
def mine_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over each customer's order
    sequence: P(next priority | previous priority), estimated from
    consecutive order pairs ordered by (o_orderdate, o_orderkey) — the
    orderkey tiebreak makes lag() deterministic in both engines on
    same-day orders. The sequential counterpart to mine_assoc_rules:
    baskets ask "what co-occurs", transitions ask "what follows what" —
    the churn/escalation signal behind next-event prediction and
    anomalous-sequence detection. Counts are exact int64; the row-
    normalized probability divides identical integers LAST, round(6)ed.

    Scale shape: ONE data-sized shuffle — the per-customer sort window
    (the canonical sessionize shape: hash-partition by customer, sort
    within partition; Spark runs lag() without materializing
    sequences). Transition pairs then collapse through a 25-key
    combinable groupBy (map-side partials reduce 100 TB of orders to
    |states|² rows per task), and row totals are a window-sum OVER THE
    25-ROW AGGREGATE — not a self-join back to tr, which would
    duplicate the whole lineage and scan orders twice (Spark re-derives
    unshared subtrees per branch; the plan pin counts exactly one
    FileScan)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.lag("o_orderpriority").over(w).alias("prev_priority"),
    )
    tr = (
        seq.filter(F.col("prev_priority").isNotNull())
        .groupBy("prev_priority", F.col("o_orderpriority").alias("next_priority"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    n_from = (
        F.sum("cnt").over(W.partitionBy("prev_priority")).cast("bigint")
    )
    return tr.withColumn("n_from", n_from).select(
        "prev_priority",
        "next_priority",
        "cnt",
        "n_from",
        F.round(F.col("cnt") / F.col("n_from").cast("double"), 6).alias("prob"),
    )


# ---------------------------------------------------------------------------
# per-column categorical distribution profile: entropy, Gini, concentration
# ---------------------------------------------------------------------------

ENTROPY_COLS = [
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("events", "event_type"),
    ("documents", "lang"),
]


def _entropy_oracle() -> str:
    branches = []
    for tbl, col in ENTROPY_COLS:
        branches.append(f"""
      SELECT '{tbl}.{col}' AS col, CAST(count(*) AS BIGINT) AS c
      FROM {tbl} WHERE {col} IS NOT NULL GROUP BY {col}""")
    union = "\n      UNION ALL ".join(branches)
    return f"""
    WITH c AS ({union}),
    a AS (
      SELECT col,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c * c) AS BIGINT) AS sum_sq,
             sum(c * log2(c)) AS slog,
             CAST(max(c) AS BIGINT) AS max_c
      FROM c GROUP BY col
    )
    SELECT col, n, n_distinct,
           round(log2(n) - slog / n, 6) AS entropy_bits,
           round(1.0 - sum_sq / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
               AS gini,
           round(max_c / CAST(n AS DOUBLE), 6) AS top_share
    FROM a
    """


@register("dq_entropy_profile", _entropy_oracle())
def dq_entropy_profile(spark, sf_dir):
    """Categorical distribution profile per column: Shannon entropy
    (bits), Gini impurity, and top-value concentration — the three
    numbers a data-quality dashboard shows for every enum column
    (near-zero entropy flags a collapsed upstream producer; top_share
    → 1 flags a default-value flood; entropy ≈ log2(n_distinct) means
    uniform). Entropy uses the count identity
    H = log2(n) − (Σ c·log2 c)/n so no per-row probability division;
    Gini = 1 − Σc²/n² keeps Σc² exact int64 with the division LAST,
    and top_share is max(c)/n — exact ints, divided LAST. The log2
    terms are the one float sum (per-column, over ≤|domain| values —
    single digits here), round(6)ed like the repo's other log-family
    scores.

    Scale shape: each column is a scan-pruned map-only projection into
    a |domain|-key combinable groupBy — 100 TB collapses to a handful
    of (value, count) rows map-side; the second aggregate runs over
    those rows only, grouped by the column LABEL so an empty table
    contributes zero rows (never a NULL profile row). Columns from the
    same table still scan independently — at scale you'd fuse the two
    orders columns into one pass with a posexplode(map(...)); kept
    separate here because the per-branch plans stay individually
    scan-pruned and the fused variant saves nothing until the scan
    dominates (documented trade)."""
    parts = []
    for tbl, col in ENTROPY_COLS:
        parts.append(
            _t(spark, sf_dir, tbl)
            .filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .select(F.lit(f"{tbl}.{col}").alias("col"), "c")
        )
    c = parts[0]
    for p in parts[1:]:
        c = c.unionByName(p)
    a = c.groupBy("col").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
        F.sum(F.col("c") * F.log2("c")).alias("slog"),
        F.max("c").cast("bigint").alias("max_c"),
    )
    n_d = F.col("n").cast("double")
    return a.select(
        "col",
        "n",
        "n_distinct",
        F.round(F.log2("n") - F.col("slog") / F.col("n"), 6).alias(
            "entropy_bits"
        ),
        F.round(F.lit(1.0) - F.col("sum_sq") / (n_d * n_d), 6).alias("gini"),
        F.round(F.col("max_c") / n_d, 6).alias("top_share"),
    )


# ---------------------------------------------------------------------------
# cohort retention matrix — the product-analytics triangle chart
# ---------------------------------------------------------------------------


@register(
    "agg_retention_cohort",
    """
    WITH fe AS (
      SELECT o_custkey,
             CAST(min(date_part('year', o_orderdate) * 12
                      + date_part('month', o_orderdate)) AS BIGINT) AS cohort_m
      FROM orders GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT o.o_custkey, fe.cohort_m,
             CAST(date_part('year', o.o_orderdate) * 12
                  + date_part('month', o.o_orderdate) AS BIGINT)
                 - fe.cohort_m AS month_offset
      FROM orders o JOIN fe ON fe.o_custkey = o.o_custkey
    ),
    sz AS (
      SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_size
      FROM fe GROUP BY 1
    ),
    m AS (
      SELECT cohort_m, month_offset, CAST(count(*) AS BIGINT) AS active
      FROM act GROUP BY 1, 2
    )
    SELECT m.cohort_m, m.month_offset, m.active, sz.cohort_size,
           round(m.active / CAST(sz.cohort_size AS DOUBLE), 6) AS retention
    FROM m JOIN sz ON sz.cohort_m = m.cohort_m
    """,
)
def agg_retention_cohort(spark, sf_dir):
    """Cohort retention matrix — the product-analytics triangle chart:
    customers are cohorted by their FIRST order month and each cell
    (cohort, month_offset) counts how many of that cohort ordered again
    offset months later; retention = active / cohort_size. The month
    index is the exact integer year·12 + month (monotone in the date,
    so min(index) ≡ index(min date)), making cohort assignment, offset
    arithmetic, and both counts pure int64 — the retention rate divides
    identical integers LAST, round(6)ed. 51 cohorts × offsets 0–78 at
    sf0.01 — a real triangle, not a degenerate single-cohort corpus
    (the events table's 30-day span collapses to one cohort; orders
    spans seven years, which is why the cohort key is orders).

    Scale shape: first-touch extraction is a customer-keyed combinable
    min-aggregate; activity joins orders back to it ON THE SAME KEY —
    after the first shuffle both sides are hash-partitioned by
    customer, so AQE reuses the partitioning, and the per-(customer,
    cohort, offset) dedup rides the same key before anything
    cohort-keyed exists. Only the final (cohort, offset) aggregate —
    cardinality |cohorts|·|offsets|, not data-sized — changes key; the
    cohort-size join is a broadcast of the |cohorts|-row table. The
    classic mistake at 100 TB is cohorting by a DISTINCT-over-events
    subquery per month — this plan touches orders exactly twice (once
    for first-touch, once for activity) with one data-sized shuffle
    key throughout.

    r16-opt (guide §2.4): the first-touch table fans into the activity
    join AND the cohort-size aggregate, so the lazy subtree ran its
    orders pass twice — the docstring's "exactly twice" was really three
    (before-plan: 6 FileScans). One localCheckpoint of the per-customer
    grid restores the claim: orders is scanned once for first-touch,
    once for activity."""
    o = _t(spark, sf_dir, "orders")
    midx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    fe = (
        o.groupBy("o_custkey")
        .agg(F.min(midx).alias("cohort_m"))
        .transform(materialize)
    )
    act = (
        o.join(fe, "o_custkey")
        .select(
            "o_custkey",
            "cohort_m",
            (midx - F.col("cohort_m")).alias("month_offset"),
        )
        .distinct()
    )
    sz = fe.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    m = act.groupBy("cohort_m", "month_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("active")
    )
    return m.join(F.broadcast(sz), "cohort_m").select(
        "cohort_m",
        "month_offset",
        "active",
        "cohort_size",
        F.round(
            F.col("active") / F.col("cohort_size").cast("double"), 6
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# fixed-period seasonal decomposition — day-of-week means per metric
# ---------------------------------------------------------------------------


@register(
    "dq_seasonal_decompose",
    """
    WITH ev AS (
      SELECT event_type, isodow(ts) - 1 AS dow,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM ev GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS n_all,
             CAST(sum(cents) AS BIGINT) AS cents_all
      FROM d GROUP BY 1
    )
    SELECT d.event_type, d.dow, d.n, d.cents,
           round(d.cents / (100.0 * d.n), 6) AS dow_mean,
           round(d.cents / (100.0 * d.n)
                 - t.cents_all / (100.0 * t.n_all), 6) AS seasonal_dev
    FROM d JOIN t ON t.event_type = d.event_type
    """,
)
def dq_seasonal_decompose(spark, sf_dir):
    """Fixed-period seasonal decomposition of the event value series: per
    (event_type, ISO day-of-week 0=Mon..6=Sun), the observation count,
    the exact cent sum, the day-of-week mean, and the seasonal deviation
    from the type's overall mean — the weekday-effect profile a metrics
    monitor subtracts before anomaly detection (dq_anomaly_zscore's
    z-scores fire on every Saturday dip unless this component is removed
    first; the classical decomposition's seasonal term with a known
    period, no iterative fitting needed). Values collapse to exact int64
    cents first; both means and the deviation are divisions/differences
    of identical integers in both engines, computed LAST and round(6)ed.
    Day-of-week is weekday()'s Monday-0 convention (DuckDB isodow−1) —
    NOT dayofweek(), whose Sunday-1 convention differs between engines'
    locales.

    Scale shape: one map-only (type, dow, cents) projection into a
    |types|·7-key combinable groupBy — 100 TB collapses map-side; the
    overall-mean totals derive from the tiny aggregate itself and join
    broadcast (grid-sized, never a second scan of events)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("weekday(ts)").cast("bigint").alias("dow"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    # r16-opt (guide §2.4): the (type, dow) grid fans into the totals
    # aggregate AND the decoration join — lazy, the events pass ran
    # twice (before-plan: 4 FileScans). Checkpoint the |types|x7 grid;
    # one pass over the data.
    d = (
        ev.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .transform(materialize)
    )
    t = d.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("cents").cast("bigint").alias("cents_all"),
    )
    dow_mean = F.col("cents") / (F.lit(100.0) * F.col("n"))
    all_mean = F.col("cents_all") / (F.lit(100.0) * F.col("n_all"))
    return d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "n",
        "cents",
        F.round(dow_mean, 6).alias("dow_mean"),
        F.round(dow_mean - all_mean, 6).alias("seasonal_dev"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint — most likely level-shift day per metric series
# ---------------------------------------------------------------------------


@register(
    "dq_changepoint_cusum",
    """
    WITH ev AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS x
      FROM ev GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS cents_all
      FROM daily GROUP BY 1
    ),
    c AS (
      SELECT d.event_type, d.day, t.n_days, t.cents_all,
             t.n_days * sum(d.x) OVER w - (row_number() OVER w) * t.cents_all
                 AS s_scaled
      FROM daily d JOIN t ON t.event_type = d.event_type
      WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    r AS (
      SELECT event_type, day AS change_day, n_days, abs(s_scaled) AS s_abs,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(s_scaled) DESC, day ASC) AS rn
      FROM c
    )
    SELECT event_type, change_day, n_days, CAST(s_abs AS BIGINT) AS s_abs,
           round(s_abs / (100.0 * n_days), 6) AS cusum_dollars
    FROM r WHERE rn = 1
    """,
)
def dq_changepoint_cusum(spark, sf_dir):
    """CUSUM changepoint detection per metric series (Page 1954; the
    offline argmax-|CUSUM| estimator): for each event_type's daily value
    series, the single most likely level-shift day — the day t maximizing
    |Σ_{j≤t}(x_j − x̄)|, which for a one-change signal is the maximum-
    likelihood change location. The monitor companion to
    dq_seasonal_decompose (remove the weekly term, then ask WHEN the
    level moved) and dq_drift_histogram (which asks IF two windows
    differ). Exactness device: multiply the deviation sum through by
    n_days — S_t = n_days·cumsum_t − t·total — so the running statistic
    is pure int64 (no mean division inside the scan); ties on |S| break
    to the earliest day via an explicit (|S| DESC, day ASC) row_number
    in both engines; the one float (dollars-scale normalization by
    100·n_days) divides exact integers LAST, round(6)ed.

    Scale shape: daily pre-aggregation collapses the event scan to a
    (type × day)-sized table map-side (combinable sum); the running sum
    and both window ranks run over that tiny grid partitioned by type —
    the shuffle after the first aggregate moves |types|·|days| rows,
    nothing data-sized. Per-type totals are window aggregates over the
    same grid (single scan lineage — plan-pinned). At
    100 TB the only data-sized work is the first combinable groupBy;
    everything downstream is dashboard-cardinality. A 1000-day series
    per type keeps every partition trivially in memory."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("cents").cast("bigint").alias("x")
    )
    # per-type totals as window aggregates over the daily grid — a
    # groupBy-then-join formulation lazily recomputes `daily` and scans
    # events TWICE (measured in the first formulation's plan); this
    # keeps one scan lineage (the chisq/transition-matrix device)
    wt = W.partitionBy("event_type")
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wo = W.partitionBy("event_type").orderBy("day")
    c = (
        daily.withColumn("n_days", F.count(F.lit(1)).over(wt).cast("bigint"))
        .withColumn("cents_all", F.sum("x").over(wt).cast("bigint"))
        .withColumn(
            "s_scaled",
            F.col("n_days") * F.sum("x").over(w)
            - F.row_number().over(wo) * F.col("cents_all"),
        )
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            "n_days",
            F.abs("s_scaled").alias("s_abs"),
        )
    )
    rnw = W.partitionBy("event_type").orderBy(
        F.desc("s_abs"), F.asc("change_day")
    )
    return (
        c.withColumn("rn", F.row_number().over(rnw))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "change_day",
            "n_days",
            F.col("s_abs").cast("bigint").alias("s_abs"),
            F.round(F.col("s_abs") / (F.lit(100.0) * F.col("n_days")), 6).alias(
                "cusum_dollars"
            ),
        )
    )


# ---------------------------------------------------------------------------
# OHLC resampling — open/high/low/close daily bars per metric series
# ---------------------------------------------------------------------------


@register(
    "timeseries_resample_ohlc",
    """
    WITH ev AS (
      SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    w AS (
      SELECT event_type, day, cents,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts ASC, event_id ASC) AS ra,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM ev
    )
    SELECT event_type, day,
           CAST(max(CASE WHEN ra = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT)  AS high_cents,
           CAST(min(cents) AS BIGINT)  AS low_cents,
           CAST(max(CASE WHEN rd = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT)    AS n_events,
           CAST(sum(cents) AS BIGINT)  AS sum_cents
    FROM w GROUP BY 1, 2
    """,
)
def timeseries_resample_ohlc(spark, sf_dir):
    """OHLC bar resampling — the financial/metrics downsample: per
    (event_type, day), the first (open), max (high), min (low), and last
    (close) observed value plus volume and turnover. First/last are
    defined by the TOTAL order (ts, event_id) — event_id uniqueness makes
    the bar deterministic even when two events share a timestamp (a real
    occurrence in microsecond feeds; an ORDER BY ts alone would be
    engine-dependent). Values collapse to exact int64 cents on scan; no
    floats anywhere in the output.

    Scale shape: the Spark side is ONE combinable groupBy — open/close
    via min_by/max_by over the (ts, event_id) struct, which partial-
    aggregates map-side like any min/max (each task keeps one candidate
    per bar; merges compare structs), so the shuffle moves |bars| rows,
    never the event stream. Struct-ordered min_by buffers push Spark to
    SORT-based aggregation (a per-partition sort on the grouping key —
    local CPU, plan-pinned to keep its partial_min_by combine), but the
    exchange stays grid-sized — the property that matters; the window
    formulation the tiny-scale oracle uses would instead hash-partition
    EVERY event to rank rows it then throws away. At 100 TB a
    year of 10k metric series is ~3.7M bars — dashboard-sized output
    from a single scan + single grid-sized exchange, and the scan prunes
    to (event_type, ts, event_id, value)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    return ev.groupBy("event_type", "day").agg(
        F.expr("min_by(cents, struct(ts, event_id))")
        .cast("bigint")
        .alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.expr("max_by(cents, struct(ts, event_id))")
        .cast("bigint")
        .alias("close_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# chi-squared independence — per-cell contribution matrix
# ---------------------------------------------------------------------------


@register(
    "dq_chisq_independence",
    """
    WITH cell AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT pri, CAST(sum(n) AS BIGINT) AS r FROM cell GROUP BY 1),
    ct AS (SELECT st, CAST(sum(n) AS BIGINT) AS c FROM cell GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM cell)
    SELECT cell.pri, cell.st, cell.n, rt.r AS row_total, ct.c AS col_total,
           round(rt.r * ct.c / CAST(tot.big_n AS DOUBLE), 6) AS expected,
           round(
             CAST(tot.big_n * cell.n - rt.r * ct.c AS DOUBLE)
             * CAST(tot.big_n * cell.n - rt.r * ct.c AS DOUBLE)
             / CAST(tot.big_n * rt.r * ct.c AS DOUBLE), 6) AS chisq_contrib
    FROM cell JOIN rt ON rt.pri = cell.pri
              JOIN ct ON ct.st = cell.st
              CROSS JOIN tot
    """,
)
def dq_chisq_independence(spark, sf_dir):
    """Pearson chi-squared independence CONTRIBUTION MATRIX between two
    categorical profile columns (order priority × order status): per
    cell, the observed count, margins, expected count under independence,
    and the cell's (O−E)²/E term — the DQ cross-tab that flags which
    specific (category, category) cell drives a dependence alarm (the
    global statistic is the reader's one-line sum over this ≤15-row
    grid; emitting per-cell keeps every value an exact-integer derivation
    — a cross-engine sum of double contributions would be
    order-dependent, violating the parity contract). Completes the
    stats-test family: dq_ks_distance (continuous two-sample),
    dq_mann_whitney (rank two-sample), dq_benford (digit conformance) —
    this is the categorical independence member. Exactness: the deviation
    N·O − R·C is computed in int64 (≤ N·O ~ 10^10, far under 2^63), cast
    to double exactly (< 2^53) before the one squaring, and divided by
    the exact int64 product N·R·C cast to double — both engines evaluate
    the identical three-flop tail, round(6)ed.

    Scale shape: one combinable groupBy collapses the orders scan to the
    |pri|×|st| grid map-side; margins and the grand total are WINDOW
    SUMS over that grid (the transition-matrix single-lineage device —
    deriving them as separate groupBys would recompute the aggregate,
    and with lazy evaluation re-SCAN orders, once per margin: measured
    four scans in the first formulation's plan; this one is pinned to
    exactly one). No joins at all. The scan prunes to the two profiled
    columns. At 100 TB: a single data-sized combinable aggregate,
    everything else is dashboard arithmetic on ≤15 rows."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    )
    cell = o.groupBy("pri", "st").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grid = cell.select(
        "pri",
        "st",
        "n",
        F.sum("n").over(W.partitionBy("pri")).cast("bigint").alias("r"),
        F.sum("n").over(W.partitionBy("st")).cast("bigint").alias("c"),
        F.sum("n").over(W.partitionBy()).cast("bigint").alias("big_n"),
    )
    dev = F.col("big_n") * F.col("n") - F.col("r") * F.col("c")
    return (
        grid.select(
            "pri",
            "st",
            "n",
            F.col("r").alias("row_total"),
            F.col("c").alias("col_total"),
            F.round(
                (F.col("r") * F.col("c")) / F.col("big_n").cast("double"), 6
            ).alias("expected"),
            F.round(
                dev.cast("double")
                * dev.cast("double")
                / (F.col("big_n") * F.col("r") * F.col("c")).cast("double"),
                6,
            ).alias("chisq_contrib"),
        )
    )


# ---------------------------------------------------------------------------
# weighted median — exact, by cumulative weight over distinct values
# ---------------------------------------------------------------------------


@register(
    "agg_weighted_median",
    """
    WITH li AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    g AS (
      SELECT flag, cents, CAST(sum(w) AS BIGINT) AS w
      FROM li GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, cents, w,
             CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cumw,
             CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS totw,
             CAST(sum(w * cents) OVER (PARTITION BY flag) AS BIGINT) AS wc
      FROM g
    )
    SELECT flag,
           CAST(min(totw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cumw >= totw THEN cents END) AS BIGINT)
               AS median_cents,
           round(CAST(min(wc) AS BIGINT)
                 / (100.0 * CAST(min(totw) AS BIGINT)), 6) AS weighted_mean
    FROM c GROUP BY 1
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Exact QUANTITY-WEIGHTED median unit price per return flag — the
    robust center a pricing monitor wants when line items carry different
    volumes (the unweighted median over-counts one-unit orders; the mean
    is outlier-fragile; percentile_approx is a sketch with no
    cross-engine oracle). Lower weighted median: the smallest price p
    with 2·Σ_{x≤p} w(x) ≥ Σ w. Determinism device: weights collapse per
    DISTINCT price FIRST (so the cumulative sum's order is the total
    order on prices — never a tie-dependent row order), and price/weight
    are exact int64 cents/units throughout; the companion weighted mean
    divides two exact integers LAST, round(6)ed.

    Scale shape: the data-sized step is one combinable (flag, price)
    groupBy — at 100 TB the distinct-price grid per flag is bounded by
    the price domain (~10^7 cents values), orders of magnitude under the
    row count, and partial aggregation collapses duplicates map-side.
    The cumulative scan then runs per flag over that bounded grid (window
    sort on grid rows, not data rows); the final per-flag pick is a
    combinable conditional min. A true all-data window sort never
    happens — that is the trap the distinct-first device exists to
    avoid."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.round(F.col("l_quantity")).cast("bigint").alias("w"),
    )
    g = li.groupBy("flag", "cents").agg(F.sum("w").cast("bigint").alias("w"))
    wcum = (
        W.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("flag")
    c = g.select(
        "flag",
        "cents",
        F.sum("w").over(wcum).cast("bigint").alias("cumw"),
        F.sum("w").over(wall).cast("bigint").alias("totw"),
        F.sum(F.col("w") * F.col("cents")).over(wall).cast("bigint").alias("wc"),
    )
    return c.groupBy("flag").agg(
        F.min("totw").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("cents")))
        .cast("bigint")
        .alias("median_cents"),
        F.round(
            F.min("wc").cast("bigint") / (F.lit(100.0) * F.min("totw")), 6
        ).alias("weighted_mean"),
    )


# ---------------------------------------------------------------------------
# autocorrelation — lag-k Pearson over the daily-revenue series
# ---------------------------------------------------------------------------

# The double tail must be SYNTACTICALLY identical in both engines: every
# int64 sum is cast to double once, then the same *, -, /, sqrt tree (all
# correctly-rounded IEEE ops) runs on bit-identical operands.
_ACF_R = (
    "round((CAST(n_pairs AS DOUBLE) * CAST(s_xy AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_y AS DOUBLE))"
    " / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(s_xx AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))"
    " * sqrt(CAST(n_pairs AS DOUBLE) * CAST(s_yy AS DOUBLE)"
    " - CAST(s_y AS DOUBLE) * CAST(s_y AS DOUBLE))), 6)"
)


def _daily_revenue_grid(spark, sf_dir):
    """Checkpointed (rev, i) day grid of whole-dollar daily order
    revenue, dense-indexed by date order — shared by dq_autocorrelation
    and timeseries_theil_sen. Materialized once (~10^4 rows) so the
    consumers' self-joins fan out the grid, never re-scan orders (the
    chisq/cusum single-scan lesson)."""
    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("day"),
            F.round(F.col("o_totalprice")).cast("bigint").alias("dollars"),
        )
        .groupBy("day")
        .agg(F.sum("dollars").cast("bigint").alias("rev"))
    )
    return daily.select(
        "rev", F.row_number().over(W.partitionBy().orderBy("day")).alias("i")
    ).transform(materialize)


@register(
    "dq_autocorrelation",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT day, rev, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    pairs AS (
      SELECT l.lag, a.rev AS x, b.rev AS y
      FROM lags l JOIN idx a ON true JOIN idx b ON b.i = a.i + l.lag
    ),
    s AS (
      SELECT lag,
             CAST(count(*) AS BIGINT)    AS n_pairs,
             CAST(sum(x) AS BIGINT)      AS s_x,
             CAST(sum(y) AS BIGINT)      AS s_y,
             CAST(sum(x * y) AS BIGINT)  AS s_xy,
             CAST(sum(x * x) AS BIGINT)  AS s_xx,
             CAST(sum(y * y) AS BIGINT)  AS s_yy
      FROM pairs GROUP BY 1
    )
    SELECT lag, n_pairs, s_x, s_y, s_xy, {_ACF_R} AS acf
    FROM s
    """,
)
def dq_autocorrelation(spark, sf_dir):
    """Lag-1..7 AUTOCORRELATION of the daily order-revenue series — the
    DQ/time-series primitive behind seasonality detection and
    forecast-residual checks (a weekly cycle shows as a lag-7 peak; a
    near-1 lag-1 says the series is a random walk and day-over-day
    alarms are noise). Pearson r over the pairs (x_t, x_{{t+k}}) of the
    date-ordered series, k = 1..7. Exactness: daily revenue collapses to
    exact WHOLE-DOLLAR int64 on scan (cents would push sum-of-squares
    past int64 at sf0.1 — the unit choice IS the overflow headroom:
    dollars keep s_xx < 2^63 up to ~sf1; beyond that the same plan
    swaps int64 sums for decimal(38,0)); every sum is an exact int64;
    the r formula is one shared double tail on identically-cast
    operands, round(6)ed. Day-index pairing uses row_number over the
    DAY GRID (dense index — gaps in the calendar pair consecutive
    observations, the standard treatment for irregular series).

    Scale shape: the only data-sized step is the combinable
    groupBy(day) — at 100 TB the day grid is ~10^4 rows regardless of
    row count. The index window, the 7-way lag fan-out, and the
    self-join all run on that grid (the single-partition window sort is
    10^4 rows of dashboard arithmetic, not data); the final
    groupBy(lag) emits 7 rows. Nothing after the first aggregate ever
    touches the orders scan again, and the scan prunes to
    (o_orderdate, o_totalprice)."""
    idx = _daily_revenue_grid(spark, sf_dir)
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = idx.alias("a")
    b = idx.alias("b")
    pairs = (
        a.join(F.broadcast(lags))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .select("lag", F.col("a.rev").alias("x"), F.col("b.rev").alias("y"))
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("s_x"),
        F.sum("y").cast("bigint").alias("s_y"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("s_xy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s_xx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("s_yy"),
    )
    return s.select(
        "lag", "n_pairs", "s_x", "s_y", "s_xy", F.expr(_ACF_R).alias("acf")
    )


# ---------------------------------------------------------------------------
# robust outliers — median / MAD, all-integer
# ---------------------------------------------------------------------------


@register(
    "dq_outlier_mad",
    """
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, cents, CAST(count(*) AS BIGINT) AS w
      FROM v GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             CAST(min(CASE WHEN 2 * cumw >= totw THEN cents END) AS BIGINT)
                 AS med,
             CAST(min(totw) AS BIGINT) AS n_values
      FROM (
        SELECT event_type, cents, w,
               CAST(sum(w) OVER (PARTITION BY event_type ORDER BY cents
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cumw,
               CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT) AS totw
        FROM g
      ) GROUP BY 1
    ),
    dev AS (
      SELECT g.event_type, abs(g.cents - med.med) AS adev, g.w
      FROM g JOIN med ON med.event_type = g.event_type
    ),
    dg AS (
      SELECT event_type, adev, CAST(sum(w) AS BIGINT) AS w
      FROM dev GROUP BY 1, 2
    ),
    mad AS (
      SELECT event_type,
             CAST(min(CASE WHEN 2 * cumw >= totw THEN adev END) AS BIGINT)
                 AS mad
      FROM (
        SELECT event_type, adev, w,
               CAST(sum(w) OVER (PARTITION BY event_type ORDER BY adev
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cumw,
               CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT) AS totw
        FROM dg
      ) GROUP BY 1
    )
    SELECT med.event_type, med.n_values, med.med AS median_cents,
           mad.mad AS mad_cents,
           CAST(coalesce(sum(CASE WHEN abs(g.cents - med.med) > 3 * mad.mad
                                  THEN g.w END), 0) AS BIGINT) AS n_outliers,
           round(CAST(coalesce(sum(CASE WHEN abs(g.cents - med.med)
                                             > 3 * mad.mad
                                        THEN g.w END), 0) AS DOUBLE)
                 / CAST(med.n_values AS DOUBLE), 6) AS outlier_rate
    FROM g JOIN med ON med.event_type = g.event_type
           JOIN mad ON mad.event_type = g.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def dq_outlier_mad(spark, sf_dir):
    """Robust outlier detection per event type: lower MEDIAN and MAD
    (median absolute deviation) of the metric value, plus the count of
    points beyond the 3-MAD fence — the z-score's robust sibling
    (dq_anomaly_zscore's mean/stddev fence is itself dragged by the
    outliers it hunts; median/MAD has a 50% breakdown point, the
    standard recommendation for monitoring heavy-tailed metrics).
    Exactness: values are int64 cents; both medians are ORDER STATISTICS
    computed by the distinct-value cumulative-weight device
    (agg_weighted_median), the fence test |x − med| > 3·MAD compares
    int64s, and the single float division (outlier rate) happens LAST,
    round(6)ed. Zero floats anywhere before the final rate.

    Scale shape: the one data-sized step is the combinable
    groupBy(type, cents) — the distinct-value grid is bounded by the
    value domain (~10^4 distinct cents here, ~10^7 at worst), far under
    the row count, and duplicates collapse map-side. Both cumulative
    windows run per type over that grid; the deviation regroup and the
    fence count are grid-sized; med/mad join back via tiny broadcast.
    The events scan prunes to (event_type, value). At 100 TB this is
    one aggregate over the data and dashboard arithmetic after.

    r16-opt (guide §2.4): the grid fans into THREE consumers (the median
    windows, the deviation regroup, the fence count) and as a lazy
    subtree it re-ran the events scan + data-sized aggregate once per
    consumer — the before-plan carries 8 FileScans. One localCheckpoint
    of the ~10^4-row grid makes it literally "one aggregate over the
    data": after-plan 0 FileScans below the checkpoint. Local wall-clock
    is parity-to-slightly-better (pooled interleaved A/B over 10 reps at
    sf0.1 on a CPU-stolen container: 3.16s -> 2.76s median, spread
    1.8-8.0s — the tiny scans were parallel slack locally); the change
    is kept for the scale shape, where three full passes over the data
    become one."""
    v = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    g = (
        v.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .transform(materialize)
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("event_type")
    med = (
        g.select(
            "event_type",
            "cents",
            F.sum("w").over(wcum).cast("bigint").alias("cumw"),
            F.sum("w").over(wall).cast("bigint").alias("totw"),
        )
        .groupBy("event_type")
        .agg(
            F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("cents")))
            .cast("bigint")
            .alias("med"),
            F.min("totw").cast("bigint").alias("n_values"),
        )
    )
    dev = g.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("cents") - F.col("med")).alias("adev"),
        "w",
    )
    dg = dev.groupBy("event_type", "adev").agg(
        F.sum("w").cast("bigint").alias("w")
    )
    dcum = (
        W.partitionBy("event_type")
        .orderBy("adev")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    mad = (
        dg.select(
            "event_type",
            "adev",
            F.sum("w").over(dcum).cast("bigint").alias("cumw"),
            F.sum("w").over(wall).cast("bigint").alias("totw"),
        )
        .groupBy("event_type")
        .agg(
            F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("adev")))
            .cast("bigint")
            .alias("mad")
        )
    )
    fence = g.join(F.broadcast(med), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    out_w = F.when(
        F.abs(F.col("cents") - F.col("med")) > 3 * F.col("mad"), F.col("w")
    )
    return fence.groupBy(
        "event_type", "n_values", F.col("med").alias("median_cents"),
        F.col("mad").alias("mad_cents"),
    ).agg(
        F.coalesce(F.sum(out_w), F.lit(0)).cast("bigint").alias("n_outliers"),
        F.round(
            F.coalesce(F.sum(out_w), F.lit(0)).cast("double")
            / F.col("n_values").cast("double"),
            6,
        ).alias("outlier_rate"),
    )


# ---------------------------------------------------------------------------
# covariance matrix — pairwise sample covariances, exact moment sums
# ---------------------------------------------------------------------------

# (name, scaled-int64 SQL expr) — identical text both engines; units are
# chosen so every sum of squares stays far inside int64 (price in whole
# dollars, rates in percent: see docstring overflow budget)
_COV_VARS = [
    ("qty", "CAST(round(l_quantity) AS BIGINT)"),
    ("price", "CAST(round(l_extendedprice) AS BIGINT)"),
    ("disc_pct", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("tax_pct", "CAST(round(l_tax * 100) AS BIGINT)"),
]
_COV_PAIRS = [
    (_COV_VARS[i][0], _COV_VARS[j][0])
    for i in range(len(_COV_VARS))
    for j in range(i, len(_COV_VARS))
]


def _cov_tail(sa: str, sb: str, sab: str) -> str:
    return (
        f"round((CAST(n AS DOUBLE) * CAST({sab} AS DOUBLE)"
        f" - CAST({sa} AS DOUBLE) * CAST({sb} AS DOUBLE))"
        f" / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)"
    )


def _cov_oracle() -> str:
    base = ", ".join(f"{expr} AS {name}" for name, expr in _COV_VARS)
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for name, _ in _COV_VARS:
        sums.append(f"CAST(sum({name}) AS BIGINT) AS s_{name}")
    for a, b in _COV_PAIRS:
        sums.append(f"CAST(sum({a} * {b}) AS BIGINT) AS s_{a}_{b}")
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, s_{a} AS s_x,"
        f" s_{b} AS s_y, s_{a}_{b} AS s_xy,"
        f" {_cov_tail(f's_{a}', f's_{b}', f's_{a}_{b}')} AS cov"
        f" FROM s"
        for a, b in _COV_PAIRS
    )
    return f"""
    WITH li AS (SELECT {base} FROM lineitem),
    s AS (SELECT {', '.join(sums)} FROM li HAVING count(*) >= 2)
    {rows}
    """


@register("agg_covariance_matrix", _cov_oracle())
def agg_covariance_matrix(spark, sf_dir):
    """Pairwise sample COVARIANCE MATRIX of the four lineitem measures
    (quantity, price, discount, tax) — the one-pass second-moment
    profile behind feature-correlation screens, PCA preprocessing, and
    multicollinearity checks, emitted as the 10-entry upper triangle
    (diagonal = variances) with the raw moment sums beside each rounded
    covariance so the hash pins the exact integer derivation.
    Exactness: inputs collapse to scaled int64 on scan (whole dollars /
    percent — the unit choice is the overflow budget: price² summed at
    sf1 is ~6·10^16, three orders under 2^63; cents would overflow at
    sf0.1), all 15 moments are exact int64 sums, and each covariance is
    ONE shared double tail (n·Σxy − Σx·Σy)/(n·(n−1)), round(6)ed.

    Scale shape: ONE combinable global aggregate computes every moment
    in a single lineitem pass (map-side partials collapse to one
    15-field row per task — never a per-pair re-scan, never a 10-branch
    union over the lineage: the matrix rows are produced by exploding a
    struct array built FROM the single aggregated row). The scan prunes
    to the four measure columns. At 100 TB: one scan, one 1-row
    exchange, dashboard arithmetic after."""
    li = _t(spark, sf_dir, "lineitem").select(
        *[F.expr(expr).alias(name) for name, expr in _COV_VARS]
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for name, _ in _COV_VARS:
        aggs.append(F.sum(name).cast("bigint").alias(f"s_{name}"))
    for a, b in _COV_PAIRS:
        aggs.append(
            F.sum(F.col(a) * F.col(b)).cast("bigint").alias(f"s_{a}_{b}")
        )
    s = li.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col(f"s_{a}").alias("s_x"),
                F.col(f"s_{b}").alias("s_y"),
                F.col(f"s_{a}_{b}").alias("s_xy"),
                F.expr(_cov_tail(f"s_{a}", f"s_{b}", f"s_{a}_{b}")).alias(
                    "cov"
                ),
            )
            for a, b in _COV_PAIRS
        ]
    )
    return (
        s.filter(F.col("n") >= 2)  # sample covariance undefined below n=2
        .select("n", F.explode(entries).alias("e"))
        .select("e.col_x", "e.col_y", "n", "e.s_x", "e.s_y", "e.s_xy", "e.cov")
    )


# ---------------------------------------------------------------------------
# mutual information — categorical dependence in bits, chisq's sibling
# ---------------------------------------------------------------------------

# identical double tail both engines: PMI of a cell from its exact int64
# counts (one division then one log2 — both correctly-rounded-ish libm
# calls on a bit-identical operand, round(6) per the avg-of-logs
# precedent), and the MI total as the count-weighted sum over the grid
_PMI_BITS = (
    "round(log2((CAST(big_n AS DOUBLE) * CAST(n AS DOUBLE))"
    " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))), 6)"
)
_MI_TOTAL = (
    "round(sum(CAST(n AS DOUBLE) * log2((CAST(big_n AS DOUBLE)"
    " * CAST(n AS DOUBLE)) / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))))"
    " OVER () / CAST(big_n AS DOUBLE), 6)"
)


@register(
    "dq_mutual_information",
    f"""
    WITH cell AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    grid AS (
      SELECT pri, st, n,
             CAST(sum(n) OVER (PARTITION BY pri) AS BIGINT) AS r,
             CAST(sum(n) OVER (PARTITION BY st) AS BIGINT) AS c,
             CAST(sum(n) OVER () AS BIGINT) AS big_n
      FROM cell
    )
    SELECT pri, st, n, r AS row_total, c AS col_total,
           {_PMI_BITS} AS pmi_bits,
           {_MI_TOTAL} AS mi_total
    FROM grid
    """,
)
def dq_mutual_information(spark, sf_dir):
    """MUTUAL INFORMATION between two categorical profile columns
    (order priority × status) in bits — the information-theoretic
    sibling of dq_chisq_independence over the SAME cross-tab: χ² asks
    "is the dependence statistically surprising", MI asks "how many
    bits does one column tell you about the other" (the feature-
    selection / leakage-screening number; MI = 0 ⟺ independent). Each
    cell carries its pointwise MI log2(N·n_xy/(r·c)) — the
    over/under-representation of that specific pair — plus the grid
    total Σ (n/N)·PMI repeated per row (single grain, window-summed).
    Exactness: counts and margins are exact int64 window sums over the
    post-aggregate grid (the chisq single-lineage device — one pinned
    scan, zero joins); each PMI is ONE division of exact-int products
    then ONE log2, round(6) per the avg-of-logs precedent; the total
    sums ≤|grid| doubles.

    Scale shape: identical to dq_chisq_independence — one combinable
    groupBy collapses the scan to the ≤15-cell grid map-side;
    everything after is window arithmetic on the grid. At 100 TB: one
    data-sized aggregate, dashboard math after."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    )
    cell = o.groupBy("pri", "st").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grid = cell.select(
        "pri",
        "st",
        "n",
        F.sum("n").over(W.partitionBy("pri")).cast("bigint").alias("r"),
        F.sum("n").over(W.partitionBy("st")).cast("bigint").alias("c"),
        F.sum("n").over(W.partitionBy()).cast("bigint").alias("big_n"),
    )
    return grid.select(
        "pri",
        "st",
        "n",
        F.col("r").alias("row_total"),
        F.col("c").alias("col_total"),
        F.expr(_PMI_BITS).alias("pmi_bits"),
        F.expr(_MI_TOTAL).alias("mi_total"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen — median-of-slopes robust trend over the daily series
# ---------------------------------------------------------------------------


@register(
    "timeseries_theil_sen",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT rev, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    pairs AS (
      SELECT a.i AS i, b.i AS j,
             CAST(b.rev - a.rev AS DOUBLE) / CAST(b.i - a.i AS DOUBLE)
                 AS slope
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    ranked AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope, i, j) AS rn,
             count(*) OVER () AS n_pairs
      FROM pairs
    ),
    med AS (
      SELECT CAST(min(n_pairs) AS BIGINT) AS n_pairs,
             min(CASE WHEN 2 * rn = n_pairs + CAST(n_pairs % 2 AS BIGINT)
                      THEN slope END) AS slope_med
      FROM ranked
    ),
    resid AS (
      SELECT CAST(idx.rev AS DOUBLE) - med.slope_med * CAST(idx.i AS DOUBLE)
                 AS b0,
             idx.i
      FROM idx CROSS JOIN med
    ),
    rr AS (
      SELECT b0, row_number() OVER (ORDER BY b0, i) AS rn,
             count(*) OVER () AS n
      FROM resid
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n_days,
           med.n_pairs,
           round(med.slope_med, 6) AS slope,
           round((SELECT min(CASE WHEN 2 * rn = n + CAST(n % 2 AS BIGINT)
                                  THEN b0 END) FROM rr), 6) AS intercept
    FROM med
    """,
)
def timeseries_theil_sen(spark, sf_dir):
    """THEIL–SEN trend estimator over the daily-revenue series — the
    robust regression line (median of all pairwise slopes; 29%
    breakdown point) that a monitoring stack fits when least squares
    (agg_least_squares) would be dragged by the exact outliers
    dq_outlier_mad flags: slope = lower median of (rev_j − rev_i)/(j−i)
    over all day pairs i < j, intercept = lower median of rev_i −
    slope·i (the standard Theil–Sen intercept). Determinism: each slope
    is ONE division of exact int64 differences (bit-identical doubles
    both engines); the median is an ORDER-STATISTIC pick on the total
    order (slope, i, j) — never an average of two middles, so no new
    float op; lower median via the exact integer test 2·rn = n + (n%2).

    Scale shape: the data-sized step is the shared combinable
    groupBy(day) inside the checkpointed day grid; the O(grid²) pair
    fan-out (~3·10^6 rows for a decade of days) and both median sorts
    are GRID arithmetic whose size is calendar-bounded — independent of
    row count at 100 TB. The slope median — the only sort whose input
    is grid² — is an exact BANDED selection instead of a global
    single-partition window over all pairs: approx_percentile brackets
    [p45, p55] (accuracy 10000 → rank error < n/10000, far inside the
    0.05·n half-band, and exact outright for n ≤ 10000, so the lower
    median provably lies in the band), a strict count-below fixes the
    band rows' global ranks, and only the ~10% in-band slice pays the
    serial rank sort. Tie-degeneracy bound (ADVICE r11): the in-band
    slice is ≤ 0.1·n plus the largest slope tie-group straddling a band
    edge — duplicate slopes at the median inflate the band toward the
    old full single-partition window (a silent perf cliff, never a
    correctness one). Impossible on this calendar-bounded revenue grid
    (slopes are distinct-denominator rationals), but reuse on tie-heavy
    data (e.g. integer series with few levels) must not assume the 10%
    slice. The pair generator re-runs per pass, but it is
    broadcast-NLJ codegen over the checkpointed grid — no scan, no
    shuffle. Orders is scanned exactly once, at the grid checkpoint;
    the returned plan carries no FileScan."""
    idx = _daily_revenue_grid(spark, sf_dir)
    a = idx.alias("a")
    b = idx.alias("b")
    # try_divide, not /: the banded selection below FILTERS on slope, and
    # Catalyst pushes those predicates into the pair join's condition,
    # where conjunct evaluation order is not guaranteed — ANSI division
    # would throw on the j == i pairs the b.i > a.i conjunct exists to
    # drop. try_divide yields NULL there instead; every row that survives
    # the join has j > i, so surviving slopes are identical.
    pairs = a.join(b, F.col("b.i") > F.col("a.i")).select(
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        F.try_divide(
            (F.col("b.rev") - F.col("a.rev")).cast("double"),
            (F.col("b.i") - F.col("a.i")).cast("double"),
        ).alias("slope"),
    )
    stats = (
        pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr(
                "approx_percentile(slope, array(0.45D, 0.55D), 10000)"
            ).alias("pct"),
        )
        .select(
            "n_pairs",
            F.col("pct")[0].alias("lo"),
            F.col("pct")[1].alias("hi"),
        )
        .transform(materialize)
    )
    withb = pairs.crossJoin(F.broadcast(stats))
    below = withb.filter(F.col("slope") < F.col("lo")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_below")
    )
    band = withb.filter(
        (F.col("slope") >= F.col("lo")) & (F.col("slope") <= F.col("hi"))
    )
    wr = W.partitionBy().orderBy("slope", "i", "j")
    ranked = band.select(
        "slope", "n_pairs", F.row_number().over(wr).alias("rb")
    ).crossJoin(F.broadcast(below))
    med = ranked.agg(
        F.min("n_pairs").cast("bigint").alias("n_pairs"),
        F.min(
            F.when(
                2 * (F.col("rb") + F.col("n_below"))
                == F.col("n_pairs") + (F.col("n_pairs") % 2).cast("bigint"),
                F.col("slope"),
            )
        ).alias("slope_med"),
    ).transform(materialize)
    resid = idx.crossJoin(F.broadcast(med)).select(
        (
            F.col("rev").cast("double")
            - F.col("slope_med") * F.col("i").cast("double")
        ).alias("b0"),
        "i",
    )
    wb = W.partitionBy().orderBy("b0", "i")
    rr = resid.select(
        "b0",
        F.row_number().over(wb).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    icept = rr.agg(
        F.min(
            F.when(
                2 * F.col("rn") == F.col("n") + (F.col("n") % 2).cast("bigint"),
                F.col("b0"),
            )
        ).alias("b0_med")
    )
    n_days = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        n_days.crossJoin(med)
        .crossJoin(icept)
        .select(
            "n_days",
            "n_pairs",
            F.round("slope_med", 6).alias("slope"),
            F.round("b0_med", 6).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# runs test — Wald–Wolfowitz randomness check on daily direction
# ---------------------------------------------------------------------------

# shared double tail: E[R], Var[R], z from the exact int64 counts
_RUNS_E = (
    "(1.0 + 2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)"
    " / CAST(n_up + n_down AS DOUBLE))"
)
_RUNS_VAR = (
    "(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)"
    " * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)"
    "    - CAST(n_up + n_down AS DOUBLE))"
    " / (CAST(n_up + n_down AS DOUBLE) * CAST(n_up + n_down AS DOUBLE)"
    "    * CAST(n_up + n_down - 1 AS DOUBLE)))"
)


@register(
    "dq_runs_test",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (SELECT rev, row_number() OVER (ORDER BY day) AS i FROM daily),
    moves AS (
      SELECT i, CASE WHEN rev > prev THEN 1 ELSE -1 END AS s
      FROM (SELECT i, rev, lag(rev) OVER (ORDER BY i) AS prev FROM idx)
      WHERE prev IS NOT NULL AND rev <> prev
    ),
    seq AS (
      SELECT s, lag(s) OVER (ORDER BY i) AS ps FROM moves
    ),
    cnt AS (
      SELECT CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_down,
             CAST(1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      FROM seq
    )
    SELECT n_up, n_down, n_runs,
           round({_RUNS_E}, 6) AS expected_runs,
           round((CAST(n_runs AS DOUBLE) - {_RUNS_E})
                 / sqrt({_RUNS_VAR}), 6) AS z_score
    FROM cnt WHERE n_up > 0 AND n_down > 0 AND n_up + n_down > 1
    """,
)
def dq_runs_test(spark, sf_dir):
    """WALD–WOLFOWITZ RUNS TEST on the daily-revenue direction sequence
    — the randomness check that completes the stats-test family
    (KS/Mann–Whitney compare distributions, chisq/MI test dependence,
    Benford tests digits; the runs test asks whether the SEQUENCE
    itself is random: too few runs ⇒ trending/sticky, too many ⇒
    oscillating — either way day-over-day alarms need detrending
    first, the dq_autocorrelation companion from the nonparametric
    side). Direction = sign of the day-over-day change (zero changes
    dropped, the standard treatment); up/down counts and the run count
    are exact int64 from two grid windows; E[R], Var[R], z are ONE
    shared double tail on identically-cast operands, round(6)ed.

    Scale shape: the single data-sized step is the combinable
    groupBy(day); the direction lag, run-boundary lag, and the final
    1-row aggregate all run on the calendar-bounded day grid (the
    single-partition windows sort ~10^4 rows of dashboard arithmetic).
    Orders is scanned once and prunes to (o_orderdate,
    o_totalprice)."""
    idx = _daily_revenue_grid(spark, sf_dir)
    wi = W.partitionBy().orderBy("i")
    moves = (
        idx.select("i", "rev", F.lag("rev").over(wi).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("rev") != F.col("prev")))
        .select(
            "i",
            F.when(F.col("rev") > F.col("prev"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )
    seq = moves.select("s", F.lag("s").over(wi).alias("ps"))
    cnt = seq.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
        (
            1
            + F.sum(
                F.when(
                    F.col("ps").isNotNull() & (F.col("s") != F.col("ps")), 1
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("n_runs"),
    )
    return cnt.filter(
        (F.col("n_up") > 0)
        & (F.col("n_down") > 0)
        & (F.col("n_up") + F.col("n_down") > 1)
    ).select(
        "n_up",
        "n_down",
        "n_runs",
        F.round(F.expr(_RUNS_E), 6).alias("expected_runs"),
        F.round(
            (F.col("n_runs").cast("double") - F.expr(_RUNS_E))
            / F.sqrt(F.expr(_RUNS_VAR)),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Pythagorean means — arithmetic / geometric / harmonic per group
# ---------------------------------------------------------------------------


@register(
    "agg_pythagorean_means",
    """
    WITH li AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_extendedprice > 0
    )
    SELECT flag,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(cents) AS BIGINT)
                 / (100.0 * CAST(count(*) AS DOUBLE)), 4) AS arith_mean,
           round(exp(avg(ln(CAST(cents AS DOUBLE) / 100.0))), 4)
               AS geo_mean,
           round(CAST(count(*) AS DOUBLE)
                 / sum(1.0 / (CAST(cents AS DOUBLE) / 100.0)), 4)
               AS harmonic_mean
    FROM li GROUP BY 1
    """,
)
def agg_pythagorean_means(spark, sf_dir):
    """The three PYTHAGOREAN MEANS of line-item price per return flag —
    the aggregate trio behind rate averaging done right (harmonic for
    averaging ratios/speeds, geometric for growth factors, arithmetic
    for totals; using the wrong one is a classic analytics bug, and
    AM ≥ GM ≥ HM is the self-check, pytest-pinned). Exactness: the
    arithmetic mean divides an exact int64 cent sum LAST; the geometric
    mean rides the avg-of-logs precedent (exp∘avg∘ln, round(4)); the
    harmonic mean sums per-row reciprocals of identically-derived
    doubles (cents/100 — bit-identical operands cross-engine) whose
    partition-order error (~1e-10 absolute on a ~10^0-magnitude sum)
    sits far below the round(4) grain on a ~10^4-magnitude mean.

    Scale shape: ONE combinable groupBy over a pruned two-column scan —
    all three means are self-mergeable aggregates (sum, count, sum of
    logs, sum of reciprocals), so partials collapse map-side and the
    exchange carries |flags| rows. The textbook 100 TB aggregate."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 0)
        .select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        )
    )
    price = F.col("cents").cast("double") / F.lit(100.0)
    return li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum("cents").cast("bigint")
            / (F.lit(100.0) * F.count(F.lit(1)).cast("double")),
            4,
        ).alias("arith_mean"),
        F.round(F.exp(F.avg(F.log(price))), 4).alias("geo_mean"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum(F.lit(1.0) / price), 4
        ).alias("harmonic_mean"),
    )


# ---------------------------------------------------------------------------
# freshness lag — per-stream ingestion staleness vs the global clock
# ---------------------------------------------------------------------------

FRESH_STALE_MIN = 30  # staleness alarm threshold (minutes behind global max)


@register(
    "dq_freshness_lag",
    f"""
    WITH t AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             max(ts) AS last_ts,
             CAST(epoch_us(max(ts)) AS BIGINT) AS last_us
      FROM events GROUP BY 1
    ),
    g AS (SELECT CAST(max(last_us) AS BIGINT) AS global_us FROM t)
    SELECT event_type, n_events, last_ts,
           CAST(global_us - last_us AS BIGINT) AS lag_us,
           CAST(CASE WHEN global_us - last_us
                          > {FRESH_STALE_MIN} * 60 * 1000000
                     THEN 1 ELSE 0 END AS BIGINT) AS is_stale
    FROM t CROSS JOIN g
    """,
)
def dq_freshness_lag(spark, sf_dir):
    """Ingestion FRESHNESS monitor — the first data-quality page every
    pipeline dashboard shows (Monte Carlo / Great Expectations
    freshness checks): per event stream, the last-seen event time, the
    lag behind the freshest stream in exact MICROSECONDS, and a
    staleness verdict at the {FRESH_STALE_MIN}-minute fence — the
    detector for a silently-dead producer, which no row-level check
    catches because the problem is the rows that DIDN'T arrive
    (the batch cousin of stream_timer_timeout's absence-of-data
    semantics). Exactness: event-time maxima are order statistics;
    the lag subtracts exact int64 epoch-microseconds; the fence is an
    integer compare. Zero floats.

    Scale shape: ONE combinable groupBy (count + max partials collapse
    map-side; the shuffle carries |streams| rows), then a 1-row global
    max cross-joined back (broadcast). The scan prunes to (event_type,
    ts). The cheapest possible 100 TB monitor — by design, since it
    runs every few minutes in production.

    r16-opt (guide §2.4): the per-type grid fans into the global-max
    aggregate AND the crossJoin — lazy, the events pass ran twice
    (before-plan: 4 FileScans). Checkpoint the |types|-row grid once;
    one pass over the data."""
    t = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.unix_micros(F.max("ts")).cast("bigint").alias("last_us"),
        )
        .transform(materialize)
    )
    g = t.agg(F.max("last_us").cast("bigint").alias("global_us"))
    return t.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        "last_ts",
        (F.col("global_us") - F.col("last_us")).cast("bigint").alias("lag_us"),
        F.when(
            F.col("global_us") - F.col("last_us")
            > FRESH_STALE_MIN * 60 * 1_000_000,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_stale"),
    )
