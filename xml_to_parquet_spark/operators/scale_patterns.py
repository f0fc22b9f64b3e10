"""Scale-pattern operators [EXT]: the shuffle-discipline playbook made
executable — salted skew joins and bucketed co-located joins. Results are
ordinary join/agg outputs (full DuckDB oracles); what's under test is that
the *pattern* produces identical results while changing the physical plan.

These exist because at 100 TB the difference between a good and a bad plan
is not the operator set, it's (a) what happens on a hot key and (b) whether
a repeated join pays its shuffle every time.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.relational import _dsum_sql, dsum
from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table

SALT_BUCKETS = 8


@register(
    "join_skew_salted",
    f"""
    SELECT l_returnflag, count(*) AS n,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_returnflag
    """,
)
def join_skew_salted(spark, sf_dir):
    """Salted join: the manual skew-mitigation pattern. The (conceptually
    hot-keyed) build side is exploded once per salt value; the probe side
    gets a deterministic salt from its key — so one hot key's rows spread
    over SALT_BUCKETS reducers instead of melting a single one.

    AQE's skew-join split handles *sort-merge* skew automatically; salting
    is the portable version that also covers aggregations and works when
    statistics lie. The oracle proves the rewrite changes nothing
    semantically."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    # probe side: deterministic salt in [0, SALT_BUCKETS)
    li_s = li.withColumn("salt", (F.col("l_orderkey") % SALT_BUCKETS).cast("int"))
    # build side: replicate each key for every salt value
    orders_s = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    return (
        li_s.join(
            orders_s,
            (li_s.l_orderkey == orders_s.o_orderkey) & (li_s.salt == orders_s.salt),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


def bucket_fixture(spark, sf_dir) -> tuple[str, str]:
    """Build-once bucketed copies of lineitem/orders (8 buckets on the
    join key) in a /tmp warehouse; returns the two qualified table names.
    Shared by join_bucketed and agg_bucketed_reuse — the write-time cost
    of the layout amortizes across every operator that exploits it."""
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    # same configurable root as io_paths.scratch_dir (ADVICE r10), but a
    # sibling of the per-sf scratch tree: the bucket warehouse is a Spark
    # catalog LOCATION keyed by pid+sf, not a per-operator fixture dir
    from xml_to_parquet_spark.io_paths import scratch_root

    wh = f"{scratch_root()}/pid{os.getpid()}/buckets/{sf_tag}"
    li_tbl, o_tbl = f"b_lineitem_{sf_tag}", f"b_orders_{sf_tag}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{wh}'")
    existing = {r.tableName for r in spark.sql("SHOW TABLES IN bucketdb").collect()}
    if li_tbl not in existing or o_tbl not in existing:
        # the in-memory catalog is session-scoped: data files may survive a
        # previous session whose catalog entries didn't — clear them first
        import shutil

        for t in (li_tbl, o_tbl):
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
            f"bucketdb.{li_tbl}"
        )
        table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
            f"bucketdb.{o_tbl}"
        )
    return f"bucketdb.{li_tbl}", f"bucketdb.{o_tbl}"


@register(
    "join_bucketed",
    f"""
    SELECT o_orderpriority, count(*) AS n,
           {_dsum_sql('l_extendedprice')} AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed(spark, sf_dir):
    """Bucketed co-located join: both fact tables written bucketed by the
    join key (8 buckets), then joined — Spark aligns bucket i with bucket i
    and the join runs with NO exchange on either side. This is the pattern
    that amortizes the shuffle for a join you run every day: pay it once at
    write time, never at read time.

    Locally the bucketed copies are written to a warehouse under /tmp on
    first use per scale factor (a fixture build, reused across runs)."""
    li_tbl, o_tbl = bucket_fixture(spark, sf_dir)
    li = spark.table(li_tbl)
    # MERGE hint: at test scale the planner would broadcast the small side;
    # the hinted sort-merge is the plan this pattern exists for — both scans
    # report Bucketed: true and the join runs with NO Exchange on either side
    # (verified in tests/test_plans.py)
    orders = spark.table(o_tbl).hint("merge")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice")).alias("total_price"),
        )
    )


from contextlib import contextmanager

from xml_to_parquet_spark.io_paths import committed, scratch_dir
from xml_to_parquet_spark.materialize import materialize


@contextmanager
def scoped_confs(spark, **confs):
    """Set SQL confs for the duration of a block, restoring previous values
    (or unsetting) afterwards — conf mutations must never leak into other
    operators' plans (a leaked autoBroadcastJoinThreshold=-1 would silently
    rewrite every subsequent join in the session)."""
    saved = {}
    for k, v in confs.items():
        key = k.replace("__", ".")
        # get(key, None) returns only EXPLICITLY-set values (session
        # defaults for unset keys stay None), so restore unsets rather than
        # pinning today's default as an explicit conf (ADVICE r7)
        saved[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, old in saved.items():
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local test data is far below the default 10GB application-side
    # threshold; at production scale the defaults fire on their own
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # InjectRuntimeFilter skips creation sides it could broadcast instead
    # (a broadcast hash join IS the filter); at test scale everything is
    # broadcastable, so disable by-size broadcast WITHIN THIS SCOPE ONLY to
    # exercise the shuffle-join case the pattern exists for
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_pruned_join(spark, sf_dir):
    """The lazily-planned bloom-pruned join (exposed so the plan test can
    assert on it under the same scoped confs the operator executes with)."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # merge hint: the pattern under test is the SHUFFLE join case — when the
    # dim side broadcasts, the broadcast hash set already is the filter and
    # Catalyst rightly skips bloom injection
    return (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .groupBy(F.month("o_orderdate").alias("o_month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_bloom_pruned",
    f"""
    SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month, count(*) AS n,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def join_bloom_pruned(spark, sf_dir):
    """Bloom-filter semi-join pruning — the first of the two big 100 TB
    scan reducers: Catalyst's InjectRuntimeFilter builds a
    ``bloom_filter_agg`` over the selective (filtered) side's join keys and
    pushes ``might_contain(bloom, xxhash64(l_orderkey))`` into the probe
    side BEFORE its shuffle, so rows that cannot match never pay exchange
    serialization. On a 100 TB fact table with a 1%-selective dim filter
    this drops ~99% of shuffle write. The final equi-join keeps the result
    exact — bloom false positives only cost bytes, never correctness.

    Expressed declaratively: no handwritten bloom, just the join + filter,
    with the optimizer's own runtime-filter rule doing the injection
    (verified by tests/test_plans.py: the probe scan's post-scan filter
    contains might_contain over a bloom_filter_agg subquery). The injection
    thresholds are scoped to this operator via scoped_confs so the local
    test scale clears the (production-tuned) 10GB default — and so the
    overrides never rewrite another operator's plan. The result is
    materialized under that scope (optimization happens at execution time;
    returning the lazy plan would optimize after the confs were restored)."""
    out = scratch_dir(sf_dir, "bloom_pruned")
    with scoped_confs(spark, **_BLOOM_CONFS):
        bloom_pruned_join(spark, sf_dir).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


DPP_DIM = [
    ("1-URGENT", "high"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "mid"),
    ("4-NOT SPECIFIED", "low"),
    ("5-LOW", "low"),
]


def dpp_fixture(spark, sf_dir) -> tuple[str, str]:
    """Build-once partitioned fact + tiny dim parquet fixtures: orders
    partitioned by o_orderpriority (directory-per-value layout), and a
    5-row priority→urgency dim."""
    fact_dir = scratch_dir(sf_dir, "dpp_orders_part")
    dim_dir = scratch_dir(sf_dir, "dpp_dim")
    if not committed(fact_dir):
        table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").partitionBy("o_orderpriority").parquet(fact_dir)
    if not committed(dim_dir):
        spark.createDataFrame(
            DPP_DIM, "priority string, urgency string"
        ).write.mode("overwrite").parquet(dim_dir)
    return fact_dir, dim_dir


@register(
    "scan_dpp_partitioned",
    f"""
    SELECT o_orderpriority, count(*) AS n,
           {_dsum_sql('o_totalprice')} AS total_price
    FROM orders
    JOIN (VALUES ('1-URGENT', 'high'), ('2-HIGH', 'high'), ('3-MEDIUM', 'mid'),
                 ('4-NOT SPECIFIED', 'low'), ('5-LOW', 'low'))
         AS dim(priority, urgency)
      ON o_orderpriority = priority
    WHERE urgency = 'high'
    GROUP BY o_orderpriority
    """,
)
def scan_dpp_partitioned(spark, sf_dir):
    """Dynamic partition pruning — the second big 100 TB scan reducer: the
    fact table is laid out partitioned by the join key, the dim side
    carries a selective filter on a NON-key column, and Spark prunes fact
    partitions AT RUNTIME from the dim join keys (the broadcast exchange is
    reused as the pruning subquery). The fact scan's PartitionFilters shows
    ``dynamicpruning#N`` (pinned in tests/test_plans.py) — directories for
    non-matching partitions are never even listed, the static-pruning
    benefit without a static predicate.

    At 100 TB this is the date-partitioned-fact ⋈ filtered-date-dim
    pattern: a 1-week filter on a 5-year table touches 0.4% of the files.
    No conf overrides needed — DPP is on by default; the fixture build
    (partitioned copy + 5-row dim, once per process) is the write-time
    price of the layout, exactly like join_bucketed's bucket fixture."""
    fact_dir, dim_dir = dpp_fixture(spark, sf_dir)
    # explicit schema: an EMPTY source writes zero partition directories,
    # and schema inference over a directory with no files throws — the
    # 0-rows-after-filter case any 100 TB pipeline hits eventually
    fact = spark.read.schema(
        "o_orderkey bigint, o_totalprice double, o_orderpriority string"
    ).parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("urgency") == "high")
    return (
        fact.join(dim, fact.o_orderpriority == dim.priority)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


def pushdown_stats_agg(spark, sf_dir):
    """The lazily-planned aggregate (exposed for the plan test, same
    pattern as bloom_pruned_join)."""
    return table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


_PUSHDOWN_CONFS = {
    # aggregate pushdown is a DataSource V2 capability; the default file
    # path still plans V1 FileScan, so route parquet through V2 here
    "spark.sql.sources.useV1SourceList": "",
    "spark.sql.parquet.aggregatePushdown": "true",
}


@register(
    "agg_pushdown_stats",
    """
    SELECT count(*) AS n_rows,
           min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
    FROM lineitem
    """,
)
def agg_pushdown_stats(spark, sf_dir):
    """Metadata-only aggregation — COUNT/MIN/MAX answered from parquet
    FOOTER STATISTICS, zero row groups decoded: the V2 ParquetScan's
    output schema IS the aggregate columns (pinned in tests/test_plans.py
    as PushedAggregation). On a 100 TB table this is the difference
    between a full scan and reading one footer per file (~KB each) — the
    canonical freshness/rowcount probe every orchestration layer runs
    before planning real work.

    Pushdown silently falls back to a normal scan when any row group
    lacks statistics or a filter/nested field intervenes — which is why
    the plan shape is test-asserted rather than assumed. Scoped confs
    (restored after materialization) route parquet through the V2 source
    only for this operator."""
    out = scratch_dir(sf_dir, "pushdown_stats")
    with scoped_confs(spark, **_PUSHDOWN_CONFS):
        pushdown_stats_agg(spark, sf_dir).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


# 80% of lineitem rows collapse onto hot key 0 — the deliberate skew the
# AQE split must detect (l_orderkey is uniform in TPC-H data; a CASE
# collapse is the controlled way to manufacture a hot key)
_SKEW_HOT_PRED = "% 10 < 8"

_SKEW_AQE_CONFS = {
    # force the sort-merge path: skew-join rewrite only applies to
    # shuffle joins (a broadcast join has no skewed reducer to split)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # local sf0.01/0.1 partitions are KBs, far under the production 256MB
    # skew threshold — scale the thresholds to the fixture, same spirit as
    # _BLOOM_CONFS: at 100 TB the DEFAULTS fire on their own
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    # keep coalescing from merging the small partitions back together
    # before the skew check sees them
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
}


def skew_fixture(spark, sf_dir) -> str:
    """Build-once multi-file copy of the skew-collapsed fact: AQE splits a
    skewed reduce partition at MAPPER granularity
    (PartialReducerPartitionSpec is a [startMapIndex, endMapIndex) range),
    so a single-file local scan — one map task — leaves nothing to split.
    16 files give the splitter 16 map outputs, mirroring the thousands of
    mappers a real 100 TB scan has. Same build-once pattern (and the same
    _SUCCESS-keyed guard) as dpp_fixture."""
    fact_dir = scratch_dir(sf_dir, "skew_fact")
    if not committed(fact_dir):
        table(spark, sf_dir, "lineitem").select(
            F.expr(
                f"CASE WHEN l_orderkey {_SKEW_HOT_PRED} THEN 1 "
                "ELSE l_suppkey END"
            ).alias("sk"),
            "l_returnflag",
            "l_extendedprice",
            "l_discount",
        ).repartition(16).write.mode("overwrite").parquet(fact_dir)
    return fact_dir


def skew_aqe_join(spark, sf_dir):
    """The lazily-planned skewed join (exposed so the plan/metrics test can
    execute it under the same scoped confs and assert the AQE skew split).

    Shape constraint: OptimizeSkewedJoin pattern-matches
    ``SMJ(Sort(ShuffleStage), Sort(ShuffleStage))`` — any operator between
    a Sort and its shuffle stage (e.g. a dim-side aggregate) defeats the
    rewrite, so the dim here is a PLAIN unique-key scan (supplier)."""
    fact = spark.read.schema(
        "sk bigint, l_returnflag string, l_extendedprice double, "
        "l_discount double"
    ).parquet(skew_fixture(spark, sf_dir))
    dim = table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    return (
        fact.join(dim, fact.sk == dim.s_suppkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            dsum(F.col("s_acctbal")).alias("dim_acctbal"),
        )
    )


@register(
    "join_skew_aqe",
    f"""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey {_SKEW_HOT_PRED} THEN 1
                  ELSE l_suppkey END AS sk,
             l_returnflag, l_extendedprice, l_discount
      FROM lineitem
    )
    SELECT l_returnflag, count(*) AS n,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           {_dsum_sql('s_acctbal')} AS dim_acctbal
    FROM fact JOIN supplier ON sk = s_suppkey
    GROUP BY l_returnflag
    """,
)
def join_skew_aqe(spark, sf_dir):
    """AQE automatic skew-join split — the automatic twin of
    join_skew_salted (VERDICT r7 #5), completing the skew playbook: the
    manual salt rewrite covers aggregations and lying statistics; AQE's
    OptimizeSkewedJoin covers the common case with ZERO query rewrite. 80%
    of the probe side collapses onto one hot key, so one sort-merge
    reducer would receive 80% of the shuffle; AQE observes the finished
    map stage's partition sizes at runtime, splits the oversized reducer
    into advisory-sized slices, and DUPLICATES the matching build rows to
    each slice — same join semantics (the oracle proves it), hot-key
    stragglers gone. This is the runtime re-plan knob the 100 TB brief
    names: no statistics, no hints, the actual observed bytes decide.

    Plan contract (tests/test_plans.py): the executed adaptive plan's
    AQEShuffleRead reports skewed splits on the probe side. Thresholds are
    scoped to the fixture scale via scoped_confs (the production defaults
    — 256MB/5x — fire on their own at real partition sizes) and restored
    after materialization, so no other operator's join planning changes."""
    out = scratch_dir(sf_dir, "skew_aqe")
    with scoped_confs(spark, **_SKEW_AQE_CONFS):
        skew_aqe_join(spark, sf_dir).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@register(
    "agg_bucketed_reuse",
    f"""
    SELECT l_orderkey, count(*) AS n_items,
           {_dsum_sql('l_extendedprice')} AS order_price
    FROM lineitem
    GROUP BY l_orderkey
    HAVING count(*) >= 5
    """,
)
def agg_bucketed_reuse(spark, sf_dir):
    """Shuffle-FREE aggregation on the bucketed layout — the second payoff
    of the bucket fixture join_bucketed pays for: the bucketed scan's
    output partitioning is HashPartitioning(l_orderkey, 8), which already
    satisfies the groupBy's ClusteredDistribution, so the aggregate runs
    with ZERO Exchange in the plan (asserted in tests/test_plans.py) — no
    partial/final split, one pass. At 100 TB this is the daily
    per-entity rollup on a table bucketed by the entity key: the
    exchange a naive layout pays on every run is paid once at write
    time. Same oracle semantics as a plain groupBy (the HAVING keeps the
    output row count bounded at larger SFs)."""
    li_tbl, _ = bucket_fixture(spark, sf_dir)
    return (
        spark.table(li_tbl)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice")).alias("order_price"),
        )
        .filter(F.col("n_items") >= 5)
    )


# ---------------------------------------------------------------------------
# Pareto frontier (2-D skyline) — local-frontier-then-merge
# ---------------------------------------------------------------------------

SKYLINE_BUCKETS = 32


@register(
    "pareto_frontier",
    """
    WITH pts AS (
      SELECT p_retailprice AS retail_price, p_size AS size,
             count(*) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT retail_price, size, n_parts FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.retail_price <= a.retail_price AND b.size >= a.size
        AND (b.retail_price < a.retail_price OR b.size > a.size)
    )
    """,
)
def pareto_frontier(spark, sf_dir):
    """2-D skyline of `part`: the set of (retail_price, size) points not
    dominated by any other (cheaper-or-equal AND bigger-or-equal with one
    strict) — the classic multi-objective shortlist (Borzsony et al.
    ICDE'01). The oracle is the naive O(n^2) NOT EXISTS dominance query;
    the Spark side runs the DISTRIBUTED shape that survives 100 TB:

    1. collapse to distinct points with multiplicity (combinable groupBy);
    2. per-price argmax on size (max_by struct — same-price smaller sizes
       are dominated outright), leaving <= |distinct prices| rows;
    3. RANGE-BLOCK by price into SKYLINE_BUCKETS fixed-width buckets
       (bounds from one 1-row min/max agg, broadcast) and compute each
       bucket's LOCAL frontier with a per-bucket running-max window —
       the global frontier is a subset of the union of local frontiers,
       so the only global pass runs over the tiny per-bucket summary:
       a point survives iff its size exceeds the running max size of all
       STRICTLY-cheaper buckets (B rows, broadcast back).

    No global sort, no single-reducer window: the per-bucket windows
    partition by bucket id, and the cross-bucket test joins against a
    B-row cumulative summary. Dominance tests compare stored values only
    (no float arithmetic), so both engines agree bit-for-bit."""
    from pyspark.sql import Window

    pts = (
        table(spark, sf_dir, "part")
        .groupBy(
            F.col("p_retailprice").alias("retail_price"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    # per-price argmax: same-price points with smaller size are dominated
    best = (
        pts.groupBy("retail_price")
        .agg(F.max(F.struct("size", "n_parts")).alias("m"))
        .select("retail_price", F.col("m.size").alias("size"),
                F.col("m.n_parts").alias("n_parts"))
    )
    bounds = best.agg(
        F.min("retail_price").alias("lo"), F.max("retail_price").alias("hi")
    )
    # localCheckpoint: both the local-frontier branch and the B-row summary
    # read `binned`; without materialization Spark re-derives the whole
    # scan+agg lineage per branch (verified in the plan — two FileScan
    # subtrees). The checkpoint is bounded at |distinct prices| rows.
    binned = (
        best.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bucket",
            # hi == lo (every price identical) zeroes the bucket width,
            # which under ANSI mode is a DIVIDE_BY_ZERO error, not NaN —
            # collapse that degenerate case to one bucket explicitly
            F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(SKYLINE_BUCKETS - 1),
                    F.floor(
                        (F.col("retail_price") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / SKYLINE_BUCKETS)
                    ),
                )
            ),
        )
        .transform(materialize)
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("retail_price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # bucket_max rides the SAME bucket exchange as the running-max window
    # (two Window nodes, one Exchange — keeps the agg subtree single-pass
    # instead of recomputing the scan+groupBy for a separate summary)
    annotated = binned.withColumn("prev_max", F.max("size").over(w_local)).withColumn(
        "bucket_max", F.max("size").over(Window.partitionBy("bucket"))
    )
    local = annotated.filter(
        F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max"))
    )
    # B-row summary: running max size over strictly-lower buckets
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    summary = (
        annotated.select("bucket", "bucket_max")
        .dropDuplicates(["bucket"])
        .withColumn("lower_max", F.max("bucket_max").over(w_bucket))
        .select("bucket", "lower_max")
    )
    return (
        local.join(F.broadcast(summary), "bucket")
        .filter(F.col("lower_max").isNull() | (F.col("size") > F.col("lower_max")))
        .select("retail_price", "size", "n_parts")
    )
