"""TPC-H-derived composite queries [EXT] — SURVEY.md §2.2 joins/agg rows.

The reference has no query surface (SURVEY.md §2.1); these are the standard
TPC-H shapes adapted to the driver's reduced star schema (TESTDATA.md — no
partsupp, no commit/receipt dates, no shipmode). Each query is the classic
plan shape: the point is that Catalyst sees a declarative plan and picks
broadcast vs shuffle join, partial aggregation, and top-k itself.

Scale notes are per-query; shared principles:
  * FIXED/sublinear dims (nation/region/supplier, tables.BROADCAST_TABLES)
    are broadcast explicitly — their cardinality is bounded at any SF.
    customer/part grow LINEARLY with SF, so they carry NO broadcast hint:
    Catalyst's statistics broadcast them while they fit the threshold and
    correctly fall back to a shuffle join at 100 TB, where a forced hint
    would OOM the driver (r16, data-sized-broadcast sweep)
  * money aggregates use dsum/davg (decimal accumulate, round once) so the
    value hash is stable under any partition order at any cluster size
  * top-k always orders by a unique tiebreaker chain
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.relational import (
    _davg_sql,
    _dsum_sql,
    davg,
    dsum,
)
from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table


def _t(spark, sf_dir, name):
    return table(spark, sf_dir, name)


@register(
    "q6_forecast_revenue",
    f"""
    SELECT {_dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-agg. All three predicates push to the
    parquet scan; the agg is a single global partial → 1-row exchange.
    At 100 TB this is I/O-bound by design — no shuffle at all."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@register(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume. Both nation joins broadcast
    (25 rows); supplier broadcasts by contract, customer by statistics
    while it fits (it is SF-linear, so no forced hint); the only
    shuffle is lineitem⋈orders on orderkey. The OR-of-pairs predicate is
    applied after the nation joins so Catalyst can still prune."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10") | (
        F.col("supp_nation") == "NATION_10"
    ) & (F.col("cust_nation") == "NATION_12")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter.
    Date filter prunes orders before the join; nation broadcast; top-k via
    TakeOrderedAndProject (never a global sort at scale)."""
    cutlo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cuthi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi)
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_class",
    """
    SELECT l_returnflag,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape (shipmode → orderpriority: the schema has no
    l_shipmode, TESTDATA.md): conditional counting after a fact⋈fact join.
    orders is the smaller fact — Catalyst/AQE picks the join side; the
    conditional aggregates are map-side partials."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: two-level aggregation (orders-per-customer histogram).
    The outer agg re-aggregates a already-tiny intermediate — the second
    shuffle is O(distinct counts), not O(customers)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(round(
             100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                        AS DECIMAL(24,8))) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(24,8))) AS DOUBLE), 6) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo revenue share. part joins hint-free — it is
    SF-linear, so statistics broadcast it while it fits and shuffle it
    at scale; both sums accumulate in decimal so the ratio is
    bit-identical across engines and partition orders."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo.cast("decimal(24,8)")).cast("double")
                / F.sum(disc.cast("decimal(24,8)")).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: top supplier by quarterly revenue. The scalar-subquery
    max is a window max over the (tiny, per-supplier) aggregate — no second
    scan of lineitem. Equality compares the *rounded* revenue so it is
    exact in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(best), supp.s_suppkey == best.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_qty_revenue",
    f"""
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,8)))
                           AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'SMALL'
      AND l_quantity < 0.2 * (SELECT {_davg_sql('l_quantity')}
                              FROM lineitem l2
                              WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17: correlated scalar subquery (per-part average quantity)
    decorrelated by hand into an aggregate + broadcast join — the same
    rewrite Catalyst does for SQL-form correlated scalars, made explicit.
    The per-part avg uses davg (decimal sum / count) so the 0.2·avg
    threshold is bit-identical to the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part_avg), li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(24,8)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customer",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, round(o_totalprice, 2)
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: large-volume orders. The IN-subquery is a self-aggregate
    on lineitem → left-semi join; quantities are small integers stored as
    double, so their sums are exact in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(
            F.broadcast(big), orders.o_orderkey == big.l_orderkey, "left_semi"
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    f"""
    SELECT {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19: disjunctive multi-attribute predicate across the join.
    part joins by statistics (SF-linear, no forced hint); Catalyst
    extracts the common l_quantity bounds
    (1..30) as a pushed-down range on the fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "q22_global_sales_opportunity",
    f"""
    SELECT cntrycode, count(*) AS numcust,
           {_dsum_sql('c_acctbal')} AS totacctbal
    FROM (SELECT c_nationkey % 10 AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT {_davg_sql('c_acctbal')}
                             FROM customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')) t
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22: customers above the positive-balance average with no
    urgent orders (adapted: the synthetic data gives every customer some
    order, TESTDATA.md). The uncorrelated scalar average broadcasts as a
    1-row cross join; the NOT EXISTS is a left-anti join on customer
    (small side) — the orders scan reads only two columns (pruning)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal")).alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (late-ship proxy for commitdate<receiptdate, which
    the schema lacks — TESTDATA.md): correlated EXISTS with an inequality
    against the outer row → left-semi join on orderkey with the date
    predicate evaluated post-join. The quarter filter prunes orders before
    the semi-join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CAST(floor(CASE WHEN supp_nation = 'NATION_5'
                         THEN volume ELSE 0 END * 1000000 + 0.5) AS BIGINT))
                      AS DOUBLE)
               / CAST(sum(CAST(floor(volume * 1000000 + 0.5) AS BIGINT))
                      AS DOUBLE), 6) AS mkt_share
    FROM (SELECT year(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n.n_name AS supp_nation
          FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n ON s_nationkey = n.n_nationkey
          WHERE p_exists(l_partkey)) t
    GROUP BY o_year
    ORDER BY o_year
    """.replace("p_exists(l_partkey)", "l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of ECONOMY-part volume per year.
    The share is a ratio of two scaled-long sums over the same rows — one
    pass, conditional numerator (never two scans). Fixed dims broadcast,
    part joins by statistics; its filter reaches lineitem as a semi-join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scaled = lambda c: F.sum(F.floor(c * 1_000_000 + F.lit(0.5)).cast("bigint")).cast("double")  # noqa: E731
    return (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                scaled(F.when(F.col("n_name") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / scaled(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    f"""
    SELECT n_name, year(o_orderdate) AS o_year,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_profit
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (profit without ps_supplycost — no partsupp in the
    schema): revenue on 'widget' parts by supplier nation and year. The
    LIKE filter prunes part before its broadcast; the only shuffle is
    lineitem⋈orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
        .orderBy("n_name", "o_year")
    )
