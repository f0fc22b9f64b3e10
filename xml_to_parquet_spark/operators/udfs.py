"""Pandas UDF / UDAF surface [EXT] (SURVEY.md §2.2 UDF row).

Demonstrates the two sanctioned Python extension points — vectorized
scalar ``pandas_udf`` and grouped ``applyInPandas`` — with Arrow-batched
transfer (never row-at-a-time Python UDFs). Both examples compute
integer-exact results (cents arithmetic) so the DuckDB oracles match
bit-for-bit despite crossing the Python boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table


@F.pandas_udf(T.LongType())
def _price_cents_bucket(price: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: price → integer cents → mod-97 bucket.
    Arrow batches in/out; numpy does the arithmetic."""
    return ((price * 100).round().astype("int64")) % 97


@register(
    "udf_pandas_scalar",
    """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) % 97 AS price_bucket
    FROM orders
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", _price_cents_bucket("o_totalprice").alias("price_bucket"))


def _per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [len(pdf)],
            "total_cents": [cents.sum()],
            "max_cents": [cents.max()],
        }
    )


@register(
    "udaf_grouped_pandas",
    """
    SELECT o_custkey,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents,
           max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
    FROM orders GROUP BY o_custkey
    """,
)
def udaf_grouped_pandas(spark, sf_dir):
    """Grouped-map UDAF via applyInPandas: each customer's orders arrive as
    one pandas DataFrame (shuffle on the group key — at scale watch group
    cardinality: per-group data must fit an executor's Arrow batch; here
    groups are ~10 rows)."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return o.groupBy("o_custkey").applyInPandas(
        _per_customer,
        schema="o_custkey bigint, n_orders bigint, total_cents bigint, max_cents bigint",
    )


def _cogroup_merge(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    if len(cust) == 0:
        return pd.DataFrame(
            columns=["c_custkey", "c_acctbal", "n_orders", "total_spend"]
        )
    spend = float(orders["o_totalprice"].astype("float64").sum()) if len(orders) else 0.0
    return pd.DataFrame(
        {
            "c_custkey": [int(cust["c_custkey"].iloc[0])],
            "c_acctbal": [round(float(cust["c_acctbal"].iloc[0]), 2)],
            "n_orders": [len(orders)],
            "total_spend": [round(spend, 2)],
        }
    )


@register(
    "udf_cogrouped_pandas",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, round(c_acctbal, 2)
    """,
)
def udf_cogrouped_pandas(spark, sf_dir):
    """Cogrouped Pandas (applyInPandas over a cogroup): both sides shuffle
    once on the key, then each (customer-slice, orders-slice) pair lands in
    one Python call — the escape hatch for per-key merge logic no join
    expresses. Float sums stay inside one pandas call per key, so rounding
    to 2 decimals is stable vs the oracle (per-customer order counts are
    small; the double sum is order-exact at these magnitudes)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            _cogroup_merge,
            schema="c_custkey bigint, c_acctbal double, n_orders bigint, total_spend double",
        )
    )
