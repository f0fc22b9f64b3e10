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


N_UDF_BUCKETS = 64  # Python calls per stage: one per bucket, not per key


def _per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
    """One call per BUCKET of customers; the per-customer aggregation is a
    vectorized pandas groupby inside. Grouping by the raw key instead
    (one Python call per customer) costs ~1.5 ms per call — measured 25 s
    for 15k customers at sf0.1 vs ~0.5 s bucketed."""
    pdf = pdf.assign(cents=(pdf["o_totalprice"] * 100).round().astype("int64"))
    g = pdf.groupby("o_custkey")["cents"].agg(["size", "sum", "max"]).reset_index()
    return pd.DataFrame(
        {
            "o_custkey": g["o_custkey"].astype("int64"),
            "n_orders": g["size"].astype("int64"),
            "total_cents": g["sum"].astype("int64"),
            "max_cents": g["max"].astype("int64"),
        }
    )


@register(
    "udaf_grouped_pandas",
    """
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
    FROM orders GROUP BY o_custkey
    """,
)
def udaf_grouped_pandas(spark, sf_dir):
    """Grouped-map UDAF via applyInPandas, grouped on a KEY BUCKET
    (pmod(key, 64)) with a vectorized pandas groupby inside — the
    per-group-Python-call overhead of grouping on the raw key dominates
    runtime when groups are small and numerous (the common case). Bucketing
    by a hash of the key preserves correctness for any per-key computation
    while doing 64 Python calls instead of |keys|."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return o.groupBy(F.pmod("o_custkey", F.lit(N_UDF_BUCKETS))).applyInPandas(
        _per_customer,
        schema="o_custkey bigint, n_orders bigint, total_cents bigint, max_cents bigint",
    )


def _cogroup_merge(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    """One call per BUCKET: vectorized left-merge of the two slices (same
    bucketing rationale as _per_customer)."""
    if len(cust) == 0:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series(dtype="int64"),
                "c_acctbal": pd.Series(dtype="float64"),
                "n_orders": pd.Series(dtype="int64"),
                "total_spend": pd.Series(dtype="float64"),
            }
        )
    spend = (
        orders.groupby("o_custkey")["o_totalprice"].agg(["size", "sum"])
        if len(orders)
        else pd.DataFrame(columns=["size", "sum"])
    )
    m = cust[["c_custkey", "c_acctbal"]].merge(
        spend, left_on="c_custkey", right_index=True, how="left"
    )
    return pd.DataFrame(
        {
            "c_custkey": m["c_custkey"].astype("int64"),
            "c_acctbal": m["c_acctbal"].round(2),
            "n_orders": m["size"].fillna(0).astype("int64"),
            "total_spend": m["sum"].fillna(0.0).round(2),
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
    expresses. Cogrouped on a key bucket (64 Python calls, vectorized merge
    inside) — per-key cogrouping measured 25 s at sf0.1 vs sub-second
    bucketed. Per-customer double sums round to 2 decimals; order counts
    are small, so the sum is order-exact at these magnitudes."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.groupBy(F.pmod("c_custkey", F.lit(N_UDF_BUCKETS)))
        .cogroup(orders.groupBy(F.pmod("o_custkey", F.lit(N_UDF_BUCKETS))))
        .applyInPandas(
            _cogroup_merge,
            schema="c_custkey bigint, c_acctbal double, n_orders bigint, total_spend double",
        )
    )


_SEGMENT_TIERS = {
    "AUTOMOBILE": "consumer",
    "BUILDING": "industrial",
    "FURNITURE": "consumer",
    "HOUSEHOLD": "consumer",
    "MACHINERY": "industrial",
}


@register(
    "udf_broadcast_lookup",
    """
    SELECT c_custkey, c_mktsegment,
           CASE c_mktsegment
                WHEN 'AUTOMOBILE' THEN 'consumer'
                WHEN 'BUILDING'   THEN 'industrial'
                WHEN 'FURNITURE'  THEN 'consumer'
                WHEN 'HOUSEHOLD'  THEN 'consumer'
                WHEN 'MACHINERY'  THEN 'industrial'
                ELSE 'other' END AS tier
    FROM customer
    """,
)
def udf_broadcast_lookup(spark, sf_dir):
    """Broadcast-variable dictionary lookup inside a vectorized pandas UDF:
    the side table ships once per executor (not per task/row), the UDF maps
    via pandas — the pattern for enrichment dictionaries too irregular for
    a join (nested config, model vocabularies). For a flat dict like this a
    broadcast JOIN is equivalent; the point is the mechanism."""
    bmap = spark.sparkContext.broadcast(_SEGMENT_TIERS)

    @F.pandas_udf(T.StringType())
    def tier_of(seg: pd.Series) -> pd.Series:
        m = bmap.value
        return seg.map(lambda s: m.get(s, "other"))

    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", tier_of("c_mktsegment").alias("tier"))


def _arrow_revenue_batches(it):
    """mapInArrow worker: pyarrow.compute kernels on RecordBatches — zero
    pandas materialization, the lowest-overhead Python crossing Spark has.
    Revenue in exact integer cents so the oracle matches bit-for-bit."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        price = batch.column(batch.schema.get_field_index("l_extendedprice"))
        disc = batch.column(batch.schema.get_field_index("l_discount"))
        rev = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        # floor(x*100 + 0.5), not round(): Arrow rounds half-to-even while
        # SQL round() is half-away-from-zero — the explicit floor form is
        # identical everywhere (repo-wide convention for exact cents)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(rev, pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        okey = pc.cast(
            batch.column(batch.schema.get_field_index("l_orderkey")), pa.int64()
        )
        lnum = pc.cast(
            batch.column(batch.schema.get_field_index("l_linenumber")), pa.int64()
        )
        yield pa.RecordBatch.from_arrays(
            [okey, lnum, cents], names=["l_orderkey", "l_linenumber", "revenue_cents"]
        )


@register(
    "udf_arrow_map",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
               AS revenue_cents
    FROM lineitem
    """,
)
def udf_arrow_map(spark, sf_dir):
    """mapInArrow: the third Python-crossing tier after row-UDF (never) and
    pandas UDF — Arrow RecordBatches in and out with no pandas conversion,
    right for byte-level / columnar-native logic. Map-only, batch-bounded
    memory; rounding happens in integer cents so Arrow's double math agrees
    with the oracle exactly."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(
        _arrow_revenue_batches,
        schema="l_orderkey bigint, l_linenumber bigint, revenue_cents bigint",
    )


# ---------------------------------------------------------------------------
# Python UDTF (VERDICT r8 #7): the Spark 4 table-function surface — the
# UDF-family member that RETURNS A RELATION (0..n rows per input row),
# completing the tier list above.
# ---------------------------------------------------------------------------


def _chunk_udtf_cls():
    """Built lazily so module import never requires a live session."""
    import hashlib
    import math
    import re

    from pyspark.sql.functions import udtf

    from xml_to_parquet_spark.operators.text import CHUNK_SIZE, CHUNK_STRIDE

    @udtf(
        returnType=(
            "doc_id bigint, chunk_idx bigint, n_tokens int, chunk_hash string"
        )
    )
    class ChunkDocument:
        """Overlapping context-window chunker as a table function:
        one document row in, ceil(n/stride) chunk rows out."""

        def eval(self, doc_id, text):  # noqa: D102 — UDTF contract method
            if text is None:
                return
            toks = re.split(r"\s+", text.lower())
            n = len(toks)
            if n == 0:
                return
            for ci in range(math.ceil(n / CHUNK_STRIDE)):
                start = ci * CHUNK_STRIDE
                chunk = toks[start : start + CHUNK_SIZE]
                yield (
                    doc_id,
                    ci,
                    min(CHUNK_SIZE, n - start),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    return ChunkDocument


@register("udtf_table_fn", None)  # oracle attached below (shared)
def udtf_table_fn(spark, sf_dir):
    """Python UDTF (Spark 4): a user-defined TABLE function applied per
    input row via LATERAL join — the surface for set-returning logic that
    scalar/grouped pandas UDFs can't express (parsers, chunkers,
    expanders yielding a variable number of typed rows). This one mirrors
    text_chunk_overlap's pretraining chunker exactly (size 64, stride 48,
    md5 chunk identity, same \\s+ tokenization), so it SHARES that
    query's DuckDB oracle — the Python table function is value-proven
    against the pure-SQL formulation.

    Scale shape: the UDTF executes inside the scan stage — per-partition
    Python workers stream input rows and emit chunk rows, no shuffle
    (plan: pruned (doc_id, text) scan → BatchEvalPythonUDTF), and
    per-document memory; output rows scale with chunks exactly like the
    explode() formulation. useArrow=True was measured and REJECTED for
    this operator: the generator yields row-at-a-time, so Arrow's
    columnar batch conversion is pure overhead here (warm sf0.1: 1.02s
    Arrow vs 0.43s default pickle batching) — Arrow UDTFs win when eval
    is vectorizable, not for per-row fan-out. The JVM↔Python crossing is the cost vs the
    all-codegen twin (bench: text_chunk_overlap is the fast path; this
    entry exists to prove the SURFACE, and the oracle proves it loses no
    correctness doing so)."""
    cls = _chunk_udtf_cls()
    spark.udtf.register("chunk_document", cls)
    docs = table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs_src")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk_hash
        FROM udtf_docs_src AS d,
             LATERAL chunk_document(d.doc_id, d.text) AS c
        """
    )


from xml_to_parquet_spark.operators import text as _text_mod  # noqa: E402,F401
from xml_to_parquet_spark.registry import REGISTRY as _REG  # noqa: E402

# the UDTF answers the exact same query as the codegen chunker, so it
# shares text_chunk_overlap's oracle verbatim (the sim_ivf_persist device;
# the module import above guarantees the twin is registered even when this
# module is imported standalone)
_REG["udtf_table_fn"].oracle = _REG["text_chunk_overlap"].oracle
