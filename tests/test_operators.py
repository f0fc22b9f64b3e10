"""Operator-surface tests: registry completeness, every query executes, and
a representative subset is checked against its DuckDB oracle (the driver's
correctness gate, run small)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.tables import TABLE_NAMES

ORACLE_SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_asof",
    "window_rank",
    "set_intersect",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "sim_topk_cosine",
    "stream_session_window",
    "udaf_grouped_pandas",
    "mm_decode_meta",
]

# queries that legitimately return 0 rows at sf0.001 (tiny data → no
# candidates above thresholds)
MAY_BE_EMPTY = {
    "join_anti",
    "set_except",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_embedding_neardup",
    "agg_having",
}


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for _, r in df.iterrows())


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_registry_coverage(registry):
    assert len(registry) >= 55
    with_oracle = [n for n, q in registry.items() if q.oracle]
    assert len(with_oracle) >= 50


def test_all_queries_execute(spark, sf_dir, registry):
    failures = []
    for name, qd in registry.items():
        try:
            n = qd.fn(spark, sf_dir).count()
        except Exception as e:
            failures.append((name, str(e)[:120]))
            continue
        if n == 0 and name not in MAY_BE_EMPTY:
            failures.append((name, "returned 0 rows"))
    assert not failures, failures


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_oracle_parity(spark, sf_dir, registry, duck, name):
    qd = registry[name]
    sdf = qd.fn(spark, sf_dir).toPandas()
    odf = duck.execute(qd.oracle).df()
    assert sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in odf.columns)
    assert _canon(sdf) == _canon(odf)


def test_xpath_typed_extractors(spark):
    """API coverage for the typed xpath_* family (scalar_xpath_fns itself
    uses the parse-once xpath() array pattern for scale — see its
    docstring): every typed extractor must parse and coerce correctly."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.lit("<r><i>42</i><s>hi</s><d>2.5</d></r>").alias("xml")
        )
        .select(
            F.xpath_long("xml", F.lit("/r/i/text()")).alias("l"),
            F.xpath_int("xml", F.lit("/r/i/text()")).alias("i"),
            F.xpath_string("xml", F.lit("/r/s")).alias("s"),
            F.xpath_double("xml", F.lit("/r/d/text()")).alias("d"),
            F.xpath_float("xml", F.lit("/r/d/text()")).alias("f"),
            F.xpath_boolean("xml", F.lit("/r/i mod 2 = 0")).alias("b"),
            F.xpath_short("xml", F.lit("/r/i/text()")).alias("sh"),
        )
        .collect()[0]
    )
    assert row["l"] == 42 and row["i"] == 42 and row["sh"] == 42
    assert row["s"] == "hi"
    assert row["d"] == 2.5 and abs(row["f"] - 2.5) < 1e-6
    assert row["b"] is True


def test_hll_mergeable_accuracy(spark, sf_dir):
    """Unioned fine-grain HLL sketches must estimate the coarse-grain
    distinct count within the sketch's error bound (lgK=12 → ~1.6% rse;
    assert 5% for slack) — this is what makes sketch rollups servable."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.relational import agg_hll_mergeable
    from xml_to_parquet_spark.tables import table

    got = {
        r["l_returnflag"]: r["approx_orders"]
        for r in agg_hll_mergeable(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) <= max(1, 0.05 * exact[flag]), (
            flag, est, exact[flag],
        )


def test_xpath_empty_element_guard(spark):
    """`/o/*/text()` DROPS the text() node of an empty element, shifting
    later fields into earlier slots — scalar_xpath_fns guards with a
    size(arr)=3 CASE that nulls the row instead (ADVICE r5). Pin both the
    shift behavior that motivates the guard and the guard itself."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("<o><k>7</k><st></st><p>1.5</p></o>",),
         ("<o><k>8</k><st>F</st><p>2.5</p></o>",)],
        ["xml"],
    )
    arr = F.xpath("xml", F.lit("/o/*/text()"))
    ok = F.size(arr) == 3
    rows = df.select(
        F.size(arr).alias("n"),
        F.element_at(arr, F.when(ok, F.lit(1))).cast("long").alias("k"),
        F.element_at(arr, F.when(ok, F.lit(2))).alias("st"),
    ).orderBy("n").collect()
    # empty <st/>: xpath yields only 2 text nodes -> guard nulls the row
    assert rows[0].n == 2 and rows[0].k is None and rows[0].st is None
    assert rows[1].n == 3 and rows[1].k == 8 and rows[1].st == "F"


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd=0.02 — tightened from the 5%
    default per the operator's own comment) must land within ±5% of the
    exact per-group distinct count, putting this assertion at 2.5 sigma —
    deterministic data, so a deterministic bound: the rows-only driver
    check gets local teeth (VERDICT r5 #6)."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.relational import approx_count_distinct
    from xml_to_parquet_spark.tables import table

    got = {
        r["l_returnflag"]: r["approx_orders"]
        for r in approx_count_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) <= max(1, 0.05 * exact[flag]), (
            flag, est, exact[flag],
        )


def test_approx_percentile_accuracy(spark, sf_dir):
    """percentile_approx (default accuracy=10000 → rank error ≤ 1e-4 of
    the group) must agree with the exact median to within 1% of the
    value on every group (VERDICT r5 #6)."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.relational import agg_approx_percentile
    from xml_to_parquet_spark.tables import table

    got = {
        r["l_returnflag"]: r["approx_median"]
        for r in agg_approx_percentile(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["m"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("m"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) <= 0.01 * abs(exact[flag]), (
            flag, est, exact[flag],
        )
