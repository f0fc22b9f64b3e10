"""Property tests for the round-2 operators: invariants that the DuckDB
oracle can't express (coverage/structure properties rather than value
parity, which LOCAL_CORRECTNESS.md already pins at two scale factors)."""

from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.sessions import SESSION_GAP_US, sessionize_events
from xml_to_parquet_spark.operators.text import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    text_chunk_overlap,
)
from xml_to_parquet_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_chunks_cover_every_token(spark):
    """Every document's token stream is fully covered: chunk count equals
    ceil(n/stride), indices are contiguous from 0, the last chunk is
    non-empty, all others inside a doc are full-size or the doc is short."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split(F.lower("text"), r"\s+")).alias("n")
    ).filter(F.col("n") > 0)
    chunks = text_chunk_overlap(spark, SF)
    agg = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.min("chunk_idx").alias("min_idx"),
        F.max("chunk_idx").alias("max_idx"),
        F.min("n_tokens").alias("min_len"),
    )
    joined = agg.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("n_chunks") != F.ceil(F.col("n") / float(CHUNK_STRIDE)))
        | (F.col("min_idx") != 0)
        | (F.col("max_idx") != F.col("n_chunks") - 1)
        | (F.col("min_len") <= 0)
        | (F.col("min_len") > CHUNK_SIZE)
    )
    assert bad.count() == 0


def test_sessions_partition_events_and_respect_gap(spark):
    """Sessions partition each user's events exactly (counts add up) and
    consecutive sessions of a user are separated by more than the gap."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sessions = sessionize_events(spark, SF)
    per_user = sessions.groupBy("user_id").agg(
        F.sum("n_events").alias("total"),
        F.count(F.lit(1)).alias("n_sessions"),
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("total_true"))
    assert (
        per_user.join(truth, "user_id")
        .filter(F.col("total") != F.col("total_true"))
        .count()
        == 0
    )
    # inter-session gap property: next session starts > gap after this ends
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("session_idx")
    gaps = sessions.select(
        "user_id",
        "session_idx",
        (
            F.unix_micros(F.lead("session_start").over(w))
            - F.unix_micros("session_end")
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    assert gaps.filter(F.col("gap_us") <= SESSION_GAP_US).count() == 0


def test_pagerank_mass_conserved_and_positive(spark):
    """Total scaled rank mass stays within rounding slack of SCALE and
    every rank is positive — the invariant pair that catches both a lost
    node and a sign/overflow bug in the integer arithmetic."""
    from xml_to_parquet_spark.operators.graphs import SCALE, pagerank_fixed

    ranks = pagerank_fixed(spark, SF)
    stats = ranks.agg(
        F.sum("rank_scaled").alias("mass"),
        F.min("rank_scaled").alias("rmin"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert stats["rmin"] > 0
    # each floor-division loses < 1 unit per node per term; 3 iterations
    slack = 4 * stats["n"] * 100
    assert SCALE - slack <= stats["mass"] <= SCALE


def test_merge_upsert_actions_consistent(spark):
    """Every source key appears with the right action; inserted keys are
    new, updated keys exist in target."""
    reg = load_all()
    out = reg["merge_upsert"].fn(spark, SF).cache()
    try:
        assert out.filter(
            (F.col("merge_action") == "inserted") & (F.col("key") < 100000000)
        ).count() == 0
        assert out.filter(
            (F.col("merge_action") == "updated") & (F.col("key") % 1000 >= 5)
        ).count() == 0
        assert out.filter(F.col("merge_action") == "unchanged").count() > 0
    finally:
        out.unpersist()


def test_simhash_banding_recall_guarantee(spark, sf_dir):
    """Manku–Jain–Sarma pigeonhole property: 4 bands over a 32-bit hash
    must find EVERY pair within hamming distance 3 (a pair differing in
    ≤3 bits leaves ≥1 of the 4 bands untouched). Brute-force all pairs
    at the smallest SF and compare against the banded operator."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.functions.text_fns import TOKENS_SQL
    from xml_to_parquet_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        _simhash_bits_spark,
        dedup_simhash,
    )
    from xml_to_parquet_spark.tables import table

    sh = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKENS_SQL).alias("toks"))
        .select(
            "doc_id",
            F.expr(f"({_simhash_bits_spark()})").cast("bigint").alias("simhash"),
        )
        .toPandas()
    )
    want = set()
    rows = list(sh.itertuples(index=False))
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if bin(a.simhash ^ b.simhash).count("1") <= SIMHASH_MAX_HAMMING:
                pair = (min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id))
                want.add(pair)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_simhash(spark, sf_dir).collect()
    }
    assert got == want  # banding loses nothing and invents nothing
