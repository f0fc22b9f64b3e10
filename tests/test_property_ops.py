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


def test_ppjoin_filters_never_drop_a_qualifying_pair():
    """Hypothesis property over random token-set corpora: the EXACT
    integer filter chain dedup_prefix_filter runs (df-ordered prefix +
    length filter + positional filter with the integerized alpha bound)
    must generate a candidate for every pair whose true Jaccard passes
    the threshold — the recall-losslessness the PPJoin lemmas promise,
    checked against the same integer formulas the operator uses."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xml_to_parquet_spark.operators.dedup import PF_DEN, PF_NUM

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.sets(st.integers(0, 30), min_size=1, max_size=12),
            min_size=2,
            max_size=8,
        )
    )
    def check(corpus):
        df = Counter(t for s in corpus for t in s)
        order = {t: r for r, t in enumerate(sorted(df, key=lambda t: (df[t], t)))}
        docs = []
        for s in corpus:
            toks = sorted(s, key=order.__getitem__)
            n = len(toks)
            plen = n - (PF_NUM * n + PF_DEN - 1) // PF_DEN + 1
            # (token, 1-based position, n) for prefix tokens
            docs.append([(t, p + 1, n) for p, t in enumerate(toks)][:plen])
        full = [set(s) for s in corpus]
        for i in range(len(corpus)):
            for j in range(i + 1, len(corpus)):
                inter = len(full[i] & full[j])
                union = len(full[i] | full[j])
                if PF_DEN * inter < PF_NUM * union:
                    continue  # pair below threshold: no recall obligation
                # the operator's candidate test: some shared prefix token
                # passes length + positional filters
                ok = False
                for ta, pa, na in docs[i]:
                    for tb, pb, nb in docs[j]:
                        if ta != tb:
                            continue
                        if PF_NUM * na > PF_DEN * nb or PF_NUM * nb > PF_DEN * na:
                            continue
                        ub = 1 + min(na - pa, nb - pb)
                        if (PF_NUM + PF_DEN) * ub >= PF_NUM * (na + nb):
                            ok = True
                assert ok, (corpus[i], corpus[j], inter, union)

    check()


def test_gif_lzw_roundtrip_property():
    """Hypothesis property: LZW encode/decode round-trips ANY byte
    sequence exactly (covers code-width growth, KwKwK, and the
    dictionary-reset path for long noisy inputs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xml_to_parquet_spark.functions.gifcodec import _lzw_decode, _lzw_encode

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=1, max_size=4000))
    def check(data):
        assert _lzw_decode(_lzw_encode(data), len(data)) == data

    check()


def test_er_pigeonhole_recall_property():
    """Hypothesis property: for any 9-char ID and any single-character
    substitution, at least ER_SEGS-1 of the 3-char segments are intact —
    the blocking guarantee er_blocking_link's recall rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xml_to_parquet_spark.operators.dedup import ER_SEGS

    hexd = "0123456789abcdef"

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(hexd, min_size=9, max_size=9),
        st.integers(0, 8),
        st.sampled_from(hexd),
    )
    def check(rid, p, ch):
        dirty = rid[:p] + (ch if ch != rid[p] else hexd[(hexd.index(ch) + 1) % 16]) + rid[p + 1 :]
        segs = lambda s: [s[i * 3 : i * 3 + 3] for i in range(ER_SEGS)]
        intact = sum(a == b for a, b in zip(segs(rid), segs(dirty)))
        assert intact >= ER_SEGS - 1
        # and the corruption is a REAL single substitution: levenshtein 1
        assert sum(a != b for a, b in zip(rid, dirty)) == 1

    check()
