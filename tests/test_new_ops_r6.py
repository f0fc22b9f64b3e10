"""Semantic tests for the round-6 [EXT] additions (beyond the execute-all
and oracle-parity harnesses): Gopher repetition gate, PII redaction,
shingle containment, bitmap exact distinct, SCD2 build, binned range join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.tables import table


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_gopher_fracs_bounded_and_consistent(spark, sf_dir, reg):
    out = reg["text_quality_gopher"].fn(spark, sf_dir).toPandas()
    n_docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0).count()
    assert len(out) == n_docs
    for col in ["top_token_frac", "top_2gram_frac", "dup_2gram_frac", "symbol_ratio"]:
        assert (out[col] >= 0).all() and (out[col] <= 1).all(), col
    # the top 2-gram can never be rarer than a uniform spread implies:
    # top_2gram_frac >= 1/n_grams >= something > 0
    assert (out["top_2gram_frac"] > 0).all()
    # the gate column is exactly the conjunction of its published cuts
    expect = (out["top_token_frac"] <= 0.2) & (out["dup_2gram_frac"] <= 0.6)
    assert (out["passes_gopher"] == expect).all()


def test_pii_redact_removes_all_pii(spark, sf_dir, reg):
    out = reg["text_pii_redact"].fn(spark, sf_dir).toPandas()
    # the spliced PII guarantees >= 2 emails and >= 1 IP per doc...
    assert (out["n_emails"] >= 2).all()
    assert (out["n_ips"] >= 1).all()
    # ...and redaction must leave no residue matching the operator's OWN
    # patterns (not a looser proxy like '@[A-Za-z]', which would false-fail
    # on a corpus token such as '@word' that the email regex never matched)
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip_re = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
    assert not out["redacted"].str.contains(email_re).any()
    assert not out["redacted"].str.contains(ip_re).any()
    assert out["redacted"].str.contains("<EMAIL>").all()
    assert out["redacted"].str.contains("<IP>").all()


def test_containment_asymmetric_and_superset_of_jaccard(spark, sf_dir, reg):
    """C(A,B) >= J(A,B) always (same intersection, smaller denominator),
    so at matched thresholds every Jaccard pair must reappear as a
    containment pair (in both directions at these sizes)."""
    jac = reg["dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas()
    cont = reg["dedup_containment"].fn(spark, sf_dir).toPandas()
    assert (cont["containment"] >= 0.5).all()
    assert (cont["containment"] <= 1.0 + 1e-9).all()
    cpairs = set(zip(cont["doc_a"], cont["doc_b"]))
    for _, r in jac.iterrows():
        if r["jaccard"] >= 0.5:
            assert (r["doc_a"], r["doc_b"]) in cpairs or (
                r["doc_b"],
                r["doc_a"],
            ) in cpairs


def test_bitmap_distinct_equals_exact(spark, sf_dir, reg):
    got = {
        r["l_returnflag"]: r["n_distinct"]
        for r in reg["agg_bitmap_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert got == exact  # bitmaps are EXACT, not approximate


def test_scd2_intervals_partition_history(spark, sf_dir, reg):
    """SCD2 invariants: per customer, exactly one current row; intervals
    are non-overlapping and chained (each valid_to equals the next
    valid_from); consecutive intervals never share a status (else they
    would have been collapsed)."""
    out = reg["cdc_scd2_build"].fn(spark, sf_dir).toPandas()
    assert (out["is_current"] == out["valid_to"].isna()).all()
    per_cust = out.groupby("custkey")
    assert (per_cust["is_current"].sum() == 1).all()
    for _, g in list(per_cust)[:200]:
        g = g.sort_values("valid_from")
        froms = g["valid_from"].tolist()
        tos = g["valid_to"].tolist()
        sts = g["status"].tolist()
        for i in range(len(g) - 1):
            assert tos[i] == froms[i + 1]  # chained, gap-free
            assert sts[i] != sts[i + 1]  # collapsed runs


def test_binned_range_join_matches_naive_theta_join(spark, sf_dir, reg):
    """The binned equi-join + residual must produce EXACTLY the rows of
    the naive theta join it replaces (the rewrite is a plan optimization,
    not an approximation)."""
    out = reg["join_range_binned"].fn(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sigma")
    )
    incidents = (
        hourly.join(stats, "event_type")
        .filter(
            (F.col("sigma") > 0)
            & ((F.col("n") - F.col("mu")) / F.col("sigma") >= 2.0)
        )
        .select(
            F.col("event_type").alias("incident_type"),
            F.col("h").alias("w_start"),
            (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("w_end"),
        )
    )
    naive = (
        incidents.join(
            ev,
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        )
        .groupBy("incident_type", F.col("w_start").alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in naive.collect()}
    assert a == b


def test_binned_range_join_no_nested_loop(spark, sf_dir, reg):
    """The whole point of the rewrite: the fact-side join must be a hash
    join on the time bin, never BroadcastNestedLoopJoin / CartesianProduct
    over events."""
    from xml_to_parquet_spark.plans.inspect import node_counts

    df = reg["join_range_binned"].fn(spark, sf_dir)
    n = node_counts(df)
    assert not n.get("CartesianProduct"), n
    # the only BNLJ tolerated is none at all — bins make it an equi-join
    assert not n.get("BroadcastNestedLoopJoin"), n


def test_phash_bits_match_decoded_rows(spark, sf_dir, reg):
    """dhash packs exactly the n_desc set bits, and every hash fits in
    height-1 bits (the bit width of the descent vector)."""
    out = reg["mm_image_phash"].fn(spark, sf_dir).toPandas()
    assert len(out) == table(spark, sf_dir, "documents").count()
    for _, r in out.iterrows():
        assert 0 <= r["dhash"] < (1 << (int(r["height"]) - 1))
        assert bin(int(r["dhash"])).count("1") == r["n_desc"]


def test_funnel_monotone_and_ordered(spark, sf_dir, reg):
    """Stage counts must shrink monotonically, and ordering must matter:
    the unordered 'did all three types' user count is an upper bound on
    the ordered funnel's purchase stage."""
    row = reg["funnel_conversion"].fn(spark, sf_dir).collect()[0]
    assert row["n_view_users"] >= row["n_click_users"] >= row["n_purchase_users"]
    assert row["n_purchase_users"] > 0  # sf0.001+ has full funnels
    ev = table(spark, sf_dir, "events")
    unordered = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("k"))
        .filter(F.col("k") == 3)
        .count()
    )
    assert row["n_purchase_users"] <= unordered


def test_pq_adc_matches_numpy_reimplementation(spark, sf_dir, reg):
    """Independent numpy re-implementation of PQ encode + ADC must agree
    with the Spark/SQL pipeline on codes, distances, and the top-10."""
    import numpy as np

    from xml_to_parquet_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_QUERY_ID,
        PQ_SUB,
    )

    emb = (
        table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .toPandas()
        .set_index("vec_id")["embedding"]
    )
    mat = np.array([np.array(v, dtype=np.float64) for v in emb])
    ids = emb.index.to_numpy()
    cb = mat[ids < PQ_K].reshape(PQ_K, PQ_M, PQ_SUB)  # [k, m, sub]
    qv = mat[ids == PQ_QUERY_ID][0].reshape(PQ_M, PQ_SUB)
    qd = ((qv[None, :, :] - cb) ** 2).sum(axis=2)  # [k, m]
    subv = mat.reshape(len(mat), PQ_M, PQ_SUB)
    d = ((subv[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)  # [n,k,m]
    codes = np.argmin(np.round(d, 6), axis=1)  # ties → lowest k, same rule
    adc = qd[codes, np.arange(PQ_M)].sum(axis=1)
    order = np.lexsort((ids, np.round(adc, 6)))[:10]
    expect = {
        int(ids[i]): (
            int((codes[i] * PQ_K ** np.arange(PQ_M)).sum()),
            round(float(adc[i]), 4),
        )
        for i in order
    }
    got = {
        r["vec_id"]: (r["pq_code"], r["adc_dist"])
        for r in reg["sim_pq_adc"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_theta_setops_accuracy(spark, sf_dir, reg):
    """Theta intersection/difference estimates vs exact set algebra on
    the same keys: ±10% + small absolute slack (two sketches' rse
    compound through set ops)."""
    got = {
        r["set_op"]: r["n"] for r in reg["agg_theta_setops"].fn(spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    a = {r[0] for r in li.filter(F.col("l_returnflag") == "A").select("l_suppkey").distinct().collect()}
    r_ = {r[0] for r in li.filter(F.col("l_returnflag") == "R").select("l_suppkey").distinct().collect()}
    exact = {
        "suppkeys_in_A_and_R": len(a & r_),
        "suppkeys_R_only": len(r_ - a),
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.10 * exact[k]), (k, est, exact[k])


def test_kll_quantiles_accuracy(spark, sf_dir, reg):
    """KLL quantile estimates must fall within a 2.5% RANK window of the
    requested quantile (k=200 → ~1.65% rank error; 2.5% gives slack):
    the returned value's true rank is computed exactly per group."""
    got = reg["agg_kll_quantiles"].fn(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    for r in got:
        grp = li.filter(F.col("l_returnflag") == r["l_returnflag"])
        n = grp.count()
        for col, q in [("approx_p50", 0.5), ("approx_p95", 0.95)]:
            rank = grp.filter(F.col("l_extendedprice") <= r[col]).count() / n
            assert abs(rank - q) <= 0.025, (r["l_returnflag"], col, rank)
