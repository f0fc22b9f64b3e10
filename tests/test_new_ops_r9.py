"""Semantic tests for the round-9 [EXT] additions: HTML boilerplate
removal, the fused IVF-PQ serving index, the stream-stream left-outer
join, the Python UDTF surface, BM25 ranking, label propagation, the
interval-overlap join, and histogram drift.
"""

from __future__ import annotations

import pytest

from xml_to_parquet_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# text_html_extract (operators/text.py)
# ---------------------------------------------------------------------------


def _extract(spark, html: str):
    """Run the extraction expressions over one handwritten page."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.text import _html_extract_exprs

    ex = _html_extract_exprs("spark")
    df = spark.createDataFrame([(html,)], "html string").select(
        F.expr(ex["txts"]).alias("txts")
    )
    return df.collect()[0]["txts"]


def test_html_extract_keeps_main_drops_boilerplate(spark):
    txts = _extract(
        spark,
        '<div><a href="/">home</a> <a href="/x">about</a></div>'
        "<script>var t = 1; track(t);</script>"
        "<p>this paragraph carries the long-form main content of the "
        "page and must survive extraction</p>"
        '<div>(c) corp <a href="/t">terms</a> <a href="/p">privacy</a></div>',
    )
    assert txts == [
        "this paragraph carries the long-form main content of the "
        "page and must survive extraction"
    ]


def test_html_extract_link_density_boundary(spark):
    # text_len 27 >= 25; anchor text "123456789" = 9 chars; 3*9 = 27
    # <= 27 -> kept at EXACTLY a third, dropped one char over.
    at_third = "<p>ab defgh jklmnopq <a href='#'>123456789</a></p>"
    assert len(_extract(spark, at_third)) == 1
    over_third = "<p>ab defgh jklmnop <a href='#'>123456789x</a></p>"
    assert _extract(spark, over_third) == []


def test_html_extract_min_length_gate(spark):
    assert _extract(spark, "<p>short text only here</p>") == []
    assert len(_extract(spark, "<p>twenty-five chars here: ok</p>")) == 1


def test_html_extract_script_content_never_leaks(spark):
    txts = _extract(
        spark,
        "<script>var leak = 'this script body is plenty long enough to "
        "pass the length gate';</script>"
        "<p>legitimate article text long enough to pass the gate</p>",
    )
    assert txts == ["legitimate article text long enough to pass the gate"]


def test_html_extract_boilerplate_only_page_yields_zero_blocks(reg, spark, sf_dir):
    """End-to-end: every document produces a row; kept_blocks counts only
    content blocks and main_text is their space-joined concatenation."""
    out = reg["text_html_extract"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["kept_blocks"] >= 0
        assert r["main_len"] == len(r["main_text"]) - (
            r["kept_blocks"] - 1 if r["kept_blocks"] > 1 else 0
        )


# ---------------------------------------------------------------------------
# sim_ivfpq_search (operators/similarity.py)
# ---------------------------------------------------------------------------


def test_ivfpq_codebook_vectors_self_encode(reg, spark, sf_dir):
    """Exactness anchor for the encoder: the PQ codebook is built from
    vectors 0..PQ_K-1, so each of those vectors is at distance 0 from its
    own codeword in EVERY subspace — its code must be [k, k, k, k]."""
    import pyspark.sql.functions as F

    from xml_to_parquet_spark.io_paths import scratch_dir
    from xml_to_parquet_spark.operators.similarity import PQ_K, PQ_M

    reg["sim_ivfpq_search"].fn(spark, sf_dir).collect()  # builds the index
    codes = spark.read.parquet(
        scratch_dir(sf_dir, "ivfpq_index") + "/codes"
    ).filter(F.col("vec_id") < PQ_K)
    rows = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert len(rows) == PQ_K
    for k, code in rows.items():
        assert code == [k] * PQ_M, (k, code)


def test_ivfpq_adc_approximates_exact_l2_within_probed_cells(reg, spark, sf_dir):
    """Recall sanity: per query, the ADC top-5 must overlap the EXACT
    squared-L2 top-5 over the same probed cells (numpy recompute).
    PQ at M=4 is lossy by design, so demand overlap, not equality."""
    import numpy as np

    out = reg["sim_ivfpq_search"].fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    by_q: dict[int, dict] = {}
    for r in out:
        by_q.setdefault(r["query_id"], {"cells": set(), "n": []})
        by_q[r["query_id"]]["cells"].add(r["cell"])
        by_q[r["query_id"]]["n"].append(r["neighbor_id"])
    total_overlap = 0
    for qid, d in by_q.items():
        qv = emb[qid][0]
        cand = [
            (vid, float(((qv - v) ** 2).sum()))
            for vid, (v, lbl) in emb.items()
            if lbl in d["cells"] and vid != qid
        ]
        exact5 = {vid for vid, _ in sorted(cand, key=lambda t: (t[1], t[0]))[:5]}
        total_overlap += len(exact5 & set(d["n"]))
    # The synthetic embeddings are near-orthogonal — the hardest case for
    # PQ (M=4 means one 4-bit codeword summarizes 16 dims of noise), so
    # the bar is deliberately modest: average overlap >= 1 of 5. Random
    # top-5 selection from the ~2-cell candidate pool would average
    # 5*5/|pool| ≈ 0.2 at sf0.001; measured ADC overlap is ~1.5.
    assert total_overlap >= len(by_q), total_overlap


# ---------------------------------------------------------------------------
# stream_stream_outer (streaming/joins.py)
# ---------------------------------------------------------------------------


def test_stream_outer_emits_nulls_only_past_watermark(reg, spark, sf_dir):
    """Eviction-produces-output contract: (a) NULL-purchase rows exist,
    (b) every one belongs to a click whose 1h join window closed before
    the final global watermark, (c) the matched part equals the inner
    stream-stream join exactly."""
    import datetime

    out = reg["stream_stream_outer"].fn(spark, sf_dir).collect()
    nulls = [r for r in out if r["purchase_id"] is None]
    matched = {(r["click_id"], r["purchase_id"]) for r in out} - {
        (r["click_id"], None) for r in nulls
    }
    assert nulls, "no outer emission — watermark flush missing"
    inner = reg["stream_stream_join"].fn(spark, sf_dir).collect()
    assert matched == {(r["click_id"], r["purchase_id"]) for r in inner}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    max_click = max(r["ts"] for r in ev if r["event_type"] == "click")
    max_purch = max(r["ts"] for r in ev if r["event_type"] == "purchase")
    wm = min(max_click, max_purch).replace(microsecond=0) - datetime.timedelta(
        hours=2
    )
    ts_by_id = {r["event_id"]: r["ts"] for r in ev}
    for r in nulls:
        close = ts_by_id[r["click_id"]] + datetime.timedelta(hours=1)
        # ms-truncated watermark; replace(microsecond=0) is coarser, so
        # allow the 1s slack it introduces
        assert close < wm + datetime.timedelta(seconds=1)


# ---------------------------------------------------------------------------
# udtf_table_fn (operators/udfs.py)
# ---------------------------------------------------------------------------


def test_udtf_matches_codegen_chunker_exactly(reg, spark, sf_dir):
    """The UDTF must reproduce text_chunk_overlap row-for-row — same
    chunk indices, token counts, and md5 identities."""
    udtf_rows = {
        tuple(r) for r in reg["udtf_table_fn"].fn(spark, sf_dir).collect()
    }
    sql_rows = {
        tuple(r) for r in reg["text_chunk_overlap"].fn(spark, sf_dir).collect()
    }
    assert udtf_rows == sql_rows and udtf_rows


def test_udtf_variable_fanout(reg, spark, sf_dir):
    """Set-returning contract: documents longer than one stride yield
    multiple rows; chunk_idx is dense from 0 per doc."""
    out = reg["udtf_table_fn"].fn(spark, sf_dir).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_idx"])
    assert any(len(v) > 1 for v in by_doc.values())
    for doc, idxs in by_doc.items():
        assert sorted(idxs) == list(range(len(idxs))), doc


# ---------------------------------------------------------------------------
# text_bm25_topk (operators/text.py)
# ---------------------------------------------------------------------------


def test_bm25_matches_pure_python_recompute(reg, spark, sf_dir):
    """Exact recompute of the whole ranking in plain Python (Lucene idf,
    k1=1.2, b=0.75) — formula-level proof independent of both engines."""
    import math
    import re

    from xml_to_parquet_spark.operators.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOP,
    )

    docs = {
        r["doc_id"]: re.split(r"\s+", r["text"].lower())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    docs = {d: t for d, t in docs.items() if t}
    n_docs = len(docs)
    total_len = sum(len(t) for t in docs.values())
    df = {
        q: sum(1 for t in docs.values() if q in t) for q in BM25_QUERY
    }
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        dl = len(toks)
        for q in sorted(BM25_QUERY):
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n_docs - df[q] + 0.5) / (df[q] + 0.5))
            norm = 1 - BM25_B + BM25_B * (dl * float(n_docs) / total_len)
            s += idf * (tf * (BM25_K1 + 1)) / (tf + BM25_K1 * norm)
        if s > 0:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOP]
    got = [
        (r["doc_id"], r["bm25"])
        for r in reg["text_bm25_topk"].fn(spark, sf_dir).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# graph_label_propagation (operators/graphs.py)
# ---------------------------------------------------------------------------


def test_lpa_matches_exact_python_recompute(reg, spark, sf_dir):
    """Recompute all synchronous LPA rounds exactly in Python over the
    same co-occurrence graph — proves the argmax/tie-break semantics
    (most-frequent neighbor label, ties to smallest) round for round."""
    from collections import Counter, defaultdict

    from xml_to_parquet_spark.operators.graphs import LPA_ROUNDS

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    nbrs = defaultdict(set)
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    nbrs[u].add(v)
    lbl = {v: v for v in nbrs}
    for _ in range(LPA_ROUNDS):
        nxt = {}
        for v in nbrs:
            c = Counter(lbl[n] for n in nbrs[v])
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[v] = best
        lbl = nxt
    got = {
        r["node"]: r["community"]
        for r in reg["graph_label_propagation"].fn(spark, sf_dir).collect()
    }
    assert got == lbl


# ---------------------------------------------------------------------------
# join_interval_overlap (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_interval_overlap_exact_and_duplicate_free(reg, spark, sf_dir):
    """Brute-force recompute: the binned plan must produce exactly the
    naive overlap pairs, each exactly once, with exact µs overlap."""
    out = reg["join_interval_overlap"].fn(spark, sf_dir).collect()
    pairs = [(r["a_id"], r["b_id"]) for r in out]
    assert len(pairs) == len(set(pairs)), "canonical-bin dedup failed"

    from xml_to_parquet_spark.operators.relational_ext import IVL_LEN_MIN

    L = IVL_LEN_MIN * 60 * 1_000_000
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    to_us = lambda t: int(t.timestamp() * 1_000_000)  # noqa: E731
    errs = [
        (r["event_id"], r["user_id"], to_us(r["ts"]))
        for r in ev
        if r["event_type"] == "error"
    ]
    purch = [
        (r["event_id"], r["user_id"], to_us(r["ts"]))
        for r in ev
        if r["event_type"] == "purchase"
    ]
    want = {}
    for aid, au, ats in errs:
        for bid, bu, bts in purch:
            if au == bu and ats <= bts + L and bts <= ats + L:
                want[(aid, bid)] = min(ats + L, bts + L) - max(ats, bts)
    got = {(r["a_id"], r["b_id"]): r["overlap_us"] for r in out}
    assert got == want and want


# ---------------------------------------------------------------------------
# dq_drift_histogram (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_drift_histogram_matches_numpy_and_bounds(reg, spark, sf_dir):
    """Recompute the L1 drift with numpy histograms; check the 0..2 bound
    and that every type appears."""
    import datetime

    import numpy as np

    from xml_to_parquet_spark.operators.relational_ext import (
        DRIFT_BIN_W,
        DRIFT_BINS,
        DRIFT_CUTOFF,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cutoff = datetime.datetime.fromisoformat(DRIFT_CUTOFF)
    types = sorted({r["event_type"] for r in ev})
    got = {
        r["event_type"]: r
        for r in reg["dq_drift_histogram"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(types)
    for t in types:
        ref = [r["value"] for r in ev if r["event_type"] == t and r["ts"] < cutoff]
        cur = [r["value"] for r in ev if r["event_type"] == t and r["ts"] >= cutoff]
        bins = [i * DRIFT_BIN_W for i in range(DRIFT_BINS)] + [float("inf")]
        h_ref, _ = np.histogram(ref, bins=bins)
        h_cur, _ = np.histogram(cur, bins=bins)
        l1 = np.abs(
            h_ref / max(len(ref), 1) - h_cur / max(len(cur), 1)
        ).sum()
        r = got[t]
        assert r["n_ref"] == len(ref) and r["n_cur"] == len(cur)
        assert 0.0 <= r["l1_drift"] <= 2.0
        # the operator rounds to 6dp; allow half-ulp of that rounding
        assert abs(r["l1_drift"] - l1) < 5.1e-7, (t, r["l1_drift"], l1)
        assert r["worst_num"] <= r["l1_num"]


def test_html_extract_short_doc_empty_main_text(reg, spark, sf_dir, tmp_path):
    """A document too short to yield any content block must surface as
    kept_blocks=0 with main_text '' (NOT NULL) — the sf0.1 sweep caught
    DuckDB's array_to_string([]) returning NULL where Spark's
    array_join([]) returns ''; the oracle now coalesces."""
    import pandas as pd

    pd.DataFrame(
        {"doc_id": [7], "text": ["tiny words only"], "lang": ["en"],
         "source": ["s"], "n_chars": [15]}
    ).to_parquet(tmp_path / "documents.parquet")
    out = reg["text_html_extract"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["kept_blocks"] == 0 and r["main_len"] == 0 and r["main_text"] == ""


def _py_extract_reference(html: str) -> list[str]:
    """Pure-Python reference of the extraction rules (same regexes, same
    order): script strip -> block split -> tag strip -> space collapse ->
    trim -> length + link-density gate."""
    import re

    h = re.sub(r"<script[^>]*>[^<]*</script>", " ", html)
    out = []
    for b in re.split(r"</p>|</div>", h):
        txt = re.sub(r" +", " ", re.sub(r"<[^>]*>", " ", b)).strip(" ")
        ll = sum(len(s) for s in re.findall(r"<a[^>]*>([^<]*)</a>", b))
        if len(txt) >= 25 and 3 * ll <= len(txt):
            out.append(txt)
    return out


def test_html_extract_adversarial_corpus_matches_python_reference(spark):
    """One Spark pass over handwritten + seeded-random adversarial pages
    (stray < > & quotes, unclosed/nested tags, unicode, whitespace runs)
    must agree with the pure-Python reference exactly — pins Java-vs-
    Python regex semantics for every pattern the operator uses."""
    import random

    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.text import _html_extract_exprs

    pages = [
        "",
        "   ",
        "<p></p><div></div>",
        "<p>text with a stray < less-than sign inside the content here</p>",
        "<p>text with a stray > greater-than sign inside the content</p>",
        "<p>ampersand &amp; entity and 'quotes' \"doubles\" long enough</p>",
        "<p>unclosed paragraph runs to the very end without its closing tag",
        "<div><p>nested block content that is long enough to be kept</p></div>",
        "<p>unicode éü中文 content long enough to pass the gate</p>",
        "<p>multiple     internal     spaces     collapse     to     one</p>",
        "<a>lonely anchor text</a> outside any block element with length",
        "<p><a href='#'>all of this text is one single anchor element!</a></p>",
        "<script>no closing script tag swallows nothing <p>after it</p>",
        "<p>tag<b>soup</b>with<i>inline</i>markup kept as one block ok</p>",
        "plain text with no markup at all but comfortably past the gate",
    ]
    rng = random.Random(90)
    alphabet = "ab <>/&'\"<p></p><a>x"
    pages += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(60)
    ]
    ex = _html_extract_exprs("spark")
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i int, html string"
    ).select("i", F.expr(ex["txts"]).alias("txts"))
    got = {r["i"]: list(r["txts"]) for r in df.collect()}
    for i, p in enumerate(pages):
        assert got[i] == _py_extract_reference(p), (i, p)


def test_canonical_bin_lemma_exactly_once():
    """Pure-math lemma behind join_interval_overlap's duplicate-free
    emission: for ANY two overlapping intervals of length <= W, the bin
    floor(max(starts)/W) is touched by BOTH intervals, and it is the
    ONLY joined bin passing the canonical-bin filter — so each pair is
    emitted exactly once, and non-overlapping pairs never pass the
    residual. Hypothesis searches for a counterexample."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    W = 10_000

    @settings(max_examples=500, deadline=None)
    @given(
        st.integers(0, 200_000),
        st.integers(0, 200_000),
        st.integers(0, W),
        st.integers(0, W),
    )
    def check(a0, b0, la, lb):
        a1, b1 = a0 + la, b0 + lb
        bins_a = set(range(a0 // W, a1 // W + 1))
        bins_b = set(range(b0 // W, b1 // W + 1))
        shared = bins_a & bins_b
        canonical = max(a0, b0) // W
        emitted = [
            bn for bn in shared if bn == canonical and a0 <= b1 and b0 <= a1
        ]
        if a0 <= b1 and b0 <= a1:  # overlapping: exactly one emission
            assert emitted == [canonical]
        else:  # disjoint: the residual must kill every shared-bin hit
            assert emitted == []

    check()
