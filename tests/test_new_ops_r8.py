"""Semantic tests for the round-8 [EXT] additions: baseline-DCT JPEG
codec + mm_decode_jpeg (the rows-only driver entry's exactness proof),
cross-modal caption dedup, the vector capstone pipeline, and the AQE
skew join's oracle semantics (its plan contract lives in test_plans.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from xml_to_parquet_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# JPEG codec (functions/jpegcodec.py)
# ---------------------------------------------------------------------------


def _doc_image(d: int) -> np.ndarray:
    w, h = 8 + d % 16, 8 + (d * 7) % 16
    xs, ys = np.arange(w), np.arange(h)
    return ((d + 3 * xs[None, :] + 5 * ys[:, None]) % 256).astype(np.uint8)


def test_jpeg_constant_blocks_decode_exactly():
    """A constant image is DC-only; quantized DC round-trips without loss
    for every gray level at quality 90 (the closed-form case)."""
    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    for val in (0, 1, 17, 127, 128, 200, 254, 255):
        img = np.full((16, 24), val, np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == img.shape
        assert np.array_equal(out, img), f"constant {val} not exact"


def test_jpeg_roundtrip_error_bounded_and_quality_monotone():
    """Reconstruction error shrinks as quality rises, and at quality 100
    (all-ones quant table) it is at most 1 LSB even on noise."""
    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (19, 21), np.uint8)
    errs = {}
    for q in (50, 75, 90, 100):
        out = decode_jpeg(encode_jpeg(img, q))
        assert out.shape == img.shape
        errs[q] = int(np.abs(out.astype(int) - img.astype(int)).max())
    assert errs[100] <= 1, errs
    assert errs[100] <= errs[75] <= errs[50], errs
    assert errs[90] <= errs[50], errs


def test_jpeg_non_multiple_of_8_dims_crop_back():
    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    for h, w in ((1, 1), (7, 9), (8, 8), (15, 17), (23, 8)):
        img = _doc_image(5)[:h, :w].copy() if h <= 23 and w <= 13 else None
        if img is None or img.shape != (h, w):
            xs, ys = np.arange(w), np.arange(h)
            img = ((3 * xs[None, :] + 5 * ys[:, None]) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (h, w)


def test_jpeg_zigzag_is_a_permutation_and_inverse_holds():
    from xml_to_parquet_spark.functions.jpegcodec import UNZIGZAG, ZIGZAG

    assert sorted(ZIGZAG.tolist()) == list(range(64))
    nat = np.arange(64)
    assert np.array_equal(nat[ZIGZAG][UNZIGZAG], nat)
    # spec anchor: the first zigzag steps (T.81 Figure A.6)
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_jpeg_rejects_unsupported_profiles():
    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    good = encode_jpeg(_doc_image(3), 90)
    # progressive SOF2 in place of SOF0
    assert b"\xff\xc0" in good
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2"))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + good)
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated before SOS


def test_jpeg_corrupt_entropy_never_crashes():
    """Failure contract of the table-driven scan decoder: flipping any
    byte INSIDE the entropy segment (markers intact — that path has its
    own test) must either still decode to the original shape/dtype
    (JPEG has no checksum, silent wrong pixels are legal) or raise
    ValueError — never IndexError / struct.error / a hang. Pins the
    bounds discipline of the inlined bit-buffer loop: LUT indices are
    masked to 16 bits, reads past the segment end see zero padding, and
    the AC run guard still fires."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    for d, color in ((7, False), (13, True)):
        img = _doc_image(d)
        if color:
            img = np.stack([img, img[::-1], 255 - img], axis=2)
        good = encode_jpeg(img, 90)
        sos = good.find(b"\xff\xda")
        lo, hi = sos + 14, len(good) - 2  # entropy segment bounds
        want_shape = img.shape

        @settings(max_examples=200, deadline=None)
        @given(
            off=st.integers(min_value=0, max_value=hi - lo - 1),
            flip=st.integers(min_value=1, max_value=255),
        )
        def check(off, flip):
            pos = lo + off
            bad = good[:pos] + bytes([good[pos] ^ flip]) + good[pos + 1 :]
            try:
                out = decode_jpeg(bad)
            except ValueError:
                return
            assert out.shape == want_shape
            assert out.dtype == np.uint8

        check()


def test_jpeg_bytes_are_deterministic_and_stuffed():
    """Same input → same bytes (the dedup-ability contract every codec in
    the column keeps), and no bare 0xFF survives inside the entropy
    segment (byte stuffing)."""
    from xml_to_parquet_spark.functions.jpegcodec import encode_jpeg

    img = _doc_image(11)
    b1, b2 = encode_jpeg(img, 90), encode_jpeg(img, 90)
    assert b1 == b2
    sos = b1.find(b"\xff\xda")
    entropy = b1[sos + 14 : -2]  # after SOS header, before EOI
    i = 0
    while i < len(entropy):
        if entropy[i] == 0xFF:
            assert entropy[i + 1] == 0x00, f"unstuffed FF at {i}"
            i += 2
        else:
            i += 1


# ---------------------------------------------------------------------------
# mm_decode_jpeg — Spark path bit-parity with the in-process codec
# ---------------------------------------------------------------------------


def test_mm_decode_jpeg_matches_inprocess_decode(spark, sf_dir, reg):
    """The driver entry is rows-only by contract (no SQL for the IDCT);
    THIS is its exactness proof: the Spark mapInPandas chain must produce
    the identical (width, height, pix_sum, max_err) the codec produces
    in-process, for every document, and the decode error must stay within
    the quality-90 bound."""
    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    got = (
        reg["mm_decode_jpeg"].fn(spark, sf_dir).toPandas().set_index("doc_id").sort_index()
    )
    assert len(got) > 0
    for d, row in got.iterrows():
        img = _doc_image(int(d))
        arr = decode_jpeg(encode_jpeg(img, 90)).astype("int64")
        assert (row["height"], row["width"]) == arr.shape
        assert row["n_px"] == arr.size
        assert row["pix_sum"] == int(arr.sum())
        assert row["max_err"] == int(np.abs(arr - img.astype("int64")).max())
    # lossy but bounded: the wrap-seam ringing at quality 90 stays small
    assert got["max_err"].max() <= 32


def test_jpeg_color_roundtrip_and_gray_equivalence():
    """Color profile: constant RGB decodes within 1 LSB (YCbCr rounding),
    a gray RGB image (equal channels) decodes near the grayscale path's
    output, and quality 100 bounds noise error to the color-transform
    rounding (a few LSB)."""
    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    for rgbv in ((0, 0, 0), (255, 255, 255), (200, 30, 90), (1, 2, 3)):
        img = np.zeros((16, 16, 3), np.uint8)
        img[:] = rgbv
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (16, 16, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1, rgbv
    noise = rng.integers(0, 256, (15, 13, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(noise, 100))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 4
    # gray-as-RGB ≈ grayscale path (chroma planes are constant 128)
    g = _doc_image(9)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    out_rgb = decode_jpeg(encode_jpeg(rgb, 90))
    out_gray = decode_jpeg(encode_jpeg(g, 90))
    assert np.abs(out_rgb.astype(int) - out_gray[:, :, None].astype(int)).max() <= 2


def test_mm_decode_jpeg_color_matches_inprocess_decode(spark, sf_dir, reg):
    from xml_to_parquet_spark.functions.jpegcodec import decode_jpeg, encode_jpeg
    from xml_to_parquet_spark.operators.multimodal import _doc_rgb

    got = (
        reg["mm_decode_jpeg_color"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) > 0
    for d, row in got.head(50).iterrows():
        orig = _doc_rgb(int(d)).astype("int64")
        arr = decode_jpeg(encode_jpeg(_doc_rgb(int(d)), 90)).astype("int64")
        assert (row["height"], row["width"], 3) == arr.shape
        assert row["r_sum"] == int(arr[:, :, 0].sum())
        assert row["g_sum"] == int(arr[:, :, 1].sum())
        assert row["b_sum"] == int(arr[:, :, 2].sum())
        assert row["max_err"] == int(np.abs(arr - orig).max())
    # chroma quant is aggressive (Annex-K 99s) so the wrap-seam ringing is
    # larger than the gray path's; still bounded
    assert got["max_err"].max() <= 64


# ---------------------------------------------------------------------------
# mm_caption_dedup / sim_pipeline — composition consistency
# ---------------------------------------------------------------------------


def test_caption_dedup_covers_exactly_the_image_pairs(spark, sf_dir, reg):
    """Every image near-dup pair gets exactly one caption verdict — the
    classification never drops or invents pairs."""
    pairs = reg["mm_image_dedup"].fn(spark, sf_dir).toPandas()
    verdicts = reg["mm_caption_dedup"].fn(spark, sf_dir).toPandas()
    assert len(verdicts) == len(pairs)
    key = lambda df: set(zip(df["doc_a"], df["doc_b"]))
    assert key(verdicts) == key(pairs)
    assert set(verdicts["verdict"]) <= {
        "same_caption",
        "re_rendered",
        "re_captioned",
    }
    # verdict/jaccard consistency: re_rendered requires jaccard >= 0.5,
    # re_captioned requires jaccard < 0.5
    rr = verdicts[verdicts["verdict"] == "re_rendered"]
    rc = verdicts[verdicts["verdict"] == "re_captioned"]
    assert (rr["jaccard"] >= 0.5).all()
    assert (rc["jaccard"] < 0.5).all()


def test_sim_pipeline_equals_staged_composition(spark, sf_dir, reg):
    """The one-plan capstone must equal what the staged operators say:
    its vectors are exactly the non-pruned ones (dedup_semdedup's output
    is the pruned set), and each survivor has at most KNN_K neighbors,
    rank-ordered within its own cluster."""
    from xml_to_parquet_spark.operators.similarity import KNN_K

    pruned = set(reg["dedup_semdedup"].fn(spark, sf_dir).toPandas()["vec_id"])
    graph = reg["sim_pipeline"].fn(spark, sf_dir).toPandas()
    assert len(graph) > 0
    assert not (set(graph["vec_id"]) & pruned)
    assert not (set(graph["neighbor_id"]) & pruned)
    per = graph.groupby("vec_id")["rank"]
    assert (per.max() <= KNN_K).all()
    # ranks are 1..k contiguous per vector
    assert (per.min() == 1).all()
    for _, g in graph.groupby("vec_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        # ordered by cosine desc with neighbor_id tiebreak
        srt = g.sort_values(["rank"])
        coss = srt["cos"].tolist()
        assert coss == sorted(coss, reverse=True) or len(coss) == 1 or all(
            a > b or (a == b) for a, b in zip(coss, coss[1:])
        )


# ---------------------------------------------------------------------------
# dedup_prefix_filter — the prefix-filter lemma loses no pairs
# ---------------------------------------------------------------------------


def test_prefix_filter_equals_brute_force(spark, sf_dir, reg):
    """The operator's pairs must equal the BRUTE-FORCE all-pairs Jaccard
    at the same threshold — proving the df-ordered prefix bound drops no
    qualifying pair (the AllPairs lemma) and the verify stage computes
    exact full-space Jaccard."""
    import pandas as pd

    from xml_to_parquet_spark.operators.dedup import PF_DEN, PF_NUM

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sets = {}
    for _, r in docs.iterrows():
        toks = r["text"].lower().split()
        if len(toks) >= 3:
            sets[r["doc_id"]] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if PF_DEN * inter >= PF_NUM * union:
                expect[(a, b)] = round(inter / union, 4)
    got = reg["dedup_prefix_filter"].fn(spark, sf_dir).toPandas()
    got_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for _, r in got.iterrows()
    }
    assert set(got_pairs) == set(expect)
    for k, v in expect.items():
        assert abs(got_pairs[k] - v) < 1e-9, (k, got_pairs[k], v)


# ---------------------------------------------------------------------------
# pareto_frontier — bucketed local-frontier merge equals naive dominance
# ---------------------------------------------------------------------------


def test_pareto_frontier_equals_naive_dominance(spark, sf_dir, reg):
    """The distributed (argmax → bucket-local frontier → B-row merge)
    shape must produce exactly the naive quadratic skyline."""
    import pandas as pd

    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    pts = (
        part.groupby(["p_retailprice", "p_size"])
        .size()
        .reset_index(name="n_parts")
    )
    rows = list(pts.itertuples(index=False))
    expect = set()
    for a in rows:
        dominated = any(
            b.p_retailprice <= a.p_retailprice
            and b.p_size >= a.p_size
            and (b.p_retailprice < a.p_retailprice or b.p_size > a.p_size)
            for b in rows
        )
        if not dominated:
            expect.add((a.p_retailprice, a.p_size, a.n_parts))
    got = reg["pareto_frontier"].fn(spark, sf_dir).toPandas()
    got_set = {
        (r["retail_price"], r["size"], r["n_parts"]) for _, r in got.iterrows()
    }
    assert got_set == expect
    assert len(got) == len(got_set)


# ---------------------------------------------------------------------------
# graph_bfs_distance — pure-python BFS cross-check
# ---------------------------------------------------------------------------


def test_bfs_matches_pure_python(spark, sf_dir, reg):
    """Exact hop distances vs an in-process BFS over the same
    co-occurrence graph, truncated at the same round count."""
    from collections import defaultdict

    import pandas as pd

    from xml_to_parquet_spark.operators.graphs import BFS_ROUNDS, BFS_SRC_MOD

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    adj = defaultdict(set)
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    dist = {u: 0 for u in adj if u % BFS_SRC_MOD == 0}
    frontier = dict(dist)
    for r in range(1, BFS_ROUNDS + 1):
        nxt = {}
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    nxt[v] = r
        dist.update(nxt)
        frontier = nxt
    got = reg["graph_bfs_distance"].fn(spark, sf_dir).toPandas()
    got_map = dict(zip(got["node"], got["dist"]))
    assert got_map == dist


# ---------------------------------------------------------------------------
# er_blocking_link — pigeonhole recall guarantee
# ---------------------------------------------------------------------------


def test_er_blocking_recall_and_verify(spark, sf_dir, reg):
    """Every corrupted record links back to its own source (pigeonhole:
    one substitution leaves >= ER_SEGS-1 segments intact), all true links
    have edit distance exactly 1, and every reported pair passes the
    verify threshold."""
    import pandas as pd

    from xml_to_parquet_spark.operators.dedup import ER_SEGS

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    dirty_ids = set(cust.loc[cust["c_custkey"] % 3 == 0, "c_custkey"])
    got = reg["er_blocking_link"].fn(spark, sf_dir).toPandas()
    self_links = got[got["record_id"] == got["matched_custkey"]]
    assert set(self_links["record_id"]) == dirty_ids
    assert (self_links["dist"] == 1).all()
    assert (self_links["n_blocks"] >= ER_SEGS - 1).all()
    assert (got["dist"] <= 1).all()
    assert got.duplicated(["record_id", "matched_custkey"]).sum() == 0


# ---------------------------------------------------------------------------
# dedup_bloom_prefilter — no-false-negative contract
# ---------------------------------------------------------------------------


def test_bloom_prefilter_no_false_negatives(spark, sf_dir, reg):
    """Every true duplicate must be bloom-positive (the filter's only
    hard guarantee); replayed neighbors are flagged as true dups; and
    any bloom-positive non-dup is a legitimate false positive, not an
    error."""
    got = reg["dedup_bloom_prefilter"].fn(spark, sf_dir).toPandas()
    from xml_to_parquet_spark.operators.dedup import BLOOM_K

    dup = got[got["true_dup"]]
    assert (dup["bloom_positive"]).all()
    assert (dup["n_hits"] == BLOOM_K).all()
    # replay construction: docs at doc_id % 20 == 0 with an existing
    # neighbor re-ingest corpus content => true dup
    replayed = got[(got["doc_id"] % 20 == 0) & (got["doc_id"] > 0)]
    assert replayed["true_dup"].all()
    # fresh batch docs (doc_id % 20 == 10) are never true dups
    fresh = got[got["doc_id"] % 20 == 10]
    assert (~fresh["true_dup"]).all()
    assert (got["n_hits"] <= BLOOM_K).all()


# ---------------------------------------------------------------------------
# event_pattern_match — pure-python regex cross-check
# ---------------------------------------------------------------------------


def test_event_pattern_matches_pure_python(spark, sf_dir, reg):
    """Per-user episode counts equal an in-process re.findall over the
    identically-ordered symbol string."""
    import re

    import pandas as pd

    from xml_to_parquet_spark.operators.sessions import CEP_PATTERN

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["ts", "event_id"])
    expect = {}
    for uid, grp in ev.groupby("user_id"):
        seq = "".join(t[0] for t in grp["event_type"])
        expect[uid] = (len(seq), len(re.findall(CEP_PATTERN, seq)))
    got = reg["event_pattern_match"].fn(spark, sf_dir).toPandas()
    assert len(got) == len(expect)
    for _, r in got.iterrows():
        n_events, n_matches = expect[r["user_id"]]
        assert r["n_events"] == n_events
        assert r["n_matches"] == n_matches
        assert r["converted"] == (n_matches > 0)


# ---------------------------------------------------------------------------
# sink_compact_small_files — the file-count halves the oracle can't see
# ---------------------------------------------------------------------------


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, reg):
    import glob
    import os

    from xml_to_parquet_spark.io_paths import scratch_dir
    from xml_to_parquet_spark.operators.sources_io import (
        COMPACT_BUCKETS,
        COMPACT_FRAG_FILES,
    )

    got = reg["sink_compact_small_files"].fn(spark, sf_dir).toPandas()
    frag = glob.glob(os.path.join(scratch_dir(sf_dir, "frag_events"), "part-*"))
    comp = glob.glob(
        os.path.join(scratch_dir(sf_dir, "compacted_events"), "part-*")
    )
    assert len(frag) == COMPACT_FRAG_FILES
    assert 0 < len(comp) <= COMPACT_BUCKETS
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert got["n_rows"].sum() == len(ev)
    assert set(got["bucket"]) == set(ev["user_id"] % COMPACT_BUCKETS)


# ---------------------------------------------------------------------------
# sim_random_projection — numpy exactness + ranking invariants
# ---------------------------------------------------------------------------


def test_random_projection_matches_numpy(spark, sf_dir, reg):
    """The md5-seeded sign matrix and the projected cosines must equal a
    numpy recomputation (sequential-sum parity), and each query's top-k
    is rank-contiguous."""
    import pandas as pd

    from xml_to_parquet_spark.operators.similarity import (
        _RP,
        N_QUERIES,
        TOP_K,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    R = np.array(_RP)  # (16, 64), entries ±1
    assert set(np.unique(R)) == {-1.0, 1.0}
    vecs = {
        r["vec_id"]: R @ np.asarray(r["embedding"], dtype=np.float64)
        for _, r in emb.iterrows()
    }
    got = reg["sim_random_projection"].fn(spark, sf_dir).toPandas()
    assert set(got["query_id"]) == set(v for v in vecs if v < N_QUERIES)
    for qid, grp in got.groupby("query_id"):
        assert sorted(grp["rn"]) == list(range(1, TOP_K + 1))
        for _, r in grp.iterrows():
            a, b = vecs[qid], vecs[r["neighbor_id"]]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert abs(cos - r["pcos"]) < 1e-4


# ---------------------------------------------------------------------------
# mm_audio_wht — numpy Walsh–Hadamard cross-check
# ---------------------------------------------------------------------------


def test_wht_matches_numpy(spark, sf_dir, reg):
    """Every (doc, window, band) coefficient equals the numpy correlation
    with the Walsh function over the closed-form signal, exactly."""
    from xml_to_parquet_spark.operators.multimodal import (
        WHT_BANDS,
        WHT_HOP,
        WHT_WIN,
    )

    got = reg["mm_audio_wht"].fn(spark, sf_dir).toPandas()
    assert (got["energy"] == got["coef"] * got["coef"]).all()
    i = np.arange(WHT_WIN)
    walsh = {
        k: np.array([1 - 2 * (bin(k & int(x)).count("1") % 2) for x in i])
        for k in WHT_BANDS
    }
    docs = sorted(set(got["doc_id"]))[:20]
    sub = got[got["doc_id"].isin(docs)]
    for (d, w, k), grp in sub.groupby(["doc_id", "win", "band"]):
        n = 256 + d % 512
        j = w * WHT_HOP + i
        s = ((d * 31 + j * 17) % 65536) - 32768
        assert w * WHT_HOP + WHT_WIN <= n
        expect = int((s * walsh[k]).sum())
        assert int(grp["coef"].iloc[0]) == expect


def test_pareto_frontier_constant_price_degenerate(spark, sf_dir, tmp_path):
    """All-equal prices collapse the bucket width to zero; the operator's
    explicit F.when(hi == lo) branch maps every row to bucket 0 (the ANSI
    divide-by-zero fix — before it, the NaN bucket was pinned by
    least()), and the frontier must still be exactly the single max-size
    point."""
    import pandas as pd

    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    part["p_retailprice"] = 42.0
    out = tmp_path / "const_sf"
    out.mkdir()
    part.to_parquet(out / "part.parquet")
    got = (
        __import__("xml_to_parquet_spark.registry", fromlist=["load_all"])
        .load_all()["pareto_frontier"]
        .fn(spark, str(out))
        .toPandas()
    )
    max_size = part["p_size"].max()
    n_at = ((part["p_size"] == max_size)).sum()
    assert len(got) == 1
    assert got.iloc[0]["retail_price"] == 42.0
    assert got.iloc[0]["size"] == max_size
    assert got.iloc[0]["n_parts"] == n_at


def test_prefix_filter_all_docs_too_short(spark, sf_dir, tmp_path, reg):
    """Documents with fewer than 3 tokens produce no shingles at all —
    the operator must return an empty frame, not fail on the empty
    window/dictionary."""
    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["text"] = "one two"
    out = tmp_path / "short_sf"
    out.mkdir()
    docs.to_parquet(out / "documents.parquet")
    got = reg["dedup_prefix_filter"].fn(spark, str(out)).toPandas()
    assert len(got) == 0


def test_bloom_prefilter_doc_zero_null_neighbor(spark, sf_dir, reg):
    """doc_id 0 replays its neighbor (doc_id - 1 = -1) which doesn't
    exist: the md5(NULL) key must flow through as a definite negative
    (0 hits, not bloom-positive, not a dup) rather than erroring —
    the NULL-propagation contract both engines share."""
    got = reg["dedup_bloom_prefilter"].fn(spark, sf_dir).toPandas()
    row = got[got["doc_id"] == 0]
    assert len(row) == 1
    assert int(row["n_hits"].iloc[0]) == 0
    assert not bool(row["bloom_positive"].iloc[0])
    assert not bool(row["true_dup"].iloc[0])
