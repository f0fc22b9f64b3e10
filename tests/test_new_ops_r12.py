"""Semantic tests for the operators BUILT in round 10 and staged for the
r12 window rotation (r11's 4-slot budget is already spoken for by the
late-r9 alternates): stream_stream_full_outer, mm_video_framesample,
lake_merge_upsert. Same staging contract as tests/test_new_ops_r10.py —
all three are invisible to queries() until promoted.
"""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from xml_to_parquet_spark.registry import STAGED, load_all, lookup


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_r12_staged_ops_hidden_from_driver_registry(reg):
    # the full original-r12 cohort is now promoted: six at the r11 shape-B
    # rotation, the last two leftovers at the r12 rotation
    for name in (
        "stream_stream_full_outer", "mm_video_framesample", "lake_merge_upsert",
        "text_cdc_chunking", "sim_mips_topk", "mm_audio_vad",
        "join_spatial_grid", "sim_diversity_mmr",
    ):
        assert name not in STAGED and name in reg


# ---------------------------------------------------------------------------
# stream_stream_full_outer (streaming/joins.py)
# ---------------------------------------------------------------------------


def test_full_outer_evicts_on_both_state_stores(reg, spark, sf_dir):
    """The behavior left-outer never exercises: BOTH unmatched sides
    flush at eviction, with asymmetric boundaries — clicks once
    wm > cts + 1h (a later purchase could match until then), purchases
    once wm > pts (no older click can arrive after that). Matched part
    must equal the inner join exactly."""
    out = lookup("stream_stream_full_outer").fn(spark, sf_dir).collect()
    null_purch = [r for r in out if r["purchase_id"] is None]
    null_click = [r for r in out if r["click_id"] is None]
    assert null_purch, "no click-side eviction output"
    assert null_click, "no purchase-side eviction output"

    matched = {
        (r["click_id"], r["purchase_id"])
        for r in out
        if r["click_id"] is not None and r["purchase_id"] is not None
    }
    inner = reg["stream_stream_join"].fn(spark, sf_dir).collect()
    assert matched == {(r["click_id"], r["purchase_id"]) for r in inner}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    max_click = max(r["ts"] for r in ev if r["event_type"] == "click")
    max_purch = max(r["ts"] for r in ev if r["event_type"] == "purchase")
    wm = min(max_click, max_purch).replace(microsecond=0) - datetime.timedelta(
        hours=2
    )
    ts_by_id = {r["event_id"]: r["ts"] for r in ev}
    for r in null_purch:  # click evicted: window closed before wm
        assert ts_by_id[r["click_id"]] + datetime.timedelta(hours=1) < wm
    for r in null_click:  # purchase evicted: its own ts passed wm
        assert ts_by_id[r["purchase_id"]] < wm


def test_full_outer_purchase_eviction_set_is_exact(reg, spark, sf_dir):
    """Every unmatched purchase with pts < wm is emitted — not just a
    subset (the boundary rule is pts < wm, empirically 1 row different
    from pts + 1h < wm at sf0.001, so an off-by-a-window bug shows)."""
    out = lookup("stream_stream_full_outer").fn(spark, sf_dir).collect()
    emitted = {r["purchase_id"] for r in out if r["click_id"] is None}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    max_click = max(r["ts"] for r in ev if r["event_type"] == "click")
    max_purch = max(r["ts"] for r in ev if r["event_type"] == "purchase")
    wm = min(max_click, max_purch).replace(microsecond=0) - datetime.timedelta(
        hours=2
    )
    clicks_by_user: dict[int, list] = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks_by_user.setdefault(r["user_id"], []).append(r["ts"])
    expect = set()
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        cts = clicks_by_user.get(r["user_id"], [])
        matched = any(
            ct <= r["ts"] <= ct + datetime.timedelta(hours=1) for ct in cts
        )
        if not matched and r["ts"] < wm:
            expect.add(r["event_id"])
    assert emitted == expect


def test_full_outer_one_sided_input_emits_nothing(spark, sf_dir, tmp_path):
    """Clicks-only corpus: neither side's eviction may fire (the global
    watermark never advances) — same ADVICE-r9 contract as the
    left-outer's oracle, now on both sides."""
    one_sided = tmp_path / "fo_one_sided"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        "event_type <> 'purchase'"
    )
    ev.write.mode("overwrite").parquet(str(one_sided / "events.parquet"))
    out = lookup("stream_stream_full_outer").fn(spark, str(one_sided)).collect()
    assert out == []


# ---------------------------------------------------------------------------
# mm_video_framesample (operators/multimodal.py, functions/gifcodec.py)
# ---------------------------------------------------------------------------


def test_anim_codec_roundtrip_and_first_frame_compat():
    from xml_to_parquet_spark.functions.gifcodec import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        encode_gif_anim,
    )

    frames = [
        ((3 * 9 + 5 * f + 7 * np.arange(12)[None, :]
          + 11 * np.arange(10)[:, None]) % 256).astype(np.uint8)
        for f in range(7)
    ]
    data = encode_gif_anim(frames)
    back = decode_gif_frames(data)
    assert len(back) == 7
    assert all((a == b).all() for a, b in zip(frames, back))
    # single-frame decoder returns the FIRST frame of an animation
    assert (decode_gif(data) == frames[0]).all()
    # single-frame encodes decode as 1-frame animations
    assert len(decode_gif_frames(encode_gif(frames[0]))) == 1


def test_anim_codec_failure_contract():
    """Same quarantine contract as every codec in the chassis: malformed
    or truncated input raises ValueError, never IndexError/struct.error."""
    from xml_to_parquet_spark.functions.gifcodec import (
        decode_gif_frames,
        encode_gif_anim,
    )

    img = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    data = encode_gif_anim([img, img])
    for bad in (b"NOTAGIF", data[:10], data[:20], data[: len(data) // 2],
                data[:-2]):
        with pytest.raises(ValueError):
            decode_gif_frames(bad)
    with pytest.raises(ValueError):
        encode_gif_anim([])
    with pytest.raises(ValueError):
        encode_gif_anim([img, img[:4]])  # mixed sizes


def test_framesample_stride_and_pixel_sums(spark, sf_dir):
    """Sampled frame set is exactly range(0, n_frames, 3) per doc, and
    each sampled frame's pixel sum matches the closed-form formula
    recomputed in Python (independent of the SQL oracle)."""
    rows = lookup("mm_video_framesample").fn(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for d, rs in list(by_doc.items())[:20]:
        n_frames = 4 + d % 9
        assert sorted(r["frame_idx"] for r in rs) == list(
            range(0, n_frames, 3)
        )
        w, h = 8 + (d * 3) % 16, 8 + (d * 5) % 16
        xs, ys = np.arange(w), np.arange(h)
        for r in rs:
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, n_frames)
            want = int(
                ((3 * d + 5 * r["frame_idx"] + 7 * xs[None, :]
                  + 11 * ys[:, None]) % 256).sum()
            )
            assert r["pix_sum"] == want


def test_framesample_has_exactly_the_fanout_exchange(spark, sf_dir):
    """Same chassis contract as the image codec chains: exactly one
    doc_id-only RoundRobin fan-out, zero data shuffles."""
    from xml_to_parquet_spark.plans.inspect import physical_plan, shuffle_count

    df = lookup("mm_video_framesample").fn(spark, sf_dir)
    assert shuffle_count(df) == 0
    assert physical_plan(df).count("Exchange RoundRobinPartitioning") == 1


# ---------------------------------------------------------------------------
# lake_merge_upsert (operators/sources_io.py)
# ---------------------------------------------------------------------------


def test_merge_upsert_semantics(spark, sf_dir):
    """Post-merge state: deletes gone, updates applied (+1000), inserts
    present at the offset key space, untouched rows byte-identical."""
    from xml_to_parquet_spark.io_paths import scratch_dir
    from xml_to_parquet_spark.operators.sources_io import MERGE_INS_OFFSET

    lookup("lake_merge_upsert").fn(spark, sf_dir).collect()  # build
    man_v2 = scratch_dir(sf_dir, "merge_manifest_v2")
    files = [r.file_path for r in spark.read.parquet(man_v2).collect()]
    merged = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in spark.read.parquet(*files).collect()
    }
    orig = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    for k, (status, price) in orig.items():
        if k % 7 == 3:
            assert k not in merged  # deleted
        elif k % 7 == 0:
            assert merged[k] == (status, price + 1000)  # updated
        else:
            assert merged[k] == (status, price)  # untouched
        if k % 11 == 5:
            ins = merged[k + MERGE_INS_OFFSET]
            assert ins == ("I", float(k))  # inserted
    # nothing else appeared
    expect_n = (
        sum(1 for k in orig if k % 7 != 3)
        + sum(1 for k in orig if k % 11 == 5)
    )
    assert len(merged) == expect_n


def test_merge_upsert_rewrites_only_affected_files(spark, sf_dir):
    """The copy-on-write contract: v2's manifest carries v1 files
    VERBATIM for every file no changed key lands in; only affected files
    are replaced by rewrite/insert files. With uniformly-spread change
    keys every range file is affected, so probe with a NARROW change set
    is not possible here — instead assert the structural invariant:
    v2 = (v1 minus affected) + new files, and new files live under the
    rewrite/insert scratch dirs."""
    from xml_to_parquet_spark.io_paths import scratch_dir

    lookup("lake_merge_upsert").fn(spark, sf_dir).collect()
    v1 = {
        r.file_path
        for r in spark.read.parquet(
            scratch_dir(sf_dir, "merge_manifest_v1")
        ).collect()
    }
    v2 = {
        r.file_path
        for r in spark.read.parquet(
            scratch_dir(sf_dir, "merge_manifest_v2")
        ).collect()
    }
    rewrite = scratch_dir(sf_dir, "merge_rewrite")
    ins_dir = scratch_dir(sf_dir, "merge_inserts")
    carried = v1 & v2
    replaced = v1 - v2
    fresh = v2 - v1
    assert fresh, "no rewritten/insert files in v2"
    for p in fresh:
        assert p.startswith("file:" + rewrite) or p.startswith(
            "file:" + ins_dir
        ) or p.startswith(rewrite) or p.startswith(ins_dir)
    # v1 data files never deleted (immutability): paths still on disk
    import os

    for p in replaced | carried:
        assert os.path.exists(p.removeprefix("file:").split("://")[-1])


# ---------------------------------------------------------------------------
# text_cdc_chunking (operators/text.py)
# ---------------------------------------------------------------------------


def _cdc_chunks_py(tokens):
    """Pure-Python mirror of the operator's chunking: returns the list of
    (n_tokens, chash) per chunk in order."""
    import hashlib

    from xml_to_parquet_spark.operators.text import CDC_M, CDC_R, ROLL_B, ROLL_P

    vs = [
        int(hashlib.md5(t.encode()).hexdigest()[:4], 16) for t in tokens
    ]
    chunks, cur = [], []
    for i in range(1, len(vs) + 1):
        cur.append((len(cur) + 1, vs[i - 1]))
        cut = (
            i >= 3
            and ((vs[i - 3] * ROLL_B * ROLL_B + vs[i - 2] * ROLL_B + vs[i - 1])
                 % ROLL_P) % CDC_M == CDC_R
        )
        if cut:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (len(c), sum(rn * v for rn, v in c) % ROLL_P) for c in chunks
    ]


def test_cdc_chunking_matches_python_mirror(spark, sf_dir):
    rows = lookup("text_cdc_chunking").fn(spark, sf_dir).collect()
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (
            r["n_tokens"], r["chash"],
        )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    import re as _re

    checked = 0
    for d, text in list(docs.items())[:25]:
        toks = _re.split(r"\s+", text.lower())
        want = _cdc_chunks_py(toks)
        got = [by_doc[d][i] for i in sorted(by_doc[d])]
        assert got == want, d
        assert sorted(by_doc[d]) == list(range(len(want)))  # contiguous idx
        assert sum(n for n, _ in got) == len(toks)  # partition covers doc
        checked += 1
    assert checked


def test_cdc_chunking_shift_resistance():
    """THE content-defined property: prepending one token re-syncs chunk
    boundaries within one hash window, so all but the first chunk hashes
    survive — a fixed-size chunker would shift every boundary."""
    tokens = [f"tok{i * 2654435761 % 9973}" for i in range(400)]
    base = _cdc_chunks_py(tokens)
    shifted = _cdc_chunks_py(["inserted"] + tokens)
    base_h = [h for _, h in base]
    shifted_h = {h for _, h in shifted}
    assert len(base) > 10  # the corpus actually chunks
    # every chunk except possibly the first overlaps the shifted version
    surviving = sum(1 for h in base_h[1:] if h in shifted_h)
    assert surviving == len(base_h) - 1


def test_cdc_chunking_single_exchange(spark, sf_dir):
    """One doc_id hash exchange carries the explode, both windows, and
    the final (doc_id, chunk_idx) aggregate (subset rule)."""
    from xml_to_parquet_spark.plans.inspect import shuffle_count

    df = lookup("text_cdc_chunking").fn(spark, sf_dir)
    assert shuffle_count(df) == 1


# ---------------------------------------------------------------------------
# sim_mips_topk (operators/similarity.py)
# ---------------------------------------------------------------------------


def test_mips_matches_bruteforce(spark, sf_dir):
    from xml_to_parquet_spark.operators.similarity import N_QUERIES, TOP_K

    rows = lookup("sim_mips_topk").fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    got = {(r["query_id"], r["rn"]): r["neighbor_id"] for r in rows}
    for qid in range(N_QUERIES):
        scored = sorted(
            (
                (-round(float(np.dot(emb[qid], v)), 6), vid)
                for vid, v in emb.items()
                if vid != qid
            ),
        )[:TOP_K]
        for rn, (_, vid) in enumerate(scored, start=1):
            assert got[(qid, rn)] == vid, (qid, rn)


def test_mips_prune_is_effective_on_skewed_norms(spark, tmp_path):
    """The isotropic testdata is norm-flat (worst case, prune ~none); on
    a popularity-skewed corpus — the production case — the Cauchy-Schwarz
    gate must drop most of the corpus while the result stays exact."""
    from xml_to_parquet_spark.operators.similarity import (
        MIPS_SAMPLE_MOD, N_QUERIES, TOP_K,
    )

    rng = np.random.RandomState(7)
    n, dim = 512, 16
    # 12.5% big-norm, aligned so the phase-1 sample (vec_id % 16 == 0)
    # lands inside the heavy tail — the realistic case (popular items are
    # never missed by a uniform sample); a sample that misses every
    # big-norm vector degrades the prune toward brute force, which is
    # the documented no-worse-than fallback, not what this test pins
    scale = np.where(np.arange(n) % 8 == 0, 8.0, 0.05)
    vecs = rng.randn(n, dim) * scale[:, None]
    rows = [(int(i), [float(x) for x in vecs[i]], 0) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf = tmp_path / "mips_sf"
    df.write.parquet(str(sf / "embeddings.parquet"))

    out = lookup("sim_mips_topk").fn(spark, str(sf)).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(str(sf / "embeddings.parquet")).collect()
    }
    got = {(r["query_id"], r["rn"]): r["neighbor_id"] for r in out}
    norms = {vid: float(np.linalg.norm(v)) for vid, v in emb.items()}
    pruned_total = candidates_total = 0
    for qid in range(N_QUERIES):
        scored = sorted(
            (
                (-round(float(np.dot(emb[qid], v)), 6), vid)
                for vid, v in emb.items()
                if vid != qid
            ),
        )[:TOP_K]
        for rn, (_, vid) in enumerate(scored, start=1):
            assert got[(qid, rn)] == vid, (qid, rn)
        # replicate the operator's sample threshold; measure the prune
        sample_ips = sorted(
            (
                round(float(np.dot(emb[qid], emb[vid])), 6)
                for vid in emb
                if vid % MIPS_SAMPLE_MOD == 0 and vid != qid
            ),
            reverse=True,
        )
        t = sample_ips[TOP_K - 1]
        qn = norms[qid]
        pruned_total += sum(
            1 for vid in emb if vid != qid and norms[vid] * qn < t
        )
        candidates_total += n - 1
    assert pruned_total > candidates_total * 0.5, (
        f"prune dropped only {pruned_total}/{candidates_total}"
    )


def test_mips_survives_corpus_smaller_than_k(spark, tmp_path):
    """3-vector corpus: the phase-1 sample can't fill TOP_K, the
    threshold falls back to -inf, and the result is plain brute force."""
    rows = [
        (0, [1.0, 0.0], 0), (1, [0.5, 0.5], 0), (2, [0.0, 2.0], 0),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf = tmp_path / "mips_tiny"
    df.write.parquet(str(sf / "embeddings.parquet"))
    out = lookup("sim_mips_topk").fn(spark, str(sf)).collect()
    got = {
        (r["query_id"], r["neighbor_id"]): r["rn"] for r in out
    }
    # q0 neighbors ranked by ip: v1 (0.5) > v2 (0.0)
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2
    # q2 neighbors: v1 (1.0) > v0 (0.0)
    assert got[(2, 1)] == 1 and got[(2, 0)] == 2


# ---------------------------------------------------------------------------
# mm_audio_vad (operators/multimodal.py)
# ---------------------------------------------------------------------------


def test_vad_segments_match_codec_level_recompute(spark, sf_dir):
    """Independent mirror: synthesize each doc's WAV with the codec,
    decode it back, window/gate/merge in Python, compare segments."""
    from xml_to_parquet_spark.functions.audiocodec import decode_wav, encode_wav
    from xml_to_parquet_spark.operators.multimodal import VAD_MEAN_GATE, VAD_WIN

    rows = lookup("mm_audio_vad").fn(spark, sf_dir).collect()
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["seg_idx"]] = (
            r["start_win"], r["end_win"], r["n_windows"], r["loud_sum"],
        )
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").limit(25).collect()
    ]
    for d in doc_ids:
        n = 256 + d % 512
        i = np.arange(n)
        active = (d + i // VAD_WIN) % 3 != 0
        v = np.where(active, (d + i) % 200 + 500, (d + i) % 50).astype(
            np.int16
        )
        _rate, samples = decode_wav(encode_wav(v, sample_rate=16000))
        n_win = len(samples) // VAD_WIN
        loud = (
            np.abs(samples[: n_win * VAD_WIN].astype("int64"))
            .reshape(n_win, VAD_WIN).sum(axis=1)
        )
        segs, cur = [], None
        for w in range(n_win):
            if loud[w] >= VAD_WIN * VAD_MEAN_GATE:
                if cur is None:
                    cur = [w, w, 1, int(loud[w])]
                else:
                    cur[1], cur[2], cur[3] = w, cur[2] + 1, cur[3] + int(loud[w])
            elif cur is not None:
                segs.append(tuple(cur)); cur = None
        if cur is not None:
            segs.append(tuple(cur))
        got = [by_doc.get(d, {}).get(k) for k in range(len(segs))]
        assert got == segs, d
        assert len(by_doc.get(d, {})) == len(segs)


def test_vad_cadence_bounds(spark, sf_dir):
    """The 2-active-1-silent fixture cadence bounds every segment at
    1..2 windows (2 inside the stream, 1 only when clipped at an edge)."""
    rows = lookup("mm_audio_vad").fn(spark, sf_dir).collect()
    assert rows
    assert all(r["n_windows"] in (1, 2) for r in rows)
    one_win = [r for r in rows if r["n_windows"] == 1]
    for r in one_win:  # clipped segments only at the stream edges
        d = r["doc_id"]
        n_win = (256 + d % 512) // 64
        assert r["start_win"] == 0 or r["end_win"] == n_win - 1


def test_vad_single_hash_exchange(spark, sf_dir):
    """Map-only codec stages; ONE doc_id hash exchange shared by the
    island window and the (doc_id, seg_idx) aggregate."""
    from xml_to_parquet_spark.plans.inspect import shuffle_count

    df = lookup("mm_audio_vad").fn(spark, sf_dir)
    assert shuffle_count(df) == 1


# ---------------------------------------------------------------------------
# join_spatial_grid (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_spatial_grid_matches_bruteforce(spark, sf_dir):
    """Grid-binned plan vs naive O(n^2) recompute: identical pair sets
    with identical Chebyshev distances — duplicates or misses from the
    cell replication would show immediately."""
    from xml_to_parquet_spark.operators.relational_ext import (
        CHEB_R, GRID_SPAN, SPATIAL_PT_MOD,
    )

    rows = lookup("join_spatial_grid").fn(spark, sf_dir).collect()
    got = {(r["a_id"], r["b_id"]): r["cheb"] for r in rows}
    assert len(got) == len(rows)  # exactly-once: no duplicate pairs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    pts = {
        r["event_id"]: (
            (r["user_id"] * 37 + r["event_id"] * 13) % GRID_SPAN,
            (r["event_id"] * 59 + r["user_id"] * 7) % GRID_SPAN,
        )
        for r in ev
        if r["event_id"] % SPATIAL_PT_MOD == 0
    }
    ids = sorted(pts)
    want = {}
    for i, a in enumerate(ids):
        ax, ay = pts[a]
        for b in ids[i + 1:]:
            bx, by = pts[b]
            if abs(ax - bx) <= CHEB_R and abs(ay - by) <= CHEB_R:
                want[(a, b)] = max(abs(ax - bx), abs(ay - by))
    assert got == want
    assert want  # non-degenerate at the test SF


def test_spatial_grid_is_a_hash_join(spark, sf_dir):
    """The rewrite's whole point: candidates meet in an equi-join on the
    cell key — never a nested-loop/cartesian plan."""
    from xml_to_parquet_spark.plans.inspect import node_counts

    df = lookup("join_spatial_grid").fn(spark, sf_dir)
    n = node_counts(df)
    assert "CartesianProduct" not in n
    assert "BroadcastNestedLoopJoin" not in n
    assert (
        n.get("SortMergeJoin", 0)
        + n.get("ShuffledHashJoin", 0)
        + n.get("BroadcastHashJoin", 0)
        >= 1
    )


# ---------------------------------------------------------------------------
# sim_diversity_mmr (operators/similarity.py)
# ---------------------------------------------------------------------------


def _mmr_py(emb, qid, n_cand, n_picks):
    """Pure-Python mirror of the operator's greedy MMR."""
    rels = sorted(
        (
            (-round(float(np.dot(emb[qid], v)), 6), vid)
            for vid, v in emb.items()
            if vid != qid
        ),
    )[:n_cand]
    cand = [(vid, -negrel) for negrel, vid in rels]
    sims = {
        (a, b): round(float(np.dot(emb[a], emb[b])), 6)
        for a, _ in cand
        for b, _ in cand
        if a != b
    }
    sel, out = [], []
    for pick in range(1, n_picks + 1):
        best = None
        for cid, rel in cand:
            if cid in sel:
                continue
            ms = max((sims[(cid, s)] for s in sel), default=0.0)
            score = round(7 * rel - 3 * ms, 6) if sel else round(7 * rel, 6)
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, score)
        sel.append(best[1])
        out.append((pick, best[1], best[2]))
    return out


def test_mmr_matches_python_mirror(spark, sf_dir):
    from xml_to_parquet_spark.operators.similarity import (
        MMR_CAND, MMR_PICKS, N_QUERIES,
    )

    rows = lookup("sim_diversity_mmr").fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    got = {
        (r["query_id"], r["pick"]): (r["neighbor_id"], r["score"])
        for r in rows
    }
    assert len(got) == N_QUERIES * MMR_PICKS
    for qid in range(N_QUERIES):
        for pick, cid, score in _mmr_py(emb, qid, MMR_CAND, MMR_PICKS):
            g_cid, g_score = got[(qid, pick)]
            assert g_cid == cid, (qid, pick)
            assert abs(g_score - score) < 1e-9, (qid, pick)


def test_mmr_breaks_up_near_duplicate_cluster(spark, tmp_path, reg):
    """The property MMR exists for: a query between two topics whose
    pool is dominated by near-copies of topic A must not fill every slot
    with A copies — plain relevance ranking would (all candidates tie on
    rel, so id order yields A1..A4). With lambda = 0.7 the flip needs
    sim-to-selected to differ by > (7/3) * the rel gap, so the fixture
    puts the query exactly between orthogonal topics A and B: every
    candidate ties at rel ~ 0.7071, A-A sim ~ 1.0, A-B sim ~ 0 — slot 2
    MUST be B."""
    dim = 8
    rows = []
    base_a = np.zeros(dim); base_a[0] = 1.0
    base_b = np.zeros(dim); base_b[1] = 1.0
    q = (base_a + base_b) / np.sqrt(2.0)
    rows.append((0, [float(x) for x in q], 0))  # the query itself
    for i in range(1, 7):  # topic-A near-dups, rel ~ 0.7071 each
        v = base_a.copy(); v[2] = 0.001 * i
        rows.append((int(i), [float(x) for x in v], 0))
    rows.append((7, [float(x) for x in base_b], 0))  # topic B, same rel
    for i in range(8, 24):  # filler far from the query
        v = np.zeros(dim); v[3 + i % 4] = 0.01
        rows.append((int(i), [float(x) for x in v], 0))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf = tmp_path / "mmr_sf"
    df.write.parquet(str(sf / "embeddings.parquet"))

    out = lookup("sim_diversity_mmr").fn(spark, str(sf)).collect()
    picks_q0 = {
        r["pick"]: r["neighbor_id"] for r in out if r["query_id"] == 0
    }
    assert picks_q0[1] in range(1, 7)  # most relevant: an A copy
    assert picks_q0[2] == 7, picks_q0  # diversity kicks in at slot 2


# ---------------------------------------------------------------------------
# graph_scc_bounded (operators/graphs.py)
# ---------------------------------------------------------------------------


def test_scc_planted_rings_collapse(spark, sf_dir):
    """Every planted 4-ring (nodes 4k..4k+3 for k < 64) is pairwise
    mutually reachable within 4 hops, so all four members must share
    scc_id == the ring minimum 4k — unless organic noise edges merge a
    ring with something SMALLER, which can only lower the id (never
    split the ring)."""
    from xml_to_parquet_spark.operators.graphs import SCC_RING_NODES

    rows = lookup("graph_scc_bounded").fn(spark, sf_dir).collect()
    scc = {r["node"]: r["scc_id"] for r in rows}
    assert len(scc) == len(rows)
    for k in range(SCC_RING_NODES // 4):
        members = [4 * k, 4 * k + 1, 4 * k + 2, 4 * k + 3]
        ids = {scc[m] for m in members}
        assert len(ids) == 1, f"ring {k} split: { {m: scc[m] for m in members} }"
        assert ids.pop() <= 4 * k


def test_scc_bounded_python_mirror(spark, sf_dir):
    """Independent recompute: k-hop bounded mutual reachability via BFS
    from every node over the SAME edge set, on the smallest SF."""
    from xml_to_parquet_spark.operators.graphs import (
        SCC_HOPS, SCC_NODES, SCC_RING_NODES, SCC_SAMPLE_MOD,
    )

    small = "/root/testdata/sf0.001"
    rows = lookup("graph_scc_bounded").fn(spark, small).collect()
    got = {r["node"]: r["scc_id"] for r in rows}

    li = spark.read.parquet(f"{small}/lineitem.parquet").collect()
    edges = set()
    for r in li:
        if r["l_orderkey"] % SCC_SAMPLE_MOD != 0:
            continue
        a = (r["l_orderkey"] * 7 + r["l_linenumber"] * 11) % SCC_NODES
        b = (r["l_orderkey"] * 13 + r["l_suppkey"] * 5 + 3) % SCC_NODES
        if a != b:
            edges.add((a, b))
    for i in range(SCC_RING_NODES):
        edges.add((i, (i - i % 4) + (i % 4 + 1) % 4))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)

    def reach_k(src):
        seen = {src}
        frontier = {src}
        for _ in range(SCC_HOPS):
            frontier = {
                w for v in frontier for w in adj.get(v, ()) if w not in seen
            }
            seen |= frontier
        return seen

    nodes = {a for a, _ in edges} | {b for _, b in edges}
    fwd = {v: reach_k(v) for v in nodes}
    want = {}
    for v in nodes:
        mutual = {w for w in fwd[v] if v in fwd.get(w, ())}
        want[v] = min(mutual | {v})
    assert got == want


def test_scc_path_graph_stays_singleton():
    """Sanity on the definition itself (no Spark): a directed path has
    no cycles, so bounded mutual reachability must leave every node its
    own scc_id — the property that separates SCC from weak
    connectivity."""
    adj = {i: {i + 1} for i in range(10)}

    def reach_k(src, k=4):
        seen, frontier = {src}, {src}
        for _ in range(k):
            frontier = {w for v in frontier for w in adj.get(v, ()) if w not in seen}
            seen |= frontier
        return seen

    for v in range(11):
        fwd = reach_k(v)
        mutual = {w for w in fwd if v in reach_k(w)}
        assert min(mutual | {v}) == v
