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

from xml_to_parquet_spark.registry import STAGED, load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_r12_staged_ops_hidden_from_driver_registry(reg):
    for name in (
        "stream_stream_full_outer", "mm_video_framesample", "lake_merge_upsert",
    ):
        assert name in STAGED and name not in reg


# ---------------------------------------------------------------------------
# stream_stream_full_outer (streaming/joins.py)
# ---------------------------------------------------------------------------


def test_full_outer_evicts_on_both_state_stores(reg, spark, sf_dir):
    """The behavior left-outer never exercises: BOTH unmatched sides
    flush at eviction, with asymmetric boundaries — clicks once
    wm > cts + 1h (a later purchase could match until then), purchases
    once wm > pts (no older click can arrive after that). Matched part
    must equal the inner join exactly."""
    out = STAGED["stream_stream_full_outer"].fn(spark, sf_dir).collect()
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
    out = STAGED["stream_stream_full_outer"].fn(spark, sf_dir).collect()
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
    out = STAGED["stream_stream_full_outer"].fn(spark, str(one_sided)).collect()
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
    rows = STAGED["mm_video_framesample"].fn(spark, sf_dir).collect()
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

    df = STAGED["mm_video_framesample"].fn(spark, sf_dir)
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

    STAGED["lake_merge_upsert"].fn(spark, sf_dir).collect()  # build
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

    STAGED["lake_merge_upsert"].fn(spark, sf_dir).collect()
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
