"""Semantic tests for the operators BUILT in round 10 and staged for the
r13 window rotation (r11's budget is the late-r9 alternates, r12's the
eight r10-staged ops): dq_ks_distance, dq_schema_drift,
graph_link_predict. Same staging contract as tests/test_new_ops_r10.py —
all are invisible to queries() until promoted, and each gets a FULL
independent Python recompute here (not just invariants), so the oracle
and the implementation are checked against a third formulation.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import pandas as pd
import pytest

from xml_to_parquet_spark.operators.graphs import LP_DEG_CAP, LP_SCALE, LP_TOPK
from xml_to_parquet_spark.operators.relational_ext import (
    DRIFT_SPLIT,
    KS_REF_TYPE,
)
from xml_to_parquet_spark.registry import STAGED, load_all, lookup


@pytest.fixture(scope="module")
def reg():
    return load_all()


@pytest.fixture(scope="module")
def events_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_r13_staged_ops_hidden_from_driver_registry(reg):
    # every op in this file is now promoted: stream_timer_timeout at the
    # r11 rotation (pulled forward per VERDICT r10 #4), the dq/graph ops
    # at r12, and er_fellegi_sunter at the r13 rotation
    for name in (
        "er_fellegi_sunter",
        "stream_timer_timeout",
        "dq_ks_distance",
        "dq_schema_drift",
        "graph_link_predict",
    ):
        assert name not in STAGED and name in reg


# ---------------------------------------------------------------------------
# dq_ks_distance (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _ks_recompute(events_pd):
    """Exact integer two-sample KS, third formulation (plain dict loops —
    no SQL, no window functions)."""
    ev = events_pd[events_pd["value"].notna()]
    cents = (ev["value"] * 100).round().astype("int64")
    ref = defaultdict(int)
    cur: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for t, x in zip(ev["event_type"], cents):
        if t == KS_REF_TYPE:
            ref[x] += 1
        else:
            cur[t][x] += 1
    n_ref = sum(ref.values())
    out = {}
    for t, cnt in cur.items():
        n_cur = sum(cnt.values())
        if n_ref == 0 or n_cur == 0:
            continue
        cumref = cumcur = 0
        best = (-1, None)
        for x in sorted(set(ref) | set(cnt)):
            cumref += ref.get(x, 0)
            cumcur += cnt.get(x, 0)
            d = abs(n_cur * cumref - n_ref * cumcur)
            if d > best[0]:
                best = (d, x)
        out[t] = (n_ref, n_cur, best[0], best[1], round(best[0] / (n_ref * n_cur), 6))
    return out


def test_ks_distance_matches_exact_python_recompute(reg, spark, sf_dir, events_pd):
    got = {
        r["event_type"]: (
            r["n_ref"], r["n_cur"], r["ks_num"], r["ks_at_x_scaled"], r["ks_stat"]
        )
        for r in lookup("dq_ks_distance").fn(spark, sf_dir).collect()
    }
    assert got == _ks_recompute(events_pd)


def test_ks_distance_stat_bounds_and_self_zero(reg, spark, sf_dir):
    """0 <= KS <= 1 always; and the statistic is genuinely discriminative
    scaffolding: ks_num is the UNNORMALIZED sup over the integer grid, so
    it must be attained at the reported argmax."""
    for r in lookup("dq_ks_distance").fn(spark, sf_dir).collect():
        assert 0.0 <= r["ks_stat"] <= 1.0
        assert r["ks_num"] <= r["n_ref"] * r["n_cur"]


# ---------------------------------------------------------------------------
# dq_schema_drift (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _payload_keys(row, split):
    keys = ["k"]
    if row.event_type == "purchase":
        keys.append("amount")
    if round(row.value * 100) >= 750:
        keys.append("flag")
    if row.user_id % 7 == 0:
        keys.append("sess")
    if row.ts >= split:
        keys.append("v2")
    if row.ts < split and row.event_type == "signup":
        keys.append("legacy")
    if row.user_id % 10 < (3 if row.ts < split else 5):
        keys.append("exp")
    return keys


def test_schema_drift_matches_exact_python_recompute(reg, spark, sf_dir, events_pd):
    split = pd.Timestamp(DRIFT_SPLIT)
    kc: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    tot: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for row in events_pd.itertuples():
        h = 0 if row.ts < split else 1
        tot[row.event_type][h] += 1
        for k in _payload_keys(row, split):
            kc[(row.event_type, k)][h] += 1
    expect = {}
    for (t, k), (c1, c2) in kc.items():
        n1, n2 = tot[t]
        if c1 == 0 and c2 > 0:
            status = "added"
        elif c1 > 0 and c2 == 0:
            status = "removed"
        elif 20 * abs(c1 * n2 - c2 * n1) > n1 * n2:
            status = "drifted"
        else:
            status = "stable"
        expect[(t, k)] = (c1, n1, c2, n2, status)

    got = {
        (r["event_type"], r["prop_key"]): (
            r["c1"], r["n1"], r["c2"], r["n2"], r["status"]
        )
        for r in lookup("dq_schema_drift").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_schema_drift_exercises_every_status(reg, spark, sf_dir):
    """The migration scenario must light up all four classifications:
    v2 added everywhere, signup.legacy removed, the 30%→50% experiment
    ramp drifted, and the always-present k stable — so the status column
    is demonstrably computed, not constant."""
    rows = lookup("dq_schema_drift").fn(spark, sf_dir).collect()
    by_status = defaultdict(set)
    for r in rows:
        by_status[r["status"]].add((r["event_type"], r["prop_key"]))
    types = {r["event_type"] for r in rows}
    assert {(t, "v2") for t in types} <= by_status["added"]
    assert ("signup", "legacy") in by_status["removed"]
    assert {(t, "exp") for t in types} <= by_status["drifted"]
    assert {(t, "k") for t in types} <= by_status["stable"]


# ---------------------------------------------------------------------------
# graph_link_predict (operators/graphs.py)
# ---------------------------------------------------------------------------


def _link_predict_recompute(sf_dir):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    by_order = defaultdict(set)
    for o, u in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[o].add(int(u))
    edges = set()
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cn = defaultdict(int)
    ra = defaultdict(int)
    for w, nbrs in adj.items():
        d = len(nbrs)
        if d > LP_DEG_CAP:
            continue
        share = LP_SCALE // d
        for a, b in combinations(sorted(nbrs), 2):
            if (a, b) not in edges:
                cn[(a, b)] += 1
                ra[(a, b)] += share
    ranked = sorted(ra, key=lambda p: (-ra[p], -cn[p], p))[:LP_TOPK]
    return [
        (u, v, cn[(u, v)], ra[(u, v)], round(ra[(u, v)] / LP_SCALE, 6))
        for u, v in ranked
    ], edges


def test_link_predict_matches_exact_python_recompute(reg, spark, sf_dir):
    expect, edges = _link_predict_recompute(sf_dir)
    got = [
        (r["u"], r["v"], r["cn"], r["ra_num"], r["ra_score"])
        for r in lookup("graph_link_predict").fn(spark, sf_dir).collect()
    ]
    # the top-k ORDER is part of the contract (deterministic total order)
    assert got == expect
    for u, v, *_ in got:
        assert (u, v) not in edges, "predicted an existing edge"


def test_link_predict_scores_are_ra_semantics(reg, spark, sf_dir):
    """RA score decomposes as sum of 1/deg over common capped centers:
    cn bounds give cn/LP_DEG_CAP <= ra_score (every center degree is at
    most the cap), and ra_num must be positive with u < v canonical."""
    rows = lookup("graph_link_predict").fn(spark, sf_dir).collect()
    assert rows, "no candidates at this scale"
    for r in rows:
        assert r["u"] < r["v"]
        assert r["cn"] >= 1
        assert r["ra_num"] >= r["cn"] * (LP_SCALE // LP_DEG_CAP)


# ---------------------------------------------------------------------------
# stream_timer_timeout (streaming/stateful.py)
# ---------------------------------------------------------------------------


def test_timer_timeout_matches_exact_python_recompute(reg, spark, sf_dir, events_pd):
    """Full replay-contract recompute: a user is emitted iff their last
    event (floored to the timer API's ms resolution) + 2h sits STRICTLY
    below the final watermark (ms-truncated max event time - 30min)."""
    from xml_to_parquet_spark.streaming.stateful import TIMER_GAP_MS

    ns = pd.DatetimeIndex(events_pd["ts"]).as_unit("ns").asi8
    wm_ms = int(ns.max()) // 1_000_000 - 30 * 60 * 1000
    expect = {}
    for uid, grp in events_pd.groupby("user_id"):
        last_us = int(pd.DatetimeIndex(grp["ts"]).as_unit("ns").asi8.max()) // 1000
        if last_us // 1000 + TIMER_GAP_MS < wm_ms:
            expect[int(uid)] = (len(grp), last_us)
    got = {
        r["user_id"]: (r["n_events"], r["last_ts_us"])
        for r in lookup("stream_timer_timeout").fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got, "no user ever timed out — the scenario is degenerate"
    n_users = events_pd["user_id"].nunique()
    assert len(got) < n_users, "every user timed out — the gap never binds"


def test_timer_fires_strictly_below_watermark(spark, tmp_path):
    """Empirical pin of the boundary the oracle encodes: a timer at
    exactly the final watermark does NOT fire; one 1ms older does.
    (Spark fires event-time timers with timeoutTimestamp < watermark.)"""
    import datetime

    T = datetime.datetime(2024, 1, 10, 12, 0, 0)  # ms-aligned max ts
    wm = T - datetime.timedelta(minutes=30)
    gap = datetime.timedelta(hours=2)
    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "ts": [wm - gap, wm - gap - datetime.timedelta(milliseconds=1), T],
            "user_id": [1, 2, 3],
            "event_type": ["view"] * 3,
            "value": [1.0] * 3,
            "props": ['{"k":1}'] * 3,
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    out = lookup("stream_timer_timeout").fn(spark, str(tmp_path)).collect()
    assert sorted(r["user_id"] for r in out) == [2]


# ---------------------------------------------------------------------------
# plan pins (the staged-tier counterpart of tests/test_plans.py)
# ---------------------------------------------------------------------------


def test_ks_distance_plan_pruned_scan_no_data_cartesian(spark, sf_dir):
    """Events scan must read only (event_type, value); the only
    nested-loop is the DELIBERATE broadcast cross of the |types| row set
    against the reference grid (bounded, 4 rows) — never a data-sized
    cartesian; no sort-merge join anywhere."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("dq_ks_distance").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0
    assert n.get("BroadcastNestedLoopJoin", 0) <= 1
    assert not any("SortMergeJoin" in k for k in n)
    for rs in read_schemas(df):
        assert "props" not in rs and "event_id" not in rs


def test_schema_drift_plan_broadcast_totals_pruned_scan(spark, sf_dir):
    """The per-type totals join must broadcast (|types| rows) and the
    scan must NOT read the real props column — the payload is derived,
    so a props read would mean dead I/O at 100 TB."""
    from xml_to_parquet_spark.plans.inspect import (
        broadcast_join_count,
        node_counts,
        read_schemas,
    )

    df = lookup("dq_schema_drift").fn(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    assert not any("SortMergeJoin" in k for k in node_counts(df))
    for rs in read_schemas(df):
        assert "props" not in rs


def test_link_predict_plan_hash_joins_topk_no_global_sort(spark, sf_dir):
    """Wedge enumeration and the anti-join must be hash equi-joins (a
    cartesian here is the quadratic plan the center key exists to kill);
    the final top-k must be TakeOrderedAndProject, never a range
    exchange + global sort."""
    from xml_to_parquet_spark.plans.inspect import node_counts, physical_plan

    df = lookup("graph_link_predict").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0
    assert n.get("BroadcastNestedLoopJoin", 0) == 0
    assert n.get("TakeOrderedAndProject", 0) == 1
    assert "Exchange rangepartitioning" not in physical_plan(df)


# ---------------------------------------------------------------------------
# mine_assoc_rules (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _assoc_recompute(sf_dir):
    from xml_to_parquet_spark.operators.relational_ext import AR_MINSUP

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    by_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[o].add(int(p))
    n_orders = len(by_order)
    s_item = defaultdict(int)
    for parts in by_order.values():
        for p in parts:
            s_item[p] += 1
    s_pair = defaultdict(int)
    for parts in by_order.values():
        frequent = [p for p in sorted(parts) if s_item[p] >= AR_MINSUP]
        for x, y in combinations(frequent, 2):
            s_pair[(x, y)] += 1
    out = {}
    for (x, y), s in s_pair.items():
        if s < AR_MINSUP:
            continue
        for a, c in ((x, y), (y, x)):
            out[(a, c)] = (
                s, s_item[a], s_item[c], n_orders,
                round(s / s_item[a], 6),
                round(s * n_orders / (s_item[a] * s_item[c]), 6),
            )
    return out


def test_assoc_rules_match_exact_python_recompute(reg, spark, sf_dir):
    got = {
        (r["antecedent"], r["consequent"]): (
            r["s_pair"], r["s_ante"], r["s_cons"], r["n_orders"],
            r["confidence"], r["lift"],
        )
        for r in lookup("mine_assoc_rules").fn(spark, sf_dir).collect()
    }
    assert got == _assoc_recompute(sf_dir)
    assert got, "no rules at this scale — MINSUP degenerate"


def test_assoc_rules_semantics(reg, spark, sf_dir):
    """Rule identities that hold for ANY corpus: both directions of a
    frequent pair exist, confidence is in (0, 1], support bounds are
    consistent (pair <= each item <= orders), and lift is symmetric
    across the two directions of one pair."""
    rows = lookup("mine_assoc_rules").fn(spark, sf_dir).collect()
    by_dir = {(r["antecedent"], r["consequent"]): r for r in rows}
    for (a, c), r in by_dir.items():
        assert (c, a) in by_dir
        assert 0.0 < r["confidence"] <= 1.0
        assert r["s_pair"] <= min(r["s_ante"], r["s_cons"]) <= r["n_orders"]
        assert r["lift"] == by_dir[(c, a)]["lift"]


def test_assoc_rules_plan_broadcast_ladder_no_cartesian(spark, sf_dir):
    """The a-priori ladder must broadcast the frequent-item semi-join and
    both support lookups; pair generation must be EQUI-KEYED on the
    order id, never a cartesian (the 1-row n_orders cross join is the
    only nested-loop).

    r16-opt note: the basket table materializes once (localCheckpoint —
    its docstring has the before/after), so the pair self-join's sides
    no longer carry parquet statistics; the STATIC planner therefore
    plans an o-keyed SortMergeJoin here instead of the size-estimated
    broadcast (AQE still converts it at runtime when a side is small,
    and at scale the SF-linear side must not broadcast at all). The pin
    is the join KEYING — equi-join, zero cartesians — not the physical
    strategy the estimator picks at a given SF."""
    from xml_to_parquet_spark.plans.inspect import (
        broadcast_join_count,
        node_counts,
        physical_plan,
    )

    df = lookup("mine_assoc_rules").fn(spark, sf_dir)
    n = node_counts(df)
    assert broadcast_join_count(df) >= 3
    assert n.get("CartesianProduct", 0) == 0
    assert n.get("BroadcastNestedLoopJoin", 0) <= 1  # the 1-row totals
    # any non-broadcast join in the ladder must be the o-keyed self-join
    smj = n.get("SortMergeJoin", 0) + n.get("ShuffledHashJoin", 0)
    if smj:
        plan = physical_plan(df)
        assert smj <= 1, n
        assert ("SortMergeJoin [o#" in plan) or (
            "ShuffledHashJoin [o#" in plan
        ), plan[:2000]


# ---------------------------------------------------------------------------
# timeseries_interpolate (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _interp_recompute(events_pd):
    out = {}
    ev = events_pd.copy()
    ev["bucket"] = ev["ts"].dt.floor("D")
    for (uid, bucket), grp in ev.groupby(["user_id", "bucket"]):
        row = grp.loc[grp["event_id"].idxmax()]
        out[(int(uid), bucket)] = int(round(row["value"] * 100))
    expect = {}
    for uid in sorted({u for u, _ in out}):
        days = sorted(b for u, b in out if u == uid)
        d0, d1 = days[0], days[-1]
        obs = {b: out[(uid, b)] for b in days}
        spine = pd.date_range(d0, d1, freq="D")
        day_n = {b: (b - pd.Timestamp("1970-01-01")).days for b in spine}
        for b in spine:
            if b in obs:
                expect[(uid, b)] = (False, obs[b])
                continue
            prevs = [x for x in days if x < b]
            nexts = [x for x in days if x > b]
            if prevs and nexts:
                pb, nb = prevs[-1], nexts[0]
                pc, nc = obs[pb], obs[nb]
                num = (nc - pc) * (day_n[b] - day_n[pb])
                den = day_n[nb] - day_n[pb]
                q = int(num / den) if num % den else num // den  # truncate
                expect[(uid, b)] = (True, pc + q)
            else:
                expect[(uid, b)] = (True, None)
    return expect


def test_interpolate_matches_exact_python_recompute(reg, spark, sf_dir, events_pd):
    got = {
        (r["user_id"], pd.Timestamp(r["bucket"])): (r["is_gap"], r["cents_interp"])
        for r in lookup("timeseries_interpolate").fn(spark, sf_dir).collect()
    }
    assert got == _interp_recompute(events_pd)


def test_interpolate_contract_edges_null_and_bounded(reg, spark, sf_dir):
    """Observed days pass through verbatim (is_gap false); interior gaps
    land strictly between (or at) their anchors; no value exists outside
    the observed span (interpolate never extrapolates — the contract
    difference vs gap_fill's forward fill)."""
    rows = lookup("timeseries_interpolate").fn(spark, sf_dir).collect()
    assert any(r["is_gap"] for r in rows)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r["bucket"])
        obs_idx = [i for i, r in enumerate(rs) if not r["is_gap"]]
        for i, r in enumerate(rs):
            if r["is_gap"] and (i < obs_idx[0] or i > obs_idx[-1]):
                assert r["cents_interp"] is None
            elif r["is_gap"]:
                lo = max(j for j in obs_idx if j < i)
                hi = min(j for j in obs_idx if j > i)
                a, b = rs[lo]["cents_interp"], rs[hi]["cents_interp"]
                assert min(a, b) - 1 <= r["cents_interp"] <= max(a, b) + 1


def test_interpolate_plan_pruned_scan_no_cartesian(spark, sf_dir):
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("timeseries_interpolate").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0
    assert n.get("BroadcastNestedLoopJoin", 0) == 0
    for rs in read_schemas(df):
        assert "props" not in rs and "event_type" not in rs


# ---------------------------------------------------------------------------
# mm_image_histogram (operators/multimodal.py)
# ---------------------------------------------------------------------------


def test_image_histogram_matches_exact_python_recompute(reg, spark, sf_dir):
    """Closed-form recompute of every (doc_id, bucket, count) — a
    distribution check, which catches pixel-PERMUTATION codec bugs the
    existing pix_sum parity cannot."""
    import numpy as np

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    expect = {}
    for d in docs["doc_id"].astype(int):
        w, h = 8 + d % 16, 8 + (d * 7) % 16
        xs, ys = np.arange(w), np.arange(h)
        img = (d + 3 * xs[None, :] + 5 * ys[:, None]) % 256
        counts = np.bincount(img.ravel() >> 4, minlength=16)
        for b in np.nonzero(counts)[0]:
            expect[(d, int(b))] = int(counts[b])
    got = {
        (r["doc_id"], r["bucket"]): r["n_in_bucket"]
        for r in lookup("mm_image_histogram").fn(spark, sf_dir).collect()
    }
    assert got == expect
    # the band-coverage property: small images must NOT light all buckets
    per_doc = defaultdict(int)
    for (d, _b) in got:
        per_doc[d] += 1
    assert min(per_doc.values()) < 16


def test_image_histogram_counts_conserve_pixels(reg, spark, sf_dir):
    """Σ bucket counts per image == width*height — histogram conservation,
    independent of pixel values."""
    rows = lookup("mm_image_histogram").fn(spark, sf_dir).collect()
    per_doc = defaultdict(int)
    for r in rows:
        assert 0 <= r["bucket"] < 16
        per_doc[r["doc_id"]] += r["n_in_bucket"]
    for d, tot in per_doc.items():
        assert tot == (8 + d % 16) * (8 + (d * 7) % 16)


def test_image_histogram_plan_single_fanout_exchange(spark, sf_dir):
    """The mm codec-chassis invariant: exactly ONE round-robin fan-out
    Exchange, zero data shuffles — the histogram reduction happens inside
    the Arrow batch, never on the wire."""
    from xml_to_parquet_spark.plans.inspect import physical_plan, shuffle_count

    df = lookup("mm_image_histogram").fn(spark, sf_dir)
    assert shuffle_count(df) == 0
    assert physical_plan(df).count("Exchange RoundRobinPartitioning") == 1


# ---------------------------------------------------------------------------
# text_winnow_fingerprint (operators/text.py)
# ---------------------------------------------------------------------------


def _winnow_recompute(sf_dir):
    import hashlib

    from xml_to_parquet_spark.operators.text import WIN_K, WIN_W

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = set()
    sel_by_doc = defaultdict(set)
    for d, text in zip(docs["doc_id"].astype(int), docs["text"]):
        words = text.split(" ")
        grams = [
            " ".join(words[i : i + WIN_K]) for i in range(len(words) - WIN_K + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        for e in range(WIN_W - 1, len(hs)):
            lo = e - WIN_W + 1
            mh = min(hs[lo : e + 1])
            pos = max(i for i in range(lo, e + 1) if hs[i] == mh)  # rightmost
            out.add((d, pos, hs[pos]))
            sel_by_doc[d].add(pos)
    return out, sel_by_doc


def test_winnow_matches_exact_python_recompute(reg, spark, sf_dir):
    expect, _sel = _winnow_recompute(sf_dir)
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in lookup("text_winnow_fingerprint").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_winnow_local_cover_guarantee_and_density(reg, spark, sf_dir):
    """The winnowing theorem: every window of WIN_W consecutive k-grams
    contains at least one selected fingerprint position (so any shared
    run of >= WIN_W + WIN_K - 1 words is guaranteed to share a
    fingerprint), and the expected density is ~2/(W+1) of k-grams —
    check selected <= k-grams and >= the per-window floor."""
    from xml_to_parquet_spark.operators.text import WIN_K, WIN_W

    _expect, sel_by_doc = _winnow_recompute(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_words = {
        int(d): len(t.split(" ")) for d, t in zip(docs["doc_id"], docs["text"])
    }
    rows = lookup("text_winnow_fingerprint").fn(spark, sf_dir).collect()
    got_by_doc = defaultdict(set)
    for r in rows:
        got_by_doc[r["doc_id"]].add(r["pos"])
    for d, picks in got_by_doc.items():
        n_g = n_words[d] - WIN_K + 1
        for e in range(WIN_W - 1, n_g):
            assert any(e - WIN_W + 1 <= p <= e for p in picks), (d, e)


def test_winnow_plan_single_doc_exchange(spark, sf_dir):
    """The whole chain — lead() windows, the bounded x W membership
    explode, the per-window MIN, the final distinct — must ride ONE
    doc_id hash exchange (HashPartitioning(doc_id) satisfies the
    (doc_id, wend) aggregate and the 3-column distinct by the subset
    rule); a second exchange means a clustering regression."""
    from xml_to_parquet_spark.plans.inspect import node_counts, shuffle_count

    df = lookup("text_winnow_fingerprint").fn(spark, sf_dir)
    assert shuffle_count(df) == 1
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0
    assert n.get("BroadcastNestedLoopJoin", 0) == 0


# ---------------------------------------------------------------------------
# dq_mann_whitney (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _mw_recompute(events_pd):
    """Midrank U via the textbook formulation: assign each observation its
    average rank in the combined sample, sum per group — an entirely
    different formulation from the op's counts-grid algebra."""
    ev = events_pd[events_pd["value"].notna()]
    cents = (ev["value"] * 100).round().astype("int64")
    out = {}
    ref_vals = sorted(cents[ev["event_type"] == KS_REF_TYPE])
    for t in sorted(set(ev["event_type"]) - {KS_REF_TYPE}):
        cur_vals = sorted(cents[ev["event_type"] == t])
        n1, n2 = len(ref_vals), len(cur_vals)
        if not n1 or not n2:
            continue
        combined = sorted(ref_vals + cur_vals)
        # 2x average rank per value (1-based ranks)
        first = {}
        for i, v in enumerate(combined):
            first.setdefault(v, i + 1)
        from collections import Counter

        cnt = Counter(combined)
        two_rank = {v: 2 * first[v] + cnt[v] - 1 for v in cnt}
        r2_ref = sum(two_rank[v] for v in ref_vals)
        r2_cur = sum(two_rank[v] for v in cur_vals)
        u2_ref = r2_ref - n1 * (n1 + 1)
        u2_cur = r2_cur - n2 * (n2 + 1)
        out[t] = (n1, n2, u2_ref, u2_cur, round(u2_cur / (2 * n1 * n2), 6))
    return out


def test_mann_whitney_matches_exact_python_recompute(reg, spark, sf_dir, events_pd):
    got = {
        r["event_type"]: (
            r["n_ref"], r["n_cur"], r["u2_ref"], r["u2_cur"], r["cles"]
        )
        for r in lookup("dq_mann_whitney").fn(spark, sf_dir).collect()
    }
    assert got == _mw_recompute(events_pd)


def test_mann_whitney_self_checking_identity(reg, spark, sf_dir):
    """Under midranks the identity U_ref + U_cur = n_ref*n_cur is EXACT
    (ties included) — the statistic audits itself; and CLES is a
    probability."""
    rows = lookup("dq_mann_whitney").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["u2_ref"] + r["u2_cur"] == 2 * r["n_ref"] * r["n_cur"]
        assert 0.0 <= r["cles"] <= 1.0


# ---------------------------------------------------------------------------
# er_fellegi_sunter (operators/dedup.py)
# ---------------------------------------------------------------------------


def _lev(a, b):
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fs_recompute(sf_dir):
    import hashlib

    from xml_to_parquet_spark.operators.dedup import (
        FS_T_MATCH,
        FS_T_POSSIBLE,
        FS_W_CITY_DIFF,
        FS_W_CITY_EXACT,
        FS_W_NAME_CLOSE,
        FS_W_NAME_DIFF,
        FS_W_NAME_EXACT,
        FS_W_PHONE_DIFF,
        FS_W_PHONE_EXACT,
    )

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    clean = {}
    for r in cust.itertuples():
        k = int(r.c_custkey)
        clean[k] = (r.c_name, md5(f"ph{k}")[:10], int(r.c_nationkey))
    dirty = {}
    for k, (name, phone, city) in clean.items():
        if k % 4:
            continue
        if k % 12 == 0:
            dname, dphone, dcity = name, phone, (city + 7) % 25
        else:
            p = 9 + k % 8  # 0-based split point == SQL's substr(name,1,9+k%8)
            dname = name[:p] + md5(f"nm{k}")[0] + name[p + 1 :]
            dphone = phone[:9] + "z" if k % 20 == 0 else phone
            dcity = city
        dirty[k] = (dname, dphone, dcity)
    out = {}
    for rid, (dn, dp, dc) in dirty.items():
        for ck, (cn, cp, cc) in clean.items():
            if dp[:2] != cp[:2]:
                continue
            a_name = 2 if dn == cn else (1 if _lev(dn, cn) <= 2 else 0)
            a_phone = 1 if dp == cp else 0
            a_city = 1 if dc == cc else 0
            score = (
                {2: FS_W_NAME_EXACT, 1: FS_W_NAME_CLOSE, 0: FS_W_NAME_DIFF}[a_name]
                + (FS_W_PHONE_EXACT if a_phone else FS_W_PHONE_DIFF)
                + (FS_W_CITY_EXACT if a_city else FS_W_CITY_DIFF)
            )
            dec = (
                "match"
                if score >= FS_T_MATCH
                else "possible"
                if score >= FS_T_POSSIBLE
                else "non_match"
            )
            out[(rid, ck)] = (a_name, a_phone, a_city, score, dec)
    return out


def test_fellegi_sunter_matches_exact_python_recompute(reg, spark, sf_dir):
    got = {
        (r["rid"], r["cand_custkey"]): (
            r["a_name"], r["a_phone"], r["a_city"], r["score"], r["decision"]
        )
        for r in lookup("er_fellegi_sunter").fn(spark, sf_dir).collect()
    }
    assert got == _fs_recompute(sf_dir)


def test_fellegi_sunter_plant_classes_by_construction(reg, spark, sf_dir):
    """The decision is evidence-weighted, not single-field: city-moved
    and name-edited plants still land 'match'; the phone-moved plant
    lands in the 'possible' review band; random same-block pairs are
    'non_match' — every class populated, every plant classified
    per its custkey arithmetic."""
    rows = lookup("er_fellegi_sunter").fn(spark, sf_dir).collect()
    self_pairs = {r["rid"]: r for r in rows if r["rid"] == r["cand_custkey"]}
    n_cust = len(pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]))
    for k in range(0, n_cust, 4):
        r = self_pairs[k]
        if k % 20 == 0 and k % 12 != 0:
            assert r["decision"] == "possible", k
        else:
            assert r["decision"] == "match", k
    classes = {r["decision"] for r in rows}
    assert classes == {"match", "possible", "non_match"}
