"""Semantic tests for the r19-tier staged batch (round-10 extension
sessions; see R11_PLAN.md). Same contract as _r17/_r18: hidden from
queries() until promoted; every op gets a FULL independent Python
recompute beside the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from xml_to_parquet_spark.registry import STAGED, load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


R19_OPS = [
    "text_textrank",
    "dq_runs_test",
    "agg_pythagorean_means",
    "mm_video_shot_detect",
]


def test_r19_staged_ops_hidden_from_driver_registry(reg):
    for name in R19_OPS:
        assert name in STAGED and name not in reg


# ---------------------------------------------------------------------------
# text_textrank (operators/text.py)
# ---------------------------------------------------------------------------


def _word_graph(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    pairs = set()
    for text in docs["text"]:
        toks = re.split(r"\s+", text.lower())
        for a, b in zip(toks, toks[1:]):
            if a != b:
                pairs.add((a, b))
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    return nbrs


def test_textrank_matches_python_integer_pagerank(spark, sf_dir, reg):
    """Third formulation: the exact scaled-integer damped PageRank in
    plain Python dicts — rank_scaled must match BIT-FOR-BIT (no floats
    anywhere in the op)."""
    nbrs = _word_graph(sf_dir)
    n = len(nbrs)
    base = 10**15 // n
    teleport = (15 * base) // 100
    r = {w: base for w in nbrs}
    for _ in range(3):
        contrib = defaultdict(int)
        for w, ns in nbrs.items():
            share = r[w] // len(ns)
            for x in ns:
                contrib[x] += share
        r = {w: teleport + (85 * c) // 100 for w, c in contrib.items()}
    ranked = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = {
        rr["rn"]: (rr["word"], rr["rank_scaled"])
        for rr in STAGED["text_textrank"].fn(spark, sf_dir).collect()
    }
    assert got == {i + 1: (w, v) for i, (w, v) in enumerate(ranked)}


def test_textrank_mass_and_hubs(spark, sf_dir, reg):
    """Rank mass is ~conserved (floor losses only shrink it) and the
    top word must be a genuine hub: its degree is above the graph's
    mean degree."""
    nbrs = _word_graph(sf_dir)
    rows = STAGED["text_textrank"].fn(spark, sf_dir).collect()
    top = max(rows, key=lambda r: r["rank_scaled"])
    mean_deg = sum(len(v) for v in nbrs.values()) / len(nbrs)
    assert len(nbrs[top["word"]]) > mean_deg
    assert all(r["rank_scaled"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# dq_runs_test (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _daily(sf_dir):
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = defaultdict(int)
    for d, p in zip(orders["o_orderdate"], orders["o_totalprice"]):
        daily[d] += int(Decimal(repr(float(p))).quantize(0, ROUND_HALF_UP))
    return [rev for _, rev in sorted(daily.items())]


def test_runs_test_matches_python(spark, sf_dir, reg):
    series = _daily(sf_dir)
    signs = [
        1 if b > a else -1 for a, b in zip(series, series[1:]) if b != a
    ]
    n_up = sum(1 for s in signs if s == 1)
    n_down = len(signs) - n_up
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n_up + n_down
    e = 1.0 + 2.0 * n_up * n_down / n
    var = (
        2.0 * n_up * n_down * (2.0 * n_up * n_down - n) / (n * n * (n - 1.0))
    )
    z = (runs - e) / math.sqrt(var)
    [row] = STAGED["dq_runs_test"].fn(spark, sf_dir).collect()
    assert row["n_up"] == n_up
    assert row["n_down"] == n_down
    assert row["n_runs"] == runs
    assert row["expected_runs"] == pytest.approx(e, abs=2e-6)
    assert row["z_score"] == pytest.approx(z, abs=2e-6)


def test_runs_test_bounds(spark, sf_dir, reg):
    """Runs count is bounded by 1..n_moves and the expectation sits
    inside the same interval."""
    [row] = STAGED["dq_runs_test"].fn(spark, sf_dir).collect()
    n = row["n_up"] + row["n_down"]
    assert 1 <= row["n_runs"] <= n
    assert 1.0 <= row["expected_runs"] <= float(n)


# ---------------------------------------------------------------------------
# agg_pythagorean_means (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_pythagorean_means_match_python(spark, sf_dir, reg):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    groups = defaultdict(list)
    for f, p in zip(li["l_returnflag"], li["l_extendedprice"]):
        if float(p) > 0:
            cents = int(Decimal(repr(float(p) * 100)).quantize(0, ROUND_HALF_UP))
            groups[f].append(cents)
    rows = {
        r["flag"]: r
        for r in STAGED["agg_pythagorean_means"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(groups)
    for f, cents in groups.items():
        n = len(cents)
        am = sum(cents) / (100.0 * n)
        gm = math.exp(sum(math.log(c / 100.0) for c in cents) / n)
        hm = n / sum(1.0 / (c / 100.0) for c in cents)
        r = rows[f]
        assert r["n"] == n
        assert r["arith_mean"] == pytest.approx(am, abs=2e-4)
        assert r["geo_mean"] == pytest.approx(gm, abs=2e-2)
        assert r["harmonic_mean"] == pytest.approx(hm, abs=2e-2)


def test_pythagorean_means_inequality(spark, sf_dir, reg):
    """AM ≥ GM ≥ HM per group — the self-check that catches a swapped
    formula instantly (equality only for constant groups, which these
    are not)."""
    for r in STAGED["agg_pythagorean_means"].fn(spark, sf_dir).collect():
        assert r["arith_mean"] > r["geo_mean"] > r["harmonic_mean"], r


# ---------------------------------------------------------------------------
# plan pins
# ---------------------------------------------------------------------------


def test_textrank_plan_checkpointed_rounds(spark, sf_dir, reg):
    """Iterations run over the checkpointed word graph: no FileScan in
    the served plan, and the top-k is a window over the vocab grid."""
    from xml_to_parquet_spark.plans.inspect import physical_plan

    df = STAGED["text_textrank"].fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(df)


def test_runs_test_plan_grid_only(spark, sf_dir, reg):
    """Orders is scanned once at the shared day-grid checkpoint; the
    direction/run lags and the 1-row aggregate are grid work."""
    from xml_to_parquet_spark.plans.inspect import physical_plan

    df = STAGED["dq_runs_test"].fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(df)


def test_pythagorean_means_plan_one_agg_pruned(spark, sf_dir, reg):
    """One combinable groupBy over a two-column pruned scan — no joins,
    no windows; the three means are self-mergeable aggregates."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = STAGED["agg_pythagorean_means"].fn(spark, sf_dir)
    rs = read_schemas(df)
    assert len(rs) == 1 and "l_returnflag" in rs[0], rs
    assert "l_orderkey" not in rs[0], rs
    n = node_counts(df)
    assert n.get("Window", 0) == 0, n
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n


# ---------------------------------------------------------------------------
# mm_video_shot_detect (operators/multimodal.py)
# ---------------------------------------------------------------------------


def test_shot_detect_matches_formula_python(spark, sf_dir, reg):
    """Third formulation: SADs from the closed-form pixel generator —
    never touching the codec — so the Spark path proves container
    parse + LZW rebuild + pairing all at once."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    expected = {}
    for d in (int(x) for x in docs["doc_id"]):
        n_frames = 6 + d % 6
        scene_len = 3 + d % 3
        w, h = 8 + (d * 3) % 16, 8 + (d * 5) % 16

        def px(f, i):
            return (
                3 * d + 97 * (f // scene_len) + f + 7 * (i % w) + 11 * (i // w)
            ) % 256

        for f in range(1, n_frames):
            sad = sum(abs(px(f, i) - px(f - 1, i)) for i in range(w * h))
            expected[(d, f)] = (sad, 1 if sad > 16 * w * h else 0)
    got = {
        (r["doc_id"], r["frame_idx"]): (r["sad"], r["is_cut"])
        for r in STAGED["mm_video_shot_detect"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_shot_detect_finds_exactly_planted_boundaries(spark, sf_dir, reg):
    """The detector's contract by construction: a transition is a cut
    IFF it crosses a planted scene boundary (f % scene_len == 0)."""
    rows = STAGED["mm_video_shot_detect"].fn(spark, sf_dir).collect()
    assert any(r["is_cut"] == 1 for r in rows)
    assert any(r["is_cut"] == 0 for r in rows)
    for r in rows:
        scene_len = 3 + r["doc_id"] % 3
        planted = 1 if r["frame_idx"] % scene_len == 0 else 0
        assert r["is_cut"] == planted, r


def test_shot_detect_plan_codec_chassis(spark, sf_dir, reg):
    """Same pinned chassis as the other codec ops: exactly one
    round-robin fan-out Exchange, zero data shuffles."""
    from xml_to_parquet_spark.plans.inspect import physical_plan, shuffle_count

    df = STAGED["mm_video_shot_detect"].fn(spark, sf_dir)
    assert shuffle_count(df) == 0
    assert physical_plan(df).count("Exchange RoundRobinPartitioning") == 1
