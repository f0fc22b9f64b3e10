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

from xml_to_parquet_spark.registry import STAGED, load_all, lookup


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
    "lake_vacuum_plan",
    "dq_freshness_lag",
    "sim_recall_at_k",
]


def test_r19_ops_promoted_to_driver_registry(reg):
    # The full tier was promoted at the r16 rotation (R16_PLAN.md) —
    # the staged tier is EMPTY from r16 on.
    for name in R19_OPS:
        assert name not in STAGED and name in reg


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
        for rr in lookup("text_textrank").fn(spark, sf_dir).collect()
    }
    assert got == {i + 1: (w, v) for i, (w, v) in enumerate(ranked)}


def test_textrank_mass_and_hubs(spark, sf_dir, reg):
    """Rank mass is ~conserved (floor losses only shrink it) and the
    top word must be a genuine hub: its degree is above the graph's
    mean degree."""
    nbrs = _word_graph(sf_dir)
    rows = lookup("text_textrank").fn(spark, sf_dir).collect()
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
    [row] = lookup("dq_runs_test").fn(spark, sf_dir).collect()
    assert row["n_up"] == n_up
    assert row["n_down"] == n_down
    assert row["n_runs"] == runs
    assert row["expected_runs"] == pytest.approx(e, abs=2e-6)
    assert row["z_score"] == pytest.approx(z, abs=2e-6)


def test_runs_test_bounds(spark, sf_dir, reg):
    """Runs count is bounded by 1..n_moves and the expectation sits
    inside the same interval."""
    [row] = lookup("dq_runs_test").fn(spark, sf_dir).collect()
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
        for r in lookup("agg_pythagorean_means").fn(spark, sf_dir).collect()
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
    for r in lookup("agg_pythagorean_means").fn(spark, sf_dir).collect():
        assert r["arith_mean"] > r["geo_mean"] > r["harmonic_mean"], r


# ---------------------------------------------------------------------------
# plan pins
# ---------------------------------------------------------------------------


def test_textrank_plan_checkpointed_rounds(spark, sf_dir, reg):
    """Iterations run over the checkpointed word graph: no FileScan in
    the served plan, and the top-k is a window over the vocab grid."""
    from xml_to_parquet_spark.plans.inspect import physical_plan

    df = lookup("text_textrank").fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(df)


def test_runs_test_plan_grid_only(spark, sf_dir, reg):
    """Orders is scanned once at the shared day-grid checkpoint; the
    direction/run lags and the 1-row aggregate are grid work."""
    from xml_to_parquet_spark.plans.inspect import physical_plan

    df = lookup("dq_runs_test").fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(df)


def test_pythagorean_means_plan_one_agg_pruned(spark, sf_dir, reg):
    """One combinable groupBy over a two-column pruned scan — no joins,
    no windows; the three means are self-mergeable aggregates."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("agg_pythagorean_means").fn(spark, sf_dir)
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
        for r in lookup("mm_video_shot_detect").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_shot_detect_finds_exactly_planted_boundaries(spark, sf_dir, reg):
    """The detector's contract by construction: a transition is a cut
    IFF it crosses a planted scene boundary (f % scene_len == 0)."""
    rows = lookup("mm_video_shot_detect").fn(spark, sf_dir).collect()
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

    df = lookup("mm_video_shot_detect").fn(spark, sf_dir)
    assert shuffle_count(df) == 0
    assert physical_plan(df).count("Exchange RoundRobinPartitioning") == 1


# ---------------------------------------------------------------------------
# lake_vacuum_plan (operators/sources_io.py)
# ---------------------------------------------------------------------------


def test_vacuum_plan_matches_python(spark, sf_dir, reg):
    """Third formulation: the residue rules in plain Python — expired =
    rows of the 3 affected files, live_new = carried updates + inserts."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    keys = [int(k) for k in orders["o_orderkey"]]
    affected = {1, 5, 9}
    expired = sum(1 for k in keys if k % 24 in affected)
    carried = len(keys) - expired
    live_new = sum(1 for k in keys if k % 24 in (1, 5)) + sum(
        1 for k in keys if k % 11 == 5
    )
    got = {
        r["status"]: (r["n_files"], r["n_rows"])
        for r in lookup("lake_vacuum_plan").fn(spark, sf_dir).collect()
    }
    assert got == {
        "expired": (3, expired),
        "live_carried": (21, carried),
        "live_new": (2, live_new),
    }


def test_vacuum_plan_reclaims_and_conserves(spark, sf_dir, reg):
    """GC bookkeeping identities: expired + carried covers the full v1
    table, and the delete really shrinks the rewritten data (live_new <
    expired + inserts iff the delete file held rows)."""
    rows = {
        r["status"]: r
        for r in lookup("lake_vacuum_plan").fn(spark, sf_dir).collect()
    }
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    total = len(orders)
    assert rows["expired"]["n_rows"] + rows["live_carried"]["n_rows"] == total
    assert rows["expired"]["n_rows"] > 0
    n_ins = sum(1 for k in orders["o_orderkey"] if int(k) % 11 == 5)
    assert rows["live_new"]["n_rows"] < rows["expired"]["n_rows"] + n_ins


def test_vacuum_plan_is_manifest_and_pruned_reads(spark, sf_dir, reg):
    """The GC counts read the files as written: the expired/carried
    branches carry partition filters on file_id (pruned scans of the
    fragmented layout), and the plan has no data-sized join."""
    from xml_to_parquet_spark.plans.inspect import node_counts

    df = lookup("lake_vacuum_plan").fn(spark, sf_dir)
    n = node_counts(df)
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n


# ---------------------------------------------------------------------------
# dq_freshness_lag (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_freshness_lag_matches_python(spark, sf_dir, reg):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    last = {}
    cnt = Counter()
    for t, ts in zip(ev["event_type"], ev["ts"]):
        cnt[t] += 1
        if t not in last or ts > last[t]:
            last[t] = ts
    glob = max(last.values())
    got = {
        r["event_type"]: (r["n_events"], r["last_ts"], r["lag_us"], r["is_stale"])
        for r in lookup("dq_freshness_lag").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(last)
    for t in last:
        lag_us = (glob - last[t]).value // 1000  # pandas ns -> us
        assert got[t] == (
            cnt[t],
            last[t].to_pydatetime(),
            lag_us,
            1 if lag_us > 30 * 60 * 1_000_000 else 0,
        ), t


def test_freshness_lag_semantics(spark, sf_dir, reg):
    """Exactly one stream defines the global clock (lag 0); lags are
    non-negative; staleness is the documented 30-minute fence."""
    rows = lookup("dq_freshness_lag").fn(spark, sf_dir).collect()
    assert sum(1 for r in rows if r["lag_us"] == 0) >= 1
    for r in rows:
        assert r["lag_us"] >= 0
        assert r["is_stale"] == (1 if r["lag_us"] > 1_800_000_000 else 0)


# ---------------------------------------------------------------------------
# sim_recall_at_k (operators/similarity.py)
# ---------------------------------------------------------------------------


def _recall_python_mirror(sf_dir):
    """Third formulation of sim_recall_at_k v2 (clustered derived corpus,
    budgeted two-stage funnel): rebuild the integer corpus from vec_id,
    run brute-force and SRP-bucket -> prefix-L1-cap -> cosine-rerank in
    plain Python, return {query: (n_hits, recall)} and the mean."""
    from xml_to_parquet_spark.operators.similarity import (
        RECALL_CAP,
        RECALL_CLUSTERS,
        RECALL_DIM,
        RECALL_K,
        RECALL_NQ,
        RECALL_PREFIX,
        _recall_hyperplanes,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = sorted(int(v) for v in emb["vec_id"])

    def dims(v):
        c = v % RECALL_CLUSTERS
        return [
            50 * ((c * (37 + 11 * i) + 23 * i) % 13 - 6)
            + ((v * (97 + 7 * i) + 31 * i) % 9 - 4)
            for i in range(1, RECALL_DIM + 1)
        ]

    H = _recall_hyperplanes()
    X = {v: dims(v) for v in ids}
    bkt = {
        v: sum(
            (1 << j)
            if sum(c * x for c, x in zip(H[j], X[v])) > 0
            else 0
            for j in range(len(H))
        )
        for v in ids
    }
    n2 = {v: sum(x * x for x in X[v]) for v in ids}

    def cos(a, b):
        d = sum(x * y for x, y in zip(X[a], X[b]))
        return _round6(d / (math.sqrt(n2[a]) * math.sqrt(n2[b])))

    expected, total = {}, 0
    queries = [v for v in ids if v < RECALL_NQ]
    for q in queries:
        truth = {
            v
            for _, v in sorted(
                ((-cos(q, v), v) for v in ids if v != q)
            )[:RECALL_K]
        }
        in_bucket = [v for v in ids if v != q and bkt[v] == bkt[q]]
        coarse = sorted(
            in_bucket,
            key=lambda v: (
                sum(
                    abs(X[v][i] - X[q][i]) for i in range(RECALL_PREFIX)
                ),
                v,
            ),
        )[:RECALL_CAP]
        got = {
            v for _, v in sorted(((-cos(q, v), v) for v in coarse))[:RECALL_K]
        }
        h = len(truth & got)
        total += h
        expected[q] = (h, _round6(h / float(RECALL_K)))
    mean = _round6(total / (len(queries) * float(RECALL_K)))
    return expected, mean


def test_recall_at_k_matches_python(spark, sf_dir, reg):
    from xml_to_parquet_spark.registry import lookup

    expected, mean = _recall_python_mirror(sf_dir)
    got = {
        r["query_id"]: (r["n_hits"], r["recall"], r["mean_recall"])
        for r in lookup("sim_recall_at_k").fn(spark, sf_dir).collect()
    }
    assert got == {q: (h, rc, mean) for q, (h, rc) in expected.items()}


def test_recall_at_k_meaningful_on_clustered_corpus(spark, sf_dir, reg):
    """VERDICT r10 #5: on the derived clustered corpus the instrument
    must read a MEANINGFUL recall — lower-bounded at 0.75 (the budget
    funnel genuinely finds most true neighbors), strictly positive
    everywhere, and sub-1 at the 500-vector SFs where a 12-candidate
    budget cannot hold all 10 true neighbors of a ~62-member cluster
    (at sf0.1's 2000 vectors the denser clusters make the coarse prefix
    a perfect proxy and the honest reading is 1.0). Every row carries
    the identical window mean = Σhits/(16·10) exactly."""
    from xml_to_parquet_spark.registry import lookup

    rows = lookup("sim_recall_at_k").fn(spark, sf_dir).collect()
    assert len(rows) == 16
    mean = rows[0]["mean_recall"]
    assert mean >= 0.75, mean  # the VERDICT-asked recall lower bound
    assert all(r["recall"] > 0 for r in rows)
    assert len({r["mean_recall"] for r in rows}) == 1
    assert all(0 <= r["n_hits"] <= 10 for r in rows)
    assert mean == _round6(sum(r["n_hits"] for r in rows) / 160.0)
    n_corpus = len(pd.read_parquet(f"{sf_dir}/embeddings.parquet"))
    if n_corpus <= 500:
        assert mean < 1.0, "budget truncation must show at 500 vectors"


def test_recall_at_k_plan_is_budget_bounded(spark, sf_dir, reg):
    """The corpus side reads ONLY vec_id (derived corpus — column-pruned
    scan) and both query sides broadcast: no corpus-sized shuffle
    anywhere in the eval."""
    from xml_to_parquet_spark.plans.inspect import physical_plan
    from xml_to_parquet_spark.registry import lookup

    plan = physical_plan(lookup("sim_recall_at_k").fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    import re as _re

    scans = _re.findall(r"ReadSchema: struct<[^>]*>", plan)
    assert scans, plan
    for s in scans:
        assert "vec_id" in s and "embedding" not in s, s
