"""Semantic tests for operators BUILT in the second round-10 extension
session and staged for the r16 window (r11–r15 queues are full — see
R11_PLAN.md). Same staging contract as _r13/_r14/_r15: invisible to
queries() until promoted, and each op gets a FULL independent Python
recompute — a third formulation checked against both the Spark
implementation and the DuckDB oracle.
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


def _round_half_up(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


def _round6(x: float) -> float:
    return _round_half_up(x, 6)


R16_OPS = [
    "dq_autocorrelation",
    "dq_outlier_mad",
    "graph_degree_assortativity",
    "text_collocations_pmi",
    "text_zipf_rank",
    "lake_compaction_plan",
    "sim_silhouette",
    "mm_image_palette",
]


def test_r16_staged_ops_hidden_from_driver_registry(reg):
    # The full tier is promoted: first 4 alphabetical at r14 (R14_PLAN),
    # the 4 leftovers at r15 (R15_PLAN) — none remain staged.
    for name in R16_OPS:
        assert name not in STAGED and name in reg


# ---------------------------------------------------------------------------
# dq_autocorrelation (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _daily_revenue(sf_dir):
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = defaultdict(int)
    for d, p in zip(orders["o_orderdate"], orders["o_totalprice"]):
        # engine-side F.round(x) is HALF_UP on the double's shortest repr
        daily[d] += int(Decimal(repr(float(p))).quantize(0, ROUND_HALF_UP))
    return [rev for _, rev in sorted(daily.items())]


def test_autocorrelation_matches_python(spark, sf_dir, reg):
    """Third formulation: Python ints for every sum, then the SAME
    IEEE double tail (Python floats are IEEE doubles — the expression
    tree is identical to both engines')."""
    series = _daily_revenue(sf_dir)
    expected = {}
    for lag in range(1, 8):
        xs = series[: len(series) - lag]
        ys = series[lag:]
        n = len(xs)
        if n == 0:
            continue
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        r = (float(n) * float(sxy) - float(sx) * float(sy)) / (
            math.sqrt(float(n) * float(sxx) - float(sx) * float(sx))
            * math.sqrt(float(n) * float(syy) - float(sy) * float(sy))
        )
        expected[lag] = (n, sx, sy, sxy, _round6(r))
    got = {
        r["lag"]: (r["n_pairs"], r["s_x"], r["s_y"], r["s_xy"], r["acf"])
        for r in lookup("dq_autocorrelation").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_autocorrelation_bounds_and_lags(spark, sf_dir, reg):
    rows = lookup("dq_autocorrelation").fn(spark, sf_dir).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0, r
    # consecutive lags shrink the pair count by exactly one day
    by_lag = {r["lag"]: r["n_pairs"] for r in rows}
    for k in range(1, 7):
        assert by_lag[k] - by_lag[k + 1] == 1


# ---------------------------------------------------------------------------
# dq_outlier_mad (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _lower_weighted_median(weights: dict[int, int]) -> int:
    tot = sum(weights.values())
    cum = 0
    for v in sorted(weights):
        cum += weights[v]
        if 2 * cum >= tot:
            return v
    raise AssertionError("empty weights")


def test_outlier_mad_matches_python(spark, sf_dir, reg):
    """Third formulation: pure-integer medians/MAD/fence from Counter."""
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    cents = defaultdict(Counter)
    for t, v in zip(ev["event_type"], ev["value"]):
        if pd.isna(v):
            continue
        c = int(Decimal(repr(float(v) * 100)).quantize(0, ROUND_HALF_UP))
        cents[t][c] += 1
    expected = {}
    for t, ctr in cents.items():
        n = sum(ctr.values())
        med = _lower_weighted_median(ctr)
        adev = Counter()
        for v, w in ctr.items():
            adev[abs(v - med)] += w
        mad = _lower_weighted_median(adev)
        n_out = sum(w for v, w in ctr.items() if abs(v - med) > 3 * mad)
        expected[t] = (n, med, mad, n_out, _round6(float(n_out) / float(n)))
    got = {
        r["event_type"]: (
            r["n_values"],
            r["median_cents"],
            r["mad_cents"],
            r["n_outliers"],
            r["outlier_rate"],
        )
        for r in lookup("dq_outlier_mad").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_outlier_mad_robustness_semantics(spark, sf_dir, reg):
    """The 3-MAD fence must be tighter than nothing and looser than
    everything: 0 ≤ n_outliers < n_values, and MAD ≤ the full range."""
    for r in lookup("dq_outlier_mad").fn(spark, sf_dir).collect():
        assert 0 <= r["n_outliers"] < r["n_values"], r
        assert r["mad_cents"] >= 0, r
        assert r["outlier_rate"] < 0.5, r  # 50% breakdown point


# ---------------------------------------------------------------------------
# graph_degree_assortativity (operators/graphs.py)
# ---------------------------------------------------------------------------


def _cooc_graph(sf_dir):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[int(o)].add(int(p))
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    return edges, deg


def test_assortativity_matches_python(spark, sf_dir, reg):
    edges, deg = _cooc_graph(sf_dir)
    pairs = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    r = (float(n) * float(sxy) - float(sx) * float(sx)) / (
        float(n) * float(sxx) - float(sx) * float(sx)
    )
    [row] = lookup("graph_degree_assortativity").fn(spark, sf_dir).collect()
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert row["n_pairs"] == n
    assert row["s_x"] == sx
    assert row["s_xy"] == sxy
    assert row["s_xx"] == sxx
    assert row["assortativity"] == _round6(r)


def test_assortativity_is_a_correlation(spark, sf_dir, reg):
    [row] = lookup("graph_degree_assortativity").fn(spark, sf_dir).collect()
    assert -1.0 <= row["assortativity"] <= 1.0
    # symmetrized pairs: exactly two per undirected edge
    assert row["n_pairs"] == 2 * row["n_edges"]


# ---------------------------------------------------------------------------
# text_collocations_pmi (operators/text.py)
# ---------------------------------------------------------------------------


def _bigram_grid(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    c_xy = Counter()
    for text in docs["text"]:
        toks = re.split(r"\s+", text.lower())
        for a, b in zip(toks, toks[1:]):
            c_xy[(a, b)] += 1
    c1, c2 = Counter(), Counter()
    for (a, b), c in c_xy.items():
        c1[a] += c
        c2[b] += c
    return c_xy, c1, c2, sum(c_xy.values())


def test_collocations_match_python(spark, sf_dir, reg):
    """Third formulation: Counter margins + the exact lift ratio; the
    ranking reproduces the engine's (lift6 desc, w1, w2) total order."""
    c_xy, c1, c2, n_total = _bigram_grid(sf_dir)
    cands = []
    for (a, b), c in c_xy.items():
        if c < 5:
            continue
        lift = _round6(
            (float(n_total) * float(c)) / (float(c1[a]) * float(c2[b]))
        )
        cands.append((-lift, a, b, c, c1[a], c2[b]))
    cands.sort()
    expected = {
        (a, b): (c, cf, cs, -nl, rn + 1)
        for rn, (nl, a, b, c, cf, cs) in enumerate(cands[:50])
    }
    got = {
        (r["w1"], r["w2"]): (
            r["c_xy"],
            r["c_first"],
            r["c_second"],
            r["lift"],
            r["rn"],
        )
        for r in lookup("text_collocations_pmi").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_collocations_lift_semantics(spark, sf_dir, reg):
    """Every reported pair beats independence (lift > 1 for a planted
    collocation-heavy corpus head) and support ≥ the floor; ranks are
    dense 1..k."""
    rows = lookup("text_collocations_pmi").fn(spark, sf_dir).collect()
    assert sorted(r["rn"] for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["c_xy"] >= 5
        assert r["c_first"] >= r["c_xy"] and r["c_second"] >= r["c_xy"]
    assert rows, "corpus must produce collocation candidates"


# ---------------------------------------------------------------------------
# text_zipf_rank (operators/text.py)
# ---------------------------------------------------------------------------


def test_zipf_rank_matches_python(spark, sf_dir, reg):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    freq = Counter()
    for text in docs["text"]:
        freq.update(re.split(r"\s+", text.lower()))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(float(i + 1)) for i in range(len(ranked))]
    ys = [math.log(float(c)) for _, c in ranked]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    rows = lookup("text_zipf_rank").fn(spark, sf_dir).collect()
    got_head = {r["rank"]: (r["term"], r["freq"]) for r in rows}
    assert got_head == {
        i + 1: (t, c) for i, (t, c) in enumerate(ranked[:30])
    }
    for r in rows:
        assert r["vocab_size"] == len(ranked)
        # logs cross libm boundaries: the recompute's float tail may
        # differ in the final ulp, so the fit is tolerance-checked
        assert r["zipf_slope"] == pytest.approx(slope, abs=2e-4)
        assert r["zipf_intercept"] == pytest.approx(intercept, abs=2e-4)
        assert r["zipf_slope"] < 0  # frequency decreases with rank


# ---------------------------------------------------------------------------
# lake_compaction_plan (operators/sources_io.py)
# ---------------------------------------------------------------------------


def test_compaction_plan_matches_python(spark, sf_dir, reg):
    """Third formulation: the mod-24 manifest and the offset-binning rule
    in plain Python ints."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    man = defaultdict(list)
    for k in orders["o_orderkey"]:
        man[int(k) % 24].append(int(k))
    files = sorted(
        ((fid, len(ks), min(ks), max(ks)) for fid, ks in man.items()),
        key=lambda f: (-f[1], f[0]),
    )
    tot = sum(f[1] for f in files)
    target = (tot + 5) // 6
    expected = {}
    offset = 0
    for fid, n, lo, hi in files:
        expected[fid] = (n, lo, hi, offset // target)
        offset += n
    gsize = Counter()
    grows = Counter()
    for fid, (n, lo, hi, g) in expected.items():
        gsize[g] += 1
        grows[g] += n
    got = {
        r["file_id"]: (r["n_rows"], r["min_key"], r["max_key"], r["group_id"])
        for r in lookup("lake_compaction_plan").fn(spark, sf_dir).collect()
    }
    assert got == expected
    for r in lookup("lake_compaction_plan").fn(spark, sf_dir).collect():
        assert r["group_files"] == gsize[r["group_id"]]
        assert r["group_rows"] == grows[r["group_id"]]


def test_compaction_plan_bin_quality(spark, sf_dir, reg):
    """The offset rule's packing guarantee: every group except possibly
    the last holds ≥ target rows minus one file's worth, and no group
    exceeds target + max_file (the overshoot bound in the docstring)."""
    rows = lookup("lake_compaction_plan").fn(spark, sf_dir).collect()
    tot = sum(r["n_rows"] for r in rows)
    target = (tot + 5) // 6
    max_file = max(r["n_rows"] for r in rows)
    by_group = defaultdict(int)
    for r in rows:
        by_group[r["group_id"]] += r["n_rows"]
    for g, n in by_group.items():
        assert n <= target + max_file, (g, n, target, max_file)
    assert len(by_group) <= 7  # ceil + overshoot never fragments further


# ---------------------------------------------------------------------------
# sim_silhouette (operators/similarity.py)
# ---------------------------------------------------------------------------


def test_silhouette_matches_python(spark, sf_dir, reg):
    """Third formulation: sequential left-fold distances (the engines'
    fold order), 6dp pick, identical s tail, cluster means."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    cents = {cid: vecs[cid] for cid in range(8) if cid in vecs}
    agg = defaultdict(lambda: [0, 0.0, 0.0, 0.0])  # n, s, a6, b6
    for vid, v in vecs.items():
        ds = []
        for cid, c in cents.items():
            acc = 0.0
            for a, b in zip(v, c):
                d = float(a) - float(b)
                acc += d * d
            ds.append((_round6(acc), cid))
        ds.sort()
        a6, assigned = ds[0]
        b6 = ds[1][0]
        s = _round6((b6 - a6) / max(a6, b6)) if max(a6, b6) > 0 else 0.0
        st = agg[assigned]
        st[0] += 1
        st[1] += s
        st[2] += a6
        st[3] += b6
    expected = {
        cid: (
            n,
            _round_half_up(sv / n, 4),
            _round_half_up(av / n, 3),
            _round_half_up(bv / n, 3),
        )
        for cid, (n, sv, av, bv) in agg.items()
    }
    got = {
        r["centroid_id"]: (
            r["n_assigned"],
            r["mean_silhouette"],
            r["mean_intra"],
            r["mean_nearest_other"],
        )
        for r in lookup("sim_silhouette").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for cid in got:
        gn, gs, ga, gb = got[cid]
        en, es, ea, eb = expected[cid]
        assert gn == en, cid
        # float sums cross partition orders: means agree to a half-ulp
        # of the rounding grain
        assert gs == pytest.approx(es, abs=2e-4), cid
        assert ga == pytest.approx(ea, abs=2e-3), cid
        assert gb == pytest.approx(eb, abs=2e-3), cid


def test_silhouette_invariants(spark, sf_dir, reg):
    """b ≥ a by construction so every mean silhouette is non-negative;
    populations cover the corpus; intra ≤ nearest-other per cluster."""
    rows = lookup("sim_silhouette").fn(spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    assert sum(r["n_assigned"] for r in rows) == len(emb)
    for r in rows:
        assert 0.0 <= r["mean_silhouette"] <= 1.0, r
        assert r["mean_intra"] <= r["mean_nearest_other"], r


# ---------------------------------------------------------------------------
# mm_image_palette (operators/multimodal.py)
# ---------------------------------------------------------------------------


def test_palette_matches_formula_python(spark, sf_dir, reg):
    """Third formulation: pixels from the closed-form generator (never
    touching the codec), numpy-free histogram + the same total order —
    any codec defect on the Spark path breaks this comparison."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    expected = {}
    for d in (int(x) for x in docs["doc_id"]):
        w, h = 8 + d % 16, 8 + (d * 7) % 16
        counts = Counter()
        for i in range(w * h):
            val = (d + 3 * (i % w) + 5 * (i // w)) % 256
            counts[val >> 3] += 1
        total = w * h
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        for rank, (b, c) in enumerate(top, 1):
            expected[(d, rank)] = (b, c, _round6(c / total))
    got = {
        (r["doc_id"], r["rank"]): (r["bucket"], r["n_pixels"], r["share"])
        for r in lookup("mm_image_palette").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_palette_shares_and_ranks(spark, sf_dir, reg):
    rows = lookup("mm_image_palette").fn(spark, sf_dir).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    assert set(by_doc) == {int(x) for x in docs["doc_id"]}
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        # counts non-increasing down the ranking; shares are sane
        for a, b in zip(rs, rs[1:]):
            assert a["n_pixels"] >= b["n_pixels"]
        assert sum(r["share"] for r in rs) <= 1.000001


# ---------------------------------------------------------------------------
# plan pins — the 100 TB shapes the docstrings promise
# ---------------------------------------------------------------------------


def test_autocorrelation_plan_single_pruned_scan(spark, sf_dir, reg):
    """orders is scanned exactly once — at the eager day-grid
    checkpoint — so the returned plan starts from the materialized grid
    (no FileScan at all: the lag self-join fans out the checkpoint, not
    the scan, per the chisq/cusum single-scan lesson)."""
    from xml_to_parquet_spark.plans.inspect import physical_plan

    df = lookup("dq_autocorrelation").fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "FileScan" not in plan, plan


def test_outlier_mad_plan_pruned_scan_broadcast_med(spark, sf_dir, reg):
    """events prunes to (event_type, value); the med/mad decorations
    join back via broadcast (never a shuffled join of the grid)."""
    from xml_to_parquet_spark.plans.inspect import (
        broadcast_join_count,
        node_counts,
        read_schemas,
    )

    df = lookup("dq_outlier_mad").fn(spark, sf_dir)
    for s in read_schemas(df):
        assert s == "struct<event_type:string,value:double>", s
    assert broadcast_join_count(df) >= 2
    assert node_counts(df).get("SortMergeJoin", 0) == 0


def test_assortativity_plan_no_window_no_smj(spark, sf_dir, reg):
    """Moment sums are combinable aggregates — no Window over the edge
    list; degree joins stay hash joins."""
    from xml_to_parquet_spark.plans.inspect import node_counts

    df = lookup("graph_degree_assortativity").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("Window", 0) == 0, n


def test_collocations_and_zipf_single_pruned_text_scan(spark, sf_dir, reg):
    """Both corpus-grid ops scan documents once, pruned to text; margins
    and fit are window/aggregate work on the grid, not re-scans."""
    from xml_to_parquet_spark.plans.inspect import read_schemas

    df = lookup("text_collocations_pmi").fn(spark, sf_dir)
    rs = read_schemas(df)
    assert rs == ["struct<text:string>"], rs
    # zipf fans its vocab grid into head + fit branches, so the corpus
    # scan happens once at the eager grid checkpoint: the returned plan
    # must carry NO FileScan
    from xml_to_parquet_spark.plans.inspect import physical_plan

    zdf = lookup("text_zipf_rank").fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(zdf)


def test_compaction_plan_is_manifest_only(spark, sf_dir, reg):
    """The returned plan must start from the materialized MANIFEST
    (a checkpointed grid) — no parquet scan of the data files, no joins:
    planning never touches data."""
    from xml_to_parquet_spark.plans.inspect import node_counts, physical_plan

    df = lookup("lake_compaction_plan").fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "FileScan" not in plan and "parquet" not in plan.lower(), plan
    n = node_counts(df)
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n


def test_silhouette_plan_combinable_top2_no_window(spark, sf_dir, reg):
    """The top-2 pick must be the combinable collect-sort device: no
    WindowExec anywhere, centroids broadcast, partial aggregation
    present before the vec_id exchange."""
    from xml_to_parquet_spark.plans.inspect import node_counts, physical_plan

    df = lookup("sim_silhouette").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("Window", 0) == 0, n
    assert n.get("SortMergeJoin", 0) == 0, n
    assert "partial_collect_list" in physical_plan(df)


def test_palette_plan_codec_chassis(spark, sf_dir, reg):
    """The mm codec chassis invariant: exactly ONE RoundRobin fan-out
    exchange (doc_id-only), zero data shuffles after encode."""
    from xml_to_parquet_spark.plans.inspect import physical_plan, shuffle_count

    df = lookup("mm_image_palette").fn(spark, sf_dir)
    assert shuffle_count(df) == 0  # no hash/range/single-part exchanges
    assert physical_plan(df).count("Exchange RoundRobinPartitioning") == 1
