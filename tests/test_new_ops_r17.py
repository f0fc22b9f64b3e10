"""Semantic tests for the third r16/r17-tier batch of operators built in
the round-10 extension sessions (staged; see R11_PLAN.md). Same contract
as _r15/_r16: hidden from queries() until promoted; every op gets a FULL
independent Python recompute beside the Spark plan and DuckDB oracle.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal
from hashlib import md5

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


R17_OPS = [
    "sim_kmeans_update",
    "agg_covariance_matrix",
    "er_blocking_metrics",
    "lake_clustering_depth",
    "graph_harmonic_landmarks",
]


def test_r17_staged_ops_hidden_from_driver_registry(reg):
    # The full r17 tier was promoted at the r15 rotation (R15_PLAN.md).
    for name in R17_OPS:
        assert name not in STAGED and name in reg


# ---------------------------------------------------------------------------
# sim_kmeans_update (operators/similarity.py)
# ---------------------------------------------------------------------------


def test_kmeans_update_matches_python(spark, sf_dir, reg):
    """Third formulation: sequential-fold distances, (round6, cid)
    argmin, per-dimension means — the full Lloyd update in plain
    Python."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    cents = {cid: vecs[cid] for cid in range(8) if cid in vecs}
    members = defaultdict(list)
    for vid, v in vecs.items():
        ds = []
        for cid, c in cents.items():
            acc = 0.0
            for a, b in zip(v, c):
                d = float(a) - float(b)
                acc += d * d
            ds.append((_round6(acc), cid))
        members[min(ds)[1]].append(v)
    rows = lookup("sim_kmeans_update").fn(spark, sf_dir).collect()
    got = {(r["centroid_id"], r["dim"]): r for r in rows}
    assert len(got) == len(members) * 64
    for cid, vs in members.items():
        for dim in range(1, 65):
            r = got[(cid, dim)]
            assert r["n_assigned"] == len(vs)
            mean = sum(float(v[dim - 1]) for v in vs) / len(vs)
            assert r["mean_val"] == pytest.approx(mean, abs=2e-6), (cid, dim)


def test_kmeans_update_moves_centroids_toward_members(spark, sf_dir, reg):
    """The update must actually be the Lloyd step: every cluster's new
    centroid is a convex combination of member coordinates, so each
    mean lies within the member min/max envelope per dimension."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    lo = min(min(e) for e in emb["embedding"])
    hi = max(max(e) for e in emb["embedding"])
    rows = lookup("sim_kmeans_update").fn(spark, sf_dir).collect()
    assert sum(r["n_assigned"] for r in rows) == len(emb) * 64
    for r in rows:
        assert lo <= r["mean_val"] <= hi, r


# ---------------------------------------------------------------------------
# agg_covariance_matrix (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _scaled_lineitem(sf_dir):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def r0(x):
        return int(Decimal(repr(float(x))).quantize(0, ROUND_HALF_UP))

    return [
        (
            r0(q),
            r0(p),
            r0(float(d) * 100),
            r0(float(t) * 100),
        )
        for q, p, d, t in zip(
            li["l_quantity"], li["l_extendedprice"], li["l_discount"], li["l_tax"]
        )
    ]


def test_covariance_matches_python(spark, sf_dir, reg):
    rows = _scaled_lineitem(sf_dir)
    names = ["qty", "price", "disc_pct", "tax_pct"]
    n = len(rows)
    sums = [sum(r[i] for r in rows) for i in range(4)]
    expected = {}
    for i in range(4):
        for j in range(i, 4):
            sij = sum(r[i] * r[j] for r in rows)
            cov = (float(n) * float(sij) - float(sums[i]) * float(sums[j])) / (
                float(n) * float(n - 1)
            )
            expected[(names[i], names[j])] = (
                n,
                sums[i],
                sums[j],
                sij,
                _round6(cov),
            )
    got = {
        (r["col_x"], r["col_y"]): (r["n"], r["s_x"], r["s_y"], r["s_xy"], r["cov"])
        for r in lookup("agg_covariance_matrix").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_covariance_psd_diagonal(spark, sf_dir, reg):
    """Variances (the diagonal) are non-negative and each off-diagonal
    obeys Cauchy–Schwarz |cov(x,y)| ≤ sqrt(var x · var y)."""
    rows = lookup("agg_covariance_matrix").fn(spark, sf_dir).collect()
    cov = {(r["col_x"], r["col_y"]): r["cov"] for r in rows}
    var = {a: cov[(a, a)] for (a, b) in cov if a == b}
    for a in var:
        assert var[a] >= 0
    for (a, b), c in cov.items():
        if a != b:
            assert abs(c) <= math.sqrt(var[a] * var[b]) * (1 + 1e-9), (a, b)


# ---------------------------------------------------------------------------
# er_blocking_metrics (operators/dedup.py)
# ---------------------------------------------------------------------------


def _rosters(sf_dir):
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    clean = {}
    for k, nm, nk in zip(cust["c_custkey"], cust["c_name"], cust["c_nationkey"]):
        k = int(k)
        phone = md5(f"ph{k}".encode()).hexdigest()[:10]
        clean[k] = (str(nm), phone, int(nk))
    dirty = {}
    for k, (nm, ph, ct) in clean.items():
        if k % 4 != 0:
            continue
        if k % 12 == 0:
            dn, dp, dc = nm, ph, (ct + 7) % 25
        else:
            cut = 9 + k % 8
            dn = nm[:cut] + md5(f"nm{k}".encode()).hexdigest()[0] + nm[cut + 1 :]
            dp = ph[:9] + "z" if k % 20 == 0 else ph
            dc = ct
        dirty[k] = (dn, dp, dc)
    return clean, dirty


def test_blocking_metrics_match_python(spark, sf_dir, reg):
    clean, dirty = _rosters(sf_dir)
    n_clean, n_dirty = len(clean), len(dirty)
    schemes = {
        "phone_prefix2": lambda d, c: d[1][:2] == c[1][:2],
        "city": lambda d, c: d[2] == c[2],
        "name_exact": lambda d, c: d[0] == c[0],
    }
    expected = {}
    for s, pred in schemes.items():
        n_cand = sum(
            1 for d in dirty.values() for c in clean.values() if pred(d, c)
        )
        found = sum(1 for k, d in dirty.items() if pred(d, clean[k]))
        expected[s] = (
            n_dirty,
            n_cand,
            _round6(1 - float(n_cand) / (float(n_dirty) * float(n_clean))),
            found,
            _round6(float(found) / float(n_dirty)),
        )
    got = {
        r["scheme"]: (
            r["n_true_pairs"],
            r["n_candidates"],
            r["reduction_ratio"],
            r["true_found"],
            r["pairs_completeness"],
        )
        for r in lookup("er_blocking_metrics").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_blocking_metrics_designed_contrast(spark, sf_dir, reg):
    """The three rules must land where the corruption model puts them:
    the shipped phone prefix is lossless (PC = 1), city loses exactly
    the city-moved plants, exact name keeps only the uncorrupted
    plants — and every rule kills most of the quadratic."""
    rows = {
        r["scheme"]: r
        for r in lookup("er_blocking_metrics").fn(spark, sf_dir).collect()
    }
    assert rows["phone_prefix2"]["pairs_completeness"] == 1.0
    assert rows["city"]["pairs_completeness"] < 1.0
    assert (
        rows["name_exact"]["pairs_completeness"]
        < rows["city"]["pairs_completeness"]
    )
    for r in rows.values():
        assert r["reduction_ratio"] > 0.9, r


# ---------------------------------------------------------------------------
# lake_clustering_depth (operators/sources_io.py)
# ---------------------------------------------------------------------------


def test_clustering_depth_matches_python(spark, sf_dir, reg):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    keys = [int(k) for k in orders["o_orderkey"]]
    d = max(keys) + 1
    layouts = {
        "key_banded": lambda k: min(15, (k * 16) // d),
        "key_scattered": lambda k: k % 24,
    }
    expected = {}
    for name, rule in layouts.items():
        spans = {}
        for k in keys:
            f = rule(k)
            lo, hi = spans.get(f, (k, k))
            spans[f] = (min(lo, k), max(hi, k))
        ov = {
            f: sum(
                1
                for g, (lo2, hi2) in spans.items()
                if g != f and lo <= hi2 and lo2 <= hi
            )
            for f, (lo, hi) in spans.items()
        }
        tot = sum(ov.values())
        expected[name] = (
            len(spans),
            tot,
            _round6(float(tot) / float(len(spans))),
            max(ov.values()),
        )
    got = {
        r["layout"]: (
            r["n_files"],
            r["overlap_pairs"],
            r["avg_overlaps"],
            r["max_overlaps"],
        )
        for r in lookup("lake_clustering_depth").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_clustering_depth_contrast(spark, sf_dir, reg):
    """The metric's reason to exist: the banded (post-OPTIMIZE) layout
    has ZERO overlap anywhere; the scattered layout is worst-case —
    every file overlaps every other."""
    rows = {
        r["layout"]: r
        for r in lookup("lake_clustering_depth").fn(spark, sf_dir).collect()
    }
    b, s = rows["key_banded"], rows["key_scattered"]
    assert b["overlap_pairs"] == 0 and b["max_overlaps"] == 0
    assert s["max_overlaps"] == s["n_files"] - 1
    assert s["overlap_pairs"] == s["n_files"] * (s["n_files"] - 1)


# ---------------------------------------------------------------------------
# graph_harmonic_landmarks (operators/graphs.py)
# ---------------------------------------------------------------------------


def _cooc_nbrs(sf_dir):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[int(o)].add(int(p))
    nbrs = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                nbrs[u].add(v)
                nbrs[v].add(u)
    return nbrs


def test_harmonic_landmarks_match_python_bfs(spark, sf_dir, reg):
    """Third formulation: plain BFS by hops with Python sets."""
    nbrs = _cooc_nbrs(sf_dir)
    landmarks = sorted(nbrs)[:16]
    expected = {}
    for lm in landmarks:
        h1 = set(nbrs[lm])
        h2 = set().union(*(nbrs[x] for x in h1)) - h1 - {lm} if h1 else set()
        h3 = (
            set().union(*(nbrs[y] for y in h2)) - h2 - h1 - {lm}
            if h2
            else set()
        )
        scaled = 6 * len(h1) + 3 * len(h2) + 2 * len(h3)
        expected[lm] = (
            len(h1),
            len(h2),
            len(h3),
            scaled,
            _round6(scaled / 6.0),
        )
    got = {
        r["landmark"]: (
            r["n_hop1"],
            r["n_hop2"],
            r["n_hop3"],
            r["harmonic_scaled6"],
            r["harmonic3"],
        )
        for r in lookup("graph_harmonic_landmarks").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_harmonic_landmarks_bfs_disjointness(spark, sf_dir, reg):
    """Hop sets are disjoint by construction, so the counts can never
    exceed |V|−1 in total, and the scaled sum is exactly the lcm-6
    weighting (divisible checks)."""
    rows = lookup("graph_harmonic_landmarks").fn(spark, sf_dir).collect()
    nbrs = _cooc_nbrs(sf_dir)
    assert len(rows) == min(16, len(nbrs))
    for r in rows:
        assert r["n_hop1"] + r["n_hop2"] + r["n_hop3"] <= len(nbrs) - 1
        assert (
            r["harmonic_scaled6"]
            == 6 * r["n_hop1"] + 3 * r["n_hop2"] + 2 * r["n_hop3"]
        )


# ---------------------------------------------------------------------------
# plan pins — the 100 TB shapes the docstrings promise
# ---------------------------------------------------------------------------


def test_kmeans_update_plan_no_corpus_explode_no_window(spark, sf_dir, reg):
    """The 64 per-dimension means must be ONE combinable groupBy with
    map-side partials (never a ×64 corpus explode, never a window); the
    long format explodes the K-row RESULT."""
    from xml_to_parquet_spark.plans.inspect import node_counts, physical_plan

    df = lookup("sim_kmeans_update").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("Window", 0) == 0, n
    plan = physical_plan(df)
    # the explode (Generate) must sit ABOVE the aggregate, not below it
    assert plan.index("Generate") < plan.index("HashAggregate"), (
        "explode must consume the aggregated K rows"
    )
    assert n.get("BroadcastHashJoin", 0) + n.get("BroadcastNestedLoopJoin", 0) >= 1


def test_covariance_plan_single_scan_single_row_exchange(spark, sf_dir, reg):
    """All 15 moments ride ONE combinable global aggregate over ONE
    pruned lineitem scan; the 10 matrix rows explode from the single
    aggregated row — no joins, no unions over the lineage."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("agg_covariance_matrix").fn(spark, sf_dir)
    # exactly ONE ReadSchema == exactly one scan (a per-pair or unioned
    # formulation would list one per branch)
    rs = read_schemas(df)
    assert len(rs) == 1, rs
    assert "l_orderkey" not in rs[0] and "l_partkey" not in rs[0], rs
    n = node_counts(df)
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n


def test_blocking_metrics_plan_counts_only(spark, sf_dir, reg):
    """Every rule is a COUNT over its blocked join — nothing wide
    materializes, no sort-merge joins, and the final assembly is
    broadcast-sized."""
    from xml_to_parquet_spark.plans.inspect import node_counts

    df = lookup("er_blocking_metrics").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("SortMergeJoin", 0) == 0, n
    assert n.get("Window", 0) == 0, n


def test_clustering_depth_plan_manifest_only(spark, sf_dir, reg):
    """The metric plan must start from the materialized manifests: no
    FileScan of data files in the served plan, overlap join broadcast."""
    from xml_to_parquet_spark.plans.inspect import (
        broadcast_join_count,
        physical_plan,
    )

    df = lookup("lake_clustering_depth").fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(df)
    assert broadcast_join_count(df) >= 1


def test_harmonic_landmarks_plan_checkpointed_frontiers(spark, sf_dir, reg):
    """Frontiers checkpoint per round (single-lineage rule): the served
    plan reads materialized RDDs, not re-derived joins over the corpus —
    no FileScan, and the count assembly joins are broadcast."""
    from xml_to_parquet_spark.plans.inspect import (
        broadcast_join_count,
        physical_plan,
    )

    df = lookup("graph_harmonic_landmarks").fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "FileScan" not in plan
    assert broadcast_join_count(df) >= 3
    # r11 shape, r15 word-packed: hop-3 is a CARDINALITY via
    # per-landmark 64-bit packed bitsets — the biggest fan-out of the
    # walk collapses inside a codegen'd HashAggregate partial (bit_or
    # over member>>6 words) instead of crossing a row Exchange as a
    # distinct + anti-join set, and instead of the r11
    # bitmap_construct_agg whose binary buffer forced SortAggregate
    assert "bit_or" in plan
    assert "bit_count" in plan
    assert "SortAggregate" not in plan
