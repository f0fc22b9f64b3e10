"""Semantic tests for the r18-tier staged batch (round-10 extension
sessions; see R11_PLAN.md). Same contract as _r16/_r17: hidden from
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


R18_OPS = [
    "graph_modularity",
    "dq_mutual_information",
    "curate_url_dedup",
    "timeseries_theil_sen",
    "sim_pq_train",
]


def test_r18_ops_promoted_to_driver_registry(reg):
    # First 2 alphabetical promoted at r15 (R15_PLAN.md), the 3 leftovers
    # at the r16 rotation (R16_PLAN.md) — none remain staged.
    for name in R18_OPS:
        assert name not in STAGED and name in reg


# ---------------------------------------------------------------------------
# graph_modularity (operators/graphs.py)
# ---------------------------------------------------------------------------


def _cooc(sf_dir):
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
    nbrs = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    return edges, nbrs


def _lpa_python(nbrs, rounds=3):
    lbl = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            cnt = Counter(lbl[x] for x in ns)
            best = min(cnt, key=lambda l: (-cnt[l], l))
            new[n] = best
        lbl = new
    return lbl


def test_modularity_matches_python(spark, sf_dir, reg):
    """Third formulation: Python LPA (3 synchronous min-tie rounds) +
    integer modularity arithmetic."""
    edges, nbrs = _cooc(sf_dir)
    lbl = _lpa_python(nbrs)
    m = len(edges)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    d_sum, e_in, n_nodes = Counter(), Counter(), Counter()
    for n, c in lbl.items():
        d_sum[c] += deg[n]
        n_nodes[c] += 1
    for u, v in edges:
        if lbl[u] == lbl[v]:
            e_in[lbl[u]] += 1
    total = sum(4 * m * e_in[c] - d_sum[c] ** 2 for c in d_sum)
    q = _round6(float(total) / (4.0 * float(m) * float(m)))
    got = {
        r["community"]: r
        for r in lookup("graph_modularity").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(d_sum)
    for c, r in got.items():
        assert r["n_nodes"] == n_nodes[c]
        assert r["e_in"] == e_in[c]
        assert r["d_sum"] == d_sum[c]
        assert r["contrib_scaled"] == 4 * m * e_in[c] - d_sum[c] ** 2
        assert r["q_total"] == q


def test_modularity_identities(spark, sf_dir, reg):
    """Σ d_c = 2m and Σ e_c ≤ m (cross-community edges are the gap);
    Q ≤ 1 always."""
    rows = lookup("graph_modularity").fn(spark, sf_dir).collect()
    edges, _ = _cooc(sf_dir)
    assert sum(r["d_sum"] for r in rows) == 2 * len(edges)
    assert sum(r["e_in"] for r in rows) <= len(edges)
    assert all(r["q_total"] <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# dq_mutual_information (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_mutual_information_matches_python(spark, sf_dir, reg):
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )
    cell = Counter(zip(orders["o_orderpriority"], orders["o_orderstatus"]))
    r_tot, c_tot = Counter(), Counter()
    for (p, s), n in cell.items():
        r_tot[p] += n
        c_tot[s] += n
    big_n = sum(cell.values())
    mi = sum(
        n * math.log2((float(big_n) * float(n)) / (float(r_tot[p]) * float(c_tot[s])))
        for (p, s), n in cell.items()
    ) / float(big_n)
    got = {
        (r["pri"], r["st"]): r
        for r in lookup("dq_mutual_information").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(cell)
    for (p, s), r in got.items():
        assert r["n"] == cell[(p, s)]
        assert r["row_total"] == r_tot[p]
        assert r["col_total"] == c_tot[s]
        pmi = math.log2(
            (float(big_n) * float(cell[(p, s)]))
            / (float(r_tot[p]) * float(c_tot[s]))
        )
        # libm log2 may differ in the last ulp between runtimes
        assert r["pmi_bits"] == pytest.approx(pmi, abs=2e-6)
        assert r["mi_total"] == pytest.approx(mi, abs=2e-6)


def test_mutual_information_nonneg_total(spark, sf_dir, reg):
    """MI ≥ 0 always (Gibbs); individual PMIs may be negative — both
    signs should appear on a dependent cross-tab."""
    rows = lookup("dq_mutual_information").fn(spark, sf_dir).collect()
    assert rows[0]["mi_total"] >= 0
    assert len({r["mi_total"] for r in rows}) == 1  # same total on every row


# ---------------------------------------------------------------------------
# curate_url_dedup (operators/curation.py)
# ---------------------------------------------------------------------------


def _messy_url(doc_id: int) -> str:
    base = doc_id - doc_id % 4
    host = f"cdn{base % 7}.example.com"
    v = doc_id % 4
    if v == 0:
        return f"https://{host}/docs/{base}?lang=en"
    if v == 1:
        return f"http://{host}/docs/{base}/?lang=en"
    if v == 2:
        return f"https://WWW.CDN{base % 7}.example.com/docs/{base}?lang=en&utm_source=feed"
    return f"https://{host}/docs/{base}?ref=rss&lang=en"


def _canonical(url: str) -> str:
    u = url.lower()
    u = re.sub(r"^http://", "https://", u)
    u = re.sub(r"^https://www[.]", "https://", u)
    u = re.sub(r"(/)?[?].*$", "", u)
    return u


def test_url_dedup_matches_python(spark, sf_dir, reg):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    groups = defaultdict(list)
    for d in (int(x) for x in docs["doc_id"]):
        u = _messy_url(d)
        groups[_canonical(u)].append((d, u))
    expected = {
        c: (min(d for d, _ in items), len(items), len({u for _, u in items}))
        for c, items in groups.items()
    }
    got = {
        r["canonical_url"]: (
            r["keeper_doc_id"],
            r["n_variants"],
            r["n_distinct_surface"],
        )
        for r in lookup("curate_url_dedup").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_url_dedup_collapses_planted_variants(spark, sf_dir, reg):
    """Every full group of 4 consecutive docs collapses to one survivor
    with 4 DISTINCT surface forms — surface dedup alone would keep all
    four."""
    rows = lookup("curate_url_dedup").fn(spark, sf_dir).collect()
    full = [r for r in rows if r["n_variants"] == 4]
    assert full, "planted 4-groups must exist"
    for r in full:
        assert r["n_distinct_surface"] == 4, r
        assert r["keeper_doc_id"] % 4 == 0, r
        assert r["canonical_url"].startswith("https://cdn")
        assert "?" not in r["canonical_url"] and "www" not in r["canonical_url"]


# ---------------------------------------------------------------------------
# timeseries_theil_sen (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _daily(sf_dir):
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = defaultdict(int)
    for d, p in zip(orders["o_orderdate"], orders["o_totalprice"]):
        daily[d] += int(Decimal(repr(float(p))).quantize(0, ROUND_HALF_UP))
    return [rev for _, rev in sorted(daily.items())]


def test_theil_sen_matches_python(spark, sf_dir, reg):
    series = _daily(sf_dir)
    slopes = []
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            slopes.append(
                (float(series[j] - series[i]) / float(j - i), i + 1, j + 1)
            )
    slopes.sort()
    n = len(slopes)
    slope = slopes[(n + (n % 2)) // 2 - 1][0]
    resid = sorted(
        (float(series[i]) - slope * float(i + 1), i + 1)
        for i in range(len(series))
    )
    k = len(resid)
    icept = resid[(k + (k % 2)) // 2 - 1][0]
    [row] = lookup("timeseries_theil_sen").fn(spark, sf_dir).collect()
    assert row["n_days"] == len(series)
    assert row["n_pairs"] == n
    assert row["slope"] == pytest.approx(slope, abs=2e-6)
    assert row["intercept"] == pytest.approx(icept, abs=2e-6)


def test_theil_sen_robust_to_outlier(spark, sf_dir, reg):
    """The estimator's reason to exist: on the real series the median
    slope is bounded by the extreme pairwise slopes and not NaN/None,
    and the fitted line's median residual is ~0 by construction of the
    intercept (lower-median residual after subtracting it is ≤ 0 ≤
    upper)."""
    [row] = lookup("timeseries_theil_sen").fn(spark, sf_dir).collect()
    series = _daily(sf_dir)
    mx = max(series) - min(series)
    assert abs(row["slope"]) <= mx
    resid = sorted(
        float(series[i]) - row["slope"] * float(i + 1) - row["intercept"]
        for i in range(len(series))
    )
    assert resid[0] <= 1e-6 and resid[-1] >= -1e-6


# ---------------------------------------------------------------------------
# sim_pq_train (operators/similarity.py)
# ---------------------------------------------------------------------------


def test_pq_train_matches_python(spark, sf_dir, reg):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    seeds = {cw: vecs[cw] for cw in range(16) if cw in vecs}
    members = defaultdict(list)  # (sub, cw) -> [vec]
    for vid, v in vecs.items():
        for sub in range(4):
            ds = []
            for cw, c in seeds.items():
                acc = 0.0
                for i in range(16):
                    d = float(v[16 * sub + i]) - float(c[16 * sub + i])
                    acc += d * d
                ds.append((_round6(acc), cw))
            members[(sub, min(ds)[1])].append(v)
    rows = lookup("sim_pq_train").fn(spark, sf_dir).collect()
    got = {(r["subspace"], r["codeword"], r["dim"]): r for r in rows}
    assert len(got) == len(members) * 16
    for (sub, cw), vs in members.items():
        for dim in range(1, 17):
            r = got[(sub, cw, dim)]
            assert r["n_assigned"] == len(vs)
            mean = sum(float(v[16 * sub + dim - 1]) for v in vs) / len(vs)
            assert r["mean_val"] == pytest.approx(mean, abs=2e-6)


def test_pq_train_partitions_per_subspace(spark, sf_dir, reg):
    """Each subspace assigns EVERY vector exactly once: per subspace the
    populations sum to the corpus, independently of the other
    subspaces — the independence that makes PQ a product quantizer."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    rows = lookup("sim_pq_train").fn(spark, sf_dir).collect()
    per_sub = defaultdict(int)
    for r in rows:
        if r["dim"] == 1:
            per_sub[r["subspace"]] += r["n_assigned"]
    assert set(per_sub) == {0, 1, 2, 3}
    for sub, n in per_sub.items():
        assert n == len(emb), sub


# ---------------------------------------------------------------------------
# plan pins — the 100 TB shapes the docstrings promise
# ---------------------------------------------------------------------------


def test_modularity_plan_no_filescan_window_on_grid(spark, sf_dir, reg):
    """LPA labels and edges are checkpointed, so the scoring plan reads
    materialized RDDs only; the q_total window runs post-aggregate on
    the community grid."""
    from xml_to_parquet_spark.plans.inspect import physical_plan

    df = lookup("graph_modularity").fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(df)


def test_mutual_information_plan_single_scan_no_joins(spark, sf_dir, reg):
    """Same pinned shape as dq_chisq_independence: one pruned scan,
    margins as window sums over the cell grid, zero joins."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("dq_mutual_information").fn(spark, sf_dir)
    rs = read_schemas(df)
    assert rs == ["struct<o_orderstatus:string,o_orderpriority:string>"], rs
    n = node_counts(df)
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n


def test_url_dedup_plan_map_only_into_one_agg(spark, sf_dir, reg):
    """Canonicalization is codegen regexp projection; the dedup is one
    combinable groupBy — no joins, no windows, scan pruned to doc_id."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("curate_url_dedup").fn(spark, sf_dir)
    assert read_schemas(df) == ["struct<doc_id:bigint>"]
    n = node_counts(df)
    assert n.get("Window", 0) == 0, n
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n


def test_theil_sen_plan_grid_only(spark, sf_dir, reg):
    """Orders is scanned exactly once at the shared day-grid checkpoint;
    the pair fan-out, both median sorts, and the assembly are grid
    arithmetic with no FileScan."""
    from xml_to_parquet_spark.plans.inspect import physical_plan

    df = lookup("timeseries_theil_sen").fn(spark, sf_dir)
    assert "FileScan" not in physical_plan(df)


def test_pq_train_plan_broadcast_seed_no_window(spark, sf_dir, reg):
    """Codebook seed + subspace table broadcast; assignment is the
    combinable min_by (no window over the corpus); the K×M×16 long
    format explodes ABOVE the aggregate."""
    from xml_to_parquet_spark.plans.inspect import node_counts, physical_plan

    df = lookup("sim_pq_train").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("Window", 0) == 0, n
    plan = physical_plan(df)
    assert plan.index("Generate") < plan.index("HashAggregate")
    assert n.get("BroadcastNestedLoopJoin", 0) + n.get("BroadcastHashJoin", 0) >= 1
