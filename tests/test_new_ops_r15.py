"""Semantic tests for operators BUILT in the round-10 extension session
and staged for the r15 window (the r11–r14 staged queues are already
full — see R11_PLAN.md). Same staging contract as _r13/_r14: invisible
to queries() until promoted, and each op gets a FULL independent Python
recompute — a third formulation checked against both the Spark
implementation and the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from xml_to_parquet_spark.registry import STAGED, load_all, lookup


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


R15_OPS = [
    "curate_tokenizer_fertility",
    "graph_bridges",
    "dq_changepoint_cusum",
    "timeseries_resample_ohlc",
    "dq_chisq_independence",
    "agg_weighted_median",
    "er_survivorship",
]


def test_r15_staged_ops_hidden_from_driver_registry(reg):
    # the full r15 tier was promoted at the r14 rotation (tier-drain
    # mode, R14_PLAN.md): every op in this file is now registered
    for name in R15_OPS:
        assert name not in STAGED and name in reg


# ---------------------------------------------------------------------------
# curate_tokenizer_fertility (operators/curation.py)
# ---------------------------------------------------------------------------

_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "fr": ["le", "les", "et"],
    "de": ["der", "die", "und"],
}


def _lang_guess(toks):
    h = {
        lang: sum(1 for t in toks if t in ws) for lang, ws in _MARKERS.items()
    }
    if h["en"] >= max(h["es"], h["fr"], h["de"]) and h["en"] > 0:
        return "en"
    if h["es"] >= max(h["fr"], h["de"]) and h["es"] > 0:
        return "es"
    if h["fr"] >= h["de"] and h["fr"] > 0:
        return "fr"
    if h["de"] > 0:
        return "de"
    return "unknown"


def test_tokenizer_fertility_matches_python(spark, sf_dir, reg):
    """Third formulation: Python re over pandas — the same \\s+ split,
    marker-argmax cascade, and BPE-ish findall as both engines."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bpe = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")
    acc = defaultdict(lambda: [0, 0, 0, 0])  # docs, bpe, ws, chars
    for text, n_chars in zip(docs["text"], docs["n_chars"]):
        lang = _lang_guess(re.split(r"\s+", text.lower()))
        a = acc[lang]
        a[0] += 1
        a[1] += len(bpe.findall(text))
        a[2] += len(re.split(r"\s+", text))
        a[3] += int(n_chars)
    expected = {}
    for lang, (n, nb, nw, nc) in acc.items():
        expected[lang] = (
            n,
            nb,
            nw,
            nc,
            _round6(nb / nw) if nw else None,
            _round6(nc / nb) if nb else None,
        )
    got = {
        r["lang_guess"]: (
            r["n_docs"],
            r["bpe_tokens"],
            r["ws_words"],
            r["chars"],
            r["fertility"],
            r["chars_per_token"],
        )
        for r in lookup("curate_tokenizer_fertility").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_tokenizer_fertility_partitions_corpus(spark, sf_dir, reg):
    """n_docs sums to the corpus size (every doc lands in exactly one
    language bucket) and fertility ≥ 1 wherever defined (the BPE-ish
    pre-tokenizer never merges across whitespace, so it emits at least
    one token per word)."""
    rows = lookup("curate_tokenizer_fertility").fn(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    assert sum(r["n_docs"] for r in rows) == len(docs)
    for r in rows:
        if r["fertility"] is not None:
            assert r["fertility"] >= 1.0, r


# ---------------------------------------------------------------------------
# graph_bridges (operators/graphs.py)
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
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    return edges, nbrs


def test_bridges_match_python_sets(spark, sf_dir, reg):
    """Third formulation: plain Python sets — per-edge common-neighbor
    count, and for zero-common edges an explicit u–x–y–v detour search."""
    edges, nbrs = _cooc_graph(sf_dir)
    expected = {}
    for u, v in edges:
        common = len(nbrs[u] & nbrs[v])
        if common:
            expected[(u, v)] = (common, 2, 0)
            continue
        span = 0
        for x in nbrs[u]:
            if x == v:
                continue
            if (nbrs[x] & nbrs[v]) - {u}:
                span = 3
                break
        expected[(u, v)] = (0, span, 1)
    got = {
        (r["u"], r["v"]): (r["common"], r["span"], r["is_local_bridge"])
        for r in lookup("graph_bridges").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_bridges_invariants(spark, sf_dir, reg):
    """span ∈ {0, 2, 3}; an embedded edge always has span 2; the bridge
    flag is exactly the zero-embeddedness predicate; the bridge count
    matches the set recompute (sf0.001's co-occurrence graph is dense
    enough that it is legitimately 0 there — sf0.01 has 8, exercised by
    the dedicated test below)."""
    edges, nbrs = _cooc_graph(sf_dir)
    n_bridges = sum(1 for u, v in edges if not (nbrs[u] & nbrs[v]))
    rows = lookup("graph_bridges").fn(spark, sf_dir).collect()
    assert {r["span"] for r in rows} <= {0, 2, 3}
    for r in rows:
        assert (r["common"] > 0) == (r["span"] == 2), r
        assert r["is_local_bridge"] == (1 if r["common"] == 0 else 0), r
    assert sum(r["is_local_bridge"] for r in rows) == n_bridges
    assert any(not r["is_local_bridge"] for r in rows)


def test_bridges_span_classes_at_sf001(spark, reg):
    """sf0.001's graph has no zero-embeddedness edge at all, so the span
    probe's 3-vs->3 branch needs the sparser sf0.01 graph: its 8 local
    bridges must match the Python detour search edge-for-edge."""
    sf01 = "/root/testdata/sf0.01"
    edges, nbrs = _cooc_graph(sf01)
    expected = {}
    for u, v in edges:
        if nbrs[u] & nbrs[v]:
            continue
        span = 0
        for x in nbrs[u]:
            if x != v and (nbrs[x] & nbrs[v]) - {u}:
                span = 3
                break
        expected[(u, v)] = span
    assert expected  # the fixture really exercises the branch
    got = {
        (r["u"], r["v"]): r["span"]
        for r in lookup("graph_bridges").fn(spark, sf01).collect()
        if r["is_local_bridge"]
    }
    assert got == expected


# ---------------------------------------------------------------------------
# dq_changepoint_cusum (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _cusum_recompute(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()]
    daily = defaultdict(int)
    for t, ts, v in zip(ev["event_type"], ev["ts"], ev["value"]):
        daily[(t, ts.normalize())] += int(round(v * 100))
    series = defaultdict(list)
    for (t, day), cents in daily.items():
        series[t].append((day, cents))
    out = {}
    for t, pts in series.items():
        pts.sort()
        n = len(pts)
        total = sum(c for _, c in pts)
        cum, best = 0, None
        for k, (day, c) in enumerate(pts, 1):
            cum += c
            s = abs(n * cum - k * total)
            # tie-break: larger |S| wins, earlier day wins ties
            if best is None or s > best[0]:
                best = (s, day)
        out[t] = (best[1], n, best[0], _round6(best[0] / (100.0 * n)))
    return out


def test_changepoint_cusum_matches_python(spark, sf_dir, reg):
    got = {
        r["event_type"]: (
            r["change_day"],
            r["n_days"],
            r["s_abs"],
            r["cusum_dollars"],
        )
        for r in lookup("dq_changepoint_cusum").fn(spark, sf_dir).collect()
    }
    assert got == _cusum_recompute(sf_dir)


def test_changepoint_last_day_never_wins(spark, sf_dir, reg):
    """S_n ≡ 0 by construction (n·cumsum_n = n·total), so with any
    nonzero deviation the argmax cannot be the final day — a
    self-checking identity on the scaled-CUSUM arithmetic."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()]
    last_day = {
        t: g["ts"].max().normalize() for t, g in ev.groupby("event_type")
    }
    for r in lookup("dq_changepoint_cusum").fn(spark, sf_dir).collect():
        if r["s_abs"] > 0:
            assert r["change_day"] != last_day[r["event_type"]], r


# ---------------------------------------------------------------------------
# timeseries_resample_ohlc (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_ohlc_matches_python(spark, sf_dir, reg):
    """Third formulation: pandas sort over (ts, event_id) then
    first/last/min/max per bar."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    ev["day"] = ev["ts"].dt.normalize()
    ev = ev.sort_values(["ts", "event_id"])
    expected = {}
    for (t, day), g in ev.groupby(["event_type", "day"]):
        cents = g["cents"].tolist()
        expected[(t, day)] = (
            cents[0],
            max(cents),
            min(cents),
            cents[-1],
            len(cents),
            sum(cents),
        )
    got = {
        (r["event_type"], r["day"]): (
            r["open_cents"],
            r["high_cents"],
            r["low_cents"],
            r["close_cents"],
            r["n_events"],
            r["sum_cents"],
        )
        for r in lookup("timeseries_resample_ohlc").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_ohlc_bar_invariants(spark, sf_dir, reg):
    for r in lookup("timeseries_resample_ohlc").fn(spark, sf_dir).collect():
        assert r["low_cents"] <= r["open_cents"] <= r["high_cents"], r
        assert r["low_cents"] <= r["close_cents"] <= r["high_cents"], r
        assert (
            r["n_events"] * r["low_cents"]
            <= r["sum_cents"]
            <= r["n_events"] * r["high_cents"]
        ), r


# ---------------------------------------------------------------------------
# dq_chisq_independence (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_chisq_matches_python(spark, sf_dir, reg):
    o = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )
    cell = defaultdict(int)
    for p, s in zip(o["o_orderpriority"], o["o_orderstatus"]):
        cell[(p, s)] += 1
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (p, s), n in cell.items():
        rt[p] += n
        ct[s] += n
    big_n = sum(cell.values())
    expected = {}
    for (p, s), n in cell.items():
        d = float(big_n * n - rt[p] * ct[s])
        expected[(p, s)] = (
            n,
            rt[p],
            ct[s],
            _round6(rt[p] * ct[s] / big_n),
            _round6(d * d / (big_n * rt[p] * ct[s])),
        )
    got = {
        (r["pri"], r["st"]): (
            r["n"],
            r["row_total"],
            r["col_total"],
            r["expected"],
            r["chisq_contrib"],
        )
        for r in lookup("dq_chisq_independence").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_chisq_margins_consistent(spark, sf_dir, reg):
    """Observed and expected counts share margins: Σ n over a row equals
    its row_total, and Σ expected over a row reassembles it too (to
    rounding) — the defining property of the independence model."""
    rows = lookup("dq_chisq_independence").fn(spark, sf_dir).collect()
    by_row = defaultdict(lambda: [0, 0.0, None])
    for r in rows:
        b = by_row[r["pri"]]
        b[0] += r["n"]
        b[1] += r["expected"]
        b[2] = r["row_total"]
        assert r["chisq_contrib"] >= 0
    for pri, (n_sum, e_sum, r_tot) in by_row.items():
        assert n_sum == r_tot, pri
        assert abs(e_sum - r_tot) < 1e-3, pri


# ---------------------------------------------------------------------------
# agg_weighted_median (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_weighted_median_matches_python(spark, sf_dir, reg):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    grid = defaultdict(int)
    wc = defaultdict(int)
    for f, p, q in zip(
        li["l_returnflag"], li["l_extendedprice"], li["l_quantity"]
    ):
        c, w = int(round(p * 100)), int(round(q))
        grid[(f, c)] += w
        wc[f] += w * c
    expected = {}
    per_flag = defaultdict(list)
    for (f, c), w in grid.items():
        per_flag[f].append((c, w))
    for f, pts in per_flag.items():
        pts.sort()
        tot = sum(w for _, w in pts)
        cum = 0
        med = None
        for c, w in pts:
            cum += w
            if 2 * cum >= tot:
                med = c
                break
        expected[f] = (tot, med, _round6(wc[f] / (100.0 * tot)))
    got = {
        r["flag"]: (r["total_weight"], r["median_cents"], r["weighted_mean"])
        for r in lookup("agg_weighted_median").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_weighted_median_halving_property(spark, sf_dir, reg):
    """The defining property of the lower weighted median: strictly less
    than half the weight lies below it, at least half lies at-or-below."""
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["w"] = li["l_quantity"].round().astype("int64")
    for r in lookup("agg_weighted_median").fn(spark, sf_dir).collect():
        g = li[li["l_returnflag"] == r["flag"]]
        below = int(g.loc[g["cents"] < r["median_cents"], "w"].sum())
        at_or_below = int(g.loc[g["cents"] <= r["median_cents"], "w"].sum())
        assert 2 * below < r["total_weight"] <= 2 * at_or_below, r


# ---------------------------------------------------------------------------
# er_survivorship (operators/dedup.py)
# ---------------------------------------------------------------------------


def _rosters_recompute(sf_dir):
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    clean = {}
    for r in cust.itertuples():
        k = int(r.c_custkey)
        clean[k] = (r.c_name, md5(f"ph{k}")[:10], int(r.c_nationkey))
    dirty = {}
    for k, (name, phone, city) in clean.items():
        if k % 4:
            continue
        if k % 12 == 0:
            dirty[k] = (name, phone, (city + 7) % 25)
        else:
            p = 9 + k % 8
            dname = name[:p] + md5(f"nm{k}")[0] + name[p + 1 :]
            dphone = phone[:9] + "z" if k % 20 == 0 else phone
            dirty[k] = (dname, dphone, city)
    return clean, dirty


def test_survivorship_matches_python(spark, sf_dir, reg):
    """Third formulation: Python picks over the (independently tested)
    er_cluster_entities labels and hashlib-recomputed rosters — source
    priority for name, majority-with-lexicographic-tie for phone/city."""
    from xml_to_parquet_spark.operators.dedup import ER_NODE_OFFSET

    clean, dirty = _rosters_recompute(sf_dir)
    members = {}
    for k, (n, p, c) in clean.items():
        members[k] = (0, n, p, c)
    for k, (n, p, c) in dirty.items():
        members[k + ER_NODE_OFFSET] = (1, n, p, c)
    ent = {
        r["member_id"]: r["entity_id"]
        for r in lookup("er_cluster_entities").fn(spark, sf_dir).collect()
    }
    groups = defaultdict(list)
    for m, e in ent.items():
        src, n, p, c = members[m]
        groups[e].append((src, m, n, p, c))
    expected = {}
    for e, ms in groups.items():
        ms.sort()  # (src_rank, member_id) — name precedence order
        phones = defaultdict(int)
        cities = defaultdict(int)
        for _, _, _, p, c in ms:
            phones[p] += 1
            cities[c] += 1
        best_p = min(phones, key=lambda p: (-phones[p], p))
        best_c = min(cities, key=lambda c: (-cities[c], c))
        expected[e] = (
            len(ms),
            sum(1 for m in ms if m[0] == 0),
            sum(1 for m in ms if m[0] == 1),
            ms[0][2],
            best_p,
            best_c,
        )
    got = {
        r["entity_id"]: (
            r["n_members"],
            r["n_clean"],
            r["n_dirty"],
            r["golden_name"],
            r["golden_phone"],
            r["golden_city"],
        )
        for r in lookup("er_survivorship").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_survivorship_prefers_clean_source(spark, sf_dir, reg):
    """Wherever an entity contains at least one clean member, the golden
    name must be an exact clean-roster name (dirty corruptions never
    survive name precedence), and member counts partition."""
    clean, _ = _rosters_recompute(sf_dir)
    clean_names = {n for n, _, _ in clean.values()}
    rows = lookup("er_survivorship").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_members"] == r["n_clean"] + r["n_dirty"], r
        if r["n_clean"] > 0:
            assert r["golden_name"] in clean_names, r


# ---------------------------------------------------------------------------
# plan pins — the 100 TB shapes the docstrings promise
# ---------------------------------------------------------------------------


def test_fertility_plan_pruned_map_only(spark, sf_dir, reg):
    """One documents scan pruned to (text, n_chars); the only exchange is
    the ≤5-key language aggregate — no joins, no window, no Python."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("curate_tokenizer_fertility").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("Window", 0) == 0
    assert not any(
        k.endswith("Join") or k == "CartesianProduct" for k in n
    ), n
    for rs in read_schemas(df):
        assert rs == "struct<text:string,n_chars:bigint>", rs


def test_ohlc_plan_single_grid_exchange(spark, sf_dir, reg):
    """The declarative min_by/max_by formulation must NOT plan a window
    (the point over the oracle's row_number shape) and must keep the
    shuffle GRID-sized: exactly one exchange, fed by a PARTIAL aggregate
    (struct-ordered min_by buffers make it sort-based, but the map-side
    combine — the scale property — must be there), pruned scan, no
    joins."""
    from xml_to_parquet_spark.plans.inspect import (
        node_counts,
        physical_plan,
        read_schemas,
        shuffle_count,
    )

    df = lookup("timeseries_resample_ohlc").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("Window", 0) == 0
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n
    assert shuffle_count(df) == 1
    assert "partial_min_by" in physical_plan(df)
    for rs in read_schemas(df):
        assert rs == (
            "struct<event_id:bigint,ts:timestamp_ntz,event_type:string,"
            "value:double>"
        ), rs


def test_chisq_plan_single_scan_no_joins(spark, sf_dir, reg):
    """orders is scanned ONCE (margins are window sums over the cell
    grid — separate groupBy margins lazily re-scanned orders four times
    in the first formulation), pruned to the two profiled columns, and
    there are no joins at all."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("dq_chisq_independence").fn(spark, sf_dir)
    rs = read_schemas(df)
    assert rs == ["struct<o_orderstatus:string,o_orderpriority:string>"], rs
    n = node_counts(df)
    assert not any(k.endswith("Join") or k == "CartesianProduct" for k in n), n


def test_cusum_and_weighted_median_plans_grid_windows(spark, sf_dir, reg):
    """Both ops' windows must run on POST-AGGREGATE grids over a SINGLE
    scan of the source (per-group totals are window aggregates, not
    groupBy-join branches that would lazily re-scan), with no joins
    anywhere."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    for name in ("dq_changepoint_cusum", "agg_weighted_median"):
        df = lookup(name).fn(spark, sf_dir)
        n = node_counts(df)
        assert not any(
            k.endswith("Join") or k == "CartesianProduct" for k in n
        ), (name, n)
        assert n.get("HashAggregate", 0) >= 2, (name, n)
        assert len(read_schemas(df)) == 1, name


def test_survivorship_plan_no_cartesian(spark, sf_dir, reg):
    from xml_to_parquet_spark.plans.inspect import node_counts

    df = lookup("er_survivorship").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0


# ---------------------------------------------------------------------------
# full-adjacency hub-degree guard (VERDICT r11 #5): the degree-cap caveat
# on graph_bridges / graph_jaccard_neighbors is a runtime-enforced
# precondition now (the ER_NODE_OFFSET pattern), not a docstring promise
# ---------------------------------------------------------------------------


def test_full_adjacency_hub_guard_raises_past_cap(spark, monkeypatch):
    from xml_to_parquet_spark.operators import graphs

    # star: hub 0 with 6 leaves → max degree 6 in the symmetric adjacency
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "u int, v int"
    )
    adj = graphs._checkpointed_full_adjacency(edges)
    assert adj.count() == 7  # hub + 6 leaves, fine under the real cap
    monkeypatch.setattr(graphs, "ADJ_DEG_CAP", 5)
    with pytest.raises(ValueError, match="ADJ_DEG_CAP"):
        graphs._checkpointed_full_adjacency(edges)


def test_full_adjacency_hub_guard_boundary_and_empty(spark, monkeypatch):
    from xml_to_parquet_spark.operators import graphs

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "u int, v int"
    )
    # at exactly the cap the build must succeed (the bound is >, not >=)
    monkeypatch.setattr(graphs, "ADJ_DEG_CAP", 6)
    assert graphs._checkpointed_full_adjacency(edges).count() == 7
    # empty edge list → empty adjacency, no spurious raise (max is NULL)
    empty = spark.createDataFrame([], "u int, v int")
    assert graphs._checkpointed_full_adjacency(empty).count() == 0
