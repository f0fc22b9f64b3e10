"""Semantic tests for operators BUILT late in round 10 and staged for the
r14 window rotation (r11 promotes the late-r9 alternates, r12 the eight
r10-staged ops, r13 the ten late-r10 ops in tests/test_new_ops_r13.py).
Same staging contract: invisible to queries() until promoted, and each op
gets a FULL independent Python recompute — a third formulation checked
against both the Spark implementation and the DuckDB oracle.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from xml_to_parquet_spark.registry import STAGED, load_all, lookup


@pytest.fixture(scope="module")
def reg():
    return load_all()


@pytest.fixture(scope="module")
def lineitem_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def _round6(x: float) -> float:
    """Spark's F.round / DuckDB's round are HALF_UP on the shortest decimal
    repr of the double; Python's round() is half-even — 33/128 = 0.2578125
    really does land on the boundary, so the recompute must match."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_r14_staged_ops_hidden_from_driver_registry(reg):
    # the full r14 tier was promoted EARLY, at the r13 rotation (tier-drain
    # mode, R13_PLAN.md): every op in this file is now registered
    for name in (
        "graph_jaccard_neighbors",
        "dedup_containment_incremental",
        "dq_benford",
        "mine_transition_matrix",
        "dq_entropy_profile",
        "agg_retention_cohort",
        "lake_time_travel_diff",
        "stream_cdc_apply",
        "dq_seasonal_decompose",
        "er_cluster_entities",
    ):
        assert name not in STAGED and name in reg


# ---------------------------------------------------------------------------
# graph_jaccard_neighbors (operators/graphs.py)
# ---------------------------------------------------------------------------


def _jaccard_recompute(lineitem_pd):
    """Exact per-edge neighborhood Jaccard, third formulation: plain
    Python sets — no SQL, no triangle orientation, no window functions."""
    baskets = defaultdict(set)
    for o, p in zip(lineitem_pd["l_orderkey"], lineitem_pd["l_partkey"]):
        baskets[o].add(p)
    nbrs: dict[int, set[int]] = defaultdict(set)
    edges = set()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
                nbrs[a].add(b)
                nbrs[b].add(a)
    out = {}
    for u, v in edges:
        common = len(nbrs[u] & nbrs[v])
        union = len(nbrs[u]) + len(nbrs[v]) - common
        out[(u, v)] = (common, len(nbrs[u]), len(nbrs[v]), _round6(common / union))
    return out


def test_jaccard_neighbors_matches_python_sets(spark, sf_dir, lineitem_pd, reg):
    expected = _jaccard_recompute(lineitem_pd)
    got = {
        (r["u"], r["v"]): (r["common"], r["deg_u"], r["deg_v"], r["jaccard"])
        for r in lookup("graph_jaccard_neighbors").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_jaccard_neighbors_invariants(spark, sf_dir, reg):
    rows = lookup("graph_jaccard_neighbors").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["u"] < r["v"]
        # v ∈ N(u) but v ∉ N(v): the shared-neighbor count excludes the
        # endpoints, so it is strictly below min(deg) for an existing edge
        assert 0 <= r["common"] <= min(r["deg_u"], r["deg_v"]) - 1
        assert 0.0 <= r["jaccard"] < 1.0


# ---------------------------------------------------------------------------
# dedup_containment_incremental (operators/dedup.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def documents_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _containment_recompute(documents_pd):
    """Third formulation: plain Python sets over re-split tokens — no SQL,
    no joins, no persisted index."""
    import re

    shingles: dict[int, set[str]] = {}
    source: dict[int, str] = {}
    for r in documents_pd.itertuples():
        toks = re.split(r"\s+", r.text.lower())
        if len(toks) < 3:
            continue
        source[r.doc_id] = r.source
        shingles[r.doc_id] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    # index-side hot stoplist: df > 100 within (source, shingle)
    df = defaultdict(int)
    for d, sh in shingles.items():
        if d % 3 != 0:
            for s in sh:
                df[(source[d], s)] += 1
    hot = {k for k, v in df.items() if v > 100}
    filt = {
        d: {s for s in sh if (source[d], s) not in hot}
        for d, sh in shingles.items()
    }
    out = {}
    for b, bs in filt.items():
        if b % 3 != 0 or not bs:
            continue
        for ix, xs in filt.items():
            if ix % 3 == 0 or source[ix] != source[b]:
                continue
            n = len(bs & xs)
            if n:
                out[(b, ix)] = (n, len(bs), _round6(round(n / len(bs), 8)))
    return out


def test_containment_incremental_matches_python_sets(
    spark, sf_dir, documents_pd, reg
):
    expected = {
        k: (v[0], v[1]) for k, v in _containment_recompute(documents_pd).items()
    }
    rows = lookup("dedup_containment_incremental").fn(spark, sf_dir).collect()
    got = {
        (r["batch_doc"], r["index_doc"]): (r["n_inter"], r["n_sh"])
        for r in rows
    }
    assert got == expected
    # scores: recompute with HALF_UP at 4 decimals
    from decimal import ROUND_HALF_UP, Decimal

    for r in rows:
        want = float(
            Decimal(repr(r["n_inter"] / r["n_sh"])).quantize(
                Decimal("0.0001"), ROUND_HALF_UP
            )
        )
        assert r["containment"] == want


def test_containment_incremental_interrupted_build_reruns(spark, sf_dir, reg):
    """A partial artifact (directory exists, no _SUCCESS) must be rebuilt,
    and the stoplist/index artifacts are guarded INDIVIDUALLY — the
    per-artifact pattern ADVICE r10 prescribed for the lake ops."""
    import os
    import shutil

    from xml_to_parquet_spark.io_paths import committed, scratch_dir

    fn = lookup("dedup_containment_incremental").fn
    baseline = {
        (r["batch_doc"], r["index_doc"]): r["n_inter"]
        for r in fn(spark, sf_dir).collect()
    }
    idx_dir = scratch_dir(sf_dir, "containment_shingle_index")
    assert committed(idx_dir)
    # simulate an interrupted index write: strip the commit marker but
    # leave partial files behind
    os.remove(os.path.join(idx_dir, "_SUCCESS"))
    for f in os.listdir(idx_dir)[:1]:
        p = os.path.join(idx_dir, f)
        (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
    again = {
        (r["batch_doc"], r["index_doc"]): r["n_inter"]
        for r in fn(spark, sf_dir).collect()
    }
    assert committed(idx_dir)
    assert again == baseline


# ---------------------------------------------------------------------------
# dq_benford (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _benford_recompute(lineitem_pd, orders_pd):
    """Third formulation: math.log10 directly (the implementation embeds
    frozen 12-decimal literals instead — agreement here proves the freeze
    loses nothing at the 6-decimal output precision)."""
    import math

    out = {}
    for label, series in (
        ("l_extendedprice", lineitem_pd["l_extendedprice"]),
        ("o_totalprice", orders_pd["o_totalprice"]),
    ):
        vals = [int(v) for v in series if v >= 1]
        obs = defaultdict(int)
        for v in vals:
            obs[int(str(v)[0])] += 1
        n = sum(obs.values())
        for d, o in obs.items():
            exp = n * float(f"{math.log10(1 + 1 / d):.12f}")
            out[(label, d)] = (
                o,
                n,
                _round6(exp),
                _round6((o - exp) ** 2 / exp),
            )
    return out


def test_benford_matches_python(spark, sf_dir, lineitem_pd, reg):
    orders_pd = pd.read_parquet(f"{sf_dir}/orders.parquet")
    expected = _benford_recompute(lineitem_pd, orders_pd)
    got = {
        (r["col"], r["digit"]): (r["obs"], r["n"], r["exp_cnt"], r["chi2_term"])
        for r in lookup("dq_benford").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_benford_counts_are_complete(spark, sf_dir, reg):
    rows = lookup("dq_benford").fn(spark, sf_dir).collect()
    by_col = defaultdict(int)
    for r in rows:
        assert 1 <= r["digit"] <= 9
        by_col[r["col"]] += r["obs"]
    # every qualifying row lands in exactly one digit bucket: the per-digit
    # counts reassemble each column's reported total
    assert all(r["n"] == by_col[r["col"]] for r in rows)


# ---------------------------------------------------------------------------
# mine_transition_matrix (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _transition_recompute(orders_pd):
    """Third formulation: Python dict-of-sequences, no SQL windows."""
    seqs = defaultdict(list)
    for r in orders_pd.itertuples():
        seqs[r.o_custkey].append((r.o_orderdate, r.o_orderkey, r.o_orderpriority))
    cnt = defaultdict(int)
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            cnt[(a, b)] += 1
    n_from = defaultdict(int)
    for (a, _), c in cnt.items():
        n_from[a] += c
    return {
        k: (c, n_from[k[0]], _round6(c / n_from[k[0]]))
        for k, c in cnt.items()
    }


def test_transition_matrix_matches_python(spark, sf_dir, reg):
    orders_pd = pd.read_parquet(f"{sf_dir}/orders.parquet")
    expected = _transition_recompute(orders_pd)
    got = {
        (r["prev_priority"], r["next_priority"]): (r["cnt"], r["n_from"], r["prob"])
        for r in lookup("mine_transition_matrix").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_transition_matrix_rows_normalize(spark, sf_dir, reg):
    rows = lookup("mine_transition_matrix").fn(spark, sf_dir).collect()
    by_prev = defaultdict(list)
    for r in rows:
        by_prev[r["prev_priority"]].append(r)
    for rs in by_prev.values():
        assert sum(r["cnt"] for r in rs) == rs[0]["n_from"]
        assert abs(sum(r["prob"] for r in rs) - 1.0) < 1e-4


# ---------------------------------------------------------------------------
# dq_entropy_profile (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_entropy_profile_matches_python(spark, sf_dir, reg):
    """Third formulation: collections.Counter + math.log2 per column."""
    import math

    from collections import Counter

    from xml_to_parquet_spark.operators.relational_ext import ENTROPY_COLS

    expected = {}
    for tbl, col in ENTROPY_COLS:
        s = pd.read_parquet(f"{sf_dir}/{tbl}.parquet")[col].dropna()
        cnt = Counter(s)
        n = sum(cnt.values())
        slog = sum(c * math.log2(c) for c in cnt.values())
        expected[f"{tbl}.{col}"] = (
            n,
            len(cnt),
            round(math.log2(n) - slog / n, 5),
            round(1.0 - sum(c * c for c in cnt.values()) / (n * n), 5),
            round(max(cnt.values()) / n, 5),
        )
    got = {
        r["col"]: (
            r["n"],
            r["n_distinct"],
            round(r["entropy_bits"], 5),
            round(r["gini"], 5),
            round(r["top_share"], 5),
        )
        for r in lookup("dq_entropy_profile").fn(spark, sf_dir).collect()
    }
    # compare at 5 decimals: the recompute sums log2 terms in a different
    # order than either engine, so the 6th decimal may legitimately differ
    assert got == expected


def test_entropy_profile_bounds(spark, sf_dir, reg):
    import math

    for r in lookup("dq_entropy_profile").fn(spark, sf_dir).collect():
        assert 0.0 <= r["entropy_bits"] <= math.log2(r["n_distinct"]) + 1e-9
        assert 0.0 <= r["gini"] < 1.0
        assert 1.0 / r["n_distinct"] <= r["top_share"] + 1e-9 <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# agg_retention_cohort (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def _retention_recompute(orders_pd):
    """Third formulation: per-customer month-index sets in plain Python."""
    months = defaultdict(set)
    for r in orders_pd.itertuples():
        months[r.o_custkey].add(r.o_orderdate.year * 12 + r.o_orderdate.month)
    cohort = {c: min(ms) for c, ms in months.items()}
    size = defaultdict(int)
    for c in cohort.values():
        size[c] += 1
    cell = defaultdict(int)
    for cust, ms in months.items():
        for m in ms:
            cell[(cohort[cust], m - cohort[cust])] += 1
    return {
        k: (a, size[k[0]], _round6(a / size[k[0]])) for k, a in cell.items()
    }


def test_retention_cohort_matches_python(spark, sf_dir, reg):
    orders_pd = pd.read_parquet(f"{sf_dir}/orders.parquet")
    expected = _retention_recompute(orders_pd)
    got = {
        (r["cohort_m"], r["month_offset"]): (
            r["active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in lookup("agg_retention_cohort").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_retention_cohort_offset_zero_is_full(spark, sf_dir, reg):
    """Every cohort is 100% retained at offset 0 by construction (the
    first order IS activity in the cohort month)."""
    rows = lookup("agg_retention_cohort").fn(spark, sf_dir).collect()
    zero = [r for r in rows if r["month_offset"] == 0]
    assert zero and all(r["active"] == r["cohort_size"] for r in zero)
    assert all(r["month_offset"] >= 0 and r["active"] <= r["cohort_size"]
               for r in rows)


# ---------------------------------------------------------------------------
# lake_time_travel_diff (operators/sources_io.py)
# ---------------------------------------------------------------------------


def test_time_travel_diff_matches_python(spark, sf_dir, reg):
    """Third formulation: recompute the appended slice straight from the
    orders parquet in pandas."""
    from xml_to_parquet_spark.operators.sources_io import SNAP_SPLIT

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    add = o[o["o_orderkey"] >= SNAP_SPLIT]
    expected = {}
    for st, g in add.groupby("o_orderstatus"):
        expected[st] = (
            len(g),
            int(sum(int(round(p * 100)) for p in g["o_totalprice"])),
            int(g["o_orderkey"].min()),
            int(g["o_orderkey"].max()),
        )
    got = {
        r["o_orderstatus"]: (
            r["n_added"],
            r["cents_added"],
            r["min_key"],
            r["max_key"],
        )
        for r in lookup("lake_time_travel_diff").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_time_travel_diff_scans_only_appended_files(spark, sf_dir, reg):
    """The incremental property itself: the v2−v1 manifest anti-join must
    surface exactly the appended commit's files — never the whole table."""
    from xml_to_parquet_spark.operators.sources_io import (
        SNAP_V1_FILES,
        SNAP_V2_FILES,
        _ensure_snapshot_fixture,
    )

    _, man1, man2 = _ensure_snapshot_fixture(spark, sf_dir)
    v1 = {r.file_path for r in spark.read.parquet(man1).collect()}
    v2 = {r.file_path for r in spark.read.parquet(man2).collect()}
    assert len(v1) == SNAP_V1_FILES
    assert v1 < v2  # append-only: v1's files are immutable and retained
    assert len(v2 - v1) == SNAP_V2_FILES


# ---------------------------------------------------------------------------
# plan pins (the staged-tier counterpart of tests/test_plans.py)
# ---------------------------------------------------------------------------


def test_jaccard_neighbors_plan_hash_joins_only(spark, sf_dir, reg):
    """Per-edge support must come from node-keyed hash joins against the
    bounded forward adjacency — a cartesian or nested-loop here is the
    Σdeg² wedge blow-up the orientation exists to kill."""
    from xml_to_parquet_spark.plans.inspect import node_counts

    df = lookup("graph_jaccard_neighbors").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0
    assert n.get("BroadcastNestedLoopJoin", 0) == 0
    # the r11 row-local shape: support is array_intersect inside codegen —
    # no Generate (explode) anywhere means nothing triangle-sized can be
    # flowing toward an Exchange (the rejected 3T-row explode-back shape)
    assert n.get("Generate", 0) == 0, n


def test_containment_incremental_plan_probes_persisted_index(spark, sf_dir, reg):
    """The probe must read the PERSISTED index parquet (never re-shingle
    the standing corpus) and drop hot shingles via anti-joins — no
    cartesian anywhere."""
    from xml_to_parquet_spark.plans.inspect import formatted_plan, node_counts

    df = lookup("dedup_containment_incremental").fn(spark, sf_dir)
    plan = formatted_plan(df)  # executed plan truncates scan locations
    assert "containment_shingle_index" in plan
    assert "containment_hot_stoplist" in plan
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0


def test_benford_plan_pruned_scans_broadcast_totals(spark, sf_dir, reg):
    """Each branch's scan must read ONLY its price column (the digit
    projection collapses map-side), and the per-column totals join is a
    2-row broadcast."""
    from xml_to_parquet_spark.plans.inspect import (
        broadcast_join_count,
        read_schemas,
    )

    df = lookup("dq_benford").fn(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    for rs in read_schemas(df):
        assert rs in (
            "struct<l_extendedprice:double>",
            "struct<o_totalprice:double>",
        ), rs


def test_transition_matrix_plan_single_lineage_pruned_scan(spark, sf_dir, reg):
    """Exactly one orders scan (row totals are a window-sum over the
    25-row aggregate, NOT a self-join that would duplicate the lineage
    and scan orders twice), the lag window plus the tiny totals window,
    no joins at all, and the scan pruned to the sequence columns."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("mine_transition_matrix").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("Window", 0) == 2
    for k in n:
        assert "Join" not in k and "Cartesian" not in k, n
    schemas = read_schemas(df)
    assert len(schemas) == 1  # ONE scan of orders
    assert "o_totalprice" not in schemas[0] and "o_orderstatus" not in schemas[0]


def test_entropy_profile_plan_single_column_scans_no_joins(spark, sf_dir, reg):
    """Every branch scans exactly its one profiled column and the whole
    op is aggregation-only — zero join nodes of any kind."""
    from xml_to_parquet_spark.plans.inspect import node_counts, read_schemas

    df = lookup("dq_entropy_profile").fn(spark, sf_dir)
    n = node_counts(df)
    for k in n:
        assert "Join" not in k and "Cartesian" not in k, n
    for rs in read_schemas(df):
        # struct<one_column:...>
        assert rs.count(":") == 1, rs


def test_retention_cohort_plan_pruned_scans_broadcast_sizes(spark, sf_dir, reg):
    """Orders scans must read only (o_custkey, o_orderdate); cohort sizes
    join broadcast; activity join is a hash equi-join on the customer."""
    from xml_to_parquet_spark.plans.inspect import (
        broadcast_join_count,
        node_counts,
        read_schemas,
    )

    df = lookup("agg_retention_cohort").fn(spark, sf_dir)
    n = node_counts(df)
    assert n.get("CartesianProduct", 0) == 0
    assert n.get("BroadcastNestedLoopJoin", 0) == 0
    assert broadcast_join_count(df) >= 1
    for rs in read_schemas(df):
        assert "o_totalprice" not in rs and "o_orderstatus" not in rs


# ---------------------------------------------------------------------------
# stream_cdc_apply (streaming/joins.py)
# ---------------------------------------------------------------------------


def test_cdc_apply_matches_python_and_one_shot_merge(spark, sf_dir, reg):
    """Two equivalences: (a) the streamed-apply final state equals a plain
    pandas recompute of the change rules; (b) it equals lake_merge_upsert's
    one-shot CoW merge output — N incremental transactional applies ≡ one
    merge, proven engine-side, not just via the shared oracle."""
    from xml_to_parquet_spark.operators.sources_io import MERGE_INS_OFFSET

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    rows = []
    for r in o.itertuples():
        k = r.o_orderkey
        if k % 7 == 3:
            pass  # deleted
        elif k % 7 == 0:
            rows.append((k, r.o_orderstatus, r.o_totalprice + 1000))
        else:
            rows.append((k, r.o_orderstatus, r.o_totalprice))
        if k % 11 == 5:
            rows.append((k + MERGE_INS_OFFSET, "I", float(k)))
    expected = {}
    for k, st, p in rows:
        n, cents, lo, hi = expected.get(st, (0, 0, None, None))
        expected[st] = (
            n + 1,
            cents + int(round(p * 100)),
            k if lo is None else min(lo, k),
            k if hi is None else max(hi, k),
        )
    got = {
        r["o_orderstatus"]: (
            r["n_orders"],
            r["price_cents"],
            r["min_key"],
            r["max_key"],
        )
        for r in lookup("stream_cdc_apply").fn(spark, sf_dir).collect()
    }
    assert got == expected
    merge = {
        r["o_orderstatus"]: (
            r["n_orders"],
            r["price_cents"],
            r["min_key"],
            r["max_key"],
        )
        for r in lookup("lake_merge_upsert").fn(spark, sf_dir).collect()
    }
    assert got == merge


def test_cdc_apply_replays_multiple_batches(spark, sf_dir, reg):
    """The feed fixture must really split into CDC_STREAM_FILES parquet
    files — with maxFilesPerTrigger=1 that IS the micro-batch count, so a
    single-batch degenerate replay (which would prove nothing about
    incremental application) fails here."""
    import glob

    from xml_to_parquet_spark.io_paths import committed, scratch_dir
    from xml_to_parquet_spark.streaming.joins import CDC_STREAM_FILES

    lookup("stream_cdc_apply").fn(spark, sf_dir).collect()
    src = scratch_dir(sf_dir, "cdc_stream_src")
    assert committed(src)
    parts = glob.glob(f"{src}/part-*.parquet")
    assert len(parts) == CDC_STREAM_FILES


# ---------------------------------------------------------------------------
# dq_seasonal_decompose (operators/relational_ext.py)
# ---------------------------------------------------------------------------


def test_seasonal_decompose_matches_python(spark, sf_dir, reg):
    """Third formulation: Python dicts over pandas timestamps (weekday()
    is Monday-0, matching Spark's weekday() and DuckDB's isodow−1)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()]
    cell_n = defaultdict(int)
    cell_c = defaultdict(int)
    for t, ts, v in zip(ev["event_type"], ev["ts"], ev["value"]):
        k = (t, ts.weekday())
        cell_n[k] += 1
        cell_c[k] += int(round(v * 100))
    tot_n = defaultdict(int)
    tot_c = defaultdict(int)
    for (t, _), n in cell_n.items():
        tot_n[t] += n
    for (t, _), c in cell_c.items():
        tot_c[t] += c
    expected = {}
    for k in cell_n:
        t = k[0]
        dm = cell_c[k] / (100.0 * cell_n[k])
        am = tot_c[t] / (100.0 * tot_n[t])
        expected[k] = (cell_n[k], cell_c[k], _round6(dm), _round6(dm - am))
    got = {
        (r["event_type"], r["dow"]): (
            r["n"],
            r["cents"],
            r["dow_mean"],
            r["seasonal_dev"],
        )
        for r in lookup("dq_seasonal_decompose").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_seasonal_devs_weight_to_zero(spark, sf_dir, reg):
    """Σ n_dow · seasonal_dev ≡ 0 per type by construction (the weighted
    day-of-week means reassemble the overall mean) — a self-checking
    identity on the decomposition."""
    rows = lookup("dq_seasonal_decompose").fn(spark, sf_dir).collect()
    acc = defaultdict(float)
    tot = defaultdict(int)
    for r in rows:
        assert 0 <= r["dow"] <= 6
        acc[r["event_type"]] += r["n"] * r["seasonal_dev"]
        tot[r["event_type"]] += r["n"]
    for t, s in acc.items():
        assert abs(s) / tot[t] < 1e-5, (t, s)


# ---------------------------------------------------------------------------
# er_cluster_entities (operators/dedup.py)
# ---------------------------------------------------------------------------


def test_er_cluster_matches_union_find(spark, sf_dir, reg):
    """Third formulation: union-find over the FS match pairs taken from
    the er_fellegi_sunter OUTPUT (so this checks the clustering layer
    independently of the decision layer, which has its own recompute)."""
    from xml_to_parquet_spark.operators.dedup import ER_NODE_OFFSET

    fs = lookup("er_fellegi_sunter").fn(spark, sf_dir).collect()
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in fs:
        if r["decision"] == "match":
            union(r["rid"] + ER_NODE_OFFSET, r["cand_custkey"])
    expected_ent = {m: find(m) for m in list(parent)}
    sizes = defaultdict(int)
    for e in expected_ent.values():
        sizes[e] += 1
    expected = {
        m: (e, sizes[e]) for m, e in expected_ent.items()
    }
    got = {
        r["member_id"]: (r["entity_id"], r["n_members"])
        for r in lookup("er_cluster_entities").fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_er_cluster_true_pairs_land_together(spark, sf_dir, reg):
    """Every dirty re-entry whose decision class is 'match' must share an
    entity with its true clean counterpart (same custkey) — the planted
    ground truth surviving transitive clustering."""
    from xml_to_parquet_spark.operators.dedup import ER_NODE_OFFSET

    rows = lookup("er_cluster_entities").fn(spark, sf_dir).collect()
    ent = {r["member_id"]: r["entity_id"] for r in rows}
    checked = 0
    for m, e in ent.items():
        if m >= ER_NODE_OFFSET:
            true_clean = m - ER_NODE_OFFSET
            if true_clean in ent:
                assert ent[true_clean] == e, (m, true_clean)
                checked += 1
    assert checked > 0
