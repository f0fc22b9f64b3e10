"""Property tests for connected_components (dedup.py) on adversarial graph
shapes — pins the guarantee that a long-chain dup graph cannot silently hit
the round cap with wrong labels (it either converges or raises)."""

import random

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.dedup import connected_components


def _edges_df(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "a long, b long")


def _ground_truth(n_nodes, pairs):
    """Union-find reference labels: node -> min node id in its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


def test_path_graph_converges_with_pointer_jumping(spark):
    """A 200-node path (diameter 199) needs ~log2(199) pointer-jump rounds —
    far below the 30-round cap that plain propagation would blow through."""
    pairs = [(i, i + 1) for i in range(199)]
    labels = connected_components(
        _edges_df(spark, pairs), pointer_jump=True, max_rounds=30
    )
    rows = labels.collect()
    assert len(rows) == 200
    assert all(r["lab"] == 0 for r in rows)


def test_path_graph_plain_propagation_raises_at_cap():
    """Without pointer jumping, a chain longer than max_rounds must RAISE,
    never return wrong labels silently."""
    pytest.importorskip("pyspark")
    from xml_to_parquet_spark import get_spark

    spark = get_spark("cc-test")
    pairs = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges_df(spark, pairs), pointer_jump=False, max_rounds=8)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 120
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    pairs = [(a, b) for a, b in pairs if a != b]
    truth = _ground_truth(n, pairs)
    labels = connected_components(
        _edges_df(spark, pairs), pointer_jump=True, max_rounds=30
    )
    got = {r["node"]: r["lab"] for r in labels.collect()}
    # only nodes with at least one edge appear in the edge-list formulation
    for node, lab in got.items():
        assert lab == truth[node], f"node {node}: got {lab}, want {truth[node]}"


def test_star_and_clique_single_round_shapes(spark):
    """Star (hub 0) and a 6-clique: both converge to min-id labels."""
    star = [(0, i) for i in range(1, 30)]
    clique = [(i, j) for i in range(50, 56) for j in range(i + 1, 56)]
    labels = connected_components(
        _edges_df(spark, star + clique), pointer_jump=True, max_rounds=30
    )
    got = {r["node"]: r["lab"] for r in labels.collect()}
    assert all(got[i] == 0 for i in range(30))
    assert all(got[i] == 50 for i in range(50, 56))
