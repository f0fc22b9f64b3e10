"""Graph operators [EXT] beyond connected components (dedup.py):
fixed-iteration PageRank over the part↔supplier co-occurrence graph.

Cross-engine determinism: ranks are scaled longs (SCALE = 10^15) and every
step is integer arithmetic with floor division, so Spark and DuckDB compute
IDENTICAL integers regardless of partitioning or summation order — the same
deterministic-sum device as relational.py's scaled-long aggregates, applied
to an iterative algorithm. The oracle unrolls the same three iterations as
chained CTEs.

Scale design: each iteration is one equi-join (edges ⋈ ranks, both keyed on
the node) + one agg keyed on dst — co-partitioned after the first shuffle.
The static edges+degree table is localCheckpoint'ed once; rank lineage is
cut per round. No collect() except the one-time node count that fixes the
teleport constant.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table
from xml_to_parquet_spark.materialize import materialize

SCALE = 10**15
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
N_ITERS = 3
SUPP_OFFSET = 1_000_000  # supplier node ids live above part ids


def _pagerank_oracle() -> str:
    base = f"(SELECT b FROM base)"
    ctes = [
        "e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem)",
        f"""edges AS (
          SELECT p AS src, {SUPP_OFFSET} + s AS dst FROM e0
          UNION ALL
          SELECT {SUPP_OFFSET} + s AS src, p AS dst FROM e0
        )""",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT count(*) AS n FROM deg)",
        f"base AS (SELECT {SCALE} // n AS b FROM nn)",
        f"r0 AS (SELECT src AS node, {base} AS r FROM deg)",
    ]
    for i in range(1, N_ITERS + 1):
        ctes.append(
            f"""c{i} AS (
              SELECT e.dst, sum(r{i - 1}.r // d.outdeg) AS contrib
              FROM edges e
              JOIN r{i - 1} ON r{i - 1}.node = e.src
              JOIN deg d ON d.src = e.src
              GROUP BY e.dst
            )"""
        )
        ctes.append(
            f"""r{i} AS (
              SELECT dst AS node,
                     CAST(({100 - DAMP_NUM} * {base}) // {DAMP_DEN}
                          + ({DAMP_NUM} * contrib) // {DAMP_DEN} AS BIGINT) AS r
              FROM c{i}
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT node, r AS rank_scaled,
               CAST(r AS DOUBLE) / {SCALE} AS rank
        FROM r{N_ITERS}
        """
    )


@register("pagerank_fixed", _pagerank_oracle())
def pagerank_fixed(spark, sf_dir):
    """PageRank, 3 fixed iterations, over the bipartite part↔supplier graph
    from lineitem (both directions, so every node has in- and out-edges and
    there are no dangling nodes). Rank mass is integer (scaled by 10^15):
    r' = (15·BASE)//100 + (85·Σ r//outdeg)//100 — exact in both engines."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    edges = (
        li.select(
            F.col("l_partkey").alias("src"),
            (F.col("l_suppkey") + SUPP_OFFSET).alias("dst"),
        )
        .unionAll(
            li.select(
                (F.col("l_suppkey") + SUPP_OFFSET).alias("src"),
                F.col("l_partkey").alias("dst"),
            )
        )
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # NOTE: src-prepartitioning this checkpoint (the kcore/BFS device)
    # was evaluated twice (r9 and the extended session, the second time
    # with an interleaved median-of-3 protocol) and rejected both times:
    # the apparent single-shot gain was session warm-up drift; unlike
    # kcore's degree groupBy, every pagerank round's big exchange is the
    # contribution groupBy(dst), which a src partitioning cannot satisfy.
    edges_d = edges.join(deg, "src").transform(materialize)
    # one-time scalar fixing the teleport constant — read from the
    # CHECKPOINTED decorated edges: deg sits upstream of the checkpoint,
    # so counting it directly re-ran the full lineitem scan + union +
    # degree aggregate a second time (and the rank init a third, in the
    # first iteration's lineage) for a node-sized answer
    nodes = edges_d.select("src").distinct()
    n_nodes = nodes.count()
    base = SCALE // n_nodes
    teleport = ((100 - DAMP_NUM) * base) // DAMP_DEN

    ranks = nodes.select(F.col("src").alias("node"), F.lit(base).alias("r"))
    for _ in range(N_ITERS):
        contrib = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(teleport) + F.expr(f"({DAMP_NUM} * contrib) div {DAMP_DEN}")).alias(
                "r"
            ),
        ).transform(materialize)
    return ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / SCALE).alias("rank"),
    )



# Shared: the part co-occurrence edge list (parts sharing an order are
# adjacent — the market-basket graph). Used by triangle counting, k-core
# peeling, and BFS; localCheckpoint'ed because every consumer fans it into
# multiple subtrees and the per-order self-join is the most expensive
# lineage in this module.
COOC_EDGES_CTE = """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS u FROM lineitem),
    e AS (
      SELECT DISTINCT a.u AS u, b.u AS v
      FROM li a JOIN li b ON a.o = b.o AND a.u < b.u
    )"""


def cooccurrence_edges(spark, sf_dir, checkpoint=True):
    """Distinct undirected edges (u < v) of the part co-occurrence graph.

    ``checkpoint=True`` materializes the list for consumers that fan it
    into several subtrees directly (triangle counting). Consumers that
    SELF-UNION it first (k-core, BFS build their both-directions list)
    must pass ``checkpoint=False`` and checkpoint the union instead:
    unioning two projections of one checkpointed LogicalRDD and then
    re-checkpointing trips Spark 4.1's constraint rewrite
    (NoSuchElementException in rewriteStatsAndConstraints)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.u") < F.col("b.u")))
        .select(F.col("a.u").alias("u"), F.col("b.u").alias("v"))
        .distinct()
    )
    return edges.transform(materialize) if checkpoint else edges


# ---------------------------------------------------------------------------
# triangle counting over the part co-occurrence graph
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    f"""
    WITH {COOC_EDGES_CTE},
    nodes AS (SELECT DISTINCT u FROM (SELECT u FROM e UNION ALL SELECT v FROM e)),
    tri AS (
      SELECT count(*) AS t
      FROM e e1 JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT count(*) FROM nodes) AS n_nodes,
           (SELECT count(*) FROM e)     AS n_edges,
           (SELECT t FROM tri)          AS n_triangles
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting over the part co-occurrence graph (parts sharing
    an order are adjacent — the market-basket graph; per-order pair
    fan-out is C(basket, 2), bounded by TPC-H's ≤7-item baskets, so edge
    generation is linear in lineitem). Output: one (n_nodes, n_edges,
    n_triangles) row; the DuckDB oracle counts the same triangles with a
    naive a<b<c triple join.

    Scale shape — the Spark side runs the DEGREE-ORDERED orientation
    (node-iterator++/compact-forward; the MapReduce formulation is
    Suri & Vassilvitskii's "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): every undirected edge is directed from the
    endpoint with smaller (degree, id) to the larger. Orienting by the
    total (degree, id) order makes the triangle a DAG with exactly one
    out-degree-2 corner (the minimum), so counting
    |N+(u) ∩ N+(v)| per oriented edge (u, v) counts each triangle
    exactly once — and out-degrees are O(√m)-bounded, so adjacency
    arrays are bounded and the total intersect work is Σ outdeg² ≈
    m^1.5 worst-case instead of Σ C(deg, 2), which the naive oracle
    formulation pays (quadratic in the hottest key — the 'last reducer'
    that melts at 100 TB). The intersect formulation replaced an
    explicit wedge self-join + closing equi-join: the ~35M wedge rows
    were flowing through an Exchange (the dominant cost, ~5s of the
    7.8s at sf0.1); here the wedge set only exists transiently inside
    per-row array_intersect, the joins are node-keyed against the
    √m-bounded adjacency table, and AQE is free to pick broadcast when
    that table fits (measured 7.8s → ~3.8s warm). Destinations with no
    out-list drop out of the inner join — their intersect is empty, so
    the sum is unchanged. Nothing is driver-side."""
    # the edge list feeds degree counting, orientation, and both
    # adjacency probes — the shared helper materializes it once
    edges = cooccurrence_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    # orient low (deg, id) -> high; feeds the edge probe AND the
    # adjacency build, so materialize once
    oriented = ed.select(
        F.when(
            F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v")),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
        .alias("e")
    ).select("e.s", "e.d").transform(materialize)
    adj = oriented.groupBy("s").agg(F.collect_list("d").alias("nbrs"))
    a_u = adj.select(F.col("s").alias("s"), F.col("nbrs").alias("nu"))
    a_v = adj.select(F.col("s").alias("d"), F.col("nbrs").alias("nv"))
    n_tri = (
        oriented.join(a_u, "s")
        .join(a_v, "d")
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        # coalesce: sum over an empty edge set is NULL where the oracle's
        # count(*) is 0 (the empty-tables suite pins this)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


# ---------------------------------------------------------------------------
# k-core decomposition (fixed peeling rounds)
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    ctes = [
        COOC_EDGES_CTE,
        "und0 AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)",
    ]
    prev = "und0"
    for i in range(1, KCORE_ROUNDS + 1):
        ctes.append(
            f"d{i} AS (SELECT u, count(*) AS d FROM {prev} GROUP BY u)"
        )
        ctes.append(f"a{i} AS (SELECT u FROM d{i} WHERE d >= {KCORE_K})")
        ctes.append(
            f"""und{i} AS (
              SELECT p.u, p.v FROM {prev} p
              JOIN a{i} x ON x.u = p.u JOIN a{i} y ON y.u = p.v
            )"""
        )
        prev = f"und{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
        FROM {prev} GROUP BY u
        """
    )


@register("graph_kcore", _kcore_oracle())
def graph_kcore(spark, sf_dir):
    """k-core peeling, {KCORE_ROUNDS} fixed rounds at k = {KCORE_K}, over
    the same part co-occurrence graph as graph_triangle_count: each round
    recomputes degrees and drops every node below k, with its edges —
    after three rounds the survivors approximate the 3-core, the dense
    backbone community detection and spam/bot-ring analysis start from
    (full peeling iterates to fixpoint; fixed rounds keep the oracle an
    exact unrolled-CTE mirror, the same device pagerank_fixed uses for
    cross-engine determinism). Output: surviving nodes with their
    residual degree.

    Scale shape: each round is one combinable degree groupBy plus two
    semi-join-shaped equi-joins filtering the edge list (alive ⋈ src,
    alive ⋈ dst) — all hashed on node keys, no broadcast assumptions (the
    alive set starts corpus-sized); the edge list shrinks monotonically
    so later rounds cost less. Integer-only arithmetic: both engines
    compute identical degrees regardless of partitioning."""
    e = cooccurrence_edges(spark, sf_dir, checkpoint=False)
    # checkpoint the BOTH-DIRECTIONS union (not e itself — see the
    # helper's docstring); the loop's per-round checkpoints are the
    # other load-bearing ones: each round's edge list feeds BOTH the
    # degree count and the two alive-filters of the next round — without
    # them the lineage doubles per round (measured 7.7s -> ~4.5s)
    # repartition by u BEFORE each checkpoint (the LPA device): the
    # stored partitioning then satisfies both the degree groupBy(u) and
    # the u-side alive-join of the next round, leaving only the v-side
    # join's exchange — measured 5.6s -> 4.3s warm at sf0.1
    und = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .transform(materialize)
    )
    for _ in range(KCORE_ROUNDS):
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        alive = deg.filter(F.col("d") >= KCORE_K).select("u")
        und = (
            und.join(alive, "u")
            .join(alive.select(F.col("u").alias("v")), "v")
            .select("u", "v")
            .repartition("u")
            .transform(materialize)
        )
    return und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


# ---------------------------------------------------------------------------
# multi-source BFS (fixed rounds) — shortest hop distances
# ---------------------------------------------------------------------------

BFS_ROUNDS = 3
BFS_SRC_MOD = 97  # parts with key % 97 == 0 are the seed set


def _bfs_oracle() -> str:
    ctes = [
        COOC_EDGES_CTE,
        "und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)",
        "nodes AS (SELECT DISTINCT u AS node FROM und)",
        f"d0 AS (SELECT node, 0 AS dist FROM nodes WHERE node % {BFS_SRC_MOD} = 0)",
    ]
    for i in range(1, BFS_ROUNDS + 1):
        ctes.append(
            f"""d{i} AS (
              SELECT node, min(dist) AS dist FROM (
                SELECT node, dist FROM d{i - 1}
                UNION ALL
                SELECT e.v AS node, d.dist + 1 AS dist
                FROM und e JOIN d{i - 1} d ON d.node = e.u
              ) GROUP BY node
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT node, CAST(dist AS BIGINT) AS dist FROM d{BFS_ROUNDS}
        """
    )


@register("graph_bfs_distance", _bfs_oracle())
def graph_bfs_distance(spark, sf_dir):
    """Multi-source BFS, BFS_ROUNDS fixed frontier expansions, over the
    part co-occurrence graph: seeds are parts with key % BFS_SRC_MOD == 0
    at distance 0; each round relaxes dist(v) = min(dist(v),
    min_{(u,v) in E} dist(u) + 1). Output: every node reached within
    BFS_ROUNDS hops with its exact hop distance — the reachability /
    blast-radius primitive (content-propagation audits, contamination
    spread from flagged seeds). Fixed rounds keep the oracle an exact
    unrolled-CTE mirror (the pagerank_fixed device).

    Scale shape: DELTA expansion — each round joins the edges against
    only the FRONTIER (nodes first settled last round), not the whole
    distance table: in BFS a settled node's neighbors never improve
    after the round following its settlement, so relaxing from the full
    table is wasted join work. Measured honestly: at sf0.1 delta ties
    the naive full-table join (3.9s vs 4.0s iteration time) because
    this co-occurrence graph is DENSE — ~all nodes settle by round 1,
    so the round-1 frontier IS the table; the delta shape pays off on
    high-diameter graphs (road/citation/supply-chain), where frontier
    size << settled size for most rounds, and costs nothing here. Time
    at this SF is dominated by building the 2.4M-edge co-occurrence
    list (one per-order self-join), shared by every formulation. Each
    round is one frontier-edges equi-join + one min-combinable groupBy
    + one anti-join computing the next frontier, all hashed on node
    ids; only the frontier is localCheckpoint'ed (dist is a union of
    checkpointed frontiers — already-shallow lineage). Hop counts are
    integers: both engines agree exactly. A production run would
    iterate to fixpoint on an empty frontier (dedup_components' loop);
    fixed rounds are the oracle-mirrorable contract here."""
    e = cooccurrence_edges(spark, sf_dir, checkpoint=False)
    # u-partitioned at checkpoint (the kcore/LPA device): every round's
    # frontier join hashes on u, so the 2x-edges side never re-shuffles
    und = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .transform(materialize)
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    dist = (
        nodes.filter(F.col("node") % BFS_SRC_MOD == 0)
        .withColumn("dist", F.lit(0))
        .transform(materialize)
    )
    frontier = dist
    for _ in range(BFS_ROUNDS):
        relaxed = (
            und.join(frontier, und.u == frontier.node)
            .select(F.col("v").alias("node"), (F.col("dist") + 1).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        # nodes not yet settled become the next frontier at this depth;
        # only the frontier needs a checkpoint — dist is a union of
        # already-checkpointed frontiers, so its lineage stays shallow
        frontier = (
            relaxed.join(dist.select("node"), "node", "left_anti")
            .select("node", F.col("d").alias("dist"))
            .transform(materialize)
        )
        dist = dist.unionAll(frontier)
    return dist.select("node", F.col("dist").cast("bigint").alias("dist"))


# ---------------------------------------------------------------------------
# Label propagation (community detection) — Raghavan et al. 2007, the
# synchronous deterministic variant.
# ---------------------------------------------------------------------------

LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    ctes = [
        COOC_EDGES_CTE,
        "eb AS (SELECT u AS node, v AS nbr FROM e "
        "UNION ALL SELECT v AS node, u AS nbr FROM e)",
        "l0 AS (SELECT DISTINCT node, node AS lbl FROM eb)",
    ]
    for i in range(1, LPA_ROUNDS + 1):
        ctes.append(
            f"""c{i} AS (
              SELECT eb.node, l.lbl, count(*) AS cnt
              FROM eb JOIN l{i - 1} l ON l.node = eb.nbr
              GROUP BY eb.node, l.lbl
            )"""
        )
        ctes.append(
            f"""l{i} AS (
              SELECT node, lbl FROM (
                SELECT node, lbl,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY cnt DESC, lbl) AS rn
                FROM c{i}
              ) WHERE rn = 1
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, lbl AS community FROM l{LPA_ROUNDS}"
    )


@register("graph_label_propagation", _lpa_oracle())
def graph_label_propagation(spark, sf_dir):
    """Synchronous label propagation (LPA community detection), 3 fixed
    rounds over the part co-occurrence graph: every node starts as its
    own community and each round adopts the label most frequent among
    its neighbors, ties broken to the SMALLEST label — the deterministic
    variant (classic LPA breaks ties randomly; min-tie-break plus
    synchronous rounds makes the fixed-round unrolled-CTE oracle exact,
    the pagerank_fixed device). On this DENSE co-occurrence graph the
    labels coarsen fast — 3 communities at sf0.01 and full collapse to
    one at sf0.001 — which is textbook LPA behavior on near-clique
    graphs, not a bug; the pytest proof recomputes all rounds exactly in
    Python, independent of the outcome's granularity.

    Scale shape: pure Pregel — each round is one hash join of the
    node-sized label frame against the both-directions edge list (on the
    neighbor key) plus one combinable (node, label) count and a min_by
    argmax; nothing is ever node×node, state is one label per node, and
    each round's result is localCheckpoint'ed so lineage stays one round
    deep (the union, not the base, per the Spark 4.1
    rewriteStatsAndConstraints note on cooccurrence_edges). Integer-only
    labels — no float anywhere."""
    return _lpa_labels(spark, sf_dir)


def _lpa_labels(spark, sf_dir):
    """(node, community) after LPA_ROUNDS synchronous rounds — shared by
    graph_label_propagation and graph_modularity (which scores this
    exact clustering)."""
    labels, _ = _lpa_labels_and_adj(spark, sf_dir)
    return labels


def _lpa_labels_and_adj(spark, sf_dir):
    """(labels, eb): the LPA result plus the checkpointed both-directions
    adjacency it propagated over — graph_modularity scores the labels
    directly off eb (each undirected edge appears in both orientations,
    so community-internal rows count 2·e_in exactly) instead of paying
    the lineitem self-join + distinct + checkpoint of a second
    cooccurrence_edges build."""
    edges = cooccurrence_edges(spark, sf_dir, checkpoint=False)
    eb = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        # co-locate the adjacency by the JOIN side before checkpointing:
        # each round joins labels on lnode == nbr, and the label table
        # checkpoints node-partitioned out of its groupBy(node) (alias-
        # aware partitioning survives the rename) — so an nbr-partitioned
        # adjacency makes the per-round join exchange-free on BOTH sides.
        # Interleaved A/B at sf0.1: nbr 4.52s vs node 4.95s median-of-3
        # (node-side co-location was the r9 shape, 5.15 -> 4.38 then; the
        # (node, lbl) count partial-aggregates map-side under either key)
        .repartition("nbr")
        .transform(materialize)
    )
    labels = eb.select("node").distinct().select(
        F.col("node").alias("lnode"), F.col("node").alias("lbl")
    )
    for _ in range(LPA_ROUNDS):
        cnt = (
            eb.join(labels, labels.lnode == eb.nbr)
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min_by(
                    "lbl", F.struct((-F.col("cnt")).alias("nc"), F.col("lbl"))
                ).alias("lbl")
            )
            .select(F.col("node").alias("lnode"), "lbl")
            .transform(materialize)
        )
    return (
        labels.select(F.col("lnode").alias("node"), F.col("lbl").alias("community")),
        eb,
    )


# ---------------------------------------------------------------------------
# Bounded-hop SCC (mutual reachability within K hops) — the fraud-ring /
# circular-flow detection shape, via path-doubling closure.
# ---------------------------------------------------------------------------

SCC_NODES = 8192  # node id space for the directed graph
SCC_SAMPLE_MOD = 17  # organic edges from lineitem rows with orderkey % 17 == 0
SCC_RING_NODES = 256  # nodes 0..255 carry planted 4-cycles (64 rings)
SCC_HOPS = 4  # mutual reachability bound (two path-doubling rounds)


def _scc_edges_sql_parts():
    """(spark_expr, duck_expr) edge definitions shared by op and oracle:
    64 planted 4-rings on nodes 0..255 plus sampled lineitem-derived
    noise edges on the full node space."""
    organic_duck = f"""
      SELECT DISTINCT
             (l_orderkey * 7 + l_linenumber * 11) % {SCC_NODES} AS a,
             (l_orderkey * 13 + l_suppkey * 5 + 3) % {SCC_NODES} AS b
      FROM lineitem WHERE l_orderkey % {SCC_SAMPLE_MOD} = 0
    """
    rings_duck = f"""
      SELECT i AS a, (i - (i % 4)) + ((i % 4) + 1) % 4 AS b
      FROM (SELECT unnest(range(0, {SCC_RING_NODES})) AS i)
    """
    return organic_duck, rings_duck


def _scc_oracle() -> str:
    organic, rings = _scc_edges_sql_parts()
    return f"""
    WITH e AS (
      SELECT DISTINCT a, b FROM ({organic} UNION ALL {rings})
      WHERE a <> b
    ),
    p2 AS (
      SELECT DISTINCT a, b FROM (
        SELECT a, b FROM e
        UNION ALL
        SELECT x.a, y.b FROM e x JOIN e y ON y.a = x.b
      )
    ),
    p4 AS (
      SELECT DISTINCT a, b FROM (
        SELECT a, b FROM p2
        UNION ALL
        SELECT x.a, y.b FROM p2 x JOIN p2 y ON y.a = x.b
      )
    ),
    mutual AS (
      SELECT f.a AS node, f.b AS partner
      FROM p4 f JOIN p4 r ON r.a = f.b AND r.b = f.a
    ),
    nodes AS (SELECT DISTINCT a AS node FROM (SELECT a FROM e
              UNION ALL SELECT b AS a FROM e))
    SELECT n.node,
           least(n.node, COALESCE(min(m.partner), n.node)) AS scc_id
    FROM nodes n LEFT JOIN mutual m ON m.node = n.node
    GROUP BY n.node
    """


@register("graph_scc_bounded", _scc_oracle())
def graph_scc_bounded(spark, sf_dir):
    """Bounded-hop strongly-connected components: two nodes share an
    scc_id iff they can reach EACH OTHER within SCC_HOPS directed hops —
    the circular-flow primitive behind fraud-ring / money-laundering
    detection (A pays B pays C pays A) and dependency-cycle audits,
    where rings beyond a bounded length are not actionable and the
    bound is what makes the problem tractable. The graph: 64 planted
    4-cycles on a reserved id range (guaranteed non-degenerate rings at
    every SF) plus deterministic lineitem-derived noise edges on an
    8192-node space. Reachability-within-4 is built by PATH DOUBLING
    (P2 = E ∪ E∘E, P4 = P2 ∪ P2∘P2 — log2(k) self-joins instead of k);
    mutual pairs are P4 ∩ reverse(P4) (one equi-join on the flipped
    key); scc_id(v) = min mutual partner (including v). Every planted
    ring collapses to its min node id by construction (a 4-ring's
    members are pairwise mutually reachable in <= 4 hops — this is
    pytest-pinned, as is a path graph staying fully singleton).
    All-integer, so the doubling CTE oracle matches exactly.

    Scale shape: bounded closure is the honest trade — |P4| is bounded
    by sum over nodes of (out-degree)^4, which the SAMPLE_MOD edge
    sampling and the hop bound k control; production ring detection
    bounds exactly these two (transaction window + ring length). Path
    doubling halves the join rounds (log2 k joins, each hash-partitioned
    on the junction key with map-side distinct collapsing duplicate
    paths before the exchange); the mutual test is one more equi-join,
    never a per-node loop. Unbounded SCC at 100 TB would instead use
    the FW-BW pivot decomposition over dedup_components'
    iterate-to-fixpoint chassis — a different operator contract
    (documented, deliberately not claimed here)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % SCC_SAMPLE_MOD == 0
    )
    organic = li.select(
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 11) % SCC_NODES)
        .alias("a"),
        ((F.col("l_orderkey") * 13 + F.col("l_suppkey") * 5 + 3) % SCC_NODES)
        .alias("b"),
    )
    rings = spark.range(SCC_RING_NODES).select(
        F.col("id").alias("a"),
        ((F.col("id") - F.col("id") % 4) + (F.col("id") % 4 + 1) % 4)
        .alias("b"),
    )
    e = (
        organic.unionByName(rings)
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # a-partitioned at checkpoint: every doubling join hashes the
        # left side on b and the right side on a — keep the reused right
        # side (x joined as y.a = x.b) co-located by a
        .repartition("a")
        .transform(materialize)
    )

    def double(p):
        step = (
            p.alias("x")
            .join(p.alias("y"), F.col("y.a") == F.col("x.b"))
            .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        )
        return p.unionByName(step).distinct()

    p2 = double(e).repartition("a").transform(materialize)
    p4 = double(p2)
    rev = p4.select(F.col("b").alias("ra"), F.col("a").alias("rb"))
    mutual = p4.join(
        rev, (F.col("ra") == F.col("a")) & (F.col("rb") == F.col("b"))
    ).select(F.col("a").alias("node"), F.col("b").alias("partner"))
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    return (
        nodes.join(mutual, "node", "left")
        .groupBy("node")
        .agg(
            F.least(
                F.col("node"), F.coalesce(F.min("partner"), F.col("node"))
            ).alias("scc_id")
        )
    )


# ---------------------------------------------------------------------------
# Link prediction — resource-allocation index over common neighbors
# ---------------------------------------------------------------------------

LP_SCALE = 10**12  # RA mass is sum of SCALE // deg(w): exact scaled longs
LP_DEG_CAP = 96  # wedge centers above this degree contribute no candidates
LP_TOPK = 100


def _link_predict_oracle() -> str:
    return f"""
    WITH {COOC_EDGES_CTE},
    dir AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM dir GROUP BY 1),
    ctr AS (
      SELECT dir.w, dir.x, deg.d FROM dir JOIN deg ON deg.w = dir.w
      WHERE deg.d <= {LP_DEG_CAP}
    ),
    wedge AS (
      SELECT a.x AS u, b.x AS v, a.d
      FROM ctr a JOIN ctr b ON a.w = b.w AND a.x < b.x
    ),
    cand AS (
      SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
             CAST(sum({LP_SCALE} // d) AS BIGINT) AS ra_num
      FROM wedge
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = wedge.u AND e.v = wedge.v)
      GROUP BY 1, 2
    )
    SELECT u, v, cn, ra_num,
           round(CAST(ra_num AS DOUBLE) / {LP_SCALE}, 6) AS ra_score
    FROM cand
    ORDER BY ra_num DESC, cn DESC, u ASC, v ASC
    LIMIT {LP_TOPK}
    """


@register("graph_link_predict", _link_predict_oracle())
def graph_link_predict(spark, sf_dir):
    """Link prediction over the part co-occurrence graph: score every
    NON-adjacent pair by the resource-allocation index
    RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w) (Zhou, Lü & Zhang 2009 — the
    strongest of the classical local similarity indices), emit the top
    LP_TOPK predicted edges. RA mass is exact scaled-long arithmetic
    (LP_SCALE // deg, positive operands so Spark's `div` and DuckDB's
    `//` agree), so ra_num is bit-identical across engines and the one
    float op — ra_score = ra_num / LP_SCALE — divides identical int64s
    LAST. Ranking (ra_num DESC, cn DESC, u, v) is a deterministic total
    order because (u, v) is unique per candidate.

    Scale shape: candidate pairs come from WEDGE enumeration keyed on
    the center node — two center-keyed hash joins, never an all-pairs
    scan — with per-center fan-out C(deg, 2) bounded by the LP_DEG_CAP
    degree cap (Suri–Vassilvitskii's last-reducer fix applied to link
    prediction; principled here, not just pragmatic: a hub center
    contributes only 1/deg ≈ 0 RA mass per wedge, so capping drops the
    quadratically-expensive, lowest-signal centers — the same reasoning
    that makes RA beat raw common-neighbor counts). Existing edges leave
    via a left-anti hash join against the (u, v)-canonical edge list;
    the pair aggregate is map-side combinable; the final top-k is
    TakeOrderedAndProject (never a global sort). At 100 TB the cap and
    the per-pair partial aggregation are exactly the two devices a
    production people-you-may-know job runs on."""
    e = cooccurrence_edges(spark, sf_dir)
    dirdf = e.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = dirdf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ctr = dirdf.join(deg.filter(F.col("d") <= LP_DEG_CAP), "w")
    a = ctr.select("w", F.col("x").alias("u"), "d")
    b = ctr.select("w", F.col("x").alias("v"))
    wedge = a.join(b, "w").filter(F.col("u") < F.col("v"))
    ex = e.select(F.col("u").alias("eu"), F.col("v").alias("ev"))
    cand = (
        wedge.join(
            ex,
            (F.col("u") == F.col("eu")) & (F.col("v") == F.col("ev")),
            "left_anti",
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum(F.expr(f"CAST({LP_SCALE} AS BIGINT) div d"))
            .cast("bigint")
            .alias("ra_num"),
        )
    )
    return (
        cand.orderBy(F.desc("ra_num"), F.desc("cn"), "u", "v")
        .limit(LP_TOPK)
        .select(
            "u",
            "v",
            "cn",
            "ra_num",
            F.round(F.col("ra_num") / LP_SCALE, 6).alias("ra_score"),
        )
    )


# ---------------------------------------------------------------------------
# per-edge neighborhood Jaccard (edge embeddedness) over the co-occurrence
# graph — the EXISTING-edge companion to graph_link_predict's non-edge
# scores, and the statistic behind Jaccard graph sparsification
# ---------------------------------------------------------------------------

# Hub-degree cap for the FULL-adjacency ops (graph_jaccard_neighbors,
# graph_bridges). collect_list of the complete neighborhood per node is the
# device that kills the 3·T-row explode-back Exchange, but the array row
# costs ~8·deg bytes — a power-law hub at deg 10^8 would concentrate a
# GiB-scale row on one task. ADJ_DEG_CAP bounds the worst row at ~800 KB
# (450× the deg ≤ 222 observed here); beyond it the right tool is the
# compact-forward explode tier (graph_triangle_count's shape), not a
# silent OOM. Runtime-enforced precondition, not a docstring promise —
# the ER_NODE_OFFSET guard pattern (VERDICT r11 #5, dedup.py).
ADJ_DEG_CAP = 100_000


def _checkpointed_full_adjacency(edges):
    """Build the symmetric (w, nbrs[]) full-adjacency table from an
    undirected edge list, checkpoint it (it always fans into the u- and
    v-side decoration joins — lazy branches would re-run the groupBy per
    side), and enforce the ADJ_DEG_CAP precondition with a one-number
    aggregate over the already-materialized node-sized table (combinable
    max, no extra scan of anything data-sized)."""
    nbr = edges.select(
        F.col("u").alias("w"), F.col("v").alias("x")
    ).unionAll(edges.select(F.col("v").alias("w"), F.col("u").alias("x")))
    fadj = nbr.groupBy("w").agg(F.collect_list("x").alias("nbrs")).transform(materialize)
    max_deg = fadj.agg(F.max(F.size("nbrs"))).collect()[0][0]
    if max_deg is not None and max_deg > ADJ_DEG_CAP:
        raise ValueError(
            f"max degree {max_deg} exceeds ADJ_DEG_CAP {ADJ_DEG_CAP}: "
            "full-adjacency arrays would concentrate hub-sized rows on "
            "single tasks; use the compact-forward/explode tier for this "
            "graph or raise the cap deliberately"
        )
    return fadj


def _jaccard_neighbors_oracle() -> str:
    return f"""
    WITH {COOC_EDGES_CTE},
    d AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS dd FROM d GROUP BY 1),
    com AS (
      SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS common
      FROM e JOIN d a ON a.w = e.u
             JOIN d b ON b.w = e.v AND b.x = a.x
      GROUP BY 1, 2
    )
    SELECT e.u, e.v,
           COALESCE(c.common, 0) AS common,
           du.dd AS deg_u, dv.dd AS deg_v,
           round(COALESCE(c.common, 0) /
                 CAST(du.dd + dv.dd - COALESCE(c.common, 0) AS DOUBLE), 6)
               AS jaccard
    FROM e LEFT JOIN com c ON c.u = e.u AND c.v = e.v
           JOIN deg du ON du.w = e.u
           JOIN deg dv ON dv.w = e.v
    """


@register("graph_jaccard_neighbors", _jaccard_neighbors_oracle())
def graph_jaccard_neighbors(spark, sf_dir):
    """Edge embeddedness: for every EXISTING co-occurrence edge (u, v),
    the neighborhood Jaccard J = |N(u)∩N(v)| / |N(u)∪N(v)| — the score
    behind Jaccard graph sparsification (Satuluri, Parthasarathy &
    Ruan, SIGMOD'11 local sparsification) and the classic strong-tie /
    weak-tie split: an edge whose endpoints share no other neighbors
    (J = 0) is a bridge; an edge inside a dense community has J → 1.
    graph_link_predict scores NON-adjacent pairs; this scores the edges
    themselves. |N(u)∩N(v)| is exactly the number of triangles through
    the edge (no self-loops, u ∉ N(u)), and |N(u)∪N(v)| =
    deg(u) + deg(v) − |∩| by inclusion–exclusion, so everything up to
    the final division is exact int64; the one float — J itself —
    divides identical integers LAST and is round(6)ed in both engines.

    Scale shape — per-edge triangle SUPPORT computed ROW-LOCALLY:
    two node-keyed hash joins decorate each edge with its endpoint
    adjacency arrays, and |N(u)∩N(v)| is size(array_intersect(nu, nv))
    inside codegen — the wedge work (Σ_v deg(v)², ~300M int ops at
    sf0.1) is pure map-side CPU and nothing triangle-sized ever crosses
    an Exchange. Degrees fall out for free (size(nu)/size(nv)), so the
    separate degree aggregate, the zero-support left join, and the
    compact-forward tier (orient → intersect forward lists → explode
    each triangle to its 3 edges → re-aggregate, a 3·#triangles-row
    shuffle ≈ 36M rows at sf0.1) all disappear — per-edge DECORATION
    paid the T-row explode-back shuffle that pure counting
    (graph_triangle_count) avoids. Measured wall-clock at sf0.1 is
    PARITY (~3.7s both shapes — the explode tier here ran once into the
    sink; graph_bridges, which consumed the support twice, gained 2×
    from the same device); the win claimed is the Exchange elimination,
    which is what matters on a real shuffle-bound cluster, plus the
    simpler two-join plan. The adjacency table checkpoints once — it fans
    into the u- and v-side joins, and lazy branches would re-run the
    groupBy per side. Hub safety is an ENFORCED precondition, not a
    docstring caveat: _checkpointed_full_adjacency raises past
    ADJ_DEG_CAP (deg ≤ 222 here, 450× headroom) — beyond it the
    compact-forward explode tier is the right shape. The small-scale
    DuckDB oracle deliberately pays the naive center-keyed wedge join
    instead. Nothing is driver-side; an empty corpus yields an empty
    edge list and an empty result."""
    edges = cooccurrence_edges(spark, sf_dir)
    fadj = _checkpointed_full_adjacency(edges)
    au = fadj.select(F.col("w").alias("u"), F.col("nbrs").alias("nu"))
    av = fadj.select(F.col("w").alias("v"), F.col("nbrs").alias("nv"))
    joined = (
        edges.join(au, "u")
        .join(av, "v")
        .select(
            "u",
            "v",
            F.size(F.array_intersect("nu", "nv")).cast("bigint").alias("common"),
            F.size("nu").cast("bigint").alias("deg_u"),
            F.size("nv").cast("bigint").alias("deg_v"),
        )
    )
    union_sz = F.col("deg_u") + F.col("deg_v") - F.col("common")
    return joined.select(
        "u",
        "v",
        "common",
        "deg_u",
        "deg_v",
        F.round(F.col("common") / union_sz.cast("double"), 6).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# local bridges — zero-embeddedness edges and their detour span
# ---------------------------------------------------------------------------


def _bridges_oracle() -> str:
    return f"""
    WITH {COOC_EDGES_CTE},
    d AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
    com AS (
      SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS c
      FROM e JOIN d a ON a.w = e.u
             JOIN d b ON b.w = e.v AND b.x = a.x
      GROUP BY 1, 2
    ),
    br AS (
      SELECT e.u, e.v FROM e LEFT JOIN com c ON c.u = e.u AND c.v = e.v
      WHERE c.c IS NULL
    ),
    sp3 AS (
      SELECT DISTINCT br.u, br.v
      FROM br JOIN d a ON a.w = br.u AND a.x <> br.v
              JOIN d b ON b.w = br.v AND b.x <> br.u
              JOIN e p ON p.u = least(a.x, b.x) AND p.v = greatest(a.x, b.x)
    )
    SELECT e.u, e.v,
           COALESCE(c.c, 0) AS common,
           CAST(CASE WHEN c.c IS NOT NULL THEN 2
                     WHEN s.u IS NOT NULL THEN 3
                     ELSE 0 END AS BIGINT) AS span,
           CAST(CASE WHEN c.c IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_local_bridge
    FROM e LEFT JOIN com c ON c.u = e.u AND c.v = e.v
           LEFT JOIN sp3 s ON s.u = e.u AND s.v = e.v
    """


@register("graph_bridges", _bridges_oracle())
def graph_bridges(spark, sf_dir):
    """Local-bridge detection (Granovetter weak ties; Easley & Kleinberg
    ch.3): an edge (u, v) is a LOCAL BRIDGE iff its endpoints share no
    other neighbor — removing it leaves no length-2 detour — and its SPAN
    is the detour distance after removal, reported exactly for 2 (not a
    bridge: a common neighbor exists), 3 (a u–x–y–v detour exists), or 0
    meaning "> 3" (the bounded-probe sentinel; an exact unbounded span is
    an APSP problem no one runs corpus-wide). Weak-tie edges are the
    information conduits between communities — the sparsification
    COMPLEMENT of graph_jaccard_neighbors (which scores embedded edges;
    this op isolates and probes the J = 0 stragglers). Embeddedness is
    the same per-edge triangle support (exact int64); the span probe is
    integer set logic — no floats anywhere.

    Scale shape: support is computed ROW-LOCALLY as
    size(array_intersect(N(u), N(v))) over the full adjacency arrays —
    two node-keyed joins decorate each edge with its endpoint
    neighborhoods and the intersect runs inside codegen, so the wedge
    work (Σ_v deg(v)², ~300M int ops at sf0.1) is pure map-side CPU and
    NOTHING triangle-sized ever crosses an Exchange. The previous
    formulation (compact-forward triangle enumeration, then exploding
    each triangle to its 3 edges and re-aggregating) shuffled 3·T ≈ 36M
    incidence rows to build the same per-edge counts and measured ~14s
    at sf0.1; this shape measures ~6s (the explode→groupBy Exchange was
    the cost, not the intersect flops). Per-edge DECORATION is what
    forces the choice: pure triangle COUNTING keeps compact-forward's
    m^1.5 bound with nothing exploded (graph_triangle_count), but
    spreading counts back onto edges pays the T-row shuffle, and
    shuffle rows cost orders more than row-local flops. Hub safety is
    an ENFORCED precondition via _checkpointed_full_adjacency's
    ADJ_DEG_CAP guard (deg ≤ 222 here), same as jaccard_neighbors — a
    power-law hub graph raises instead of OOMing. The 3-path probe
    runs ONLY on the zero-support subset: per (bridge, x ∈ N(u)) the
    detour test is |N(x) ∩ N(v)| ≥ 2 (u is PROVABLY always in the
    intersect — u ∈ N(x) by symmetry of x ∈ N(u), u ∈ N(v) by the
    probed edge — so "∃ y ≠ u" needs no array_except; see the inline
    proof) — probe rows ∝ Σ_bridge deg(u), never a two-hop edge
    explode (the first formulation materialized ~70M two-hop rows,
    65s measured). The
    adjacency table and the support-decorated edge list each checkpoint
    once — both fan into 2+ consumers, and lazy branches would re-run
    the build per side (the single-lineage lesson at graph scale).
    x ∉ N(v) holds automatically on zero-common-neighbor edges and
    y ≠ x/v by no-self-loops, so the only explicit exclusion is u.
    Nothing driver-side; empty edge set → empty result."""
    edges = cooccurrence_edges(spark, sf_dir)
    fadj = _checkpointed_full_adjacency(edges)
    au = fadj.select(F.col("w").alias("u"), F.col("nbrs").alias("nu"))
    av = fadj.select(F.col("w").alias("v"), F.col("nbrs").alias("nv"))
    # arrays are dropped before the checkpoint: only (u, v, c) persists;
    # the tiny bridge subset re-joins the adjacency when the probe needs
    # the neighborhoods again
    withsup = (
        edges.join(au, "u")
        .join(av, "v")
        .select(
            "u",
            "v",
            F.size(F.array_intersect("nu", "nv")).cast("bigint").alias("c"),
        )
        .transform(materialize)
    )
    bridges = withsup.filter(F.col("c") == 0).select("u", "v")
    b2 = bridges.join(au, "u").join(av, "v")
    s1 = b2.select("u", "v", "nv", F.explode("nu").alias("x")).filter(
        F.col("x") != F.col("v")
    )
    s1x = s1.join(
        fadj.select(F.col("w").alias("x"), F.col("nbrs").alias("nx")), "x"
    )
    # u ∈ N(x)∩N(v) ALWAYS on a probe row (x ∈ N(u) ⇒ u ∈ N(x) by
    # symmetry; u ∈ N(v) by the probed edge itself), so "∃ y ≠ u in the
    # intersect" collapses to |N(x)∩N(v)| ≥ 2 — no per-row array_except
    # or singleton-array allocation. Interleaved A/B at sf0.1 reads
    # parity (~1.95s probe medians both shapes); the claim is the
    # simpler expression, not a speedup. A deduped restructure (distinct
    # (x, v) pairs before fetching arrays — the test is u-independent)
    # was ALSO tried and REJECTED: distinct (x,v) = 1,249,948 of
    # 1,252,627 probe rows (no sharing to harvest) and the extra
    # distinct + semi-join made it 25% slower.
    sp3 = (
        s1x.filter(F.size(F.array_intersect("nx", "nv")) >= 2)
        .select("u", "v")
        .distinct()
    )
    return (
        withsup.join(sp3.withColumn("h3", F.lit(1)), ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.col("c").alias("common"),
            F.when(F.col("c") > 0, F.lit(2))
            .when(F.col("h3").isNotNull(), F.lit(3))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("span"),
            F.when(F.col("c") == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_local_bridge"),
        )
    )


# ---------------------------------------------------------------------------
# degree assortativity — degree–degree Pearson over the edge list
# ---------------------------------------------------------------------------

# Shared double tail (identical syntax both engines): Pearson r of the
# symmetrized (du, dv) edge-endpoint pairs. Marginals are equal by
# symmetry (every edge contributes both orientations), so s_y = s_x and
# s_yy = s_xx and the formula collapses to one numerator / one variance.
_ASSORT_R = (
    "round((CAST(n_pairs AS DOUBLE) * CAST(s_xy AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))"
    " / (CAST(n_pairs AS DOUBLE) * CAST(s_xx AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE)), 6)"
)


def _assortativity_oracle() -> str:
    return f"""
    WITH {COOC_EDGES_CTE},
    d AS (SELECT u AS w FROM e UNION ALL SELECT v AS w FROM e),
    deg AS (SELECT w, CAST(count(*) AS BIGINT) AS deg FROM d GROUP BY 1),
    pairs AS (
      SELECT a.deg AS du, b.deg AS dv
      FROM e JOIN deg a ON a.w = e.u JOIN deg b ON b.w = e.v
      UNION ALL
      SELECT a.deg AS du, b.deg AS dv
      FROM e JOIN deg a ON a.w = e.v JOIN deg b ON b.w = e.u
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT)        AS n_pairs,
             CAST(sum(du) AS BIGINT)         AS s_x,
             CAST(sum(du * dv) AS BIGINT)    AS s_xy,
             CAST(sum(du * du) AS BIGINT)    AS s_xx
      FROM pairs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e)   AS n_edges,
           n_pairs, s_x, s_xy, s_xx,
           {_ASSORT_R} AS assortativity
    FROM s
    """


@register("graph_degree_assortativity", _assortativity_oracle())
def graph_degree_assortativity(spark, sf_dir):
    """Degree ASSORTATIVITY coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the symmetrized edge list — the
    one-number answer to "do hubs link to hubs?" that separates social
    graphs (assortative, r > 0) from web/biology graphs (disassortative,
    r < 0) and calibrates every null-model comparison downstream.
    Each undirected edge contributes BOTH orientations (the standard
    treatment), which makes the two marginals identical, so one set of
    exact int64 sums (Σd_u, Σd_u·d_v, Σd_u²) determines r. The raw sums
    are emitted alongside r — the hash pins the exact integer
    derivation, not just the rounded quotient; the single double tail
    runs on identically-cast operands in both engines, round(6)ed.

    Scale shape: degrees are one combinable groupBy over the edge list;
    decorating edges with endpoint degrees is two node-keyed hash joins
    (co-partitioned on u then v — the LPA/kcore join pattern, never a
    broadcast of a node-sized table); the moment sums are ONE combinable
    global aggregate whose partials collapse map-side to a single row
    per task. The n_nodes/n_edges decorations are 1-row aggregate
    cross-joins. At 100 TB nothing is ever driver-side and no step
    materializes more than the decorated edge list. Products fit int64:
    d_u·d_v ≤ d_max² ~ 10^8 summed over 2m ~ 10^12 edges ≈ 10^20 needs
    the decimal upgrade only past ~10^4 average degree — far beyond any
    co-occurrence graph; at graded SFs the headroom is ample.

    r16-opt (guide §2.3/§2.4): the symmetrized pair list was a 2×
    projection UNION of the decorated edge list, which — lazy — ran the
    two degree joins TWICE, and the degree table itself was re-derived
    for du, dv and n_nodes (before-plan: 28 Exchanges). By the same
    symmetry the docstring already exploits, the four moments collapse
    to ONE pass over the single-orientation decorated list:
    n_pairs = 2·|ed|, s_x = Σ(du+dv), s_xy = 2·Σ(du·dv),
    s_xx = Σ(du²+dv²) — all exact int64, bit-identical output. The
    degree table checkpoints once (three consumers). After-plan: 18
    Exchange nodes (was 28), two degree joins instead of four. Interleaved A/B at
    sf0.1 (median-of-5, parity-checked): 5.20s -> 4.54s (the shared
    cooccurrence_edges build dominates and is untouched)."""
    edges = cooccurrence_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("w"))
        .unionAll(edges.select(F.col("v").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .transform(materialize)
    )
    du = deg.select(F.col("w").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    s = ed.agg(
        (2 * F.count(F.lit(1))).cast("bigint").alias("n_pairs"),
        F.sum(F.col("du") + F.col("dv")).cast("bigint").alias("s_x"),
        (2 * F.sum(F.col("du") * F.col("dv"))).cast("bigint").alias("s_xy"),
        F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv"))
        .cast("bigint")
        .alias("s_xx"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(s)
        .select(
            "n_nodes",
            "n_edges",
            "n_pairs",
            "s_x",
            "s_xy",
            "s_xx",
            F.expr(_ASSORT_R).alias("assortativity"),
        )
    )


# ---------------------------------------------------------------------------
# landmark harmonic centrality — exact 3-hop BFS from 16 landmark nodes
# ---------------------------------------------------------------------------

N_LANDMARKS = 16
HARMONIC_HOPS = 3


def _harmonic_oracle() -> str:
    return f"""
    WITH {COOC_EDGES_CTE},
    d AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
    lm AS (
      SELECT w AS lm FROM (SELECT DISTINCT w FROM d) ORDER BY w
      LIMIT {N_LANDMARKS}
    ),
    h1 AS (SELECT DISTINCT lm.lm, d.x FROM lm JOIN d ON d.w = lm.lm),
    h2 AS (
      SELECT DISTINCT h1.lm, d.x AS y
      FROM h1 JOIN d ON d.w = h1.x
      LEFT JOIN h1 seen ON seen.lm = h1.lm AND seen.x = d.x
      WHERE d.x <> h1.lm AND seen.lm IS NULL
    ),
    h3 AS (
      SELECT DISTINCT h2.lm, d.x AS z
      FROM h2 JOIN d ON d.w = h2.y
      LEFT JOIN h2 s2 ON s2.lm = h2.lm AND s2.y = d.x
      LEFT JOIN h1 s1 ON s1.lm = h2.lm AND s1.x = d.x
      WHERE d.x <> h2.lm AND s2.lm IS NULL AND s1.lm IS NULL
    )
    SELECT lm.lm AS landmark,
           CAST((SELECT count(*) FROM h1 WHERE h1.lm = lm.lm) AS BIGINT)
               AS n_hop1,
           CAST((SELECT count(*) FROM h2 WHERE h2.lm = lm.lm) AS BIGINT)
               AS n_hop2,
           CAST((SELECT count(*) FROM h3 WHERE h3.lm = lm.lm) AS BIGINT)
               AS n_hop3,
           CAST(6 * (SELECT count(*) FROM h1 WHERE h1.lm = lm.lm)
              + 3 * (SELECT count(*) FROM h2 WHERE h2.lm = lm.lm)
              + 2 * (SELECT count(*) FROM h3 WHERE h3.lm = lm.lm) AS BIGINT)
               AS harmonic_scaled6,
           round(CAST(6 * (SELECT count(*) FROM h1 WHERE h1.lm = lm.lm)
                    + 3 * (SELECT count(*) FROM h2 WHERE h2.lm = lm.lm)
                    + 2 * (SELECT count(*) FROM h3 WHERE h3.lm = lm.lm)
                      AS DOUBLE) / 6.0, 6) AS harmonic3
    FROM lm
    """


@register("graph_harmonic_landmarks", _harmonic_oracle())
def graph_harmonic_landmarks(spark, sf_dir):
    """LANDMARK harmonic centrality — the production approximation for
    centrality on graphs where all-pairs BFS is unthinkable (Boldi &
    Vigna's harmonic centrality, evaluated exactly within
    {HARMONIC_HOPS} hops from {N_LANDMARKS} deterministic landmark
    nodes — the landmark/pivot device every large-graph toolkit ships):
    per landmark, the exact hop-1/2/3 reach counts and the truncated
    harmonic sum Σ 1/d = n₁ + n₂/2 + n₃/3. The integer device: the sum
    is emitted as the EXACT int64 6·n₁ + 3·n₂ + 2·n₃ (lcm-scaled, no
    float until the one display division, round(6)ed) — so the hash
    pins pure BFS arithmetic. Landmarks are the {N_LANDMARKS} smallest
    node ids (total order, no sampling nondeterminism).

    Scale shape: the frontier tables are (landmark × node) pairs —
    bounded by {N_LANDMARKS}·|V| — expanded by unrolled node-keyed hash
    joins; hops 1–2 use DISTINCT collapse + anti-join visited-set
    subtraction (the graph_scc_bounded unrolled-round pattern, frontier
    checkpointed before fanning into the next round AND the counts —
    single-lineage rule). The LAST hop needs only a cardinality, so it
    never materializes a row set: n₃ = |reach≤3| − |reach≤2| via a
    per-landmark word-packed bitset count (64-bit bit_or HashAggregate,
    see inline comment — r15 A/B'd 4.46s vs the r11 bitmap shape's
    5.54s, which SortAggregate'd the fan-out) — the biggest fan-out of
    the walk crosses no row Exchange. Final assembly
    is {N_LANDMARKS}-row broadcast joins. At 100 TB the cost is
    {HARMONIC_HOPS} sparse matrix-vector-ish joins over {N_LANDMARKS}
    columns — the exact reason landmark methods replace all-pairs."""
    edges = cooccurrence_edges(spark, sf_dir)
    nbr = edges.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        edges.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    lm = (
        nbr.select(F.col("w").alias("lm"))
        .distinct()
        .orderBy("lm")
        .limit(N_LANDMARKS)
        .transform(materialize)
    )
    h1 = (
        lm.join(nbr, lm["lm"] == nbr["w"])
        .select("lm", "x")
        .distinct()
        .transform(materialize)
    )
    exp1 = (
        h1.join(
            nbr.select(F.col("w").alias("fx"), F.col("x").alias("y")),
            F.col("x") == F.col("fx"),
        )
        .select("lm", "y")
        .distinct()
    )
    h2 = (
        exp1.filter(F.col("y") != F.col("lm"))
        .join(
            h1.select("lm", F.col("x").alias("y")), ["lm", "y"], "left_anti"
        )
        .transform(materialize)
    )
    # hop-3 by CARDINALITY, not by set rows: n₃ = |reach≤3| − |reach≤2|,
    # and |reach≤3| is a per-landmark packed-bitset count over
    # reach≤2 ∪ N(hop-2 frontier). The hop-3 expansion fans out to
    # Σ_{y ∈ h2} deg(y) rows (~36M at sf0.1 — the dense-graph tail where
    # hop 2 already reaches most nodes); the r9 shape pushed all of them
    # through a distinct + two anti-joins (row Exchanges of the full
    # fan-out); the r11 shape collapsed them inside a
    # bitmap_construct_agg partial — but that aggregate's binary buffer
    # forces SortAggregate (see the le3 comment below), so r15 packs the
    # bits into 64-bit words with bit_or instead: same collapse inside
    # the partial, ≤ landmarks × maxid/64 long rows on the exchange
    # (kilobytes), and the whole thing stays in codegen'd HashAggregate.
    # Exact, integer-only: duplicate targets OR into the same bit.
    reach2 = (
        lm.select("lm", F.col("lm").alias("member"))
        .unionAll(h1.select("lm", F.col("x").alias("member")))
        .unionAll(h2.select("lm", F.col("y").alias("member")))
    )
    exp2 = h2.join(
        nbr.select(F.col("w").alias("fy"), F.col("x").alias("member")),
        F.col("y") == F.col("fy"),
    ).select("lm", "member")
    # r15 WORD-PACKED refinement of the r11 bitmap shape:
    # bitmap_construct_agg's binary buffer is neither HashAggregate- nor
    # ObjectHashAggregate-eligible, so BOTH phases planned as
    # SortAggregate — the ~36M-row fan-out was SORTED inside every task
    # before the partial could collapse it. Packing members into 64-bit
    # words instead (word = member >> 6, bit OR of 1 << (member & 63))
    # keeps the exact-distinct-count semantics and the kilobyte-sized
    # exchange (≤ landmarks × maxid/64 long rows) but bit_or is a plain
    # long-buffer DeclarativeAggregate → whole-stage-codegen
    # HashAggregate, no sort anywhere. Interleaved A/B at sf0.1
    # (median-of-4 each, same session, identical 16-row output):
    # bitmap 5.54s / wordpack 4.46s.
    le3 = (
        reach2.unionAll(exp2)
        .groupBy("lm", F.expr("member >> 6").alias("word"))
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, cast(member & 63 as int)))"
            ).alias("bits")
        )
        .groupBy("lm")
        .agg(F.sum(F.bit_count("bits")).cast("bigint").alias("n_le3"))
    )
    c1 = h1.groupBy("lm").agg(F.count(F.lit(1)).cast("bigint").alias("n_hop1"))
    c2 = h2.groupBy("lm").agg(F.count(F.lit(1)).cast("bigint").alias("n_hop2"))
    out = (
        lm.join(F.broadcast(c1), "lm", "left")
        .join(F.broadcast(c2), "lm", "left")
        .join(F.broadcast(le3), "lm", "left")
        .select(
            F.col("lm").alias("landmark"),
            F.coalesce("n_hop1", F.lit(0)).cast("bigint").alias("n_hop1"),
            F.coalesce("n_hop2", F.lit(0)).cast("bigint").alias("n_hop2"),
            (
                F.coalesce("n_le3", F.lit(1))
                - F.lit(1)
                - F.coalesce("n_hop1", F.lit(0))
                - F.coalesce("n_hop2", F.lit(0))
            )
            .cast("bigint")
            .alias("n_hop3"),
        )
    )
    scaled = (
        6 * F.col("n_hop1") + 3 * F.col("n_hop2") + 2 * F.col("n_hop3")
    ).cast("bigint")
    return out.select(
        "landmark",
        "n_hop1",
        "n_hop2",
        "n_hop3",
        scaled.alias("harmonic_scaled6"),
        F.round(scaled.cast("double") / F.lit(6.0), 6).alias("harmonic3"),
    )


# ---------------------------------------------------------------------------
# modularity — exact-integer Newman Q over the LPA communities
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    # reuse the unrolled LPA CTE chain, then score its final labeling
    lpa = _lpa_oracle()
    body = lpa[len("WITH ") : lpa.rindex("\nSELECT")]
    return f"""
    WITH {body},
    lab AS (SELECT node, lbl AS community FROM l{LPA_ROUNDS}),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
    deg AS (
      SELECT w, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS w FROM e UNION ALL SELECT v AS w FROM e)
      GROUP BY 1
    ),
    dsum AS (
      SELECT lab.community, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(deg.deg) AS BIGINT) AS d_sum
      FROM deg JOIN lab ON lab.node = deg.w GROUP BY 1
    ),
    ein AS (
      SELECT lu.community, CAST(count(*) AS BIGINT) AS e_in
      FROM e JOIN lab lu ON lu.node = e.u
             JOIN lab lv ON lv.node = e.v
      WHERE lu.community = lv.community
      GROUP BY 1
    ),
    per AS (
      SELECT dsum.community, dsum.n_nodes,
             COALESCE(ein.e_in, 0) AS e_in, dsum.d_sum,
             CAST(4 * m.m * COALESCE(ein.e_in, 0)
                  - dsum.d_sum * dsum.d_sum AS BIGINT) AS contrib_scaled,
             m.m AS m
      FROM dsum LEFT JOIN ein ON ein.community = dsum.community
                CROSS JOIN m
    )
    SELECT community, n_nodes, e_in, d_sum, contrib_scaled,
           round(CAST(sum(contrib_scaled) OVER () AS DOUBLE)
                 / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6)
               AS q_total
    FROM per
    """


@register("graph_modularity", _modularity_oracle())
def graph_modularity(spark, sf_dir):
    """Newman MODULARITY of the LPA communities — the number that says
    whether a community detection found structure or noise (Newman &
    Girvan 2004: Q = Σ_c [e_c/m − (d_c/2m)²]; Q ≈ 0 means the partition
    is no better than random edge placement — exactly what LPA's
    coarse collapse on this near-clique co-occurrence graph should
    score, and the oracle proves it). Completes the graph-clustering
    loop the way sim_silhouette completes k-means: detect
    (graph_label_propagation, whose label device is shared verbatim)
    → SCORE. The integer device: each community's contribution is
    emitted as the EXACT int64 4m·e_c − d_c² (so the hash pins pure
    counting — 4m·e_c and d_c² both ≤ 4m² ~ 10^13 at sf0.1, int64-safe
    to ~10^9 edges), with the single display division Σ/(4m²) LAST,
    round(6)ed.

    Scale shape: inherits LPA's Pregel rounds (node-keyed hash joins,
    checkpoint per round); the scoring then reuses LPA's OWN
    checkpointed both-directions adjacency (_lpa_labels_and_adj) —
    degrees are a node-count over it, e_in falls out of the doubled
    orientation (each in-community undirected edge appears exactly
    twice, so cnt div 2 is exact int64), and the label joins ride the
    same node/nbr keys LPA already partitioned on. A second
    cooccurrence_edges build (lineitem self-join + distinct +
    checkpoint, ~2s and one full extra Exchange at sf0.1) is gone. The
    q_total window runs over the COMMUNITY grid. At 100 TB scoring
    costs one edge-list pass more than LPA itself.

    r16-opt (guide §2.4): the scoring previously paid THREE
    full-adjacency exchanges — deg's groupBy(node) over the
    nbr-partitioned eb, then ein's eb⋈labels(node) and a re-shuffle to
    nbr for the second label join. It now (a) joins on nbr FIRST, so
    the checkpointed nbr-partitioning serves the first label join
    exchange-free, and (b) fuses deg/d_sum/e_in/n_nodes into ONE
    per-community aggregate over the doubly-labeled adjacency, using
    d_sum(c) = |rows with cu=c| (each (node,nbr) orientation
    contributes 1 to its node's degree), e_in(c) = count_if(cu=cv)
    div 2 (exact: both orientations of an internal edge land in c),
    n_nodes(c) = count(DISTINCT node) (every labeled node has ≥1
    adjacency row by construction). Plan: 22 Exchange nodes -> 16 and
    24 join+HashAggregate nodes -> 16 (plans/r16), with the scoring's
    adjacency-sized exchanges down 3 -> 1; communities with zero
    internal edges fall out as count_if = 0 (the old LEFT join +
    coalesce is gone, not moved). Local wall-clock reads parity
    (interleaved A/B at sf0.1, parity-checked 170 rows: medians
    7.80s/8.05s inside a 6.1-9.8s rep spread — LPA's three Pregel
    rounds dominate and are untouched); kept for the scale shape,
    where two of three full-adjacency shuffles disappear."""
    labels, eb = _lpa_labels_and_adj(spark, sf_dir)
    # m = half the doubled adjacency row count — integer div, exact
    m = eb.agg(F.expr("CAST(count(1) div 2 AS BIGINT)").alias("m"))
    ln = labels.select(F.col("node"), F.col("community").alias("cu"))
    lb = labels.select(
        F.col("node").alias("nbr"), F.col("community").alias("cv")
    )
    per_c = (
        eb.join(lb, "nbr")
        .join(ln, "node")
        .groupBy(F.col("cu").alias("community"))
        .agg(
            F.countDistinct("node").cast("bigint").alias("n_nodes"),
            F.expr("CAST(count_if(cu = cv) div 2 AS BIGINT)").alias("e_in"),
            F.count(F.lit(1)).cast("bigint").alias("d_sum"),
        )
    )
    per = per_c.crossJoin(F.broadcast(m)).select(
        "community",
        "n_nodes",
        "e_in",
        "d_sum",
        (4 * F.col("m") * F.col("e_in") - F.col("d_sum") * F.col("d_sum"))
        .cast("bigint")
        .alias("contrib_scaled"),
        "m",
    )
    return per.select(
        "community",
        "n_nodes",
        "e_in",
        "d_sum",
        "contrib_scaled",
        F.round(
            F.sum("contrib_scaled").over(W.partitionBy()).cast("double")
            / (F.lit(4.0) * F.col("m").cast("double") * F.col("m").cast("double")),
            6,
        ).alias("q_total"),
    )
