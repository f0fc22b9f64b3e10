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

from pyspark.sql import functions as F

from xml_to_parquet_spark.registry import register
from xml_to_parquet_spark.tables import table

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
    edges_d = edges.join(deg, "src").localCheckpoint()
    n_nodes = deg.count()  # one-time scalar fixing the teleport constant
    base = SCALE // n_nodes
    teleport = ((100 - DAMP_NUM) * base) // DAMP_DEN

    ranks = deg.select(F.col("src").alias("node"), F.lit(base).alias("r"))
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
        ).localCheckpoint()
    return ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / SCALE).alias("rank"),
    )
