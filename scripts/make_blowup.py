"""Synthetic scale blow-up of the sf0.1 test tables (VERDICT r16 #3).

The graded test data tops out at sf0.1 (~17 MB), where most bench
entries are overhead-dominated: losing 3/4 of the cores costs ~nothing
(8c/32c median 0.92 in PERF_r16), so the bench cannot EVIDENCE the
100 TB scaling claims. This script manufactures a K× larger input by
replicating each table with key-shifted ids and deterministically
perturbed payloads — NOT valid for oracle comparison (the oracles are
tied to the driver's generated data), only for measuring how runtimes
and 8c/32c ratios move with input size.

Perturbations keep each family's workload shape honest:
  - documents: replica tag appended to text (no artificial exact-dup
    explosion for the dedup/text family; token distribution shifts by
    one token per doc).
  - embeddings: deterministic per-replica offset added to each vector
    component (keeps near-orthogonality; avoids 10× identical-vector
    clusters that would square the semdedup pair counts beyond what a
    real 10× corpus produces). vec_ids are shifted; the fixed
    N_CENTROIDS/N_QUERIES prefixes stay replica-0 rows, so the
    centroid/query tables keep their contracted size while cluster
    membership grows K× — exactly the documented "cluster size n/K
    grows with corpus" regime.
  - events: user_id shifted per replica (K× keys, same time range —
    state stores and sessionization grow K×; ts left alone so
    watermarks/windows keep their density).
  - relational tables: primary keys shifted per replica; foreign keys
    shifted consistently (orders.o_custkey → replica's customer range,
    lineitem.l_orderkey → replica's order range) so join fan-outs scale
    linearly instead of crossing replicas.

Usage: python scripts/make_blowup.py <src_sf_dir> <out_dir> <K>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.tables import TABLE_NAMES, table


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("make-blowup")
    os.makedirs(out, exist_ok=True)

    # key strides: shift each replica's ids past the source key space
    def stride(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    reps = spark.range(k).select(F.col("id").alias("_rep"))

    def blow(name, df, shifts, perturb=None):
        """Cross-join with the replica index, shift key columns by
        _rep * stride, apply an optional payload perturbation."""
        exploded = df.crossJoin(reps)
        for col, st in shifts.items():
            exploded = exploded.withColumn(
                col, (F.col(col) + F.col("_rep") * F.lit(st)).alias(col)
            )
        if perturb is not None:
            exploded = perturb(exploded)
        exploded.drop("_rep").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    # dimension tables stay fixed-size (region/nation/supplier are
    # sublinear by contract; replicating them would change broadcast
    # semantics, not scale)
    for name in ("region", "nation", "supplier"):
        table(spark, src, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    cust = table(spark, src, "customer")
    cs = stride(cust, "c_custkey")
    blow("customer", cust, {"c_custkey": cs})

    part = table(spark, src, "part")
    ps = stride(part, "p_partkey")
    blow("part", part, {"p_partkey": ps})

    orders = table(spark, src, "orders")
    os_ = stride(orders, "o_orderkey")
    blow("orders", orders, {"o_orderkey": os_, "o_custkey": cs})

    li = table(spark, src, "lineitem")
    blow("lineitem", li, {"l_orderkey": os_, "l_partkey": ps})

    ev = table(spark, src, "events")
    us = stride(ev, "user_id")
    es = stride(ev, "event_id")
    blow("events", ev, {"user_id": us, "event_id": es})

    docs = table(spark, src, "documents")
    ds = stride(docs, "doc_id")
    blow(
        "documents",
        docs,
        {"doc_id": ds},
        perturb=lambda d: d.withColumn(
            "text",
            F.when(
                F.col("_rep") == 0, F.col("text")
            ).otherwise(F.concat("text", F.lit(" rep"), F.col("_rep"))),
        ),
    )

    emb = table(spark, src, "embeddings")
    vs = stride(emb, "vec_id")
    blow(
        "embeddings",
        emb,
        {"vec_id": vs},
        perturb=lambda d: d.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                F.expr(
                    "transform(embedding, (x, i) -> x + "
                    "0.01f * float(pmod(_rep * 31 + i * 7 + vec_id, 13) - 6))"
                )
            ),
        ),
    )
    print(f"wrote {k}x blow-up of {src} to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
