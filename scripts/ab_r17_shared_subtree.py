"""Interleaved A/B for the r17 shared-subtree re-litigations (VERDICT r16 #1).

Arms run in ONE session, alternating per rep (A,B,A,B,...), noop sink,
median over --reps timed passes after a warmup pass per arm. Arm A is the
round-16 form (inlined verbatim from commit 692c294); arm B is the live
registry form. Parity is asserted on sorted collect() before timing.

Usage: python scripts/ab_r17_shared_subtree.py <sf_dir> [op ...] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.tables import table


# --------------------------- arm A (round-16 forms) ---------------------------


def before_sim_pipeline(spark, sf_dir):
    from xml_to_parquet_spark.operators.similarity import (
        KNN_K,
        SEMDEDUP_COS,
        dot,
        semdedup_assigned,
    )

    assigned = semdedup_assigned(spark, sf_dir)
    x = assigned.alias("x")
    y = assigned.alias("y")
    cos_xy = dot(F.col("x.embedding"), F.col("y.embedding")) / (
        F.col("x.nrm") * F.col("y.nrm")
    )
    pruned = (
        x.join(
            y,
            (F.col("x.cid") == F.col("y.cid"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .filter(cos_xy > SEMDEDUP_COS)
        .select(F.col("y.vec_id").alias("vec_id"))
        .distinct()
    )
    surv = assigned.join(pruned, "vec_id", "left_anti")
    s1 = surv.alias("s1")
    s2 = surv.alias("s2")
    cos_g = dot(F.col("s1.embedding"), F.col("s2.embedding")) / (
        F.col("s1.nrm") * F.col("s2.nrm")
    )
    pairs = s1.join(
        s2,
        (F.col("s1.cid") == F.col("s2.cid"))
        & (F.col("s1.vec_id") != F.col("s2.vec_id")),
    ).select(
        F.col("s1.vec_id").alias("vec_id"),
        F.col("s1.cid").alias("centroid_id"),
        F.col("s2.vec_id").alias("neighbor_id"),
        F.round(cos_g, 6).alias("cos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= KNN_K)
        .select("vec_id", "centroid_id", "rank", "neighbor_id", "cos")
    )


def before_dedup_semdedup(spark, sf_dir):
    from xml_to_parquet_spark.operators.similarity import (
        SEMDEDUP_COS,
        dot,
        semdedup_assigned,
    )

    assigned = semdedup_assigned(spark, sf_dir)
    x = assigned.alias("x")
    y = assigned.alias("y")
    cos = dot(F.col("x.embedding"), F.col("y.embedding")) / (
        F.col("x.nrm") * F.col("y.nrm")
    )
    pairs = (
        x.join(
            y,
            (F.col("x.cid") == F.col("y.cid"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("y.vec_id").alias("vec_id"),
            F.col("y.cid").alias("centroid_id"),
            F.col("x.vec_id").alias("keeper_id"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") > SEMDEDUP_COS)
        .withColumn("cos", F.round("_cos", 6))
    )
    return (
        pairs.groupBy("vec_id", "centroid_id")
        .agg(
            F.max_by(
                F.struct("keeper_id", "cos"),
                F.struct(F.col("cos"), -F.col("keeper_id")),
            ).alias("b")
        )
        .select(
            "vec_id",
            "centroid_id",
            F.col("b.keeper_id").alias("keeper_id"),
            F.col("b.cos").alias("cos"),
        )
    )


def before_mm_caption_dedup(spark, sf_dir):
    from xml_to_parquet_spark.functions.text_fns import TOKENS_SQL, shingles_sql
    from xml_to_parquet_spark.operators.multimodal import (
        CAPTION_JACCARD,
        mm_image_dedup,
    )

    pairs = mm_image_dedup(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    cap = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(norm).alias("nh"), F.expr(TOKENS_SQL).alias("toks"))
        .select(
            "doc_id",
            "nh",
            F.when(
                F.size("toks") >= 3,
                F.array_distinct(F.expr(shingles_sql(3))),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("sh"),
        )
    )
    a = cap.select(
        F.col("doc_id").alias("_ida"),
        F.col("nh").alias("nh_a"),
        F.col("sh").alias("sh_a"),
    )
    b = cap.select(
        F.col("doc_id").alias("_idb"),
        F.col("nh").alias("nh_b"),
        F.col("sh").alias("sh_b"),
    )
    scored = (
        pairs.join(a, pairs.doc_a == a._ida)
        .join(b, pairs.doc_b == b._idb)
        .withColumn("ilen", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("ulen", F.size("sh_a") + F.size("sh_b") - F.col("ilen"))
    )
    jac = F.when(F.col("ulen") > 0, F.col("ilen") / F.col("ulen")).otherwise(
        F.lit(0.0)
    )
    return scored.select(
        "doc_a",
        "doc_b",
        "hamming",
        F.round(jac, 4).alias("jaccard"),
        F.when(F.col("nh_a") == F.col("nh_b"), F.lit("same_caption"))
        .when(jac >= CAPTION_JACCARD, F.lit("re_rendered"))
        .otherwise(F.lit("re_captioned"))
        .alias("verdict"),
    )


BEFORE = {
    "sim_pipeline": before_sim_pipeline,
    "dedup_semdedup": before_dedup_semdedup,
    "mm_caption_dedup": before_mm_caption_dedup,
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sf_dir")
    p.add_argument("ops", nargs="*", default=None)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    ops = args.ops or sorted(BEFORE)
    spark = get_spark("ab-r17")
    reg = load_all()

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for op in ops:
        bfn, afn = BEFORE[op], reg[op].fn
        pa = sorted(map(tuple, bfn(spark, args.sf_dir).collect()))
        pb = sorted(map(tuple, afn(spark, args.sf_dir).collect()))
        assert pa == pb, f"{op}: arm results differ"
        run(bfn)
        run(afn)  # warmup both arms
        ta, tb = [], []
        for _ in range(args.reps):
            ta.append(run(bfn))
            tb.append(run(afn))
        print(
            f"{op}\tbefore={statistics.median(ta):.3f}\t"
            f"after={statistics.median(tb):.3f}\t"
            f"ratio={statistics.median(tb)/statistics.median(ta):.3f}\t"
            f"rawA={[round(t,2) for t in ta]}\trawB={[round(t,2) for t in tb]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
