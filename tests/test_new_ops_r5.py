"""Semantic tests for the round-5 [EXT] additions (beyond the execute-all
and oracle-parity harnesses): unigram-LM quality scoring, tolerated as-of
join, z-score anomaly gate, URL parsing, k-means assignment, temperature
mixing.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.curation import MIX_ALPHA
from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.tables import table


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_unigram_lm_scores_bounded_and_complete(spark, sf_dir, reg):
    out = reg["text_quality_unigram_lm"].fn(spark, sf_dir).toPandas()
    n_docs = (
        table(spark, sf_dir, "documents").filter(F.length("text") > 0).count()
    )
    assert len(out) == n_docs  # every non-empty doc scored
    # log-probs are ≤ 0; a doc of only the most common token still < 0
    assert (out["lm_score"] < 0).all()
    # scores bounded below by ln(1/total_tokens)
    total = out["n_tokens"].sum()
    assert (out["lm_score"] >= math.log(1.0 / total) - 1e-6).all()


def test_asof_tolerance_is_subset_of_plain_asof(spark, sf_dir, reg):
    """Tolerance nulls stale matches but never invents one: wherever the
    tolerated join matched, the plain backward as-of join matched the SAME
    timestamp; the tolerated match count is strictly smaller-or-equal."""
    tol = reg["join_asof_tolerance"].fn(spark, sf_dir).toPandas()
    plain = reg["join_asof"].fn(spark, sf_dir).toPandas()
    assert len(tol) == len(plain)
    t = tol.set_index("event_id")["prev_purchase_ts"]
    p = plain.set_index("event_id").iloc[:, -1]  # last col = matched ts
    matched = t.dropna()
    assert (p.loc[matched.index] == matched).all()
    assert matched.size <= p.dropna().size


def test_zscore_flags_are_actually_extreme(spark, sf_dir, reg):
    out = reg["dq_anomaly_zscore"].fn(spark, sf_dir).toPandas()
    assert (out["z"].abs() > 2.5).all()
    # and the gate is selective: far fewer flags than events
    n_events = table(spark, sf_dir, "events").count()
    assert 0 < len(out) < 0.05 * n_events


def test_url_fns_roundtrip_components(spark, sf_dir, reg):
    out = reg["scalar_url_fns"].fn(spark, sf_dir).toPandas()
    assert (out["host"].str.endswith(".example.com")).all()
    assert (out["path"] == "/docs/" + out["doc_id"].astype(str)).all()
    langs = set(
        r["lang"]
        for r in table(spark, sf_dir, "documents").select("lang").collect()
    )
    assert set(out["lang_param"]) <= langs


def test_centroid_assign_partitions_all_vectors(spark, sf_dir, reg):
    out = reg["sim_centroid_assign"].fn(spark, sf_dir).toPandas()
    n_vecs = table(spark, sf_dir, "embeddings").count()
    assert out["n_assigned"].sum() == n_vecs  # exact partition, no drops
    # each centroid captures at least itself (distance 0)
    assert (out["n_assigned"] >= 1).all()
    assert (out["avg_sq_dist"] >= 0).all()


def test_mix_temperature_weights_normalize_and_flatten(spark, sf_dir, reg):
    out = reg["curate_mix_temperature"].fn(spark, sf_dir).toPandas()
    assert abs(out["mix_weight"].sum() - 1.0) < 1e-2  # rounded to 4dp
    # α<1 flattens: smallest source is upsampled, largest downsampled
    assert MIX_ALPHA < 1
    small = out.loc[out["n_docs"].idxmin()]
    big = out.loc[out["n_docs"].idxmax()]
    if small["n_docs"] < big["n_docs"]:
        assert small["upsample_factor"] > 1 > big["upsample_factor"]
