"""Empty-input robustness: every operator category must survive EMPTY
tables (schema-only parquet) without crashing — at 100 TB a filter or a
partition predicate routinely produces zero rows, and an operator that
throws on empty input kills the whole job, not just a task.

The fixture writes a schema-identical but row-free copy of every test
table and runs one representative query per category against it. The
contract is "no exception, sane row count" (0 for most; global aggregates
may legitimately emit their single null/zero row).
"""

from __future__ import annotations

import pytest

from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.tables import TABLE_NAMES, table

# category representatives; (name, max_rows) — max_rows bounds what an
# empty input may produce (global aggs emit one row; everything else 0)
REPRESENTATIVES = [
    ("q1_pricing_summary", 0),
    ("q5_local_supplier", 0),
    ("filter_predicates", 0),
    ("join_asof", 0),
    ("join_asof_tolerance", 0),
    ("window_rank", 0),
    ("topk_per_group", 0),
    ("agg_rollup", 1),  # rollup grand-total row may survive as null row? no rows in, 0 out — allow 1 defensively
    ("dq_profile", 1),  # global agg: one row of zeros/nulls
    ("dq_anomaly_zscore", 0),
    ("set_union_all", 0),
    ("scalar_url_fns", 0),
    ("dedup_exact", 0),
    ("dedup_minhash_lsh", 0),
    ("dedup_components", 0),
    ("curate_quality_filter", 0),
    ("curate_mix_temperature", 0),
    ("sim_topk_cosine", 0),
    ("sim_centroid_assign", 0),
    ("text_stats", 0),
    ("text_quality_unigram_lm", 0),
    ("mm_decode_png", 0),
    ("mm_decode_wav", 0),
    ("sessionize_events", 0),
    ("sample_hash_deterministic", 0),
    # late-r8 operators
    ("dedup_prefix_filter", 0),
    ("pareto_frontier", 0),
    ("graph_bfs_distance", 0),
    ("er_blocking_link", 0),
    ("dedup_bloom_prefilter", 0),
    ("event_pattern_match", 0),
    ("mm_decode_gif", 0),
    ("sim_random_projection", 0),
    ("mm_audio_wht", 0),
    ("sink_compact_small_files", 0),
    # r9 operators
    ("text_html_extract", 0),
    ("sim_ivfpq_search", 0),
    ("stream_stream_outer", 0),
    ("udtf_table_fn", 0),
    ("text_bm25_topk", 0),
    ("graph_label_propagation", 0),
    ("join_interval_overlap", 0),
    ("dq_drift_histogram", 0),
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).limit(0).write.mode("overwrite").parquet(
            str(out / f"{name}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name,max_rows", REPRESENTATIVES)
def test_operator_survives_empty_tables(spark, empty_sf_dir, name, max_rows):
    reg = load_all()
    out = reg[name].fn(spark, empty_sf_dir)
    assert out.count() <= max_rows


# r7 additions: each has a plan shape with a distinct empty-input hazard —
# scratch-materialize read-back (bloom), empty partitionBy fixture (DPP),
# footer-stats agg over zero row groups (pushdown), window over empty
# (substring), empty broadcast centroids (semdedup), empty pandas UDF
# batches (bpe)
REPRESENTATIVES_R7 = [
    ("dedup_substring", 0),
    ("text_quality_classifier", 0),
    ("join_bloom_pruned", 0),
    ("scan_dpp_partitioned", 0),
    ("agg_pushdown_stats", 1),  # global agg: one row of count=0/nulls
    ("dedup_semdedup", 0),
    ("curate_pack_bpe", 0),
]


@pytest.mark.parametrize("name,max_rows", REPRESENTATIVES_R7)
def test_r7_operator_survives_empty_tables(spark, empty_sf_dir, name, max_rows):
    reg = load_all()
    out = reg[name].fn(spark, empty_sf_dir)
    assert out.count() <= max_rows


# late-r7 additions: removal/index/pipeline/image-dedup plus the five
# derived-relation TPC-H shapes (empty part → empty partsupp; empty
# lineitem → empty late-flag aggregates; the q11 global-total cross join
# must yield empty, not a null-row blowup)
REPRESENTATIVES_R7B = [
    ("dedup_substring_removal", 0),
    ("dedup_minhash_incremental", 0),
    ("curate_pipeline", 0),
    ("mm_image_dedup", 0),
    ("q2_min_cost_supplier", 0),
    ("q11_important_stock", 0),
    ("q16_parts_supplier_relationship", 0),
    ("q20_potential_promotion", 0),
    ("q21_suppliers_who_kept_waiting", 0),
]


@pytest.mark.parametrize("name,max_rows", REPRESENTATIVES_R7B)
def test_r7b_operator_survives_empty_tables(spark, empty_sf_dir, name, max_rows):
    reg = load_all()
    out = reg[name].fn(spark, empty_sf_dir)
    assert out.count() <= max_rows


# r10 promotions + the r11 staged tier (ADVICE r9: the lake ops' empty
# hazards are the zero-file manifest read — spark.read.parquet() with no
# paths throws — and both now fall back to a schema-only empty scan).
# lake_snapshot_read emits one global-agg row per snapshot version (2);
# dq_expectation_suite emits its fixed 7 verdict rows even over zero rows
# (an expectation's verdict on an empty table is still a verdict).
REPRESENTATIVES_R10 = [
    ("mm_resize_pixel", 0),
    ("text_rake_keywords", 0),
    ("lake_manifest_prune", 0),
    ("sim_hnsw_beam", 0),
    ("stream_session_window_dynamic", 0),
]
# The four r11 ops and the six r12 shape-B ops + stream_timer_timeout were
# promoted at the r11 rotation; lookup() resolves them through the
# registered tier now, so these lists keep covering them unchanged.
REPRESENTATIVES_R11_STAGED = [
    ("lake_snapshot_read", 2),
    ("agg_least_squares", 1),
    ("dq_expectation_suite", 7),
    ("curate_mixture_sampling", 0),
]


@pytest.mark.parametrize("name,max_rows", REPRESENTATIVES_R10)
def test_r10_operator_survives_empty_tables(spark, empty_sf_dir, name, max_rows):
    reg = load_all()
    out = reg[name].fn(spark, empty_sf_dir)
    assert out.count() <= max_rows


@pytest.mark.parametrize("name,max_rows", REPRESENTATIVES_R11_STAGED)
def test_r11_staged_operator_survives_empty_tables(
    spark, empty_sf_dir, name, max_rows
):
    from xml_to_parquet_spark.registry import lookup

    load_all()  # import side effects populate the tiers
    out = lookup(name).fn(spark, empty_sf_dir)
    assert out.count() <= max_rows


# r12/r13 staged tiers. graph_scc_bounded keeps its 64 PLANTED 4-rings
# (spark.range, independent of table data) over empty lineitem, so its
# empty-input contract is exactly the 256 ring nodes, each still getting
# an scc_id — the one staged op whose empty-tables result is non-empty by
# design. stream_timer_timeout's empty stream must drain cleanly with a
# never-advancing watermark (no timers fire, zero rows).
REPRESENTATIVES_R12_R13_STAGED = [
    ("stream_stream_full_outer", 0),
    ("mm_video_framesample", 0),
    ("lake_merge_upsert", 0),
    ("text_cdc_chunking", 0),
    ("sim_mips_topk", 0),
    ("mm_audio_vad", 0),
    ("join_spatial_grid", 0),
    ("sim_diversity_mmr", 0),
    ("graph_scc_bounded", 256),
    ("dq_ks_distance", 0),
    ("dq_schema_drift", 0),
    ("graph_link_predict", 0),
    ("stream_timer_timeout", 0),
    ("mine_assoc_rules", 0),
    ("timeseries_interpolate", 0),
    ("mm_image_histogram", 0),
    ("text_winnow_fingerprint", 0),
    ("dq_mann_whitney", 0),
    ("er_fellegi_sunter", 0),
    ("graph_jaccard_neighbors", 0),
    ("dedup_containment_incremental", 0),
    ("dq_benford", 0),
    ("mine_transition_matrix", 0),
    ("dq_entropy_profile", 0),
    ("agg_retention_cohort", 0),
    ("lake_time_travel_diff", 0),
    ("stream_cdc_apply", 0),
    ("dq_seasonal_decompose", 0),
    ("er_cluster_entities", 0),
    # r13 direct registration: a Delta table built from an empty source
    # has zero add actions — the op short-circuits to an empty result
    ("lake_delta_snapshot", 0),
    # r14 direct registration: likewise, an Iceberg fixture over an
    # empty source writes no metadata tree — empty result
    ("lake_iceberg_snapshot", 0),
    ("curate_tokenizer_fertility", 0),
    ("graph_bridges", 0),
    ("dq_changepoint_cusum", 0),
    ("timeseries_resample_ohlc", 0),
    ("dq_chisq_independence", 0),
    ("agg_weighted_median", 0),
    ("er_survivorship", 0),
    # r16 staged set. graph_degree_assortativity keeps its single
    # global-aggregate row over an empty edge list (n_pairs = 0, null
    # coefficient) — the agg_least_squares empty-contract shape.
    ("dq_autocorrelation", 0),
    ("dq_outlier_mad", 0),
    ("graph_degree_assortativity", 1),
    ("text_collocations_pmi", 0),
    ("text_zipf_rank", 0),
    ("lake_compaction_plan", 0),
    ("sim_silhouette", 0),
    ("mm_image_palette", 0),
    # r17 staged set. er_blocking_metrics keeps its 3 fixed scheme rows
    # (every rule's candidate count over empty rosters is still a
    # verdict, like dq_expectation_suite); covariance gates on n >= 2 so
    # an empty table emits nothing.
    ("sim_kmeans_update", 0),
    ("agg_covariance_matrix", 0),
    ("er_blocking_metrics", 3),
    ("lake_clustering_depth", 0),
    ("graph_harmonic_landmarks", 0),
    # r18 staged set. timeseries_theil_sen keeps its single
    # global-aggregate row (null slope/intercept over an empty series).
    ("graph_modularity", 0),
    ("dq_mutual_information", 0),
    ("curate_url_dedup", 0),
    ("timeseries_theil_sen", 1),
    ("sim_pq_train", 0),
    # r19 staged set. dq_runs_test filters its single aggregate row out
    # when there are no up AND down moves; textrank early-returns an
    # explicit-schema empty frame on a zero-node word graph.
    ("text_textrank", 0),
    ("dq_runs_test", 0),
    ("agg_pythagorean_means", 0),
    ("mm_video_shot_detect", 0),
    ("lake_vacuum_plan", 0),
    ("dq_freshness_lag", 0),
    ("sim_recall_at_k", 0),
    # r15: the sharded packing twin (VERDICT r14 #2)
    ("curate_pack_sharded", 0),
]


@pytest.mark.parametrize("name,max_rows", REPRESENTATIVES_R12_R13_STAGED)
def test_r12_r13_staged_operator_survives_empty_tables(
    spark, empty_sf_dir, name, max_rows
):
    from xml_to_parquet_spark.registry import lookup

    load_all()
    out = lookup(name).fn(spark, empty_sf_dir)
    assert out.count() <= max_rows
