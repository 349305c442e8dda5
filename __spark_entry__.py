"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7 phase 0) on
sf0.001; ``queries()``/``oracle_sql()`` expose the full operator
workload from SURVEY.md §2 plus the LLM-pipeline extensions, each
checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from cam_location_addressing_feature_service_etl_spark.workload import (  # noqa: E402
    ORACLES,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_current_address"](spark, SMOKE_SF_DIR)


#: The driver samples a 50-query prefix of this ordering each round.
#: STALENESS order (kept since round 6): (1) queries that are NEW or
#: whose plan/code changed this round (they need a fresh driver row),
#: (2) the stalest remaining tranche — everything NOT in the previous
#: round's CORRECTNESS sample, oldest driver row first — then (3) the
#: freshly-sampled set rotated to the back. scripts/check_parity.py
#: (committed as PARITY_r{N}.txt) proves the full registry every round
#: regardless.
_PRIORITY = [
    # --- r16 new + changed (production trained-IVF tier, ANN recall
    # audit, ANN-dense RRF fusion, cross-doc span removal, span-level
    # decontamination rewrite, quality funnel, perplexity buckets;
    # oracle/code touched: blocking-quality coalesce, RRF refactor,
    # trained-IVF oracle refactor, source-cap dedup discipline,
    # bigram-logprob shared-builder refactor) ---
    "dedup_decontam_span_rewrite",
    "text_quality_funnel",
    "text_perplexity_buckets",
    "sim_kmeans_cohesion_audit",
    "sample_ppl_bucket_mix",
    "llm_curation_budget_composite",
    "text_langid_confusion_audit",
    "text_bigram_logprob",
    "sim_ann_ivf_scaled",
    "sim_ann_recall_audit",
    "sim_rrf_fusion_ann",
    "dedup_remove_shared_spans",
    "er_blocking_quality",
    "sim_rrf_fusion",
    "sim_ann_ivf_trained",
    "sample_source_cap",
    # --- the stalest driver rows (r10 in full — the r15 verdict's
    # #5 rotation), then r11 fills the 50-sample; the remainder
    # keeps strict staleness order so the next rotation reads
    # straight off this list ---
    "ev_sessionize_gap30",
    "ev_sessionize_salted",
    "ev_sliding_value_30min",
    "ev_tumbling_window_hourly",
    "ev_unpivot_metrics",
    "geo_bbox_filter",
    "geo_haversine_within",
    "graph_label_propagation",
    "j2_optional_left_join",
    "j3_values_batch_semijoin",
    "j5_left_join_unmapped",
    "j6_prune_keep_semi",
    "j7_anti_union_newkeys",
    "j8_update_join_enrich",
    "j9_lookup_join_miss_skip",
    "pii_k_anonymity_audit",
    "pipeline_prune_enrich_composite",
    "sim_semdedup_prune",
    "text_fingerprint",
    # --- r11 tranche ---
    "agg_corr_price_quantity",
    "dq_profile_orders",
    "ev_ewma_value",
    "ev_user_running_total",
    "flagship_current_address",
    "geo_gridcell_agg",
    "geo_locality_assign_banded",
    "geo_locality_assign_nearest_fallback",
    "graph_pagerank_3round",
    "llm_corpus_prep_composite",
    "m7_cdc_apply_tombstones",
    "m8_time_travel_asof",
    "mm_audio_frame_plan",
    "mm_decode_image_meta",
    "mm_frame_sample",
    "mm_phash_near_dup",
    "mm_resize_plan",
    "mv_max_maintenance_targeted",
    "mv_retractable_agg_maintenance",
    "pii_dp_bounded_contribution",
    "pii_l_diversity_audit",
    "pii_redact_props",
    "sample_quality_weighted",
    "sample_stratified_hash",
    "sample_temperature_mix",
    "sim_ann_ivf_bucketed",
    "sim_cosine_topk_bruteforce",
    "sim_embedding_neardup",
    "sim_embedding_quantize_int8",
    "sim_hard_negative_mining",
    "sim_lsh_hyperplane",
    "text_bpe_encode",
    "text_bpe_merge_rules",
    "text_bpe_pair_stats",
    "text_chunk_for_training",
    "text_contamination_ngram",
    "text_langid",
    "text_length_quantiles",
    "text_lr_quality_classifier",
    "text_nb_incremental_train",
    "text_nb_langid_classifier",
    "text_pack_sequences",
    "text_postings_index",
    "text_quality_score",
    # --- r12 tranche ---
    "agg_woe_price_bins",
    "dedup_exact_hash",
    "dedup_exact_substring_spans",
    "dedup_minhash_estimate",
    "dedup_minhash_lsh",
    "dedup_remove_spans",
    "dedup_simhash",
    "dq_benford_audit",
    "dq_psi_drift",
    "er_fellegi_sunter_scores",
    "er_incremental_registry",
    "er_resolve_entities",
    "ev_agg_pricing_summary",
    "ev_anomaly_mad_flags",
    "ev_asof_last_purchase",
    "ev_attribution_window_join",
    "ev_cusum_drift",
    "ev_decayed_engagement",
    "ev_event_transitions",
    "ev_ewma_dyadic",
    "ev_funnel_conversion",
    "ev_gapfill_forward",
    "ev_interval_overlap_join",
    "ev_latency_percentiles",
    "ev_pivot_type_counts",
    "ev_rolling_mad_outliers",
    "ev_scd2_state_intervals",
    "ev_sessionize_native_window",
    "ev_user_value_quartiles",
    "ev_value_band_join",
    "ev_value_histogram",
    "ev_window_rank_suite",
    "geo_fuzzy_link_feed",
    "geo_fuzzy_link_feed_full",
    "geo_fuzzy_link_feed_multiblock",
    "geo_locality_assign_holes",
    "graph_pointer_jump_roots",
    "pii_t_closeness_audit",
    # --- r13 tranche ---
    "a1_grouped_max_latest",
    "a1_latest_row_window",
    "a2_count_with_predicate",
    "a4_rowcount_delta",
    "d1_distinct_projection",
    "d2_first_wins_dedup",
    "d3_distinct_keys_sorted",
    "d4_distinct_values_pushdown",
    "dq_calibration_ece",
    "dq_classifier_agreement_kappa",
    "er_fs_decision_apply",
    "er_fs_decision_rule",
    "er_fs_em_train",
    "f11_prefix_ops",
    "f12_validation_checks",
    "f1_f2_synthetic_keys",
    "f3_conditional_rewrite",
    "f5_vocab_lookup",
    "f6_normalize_initialism",
    "f7_string_casts",
    "f8_f9_f10_time_suite",
    "f_json_extract_props",
    "geo_geohash_agg",
    "geo_knn_topk",
    "geo_point_in_polygon",
    "geo_point_in_polygon_raycast",
    "graph_copurchase_cosine",
    "graph_kcore_peel3",
    "graph_triangle_counts",
    "j10_cache_merge_fetched_wins",
    "j11_fuzzy_blocked_match",
    "j1_multiway_equijoin",
    "m3_stable_surrogate_ids",
    "text_repetition_ratio",
    "text_shingle_containment",
    "text_tfidf_topk",
    "text_winnow_fingerprint",
    "text_zipf_slope",
    # --- r14 tranche ---
    "a10_theta_audience_overlap",
    "a11_kll_quantile_rollup",
    "a12_cms_heavy_hitters",
    "a13_theta_join_cardinality",
    "a14_bloom_semijoin_prune",
    "a15_bootstrap_poisson_ci",
    "a16_ddsketch_quantiles",
    "a5_approx_distinct_check",
    "a6_approx_percentile_check",
    "a7_sketch_union_reaggregate",
    "a8_incremental_agg_merge",
    "a9_key_skew_profile",
    "dedup_jaccard_boiler_prefix",
    "dedup_ngram_jaccard_prefix",
    "dedup_shared_spans",
    "dq_constraint_suite",
    "dq_ks_drift",
    "ev_acf_lags",
    "ev_conversion_latency_histogram",
    "ev_seasonal_baseline_zscore",
    "graph_adamic_adar_linkpred",
    "graph_deterministic_walks",
    "graph_node2vec_walks",
    "graph_walk_skipgram_pairs",
    "m1_upsert_last_write_wins",
    "m2_upsert_reset_column",
    "o1_latest_snapshot_top1",
    "o2_limit_guard",
    "p1_column_projection",
    "p2_computed_projection",
    "p3_typed_literal_filter",
    "p4_anti_join_open_lifecycle",
    "p5_incremental_predicate",
    "p7_notnull_filter",
    "p8_debug_subset_semijoin",
    "sample_mix_epoch_plan",
    "sample_split_leakfree",
    "sim_mmr_rerank",
    "sim_mmr_rerank_grouped",
    "text_textrank_keywords",
    "u1_union_distinct",
    "u2_carry_forward_reshape",
    "u3_intersect_nations",
    "u4_except_nations",
    "u5_snapshot_diff",
    # --- r15 tranche ---
    "agg_cube_order_status",
    "agg_grouping_sets",
    "agg_rollup_region_nation",
    "agg_top_revenue_segments",
    "dedup_cc_star_converged",
    "dedup_cluster_canonical",
    "dedup_connected_components",
    "dedup_cross_corpus",
    "dedup_incremental_minhash",
    "dedup_incremental_registry",
    "dedup_jaccard_boiler_naive",
    "dedup_ngram_jaccard",
    "dedup_semantic_embedding",
    "dedup_shared_span_stopgrams",
    "dedup_shared_spans_capped",
    "dq_chi2_drift",
    "emb_ivfpq_incremental",
    "emb_ivfpq_index",
    "emb_matryoshka_recall",
    "emb_pca_power_projection",
    "emb_pq_codes",
    "ev_asof_salted",
    "ev_retention_cohorts",
    "ev_sliding_distinct_hll",
    "geo_fence_transitions",
    "geo_fuzzy_match_blocked",
    "geo_nearest_within_radius",
    "geo_zorder_layout",
    "graph_copurchase_cosine_dimsum",
    "sample_cluster_diversity",
    "sample_importance_dsir",
    "sample_pack_concat_chunks",
    "sample_weighted_reservoir",
    "sim_ann_ivf_nprobe2",
    "sim_ann_ivfpq_filtered",
    "sim_ann_ivfpq_rerank",
    "sim_ann_ivfpq_search",
    "sim_kmeans_assignments",
    "text_bm25_topk",
    "text_pmi_collocations",
    "text_shard_manifest",
    "text_token_counts",
    "text_train_order_interleave",
    "text_unigram_logprob",
    "text_vocab_coverage",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    return _ordered(dict(ORACLES))
