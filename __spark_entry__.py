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
#: Round 6 rotates to STALENESS order (judge advice #3): queries whose
#: most recent green driver CORRECTNESS row is oldest come first (the
#: r02-era relational/scalar family, then r03/r04, then the r05-fresh
#: set). Queries never driver-sampled (newly added) sort first.
#: scripts/check_parity.py (committed as PARITY_r{N}.txt) proves the
#: full registry every round regardless.
_PRIORITY = [
    "dedup_exact_substring_spans",
    "m7_cdc_apply_tombstones",
    "graph_copurchase_cosine",
    "ev_window_rank_suite",
    "dedup_minhash_estimate",
    "text_shard_manifest",
    "dedup_remove_spans",
    "dedup_cluster_canonical",
    "ev_anomaly_mad_flags",
    "ev_sliding_distinct_hll",
    "text_bm25_topk",
    "sample_importance_dsir",
    "a8_incremental_agg_merge",
    "a9_key_skew_profile",
    "ev_scd2_state_intervals",
    "graph_kcore_peel3",
    "text_pmi_collocations",
    "j11_fuzzy_blocked_match",
    "a7_sketch_union_reaggregate",
    "geo_zorder_layout",
    "graph_triangle_counts",
    "emb_matryoshka_recall",
    "text_bigram_logprob",
    "dedup_jaccard_boiler_naive",
    "dedup_jaccard_boiler_prefix",
    "sim_ann_ivf_nprobe2",
    "a1_grouped_max_latest",
    "a1_latest_row_window",
    "a2_count_with_predicate",
    "a4_rowcount_delta",
    "agg_rollup_region_nation",
    "d1_distinct_projection",
    "d2_first_wins_dedup",
    "d3_distinct_keys_sorted",
    "d4_distinct_values_pushdown",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "f11_prefix_ops",
    "f12_validation_checks",
    "f1_f2_synthetic_keys",
    "f3_conditional_rewrite",
    "f5_vocab_lookup",
    "f6_normalize_initialism",
    "f7_string_casts",
    "f8_f9_f10_time_suite",
    "f_json_extract_props",
    "j10_cache_merge_fetched_wins",
    "j1_multiway_equijoin",
    "j2_optional_left_join",
    "j3_values_batch_semijoin",
    "j5_left_join_unmapped",
    "j6_prune_keep_semi",
    "j7_anti_union_newkeys",
    "j8_update_join_enrich",
    "j9_lookup_join_miss_skip",
    "m1_upsert_last_write_wins",
    "m2_upsert_reset_column",
    "m3_stable_surrogate_ids",
    "o1_latest_snapshot_top1",
    "o2_limit_guard",
    "p1_column_projection",
    "p2_computed_projection",
    "p3_typed_literal_filter",
    "p4_anti_join_open_lifecycle",
    "p5_incremental_predicate",
    "p7_notnull_filter",
    "p8_debug_subset_semijoin",
    "pipeline_prune_enrich_composite",
    "text_fingerprint",
    "u1_union_distinct",
    "u2_carry_forward_reshape",
    "u3_intersect_nations",
    "u4_except_nations",
    "agg_grouping_sets",
    "ev_asof_salted",
    "ev_sessionize_salted",
    "ev_sliding_value_30min",
    "ev_unpivot_metrics",
    "geo_bbox_filter",
    "geo_haversine_within",
    "u5_snapshot_diff",
    "a5_approx_distinct_check",
    "a6_approx_percentile_check",
    "agg_cube_order_status",
    "agg_top_revenue_segments",
    "ev_agg_pricing_summary",
    "ev_asof_last_purchase",
    "ev_event_transitions",
    "ev_funnel_conversion",
    "ev_latency_percentiles",
    "ev_pivot_type_counts",
    "ev_user_value_quartiles",
    "ev_value_band_join",
    "dedup_cc_star_converged",
    "dedup_connected_components",
    "dedup_incremental_minhash",
    "dedup_ngram_jaccard_prefix",
    "dedup_semantic_embedding",
    "emb_ivfpq_index",
    "emb_pca_power_projection",
    "emb_pq_codes",
    "ev_retention_cohorts",
    "ev_sessionize_gap30",
    "ev_tumbling_window_hourly",
    "ev_user_running_total",
    "flagship_current_address",
    "geo_gridcell_agg",
    "geo_nearest_within_radius",
    "graph_pagerank_3round",
    "llm_corpus_prep_composite",
    "mm_audio_frame_plan",
    "mm_decode_image_meta",
    "mm_frame_sample",
    "mm_phash_near_dup",
    "mm_resize_plan",
    "pii_redact_props",
    "sample_quality_weighted",
    "sample_stratified_hash",
    "sample_temperature_mix",
    "sim_ann_ivf_bucketed",
    "sim_cosine_topk_bruteforce",
    "sim_embedding_neardup",
    "sim_embedding_quantize_int8",
    "sim_kmeans_assignments",
    "sim_lsh_hyperplane",
    "text_bpe_encode",
    "text_bpe_merge_rules",
    "text_bpe_pair_stats",
    "text_chunk_for_training",
    "text_contamination_ngram",
    "text_langid",
    "text_length_quantiles",
    "text_pack_sequences",
    "text_postings_index",
    "text_quality_score",
    "text_repetition_ratio",
    "text_shingle_containment",
    "text_tfidf_topk",
    "text_token_counts",
    "text_train_order_interleave",
    "text_unigram_logprob",
    "text_vocab_coverage",
    "text_winnow_fingerprint",
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
