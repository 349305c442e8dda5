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
#: Round 5 leads with the queries new this round (PCA power iteration,
#: PQ codes, vocab coverage, temperature mix) so they get driver
#: CORRECTNESS rows immediately, then the reworked prefix-Jaccard and
#: the rest of the iterative/heavy family.
#: scripts/check_parity.py (committed as PARITY_r{N}.txt) proves the
#: full registry every round regardless.
_PRIORITY = [
    "emb_pca_power_projection",
    "emb_pq_codes",
    "emb_ivfpq_index",
    "text_vocab_coverage",
    "sample_temperature_mix",
    "dedup_incremental_minhash",
    "ev_retention_cohorts",
    "text_shingle_containment",
    "dedup_ngram_jaccard_prefix",
    "geo_gridcell_agg",
    "geo_nearest_within_radius",
    "text_pack_sequences",
    "text_contamination_ngram",
    "text_train_order_interleave",
    "text_length_quantiles",
    "sample_quality_weighted",
    "graph_pagerank_3round",
    "text_bpe_merge_rules",
    "text_bpe_encode",
    "llm_corpus_prep_composite",
    "flagship_current_address",
    "text_langid",
    "text_quality_score",
    "text_token_counts",
    "dedup_connected_components",
    "dedup_cc_star_converged",
    "text_winnow_fingerprint",
    "pii_redact_props",
    "text_bpe_pair_stats",
    "text_chunk_for_training",
    "text_tfidf_topk",
    "text_unigram_logprob",
    "sample_stratified_hash",
    "text_postings_index",
    "text_repetition_ratio",
    "sim_cosine_topk_bruteforce",
    "sim_ann_ivf_bucketed",
    "sim_kmeans_assignments",
    "sim_embedding_neardup",
    "sim_lsh_hyperplane",
    "sim_embedding_quantize_int8",
    "dedup_semantic_embedding",
    "mm_decode_image_meta",
    "mm_phash_near_dup",
    "mm_frame_sample",
    "mm_resize_plan",
    "mm_audio_frame_plan",
    "ev_sessionize_gap30",
    "ev_tumbling_window_hourly",
    "ev_user_running_total",
    "agg_top_revenue_segments",
    "ev_agg_pricing_summary",
    "ev_asof_last_purchase",
    "ev_latency_percentiles",
    "ev_value_band_join",
    "agg_cube_order_status",
    "ev_pivot_type_counts",
    "ev_user_value_quartiles",
    "a5_approx_distinct_check",
    "a6_approx_percentile_check",
    "ev_funnel_conversion",
    "ev_event_transitions",
    "ev_sessionize_salted",
    "ev_asof_salted",
    "u5_snapshot_diff",
    "agg_grouping_sets",
    "ev_sliding_value_30min",
    "ev_unpivot_metrics",
    "geo_haversine_within",
    "geo_bbox_filter",
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
