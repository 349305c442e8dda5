#!/usr/bin/env python
"""sf0.1 → sf1 decade probe for the top composites (r12 verdict #7):
runs er_incremental_registry, graph_label_propagation,
graph_copurchase_cosine (+ its DIMSUM twin) and dedup_cc_star_converged
on three datasets — the DRIVER's sf0.1 (distribution sanity anchor),
this repo's GENERATED sf0.1, and the GENERATED sf1
(scripts/gen_scale_data.py) — and prints warm min-of-2 times plus the
gen-sf1 / gen-sf0.1 growth factor. Using the same generator for both
endpoints keeps the decade ratio apples-to-apples; the driver-sf0.1
column validates the generator (times should be in family).

Usage:
  python scripts/gen_scale_data.py 0.1 /tmp/spark-graft-gen-sf0.1
  python scripts/gen_scale_data.py 1   /tmp/spark-graft-sf1
  python scripts/sf1_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from cam_location_addressing_feature_service_etl_spark.runtime import (
    release_plan_refs,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

_QUERIES = [
    "er_incremental_registry",
    "graph_label_propagation",
    "graph_copurchase_cosine",
    "graph_copurchase_cosine_dimsum",
    "dedup_cc_star_converged",
    # r13 widening: one decade point per remaining top family —
    # LSH dedup, lexical ranking, ANN (bucketed vs brute-force pair),
    # and the windowed time-series aggregate
    "dedup_minhash_lsh",
    "text_bm25_topk",
    "sim_cosine_topk_bruteforce",
    "sim_ann_ivf_bucketed",
    "ev_acf_lags",
    "ev_sessionize_gap30",
    # r14 widening: one decade point per new family — second-order
    # walks + their skip-gram corpus, the grouped MMR fleet, the KS
    # drift monitor, and the packing scan
    "graph_node2vec_walks",
    "graph_walk_skipgram_pairs",
    "sim_mmr_rerank_grouped",
    "dq_ks_drift",
    "sample_pack_concat_chunks",
    # r16 widening: the production trained-IVF point, the ANN recall
    # audit (brute + both tiers in one plan), the ANN-dense hybrid
    # fusion, and the cross-doc span-cut rewrite
    "sim_ann_ivf_scaled",
    "sim_ann_recall_audit",
    "sim_rrf_fusion_ann",
    "dedup_remove_shared_spans",
    # r16 late widening: the span-level decontamination rewrite, the
    # one-pass quality funnel, and the perplexity bucketing
    "dedup_decontam_span_rewrite",
    "text_quality_funnel",
    "text_perplexity_buckets",
    "sim_kmeans_cohesion_audit",
    "sample_ppl_bucket_mix",
    "llm_curation_budget_composite",
    "text_langid_confusion_audit",
]

_DIRS = [
    ("driver-sf0.1", "/root/testdata/sf0.1"),
    ("gen-sf0.1", "/tmp/spark-graft-gen-sf0.1"),
    ("gen-sf1", "/tmp/spark-graft-sf1"),
]


def main() -> int:
    spark = get_spark(app_name="sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[tuple[str, str], float] = {}
    # optional argv filter: probe only the named queries (substring
    # match), so a round's new family doesn't re-pay the full table
    filters = sys.argv[1:]
    names = [
        q for q in _QUERIES if not filters or any(f in q for f in filters)
    ]
    for qname in names:
        for dname, d in _DIRS:
            if not os.path.isdir(d):
                print(f"skip {dname}: {d} missing (run gen_scale_data.py)")
                continue
            best, rows = None, 0
            for _ in range(2):
                release_plan_refs()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                rows = QUERIES[qname](spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[(qname, dname)] = best
            print(f"{qname:32s} {dname:12s} rows={rows:>8}  {best:7.2f}s")
        a = results.get((qname, "gen-sf0.1"))
        b = results.get((qname, "gen-sf1"))
        if a and b:
            print(f"{qname:32s} DECADE gen-sf1/gen-sf0.1 = x{b / a:.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
