#!/usr/bin/env python
"""Empirical scaling probe: run the bucketed dedup/search operators on
1x/2x/4x self-unioned copies of the sf0.1 documents corpus (doc_id
offset per copy keeps ids distinct, a suffix tag perturbs each copy's
text so replicas are near- but not exact duplicates) and print the
wall-time growth factor per doubling.

A bucketed operator (LSH bands, gram hash groups, postings) should grow
close to linearly (factor ~2 per doubling, plus collision growth where
the corpus genuinely contains more near-dups); an accidental all-pairs
stage would show factor ~4. The committed results live in SCALING.md.

Usage: python scripts/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.session import get_spark, tune
from cam_location_addressing_feature_service_etl_spark.tables import load


def scaled_docs(base: DataFrame, copies: int) -> DataFrame:
    n = base.selectExpr("max(doc_id)").collect()[0][0] + 1
    parts = []
    for c in range(copies):
        part = base.select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            # perturb each copy so replicas are near-dups, not byte dups
            F.concat(F.col("text"), F.lit(f" copytag{c}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # persist (NOT localCheckpoint): Dataset.unpersist only releases
    # CacheManager entries, so a checkpointed corpus would stay pinned
    # in executor storage for the whole run and later scales would be
    # timed under accumulated memory pressure
    out = out.repartition(32).persist()
    out.count()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-probe")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    base = load(spark, sf_dir, "documents")

    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        duplicated_token_spans,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingle_postings,
    )

    def op_minhash(d):
        # postings feed ONLY the signature leg here (unlike the real
        # dedup_minhash_estimate query) — no checkpoint needed
        sigs = minhash_signatures(d, "doc_id", "text", num_hashes=16, shingle_n=2)
        return lsh_candidate_pairs(sigs, "doc_id", num_hashes=16, bands=4).count()

    def op_spans(d):
        return duplicated_token_spans(d, "doc_id", "text", k=8).count()

    def op_jaccard(d):
        return ngram_jaccard_pairs(
            d, id_col="doc_id", text_col="text", threshold=0.5, shingle_n=3
        ).count()

    ops = {"minhash_lsh": op_minhash, "substring_spans": op_spans, "ngram_jaccard": op_jaccard}

    # scale-outer loop: each scaled corpus is persisted ONCE, shared
    # by every operator at that scale, and unpersisted before the next
    # scale — otherwise 9 corpus copies pile up in executor storage and
    # the later operators are timed under accumulated memory pressure.
    prev_dt = {name: None for name in ops}
    for copies in (1, 2, 4):
        d = scaled_docs(base, copies)
        for name, fn in ops.items():
            fn(d)  # warm (plan + JIT)
            t0 = time.perf_counter()
            rows = fn(d)
            dt = time.perf_counter() - t0
            p = prev_dt[name]
            factor = "" if p is None else f"  x{dt / p:.2f} per doubling"
            print(f"{name:16s} {copies}x  rows={rows:>9}  {dt:6.2f}s{factor}")
            prev_dt[name] = dt
        d.unpersist(blocking=True)
        spark._jvm.System.gc()
        print()


if __name__ == "__main__":
    main()
