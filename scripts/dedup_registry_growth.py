#!/usr/bin/env python
"""Incremental corpus-dedup growth + state-IO probe (r12 verdict #3/#4
done-bars): (a) per-fold COMPUTE must be ∝ batch, not corpus — a
constant document batch folds into corpora of growing size; (b) per-
fold state WRITE-IO must be ∝ touched buckets, not |state| — the same
constant batch folds through the partitioned versioned layout and the
bytes landing in the new version are compared to the total state
footprint.

Synthetic docs: md5-derived hex tokens — mutually dissimilar, so true
near-dup edges come ONLY from the batch's deliberate variants
(constant per batch across scales). The r12 probe lesson applies: a
self-similar corpus measures a pathological vocabulary, not a
registry.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.dedup_registry import (
    dedup_fold_increment,
    empty_dedup_postings,
    empty_dedup_registry,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.streaming.corpus_dedup import (
    fold_doc_batch,
)

_BATCH = 500
#: buckets per 5k docs — the bucket count is sized ∝ corpus (each scale
#: is its own state dir, as a production deployment sizes partitions
#: for its target corpus) so BUCKET SIZE stays constant; write-IO is
#: then touched_buckets × bucket_size ≈ batch × const. With a pinned
#: bucket count, write-IO per fold would instead grow ∝ |state|/P per
#: touched bucket — the granularity trade the layout docstring states.
_BUCKETS_PER_5K = 256


def _docs(spark, n, id_offset=0, tokens=12):
    """n mutually-dissimilar docs of `tokens` md5-derived hex tokens."""
    toks = [
        F.substring(
            F.md5(F.concat(F.lit(f"t{j}:"), F.col("id").cast("string"))), 1, 10
        )
        for j in range(tokens)
    ]
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.concat_ws(" ", *toks).alias("text"),
    )


def _batch(spark, corpus_docs):
    """Constant-size batch: half fresh singletons, half near-dup
    variants of existing docs (drop the last 2 tokens — trigram
    Jaccard vs the original ≈ (n-4)/(n+... ) well above 0.5), ids
    sampled across the corpus so touched components spread."""
    step = corpus_docs // (_BATCH // 2)
    variants = (
        _docs(spark, corpus_docs)
        .filter(F.col("doc_id") % step == 0)
        .limit(_BATCH // 2)
        .select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 10), " "
            ).alias("text"),
        )
    )
    fresh = _docs(spark, _BATCH // 2, id_offset=90_000_000)
    return variants.unionByName(fresh)


def _du(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    import tempfile

    spark = get_spark(app_name="dedup-registry-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"constant batch = {_BATCH} docs (half variants, half fresh); "
        f"corpus grows 1x..8x; buckets sized {_BUCKETS_PER_5K} per 5k docs"
    )
    for scale in (1, 2, 4, 8):
        n = 5_000 * scale
        buckets = _BUCKETS_PER_5K * scale
        base = _docs(spark, n).localCheckpoint()
        registry = empty_dedup_registry(spark)
        postings = empty_dedup_postings(spark)
        registry, postings = dedup_fold_increment(registry, postings, base)
        registry = registry.localCheckpoint()
        postings = postings.localCheckpoint()
        n_reg = registry.count()
        batch = _batch(spark, n).localCheckpoint()
        n_batch = batch.count()

        # (a) compute: in-memory fold wall time
        t0 = time.perf_counter()
        out_reg, _ = dedup_fold_increment(registry, postings, batch)
        n_out = out_reg.count()
        dt = time.perf_counter() - t0

        # (b) write-IO: the same fold through the partitioned state
        with tempfile.TemporaryDirectory() as tmp:
            reg_dir = os.path.join(tmp, "reg")
            post_dir = os.path.join(tmp, "post")
            fold_doc_batch(
                base.select("doc_id", "text"), 0, reg_dir, post_dir,
                num_buckets=buckets,
            )
            base_bytes = _du(reg_dir) + _du(post_dir)
            fold_doc_batch(
                batch, 1, reg_dir, post_dir, num_buckets=buckets
            )
            v1_bytes = _du(os.path.join(reg_dir, "v=1")) + _du(
                os.path.join(post_dir, "v=1")
            )
            touched = len(
                [
                    p
                    for p in os.listdir(os.path.join(reg_dir, "v=1", "data"))
                    if p.startswith("_pid=")
                ]
            )
        print(
            f"corpus={n_reg:6d} docs  batch={n_batch}  fold={dt:6.2f}s  "
            f"out={n_out:6d}  state={base_bytes/1e6:7.1f}MB  "
            f"fold_write={v1_bytes/1e6:6.2f}MB  "
            f"touched_reg_buckets={touched}/{buckets}"
        )

    # --- ER registry: the same write-IO measurement (verdict #4's
    # named target) — constant 50-name batch, growing vocabulary ------
    from cam_location_addressing_feature_service_etl_spark.streaming.er import (
        fold_master_batch,
    )

    print("ER registry: constant 50-name batch; buckets 256 per 10k names")
    for scale in (1, 2, 4, 8):
        v = 10_000 * scale
        buckets = 256 * scale
        base = _er_names(spark, v).localCheckpoint()
        batch = (
            _er_names(spark, v)
            .filter(F.col("mk") % (v // 50) == 0)
            .select(
                (F.col("mk") + 10_000_000).alias("mk"),
                F.concat(
                    F.substring("mn", 1, 3),
                    F.lit("z"),
                    F.expr("substring(mn, 5)"),
                ).alias("mn"),
            )
            .localCheckpoint()
        )
        with tempfile.TemporaryDirectory() as tmp:
            reg_dir = os.path.join(tmp, "reg")
            fold_master_batch(base, 0, reg_dir, num_buckets=buckets)
            base_bytes = _du(reg_dir)
            t0 = time.perf_counter()
            fold_master_batch(batch, 1, reg_dir, num_buckets=buckets)
            dt = time.perf_counter() - t0
            v1_bytes = _du(os.path.join(reg_dir, "v=1"))
            touched = len(
                [
                    p
                    for p in os.listdir(os.path.join(reg_dir, "v=1", "data"))
                    if p.startswith("_pid=")
                ]
            )
        print(
            f"vocab={v:6d} names  batch=50  fold={dt:6.2f}s  "
            f"state={base_bytes/1e6:6.2f}MB  fold_write={v1_bytes/1e3:6.1f}kB  "
            f"touched_buckets={touched}/{buckets}"
        )
    spark.stop()
    return 0


def _er_names(spark, n):
    """n distinct two-token md5-derived names (mutually dissimilar —
    the er_incremental_probe lesson)."""
    return spark.range(n).select(
        F.col("id").alias("mk"),
        F.concat(
            F.substring(F.md5(F.col("id").cast("string")), 1, 8),
            F.lit(" "),
            F.substring(
                F.md5(F.concat(F.lit("t"), F.col("id").cast("string"))), 1, 8
            ),
        ).alias("mn"),
    )


if __name__ == "__main__":
    raise SystemExit(main())
