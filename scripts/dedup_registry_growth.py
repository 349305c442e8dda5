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
    empty_dedup_dfreq,
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


def _batch(spark, corpus_docs, tokens=12):
    """Constant-size batch: half fresh singletons, half near-dup
    variants of existing docs (drop the last 2 tokens — trigram
    Jaccard vs the original ≈ (n-4)/(n+... ) well above 0.5), ids
    sampled across the corpus so touched components spread."""
    step = corpus_docs // (_BATCH // 2)
    variants = (
        _docs(spark, corpus_docs, tokens=tokens)
        .filter(F.col("doc_id") % step == 0)
        .limit(_BATCH // 2)
        .select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, tokens - 2), " "
            ).alias("text"),
        )
    )
    fresh = _docs(spark, _BATCH // 2, id_offset=90_000_000, tokens=tokens)
    return variants.unionByName(fresh)


#: one boilerplate footer line appended to EVERY doc in the forced-
#: boilerplate probe — each footer trigram's df equals the corpus size,
#: the regime the r13 verdict measured superlinear in the naive fold
_FOOTER = (
    "copyright footer terms of service all rights reserved"
    " privacy policy do not reproduce"
)


def _boiler(df):
    return df.withColumn("text", F.concat(F.col("text"), F.lit(" " + _FOOTER)))


def _naive_edge_stage(registry, postings, batch, threshold=0.5, shingle_n=3):
    """The PRE-r14 fold's candidate+verify stage (full batch postings
    probe the full index, no prefix guard) — kept ONLY as this probe's
    blowup reference; the engine fold now probes one-sided PPJoin
    prefixes (operators/dedup_registry.py). Returns (n_cand, n_edges)."""
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        shingles_col,
        tokens_col,
    )
    from cam_location_addressing_feature_service_etl_spark.runtime import (
        materialize,
    )

    new_docs = (
        batch.dropDuplicates(["doc_id"])
        .join(registry.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", "text")
    )
    toks = new_docs.select(
        "doc_id", tokens_col(F.col("text")).alias("_toks")
    ).transform(materialize)
    bp = toks.select(
        "doc_id",
        F.explode(shingles_col(F.col("_toks"), shingle_n)).alias("shingle"),
    ).select("doc_id", F.md5("shingle").alias("sh")).transform(materialize)
    bsizes = bp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = bp.select(F.col("doc_id").alias("id_a"), "sh")
    cross = (
        a.join(postings.select(F.col("doc_id").alias("id_b"), "sh"), "sh")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    within = (
        a.join(bp.select(F.col("doc_id").alias("id_b"), "sh"), "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cand = cross.unionByName(within).localCheckpoint()
    n_cand = cand.count()
    sizes = registry.select("doc_id", "n_sh").unionByName(bsizes)
    n_edges = (
        cand.join(sizes.selectExpr("doc_id AS id_a", "n_sh AS sz_a"), "id_a")
        .join(sizes.selectExpr("doc_id AS id_b", "n_sh AS sz_b"), "id_b")
        .filter(
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            )
            >= threshold
        )
        .count()
    )
    return n_cand, n_edges


#: content tokens per doc in the boilerplate probe. The footer must be
#: a MINORITY of each doc (< the 1−τ prefix fraction): prefix
#: completeness requires probing (1−τ)·|sh|+1 shingles, so a doc whose
#: boilerplate EXCEEDS that fraction must probe hot shingles no matter
#: the order — with 12-token docs and the 13-token footer (>50%
#: boilerplate at τ=0.5) the fold was measured emitting batch×corpus
#: candidates exactly like naive. 40 content tokens (~25% boilerplate)
#: is the realistic shape the prefix design targets.
_BOILER_TOKENS = 40


def _boiler_probe(spark) -> None:
    """Forced-boilerplate growth A/B (r13 verdict #1 done-bar): the
    constant batch folds into corpora of growing size where EVERY doc
    shares one footer line. The naive probe's candidate volume grows
    ∝ corpus per fold (each hot footer shingle collides batch × df);
    the shipped one-sided-prefix fold never probes the hot shingles,
    so its fold time stays flat."""
    print(
        f"forced-boilerplate regime: every doc + batch doc carries the "
        f"{len(_FOOTER.split())}-token footer on {_BOILER_TOKENS} content "
        f"tokens; constant batch={_BATCH}"
    )
    for scale in (1, 2, 4, 8, 16):
        n = 5_000 * scale
        base = _boiler(_docs(spark, n, tokens=_BOILER_TOKENS)).localCheckpoint()
        registry = empty_dedup_registry(spark)
        postings = empty_dedup_postings(spark)
        dfreq = empty_dedup_dfreq(spark)
        registry, postings, dfreq = dedup_fold_increment(
            registry, postings, base, dfreq=dfreq
        )
        registry = registry.localCheckpoint()
        postings = postings.localCheckpoint()
        dfreq = dfreq.localCheckpoint()
        batch = _boiler(
            _batch(spark, n, tokens=_BOILER_TOKENS)
        ).localCheckpoint()

        t0 = time.perf_counter()
        out_reg, _, _ = dedup_fold_increment(
            registry, postings, batch, dfreq=dfreq
        )
        n_out = out_reg.count()
        dt_prefix = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_cand, n_edges = _naive_edge_stage(registry, postings, batch)
        dt_naive = time.perf_counter() - t0
        print(
            f"corpus={n:6d}  prefix_fold={dt_prefix:6.2f}s (out={n_out})  "
            f"naive_edge_stage={dt_naive:6.2f}s "
            f"(cand={n_cand}, edges={n_edges})"
        )


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
        dfreq = empty_dedup_dfreq(spark)
        registry, postings, dfreq = dedup_fold_increment(
            registry, postings, base, dfreq=dfreq
        )
        registry = registry.localCheckpoint()
        postings = postings.localCheckpoint()
        dfreq = dfreq.localCheckpoint()
        n_reg = registry.count()
        batch = _batch(spark, n).localCheckpoint()
        n_batch = batch.count()

        # (a) compute: in-memory fold wall time (df side state threaded
        # — the steady-state shape; no fold stage aggregates postings)
        t0 = time.perf_counter()
        out_reg, _, _ = dedup_fold_increment(
            registry, postings, batch, dfreq=dfreq
        )
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

    _boiler_probe(spark)

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
