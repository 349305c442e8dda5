#!/usr/bin/env python
"""Shared-span alignment growth probe (r14 verdict #2/#5 done-bar):
the UNCAPPED pairwise ExactSubstr alignment join is bounded by
Σ df(kg)² over k-gram hashes — on a boilerplate corpus (every doc
carries one hot footer) that is Ω(doc-pairs), so join rows and the
OUTPUT itself grow quadratically in the corpus; with the df cap
(``shared_token_spans(max_gram_df=D)``) the hot grams drop into the
stop-gram ledger and the alignment join stays ∝ the true (deliberate)
shared spans — flat per corpus doubling.

Two corpus shapes, 1x/2x/4x:
- RICH: mutually-dissimilar md5-token docs + a constant number of
  deliberate variant pairs sharing a 21-token run — the audit regime;
  cap and no-cap must agree here (no gram exceeds the cap).
- BOILER: the same corpus with one 12-token footer line on EVERY doc —
  each footer 5-gram's df equals the corpus size.

Reported per scale: alignment-join rows (the Σ df² cost), emitted
spans, stop-gram ledger size, wall time. Timing discipline: one JVM,
sequential (SCALING.md probe rules)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    shared_span_stop_grams,
    shared_token_spans,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark

_K = 5
_MIN_SPAN = 8
_CAP = 50
_N_VARIANTS = 50  # constant deliberate near-dup pairs per corpus

_FOOTER = (
    "copyright footer terms of service all rights"
    " reserved privacy policy do not"
)


def _docs(spark, n, tokens=40):
    toks = [
        F.substring(
            F.md5(F.concat(F.lit(f"t{j}:"), F.col("id").cast("string"))), 1, 10
        )
        for j in range(tokens)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *toks).alias("text"),
    )


def _with_variants(spark, n, tokens=40):
    """Base corpus + a CONSTANT number of variants each sharing the
    21-token run [5, 25] with its source doc — the true spans every
    scale must report identically."""
    base = _docs(spark, n, tokens)
    step = max(1, n // _N_VARIANTS)
    variants = (
        base.filter(F.col("doc_id") % step == 0)
        .limit(_N_VARIANTS)
        .select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"),
            F.concat(
                F.lit("variant preamble tokens here then "),
                F.array_join(
                    F.slice(F.split(F.col("text"), " "), 6, 21), " "
                ),
            ).alias("text"),
        )
    )
    return base.unionByName(variants)


def _boiler(df):
    return df.withColumn("text", F.concat(F.col("text"), F.lit(" " + _FOOTER)))


def _join_rows(df) -> int:
    """Rows of the alignment join (the Σ df(kg)² cost) — computed from
    the gram-df profile, exact for the id_a<id_b pairwise join over
    positional postings."""
    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        _gram_postings,
    )

    kg = _gram_postings(df, "doc_id", "text", _K)
    # per gram: cross-doc ordered position pairs = (sum² − Σ per-doc²)/2
    per = kg.groupBy("kg", "_id").agg(F.count(F.lit(1)).alias("c"))
    row = (
        per.groupBy("kg")
        .agg(
            (
                (F.sum("c") * F.sum("c") - F.sum(F.col("c") * F.col("c"))) / 2
            ).alias("pairs")
        )
        .agg(F.sum("pairs"))
        .collect()[0][0]
    )
    return int(row or 0)


def _run(label, corpus, cap):
    t0 = time.perf_counter()
    spans = shared_token_spans(
        corpus, "doc_id", "text", k=_K, min_span=_MIN_SPAN, max_gram_df=cap
    )
    n_spans = spans.count()
    dt = time.perf_counter() - t0
    return n_spans, dt


def main() -> int:
    spark = get_spark(app_name="shared-spans-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for shape in ("rich", "boiler"):
        print(f"--- {shape} corpus (k={_K}, min_span={_MIN_SPAN}, cap={_CAP}) ---")
        # boiler base is smaller: its UNCAPPED output alone is
        # ∝ doc-pairs (every pair shares the footer span)
        n0 = 2_000 if shape == "rich" else 1_000
        for scale in (1, 2, 4):
            n = n0 * scale
            corpus = _with_variants(spark, n)
            if shape == "boiler":
                corpus = _boiler(corpus)
            corpus = corpus.localCheckpoint()
            jr = _join_rows(corpus)
            n_unc, dt_unc = _run("uncapped", corpus, None)
            n_cap, dt_cap = _run("capped", corpus, _CAP)
            n_ledger = shared_span_stop_grams(
                corpus, "doc_id", "text", k=_K, max_gram_df=_CAP
            ).count()
            print(
                f"docs={n + _N_VARIANTS:6d}  uncapped_join_rows={jr:>12,}  "
                f"uncapped: spans={n_unc:>8} {dt_unc:6.2f}s  "
                f"capped: spans={n_cap:>6} {dt_cap:6.2f}s  "
                f"stop_grams={n_ledger}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
