#!/usr/bin/env python
"""Span-level decontamination growth probe (r16): the rewrite's cost
model says the benchmark side is FIXED and broadcast (frozen eval
suites don't grow with the corpus), so scaling the train corpus 1x/2x/
4x should scale wall time ~linearly while the collision stream stays
∝ the planted quotes — no term ∝ corpus² and no corpus-vs-corpus join
anywhere in the plan.

Fixture: benchmark = 200 fixed md5-token docs; train corpus = n
mutually-dissimilar md5-token docs, every 50th of which quotes a
12-token run from its benchmark doc (so planted quotes grow ∝ corpus,
the realistic leak model). Reported per scale: train docs, planted
quotes, collision-hit gram rows (the only shuffled stream), docs cut,
removed tokens, wall time. Timing discipline: one JVM, sequential
(SCALING.md probe rules)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    _gram_postings,
    remove_contaminated_spans,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark

_K = 8
_N_BENCH = 200
_QUOTE_EVERY = 50
_QUOTE_TOKENS = 12


def _tok_text(prefix: str, tokens: int):
    toks = [
        F.substring(
            F.md5(F.concat(F.lit(f"{prefix}{j}:"), F.col("id").cast("string"))),
            1,
            10,
        )
        for j in range(tokens)
    ]
    return F.concat_ws(" ", *toks)


def _bench(spark):
    return spark.range(_N_BENCH).select(
        (F.col("id") + 90_000_000).alias("doc_id"),
        _tok_text("b", 30).alias("text"),
    )


def _train(spark, n):
    """n dissimilar docs; every _QUOTE_EVERY-th doc splices in tokens
    [5, 5+_QUOTE_TOKENS) of benchmark doc (id mod _N_BENCH)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), _tok_text("t", 40).alias("text")
    )
    quote_src = [
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"b{j}:"), (F.col("doc_id") % _N_BENCH).cast("string")
                )
            ),
            1,
            10,
        )
        for j in range(5, 5 + _QUOTE_TOKENS)
    ]
    return base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % _QUOTE_EVERY == 0,
            F.concat(F.col("text"), F.lit(" "), F.concat_ws(" ", *quote_src)),
        ).otherwise(F.col("text")),
    )


def main() -> int:
    spark = get_spark(app_name="decontam-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    bench = _bench(spark).localCheckpoint()
    bench_kg = _gram_postings(bench, "doc_id", "text", _K).select("kg").distinct()
    print(f"--- bench fixed: {_N_BENCH} docs, k={_K} ---")
    for scale in (1, 2, 4):
        n = 20_000 * scale
        train = _train(spark, n).localCheckpoint()
        planted = n // _QUOTE_EVERY
        hits = (
            _gram_postings(train, "doc_id", "text", _K)
            .join(F.broadcast(bench_kg), "kg", "leftsemi")
            .count()
        )
        t0 = time.perf_counter()
        out = remove_contaminated_spans(train, bench, "doc_id", "text", k=_K)
        agg = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.count(F.when(F.col("removed_tokens") > 0, 1)).alias("cut"),
            F.sum("removed_tokens").alias("removed"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        print(
            f"x{scale}: train={n} planted={planted} hit_grams={hits} "
            f"docs={agg['docs']} cut={agg['cut']} removed={agg['removed']} "
            f"wall={dt:.2f}s"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
