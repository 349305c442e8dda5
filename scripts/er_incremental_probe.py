#!/usr/bin/env python
"""Incremental-ER growth probe: the r11 verdict's done-bar phrase is
"per-batch work ∝ batch, not corpus" — this measures it. A CONSTANT
2,000-row master batch is folded into registries of growing size
(1×/2×/4×/8× vocabulary), on the production ``er_resolve_increment``
path. If per-batch work tracked the corpus, fold time would double per
row; the claim is that it grows only with the vocabulary-sized INDEX
side of the candidate join (slow, sub-linear wall-clock growth at this
scale where fixed stage costs dominate) while candidates stay ∝ the
batch's true near-matches.

Synthetic names: two md5-derived hex tokens per name — random-looking
strings whose pairwise distance is almost always > tau, so true
near-matches come ONLY from the batch's deliberate 1-char corruptions
(constant per batch across scales). A first draft used dense
'alpha<i> beta<j>' grids — 977 names per last-token block ALL within
tau of each other, a quadratic edge set that is a pathological
self-similar vocabulary, not a registry; probe data must be dissimilar
for "candidates ∝ true matches" to mean anything.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload.geo import (
    er_empty_registry,
    er_resolve_increment,
)

_BATCH = 2_000


def _names(spark, n):
    """n distinct two-token names, tokens = md5-derived hex — mutually
    dissimilar (pairwise distance > tau with overwhelming probability)."""
    return spark.range(n).select(
        F.col("id").alias("mk"),
        F.concat(
            F.substring(F.md5(F.col("id").cast("string")), 1, 8),
            F.lit(" "),
            F.substring(F.md5(F.concat(F.lit("t"), F.col("id").cast("string"))), 1, 8),
        ).alias("mn"),
    )


def main() -> int:
    spark = get_spark(app_name="er-incremental-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"constant batch = {_BATCH} rows; registry grows 1x..8x")
    for scale in (1, 2, 4, 8):
        v = 10_000 * scale
        base = _names(spark, v).localCheckpoint()
        registry = er_resolve_increment(
            er_empty_registry(spark), base
        ).localCheckpoint()
        n_reg = registry.count()
        # constant batch: 1-char corruptions of existing names (ids
        # sampled across the whole registry so blocking spreads)
        batch = (
            _names(spark, v)
            .filter(F.col("mk") % (v // _BATCH) == 0)
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
        n_batch = batch.count()
        t0 = time.perf_counter()
        out = er_resolve_increment(registry, batch)
        n_out = out.count()
        dt = time.perf_counter() - t0
        print(
            f"registry={n_reg:6d} names  batch={n_batch}  "
            f"fold={dt:6.2f}s  out_names={n_out}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
