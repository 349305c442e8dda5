#!/usr/bin/env python
"""Measure the fixed-round vs run-to-convergence connected-components
trade-off in both regimes (the `dedup_jaccard_boiler_*` discipline):

1. the dedup-cluster regime — the real sf edge set that
   `dedup_connected_components` / `dedup_cc_star_converged` share:
   tiny components, diameter ~2, where fixed-3-round label propagation
   is already converged and skips convergence detection entirely;
2. the high-diameter regime — synthetic chain components where
   fixed-round propagation must run DIAMETER rounds to be correct
   (3 rounds would return wrong labels), while large/small-star
   alternation converges in O(log n) rounds.

Usage: python scripts/cc_star_regimes.py [sf_dir] [chain_len] [n_chains]
Prints one timing line per (regime, algorithm); paste results into the
two queries' docstrings so the measured numbers ship with the code.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES


def timed(label: str, fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best:7.2f}s  (best of {reps})")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_chains = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    spark = get_spark(app_name="cc-regimes")
    spark.sparkContext.setLogLevel("ERROR")

    # regime 1: the real dedup edge set (via the two registry queries,
    # so the measurement includes the shared candidate-pair build)
    timed(
        f"dedup regime: fixed-3-round cc      ({sf_dir})",
        lambda: QUERIES["dedup_connected_components"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save(),
    )
    timed(
        f"dedup regime: cc_star to convergence({sf_dir})",
        lambda: QUERIES["dedup_cc_star_converged"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save(),
    )

    # regime 2: chain graph — n_chains paths of chain_len nodes each.
    # Edge (i, i+1) within each chain; component minimum must travel
    # chain_len-1 hops, so fixed-round propagation needs chain_len-1
    # rounds to be CORRECT.
    n = chain_len * n_chains
    ids = spark.range(n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    chains = ids.filter((F.col("id_b") % chain_len) != 0).persist()
    chains.count()
    print(
        f"\nchain regime: {n_chains} chains x {chain_len} nodes "
        f"(diameter {chain_len - 1})"
    )

    def run_fixed(rounds: int):
        return (
            connected_components(chains, iterations=rounds)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def run_star():
        return (
            connected_components_star(chains)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    timed("chain regime: cc_star to convergence", run_star, reps=2)
    timed("chain regime: fixed cc, 3 rounds (WRONG labels)", lambda: run_fixed(3), reps=2)
    timed(
        f"chain regime: fixed cc, {chain_len - 1} rounds (correct)",
        lambda: run_fixed(chain_len - 1),
        reps=1,
    )

    # correctness cross-check: star labels equal converged propagation
    star = connected_components_star(chains)
    wrong = (
        star.groupBy("label")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") != chain_len)
        .count()
    )
    print(f"cc_star component-size check: {wrong} wrong-size components")


if __name__ == "__main__":
    main()
