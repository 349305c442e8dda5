#!/usr/bin/env python
"""Pointer-jumping vs naive parent walk — the log-vs-depth regimes,
measured on the PRODUCTION code paths (``operators/hierarchy.py``; the
probe-shares-production discipline the r9 verdict demanded of every
regime script).

Two forests:
- shallow: the registered query's decimal trie over sf0.1 part keys
  (depth ≤ 6) — the regime where both finish in a handful of rounds.
- deep: 2,000 disjoint chains × 64 nodes (depth 63) — pointer jumping
  needs ceil(log2(63)) = 6 rounds; the naive walk needs 63 one-hop
  rounds to be CORRECT (fewer rounds return wrong roots/depths).

Both variants must return IDENTICAL (node, root, depth) sets — the
probe doubles as a correctness cross-check, like cc_star_regimes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.hierarchy import (
    naive_parent_walk,
    pointer_jump,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.tables import load


def _timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    n = out.count()
    dt = time.perf_counter() - t0
    print(f"{label:34s} {dt:7.2f}s  rows={n}")
    return out


def main() -> int:
    spark = get_spark(app_name="pj-regimes")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # --- shallow: the registered query's trie ---------------------------
    part = load(spark, sf_dir, "part")
    trie = (
        part.select(F.col("p_partkey").alias("node"))
        .distinct()
        .select(
            "node",
            F.when(F.col("node") < 10, F.lit(None).cast("long"))
            .otherwise(F.floor(F.col("node") / 10).cast("long"))
            .alias("parent"),
        )
        .persist()
    )
    trie.count()
    print("-- shallow forest (decimal trie, depth <= 6) --")
    a = _timed("pointer_jump rounds=5", lambda: pointer_jump(trie, 5))
    b = _timed("naive_walk rounds=6", lambda: naive_parent_walk(trie, 6))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    trie.unpersist()

    # --- deep: 2000 chains x 64 (depth 63) ------------------------------
    chains = (
        spark.range(2000 * 64)
        .select(
            F.col("id").alias("node"),
            F.when(F.col("id") % 64 == 0, F.lit(None).cast("long"))
            .otherwise(F.col("id") - 1)
            .alias("parent"),
        )
        .persist()
    )
    chains.count()
    print("-- deep forest (2000 chains x 64, depth 63) --")
    c = _timed("pointer_jump rounds=6", lambda: pointer_jump(chains, 6))
    d = _timed("naive_walk rounds=63", lambda: naive_parent_walk(chains, 63))
    assert c.exceptAll(d).count() == 0 and d.exceptAll(c).count() == 0
    # fewer naive rounds are WRONG, not just slow
    w = naive_parent_walk(chains, 6)
    wrong = w.exceptAll(c).count()
    print(f"naive_walk rounds=6 wrong rows: {wrong} (must be > 0)")
    assert wrong > 0
    chains.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
