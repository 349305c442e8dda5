#!/usr/bin/env python
"""Entity-resolution scale probe (r11 verdict #7), two legs, both on
the PRODUCTION code paths:

1. **sf0.1 stage anatomy of er_resolve_entities**: measured candidate
   counts through the pipeline — registry rows → distinct names →
   PassJoin candidates → verified edges → CC label-graph — so the
   "candidates ∝ true matches, CC is vocabulary-sized" claim carries
   numbers, not prose.

2. **Hot-name skew stress for connected_components_star**: one name
   shared by K% of the master rows — the linkage skew case the banded
   geo probes never hit. Row-level candidate generation would emit
   ~(K%·rows)² pairs for that single name; the DISTINCT-NAME trick
   (dedup the value space before PassJoin, re-expand by equi-join at
   the end) collapses the hot name to ONE vocabulary node, so the
   probe measures: row-space pair count (computed arithmetically —
   never executed), value-space candidates (measured), CC input edges
   (measured), and the wall time of the full resolve at three skew
   levels. The equi-join fan-out back to rows is output-sized and
   appears as the linear `links` row count.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    connected_components_star,
)
from cam_location_addressing_feature_service_etl_spark.operators.fuzzy import (
    passjoin_candidates,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload.geo import (
    _LINK_BLOCK_STRATEGIES,
    _LINK_TAU,
    _block_names,
    _er_masters,
    link_feed_to_masters,
)


def _name_edges(nm_names):
    """The er_resolve_entities edge stage, verbatim: token-union
    blocked PassJoin candidates, one distinct, one verify."""
    cand = None
    for bk in _LINK_BLOCK_STRATEGIES:
        c = passjoin_candidates(
            _block_names(nm_names, bk), "nm", "blk", _LINK_TAU, seg_col="rest"
        ).select("name_a", "name_b")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct().localCheckpoint()
    edges = (
        cand.withColumn("d", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("d").between(1, _LINK_TAU))
        .select(F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b"))
        .localCheckpoint()
    )
    return cand, edges


def stage_anatomy(spark, sf_dir) -> None:
    print(f"== er_resolve_entities stage anatomy @ {sf_dir} ==")
    t0 = time.perf_counter()
    m = _er_masters(load(spark, sf_dir, "part")).localCheckpoint()
    n_rows = m.count()
    nm = m.select(F.col("mn").alias("nm")).distinct().localCheckpoint()
    n_names = nm.count()
    cand, edges = _name_edges(nm)
    n_cand, n_edges = cand.count(), edges.count()
    comp = connected_components_star(edges)
    n_cc_nodes = comp.count()
    dt = time.perf_counter() - t0
    print(
        f"rows={n_rows} distinct_names={n_names} "
        f"candidates={n_cand} verified_edges={n_edges} "
        f"cc_nodes={n_cc_nodes}  ({dt:.2f}s)"
    )
    print(
        f"candidate/name ratio={n_cand / n_names:.2f} "
        f"(sub-quadratic bar: names^2 would be {n_names * n_names:,})"
    )


def skew_stress(spark, sf_dir) -> None:
    part = load(spark, sf_dir, "part")
    base = _er_masters(part).localCheckpoint()
    total = base.count()
    feed = part.select(
        F.col("p_partkey").alias("fk"),
        F.col("p_name").alias("fn"),
    ).localCheckpoint()
    for pct in (1, 10, 25):
        # overwrite pct% of master names with ONE hot name
        hot = F.lit("hot shared widget name")
        m = base.select(
            "mk",
            F.when(F.col("mk") % 100 < pct, hot).otherwise(F.col("mn")).alias(
                "mn"
            ),
        ).localCheckpoint()
        hot_rows = m.filter(F.col("mn") == "hot shared widget name").count()
        t0 = time.perf_counter()
        nm = m.select(F.col("mn").alias("nm")).distinct().localCheckpoint()
        n_names = nm.count()
        cand, edges = _name_edges(nm)
        n_cand, n_edges = cand.count(), edges.count()
        comp = connected_components_star(edges)
        comp.count()
        links = link_feed_to_masters(
            m, feed, _LINK_TAU, block_keys=_LINK_BLOCK_STRATEGIES
        )
        n_links = links.count()
        dt = time.perf_counter() - t0
        rowspace = hot_rows * (hot_rows - 1) // 2
        print(
            f"hot={pct:2d}% ({hot_rows}/{total} rows): "
            f"row-space hot pairs would be {rowspace:,}; "
            f"value-space: names={n_names} candidates={n_cand} "
            f"edges={n_edges} links={n_links}  ({dt:.2f}s)"
        )


def main() -> int:
    spark = get_spark(app_name="er-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    stage_anatomy(spark, sf_dir)
    print()
    print(f"== hot-name skew stress (distinct-name trick) @ {sf_dir} ==")
    skew_stress(spark, sf_dir)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
