"""Invariants of operators/pagerank.py: on a symmetrized edge set the
total rank mass is conserved each round (sum = 0.15·N + 0.85·sum, and
the symmetrized graph loses no contribution mass, so it stays N), and
a star-graph hub outranks its leaves."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.pagerank import pagerank


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return df.unionByName(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_rank_mass_conserved_on_symmetric_graph(spark):
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")])
    ranks = pagerank(edges, iterations=4)
    rows = ranks.collect()
    assert len(rows) == 4
    assert abs(sum(r["rank"] for r in rows) - 4.0) < 1e-4


def test_star_hub_outranks_leaves(spark):
    edges = _sym(spark, [("hub", "l1"), ("hub", "l2"), ("hub", "l3"), ("hub", "l4")])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    assert all(got["hub"] > got[f"l{i}"] for i in range(1, 5))
    # leaves are symmetric: identical rank
    assert len({got[f"l{i}"] for i in range(1, 5)}) == 1
