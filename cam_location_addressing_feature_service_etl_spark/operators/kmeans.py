"""Iterative k-means (Lloyd's) in pure DataFrame algebra — the
representative *iterative* algorithm. A fixed iteration count CAN be
checked against ANSI SQL by unrolling each Lloyd round as a CTE chain
(the workload registers exactly that oracle); ``round_digits`` exists
so both engines agree bit-for-bit on argmin ties and centroid means.

Per iteration: assign each vector to its nearest centroid (squared
euclidean via zip_with/aggregate — JVM-side), then recompute centroids
as element-wise means (posexplode → groupBy(cluster, pos) avg →
re-assemble arrays). Assignments are persisted per round to keep the
plan linear in iterations.

Determinism: init = the k lowest vec_ids; ties in assignment break by
centroid id. Scale: each iteration is one shuffle for the assignment
argmin (window on vec_id) + one for the centroid mean; centroids
broadcast (k ≪ n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .topk import ASC, global_topk_ranked


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def kmeans_assign(
    vectors: DataFrame, centroids: DataFrame, round_digits: int | None = None
) -> DataFrame:
    """(vec_id, v) × (cluster, c) → (vec_id, cluster) by nearest centroid.

    ``round_digits`` rounds the squared distance before the argmin so an
    engine with a different float summation order (the DuckDB parity
    oracle) ranks identically; ties break by centroid id either way.
    """
    d = _sq_dist(F.col("v"), F.col("c"))
    if round_digits is not None:
        d = F.round(d, round_digits)
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "cluster", d.alias("d")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cluster"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster")
    )


def kmeans_update(
    vectors: DataFrame, assignments: DataFrame, round_digits: int | None = None
) -> DataFrame:
    """New centroids = element-wise mean of each cluster's members.

    ``round_digits`` rounds each mean component, re-synchronizing the
    centroid arrays with an oracle engine whose AVG partial-sums in a
    different order.
    """
    member = vectors.join(assignments, "vec_id").select(
        "cluster", F.posexplode("v").alias("pos", "val")
    )
    m = F.avg("val")
    if round_digits is not None:
        m = F.round(m, round_digits)
    means = member.groupBy("cluster", "pos").agg(m.alias("m"))
    return (
        means.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cluster", F.transform("pm", lambda s: s["m"]).alias("c"))
    )


def lloyd(
    vectors: DataFrame,
    k: int,
    iterations: int = 3,
    round_digits: int | None = None,
) -> DataFrame:
    """Run ``iterations`` rounds of Lloyd's; returns final assignments
    (vec_id, cluster). ``vectors`` must have (vec_id, embedding)."""
    v = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Init = the k lowest vec_ids. global_topk_ranked plans the take as
    # a distributed TakeOrderedAndProject (per-partition top-k, merge
    # k*P rows on one reducer) — the unpartitioned row_number() it
    # replaces sorted the ENTIRE vector corpus into a single partition
    # — and numbers the k survivors windowless (sorted-array aggregate).
    centroids = global_topk_ranked(
        v, [(F.col("vec_id"), ASC)], k, ["v"], rank_name="rn"
    ).select(
        (F.col("rn") - 1).cast("int").alias("cluster"), F.col("v").alias("c")
    )
    assignments = None
    for it in range(iterations):
        assignments = kmeans_assign(v, centroids, round_digits)
        if it < iterations - 1:
            # materialize: keeps the next round's plan flat. The LAST
            # round's assignments go straight to the caller's action —
            # an eager count there would just run the final argmin
            # twice (measured ~0.3s/round at sf0.1).
            assignments = assignments.persist()
            assignments.count()
        centroids = kmeans_update(v, assignments, round_digits)
    return assignments


def lloyd_train(
    vectors: DataFrame,
    k: int,
    iterations: int = 3,
    round_digits: int | None = None,
) -> DataFrame:
    """Run ``iterations`` FULL assign+update rounds and return the
    TRAINED centroids ``(cluster, c)`` — the IVF coarse quantizer's
    training step (``sim_ann_ivf_trained`` composes these with
    ``similarity.ivf_search``, the composition the r14 ANN probe named
    as the quality dial). Same init / tie-break / rounding discipline
    as :func:`lloyd`, so a fixed iteration count stays oracle-
    unrollable. Clusters that lose all members simply drop out of the
    mean aggregate (both engines agree — GROUP BY over members).

    Scale: identical per-round plans to :func:`lloyd` — centroids
    broadcast (k ≪ n), one argmin shuffle + one mean shuffle per
    round; every round's assignments are persisted because each feeds
    the next update."""
    v = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    centroids = global_topk_ranked(
        v, [(F.col("vec_id"), ASC)], k, ["v"], rank_name="rn"
    ).select(
        (F.col("rn") - 1).cast("int").alias("cluster"), F.col("v").alias("c")
    )
    for _ in range(iterations):
        assignments = kmeans_assign(v, centroids, round_digits)
        assignments = assignments.persist()
        assignments.count()
        centroids = kmeans_update(v, assignments, round_digits)
    return centroids
