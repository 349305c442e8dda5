"""Forest traversal by pointer jumping — root + depth for every node
of a (node, parent) relation in log-depth rounds (used by
``workload/graph.py graph_pointer_jump_roots``; regimes measured in
``scripts/pj_regimes.py`` / SCALING.md).

Each round joins the ancestor-pointer frame with itself: my ancestor's
ancestor becomes my ancestor and hop counts add, so the known-ancestor
distance doubles per round — ``rounds`` rounds resolve any depth ≤
2**rounds, where the naive parent-at-a-time walk needs depth rounds.
Roots point at themselves with distance 0 and are a fixed point of the
join (they absorb their subtree's pointers without drifting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..runtime import materialize


def pointer_jump(parents: DataFrame, rounds: int) -> DataFrame:
    """``parents``: (node, parent) with parent NULL for roots. Returns
    (node, root, depth), exact for every node whose depth ≤ 2**rounds
    (deeper nodes would carry a non-root ancestor — callers size
    ``rounds`` from a domain bound, or assert max depth downstream).
    Per round: ONE self LEFT join on the pointer column + lineage
    truncation; resolved rows are join fixed points. A dangling parent
    (a non-null parent id absent from the node column) finds no hop
    partner and KEEPS its stale pointer — malformed forests surface as
    rows whose root is the dangling id, never as silent row loss."""
    state = parents.select(
        "node",
        F.coalesce(F.col("parent"), F.col("node")).alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0)).otherwise(F.lit(1)).alias(
            "dist"
        ),
    ).transform(materialize)
    for _ in range(rounds):
        hop = state.select(
            F.col("node").alias("h_node"),
            F.col("anc").alias("h_anc"),
            F.col("dist").alias("h_dist"),
        )
        state = (
            state.join(hop, state["anc"] == hop["h_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("h_anc"), F.col("anc")).alias("anc"),
                (
                    F.col("dist") + F.coalesce(F.col("h_dist"), F.lit(0))
                ).alias("dist"),
            )
            .transform(materialize)
        )
    return state.select(
        "node", F.col("anc").alias("root"), F.col("dist").alias("depth")
    )


def naive_parent_walk(parents: DataFrame, rounds: int) -> DataFrame:
    """The depth-round baseline: each round advances ONE parent hop.
    Exists for the regimes probe only — same output as
    ``pointer_jump`` when ``rounds`` ≥ max depth, at depth shuffles
    instead of log(depth). Same dangling-parent discipline: the left
    join keeps the stale pointer instead of dropping the row."""
    p = parents.select(
        F.col("node").alias("p_node"), F.col("parent").alias("p_parent")
    ).transform(materialize)
    state = parents.select(
        "node",
        F.coalesce(F.col("parent"), F.col("node")).alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0)).otherwise(F.lit(1)).alias(
            "dist"
        ),
    ).transform(materialize)
    for _ in range(rounds):
        # left join: a matched root row has p_parent NULL (keep anc,
        # dist unchanged) and an unmatched dangling pointer produces
        # the same NULLs — both are fixed points of the expressions
        # below, so dangling parents are retained, not dropped.
        state = (
            state.join(p, state["anc"] == p["p_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("p_parent"), F.col("anc")).alias("anc"),
                F.when(F.col("p_parent").isNull(), F.col("dist"))
                .otherwise(F.col("dist") + 1)
                .alias("dist"),
            )
            .transform(materialize)
        )
    return state.select(
        "node", F.col("anc").alias("root"), F.col("dist").alias("depth")
    )
