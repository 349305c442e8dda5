"""Fixed-round synchronous label propagation (community detection)
as pure DataFrame iteration.

Same engineering shape as ``operators/pagerank.py``: a deterministic,
oracle-checkable round count, edges materialized once before the
per-round fan-out, lineage truncated per round. Ties are broken
deterministically (max vote count, then MIN label), and every node
votes for its OWN current label too — the standard self-vote damping,
without which synchronous LPA oscillates on bipartite graphs (and the
trading graph here IS bipartite).

The per-round argmax is two partial-aggregatable groupBys — vote
counts, then ``min(struct(-cnt, label))`` per node — no window
function, so map-side combine applies at every stage and there is no
per-node sort. Skewed hubs split under AQE like every other
node-keyed shuffle in the graph family.

Reference parity note: the reference engine has no graph surface;
this extends the engine's own iterative-graph family (pagerank,
connected components, k-core) with the community-detection member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..runtime import materialize


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    single_exchange: bool = False,
) -> DataFrame:
    """Run exactly ``rounds`` synchronous LPA rounds over a directed
    edge list (feed a symmetrized set for undirected semantics).
    Initial label of a node is its own id (string); each round every
    node adopts the most frequent label among its neighbors plus
    itself, ties to the smallest label. Returns (node, label).

    The node universe is src UNION dst, so on a non-symmetrized edge
    list a dst-only node still gets its self-label at round 0 and a
    self-vote every round (it receives in-messages but emits none —
    directed semantics; symmetrize for undirected).

    ``single_exchange`` is the measured BALANCED-GRAPH dial (SCALING.md
    r10 drift-family addendum): repartition the message stream by
    ``node`` before the vote count so both per-round groupBys reuse
    ONE node-keyed exchange (hash(node) satisfies the (node, label)
    clustering too) — ~30% faster at sf0.1 on the near-balanced
    supplier–part graph (5.7-6.6s vs 8.4-12.5s per 3-round run through
    this code path). It ships RAW messages on that shuffle: duplicate
    (node, label) votes are NOT combined map-side, and a hub's entire
    in-box lands in one partition that the downstream aggregation
    cannot AQE-split — a hub-regime loss, which is why the
    two-exchange form stays the default. Both forms are vote-for-vote
    identical (pinned in tests/test_analytics_tranche.py).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).transform(
        materialize
    )
    labels = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .transform(materialize)
    )
    for i in range(rounds):
        msgs = e.join(
            labels, e["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "label").unionByName(labels)
        if single_exchange:
            msgs = msgs.repartition("node")
        votes = msgs.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("neg"), F.col("label"))
                ).alias("best")
            )
            .select("node", F.col("best.label").alias("label"))
        )
        if i < rounds - 1:
            labels = labels.transform(materialize)
    return labels
