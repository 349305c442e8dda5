"""Iterative BPE-style merge-rule induction over tokenized documents.

Each round: count adjacent token pairs corpus-wide, pick the single
most frequent pair (count desc, lexicographic tiebreak), merge its
non-overlapping occurrences greedy-left, repeat on the merged
sequences. This is the data-dependent iterative algorithm family —
unlike fixed-parameter iteration (connected components, PageRank),
the round-r transformation depends on a global statistic of round
r-1's output.

Greedy-left merging is sequential on paper, but overlaps can only
occur when the pair is a self-pair (a == b): a match at position p
conflicts with one at p+1 only if tok[p+1] equals both the pair's
right AND left element. So consecutive match runs are grouped
(gaps-and-islands) and the even offsets within each run are taken —
exactly greedy-left, expressed entirely in window functions. No UDF,
no sequential scan.

Scale: per round, one partial-aggregatable pair count (+ a top-1
TakeOrdered of that aggregate) and ONE doc-partitioned window
pipeline for the rewrite — every window shares the same
partitioning+sort, so the whole greedy-left rewrite costs a single
exchange; the merged pair is a 1-row broadcast. Sequences stay
exploded as (doc, pos, tok) between rounds with lineage truncated
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ..runtime import materialize

#: Joiner for merged tokens ("new vocabulary entries").
JOIN_CH = "_"


def bpe_merge_rules(
    tokens: DataFrame,
    rounds: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Run ``rounds`` merge rounds over ``tokens`` (columns: id_col,
    ``pos`` long, ``tok`` string; pos need only be ordered, not dense)
    and return the learned rules: (round, pair_a, pair_b, pair_count).
    """
    rules, _ = _bpe_rounds(tokens, rounds, id_col)
    return rules


def bpe_apply(
    tokens: DataFrame,
    rounds: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """The ENCODE side of BPE: the token stream after ``rounds``
    greedy-left merge rounds (rules re-learned from the same corpus —
    train→apply as one deterministic pipeline). Returns (id, pos, tok)
    with pos renumbered dense per doc."""
    _, stream = _bpe_rounds(tokens, rounds, id_col)
    return stream


def _bpe_rounds(
    tokens: DataFrame,
    rounds: int,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    wrun = wdoc.rowsBetween(Window.unboundedPreceding, 0)
    expl = tokens.transform(materialize)
    rules = None
    for r in range(1, rounds + 1):
        # one window pass produces the pair stream; it feeds both the
        # count and the rewrite, so materialize it
        with_next = expl.withColumn("nxt", F.lead("tok").over(wdoc)).transform(materialize)
        top = (
            with_next.filter(F.col("nxt").isNotNull())
            .groupBy("tok", "nxt")
            .agg(F.count(F.lit(1)).alias("pair_count"))
            .orderBy(F.desc("pair_count"), "tok", "nxt")
            .limit(1)
            .select(
                F.lit(r).alias("merge_round"),
                F.col("tok").alias("pair_a"),
                F.col("nxt").alias("pair_b"),
                F.col("pair_count"),
            )
            .transform(materialize)
        )
        rules = top if rules is None else rules.unionByName(top)
        # Rewrite in ONE window pipeline (every window below shares
        # wdoc's partitioning+sort, so Spark plans a single exchange):
        # match flag -> run starts (a run = consecutive matches; length
        # > 1 only for self-pairs) -> greedy-left = even offsets from
        # the running run-start -> a merged position's successor drops.
        merged_tok = F.concat(F.col("pair_a"), F.lit(JOIN_CH), F.col("pair_b"))
        stage = (
            # LEFT join, not crossJoin: when a round finds no adjacent
            # pair anywhere (every doc is a single token), ``top`` is
            # EMPTY and a cross join would annihilate the stream; the
            # left join keeps every row with a null pair, _m coalesces
            # to false, and the round is a no-op — encode returns the
            # stream unchanged. With the usual 1-row top the plans are
            # identical (broadcast nested loop over one row).
            with_next.join(
                F.broadcast(top.select("pair_a", "pair_b")), F.lit(True), "left"
            )
            .withColumn(
                "_m",
                F.coalesce(
                    (F.col("tok") == F.col("pair_a")) & (F.col("nxt") == F.col("pair_b")),
                    F.lit(False),
                ),
            )
            .withColumn(
                "_newrun",
                F.col("_m") & ~F.coalesce(F.lag("_m").over(wdoc), F.lit(False)),
            )
            # Greedy-left parity must be computed over row offsets, not
            # raw pos values: pos is ordered but not necessarily dense
            # (e.g. tokens at pos 0,2,4), and value arithmetic would
            # mark both matches of a self-pair run as _taken. _ridx is
            # a dense row index over the same window, so it shares the
            # single exchange with the rest of the pipeline.
            .withColumn("_ridx", F.row_number().over(wdoc))
            .withColumn(
                "_run_start",
                F.max(F.when(F.col("_newrun"), F.col("_ridx"))).over(wrun),
            )
            .withColumn(
                "_taken",
                F.col("_m") & ((F.col("_ridx") - F.col("_run_start")) % 2 == 0),
            )
            .withColumn("_drop", F.coalesce(F.lag("_taken").over(wdoc), F.lit(False)))
        )
        expl = (
            stage.filter(~F.col("_drop"))
            .select(
                F.col(id_col),
                F.row_number().over(wdoc).alias("pos"),
                F.when(F.col("_taken"), merged_tok).otherwise(F.col("tok")).alias("tok"),
            )
            .transform(materialize)
        )
    return rules, expl
