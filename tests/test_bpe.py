"""Greedy-left semantics of operators/bpe.py, including the only
genuinely sequential-looking case: self-pair runs ("b b b b b" must
merge positions 1-2 and 3-4, never the overlapping middle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.bpe import (
    bpe_merge_rules,
)


def _tokens(spark, docs):
    rows = [(i, p, t) for i, toks in enumerate(docs) for p, t in enumerate(toks)]
    return spark.createDataFrame(rows, "doc_id long, pos long, tok string")


def test_self_pair_run_merges_greedy_left(spark):
    rules = bpe_merge_rules(_tokens(spark, [["b"] * 5]), rounds=3).collect()
    got = [(r["merge_round"], r["pair_a"], r["pair_b"], r["pair_count"]) for r in rules]
    # round 1: (b,b) appears 4x; greedy-left merges positions (0,1) and
    # (2,3) -> [b_b, b_b, b]. round 2 pairs: (b_b,b_b) and (b_b,b),
    # both count 1 -> lexicographic tiebreak picks (b_b, b) -> merges
    # the TRAILING pair -> [b_b, b_b_b]. round 3: one pair left.
    assert sorted(got) == [
        (1, "b", "b", 4),
        (2, "b_b", "b", 1),
        (3, "b_b", "b_b_b", 1),
    ]


def test_distinct_pair_merges_everywhere(spark):
    docs = [["x", "y", "z"], ["x", "y"], ["y", "x", "y"]]
    rules = bpe_merge_rules(_tokens(spark, docs), rounds=1).collect()
    assert [(r["pair_a"], r["pair_b"], r["pair_count"]) for r in rules] == [
        ("x", "y", 3)
    ]


def test_non_dense_pos_self_pair_run(spark):
    # pos is ordered but NOT dense (0,2,4): greedy-left must still merge
    # only the first pair of the b,b,b run -> [b_b, b], leaving a
    # (b_b, b) pair for round 2. Value-based parity arithmetic would
    # take both matches and corrupt the rewrite.
    rows = [(0, 0, "b"), (0, 2, "b"), (0, 4, "b")]
    tokens = spark.createDataFrame(rows, "doc_id long, pos long, tok string")
    rules = bpe_merge_rules(tokens, rounds=2).collect()
    got = [(r["merge_round"], r["pair_a"], r["pair_b"], r["pair_count"]) for r in rules]
    assert sorted(got) == [(1, "b", "b", 2), (2, "b_b", "b", 1)]


def test_bpe_apply_rewrites_stream(spark):
    from cam_location_addressing_feature_service_etl_spark.operators.bpe import bpe_apply

    # "a b" dominates round 1 -> merged everywhere greedy-left
    rows = [(1, i, t) for i, t in enumerate(["a", "b", "a", "b", "c"])] + [
        (2, i, t) for i, t in enumerate(["a", "b", "x"])
    ]
    df = spark.createDataFrame(rows, "doc_id long, pos long, tok string")
    out = bpe_apply(df, rounds=1)
    got = {
        (r["doc_id"], r["pos"]): r["tok"] for r in out.collect()
    }
    assert got[(1, 1)] == "a_b" and got[(1, 2)] == "a_b" and got[(1, 3)] == "c"
    assert got[(2, 1)] == "a_b" and got[(2, 2)] == "x"
    # dense renumbering: doc 1 has exactly 3 positions
    assert {p for d, p in got if d == 1} == {1, 2, 3}


def test_bpe_apply_no_pairs_returns_stream_unchanged(spark):
    # Every doc is a single token: no adjacent pair exists anywhere, so
    # each round must be a no-op. The old crossJoin(empty top) form
    # annihilated the stream to zero rows here.
    from cam_location_addressing_feature_service_etl_spark.operators.bpe import (
        bpe_apply,
    )

    docs = [["alpha"], ["beta"], ["gamma"]]
    out = bpe_apply(_tokens(spark, docs), rounds=2).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["pos"], r["tok"]) for r in out] == [
        (0, 1, "alpha"),
        (1, 1, "beta"),
        (2, 1, "gamma"),
    ]
    # and rules for those rounds are empty
    assert bpe_merge_rules(_tokens(spark, docs), rounds=2).count() == 0
