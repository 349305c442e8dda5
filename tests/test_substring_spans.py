"""duplicated_token_spans (exact substring-span dedup) semantics:
run merging, intra-doc repeats, adjacency boundary, short-doc guard."""

from __future__ import annotations

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    duplicated_token_spans,
)


def _spans(spark, docs, k=4):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = duplicated_token_spans(df, "doc_id", "text", k=k).collect()
    return sorted((r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in rows)


def test_cross_doc_duplicated_span_detected_in_both_docs(spark):
    # 6-token shared run inside different contexts; k=4 -> 3 dup grams
    # at starts 2,3,4 for doc a (shifted for doc b), merging into one
    # span of exactly the 6 shared tokens.
    docs = [
        (1, "x1 the quick brown fox jumps high y1 z1 w1"),
        (2, "a2 b2 the quick brown fox jumps high c2 d2"),
    ]
    got = _spans(spark, docs)
    assert got == [(1, 2, 7, 6), (2, 3, 8, 6)]


def test_intra_doc_repeat_counts_as_duplicate(spark):
    # the same 4-gram twice in ONE doc: both occurrences reported
    docs = [(1, "p q r s zz1 zz2 p q r s")]
    got = _spans(spark, docs)
    assert got == [(1, 1, 4, 4), (1, 7, 10, 4)]


def test_gap_wider_than_k_splits_spans(spark):
    # two shared runs separated by unique middles -> two spans per doc
    docs = [
        (1, "a b c d m1 m2 m3 m4 m5 w x y z"),
        (2, "a b c d n1 n2 n3 n4 n5 w x y z"),
    ]
    got = _spans(spark, docs)
    assert got == [
        (1, 1, 4, 4),
        (1, 10, 13, 4),
        (2, 1, 4, 4),
        (2, 10, 13, 4),
    ]


def test_overlapping_grams_merge_to_maximal_span(spark):
    # shared 5-token run -> dup gram starts {1,2} merge (2-1 <= k)
    docs = [(1, "a b c d e q1 q2"), (2, "a b c d e r1 r2")]
    got = _spans(spark, docs)
    assert got == [(1, 1, 5, 5), (2, 1, 5, 5)]


def test_docs_shorter_than_k_are_ignored(spark):
    docs = [(1, "a b c"), (2, "a b c")]
    assert _spans(spark, docs, k=4) == []


def test_no_duplicates_no_spans(spark):
    docs = [(1, "a b c d e f"), (2, "u v w x y z")]
    assert _spans(spark, docs, k=4) == []
