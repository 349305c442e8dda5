"""Streaming per-source cap reconciles with the batch
sample_source_cap: per-source top-N under the shared priority is a
mergeable fold (topN(A ∪ B) = topN(topN(A) ∪ topN(B))), both sides
call the same phase-1/phase-2 definitions, so any batching equals the
one-shot; replay is idempotent; re-ingest is identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.source_cap import (
    apply_doc_batch,
    cap_stream,
    read_source_cap,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _docs(spark):
    return load(spark, SF_SMOKE, "documents").select(
        "source", "doc_id", "n_chars"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("source", "rnk").collect()]


def test_folded_batches_match_batch_query(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    state = str(tmp_path / "state")
    for b in range(3):
        apply_doc_batch(docs.filter(F.col("doc_id") % 3 == b), b, state)
    got = _sorted_rows(read_source_cap(spark, state))
    want = _sorted_rows(QUERIES["sample_source_cap"](spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_replay_and_reingest_are_identities(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_doc_batch(docs.filter(F.col("doc_id") % 2 == 0), 0, state)
    apply_doc_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, state)
    before = _sorted_rows(read_source_cap(spark, state))
    # foreachBatch replay of batch 1
    apply_doc_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, state)
    assert _sorted_rows(read_source_cap(spark, state)) == before
    # re-ingesting already-folded docs in a NEW batch is also identity
    apply_doc_batch(docs.filter(F.col("doc_id") % 5 == 0), 2, state)
    assert _sorted_rows(read_source_cap(spark, state)) == before


def test_eviction_under_later_better_docs(spark, tmp_path):
    # a later batch's longer docs must evict earlier keep-list rows
    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [("s", i, 100 + i) for i in range(15)],
        "source string, doc_id bigint, n_chars bigint",
    )
    apply_doc_batch(b0, 0, state)
    first = {r["doc_id"] for r in read_source_cap(spark, state).collect()}
    b1 = spark.createDataFrame(
        [("s", 100 + i, 10_000 + i) for i in range(4)],
        "source string, doc_id bigint, n_chars bigint",
    )
    apply_doc_batch(b1, 1, state)
    out = read_source_cap(spark, state).collect()
    kept = {r["doc_id"] for r in out}
    assert {100, 101, 102, 103} <= kept
    assert len(kept - first) == 4 and len(kept) == len(first)
    # ranks are the priority order: the four new docs hold ranks 1-4
    top4 = {r["doc_id"] for r in out if r["rnk"] <= 4}
    assert top4 == {100, 101, 102, 103}


def test_stream_wrapper_end_to_end(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = cap_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = _sorted_rows(read_source_cap(spark, state))
    want = _sorted_rows(QUERIES["sample_source_cap"](spark, SF_SMOKE))
    assert got == want


def test_within_batch_duplicate_does_not_burn_rank_slot(spark, tmp_path):
    # ADVICE r15: a doc_id appearing twice in ONE micro-batch must not
    # consume two phase-1 rank slots in its salt class, or the salt-
    # class boundary candidate is pruned and lost from the state
    # permanently. 11 docs in a single salt class (doc_id % 8 == 0),
    # top doc duplicated: the keep-list must still be the true top-10.
    state = str(tmp_path / "state")
    rows = [("s", i * 8, 1000 - i) for i in range(11)]
    rows.append(("s", 0, 1000))  # exact duplicate of the top doc
    b0 = spark.createDataFrame(
        rows, "source string, doc_id bigint, n_chars bigint"
    )
    apply_doc_batch(b0, 0, state)
    kept = {r["doc_id"] for r in read_source_cap(spark, state).collect()}
    assert kept == {i * 8 for i in range(10)}  # boundary doc 72 kept
    assert len(kept) == 10


def test_doc_update_resolves_deterministically(spark, tmp_path):
    # same doc_id with two different payloads in one batch: winner is
    # pinned by (n_chars DESC, source ASC), identical on every replay
    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [("s", 1, 50), ("s", 1, 70), ("t", 1, 70), ("s", 2, 10)],
        "source string, doc_id bigint, n_chars bigint",
    )
    apply_doc_batch(b0, 0, state)
    out = {
        (r["source"], r["doc_id"], r["n_chars"])
        for r in read_source_cap(spark, state).collect()
    }
    assert out == {("s", 1, 70), ("s", 2, 10)}
    # cross-batch update: a later, longer payload for doc 2 wins too
    b1 = spark.createDataFrame(
        [("s", 2, 99)], "source string, doc_id bigint, n_chars bigint"
    )
    apply_doc_batch(b1, 1, state)
    out2 = {
        (r["source"], r["doc_id"], r["n_chars"])
        for r in read_source_cap(spark, state).collect()
    }
    assert out2 == {("s", 1, 70), ("s", 2, 99)}
