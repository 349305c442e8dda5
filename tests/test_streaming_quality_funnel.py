"""Streaming quality-funnel monitor reconciles with the batch
text_quality_funnel: the survival counters are additive integers over
doc-local predicates and both sides share the funnel_doc_flags /
funnel_counts / funnel_table_from_counts definitions, so any batching
equals the one-shot; replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.quality_funnel import (
    apply_document_batch,
    monitor_stream,
    read_funnel,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _docs(spark):
    return load(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("stage_ord").collect()]


def test_folded_batches_match_batch_query(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    state = str(tmp_path / "state")
    for b in range(3):
        apply_document_batch(docs.filter(F.col("doc_id") % 3 == b), b, state)
    got = _sorted_rows(read_funnel(spark, state))
    want = _sorted_rows(QUERIES["text_quality_funnel"](spark, SF_SMOKE))
    assert got == want and len(got) == 4


def test_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_document_batch(docs.filter(F.col("doc_id") % 2 == 0), 0, state)
    apply_document_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, state)
    before = _sorted_rows(read_funnel(spark, state))
    apply_document_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, state)
    assert _sorted_rows(read_funnel(spark, state)) == before


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
    q = monitor_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = _sorted_rows(read_funnel(spark, state))
    want = _sorted_rows(QUERIES["text_quality_funnel"](spark, SF_SMOKE))
    assert got == want
