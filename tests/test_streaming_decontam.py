"""Streaming decontamination guard reconciles with the batch
text_contamination_ngram: the frozen benchmark and the shared
contamination_stats derivation make any batching of the training
stream land on the identical per-doc ledger; replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.decontam import (
    apply_doc_batch,
    freeze_benchmark,
    monitor_stream,
    read_contamination,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.decontam import (
    _DC_BENCH_MOD,
)

from tests.conftest import SF_SMOKE


def _docs(spark):
    return load(spark, SF_SMOKE, "documents").select("doc_id", "text")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_folded_batches_match_batch_query(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    ref = str(tmp_path / "bench")
    state = str(tmp_path / "state")
    freeze_benchmark(docs.filter(F.col("doc_id") % _DC_BENCH_MOD == 0), ref)
    train = docs.filter(F.col("doc_id") % _DC_BENCH_MOD != 0)
    for b in range(3):
        apply_doc_batch(train.filter(F.col("doc_id") % 3 == b), b, state, ref)
    got = _rows(read_contamination(spark, state))
    want = _rows(QUERIES["text_contamination_ngram"](spark, SF_SMOKE))
    assert got == want and len(got) > 0
    assert any(r[4] for r in got)  # some doc actually flagged


def test_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    ref = str(tmp_path / "bench")
    state = str(tmp_path / "state")
    freeze_benchmark(docs.filter(F.col("doc_id") % _DC_BENCH_MOD == 0), ref)
    train = docs.filter(F.col("doc_id") % _DC_BENCH_MOD != 0)
    apply_doc_batch(train.filter(F.col("doc_id") % 2 == 0), 0, state, ref)
    apply_doc_batch(train.filter(F.col("doc_id") % 2 == 1), 1, state, ref)
    before = _rows(read_contamination(spark, state))
    apply_doc_batch(train.filter(F.col("doc_id") % 2 == 1), 1, state, ref)
    assert _rows(read_contamination(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    docs = _docs(spark).localCheckpoint()
    ref = str(tmp_path / "bench")
    freeze_benchmark(docs.filter(F.col("doc_id") % _DC_BENCH_MOD == 0), ref)
    train = docs.filter(F.col("doc_id") % _DC_BENCH_MOD != 0)
    src = str(tmp_path / "src")
    train.write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = monitor_stream(
        stream, str(tmp_path / "state"), ref, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = _rows(read_contamination(spark, str(tmp_path / "state")))
    want = _rows(QUERIES["text_contamination_ngram"](spark, SF_SMOKE))
    assert got == want
