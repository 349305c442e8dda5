"""Streaming span-rewrite decontamination guard reconciles with the
batch dedup_decontam_span_rewrite: each doc's accounting row is a pure
function of (doc text, frozen benchmark gram set), the merge keeps one
row per doc_id delta-wins, so any batching equals the one-shot batch
query over the same docs; replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.decontam_rewrite import (
    apply_doc_batch,
    freeze_benchmark_grams,
    monitor_stream,
    read_rewrite_ledger,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE

_MOD = 83  # the batch query's deterministic benchmark split
_K = 8


def _split(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % _MOD == 0)
    train = docs.filter(F.col("doc_id") % _MOD != 0)
    return bench.localCheckpoint(), train.localCheckpoint()


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


def test_folded_batches_match_batch_query(spark, tmp_path):
    bench, train = _split(spark)
    ref, state = str(tmp_path / "ref"), str(tmp_path / "state")
    freeze_benchmark_grams(bench, ref, k=_K)
    for b in range(3):
        apply_doc_batch(train.filter(F.col("doc_id") % 3 == b), b, state, ref, k=_K)
    got = _sorted_rows(read_rewrite_ledger(spark, state))
    want = _sorted_rows(QUERIES["dedup_decontam_span_rewrite"](spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_replay_is_idempotent(spark, tmp_path):
    bench, train = _split(spark)
    ref, state = str(tmp_path / "ref"), str(tmp_path / "state")
    freeze_benchmark_grams(bench, ref, k=_K)
    apply_doc_batch(train.filter(F.col("doc_id") % 2 == 0), 0, state, ref, k=_K)
    apply_doc_batch(train.filter(F.col("doc_id") % 2 == 1), 1, state, ref, k=_K)
    before = _sorted_rows(read_rewrite_ledger(spark, state))
    apply_doc_batch(train.filter(F.col("doc_id") % 2 == 1), 1, state, ref, k=_K)
    assert _sorted_rows(read_rewrite_ledger(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    bench, train = _split(spark)
    ref, state = str(tmp_path / "ref"), str(tmp_path / "state")
    freeze_benchmark_grams(bench, ref, k=_K)
    src = str(tmp_path / "src")
    train.write.parquet(src)
    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = monitor_stream(stream, state, ref, str(tmp_path / "ckpt"), k=_K)
    q.awaitTermination(180)
    got = _sorted_rows(read_rewrite_ledger(spark, state))
    want = _sorted_rows(QUERIES["dedup_decontam_span_rewrite"](spark, SF_SMOKE))
    assert got == want
