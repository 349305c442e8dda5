"""Streaming blocking-quality monitor reconciles with the batch
er_blocking_quality: the name states are idempotent distinct unions,
the true-pair set is a monotone incremental closure (each fold
PassJoins only NEW names against the accumulated vocabulary), and
both sides derive the audit row through the SAME
blocking_quality_audit — so any batching equals the one-shot, replay
is idempotent, and re-ingest is identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.er_blocking import (
    apply_part_batch,
    monitor_stream,
    read_blocking_quality,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _row(df):
    return tuple(df.collect()[0])


def _parts(spark):
    return load(spark, SF_SMOKE, "part").select("p_partkey", "p_name")


def test_folded_batches_match_batch_audit(spark, tmp_path):
    parts = _parts(spark).localCheckpoint()
    state = str(tmp_path / "state")
    for b in range(3):
        apply_part_batch(parts.filter(F.col("p_partkey") % 3 == b), b, state)
    got = _row(read_blocking_quality(spark, state))
    want = _row(QUERIES["er_blocking_quality"](spark, SF_SMOKE))
    assert got == want
    assert got[0] > 0 and got[3] > 0  # n_feed, true_pairs nonzero


def test_replay_and_reingest_are_identities(spark, tmp_path):
    parts = _parts(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_part_batch(parts.filter(F.col("p_partkey") % 2 == 0), 0, state)
    apply_part_batch(parts.filter(F.col("p_partkey") % 2 == 1), 1, state)
    before = _row(read_blocking_quality(spark, state))
    # foreachBatch replay of batch 1
    apply_part_batch(parts.filter(F.col("p_partkey") % 2 == 1), 1, state)
    assert _row(read_blocking_quality(spark, state)) == before
    # re-ingesting already-folded parts in a NEW batch is also identity
    apply_part_batch(parts.filter(F.col("p_partkey") % 5 == 0), 2, state)
    assert _row(read_blocking_quality(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    parts = _parts(spark).localCheckpoint()
    src = str(tmp_path / "src")
    parts.write.parquet(src)
    stream = (
        spark.readStream.schema(parts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = monitor_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = _row(read_blocking_quality(spark, state))
    want = _row(QUERIES["er_blocking_quality"](spark, SF_SMOKE))
    assert got == want
