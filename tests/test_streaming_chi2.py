"""Streaming chi² drift monitor reconciles with the batch
dq_chi2_drift: folded per-category ref/cur counts are mergeable
integers and both sides share the chi2_category_counts /
chi2_table_from_counts definitions, so any batching equals the
one-shot; replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.chi2 import (
    apply_event_batch,
    monitor_stream,
    read_chi2,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _events(spark):
    return load(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value", "ts"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("event_type").collect()]


def test_folded_batches_match_batch_query(spark, tmp_path):
    events = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    for b in range(3):
        apply_event_batch(events.filter(F.col("event_id") % 3 == b), b, state)
    got = _sorted_rows(read_chi2(spark, state))
    want = _sorted_rows(QUERIES["dq_chi2_drift"](spark, SF_SMOKE))
    assert got == want and len(got) >= 3


def test_replay_is_idempotent(spark, tmp_path):
    events = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_event_batch(events.filter(F.col("event_id") % 2 == 0), 0, state)
    apply_event_batch(events.filter(F.col("event_id") % 2 == 1), 1, state)
    before = _sorted_rows(read_chi2(spark, state))
    apply_event_batch(events.filter(F.col("event_id") % 2 == 1), 1, state)
    assert _sorted_rows(read_chi2(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    events = _events(spark).select("event_type", "value", "ts").localCheckpoint()
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = monitor_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = _sorted_rows(read_chi2(spark, state))
    want = _sorted_rows(QUERIES["dq_chi2_drift"](spark, SF_SMOKE))
    assert got == want
