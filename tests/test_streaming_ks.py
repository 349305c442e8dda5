"""Streaming KS drift monitor reconciles with the batch dq_ks_drift:
folded (type, centi-value) counts are mergeable integers and both
sides share the ks_value_counts/ks_table_from_counts definitions, so
any batching equals the one-shot; replay is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.ks import (
    apply_event_batch,
    monitor_stream,
    read_ks,
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
    got = _sorted_rows(read_ks(spark, state))
    want = _sorted_rows(QUERIES["dq_ks_drift"](spark, SF_SMOKE))
    assert got == want and len(got) >= 3


def test_replay_is_idempotent(spark, tmp_path):
    events = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_event_batch(events.filter(F.col("event_id") % 2 == 0), 0, state)
    apply_event_batch(events.filter(F.col("event_id") % 2 == 1), 1, state)
    before = _sorted_rows(read_ks(spark, state))
    apply_event_batch(events.filter(F.col("event_id") % 2 == 1), 1, state)
    assert _sorted_rows(read_ks(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    events = _events(spark).select("event_type", "value", "ts").localCheckpoint()
    src = str(tmp_path / "src")
    events.write.parquet(src)
    schema = events.schema.simpleString()[7:-1].replace(":", " ")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = monitor_stream(stream, str(tmp_path / "state"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _sorted_rows(read_ks(spark, str(tmp_path / "state")))
    want = _sorted_rows(QUERIES["dq_ks_drift"](spark, SF_SMOKE))
    assert got == want
