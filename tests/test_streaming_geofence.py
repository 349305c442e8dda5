"""Streaming geofence transitions reconcile EXACTLY with the batch
lag-window query, and the result is micro-batch-split-insensitive:
a 2-batch time-split replay and a single-batch replay both emit the
same transition set the batch query computes on the full file."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    read_event_stream,
)
from cam_location_addressing_feature_service_etl_spark.streaming.geofence import (
    fence_transitions_state,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _batch_truth(spark):
    return {
        (r["user_id"], r["event_id"], r["ts_s"], r["direction"])
        for r in QUERIES["geo_fence_transitions"](spark, SF_SMOKE).collect()
    }


def _run_stream(spark, path, name, max_files):
    stream = read_event_stream(spark, path, max_files_per_trigger=max_files)
    q = (
        fence_transitions_state(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["user_id"], r["event_id"], r["ts_s"], r["direction"])
        for r in spark.table(name).collect()
    }


def test_fence_stream_reconciles_with_batch(spark, tmp_path):
    # time-ordered 2-file split: transitions that straddle the file
    # boundary can only be found through the carried state
    d = tmp_path / "fence_in"
    d.mkdir()
    t = pq.read_table(f"{SF_SMOKE}/events.parquet")
    idx = pc.sort_indices(
        t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
    )
    t = t.take(idx)
    half = t.num_rows // 2
    b1, b2 = d / "b1.parquet", d / "b2.parquet"
    pq.write_table(t.slice(0, half), b1)
    pq.write_table(t.slice(half), b2)
    now = 1_700_000_000
    os.utime(b1, (now, now))
    os.utime(b2, (now + 60, now + 60))  # file source orders by mtime

    want = _batch_truth(spark)
    assert len(want) > 10  # the fixture actually exercises transitions

    got_split = _run_stream(spark, str(d), "fence_split", max_files=1)
    assert got_split == want

    # single-batch replay of the same files → identical emission set
    got_single = _run_stream(spark, str(d), "fence_single", max_files=None)
    assert got_single == want
