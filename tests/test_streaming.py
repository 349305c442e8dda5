"""Structured Streaming plans exercised end-to-end (availableNow →
memory sink) and cross-checked against the batch equivalents that
carry the DuckDB oracle."""

from __future__ import annotations

import pytest

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    sessionized_events,
    windowed_event_counts,
)
from cam_location_addressing_feature_service_etl_spark.workload.events import (
    ev_sessionize_gap30,
    ev_tumbling_window_hourly,
)

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file-source streams read a DIRECTORY of files landing over time
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_stream_to_memory(windowed_event_counts(stream), "win_counts")
    batch = ev_tumbling_window_hourly(spark, SF_SMOKE)
    key = lambda r: (r["window_start"], r["event_type"])
    got_rows = {key(r): (r["n_events"], r["sum_value"]) for r in got.collect()}
    batch_rows = {key(r): (r["n_events"], r["sum_value"]) for r in batch.collect()}
    assert got_rows == batch_rows


def test_streaming_sessionization_runs_stateful(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_stream_to_memory(sessionized_events(stream), "sessions")
    batch = ev_sessionize_gap30(spark, SF_SMOKE)
    # session_window and the lag/cumsum formulation agree on session
    # COUNT per user (same 30-min gap rule).
    got_n = got.count()
    batch_n = batch.count()
    assert got_n == batch_n > 0
