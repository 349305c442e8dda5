"""Streaming seasonal-baseline monitor reconciles with the batch
ev_seasonal_baseline_zscore: folding event micro-batches accumulates
the identical per-cell moments as the one-shot (abelian counts), so
scoring the corpus against the final state equals the batch query;
replay is idempotent; frozen-profile scoring flags a spike that the
profile has not absorbed."""

from __future__ import annotations

import datetime as dt

from cam_location_addressing_feature_service_etl_spark.streaming.seasonal import (
    apply_baseline_batch,
    monitor_stream,
    score_batch,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("event_id").collect()]


def test_folded_batches_reconcile_with_batch_query(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    for b, pred in enumerate(
        ["event_id % 3 = 0", "event_id % 3 = 1", "event_id % 3 = 2"]
    ):
        apply_baseline_batch(ev.filter(pred), b, state)
    got = _sorted_rows(score_batch(ev, spark, state))
    want = _sorted_rows(QUERIES["ev_seasonal_baseline_zscore"](spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_replay_is_idempotent(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_baseline_batch(ev.filter("event_id % 2 = 0"), 0, state)
    apply_baseline_batch(ev.filter("event_id % 2 = 1"), 1, state)
    before = _sorted_rows(score_batch(ev, spark, state))
    apply_baseline_batch(ev.filter("event_id % 2 = 1"), 1, state)  # replay
    assert _sorted_rows(score_batch(ev, spark, state)) == before


def test_frozen_profile_flags_unabsorbed_spike(spark, tmp_path):
    """A spike scored against a frozen calm profile is flagged; the
    same spike folded INTO the profile at small n would inflate the
    cell variance — the reason the frozen mode exists."""
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    calm = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=i), 1, "click", 10.0 + (i % 5) * 0.5, "{}")
            for i in range(40)
        ],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    spike = spark.createDataFrame(
        [(99, base, 1, "click", 500.0, "{}"), (100, base, 1, "signup", 5.0, "{}")],
        calm.schema,
    )
    state = str(tmp_path / "state")
    apply_baseline_batch(calm, 0, state)
    out = score_batch(spike, spark, state).collect()
    # spike flagged; the signup event's cell was never seen -> excluded
    assert [r["event_id"] for r in out] == [99]


def test_stream_wrapper_end_to_end(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = monitor_stream(stream, str(tmp_path / "state"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _sorted_rows(score_batch(ev, spark, str(tmp_path / "state")))
    want = _sorted_rows(QUERIES["ev_seasonal_baseline_zscore"](spark, SF_SMOKE))
    assert got == want
