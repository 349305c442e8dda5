"""Streaming DDSketch monitor: folded bucket counts are mergeable, so
any batching reconciles with the one-shot histogram; quantile reads
honor the sketch's relative-error contract vs exact quantiles; replay
is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.ddsketch import (
    apply_value_batch,
    bucket_counts,
    monitor_stream,
    read_quantiles,
)

from tests.conftest import SF_SMOKE


def _events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _rows(df):
    return [tuple(r) for r in df.orderBy("event_type").collect()]


def test_folded_batches_equal_oneshot_histogram(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    for b in range(3):
        apply_value_batch(ev.filter(f"event_id % 3 = {b}"), b, state)
    folded = _rows(read_quantiles(spark, state))
    solo = str(tmp_path / "solo")
    apply_value_batch(ev, 0, solo)
    assert folded == _rows(read_quantiles(spark, solo)) and folded


def test_estimates_within_relative_error_of_rank_item(spark, tmp_path):
    """DDSketch's guarantee is alpha-relative to the RANK item (the
    ceil(q*n)-th smallest value), not the interpolated quantile —
    assert exactly that contract, with alpha = 1%."""
    import math

    ev = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_value_batch(ev, 0, state)
    est = {r["event_type"]: r for r in read_quantiles(spark, state).collect()}
    vals = {}
    for r in ev.filter("value > 0").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for t, e in est.items():
        xs = sorted(vals[t])
        for q in (50, 95, 99):
            item = xs[max(0, math.ceil(q / 100.0 * len(xs)) - 1)]
            # alpha=1% plus the bucket-midpoint round slack
            assert abs(e[f"est_p{q}"] - item) <= 0.0105 * item + 1e-4


def test_replay_is_idempotent(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_value_batch(ev.filter("event_id % 2 = 0"), 0, state)
    apply_value_batch(ev.filter("event_id % 2 = 1"), 1, state)
    before = _rows(read_quantiles(spark, state))
    apply_value_batch(ev.filter("event_id % 2 = 1"), 1, state)  # replay
    assert _rows(read_quantiles(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    ev = _events(spark).select("event_id", "event_type", "value").localCheckpoint()
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema("event_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = monitor_stream(stream, str(tmp_path / "state"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    solo = str(tmp_path / "solo")
    apply_value_batch(ev, 0, solo)
    assert _rows(read_quantiles(spark, str(tmp_path / "state"))) == _rows(
        read_quantiles(spark, solo)
    )


def test_state_is_bucket_bounded(spark, tmp_path):
    """The whole point: state rows ~ buckets, not rows ingested —
    folding 10x the data leaves the bucket-set size UNCHANGED."""
    ev = _events(spark).localCheckpoint()
    once = bucket_counts(ev).count()
    ten = ev.crossJoin(spark.range(10)).drop("id")
    assert bucket_counts(ten).count() == once
