"""Composed DQ-suite stream: one batch read feeds all three monitor
folds, and each monitor's folded state is identical to running that
monitor alone on the whole frame (mergeable counts ⇒ batching and
composition are invisible); replay is idempotent."""

from __future__ import annotations

from cam_location_addressing_feature_service_etl_spark.streaming.benford import (
    apply_amount_batch,
    read_benford,
)
from cam_location_addressing_feature_service_etl_spark.streaming.dq_suite import (
    apply_dq_batch,
    dq_suite_stream,
)
from cam_location_addressing_feature_service_etl_spark.streaming.psi import (
    apply_psi_batch,
    read_psi,
    freeze_reference,
)
from cam_location_addressing_feature_service_etl_spark.streaming.seasonal import (
    apply_baseline_batch,
    score_batch,
)

from tests.conftest import SF_SMOKE


def _events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def _fold_suite(ev, base, splits=3):
    dirs = (f"{base}/psi", f"{base}/seasonal", f"{base}/benford")
    for b in range(splits):
        apply_dq_batch(ev.filter(f"event_id % {splits} = {b}"), b, *dirs)
    return dirs


def test_composed_folds_equal_individual_monitors(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    psi_d, sea_d, ben_d = _fold_suite(ev, str(tmp_path / "suite"))

    # individual monitors folded once over the full frame
    solo_psi = str(tmp_path / "solo_psi")
    apply_psi_batch(ev, 0, solo_psi)
    solo_sea = str(tmp_path / "solo_sea")
    apply_baseline_batch(ev, 0, solo_sea)
    solo_ben = str(tmp_path / "solo_ben")
    apply_amount_batch(ev.withColumnRenamed("value", "o_totalprice"), 0, solo_ben)

    ref = str(tmp_path / "ref")
    freeze_reference(ev, ref)
    assert _rows(read_psi(spark, psi_d, ref), "band") == _rows(
        read_psi(spark, solo_psi, ref), "band"
    )
    assert _rows(score_batch(ev, spark, sea_d), "event_id") == _rows(
        score_batch(ev, spark, solo_sea), "event_id"
    )
    assert _rows(read_benford(spark, ben_d), "digit") == _rows(
        read_benford(spark, solo_ben), "digit"
    )


def test_replay_is_idempotent(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    base = str(tmp_path / "suite")
    dirs = _fold_suite(ev, base, splits=2)
    before = _rows(read_benford(spark, dirs[2]), "digit")
    # replay the last batch against all three states
    apply_dq_batch(ev.filter("event_id % 2 = 1"), 1, *dirs)
    assert _rows(read_benford(spark, dirs[2]), "digit") == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    ev = _events(spark).localCheckpoint()
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dirs = (
        str(tmp_path / "psi"),
        str(tmp_path / "seasonal"),
        str(tmp_path / "benford"),
    )
    q = dq_suite_stream(stream, *dirs, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    solo = str(tmp_path / "solo")
    apply_baseline_batch(ev, 0, solo)
    assert _rows(score_batch(ev, spark, dirs[1]), "event_id") == _rows(
        score_batch(ev, spark, solo), "event_id"
    )
