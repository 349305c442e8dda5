"""Streaming SCD2 must reconcile to the batch ev_scd2_state_intervals
result when the same events are replayed as two time-ordered
micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.scd2 import (
    scd2_state_intervals_stream,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from tests.conftest import SF_SMOKE


def test_streaming_scd2_reconciles_to_batch(spark, tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    # normalize ts via the batch loader (footer-probing), then split
    # the log at the median event id — generated ids are time-ordered,
    # so per-user cross-batch order is preserved (the operator's
    # documented ordering contract); verified below
    batch_events = load(spark, SF_SMOKE, "events")
    mid = batch_events.approxQuantile("event_id", [0.5], 0.0)[0]
    row = batch_events.agg(
        F.max(F.when(F.col("event_id") <= mid, F.col("ts"))).alias("a_max"),
        F.min(F.when(F.col("event_id") > mid, F.col("ts"))).alias("b_min"),
    ).collect()[0]
    assert row["a_max"] <= row["b_min"]
    # the file stream source lists FILES under the input dir (nested
    # non-partition dirs are ignored) — flatten each half to one file
    import glob
    import shutil

    for name, pred in [
        ("a", F.col("event_id") <= mid),
        ("b", F.col("event_id") > mid),
    ]:
        out = tmp_path / f"half_{name}"
        batch_events.filter(pred).coalesce(1).write.parquet(str(out))
        (part,) = glob.glob(str(out / "part-*.parquet"))
        shutil.copy(part, d / f"{name}.parquet")

    raw = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(d))
    )
    q = (
        scd2_state_intervals_stream(raw)
        .writeStream.format("memory")
        .queryName("scd2_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.table("scd2_stream").toPandas()
    # reconcile: per interval the closed row (or the largest open
    # emission) is final; closed beats open on equal n_events. Keyed by
    # (user, valid_from, state) — NOT (user, valid_from) — because the
    # whole-second boundary format means two runs of one user starting
    # in the same second share valid_from (see scd2._fmt_us).
    emitted = emitted.sort_values(
        ["user_id", "valid_from", "state", "n_events", "is_current"],
        ascending=[True, True, True, False, True],
    ).drop_duplicates(["user_id", "valid_from", "state"], keep="first")

    expect = (
        QUERIES["ev_scd2_state_intervals"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "valid_from", "state"])
        .reset_index(drop=True)
    )
    got = emitted.sort_values(["user_id", "valid_from", "state"]).reset_index(drop=True)
    cols = ["user_id", "state", "valid_from", "valid_to", "is_current", "n_events"]
    assert got[cols].values.tolist() == expect[cols].values.tolist()


def test_streaming_scd2_sorts_within_batch(spark, tmp_path):
    """Rows arrive unordered WITHIN a micro-batch (parquet row order is
    not time order): the operator must sort by (ts, event_id) before
    folding runs — a single shuffled batch must reconcile to the batch
    query exactly."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    d = tmp_path / "stream_in"
    d.mkdir()
    batch_events = load(spark, SF_SMOKE, "events")
    out = tmp_path / "shuffled"
    # scramble physical order deterministically
    batch_events.orderBy(F.md5(F.col("event_id").cast("string"))).coalesce(
        1
    ).write.parquet(str(out))
    (part,) = glob.glob(str(out / "part-*.parquet"))
    shutil.copy(part, d / "all.parquet")

    raw = (
        spark.readStream.schema(batch_events.schema)
        .format("parquet")
        .load(str(d))
    )
    q = (
        scd2_state_intervals_stream(raw)
        .writeStream.format("memory")
        .queryName("scd2_shuffled")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.table("scd2_shuffled")
        .toPandas()
        .sort_values(["user_id", "valid_from", "state"])
        .reset_index(drop=True)
    )
    expect = (
        QUERIES["ev_scd2_state_intervals"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "valid_from", "state"])
        .reset_index(drop=True)
    )
    cols = ["user_id", "state", "valid_from", "valid_to", "is_current", "n_events"]
    assert got[cols].values.tolist() == expect[cols].values.tolist()
