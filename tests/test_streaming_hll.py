"""The streaming bucket-sketch leg must reconcile with the batch
sliding-distinct query: sketches maintained incrementally across
micro-batches, unioned batch-side per sliding window, must (a) be
bit-identical to batch-built sketches (HLL registers are order-
insensitive maxima, so micro-batch splits cannot change them) and
(b) land within the 5% contract of the exact distinct counts the
batch query verifies against its oracle."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    read_event_stream,
    tumbling_distinct_sketches,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.events import (
    _SLD_BUCKET_MS,
    _SLD_SPAN,
)
from tests.conftest import SF_SMOKE


def test_streaming_bucket_sketches_union_to_sliding_windows(spark, tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    batch_events = load(spark, SF_SMOKE, "events")
    # two micro-batches split at the median event id — sketch merges
    # must be split-insensitive
    mid = batch_events.approxQuantile("event_id", [0.5], 0.0)[0]
    for name, pred in [
        ("a", F.col("event_id") <= mid),
        ("b", F.col("event_id") > mid),
    ]:
        out = tmp_path / f"half_{name}"
        batch_events.filter(pred).coalesce(1).write.parquet(str(out))
        (part,) = glob.glob(str(out / "part-*.parquet"))
        shutil.copy(part, d / f"{name}.parquet")

    raw = read_event_stream(spark, str(d), max_files_per_trigger=1)
    bucket_str = f"{_SLD_BUCKET_MS // 60000} minutes"
    q = (
        tumbling_distinct_sketches(raw, bucket=bucket_str)
        .writeStream.format("memory")
        .queryName("hll_buckets")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    sk = spark.table("hll_buckets").select(
        (F.unix_millis("bucket_start") / _SLD_BUCKET_MS).cast("long").alias("b"),
        "sk",
    )
    # batch-built sketches over the same events: bit-identical
    batch_sk = batch_events.groupBy(
        F.floor(F.unix_millis("ts") / F.lit(_SLD_BUCKET_MS)).cast("long").alias("b")
    ).agg(F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk"))
    merged = sk.alias("s").join(batch_sk.alias("t"), "b", "full")
    diff = merged.filter(
        F.col("s.sk").isNull()
        | F.col("t.sk").isNull()
        | (
            F.hll_sketch_estimate(F.col("s.sk"))
            != F.hll_sketch_estimate(F.col("t.sk"))
        )
    ).count()
    assert diff == 0, "streaming sketches diverge from batch sketches"

    # union the streamed sketches per sliding window (the rollup query)
    buckets = sk.select("b").distinct()
    est = (
        sk.select(
            "sk",
            F.explode(F.sequence(F.col("b"), F.col("b") + (_SLD_SPAN - 1))).alias("wb"),
        )
        .join(buckets.select(F.col("b").alias("wb")), "wb", "leftsemi")
        .groupBy("wb")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = {
        r["window_bucket"]: r["exact_users"]
        for r in QUERIES["ev_sliding_distinct_hll"](spark, SF_SMOKE).collect()
    }
    got = {r["wb"]: r["est"] for r in est.collect()}
    assert set(got) == set(exact)
    for wb, e in exact.items():
        assert abs(got[wb] - e) <= 0.05 * e, (wb, got[wb], e)


def test_streaming_session_window_reconciles_to_batch(spark, tmp_path):
    """The native session_window aggregation runs UNCHANGED as a
    streaming query (state-store session merges) — replaying the
    events as two micro-batches must produce exactly the batch
    query's sessions."""
    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _GAP_MIN,
    )

    d = tmp_path / "stream_in"
    d.mkdir()
    batch_events = load(spark, SF_SMOKE, "events")
    mid = batch_events.approxQuantile("event_id", [0.5], 0.0)[0]
    for name, pred in [
        ("a", F.col("event_id") <= mid),
        ("b", F.col("event_id") > mid),
    ]:
        out = tmp_path / f"half_{name}"
        batch_events.filter(pred).coalesce(1).write.parquet(str(out))
        (part,) = glob.glob(str(out / "part-*.parquet"))
        shutil.copy(part, d / f"{name}.parquet")

    raw = read_event_stream(spark, str(d), max_files_per_trigger=1).withWatermark(
        "ts", "1 hour"
    )
    stream = (
        raw.groupBy(
            "user_id", F.session_window("ts", f"{_GAP_MIN} minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,8)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.table("native_sessions")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    expect = (
        QUERIES["ev_sessionize_native_window"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert got[cols].values.tolist() == expect[cols].values.tolist()
