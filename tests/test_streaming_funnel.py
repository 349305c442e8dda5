"""Streaming funnel twin vs the batch ev_funnel_conversion query:
single-batch replay must reproduce the batch counts exactly, and a
two-batch split (ordered by event time) must carry state across
micro-batches to the same final stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    EVENTS_FILE_SCHEMA,
)
from cam_location_addressing_feature_service_etl_spark.streaming.funnel import (
    funnel_stage_tracker,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _run_stream(spark, src_dir: str, name: str):
    raw = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    q = (
        funnel_stage_tracker(events)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emission per user = the highest stage (stages only ascend)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("funnel_stage").alias("stage"))
    )


def _stage_counts(df) -> tuple[int, int, int]:
    row = df.agg(
        F.sum((F.col("stage") >= 1).cast("long")).alias("v"),
        F.sum((F.col("stage") >= 2).cast("long")).alias("c"),
        F.sum((F.col("stage") >= 3).cast("long")).alias("p"),
    ).collect()[0]
    return row.v, row.c, row.p


def test_streaming_funnel_matches_batch_single_batch(spark, tmp_path):
    import shutil

    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "all.parquet")

    got = _stage_counts(_run_stream(spark, str(d), "funnel_single"))
    batch = QUERIES["ev_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert got == (batch.n_viewed, batch.n_clicked_after, batch.n_purchased_after)


def test_streaming_funnel_carries_state_across_ordered_batches(spark, tmp_path):
    # split the stream at the median event time: batch1 strictly
    # precedes batch2, so ordered replay must equal the batch result.
    # Split the RAW long-ns events (same physical schema the stream
    # reads with EVENTS_FILE_SCHEMA) — re-writing through tables.load
    # would convert ts to a TIMESTAMP and break the bigint read schema.
    events = (
        spark.read.schema(EVENTS_FILE_SCHEMA)
        .parquet(f"{SF_SMOKE}/events.parquet")
    )
    cut = events.agg(
        F.percentile_approx("ts", 0.5).alias("cut")
    ).collect()[0].cut
    d = tmp_path / "stream_in2"
    d.mkdir()
    (
        events.filter(F.col("ts") <= F.lit(cut))
        .coalesce(1)
        .write.parquet(str(d / "a_first"))
    )
    (
        events.filter(F.col("ts") > F.lit(cut))
        .coalesce(1)
        .write.parquet(str(d / "b_second"))
    )
    import glob
    import shutil

    files = sorted(glob.glob(str(d / "*" / "part-*.parquet")))
    assert len(files) == 2
    stream_dir = tmp_path / "stream_files"
    stream_dir.mkdir()
    shutil.copy(files[0], stream_dir / "batch_1.parquet")
    shutil.copy(files[1], stream_dir / "batch_2.parquet")

    got = _stage_counts(_run_stream(spark, str(stream_dir), "funnel_split"))
    batch = QUERIES["ev_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert got == (batch.n_viewed, batch.n_clicked_after, batch.n_purchased_after)
