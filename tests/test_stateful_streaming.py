"""applyInPandasWithState exercised across MULTIPLE micro-batches:
two copies of the events file with maxFilesPerTrigger=1 force two
batches; state must accumulate (second emission = 2× the first)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    EVENTS_FILE_SCHEMA,
)
from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
    running_user_totals,
)

from tests.conftest import SF_SMOKE


def test_state_accumulates_across_batches(spark, tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "batch1.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "batch2.parquet")

    raw = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(d))
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))

    q = (
        running_user_totals(events)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update-mode memory sink appends each batch's emissions: per user
    # the max n_events must be exactly 2x the single-file count.
    got = (
        spark.table("user_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"))
        .collect()
    )
    single = {
        r["user_id"]: r["cnt"]
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(got) == len(single) > 0
    for r in got:
        assert r["n"] == 2 * single[r["user_id"]], r["user_id"]
