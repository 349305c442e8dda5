"""Streaming event aggregation: watermarked tumbling windows and
session windows over a file-source stream of the ``events`` table.

Design notes for the real deployment:

- source: ``readStream.format("kafka")`` (or files landing in object
  storage); here a parquet file source stands in — same plan shape.
- watermark bounds state: 1 hour of late data is tolerated, older
  state is evicted — this is what keeps a 100 TB/day stream's state
  finite.
- session windows use the built-in ``session_window`` (gap-based),
  the streaming twin of the batch lag/cumsum sessionization in
  ``workload/events.py`` (which carries the DuckDB oracle check).
- sinks in tests use ``availableNow`` + memory sink so the streaming
  plans are exercised end-to-end without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: physical schema of events.parquet (ts is TIMESTAMP(NANOS) → long
#: under nanosAsLong; converted to a real timestamp below)
EVENTS_FILE_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events with the ns→timestamp conversion
    (mirrors tables.load for the batch path)."""
    raw = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .format("parquet")
        .load(path)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of ``ev_tumbling_window_hourly``: watermarked
    tumbling-window counts/sums per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_events(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based session windows per user (stateful streaming agg)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
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


def run_stream_to_memory(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (availableNow trigger) into a memory sink; returns the result as a
    batch DataFrame. Used by tests; a real deployment writes to
    Kafka/Delta with checkpointing instead."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.table(query_name)
