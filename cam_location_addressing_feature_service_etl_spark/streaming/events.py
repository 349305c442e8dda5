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

#: physical schema of events.parquet when ts is TIMESTAMP(NANOS) read
#: as long under nanosAsLong (older generator); newer data carries a
#: real µs timestamp — read_event_stream probes the footer and adapts.
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


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events, schema-adaptive on ts like
    tables.load: nanos-as-long footers get the ns→µs conversion,
    native timestamp footers stream as-is. A streaming source needs
    the schema up front, so probe it with a batch footer read (driver
    metadata only — no data scan). ``max_files_per_trigger`` caps each
    micro-batch (tests use 1 so a multi-file replay actually crosses
    micro-batch boundaries — availableNow would otherwise drain every
    file in one batch and never exercise cross-batch state)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ts_type = spark.read.parquet(path).schema["ts"].dataType
    if isinstance(ts_type, LongType):
        raw = reader.schema(EVENTS_FILE_SCHEMA).format("parquet").load(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    schema = StructType(
        [
            f if f.name != "ts" else StructField("ts", ts_type, True)
            for f in EVENTS_FILE_SCHEMA.fields
        ]
    )
    raw = reader.schema(schema).format("parquet").load(path)
    # session tz is pinned UTC, so NTZ→LTZ keeps the same instant;
    # watermarks and window() need the LTZ type.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


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


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (availableNow trigger) into a memory sink; returns the result as a
    batch DataFrame. Used by tests; a real deployment writes to
    Kafka/Delta with checkpointing instead. ``output_mode`` must be
    ``append`` for stream-stream joins and streaming dedup (no
    result-set retraction), ``complete`` for running aggregates."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.table(query_name)


def deduped_event_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-id dedup: drop replayed event_ids
    within the watermark horizon (``dropDuplicatesWithinWatermark``
    keys the state store on event_id and evicts ids older than the
    watermark — bounded state, unlike a plain dropDuplicates which
    grows forever on a stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def click_purchase_stream_join(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each click paired with the same
    user's purchases in the preceding ``horizon``. Both sides are
    watermarked so the join state (buffered unmatched rows) is
    evicted once the time-range condition can no longer match —
    the canonical bounded-state stream-stream join shape.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", horizon)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", horizon)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


def upsert_snapshot_sink(
    stream_df: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    query_name: str = "upsert_sink",
):
    """foreachBatch upsert sink: every micro-batch is MERGEd into a
    parquet snapshot with last-write-wins semantics (operators.upsert
    — the streaming twin of the reference's per-page ESRI upsert,
    SURVEY §2.9 M1/M2). Each batch rewrites the snapshot via
    read → merge → write to a temp dir → rename-aside swap: the old
    snapshot is renamed to ``.bak`` (single rename), the new one
    renamed into place (single rename), then the backup dropped — a
    crash between the renames leaves a recoverable ``.bak``, which the
    next batch restores automatically. POSIX rename is atomic per
    directory entry, so no crash point loses both copies (a concurrent
    reader can still observe the sub-second gap between the two
    renames; Delta/Iceberg's MERGE INTO removes even that).

    Returns the started StreamingQuery (availableNow trigger).
    """
    import os
    import shutil

    from ..operators.upsert import upsert_by_key

    bak = snapshot_dir + ".bak"

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not os.path.isdir(snapshot_dir) and os.path.isdir(bak):
            os.rename(bak, snapshot_dir)  # crash recovery
        updates = batch_df.dropDuplicates(key_cols)
        if os.path.isdir(snapshot_dir):
            base = spark.read.parquet(snapshot_dir)
            merged = upsert_by_key(base, updates, key_cols)
        else:
            merged = updates
        tmp = snapshot_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(bak, ignore_errors=True)
        if os.path.isdir(snapshot_dir):
            os.rename(snapshot_dir, bak)
        os.rename(tmp, snapshot_dir)
        shutil.rmtree(bak, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def tumbling_distinct_sketches(
    events: DataFrame,
    bucket: str = "10 minutes",
    watermark: str = "30 minutes",
    lgk: int = 14,
) -> DataFrame:
    """Streaming leg of the sliding-distinct pattern (the twin of the
    batch ``ev_sliding_distinct_hll`` query): maintain one MERGEABLE
    HLL sketch per tumbling bucket — (bucket_start, sk: binary). A
    sliding window is then a sketch-sized ``hll_union_agg`` over the
    span's buckets BATCH-side (the dashboard/rollup query), so raw
    events are aggregated exactly once in the stream and the slide
    never re-touches them — the production division of labor that a
    native sliding-window agg (which explodes every event into
    window/slide copies inside the state store) cannot match.

    HLL sketches are order-insensitive (register maxima), so the
    streaming result is bit-identical to a batch ``hll_sketch_agg``
    over the same events — asserted in tests/test_streaming_hll.py.
    State per bucket is one kilobyte-scale sketch; the watermark
    bounds how many buckets stay open."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket).alias("w"))
        .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(lgk)).alias("sk"))
        .select(F.col("w.start").alias("bucket_start"), "sk")
    )


def enriched_event_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the event
    stream is joined against a STATIC dimension (here any (user_id,
    ...) frame — segment tables, account metadata). Spark re-plans the
    static side per batch, so a small dimension is broadcast every
    batch with no state store involved — the cheapest join a stream
    can do, and the first choice before reaching for stream-stream
    joins. Left join keeps events with no dimension row (label NULL)."""
    return events.join(dim, "user_id", "left")


def streaming_type_theta_sketches(events: DataFrame, lgk: int = 16) -> DataFrame:
    """Streaming leg of ``a10_theta_audience_overlap``: one mergeable
    theta sketch per event type, maintained incrementally across
    micro-batches (complete-mode global aggregate — state is T
    sketches, kilobytes). The pair algebra (intersection/union
    estimates) stays a batch rollup over this T-row state frame,
    exactly as the batch query does it.

    A theta sketch retains the k smallest hashes of the input SET —
    an order-insensitive, duplicate-insensitive function — so the
    streaming state is bit-identical to a batch ``theta_sketch_agg``
    over the same events no matter where micro-batch boundaries fall
    (asserted in tests/test_streaming_hll.py), and updating on RAW
    events equals the batch build over distinct (type, user) pairs."""
    return events.groupBy("event_type").agg(
        F.theta_sketch_agg(F.col("user_id"), lgNomEntries=lgk).alias("sk")
    )


def tumbling_value_quantile_sketches(
    events: DataFrame,
    bucket: str = "1 day",
    watermark: str = "1 day",
    k: int = 200,
) -> DataFrame:
    """Streaming leg of ``a11_kll_quantile_rollup``: one KLL sketch of
    event value per tumbling day, maintained incrementally; the fold
    into an overall sketch (``kll_sketch_merge_double``) stays a
    batch-side rollup over the days-count state frame.

    Unlike HLL/theta, KLL compaction IS order-sensitive — a different
    micro-batch split can yield a byte-different sketch — so the
    split-insensitive contract is rank-space, not bit-space: the
    retained-count n is always exact, and value-at-rank-q of the
    folded sketch lands within the same q±tol band the batch query
    verifies against its oracle (asserted in
    tests/test_streaming_hll.py). Watermark bounds open-bucket state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", bucket).alias("w"))
        .agg(F.kll_sketch_agg_double(F.col("value"), F.lit(k)).alias("sk"))
        .select(F.col("w.start").alias("bucket_start"), "sk")
    )


def tumbling_cms_cells(
    events: DataFrame,
    bucket: str = "1 day",
    watermark: str = "1 day",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Streaming leg of ``a12_cms_heavy_hitters`` — completing the
    four-sketch maintenance family (HLL buckets, theta types, KLL
    days, CMS cells): maintain the (depth × width) count-min counter
    matrix PER tumbling bucket as a windowed aggregate over hashed
    cells. Count-min cells are PLAIN ADDITIVE COUNTERS, so unlike KLL
    (order-sensitive compaction) and like HLL/theta, the streamed
    state is EXACTLY the batch state for any micro-batch split — and
    the rollup merge (cellwise SUM across buckets) plus min-over-depth
    estimation are ordinary batch aggregates over d·w-row frames.
    State per bucket is d·w longs (kilobytes); watermark bounds open
    buckets. Asserted bit-exact against the batch build and the
    registry query's estimates in tests/test_streaming_hll.py."""
    from ..workload.events import _CMS_DEPTH, _CMS_WIDTH, _cms_bucket

    # geometry defaults come from the BATCH constants so a retune in
    # workload/events.py cannot silently diverge the streamed sketch
    depth = _CMS_DEPTH if depth is None else depth
    width = _CMS_WIDTH if width is None else width
    depth_rows = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(depth)])
    )
    return (
        events.withWatermark("ts", watermark)
        .select("ts", "user_id")
        .withColumn("row", depth_rows)
        .groupBy(
            F.window("ts", bucket).alias("w"),
            "row",
            _cms_bucket(F.col("user_id"), F.col("row"), width).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("bucket_start"), "row", "bucket", "c")
    )
