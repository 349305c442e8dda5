"""Streaming materialized-view maintenance — the production loop
around ``workload/events.py mv_retractable_agg_maintenance``: a
continuous CDC stream of SIGNED delta rows (inserts +1/+v, deletes
-1/-v) maintains a per-key (count, sum) view stored as parquet,
without ever rescanning the base table.

Exactly-once by IDEMPOTENT VERSIONING, not by luck: foreachBatch is
at-least-once (a crashed batch replays), and view maintenance is NOT
idempotent naively — applying the same delta twice double-counts. So
each batch writes the new view to its own version directory
``view_dir/v=<batch_id>`` after reading the latest version with a
SMALLER batch id: a replayed batch re-reads the same predecessor and
OVERWRITES its own version with identical content. Readers take the
max committed version. (This is the delta-log discipline of a
transactional table format, reduced to the one sequence number
foreachBatch already guarantees monotone.)

Scale: per batch the maintenance input is the standing view (|keys|
rows) plus the batch's delta — map-side-combined to one row per key
per side — and the write is |keys| rows. The base fact table is never
read. Old versions are pruned beyond a retention count (time travel
for free until then).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DELTA_SCHEMA = "user_id bigint, dn bigint, dv bigint"
_VIEW_SCHEMA = "user_id bigint, n_events bigint, total_centi bigint"


def _versions(spark: SparkSession, view_dir: str) -> list[int]:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(view_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def read_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """The current (max committed version) state of the view; empty
    frame with the view schema when no version exists yet."""
    versions = _versions(spark, view_dir)
    if not versions:
        return spark.createDataFrame([], _VIEW_SCHEMA)
    return spark.read.parquet(f"{view_dir}/v={versions[-1]}")


def apply_delta_batch(
    delta: DataFrame, batch_id: int, view_dir: str, retain_versions: int = 3
) -> None:
    """Apply one signed-delta micro-batch: read the latest view
    version with id < ``batch_id``, merge (union + one groupBy, keys
    reaching zero count drop out), write ``v=<batch_id>``. Replays are
    idempotent by construction (same predecessor, same content,
    overwrite). Versions older than the newest ``retain_versions`` are
    pruned."""
    spark = delta.sparkSession
    prior = [v for v in _versions(spark, view_dir) if v < batch_id]
    if prior:
        view = spark.read.parquet(f"{view_dir}/v={prior[-1]}")
    else:
        view = spark.createDataFrame([], _VIEW_SCHEMA)
    merged = (
        view.select(
            "user_id",
            F.col("n_events").alias("dn"),
            F.col("total_centi").alias("dv"),
        )
        .unionByName(delta.select("user_id", "dn", "dv"))
        .groupBy("user_id")
        .agg(F.sum("dn").alias("n_events"), F.sum("dv").alias("total_centi"))
        .filter(F.col("n_events") > 0)
    )
    merged.write.mode("overwrite").parquet(f"{view_dir}/v={batch_id}")
    # prune old versions, keeping the newest retain_versions
    keep = set(sorted(set(_versions(spark, view_dir)))[-retain_versions:])
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(view_dir)
    fs = root.getFileSystem(conf)
    for v in _versions(spark, view_dir):
        if v not in keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{view_dir}/v={v}"), True)


def maintain_view_stream(
    cdc_stream: DataFrame,
    view_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Run the maintenance loop over a (user_id, dn, dv) signed-delta
    stream (``DELTA_SCHEMA``)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_delta_batch(batch, batch_id, view_dir)

    return (
        cdc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger if trigger is not None else {"availableNow": True}))
        .start()
    )


def read_delta_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of signed delta rows — the test stand-in for
    a CDC topic."""
    reader = spark.readStream.schema(DELTA_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
