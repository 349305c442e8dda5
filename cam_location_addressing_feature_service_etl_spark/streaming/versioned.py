"""Idempotent versioned state folding for foreachBatch sinks — the
shared discipline behind streaming MV maintenance (``streaming/mv.py``)
and streaming model training (``streaming/classify.py``).

foreachBatch is at-least-once; folding a batch into standing state is
not idempotent naively. The fix is one rule: batch ``b`` reads the
latest committed version with id < ``b`` and writes ``dir/v=<b>`` —
a replayed batch re-reads the same predecessor and overwrites its own
version with identical content, so the fold is exactly-once by
construction (the delta-log discipline of a transactional table
format, reduced to the one sequence number foreachBatch already
guarantees monotone). Readers take the max committed version; versions
beyond a retention count are pruned (time travel for free until then).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..runtime import scoped_plan_refs


def _versions(spark: SparkSession, state_dir: str) -> list[int]:
    """COMMITTED versions only: a version directory counts once its
    ``_SUCCESS`` marker exists, so a reader racing a write (or a
    version left half-written by a crash) never sees it as latest —
    the crashed batch's replay overwrites the partial dir."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith("v=")
            and fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{name}/_SUCCESS")
            )
        ):
            out.append(int(name[2:]))
    return sorted(out)


def read_latest(spark: SparkSession, state_dir: str, schema: str) -> DataFrame:
    """The current (max committed version) state; an empty frame with
    ``schema`` when no version exists yet."""
    versions = _versions(spark, state_dir)
    if not versions:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(f"{state_dir}/v={versions[-1]}")


def fold_version(
    delta: DataFrame,
    batch_id: int,
    state_dir: str,
    schema: str,
    merge: Callable[[DataFrame, DataFrame], DataFrame],
    retain_versions: int = 3,
) -> None:
    """Fold one micro-batch into the versioned state: read the latest
    version with id < ``batch_id`` (empty ``schema`` frame if none),
    apply ``merge(prior, delta)``, write ``v=<batch_id>``, prune old
    versions. Idempotent under batch replay — see module docstring."""
    if retain_versions < 2:
        # 1 breaks exactly-once: the fold writes v=b then pruning
        # deletes v=b-1, so a crash BEFORE batch b's checkpoint commit
        # replays b against no prior version and silently resets the
        # standing state to the lone delta. The predecessor must
        # survive until the checkpoint commit is durable, so >= 2.
        # (0 is worse still — it prunes the version just written.)
        raise ValueError(f"retain_versions must be >= 2, got {retain_versions}")
    spark = delta.sparkSession
    prior_ids = [v for v in _versions(spark, state_dir) if v < batch_id]
    if prior_ids:
        prior = spark.read.parquet(f"{state_dir}/v={prior_ids[-1]}")
    else:
        prior = spark.createDataFrame([], schema)
    # scoped plan-ref retention: any materialize() inside merge() has
    # its final action run by the write below, so the refs (which keep
    # SQLMetrics registered — runtime._PLAN_REFS) are needed only for
    # the fold's duration; a standing stream must not pin 512 plans
    with scoped_plan_refs():
        merge(prior, delta).write.mode("overwrite").parquet(
            f"{state_dir}/v={batch_id}"
        )
    keep = set(_versions(spark, state_dir)[-retain_versions:])
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = root.getFileSystem(conf)
    for v in _versions(spark, state_dir):
        if v not in keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v={v}"), True)
