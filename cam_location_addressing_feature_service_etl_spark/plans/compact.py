"""Table-maintenance compaction: rewrite a small-files parquet
directory into few, sorted, range-disjoint files (the lakehouse
OPTIMIZE / CLUSTER BY operation).

Why it exists: every streaming sink in this repo (foreachBatch
linkage, snapshot appends, micro-batch upserts) appends one-or-more
files PER TRIGGER — at production cadence that is thousands of files
a day, and the scan side pays for it twice: task-per-file scheduling
overhead, and min/max statistics so wide they prune nothing. The
reference's per-run snapshot rewrite (the whole SQLite file is
rebuilt and re-uploaded each run — ``main_pls.py:198``
``{prefix}/{ts}/pls.db``) is the single-node ancestor of this
operation; at Spark scale the rewrite must stay distributed and
ordered.

Plan shape: one ``repartitionByRange(n, sort_cols)`` exchange (range
boundaries from Spark's reservoir sample of the sort key), then
``sortWithinPartitions`` — so every output file covers a DISJOINT
range of the sort key and its parquet footer min/max are tight. A
range predicate on the sort key then prunes to the few files whose
range intersects — the same data-skipping story as
``geo_zorder_layout`` (use the zkey as the sort column for 2-D
pruning). Row-preservation and range-disjointness are pinned in
``tests/test_compact.py``.

At 100 TB: compaction is per-partition maintenance (compact yesterday's
partition, not the table); the exchange shuffles only the partition
being rewritten and the writer streams sorted runs — no driver
materialization anywhere. ``target_rows_per_file`` sizes the output
(files = ceil(rows / target)); size by bytes via the caller's
rows-per-byte estimate, as parquet encodes before the writer can see
bytes.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CompactionStats:
    files_before: int
    files_after: int
    rows: int


def _parquet_files(spark: SparkSession, path: str) -> list[str]:
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hadoop_path):
        return []
    it = fs.listStatus(hadoop_path)
    return [
        str(st.getPath())
        for st in it
        if st.isFile() and str(st.getPath().getName()).endswith(".parquet")
    ]


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    sort_cols: list[str],
    target_rows_per_file: int,
) -> CompactionStats:
    """Rewrite ``src_dir`` into ``dst_dir`` as ceil(rows/target) files,
    each sorted by ``sort_cols`` and covering a disjoint range of them.
    Returns before/after file counts and the row count (the caller's
    swap — rename/retarget readers — is storage-layer specific and out
    of scope, as is deleting the source)."""
    src_norm = os.path.normpath(src_dir)
    dst_norm = os.path.normpath(dst_dir)
    if dst_norm == src_norm or dst_norm.startswith(src_norm + os.sep):
        # the overwrite would clobber files the lazy plan still reads —
        # in-place compaction needs a staging dir + rename at the
        # storage layer, never a self-overwrite
        raise ValueError(
            f"dst_dir must not equal or nest inside src_dir: {src_dir!r}"
        )
    files_before = len(_parquet_files(spark, src_dir))
    df = spark.read.parquet(src_dir)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
    return CompactionStats(
        files_before=files_before,
        files_after=len(_parquet_files(spark, dst_dir)),
        rows=rows,
    )
