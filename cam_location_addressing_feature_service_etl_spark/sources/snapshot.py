"""Snapshot lifecycle: timestamped parquet snapshot directories.

The reference versions whole-database snapshots under timestamped S3
keys and restores the *latest* by descending-lex key sort
(``address_etl/s3.py:13-46,111-121``; restore ``main_pls.py:101-186``).
Here a snapshot is a directory ``<root>/snapshot_ts=<ts>/<table>/``
of parquet tables; "latest" is the max partition value (O1). The same
layout works on S3A paths on a real cluster; object-store listing is
O(#snapshots), not O(data).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_RE = re.compile(r"^snapshot_ts=(.+)$")


def snapshot_dir(root: str, ts: str) -> str:
    return os.path.join(root, f"snapshot_ts={ts}")


def list_snapshots(root: str) -> list[str]:
    """All snapshot timestamps, ascending."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _TS_RE.match(name)
        if m:
            out.append(m.group(1))
    return sorted(out)


def latest_snapshot(root: str, prefix: str = "") -> str | None:
    """O1: latest snapshot = max timestamp (desc-lex sort + first, as in
    s3.py:37-46 — ISO-8601 timestamps sort lexicographically)."""
    candidates = [t for t in list_snapshots(root) if t.startswith(prefix)]
    return candidates[-1] if candidates else None


def write_snapshot(
    tables: dict[str, DataFrame],
    root: str,
    ts: str,
    sort_specs: dict[str, list[str]] | None = None,
) -> str:
    """Publish one atomic snapshot of all state + output tables. Job
    commit protocol makes each table write all-or-nothing (replaces the
    reference's periodic-commit batching, pls/tables.py:454-457).

    ``sort_specs`` (table name → sort columns) opts a table into the
    clustered layout of ``plans/compact.py``: one
    ``repartitionByRange`` + ``sortWithinPartitions`` so its files
    carry DISJOINT key ranges and tight min/max stats — the next run
    reads these tables back (carry-forward, id maps), and key
    filters/joins then prune files instead of scanning the snapshot.
    Default is unchanged (write as-is); this is the write-time twin of
    the post-hoc ``compact_parquet`` maintenance pass."""
    unknown = set(sort_specs or {}) - set(tables)
    if unknown:
        # a typo'd/renamed table name would otherwise silently lose its
        # clustered layout and next-run reads quietly stop pruning
        raise ValueError(
            f"sort_specs names tables not being written: {sorted(unknown)} "
            f"(writing: {sorted(tables)})"
        )
    base = snapshot_dir(root, ts)
    for name, df in tables.items():
        cols = (sort_specs or {}).get(name)
        if cols:
            df = df.repartitionByRange(
                df.sparkSession.sparkContext.defaultParallelism, *cols
            ).sortWithinPartitions(*cols)
        df.write.mode("overwrite").parquet(os.path.join(base, name))
    return base


def read_snapshot_table(spark: SparkSession, root: str, ts: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(snapshot_dir(root, ts), name))


def carry_forward_geocodes(prev_geocodes: DataFrame) -> DataFrame:
    """U2 with column reshape: geocodes carried from the previous run
    get site_id and hash nulled so the new run re-enriches them
    (main_pls.py:123-133)."""
    return prev_geocodes.select(
        "geocode_id",
        "geocode_type",
        "address_pid",
        F.lit(None).cast("string").alias("site_id"),
        "centoid_lat",
        "centoid_lon",
        F.lit(None).cast("string").alias("hash"),
    )
