"""Compaction (plans/compact.py): row preservation, file-count
contract, per-file sortedness, and the point of the exercise —
DISJOINT sort-key ranges per file, so parquet min/max stats prune
range scans to the files that matter."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.plans.compact import (
    compact_parquet,
)


def _write_small_files(spark, d, n_rows=5_000, n_files=40):
    # simulate a per-trigger append sink: many small unsorted files
    df = spark.range(n_rows).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(n_rows)).alias("k"),  # shuffled key
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(n_files).write.mode("overwrite").parquet(str(d))
    return df


def test_compact_preserves_rows_and_tightens_ranges(spark, tmp_path):
    src, dst = tmp_path / "small", tmp_path / "compacted"
    _write_small_files(spark, src)

    stats = compact_parquet(
        spark, str(src), str(dst), sort_cols=["k"], target_rows_per_file=1_000
    )
    assert stats.rows == 5_000
    assert stats.files_before == 40
    assert 5 <= stats.files_after <= 6  # range partitioner may imbalance ±1

    # row preservation, value-exact
    before = {tuple(r) for r in spark.read.parquet(str(src)).collect()}
    after = {tuple(r) for r in spark.read.parquet(str(dst)).collect()}
    assert after == before

    # per-file: sorted within, and ranges pairwise DISJOINT across files
    spans = []
    for f in sorted(dst.glob("*.parquet")):
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        if not ks:
            continue
        assert ks == sorted(ks), f"{f.name} not sorted"
        spans.append((min(ks), max(ks)))
    spans.sort()
    assert len(spans) == stats.files_after
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"overlapping file ranges: [{lo1},{hi1}] vs [{lo2},{hi2}]"

    # the pruning payoff: a narrow range predicate intersects few files
    probe_lo, probe_hi = 100, 300
    touched = sum(1 for lo, hi in spans if not (hi < probe_lo or lo > probe_hi))
    assert touched <= 2


def test_compact_validates_args_and_layout(spark, tmp_path):
    """target_rows_per_file must be >= 1; a hive-partitioned root
    (subdirectories) must raise and point at compact_partitions rather
    than flattening the layout with files_before == 0 stats; an
    empty/missing source is a no-op."""
    import pytest

    src = tmp_path / "t"
    _write_small_files(spark, src, n_rows=10, n_files=2)
    for bad in (0, -5):
        with pytest.raises(ValueError, match="target_rows_per_file"):
            compact_parquet(
                spark, str(src), str(tmp_path / "o"), sort_cols=["k"],
                target_rows_per_file=bad,
            )

    part_root = tmp_path / "table"
    _write_small_files(spark, part_root / "day=1", n_rows=10, n_files=2)
    with pytest.raises(ValueError, match="compact_partitions"):
        compact_parquet(
            spark, str(part_root), str(tmp_path / "o2"), sort_cols=["k"],
            target_rows_per_file=10,
        )

    stats = compact_parquet(
        spark, str(tmp_path / "does_not_exist"), str(tmp_path / "o3"),
        sort_cols=["k"], target_rows_per_file=10,
    )
    assert (stats.files_before, stats.files_after, stats.rows) == (0, 0, 0)
    assert not (tmp_path / "o3").exists()  # no-op writes nothing


def test_compact_partitions_rewrites_only_hot(spark, tmp_path):
    """The 'compact yesterday's partition, not the table' operator:
    exactly the over-threshold partitions are rewritten in place
    (fewer, sorted, range-disjoint files); cold partitions keep their
    original file list and mtimes byte-for-byte."""
    import os as _os

    from cam_location_addressing_feature_service_etl_spark.plans.compact import (
        compact_partitions,
    )

    root = tmp_path / "table"
    # hot partitions: many small files; cold: a single file
    _write_small_files(spark, root / "day=1", n_rows=2_000, n_files=20)
    _write_small_files(spark, root / "day=2", n_rows=100, n_files=1)
    _write_small_files(spark, root / "day=3", n_rows=2_000, n_files=20)

    def snapshot(d):
        return {
            f.name: _os.stat(f).st_mtime_ns for f in d.glob("*.parquet")
        }

    cold_before = snapshot(root / "day=2")
    total_before = spark.read.parquet(str(root)).count()

    out = compact_partitions(
        spark, str(root), "day", sort_cols=["k"],
        target_rows_per_file=2_000, file_threshold=4,
    )
    assert sorted(out) == ["day=1", "day=3"]
    for leaf, stats in out.items():
        assert stats.files_before == 20 and stats.files_after == 1
        assert stats.rows == 2_000

    # cold partition untouched: same files, same mtimes
    assert snapshot(root / "day=2") == cold_before
    # hot partitions swapped in place: one file each, sorted
    for leaf in ("day=1", "day=3"):
        files = list((root / leaf).glob("*.parquet"))
        assert len(files) == 1
        ks = pq.read_table(files[0], columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)
    # staging gone, hive discovery still sees the whole table, row-exact
    assert not (root / "_compact_tmp").exists()
    after = spark.read.parquet(str(root))
    assert after.count() == total_before
    assert "day" in after.columns and set(
        r.day for r in after.select("day").distinct().collect()
    ) == {1, 2, 3}


def test_compact_refuses_self_overwrite(spark, tmp_path):
    """In-place compaction would clobber files the lazy plan still
    reads — the guard must refuse dst == src and dst nested in src."""
    import pytest

    src = tmp_path / "t"
    _write_small_files(spark, src, n_rows=10, n_files=2)
    for dst in (src, src / "sub"):
        with pytest.raises(ValueError, match="must not equal or nest"):
            compact_parquet(
                spark, str(src), str(dst), sort_cols=["k"],
                target_rows_per_file=10,
            )


def test_compact_the_linkage_stream_sink(spark, tmp_path):
    """The composition the module docstrings promise: a foreachBatch
    sink appends files per trigger (here the feed-linkage stream, one
    file batch at a time), and compaction rewrites the accumulated
    small files into few sorted, range-disjoint ones WITHOUT changing
    a single row — maintenance as a separate, lossless pass."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os as _os

    from cam_location_addressing_feature_service_etl_spark.streaming.linkage import (
        link_feed_stream,
        read_feed_stream,
    )
    from cam_location_addressing_feature_service_etl_spark.tables import load
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _FEED_NAME_SQL,
        _LINK_TAU,
    )
    from tests.conftest import SF_SMOKE

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    feed = (
        load(spark, SF_SMOKE, "part")
        .select(F.col("p_partkey").alias("fk"), F.expr(_FEED_NAME_SQL).alias("fn"))
        .toPandas()
        .sort_values("fk")
    )
    t = pa.Table.from_pandas(feed, preserve_index=False)
    step = t.num_rows // 4
    now = 1_700_000_000
    for i in range(4):  # 4 micro-batches -> >=4 sink files
        f = feed_dir / f"b{i}.parquet"
        pq.write_table(t.slice(i * step, step if i < 3 else None), f)
        _os.utime(f, (now + 60 * i, now + 60 * i))

    masters = (
        load(spark, SF_SMOKE, "part")
        .select(
            F.col("p_partkey").alias("mk"),
            F.col("p_name").alias("mn"),
            F.split(F.col("p_name"), " ")[0].alias("blk"),
        )
        .persist()
    )
    masters.count()
    sink, ckpt = tmp_path / "links", tmp_path / "ckpt"
    try:
        q = link_feed_stream(
            read_feed_stream(spark, str(feed_dir), max_files_per_trigger=1),
            masters,
            _LINK_TAU,
            str(sink),
            str(ckpt),
        )
        q.awaitTermination(180)
    finally:
        masters.unpersist()

    files_before = len(list(sink.glob("*.parquet")))
    assert files_before >= 4  # at least one file per trigger

    compacted = tmp_path / "links_compacted"
    stats = compact_parquet(
        spark, str(sink), str(compacted), sort_cols=["feed_key"],
        target_rows_per_file=10_000,
    )
    assert stats.files_before == files_before
    assert stats.files_after == 1
    before = {tuple(r) for r in spark.read.parquet(str(sink)).collect()}
    after = {tuple(r) for r in spark.read.parquet(str(compacted)).collect()}
    assert after == before and len(before) == stats.rows > 0
