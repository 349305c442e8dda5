"""Streaming feed→master linkage reconciles EXACTLY with the batch
query: linkage is stateless per feed record, so the union of per-batch
link sets over ANY micro-batch split must equal geo_fuzzy_link_feed on
the whole feed — including the unmatched-record semantics (a record
whose corruption changed its block links in NO batch, same as batch).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.linkage import (
    link_feed_stream,
    read_feed_stream,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.geo import (
    _FEED_NAME_SQL,
    _LINK_TAU,
)

from tests.conftest import SF_SMOKE


def _write_feed_files(spark, d):
    """The exact feed geo_fuzzy_link_feed derives, split into two
    time-ordered files so links land in different micro-batches."""
    feed = (
        load(spark, SF_SMOKE, "part")
        .select(F.col("p_partkey").alias("fk"), F.expr(_FEED_NAME_SQL).alias("fn"))
        .toPandas()
        .sort_values("fk")
    )
    t = __import__("pyarrow").Table.from_pandas(feed, preserve_index=False)
    half = t.num_rows // 2
    b1, b2 = d / "b1.parquet", d / "b2.parquet"
    pq.write_table(t.slice(0, half), b1)
    pq.write_table(t.slice(half), b2)
    now = 1_700_000_000
    os.utime(b1, (now, now))
    os.utime(b2, (now + 60, now + 60))  # file source orders by mtime
    return t.num_rows


def _run_stream(spark, masters, feed_dir, out_dir, ckpt_dir, max_files):
    stream = read_feed_stream(spark, str(feed_dir), max_files_per_trigger=max_files)
    q = link_feed_stream(stream, masters, _LINK_TAU, str(out_dir), str(ckpt_dir))
    q.awaitTermination(180)
    return {
        (r["feed_key"], r["master_key"], r["edit_dist"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }


def test_linkage_stream_reconciles_with_batch(spark, tmp_path):
    feed_dir = tmp_path / "feed_in"
    feed_dir.mkdir()
    n_feed = _write_feed_files(spark, feed_dir)
    assert n_feed > 50

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
    try:
        want = {
            (r["feed_key"], r["master_key"], r["edit_dist"])
            for r in QUERIES["geo_fuzzy_link_feed"](spark, SF_SMOKE).collect()
        }
        # the fixture must exercise both semantics: real links AND
        # blocked-out unmatched records
        assert len(want) > 10
        assert len(want) < n_feed

        got_split = _run_stream(
            spark,
            masters,
            feed_dir,
            tmp_path / "out_split",
            tmp_path / "ckpt_split",
            max_files=1,
        )
        assert got_split == want

        got_single = _run_stream(
            spark,
            masters,
            feed_dir,
            tmp_path / "out_single",
            tmp_path / "ckpt_single",
            max_files=None,
        )
        assert got_single == want
    finally:
        masters.unpersist()


def test_linkage_stream_checkpoint_skips_processed_files(spark, tmp_path):
    """Checkpoint recovery for the foreachBatch sink: a restarted query
    with the same checkpoint must process ONLY files delivered after
    the first run (no duplicate links appended), and the sink's union
    still equals the batch result."""
    feed_dir = tmp_path / "feed_restart"
    feed_dir.mkdir()
    feed = (
        load(spark, SF_SMOKE, "part")
        .select(F.col("p_partkey").alias("fk"), F.expr(_FEED_NAME_SQL).alias("fn"))
        .toPandas()
        .sort_values("fk")
    )
    t = __import__("pyarrow").Table.from_pandas(feed, preserve_index=False)
    half = t.num_rows // 2
    now = 1_700_000_000
    b1 = feed_dir / "b1.parquet"
    pq.write_table(t.slice(0, half), b1)
    os.utime(b1, (now, now))

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
    out, ckpt = tmp_path / "out_restart", tmp_path / "ckpt_restart"

    def run_once():
        stream = read_feed_stream(spark, str(feed_dir))
        q = link_feed_stream(stream, masters, _LINK_TAU, str(out), str(ckpt))
        q.awaitTermination(180)

    try:
        run_once()
        n_after_first = spark.read.parquet(str(out)).count()
        b2 = feed_dir / "b2.parquet"
        pq.write_table(t.slice(half), b2)
        os.utime(b2, (now + 60, now + 60))
        run_once()  # restart: must link only the new file
        rows = [
            (r["feed_key"], r["master_key"], r["edit_dist"])
            for r in spark.read.parquet(str(out)).collect()
        ]
        assert len(rows) == len(set(rows)), "duplicate links after restart"
        want = {
            (r["feed_key"], r["master_key"], r["edit_dist"])
            for r in QUERIES["geo_fuzzy_link_feed"](spark, SF_SMOKE).collect()
        }
        assert set(rows) == want
        assert n_after_first < len(rows)  # second run added the rest
    finally:
        masters.unpersist()


def test_linkage_stream_multiblock_reconciles_with_batch(spark, tmp_path):
    """The recall dial is the SAME dial in both legs: streaming with
    block_keys=the token-union passes must union to exactly the batch
    multiblock result — including records only the second (last-token)
    pass recovers."""
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _LINK_BLOCK_STRATEGIES,
    )

    feed_dir = tmp_path / "feed_mb"
    feed_dir.mkdir()
    _write_feed_files(spark, feed_dir)

    masters = (
        load(spark, SF_SMOKE, "part")
        .select(F.col("p_partkey").alias("mk"), F.col("p_name").alias("mn"))
        .persist()
    )
    masters.count()
    try:
        want = {
            (r["feed_key"], r["master_key"], r["edit_dist"])
            for r in QUERIES["geo_fuzzy_link_feed_multiblock"](
                spark, SF_SMOKE
            ).collect()
        }
        single = {
            (r["feed_key"], r["master_key"], r["edit_dist"])
            for r in QUERIES["geo_fuzzy_link_feed"](spark, SF_SMOKE).collect()
        }
        assert len(want) > len(single)  # the union pass must matter

        stream = read_feed_stream(spark, str(feed_dir), max_files_per_trigger=1)
        q = link_feed_stream(
            stream,
            masters,
            _LINK_TAU,
            str(tmp_path / "out_mb"),
            str(tmp_path / "ckpt_mb"),
            block_keys=_LINK_BLOCK_STRATEGIES,
        )
        q.awaitTermination(180)
        got = {
            (r["feed_key"], r["master_key"], r["edit_dist"])
            for r in spark.read.parquet(str(tmp_path / "out_mb")).collect()
        }
        assert got == want
    finally:
        masters.unpersist()
