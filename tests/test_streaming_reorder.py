"""The watermarked reorder buffer (streaming/reorder.py) turns an
out-of-order assigned-vector feed into the id-ordered stream the
SemDeDup ordering contract requires: releases happen in vec_id order
per cluster as the watermark advances, beyond-lateness arrivals are
flagged ``dropped_late`` instead of silently reordered-behind, and the
composed pipeline (out-of-order feed → reorder → semdedup) reconciles
EXACTLY with the batch ``sim_semdedup_prune`` flags — the r10 verdict's
"the documented upstream reorder buffer needs to actually exist"."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.reorder import (
    DROPPED_LATE,
    RELEASED,
    TIMED_SCHEMA,
    reorder_stream,
)

_BASE = 1_700_000_000  # epoch seconds; event times hang off this


def _write_feed(d, name, rows, mtime):
    """rows: list of (vec_id, cluster, nv, ts_epoch_s)."""
    pdf = pd.DataFrame(
        {
            "vec_id": np.int64([r[0] for r in rows]),
            "cluster": np.int64([r[1] for r in rows]),
            "nv": [r[2] for r in rows],
            # micros, not pandas' default nanos — Spark reads
            # TIMESTAMP(NANOS) parquet as INT64 (see skill gotchas)
            "ts": pd.to_datetime([r[3] for r in rows], unit="s").astype(
                "datetime64[us]"
            ),
        }
    )
    f = d / name
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
    os.utime(f, (mtime, mtime))


def _run_reorder(spark, feed_dir, sink, lateness, max_files=1):
    stream = (
        spark.readStream.schema(TIMED_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(str(feed_dir))
    )

    def _emit(batch, bid):
        batch.withColumn("bid", F.lit(bid)).write.mode("append").parquet(sink)

    q = (
        reorder_stream(stream, lateness)
        .writeStream.foreachBatch(_emit)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(sink)


def test_reorder_releases_in_order_and_flags_late(spark, tmp_path):
    """Crafted single-cluster feed with cross-batch disorder and one
    beyond-lateness straggler (lateness 15s, event times 10s apart):
    ids must come out released in order 1..6 SPREAD OVER multiple
    batches (incremental release, not one terminal flush), and id 0 —
    arriving after its slot was released — must be flagged, never
    released."""
    d = tmp_path / "feed"
    d.mkdir()
    v = [1.0, 0.0]
    ts = lambda i: _BASE + 10 * i
    m = 1_700_000_000
    # batch1: ids 2,3  → wm 0, nothing due
    _write_feed(d, "f1.parquet", [(2, 0, v, ts(2)), (3, 0, v, ts(3))], m)
    # batch2: id 1 arrives AFTER 2,3 (cross-batch disorder) + id 5;
    # wm = ts(3)-15 = BASE+15 → releases id 1 (ts 10)
    _write_feed(d, "f2.parquet", [(1, 0, v, ts(1)), (5, 0, v, ts(5))], m + 60)
    # batch3: id 4 + straggler id 0 (slot released in batch2);
    # wm = ts(5)-15 = BASE+35 → releases 2,3; flags 0
    _write_feed(d, "f3.parquet", [(4, 0, v, ts(4)), (0, 0, v, ts(0))], m + 120)
    # sentinels on their own cluster: advance the watermark past every
    # real event time, then trigger one more batch so the event-time
    # TIMEOUT flushes cluster 0 without any further cluster-0 data
    _write_feed(d, "s1.parquet", [(1000, 99, v, _BASE + 10_000)], m + 180)
    _write_feed(d, "s2.parquet", [(1001, 99, v, _BASE + 10_001)], m + 240)

    out = _run_reorder(
        spark, d, str(tmp_path / "sink"), "15 seconds"
    ).filter(F.col("cluster") == 0)

    released = [
        (r["bid"], r["vec_id"])
        for r in out.filter(F.col("status") == RELEASED)
        .orderBy("bid", "vec_id")
        .collect()
    ]
    assert [vid for _, vid in released] == [1, 2, 3, 4, 5]
    assert len({bid for bid, _ in released}) >= 3, (
        f"release happened in one flush, not incrementally: {released}"
    )
    # the straggler: flagged if the kernel saw it, released never
    straggler = out.filter(F.col("vec_id") == 0).collect()
    assert all(r["status"] == DROPPED_LATE for r in straggler)


def test_reorder_then_semdedup_reconciles_with_batch(spark, tmp_path):
    """Composed pipeline on the real smoke corpus: the assigned frame
    (ids monotone in event time) is dealt into two files so ids go
    BACKWARD across micro-batches — a feed the semdedup stream alone
    REJECTS (test_semdedup_stream_rejects_out_of_order_feed) — then
    reorder (lateness covering the full disorder) feeds its released
    leg to semdedup; the final flags must equal the batch query's."""
    from cam_location_addressing_feature_service_etl_spark.streaming.semdedup import (
        read_assigned_stream,
        semdedup_stream,
    )
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.llm_similarity import (
        _SEMDEDUP_TAU,
    )
    from tests.conftest import SF_SMOKE
    from tests.test_streaming_semdedup import _assigned_pdf

    d = tmp_path / "feed"
    d.mkdir()
    pdf = _assigned_pdf(spark)  # sorted by vec_id
    rows = [
        (int(r.vec_id), int(r.cluster), list(r.nv), _BASE + int(r.vec_id))
        for r in pdf.itertuples()
    ]
    m = 1_700_000_000
    v = [1.0] + [0.0] * (len(rows[0][2]) - 1)
    # odd positions first, even second: batch 2 carries ids smaller
    # than batch 1's — disorder in every cluster with >2 members
    _write_feed(d, "f1.parquet", rows[1::2], m)
    _write_feed(d, "f2.parquet", rows[0::2], m + 60)
    # event times span < lateness, so nothing releases until the
    # sentinels push the watermark past all real rows
    _write_feed(d, "s1.parquet", [(10_000, 999, v, _BASE + 100_000)], m + 120)
    _write_feed(d, "s2.parquet", [(10_001, 999, v, _BASE + 100_001)], m + 180)

    stream = (
        spark.readStream.schema(TIMED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ordered_dir = str(tmp_path / "ordered")

    def _emit(batch, _bid):
        (
            batch.filter(F.col("status") == RELEASED)
            .select("vec_id", "cluster", "nv")
            .write.mode("append")
            .parquet(ordered_dir)
        )

    q = (
        reorder_stream(stream, "2 hours")
        .writeStream.foreachBatch(_emit)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert spark.read.parquet(ordered_dir).count() == len(rows)

    q2 = (
        semdedup_stream(
            read_assigned_stream(spark, ordered_dir), _SEMDEDUP_TAU
        )
        .writeStream.format("memory")
        .queryName("reorder_semdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got = {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in spark.table("reorder_semdedup").collect()
    }
    want = {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in QUERIES["sim_semdedup_prune"](spark, SF_SMOKE).collect()
    }
    assert got == want
