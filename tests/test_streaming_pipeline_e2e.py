"""The composed CDC production pipeline, end to end in ONE streaming
query: an at-least-once transport (duplicates) delivering signed
deltas OUT OF ORDER (bounded lateness) feeds
dropDuplicatesWithinWatermark → the generic reorder buffer → the
exactly-once versioned MV fold. The final maintained view must equal
the batch aggregate over the unique deltas — transport redelivery,
disorder, and foreachBatch replay all absorbed by the three stages
each test pins individually (test_streaming_dedup, _reorder, _mv)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.mv import (
    apply_delta_batch,
    read_view,
)
from cam_location_addressing_feature_service_etl_spark.streaming.reorder import (
    RELEASED,
    reorder_stream,
)

_BASE = 1_700_000_000
_SCHEMA = "change_id bigint, user_id bigint, dn bigint, dv bigint, ts timestamp"


def _write(d, name, rows, mtime):
    """rows: (change_id, user_id, dn, dv, ts_epoch_s)."""
    pdf = pd.DataFrame(
        {
            "change_id": np.int64([r[0] for r in rows]),
            "user_id": np.int64([r[1] for r in rows]),
            "dn": np.int64([r[2] for r in rows]),
            "dv": np.int64([r[3] for r in rows]),
            "ts": pd.to_datetime([r[4] for r in rows], unit="s").astype(
                "datetime64[us]"
            ),
        }
    )
    f = d / name
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
    os.utime(f, (mtime, mtime))


def test_cdc_pipeline_dedup_reorder_fold(spark, tmp_path):
    ts = lambda i: _BASE + 10 * i  # noqa: E731
    # unique CDC truth: user 1 gets inserts 10,20,30 then a delete of
    # 20; user 2 gets inserts 100,50 — final view: u1 (2, 40), u2 (2, 150)
    u1 = [
        (1, 1, 1, 10, ts(1)),
        (2, 1, 1, 20, ts(2)),
        (3, 1, 1, 30, ts(3)),
        (4, 1, -1, -20, ts(4)),
    ]
    u2 = [(11, 2, 1, 100, ts(1)), (12, 2, 1, 50, ts(2))]

    d = tmp_path / "cdc"
    d.mkdir()
    m = 1_700_000_000
    # batch 1: u1 seqs 2,3 arrive BEFORE seq 1 (disorder), u2 seq 12
    # delivered TWICE in the same window (transport duplicate)
    _write(d, "f1.parquet", [u1[1], u1[2], u2[1], u2[1]], m)
    # batch 2: the stragglers (still inside lateness), plus a
    # REDELIVERY of u1 seq 2 a full batch later
    _write(d, "f2.parquet", [u1[0], u2[0], u1[1]], m + 60)
    # batch 3: u1 seq 4 (the delete)
    _write(d, "f3.parquet", [u1[3]], m + 120)
    # sentinels on their own key: push the watermark past every real
    # event time, twice, so the event-time timeout flushes keys 1,2
    _write(d, "s1.parquet", [(900, 99, 0, 0, _BASE + 10_000)], m + 180)
    _write(d, "s2.parquet", [(901, 99, 0, 0, _BASE + 10_001)], m + 240)

    raw = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    lateness = "45 seconds"
    deduped = raw.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["change_id"]
    )
    ordered = reorder_stream(
        deduped,
        lateness,
        key_col="user_id",
        seq_col="change_id",
        ts_col="ts",
        payload_cols=("dn", "dv"),
        assume_watermarked=True,  # the dedup stage's watermark governs
    )
    view_dir = str(tmp_path / "view")

    def _fold(batch, bid):
        apply_delta_batch(
            batch.filter(F.col("status") == RELEASED).select(
                "user_id", "dn", "dv"
            ),
            bid,
            view_dir,
        )

    q = (
        ordered.writeStream.foreachBatch(_fold)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["user_id"], r["n_events"], r["total_centi"])
        for r in read_view(spark, view_dir).filter(F.col("user_id") != 99).collect()
    }
    assert got == {(1, 2, 40), (2, 2, 150)}
