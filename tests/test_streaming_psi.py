"""The streaming PSI monitor reconciles with the batch dq_psi_drift
query: the reference window frozen once, the monitored window streamed
in micro-batches, and the final per-band PSI contributions equal the
batch query's — plus fold replay idempotency."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.psi import (
    apply_psi_batch,
    freeze_reference,
    monitor_stream,
    read_psi,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.events import (
    _PSI_SPLIT_MS,
    _events,
)

from tests.conftest import SF_SMOKE


def _windows(spark):
    events = _events(spark, SF_SMOKE)
    is_ref = F.unix_millis("ts") < _PSI_SPLIT_MS
    return events.filter(is_ref), events.filter(~is_ref)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_psi_reconciles_with_batch(spark, tmp_path):
    ref, cur = _windows(spark)
    ref_dir = str(tmp_path / "ref")
    freeze_reference(ref, ref_dir)

    d = tmp_path / "feed"
    d.mkdir()
    now = 1_700_000_000
    # split the monitored window into 3 micro-batches by event_id
    for i in range(3):
        pdf = (
            cur.filter(F.col("event_id") % 3 == i)
            .select("value")
            .toPandas()
        )
        f = d / f"b{i}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
        os.utime(f, (now + 60 * i, now + 60 * i))

    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = monitor_stream(stream, state_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = _rows(read_psi(spark, state_dir, ref_dir))
    want = _rows(QUERIES["dq_psi_drift"](spark, SF_SMOKE))
    assert got == want and len(want) == 10


def test_psi_fold_replay_is_idempotent(spark, tmp_path):
    ref, cur = _windows(spark)
    ref_dir = str(tmp_path / "ref")
    freeze_reference(ref, ref_dir)
    state_dir = str(tmp_path / "state")
    b0 = cur.filter(F.col("event_id") % 2 == 0).select("value")
    b1 = cur.filter(F.col("event_id") % 2 == 1).select("value")
    apply_psi_batch(b0, 0, state_dir)
    apply_psi_batch(b1, 1, state_dir)
    committed = _rows(read_psi(spark, state_dir, ref_dir))
    apply_psi_batch(b1, 1, state_dir)  # foreachBatch replay
    assert _rows(read_psi(spark, state_dir, ref_dir)) == committed
