"""transformWithState twin reconciles with the applyInPandasWithState
running-totals operator: same two-batch feed, same final per-user
totals — the two stateful APIs pinned against each other."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    EVENTS_FILE_SCHEMA,
)
from cam_location_addressing_feature_service_etl_spark.streaming.tws import (
    rocksdb_state_provider,
    running_user_totals_tws,
)

from tests.conftest import SF_SMOKE


def test_tws_totals_match_applyinpandas_twin(spark, tmp_path):
    # the transformWithState state-server protocol is protobuf-based;
    # the container ships no google.protobuf — skip (not fail) without
    # it, the multimodal-Pillow discipline
    pytest.importorskip("google.protobuf")
    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "batch1.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "batch2.parquet")

    raw = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(d))
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # the builder refuses to run without RocksDB and refuses to set it
    # itself (session-wide config leak) — the context manager is the
    # sanctioned scoped opt-in
    with pytest.raises(RuntimeError, match="RocksDB"):
        running_user_totals_tws(events)
    with rocksdb_state_provider(spark):
        q = (
            running_user_totals_tws(events)
            .writeStream.format("memory")
            .queryName("user_totals_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        is None
    )

    got = {
        r["user_id"]: (r["n"], r["tv"])
        for r in spark.table("user_totals_tws")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("total_value").alias("tv"))
        .collect()
    }
    base = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = {
        r["user_id"]: (2 * r["cnt"], round(2 * r["tv"], 4))
        for r in base.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("tv"),
        )
        .collect()
    }
    assert len(got) == len(want) > 0
    for uid, (n, tv) in want.items():
        gn, gtv = got[uid]
        assert gn == n, (uid, gn, n)
        assert abs(gtv - tv) < 1e-6, (uid, gtv, tv)


def test_provider_guard_and_scoped_restore(spark):
    """Runs in THIS container (no protobuf needed — the guard fires
    before any streaming starts): the builder raises without RocksDB,
    the context manager sets it only inside the block and restores
    the prior value (including 'unset') on exit, even on error."""
    key = "spark.sql.streaming.stateStore.providerClass"
    events = spark.createDataFrame([(1, 2.0)], "user_id bigint, value double")
    assert spark.conf.get(key, None) is None
    with pytest.raises(RuntimeError, match="RocksDB"):
        running_user_totals_tws(events)
    with rocksdb_state_provider(spark):
        assert "RocksDB" in spark.conf.get(key)
    assert spark.conf.get(key, None) is None

    spark.conf.set(key, "com.example.PriorProvider")
    try:
        with pytest.raises(ValueError, match="boom"):
            with rocksdb_state_provider(spark):
                assert "RocksDB" in spark.conf.get(key)
                raise ValueError("boom")
        assert spark.conf.get(key) == "com.example.PriorProvider"
    finally:
        spark.conf.unset(key)


def test_processor_kernel_accumulates_with_fake_state():
    """The processor's logic, independent of the protobuf transport:
    a fake ValueState carries totals across two invocations and the
    emissions are the running totals (this runs in THIS container;
    the end-to-end reconciliation above runs where protobuf exists)."""
    import pandas as pd

    from cam_location_addressing_feature_service_etl_spark.streaming.tws import (
        RunningTotalsProcessor,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    p = RunningTotalsProcessor()
    h = FakeHandle()
    p.init(h)
    out1 = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"value": [1.5, 2.5]})]), None)
    )
    assert len(out1) == 1
    assert out1[0].iloc[0].tolist() == [7, 2, 4.0]
    out2 = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"value": [0.5]})]), None)
    )
    assert out2[0].iloc[0].tolist() == [7, 3, 4.5]
    assert h.state.v == (3, 4.5)
    p.close()
