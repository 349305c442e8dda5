"""Streaming Benford monitor reconciles with the batch
dq_benford_audit: folded digit counts are mergeable integers and the
derivation shares the batch query's probability literals, so any
batching equals the one-shot; replay is idempotent."""

from __future__ import annotations

from cam_location_addressing_feature_service_etl_spark.streaming.benford import (
    apply_amount_batch,
    monitor_stream,
    read_benford,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE


def _orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("digit").collect()]


def test_folded_batches_match_batch_query(spark, tmp_path):
    orders = _orders(spark).localCheckpoint()
    state = str(tmp_path / "state")
    for b, pred in enumerate(
        ["o_orderkey % 3 = 0", "o_orderkey % 3 = 1", "o_orderkey % 3 = 2"]
    ):
        apply_amount_batch(orders.filter(pred), b, state)
    got = _sorted_rows(read_benford(spark, state))
    want = _sorted_rows(QUERIES["dq_benford_audit"](spark, SF_SMOKE))
    assert got == want and len(got) == 9


def test_replay_is_idempotent(spark, tmp_path):
    orders = _orders(spark).localCheckpoint()
    state = str(tmp_path / "state")
    apply_amount_batch(orders.filter("o_orderkey % 2 = 0"), 0, state)
    apply_amount_batch(orders.filter("o_orderkey % 2 = 1"), 1, state)
    before = _sorted_rows(read_benford(spark, state))
    apply_amount_batch(orders.filter("o_orderkey % 2 = 1"), 1, state)  # replay
    assert _sorted_rows(read_benford(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    orders = _orders(spark).select("o_orderkey", "o_totalprice").localCheckpoint()
    src = str(tmp_path / "src")
    orders.write.parquet(src)
    stream = (
        spark.readStream.schema("o_orderkey bigint, o_totalprice double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = monitor_stream(stream, str(tmp_path / "state"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = _sorted_rows(read_benford(spark, str(tmp_path / "state")))
    want = _sorted_rows(QUERIES["dq_benford_audit"](spark, SF_SMOKE))
    assert got == want
