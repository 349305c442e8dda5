"""Streaming calibration monitor reconciles with the batch
dq_calibration_ece audit: folding scored-document micro-batches and
reading the reliability table yields the identical per-bin rows
(counts are mergeable integers; the derivation formula is shared),
replay is idempotent, and the monitor stays current as batches
accrete."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.calibration import (
    apply_scored_batch,
    monitor_stream,
    read_reliability,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
    _NB_TEST_MOD,
    lr_train_score,
)

from tests.conftest import SF_SMOKE


def _scored(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return lr_train_score(docs, _NB_TEST_MOD).select(
        "doc_id", "p_quality", "gold"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("bin").collect()]


def test_folded_batches_match_batch_query(spark, tmp_path):
    scored = _scored(spark).localCheckpoint()
    state = str(tmp_path / "state")
    # three uneven micro-batches partitioned by doc_id residue
    for b, pred in enumerate(
        ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]
    ):
        apply_scored_batch(scored.filter(pred), b, state)
    got = _sorted_rows(read_reliability(spark, state))
    want = _sorted_rows(QUERIES["dq_calibration_ece"](spark, SF_SMOKE))
    assert got == want


def test_replay_is_idempotent(spark, tmp_path):
    scored = _scored(spark).localCheckpoint()
    state = str(tmp_path / "state")
    half_a = scored.filter("doc_id % 2 = 0")
    half_b = scored.filter("doc_id % 2 = 1")
    apply_scored_batch(half_a, 0, state)
    apply_scored_batch(half_b, 1, state)
    before = _sorted_rows(read_reliability(spark, state))
    apply_scored_batch(half_b, 1, state)  # foreachBatch replay
    assert _sorted_rows(read_reliability(spark, state)) == before


def test_stream_wrapper_end_to_end(spark, tmp_path):
    scored = _scored(spark).localCheckpoint()
    src = str(tmp_path / "src")
    scored.write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, p_quality double, gold boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = monitor_stream(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = _sorted_rows(read_reliability(spark, str(tmp_path / "state")))
    want = _sorted_rows(QUERIES["dq_calibration_ece"](spark, SF_SMOKE))
    assert got == want


def test_empty_state_reads_empty(spark, tmp_path):
    out = read_reliability(spark, str(tmp_path / "nothing"))
    assert out.count() == 0
    assert out.columns == ["bin", "n_docs", "avg_conf", "frac_pos", "abs_gap"]
