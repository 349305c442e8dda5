"""Streaming FS-EM trainer reconciles with the batch er_fs_em_train:
folding the candidate agreement vectors in micro-batches and running
EM at read time yields the identical trained parameters (counts are
mergeable integers; the EM program is shared), replay is idempotent,
and training stays current as batches accrete."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.fsem import (
    GAMMA_SCHEMA,
    apply_gamma_batch,
    read_trained_params,
    train_stream,
)
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.geo import (
    _fs_gammas,
)

from tests.conftest import SF_SMOKE


def _gammas(spark):
    return _fs_gammas(spark, SF_SMOKE).select(
        "a_first", "a_last", "a_close"
    )


def _row(df):
    return df.collect()[0].asDict()


def test_streamed_training_matches_batch_query(spark, tmp_path):
    g = _gammas(spark).localCheckpoint()
    d = tmp_path / "gammas"
    d.mkdir()
    now = 1_700_000_000
    # 3 micro-batches split by a deterministic hash of the vector
    split = (
        F.col("a_first").cast("long") * 4
        + F.col("a_last").cast("long") * 2
        + F.col("a_close").cast("long")
    ) % 3
    for i in range(3):
        pdf = g.filter(split == i).toPandas()
        f = d / f"b{i}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
        os.utime(f, (now + 60 * i, now + 60 * i))

    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(GAMMA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = train_stream(stream, state_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = _row(read_trained_params(spark, state_dir))
    want = _row(QUERIES["er_fs_em_train"](spark, SF_SMOKE))
    assert got == want and got["n_pairs"] > 0


def test_fold_replay_idempotent_and_training_stays_current(spark, tmp_path):
    g = _gammas(spark).localCheckpoint()
    b0 = g.filter(F.col("a_close"))
    b1 = g.filter(~F.col("a_close"))
    state_dir = str(tmp_path / "state")
    apply_gamma_batch(b0, 0, state_dir)
    partial = _row(read_trained_params(spark, state_dir))
    assert partial["n_pairs"] == b0.count()
    apply_gamma_batch(b1, 1, state_dir)
    full = _row(read_trained_params(spark, state_dir))
    assert full["n_pairs"] == g.count()
    assert full != partial  # training moved with the new evidence
    apply_gamma_batch(b1, 1, state_dir)  # foreachBatch replay
    assert _row(read_trained_params(spark, state_dir)) == full
    # the accreted counts train to the batch query's parameters
    assert full == _row(QUERIES["er_fs_em_train"](spark, SF_SMOKE))


def test_read_before_any_fold_returns_empty_not_fabricated(spark, tmp_path):
    """EM on an empty (or all-zero) count state must NOT manufacture
    parameters: the 0/0 posterior is NaN and the M-step clamp would
    silently coerce it to 1-1e-9, handing the consumer a plausible
    p_match=0.999999 with n_pairs=0 (r12 ADVICE). Empty state reads
    back as an EMPTY frame with the trained-params schema."""
    out = read_trained_params(spark, str(tmp_path / "never-written"))
    assert out.count() == 0
    assert out.columns[:2] == ["n_pairs", "p_match"]
    # all-zero counts (a fold of zero rows) short-circuit identically
    state_dir = str(tmp_path / "state")
    apply_gamma_batch(
        spark.createDataFrame([], GAMMA_SCHEMA), 0, state_dir
    )
    assert read_trained_params(spark, state_dir).count() == 0


def test_streamed_decision_table_matches_batch_rule(spark, tmp_path):
    """The standing decision table read from folded counts equals the
    batch er_fs_decision_rule 8-row table once all evidence is folded
    (same generated layers over the same integer counts); empty state
    reads back as an empty table, never a fabricated rule."""
    from cam_location_addressing_feature_service_etl_spark.streaming.fsem import (
        read_decision_table,
    )

    assert read_decision_table(spark, str(tmp_path / "never")).count() == 0
    g = _gammas(spark).localCheckpoint()
    state_dir = str(tmp_path / "state")
    apply_gamma_batch(g.filter(F.col("a_close")), 0, state_dir)
    apply_gamma_batch(g.filter(~F.col("a_close")), 1, state_dir)
    got = {
        tuple(r) for r in read_decision_table(spark, state_dir).collect()
    }
    want = {
        tuple(r)
        for r in QUERIES["er_fs_decision_rule"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) == 8
