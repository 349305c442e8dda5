"""Streaming MAX-under-deletes maintenance reconciles with the batch
query mv_max_maintenance_targeted — same (user_id, max_centi,
recomputed) rows, including WHICH path produced each key — and the
fold is idempotent under foreachBatch replay. Plus the disorder leg:
a retraction arriving before its base row parks as a negative carry
and lands when the base row shows up."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.mvmax import (
    apply_max_delta_batch,
    maintain_max_view_stream,
    read_max_delta_stream,
    read_max_view,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def _deltas(spark, sf_dir=SF_SMOKE):
    """The exact CDC rows of the batch op: base arrivals, inserts
    (event_id % 10 >= 8), deletes of base rows (% 7 == 0)."""
    events = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100 + 0.5).cast("long")
    is_base = F.col("event_id") % 10 < 8
    is_delete = is_base & (F.col("event_id") % 7 == 0)

    def rows(cond, kind):
        return events.filter(cond).select(
            "user_id", v.alias("v"), F.lit(kind).alias("kind")
        )

    return rows(is_base, "base"), rows(~is_base, "ins"), rows(is_delete, "del")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _want(spark, sf_dir=SF_SMOKE):
    return _rows(QUERIES["mv_max_maintenance_targeted"](spark, sf_dir))


def test_multi_batch_fold_reconciles_with_batch_query(spark, tmp_path):
    # sf0.01: the smoke scale has no heap-exhausted key, so the
    # targeted-recompute path would be vacuous there (7 keys
    # recompute at this scale)
    base, ins, dels = _deltas(spark, SF_CORRECTNESS)
    state_dir = str(tmp_path / "state")
    apply_max_delta_batch(base, 0, state_dir)
    apply_max_delta_batch(ins, 1, state_dir)
    apply_max_delta_batch(dels, 2, state_dir)
    got = _rows(read_max_view(spark, state_dir, base.select("user_id", "v")))
    want = _want(spark, SF_CORRECTNESS)
    assert got == want and len(want) > 0
    # non-vacuous on BOTH paths: some keys maintained, some recomputed
    flags = {r[2] for r in want}
    assert flags == {True, False}


def test_fold_replay_is_idempotent(spark, tmp_path):
    base, ins, dels = _deltas(spark)
    state_dir = str(tmp_path / "state")
    for bid, b in enumerate((base, ins, dels)):
        apply_max_delta_batch(b, bid, state_dir)
    committed = _rows(read_max_view(spark, state_dir, base.select("user_id", "v")))
    apply_max_delta_batch(dels, 2, state_dir)  # foreachBatch replay
    assert (
        _rows(read_max_view(spark, state_dir, base.select("user_id", "v")))
        == committed
    )


def test_stream_loop_reconciles(spark, tmp_path):
    base, ins, dels = _deltas(spark)
    d = tmp_path / "cdc"
    d.mkdir()
    now = 1_700_000_000
    for i, b in enumerate((base, ins, dels)):
        f = d / f"b{i}.parquet"
        pq.write_table(
            pa.Table.from_pandas(b.toPandas(), preserve_index=False), f
        )
        os.utime(f, (now + 60 * i, now + 60 * i))
    state_dir = str(tmp_path / "state")
    q = maintain_max_view_stream(
        read_max_delta_stream(spark, str(d), max_files_per_trigger=1),
        state_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    got = _rows(read_max_view(spark, state_dir, base.select("user_id", "v")))
    assert got == _want(spark)


def test_heap_survival_and_targeted_recompute_kernel(spark, tmp_path):
    """Hand-built kernel: key 1 loses its top value (second heap value
    takes over, no recompute); key 2 loses BOTH heap values (targeted
    recompute finds the below-heap survivor); key 3 is insert-only
    (flagged recomputed, the batch op's contract)."""
    sch = "user_id bigint, v bigint, kind string"
    base = spark.createDataFrame(
        [(1, 50, "base"), (1, 40, "base"), (1, 30, "base"),
         (2, 90, "base"), (2, 80, "base"), (2, 70, "base")],
        sch,
    )
    dels = spark.createDataFrame(
        [(1, 50, "del"), (2, 90, "del"), (2, 80, "del")], sch
    )
    ins = spark.createDataFrame([(3, 11, "ins")], sch)
    state_dir = str(tmp_path / "state")
    apply_max_delta_batch(base, 0, state_dir)
    apply_max_delta_batch(dels.unionByName(ins), 1, state_dir)
    got = _rows(
        read_max_view(
            spark,
            state_dir,
            base.filter(F.col("kind") == "base").select("user_id", "v"),
        )
    )
    assert got == {(1, 40, False), (2, 70, True), (3, 11, True)}


def test_disorder_delete_before_base_parks_then_lands(spark, tmp_path):
    """Cross-batch CDC disorder: the retraction of value 50 arrives a
    batch BEFORE its base row. It parks as a 'del' carry (the view
    recomputes honestly meanwhile) and cancels the base arrival when
    it lands — the key's max is the untouched 40, via the heap."""
    sch = "user_id bigint, v bigint, kind string"
    state_dir = str(tmp_path / "state")
    apply_max_delta_batch(
        spark.createDataFrame([(1, 50, "del")], sch), 0, state_dir
    )
    late_base = spark.createDataFrame(
        [(1, 50, "base"), (1, 40, "base")], sch
    )
    apply_max_delta_batch(late_base, 1, state_dir)
    got = _rows(
        read_max_view(spark, state_dir, late_base.select("user_id", "v"))
    )
    assert got == {(1, 40, False)}
