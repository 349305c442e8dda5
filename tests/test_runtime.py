"""materialize() mode equivalence: the local (localCheckpoint) and
reliable (checkpoint-dir) materialization modes must be semantically
identical — the switch is purely a durability/throughput trade for
cluster deployment (executor-local blocks are not fault-tolerant at
scale; see runtime.py module docstring)."""

from __future__ import annotations

import os

import pytest

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    connected_components_star,
)
from cam_location_addressing_feature_service_etl_spark.runtime import materialize

EDGES = [
    (1, 2), (2, 3), (3, 4),          # chain component -> min 1
    (10, 11), (11, 12),              # second component -> min 10
    (20, 20),                        # self loop: dropped by canon, no output row
    (30, 31),                        # pair
]


def _labels(spark):
    edges = spark.createDataFrame(EDGES, "id_a long, id_b long")
    out = connected_components_star(edges)
    return sorted(tuple(r) for r in out.collect())


def test_materialize_modes_identical(spark):
    old = os.environ.get("SPARK_GRAFT_MATERIALIZE")
    try:
        os.environ["SPARK_GRAFT_MATERIALIZE"] = "local"
        local = _labels(spark)
        os.environ["SPARK_GRAFT_MATERIALIZE"] = "reliable"
        reliable = _labels(spark)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_MATERIALIZE", None)
        else:
            os.environ["SPARK_GRAFT_MATERIALIZE"] = old
    assert local == reliable
    assert local == sorted(
        [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10),
         (30, 30), (31, 30)]
    )


def test_materialize_rejects_unknown_mode(spark):
    df = spark.range(1)
    old = os.environ.get("SPARK_GRAFT_MATERIALIZE")
    os.environ["SPARK_GRAFT_MATERIALIZE"] = "bogus"
    try:
        with pytest.raises(ValueError, match="bogus"):
            materialize(df)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_MATERIALIZE", None)
        else:
            os.environ["SPARK_GRAFT_MATERIALIZE"] = old


def test_scoped_plan_refs_bounds_streaming_retention(spark):
    """materialize() inside a scoped_plan_refs() scope must not touch
    the process-wide _PLAN_REFS deque (r12 ADVICE: a standing
    foreachBatch service would otherwise pin the last 512 plans
    indefinitely) — and the scope's refs are dropped at exit while
    outside-scope behavior is unchanged."""
    from cam_location_addressing_feature_service_etl_spark import runtime

    runtime.release_plan_refs()
    with runtime.scoped_plan_refs():
        inner = materialize(spark.range(3))
        assert inner.count() == 3  # the scope's final action
        assert len(runtime._PLAN_REFS) == 0  # global deque untouched
        assert len(runtime._SCOPED.refs) == 2
    assert runtime._SCOPED.refs is None  # scope dropped at exit
    materialize(spark.range(2))
    assert len(runtime._PLAN_REFS) == 2  # outside scope: global again
    runtime.release_plan_refs()
