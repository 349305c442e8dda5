"""Unit tests for the as-of join and connected-components operators,
mirroring the scenarios their workload queries rely on (tie-breaks,
no-match NULLs, chain propagation, fixed-iteration semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.asof import merge_asof
from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    connected_components,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def test_merge_asof_basic_and_null(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 20, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(2), 7.0), (101, 10, _ts(4), 9.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["asof_value"], r["asof_ts"])
        for r in merge_asof(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_seq="event_id", payload=["value"],
        ).collect()
    }
    assert out[1] == (9.0, _ts(4))  # latest preceding
    assert out[2] == (None, None)  # no purchase yet
    assert out[3] == (None, None)  # other key, no right rows


def test_merge_asof_inclusive_and_tie_break(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(3))], "event_id long, user_id long, ts timestamp"
    )
    # two right rows at exactly left's ts: inclusive match, highest seq wins
    right = spark.createDataFrame(
        [(100, 10, _ts(3), 1.0), (101, 10, _ts(3), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    [row] = merge_asof(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_seq="event_id", payload=["value"],
    ).collect()
    assert row["asof_value"] == 2.0


def test_connected_components_chain_and_island(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    labels = {
        r["node"]: r["label"]
        for r in connected_components(edges, iterations=4).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_fixed_rounds_deterministic(spark):
    # a 5-node path: after 1 round node 5 has only seen label 4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    one = {
        r["node"]: r["label"]
        for r in connected_components(edges, iterations=1).collect()
    }
    assert one[5] == 4 and one[2] == 1
    full = {
        r["node"]: r["label"]
        for r in connected_components(edges, iterations=4).collect()
    }
    assert set(full.values()) == {1}
