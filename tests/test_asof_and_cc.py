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


def test_cc_local_fast_path_matches_distributed(spark):
    """The r17 single-partition fast path (edge count <= _STAR_LOCAL_MAX
    runs every round/check coalesced to ONE partition, min-label rounds
    add a measured-gate broadcast hint) is a partitioning-only change:
    both CC operators must return bit-identical labels with the gate
    forced each way, including the empty and single-edge boundaries."""
    import cam_location_addressing_feature_service_etl_spark.operators.dedup as D

    # a deterministic multi-component graph with chains, a star and
    # isolated pairs — enough structure to need >1 star round
    rows = [(i, (i * 31) % 97) for i in range(200)] + [(500, 501), (600, 601)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in rows if a != b], "id_a long, id_b long"
    )
    empty = spark.createDataFrame([], "id_a long, id_b long")
    one = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    cap = D._STAR_LOCAL_MAX
    out = {}
    try:
        for mode, forced in (("local", 1 << 17), ("dist", -1)):
            D._STAR_LOCAL_MAX = forced
            out[mode] = {
                "star": sorted(map(tuple, D.connected_components_star(edges).collect())),
                "minlbl": sorted(map(tuple, D.connected_components(edges, 4).collect())),
                "star_empty": D.connected_components_star(empty).count(),
                "minlbl_empty": D.connected_components(empty, 2).count(),
                "star_one": sorted(map(tuple, D.connected_components_star(one).collect())),
            }
    finally:
        D._STAR_LOCAL_MAX = cap
    assert out["local"] == out["dist"]
    assert out["local"]["star_empty"] == 0 and out["local"]["minlbl_empty"] == 0
    assert out["local"]["star_one"] == [(1, 1), (2, 1)]
