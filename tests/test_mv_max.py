"""The MAX-maintenance view: the heap path must agree with the true
max wherever it was used, and the fixture must exercise BOTH paths
(heap-served and targeted-recompute) or the design claim is vacuous.
Includes a crafted micro-case proving the heap actually serves a
deletion of the current max without touching base."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mv_max_both_paths_and_heap_agreement(spark):
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["mv_max_maintenance_targeted"](spark, SF_SMOKE).collect()
    assert rows
    served = [r for r in rows if not r["recomputed"]]
    assert served, "no key served from the heap — claim vacuous"
    # the smoke corpus may or may not exhaust a heap; the crafted case
    # below pins the recompute path deterministically either way
    # heap-path agreement: rebuild the maintained value independently
    from cam_location_addressing_feature_service_etl_spark.tables import load

    events = load(spark, SF_SMOKE, "events")
    v = F.floor(F.col("value") * 100 + 0.5).cast("long")
    eff = (
        events.filter(
            ((F.col("event_id") % 10 < 8) & (F.col("event_id") % 7 != 0))
            | (F.col("event_id") % 10 >= 8)
        )
        .groupBy("user_id")
        .agg(F.max(v).alias("truth"))
    )
    truth = {r["user_id"]: r["truth"] for r in eff.collect()}
    for r in rows:
        assert r["max_centi"] == truth[r["user_id"]], r


def test_mv_max_heap_serves_deleted_max_and_recomputes_when_exhausted(spark):
    """Crafted multiset case: user 1 loses its max (heap rank-2 value
    serves, no recompute); user 2 loses BOTH top-2 distinct values
    entirely (recompute flag); user 3 deletes one instance of a
    duplicated max (the other instance survives the multiset count)."""
    import pandas as pd

    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        mv_max_maintenance_targeted,
    )

    # schema mirrors events: event_id drives base/delete/insert splits
    # base rows: event_id % 10 < 8, deleted when % 7 == 0
    rows = [
        # user 1: values 500 (deleted), 400, 300 → heap {500,400}, 500
        # gone, 400 serves
        (7, 1, 5.00),   # base, deleted (7%7==0)
        (1, 1, 4.00),   # base
        (2, 1, 3.00),   # base
        # user 2: 900 (del), 800 (del), 100 → both heap values gone →
        # recompute → 100
        (14, 2, 9.00),  # deleted
        (21, 2, 8.00),  # deleted
        (3, 2, 1.00),   # base
        # user 3: 600 twice, one instance deleted → multiset count
        # keeps 600 in the heap
        (28, 3, 6.00),  # deleted instance
        (4, 3, 6.00),   # surviving instance
        (5, 3, 2.00),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "value"])
    pdf["ts"] = pd.to_datetime("2024-01-01")
    pdf["event_type"] = "t"
    pdf["props"] = "{}"
    df = spark.createDataFrame(pdf)

    import cam_location_addressing_feature_service_etl_spark.workload.events as ev

    orig = ev._events
    ev._events = lambda _s, _d: df
    try:
        out = {
            r["user_id"]: (r["max_centi"], r["recomputed"])
            for r in mv_max_maintenance_targeted(spark, "ignored").collect()
        }
    finally:
        ev._events = orig
    assert out == {1: (400, False), 2: (100, True), 3: (600, False)}
