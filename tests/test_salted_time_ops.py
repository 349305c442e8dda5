"""Skew-hardened time-salted operators must be value-identical to
their unsalted oracle-checked twins — verified on the real events
table AND on a hot-key fixture (one user owning 100k events, the shape
that breaks single-partition windows at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cam_location_addressing_feature_service_etl_spark.operators.asof import (
    merge_asof,
    merge_asof_salted,
)
from cam_location_addressing_feature_service_etl_spark.operators.sessionize import (
    sessionize_time_salted,
)
from cam_location_addressing_feature_service_etl_spark.tables import load

from tests.conftest import SF_SMOKE

_GAP_MS = 30 * 60_000


def _unsalted_session_idx(events):
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_sum = w_lag.rowsBetween(Window.unboundedPreceding, 0)
    return (
        events.withColumn("prev_ts", F.lag("ts").over(w_lag))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (F.unix_millis("ts") - F.unix_millis("prev_ts") > _GAP_MS),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new_session").over(w_sum))
        .select("event_id", "user_id", "session_idx")
    )


def _hot_key_events(spark, n_hot: int = 100_000, n_cold_users: int = 20):
    """Deterministic skewed fixture: user 0 fires n_hot events whose
    gaps alternate (via hash parity) between 1 min (same session) and
    45 min (session break); 20 cold users get 50 events each."""
    hot = spark.range(n_hot).select(
        F.col("id").alias("event_id"),
        F.lit(0).alias("user_id"),
        F.timestamp_millis(
            (
                F.sum(
                    F.when(F.pmod(F.hash("id"), 10) < 8, 60_000).otherwise(
                        45 * 60_000
                    )
                ).over(
                    Window.orderBy("id").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                )
            )
            + 1_700_000_000_000
        ).alias("ts"),
        (F.pmod(F.hash("id"), 100) / 10.0).alias("value"),
        F.when(F.pmod(F.hash("id"), 3) == 0, "click")
        .when(F.pmod(F.hash("id"), 3) == 1, "purchase")
        .otherwise("view")
        .alias("event_type"),
    )
    cold = spark.range(n_cold_users * 50).select(
        (F.col("id") + 10_000_000).alias("event_id"),
        (F.pmod(F.col("id"), n_cold_users) + 1).alias("user_id"),
        F.timestamp_millis(
            F.col("id") * 137_000 + 1_700_000_000_000
        ).alias("ts"),
        (F.pmod(F.hash("id"), 100) / 10.0).alias("value"),
        F.when(F.pmod(F.hash("id"), 3) == 0, "click")
        .when(F.pmod(F.hash("id"), 3) == 1, "purchase")
        .otherwise("view")
        .alias("event_type"),
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def hot_events(spark):
    df = _hot_key_events(spark).persist()
    df.count()
    yield df
    df.unpersist()


def test_salted_sessionize_matches_unsalted_on_real_table(spark):
    events = load(spark, SF_SMOKE, "events")
    expected = _unsalted_session_idx(events)
    got = sessionize_time_salted(events).select(
        "event_id", "user_id", "session_idx"
    )
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_salted_sessionize_matches_unsalted_on_hot_key(hot_events):
    expected = _unsalted_session_idx(hot_events)
    # bucket of 2h over ~4-day hot timeline → the hot user's history
    # spans dozens of partitions instead of one
    got = sessionize_time_salted(hot_events, bucket_ms=2 * 3_600_000).select(
        "event_id", "user_id", "session_idx"
    )
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def _asof_both(events, salted_bucket_ms=None):
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    kw = dict(
        on="user_id", left_ts="ts", right_ts="ts",
        right_seq="event_id", payload=["value"],
    )
    if salted_bucket_ms is None:
        return merge_asof(clicks, purchases, **kw)
    return merge_asof_salted(clicks, purchases, bucket_ms=salted_bucket_ms, **kw)


def test_salted_asof_matches_unsalted_on_real_table(spark):
    events = load(spark, SF_SMOKE, "events")
    expected = _asof_both(events)
    got = _asof_both(events, salted_bucket_ms=3_600_000)
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_salted_asof_matches_unsalted_on_hot_key(hot_events):
    expected = _asof_both(hot_events)
    got = _asof_both(hot_events, salted_bucket_ms=2 * 3_600_000)
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_salted_asof_carry_crosses_empty_buckets(spark):
    # purchase at t0, click 10 buckets later with nothing in between:
    # the carry-in must propagate across the empty buckets
    base = 1_700_000_000_000
    clicks = spark.createDataFrame(
        [(1, 7, base + 10 * 3_600_000)], "event_id long, user_id long, ms long"
    ).select("event_id", "user_id", F.timestamp_millis("ms").alias("ts"))
    purchases = spark.createDataFrame(
        [(2, 7, base, 42.0)], "event_id long, user_id long, ms long, value double"
    ).select(
        "event_id", "user_id", F.timestamp_millis("ms").alias("ts"), "value"
    )
    got = merge_asof_salted(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_seq="event_id", payload=["value"], bucket_ms=3_600_000,
    ).collect()
    assert len(got) == 1 and got[0]["asof_value"] == 42.0
