"""applyInPandasWithState exercised across MULTIPLE micro-batches:
two copies of the events file with maxFilesPerTrigger=1 force two
batches; state must accumulate (second emission = 2× the first)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.events import (
    EVENTS_FILE_SCHEMA,
)
from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
    running_user_totals,
)

from tests.conftest import SF_SMOKE


def test_state_accumulates_across_batches(spark, tmp_path):
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

    q = (
        running_user_totals(events)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update-mode memory sink appends each batch's emissions: per user
    # the max n_events must be exactly 2x the single-file count.
    got = (
        spark.table("user_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"))
        .collect()
    )
    single = {
        r["user_id"]: r["cnt"]
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(got) == len(single) > 0
    for r in got:
        assert r["n"] == 2 * single[r["user_id"]], r["user_id"]


def _mad_rows(spark, in_dir, split: bool, name: str):
    from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
        rolling_mad_state,
    )

    reader = spark.readStream
    if split:
        reader = reader.option("maxFilesPerTrigger", 1)
    schema = spark.read.parquet(str(in_dir)).schema
    stream = reader.schema(schema).format("parquet").load(str(in_dir))
    q = (
        rolling_mad_state(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    final = {}
    for r in spark.table(name).collect():
        k = (r["user_id"], r["obs_day"])
        if k not in final or r["upd_seq"] > final[k]["upd_seq"]:
            final[k] = r
    return {
        k: (r["n_window"], r["day_value"], r["med_value"], r["mad_value"], r["is_outlier"])
        for k, r in final.items()
    }


def test_rolling_mad_streaming_reconciles_with_batch(spark, tmp_path):
    """Late-data replay: a third file carries an event for an EARLIER
    day, so the stateful operator must re-emit every day whose
    trailing window that late day sits in. Finals (max upd_seq per
    user-day) must equal the batch query on the combined file,
    split-batch or not — exact equality, no tolerance (all stats are
    integer micro-unit arithmetic on both legs)."""
    import os
    from datetime import datetime

    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )

    def _mk(rows, start_id):
        return spark.createDataFrame(
            [
                (start_id + i, datetime(2024, 1, d, 12), uid, "view", v, "{}")
                for i, (d, uid, v) in enumerate(rows)
            ],
            schema,
        )

    f1 = [(d, 1, 10.0) for d in range(1, 5)] + [(d, 2, 10.0 * d) for d in range(1, 4)]
    f2 = [(5, 1, 10.0), (6, 1, 1000.0)] + [(4, 2, 40.0), (5, 2, 50.0), (6, 2, 200.0)]
    f3 = [(3, 1, 5.0)]  # LATE: lands in closed day 3, re-flags days 3..6
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    for i, rows in enumerate([f1, f2, f3]):
        _mk(rows, 1000 * i).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"part{i}")
        )
        src = next(
            p for p in os.listdir(tmp_path / f"part{i}") if p.endswith(".parquet")
        )
        dst = in_dir / f"b{i}.parquet"
        os.rename(tmp_path / f"part{i}" / src, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    batch_dir = tmp_path / "batch_sf"
    batch_dir.mkdir()
    spark.read.parquet(str(in_dir)).coalesce(1).write.parquet(
        str(batch_dir / "events.parquet")
    )
    expect = {
        (r["user_id"], r["obs_day"]): (
            r["n_window"],
            r["day_value"],
            r["med_value"],
            r["mad_value"],
            r["is_outlier"],
        )
        for r in QUERIES["ev_rolling_mad_outliers"](spark, str(batch_dir)).collect()
    }

    split = _mad_rows(spark, in_dir, split=True, name="mad_split")
    whole = _mad_rows(spark, in_dir, split=False, name="mad_whole")
    assert split == expect
    assert whole == expect
    # the late day actually changed something: day 3's value includes it
    assert split[(1, "2024-01-03")][1] == 15.0
    # and the spike still flags
    assert split[(1, "2024-01-06")][4] is True


def test_rolling_mad_state_eviction_bounds_history():
    """lateness_days eviction: after each batch, state retains at most
    the last lateness + W days (ADVICE r8: NoTimeout + no eviction grew
    state forever). Recent-day emissions must be unchanged by eviction
    — only days that can no longer enter any recomputable window go."""
    import pandas as pd

    from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
        _update_rolling_mad_impl,
    )
    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _MAD_WINDOW_DAYS,
    )

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    lateness = 2

    def run(lateness_days):
        st = _FakeState()
        emitted = {}
        for start in (0, 60, 120):  # three far-apart batches of 30 days
            pdf = pd.DataFrame(
                {"di": range(start, start + 30), "value": [10.0] * 30}
            )
            for out in _update_rolling_mad_impl(
                (1,), iter([pdf]), st, lateness_days
            ):
                for r in out.itertuples():
                    emitted[r.obs_day] = (r.n_window, r.med_value, r.is_outlier)
        return st._v, emitted

    (days_e, _, _), emit_e = run(lateness)
    (days_n, _, _), emit_n = run(None)

    assert len(days_n) == 90  # unbounded mode keeps everything
    assert len(days_e) <= lateness + _MAD_WINDOW_DAYS
    assert max(days_e) == max(days_n) == 149
    # eviction never changes what was emitted
    assert emit_e == emit_n


def test_rolling_mad_lateness_enforces_watermark(spark, tmp_path):
    """With lateness_days set, the operator applies its own watermark
    (review-pass catch: eviction without the paired watermark lets a
    straggler recompute against already-evicted history). A day-3
    event arriving after day 6 with lateness 2d must be DROPPED: day 3
    keeps its original value instead of folding the straggler in."""
    import os
    from datetime import datetime

    from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
        rolling_mad_state,
    )

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )

    def _mk(rows, start_id):
        return spark.createDataFrame(
            [
                (start_id + i, datetime(2024, 1, d, 12), uid, "view", v, "{}")
                for i, (d, uid, v) in enumerate(rows)
            ],
            schema,
        )

    f1 = [(d, 1, 10.0) for d in range(1, 5)]
    f2 = [(5, 1, 10.0), (6, 1, 1000.0)]
    f3 = [(3, 1, 5.0)]  # straggler: beyond the 2-day lateness at day 6
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    for i, rows in enumerate([f1, f2, f3]):
        _mk(rows, 1000 * i).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"part{i}")
        )
        src = next(
            p for p in os.listdir(tmp_path / f"part{i}") if p.endswith(".parquet")
        )
        dst = in_dir / f"b{i}.parquet"
        os.rename(tmp_path / f"part{i}" / src, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(spark.read.parquet(str(in_dir)).schema)
        .format("parquet")
        .load(str(in_dir))
    )
    q = (
        rolling_mad_state(stream, lateness_days=2)
        .writeStream.format("memory")
        .queryName("mad_wm")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    final = {}
    for r in spark.table("mad_wm").collect():
        k = (r["user_id"], r["obs_day"])
        if k not in final or r["upd_seq"] > final[k]["upd_seq"]:
            final[k] = r
    # the straggler was dropped: day 3 keeps 10.0, and no day-3 re-emit
    # happened after the f2 batch
    assert final[(1, "2024-01-03")]["day_value"] == 10.0


def test_rolling_mad_default_is_bounded():
    """r9 VERDICT nit: a naive rolling_mad_state caller must get
    bounded per-user state without passing anything. The default is
    DEFAULT_MAD_LATENESS_DAYS (not None), and driving the state fn
    with three far-apart 30-day batches under that default retains at
    most default + W days."""
    import inspect

    import pandas as pd

    from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
        DEFAULT_MAD_LATENESS_DAYS,
        _update_rolling_mad_impl,
        rolling_mad_state,
    )
    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _MAD_WINDOW_DAYS,
    )

    default = inspect.signature(rolling_mad_state).parameters["lateness_days"].default
    assert default == DEFAULT_MAD_LATENESS_DAYS
    assert default is not None and default > 0

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    st = _FakeState()
    for start in (0, 60, 120):
        pdf = pd.DataFrame({"di": range(start, start + 30), "value": [10.0] * 30})
        for _ in _update_rolling_mad_impl((1,), iter([pdf]), st, default):
            pass
    days, _, _ = st._v
    assert len(days) <= default + _MAD_WINDOW_DAYS
    assert max(days) == 149


def test_rolling_mad_gate_is_per_user_not_global(spark, tmp_path):
    """ADVICE r9: pin the straggler-gate semantics with two users
    advancing at different rates. The gate keys off each user's OWN
    pre-batch max day, not the engine's global watermark, so it is
    MORE permissive for slow users: user 2 (stalled at day 4) accepts
    a day-3 backfill that the global watermark (day 10 - 2 = day 8,
    set by fast user 1) would have dropped, while user 1's own day-3
    straggler (beyond 10 - 2) is rejected in the same micro-batch."""
    import os
    from datetime import datetime

    from cam_location_addressing_feature_service_etl_spark.streaming.stateful import (
        rolling_mad_state,
    )

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )

    def _mk(rows, start_id):
        return spark.createDataFrame(
            [
                (start_id + i, datetime(2024, 1, d, 12), uid, "view", v, "{}")
                for i, (d, uid, v) in enumerate(rows)
            ],
            schema,
        )

    f1 = [(d, 1, 10.0) for d in range(1, 9)] + [(d, 2, 20.0) for d in (1, 2, 4)]
    f2 = [(9, 1, 10.0), (10, 1, 10.0)]
    # same batch, one straggler per user: user 1's day 3 is late vs its
    # own max (10 - 2 = 8 > 3) -> dropped; user 2's day 3 is on-time vs
    # its own max (4 - 2 = 2 <= 3) -> admitted, though the GLOBAL
    # watermark (day 8) already passed it.
    f3 = [(3, 1, 5.0), (3, 2, 7.0)]
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    for i, rows in enumerate([f1, f2, f3]):
        _mk(rows, 1000 * i).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"part{i}")
        )
        src = next(
            p for p in os.listdir(tmp_path / f"part{i}") if p.endswith(".parquet")
        )
        dst = in_dir / f"b{i}.parquet"
        os.rename(tmp_path / f"part{i}" / src, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(spark.read.parquet(str(in_dir)).schema)
        .format("parquet")
        .load(str(in_dir))
    )
    q = (
        rolling_mad_state(stream, lateness_days=2)
        .writeStream.format("memory")
        .queryName("mad_two_users")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    final = {}
    for r in spark.table("mad_two_users").collect():
        k = (r["user_id"], r["obs_day"])
        if k not in final or r["upd_seq"] > final[k]["upd_seq"]:
            final[k] = r
    # fast user's straggler dropped: day 3 keeps its original 10.0
    assert final[(1, "2024-01-03")]["day_value"] == 10.0
    # slow user's backfill admitted: day 3 appears with the late value
    assert final[(2, "2024-01-03")]["day_value"] == 7.0
