"""Crafted-frame semantics tests for the temporal tranche: grid
resample + forward fill, rolling lower-median/MAD outlier flags, and
the bucketized interval-overlap join — each pointed at a tmp-dir
events.parquet so boundary behavior (gap fills, window support guard,
hour-edge overlap) is pinned exactly, independent of the DuckDB
parity sweep."""

from __future__ import annotations

from datetime import datetime

from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from tests.conftest import SF_SMOKE

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [
            (i, ts, uid, etype, val, "{}")
            for i, (ts, uid, etype, val) in enumerate(rows)
        ],
        _SCHEMA,
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _t(day, h=0, m=0, s=0):
    return datetime(2024, 1, day, h, m, s)


def test_gapfill_semantics_crafted(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # user 1: purchases day 1 (10.0) and day 4 (2.5 + 2.5)
            (_t(1, 9), 1, "purchase", 10.0),
            (_t(4, 9), 1, "purchase", 2.5),
            (_t(4, 10), 1, "purchase", 2.5),
            # user 2: a single purchase day -> 1-row grid, no fills
            (_t(2, 12), 2, "purchase", 7.0),
            # non-purchase noise must not extend any grid
            (_t(9, 1), 1, "click", 99.0),
            (_t(9, 1), 2, "error", 99.0),
        ],
    )
    got = {
        (r["user_id"], r["grid_day"], r["filled_value"], r["observed"])
        for r in QUERIES["ev_gapfill_forward"](spark, sf).collect()
    }
    assert got == {
        (1, "2024-01-01", 10.0, True),
        (1, "2024-01-02", 10.0, False),
        (1, "2024-01-03", 10.0, False),
        (1, "2024-01-04", 5.0, True),
        (2, "2024-01-02", 7.0, True),
    }


def test_gapfill_grid_contiguous_at_smoke(spark):
    rows = QUERIES["ev_gapfill_forward"](spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user, "smoke data produced no grid rows"
    for days in by_user.values():
        days.sort(key=lambda r: r["grid_day"])
        # contiguous: n rows spanning exactly (last - first) days
        first = datetime.strptime(days[0]["grid_day"], "%Y-%m-%d")
        last = datetime.strptime(days[-1]["grid_day"], "%Y-%m-%d")
        assert (last - first).days == len(days) - 1
        assert len({r["grid_day"] for r in days}) == len(days)
        # the grid starts and ends on observations (never extrapolates)
        assert days[0]["observed"] and days[-1]["observed"]
        # every filled row carries the previous row's value
        for prev, cur in zip(days, days[1:]):
            if not cur["observed"]:
                assert cur["filled_value"] == prev["filled_value"]


def test_rolling_mad_crafted_flags(spark, tmp_path):
    # user 1: flat 10s then a spike -> MAD 0, spike flagged only once
    # the window holds >= 5 observations; user 2: linear ramp then a
    # spike -> nonzero MAD, lower-median semantics pinned exactly.
    rows = []
    for d, v in enumerate([10.0, 10.0, 10.0, 10.0, 10.0, 1000.0], start=1):
        rows.append((_t(d, 12), 1, "view", v))
    for d, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0, 200.0], start=1):
        rows.append((_t(d, 12), 2, "view", v))
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["obs_day"]): r
        for r in QUERIES["ev_rolling_mad_outliers"](spark, sf).collect()
    }
    spike1 = got[(1, "2024-01-06")]
    assert (spike1["n_window"], spike1["med_value"], spike1["mad_value"]) == (6, 10.0, 0.0)
    assert spike1["is_outlier"]
    # day 5 (n=5, all flat): guard satisfied but deviation 0 -> no flag
    assert not got[(1, "2024-01-05")]["is_outlier"]
    # day 4 (n=4): support guard blocks the flag regardless of values
    assert not got[(1, "2024-01-04")]["is_outlier"]
    spike2 = got[(2, "2024-01-06")]
    # sorted [10,20,30,40,50,200]: lower median idx ceil(6/2)=3 -> 30;
    # |x-30| sorted [0,10,10,20,20,170] -> mad 10; |200-30| > 3*10
    assert (spike2["med_value"], spike2["mad_value"]) == (30.0, 10.0)
    assert spike2["is_outlier"]
    # day 5 for user 2: med 30, mad 10, |50-30| = 20 <= 30 -> no flag
    day5 = got[(2, "2024-01-05")]
    assert (day5["med_value"], day5["mad_value"]) == (30.0, 10.0)
    assert not day5["is_outlier"]
    # only the two spikes fire across the whole frame
    assert {k for k, r in got.items() if r["is_outlier"]} == {
        (1, "2024-01-06"),
        (2, "2024-01-06"),
    }


def test_rolling_mad_range_frame_not_rows(spark, tmp_path):
    # 7-DAY trailing window, not 7-ROW: an observation 10 days after
    # the previous one sees only itself (a ROWS frame would wrongly
    # include the stale day and n would be 2)
    sf = _write_events(
        spark,
        tmp_path,
        [(_t(1, 12), 1, "view", 10.0), (_t(11, 12), 1, "view", 500.0)],
    )
    got = {
        r["obs_day"]: r
        for r in QUERIES["ev_rolling_mad_outliers"](spark, sf).collect()
    }
    assert got["2024-01-11"]["n_window"] == 1
    assert got["2024-01-11"]["med_value"] == 500.0
    assert not got["2024-01-11"]["is_outlier"]


def test_interval_overlap_crafted_boundaries(spark, tmp_path):
    rows = []
    # user 1: one session 10:00 -> 11:05 (gaps <= 30 min), covers
    # hour buckets 10 and 11
    for hh, mm in [(10, 0), (10, 20), (10, 40), (11, 5)]:
        rows.append((_t(1, hh, mm), 1, "click", 1.0))
    # user 2: single event exactly on the hour edge 12:00:00 -> the
    # degenerate [12:00, 12:00] session still overlaps [12:00, 13:00)
    rows.append((_t(1, 12, 0, 0), 2, "click", 1.0))
    # user 3: session inside hour 11 only (hour 11 is NOT an incident)
    rows.append((_t(1, 11, 30), 3, "click", 1.0))
    # error load from a dedicated user: 5 in hour 10 (incident), 4 in
    # hour 11 (below threshold), 6 in hour 12 (incident); >30-min gaps
    # split user 99 into one session per hour
    for m in range(5):
        rows.append((_t(1, 10, 1 + m), 99, "error", 0.0))
    for m in range(4):
        rows.append((_t(1, 11, 1 + m), 99, "error", 0.0))
    for m in range(6):
        rows.append((_t(1, 12, 1 + m), 99, "error", 0.0))
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r["user_id"], r["session_start"], r["n_incident_hours"], r["errors_during"])
        for r in QUERIES["ev_interval_overlap_join"](spark, sf).collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00", 1, 5),  # hour 10 only; hour 11 below K
        (2, "2024-01-01 12:00:00", 1, 6),  # hour-edge degenerate session
        (99, "2024-01-01 10:01:00", 1, 5),  # the error bursts sessionize too
        (99, "2024-01-01 12:01:00", 1, 6),
        # user 3 and u99's hour-11 session overlap no incident -> absent
    }
