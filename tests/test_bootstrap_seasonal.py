"""Semantics tests for a15_bootstrap_poisson_ci and
ev_seasonal_baseline_zscore (parity vs DuckDB is covered by the
registry harness; these pin the statistics on crafted inputs)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    (r1,) = QUERIES["a15_bootstrap_poisson_ci"](spark, SF_DIR).collect()
    (r2,) = QUERIES["a15_bootstrap_poisson_ci"](spark, SF_DIR).collect()
    assert tuple(r1) == tuple(r2)  # hash-derived weights: no RNG
    assert r1["boot_lo"] <= r1["point_mean"] <= r1["boot_hi"]
    assert r1["boot_lo"] < r1["boot_hi"]
    docs = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert r1["n_rows"] == docs.count()
    # the bootstrap SE of a mean of n values scales ~ sd/sqrt(n):
    # interval half-width should be within an order of magnitude of it
    stats = docs.selectExpr(
        "avg(value) m", "stddev_pop(value) sd", "count(*) n"
    ).collect()[0]
    se = stats["sd"] / math.sqrt(stats["n"])
    half = (r1["boot_hi"] - r1["boot_lo"]) / 2.0
    assert 0.5 * se < half < 6.0 * se
    assert r1["point_mean"] == pytest.approx(stats["m"], abs=1e-3)


def test_seasonal_zscore_flags_injected_spike_only(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 9, 0, 0)  # everything in hour 9
    rows = []
    # 40 calm clicks around 10.0 with real variance
    for i in range(40):
        rows.append(
            (i, base + dt.timedelta(seconds=i), 1, "click", 10.0 + (i % 5) * 0.5, "{}")
        )
    rows.append((99, base + dt.timedelta(seconds=99), 1, "click", 500.0, "{}"))
    # a constant-valued cell must be excluded (zero variance), not crash
    for i in range(5):
        rows.append((200 + i, base + dt.timedelta(seconds=i), 2, "view", 7.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["ev_seasonal_baseline_zscore"](spark, sf).collect()
    assert [r["event_id"] for r in out] == [99]
    r = out[0]
    assert r["event_type"] == "click" and r["hod"] == 9
    # recompute z with numpy-free exact math
    vals = [10.0 + (i % 5) * 0.5 for i in range(40)] + [500.0]
    n = len(vals)
    mean = sum(vals) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / n)
    assert r["z"] == pytest.approx((500.0 - mean) / sd, abs=1e-4)


def test_seasonal_zscore_quiet_on_uniform_noise(spark, tmp_path):
    import hashlib

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=i),
            1,
            "click",
            # uniform noise: max |z| for U(0,1) is ~sqrt(3) < 3
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 0xFFFFFFFF,
            "{}",
        )
        for i in range(100)
    ]
    sf = _write_events(spark, tmp_path, rows)
    assert QUERIES["ev_seasonal_baseline_zscore"](spark, sf).count() == 0
