"""Semantics tests for the round-13 DQ / mixture-planning additions:
per-user autocorrelation (ev_acf_lags), classifier calibration bins
(dq_calibration_ece), Cohen's kappa (dq_classifier_agreement_kappa),
and the token-budget epoch plan (sample_mix_epoch_plan). Parity vs
DuckDB is covered by the registry harness; these pin the MATH on
crafted inputs and the internal consistency of each output table.
"""

from __future__ import annotations

import math

import pytest

from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.llm_text import (
    _MIX_EPOCH_CAP,
    _MIX_TOKEN_BUDGET,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_acf_alternating_and_constant_series(spark, tmp_path):
    """±1 alternating series has the closed-form full-mean sample ACF
    r_k = (-1)^k (n-k)/n; constant series (zero variance) is NULL;
    users shorter than max-lag+1 are dropped."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    n = 10
    for t in range(n):  # user 1: +1, -1, +1, ...
        rows.append(
            (t, base + dt.timedelta(minutes=t), 1, "a", 1.0 if t % 2 == 0 else -1.0, "{}")
        )
    for t in range(6):  # user 2: constant
        rows.append((100 + t, base + dt.timedelta(minutes=t), 2, "a", 7.0, "{}"))
    for t in range(3):  # user 3: too short (< 4 events)
        rows.append((200 + t, base + dt.timedelta(minutes=t), 3, "a", float(t), "{}"))
    sf = _write_events(spark, tmp_path, rows)

    out = {r["user_id"]: r for r in QUERIES["ev_acf_lags"](spark, sf).collect()}
    assert set(out) == {1, 2}
    u1 = out[1]
    for k in (1, 2, 3):
        expected = ((-1) ** k) * (n - k) / n
        assert u1[f"acf_lag{k}"] == pytest.approx(expected, abs=1e-6)
    u2 = out[2]
    assert all(u2[f"acf_lag{k}"] is None for k in (1, 2, 3))


def test_acf_white_noise_near_zero(spark, tmp_path):
    """A fixed arbitrary (hash-like) series decorrelates: |r_k| well
    below 1 at every lag; the estimator stays within [-1, 1]."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    import hashlib

    vals = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
        for i in range(60)
    ]
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "a", v, "{}")
        for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    (row,) = QUERIES["ev_acf_lags"](spark, sf).collect()
    for k in (1, 2, 3):
        assert abs(row[f"acf_lag{k}"]) < 0.35
        assert -1.0 - 1e-9 <= row[f"acf_lag{k}"] <= 1.0 + 1e-9


def test_ece_bins_internally_consistent(spark):
    rows = QUERIES["dq_calibration_ece"](spark, SF_DIR).collect()
    assert rows, "no calibration bins"
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert r["n_docs"] > 0
        assert 0.0 <= r["avg_conf"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0
        # the gap column IS |avg_conf - frac_pos| up to display rounding
        assert r["abs_gap"] == pytest.approx(
            abs(r["avg_conf"] - r["frac_pos"]), abs=2e-6
        )
    # bins partition the held-out docs: every doc lands in exactly one
    total = sum(r["n_docs"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_test = docs.filter("doc_id % 5 = 0").count()
    assert total == n_test


def test_kappa_identity_holds(spark):
    (r,) = QUERIES["dq_classifier_agreement_kappa"](spark, SF_DIR).collect()
    assert r["n_docs"] > 0 and 0 <= r["n_agree"] <= r["n_docs"]
    assert r["po"] == pytest.approx(r["n_agree"] / r["n_docs"], abs=1e-6)
    assert 0.0 < r["pe"] < 1.0
    # kappa = (po - pe) / (1 - pe) up to the 6-digit display round
    assert r["kappa"] == pytest.approx(
        (r["po"] - r["pe"]) / (1.0 - r["pe"]), abs=5e-6
    )


def test_mix_epoch_plan_respects_budget_and_cap(spark):
    rows = QUERIES["sample_mix_epoch_plan"](spark, SF_DIR).collect()
    assert rows, "no sources planned"
    for r in rows:
        assert r["epochs_micro"] <= _MIX_EPOCH_CAP * 1_000_000
        # planned draw never exceeds the source quota (floor chain)
        assert r["planned_tokens"] <= r["quota_tokens"]
        # nor the capped number of passes over what exists
        assert r["planned_tokens"] <= _MIX_EPOCH_CAP * r["avail_tokens"]
        # an uncapped source consumes its quota to within one token
        if r["epochs_micro"] < _MIX_EPOCH_CAP * 1_000_000:
            assert r["planned_tokens"] >= r["quota_tokens"] - math.ceil(
                r["avail_tokens"] / 1_000_000
            ) - 1
    assert sum(r["quota_tokens"] for r in rows) <= _MIX_TOKEN_BUDGET


def test_constraint_suite_rules_and_outcomes(spark):
    rows = {r["rule"]: r for r in QUERIES["dq_constraint_suite"](spark, SF_DIR).collect()}
    assert set(rows) == {
        "orders_orderkey_unique",
        "orders_totalprice_positive",
        "orders_orderdate_in_window",
        "orders_status_domain",
        "orders_custkey_fk_customer",
        "customer_custkey_unique",
    }
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    for name, r in rows.items():
        expected_n = n_orders if name.startswith("orders") else None
        if expected_n is not None:
            assert r["n_checked"] == expected_n
        assert r["passed"] == (r["n_violations"] == 0)
    # the date-window rule is the designed failure on this data
    assert not rows["orders_orderdate_in_window"]["passed"]
    assert rows["orders_orderkey_unique"]["passed"]
    assert rows["orders_custkey_fk_customer"]["passed"]
