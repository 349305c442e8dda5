"""Fellegi–Sunter EM training: the generated two-engine float program
matches an independent numpy EM run on the same pattern counts, the
trained parameters separate the near-identity field (the learned
signal), and the expression layers are numerically safe on degenerate
counts."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from cam_location_addressing_feature_service_etl_spark.workload.geo import (
    _FS_EM_INIT,
    _FS_EM_ROUNDS,
    _fs_em_layers,
    _fs_gammas,
)

from tests.conftest import SF_SMOKE


def _numpy_em(counts, rounds, init):
    p0, m0, u0 = init
    p, m, u = p0, np.full(3, m0), np.full(3, u0)
    n = np.asarray(counts, dtype=float)
    bits = np.array([[(k >> (2 - i)) & 1 for i in range(3)] for k in range(8)])
    for _ in range(rounds):
        pm = p * np.prod(np.where(bits, m, 1 - m), axis=1)
        pu = (1 - p) * np.prod(np.where(bits, u, 1 - u), axis=1)
        w = pm / (pm + pu)
        sw, sl = (n * w).sum(), (n * (1 - w)).sum()
        m = (n * w) @ bits / sw
        u = (n * (1 - w)) @ bits / sl
        p = sw / (sw + sl)
    return p, m, u


def test_em_query_matches_numpy_reference(spark):
    gammas = _fs_gammas(spark, SF_SMOKE)
    counts = [0] * 8
    for r in gammas.groupBy("a_first", "a_last", "a_close").count().collect():
        k = (r["a_first"] << 2) | (r["a_last"] << 1) | r["a_close"]
        counts[k] = r["count"]
    p, m, u = _numpy_em(counts, _FS_EM_ROUNDS, _FS_EM_INIT)

    row = QUERIES["er_fs_em_train"](spark, SF_SMOKE).collect()[0]
    assert row["n_pairs"] == sum(counts) > 0
    assert abs(row["p_match"] - round(float(p), 6)) < 2e-6
    for i, f in enumerate(("first", "last", "close")):
        assert abs(row[f"m_{f}"] - round(float(m[i]), 6)) < 2e-6, f
        assert abs(row[f"u_{f}"] - round(float(u[i]), 6)) < 2e-6, f
    # the learned signal: the near-identity field separates match from
    # non-match sharply even under blocked candidacy
    assert row["m_close"] > row["u_close"] + 0.3
    assert 0.0 < row["p_match"] < 1.0


def test_em_layers_reference_only_prior_names(spark):
    """Every generated expression references only n0..n7 and names
    defined in EARLIER layers — the property that lets one generator
    drive both a selectExpr chain and a CTE chain."""
    import re

    defined = {f"n{k}" for k in range(8)}
    for layer in _fs_em_layers():
        layer_names = [nm for nm, _ in layer]
        for nm, expr in layer:
            for ref in re.findall(r"[a-z]+\d*_\d+|n\d", expr):
                assert ref in defined, (nm, ref)
        defined.update(layer_names)


def test_decision_rule_is_the_fs_optimal_rule(spark):
    """The decision table is Fellegi–Sunter's theorem-1 rule: ordered
    by likelihood ratio the decisions form contiguous link / clerical /
    non_link bands; every link row's cumulative u-mass respects μ and
    every non_link row's cumulative m-mass respects λ; both cuts are
    MAXIMAL (the first clerical row violates the corresponding bound);
    and the expected matched+unmatched accounting totals n_pairs."""
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _FS_LAMBDA_Q,
        _FS_MU_Q,
        _FS_Q,
    )

    rows = QUERIES["er_fs_decision_rule"](spark, SF_SMOKE).collect()
    assert len(rows) == 8
    assert {r["pattern"] for r in rows} == set(range(8))
    mu, lam = _FS_MU_Q / _FS_Q, _FS_LAMBDA_Q / _FS_Q
    ordered = sorted(rows, key=lambda r: (-r["lr"], r["pattern"]))
    decisions = [r["decision"] for r in ordered]
    assert set(decisions) == {"link", "clerical", "non_link"}  # non-vacuous
    # contiguous bands in ratio order
    import itertools

    bands = [k for k, _ in itertools.groupby(decisions)]
    assert bands == ["link", "clerical", "non_link"]
    for r in rows:
        if r["decision"] == "link":
            assert r["u_cum"] <= mu + 1e-9
        if r["decision"] == "non_link":
            assert r["m_cum"] <= lam + 1e-9
    # maximality: the rows adjacent to each cut violate the bounds
    first_clerical = next(r for r in ordered if r["decision"] == "clerical")
    assert first_clerical["u_cum"] > mu
    last_clerical = next(
        r for r in reversed(ordered) if r["decision"] == "clerical"
    )
    assert last_clerical["m_cum"] > lam
    # expected-error accounting: the per-pattern expectations total the
    # pair count (Σ_k m_k = Σ_k u_k = 1)
    n_pairs = sum(r["n"] for r in rows)
    total = sum(r["exp_matched"] + r["exp_unmatched"] for r in rows)
    assert abs(total - n_pairs) < 0.01
    # the count-bearing patterns' ratio ordering matches the trained
    # parameters' implied ordering (sanity: full agreement ranks first)
    assert ordered[0]["a_first"] or ordered[0]["a_last"]


def test_decision_apply_tags_every_candidate_pair(spark):
    """The pair-level apply: every gamma pair appears exactly once,
    tagged with its pattern's decision from the 8-row table, and the
    count-bearing decisions are non-vacuous."""
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _fs_gammas,
    )

    pairs = QUERIES["er_fs_decision_apply"](spark, SF_SMOKE).collect()
    n_gammas = _fs_gammas(spark, SF_SMOKE).count()
    assert len(pairs) == n_gammas > 0
    table = {
        r["pattern"]: r["decision"]
        for r in QUERIES["er_fs_decision_rule"](spark, SF_SMOKE).collect()
    }
    assert all(r["decision"] == table[r["pattern"]] for r in pairs)
    decisions = {r["decision"] for r in pairs}
    assert "link" in decisions and "non_link" in decisions
