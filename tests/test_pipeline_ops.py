"""Invariant tests for the round-2 training-pipeline operators
(sequence packing, sampling, quantization, funnel, audio framing,
repetition rule). Parity with the DuckDB oracle is covered by
tests/test_parity.py; these check the *semantic* invariants the
oracle comparison can't express (monotonicity, span contiguity,
determinism across runs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

from .conftest import SF_SMOKE


def test_pack_sequences_spans_are_contiguous_per_source(spark):
    rows = (
        QUERIES["text_pack_sequences"](spark, SF_SMOKE)
        .orderBy("source", "doc_id")
        .collect()
    )
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        offset = 0
        for r in docs:
            assert r.start_offset == offset, "packing must leave no gaps"
            assert r.first_block <= r.last_block
            assert r.first_block == r.start_offset // 256
            offset += r.n_tokens


def test_funnel_counts_are_monotone(spark):
    row = QUERIES["ev_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert row.n_viewed >= row.n_clicked_after >= row.n_purchased_after >= 0


def test_stratified_sample_caps_each_stratum_and_is_deterministic(spark):
    q = QUERIES["sample_stratified_hash"]
    first = q(spark, SF_SMOKE).collect()
    per_lang = {}
    for r in first:
        per_lang[r.lang] = max(per_lang.get(r.lang, 0), r.sample_rank)
    assert per_lang and all(v <= 40 for v in per_lang.values())
    second = q(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_quantize_int8_bounds_and_determinism(spark):
    q = QUERIES["sim_embedding_quantize_int8"]
    rows = q(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_dims == 64
        assert r.vmin <= r.vmax
        assert len(r.code_hash) == 32
    again = {r.vec_id: r.code_hash for r in q(spark, SF_SMOKE).collect()}
    assert all(again[r.vec_id] == r.code_hash for r in rows)


def test_audio_framing_arithmetic(spark):
    rows = QUERIES["mm_audio_frame_plan"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.sample_rate in (8000, 12000, 16000)
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate
        expected_windows = max((r.n_samples - 400) // 160 + 1, 0)
        assert r.n_windows == expected_windows


def test_repetition_rule_flags_constructed_degenerate_doc(spark):
    # invariants on real data: ratios bounded, flag consistent with them
    df = QUERIES["text_repetition_ratio"](spark, SF_SMOKE)
    bad = df.filter(
        (F.col("dup_trigram_ratio") < 0) | (F.col("dup_trigram_ratio") > 1)
        | (F.col("distinct_token_ratio") < 0) | (F.col("distinct_token_ratio") > 1)
        | (
            F.col("flagged")
            != (
                (F.col("dup_trigram_ratio") > 0.2)
                | (F.col("distinct_token_ratio") < 0.5)
            )
        )
    ).count()
    assert bad == 0


def test_semantic_dedup_canonicals_never_pruned(spark):
    df = QUERIES["dedup_semantic_embedding"](spark, SF_SMOKE)
    assert df.filter((F.col("vec_id") == F.col("canonical_id")) & F.col("pruned")).count() == 0
    # every bucket's canonical is its min member
    bad = (
        df.groupBy("bucket")
        .agg(F.min("vec_id").alias("lo"), F.first("canonical_id").alias("canon"))
        .filter(F.col("lo") != F.col("canon"))
        .count()
    )
    assert bad == 0


def test_transitions_conserve_event_pairs(spark):
    from cam_location_addressing_feature_service_etl_spark.tables import load

    n_events = load(spark, SF_SMOKE, "events").count()
    n_users = load(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    total_transitions = (
        QUERIES["ev_event_transitions"](spark, SF_SMOKE)
        .agg(F.sum("n").alias("s"))
        .collect()[0]
        .s
    )
    # each user contributes (#events - 1) bigrams
    assert total_transitions == n_events - n_users


def test_cusum_reflection_identity_matches_textbook_recursion(spark):
    """The windowable form S_t = C_t − min(0, min_{j<=t} C_j) equals
    the textbook S_t = max(0, S_{t-1} + x_t − k) — checked row-by-row
    against a pure-Python recursion over every user at smoke scale,
    and the alarm flag is non-vacuous in both directions."""
    from collections import defaultdict

    from cam_location_addressing_feature_service_etl_spark.workload.events import (
        _CUSUM_H,
        _CUSUM_K,
        _events,
    )
    from pyspark.sql import functions as F

    events = _events(spark, SF_SMOKE)
    rows = (
        events.select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ms"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
        )
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["ms"], r["event_id"], r["v"]))
    want = {}
    for uid, evs in per_user.items():
        s = 0
        for _, eid, v in sorted(evs):
            s = max(0, s + v - _CUSUM_K)
            want[(uid, eid)] = (s, s > _CUSUM_H)
    got = {
        (r["user_id"], r["event_id"]): (r["cusum_centi"], r["alarm"])
        for r in QUERIES["ev_cusum_drift"](spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0
    flags = {a for _, a in got.values()}
    assert flags == {True, False}
