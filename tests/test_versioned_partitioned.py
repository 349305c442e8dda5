"""Partitioned versioned-fold layout (r12 verdict #4): fold write-IO
must be proportional to TOUCHED partitions — untouched buckets carry
forward by manifest reference, never by copy — while reads stitch the
exact full state, replay stays idempotent, a crash before the commit
marker is invisible, and reference-counted pruning keeps an old
version alive for exactly as long as some surviving manifest owns a
bucket inside it."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.streaming.versioned import (
    fold_version_partitioned,
    read_latest_partitioned,
)

SCHEMA = "k bigint, val bigint"
P = 8


def _merge(prior, delta):
    """Upsert: delta rows win per key; a delta val < 0 deletes the key."""
    d = delta.groupBy("k").agg(F.max("val").alias("val"))
    keep = prior.join(d, "k", "left_anti")
    return keep.unionByName(d).filter(F.col("val") >= 0)


def _fold(df, bid, state_dir, retain=3):
    fold_version_partitioned(
        df, bid, state_dir, SCHEMA, _merge, ("k",), P, retain
    )


def _state(spark, state_dir):
    return {
        (r["k"], r["val"])
        for r in read_latest_partitioned(spark, state_dir, SCHEMA).collect()
    }


def _data_pids(state_dir, version):
    data = os.path.join(state_dir, f"v={version}", "data")
    if not os.path.isdir(data):
        return set()
    return {
        int(n.split("=")[1])
        for n in os.listdir(data)
        if n.startswith("_pid=")
    }


def _manifest(state_dir, version):
    with open(os.path.join(state_dir, f"v={version}", "manifest.json")) as f:
        return json.load(f)


def test_fold_read_roundtrip_and_incremental_merge(spark, tmp_path):
    d = str(tmp_path / "st")
    b0 = spark.createDataFrame([(k, 10 + k) for k in range(20)], SCHEMA)
    _fold(b0, 0, d)
    assert _state(spark, d) == {(k, 10 + k) for k in range(20)}
    # batch 1 updates one key, adds one, deletes one
    b1 = spark.createDataFrame([(3, 99), (100, 1), (7, -1)], SCHEMA)
    _fold(b1, 1, d)
    want = {(k, 10 + k) for k in range(20) if k not in (3, 7)} | {
        (3, 99),
        (100, 1),
    }
    assert _state(spark, d) == want


def test_untouched_buckets_carry_forward_by_reference(spark, tmp_path):
    d = str(tmp_path / "st")
    _fold(spark.createDataFrame([(k, k) for k in range(64)], SCHEMA), 0, d)
    pids_v0 = _data_pids(d, 0)
    assert pids_v0 == set(range(P))  # 64 keys cover all 8 buckets
    # a single-key update touches exactly its bucket
    _fold(spark.createDataFrame([(5, 555)], SCHEMA), 1, d)
    pids_v1 = _data_pids(d, 1)
    assert len(pids_v1) == 1  # write ∝ touched partitions
    man = _manifest(d, 1)
    owners = set(man["pids"].values())
    assert owners == {0, 1}  # untouched buckets still owned by v=0
    assert _state(spark, d) == {(k, k) for k in range(64) if k != 5} | {
        (5, 555)
    }
    # an IDENTICAL upsert changes nothing: fingerprints match, zero
    # buckets written, manifest all-references
    _fold(spark.createDataFrame([(5, 555)], SCHEMA), 2, d)
    assert _data_pids(d, 2) == set()
    assert set(_manifest(d, 2)["pids"].values()) == {0, 1}


def test_replay_is_idempotent(spark, tmp_path):
    d = str(tmp_path / "st")
    _fold(spark.createDataFrame([(k, k) for k in range(10)], SCHEMA), 0, d)
    _fold(spark.createDataFrame([(1, 11), (50, 50)], SCHEMA), 1, d)
    committed = _state(spark, d)
    man_before = _manifest(d, 1)
    _fold(spark.createDataFrame([(1, 11), (50, 50)], SCHEMA), 1, d)  # replay
    assert _state(spark, d) == committed
    assert _manifest(d, 1) == man_before  # byte-identical commit


def test_crash_before_commit_is_invisible_and_replay_recovers(spark, tmp_path):
    d = str(tmp_path / "st")
    _fold(spark.createDataFrame([(k, k) for k in range(10)], SCHEMA), 0, d)
    before = _state(spark, d)
    _fold(spark.createDataFrame([(2, 22)], SCHEMA), 1, d)
    # simulate the crash: version 1's data was written but the commit
    # marker (manifest) never landed
    os.remove(os.path.join(d, "v=1", "manifest.json"))
    assert _state(spark, d) == before  # reader ignores uncommitted dir
    _fold(spark.createDataFrame([(2, 22)], SCHEMA), 1, d)  # replay
    assert _state(spark, d) == (before - {(2, 2)}) | {(2, 22)}


def test_num_partitions_is_pinned(spark, tmp_path):
    d = str(tmp_path / "st")
    _fold(spark.createDataFrame([(1, 1)], SCHEMA), 0, d)
    with pytest.raises(ValueError, match="num_partitions"):
        fold_version_partitioned(
            spark.createDataFrame([(2, 2)], SCHEMA),
            1,
            d,
            SCHEMA,
            _merge,
            ("k",),
            P + 1,
            3,
        )


def test_pruning_keeps_referenced_versions_alive(spark, tmp_path):
    d = str(tmp_path / "st")
    _fold(spark.createDataFrame([(k, k) for k in range(64)], SCHEMA), 0, d)
    # five single-key folds with retain_versions=2: v=0 falls out of
    # the retained-manifest window but still OWNS most buckets — it
    # must survive reference-counted pruning
    for i in range(1, 6):
        _fold(spark.createDataFrame([(i, 100 + i)], SCHEMA), i, d, retain=2)
    assert os.path.isdir(os.path.join(d, "v=0"))
    live = {int(n[2:]) for n in os.listdir(d) if n.startswith("v=")}
    assert 0 in live and 5 in live
    # versions neither retained nor referenced were pruned
    assert live < set(range(6)) | {0}
    want = {(k, k) for k in range(64) if k not in range(1, 6)} | {
        (i, 100 + i) for i in range(1, 6)
    }
    assert _state(spark, d) == want


def test_empty_first_fold_commits_empty_state(spark, tmp_path):
    d = str(tmp_path / "st")
    _fold(spark.createDataFrame([], SCHEMA), 0, d)
    assert _state(spark, d) == set()
    assert _manifest(d, 0)["pids"] == {}


def test_compacting_fold_rehomes_buckets_and_bounds_versions(spark, tmp_path):
    """compact_every=N: the Nth fold force-rewrites every live bucket
    into its own version — owner dispersion resets to one version, and
    every older version prunes once it ages past retention (without
    compaction, v=0 lives forever as the owner of untouched buckets).
    Replaying the compacting fold is idempotent."""
    d = str(tmp_path / "st")
    _fold(spark.createDataFrame([(k, k) for k in range(64)], SCHEMA), 0, d)
    want = {(k, k) for k in range(64)}

    def step(i):
        fold_version_partitioned(
            spark.createDataFrame([(i, 100 + i)], SCHEMA),
            i, d, SCHEMA, _merge, ("k",), P, 2, compact_every=4,
        )

    for i in range(1, 5):
        step(i)
        want = (want - {(i, i)}) | {(i, 100 + i)}
    # fold 4 compacted: every live bucket rewritten into its version
    assert _data_pids(d, 4) == set(range(P))
    assert _state(spark, d) == want
    # replaying the compacting fold (foreachBatch re-delivery of the
    # LATEST batch — the only replay the contract allows) is
    # byte-identical: its predecessor v=3 survives retention
    man4 = _manifest(d, 4)
    step(4)
    assert _manifest(d, 4) == man4
    assert _state(spark, d) == want
    for i in range(5, 7):
        step(i)
        want = (want - {(i, i)}) | {(i, 100 + i)}
    assert _state(spark, d) == want
    # dispersion reset: the latest manifest references only the
    # compaction version onward, and v=0 (which owned every untouched
    # bucket before compaction, immortal without it) was pruned
    assert set(_manifest(d, 6)["pids"].values()) <= {4, 5, 6}
    live = {int(n[2:]) for n in os.listdir(d) if n.startswith("v=")}
    assert 0 not in live


def test_dispersion_policy_caps_owner_versions(spark, tmp_path):
    """Adaptive compaction: with compact_dispersion=K, the manifest's
    distinct-owner count stays < K+1 forever under a touch pattern that
    would otherwise disperse one version per fold; the compacting fold
    re-homes every live bucket; reads stay exact; replay of a
    compacting fold makes the identical choice (metadata-only)."""
    d = str(tmp_path / "st")
    K = 3

    def fold(df, bid):
        fold_version_partitioned(
            df, bid, d, SCHEMA, _merge, ("k",), P, 3, None, K
        )

    # batch b touches only key b -> each fold owns one new bucket
    fold(spark.createDataFrame([(k, k) for k in range(64)], SCHEMA), 0)
    owners_seen = []
    for b in range(1, 9):
        fold(spark.createDataFrame([(b, 100 + b)], SCHEMA), b)
        man = _manifest(d, b)
        owners = {int(o) for o in man["pids"].values()}
        owners_seen.append(len(owners))
        # the PRIOR manifest triggers at >= K, so post-fold dispersion
        # never exceeds K+1 (one fold's worth of new ownership on top
        # of a just-compacted single owner)
        assert len(owners) <= K + 1
    # compaction actually fired: some fold re-homed everything to itself
    assert 1 in owners_seen or 2 in owners_seen
    want = {(k, k) for k in range(64) if k not in range(1, 9)} | {
        (b, 100 + b) for b in range(1, 9)
    }
    assert _state(spark, d) == want
    # replaying the LAST fold (whatever it chose) is idempotent
    fold(spark.createDataFrame([(8, 108)], SCHEMA), 8)
    assert _state(spark, d) == want
