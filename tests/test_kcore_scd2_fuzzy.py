"""Unit tests for the round-6 additions: k-core peeling, SCD2
state-interval history, and blocked fuzzy matching."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.kcore import kcore_peel
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
from tests.conftest import SF_SMOKE


def test_kcore_peels_pendant_chain(spark):
    # triangle 1-2-3 plus pendant chain 3-4-5: at k=2 the chain peels
    # over two cascading rounds (5 first, then 4), the triangle stays.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_fixed_rounds_intermediate_state(spark):
    # one round only peels the leaf (5); node 4 is still present with
    # residual degree 1 — the fixed-round contract the oracle unrolls.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=1).collect()
    }
    assert got == {1: 2, 2: 2, 3: 3, 4: 1}


def test_kcore_ignores_self_loops_and_duplicates(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=3).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_scd2_intervals_tile_and_close(spark, tmp_path):
    # one user: view view click view  -> runs view(2), click(1), view(1)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=2), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=3), 1, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    out = QUERIES["ev_scd2_state_intervals"](spark, sf).orderBy("valid_from").collect()
    assert [(r["state"], r["n_events"], r["is_current"]) for r in out] == [
        ("view", 2, False),
        ("click", 1, False),
        ("view", 1, True),
    ]
    # intervals tile: each valid_to equals the next valid_from, last open
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert out[2]["valid_to"] is None


def test_fuzzy_match_within_block_only(spark):
    out = QUERIES["j11_fuzzy_blocked_match"](spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "expected at least one fuzzy pair at sf0.001"
    for r in rows:
        # same blocking key (head noun), nonzero distance within bound
        assert r["name_a"].split(" ")[1] == r["name_b"].split(" ")[1]
        assert 1 <= r["dist"] <= 3
        assert r["name_a"] < r["name_b"]


def test_pmi_membership_is_integer_gated(spark):
    out = QUERIES["text_pmi_collocations"](spark, SF_SMOKE)
    pdf = out.toPandas()
    assert (pdf["pair_count"] >= 40).all() or pdf.empty


def test_schema_evolution_merge_read(spark, tmp_path):
    """Snapshot generations gain columns over time (the reference's
    layer-schema probe S6 handles the source side; this covers the
    lake side): mergeSchema reads both generations, nulling the new
    column for old files — the contract an evolving 100 TB snapshot
    store depends on."""
    gen1 = tmp_path / "snap"
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        str(gen1), mode="overwrite"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(str(gen1), mode="append")
    got = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(gen1))
        .orderBy("id")
        .collect()
    )
    assert [tuple(r) for r in got] == [(1, "a", None), (2, "b", 9.5)]
    # projection of the evolved column alone still prunes correctly
    assert spark.read.option("mergeSchema", "true").parquet(str(gen1)).select(
        "score"
    ).count() == 2


def test_results_identical_with_aqe_disabled(spark):
    """AQE re-plans at runtime (coalesced partitions, skew splits,
    runtime join strategy) — none of which may change RESULTS. Pin the
    heaviest shuffle/join queries to identical output with AQE off."""
    names = ["dedup_minhash_lsh", "dedup_cc_star_converged", "ev_sessionize_gap30"]
    base = {
        n: sorted(map(tuple, QUERIES[n](spark, SF_SMOKE).collect())) for n in names
    }
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for n in names:
            got = sorted(map(tuple, QUERIES[n](spark, SF_SMOKE).collect()))
            assert got == base[n], f"{n} changed results under AQE=off"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)


def test_results_invariant_to_shuffle_partition_count(spark):
    """Results must be a pure function of the data, not of parallelism:
    re-running order-sensitive queries (windows, collect_list
    fingerprints, iterative labels) with a different
    spark.sql.shuffle.partitions must be byte-identical."""
    names = [
        "text_shard_manifest",        # collect_list fingerprint
        "ev_sessionize_gap30",        # windows + session numbering
        "dedup_cc_star_converged",    # iterative labels
        "text_bm25_topk",             # global rank window
    ]
    base = {
        n: sorted(map(tuple, QUERIES[n](spark, SF_SMOKE).collect())) for n in names
    }
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        for n in names:
            got = sorted(map(tuple, QUERIES[n](spark, SF_SMOKE).collect()))
            assert got == base[n], f"{n} changed results with 7 shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
