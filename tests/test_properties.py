"""Property-based tests (hypothesis) for the operator invariants the
reference relies on implicitly: upsert key-uniqueness, surrogate-id
density/stability, dedup precedence, and LSH-vs-exact consistency."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
    dedup_first_wins,
    merge_fetched_wins,
)
from cam_location_addressing_feature_service_etl_spark.operators.id_map import (
    assign_surrogate_ids,
)
from cam_location_addressing_feature_service_etl_spark.operators.upsert import (
    upsert_by_key,
)

_SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=25)


@given(base_keys=keys, update_keys=keys)
@_SET
def test_upsert_invariants(spark, base_keys, update_keys):
    base = spark.createDataFrame(
        [(k, f"base-{k}") for k in set(base_keys)] or [(None, None)], "key int, val string"
    ).filter(F.col("key").isNotNull())
    updates = spark.createDataFrame(
        [(k, f"upd-{k}") for k in set(update_keys)] or [(None, None)], "key int, val string"
    ).filter(F.col("key").isNotNull())
    merged = {r["key"]: r["val"] for r in upsert_by_key(base, updates, ["key"]).collect()}
    # keys = union; updates always win; untouched base rows survive
    assert set(merged) == set(base_keys) | set(update_keys)
    for k in set(update_keys):
        assert merged[k] == f"upd-{k}"
    for k in set(base_keys) - set(update_keys):
        assert merged[k] == f"base-{k}"


@given(
    run1=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), max_size=15),
    run2=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), max_size=15),
)
@_SET
def test_surrogate_ids_dense_and_stable(spark, run1, run2):
    empty = spark.createDataFrame([], "iri string, id long")
    k1 = spark.createDataFrame([(k,) for k in run1] or [(None,)], "iri string").filter(
        F.col("iri").isNotNull()
    )
    m1 = assign_surrogate_ids(k1, empty)
    ids1 = {r["iri"]: r["id"] for r in m1.collect()}
    assert sorted(ids1.values()) == list(range(1, len(set(run1)) + 1))  # dense from 1
    k2 = spark.createDataFrame([(k,) for k in run1 + run2] or [(None,)], "iri string").filter(
        F.col("iri").isNotNull()
    )
    m2 = assign_surrogate_ids(k2, m1)
    ids2 = {r["iri"]: r["id"] for r in m2.collect()}
    assert all(ids2[k] == v for k, v in ids1.items())  # stability
    assert sorted(ids2.values()) == list(range(1, len(set(run1) | set(run2)) + 1))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    )
)
@_SET
def test_first_wins_dedup_picks_minimum(spark, rows):
    df = spark.createDataFrame(rows, "k int, a int, b int")
    got = {
        r["k"]: (r["a"], r["b"])
        for r in dedup_first_wins(df, ["k"], ["a", "b"]).collect()
    }
    expect = {}
    for k, a, b in rows:
        if k not in expect or (a, b) < expect[k]:
            expect[k] = (a, b)
    assert got == expect


@given(overlap=st.lists(st.integers(0, 20), min_size=1, max_size=15))
@_SET
def test_fetched_wins_on_every_collision(spark, overlap):
    stored = spark.createDataFrame(
        [(k, "stored", 0) for k in set(overlap)], "key int, src string, pri int"
    )
    fetched = spark.createDataFrame(
        [(k, "fetched", 1) for k in set(overlap)], "key int, src string, pri int"
    )
    merged = merge_fetched_wins(stored, fetched, ["key"], "pri")
    assert all(r["src"] == "fetched" for r in merged.collect())
