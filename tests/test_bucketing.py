"""Shuffle elimination via bucketed tables — the co-located-join
strategy for repeated large-scale joins (SURVEY §7 scale notes).

Writing both sides bucketed by the join key lets Spark sort-merge-join
them with ZERO Exchange operators: at 100 TB this turns the nightly
orders⋈customer join from a full shuffle into a local merge per
bucket. This test proves the plan property, not just the result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.tables import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # bucketBy requires saveAsTable; isolate a throwaway database
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    yield "buckdemo"
    spark.sql("DROP DATABASE IF EXISTS buckdemo CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = load(spark, SF_SMOKE, "orders")
    customer = load(spark, SF_SMOKE, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(f"{warehouse}.orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(f"{warehouse}.customer_b")
    )
    ob = spark.table(f"{warehouse}.orders_b")
    cb = spark.table(f"{warehouse}.customer_b")
    # disable broadcast so the join strategy is the bucketed SMJ
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(cb, ob["o_custkey"] == cb["c_custkey"]).select(
            "o_orderkey", "c_name"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # buckets co-located: no shuffle
        # and the result is still correct
        expected = (
            orders.join(customer, orders["o_custkey"] == customer["c_custkey"]).count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
