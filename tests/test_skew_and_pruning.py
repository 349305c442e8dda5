"""Skew operators produce identical results to the direct forms, and
partitioned writes give partition pruning (PartitionFilters in the
scan) — the two remaining scale levers the plans rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.skew import (
    salted_count_sum,
    salted_join,
)
from cam_location_addressing_feature_service_etl_spark.tables import load
from tests.conftest import SF_SMOKE


def test_salted_aggregation_matches_direct(spark):
    lineitem = load(spark, SF_SMOKE, "lineitem")
    direct = {
        r["l_returnflag"]: (r["cnt"], round(r["sum_val"], 2))
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("sum_val"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["cnt"], round(r["sum_val"], 2))
        for r in salted_count_sum(lineitem, ["l_returnflag"], "l_quantity").collect()
    }
    assert salted == direct


def test_salted_join_matches_plain_join(spark):
    lineitem = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, SF_SMOKE, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = lineitem.join(part, "l_partkey").count()
    salted = salted_join(lineitem, part, "l_partkey").count()
    assert salted == plain > 0


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    orders = load(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus" in plan.split("PartitionFilters")[1][:120]
    # pruned scan reads only the matching partition's rows
    expected = orders.filter(F.col("o_orderstatus") == "O").count()
    assert df.count() == expected


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """DPP: a selective dim-side filter must prune the partitioned fact
    scan AT RUNTIME via a dynamicpruning subquery — at 100 TB this is
    the difference between scanning one nation's partition and scanning
    the whole fact table when the filter is on the dim, not the fact."""
    customer = load(spark, SF_SMOKE, "customer")
    nation = load(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "cust_by_nation")
    customer.write.partitionBy("c_nationkey").mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    dim = nation.filter(F.col("n_name") == "NATION_7")
    joined = fact.join(dim, fact["c_nationkey"] == dim["n_nationkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = (
        customer.join(dim, customer["c_nationkey"] == dim["n_nationkey"]).count()
    )
    assert joined.count() == expected > 0
