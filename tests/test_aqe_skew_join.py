"""AQE skew-join splitting: the runtime re-plan that a9_key_skew_profile
diagnoses for and operators/skew.py's salting complements. This test
pins that adaptive execution actually SPLITS a skewed shuffle
partition on this build (SortMergeJoin(skew=true) in the final plan)
and that the split never changes results — the property the 100 TB
plans lean on when a hot key would otherwise pin one reducer.

Thresholds are lowered so a ~2M-row synthetic skew (95% of rows on one
key) models the one-partition-dwarfs-the-rest shape inside a test-
sized shuffle; at real scale the default 256MB threshold plays the
same role.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_without_changing_results(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONF}
    try:
        for k, v in _CONF.items():
            spark.conf.set(k, v)
        left = spark.range(2_000_000).select(
            F.when(F.col("id") < 1_900_000, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
        )
        row = j.collect()[0]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition — check the skewJoin "
            "thresholds or whether the join degraded to broadcast"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # ground truth: keys 0..999 exist on the right; left has 1.9M rows
    # of key 0 plus single rows for keys >= 1.9M (no right match), so
    # the join is 1.9M rows of key 0 (w=0) and nothing else.
    assert row["n"] == 1_900_000
    assert row["s"] == 0
