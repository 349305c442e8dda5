"""Runtime Bloom-filter join pruning: Spark's adaptive runtime filter
(spark.sql.optimizer.runtime.bloomFilter.*) builds a Bloom filter from
a selective build side and pushes a might_contain probe into the fact
scan — the engine-native form of the broadcast-Bloom dedup/decontam
pre-filter the operator docstrings promise at 100 TB (see
workload/decontam.py module doc). This test pins that the feature
actually engages on this Spark build and that it never changes
results: at real scale the thresholds hold by themselves; here the
application-side scan threshold is zeroed and broadcast is disabled so
the tiny fixture takes the same plan shape a 100 TB fact table would.
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE

_CONF = {
    # force a shuffle join (broadcast disables runtime filters) and let
    # the tiny fixture qualify as a "large" application side
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def _join(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        "o_totalprice > 400000"
    )
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    return l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONF}
    try:
        for k, v in _CONF.items():
            spark.conf.set(k, v)
        j = _join(spark)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"bloom_filter_agg", plan), (
            "runtime Bloom filter was not injected — build side no longer "
            "qualifies (check creationSideThreshold / selectivity)"
        )
        assert re.search(r"might_contain", plan), (
            "Bloom probe did not reach the application side"
        )
        filtered_rows = j.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # Bloom pruning is advisory (false positives pass through; the
    # equi-join still decides membership) — results must be identical
    # with the feature fully off.
    enabled_key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    spark.conf.set(enabled_key, "false")
    try:
        plain_rows = _join(spark).count()
    finally:
        if saved[enabled_key] is None:
            spark.conf.unset(enabled_key)
        else:
            spark.conf.set(enabled_key, saved[enabled_key])
    assert filtered_rows == plain_rows
    assert plain_rows > 0, "fixture filter selects nothing — weaken it"
