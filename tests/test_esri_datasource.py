"""The ESRI Python Data Source read end-to-end through
spark.read.format("esri") in fake mode: partition planning from the
count, per-page reads, schema, and downstream plan composition."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cam_location_addressing_feature_service_etl_spark.sources.esri_datasource import (
    EsriDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(EsriDataSource)
    return spark


def test_reads_all_pages(registered):
    df = (
        registered.read.format("esri")
        .option("mode", "fake")
        .option("fake_count", "4500")
        .option("page_size", "2000")
        .load()
    )
    assert df.count() == 4500
    assert df.columns == ["objectid", "pid", "type", "x", "y"]
    lo, hi = df.agg(F.min("objectid"), F.max("objectid")).collect()[0][:]
    assert (lo, hi) == (0, 4499)
    assert df.rdd.getNumPartitions() == 3  # ceil(4500/2000) pages


def test_composes_with_engine_operators(registered):
    """The source output feeds the normal operator pipeline (F6-style
    type-code normalization + grid bucketing)."""
    df = (
        registered.read.format("esri")
        .option("mode", "fake")
        .option("fake_count", "1000")
        .load()
    )
    out = (
        df.withColumn("code", F.upper(F.regexp_replace("type", "^.*geocode-types/", "")))
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["code"]: r["n"] for r in out.collect()}
    assert len(got) == 7 and sum(got.values()) == 1000
