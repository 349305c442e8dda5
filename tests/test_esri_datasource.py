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
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
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


def test_push_filters_translate_to_where(registered):
    from pyspark.sql.datasource import GreaterThan, IsNotNull, StringStartsWith
    from pyspark.sql.types import StructType

    from cam_location_addressing_feature_service_etl_spark.sources.esri_datasource import (
        EsriReader,
    )

    r = EsriReader({"mode": "fake"}, StructType([]))
    filters = [
        GreaterThan(("objectid",), 100),
        IsNotNull(("pid",)),             # unsupported → not translated
        StringStartsWith(("type",), "x"),  # unsupported → not translated
    ]
    remaining = list(r.pushFilters(filters))
    assert r.where == "1=1 AND objectid > 100"
    assert remaining == filters  # partial pushdown: Spark re-applies all


def test_filtered_read_is_correct_end_to_end(registered):
    # fake server ignores `where`; because pushFilters returns every
    # filter for Spark to re-apply, results stay correct regardless
    df = (
        registered.read.format("esri")
        .option("mode", "fake")
        .option("fake_count", "1000")
        .load()
        .filter(F.col("objectid") >= 990)
    )
    assert sorted(r["objectid"] for r in df.collect()) == list(range(990, 1000))


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
