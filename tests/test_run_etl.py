"""Two consecutive full ETL runs through plans.run.run_etl — the
reference's monkeypatched main() test, Spark-shaped: snapshot restore,
carry-forward with reset, cache upsert, surrogate-id stability across
runs, and the publish contract."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.plans.run import run_etl

BNE = timezone(timedelta(hours=10))


def _addresses(spark, rows):
    return spark.createDataFrame(
        rows, "addr_id string, address_pid string, site_id string, parcel_id string"
    )


def _geocodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "geocode_id string, geocode_type string, address_pid string, site_id string, "
        "centoid_lat double, centoid_lon double, hash string",
    )


def _pid_map(spark, rows):
    return spark.createDataFrame(rows, "address_iri string, address_pid string")


def test_two_run_lifecycle(spark, tmp_path):
    root = str(tmp_path / "snaps")

    # ---- run 1: cold start
    r1 = run_etl(
        spark,
        snapshot_root=root,
        start_time=datetime(2026, 4, 22, 2, 0, 0, tzinfo=BNE),
        end_time=datetime(2026, 4, 22, 2, 2, 30, tzinfo=BNE),
        fetched_iri_pid=_pid_map(spark, [("iri/1", "100"), ("iri/2", "200")]),
        fetched_geocodes=_geocodes(
            spark, [("geo-1", "PC", "100", None, -27.0, 153.0, None)]
        ),
        lf_address=_addresses(
            spark,
            [("addr-1", "100", "site-1", "parcel-A"), ("addr-2", "200", "site-2", "parcel-B")],
        ),
        tables_to_remap={
            "lf_parcel": (
                spark.createDataFrame(
                    [("parcel-A", "SP1"), ("parcel-B", "SP2")], "parcel_id string, plan_no string"
                ),
                "parcel_id",
            )
        },
    )
    assert r1.previous_snapshot_ts is None
    assert r1.s3_key == "pls-etl/2026-04-22T02:02:30+1000/pls.db"
    geo1 = {r["geocode_id"]: r["site_id"] for r in r1.tables["lf_geocode_sp_survey_point"].collect()}
    assert geo1 == {"geo-1": "site-1"}
    ids1 = {r["iri"]: r["id"] for r in r1.tables["lf_parcel_id_map"].collect()}
    assert sorted(ids1.values()) == [1, 2]

    # ---- run 2: incremental — new address + updated pid for iri/1,
    # re-imported geo-1 (site reset), one new parcel
    r2 = run_etl(
        spark,
        snapshot_root=root,
        start_time=datetime(2026, 4, 23, 2, 0, 0, tzinfo=BNE),
        end_time=datetime(2026, 4, 23, 2, 2, 30, tzinfo=BNE),
        fetched_iri_pid=_pid_map(spark, [("iri/1", "101"), ("iri/3", "300")]),
        fetched_geocodes=_geocodes(
            spark, [("geo-3", "PC", "300", None, -26.0, 151.0, None)]
        ),
        lf_address=_addresses(
            spark,
            [
                ("addr-1", "101", "site-1", "parcel-A"),
                ("addr-3", "300", "site-3", "parcel-C"),
            ],
        ),
        tables_to_remap={
            "lf_parcel": (
                spark.createDataFrame(
                    [("parcel-A", "SP1"), ("parcel-C", "SP3")], "parcel_id string, plan_no string"
                ),
                "parcel_id",
            )
        },
    )
    assert r2.previous_snapshot_ts == "2026-04-22T02:02:30+1000"

    # cache upsert: iri/1 overwritten, iri/2 carried, iri/3 new
    pid = {r["address_iri"]: r["address_pid"] for r in r2.tables["address_iri_pid_map"].collect()}
    assert pid == {"iri/1": "101", "iri/2": "200", "iri/3": "300"}

    # geocodes: geo-1 carried forward with site reset then re-enriched
    # only if an address still matches pid 100 — addr-1 moved to 101,
    # so geo-1 (pid 100) is pruned; geo-3 enriched to site-3
    geo2 = {r["geocode_id"]: r["site_id"] for r in r2.tables["lf_geocode_sp_survey_point"].collect()}
    assert geo2 == {"geo-3": "site-3"}

    # surrogate ids stable: parcel-A keeps its run-1 id; parcel-C dense-appends
    ids2 = {r["iri"]: r["id"] for r in r2.tables["lf_parcel_id_map"].collect()}
    assert ids2["parcel-A"] == ids1["parcel-A"]
    assert ids2["parcel-B"] == ids1["parcel-B"]
    assert ids2["parcel-C"] == 3

    # publish contract
    assert r2.headers["etl-started-at"] == "2026-04-22T16:00:00+00:00"
    assert r2.headers["etl-duration-seconds"] == "150.000"
    msg = r2.message.collect()[0]
    assert msg["value"].decode().endswith(r2.s3_key)
    meta = r2.tables["metadata"].collect()[0]
    assert meta["id"] == 1 and meta["end_time"] == "2026-04-23T02:02:30+1000"
