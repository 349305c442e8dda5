"""Export-contract tests: field order/names/types per
pls/definitions.json, width-violation refusal, and CSV round-trip."""

from __future__ import annotations

import glob

import pytest

from cam_location_addressing_feature_service_etl_spark.plans.export import (
    EXPORT_CONTRACT,
    export_projection,
    width_violations,
    write_export,
)
from cam_location_addressing_feature_service_etl_spark.schemas import PLS_TABLES


def test_contract_covers_all_entity_tables():
    sources = {t.source_table for t in EXPORT_CONTRACT.values()}
    # every exported source is a declared PLS table
    assert sources <= set(PLS_TABLES)
    # all 9 definitions.json tables are exported (metadata is not in
    # the CSV contract; LOCALITY_ALIAS is header-only, see export.py)
    assert len(EXPORT_CONTRACT) == 9
    assert "lf_locality_alias_with_link.csv" in EXPORT_CONTRACT


def test_contract_fields_resolve_to_internal_columns():
    for t in EXPORT_CONTRACT.values():
        internal = {c.name for c in PLS_TABLES[t.source_table].columns}
        for f in t.fields:
            assert (f.source or f.name) in internal, (t.csv_name, f.name)


def test_export_projection_order_and_types(spark):
    contract = EXPORT_CONTRACT["locality.csv"]
    df = spark.createDataFrame(
        [("L1", "Brisbane", "CITY", 1, "QLD", "C", None)],
        "locality_code string, locality_name string, locality_type string,"
        " la_code long, state string, locality_status_code string, hash string",
    )
    out = export_projection(df, contract)
    assert out.columns == [
        "locality_code", "locality_name", "locality_type", "la_code", "state", "status",
    ]
    dtypes = dict(out.dtypes)
    assert dtypes["la_code"] == "bigint" and dtypes["status"] == "string"


def test_width_violation_blocks_export(spark, tmp_path):
    contract = EXPORT_CONTRACT["lf_parcel.csv"]
    ok = spark.createDataFrame(
        [("1", "RP1", "5"), ("2", "SP2", "0")],
        "parcel_id string, plan_no string, lot_no string",
    )
    write_export(ok.withColumn("hash", ok.parcel_id), contract, str(tmp_path))
    [f] = glob.glob(f"{tmp_path}/lf_parcel.csv/part-*.csv")
    header = open(f).readline().strip()
    assert header == "parcel_id,plan_no,lot_no"

    from pyspark.sql import functions as F

    bad = spark.createDataFrame(
        [("1", "RP1", "TOOLONG")],  # lot_no max size 5
        "parcel_id string, plan_no string, lot_no string",
    ).withColumn("hash", F.col("parcel_id"))
    with pytest.raises(ValueError, match="lot_no_width"):
        write_export(bad, contract, str(tmp_path / "bad"))


def test_integer_width_violation_blocks_export(spark, tmp_path):
    # locality.csv declares la_code Integer Size 4: 5-digit codes must
    # trip the gate (numeric widths are digit counts, enforced too)
    contract = EXPORT_CONTRACT["locality.csv"]
    bad = spark.createDataFrame(
        [("L1", "Brisbane", "CITY", 99999, "QLD", "C", None)],
        "locality_code string, locality_name string, locality_type string,"
        " la_code long, state string, locality_status_code string, hash string",
    )
    with pytest.raises(ValueError, match="la_code_width"):
        write_export(bad, contract, str(tmp_path / "bad_int"))


def test_locality_alias_header_only_export(spark, tmp_path):
    # the reference never populates LOCALITY_ALIAS; the contract still
    # produces a correctly-shaped (header-only) CSV from an empty frame
    contract = EXPORT_CONTRACT["lf_locality_alias_with_link.csv"]
    schema = (
        "locality_alias_id long, locality_alias_name string,"
        " locality_code string, status string, loc_type string"
    )
    empty = spark.createDataFrame([], schema)
    write_export(empty, contract, str(tmp_path))
    [f] = glob.glob(f"{tmp_path}/lf_locality_alias_with_link.csv/part-*.csv")
    header = open(f).readline().strip()
    assert header == (
        "locality_alias_id,locality_alias_name,locality_code,status,loc_type"
    )


def test_export_roundtrip(spark, tmp_path):
    contract = EXPORT_CONTRACT["local_auth.csv"]
    df = spark.createDataFrame([(1, "BRISBANE"), (2, "LOGAN")], "la_code long, la_name string")
    write_export(df, contract, str(tmp_path))
    back = (
        spark.read.option("header", True)
        .schema("la_code long, la_name string")
        .csv(str(tmp_path / "local_auth.csv"))
    )
    assert {(r["la_code"], r["la_name"]) for r in back.collect()} == {
        (1, "BRISBANE"), (2, "LOGAN"),
    }
