"""Output-contract validation stage (F12): CHECK-constraint violations
are selected, not silently dropped."""

from __future__ import annotations

from cam_location_addressing_feature_service_etl_spark.schemas import PLS_TABLES


def test_contract_covers_all_nine_tables():
    assert set(PLS_TABLES) == {
        "local_auth",
        "locality",
        "lf_locality_alias",
        "lf_road",
        "lf_parcel",
        "lf_site",
        "lf_place_name",
        "lf_geocode_sp_survey_point",
        "lf_address",
        "metadata",
    }


def test_violation_stage_counts(spark):
    spec = PLS_TABLES["lf_parcel"]
    df = spark.createDataFrame(
        [
            ("p-1", "SP1", "10", None),          # clean
            ("p-2", "PLAN_TOO_LONG!", "10", None),  # plan_no > 10
            (None, "SP1", "123456", None),       # pk null + lot_no > 5
        ],
        "parcel_id string, plan_no string, lot_no string, hash string",
    )
    got = {r["rule"]: r["violations"] for r in spec.violations(df).collect()}
    assert got["plan_no_width"] == 1
    assert got["lot_no_width"] == 1
    assert got["parcel_id_not_null"] == 1


def test_struct_types_build():
    for spec in PLS_TABLES.values():
        st = spec.struct_type()
        assert len(st.fields) == len(spec.columns)
