"""Grid-bucketed nearest-neighbor join: exactness guard and basic
semantics (full equivalence vs brute force is proven by the
geo_nearest_within_radius parity oracle)."""

from __future__ import annotations

import pytest

from cam_location_addressing_feature_service_etl_spark.operators.spatial_join import (
    nearest_within_radius,
)


def _df(spark, rows, id_col):
    return spark.createDataFrame(rows, f"{id_col} long, lat double, lon double")


def test_rejects_cell_smaller_than_radius(spark):
    a = _df(spark, [(1, 0.0, 0.0)], "point_id")
    b = _df(spark, [(2, 0.1, 0.1)], "cand_id")
    with pytest.raises(ValueError, match="neighbor expansion"):
        nearest_within_radius(a, b, radius_km=200.0, cell_deg=1.0, max_abs_lat_deg=6.0)


def test_nearest_picked_across_cell_boundary(spark):
    # candidate sits just across a cell boundary from the point; the
    # 3x3 expansion must still find it
    a = _df(spark, [(1, 0.999, 0.0)], "point_id")
    b = _df(spark, [(10, 1.001, 0.0), (11, 0.5, 0.0)], "cand_id")
    got = nearest_within_radius(a, b, radius_km=60.0, cell_deg=1.0, max_abs_lat_deg=6.0).collect()
    assert len(got) == 1
    assert got[0]["cand_id"] == 10  # ~0.2 km away, across the boundary
    assert got[0]["dist_km"] < 1.0


def test_out_of_radius_points_absent(spark):
    a = _df(spark, [(1, 0.0, 0.0), (2, 20.0, 20.0)], "point_id")
    b = _df(spark, [(10, 0.1, 0.1)], "cand_id")
    got = nearest_within_radius(a, b, radius_km=60.0, cell_deg=1.0, max_abs_lat_deg=6.0).collect()
    assert [r["point_id"] for r in got] == [1]
