"""Round-8 geo additions: point-in-polygon, grid kNN, geohash, blocked
fuzzy linkage. Each checks the operator against an INDEPENDENT pure-
Python implementation (the parity oracle already proves DuckDB
equivalence; these pin the geometry/encoding semantics themselves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.operators.spatial_join import (
    knn_within_radius,
    nearest_within_radius,
)
from cam_location_addressing_feature_service_etl_spark.workload.geo import (
    _GH_ALPHABET,
    _POLY,
    _pip_sql,
)
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------


def test_polygon_is_convex_ccw():
    """The half-plane conjunction is only valid for convex CCW rings —
    pin that property so a future vertex edit can't silently break it."""
    n = len(_POLY)
    for i in range(n):
        ox, oy = _POLY[i]
        ax, ay = _POLY[(i + 1) % n]
        bx, by = _POLY[(i + 2) % n]
        cross = (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
        assert cross > 0, f"vertex {i}: not convex-CCW (cross={cross})"


def _pip_python(lat: float, lon: float) -> bool:
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        if (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) < 0:
            return False
    return True


def test_pip_matches_python_mirror(spark):
    pts = [
        (1, -27.5, 152.5),   # inside (Brisbane-ish)
        (2, -29.0, 152.0),   # on the bottom edge → inside (>= 0)
        (3, -30.0, 152.0),   # south of the polygon
        (4, -25.0, 150.8),   # west of the upper edges
        (5, -26.0, 153.9),   # inside near the east edge
        (6, -24.4, 152.5),   # just north of the apex
    ]
    df = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    got = {
        r["point_id"]
        for r in df.filter(F.expr(_pip_sql("lat", "lon"))).collect()
    }
    want = {pid for pid, lat, lon in pts if _pip_python(lat, lon)}
    assert got == want
    assert 1 in want and 2 in want and 3 not in want


# ---------------------------------------------------------------------------
# grid kNN
# ---------------------------------------------------------------------------


def _df(spark, rows, id_col):
    return spark.createDataFrame(rows, f"{id_col} long, lat double, lon double")


def test_knn_ranks_by_distance_then_id(spark):
    a = _df(spark, [(1, 0.0, 0.0)], "point_id")
    b = _df(
        spark,
        [(10, 0.30, 0.0), (11, 0.10, 0.0), (12, 0.20, 0.0), (13, 5.0, 5.0)],
        "cand_id",
    )
    got = (
        knn_within_radius(a, b, k=3, radius_km=60.0, cell_deg=1.0, max_abs_lat_deg=6.0)
        .orderBy("rank")
        .collect()
    )
    assert [r["cand_id"] for r in got] == [11, 12, 10]
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert got[0]["dist_km"] <= got[1]["dist_km"] <= got[2]["dist_km"]


def test_knn_k1_equals_nearest(spark):
    """The k=1 slice IS the original nearest-neighbor contract."""
    a = _df(spark, [(1, 0.999, 0.0), (2, 0.5, 0.5)], "point_id")
    b = _df(spark, [(10, 1.001, 0.0), (11, 0.5, 0.0), (12, 0.4, 0.55)], "cand_id")
    knn1 = {
        (r["point_id"], r["cand_id"], r["dist_km"])
        for r in knn_within_radius(a, b, k=1, radius_km=60.0, cell_deg=1.0, max_abs_lat_deg=6.0).collect()
    }
    nn = {
        (r["point_id"], r["cand_id"], r["dist_km"])
        for r in nearest_within_radius(a, b, radius_km=60.0, cell_deg=1.0, max_abs_lat_deg=6.0).collect()
    }
    assert knn1 == nn and len(nn) == 2


def test_knn_finds_neighbors_across_cell_boundaries(spark):
    # 2nd-nearest lives in a diagonal neighbor cell
    a = _df(spark, [(1, 0.99, 0.99)], "point_id")
    b = _df(spark, [(10, 1.01, 1.01), (11, 0.98, 0.98), (12, 1.5, 0.2)], "cand_id")
    got = knn_within_radius(a, b, k=2, radius_km=60.0, cell_deg=1.0, max_abs_lat_deg=6.0).collect()
    assert {r["cand_id"] for r in got} == {11, 10}


# ---------------------------------------------------------------------------
# geohash
# ---------------------------------------------------------------------------


def _geohash_python(lat: float, lon: float, n_chars: int) -> str:
    """Textbook interval-halving geohash encoder (independent of the
    bit-interleave formulation under test)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True  # geohash leads with a longitude bit
    while len(bits) < n_chars * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for t in range(n_chars):
        idx = 0
        for b in bits[5 * t : 5 * t + 5]:
            idx = (idx << 1) | b
        out.append(_GH_ALPHABET[idx])
    return "".join(out)


def test_geohash_matches_interval_halving_encoder(spark):
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _gh_chars_sql,
        _gh_interleave_sql,
    )

    pts = [
        (1, -27.47, 153.03),   # Brisbane
        (2, -16.92, 145.77),   # Cairns
        (3, 51.50, -0.12),     # London (negative lon)
        (4, -33.87, 151.21),   # Sydney
        (5, 0.0, 0.0),         # origin (boundary)
        (6, 90.0, 180.0),      # exact upper domain bound: LEAST clamp
        (7, -90.0, -180.0),    # lower bound (cell 0 by floor)
    ]
    df = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    # same clamped grid the query uses: the upper bound floors to
    # 32768 whose bit 15 the interleave would drop (pole aliasing)
    g = df.select(
        "point_id",
        "lat",
        "lon",
        F.least(
            F.floor((F.col("lon") + 180.0) / 360.0 * 32768).cast("long"),
            F.lit(32767),
        ).alias("gx"),
        F.least(
            F.floor((F.col("lat") + 90.0) / 180.0 * 32768).cast("long"),
            F.lit(32767),
        ).alias("gy"),
    )
    z = g.select(
        "point_id", "lat", "lon", F.expr(_gh_interleave_sql("gx", "gy")).alias("zkey")
    )
    got = {
        r["point_id"]: r["gh"]
        for r in z.select(
            "point_id", F.expr(_gh_chars_sql("zkey", 6)).alias("gh")
        ).collect()
    }
    for pid, lat, lon in pts:
        assert got[pid] == _geohash_python(lat, lon, 6), (pid, got[pid])
    # sanity anchor: Brisbane's well-known prefix
    assert got[1].startswith("r7hg")


# ---------------------------------------------------------------------------
# blocked fuzzy linkage
# ---------------------------------------------------------------------------


def _lev_python(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_agrees_with_python(spark):
    pairs = [
        ("almond antique blue royal", "almond antique blue regal"),
        ("goldenrod lavender spring", "goldenrod lavendar spring"),
        ("", "abc"),
        ("same", "same"),
        ("kitten", "sitting"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select(F.levenshtein("a", "b").alias("d")).collect()
    for (a, b), r in zip(pairs, got):
        assert r["d"] == _lev_python(a, b), (a, b)


def test_fuzzy_match_excludes_exact_and_orders_keys(spark):
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

    got = QUERIES["geo_fuzzy_match_blocked"](spark, SF_SMOKE).collect()
    assert all(r["left_key"] < r["right_key"] for r in got)
    assert all(1 <= r["edit_dist"] <= 3 for r in got)


# ---------------------------------------------------------------------------
# non-convex point-in-polygon (ray casting)
# ---------------------------------------------------------------------------


def _raycast_python(px, py, poly):
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def test_concave_polygon_is_actually_concave():
    """The test ring must exercise the non-convex path: at least one
    reflex vertex (cross-product sign flips), or the query is just the
    convex form in disguise."""
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _POLY_CONCAVE,
    )

    n = len(_POLY_CONCAVE)
    signs = set()
    for i in range(n):
        x0, y0 = _POLY_CONCAVE[i]
        x1, y1 = _POLY_CONCAVE[(i + 1) % n]
        x2, y2 = _POLY_CONCAVE[(i + 2) % n]
        cross = (x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1)
        if cross:
            signs.add(cross > 0)
    assert signs == {True, False}


def test_raycast_matches_python_and_respects_notch(spark):
    """Every emitted point must be inside per an independent pure-
    Python PNPOLY, every non-emitted bbox point outside; the U-notch
    (lon 144-146 above lat -23) must contain NO emitted points — the
    case the convex half-plane form gets wrong."""
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _POLY_CONCAVE,
        _points,
    )

    got = {
        r["point_id"]: (r["lon"], r["lat"])
        for r in QUERIES["geo_point_in_polygon_raycast"](spark, SF_SMOKE).collect()
    }
    assert got, "no points inside — degenerate fixture"
    allpts = {
        r["point_id"]: (r["lon"], r["lat"])
        for r in _points(spark, SF_SMOKE).collect()
    }
    for pid, (px, py) in allpts.items():
        assert (pid in got) == _raycast_python(px, py, _POLY_CONCAVE), (pid, px, py)
    for px, py in got.values():
        assert not (144.0 < px < 146.0 and py > -23.0), (px, py)


def test_locality_rings_are_disjoint_and_assignment_unique(spark):
    """The locality set promises DISJOINT rings (each point in at most
    one); verify geometrically against the pure-Python caster over a
    dense probe grid, and verify the banded query emits at most one
    ring per point and matches the Python assignment per fixture
    point."""
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _LOCALITIES,
        _points,
    )

    # dense-grid disjointness: no probe point sits in two rings
    for gy in range(-290, -90, 3):
        for gx in range(1380, 1540, 3):
            px, py = gx / 10.0, gy / 10.0
            hits = [
                loc
                for loc, ring in _LOCALITIES.items()
                if _raycast_python(px, py, ring)
            ]
            assert len(hits) <= 1, (px, py, hits)

    got = {}
    for r in QUERIES["geo_locality_assign_banded"](spark, SF_SMOKE).collect():
        assert r["point_id"] not in got, f"point {r['point_id']} in two rings"
        got[r["point_id"]] = r["loc_id"]
    assert got, "no assignments — degenerate fixture"
    for r in _points(spark, SF_SMOKE).collect():
        expect = [
            loc
            for loc, ring in _LOCALITIES.items()
            if _raycast_python(r["lon"], r["lat"], ring)
        ]
        assert got.get(r["point_id"]) == (expect[0] if expect else None)


def _inside_multiring(px, py, rings):
    """Even-odd parity over ALL rings of a MultiPolygon: XOR of the
    single-ring raycast — inside a shell but also inside one of its
    holes flips back to outside."""
    inside = False
    for ring in rings:
        if _raycast_python(px, py, ring):
            inside = not inside
    return inside


def test_hole_localities_cover_disjoint_regions():
    """The holed fixture promises pairwise-disjoint COVERED regions
    (after hole subtraction) so each point gets at most one locality;
    verify on a dense probe grid, and verify the key nesting actually
    exists: ENCLAVE's shell sits inside MAIN's hole with a moat."""
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _HOLE_LOCALITIES,
    )

    for gy in range(-29000, -27500, 27):  # lat step 0.027
        for gx in range(138000, 148500, 190):  # lon step 0.19
            px, py = gx / 1000.0, gy / 1000.0
            hits = [
                loc
                for loc, rings in _HOLE_LOCALITIES.items()
                if _inside_multiring(px, py, rings)
            ]
            assert len(hits) <= 1, (px, py, hits)
    # nesting sanity: ENCLAVE centre is inside MAIN's shell but NOT
    # inside MAIN (hole subtracts it); the moat belongs to nobody
    main = _HOLE_LOCALITIES["MAIN"]
    assert _raycast_python(140.7, -28.62, main[0])  # inside shell
    assert not _inside_multiring(140.7, -28.62, main)  # ...but in hole
    assert _inside_multiring(140.7, -28.62, _HOLE_LOCALITIES["ENCLAVE"])
    # moat point: inside MAIN's hole, outside ENCLAVE
    assert not _inside_multiring(139.7, -28.6, main)
    assert not _inside_multiring(139.7, -28.6, _HOLE_LOCALITIES["ENCLAVE"])
    # the shell notch is outside MAIN (concavity is real)
    assert not _inside_multiring(142.75, -28.37, main)
    # ISLES: island B's hole excluded, both islands included
    isles = _HOLE_LOCALITIES["ISLES"]
    assert _inside_multiring(143.5, -28.2, isles)  # island A
    assert _inside_multiring(145.2, -27.6, isles)  # island B rim
    assert not _inside_multiring(146.0, -27.85, isles)  # island B hole


def test_locality_assign_holes_matches_python_even_odd(spark):
    """The banded multi-ring query must agree with the pure-Python
    even-odd caster on every fixture point: points in a hole get NO
    locality, a point in an enclave-in-a-hole gets the ENCLAVE, island
    parts get their locality, and no point gets two."""
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _HOLE_LOCALITIES,
        _points,
    )

    got = {}
    for r in QUERIES["geo_locality_assign_holes"](spark, SF_SMOKE).collect():
        assert r["point_id"] not in got, f"point {r['point_id']} in two localities"
        got[r["point_id"]] = r["loc_id"]
    assert got, "no assignments — degenerate fixture"
    assert {"MAIN", "ENCLAVE", "ISLES"} <= set(got.values()), sorted(
        set(got.values())
    )
    saw_hole_exclusion = False
    for r in _points(spark, SF_SMOKE).collect():
        px, py = r["lon"], r["lat"]
        expect = [
            loc
            for loc, rings in _HOLE_LOCALITIES.items()
            if _inside_multiring(px, py, rings)
        ]
        assert got.get(r["point_id"]) == (expect[0] if expect else None), (
            r["point_id"],
            px,
            py,
            expect,
        )
        # a fixture point inside MAIN's shell whose hole excludes it
        # (and outside ENCLAVE) proves even-parity exclusion end-to-end
        if (
            not expect
            and _raycast_python(px, py, _HOLE_LOCALITIES["MAIN"][0])
            and _raycast_python(px, py, _HOLE_LOCALITIES["MAIN"][1])
        ):
            saw_hole_exclusion = True
    assert saw_hole_exclusion, "no fixture point exercises the hole"


def test_locality_nearest_fallback_is_total(spark):
    """The fallback query must emit EXACTLY one row per point, agree
    with a pure-Python mirror (even-odd parity, else argmin of clamped
    point-to-segment distance gated at the snap radius), and — the
    r10 verdict gap — the moat points the parity queries silently drop
    must come back assigned via the nearest edge."""
    import math as _math

    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _HOLE_EDGES,
        _HOLE_LOCALITIES,
        _SNAP_D2FP,
        _points,
    )

    def d2fp(px, py, x1, y1, x2, y2):
        dx, dy = x2 - x1, y2 - y1
        t = max(0.0, min(1.0, ((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy)))
        qx, qy = x1 + t * dx, y1 + t * dy
        return int(_math.floor(((px - qx) ** 2 + (py - qy) ** 2) * 1e12 + 0.5))

    def mirror(px, py):
        hit = [
            loc for loc, rings in _HOLE_LOCALITIES.items()
            if _inside_multiring(px, py, rings)
        ]
        if hit:
            return hit[0], "inside"
        d, loc, _ = min(
            (d2fp(px, py, x1, y1, x2, y2), l, eid)
            for l, eid, x1, y1, x2, y2 in _HOLE_EDGES
        )
        return (loc, "nearest") if d <= _SNAP_D2FP else (None, "unassigned")

    rows = QUERIES["geo_locality_assign_nearest_fallback"](
        spark, SF_SMOKE
    ).collect()
    pts = _points(spark, SF_SMOKE).collect()
    got = {}
    for r in rows:
        assert r["point_id"] not in got, f"point {r['point_id']} emitted twice"
        got[r["point_id"]] = (r["loc_id"], r["method"])
    assert len(got) == len(pts), "not total: some point emitted no row"
    for p in pts:
        assert got[p["point_id"]] == mirror(p["lon"], p["lat"]), (
            p["point_id"], p["lon"], p["lat"], got[p["point_id"]],
        )
    # the moat custkeys (inside MAIN's hole, outside ENCLAVE) are the
    # points the parity queries drop — here every one snaps to a
    # nearby boundary (MAIN's hole ring or ENCLAVE's shell)
    moat = [
        p["point_id"] for p in pts
        if _raycast_python(p["lon"], p["lat"], _HOLE_LOCALITIES["MAIN"][1])
        and not _inside_multiring(
            p["lon"], p["lat"], _HOLE_LOCALITIES["ENCLAVE"]
        )
    ]
    assert moat, "fixture lost its moat points"
    for pid in moat:
        loc, method = got[pid]
        assert method == "nearest" and loc in {"MAIN", "ENCLAVE"}, (pid, loc, method)


def test_er_resolve_remaps_variant_links_to_clean_entity(spark):
    """The ER composite must be NON-VACUOUS: some feed records' best
    master is a registry VARIANT (their dirty name derives from it),
    and every one of them must resolve through the name-graph entity
    to the CLEAN record's key; clean-linked records resolve to
    themselves' entity."""
    from cam_location_addressing_feature_service_etl_spark.workload import QUERIES
    from cam_location_addressing_feature_service_etl_spark.workload.geo import (
        _ER_VARIANT_OFFSET,
    )
    from tests.conftest import SF_SMOKE

    rows = QUERIES["er_resolve_entities"](spark, SF_SMOKE).collect()
    assert rows
    via_variant = [r for r in rows if r["master_key"] >= _ER_VARIANT_OFFSET]
    assert via_variant, "no feed row linked via a variant — composite vacuous"
    # every variant link resolves to a clean entity key, specifically
    # the variant's own clean twin (variant key - offset) unless the
    # name graph merged it further down (entity = component MIN)
    for r in via_variant:
        assert r["entity_key"] < _ER_VARIANT_OFFSET, r
        assert r["entity_key"] <= r["master_key"] - _ER_VARIANT_OFFSET, r
    # and entity keys are always component minima: never above the key
    # they resolve from
    assert all(r["entity_key"] <= r["master_key"] for r in rows)
