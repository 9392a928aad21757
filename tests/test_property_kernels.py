"""Property-based kernel tests (hypothesis): S2/hex round-trips and
locality, geometry/bbox laws, PIP vs an independent containment oracle."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stac_populator_spark.functions.geometry import (
    make_bbox,
    to_geometry,
    wgs84_compliant,
)
from stac_populator_spark.functions.hexgrid import hex_cell, hex_center
from stac_populator_spark.functions.pip import points_in_ring
from stac_populator_spark.functions.s2 import s2_cell_center, s2_cell_id, s2_level, s2_parent

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-84.999, max_value=84.999, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lons, lats)
def test_s2_roundtrip_property(lon, lat):
    cid = s2_cell_id(np.array([lon]), np.array([lat]), 12)
    assert s2_level(cid)[0] == 12
    clon, clat = s2_cell_center(cid)
    assert s2_cell_id(clon, clat, 12)[0] == cid[0]
    # parent containment: center of the child re-encodes into the parent
    for lvl in (10, 6, 2):
        assert s2_parent(cid, lvl)[0] == s2_cell_id(clon, clat, lvl)[0]


@settings(max_examples=200, deadline=None)
@given(lons, lats)
def test_hex_roundtrip_property(lon, lat):
    c = hex_cell(np.array([lon]), np.array([lat]), 7)
    clon, clat = hex_center(c)
    assert hex_cell(clon, clat, 7)[0] == c[0]
    # center within ~1.5 edge lengths of the input (hex containment)
    assert abs(clon[0] - lon) < 0.033 and abs(clat[0] - lat) < 0.033


@settings(max_examples=200, deadline=None)
@given(lons, lats, lons, lats)
def test_geometry_laws(lon1, lat1, lon2, lat2):
    lon_min, lon_max = min(lon1, lon2), max(lon1, lon2)
    lat_min, lat_max = min(lat1, lat2), max(lat1, lat2)
    g = to_geometry(lon_min, lat_min, lon_max, lat_max)
    assert g["type"] == "Polygon"  # sorted bounds can never cross
    ring = g["coordinates"][0]
    assert ring[0] == ring[-1] and len(ring) == 5
    assert wgs84_compliant(make_bbox(lon_min, lat_min, lon_max, lat_max))
    # crossing variant: swap → MultiPolygon with both parts inside ranges
    if lon_min != lon_max:
        g2 = to_geometry(lon_max, lat_min, lon_min, lat_max)
        assert g2["type"] == "MultiPolygon"
        west, east = g2["coordinates"]
        assert max(p[0] for p in west[0]) == 180.0
        assert min(p[0] for p in east[0]) == -180.0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(lons, lats), min_size=3, max_size=8),
    st.lists(st.tuples(lons, lats), min_size=1, max_size=20),
)
def test_pip_matches_shoelace_winding_oracle(poly, pts):
    # close the ring
    ring = [list(p) for p in poly] + [list(poly[0])]
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    got = points_in_ring(lon, lat, ring)

    # independent per-point even-odd oracle (scalar loop, different code path)
    def inside(x, y):
        c = False
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            if (y1 > y) != (y2 > y):
                xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if x < xint:
                    c = not c
        return c

    expected = [inside(x, y) for x, y in pts]
    assert got.tolist() == expected


@settings(max_examples=150, deadline=None)
@given(lons, lats)
def test_icosa_cell_deterministic_and_wraps(lon, lat):
    from stac_populator_spark.functions.icosa import icosa_cell, icosa_components

    c1 = icosa_cell(np.array([lon]), np.array([lat]), 7)[0]
    c2 = icosa_cell(np.array([lon]), np.array([lat]), 7)[0]
    assert c1 == c2 and c1 > 0
    res, face, _, _ = icosa_components(c1)
    assert res[0] == 7 and 0 <= face[0] < 20
    # longitude wrap: lon and lon±360 are the same sphere point → same cell
    wrapped = ((lon + 180.0) % 360.0) - 180.0
    assert icosa_cell(np.array([wrapped]), np.array([lat]), 7)[0] == c1


@settings(max_examples=100, deadline=None)
@given(lons, lats)
def test_icosa_center_within_cell_radius(lon, lat):
    from stac_populator_spark.functions.geometry import haversine_km
    from stac_populator_spark.functions.icosa import EDGE7_RAD, icosa_cell, icosa_center

    c = icosa_cell(np.array([lon]), np.array([lat]), 7)
    clon, clat = icosa_center(c)
    d = haversine_km(np.array([lon]), np.array([lat]), clon, clat)[0]
    # every point lies within a distortion-stretched circumradius of its
    # cell center (1.6× covers gnomonic compression at face edges)
    assert d < 1.6 * EDGE7_RAD * 6371.0088
