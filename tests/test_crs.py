"""CRS transform registry vs the reference's pyproj expectations
(/root/reference/tests/test_stac_utils.py:134-156) and the CRS-precedence
chain (stac_utils.py:144-162)."""

import json

import pytest

from stac_populator_spark.functions.crs import (
    transform_to_wgs84,
    x_is_longitude,
)
from stac_populator_spark.sources.cfattrs import parse_cf_document

WKT_0_360 = """
GEOGCRS["WGS 84",
    DATUM["based on WGS 84 ellipsoid",
        ELLIPSOID["WGS 84", 6378137, 298.257223563, LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich", -360, ANGLEUNIT["degree", 0.0174532925199433]],
    CS[ellipsoidal, 3],
    AXIS["geodetic longitude (Lon)", east, ORDER[1],
        ANGLEUNIT["degree", 0.0174532925199433]],
    AXIS["geodetic latitude (Lat)", north, ORDER[2],
        ANGLEUNIT["degree", 0.0174532925199433]],
    AXIS["ellipsoidal height (h)", up, ORDER[3], LENGTHUNIT["metre", 1]]]
"""


def test_identity_4979_latlon_axis_order():
    # reference test_no_change: x holds LATITUDES for EPSG:4979 (lat-first)
    lon, lat, vert = transform_to_wgs84([10, 20], [30, 40], [-10, 12], "EPSG:4979")
    assert list(lat) == [10, 20]
    assert list(lon) == [30, 40]
    assert list(vert) == [-10, 12]
    assert not x_is_longitude("EPSG:4979")
    assert not x_is_longitude(4326)


def test_shifted_longitude_0_360():
    # reference test_from_shifted_longitude: x=[100, 280] → lon [100, -80]
    assert x_is_longitude(WKT_0_360)
    lon, lat, _ = transform_to_wgs84([100, 280], [30, 40], None, WKT_0_360)
    assert list(lon) == pytest.approx([100, -80])
    assert list(lat) == [30, 40]


def test_from_cylindrical_epsg4087():
    # reference test_from_cylindrical
    lon, lat, _ = transform_to_wgs84([10044, 33000], [-235544, 909900], None, "EPSG:4087")
    assert list(lat) == pytest.approx([-2.1159277528264853, 8.173770770203525])
    assert list(lon) == pytest.approx([0.09022678713696472, 0.29644404375944206])


def test_from_nad83_statcan_lambert_epsg3348():
    # reference test_from_NAD83 (same pytest.approx tolerance as upstream;
    # residual vs pyproj is the sub-metre NAD83(CSRS)→WGS84 datum shift)
    lon, lat, _ = transform_to_wgs84(
        [10436931, 5740845], [2093070, 2000000], None, "EPSG:3348"
    )
    assert list(lat) == pytest.approx([38.7545891461986, 53.94358296286908])
    assert list(lon) == pytest.approx([-40.00269171523382, -98.98931749790985])


def test_unregistered_crs_raises():
    # EPSG:28992 (Amersfoort / RD New): oblique stereographic on the
    # Bessel datum — permanently outside the numpy registry (Lambert-93,
    # the previous example here, joined the registry in round 5)
    with pytest.raises(NotImplementedError):
        transform_to_wgs84([0], [0], None, "EPSG:28992")


def test_noncompliant_output_raises():
    with pytest.raises(ValueError):
        transform_to_wgs84([100_000_000], [0], None, "EPSG:4087")


def _doc(cf_attrs: dict, sp: dict | None = None) -> dict:
    doc = {"groups": {"CFMetadata": {"attributes": cf_attrs}}, "access_urls": {}}
    if sp:
        doc["@stac-populator"] = sp
    return doc


def test_precedence_fallback_crs_0360_matches_default_path():
    cf = {
        "geospatial_lon_min": 0.049800001084804535,
        "geospatial_lon_max": 359.99493408203125,
        "geospatial_lat_min": -78.39350128173828,
        "geospatial_lat_max": 89.74176788330078,
    }
    via_fallback = parse_cf_document(_doc(cf, {"fallback_crs": WKT_0_360}))
    via_default = parse_cf_document(_doc(cf))
    # the explicit 0-360 WKT path and the no-CRS default must agree exactly,
    # including the antimeridian-crossing state and golden float digits
    assert via_fallback["bbox"] == via_default["bbox"]
    assert via_fallback["lon_max"] == -0.00506591796875
    assert via_fallback["crosses_am"] is True
    assert via_fallback["geo_error"] is None


def test_precedence_bounds_crs_projected():
    cf = {
        # projected axis order: x=easting (ends up in the lon slots)
        "geospatial_lon_min": 10436931.0,
        "geospatial_lon_max": 5740845.0,
        "geospatial_lat_min": 2093070.0,
        "geospatial_lat_max": 2000000.0,
        "geospatial_bounds_crs": "EPSG:3348",
    }
    rec = parse_cf_document(_doc(cf))
    assert rec["geo_error"] is None
    assert rec["lat_min"] == pytest.approx(38.7545891461986)
    assert rec["lon_min"] == pytest.approx(-40.00269171523382)


def test_force_crs_wins_over_bounds_crs():
    cf = {
        "geospatial_lon_min": 100.0,
        "geospatial_lon_max": 280.0,
        "geospatial_lat_min": 30.0,
        "geospatial_lat_max": 40.0,
        "geospatial_bounds_crs": "EPSG:28992",  # would dead-letter
    }
    rec = parse_cf_document(_doc(cf, {"force_crs": WKT_0_360}))
    assert rec["geo_error"] is None
    assert rec["lon_max"] == pytest.approx(-80.0)


def test_unknown_crs_routes_to_geo_error():
    cf = {
        "geospatial_lon_min": 1.0,
        "geospatial_lon_max": 2.0,
        "geospatial_lat_min": 3.0,
        "geospatial_lat_max": 4.0,
        "geospatial_bounds_crs": "EPSG:28992",
    }
    rec = parse_cf_document(_doc(cf))
    assert rec["geo_error"] is not None
    assert rec["bbox"] is None and rec["geometry"] is None


def test_lcc_inverse_roundtrips_independent_forward():
    # independent verification of the LCC-2SP inverse beyond the two
    # reference points: implement the FORWARD projection (Snyder
    # pp.107-109) here in the test and require inverse(forward(p)) == p to
    # sub-centimetre over random points in the projection's valid domain
    import numpy as np

    from stac_populator_spark.functions.crs import lcc_inverse

    a, f = 6378137.0, 1 / 298.257222101
    lat1, lat2, lat0, lon0 = 49.0, 77.0, 63.390675, -91.866667
    fe, fn = 6200000.0, 3000000.0
    e = np.sqrt(2 * f - f * f)

    def m(phi):
        return np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)

    def t(phi):
        return np.tan(np.pi / 4 - phi / 2) / (
            (1 - e * np.sin(phi)) / (1 + e * np.sin(phi))
        ) ** (e / 2)

    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    F_ = m(p1) / (n * t(p1) ** n)
    rho0 = a * F_ * t(p0) ** n

    def forward(lon_deg, lat_deg):
        phi, lam = np.radians(lat_deg), np.radians(lon_deg)
        rho = a * F_ * t(phi) ** n
        theta = n * (lam - np.radians(lon0))
        x = fe + rho * np.sin(theta)
        y = fn + rho0 - rho * np.cos(theta)
        return x, y

    rng = np.random.default_rng(17)
    lon = rng.uniform(-140, -50, 500)
    lat = rng.uniform(35, 80, 500)
    x, y = forward(lon, lat)
    lon2, lat2_ = lcc_inverse(x, y)
    # sub-centimetre: 1e-9 degrees ≈ 0.1 mm
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2_ - lat).max() < 1e-9


def test_utm_inverse_roundtrips_independent_forward():
    # tm_forward is Snyder's forward series (8-9…8-14), tm_inverse the
    # inverse series (8-17…8-25) — independent expansions; roundtrip
    # agreement over the whole zone pins both
    import numpy as np

    from stac_populator_spark.functions.crs import tm_forward, tm_inverse, utm_params

    p = utm_params(32630)  # UTM zone 30N
    rng = np.random.default_rng(30)
    lon = rng.uniform(-6, 0, 500)  # zone 30 span
    lat = rng.uniform(-80, 84, 500)
    x, y = tm_forward(lon, lat, **p)
    lon2, lat2 = tm_inverse(x, y, **p)
    # series truncation grows toward the zone corners at ±80°+:
    # 2e-8° ≈ 2 mm — far inside pyproj-comparison tolerance
    assert np.abs(lon2 - lon).max() < 2e-8
    assert np.abs(lat2 - lat).max() < 2e-8


def test_utm_anchor_values():
    # natural origin maps exactly to (FE, FN); northing on the central
    # meridian = k0 × WGS84 meridian arc (arc to 40°N = 4,429,529.03 m —
    # derived from the quarter meridian 10,001,965.73 m, a published
    # geodesy constant), matching pyproj's EPSG:32630 output to <1 m
    import numpy as np

    from stac_populator_spark.functions.crs import tm_forward, tm_inverse, transform_to_wgs84

    x, y = tm_forward(np.array([-3.0]), np.array([0.0]))
    assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0]) < 1e-6
    x, y = tm_forward(np.array([-3.0]), np.array([40.0]))
    assert abs(x[0] - 500000.0) < 1e-6
    assert abs(y[0] - 0.9996 * 4429529.03) < 1.0

    # the registry path: EPSG:32630 easting/northing → lon/lat
    lon, lat, _ = transform_to_wgs84(np.array([500000.0]), np.array([4427757.2]),
                                     crs_spec="EPSG:32630")
    assert abs(lon[0] - (-3.0)) < 1e-8
    assert abs(lat[0] - 40.0) < 1e-6


def test_utm_south_false_northing():
    import numpy as np

    from stac_populator_spark.functions.crs import tm_forward, tm_inverse, utm_params

    p = utm_params(32719)  # zone 19S (lon0 = -69, FN = 10,000 km)
    assert p["lon0"] == -69.0 and p["fn"] == 10000000.0
    x, y = tm_forward(np.array([-70.6]), np.array([-33.45]), **p)
    assert y[0] < 10000000.0  # southern hemisphere sits below FN
    lon2, lat2 = tm_inverse(x, y, **p)
    assert abs(lon2[0] - (-70.6)) < 1e-9 and abs(lat2[0] - (-33.45)) < 1e-9


_COMPOUND_UTM_WKT = """COMPD_CS["WGS 84 / UTM zone 30N + EGM96 height",
    PROJCS["WGS 84 / UTM zone 30N",
        GEOGCS["WGS 84", DATUM["WGS_1984",
            SPHEROID["WGS 84",6378137,298.257223563]],
            PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
        PROJECTION["Transverse_Mercator"],
        PARAMETER["latitude_of_origin",0],
        PARAMETER["central_meridian",-3],
        PARAMETER["scale_factor",0.9996],
        PARAMETER["false_easting",500000],
        PARAMETER["false_northing",0],
        UNIT["metre",1]],
    VERT_CS["EGM96 height",
        VERT_DATUM["EGM96 geoid",2005],
        UNIT["metre",1], AXIS["Gravity-related height",UP]]]"""


def test_compound_utm_vertical_passthrough():
    # CompoundCRS (stac_utils.py:146-165, docs/crs.md:28-33): horizontal
    # component transforms, z passes through untouched
    import numpy as np

    from stac_populator_spark.functions.crs import compound_horizontal, transform_to_wgs84

    horiz = compound_horizontal(_COMPOUND_UTM_WKT)
    assert horiz is not None and horiz.startswith("PROJCS") and "VERT_CS" not in horiz
    lon, lat, z = transform_to_wgs84(
        np.array([500000.0]), np.array([4427757.2]), np.array([123.5]),
        crs_spec=_COMPOUND_UTM_WKT,
    )
    assert abs(lon[0] - (-3.0)) < 1e-8 and abs(lat[0] - 40.0) < 1e-6
    assert z[0] == 123.5


def test_compound_utm_item_through_collection_extent(spark):
    # a 3D UTM item flows end-to-end: transform → 6-element bbox → A1
    # z-aware union in collection_extent
    import numpy as np
    import pandas as pd

    from stac_populator_spark.functions.crs import transform_to_wgs84
    from stac_populator_spark.operators.collection_agg import collection_extent

    e = np.array([400000.0, 500000.0, 600000.0])
    n = np.array([4300000.0, 4427757.2, 4500000.0])
    zmins = np.array([10.0, 5.0, 20.0])
    zmaxs = np.array([100.0, 250.0, 80.0])
    lon, lat, _ = transform_to_wgs84(e, n, crs_spec=_COMPOUND_UTM_WKT)
    items = spark.createDataFrame(
        pd.DataFrame(
            {
                "collection_id": ["c"] * 3,
                "lon_min": lon, "lat_min": lat, "lon_max": lon, "lat_max": lat,
                "z_min": zmins, "z_max": zmaxs,
                "datetime": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-03"]),
            }
        )
    )
    row = collection_extent(items).collect()[0]
    bbox = list(row["bbox"])
    assert len(bbox) == 6
    assert bbox[2] == 5.0 and bbox[5] == 250.0  # z union
    assert bbox[0] == min(lon) and bbox[4] == max(lat)


# --- round-4 TM-WKT hardening (ADVICE r3 high): non-WGS84 datums and TM
# variants must RAISE (→ dead-letter route), never silently produce
# wrong coordinates; declared ellipsoid and linear unit must be honored.

_OSGB36_TM_WKT = """PROJCS["OSGB 1936 / British National Grid",
    GEOGCS["OSGB 1936", DATUM["OSGB_1936",
        SPHEROID["Airy 1830",6377563.396,299.3249646]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",49],
    PARAMETER["central_meridian",-2],
    PARAMETER["scale_factor",0.9996012717],
    PARAMETER["false_easting",400000],
    PARAMETER["false_northing",-100000],
    UNIT["metre",1]]"""

_TM_SOUTH_WKT = """PROJCS["Hartebeesthoek94 / Lo29",
    GEOGCS["Hartebeesthoek94", DATUM["Hartebeesthoek94",
        SPHEROID["WGS 84",6378137,298.257223563], TOWGS84[0,0,0,0,0,0,0]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Transverse_Mercator_South_Orientated"],
    PARAMETER["latitude_of_origin",0],
    PARAMETER["central_meridian",29],
    PARAMETER["scale_factor",1],
    PARAMETER["false_easting",0],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""

# NAD83 state-plane-style TM zone in US survey feet; GRS80 ellipsoid,
# null TOWGS84 declared (NAD83≈WGS84 at this tolerance)
_FOOT_TM_WKT = """PROJCS["NAD83 / Fake TM zone (ftUS)",
    GEOGCS["NAD83", DATUM["North_American_Datum_1983",
        SPHEROID["GRS 1980",6378137,298.257222101], TOWGS84[0,0,0,0,0,0,0]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",0],
    PARAMETER["central_meridian",-75],
    PARAMETER["scale_factor",0.9996],
    PARAMETER["false_easting",1640416.666666667],
    PARAMETER["false_northing",0],
    UNIT["Foot_US",0.30480060960121924]]"""


def test_tm_wkt_non_wgs84_datum_raises():
    import numpy as np
    import pytest

    from stac_populator_spark.functions.crs import transform_to_wgs84

    with pytest.raises(NotImplementedError, match="datum"):
        transform_to_wgs84(
            np.array([400000.0]), np.array([100000.0]), crs_spec=_OSGB36_TM_WKT
        )


def test_tm_wkt_south_orientated_raises():
    import numpy as np
    import pytest

    from stac_populator_spark.functions.crs import transform_to_wgs84

    with pytest.raises(NotImplementedError, match="South Orientated"):
        transform_to_wgs84(
            np.array([50000.0]), np.array([3000000.0]), crs_spec=_TM_SOUTH_WKT
        )


def test_tm_wkt_foot_unit_converts():
    # forward-project on GRS80 in metres, express in US survey feet, and
    # check the WKT path (fe declared in feet, UNIT factor applied to x/y)
    # recovers the original lon/lat
    import numpy as np

    from stac_populator_spark.functions.crs import tm_forward, transform_to_wgs84

    ft = 0.30480060960121924
    a_grs80, invf_grs80 = 6378137.0, 298.257222101
    lon_true, lat_true = -74.0, 40.7
    x_m, y_m = tm_forward(
        np.array([lon_true]), np.array([lat_true]),
        a=a_grs80, f=1.0 / invf_grs80, lon0=-75.0, lat0=0.0, k0=0.9996,
        fe=1640416.666666667 * ft, fn=0.0,
    )
    lon, lat, _ = transform_to_wgs84(x_m / ft, y_m / ft, crs_spec=_FOOT_TM_WKT)
    assert abs(lon[0] - lon_true) < 1e-8
    assert abs(lat[0] - lat_true) < 1e-8


def test_tm_wkt_wgs84_ellipsoid_difference_matters():
    # the declared SPHEROID must actually be used: parsing the same x/y
    # with GRS80-vs-intl ellipsoids should differ (guards against a
    # hardcoded-WGS84 regression); GRS80 vs WGS84 agree to <1e-9.
    import numpy as np

    from stac_populator_spark.functions.crs import tm_inverse

    x, y = np.array([500000.0]), np.array([4427757.2])
    base = dict(lon0=-3.0, lat0=0.0, k0=0.9996, fe=500000.0, fn=0.0)
    lon_wgs, lat_wgs = tm_inverse(x, y, a=6378137.0, f=1 / 298.257223563, **base)
    lon_int, lat_int = tm_inverse(x, y, a=6378388.0, f=1 / 297.0, **base)
    assert abs(lat_wgs[0] - lat_int[0]) > 1e-4  # international ellipsoid shifts ~tens of m


# --- round-4: generic conic WKT fallback (VERDICT r3 item 6) — LCC
# 1SP/2SP and Albers parameterized from WKT, same independent-series
# discipline as the UTM work; non-WGS84/NAD83 datums still dead-letter.

_STATCAN_LCC_WKT = """PROJCS["NAD83 / Statistics Canada Lambert",
    GEOGCS["NAD83", DATUM["North_American_Datum_1983",
        SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Lambert_Conformal_Conic_2SP"],
    PARAMETER["standard_parallel_1",49],
    PARAMETER["standard_parallel_2",77],
    PARAMETER["latitude_of_origin",63.390675],
    PARAMETER["central_meridian",-91.866667],
    PARAMETER["false_easting",6200000],
    PARAMETER["false_northing",3000000],
    UNIT["metre",1]]"""

_CONUS_ALBERS_WKT = """PROJCS["NAD83 / Conus Albers",
    GEOGCS["NAD83", DATUM["North_American_Datum_1983",
        SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Albers_Conic_Equal_Area"],
    PARAMETER["standard_parallel_1",29.5],
    PARAMETER["standard_parallel_2",45.5],
    PARAMETER["latitude_of_center",23],
    PARAMETER["longitude_of_center",-96],
    PARAMETER["false_easting",0],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""

_ETRS89_LCC_WKT = """PROJCS["ETRS89-extended / LCC Europe",
    GEOGCS["ETRS89", DATUM["European_Terrestrial_Reference_System_1989",
        SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Lambert_Conformal_Conic_2SP"],
    PARAMETER["standard_parallel_1",35],
    PARAMETER["standard_parallel_2",65],
    PARAMETER["latitude_of_origin",52],
    PARAMETER["central_meridian",10],
    PARAMETER["false_easting",4000000],
    PARAMETER["false_northing",2800000],
    UNIT["metre",1]]"""


def test_generic_lcc_wkt_matches_registered_epsg3348():
    # the SAME reference points as test_from_nad83_statcan_lambert_epsg3348,
    # but routed through the WKT parameter parser instead of the code registry
    lon, lat, _ = transform_to_wgs84(
        [10436931, 5740845], [2093070, 2000000], None, _STATCAN_LCC_WKT
    )
    assert list(lat) == pytest.approx([38.7545891461986, 53.94358296286908])
    assert list(lon) == pytest.approx([-40.00269171523382, -98.98931749790985])


def test_albers_forward_matches_snyder_example():
    # Snyder PP1395 p.292 numerical example (Clarke 1866 ellipsoid):
    # φ=35°N λ=75°W → x=1,885,472.7  y=1,535,925.0
    import numpy as np

    from stac_populator_spark.functions.crs import albers_forward, albers_inverse

    a, f = 6378206.4, 1 / 294.9786982
    x, y = albers_forward(
        np.array([-75.0]), np.array([35.0]), a=a, f=f,
        lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
    )
    assert x[0] == pytest.approx(1885472.7, abs=0.5)
    assert y[0] == pytest.approx(1535925.0, abs=0.5)
    lon, lat = albers_inverse(x, y, a=a, f=f, lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0)
    assert lon[0] == pytest.approx(-75.0, abs=1e-9)
    assert lat[0] == pytest.approx(35.0, abs=1e-9)


def test_albers_wkt_roundtrip():
    import numpy as np

    from stac_populator_spark.functions.crs import albers_forward

    rng = np.random.default_rng(23)
    lon = rng.uniform(-120, -75, 200)
    lat = rng.uniform(25, 48, 200)
    x, y = albers_forward(lon, lat)  # CONUS Albers defaults (GRS80)
    lon2, lat2, _ = transform_to_wgs84(x, y, None, _CONUS_ALBERS_WKT)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_lcc_1sp_with_scale_factor_roundtrip():
    import numpy as np

    from stac_populator_spark.functions.crs import lcc_forward, lcc_inverse

    kw = dict(lat1=46.8, lat2=46.8, lat0=46.8, lon0=2.337229,
              fe=600000.0, fn=200000.0, k0=0.99987742)
    rng = np.random.default_rng(29)
    lon = rng.uniform(-4, 8, 200)
    lat = rng.uniform(42, 51, 200)
    x, y = lcc_forward(lon, lat, **kw)
    lon2, lat2 = lcc_inverse(x, y, **kw)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_conic_wkt_unsafe_datum_raises():
    import numpy as np

    # ETRS89 is not in the WGS84/NAD83/null-TOWGS84 safe set → dead-letter
    with pytest.raises(NotImplementedError, match="datum"):
        transform_to_wgs84(np.array([4000000.0]), np.array([2800000.0]), None, _ETRS89_LCC_WKT)


def test_unknown_projcs_no_longer_slips_into_geographic_branch():
    import numpy as np

    # a PROJCS with an unregistered projection family must raise (the
    # GEOGCS nested inside it used to match the geographic regex)
    wkt = _CONUS_ALBERS_WKT.replace("Albers_Conic_Equal_Area", "Sinusoidal").replace(
        "Albers", "Sinu")
    with pytest.raises((NotImplementedError, ValueError)):
        transform_to_wgs84(np.array([1000000.0]), np.array([2000000.0]), None, wkt)


def test_lcc_wkt_catalog_through_collection_extent(spark):
    # VERDICT r3 item 6 done-criterion: a non-UTM LCC-WKT catalog flows
    # end-to-end through collection_extent with reference-matching values
    import numpy as np
    import pandas as pd

    from stac_populator_spark.operators.collection_agg import collection_extent

    e = np.array([10436931.0, 5740845.0])
    n = np.array([2093070.0, 2000000.0])
    lon, lat, _ = transform_to_wgs84(e, n, crs_spec=_STATCAN_LCC_WKT)
    items = spark.createDataFrame(
        pd.DataFrame(
            {
                "collection_id": ["lcc"] * 2,
                "lon_min": lon, "lat_min": lat, "lon_max": lon, "lat_max": lat,
                "datetime": pd.to_datetime(["2020-01-01", "2020-01-02"]),
            }
        )
    )
    row = collection_extent(items).collect()[0]
    bbox = list(row["bbox"])
    assert bbox[0] == pytest.approx(-98.98931749790985)
    assert bbox[1] == pytest.approx(38.7545891461986)
    assert bbox[2] == pytest.approx(-40.00269171523382)
    assert bbox[3] == pytest.approx(53.94358296286908)


def test_tm_wkt2_full_wgs84_datum_name_accepted():
    # WKT2 spells the datum 'World Geodetic System 1984' (no TOWGS84
    # entry exists in WKT2) — must route through the TM transform, not
    # dead-letter (code-review r4 finding)
    import numpy as np

    wkt2 = """PROJCRS["WGS 84 / UTM zone 30N",
        BASEGEOGCRS["WGS 84",
            DATUM["World Geodetic System 1984",
                ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
            PRIMEM["Greenwich",0]],
        CONVERSION["UTM zone 30N",
            METHOD["Transverse Mercator"],
            PARAMETER["Latitude of natural origin",0],
            PARAMETER["Longitude of natural origin",-3],
            PARAMETER["Scale factor at natural origin",0.9996],
            PARAMETER["False easting",500000],
            PARAMETER["False northing",0]],
        CS[Cartesian,2],
        AXIS["(E)",east], AXIS["(N)",north],
        LENGTHUNIT["metre",1]]"""
    lon, lat, _ = transform_to_wgs84(
        np.array([500000.0]), np.array([4427757.2]), None, wkt2
    )
    assert abs(lon[0] - (-3.0)) < 1e-8 and abs(lat[0] - 40.0) < 1e-6


def test_wkt2_per_parameter_lengthunit_scales_fe_independently():
    # ADVICE r4: WKT2 lets each PARAMETER carry its OWN LENGTHUNIT. A CS
    # in metres with a false_easting declared in US survey feet must scale
    # fe by the foot factor while x/y stay metre-scaled — and the
    # PARAMETER-embedded unit must NOT leak into the axis-unit scan.
    import numpy as np

    from stac_populator_spark.functions.crs import (
        _tm_wkt_params,
        _wkt_linear_unit,
        tm_forward,
        transform_to_wgs84,
    )

    ft = 0.30480060960121924
    wkt2 = """PROJCRS["WGS 84 / mixed-unit TM",
        BASEGEOGCRS["WGS 84",
            DATUM["World Geodetic System 1984",
                ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
            PRIMEM["Greenwich",0]],
        CONVERSION["TM mixed units",
            METHOD["Transverse Mercator"],
            PARAMETER["Latitude of natural origin",0],
            PARAMETER["Longitude of natural origin",-75],
            PARAMETER["Scale factor at natural origin",0.9996],
            PARAMETER["False easting",1640416.666666667,
                LENGTHUNIT["US survey foot",0.30480060960121924]],
            PARAMETER["False northing",0]],
        CS[Cartesian,2],
        AXIS["(E)",east], AXIS["(N)",north],
        LENGTHUNIT["metre",1]]"""
    assert _wkt_linear_unit(wkt2) == 1.0  # axis unit untouched by the PARAMETER's foot
    params = _tm_wkt_params(wkt2)
    assert abs(params["fe"] - 1640416.666666667 * ft) < 1e-6  # = 500000 m
    assert params["unit"] == 1.0

    # end-to-end: x/y in metres, fe in feet → WGS84 roundtrip
    lon_true, lat_true = -74.0, 40.7
    x_m, y_m = tm_forward(
        np.array([lon_true]), np.array([lat_true]),
        a=6378137.0, f=1.0 / 298.257223563, lon0=-75.0, lat0=0.0, k0=0.9996,
        fe=1640416.666666667 * ft, fn=0.0,
    )
    lon, lat, _ = transform_to_wgs84(x_m, y_m, crs_spec=wkt2)
    assert abs(lon[0] - lon_true) < 1e-8
    assert abs(lat[0] - lat_true) < 1e-8


def test_wkt1_foot_axis_unit_still_scales_fe_when_no_parameter_unit():
    # regression guard for the fix above: WKT1 has no per-parameter units;
    # fe declared in the CS axis unit (feet) must still scale by it
    from stac_populator_spark.functions.crs import _tm_wkt_params

    ft = 0.30480060960121924
    params = _tm_wkt_params(_FOOT_TM_WKT)
    assert abs(params["fe"] - 1640416.666666667 * ft) < 1e-6
    assert abs(params["unit"] - ft) < 1e-15


# --- pyproj optional-wheel seam (VERDICT r4 ask #4) ----------------------

# MODIS Sinusoidal: a real catalog CRS the numpy registry does not (and
# will not) cover — custom authalic sphere, pseudocylindrical method.
# (Polar Stereographic, the previous example here, joined the registry
# in r5 — tests/test_polar_mercator.py owns that family now.)
_OUT_OF_REGISTRY_WKT = """PROJCS["MODIS Sinusoidal",
    GEOGCS["Unknown datum based upon the custom spheroid",
        DATUM["Not_specified_based_on_custom_spheroid",
            SPHEROID["Custom spheroid",6371007.181,0]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Sinusoidal"],
    PARAMETER["longitude_of_center",0],
    PARAMETER["false_easting",0],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""


class _FakePlateCarreeTransformer:
    calls = 0

    def transform(self, x, y):
        import numpy as np

        from stac_populator_spark.functions.crs import DEG_M

        _FakePlateCarreeTransformer.calls += 1
        return np.asarray(x) / DEG_M, np.asarray(y) / DEG_M


class _FakePyproj:
    class CRS:
        @staticmethod
        def from_user_input(spec):
            return spec

    class Transformer:
        @staticmethod
        def from_crs(src, dst, always_xy=False):
            assert always_xy and dst == "EPSG:4326"
            return _FakePlateCarreeTransformer()


def test_pyproj_seam_absent_branch_dead_letters_with_install_hint():
    # this sandbox has no pyproj wheel: out-of-registry CRSs must keep
    # dead-lettering, and the error must name the wheel that would fix it
    import numpy as np
    import pytest

    from stac_populator_spark.functions import crs

    if crs._try_pyproj() is not None:
        pytest.skip("pyproj wheel present — absent branch not reachable")
    with pytest.raises(NotImplementedError, match="pyproj"):
        crs.transform_to_wgs84(
            np.array([0.0]), np.array([1000.0]), crs_spec=_OUT_OF_REGISTRY_WKT
        )


def test_pyproj_seam_present_branch_transforms_dead_letter_crs(monkeypatch):
    # wheel "installed" (fake module): a CRS the registry dead-letters now
    # transforms through Transformer.from_crs(..., always_xy=True)
    import numpy as np

    from stac_populator_spark.functions import crs

    monkeypatch.setattr(crs, "_PYPROJ", _FakePyproj)
    crs._pyproj_transformer.cache_clear()
    try:
        lon, lat, _ = crs.transform_to_wgs84(
            np.array([crs.DEG_M * 10.0]), np.array([crs.DEG_M * 45.0]),
            crs_spec=_OUT_OF_REGISTRY_WKT,
        )
        assert abs(lon[0] - 10.0) < 1e-9 and abs(lat[0] - 45.0) < 1e-9
    finally:
        crs._pyproj_transformer.cache_clear()


def test_pyproj_present_registry_stays_primary(monkeypatch):
    # registered CRSs must NOT route through pyproj even when the wheel
    # exists — the numpy registry is deterministic and already validated
    import numpy as np

    from stac_populator_spark.functions import crs

    monkeypatch.setattr(crs, "_PYPROJ", _FakePyproj)
    crs._pyproj_transformer.cache_clear()
    before = _FakePlateCarreeTransformer.calls
    try:
        lon, lat, _ = crs.transform_to_wgs84(
            np.array([500000.0]), np.array([4427757.2]), crs_spec="EPSG:32633"
        )
        assert _FakePlateCarreeTransformer.calls == before  # untouched
        assert abs(lat[0] - 40.0) < 1e-6
    finally:
        crs._pyproj_transformer.cache_clear()


def test_pyproj_parity_on_registry_families():
    # with a REAL wheel: registry-vs-pyproj parity on the covered families
    # (runs wherever pyproj is installed; documents the contract here)
    import numpy as np
    import pytest

    from stac_populator_spark.functions import crs

    pp = crs._try_pyproj()
    if pp is None:
        pytest.skip("no pyproj wheel in this environment")
    cases = [
        ("EPSG:32633", np.array([500000.0, 350000.0]), np.array([4427757.2, 5000000.0])),
        ("EPSG:3348", np.array([7000000.0]), np.array([1500000.0])),
        ("EPSG:4087", np.array([1113194.9]), np.array([2226389.8])),
    ]
    for spec, x, y in cases:
        lon_r, lat_r, _ = crs.transform_to_wgs84(x, y, crs_spec=spec)
        t = pp.Transformer.from_crs(
            pp.CRS.from_user_input(spec), "EPSG:4326", always_xy=True
        )
        lon_p, lat_p = t.transform(x, y)
        np.testing.assert_allclose(lon_r, lon_p, atol=1e-6)
        np.testing.assert_allclose(lat_r, lat_p, atol=1e-6)
