"""Property-based roundtrip proofs for the conic/TM CRS families (r4):
for ANY plausible projection parameter set, inverse(forward(p)) must
recover p to sub-centimetre — the forward series are implemented
independently of the inverses (Snyder's forward vs inverse equation
sets), so agreement is evidence both are right, not that one mirrors the
other's bugs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stac_populator_spark.functions.crs import (
    albers_forward,
    albers_inverse,
    lcc_forward,
    lcc_inverse,
    tm_forward,
    tm_inverse,
)

ELLIPSOIDS = [
    (6378137.0, 1 / 298.257223563),  # WGS84
    (6378137.0, 1 / 298.257222101),  # GRS80
    (6378206.4, 1 / 294.9786982),    # Clarke 1866
    (6377563.396, 1 / 299.3249646),  # Airy 1830
]


@settings(max_examples=60, deadline=None)
@given(
    ell=st.sampled_from(ELLIPSOIDS),
    lat1=st.floats(20.0, 60.0),
    dlat2=st.floats(5.0, 25.0),
    lat0=st.floats(10.0, 55.0),
    lon0=st.floats(-170.0, 170.0),
    fe=st.floats(0.0, 8e6),
    fn=st.floats(0.0, 8e6),
    dlon=st.floats(-25.0, 25.0),
    lat=st.floats(15.0, 70.0),
)
def test_lcc_2sp_roundtrip_any_params(ell, lat1, dlat2, lat0, lon0, fe, fn, dlon, lat):
    a, f = ell
    kw = dict(a=a, f=f, lat1=lat1, lat2=lat1 + dlat2, lat0=lat0, lon0=lon0, fe=fe, fn=fn)
    lon = lon0 + dlon
    x, y = lcc_forward(np.array([lon]), np.array([lat]), **kw)
    lon2, lat2 = lcc_inverse(x, y, **kw)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


@settings(max_examples=60, deadline=None)
@given(
    ell=st.sampled_from(ELLIPSOIDS),
    lat1=st.floats(20.0, 55.0),
    dlat2=st.floats(5.0, 25.0),
    lat0=st.floats(10.0, 50.0),
    lon0=st.floats(-170.0, 170.0),
    dlon=st.floats(-30.0, 30.0),
    lat=st.floats(10.0, 65.0),
)
def test_albers_roundtrip_any_params(ell, lat1, dlat2, lat0, lon0, dlon, lat):
    a, f = ell
    kw = dict(a=a, f=f, lat1=lat1, lat2=lat1 + dlat2, lat0=lat0, lon0=lon0)
    lon = lon0 + dlon
    x, y = albers_forward(np.array([lon]), np.array([lat]), **kw)
    lon2, lat2 = albers_inverse(x, y, **kw)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


@settings(max_examples=60, deadline=None)
@given(
    ell=st.sampled_from(ELLIPSOIDS),
    lon0=st.floats(-177.0, 177.0),
    lat0=st.floats(-10.0, 50.0),
    k0=st.floats(0.9994, 1.0001),
    fe=st.floats(0.0, 2e6),
    fn=st.floats(0.0, 1e7),
    dlon=st.floats(-3.0, 3.0),
    lat=st.floats(-75.0, 75.0),
)
def test_tm_roundtrip_any_params(ell, lon0, lat0, k0, fe, fn, dlon, lat):
    a, f = ell
    kw = dict(a=a, f=f, lon0=lon0, lat0=lat0, k0=k0, fe=fe, fn=fn)
    lon = lon0 + dlon
    x, y = tm_forward(np.array([lon]), np.array([lat]), **kw)
    lon2, lat2 = tm_inverse(x, y, **kw)
    assert abs(lon2[0] - lon) < 1e-8 and abs(lat2[0] - lat) < 1e-8


@settings(max_examples=60, deadline=None)
@given(
    ell=st.sampled_from(ELLIPSOIDS),
    lat1=st.floats(-60.0, -20.0),
    dlat2=st.floats(5.0, 25.0),
    lat0=st.floats(-55.0, -10.0),
    lon0=st.floats(-170.0, 170.0),
    fe=st.floats(0.0, 8e6),
    fn=st.floats(0.0, 8e6),
    dlon=st.floats(-25.0, 25.0),
    lat=st.floats(-70.0, -15.0),
)
def test_lcc_2sp_southern_roundtrip(ell, lat1, dlat2, lat0, lon0, fe, fn, dlon, lat):
    # n < 0: Snyder's sign-reversal rule (code-review r4 finding) — every
    # southern-parallels LCC must roundtrip like the northern family
    a, f = ell
    kw = dict(a=a, f=f, lat1=lat1, lat2=lat1 - dlat2, lat0=lat0, lon0=lon0, fe=fe, fn=fn)
    lon = lon0 + dlon
    x, y = lcc_forward(np.array([lon]), np.array([lat]), **kw)
    lon2, lat2 = lcc_inverse(x, y, **kw)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


@settings(max_examples=60, deadline=None)
@given(
    ell=st.sampled_from(ELLIPSOIDS),
    lat1=st.floats(-55.0, -15.0),
    dlat2=st.floats(5.0, 25.0),
    lat0=st.floats(-50.0, -10.0),
    lon0=st.floats(-170.0, 170.0),
    dlon=st.floats(-30.0, 30.0),
    lat=st.floats(-65.0, -10.0),
)
def test_albers_southern_roundtrip(ell, lat1, dlat2, lat0, lon0, dlon, lat):
    a, f = ell
    kw = dict(a=a, f=f, lat1=lat1, lat2=lat1 - dlat2, lat0=lat0, lon0=lon0)
    lon = lon0 + dlon
    x, y = albers_forward(np.array([lon]), np.array([lat]), **kw)
    lon2, lat2 = albers_inverse(x, y, **kw)
    assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9


def test_albers_southern_mirrors_northern():
    # reflection symmetry: the southern projection of (lon, -lat) with
    # mirrored parallels must be the x-mirror/y-negation of the northern
    # projection of (lon, lat) — an independent check that the n<0 branch
    # is the true Snyder geometry, not merely self-consistent
    north = dict(lat1=18.0, lat2=36.0, lat0=24.0, lon0=132.0)
    south = dict(lat1=-18.0, lat2=-36.0, lat0=-24.0, lon0=132.0)
    xn, yn = albers_forward(np.array([137.0]), np.array([30.0]), **north)
    xs, ys = albers_forward(np.array([137.0]), np.array([-30.0]), **south)
    assert abs(xs[0] - xn[0]) < 1e-6
    assert abs(ys[0] + yn[0]) < 1e-6
    lon2, lat2 = albers_inverse(xs, ys, **south)
    assert abs(lon2[0] - 137.0) < 1e-9 and abs(lat2[0] + 30.0) < 1e-9
