"""Pure-numpy CRS → WGS84 transforms behind the ``to_wgs84`` seam.

The reference reprojects arbitrary CRSs with pyproj
(/root/reference/STACpopulator/stac_utils.py:110-138) and tests four
cases (tests/test_stac_utils.py:134-156): identity EPSG:4326/4979,
0-360-shifted-longitude WGS84 (a WKT with ``PRIMEM["Greenwich", -360]``),
EPSG:4087 (WGS 84 / World Equidistant Cylindrical) and EPSG:3348
(NAD83(CSRS) / Statistics Canada Lambert). No pyproj wheel ships in this
sandbox, so those tested transforms are implemented here from the public
projection formulas (Snyder, *Map Projections — A Working Manual*, USGS
PP 1395: eqc p.90, LCC-2SP pp.107-109); results match the reference's
pyproj expectations within its own comparison tolerance (pytest.approx
rel 1e-6 — the residual is the sub-metre NAD83(CSRS)→WGS84 datum shift,
which pyproj's hub path also treats as null for most transforms).

``transform_to_wgs84`` is the registry seam: a real pyproj transformer
drops in with the same signature for CRSs outside the registry.

Axis-order handling mirrors GeoData.x_is_longitude (stac_utils.py:96-108):
a regex over the first AXIS entry of a WKT (``(^|\\s)lon`` on name/abbrev
or direction east/west); EPSG geographic codes default to lat-first,
projected codes to easting-first.
"""

from __future__ import annotations

import re

import numpy as np

WGS84_A = 6378137.0
DEG_M = WGS84_A * np.pi / 180.0  # metres per degree on the WGS84 equator
GRS80_F = 1.0 / 298.257222101


def _wrap_lon(lon: np.ndarray) -> np.ndarray:
    """Normalize to (-180, 180] the way pyproj renders shifted meridians."""
    return ((np.asarray(lon, dtype=np.float64) + 180.0) % 360.0) - 180.0


def lcc_inverse(
    x,
    y,
    a: float = WGS84_A,
    f: float = GRS80_F,
    lat1: float = 49.0,
    lat2: float = 77.0,
    lat0: float = 63.390675,
    lon0: float = -91.866667,
    fe: float = 6200000.0,
    fn: float = 3000000.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Ellipsoidal Lambert Conformal Conic (2SP) inverse — Snyder pp.107-109.
    Defaults are EPSG:3348 (Statistics Canada Lambert, GRS80)."""
    e = np.sqrt(2 * f - f * f)

    def m(phi):
        return np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)

    def t(phi):
        return np.tan(np.pi / 4 - phi / 2) / (
            (1 - e * np.sin(phi)) / (1 + e * np.sin(phi))
        ) ** (e / 2)

    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho0 = a * F * t(p0) ** n

    xp = np.asarray(x, dtype=np.float64) - fe
    yp = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xp, yp)
    theta = np.arctan2(xp, yp)
    tt = (rho / (a * F)) ** (1 / n)
    lon = np.degrees(theta / n) + lon0
    phi = np.pi / 2 - 2 * np.arctan(tt)
    for _ in range(8):  # converges in ~4 iterations to double precision
        phi = np.pi / 2 - 2 * np.arctan(
            tt * ((1 - e * np.sin(phi)) / (1 + e * np.sin(phi))) ** (e / 2)
        )
    return lon, np.degrees(phi)


def eqc_inverse(x, y) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4087 (World Equidistant Cylindrical, lat_ts=0) inverse:
    plate-carrée metres → degrees (Snyder p.90)."""
    return (
        np.asarray(x, dtype=np.float64) / DEG_M,
        np.asarray(y, dtype=np.float64) / DEG_M,
    )


_LON_AXIS_RE = re.compile(r"(^|\s)lon", re.IGNORECASE)


def _spec_text(crs_spec) -> str:
    return str(crs_spec)


def _epsg_code(crs_spec) -> int | None:
    s = _spec_text(crs_spec).strip()
    m = re.fullmatch(r"(?:EPSG:)?(\d{4,5})", s, re.IGNORECASE)
    if m:
        return int(m.group(1))
    m = re.search(r'ID\s*\[\s*"EPSG"\s*,\s*(\d+)\s*\]\s*\]\s*$', s)
    return int(m.group(1)) if m else None


def x_is_longitude(crs_spec) -> bool:
    """First-axis longitude detection mirroring stac_utils.py:100-108."""
    s = _spec_text(crs_spec)
    m = re.search(r'AXIS\s*\[\s*"([^"]*)"\s*,\s*(\w+)', s)
    if m:
        name, direction = m.group(1), m.group(2)
        return bool(_LON_AXIS_RE.search(name)) or direction.lower() in ("east", "west")
    code = _epsg_code(crs_spec)
    if code in (4326, 4979):
        return False  # EPSG geographic: latitude first
    return True  # projected CRSs: easting first


def crs_axis_units(crs_spec) -> list[str]:
    """Per-axis unit names in declaration order (GeoData.x/y/z_units reads
    pyproj's axis_info[i].unit_name; here parsed from the WKT AXIS blocks'
    ANGLEUNIT/LENGTHUNIT entries, with EPSG geographic defaults)."""
    s = _spec_text(crs_spec)
    axis_blocks = re.split(r"AXIS\s*\[", s)[1:]
    units = []
    for block in axis_blocks:
        m = re.search(r'(?:ANGLEUNIT|LENGTHUNIT)\s*\[\s*"([^"]+)"', block)
        if m:
            units.append(m.group(1))
    if units:
        return units
    code = _epsg_code(crs_spec)
    if code == 4326:
        return ["degree", "degree"]
    if code == 4979:
        return ["degree", "degree", "metre"]
    return ["metre", "metre", "metre"]


def crs_reference_system(crs_spec):
    """Datacube ``reference_system``: the EPSG code when one exists, else
    the (whitespace-normalized) WKT — mirroring
    ``crs.to_epsg() or crs.to_wkt()`` (reference datacube.py:158-159; the
    reference's own test asserts its fixture WKT normalizes to exactly
    this, tests/test_cmip6_datacube.py:63-64)."""
    code = _epsg_code(crs_spec)
    if code is not None:
        return code
    return re.sub(r"\n\s+", "", _spec_text(crs_spec)).strip()


def _primem_shift(crs_spec) -> float:
    m = re.search(r'PRIMEM\s*\[\s*"[^"]*"\s*,\s*(-?[\d.]+)', _spec_text(crs_spec))
    return float(m.group(1)) if m else 0.0


def transform_to_wgs84(x, y, z=None, crs_spec="EPSG:4326"):
    """(x, y[, z]) in ``crs_spec`` → (lon, lat, vert) on WGS84.

    Raises NotImplementedError for CRSs outside the registry — the
    documented seam where a pyproj transformer plugs in; callers route
    that to the dead-letter path.
    """
    code = _epsg_code(crs_spec)
    x_lon = x_is_longitude(crs_spec)
    lon_in, lat_in = (x, y) if x_lon else (y, x)

    if code in (4326, 4979) or re.search(r"GEOGCRS|GEOGCS", _spec_text(crs_spec)):
        lon = np.asarray(lon_in, dtype=np.float64)
        shift = _primem_shift(crs_spec)
        if shift:  # e.g. PRIMEM -360: the 0-360 convention
            lon = _wrap_lon(lon + shift)
        lat = np.asarray(lat_in, dtype=np.float64)
    elif code == 4087:
        lon, lat = eqc_inverse(x, y)
    elif code in (3347, 3348):
        lon, lat = lcc_inverse(x, y)
    else:
        raise NotImplementedError(f"no registered transform for CRS {crs_spec!r}")

    if np.any(np.abs(lon) > 180.0 + 1e-9):
        raise ValueError(f"longitude not WGS84-compliant after transform: {lon}")
    if np.any(np.abs(lat) > 90.0 + 1e-9):
        raise ValueError(f"latitude not WGS84-compliant after transform: {lat}")
    vert = None if z is None else np.asarray(z, dtype=np.float64)
    return lon, lat, vert
