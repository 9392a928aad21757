"""H3-res-7-compatible hexagonal binning (pure numpy, axial coordinates).

The sandbox has no ``h3`` wheel (SURVEY.md §7.0), so this implements a
*compatible-interface* hex index: pointy-top axial hex grid over an
equirectangular lon/lat plane, cell edge sized to match H3 res-7's mean
edge length (~1.22 km ≈ 0.011° at the equator). It deliberately exposes the
same operations the engine needs from H3 — (lon, lat, res) → int64 cell,
k-ring neighborhoods — behind an interface a real ``h3`` wheel could
drop into. It is NOT icosahedral H3; cells are hexagons on the
equirectangular plane, which is exactly what the kNN bucketing and skew
salting need (locality-preserving equal-ish-area bins with a cheap
neighborhood function).

Resolutions mirror H3's sqrt(7) area scaling from the res-7 anchor:
``edge_deg(res) = EDGE7_DEG * sqrt(7) ** (7 - res)``.
"""

from __future__ import annotations

import numpy as np

# H3 res-7 mean hex edge ≈ 1.2207 km; 1° latitude ≈ 111.32 km.
EDGE7_DEG = 1.2207 / 111.32
_SQRT7 = 7.0 ** 0.5
_SQRT3 = 3.0 ** 0.5

_OFFSET = np.int64(1) << np.int64(24)  # axial coords recentered to non-negative
_Q_SHIFT = np.int64(25)
_RES_SHIFT = np.int64(52)


def edge_deg(res: int) -> float:
    """Hex edge length in degrees for a given resolution (res-7 anchored)."""
    return EDGE7_DEG * _SQRT7 ** (7 - res)


def hex_cell(lon_deg, lat_deg, res: int = 7) -> np.ndarray:
    """Vectorized (lon°, lat°) → int64 hex cell id at ``res``.

    Layout: ``[res:6 bits @52][q+2^24:25 bits @25][r+2^24:25 bits @0]``.
    NaN coordinates yield -1 (null-geometry marker).
    """
    size = edge_deg(res)
    x = np.asarray(lon_deg, dtype=np.float64)
    y = np.asarray(lat_deg, dtype=np.float64)
    nan = ~np.isfinite(x) | ~np.isfinite(y)
    x = np.where(nan, 0.0, x)
    y = np.where(nan, 0.0, y)

    # pointy-top axial coords
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size

    # cube rounding
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)

    q = rx.astype(np.int64) + _OFFSET
    r = rz.astype(np.int64) + _OFFSET
    cell = (np.int64(res) << _RES_SHIFT) | (q << _Q_SHIFT) | r
    return np.where(nan, np.int64(-1), cell)


def hex_cell_qr(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (res, q, r)."""
    c = np.asarray(cell, dtype=np.int64)
    res = c >> _RES_SHIFT
    q = ((c >> _Q_SHIFT) & ((np.int64(1) << _Q_SHIFT) - 1)) - _OFFSET
    r = (c & ((np.int64(1) << _Q_SHIFT) - 1)) - _OFFSET
    return res, q, r


def hex_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """cell id → (lon°, lat°) of the hex center (inverse of hex_cell)."""
    res, q, r = hex_cell_qr(cell)
    size = EDGE7_DEG * _SQRT7 ** (7 - res.astype(np.float64))
    x = size * (_SQRT3 * q.astype(np.float64) + _SQRT3 / 2.0 * r.astype(np.float64))
    y = size * (1.5 * r.astype(np.float64))
    return x, y


def kring_offsets(radius: int) -> np.ndarray:
    """All axial (dq, dr) offsets with hex distance ≤ radius, shape (M, 2).

    M = 1 + 3·radius·(radius+1) (7 at radius 1, 19 at radius 2, …).
    """
    offs = []
    for dq in range(-radius, radius + 1):
        for dr in range(max(-radius, -dq - radius), min(radius, -dq + radius) + 1):
            offs.append((dq, dr))
    return np.asarray(offs, dtype=np.int64)


def hex_kring(cell, radius: int = 1) -> np.ndarray:
    """Vectorized k-ring: (N,) cells → (N, M) neighbor cell ids (self
    included). Used to expand one side of the kNN self-join."""
    c = np.asarray(cell, dtype=np.int64)
    res, q, r = hex_cell_qr(c)
    offs = kring_offsets(radius)
    qn = q[:, None] + offs[None, :, 0] + _OFFSET
    rn = r[:, None] + offs[None, :, 1] + _OFFSET
    return (res[:, None] << _RES_SHIFT) | (qn << _Q_SHIFT) | rn
