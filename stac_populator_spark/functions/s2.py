"""Pure-numpy S2 cell-id encoder (quadratic projection, Hilbert curve).

Implements the public S2 cell-id scheme from the published S2 geometry
papers/docs: lat/lon → unit XYZ → cube face + (u,v) → quadratic (s,t) →
30-bit (i,j) → Hilbert-curve position → 64-bit cell id
``[3 face bits][2·level position bits][1][0…]``.

The sandbox has no ``s2``/``s2sphere`` wheel (SURVEY.md §7.0), so this is a
from-scratch vectorized implementation; tests pin determinism, level
arithmetic, round-trip containment and locality. If a real s2 wheel exists
at deploy time it can replace this behind the same (lon, lat, level) →
int64 interface.

All functions are numpy-vectorized — they run inside Arrow-batched pandas
UDFs, never per-row Python.
"""

from __future__ import annotations

import numpy as np

_MAX_LEVEL = 30
_MAX_SIZE = 1 << _MAX_LEVEL  # 2^30 ij cells per face edge

_SWAP = 1
_INVERT = 2
# pos_to_ij[orientation][position] = ij (i*2+j); public S2 Hilbert tables.
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
# ij_to_pos = row-wise inverse of pos_to_ij.
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.int64
)
_POS_TO_ORIENTATION = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)


def _lonlat_to_xyz(lon_deg, lat_deg):
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    clat = np.cos(lat)
    return clat * np.cos(lon), clat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face)

    # u,v per face (public S2 face frames).
    u = np.empty_like(x)
    v = np.empty_like(x)
    m0, m1, m2 = face == 0, face == 1, face == 2
    m3, m4, m5 = face == 3, face == 4, face == 5
    with np.errstate(divide="ignore", invalid="ignore"):
        u[m0], v[m0] = y[m0] / x[m0], z[m0] / x[m0]
        u[m1], v[m1] = -x[m1] / y[m1], z[m1] / y[m1]
        u[m2], v[m2] = -x[m2] / z[m2], -y[m2] / z[m2]
        u[m3], v[m3] = z[m3] / x[m3], y[m3] / x[m3]
        u[m4], v[m4] = z[m4] / y[m4], -x[m4] / y[m4]
        u[m5], v[m5] = -y[m5] / z[m5], -x[m5] / z[m5]
    return face.astype(np.int64), u, v


def _uv_to_st(u):
    # Quadratic projection (S2's default): area-uniform-ish, cheap.
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) ** 2) / 3.0)


def _st_to_ij(s):
    return np.clip((s * _MAX_SIZE).astype(np.int64), 0, _MAX_SIZE - 1)


def s2_cell_id(lon_deg, lat_deg, level: int = 12) -> np.ndarray:
    """Vectorized (lon°, lat°) → int64 S2 cell id at ``level``.

    NaN coordinates yield 0 (an invalid S2 id — the null-geometry marker).
    """
    if not 0 <= level <= _MAX_LEVEL:
        raise ValueError(f"level must be in [0, {_MAX_LEVEL}], got {level}")
    x, y, z = _lonlat_to_xyz(lon_deg, lat_deg)
    nan = ~np.isfinite(x) | ~np.isfinite(y) | ~np.isfinite(z)
    x = np.where(nan, 1.0, x)
    y = np.where(nan, 0.0, y)
    z = np.where(nan, 0.0, z)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    # Hilbert encode, bit pair per level, orientation tracked via tables.
    pos = np.zeros_like(i)
    bits = face & _SWAP
    for k in range(_MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[bits, ij]
        pos = (pos << 2) | p
        bits = bits ^ _POS_TO_ORIENTATION[p]

    id30 = (face.astype(np.uint64) << np.uint64(61)) | (pos.astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    out = (id30 & ~(lsb - np.uint64(1))) | lsb
    out = out.astype(np.int64)
    return np.where(nan, np.int64(0), out)


def s2_level(cell_id) -> np.ndarray:
    """Level of a cell id = 30 - (trailing-zero count / 2)."""
    c = np.asarray(cell_id, dtype=np.uint64)
    lsb = c & (~c + np.uint64(1))
    tz = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (v & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
        big = v != 0
        step = mask & big
        tz = np.where(step, tz + shift, tz)
        v = np.where(step, v >> np.uint64(shift), v)
    return _MAX_LEVEL - tz // 2


def s2_parent(cell_id, level: int) -> np.ndarray:
    """Snap cell ids to a coarser level (standard lsb arithmetic)."""
    c = np.asarray(cell_id, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return ((c & ~(lsb - np.uint64(1))) | lsb).astype(np.int64)


def s2_cell_center(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """Decode cell id → (lon°, lat°) of the cell center. Test-support path
    (inverse of :func:`s2_cell_id`); vectorized."""
    c = np.asarray(cell_id, dtype=np.uint64)
    face = (c >> np.uint64(61)).astype(np.int64)
    lsb = c & (~c + np.uint64(1))
    level = s2_level(c)
    pos = ((c >> np.uint64(1)) & ((np.uint64(1) << np.uint64(60)) - np.uint64(1))).astype(np.int64)

    i = np.zeros(c.shape, dtype=np.int64)
    j = np.zeros(c.shape, dtype=np.int64)
    bits = face & _SWAP
    for k in range(_MAX_LEVEL - 1, -1, -1):
        active = level > (_MAX_LEVEL - 1 - k)
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[bits, p]
        ib, jb = (ij >> 1) & 1, ij & 1
        i = np.where(active, (i << 1) | ib, i << 1)
        j = np.where(active, (j << 1) | jb, j << 1)
        bits = np.where(active, bits ^ _POS_TO_ORIENTATION[p], bits)
    # center offset: half the cell size at this level
    half = np.int64(1) << np.maximum(_MAX_LEVEL - level - 1, 0)
    half = np.where(level >= _MAX_LEVEL, 0, half)
    si = (i + half).astype(np.float64) / _MAX_SIZE
    tj = (j + half).astype(np.float64) / _MAX_SIZE
    u = _st_to_uv(si)
    v = _st_to_uv(tj)

    ones = np.ones_like(u)
    # face frames (inverse of _xyz_to_face_uv):
    #  f0:(1,u,v) f1:(-u,1,v) f2:(-u,-v,1) f3:(-1,-v,-u) f4:(v,-1,-u) f5:(v,u,-1)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [ones, -u, -u, -ones, v, v])
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [u, ones, -v, -v, -ones, u])
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
                  [v, v, ones, -u, -u, -ones])
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / norm, -1.0, 1.0)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat
