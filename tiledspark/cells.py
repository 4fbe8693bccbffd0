"""S2 and H3-lite cell indexes — pure-numpy kernels inside Arrow-vectorized
pandas UDFs (BASELINE.json north_star: "vectorized pandas/Arrow UDF batches
for H3/S2 cell encoding"; no spatial libraries exist in this environment, so
both are implemented against their public specifications — SURVEY.md §1.3).

S2: the standard public scheme (lat/lon → unit sphere → cube face →
quadratic ST transform → 30-bit ij → Hilbert curve position → 64-bit cell
id with the trailing-1 level encoding). The lookup-table Hilbert traversal
follows the publicly documented S2 algorithm (Apache-licensed s2geometry /
s2sphere); everything below is written from that spec, vectorized over numpy
arrays in 4-bit blocks.

H3-lite: SPEC-PINNED fallback (SURVEY.md risk R1) — hex binning on an
axial grid in equirectangular lon/lat space with aperture-sqrt7 scaling per
resolution. Deliberately named h3lite_*: it is a deterministic hexagonal
index with H3-like resolution semantics, NOT bit-compatible with H3.
All kernels are elementwise → batch-size-independent → deterministic at any
parallelism (risk R5).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- S2 lookup tables (public algorithm) -------------------------------------

_LOOKUP_BITS = 4
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.int64
)
_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orientation: int):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup(
            level,
            i + (int(r[index]) >> 1),
            j + (int(r[index]) & 1),
            orig,
            pos + index,
            orientation ^ int(_POS_TO_ORIENTATION[index]),
        )


for _o in (0, _SWAP_MASK, _INVERT_MASK, _SWAP_MASK | _INVERT_MASK):
    _init_lookup(0, 0, 0, _o, 0, _o)

_MAX_LEVEL = 30
_POS_BITS = 2 * _MAX_LEVEL + 1  # 61
_MAX_SIZE = 1 << _MAX_LEVEL


def _xyz_from_latlon(lat: np.ndarray, lon: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    # u/v per face (public S2 face layout)
    u = np.empty_like(x)
    v = np.empty_like(x)
    m0 = face == 0
    u[m0], v[m0] = y[m0] / x[m0], z[m0] / x[m0]
    m1 = face == 1
    u[m1], v[m1] = -x[m1] / y[m1], z[m1] / y[m1]
    m2 = face == 2
    u[m2], v[m2] = -x[m2] / z[m2], -y[m2] / z[m2]
    m3 = face == 3
    u[m3], v[m3] = z[m3] / x[m3], y[m3] / x[m3]
    m4 = face == 4
    u[m4], v[m4] = z[m4] / y[m4], -x[m4] / y[m4]
    m5 = face == 5
    u[m5], v[m5] = -y[m5] / z[m5], -x[m5] / z[m5]
    return face, u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    # S2's quadratic projection (clamped operands so the unselected where-branch
    # never evaluates sqrt of a negative)
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, pos, neg)


def _ij_from_st(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(s * _MAX_SIZE).astype(np.int64), 0, _MAX_SIZE - 1)


def np_s2_leaf_id(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """(lat, lon) -> level-30 S2 cell id, vectorized."""
    x, y, z = _xyz_from_latlon(np.asarray(lat, np.float64), np.asarray(lon, np.float64))
    face, u, v = _face_uv(x, y, z)
    i = _ij_from_st(_st_from_uv(u))
    j = _ij_from_st(_st_from_uv(v))
    n = face << (_POS_BITS - 1)
    bits = face & _SWAP_MASK
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * _LOOKUP_BITS)
        bits &= _SWAP_MASK | _INVERT_MASK
    return n * 2 + 1


def np_s2_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Truncate a cell id to `level` (0..30)."""
    cid = np.asarray(cell_id, np.int64)
    lsb = np.int64(1) << (2 * (_MAX_LEVEL - level))
    return (cid & -lsb) | lsb


def np_s2_cell(lat, lon, level: int) -> np.ndarray:
    return np_s2_parent(np_s2_leaf_id(lat, lon), level)


def np_s2_level(cell_id: np.ndarray) -> np.ndarray:
    cid = np.asarray(cell_id, np.int64)
    lsb = cid & -cid
    trailing = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return (_MAX_LEVEL - trailing // 2).astype(np.int32)


# --- H3-lite (SPEC-PINNED hex binning; see module docstring) ------------------

_H3LITE_BASE_R = 12.0  # degrees, circumradius at res 0
_SQRT7 = math.sqrt(7.0)
_H3_OFF = 1 << 24


def np_h3lite_cell(lat, lon, res: int) -> np.ndarray:
    """Axial hex binning (pointy-top) in lon/lat space, aperture-sqrt7 per res."""
    lat = np.asarray(lat, np.float64)
    lon = np.asarray(lon, np.float64)
    r_hex = _H3LITE_BASE_R / (_SQRT7**res)
    x = lon / r_hex
    y = lat / r_hex
    q = (math.sqrt(3.0) / 3.0) * x - (1.0 / 3.0) * y
    r = (2.0 / 3.0) * y
    # cube rounding
    xx, zz = q, r
    yy = -xx - zz
    rx, ry, rz = np.round(xx), np.round(yy), np.round(zz)
    dx, dy, dz = np.abs(rx - xx), np.abs(ry - yy), np.abs(rz - zz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    qi = rx.astype(np.int64) + _H3_OFF
    ri = rz.astype(np.int64) + _H3_OFF
    return (np.int64(res) << 52) | (qi << 26) | ri


def np_h3lite_unpack(cell):
    c = np.asarray(cell, np.int64)
    res = (c >> 52).astype(np.int32)
    q = ((c >> 26) & ((1 << 26) - 1)) - _H3_OFF
    r = (c & ((1 << 26) - 1)) - _H3_OFF
    return res, q, r


# --- Spark surface: Arrow-vectorized pandas UDFs --------------------------------

def s2_cell_udf(level: int):
    """pandas_udf (lat, lon) -> s2 cell id at `level`."""

    @F.pandas_udf(T.LongType())
    def _f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(np_s2_cell(lat.to_numpy(np.float64), lon.to_numpy(np.float64), level))

    return _f


def h3lite_cell_udf(res: int):
    """pandas_udf (lat, lon) -> h3lite cell id at `res`."""

    @F.pandas_udf(T.LongType())
    def _f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(np_h3lite_cell(lat.to_numpy(np.float64), lon.to_numpy(np.float64), res))

    return _f


def with_cell_indexes(
    df, lat_col: str = "lat", lon_col: str = "lon",
    s2_level: int = 13, h3_res: int = 7,
):
    """Add s2_cell + h3lite_cell columns (one narrow Arrow-batched stage)."""
    return df.withColumn(
        "s2_cell", s2_cell_udf(s2_level)(F.col(lat_col), F.col(lon_col))
    ).withColumn(
        "h3lite_cell", h3lite_cell_udf(h3_res)(F.col(lat_col), F.col(lon_col))
    )
