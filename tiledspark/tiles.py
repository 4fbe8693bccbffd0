"""Deterministic slippy-map (Web-Mercator) tile math — UDF-free Column exprs.

Reference semantics: OsmSharp/tiled-db `Tile.FromWorld` implements the
standard OSM slippy-map scheme (SURVEY.md §1.3, SPEC-PINNED; reference
checkout empty so the closed-form public spec is the frozen authority):

    lat clamped to [-85.05112878, 85.05112878]; lon normalized to [-180, 180)
    n = 2^zoom
    x = floor((lon + 180) / 360 * n),                      clamped to [0, n-1]
    y = floor((1 - asinh(tan(radians(lat))) / pi) / 2 * n), clamped to [0, n-1]

tile_id packing (SPEC-PINNED, SURVEY.md §1.3):
    tile_id = (zoom << 58) | (x << 29) | y     # fits signed int64 for zoom<=31

Everything here is native Spark Column math — whole-stage-codegen'd,
deterministic, zero Python in the executor hot path. A numpy mirror
(`np_tile_xy`, `np_tile_id`) exists for golden-fixture generation and
property tests; both sides are checked against each other in tests.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# SPEC-PINNED constants (SURVEY.md §1.3)
Z_BASE = 14          # base zoom: every doc gets exactly one Z14 tile
Z_MAX = 18           # split floor
MAX_DOCS_PER_TILE = 4096  # split while count > this; merge when 4-sibling sum < this/4
LAT_CLAMP = 85.05112878
_X_SHIFT = 29
_Z_SHIFT = 58
_MASK29 = (1 << 29) - 1


def _clamp(c: Column, lo: Column, hi: Column) -> Column:
    return F.least(F.greatest(c, lo), hi)


def _pow2(z: Column | int) -> Column:
    """2^z as a double Column (exact for z <= 52; we never exceed 31).

    F.shiftleft only accepts a literal shift amount, so a Column zoom goes
    through pow — still whole-stage-codegen'd JVM math, no UDF.
    """
    if isinstance(z, int):
        return F.lit(float(1 << z))
    return F.pow(F.lit(2.0), z.cast("double"))


def lon_norm_expr(lon: Column) -> Column:
    """Normalize longitude to [-180, 180)."""
    return F.pmod(lon + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


def lat_clamp_expr(lat: Column) -> Column:
    return _clamp(lat, F.lit(-LAT_CLAMP), F.lit(LAT_CLAMP))


def tile_x_expr(lon: Column, zoom: Column | int) -> Column:
    """Slippy-map x for a longitude column at a zoom (column or literal)."""
    n = _pow2(zoom)
    x = F.floor((lon_norm_expr(lon) + F.lit(180.0)) / F.lit(360.0) * n)
    return _clamp(x, F.lit(0).cast("long"), (n - F.lit(1.0)).cast("long")).cast("long")


def tile_y_expr(lat: Column, zoom: Column | int) -> Column:
    """Slippy-map y for a latitude column at a zoom (column or literal)."""
    n = _pow2(zoom)
    latc = lat_clamp_expr(lat)
    y = F.floor(
        (F.lit(1.0) - F.asinh(F.tan(F.radians(latc))) / F.lit(math.pi))
        / F.lit(2.0)
        * n
    )
    return _clamp(y, F.lit(0).cast("long"), (n - F.lit(1.0)).cast("long")).cast("long")


def tile_pack_expr(zoom: Column | int, x: Column, y: Column) -> Column:
    """(zoom, x, y) -> int64 tile_id = (zoom<<58)|(x<<29)|y."""
    z = F.lit(zoom) if isinstance(zoom, int) else zoom
    # literal shift amounts → F.shiftleft is fine here
    return (
        F.shiftleft(z.cast("long"), _Z_SHIFT)
        + F.shiftleft(x.cast("long"), _X_SHIFT)
        + y.cast("long")
    ).cast("long")


def tile_id_expr(lon: Column, lat: Column, zoom: Column | int) -> Column:
    """(lon, lat, zoom) -> packed int64 tile_id in one codegen'd expression."""
    return tile_pack_expr(zoom, tile_x_expr(lon, zoom), tile_y_expr(lat, zoom))


def tile_unpack_exprs(tile_id: Column) -> tuple[Column, Column, Column]:
    """tile_id -> (zoom, x, y) Columns."""
    zoom = F.shiftrightunsigned(tile_id, _Z_SHIFT).cast("int")
    x = F.shiftrightunsigned(tile_id, _X_SHIFT).bitwiseAND(F.lit(_MASK29)).cast("long")
    y = tile_id.bitwiseAND(F.lit(_MASK29)).cast("long")
    return zoom, x, y


def tile_parent_expr(tile_id: Column) -> Column:
    """Quadtree parent: (zoom-1, x>>1, y>>1). Undefined for zoom 0 (returns zoom -1 free tile; callers guard)."""
    zoom, x, y = tile_unpack_exprs(tile_id)
    return tile_pack_expr(zoom - F.lit(1), F.shiftrightunsigned(x, 1), F.shiftrightunsigned(y, 1))


def tile_children_expr(tile_id: Column) -> Column:
    """Quadtree children: array of 4 tile_ids at zoom+1 ({2x,2x+1} x {2y,2y+1})."""
    zoom, x, y = tile_unpack_exprs(tile_id)
    z1 = zoom + F.lit(1)
    x2, y2 = F.shiftleft(x, 1), F.shiftleft(y, 1)
    one = F.lit(1).cast("long")
    return F.array(
        tile_pack_expr(z1, x2, y2),
        tile_pack_expr(z1, x2 + one, y2),
        tile_pack_expr(z1, x2, y2 + one),
        tile_pack_expr(z1, x2 + one, y2 + one),
    )


def tile_ancestor_at_expr(tile_id: Column, anc_zoom: Column) -> Column:
    """Ancestor of a tile at a given (smaller) zoom: shift x,y right by dz."""
    zoom, x, y = tile_unpack_exprs(tile_id)
    dz = (zoom.cast("long") - anc_zoom.cast("long"))
    scale = _pow2(dz)  # x >> dz == floor(x / 2^dz) for x >= 0
    return tile_pack_expr(
        anc_zoom.cast("long"),
        F.floor(x.cast("double") / scale).cast("long"),
        F.floor(y.cast("double") / scale).cast("long"),
    )


def tile_ancestors_expr(tile_id: Column) -> Column:
    """Array of all ancestors from the tile's own zoom down to zoom 0 (inclusive of self).

    UDF-free: F.transform over F.sequence(zoom, 0, -1). General path for
    mixed-zoom columns; when the zoom is known statically use
    tile_ancestors_literal_expr (integer shifts, no double pow per level).
    """
    zoom, _, _ = tile_unpack_exprs(tile_id)
    zooms = F.sequence(zoom, F.lit(0), F.lit(-1))
    return F.transform(zooms, lambda az: tile_ancestor_at_expr(tile_id, az))


def tile_ancestors_literal_expr(
    tile_id: Column, tile_zoom: int, min_zoom: int = 0
) -> Column:
    """Ancestor chain [tile_zoom .. min_zoom] (inclusive of self, descending)
    when the tile's zoom is known STATICALLY: literal-amount integer shifts
    instead of the general path's per-level double pow/floor-divide.

    This is the hot-path variant — the doc-side ancestor explode runs once
    per document per zoom level (10^13 evaluations at 10^12 docs), where
    shiftrightunsigned vs pow()/floor() is a multi-× CPU difference inside
    the same whole-stage-codegen'd Project.
    """
    _, x, y = tile_unpack_exprs(tile_id)
    return F.array(
        *[
            tile_pack_expr(
                z,
                F.shiftrightunsigned(x, tile_zoom - z),
                F.shiftrightunsigned(y, tile_zoom - z),
            )
            for z in range(tile_zoom, min_zoom - 1, -1)
        ]
    )


# ---------------------------------------------------------------------------
# numpy mirror — golden-fixture generation + property tests only (never in a
# Spark hot path; the Column exprs above are the production implementation).
# ---------------------------------------------------------------------------

def np_tile_xy(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << zoom
    lonn = np.mod(lon + 180.0, 360.0) - 180.0
    latc = np.clip(lat, -LAT_CLAMP, LAT_CLAMP)
    x = np.floor((lonn + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((1.0 - np.arcsinh(np.tan(np.radians(latc))) / math.pi) / 2.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def np_tile_pack(zoom, x, y):
    return (
        (np.asarray(zoom, np.int64) << _Z_SHIFT)
        | (np.asarray(x, np.int64) << _X_SHIFT)
        | np.asarray(y, np.int64)
    )


def np_tile_id(lon: np.ndarray, lat: np.ndarray, zoom: int) -> np.ndarray:
    x, y = np_tile_xy(np.asarray(lon, np.float64), np.asarray(lat, np.float64), zoom)
    return np_tile_pack(zoom, x, y)


def np_tile_unpack(tile_id):
    t = np.asarray(tile_id, np.int64)
    return (t >> _Z_SHIFT).astype(np.int32), (t >> _X_SHIFT) & _MASK29, t & _MASK29


def np_tile_parent(tile_id):
    z, x, y = np_tile_unpack(tile_id)
    return ((np.asarray(z, np.int64) - 1) << _Z_SHIFT) | ((x >> 1) << _X_SHIFT) | (y >> 1)
