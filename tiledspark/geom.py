"""Geometry kernels: ray-casting point-in-polygon + quadtree polygon covering.

All numpy, invoked from Arrow-vectorized grouped-map UDFs (north_star:
"ray-casting point-in-polygon tests" as "vectorized pandas/Arrow UDF
batches"). Kernels are elementwise per point → deterministic at any batch
size / parallelism (SURVEY.md risk R5).

SPEC-PINNED edge rule (FIXTURES.md §4): a point ON any boundary (outer ring
or hole ring) counts as INSIDE. Anti-meridian-crossing polygons are out of
scope (FIXTURES.md §3 — inputs never generate them).

Polygon covering = quadtree descent (the same idea as S2's RegionCoverer):
start at zoom `z_min` tiles over the bbox; a tile fully inside the polygon is
emitted as an interior cell at its (coarse) zoom; a tile crossing the
boundary recurses until `z_join`, where it is emitted as a boundary cell.
Output size is O(perimeter / tile_size) instead of O(area) — the property
that keeps zone_cells broadcast-able at planetary zoom.
"""

from __future__ import annotations

import numpy as np

from tiledspark import tiles


# --- point-in-ring (crossing number), vectorized over points ----------------

def np_points_in_ring(
    plat: np.ndarray, plon: np.ndarray, rlat: np.ndarray, rlon: np.ndarray
) -> np.ndarray:
    """Even-odd crossing test of N points against one closed ring (M+1 pts,
    first == last). Boundary-inclusive (SPEC-PINNED): on-edge → True."""
    plat = np.asarray(plat, np.float64)
    plon = np.asarray(plon, np.float64)
    y1, x1 = rlat[:-1], rlon[:-1]  # edge starts (M,)
    y2, x2 = rlat[1:], rlon[1:]    # edge ends

    py = plat[:, None]  # (N,1)
    px = plon[:, None]

    # crossing-number: edge straddles the horizontal ray at py
    straddle = (y1 > py) != (y2 > py)  # (N,M)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x1 + (py - y1) * (x2 - x1) / np.where(y2 == y1, np.inf, (y2 - y1))
    crossings = straddle & (px < x_at)
    inside = crossings.sum(axis=1) % 2 == 1

    # boundary-inclusive: point collinear with an edge and within its bbox
    d = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    on_line = np.abs(d) <= 1e-12
    within = (
        (px >= np.minimum(x1, x2) - 1e-12)
        & (px <= np.maximum(x1, x2) + 1e-12)
        & (py >= np.minimum(y1, y2) - 1e-12)
        & (py <= np.maximum(y1, y2) + 1e-12)
    )
    on_edge = (on_line & within).any(axis=1)
    return inside | on_edge


def np_points_in_polygon(
    plat: np.ndarray,
    plon: np.ndarray,
    ring: np.ndarray,
    holes: list[np.ndarray] | None = None,
) -> np.ndarray:
    """ring/holes: arrays of shape (M, 2) as (lat, lon) rows, closed.
    Inside = in outer ring and not strictly inside any hole (hole boundary
    counts as inside per the SPEC-PINNED edge rule)."""
    res = np_points_in_ring(plat, plon, ring[:, 0], ring[:, 1])
    for h in holes or []:
        in_hole = np_points_in_ring(plat, plon, h[:, 0], h[:, 1])
        on_hole_edge = _np_points_on_ring_edge(plat, plon, h[:, 0], h[:, 1])
        res = res & (~in_hole | on_hole_edge)
    return res


def _np_points_on_ring_edge(plat, plon, rlat, rlon) -> np.ndarray:
    plat = np.asarray(plat, np.float64)[:, None]
    plon = np.asarray(plon, np.float64)[:, None]
    y1, x1, y2, x2 = rlat[:-1], rlon[:-1], rlat[1:], rlon[1:]
    d = (x2 - x1) * (plat - y1) - (y2 - y1) * (plon - x1)
    on_line = np.abs(d) <= 1e-12
    within = (
        (plon >= np.minimum(x1, x2) - 1e-12)
        & (plon <= np.maximum(x1, x2) + 1e-12)
        & (plat >= np.minimum(y1, y2) - 1e-12)
        & (plat <= np.maximum(y1, y2) + 1e-12)
    )
    return (on_line & within).any(axis=1)


# --- segment × axis-aligned rectangle intersection ---------------------------

def _segs_intersect_rect(y1, x1, y2, x2, lat0, lat1, lon0, lon1) -> bool:
    """True if ANY segment touches rect [lat0,lat1]x[lon0,lon1]."""
    # quick reject: segment bbox vs rect
    smin_y, smax_y = np.minimum(y1, y2), np.maximum(y1, y2)
    smin_x, smax_x = np.minimum(x1, x2), np.maximum(x1, x2)
    cand = ~((smax_y < lat0) | (smin_y > lat1) | (smax_x < lon0) | (smin_x > lon1))
    if not cand.any():
        return False
    y1, x1, y2, x2 = y1[cand], x1[cand], y2[cand], x2[cand]
    # endpoint inside rect
    in0 = (y1 >= lat0) & (y1 <= lat1) & (x1 >= lon0) & (x1 <= lon1)
    in1 = (y2 >= lat0) & (y2 <= lat1) & (x2 >= lon0) & (x2 <= lon1)
    if (in0 | in1).any():
        return True
    # separating-axis: all four rect corners strictly on one side of the line
    cy = np.array([lat0, lat0, lat1, lat1])
    cx = np.array([lon0, lon1, lon0, lon1])
    d = (x2 - x1)[:, None] * (cy[None, :] - y1[:, None]) - (y2 - y1)[:, None] * (
        cx[None, :] - x1[:, None]
    )
    same_side = (d > 0).all(axis=1) | (d < 0).all(axis=1)
    return bool((~same_side).any())


# --- quadtree polygon cover -----------------------------------------------------

def np_polygon_cover(
    ring: np.ndarray,
    holes: list[np.ndarray] | None,
    z_join: int,
    z_min: int = 6,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (cell_ids int64[], is_boundary bool[]). Interior cells may be at any
    zoom in [z_min, z_join]; boundary cells are always at z_join."""
    holes = holes or []
    all_rings = [ring] + holes
    ey1 = np.concatenate([r[:-1, 0] for r in all_rings])
    ex1 = np.concatenate([r[:-1, 1] for r in all_rings])
    ey2 = np.concatenate([r[1:, 0] for r in all_rings])
    ex2 = np.concatenate([r[1:, 1] for r in all_rings])

    lat_min, lat_max = float(ring[:, 0].min()), float(ring[:, 0].max())
    lon_min, lon_max = float(ring[:, 1].min()), float(ring[:, 1].max())

    def tile_bounds(z, x, y):
        n = 1 << z
        lon0 = x / n * 360.0 - 180.0
        lon1 = (x + 1) / n * 360.0 - 180.0
        lat1 = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
        lat0 = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
        return lat0, lat1, lon0, lon1  # lat0 < lat1 (south, north)

    out_cells: list[int] = []
    out_boundary: list[bool] = []

    x0, y_n = tiles.np_tile_xy(np.array([lon_min]), np.array([lat_max]), z_min)
    x1_, y_s = tiles.np_tile_xy(np.array([lon_max]), np.array([lat_min]), z_min)
    stack = [
        (z_min, x, y)
        for x in range(int(x0[0]), int(x1_[0]) + 1)
        for y in range(int(y_n[0]), int(y_s[0]) + 1)
    ]
    while stack:
        z, x, y = stack.pop()
        lat0, lat1, lon0, lon1 = tile_bounds(z, x, y)
        crosses = _segs_intersect_rect(ey1, ex1, ey2, ex2, lat0, lat1, lon0, lon1)
        if crosses:
            if z == z_join:
                out_cells.append(int(tiles.np_tile_pack(z, x, y)))
                out_boundary.append(True)
            else:
                stack.extend(
                    [(z + 1, 2 * x, 2 * y), (z + 1, 2 * x + 1, 2 * y),
                     (z + 1, 2 * x, 2 * y + 1), (z + 1, 2 * x + 1, 2 * y + 1)]
                )
            continue
        # untouched by boundary → fully inside or fully outside; center decides
        c_in = np_points_in_polygon(
            np.array([(lat0 + lat1) / 2]), np.array([(lon0 + lon1) / 2]), ring, holes
        )[0]
        if c_in:
            out_cells.append(int(tiles.np_tile_pack(z, x, y)))
            out_boundary.append(False)

    return np.array(out_cells, np.int64), np.array(out_boundary, bool)
