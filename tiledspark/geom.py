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


# --- quadtree polygon cover -----------------------------------------------------

def _batch_segs_intersect_rects(
    ey1, ex1, ey2, ex2, lat0, lat1, lon0, lon1
) -> np.ndarray:
    """(E,) edges × (T,) rects -> (T,) bool: any segment touches each rect.
    Segment-vs-rect test (bbox reject, endpoint-in, separating axis over
    the rect corners), broadcast over tiles
    (round-4: the per-tile python descent loop dominated build_zone_cells —
    the rect tests are now one (T,E) numpy evaluation per zoom level).
    Chunked over tiles so the (4,T,E) corner tensor stays bounded (~8 MB)
    even for a detailed continental polygon's deep-zoom frontier."""
    cap = max(1, 262_144 // max(len(ey1), 1))
    if len(lat0) > cap:
        return np.concatenate(
            [
                _batch_segs_intersect_rects(
                    ey1, ex1, ey2, ex2,
                    lat0[i : i + cap], lat1[i : i + cap],
                    lon0[i : i + cap], lon1[i : i + cap],
                )
                for i in range(0, len(lat0), cap)
            ]
        )
    la0, la1 = lat0[:, None], lat1[:, None]
    lo0, lo1 = lon0[:, None], lon1[:, None]
    smin_y, smax_y = np.minimum(ey1, ey2)[None, :], np.maximum(ey1, ey2)[None, :]
    smin_x, smax_x = np.minimum(ex1, ex2)[None, :], np.maximum(ex1, ex2)[None, :]
    cand = ~((smax_y < la0) | (smin_y > la1) | (smax_x < lo0) | (smin_x > lo1))
    in0 = (ey1[None, :] >= la0) & (ey1[None, :] <= la1) & (ex1[None, :] >= lo0) & (
        ex1[None, :] <= lo1
    )
    in1 = (ey2[None, :] >= la0) & (ey2[None, :] <= la1) & (ex2[None, :] >= lo0) & (
        ex2[None, :] <= lo1
    )
    hit = cand & (in0 | in1)
    # separating-axis over the 4 rect corners for the remaining candidates
    dx, dy = (ex2 - ex1)[None, :], (ey2 - ey1)[None, :]
    ds = np.stack(
        [
            dx * (cy - ey1[None, :]) - dy * (cx - ex1[None, :])
            for cy, cx in ((la0, lo0), (la0, lo1), (la1, lo0), (la1, lo1))
        ]
    )  # (4, T, E)
    same_side = (ds > 0).all(axis=0) | (ds < 0).all(axis=0)
    hit |= cand & ~same_side
    return hit.any(axis=1)


def np_polygon_cover(
    ring: np.ndarray,
    holes: list[np.ndarray] | None,
    z_join: int,
    z_min: int = 6,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (cell_ids int64[], is_boundary bool[]). Interior cells may be at any
    zoom in [z_min, z_join]; boundary cells are always at z_join.

    Level-by-level vectorized descent (round-4; same cells as the original
    per-tile DFS, order aside): per zoom, ONE batched rect-intersection test
    over every frontier tile and ONE vectorized center-PIP over the
    untouched tiles; crossing tiles expand 4-way into the next level."""
    holes = holes or []
    all_rings = [ring] + holes
    ey1 = np.concatenate([r[:-1, 0] for r in all_rings])
    ex1 = np.concatenate([r[:-1, 1] for r in all_rings])
    ey2 = np.concatenate([r[1:, 0] for r in all_rings])
    ex2 = np.concatenate([r[1:, 1] for r in all_rings])

    lat_min, lat_max = float(ring[:, 0].min()), float(ring[:, 0].max())
    lon_min, lon_max = float(ring[:, 1].min()), float(ring[:, 1].max())

    out_cells: list[np.ndarray] = []
    out_boundary: list[np.ndarray] = []

    x0, y_n = tiles.np_tile_xy(np.array([lon_min]), np.array([lat_max]), z_min)
    x1_, y_s = tiles.np_tile_xy(np.array([lon_max]), np.array([lat_min]), z_min)
    gx = np.arange(int(x0[0]), int(x1_[0]) + 1, dtype=np.int64)
    gy = np.arange(int(y_n[0]), int(y_s[0]) + 1, dtype=np.int64)
    xs = np.repeat(gx, len(gy))
    ys = np.tile(gy, len(gx))

    for z in range(z_min, z_join + 1):
        if xs.size == 0:
            break
        n = 1 << z
        lon0 = xs / n * 360.0 - 180.0
        lon1 = (xs + 1) / n * 360.0 - 180.0
        lat1 = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * ys / n))))
        lat0 = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (ys + 1) / n))))
        crosses = _batch_segs_intersect_rects(
            ey1, ex1, ey2, ex2, lat0, lat1, lon0, lon1
        )
        nc = ~crosses
        if nc.any():
            # untouched by boundary → fully inside or fully outside; center
            # decides (same kernel, one call for the whole level)
            c_in = np_points_in_polygon(
                (lat0[nc] + lat1[nc]) / 2, (lon0[nc] + lon1[nc]) / 2, ring, holes
            )
            if c_in.any():
                out_cells.append(tiles.np_tile_pack(z, xs[nc][c_in], ys[nc][c_in]))
                out_boundary.append(np.zeros(int(c_in.sum()), bool))
        if z == z_join:
            if crosses.any():
                out_cells.append(tiles.np_tile_pack(z, xs[crosses], ys[crosses]))
                out_boundary.append(np.ones(int(crosses.sum()), bool))
            break
        cx, cy = xs[crosses], ys[crosses]
        xs = np.repeat(2 * cx, 4) + np.tile(np.array([0, 1, 0, 1]), len(cx))
        ys = np.repeat(2 * cy, 4) + np.tile(np.array([0, 0, 1, 1]), len(cy))

    if not out_cells:
        return np.array([], np.int64), np.array([], bool)
    return np.concatenate(out_cells), np.concatenate(out_boundary)


# --- native Column point-in-polygon (round 7) -------------------------------
# The same SPEC-PINNED crossing-number + boundary-inclusive test as the
# numpy kernels above, expressed as pure Column HOFs so the spatial join's
# boundary refinement needs no Python worker and no grouped exchange: the
# candidates equi-join the zone geometry (AQE broadcasts a small zone side)
# and filter map-side. Arithmetic mirrors np_points_in_ring term-for-term
# (same operation order, same 1e-12 tolerances) so results are bit-identical
# to the numpy path — the spatial-join golden and the oracled row pin this.

_EPS = 1e-12


def _ring_edges_expr(ring):
    """array<struct<lat,lon>> (open or closed) -> array<struct<y1,x1,y2,x2>>.
    Closes an open ring first (round-4 lesson: an open ring silently drops
    its closing edge)."""
    from pyspark.sql import functions as F

    first, last = F.element_at(ring, 1), F.element_at(ring, -1)
    closed = F.when(
        (first["lat"] == last["lat"]) & (first["lon"] == last["lon"]), ring
    ).otherwise(F.concat(ring, F.array(first)))
    n = F.size(closed)
    return F.zip_with(
        F.slice(closed, 1, n - 1),
        F.slice(closed, 2, n - 1),
        lambda a, b: F.struct(
            a["lat"].alias("y1"),
            a["lon"].alias("x1"),
            b["lat"].alias("y2"),
            b["lon"].alias("x2"),
        ),
    )


def _on_edges_expr(lat, lon, edges):
    from pyspark.sql import functions as F

    def on_edge(e):
        d = (e["x2"] - e["x1"]) * (lat - e["y1"]) - (e["y2"] - e["y1"]) * (
            lon - e["x1"]
        )
        return (
            (F.abs(d) <= _EPS)
            & (lon >= F.least(e["x1"], e["x2"]) - _EPS)
            & (lon <= F.greatest(e["x1"], e["x2"]) + _EPS)
            & (lat >= F.least(e["y1"], e["y2"]) - _EPS)
            & (lat <= F.greatest(e["y1"], e["y2"]) + _EPS)
        )

    return F.exists(edges, on_edge)


def _in_ring_parts_expr(lat, lon, ring):
    """-> (odd_crossings, on_edge) Column pair for one ring."""
    from pyspark.sql import functions as F

    edges = _ring_edges_expr(ring)

    def crossing(e):
        straddle = (e["y1"] > lat) != (e["y2"] > lat)
        # straddle implies y2 != y1, so the division cannot be 0/0; a
        # division by zero on the non-straddle side yields Inf/NaN inside a
        # branch whose AND is already false (matches the numpy np.where)
        x_at = e["x1"] + (lat - e["y1"]) * (e["x2"] - e["x1"]) / (e["y2"] - e["y1"])
        return F.when(straddle & (lon < x_at), 1).otherwise(0)

    odd = F.aggregate(edges, F.lit(0), lambda acc, e: acc + crossing(e)) % 2 == 1
    return odd, _on_edges_expr(lat, lon, edges)


def point_in_polygon_expr(lat, lon, ring, holes=None):
    """Column-native mirror of np_points_in_polygon: inside the outer ring
    (boundary-inclusive) and, per hole, NOT strictly inside it (the hole
    BOUNDARY counts as inside the polygon — SPEC-PINNED edge rule)."""
    from pyspark.sql import functions as F

    odd, edge = _in_ring_parts_expr(lat, lon, ring)
    res = odd | edge
    if holes is not None:

        def ok(h):
            h_odd, h_edge = _in_ring_parts_expr(lat, lon, h)
            return ~(h_odd | h_edge) | h_edge

        res = res & F.forall(F.coalesce(holes, F.array()), ok)
    return res
