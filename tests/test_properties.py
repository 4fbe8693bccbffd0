"""Property-based tests (hypothesis) for the SPEC-PINNED numpy kernels —
no Spark session needed, so hundreds of generated cases run in seconds.
Derandomized: the same example set every run (CI determinism)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tiledspark import tiles
from tiledspark.geom import np_points_in_polygon, np_points_in_ring

SETTINGS = settings(max_examples=300, derandomize=True, deadline=None)

lats = st.floats(-89.9, 89.9, allow_nan=False, allow_infinity=False)
lons = st.floats(-180.0, 180.0, allow_nan=False, allow_infinity=False)
zooms = st.integers(0, 18)


@SETTINGS
@given(lats, lons, zooms)
def test_tile_xy_in_range_and_pack_roundtrip(lat, lon, z):
    """x/y always land in [0, 2^z); pack∘unpack is the identity."""
    x, y = tiles.np_tile_xy(np.array([lon]), np.array([lat]), z)
    n = 1 << z
    assert 0 <= x[0] < n and 0 <= y[0] < n
    tid = tiles.np_tile_pack(z, x, y)
    z2, x2, y2 = tiles.np_tile_unpack(tid)
    assert (int(z2[0]), int(x2[0]), int(y2[0])) == (z, int(x[0]), int(y[0]))


@SETTINGS
@given(lats, lons, st.integers(1, 18))
def test_tile_parent_consistency(lat, lon, z):
    """The parent of a point's tile at z IS the point's tile at z-1 — the
    quadtree algebra every rollup and ancestor explode relies on."""
    deep = tiles.np_tile_id(np.array([lon]), np.array([lat]), z)
    shallow = tiles.np_tile_id(np.array([lon]), np.array([lat]), z - 1)
    assert int(tiles.np_tile_parent(deep)[0]) == int(shallow[0])


@SETTINGS
@given(lats, st.floats(-180.0, 178.9), zooms)
def test_tile_xy_monotone_in_lon(lat, lon, z):
    """Moving strictly east never decreases x — BELOW the antimeridian wrap
    (lon == 180 normalizes to -180 by np.mod, so monotonicity holds only
    within one wrap period; the wrap itself is covered by the roundtrip
    property above)."""
    lon2 = lon + 1.0
    x1, _ = tiles.np_tile_xy(np.array([lon]), np.array([lat]), z)
    x2, _ = tiles.np_tile_xy(np.array([lon2]), np.array([lat]), z)
    assert x2[0] >= x1[0]


def _convex_ring(center_lat, center_lon, radius, n_pts):
    ang = np.linspace(0.0, 2.0 * math.pi, n_pts, endpoint=False)
    ring = np.stack(
        [center_lat + radius * np.sin(ang), center_lon + radius * np.cos(ang)],
        axis=1,
    )
    return np.vstack([ring, ring[:1]])


@SETTINGS
@given(
    st.floats(-60.0, 60.0),
    st.floats(-150.0, 150.0),
    st.floats(1.0, 15.0),
    st.integers(3, 24),
)
def test_pip_centroid_inside_far_point_outside(clat, clon, radius, n_pts):
    """For a convex (circle-sampled) ring: the center is inside; a point a
    full diameter beyond the bbox is outside — for every generated shape."""
    ring = _convex_ring(clat, clon, radius, n_pts)
    inside = np_points_in_polygon(np.array([clat]), np.array([clon]), ring)
    assert bool(inside[0])
    far = np_points_in_polygon(
        np.array([clat]), np.array([clon + 3.0 * radius]), ring
    )
    assert not bool(far[0])


@SETTINGS
@given(
    st.floats(-60.0, 60.0),
    st.floats(-150.0, 150.0),
    st.floats(1.0, 15.0),
    st.integers(3, 24),
    st.floats(0.0, 2.0 * math.pi),
)
def test_pip_vertex_on_boundary_inclusive(clat, clon, radius, n_pts, theta):
    """SPEC-PINNED edge rule under generation: every ring VERTEX — an exact
    boundary point — tests inside, at any polygon size/arity."""
    ring = _convex_ring(clat, clon, radius, n_pts)
    vi = int(theta / (2.0 * math.pi) * n_pts) % n_pts
    v = ring[vi]
    assert bool(np_points_in_ring(np.array([v[0]]), np.array([v[1]]), ring[:, 0], ring[:, 1])[0])
