"""Tile math: golden vectors, pack/unpack roundtrip, quadtree algebra,
Spark Column exprs == numpy mirror (SURVEY.md §5.1/§5.2)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tiledspark import tiles

# hand-checked slippy-map vectors (public OSM wiki formula; SURVEY.md §1.3)
GOLDEN = [
    # lat, lon, zoom, x, y
    (0.0, 0.0, 0, 0, 0),
    (0.0, 0.0, 1, 1, 1),
    (51.5074, -0.1278, 14, 8186, 5448),  # London (tile 14/8186/5448, OSM wiki formula)
    (40.7128, -74.0060, 14, 4823, 6160),  # NYC
    (-33.8688, 151.2093, 14, 15073, 9831),  # Sydney
    (85.0511, -180.0, 14, 0, 0),  # NW corner clamp
    (-85.0511, 179.99999, 14, 16383, 16383),  # SE corner clamp
    (90.0, 0.0, 10, 512, 0),  # pole clamps to y=0
    (-90.0, 0.0, 10, 512, 1023),
    (0.0, 180.0, 10, 0, 512),  # lon=180 normalizes to -180
    (0.0, -180.0, 10, 0, 512),
    (48.8566, 2.3522, 16, 33196, 22546),  # Paris z16
]


def test_numpy_golden_vectors():
    for lat, lon, zoom, ex, ey in GOLDEN:
        x, y = tiles.np_tile_xy(np.array([lon]), np.array([lat]), zoom)
        assert (x[0], y[0]) == (ex, ey), f"({lat},{lon})@z{zoom}: got ({x[0]},{y[0]}) want ({ex},{ey})"


def test_spark_matches_numpy_and_golden(spark):
    pdf = pd.DataFrame(GOLDEN, columns=["lat", "lon", "zoom", "ex", "ey"])
    df = spark.createDataFrame(pdf)
    out = (
        df.withColumn("x", tiles.tile_x_expr(F.col("lon"), F.col("zoom").cast("int")))
        .withColumn("y", tiles.tile_y_expr(F.col("lat"), F.col("zoom").cast("int")))
        .toPandas()
    )
    assert (out["x"] == out["ex"]).all() and (out["y"] == out["ey"]).all()


def test_pack_unpack_roundtrip_property(spark):
    rng = np.random.default_rng(123)
    n = 2000
    lat = rng.uniform(-89.9, 89.9, n)
    lon = rng.uniform(-200.0, 200.0, n)  # includes out-of-range lon (normalization)
    zoom = rng.integers(0, 19, n)
    pdf = pd.DataFrame({"lat": lat, "lon": lon, "zoom": zoom.astype("int32")})
    df = spark.createDataFrame(pdf)
    tid = tiles.tile_id_expr(F.col("lon"), F.col("lat"), F.col("zoom"))
    z2, x2, y2 = tiles.tile_unpack_exprs(F.col("tile_id"))
    out = (
        df.withColumn("tile_id", tid)
        .withColumn("z2", z2)
        .withColumn("x2", x2)
        .withColumn("y2", y2)
        .toPandas()
    )
    # roundtrip: unpack(pack) == components, and matches numpy mirror
    ex, ey = tiles.np_tile_xy(lon, lat, 0)  # recompute per-row below
    for zoom_v in np.unique(zoom):
        m = zoom == zoom_v
        nx, ny = tiles.np_tile_xy(lon[m], lat[m], int(zoom_v))
        sel = out[out["zoom"] == zoom_v].sort_index()
        assert (sel["z2"] == zoom_v).all()
        assert np.array_equal(sel["x2"].to_numpy(), nx)
        assert np.array_equal(sel["y2"].to_numpy(), ny)


def test_parent_child_algebra(spark):
    rng = np.random.default_rng(7)
    n = 500
    lat = rng.uniform(-80, 80, n)
    lon = rng.uniform(-180, 180, n)
    tid = tiles.np_tile_id(lon, lat, tiles.Z_BASE)
    pdf = pd.DataFrame({"tile_id": tid})
    df = spark.createDataFrame(pdf)
    out = (
        df.withColumn("parent", tiles.tile_parent_expr(F.col("tile_id")))
        .withColumn("children_of_parent", tiles.tile_children_expr(F.col("parent")))
        .toPandas()
    )
    # every tile is one of its parent's 4 children
    for _, row in out.iterrows():
        assert row["tile_id"] in list(row["children_of_parent"])
    # numpy parent agrees
    assert np.array_equal(out["parent"].to_numpy(), tiles.np_tile_parent(tid))


def test_ancestors_expr(spark):
    pdf = pd.DataFrame({"tile_id": tiles.np_tile_id(np.array([2.35]), np.array([48.85]), 14)})
    df = spark.createDataFrame(pdf)
    out = df.withColumn("anc", tiles.tile_ancestors_expr(F.col("tile_id"))).toPandas()
    anc = list(out["anc"][0])
    assert len(anc) == 15  # zooms 14..0
    assert anc[0] == pdf["tile_id"][0]
    zs = [int(a) >> 58 for a in anc]
    assert zs == list(range(14, -1, -1))
    # each successive element is the parent of the previous
    for i in range(1, len(anc)):
        assert anc[i] == int(tiles.np_tile_parent(np.int64(anc[i - 1])))


def test_literal_ancestors_equal_general_path(spark):
    """tile_ancestors_literal_expr (integer-shift hot path) must agree with
    the general pow-based tile_ancestors_expr at every zoom."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tiledspark import tiles

    pts = pd.DataFrame(
        {
            "lat": [0.0, 51.5074, -33.8688, 84.0, -84.0, 12.34567],
            "lon": [0.0, -0.1278, 151.2093, 179.999, -179.999, -77.654],
        }
    )
    df = spark.createDataFrame(pts)
    for zoom in (0, 1, 8, 14, 18):
        tid = tiles.tile_id_expr(F.col("lon"), F.col("lat"), zoom)
        got = df.select(
            tiles.tile_ancestors_literal_expr(tid, zoom).alias("lit"),
            tiles.tile_ancestors_expr(tid).alias("gen"),
        ).collect()
        for r in got:
            assert list(r["lit"]) == list(r["gen"]), (zoom, r)
    # partial range [z, min_zoom]
    tid = tiles.tile_id_expr(F.col("lon"), F.col("lat"), 12)
    got = df.select(
        tiles.tile_ancestors_literal_expr(tid, 12, 6).alias("lit"),
        F.slice(tiles.tile_ancestors_expr(tid), 1, 7).alias("gen"),
    ).collect()
    for r in got:
        assert list(r["lit"]) == list(r["gen"])


def test_extract_coords_decoy_parity(spark):
    """extract_coords must implement EXACTLY the SPEC-PINNED grammar on
    adversarial text: decoy "geo:" prefixes not followed by coordinates,
    multiple decoys before a valid token, tokens at string start/end,
    newlines, digit-count violations, and null/empty text. Oracle: Python
    re.search with the same pattern. (Added for the round-6 locate-window
    kernel experiment — kept after its revert because it pins the grammar
    itself, independent of kernel choice.)"""
    import re

    from tiledspark.extract import GEO_RX, extract_coords

    texts = [
        "plain words no token at all",
        "geo:1.234567,2.345678",                                    # token IS the text
        "prefix geo:1.234567,2.345678 suffix",
        "decoy geo:notnumbers then real geo:-12.000001,-123.456789 end",
        "geo: geo:x geo:1.2,3.4 geo:55.000000,-4.999999",           # 3 decoys then valid
        "geo:123.456789,1.000000 oops lat has 3 digits",            # invalid lat → no match
        "geo:12.345678,1234.000000 lon 4 digits",                   # invalid lon → no match
        "geo:1.234567,2.345678geo:9.999999,8.888888",               # adjacent tokens
        "line one\ngeo:7.000001,8.000002\nline three",              # newlines
        "ends with decoy geo:",
        "geo:-1.111111,2.222222",                                   # negative lat at start
        "geo:1.23456,7.890123 five decimals is a decoy",            # 5 decimals → decoy
        "",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: (r["lat"], r["lon"])
        for r in extract_coords(df).select("text", "lat", "lon").collect()
    }
    rx = re.compile(GEO_RX)
    for t in texts:
        m = rx.search(t) if t is not None else None
        want = (float(m.group(1)), float(m.group(2))) if m else (None, None)
        assert got[t] == want, (t, got[t], want)
