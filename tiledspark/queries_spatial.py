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


# --- ops 1–3 with independent oracle -----------------------------------------

@query(
    "tile_math",
    """
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
           (CAST(13 AS BIGINT) << 58) | ((x >> 1) << 29) | (y >> 1) AS parent_id
    FROM xy
    """,
)
def tile_math(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    lat = (F.abs(F.col("c_acctbal")) % F.lit(140.0)) - F.lit(70.0)
    lon = ((F.col("c_custkey") % 3400) * F.lit(0.1)) - F.lit(170.0)
    df = c.select(
        "c_custkey",
        tiles.tile_x_expr(lon, 14).alias("x"),
        tiles.tile_y_expr(lat, 14).alias("y"),
    )
    tid = tiles.tile_pack_expr(14, F.col("x"), F.col("y"))
    return df.select(
        "c_custkey",
        "x",
        "y",
        tid.alias("tile_id"),
        tiles.tile_parent_expr(tid).alias("parent_id"),
    )


# --- pages pipeline (rows-only; golden-tested in pytest) ----------------------

@query("tile_build_rollup")
def tile_build_rollup(spark, sf_dir):
    """Flagship: extract → dedupe → Z14 assign → per-tile rollup (ops 5, 14,
    21, 23). Rows-only for the driver; byte-exact goldens in tests/."""
    from tiledspark.pipeline import build_doc_tiles, tile_rollup

    return tile_rollup(build_doc_tiles(_synth_pages(spark, sf_dir))).orderBy("tile_id")


@query("dedupe_latest_by_url")
def dedupe_latest_by_url_q(spark, sf_dir):
    """Op 23 over the synthetic crawl corpus: newest crawl per url, with the
    text carried through byte-identically (sha256 proves it downstream)."""
    from tiledspark.extract import dedupe_latest_by_url

    pages = _synth_pages(spark, sf_dir)
    out = dedupe_latest_by_url(pages)
    return out.select("url", "warc_ts", F.sha2(F.col("text"), 256).alias("text_sha"), "lang")


@query("spatial_join_zones")
def spatial_join_zones(spark, sf_dir):
    """Op 17/18: broadcast-or-partitioned spatial hash join with PIP
    refinement over the synthetic pages x zones corpus (rows-only; the
    byte-for-byte golden + brute-force oracle live in pytest)."""
    from tiledspark import synth
    from tiledspark.extract import dedupe_latest_by_url, extract_coords
    from tiledspark.join import spatial_join

    pages = _synth_pages(spark, sf_dir)
    docs = (
        dedupe_latest_by_url(extract_coords(pages))
        .where(F.col("lat").isNotNull())
        .select("url", "lat", "lon")
    )
    zones = spark.read.parquet(synth.ensure_zones(_SYNTH_CACHE))
    return spatial_join(spark, docs, zones).orderBy("zone_id", "url")


@query("knn_cell_ring")
def knn_cell_ring_q(spark, sf_dir):
    """Op 19/20: grid-partitioned kNN via cell-ring expansion, 20 seeded
    query points (rows-only; brute-force oracle in pytest)."""
    import numpy as np
    import pandas as pd

    from tiledspark.extract import dedupe_latest_by_url, extract_coords
    from tiledspark.knn import knn_cell_ring

    pages = _synth_pages(spark, sf_dir)
    docs = (
        dedupe_latest_by_url(extract_coords(pages))
        .where(F.col("lat").isNotNull())
        .select("url", "lat", "lon")
    )
    rng = np.random.default_rng(99)
    queries_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(20),
                "lat": rng.uniform(-55, 65, 20),
                "lon": rng.uniform(-170, 170, 20),
            }
        )
    )
    out = knn_cell_ring(spark, docs, queries_df, k=5, zoom=8)
    return out.select("query_id", "rank", "url", F.round("dist_m", 3).alias("dist_m"))


@query("tile_tree_build")
def tile_tree_build(spark, sf_dir):
    """Op 13: the golden tile-tree artifact (rows-only; frozen-golden in pytest)."""
    from tiledspark.extract import dedupe_latest_by_url, extract_coords
    from tiledspark.tree import build_tile_tree

    pages = _synth_pages(spark, sf_dir)
    docs = dedupe_latest_by_url(extract_coords(pages))
    return build_tile_tree(docs).orderBy("tile_id")


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
