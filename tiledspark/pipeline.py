"""End-to-end build pipeline (SURVEY.md §3.2 entry point 1).

pages -> extract_coords -> dedupe_latest_by_url -> tile assignment at Z_BASE
-> per-tile aggregation. One shuffle (the groupBy / repartition on tile_id);
everything upstream is narrow, UDF-free, whole-stage codegen.

Scale notes (100 TB design): the tile_id is computed BEFORE the shuffle so
partial aggregation (map-side combine) happens on the scan side; the only
wide exchange hashes on tile_id, which the Zipf-hot-tile salting in
tiledspark.join handles for join workloads. Docs with no coordinates are
filtered before the shuffle (predicate on a derived column — stays in scan
stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiledspark import tiles
from tiledspark.extract import dedupe_latest_by_url, extract_coords


def build_doc_tiles(pages: DataFrame, zoom: int = tiles.Z_BASE) -> DataFrame:
    """pages -> doc_tiles(url, warc_ts, lat, lon, text, lang, tile_id).

    Every geocodable document gets exactly one tile at `zoom` (the reference's
    node→tile assignment, `assign_points_to_tiles`, SURVEY.md op 5).
    """
    pts = dedupe_latest_by_url(extract_coords(pages))
    return (
        pts.where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .withColumn("tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), zoom))
    )


def tile_rollup(doc_tiles: DataFrame) -> DataFrame:
    """Per-tile aggregation (op 21, raster-to-vector): doc counts, distinct
    langs, mean text length. Spark's HashAggregate partial+final IS the
    two-level combiner the north_star names; verified in tests via the
    physical plan.
    """
    z, x, y = tiles.tile_unpack_exprs(F.col("tile_id"))
    return (
        doc_tiles.groupBy("tile_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.countDistinct("lang").alias("n_langs"),
            F.avg(F.length("text")).alias("avg_text_len"),
        )
        .withColumn("zoom", z)
        .withColumn("x", x)
        .withColumn("y", y)
    )


def flagship(spark: SparkSession, pages_path: str) -> DataFrame:
    """The flagship query: tile-build + rollup, deterministically ordered."""
    pages = spark.read.parquet(pages_path)
    return tile_rollup(build_doc_tiles(pages)).orderBy("tile_id")


def vector_to_raster(
    points: DataFrame,
    value_col: str,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Op 22 (vector→raster): burn a point layer onto the 2^zoom × 2^zoom
    Web-Mercator pixel grid — (x, y, n_points, mean_val) per touched pixel.

    The inverse of tile_rollup's raster→vector direction: same single-shuffle
    shape (tile math on the scan side, partial+final HashAggregate on the
    grid key), so the plan is one Exchange regardless of input size.
    """
    return (
        points.where(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select(
            tiles.tile_x_expr(F.col(lon_col), zoom).alias("x"),
            tiles.tile_y_expr(F.col(lat_col), zoom).alias("y"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.avg("_v").alias("mean_val"),
        )
    )
