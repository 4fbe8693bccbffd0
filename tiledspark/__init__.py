"""tiledspark — a PySpark-native tiled spatial database & join engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of
OsmSharp/tiled-db (reference at /root/reference — empty at survey time; all
semantics derive from the SPEC-PINNED rules in SURVEY.md §1.3 / FIXTURES.md):
deterministic slippy-map tile assignment, quadtree parent/child tile trees
with split/merge snapshots, tile-complete extraction, copy-on-write snapshot
layers — rebuilt Spark-first over Common-Crawl-style web pages, plus the
spatial-join / kNN / raster<->vector / dedup / similarity operator surface
mandated by BASELINE.json (north_star, north_rule).

Design rules (binding, per BASELINE.json input_hint):
- pyspark.sql DataFrame API + vectorized pandas/Arrow UDFs only; no RDDs,
  no per-row Python in hot paths.
- Tile/cell math is native Column expressions wherever possible (whole-stage
  codegen); numpy-in-Arrow-batches where geometry genuinely needs it.
- Every output deterministic: explicit sorts, no order-dependent aggregates,
  identical results at any parallelism (verified local[8] vs local[32]).
"""

__version__ = "0.1.0"

from tiledspark.tiles import (  # noqa: F401
    Z_BASE,
    Z_MAX,
    MAX_DOCS_PER_TILE,
    tile_x_expr,
    tile_y_expr,
    tile_id_expr,
    tile_pack_expr,
    tile_unpack_exprs,
    tile_parent_expr,
    tile_children_expr,
    tile_ancestors_expr,
)
