#!/usr/bin/env python
"""Production build job (SURVEY.md §3.2 entry point 1) — submit with:

  spark-submit --py-files dist/tiledspark.zip jobs/build_tiles.py \
      --pages <parquet-or-table-path> --zones <zones-parquet> \
      --store <snapshot-store-root> [--zooms 0..18]

Pipeline: pages scan → extract_coords → dedupe_latest_by_url → Z14 tile
assignment → per-zoom checkpointed tile-count snapshots (resumable) → tile
tree → spatial join → per-tile rollup → snapshot commit with lineage.
At cluster scale the SnapshotStore root lives on shared storage; swap the
manifest layer for Iceberg per tiledspark.snapshot docstring.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--zones", default=None)
    ap.add_argument("--store", required=True)
    ap.add_argument("--z-base", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=256)
    args = ap.parse_args()

    from tiledspark import tiles
    from tiledspark.extract import dedupe_latest_by_url, extract_coords
    from tiledspark.join import spatial_join
    from tiledspark.pipeline import tile_rollup
    from tiledspark.snapshot import SnapshotStore, checkpointed_tile_build
    from tiledspark.tree import build_tile_tree

    spark = SparkSession.builder.appName("tiledspark-build").getOrCreate()
    z_base = args.z_base or tiles.Z_BASE
    store = SnapshotStore(args.store, n_buckets=args.n_buckets)

    pages = spark.read.parquet(args.pages)
    docs = (
        dedupe_latest_by_url(extract_coords(pages))
        .where(F.col("lat").isNotNull())
        .withColumn("tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), z_base))
    )

    # resumable per-zoom count snapshots (op 25)
    committed = checkpointed_tile_build(store, docs, list(range(0, z_base + 1, 2)))

    tree = build_tile_tree(docs)
    tree_sid = store.commit(tree, key_col="tile_id", tag="tile_tree")

    rollup_sid = store.commit(
        tile_rollup(docs), key_col="tile_id", tag="tile_rollup"
    )

    result = {"zoom_snapshots": committed, "tree_snapshot": tree_sid, "rollup": rollup_sid}
    if args.zones:
        zones = spark.read.parquet(args.zones)
        joined = spatial_join(spark, docs.select("url", "lat", "lon"), zones)
        result["join_snapshot"] = store.commit(
            joined.withColumn("join_key", F.col("tile_id")), key_col="tile_id", tag="spatial_join"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
