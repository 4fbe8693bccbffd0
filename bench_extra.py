#!/usr/bin/env python
"""Round-9 optimization instrument (guide §1): per-query isolation of the
timed bench suite with Spark-job/stage counts and noop-sink timing.

NOT part of the driver contract — bench.py stays the frozen measurement.
This file exists so OPTIMIZATION_r09.md can cite per-operator job counts
(the round-8 decomposition showed 11.4% of pipeline wall is zero-running
driver/action-barrier gaps between ~25 jobs: the job-COUNT term is the
remaining lever, TIMELINE_r8.md).

Method: each timed query runs inside its own job group; job ids are taken
from the status tracker (fence jobs bracket the region so jobs submitted
from worker threads — e.g. ann_lsh_topk's two-arm pool — are counted too);
stages/tasks summed over the group's jobs. Wall time uses the same
`.count()` the frozen bench times, plus an optional noop-sink pass
(SPARK_GRAFT_NOOP=1) that computes every column (guide §1.4).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tiledspark import synth, tiles  # noqa: E402
from tiledspark.extract import dedupe_latest_by_url, extract_coords  # noqa: E402
from tiledspark.session import get_spark  # noqa: E402

BENCH_CACHE = os.path.join(_REPO, ".bench_cache")


def _fence_job_id(sc, tag: str) -> int:
    """Run a 1-task fence job in its own group and return its job id."""
    group = f"fence_{tag}_{time.monotonic_ns()}"
    sc.setJobGroup(group, group)
    sc.parallelize([0], 1).count()
    sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup(group)
    return max(ids) if ids else -1


def measure(spark, name: str, fn):
    """Run fn() (an action) and report wall + job/stage/task counts."""
    sc = spark.sparkContext
    j0 = _fence_job_id(sc, f"{name}_pre")
    sc.setJobDescription(name)
    t0 = time.perf_counter()
    out = fn()
    wall = time.perf_counter() - t0
    sc.setJobDescription(None)
    j1 = _fence_job_id(sc, f"{name}_post")
    tracker = sc.statusTracker()
    jobs = [j for j in range(j0 + 1, j1)]
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    return {
        "wall_sec": round(wall, 3),
        "n_jobs": len(jobs),
        "n_stages": n_stages,
        "n_tasks": n_tasks,
        "result": out,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    only = [q for q in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if q]
    n_pages = int(
        os.environ.get("SPARK_GRAFT_PAGES_N", synth.pages_rows_for_sf_dir(sf_dir))
    )
    spark = get_spark(master=master, app_name="tiledspark-bench-extra")
    zones_path = synth.ensure_zones(BENCH_CACHE)
    pages = spark.read.parquet(synth.ensure_pages(BENCH_CACHE, n_pages))

    if os.environ.get("SPARK_GRAFT_WARMUP", "1") == "1":
        import bench as _b

        _b._warmup(spark, pages, zones_path)

    results: dict[str, dict] = {}

    def run(name, fn):
        if only and name not in only:
            return None
        results[name] = measure(spark, name, fn)
        return results[name].get("result")

    # --- pipeline stages (same construction as bench.py) ---
    from tiledspark.cells import with_cell_indexes

    def _build():
        docs = (
            dedupe_latest_by_url(extract_coords(pages))
            .where(F.col("lat").isNotNull())
            .withColumn(
                "tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), tiles.Z_BASE)
            )
            .select("url", "lat", "lon", "tile_id")
        )
        docs = with_cell_indexes(docs, s2_level=13, h3_res=7)
        docs.cache()
        return docs, docs.count()

    docs = None
    if not only or {"tile_build", "tile_tree", "spatial_join", "knn_cell_ring",
                    "snapshot_commit"} & set(only):
        got = measure(spark, "tile_build", lambda: _build()[1])
        # rebuild the cached frame handle (measure() discarded it)
        docs = (
            dedupe_latest_by_url(extract_coords(pages))
            .where(F.col("lat").isNotNull())
            .withColumn(
                "tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), tiles.Z_BASE)
            )
            .select("url", "lat", "lon", "tile_id")
        )
        docs = with_cell_indexes(docs, s2_level=13, h3_res=7).cache()
        docs.count()
        got.pop("result", None)
        if not only or "tile_build" in only:
            results["tile_build"] = got

    if docs is not None:
        from tiledspark.join import spatial_join
        from tiledspark.tree import build_tile_tree

        run("tile_tree", lambda: build_tile_tree(docs.select("url", "lat", "lon")).count())
        run(
            "spatial_join",
            lambda: spatial_join(
                spark, docs.select("url", "lat", "lon"), spark.read.parquet(zones_path)
            ).count(),
        )

        def _knn():
            import numpy as np
            import pandas as pd

            from tiledspark.knn import knn_cell_ring

            rng = np.random.default_rng(99)
            q = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "query_id": np.arange(20),
                        "lat": rng.uniform(-55, 65, 20),
                        "lon": rng.uniform(-170, 170, 20),
                    }
                )
            )
            return knn_cell_ring(
                spark, docs.select("url", "lat", "lon"), q, k=5, zoom=8
            ).count()

        run("knn_cell_ring", _knn)

    from tiledspark.registry import build_queries

    queries = build_queries()
    for name in (
        "agg_hash_basic",
        "join_inner_hash",
        "window_frame_agg",
        "join_range",
        "dedup_exact",
        "dedup_minhash_lsh",
        "vector_topk_bruteforce",
        "ann_lsh_topk",
    ):
        run(name, lambda n=name: queries[n](spark, sf_dir).count())

    def _commit():
        import shutil
        import tempfile

        from tiledspark.snapshot import SnapshotStore

        d = tempfile.mkdtemp(prefix="benchx_store_")
        try:
            store = SnapshotStore(d, n_buckets=32)
            store.commit(docs, key_col="tile_id", index_key="url")
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return 0

    if docs is not None:
        run("snapshot_commit", _commit)
        docs.unpersist(blocking=True)

    for r in results.values():
        r.pop("result", None)
    total_jobs = sum(r["n_jobs"] for r in results.values())
    print(
        json.dumps(
            {
                "queries": results,
                "total_wall": round(sum(r["wall_sec"] for r in results.values()), 3),
                "total_jobs": total_jobs,
                "sf_dir": sf_dir,
                "master": master,
            }
        )
    )


if __name__ == "__main__":
    main()
