#!/usr/bin/env python
"""Measure the round-3 adaptive-start kNN against the round-2 lockstep loop
(VERDICT r2 #8): 1k mixed-density queries (half near the Zipf city clusters,
half in sparse ocean/desert regions) over the sf0.1 synthetic corpus.

The adaptive pre-pass seeds each query's block radius from its ring-0 doc
density, so sparse queries skip their guaranteed-empty early rounds. Results
are identical (exact edge-bound resolution rule); only wall time and round
participation change. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tiledspark import synth  # noqa: E402
from tiledspark.extract import dedupe_latest_by_url, extract_coords  # noqa: E402
from tiledspark.knn import knn_cell_ring  # noqa: E402
from tiledspark.session import get_spark  # noqa: E402


def main() -> None:
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES_N", "600000"))
    n_queries = int(os.environ.get("SPARK_GRAFT_KNN_QUERIES", "1000"))
    spark = get_spark(app_name="knn-adaptive-probe")
    pages = spark.read.parquet(synth.ensure_pages(os.path.join(REPO, ".bench_cache"), n_pages))
    docs = (
        dedupe_latest_by_url(extract_coords(pages))
        .where(F.col("lat").isNotNull())
        .select("url", "lat", "lon")
        .cache()
    )
    docs.count()  # materialize + warm workers

    rng = np.random.default_rng(4242)
    centers = synth.city_centers()
    half = n_queries // 2
    ci = rng.integers(0, len(centers), half)
    dense_lat = centers[ci, 0] + rng.normal(0, 0.05, half)
    dense_lon = centers[ci, 1] + rng.normal(0, 0.05, half)
    sparse_lat = rng.uniform(-55, 65, n_queries - half)
    sparse_lon = rng.uniform(-170, 170, n_queries - half)
    q = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.arange(n_queries),
                "lat": np.concatenate([dense_lat, sparse_lat]),
                "lon": np.concatenate([dense_lon, sparse_lon]),
            }
        )
    ).cache()
    q.count()

    out = {}
    for mode, adaptive in (("lockstep", False), ("adaptive", True)):
        t0 = time.perf_counter()
        n = knn_cell_ring(
            spark, docs, q, k=5, zoom=8, adaptive_start=adaptive
        ).count()
        out[mode] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}
    out["speedup"] = round(out["lockstep"]["sec"] / out["adaptive"]["sec"], 3)
    out["n_queries"] = n_queries
    out["n_pages"] = n_pages
    print(json.dumps(out))


if __name__ == "__main__":
    main()
