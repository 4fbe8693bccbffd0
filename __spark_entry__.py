"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``tiledspark`` (this repo). The binding input table
``pages(url, warc_ts, html, text, lang)`` is not part of the driver
testdata, so pipeline queries synthesize it deterministically
(seed 42, FIXTURES.md §2) into a local cache; relational/dedup/
similarity queries run over the driver parquet in ``sf_dir``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SYNTH_CACHE = os.path.join(_REPO, ".synth_cache")


def _pages_path(n_rows: int) -> str:
    from tiledspark import synth

    return synth.ensure_pages(_SYNTH_CACHE, n_rows)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full tile-build pipeline (extract → dedupe → Z14 tile
    assignment → per-tile rollup) over the deterministic sf0.001-scale pages
    corpus (5,000 rows, seed 42). Returns one row per materialized tile."""
    from tiledspark.pipeline import flagship

    return flagship(spark, _pages_path(5_000))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tiledspark.registry import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (omitted → rows-only check)."""
    from tiledspark.registry import build_oracles

    return build_oracles()
