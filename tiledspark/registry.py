"""Query registry — the driver's correctness surface (__spark_entry__).

Every implemented operator from SURVEY.md §2 registers here as
(name, spark_fn, oracle_sql?). spark_fn: (SparkSession, sf_dir) -> DataFrame.
oracle_sql: equivalent DuckDB SQL over the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings); None → the driver records a rows-only check.

Conventions that make the driver's order-insensitive value-hash stable:
- every computed column aliased identically on both sides;
- float aggregates rounded (2dp for money sums, 6dp for ratios/transcendental)
  on BOTH sides, so summation-order jitter cannot flip the hash;
- no raw float arrays or non-deterministically ordered collections in
  outputs (collections are sorted then joined to strings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optional DuckDB oracle SQL) under `name`."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_all() -> None:
    # import for side effects: each module registers its queries
    from tiledspark import queries_relational  # noqa: F401
    from tiledspark import queries_extra  # noqa: F401
    from tiledspark import queries_window  # noqa: F401
    from tiledspark import queries_spatial  # noqa: F401
    from tiledspark import queries_text  # noqa: F401
    from tiledspark import queries_vector  # noqa: F401


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(QUERIES)


def build_oracles() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)
