"""Local mirror of the driver's DuckDB-oracle gate: for every registered
query with an oracle, run Spark and DuckDB side-by-side at sf0.01 and compare
row count + column names + order-insensitive stringified values exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from tiledspark.registry import build_oracles, build_queries

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_ORACLES = build_oracles()
_QUERIES = build_queries()


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        try:
            if pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = [tuple(cell(v) for v in rec) for rec in df[cols].itertuples(index=False)]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck_run(_ORACLES[name])
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns differ: spark={sorted(sdf.columns)} duck={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row counts differ: {len(sdf)} vs {len(odf)}"
    s, o = canon(sdf), canon(odf)
    mism = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[0]}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
