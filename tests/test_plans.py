"""Physical-plan checks (SURVEY.md §4): predicate pushdown reaches the
parquet scan, aggregates are two-level (partial+final), small dims broadcast,
and the flagship pipeline keeps tile math inside whole-stage codegen."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tiledspark.registry import build_queries

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
_Q = build_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = _Q["scan_project_filter"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "IsNotNull(l_quantity)" in plan or "GreaterThan(l_quantity" in plan, plan[:2000]
    # column pruning: scan must not read unprojected columns like l_comment-ish ones
    assert "l_tax" not in plan.split("ReadSchema")[-1]


def test_agg_is_two_level(spark):
    df = _Q["agg_hash_basic"](spark, SF)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2, "expected partial+final HashAggregate"
    assert "partial_sum" in plan or "partial_count" in plan.lower() or "Partial" in plan


def test_broadcast_join_is_broadcast(spark):
    df = _Q["join_broadcast"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_flagship_tile_math_is_codegen(spark, pages_path):
    from tiledspark.pipeline import flagship

    df = flagship(spark, pages_path)
    plan = _plan(df)
    # tile math fully folded into one JVM Project (ASINH visible, packed-id
    # constant folded), dedupe optimized to partial+final WindowGroupLimit,
    # html column pruned at the scan, zero Python eval nodes
    assert "ASINH(" in plan and "shiftleft" in plan
    assert "WindowGroupLimit" in plan
    assert "html" not in plan.split("FileScan")[-1]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "flagship pipeline must not drop into Python"
    )


def test_semi_anti_join_operators(spark):
    plan = _plan(_Q["join_semi_anti"](spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_outer_join_operators(spark):
    plan = _plan(_Q["join_outer"](spark, SF))
    assert "LeftOuter" in plan
    assert "RightOuter" in plan
    assert "FullOuter" in plan
