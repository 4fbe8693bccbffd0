"""Recursive relation→tile fixpoint (op 7): multi-level propagation,
cycle termination, and per-round lineage cuts."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tiledspark.relations import assign_relations_to_tiles


def _df(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def test_three_level_nesting_propagates(spark):
    # leaves 100,101,102 in tiles 1,2,3; r10 contains leaves 100+101;
    # r20 contains r10 and leaf 102; r30 contains r20 (3 levels deep)
    members = _df(
        spark,
        [
            (10, "leaf", 100),
            (10, "leaf", 101),
            (20, "relation", 10),
            (20, "leaf", 102),
            (30, "relation", 20),
        ],
        ["rel_id", "member_type", "member_ref"],
    )
    leaf_tiles = _df(spark, [(100, 1), (101, 2), (102, 3)], ["leaf_id", "tile_id"])
    got = {
        (r["rel_id"], r["tile_id"])
        for r in assign_relations_to_tiles(members, leaf_tiles).collect()
    }
    assert got == {
        (10, 1), (10, 2),
        (20, 1), (20, 2), (20, 3),
        (30, 1), (30, 2), (30, 3),
    }


def test_cycle_terminates_with_correct_tiles(spark):
    # A(1) <-> B(2) cycle, plus C above both
    members = _df(
        spark,
        [
            (1, "leaf", 100),
            (2, "leaf", 101),
            (1, "relation", 2),
            (2, "relation", 1),
            (3, "relation", 1),
        ],
        ["rel_id", "member_type", "member_ref"],
    )
    leaf_tiles = _df(spark, [(100, 7), (101, 8)], ["leaf_id", "tile_id"])
    got = {
        (r["rel_id"], r["tile_id"])
        for r in assign_relations_to_tiles(members, leaf_tiles).collect()
    }
    assert got == {(1, 7), (1, 8), (2, 7), (2, 8), (3, 7), (3, 8)}


def test_fixpoint_bound_raises(spark):
    # a 5-deep chain with max_iters=2 must raise, not silently truncate
    members = _df(
        spark,
        [(1, "leaf", 100)] + [(i + 1, "relation", i) for i in range(1, 5)],
        ["rel_id", "member_type", "member_ref"],
    )
    leaf_tiles = _df(spark, [(100, 1)], ["leaf_id", "tile_id"])
    with pytest.raises(RuntimeError, match="fixpoint"):
        assign_relations_to_tiles(members, leaf_tiles, max_iters=2)
    # and with enough head-room the same chain resolves
    full = assign_relations_to_tiles(members, leaf_tiles, max_iters=10)
    assert full.where(F.col("rel_id") == 5).count() == 1
