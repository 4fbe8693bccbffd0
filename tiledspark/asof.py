"""As-of join (SURVEY.md §2C op 37) — Spark lacks a native one.

Implementation: the union-window trick, which scales linearly (one shuffle on
the join key, no range explosion, no driver loop):

  1. tag left rows and right rows, union them on (key, ts);
  2. per key, ordered by (ts, is_left) — right rows sort BEFORE left rows at
     equal ts, so ties match inclusively (ts_left >= ts_right);
  3. F.last(right_col, ignorenulls=True) over rows unboundedPreceding..current
     carries the most recent right value forward;
  4. keep only left rows.

Compare: a naive range join is O(|L|·|R|) per key; this is O((|L|+|R|) log)
via one sort — the plan AQE produces is a single Exchange + Window, which
survives 100× scale-up as long as keys are reasonably balanced.

Right rows must be unique per (key, ts) for determinism — callers pre-
aggregate (e.g. max of a unique id) when the source can have ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    right_ts <= left_ts within the same `on` key (nulls when none).

    Right values ride in ONE struct per right row (round-1 fix): the struct
    is non-null for every right row even when individual fields are null, so
    F.last(ignorenulls=True) carries the whole matched row — legitimately-
    null right fields stay null, and fields are never mixed across different
    right rows (per-column last() would skip a null field and attach an
    older row's value for just that column)."""
    from pyspark.sql import types as T

    lcols = [c for c in left.columns]
    rv_type = T.StructType([right.schema[c] for c in right_vals])
    l_aligned = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(rv_type).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    r_aligned = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_l"),
        F.struct(*[F.col(c) for c in right_vals]).alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    u = l_aligned.unionByName(r_aligned)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_carried", F.last("_rv", ignorenulls=True).over(w))
    out = u.where(F.col("_is_l") == 1)
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_carried").getField(c).alias(f"{prefix}{c}") for c in right_vals],
    )
