"""Runtime lineage & row-count metrics (SURVEY.md op 24).

Two complementary mechanisms:
- `observed(df, name)`: zero-cost row/byte counters via df.observe — the
  numbers ride the existing job (no extra action) and are collected from the
  Observation after the consuming action finishes.
- `with_partition_stamp(df)`: mapInArrow pass stamping each row with its
  physical partition id + per-partition row position, for per-partition
  lineage rows (written alongside snapshot manifests by SnapshotStore).

At 100 TB these are the only affordable kinds of telemetry: both are
piggybacked on data already flowing; neither adds a shuffle or an action.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "lineage") -> tuple[DataFrame, Observation]:
    """Attach row-count/metric observation; read obs.get after an action."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length(F.col(df.columns[0]).cast("string"))).alias("first_col_chars"),
    )
    return out, obs


def with_partition_stamp(df: DataFrame) -> DataFrame:
    """Adds _partition_id / _pos columns via one Arrow pass (no Python rows)."""
    from pyspark import TaskContext

    fields = df.schema.fields

    def stamp(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        pos = 0
        for b in batches:
            n = b.num_rows
            arrays = list(b.columns) + [
                pa.array([pid] * n, pa.int32()),
                pa.array(range(pos, pos + n), pa.int64()),
            ]
            names = [f.name for f in fields] + ["_partition_id", "_pos"]
            pos += n
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    schema = df.schema.simpleString()[7:-1]  # struct<...> -> ...
    return df.mapInArrow(stamp, schema=f"{schema}, _partition_id int, _pos long")


def partition_lineage(df: DataFrame) -> DataFrame:
    """-> (_partition_id, rows) per physical partition (one narrow pass +
    tiny agg) — the lineage rows the manifest records."""
    return (
        with_partition_stamp(df)
        .groupBy("_partition_id")
        .agg(F.count(F.lit(1)).alias("rows"))
    )
