from __future__ import annotations

from pyspark.sql import functions as F

from tiledspark.lineage import observed, partition_lineage, with_partition_stamp


def test_observed_counts(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out, obs = observed(df.where(F.col("o_totalprice") > 0))
    n = out.count()
    assert obs.get["rows"] == n > 0


def test_partition_stamp_and_lineage(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(5)
    stamped = with_partition_stamp(df)
    assert stamped.columns[-2:] == ["_partition_id", "_pos"]
    lin = partition_lineage(df).collect()
    assert len(lin) == 5
    assert sum(r["rows"] for r in lin) == df.count()
