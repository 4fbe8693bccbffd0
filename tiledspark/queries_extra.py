"""Additional relational coverage: pivot, scalar subquery, exists-correlated
aggregates, conditional aggregation, distinct-on pattern, quantiles."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from tiledspark.registry import query, table


@query(
    "pivot_status",
    """
    SELECT o_orderpriority,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS open_total,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS done_total,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS part_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return piv.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("open_total"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("done_total"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("part_total"),
    )


@query(
    "scalar_subquery_share",
    """
    SELECT c_mktsegment,
           ROUND(SUM(o_totalprice), 2) AS seg_rev,
           ROUND(SUM(o_totalprice) / (SELECT SUM(o_totalprice) FROM orders), 6) AS rev_share
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def scalar_subquery_share(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("_rev"))
    )
    total = o.agg(F.sum("o_totalprice").alias("_total"))
    return seg.crossJoin(F.broadcast(total)).select(
        "c_mktsegment",
        F.round("_rev", 2).alias("seg_rev"),
        F.round(F.col("_rev") / F.col("_total"), 6).alias("rev_share"),
    )


@query(
    "cond_agg_filter",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
           ROUND(AVG(CASE WHEN l_quantity > 25 THEN l_extendedprice END), 4) AS avg_bulk_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def cond_agg_filter(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
        F.round(
            F.avg(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 4
        ).alias("avg_bulk_price"),
    )


@query(
    "distinct_on_latest",
    """
    SELECT user_id, event_id AS last_event, event_type AS last_type
    FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def distinct_on_latest(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event"),
            F.col("event_type").alias("last_type"),
        )
    )


@query(
    "having_filter",
    """
    SELECT l_suppkey, COUNT(*) AS n_items, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 80
    """,
)
def having_filter(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .where(F.col("n_items") > 80)
    )


# --- op 59: grouped-aggregate pandas UDAF ------------------------------------
# A true PandasUDFType.GROUPED_AGG function (Series -> scalar, Arrow-batched):
# quantity-weighted mean price per return flag. Distinct from op 60
# (applyInPandas grouped-map) — this one participates in agg() like any
# built-in aggregate and reduces each group to one scalar JVM-side.

@query(
    "udaf_grouped_agg",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6) AS wavg_price,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_grouped_agg(spark, sf_dir):
    # Spark forbids mixing grouped-agg pandas UDFs with non-pandas aggregates
    # in one agg(), so BOTH aggregates here are pandas UDAFs.
    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        # numpy double accumulation — same associativity class as the SQL
        # SUM()/SUM() oracle; rounded to 6dp on both sides
        return float((price * qty).sum() / qty.sum())

    @F.pandas_udf("long")
    def n_rows_udaf(qty: pd.Series) -> int:
        return int(len(qty))

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")), 6).alias(
            "wavg_price"
        ),
        n_rows_udaf(F.col("l_quantity")).alias("n_rows"),
    )
