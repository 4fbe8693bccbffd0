"""Window functions (§2C ops 44–46), as-of join (op 37), and batch-mode
checks of the streaming window semantics (§2D ops 63–65) with DuckDB oracles.

The tumbling/sliding/session queries compute exactly what the Structured
Streaming versions in tiledspark.streaming compute — here in batch so the
driver's oracle can verify the window algebra; the streaming tests assert the
streaming output equals these batch results.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tiledspark.asof import asof_join
from tiledspark.registry import query, table


# --- op 44: ranking ----------------------------------------------------------

@query(
    "window_rank",
    """
    SELECT c_nationkey, c_custkey, c_acctbal, rnk, drnk, rn
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               ROW_NUMBER() OVER w AS rn
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ) t WHERE rn <= 5
    """,
)
def window_rank(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 5)
    )


# --- op 45: analytic lag/lead --------------------------------------------------

@query(
    "window_analytic",
    """
    SELECT o_custkey, o_orderkey,
           datediff('day', LAG(o_orderdate) OVER w, o_orderdate) AS gap_days,
           LEAD(o_orderkey) OVER w AS next_order,
           FIRST_VALUE(o_orderkey) OVER w AS first_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


# --- op 46: frame aggregates -----------------------------------------------------

@query(
    "window_frame_agg",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def window_frame_agg(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
    )


# --- op 37: as-of join -------------------------------------------------------------

@query(
    "join_asof",
    """
    WITH errs AS (
        SELECT user_id, ts, MAX(event_id) AS err_id
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ),
    clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, e.ts AS asof_err_ts, e.err_id AS asof_err_id
    FROM clicks c ASOF LEFT JOIN errs e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def query_join_asof(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errs = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts").alias("err_ts"))
        .agg(F.max("event_id").alias("err_id"))
    )
    out = asof_join(
        clicks, errs, on="user_id", left_ts="ts", right_ts="err_ts",
        right_vals=["err_ts", "err_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_err_ts"),
        F.col("asof_err_id"),
    )


# --- op 63: tumbling window (batch-mode check of the streaming semantics) ----------

@query(
    "window_tumbling",
    """
    SELECT TIMESTAMP '1970-01-01'
             + (CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) * INTERVAL 21600 SECOND)
             AS win_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def window_tumbling(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --- op 64: sliding window ------------------------------------------------------------

@query(
    "window_sliding",
    """
    WITH ex AS (
        SELECT ts, value,
               TIMESTAMP '1970-01-01'
                 + ((CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) - off) * INTERVAL 21600 SECOND)
                 AS win_start
        FROM events, UNNEST([0, 1]) AS t(off)
    )
    SELECT win_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM ex GROUP BY win_start
    """,
)
def window_sliding(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "n", "total_value")
    )


# --- op 65: session window (30-minute gap) ----------------------------------------------

@query(
    "window_session",
    """
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def window_session(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select("user_id", "session_start", "n_events", "session_value")
    )
