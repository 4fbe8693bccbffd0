"""Relational operator surface (SURVEY.md §2C ops 26–57) with DuckDB oracles.

Each query exercises one operator class over the driver testdata. All are
pure built-in Spark (Catalyst handles pushdown/pruning/join strategy); the
explicit `F.broadcast` in join_broadcast and the rounded aggregates are the
only places we override defaults, both deliberate (see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledspark.registry import query, table


def _ts(s: str):
    return F.expr(f"TIMESTAMP_NTZ '{s}'")


# --- op 26/31: scan + projection + predicate pushdown -----------------------

@query(
    "scan_project_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity > 45
    """,
)
def scan_project_filter(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# --- ops 39+40: hash aggregation, partial+final (TPC-H Q1 shape) + exact
# distinct aggregates in the same grouped plan (merged so the 50-row driver
# budget covers both ops with one CORRECTNESS row) ----------------------------

@query(
    "agg_hash_basic",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS n_rows,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash_basic(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(disc), 2).alias("sum_disc"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


# --- op 41: approximate distinct (HLL) — approx, rows-only check ------------

@query("agg_approx_distinct")
def agg_approx_distinct(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- op 42: grouping sets — CUBE + grouping_id (CUBE over two columns emits
# all four grouping sets, a strict superset of ROLLUP, so one query covers the
# whole grouping-sets machinery) ----------------------------------------------

@query(
    "agg_cube_grouping",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS grp_id,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube_grouping(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("grp_id"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# --- op 43: collect aggregation (deterministically ordered) ------------------

@query(
    "agg_collect",
    """
    SELECT c_nationkey,
           STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_collect(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# --- op 32: inner hash join ---------------------------------------------------

@query(
    "join_inner_hash",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_hash(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# --- op 33: broadcast join (same result as inner; plan differs) --------------

@query(
    "join_broadcast",
    """
    SELECT p_brand,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 5
    GROUP BY p_brand
    """,
)
def join_broadcast(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


# --- op 34: outer joins --------------------------------------------------------

# --- op 34: left + RIGHT + full outer joins, one query (tagged union) --------
# The right-join leg swaps build side (orders RIGHT JOIN customer), so all
# three outer-join physical paths are exercised and hash-checked together.

@query(
    "join_outer",
    """
    SELECT 'L' AS jt, c_custkey AS k,
           COUNT(o_orderkey) AS n,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS v
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    UNION ALL
    SELECT 'R' AS jt, c_custkey AS k,
           COUNT(o_orderkey) AS n,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS v
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    UNION ALL
    SELECT 'F' AS jt, COALESCE(s.nk, c.nk) AS k,
           COALESCE(n_supp, 0) AS n,
           CAST(COALESCE(n_cust, 0) AS DOUBLE) AS v
    FROM (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
    FULL OUTER JOIN
         (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    ON s.nk = c.nk
    """,
)
def join_outer(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    left = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("v"),
        )
        .select(F.lit("L").alias("jt"), F.col("c_custkey").alias("k"), "n", "v")
    )
    right = (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("v"),
        )
        .select(F.lit("R").alias("jt"), F.col("c_custkey").alias("k"), "n", "v")
    )
    s_agg = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    c_agg = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    full = s_agg.join(c_agg, "nk", "full").select(
        F.lit("F").alias("jt"),
        F.col("nk").alias("k"),
        F.coalesce("n_supp", F.lit(0)).alias("n"),
        F.coalesce("n_cust", F.lit(0)).cast("double").alias("v"),
    )
    return left.unionByName(right).unionByName(full)


# --- op 35: semi + anti joins, one query (tagged union) --------------------------

@query(
    "join_semi_anti",
    """
    SELECT 'semi' AS jt, c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'anti' AS jt, c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_semi_anti(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("semi").alias("jt"), "c_mktsegment", "n_customers")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("anti").alias("jt"), "c_mktsegment", "n_customers")
    )
    return semi.unionByName(anti)


# --- op 36: range (theta) join ---------------------------------------------------

@query(
    "join_range",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS total
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def join_range(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


# --- op 38: interval-overlap join -------------------------------------------------

@query(
    "join_interval_overlap",
    """
    SELECT o1.o_custkey AS custkey, COUNT(*) AS n_overlapping_pairs
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o1.o_orderkey < o2.o_orderkey
     AND o1.o_orderdate < o2.o_orderdate + INTERVAL 30 DAY
     AND o2.o_orderdate < o1.o_orderdate + INTERVAL 30 DAY
    GROUP BY o1.o_custkey
    """,
)
def join_interval_overlap(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    cond = (
        (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
        & (F.col("o1.o_orderkey") < F.col("o2.o_orderkey"))
        & (F.col("o1.o_orderdate") < F.col("o2.o_orderdate") + F.expr("INTERVAL 30 DAY"))
        & (F.col("o2.o_orderdate") < F.col("o1.o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    return (
        o1.join(o2, cond)
        .groupBy(F.col("o1.o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_overlapping_pairs"))
    )


# --- op 47: global sort + limit -----------------------------------------------------

@query(
    "sort_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_limit(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


# --- op 48: top-k per group ----------------------------------------------------------

@query(
    "topk_per_group",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) t
    WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


# --- ops 49/50: set operations — UNION ALL + INTERSECT + EXCEPT, one query
# (tagged union so all three set-op physical plans land in one hash check) ---------

@query(
    "set_ops",
    """
    SELECT 'union_all' AS op, nk, n
    FROM (SELECT nk, COUNT(*) AS n
          FROM (SELECT c_nationkey AS nk FROM customer
                UNION ALL SELECT s_nationkey FROM supplier) t
          GROUP BY nk) u
    UNION ALL
    SELECT 'intersect' AS op, nk, CAST(NULL AS BIGINT) AS n
    FROM (SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
          INTERSECT
          SELECT s_nationkey FROM supplier) i
    UNION ALL
    SELECT 'except' AS op, nk, CAST(NULL AS BIGINT) AS n
    FROM (SELECT c_nationkey AS nk FROM customer
          EXCEPT
          SELECT s_nationkey FROM supplier WHERE s_acctbal > 0) e
    """,
)
def set_ops(spark, sf_dir):
    c_nk = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s_nk = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    union_all = (
        c_nk.unionByName(s_nk)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("union_all").alias("op"), "nk", "n")
    )
    rich_c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    inter = rich_c.intersect(s_nk).select(
        F.lit("intersect").alias("op"), "nk", F.lit(None).cast("long").alias("n")
    )
    pos_s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 0)
        .select(F.col("s_nationkey").alias("nk"))
    )
    # subtract == SQL EXCEPT (set semantics; exceptAll would be bag)
    exc = c_nk.subtract(pos_s).select(
        F.lit("except").alias("op"), "nk", F.lit(None).cast("long").alias("n")
    )
    return union_all.unionByName(inter).unionByName(exc)


# --- op 51: string functions --------------------------------------------------------------

@query(
    "fn_string",
    """
    SELECT p_partkey,
           LOWER(p_name)  AS name_lower,
           UPPER(p_brand) AS brand_upper,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           LENGTH(p_name) AS name_len,
           LEN(string_split(p_name, ' ')) AS n_words,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           levenshtein(p_brand, 'Brand#00') AS lev,
           CONCAT(p_brand, '/', p_type) AS brand_type
    FROM part WHERE p_partkey < 500
    """,
)
def fn_string(spark, sf_dir):
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.levenshtein("p_brand", F.lit("Brand#00")).alias("lev"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
    )


# --- op 52: date functions ------------------------------------------------------------------

@query(
    "fn_date",
    """
    SELECT o_orderkey,
           year(o_orderdate)  AS yr,
           month(o_orderdate) AS mon,
           quarter(o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           datediff('day', DATE '1995-01-01', o_orderdate) AS days_since,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m
    FROM orders WHERE o_orderkey < 2000
    """,
)
def fn_date(spark, sf_dir):
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),  # Spark: Sunday=1 == DuckDB dayofweek+1
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus3m"),
    )


# --- op 53: math functions ---------------------------------------------------------------------

@query(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * 0.1, 4) AS price10,
           CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT)  AS disc_pct_ceil,
           ROUND(ABS(l_tax - 0.05), 6) AS tax_dev,
           ROUND(LN(l_quantity + 1), 6) AS log_qty,
           ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
           ROUND(POW(l_quantity, 2), 2) AS qty_sq,
           ROUND(SIN(l_quantity), 6) AS sin_qty
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def fn_math(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # 2dp × 0.1 has exactly 3 decimals → 4dp round is lossless (a 2dp round
        # would sit ON the half-way boundary where engines' tie-breaking differs)
        F.round(F.col("l_extendedprice") * 0.1, 4).alias("price10"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.round(F.abs(F.col("l_tax") - 0.05), 6).alias("tax_dev"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("log_qty"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sin("l_quantity"), 6).alias("sin_qty"),
    )


# --- op 54: array / higher-order functions (embeddings) -------------------------------------------

@query(
    "fn_array",
    """
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 5) AS vec_sum,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 5) AS sq_norm
    FROM embeddings
    """,
)
def fn_array(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 5
        ).alias("vec_sum"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x), 5
        ).alias("sq_norm"),
    )


# --- ops 55/56: map + json functions (events.props) -------------------------------------------------

@query(
    "fn_json",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90
    FROM events GROUP BY event_type
    """,
)
def fn_json(spark, sf_dir):
    """JSON extraction + exact quantiles in one grouped plan (merged with the
    former quantiles_exact so the 50-row driver budget covers both)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


@query(
    "fn_map",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_val,
           LEN(json_keys(props)) AS n_keys
    FROM events WHERE event_id < 2000
    """,
)
def fn_map(spark, sf_dir):
    from pyspark.sql import types as T

    ev = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    m = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )
