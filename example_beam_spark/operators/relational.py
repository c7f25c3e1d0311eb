"""Relational operator surface (TPC-H-shaped queries over the driver
corpus).

The reference itself exposes almost no relational surface — exactly one SQL
string pushed down to BigQuery (bigquery/TypedBigQuery.scala:13-17:
projection + ``LIKE`` predicate) — but its engine capabilities (projection,
filter, keyed aggregation, joins; SURVEY.md §2.2-2.5 / §2.7) are exercised
here at relational breadth, all built-in Catalyst:

- aggregation: partial+final HashAggregate (Beam's Combine.perKey analog);
- joins: Catalyst picks broadcast-hash for small dims (region/nation/
  supplier/customer at any SF: dims grow ~linearly but stay << fact
  tables; the broadcast threshold governs), sort-merge elsewhere, AQE
  re-plans at runtime;
- filter/projection pushdown to the parquet scans (the S5
  rowRestriction analog — verified in tests via the explain plan);
- window functions, rollup, semi/anti joins, sessionization.

Float-stability: every SUM/AVG routes through DECIMAL(38,6) (see
registry.dsum/davg) so results hash identically to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.registry import davg, dsum, register, sql_davg, sql_dsum
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# TPC-H Q1: pricing summary report
# --------------------------------------------------------------------------

_Q1_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, headline=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# TPC-H Q3-shaped: top revenue orders for a market segment
# --------------------------------------------------------------------------

_Q3_ORACLE = f"""
    SELECT l_orderkey, o_orderdate,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15'
      AND l_shipdate > TIMESTAMP '2000-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register("q3_top_revenue_orders", oracle=_Q3_ORACLE, headline=True)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("2000-03-15").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5-shaped: revenue by nation within a region (via the SQL surface)
# --------------------------------------------------------------------------

_Q5_SQL = f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


@register("q5_revenue_by_nation", oracle=_Q5_SQL, headline=True)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the spark.sql entry point: identical SQL text runs on both
    engines; Catalyst broadcasts the dim tables (region/nation/supplier/
    customer) and sort-merges lineitem⋈orders."""
    from example_beam_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)


# --------------------------------------------------------------------------
# TPC-H Q6: forecast revenue change (pure filter + aggregate, full pushdown)
# --------------------------------------------------------------------------

_Q6_ORACLE = f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------------
# TPC-H Q10-shaped: top customers by returned-item revenue
# --------------------------------------------------------------------------

_Q10_ORACLE = f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register("q10_returned_revenue", oracle=_Q10_ORACLE)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Monthly order rollup (date_trunc + exact distinct)
# --------------------------------------------------------------------------

_MONTHLY_ORACLE = f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           {sql_dsum('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY order_month
"""


@register("orders_by_month", oracle=_MONTHLY_ORACLE)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice", "total_price"),
    )


# --------------------------------------------------------------------------
# ROLLUP aggregation (grouping sets)
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_lineitem", oracle=_ROLLUP_ORACLE)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), dsum("l_quantity", "sum_qty")
    )


# --------------------------------------------------------------------------
# Window functions: top-3 parts per brand by retail price
# --------------------------------------------------------------------------

_TOPK_ORACLE = """
    SELECT p_brand, p_partkey, p_name, p_retailprice, rk
    FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey
               ) AS rk
        FROM part
    ) WHERE rk <= 3
"""


@register("topk_parts_per_brand", oracle=_TOPK_ORACLE)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
    )


# --------------------------------------------------------------------------
# Semi / anti joins
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 300000)
"""


@register("customers_with_big_orders", oracle=_SEMI_ORACLE)
def customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_ANTI_ORACLE = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("customers_without_orders", oracle=_ANTI_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Projection + LIKE predicate (the reference's one literal SQL query:
# TypedBigQuery.scala:13-17 / storage-pushdown TypedBigQueryStorage.scala:14-16)
# --------------------------------------------------------------------------

_LIKE_ORACLE = """
    SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%9%'
"""


@register("part_name_like", oracle=_LIKE_ORACLE)
def part_name_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/P8/P9: predicate + projection pushed into the parquet scan
    (PushedFilters: StringContains; ReadSchema: only two columns)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%9%"))
        .select("p_partkey", "p_name")
    )


# --------------------------------------------------------------------------
# Sessionization (gaps-and-islands) over the events stream table
# --------------------------------------------------------------------------

_SESSION_ORACLE = f"""
    WITH marked AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        -- CAST: DuckDB SUM over INTEGER returns HUGEINT; Spark's running
        -- sum is LongType. Cast so the driver's type-sensitive value hash
        -- agrees (same convention as every other count/sum oracle here).
        SELECT *, CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value', 'session_value')}
    FROM sessions
    GROUP BY user_id, session_id
"""


@register("sessionize_events", oracle=_SESSION_ORACLE, headline=True)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 30-minute gap: lag → flag → running sum
    (one shuffle on user_id; sort within partition). The streaming analog
    is session_window in streaming/ctr_stream.py."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compared at microsecond precision, matching the oracle's
    # exact INTERVAL comparison (ts carries microseconds)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(gap_us > 1800 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value", "session_value"),
    )


_QUANTILES_ORACLE = """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
"""


@register("price_quantiles", oracle=_QUANTILES_ORACLE)
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of extended price per return flag —
    the exact-quantile aggregate shape. Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` share the linear-interpolation definition,
    so the doubles hash-match bit-for-bit (verified). Exact percentiles
    need the group's values together (a sort per group); at 100 TB the
    cheap path is ``percentile_approx``/t-digest — kept out of the oracle
    registry because approximate results are engine-specific by design."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.count("*").cast("long").alias("n_lines"),
    )
