"""Subquery-pattern relational queries (TPC-H q4/q12/q14/q16/q22 shapes,
adapted to the corpus schema) — the operator surface NOT yet exercised by
operators/relational.py: EXISTS → left-semi join, NOT IN → left-anti join,
scalar subqueries → broadcast 1-row join, HAVING, conditional aggregation.

Plan notes (100 TB): Catalyst rewrites EXISTS/IN subqueries into semi/anti
hash joins (broadcast when the subquery side is small); the scalar
subquery is one global aggregate broadcast to every row — no per-row
re-execution anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.registry import dsum, register, sql_dsum
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# q4 shape — EXISTS correlated subquery (semi join)
# --------------------------------------------------------------------------

_Q4_ORACLE = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
"""


@register("q4_late_orders", oracle=_Q4_ORACLE)
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having at least one line shipped >90 days after the order
    date, counted per priority. EXISTS becomes a left-semi join on
    (orderkey + date condition) — one pass over lineitem, no duplication
    of the orders side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 90 DAY")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# --------------------------------------------------------------------------
# q12 shape — conditional aggregation over a join
# --------------------------------------------------------------------------

_Q12_ORACLE = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
"""


@register("q12_priority_lines", oracle=_Q12_ORACLE)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line counts split by order priority class per return flag —
    CASE-inside-SUM conditional aggregation (one join, one aggregate)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q14 shape — global ratio aggregate
# --------------------------------------------------------------------------

_Q14_ORACLE = f"""
    SELECT 100.0 * (
        SELECT {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 'x')}
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ) / (
        SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'y')}
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ) AS promo_revenue_pct
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO-type parts — one join (part side
    broadcasts), one global aggregate computing both sums in a single
    pass (unlike the oracle's two-subquery formulation)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0).cast(
                    "decimal(38,6)"
                )
            ).cast("double")
            / F.sum(rev.cast("decimal(38,6)")).cast("double")
        ).alias("promo_revenue_pct")
    )


# --------------------------------------------------------------------------
# q16 shape — NOT IN subquery (anti join) + distinct count
# --------------------------------------------------------------------------

_Q16_ORACLE = """
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0
      )
    GROUP BY p_brand, p_size
"""


@register("q16_supplier_cnt", oracle=_Q16_ORACLE)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size), excluding one brand and all
    low-balance suppliers. NOT IN becomes a broadcast left-anti join
    (the exclusion set is tiny); the distinct count is a two-phase
    aggregate on (brand, size, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#1"
    ).select("p_partkey", "p_brand", "p_size")
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 2000.0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q22 shape — scalar subquery + NOT EXISTS (anti join)
# --------------------------------------------------------------------------

_Q22_ORACLE = """
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
"""


@register("q22_rich_idle_customers", oracle=_Q22_ORACLE)
def q22_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers who never ordered, per nation.
    The scalar subquery is one global AVG broadcast into the filter; NOT
    EXISTS is a left-anti join against orders.

    The AVG threshold deliberately mirrors the oracle's plain AVG (both
    engines compute the double average over the same values with the same
    Kahan-free summation; the comparison is a strict inequality on values
    far from the threshold's ulp — stable in practice and verified by the
    value-hash gate)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    rich = cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal", "total_acctbal"),
    )
