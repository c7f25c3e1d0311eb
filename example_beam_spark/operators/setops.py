"""Set operations, analytic window functions, and multi-dimensional
grouping over the corpus — the standard relational surface beyond what the
reference exercises (SURVEY.md §2.7 declares these absent upstream; they
complete the engine's relational breadth for the harness).

All built-in Catalyst: UNION ALL is a zero-shuffle concat; INTERSECT/
EXCEPT plan as left-semi/anti hash joins over distinct keys (partial+final
aggregates, broadcastable small sides); window functions run a single
sort-within-partition after one hash-partition shuffle on the partition
key; GROUPING SETS/CUBE plan as Expand + one partial+final aggregate (one
shuffle total, rows × |sets| map-side amplification — at 100 TB prefer
explicit set lists over full CUBE to bound the expansion, which is why the
grouping-sets query enumerates 3 sets instead of cubing 2 columns into 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.registry import dsum, register, sql_dsum
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# set operations: UNION ALL / INTERSECT / EXCEPT
# --------------------------------------------------------------------------

_UNION_ORACLE = """
    SELECT kind, nationkey, CAST(COUNT(*) AS BIGINT) AS n_parties,
           MIN(acctbal) AS min_acctbal, MAX(acctbal) AS max_acctbal
    FROM (
        SELECT 'customer' AS kind, c_nationkey AS nationkey, c_acctbal AS acctbal
        FROM customer
        UNION ALL
        SELECT 'supplier' AS kind, s_nationkey AS nationkey, s_acctbal AS acctbal
        FROM supplier
    ) parties
    GROUP BY kind, nationkey
"""


@register("setops_union_parties", oracle=_UNION_ORACLE)
def setops_union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-shaped tables into one party stream,
    aggregated per (kind, nation). Union is concat — no shuffle until the
    aggregate."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return (
        cust.unionByName(supp)
        .groupBy("kind", "nationkey")
        .agg(
            F.count("*").alias("n_parties"),
            F.min("acctbal").alias("min_acctbal"),
            F.max("acctbal").alias("max_acctbal"),
        )
    )


_INTERSECT_ORACLE = """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
"""


@register("setops_intersect_nations", oracle=_INTERSECT_ORACLE)
def setops_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations present on BOTH sides (INTERSECT → distinct + semi join)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


_EXCEPT_ORACLE = """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
"""


@register("setops_except_nations", oracle=_EXCEPT_ORACLE)
def setops_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (EXCEPT → distinct + anti
    join)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.subtract(supp)


# --------------------------------------------------------------------------
# analytic window functions: rank / row_number / lag / running sum
# --------------------------------------------------------------------------

_WINDOW_ORACLE = """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               LAG(o_totalprice) OVER w AS prev_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                    OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                          o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    ) ranked
    WHERE rn <= 3
"""


@register("window_order_ranks", oracle=_WINDOW_ORACLE)
def window_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer with rank, lag, and a running decimal sum
    — one hash-partition shuffle on o_custkey, then a single
    sort-within-partition serves all four window functions (they share the
    frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    running = (
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
            running.alias("running_spend"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# GROUPING SETS (explicit set list — the scale-bounded CUBE)
# --------------------------------------------------------------------------

_GROUPING_SETS_ORACLE = f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
"""


@register("grouping_sets_orders", oracle=_GROUPING_SETS_ORACLE)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three explicit grouping sets in ONE pass: Expand (3× map-side) +
    one partial+final aggregate — versus three separate scans+shuffles if
    written as a UNION of GROUP BYs."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice', 'revenue')}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )
