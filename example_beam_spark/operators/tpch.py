"""Extended TPC-H-shaped relational coverage (continues operators/
relational.py — see that module's header for the rationale: the reference
exposes one pushed-down SQL query, bigquery/TypedBigQuery.scala:13-17;
this surface exercises the same engine capabilities at relational
breadth).

Queries adapted to the driver corpus's columns (no partsupp table, no
l_commitdate/l_receiptdate), keeping each original's *plan shape*:

- q2:  correlated MIN subquery (min unit price per part) + dim joins
- q7:  two-nation volume — double nation join with a disjunctive pair
       predicate, group by (supp_nation, cust_nation, year)
- q8:  market share — conditional-sum ratio within (region, type, year)
- q9:  profit by (nation, year) for a part-name class
- q13: customer order-count distribution — filtered LEFT join + two-level
       aggregate
- q15: top supplier(s) — aggregate view + scalar-MAX equality
- q17: small-quantity revenue — correlated per-part AVG threshold
- q18: large orders — HAVING on a grouped sum, joined back to dims
- q19: disjunctive bracket predicates (OR of brand×size×quantity bands)
- q20: suppliers with excess shipments of a part class — nested agg +
       semi-join chain

Scale notes: region/nation are always broadcast (25 rows); customer/
part/supplier join broadcast only when pre-filtered selective, else
Catalyst/AQE picks (at 100 TB these dims exceed the 64 MB broadcast
budget and sort-merge is correct). lineitem⋈orders stays the one big
shuffle pair; every aggregate is partial+final. All money sums route
through DECIMAL(38,6) (registry.dsum) for bit-stable oracle hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.registry import davg, dsum, register, sql_davg, sql_dsum
from example_beam_spark.sources import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q2-shaped: cheapest supplier per part (correlated MIN over lineitem unit
# price stands in for partsupp.ps_supplycost)
# --------------------------------------------------------------------------

_Q2_ORACLE = """
    WITH unit_costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        WHERE l_quantity > 0
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name, uc.unit_cost
    FROM part
    JOIN unit_costs uc ON uc.l_partkey = p_partkey
    JOIN supplier ON s_suppkey = uc.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size = 15
      AND uc.unit_cost = (
          SELECT MIN(unit_cost) FROM unit_costs i
          WHERE i.l_partkey = p_partkey
      )
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-MIN shape: the inner 'min cost for this part' subquery
    becomes a window MIN over the aggregated unit-cost table — one
    aggregate + one window, no self-join (Catalyst would otherwise plan
    the correlated scalar subquery as an extra aggregate + join)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    uc = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = uc.withColumn(
        "min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )


# --------------------------------------------------------------------------
# Q7-shaped: volume shipping between two nations
# --------------------------------------------------------------------------

_Q7_ORACLE = f"""
    SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
               {_REVENUE} AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ns ON ns.n_nationkey = s_nationkey
        JOIN nation nc ON nc.n_nationkey = c_nationkey
        WHERE ((ns.n_name IN ('NATION_1', 'NATION_2')
                AND nc.n_name IN ('NATION_3', 'NATION_4'))
            OR (ns.n_name IN ('NATION_3', 'NATION_4')
                AND nc.n_name IN ('NATION_1', 'NATION_2')))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume", oracle=_Q7_ORACLE)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-nation join with the disjunctive pair predicate applied
    AFTER both broadcast nation joins (it references both sides, so it
    can't push below either join — but each nation join itself is a
    25-row broadcast, and lineitem⋈orders is the only shuffle)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ns = F.broadcast(nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    ))
    nc = F.broadcast(nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    ))
    g1, g2 = ["NATION_1", "NATION_2"], ["NATION_3", "NATION_4"]
    pair = (
        F.col("supp_nation").isin(g1) & F.col("cust_nation").isin(g2)
    ) | (
        F.col("supp_nation").isin(g2) & F.col("cust_nation").isin(g1)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev_col().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue"))
    )


# --------------------------------------------------------------------------
# Q8-shaped: market share of one nation within a region for a part type
# --------------------------------------------------------------------------

_Q8_ORACLE = f"""
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END
                    AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               {_REVENUE} AS volume,
               ns.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation nc ON nc.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = nc.n_regionkey
        JOIN nation ns ON ns.n_nationkey = s_nationkey
        WHERE r_name = 'EUROPE'
          AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum ratio (share = Σ[nation]volume / Σvolume) — one
    aggregate computes both sums; the part-type filter makes the part
    dim selective enough to broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("volume").cast("decimal(38,6)")
    share_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    ).cast("decimal(38,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev_col().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (F.sum(share_vol).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
    )


# --------------------------------------------------------------------------
# Q9-shaped: profit by (nation, year) for a part-name class (no
# ps_supplycost in the corpus — profit is the discounted revenue)
# --------------------------------------------------------------------------

_Q9_ORACLE = f"""
    SELECT nation, o_year, {sql_dsum('amount', 'sum_profit')}
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               {_REVENUE} AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
"""


@register("q9_profit_by_nation_year", oracle=_Q9_ORACLE)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev_col().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
    )


# --------------------------------------------------------------------------
# Q13-shaped: customer order-count distribution (filtered LEFT join)
# --------------------------------------------------------------------------

_Q13_ORACLE = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
"""


@register("q13_order_count_distribution", oracle=_Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered LEFT outer join (the filter belongs in the join condition,
    NOT a post-filter — customers with only urgent orders must still count
    as 0) + two-level aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("long").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


# --------------------------------------------------------------------------
# Q15-shaped: top supplier(s) by quarterly revenue (scalar MAX equality)
# --------------------------------------------------------------------------

_Q15_ORACLE = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum(_REVENUE, 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The view + scalar-subquery shape: revenue aggregated once, its MAX
    reduced to ONE broadcast row, equality join back — no second scan of
    lineitem. Revenue values are decimal-sum-derived, so the MAX equality
    is bit-exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev_col(), "total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(top), F.col("total_revenue") == F.col("max_revenue")
        )
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q17-shaped: small-quantity order revenue (correlated per-part AVG)
# --------------------------------------------------------------------------

_Q17_ORACLE = f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                        / COUNT(l_quantity))
          FROM lineitem i WHERE i.l_partkey = p_partkey
      )
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated AVG threshold as a window average over the brand's
    lineitems — the correlated subquery ranges over ALL lineitems of the
    part, and every lineitem of a Brand#3 part IS such a lineitem only
    after the part filter... so the threshold must aggregate pre-filter
    lineitems: compute per-part averages from lineitem first (one
    aggregate), broadcast-join to the filtered parts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
         / F.count("l_quantity")).alias("avg_qty")
    )
    # parts of one brand ≈ 1/|brands| of the dim — broadcastable; the
    # per-part averages for those parts are equally small after the join.
    thresholds = per_part.join(
        F.broadcast(part), F.col("avg_partkey") == F.col("p_partkey")
    ).select("p_partkey", (F.lit(0.2) * F.col("avg_qty")).alias("qty_cap"))
    return (
        li.join(F.broadcast(thresholds), li.l_partkey == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
             / F.lit(7.0)).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18-shaped: large-volume orders (HAVING on grouped sum, join back)
# --------------------------------------------------------------------------

_Q18_QTY = 300

_Q18_ORACLE = f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > {_Q18_QTY}
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


@register("q18_large_orders", oracle=_Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IN-(grouped HAVING) shape: the qualifying orderkey set is tiny
    after the HAVING, so it broadcasts into a semi join against lineitem —
    one full aggregate over lineitem, then only qualifying rows re-aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(
            F.broadcast(big), li.l_orderkey == F.col("big_orderkey"), "left_semi"
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
    )


# --------------------------------------------------------------------------
# Q19-shaped: disjunctive bracket predicates
# --------------------------------------------------------------------------

_Q19_ORACLE = f"""
    SELECT {sql_dsum(_REVENUE, 'revenue')}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""


@register("q19_bracket_revenue", oracle=_Q19_ORACLE)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive brackets: Catalyst derives the part-only disjunction
    (brand ∈ {1,2,3} ∧ size ranges) and pushes it to the part scan, and
    the l_quantity-only disjunction to the lineitem scan, before the
    mixed OR evaluates on join output."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    brackets = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(brackets)
        .agg(dsum(_rev_col(), "revenue"))
    )


# --------------------------------------------------------------------------
# Q20-shaped: suppliers with excess shipments of a part class (nested
# aggregate feeding a semi-join chain; lineitem volumes stand in for
# partsupp availability)
# --------------------------------------------------------------------------

_Q20_ORACLE = """
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 50
    )
"""


@register("q20_excess_suppliers", oracle=_Q20_ORACLE)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(
            F.broadcast(qualifying),
            supp.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# q21 — suppliers who kept multi-supplier orders waiting (EXISTS + NOT
# EXISTS on the SAME table with different correlated predicates; the only
# classic TPC-H shape not yet covered). Adapted: the corpus lineitem has no
# commit/receipt dates, so "late" = shipped >90 days after the order date —
# the same lateness predicate as q4_late_orders.
# --------------------------------------------------------------------------

_Q21_ORACLE = """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9'
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier in one nation: late lines on orders where ANOTHER
    supplier participated (EXISTS → left-semi) but NO other supplier was
    also late (NOT EXISTS → left-anti).

    Plan (100 TB): the nation-filtered supplier dim broadcasts into the
    late-lines scan; the semi and anti sides are the SAME lineitem shuffle
    keyed by l_orderkey, so the three big inputs co-partition on one key
    and nothing quadratic ever materializes.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_9"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))

    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    l1 = l1.join(
        other,
        (F.col("o2_orderkey") == F.col("l_orderkey"))
        & (F.col("o2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    l1 = l1.join(
        other_late,
        (F.col("o3_orderkey") == F.col("l_orderkey"))
        & (F.col("o3_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return l1.groupBy("s_name").agg(F.count("*").cast("long").alias("numwait"))


# --------------------------------------------------------------------------
# q11 — value-concentration with a scalar subquery inside HAVING (adapted:
# the corpus has no partsupp, so concentration is measured over lineitem
# revenue per part; threshold = 1/2000 of total revenue)
# --------------------------------------------------------------------------

_Q11_ORACLE = """
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
               AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) * 2000 >
           (SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            FROM lineitem)
"""


@register("q11_part_value_concentration", oracle=_Q11_ORACLE)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue share exceeds 1/2000 of total revenue — the
    scalar-subquery-in-HAVING shape. The global total is ONE extra
    aggregate over the same scan, broadcast as a 1-row build side; the
    threshold compare stays in exact decimal (multiplied by the integer
    2000, never a fractional literal) so both engines agree bit-for-bit.

    Plan (100 TB): two partial+final aggregates over one lineitem scan +
    a broadcast nested-loop against one row — no shuffle beyond the
    per-part aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(38,6)")
        .alias("v"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("v").alias("vdec"))
    total = li.agg(F.sum("v").alias("vtotal"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("vdec") * 2000 > F.col("vtotal"))
        .select("l_partkey", F.col("vdec").cast("double").alias("part_value"))
    )
