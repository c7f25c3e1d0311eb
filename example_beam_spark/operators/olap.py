"""OLAP shape completions: pivot (long→wide conditional aggregation),
CUBE (the third member of the rollup / grouping-sets / cube trio — the
first two live in ``relational.py``), and ratio-to-report (a windowed
share-of-total). All pure DataFrame plans, one or two partial+final
aggregations each.

100-TB design notes
-------------------
- ``events_pivot_monthly``: implemented as COUNT-CASE conditional
  aggregation rather than ``.pivot()`` — Spark's pivot is a two-shuffle
  plan (pre-count, exchange, PivotFirst) even with an explicit value
  list, and an unlisted pivot adds a distinct-values driver job; the
  COUNT-CASE form is one partial+final aggregate, one exchange.
- ``orders_cube_priority_status``: CUBE multiplies each input row into
  its 4 grouping combinations map-side and shares ONE partial+final
  aggregate — never four separate scans; grouping_id() disambiguates
  NULL-as-total from genuine NULLs.
- ``lineitem_monthly_share``: the per-month aggregate collapses the
  fact table first; the year-total for the share is a window SUM over
  the TINY aggregate (rows = months), not a second fact scan, and the
  share division is one final double op on exact decimal sums.
- ``orders_daily_gapfill``: the calendar spine is generated FROM the
  daily aggregate's own min/max bounds (sequence + explode — no driver
  collect, no hand-written calendar), and the gap-fill join is a
  broadcast of the days-sized aggregate. Spine cardinality is bounded
  by elapsed calendar time, not data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.registry import defer_cleanup, dsum, register, sql_dsum
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# events_pivot_monthly — long→wide: per month, one count column per type
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE = f"""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           {", ".join(
               f"CAST(COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT)"
               f" AS n_{t}"
               for t in _EVENT_TYPES
           )}
    FROM events GROUP BY 1
"""


@register("events_pivot_monthly", oracle=_PIVOT_ORACLE)
def events_pivot_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly long→wide pivot: one row per month, one count column per
    event type, as SINGLE-PASS conditional aggregation (COUNT-CASE per
    type). Deliberately not ``df.groupBy().pivot()``: even with an
    explicit value list Spark plans pivot as TWO aggregates — a
    (month, type) pre-count, an exchange, then a PivotFirst aggregate —
    i.e. two shuffles; with a known value list the COUNT-CASE form is
    one partial+final aggregate with one exchange (pinned by
    tests/test_plans.py). Use .pivot() only when the column set is
    unknown (it then costs a distinct-values driver job on top)."""
    ev = load_table(spark, sf_dir, "events")
    month = F.date_trunc("month", F.col("ts")).cast("date")
    return (
        ev.select(month.alias("month"), "event_type")
        .groupBy("month")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1))
                .cast("long")
                .alias(f"n_{t}")
                for t in _EVENT_TYPES
            ]
        )
    )


# --------------------------------------------------------------------------
# orders_cube_priority_status — CUBE with grouping_id disambiguation
# --------------------------------------------------------------------------

_CUBE_ORACLE = f"""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
               AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o_totalprice", "revenue")}
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@register("orders_cube_priority_status", oracle=_CUBE_ORACLE)
def orders_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping combinations —
    detail, per-priority, per-status, grand total — in ONE partial+final
    aggregate (rows are expanded map-side, never four scans).
    grouping_id (bit 1 = priority rolled up, bit 0 = status rolled up)
    distinguishes subtotal NULLs from data NULLs, exactly as the
    reference's users would GROUP BY each combination separately."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )


# --------------------------------------------------------------------------
# lineitem_monthly_share — ratio-to-report over the monthly aggregate
# --------------------------------------------------------------------------

_SHARE_ORACLE = f"""
    WITH monthly AS (
        SELECT CAST(date_trunc('year', l_shipdate) AS DATE) AS year,
               CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
               {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem GROUP BY 1, 2
    )
    SELECT year, month, revenue,
           revenue / CAST(SUM(CAST(revenue AS DECIMAL(38,6)))
                              OVER (PARTITION BY year) AS DOUBLE)
               AS share_of_year
    FROM monthly
"""


@register("lineitem_monthly_share", oracle=_SHARE_ORACLE)
def lineitem_monthly_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each month's discounted revenue as a share of
    its year's total. The fact table collapses to a months-sized
    aggregate first; the year total is a window SUM over that tiny
    frame. Shares divide two doubles that were produced from exact
    decimal sums, so both engines emit identical bits.

    The year-total window sum ALSO goes through DECIMAL(38,6) — window
    frames are unordered, engines may visit partition rows in different
    orders, and double addition is order-sensitive; decimal addition is
    exact and order-independent (same convention as registry.dsum)."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = (
        li.select(
            F.date_trunc("year", F.col("l_shipdate")).cast("date").alias("year"),
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .groupBy("year", "month")
        .agg(dsum("rev", "revenue"))
    )
    total = (
        F.sum(F.col("revenue").cast("decimal(38,6)"))
        .over(Window.partitionBy("year"))
        .cast("double")
    )
    return monthly.select(
        "year", "month", "revenue", (F.col("revenue") / total).alias("share_of_year")
    )


# --------------------------------------------------------------------------
# orders_daily_gapfill — complete calendar spine with zero-filled gaps
# --------------------------------------------------------------------------

_GAPFILL_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_dsum("o_totalprice", "revenue")}
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
    spine AS (
        SELECT CAST(u.d AS DATE) AS day
        FROM bounds CROSS JOIN UNNEST(generate_series(
            CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS u(d)
    )
    SELECT s.day,
           COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.revenue, CAST(0.0 AS DOUBLE)) AS revenue,
           d.day IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@register("orders_daily_gapfill", oracle=_GAPFILL_ORACLE)
def orders_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: a complete day spine from the data's own
    min/max (no driver collect — the bounds row feeds ``sequence`` +
    ``explode`` directly), left-joined to the daily aggregate so absent
    days surface as explicit zero rows with an ``is_gap`` flag — the
    resampling step time-series reporting and anomaly detection need
    (a missing day must read as 0, not vanish).

    100-TB design: the fact table collapses to a days-sized aggregate
    once, and that frame is PERSISTED (MEMORY_AND_DISK, released after
    consumption via registry.defer_cleanup — same posture as
    ``source_overlap``) because both the bounds branch
    and the gap-fill join consume it: without the persist, column
    pruning differentiates the two aggregate subtrees (bounds reads
    only o_orderdate) so ReusedExchange never fires and Spark plans a
    SECOND full fact scan — measured, which is why the persist is
    here. The spine (span-of-days rows) then joins the days-sized
    aggregate broadcast-side; spine cardinality is bounded by calendar
    time, not data volume."""
    from pyspark import StorageLevel

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(F.col("o_orderdate").cast("date").alias("day"), "o_totalprice")
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    defer_cleanup(lambda: daily.unpersist())
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("day"))
    d = daily.select(
        F.col("day").alias("d_day"), "n_orders", "revenue"
    )
    return (
        spine.join(F.broadcast(d), spine["day"] == d["d_day"], "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).cast("double").alias("revenue"),
            F.col("d_day").isNull().alias("is_gap"),
        )
    )


# --------------------------------------------------------------------------
# orders_moving_avg_7d — RANGE-frame trailing window over calendar days
# --------------------------------------------------------------------------

_MA7_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice', 'revenue')}
        FROM orders GROUP BY 1
    ),
    keyed AS (
        SELECT day, n_orders, revenue,
               datediff('day', DATE '1970-01-01', day) AS day_num
        FROM daily
    )
    SELECT day, n_orders, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(38,6))) OVER w AS DOUBLE)
               / COUNT(revenue) OVER w AS ma7_revenue,
           CAST(COUNT(revenue) OVER w AS BIGINT) AS n_days_in_window
    FROM keyed
    WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("orders_moving_avg_7d", oracle=_MA7_ORACLE)
def orders_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-calendar-day average of daily order revenue — a RANGE
    frame keyed by day number, NOT a ROWS frame: across a gap in the
    calendar the frame correctly covers [day−6, day] by VALUE, so a day
    following a 3-day gap averages only the days actually inside its
    window (a ROWS 6 PRECEDING frame would silently reach back across
    the gap — the classic moving-average bug this operator exists to
    demonstrate). ``n_days_in_window`` exposes how many days the frame
    really held. Decimal-sum average per the registry convention.

    100-TB design: the fact table collapses to a days-sized aggregate
    first (partial+final, same as ``orders_daily_gapfill``); the window
    then runs over calendar-bounded rows — a single-partition sort of
    ~thousands of rows regardless of fact volume (partition by
    year/series key when the day spine itself grows unbounded)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(F.col("o_orderdate").cast("date").alias("day"), "o_totalprice")
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            dsum("o_totalprice", "revenue"),
        )
        .withColumn("day_num", F.datediff(F.col("day"), F.lit("1970-01-01")))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        "n_orders",
        "revenue",
        (
            F.sum(F.col("revenue").cast("decimal(38,6)")).over(w).cast("double")
            / F.count("revenue").over(w)
        ).alias("ma7_revenue"),
        F.count("revenue").over(w).cast("long").alias("n_days_in_window"),
    )


# --------------------------------------------------------------------------
# orders_pareto_deciles — revenue-concentration (80/20) curve
# --------------------------------------------------------------------------

_PARETO_ORACLE = f"""
    WITH cust AS (
        SELECT o_custkey, {sql_dsum('o_totalprice', 'revenue')}
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT revenue,
               NTILE(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
        FROM cust
    ),
    per AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               {sql_dsum('revenue', 'revenue')}
        FROM ranked GROUP BY decile
    ),
    tot AS (SELECT {sql_dsum('revenue', 'total')} FROM cust)
    SELECT CAST(decile AS BIGINT) AS decile, n_customers, revenue,
           revenue / (SELECT total FROM tot) AS share,
           CAST(SUM(CAST(revenue AS DECIMAL(38,6)))
                    OVER (ORDER BY decile) AS DOUBLE)
               / (SELECT total FROM tot) AS cum_share
    FROM per
"""


@register("orders_pareto_deciles", oracle=_PARETO_ORACLE)
def orders_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration curve: customers ranked by revenue, cut
    into deciles, each decile's share and cumulative share of total
    revenue — the 80/20 analysis behind curation decisions like "the
    top X% of sources contribute Y% of tokens".

    100-TB design (round-11 rewrite): the fact table collapses to a
    customers-sized aggregate first; the decile cut is a TWO-PHASE
    global rank (scaleops.two_phase_rank) with NTILE recomputed as
    exact integer arithmetic on (rank, total) — bit-identical to the
    oracle's NTILE, no unpartitioned WindowExec over customer rows
    (only the 10-row decile cumsum keeps a global window, bounded at
    10 rows by construction). Every sum — including the window cumsum
    — goes through DECIMAL(38,6) so shares divide bit-identical
    doubles in both engines."""
    from example_beam_spark.operators.scaleops import (
        ntile_from_rank,
        two_phase_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "revenue"))
    rk, n = two_phase_rank(cust, [F.desc("revenue"), "o_custkey"], "_rk")
    ranked = rk.select("revenue", ntile_from_rank("_rk", n, 10).alias("decile"))
    per = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        dsum("revenue", "revenue"),
    )
    tot = F.broadcast(cust.agg(dsum("revenue", "total")))
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(tot)
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_customers",
            "revenue",
            (F.col("revenue") / F.col("total")).alias("share"),
            (
                F.sum(F.col("revenue").cast("decimal(38,6)")).over(wcum).cast("double")
                / F.col("total")
            ).alias("cum_share"),
        )
    )
