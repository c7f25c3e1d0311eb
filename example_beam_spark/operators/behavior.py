"""User-behavior analytics over the events stream: ordered funnels,
weekly retention cohorts, and inter-arrival-time profiles — the three
product-analytics queries every event pipeline grows within a month of
existing. All three are pure DataFrame plans (no Python in the hot
path) sharing one physical posture: a single hash exchange on
``user_id``, window functions over that partitioning, then a small
final aggregate.

Reference parity: the reference computes per-user keyed aggregates over
the clickstream (AdCtrFixedWindowCalculator.scala:31-52 keys by ad and
aggregates clicks/views); these entries extend the same keyed-event
model to multi-step ORDERED semantics (funnel), calendar bucketing
(cohorts), and sequence deltas (inter-arrival) the reference's users
build downstream of it.

100-TB design notes
-------------------
- ``events_funnel``: the four stage timestamps are chained MIN-CASE
  window functions over the SAME ``partitionBy(user_id)`` — Catalyst
  plans ONE Exchange and evaluates all four Window operators on the
  co-partitioned data; the per-user collapse and the final single-row
  rollup are partial+final aggregates. Greedy earliest-match is exact
  for existence funnels: an ordered subsequence exists iff taking the
  first stage-1 event, then the first stage-2 event after it, etc.,
  succeeds.
- ``user_retention_cohorts``: the cohort label is a window MIN over the
  same user partitioning; the (cohort, offset) matrix is tiny (weeks ×
  weeks), so cohort_size is a MAX-CASE window over cohort_week — no
  self-join, the count subtree is planned exactly once.
- ``events_interarrival``: LAG needs a per-user ORDER BY ts — the only
  entry here that sorts, and the sort is within the one user_id
  exchange. Gap arithmetic is exact integer microseconds (no float
  accumulation); the average is a single final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.registry import dsum, register, sql_dsum
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# events_funnel — ordered signup → view → click → purchase funnel
# --------------------------------------------------------------------------

_FUNNEL_STAGES = ("signup", "view", "click", "purchase")

_FUNNEL_ORACLE = """
    WITH e AS (SELECT user_id, ts, event_type FROM events),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'signup' THEN ts END)
                      OVER (PARTITION BY user_id) AS s1
        FROM e),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > s1 THEN ts END)
                      OVER (PARTITION BY user_id) AS s2
        FROM w1),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > s2 THEN ts END)
                      OVER (PARTITION BY user_id) AS s3
        FROM w2),
    w4 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
                      OVER (PARTITION BY user_id) AS s4
        FROM w3),
    per_user AS (
        SELECT user_id, MIN(s1) AS s1, MIN(s2) AS s2, MIN(s3) AS s3,
               MIN(s4) AS s4
        FROM w4 GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(s1) AS BIGINT) AS n_signup,
           CAST(COUNT(s2) AS BIGINT) AS n_signup_view,
           CAST(COUNT(s3) AS BIGINT) AS n_signup_view_click,
           CAST(COUNT(s4) AS BIGINT) AS n_full_funnel
    FROM per_user
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered four-stage funnel (signup → view → click → purchase):
    how many users reached each stage IN ORDER. Stage k's timestamp is
    the earliest stage-k event strictly after the user's stage-(k-1)
    timestamp; a NULL earlier stage NULLs every later one (CASE on a
    NULL comparison), so counts are monotonically non-increasing.

    Greedy earliest-match is exact for existence funnels (an ordered
    subsequence exists iff the greedy chain completes), so no per-user
    sequence materialization or Python is needed — four MIN-CASE
    windows over one user_id partitioning."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")

    def stage_after(stage: str, prev) -> F.Column:
        cond = F.col("event_type") == stage
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        return F.min(F.when(cond, F.col("ts"))).over(w)

    chained = (
        ev.withColumn("s1", stage_after("signup", None))
        .withColumn("s2", stage_after("view", "s1"))
        .withColumn("s3", stage_after("click", "s2"))
        .withColumn("s4", stage_after("purchase", "s3"))
    )
    per_user = chained.groupBy("user_id").agg(
        F.min("s1").alias("s1"),
        F.min("s2").alias("s2"),
        F.min("s3").alias("s3"),
        F.min("s4").alias("s4"),
    )
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("s1").cast("long").alias("n_signup"),
        F.count("s2").cast("long").alias("n_signup_view"),
        F.count("s3").cast("long").alias("n_signup_view_click"),
        F.count("s4").cast("long").alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
# user_retention_cohorts — weekly cohort × week-offset retention matrix
# --------------------------------------------------------------------------

_RETENTION_ORACLE = """
    WITH activity AS (
        SELECT user_id,
               CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
        FROM events
    ),
    firsts AS (
        SELECT user_id, wk,
               MIN(wk) OVER (PARTITION BY user_id) AS cohort_week
        FROM activity
    ),
    cells AS (
        SELECT DISTINCT user_id, cohort_week,
               CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT)
                   AS week_offset
        FROM firsts
    ),
    counts AS (
        SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
        FROM cells GROUP BY cohort_week, week_offset
    )
    SELECT cohort_week, week_offset, n_active,
           MAX(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week) AS cohort_size,
           CAST(n_active AS DOUBLE)
               / MAX(CASE WHEN week_offset = 0 THEN n_active END)
                     OVER (PARTITION BY cohort_week) AS retention
    FROM counts
"""


@register("user_retention_cohorts", oracle=_RETENTION_ORACLE)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users are cohorted by the ISO week
    (Monday-truncated, identical in both engines) of their first event;
    each (cohort_week, week_offset) cell counts distinct users active
    that many weeks later, plus the cohort size and retention fraction.

    The cohort label is a window MIN over the same user_id partitioning
    the distinct/count reuses; week_offset is exact integer day
    arithmetic (datediff is a multiple of 7 by construction — both
    operands are week-truncated). cohort_size (the offset-0 count,
    which always exists: a cohort's first week IS offset 0) comes from
    a MAX-CASE window over cohort_week rather than a self-join, so the
    count subtree is computed once — no plan duplication, no join."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    firsts = activity.withColumn(
        "cohort_week", F.min("wk").over(Window.partitionBy("user_id"))
    )
    cells = firsts.select(
        "user_id",
        "cohort_week",
        F.expr("CAST(datediff(wk, cohort_week) div 7 AS BIGINT)").alias("week_offset"),
    ).distinct()
    counts = cells.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("n_active")
    )
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort_week"))
    return counts.select(
        "cohort_week",
        "week_offset",
        "n_active",
        cohort_size.alias("cohort_size"),
        (F.col("n_active").cast("double") / cohort_size).alias("retention"),
    )


# --------------------------------------------------------------------------
# events_interarrival — per-user inter-event gap profile (LAG deltas)
# --------------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
    WITH ordered AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    gaps AS (
        SELECT user_id, epoch_us(ts) - epoch_us(prev_ts) AS gap_us
        FROM ordered WHERE prev_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
    FROM gaps GROUP BY user_id
"""


@register("events_interarrival", oracle=_INTERARRIVAL_ORACLE)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time profile: LAG over (user, ts,
    event_id tie-break) yields the previous event's timestamp; gaps are
    EXACT integer microseconds (unix_micros / epoch_us agree bit-for-
    bit), summed as BIGINT — no float accumulation anywhere; the
    average is one final double division.

    The LAG sort is within the single user_id exchange; the per-user
    aggregate reuses that partitioning (no second shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("gap_us"),
        )
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
        (F.sum("gap_us").cast("double") / F.count("*")).alias("avg_gap_us"),
    )


# --------------------------------------------------------------------------
# events_value_zscore — per-group feature standardization (ML preprocessing)
# --------------------------------------------------------------------------

# Degenerate-variance guard: sq/n - mean^2 on a constant-value group is
# ±O(1e-18) rounding noise, not 0 — unguarded, a tiny-NEGATIVE residue
# crashes DuckDB's sqrt (oracle aborts) while Spark emits NaN, and a
# tiny-POSITIVE residue yields garbage ~1e9 z-scores. Treat variance at
# or below the relative noise floor as zero, identically in both engines
# (both compute the identical doubles, so the guard is deterministic).
_VAR_FLOOR = "1e-12 * ((({m}) * ({m})) + 1.0)"  # relative to mean^2

_ZSCORE_ORACLE = f"""
    WITH stats AS (
        SELECT event_type,
               {sql_dsum("value", "s")},
               {sql_dsum("value * value", "sq")},
               CAST(COUNT(value) AS BIGINT) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           s / n AS grp_mean,
           CASE WHEN sq / n - (s / n) * (s / n) > {_VAR_FLOOR.format(m="s / n")}
                THEN sqrt(sq / n - (s / n) * (s / n))
                ELSE CAST(0.0 AS DOUBLE) END AS grp_std,
           CASE WHEN sq / n - (s / n) * (s / n) > {_VAR_FLOOR.format(m="s / n")}
                THEN (e.value - s / n) / sqrt(sq / n - (s / n) * (s / n))
                ELSE CAST(0.0 AS DOUBLE) END AS zscore
    FROM events e JOIN stats st ON e.event_type = st.event_type
"""


@register("events_value_zscore", oracle=_ZSCORE_ORACLE)
def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization: z-score of ``value`` within
    its event type — the normalize-before-training step of an ML
    pipeline, computed as ONE tiny stats aggregate broadcast back onto
    the fact rows (never a window over the full fact table, which would
    shuffle every row just to attach two numbers).

    Determinism: sums and sums-of-squares go through DECIMAL(38,6)
    (registry.dsum / sql_dsum — the one shared definition of the
    convention); mean/variance/sqrt are then identical double
    expressions on identical inputs in both engines. Variance at or
    below the relative rounding-noise floor (see _VAR_FLOOR) reads as
    zero — grp_std and z emit 0 rather than a DuckDB sqrt(-ε) abort, a
    Spark NaN, or a garbage ~1e9 z from sqrt(+ε) (guarded identically
    on both sides; pinned by tests/test_behavior.py with a
    constant-value group on BOTH engines).

    100-TB design: the stats frame is |event_type| rows — explicitly
    broadcast, so the fact side never shuffles; the quantile/cutoff
    variants of this op (price_quantiles, orders_rfm_segments) share
    the same collapse-then-broadcast posture."""
    return zscore_frame(load_table(spark, sf_dir, "events"))


def zscore_frame(ev: DataFrame) -> DataFrame:
    """Core standardization over any (event_id, event_type, value)
    frame — split out so the degenerate-variance guard is unit-testable
    with constructed constant-value groups."""
    stats = ev.groupBy("event_type").agg(
        dsum("value", "s"),
        dsum(F.col("value") * F.col("value"), "sq"),
        F.count("value").cast("long").alias("n"),
    )
    mean = F.col("s") / F.col("n")
    var = F.col("sq") / F.col("n") - mean * mean
    var_floor = F.lit(1e-12) * (mean * mean + 1.0)
    std = F.when(var > var_floor, F.sqrt(var)).otherwise(F.lit(0.0).cast("double"))
    z = F.when(var > var_floor, (F.col("value") - mean) / F.sqrt(var)).otherwise(
        F.lit(0.0).cast("double")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            mean.alias("grp_mean"),
            std.alias("grp_std"),
            z.alias("zscore"),
        )
    )


# --------------------------------------------------------------------------
# events_user_sample_k — deterministic per-key fixed-size sample
# --------------------------------------------------------------------------
# The per-KEY companion to docs_sample_fixed_k (corpus-level): cap every
# user's event history at K events for a training-data extract, chosen
# by a deterministic hash order (md5 of the event id) — an
# order-statistics reservoir: rank-by-hash ≤ K IS a uniform K-sample
# per key, it is stable under reruns AND under re-partitioning (no RNG,
# no seed plumbing), and incremental re-extraction keeps prior picks
# unless displaced by a lower hash. 100-TB design: one user-keyed
# exchange + per-key window top-K (group size = user's events, the
# same bound as any per-user op); no sort of the full table, no
# sampleBy approximation.

_USER_SAMPLE_K = 5

_USER_SAMPLE_ORACLE = f"""
    SELECT user_id, event_id, ts, event_type,
           CAST(rk AS BIGINT) AS sample_rank
    FROM (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rk
        FROM events
    ) WHERE rk <= {_USER_SAMPLE_K}
"""


@register("events_user_sample_k", oracle=_USER_SAMPLE_ORACLE)
def events_user_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-per-user event sample (section comment): hash-rank
    window, identical md5 order in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= _USER_SAMPLE_K)
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.col("rk").cast("long").alias("sample_rank"),
        )
    )
