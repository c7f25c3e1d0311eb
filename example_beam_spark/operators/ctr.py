"""Windowed CTR calculators — the reference's canonical query family.

Re-expresses (Spark-first, batch surface; streaming variants in
:mod:`example_beam_spark.streaming`):

- ``AdCtrFixedWindowCalculator.calculateCtrByScreen``
  (windowing/AdCtrFixedWindowCalculator.scala:30-40): keyBy → one-hot →
  fixed window → capped semigroup sum → CTR.
- ``AdCtrSlidingWindowCalculator`` (AdCtrSlidingWindowCalculator.scala:31-40):
  sliding window + total semigroup (moving-average CTR).
- The semigroups (model.scala:88-110): *capped* — ``min(1, a+b)`` per
  component, deduping repeated clicks/impressions per key+window; *total* —
  plain component-wise sum.

Spark mapping: ``groupBy(keys, window(ts, ...))`` — Catalyst plans this as
partial HashAggregate → shuffle → final HashAggregate, i.e. exactly Beam's
``Combine.perKey`` partial+final combine, with no custom code. The capped
semigroup folds into the *final* expression ``least(1, sum(one_hot))``
(equivalently ``max`` over 0/1), which keeps map-side partial aggregation
legal (sum is associative; the cap is applied at the end).

Scale notes: one shuffle on (keys × window); AQE coalesces/splits
partitions at runtime. No Python in the hot path — whole-stage codegen
end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# Core operators (domain-agnostic)
# --------------------------------------------------------------------------


def one_hot_ctr(
    df: DataFrame, click_when: Column, impression_when: Column
) -> DataFrame:
    """AdCtr one-hot constructors (model.scala:75-85): click → (1,0),
    impression → (0,1), anything else → (0,0)."""
    return df.withColumn(
        "clicks", F.when(click_when, F.lit(1)).otherwise(F.lit(0))
    ).withColumn("impressions", F.when(impression_when, F.lit(1)).otherwise(F.lit(0)))


def _ctr_aggs(capped: bool) -> list[Column]:
    if capped:
        # AdCtrCappedSemigroup (model.scala:88-98): min(1, sum) per component.
        clicks = F.least(F.lit(1), F.sum("clicks"))
        impressions = F.least(F.lit(1), F.sum("impressions"))
    else:
        # AdCtrTotalSemigroup (model.scala:100-110): plain sum.
        clicks = F.sum("clicks")
        impressions = F.sum("impressions")
    return [
        clicks.cast("long").alias("clicks"),
        impressions.cast("long").alias("impressions"),
        # TimestampCombiner.LATEST (ScreenGlobalWindowWithSideInputEnricher.scala:16)
        F.max("event_time").alias("last_event_time"),
    ]


def _with_ctr(df: DataFrame) -> DataFrame:
    """ctr = clicks / impressions, null when no impressions (AdCtr.ctr)."""
    return df.withColumn(
        "ctr",
        F.when(
            F.col("impressions") > 0,
            F.col("clicks").cast("double") / F.col("impressions").cast("double"),
        ),
    )


def ctr_fixed_window(
    events: DataFrame,
    keys: Sequence[str],
    window_duration: str,
    capped: bool = True,
) -> DataFrame:
    """Fixed (tumbling) window CTR per key — W1 + A2/A3 + A6.

    ``events`` must carry ``clicks``/``impressions`` one-hot columns and an
    ``event_time`` timestamp (use :func:`one_hot_ctr`).
    """
    w = F.window("event_time", window_duration)
    out = events.groupBy(*keys, w).agg(*_ctr_aggs(capped))
    return _with_ctr(
        out.select(
            *keys,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "clicks",
            "impressions",
            "last_event_time",
        )
    )


def ctr_sliding_window(
    events: DataFrame,
    keys: Sequence[str],
    window_duration: str,
    slide: str,
    capped: bool = False,
) -> DataFrame:
    """Sliding-window moving-average CTR — W2 (total semigroup by default,
    as in AdCtrSlidingWindowCalculator.scala:35)."""
    w = F.window("event_time", window_duration, slide)
    out = events.groupBy(*keys, w).agg(*_ctr_aggs(capped))
    return _with_ctr(
        out.select(
            *keys,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "clicks",
            "impressions",
            "last_event_time",
        )
    )


def ctr_global_window(
    events: DataFrame, keys: Sequence[str], capped: bool = False
) -> DataFrame:
    """Global-window CTR per key — W4 batch analog (one infinite window)."""
    return _with_ctr(events.groupBy(*keys).agg(*_ctr_aggs(capped)))


def reassign_to_fixed(df: DataFrame, period: str) -> DataFrame:
    """W3 — re-window sliding results into fixed windows of the period
    (AdCtrSlidingWindowCalculator.scala:38-39: ``withTimestampCombiner``
    then ``withFixedWindows(period)`` so downstream consumers see
    non-overlapping windows): timestamp each aggregate at its window end
    (exclusive end − 1 ms = the reference's window max timestamp,
    AdEventWindow.scala:53) and assign tumbling windows of ``period``.

    Purely metadata arithmetic on the already-aggregated rows — no
    shuffle; Catalyst folds the window expression into the projection."""
    stamped = df.withColumn(
        "event_time", F.col("window_end") - F.expr("INTERVAL 1 MILLISECOND")
    )
    w = F.window("event_time", period)
    return (
        stamped.withColumn("window", w)
        .withColumn("fixed_window_start", F.col("window.start"))
        .withColumn("fixed_window_end", F.col("window.end"))
        .drop("window", "event_time")
    )


# --------------------------------------------------------------------------
# Registered queries over the driver's `events` table.
# Domain mapping: event_type 'click' → click, 'view' → impression
# (AdAction domain, model.scala:46-49); key user_id plays screen_id.
# --------------------------------------------------------------------------

# Tumbling-window start, epoch-aligned like Spark's F.window; pure
# timestamp arithmetic (no TIMESTAMPTZ) so the oracle is timezone-agnostic.
_WINDOW_SQL = (
    "(TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * "
    "CAST(FLOOR(epoch(ts) / {sec}) * {sec} AS BIGINT))"
)


def _load_ad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumnRenamed("ts", "event_time")
    return one_hot_ctr(
        ev.filter(F.col("event_type").isin("click", "view")),
        click_when=F.col("event_type") == "click",
        impression_when=F.col("event_type") == "view",
    )


def _ctr_oracle(window_sec: int | None, capped: bool, slide_sec: int | None = None) -> str:
    clicks = "SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
    imps = "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
    if capped:
        clicks, imps = f"LEAST(1, {clicks})", f"LEAST(1, {imps})"
    select_window, group_window, from_clause = "", "", "FROM events"
    if window_sec is not None and slide_sec is None:
        ws = _WINDOW_SQL.format(sec=window_sec)
        select_window = (
            f"{ws} AS window_start, {ws} + INTERVAL {window_sec} SECOND AS window_end,"
        )
        group_window = ", window_start, window_end"
    elif window_sec is not None:
        n = window_sec // slide_sec
        base = _WINDOW_SQL.format(sec=slide_sec)
        select_window = (
            f"{base} - k * INTERVAL {slide_sec} SECOND AS window_start, "
            f"{base} - k * INTERVAL {slide_sec} SECOND + INTERVAL {window_sec} SECOND AS window_end,"
        )
        offsets = ", ".join(f"({i})" for i in range(n))
        from_clause = f"FROM events CROSS JOIN (VALUES {offsets}) AS offs(k)"
        group_window = ", window_start, window_end"
    return f"""
        SELECT user_id, {select_window}
               CAST({clicks} AS BIGINT) AS clicks,
               CAST({imps} AS BIGINT) AS impressions,
               MAX(ts) AS last_event_time,
               CASE WHEN {imps} > 0
                    THEN CAST({clicks} AS DOUBLE) / CAST({imps} AS DOUBLE)
               END AS ctr
        {from_clause}
        WHERE event_type IN ('click', 'view')
        GROUP BY user_id{group_window}
    """


@register("ctr_fixed_capped", oracle=_ctr_oracle(3600, capped=True), headline=True)
def q_ctr_fixed_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped (deduplicating) CTR per user in 1-hour tumbling windows —
    AdCtrFixedWindowCalculator with AdCtrCappedSemigroup."""
    return ctr_fixed_window(
        _load_ad_events(spark, sf_dir),
        keys=["user_id"],
        window_duration="1 hour",
        capped=True,
    )


@register("ctr_fixed_total", oracle=_ctr_oracle(3600, capped=False))
def q_ctr_fixed_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-sum CTR per user in 1-hour tumbling windows (AdCtrTotalSemigroup)."""
    return ctr_fixed_window(
        _load_ad_events(spark, sf_dir),
        keys=["user_id"],
        window_duration="1 hour",
        capped=False,
    )


@register(
    "ctr_sliding_total",
    oracle=_ctr_oracle(7200, capped=False, slide_sec=3600),
    headline=True,
)
def q_ctr_sliding_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average CTR per user: 2-hour window sliding every hour —
    AdCtrSlidingWindowCalculator.scala:31-40."""
    return ctr_sliding_window(
        _load_ad_events(spark, sf_dir),
        keys=["user_id"],
        window_duration="2 hours",
        slide="1 hour",
    )


# W3 oracle: the sliding CTR result with each row re-assigned to the
# 1-hour tumbling window containing its (window_end − 1 ms) timestamp —
# the same epoch-aligned bucketing as Spark's F.window.
_REASSIGNED_ORACLE = f"""
    SELECT s.*,
           (TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * CAST(
               FLOOR(epoch(s.window_end - INTERVAL 1 MILLISECOND) / 3600) * 3600
           AS BIGINT)) AS fixed_window_start,
           (TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * CAST(
               FLOOR(epoch(s.window_end - INTERVAL 1 MILLISECOND) / 3600) * 3600
               + 3600
           AS BIGINT)) AS fixed_window_end
    FROM ({_ctr_oracle(7200, capped=False, slide_sec=3600)}) s
"""


@register("ctr_sliding_reassigned", oracle=_REASSIGNED_ORACLE)
def q_ctr_sliding_reassigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — sliding moving-average CTR re-windowed into fixed 1-hour
    windows of the slide period (AdCtrSlidingWindowCalculator.scala:38-39),
    so each 2-hour aggregate lands in exactly one non-overlapping bucket."""
    sliding = ctr_sliding_window(
        _load_ad_events(spark, sf_dir),
        keys=["user_id"],
        window_duration="2 hours",
        slide="1 hour",
    )
    return reassign_to_fixed(sliding, "1 hour")


@register("ctr_global", oracle=_ctr_oracle(None, capped=False))
def q_ctr_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-window CTR per user — W4 batch analog."""
    return ctr_global_window(_load_ad_events(spark, sf_dir), keys=["user_id"])
