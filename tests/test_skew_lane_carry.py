"""Cross-validation of the skew lane's probe-union lookback rewrite.

The first full skew-lane run DID NOT FINISH: Spark's sliding range
frame (``count(...) over (range between -7d and current)``) re-scans
the frame per row, which is O(rows x frame) on the zipf head user.
``carry_distribution`` now computes the same numbers with the
probe-union running-count trick (row frames only — incremental). This
suite proves the rewrite computes EXACTLY the range-frame semantics by
running both forms on the small fixture (where the quadratic form is
affordable) and on a constructed boundary-tie case.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.skew_lane import ATTR_WINDOW_US, carry_distribution

SF = "/root/testdata/sf0.001"


def _rangeframe_reference(spark, sf_dir: str) -> tuple[int, int]:
    """The original (quadratic) range-frame form — affordable at
    sf0.001: per-purchase count of clicks with ts in [t-7d, t]."""
    from example_beam_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    look_w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-ATTR_WINDOW_US, 0)
    )
    is_click = F.when(F.col("event_type") == "click", 1)
    base = ev.select(
        "event_type", F.count(is_click).over(look_w).alias("in_lookback")
    )
    r = base.filter(F.col("event_type") == "purchase").agg(
        F.sum("in_lookback").alias("s"), F.max("in_lookback").alias("m")
    ).collect()[0]
    return int(r["s"]), int(r["m"])


def test_probe_union_lookback_equals_range_frame(spark):
    """carry_distribution's probe-union credit fan-out must equal the
    range-frame reference on the fixture corpus — same inclusive-bounds
    semantics ([t-7d, t], same-instant clicks counted)."""
    want_sum, want_max = _rangeframe_reference(spark, SF)
    got = carry_distribution(spark, SF, "fixture")
    assert got["credit_fanout_rows"] == want_sum, (got, want_sum)
    assert got["max_touches_per_purchase"] == want_max, (got, want_max)


def test_probe_union_boundary_ties(spark):
    """Constructed case: clicks exactly AT t-7d and exactly AT t are
    both inside the inclusive range frame — the probe priorities (lower
    probe sorts BEFORE same-instant clicks, upper probe AFTER) must
    reproduce that."""
    import pandas as pd

    day_us = 86_400_000_000
    t0 = pd.Timestamp("2024-03-01 00:00:00")
    week = pd.Timedelta(microseconds=ATTR_WINDOW_US)
    rows = [
        # user 1: clicks at exactly t-7d, mid-window, and exactly t
        (1, t0 - week, "click", 10),
        (1, t0 - pd.Timedelta(days=3), "click", 11),
        (1, t0, "click", 12),
        (1, t0, "purchase", 13),
        # just outside: one microsecond before t-7d
        (1, t0 - week - pd.Timedelta(microseconds=1), "click", 9),
        # user 2: no clicks in window
        (2, t0 - pd.Timedelta(days=8), "click", 20),
        (2, t0, "purchase", 21),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "event_id"])
    df = spark.createDataFrame(pdf)

    # inline the probe-union computation on this frame (same code path
    # shape as carry_distribution, which is fixture-dir-coupled)
    us = F.unix_micros(F.col("ts"))
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("t_us"), F.lit(1).alias("pri"),
        F.lit(1).alias("is_click"), F.lit(None).cast("long").alias("pid"),
    )
    pur = df.filter(F.col("event_type") == "purchase")
    lo = pur.select(
        "user_id", (us - ATTR_WINDOW_US).alias("t_us"), F.lit(0).alias("pri"),
        F.lit(0).alias("is_click"), F.col("event_id").alias("pid"),
    )
    up = pur.select(
        "user_id", us.alias("t_us"), F.lit(2).alias("pri"),
        F.lit(0).alias("is_click"), F.col("event_id").alias("pid"),
    )
    rc_w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = clicks.unionAll(lo).unionAll(up).select(
        "pid", "pri", F.sum("is_click").over(rc_w).alias("rc")
    )
    got = {
        int(r["pid"]): int(r["in_lookback"])
        for r in timeline.filter(F.col("pid").isNotNull())
        .groupBy("pid")
        .agg(
            (
                F.sum(F.when(F.col("pri") == 2, F.col("rc")))
                - F.sum(F.when(F.col("pri") == 0, F.col("rc")))
            ).alias("in_lookback")
        )
        .collect()
    }
    assert got == {13: 3, 21: 0}, got
