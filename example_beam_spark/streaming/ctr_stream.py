"""Structured Streaming CTR calculators — the streaming form of
operators/ctr.py, reproducing the reference's windowing strategies
(SURVEY.md §2.4) with watermarks in place of Beam's trigger DSL:

- W1/W6/W7: fixed windows + allowed lateness → ``withWatermark(delay =
  allowed_lateness)``; *update* output mode re-emits the accumulated
  aggregate on late data (ACCUMULATING_FIRED_PANES), *append* emits once
  when the watermark passes the window end (on-time-only);
- W2/W3: sliding windows, identical aggregate;
- late-beyond-lateness rows are dropped by the watermark — the
  reference's "discard late data" tests
  (AdCtrFixedWindowCalculatorTest.scala:107-122).

Scale notes: streaming aggregation is StateStore-backed partial+final
HashAggregate; state is bounded by (keys × open windows) and evicted as
the watermark passes — the same knobs (shuffle partitions = state store
partitions) govern a 1000-executor run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ctr_stream_agg(
    events: DataFrame,
    keys: Sequence[str],
    window: Column,
    capped: bool,
) -> DataFrame:
    if capped:
        clicks = F.least(F.lit(1), F.sum("clicks"))
        impressions = F.least(F.lit(1), F.sum("impressions"))
    else:
        clicks, impressions = F.sum("clicks"), F.sum("impressions")
    out = events.groupBy(*keys, window).agg(
        clicks.cast("long").alias("clicks"),
        impressions.cast("long").alias("impressions"),
        F.max("event_time").alias("last_event_time"),
    )
    return out.select(
        *keys,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "clicks",
        "impressions",
        "last_event_time",
        F.when(
            F.col("impressions") > 0,
            F.col("clicks").cast("double") / F.col("impressions").cast("double"),
        ).alias("ctr"),
    )


def ctr_fixed_window_stream(
    events: DataFrame,
    keys: Sequence[str],
    window_duration: str,
    capped: bool = True,
) -> DataFrame:
    """Streaming fixed-window CTR. ``events`` must already carry the
    watermark (apply withWatermark upstream — e.g. via the replay
    harness's watermark_then_filter) plus one-hot clicks/impressions."""
    return _ctr_stream_agg(
        events, keys, F.window("event_time", window_duration), capped
    )


def ctr_sliding_window_stream(
    events: DataFrame,
    keys: Sequence[str],
    window_duration: str,
    slide: str,
    capped: bool = False,
) -> DataFrame:
    """Streaming sliding-window CTR (moving average)."""
    return _ctr_stream_agg(
        events, keys, F.window("event_time", window_duration, slide), capped
    )
