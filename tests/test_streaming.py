"""Streaming-semantics tests via the micro-batch replay harness — each
scenario mirrors a reference TestStream suite (file:line cited per test).
'Pane' assertions become per-batch emission assertions (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_beam_spark import schemas
from example_beam_spark.streaming.ctr_stream import ctr_fixed_window_stream
from example_beam_spark.streaming.harness import (
    StreamScenario,
    replay,
    t,
    watermark_then_filter,
)


def _one_hot(df):
    return df.withColumn(
        "clicks", F.when(F.col("action") == "click", 1).otherwise(0)
    ).withColumn(
        "impressions", F.when(F.col("action") == "impression", 1).otherwise(0)
    )


def _ctr_query(delay_seconds: int):
    def build(stream):
        ev = watermark_then_filter(stream, delay_seconds)
        return ctr_fixed_window_stream(
            _one_hot(ev), keys=["screen_id", "ad_id"], window_duration="10 minutes"
        )

    return build


def _imp(ad="ad1", screen="s1"):
    return {"ad_id": ad, "screen_id": screen, "action": "impression"}


def _click(ad="ad1", screen="s1"):
    return {"ad_id": ad, "screen_id": screen, "action": "click"}


def _flat(captured):
    """[(batch, row_dict)] for all emitted rows."""
    return [(bid, r.asDict()) for bid, rows in captured for r in rows]


def test_ctr_on_time_single_window(spark):
    """AdCtrFixedWindowCalculatorTest.scala:37-48: impression+click in one
    window → capped CTR 1.0 emitted once the watermark passes the end."""
    sc = (
        StreamScenario()
        .add_elements_at("12:00:01", _imp())
        .add_elements_at("12:00:02", _click())
        .advance_watermark_to_infinity()
    )
    out = _flat(replay(spark, sc, schemas.AD_EVENT, _ctr_query(0), 0))
    finals = {
        (r["screen_id"], r["ad_id"], r["window_start"]): r for _, r in out
    }
    assert len(finals) == 1
    r = finals[("s1", "ad1", t("12:00:00").replace(tzinfo=None))]
    assert (r["clicks"], r["impressions"], r["ctr"]) == (1, 1, 1.0)
    assert r["last_event_time"] == t("12:00:02").replace(tzinfo=None)


def test_ctr_duplicates_capped(spark):
    """AdCtrFixedWindowCalculatorTest.scala:63-87: duplicated click AND
    impression still give CTR 1.0 (capped semigroup)."""
    sc = (
        StreamScenario()
        .add_elements_at("12:00:01", _imp(), _imp())
        .add_elements_at("12:00:02", _click(), _click())
        .advance_watermark_to_infinity()
    )
    out = _flat(replay(spark, sc, schemas.AD_EVENT, _ctr_query(0), 0))
    assert [(r["clicks"], r["impressions"]) for _, r in out][-1] == (1, 1)


def test_ctr_window_boundary_split(spark):
    """AdCtrFixedWindowCalculatorTest.scala (boundary case): click at
    exactly 12:10:00 falls in the NEXT window."""
    sc = (
        StreamScenario()
        .add_elements_at("12:09:59", _imp())
        .add_elements_at("12:10:00", _click())
        .advance_watermark_to_infinity()
    )
    out = _flat(replay(spark, sc, schemas.AD_EVENT, _ctr_query(0), 0))
    by_window = {r["window_start"].isoformat(): (r["clicks"], r["impressions"]) for _, r in out}
    assert by_window["1970-01-01T12:00:00"] == (0, 1)
    assert by_window["1970-01-01T12:10:00"] == (1, 0)


def test_ctr_late_beyond_lateness_dropped(spark):
    """AdCtrFixedWindowCalculatorTest.scala:107-122: with no allowed
    lateness, an element behind the watermark is dropped."""
    sc = (
        StreamScenario()
        .add_elements_at("12:00:01", _imp())
        .advance_watermark_to("12:10:00")
        .add_elements_at("12:00:02", _click())  # late, beyond lateness
        .advance_watermark_to_infinity()
    )
    out = _flat(replay(spark, sc, schemas.AD_EVENT, _ctr_query(0), 0))
    finals = [r for _, r in out]
    assert all(r["clicks"] == 0 for r in finals), finals
    assert any(r["impressions"] == 1 for r in finals)


def test_ctr_late_within_lateness_updates(spark):
    """AdCtrFixedWindowCalculatorTest.scala:124-142: allowed lateness 10
    minutes → the late click re-fires the pane with the ACCUMULATED result
    (CTR 1.0, not a delta) in a later batch."""
    delay = 600
    sc = (
        StreamScenario()
        .add_elements_at("12:00:01", _imp())
        .advance_watermark_to("12:10:00")
        .add_elements_at("12:00:02", _click())  # late but within lateness
        .advance_watermark_to_infinity()
    )
    out = _flat(replay(spark, sc, schemas.AD_EVENT, _ctr_query(delay), delay))
    panes = [
        (bid, r["clicks"], r["impressions"])
        for bid, r in out
        if r["window_start"].isoformat() == "1970-01-01T12:00:00"
    ]
    assert (
        panes[-1][1],
        panes[-1][2],
    ) == (1, 1), panes
    # the late pane is a strictly later batch than the first emission
    assert panes[-1][0] > panes[0][0]


def test_ctr_unordered_events(spark):
    """AdCtrFixedWindowCalculatorTest: event-time semantics are unaffected
    by arrival order within the watermark."""
    sc = (
        StreamScenario()
        .add_elements_at("12:00:05", _click())
        .add_elements_at("12:00:01", _imp())
        .advance_watermark_to_infinity()
    )
    out = _flat(replay(spark, sc, schemas.AD_EVENT, _ctr_query(0), 0))
    assert [(r["clicks"], r["impressions"]) for _, r in out][-1] == (1, 1)
