"""Custom merging ad-event window (W5) — the reference's data-driven
asymmetric window (AdEventWindow.scala + AdEventWindowFn.scala +
AdCtrCustomWindowCalculator.scala), re-expressed as a keyed stateful
operator (Beam merges windows inside GroupByKey via WindowFn.mergeWindows;
Spark has no user-definable merging WindowFn, so the merge lives in
``applyInPandasWithState`` — SURVEY.md §7.3).

Window assignment (AdEventWindowFn.scala:18-26), per (screen_id, ad_id):
- impression at t  → [t, t + impression_duration)   (looks forward for clicks)
- click at t       → [t - click_duration, t)        (looks back for its impression)

Merge (AdEventWindow.scala:19-51, implementing the *tested* behavior, not
the acknowledged-buggy corner cases): overlapping windows for the same key
merge with start = min(start); end = the latest click's window end if any
click participates (a click pins the end to its own event time, giving the
pattern its low latency — README.md:82), else the latest impression's end.

Emission: when the watermark passes the merged window end (event-time
timeout), emit one capped AdCtr (clicks=min(1,·), impressions=min(1,·) —
AdCtrCappedSemigroup, model.scala:88-98) timestamped at window end.

Scale notes: one shuffle on (screen_id, ad_id) into StateStore partitions;
state per key = one open window (a handful of scalars); timeout eviction
bounds state exactly like Beam's window GC.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "screen_id string, ad_id string, clicks long, impressions long, ctr double, "
    "window_start timestamp, window_end timestamp"
)
STATE_SCHEMA = (
    "w_start timestamp, w_end timestamp, n_clicks long, n_impressions long, "
    "has_click boolean"
)


def _emit_row(key_screen: str, key_ad: str, st: tuple) -> dict:
    w_start, w_end, n_clicks, n_imps, _ = st
    clicks = min(1, n_clicks)
    imps = min(1, n_imps)
    return dict(
        screen_id=key_screen,
        ad_id=key_ad,
        clicks=clicks,
        impressions=imps,
        ctr=(clicks / imps) if imps > 0 else None,
        window_start=w_start,
        window_end=w_end,
    )


def make_ad_event_window_fn(impression_secs: int, click_secs: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        screen_id, ad_id = key
        if state.hasTimedOut:
            if state.exists:
                yield pd.DataFrame([_emit_row(screen_id, ad_id, state.get)])
            state.remove()
            return

        st = state.get if state.exists else None
        out: list[dict] = []

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["event_time", "action"], kind="mergesort")

        for r in rows.itertuples(index=False):
            ts: datetime = r.event_time
            if r.action == "click":
                s, e, is_click = ts - timedelta(seconds=click_secs), ts, True
            elif r.action == "impression":
                s, e, is_click = ts, ts + timedelta(seconds=impression_secs), False
            else:  # 'unknown' assigns no window (AdEventWindowFn drops it)
                continue
            if st is None:
                st = (s, e, int(is_click), int(not is_click), is_click)
            else:
                w_start, w_end, n_clicks, n_imps, has_click = st
                if s < w_end and e > w_start:  # overlap → merge
                    new_start = min(w_start, s)
                    if is_click:
                        # a click pins the merged end to ITS end (= click ts)
                        new_end = e if not has_click else max(w_end, e)
                    else:
                        new_end = w_end if has_click else max(w_end, e)
                    st = (
                        new_start,
                        new_end,
                        n_clicks + int(is_click),
                        n_imps + int(not is_click),
                        has_click or is_click,
                    )
                else:  # disjoint → flush the open window, start a new one
                    out.append(_emit_row(screen_id, ad_id, st))
                    st = (s, e, int(is_click), int(not is_click), is_click)

        if st is not None:
            state.update(st)
            # emit when the watermark passes the window end; the timeout
            # must sit strictly above the current watermark
            state.setTimeoutTimestamp(
                max(int(st[1].timestamp() * 1000), state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(out)

    return fn


def ad_ctr_custom_window_stream(
    ad_events: DataFrame,
    impression_duration_secs: int = 600,
    click_duration_secs: int = 60,
) -> DataFrame:
    """CTR per (screen_id, ad_id) in the custom merging window — the
    streaming equivalent of AdCtrCustomWindowCalculator.calculateCtrByScreen.
    ``ad_events`` needs (screen_id, ad_id, action, event_time) + watermark."""
    return ad_events.groupBy("screen_id", "ad_id").applyInPandasWithState(
        make_ad_event_window_fn(impression_duration_secs, click_duration_secs),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
