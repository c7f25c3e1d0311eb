"""Stateful streaming funnel — the ordered signup→view→click→purchase
funnel (``operators/behavior.events_funnel``) computed as per-user
streaming state via ``applyInPandasWithState``.

Why buffered-recompute: the greedy earliest-match chain is exact for
existence funnels but is NOT an incremental aggregate — a late-arriving
earlier signup lowers s1, which can re-qualify views that were
previously too early, cascading through every later stage. The exact
streaming form therefore keeps each user's funnel-stage events in state
(the BagState posture, U2 — cf. ``streaming/lookup_cache.py``'s early
fact buffer) and recomputes the chain for keys touched by the batch;
out-of-order and multi-batch arrival converge to the batch result by
construction because the chain is a pure function of the buffered SET.

Scale notes: one shuffle on user_id into the StateStore partitions;
state per key = that user's funnel-type events only (bounded by
per-user activity, which the corpus growth model holds constant as
users scale — see tools/stress_lane.py's events generator). A
production deployment bounds it further with an event-time retention
TTL timer (the lookup-cache GC pattern); the analytics funnel here is
all-history by definition, like its batch twin.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STAGES = ("signup", "view", "click", "purchase")

OUT_SCHEMA = (
    "user_id long, s1 timestamp, s2 timestamp, s3 timestamp, s4 timestamp"
)
STATE_SCHEMA = "ts array<timestamp>, st array<int>"


def _chain(ts_by_stage: list[list]) -> list:
    """Greedy earliest-match chain: stage k's timestamp is the earliest
    stage-k event STRICTLY after stage k-1's (None propagates). Identical
    comparison semantics to the batch MIN-CASE windows
    (operators/behavior.py events_funnel)."""
    out: list = []
    prev = None
    for k, lst in enumerate(ts_by_stage):
        cur = None
        for t in sorted(lst):
            if k == 0 or (prev is not None and t > prev):
                cur = t
                break
        # stage 0 takes its min unconditionally; later stages need prev
        if k > 0 and prev is None:
            cur = None
        out.append(cur)
        prev = cur
    return out


def funnel_state_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (uid,) = key
    ts_buf, st_buf = (state.get if state.exists else ([], []))
    ts_buf, st_buf = list(ts_buf or []), list(st_buf or [])

    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            try:
                idx = STAGES.index(r.event_type)
            except ValueError:
                continue  # non-funnel event: counts toward n_users only
            ts_buf.append(r.event_time)
            st_buf.append(idx)

    state.update((ts_buf, st_buf))
    by_stage: list[list] = [[], [], [], []]
    for t, s in zip(ts_buf, st_buf):
        by_stage[s].append(t)
    s1, s2, s3, s4 = _chain(by_stage)
    yield pd.DataFrame(
        {
            "user_id": [uid],
            "s1": [s1 if s1 is not None else pd.NaT],
            "s2": [s2 if s2 is not None else pd.NaT],
            "s3": [s3 if s3 is not None else pd.NaT],
            "s4": [s4 if s4 is not None else pd.NaT],
        }
    )


def funnel_stream(keyed: DataFrame) -> DataFrame:
    """Apply the stateful funnel to a (user_id, event_time, event_type)
    stream; emits the user's CURRENT chain each batch that touches them
    (update semantics — drain with last-update-per-key)."""
    return keyed.groupBy("user_id").applyInPandasWithState(
        funnel_state_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
