"""Micro-batch replay harness — the Spark-native analog of Beam's
``TestStream`` (reference: TestImplicits.scala:12-18 — `.addElementsAtTime`
/ `.advanceWatermarkTo`), which the reference uses for every streaming test.

PySpark has no scripted-stream source, so scenarios are replayed as one
micro-batch per step against a file-backed streaming source:

- ``emit(rows_at_event_times)`` → write a parquet file, run one batch;
- ``advance_watermark_to(t)`` → inject a *sentinel* row with event time
  ``t`` (so the post-batch Spark watermark becomes ``t − delay``), then
  run a follow-up empty-ish batch so the new watermark takes effect
  (Spark applies watermark updates at the *next* batch).

``advance_watermark_to(t)`` means the REFERENCE's (Beam's) watermark
reaches ``t``; ``watermark_delay_seconds`` plays Beam's *allowedLateness*.
Spark folds lateness into the watermark delay (SURVEY.md §7.3), so the
Spark watermark deliberately lags at ``t − delay`` — rows late w.r.t. the
Beam watermark but within allowed lateness stay ahead of Spark's
watermark and re-fire the (accumulated) pane, exactly mirroring Beam's
late-firing trigger.

Sentinel rows must advance the watermark without contributing data, so the
query under test applies ``withWatermark`` FIRST and then filters
``is_sentinel`` — the EventTimeWatermark node sees sentinels (they move
the watermark), the aggregation does not. ``build_query`` wires this up.

Outputs are captured per batch via ``foreachBatch`` into a list of
(batch_id, rows) — the analog of Beam's pane-by-pane assertions: an
"on-time pane" is the batch emitted when the watermark first passes the
window end; a "late pane" is a later batch's row for the same window
(update mode re-emits the *accumulated* aggregate, matching the
reference's ACCUMULATING_FIRED_PANES — SURVEY.md §2.4 W9).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def t(hms: str) -> datetime:
    """'HH:mm:ss' on the epoch day — mirrors InstantConverters.scala:7-14."""
    h, m, s = hms.split(":")
    return datetime(1970, 1, 1, int(h), int(m), int(s), tzinfo=timezone.utc)


@dataclass
class Step:
    kind: str  # 'emit' | 'watermark'
    rows: list[dict] = field(default_factory=list)
    to: datetime | None = None


class StreamScenario:
    """Builder mirroring the reference's TestStream sugar."""

    def __init__(self) -> None:
        self.steps: list[Step] = []

    def add_elements_at(self, hms: str, *rows: dict) -> "StreamScenario":
        at = t(hms)
        self.steps.append(
            Step("emit", rows=[{**r, "event_time": at} for r in rows])
        )
        return self

    def advance_watermark_to(self, hms: str) -> "StreamScenario":
        self.steps.append(Step("watermark", to=t(hms)))
        return self

    def advance_watermark_to_infinity(self) -> "StreamScenario":
        self.steps.append(Step("watermark", to=datetime(2100, 1, 1, tzinfo=timezone.utc)))
        return self


def _with_sentinel_field(schema: T.StructType) -> T.StructType:
    """All data fields become nullable (sentinel rows carry nulls there);
    event_time stays required — it drives the watermark."""
    fields = [
        T.StructField(f.name, f.dataType, nullable=(f.name != "event_time"))
        for f in schema.fields
    ]
    return T.StructType(fields + [T.StructField("is_sentinel", T.BooleanType(), False)])


def replay(
    spark: SparkSession,
    scenario: StreamScenario,
    schema: T.StructType,
    build_query: Callable[[DataFrame], DataFrame],
    watermark_delay_seconds: int,
    output_mode: str = "update",
    with_watermarks: bool = False,
) -> list[tuple]:
    """Run the scenario one micro-batch per step.

    ``build_query`` receives the raw streaming DataFrame *including* the
    ``is_sentinel`` column and must call :func:`watermark_then_filter`
    (or apply withWatermark before dropping sentinels) so watermark
    scripting works.

    Returns [(batch_id, emitted_rows)] for batches that emitted rows;
    with ``with_watermarks=True``, [(batch_id, beam_watermark,
    emitted_rows)] where ``beam_watermark`` is the scripted reference
    (Beam) watermark in effect when the batch ran (None until the first
    ``advance_watermark_to``) — the input :func:`assign_pane_info`
    needs to tag panes.
    """
    in_dir = tempfile.mkdtemp(prefix="replay_in_")
    ckpt = tempfile.mkdtemp(prefix="replay_ckpt_")
    full_schema = _with_sentinel_field(schema)
    captured: list[tuple] = []
    # mutated between (blocking) processAllAvailable calls only, so the
    # sink thread always reads the value scripted for its batch
    beam_wm: list[datetime | None] = [None]

    def sink(bdf: DataFrame, bid: int) -> None:
        rows = bdf.collect()
        if rows:
            captured.append(
                (bid, beam_wm[0], rows) if with_watermarks else (bid, rows)
            )

    stream = spark.readStream.schema(full_schema).parquet(in_dir)
    query = (
        build_query(stream)
        .writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )

    def write_rows(rows: list[dict], sentinel: bool) -> None:
        data = [
            Row(**{**r, "is_sentinel": sentinel})
            for r in rows
        ]
        spark.createDataFrame(data, full_schema).coalesce(1).write.mode("append").parquet(
            in_dir
        )

    try:
        for step in scenario.steps:
            if step.kind == "emit":
                write_rows(step.rows, sentinel=False)
                query.processAllAvailable()
            else:
                # sentinel at target → Spark watermark becomes target − delay
                # (Beam watermark at target, lateness folded in — module doc);
                # a second sentinel batch makes the new watermark effective.
                base = {f.name: None for f in schema.fields if f.name != "event_time"}
                at = step.to
                beam_wm[0] = at
                write_rows([{**base, "event_time": at}], sentinel=True)
                query.processAllAvailable()
                write_rows([{**base, "event_time": at}], sentinel=True)
                query.processAllAvailable()
        query.processAllAvailable()
    finally:
        query.stop()
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return captured


@dataclass(frozen=True)
class PaneInfo:
    """Beam ``PaneInfo`` analog for replayed panes (model.scala uses the
    Beam original; asserted by TimestampedMatchers.scala:18-59 /
    AdCtrFixedWindowCalculatorTest.scala:124-161)."""

    pane_index: int
    timing: str  # 'EARLY' | 'ON_TIME' | 'LATE'
    is_first: bool
    is_last: bool

    @property
    def is_late(self) -> bool:
        return self.timing == "LATE"


def assign_pane_info(
    captured,
    window_key: Callable[[Row], tuple],
    window_end: Callable[[Row], datetime],
    append_mode: bool = False,
) -> list[tuple[int, Row, PaneInfo]]:
    """Tag every captured pane with Beam-style pane metadata, derived
    from the batch sequence vs the SCRIPTED (Beam) watermark timeline —
    ``captured`` must come from ``replay(..., with_watermarks=True)``.

    Mapping (the engine delta, made explicit): Beam fires a data-less
    ON_TIME pane exactly when its watermark passes the window end; Spark's
    update mode only emits on data, so the accumulated content of Beam's
    ON_TIME pane is carried by the LAST pane emitted before the watermark
    passed the end. Hence per window:

    - panes emitted while watermark < end: all but the last are EARLY
      (speculative firings), the last is ON_TIME — its row equals what
      Beam's at-watermark pane would contain under ACCUMULATING panes;
    - panes emitted at watermark ≥ end are LATE firings. When a window
      never fired before the watermark passed, the caller's output mode
      decides: under ``append_mode=True`` (at-watermark flushes, e.g.
      session windows) the first post-watermark pane IS the on-time
      pane; under update mode (the default) such a window was created
      entirely by late-but-within-lateness data, and in Beam's PaneInfo
      model its first pane is genuinely LATE (the default
      FIRE_IF_NON_EMPTY on-time pane never fired) — every pane is LATE.

    ``window_key(row)`` identifies a window (key columns + window start);
    ``window_end(row)`` its end timestamp (tz-naive UTC, like collected
    rows)."""
    per: dict[tuple, list[list]] = {}
    order: list[list] = []
    for bid, wm, rows in captured:
        for r in rows:
            entry = [bid, wm, r, None]
            per.setdefault(window_key(r), []).append(entry)
            order.append(entry)
    for panes in per.values():
        end = window_end(panes[0][2])
        n_pre = sum(
            1
            for p in panes
            if p[1] is None or p[1].replace(tzinfo=None) < end.replace(tzinfo=None)
        )
        if n_pre:
            on_time_idx = n_pre - 1
        elif append_mode:
            on_time_idx = 0  # the at-watermark flush IS the on-time pane
        else:
            on_time_idx = None  # window born late: every pane is LATE
        for i, p in enumerate(panes):
            timing = (
                "LATE" if on_time_idx is None else
                "EARLY" if i < on_time_idx else
                "ON_TIME" if i == on_time_idx else
                "LATE"
            )
            p[3] = PaneInfo(
                pane_index=i,
                timing=timing,
                is_first=(i == 0),
                is_last=(i == len(panes) - 1),
            )
    return [(bid, r, pane) for bid, wm, r, pane in order]


def watermark_then_filter(
    stream: DataFrame, delay_seconds: int, event_time_col: str = "event_time"
) -> DataFrame:
    """Apply the watermark BEFORE dropping sentinel rows (see module doc).

    The filter must be a SINGLE predicate REFERENCING the event-time
    column: Catalyst pushes predicates through EventTimeWatermark unless
    they touch the watermark attribute, and it splits conjunctions first —
    a bare (or AND-ed) ``~is_sentinel`` gets pushed below the watermark
    node and sentinels would never advance the watermark. The CASE-shaped
    predicate below is unsplittable and watermark-anchored."""
    wm = stream.withWatermark(event_time_col, f"{delay_seconds} seconds")
    keep = F.when(~F.col("is_sentinel"), F.col(event_time_col)).isNotNull()
    return wm.filter(keep)
