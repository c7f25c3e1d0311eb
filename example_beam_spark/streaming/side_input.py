"""Refreshing broadcast side-input join (J1, streaming form) — the Spark
re-expression of the reference's side-input enrichment
(ScreenGlobalWindowWithSideInputEnricher.scala:24-87): a small,
slowly-changing dimension is broadcast to all workers and *refreshed
periodically* (Dataflow re-reads the side input roughly every 5 s —
README.md:113-118) while the fact stream joins against the freshest
snapshot, latest-event-time-wins per key (:56-73).

Spark mapping: ``foreachBatch``. A stream-static join with a plain
``spark.read`` static side would pin the file listing at plan time; the
standard refreshing-side-input shape instead re-loads the dimension
INSIDE the batch function, so every micro-batch joins against a fresh
snapshot — the micro-batch cadence plays the ~5 s refresh. The snapshot
is reduced to latest-per-key (one tiny aggregate over the dim) and
broadcast, so the fact stream is never shuffled (the same "no shuffling,
~100 MB budget" rationale as the reference's IterableSideInput).

DLQ fork (P6/J6): unmatched facts surface with null dim columns; the
sink receives the whole joined frame and can split with
``operators.enrich.split_matched``.

Scale notes: dim snapshot load + aggregate runs once per micro-batch on
the cluster (not the driver); keep the dim under the broadcast budget
(64 MB session threshold) exactly as the reference keeps side inputs
under Dataflow's ~100 MB cache. Facts flow map-side only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from example_beam_spark.operators.enrich import broadcast_latest_join


def stream_static_refreshing_join(
    fact_stream: DataFrame,
    load_dims: Callable[[], DataFrame],
    keys: list[str],
    ts_col: str,
    tiebreak: str,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start a streaming query that left-joins every fact micro-batch to
    the broadcast latest-wins snapshot of ``load_dims()`` — re-loaded per
    batch, so dimension updates become visible at micro-batch cadence
    (the reference's side-input refresh interval).

    ``sink(joined_batch_df, batch_id)`` receives the enriched batch.
    """

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        dims = load_dims()  # fresh snapshot: new files/rows picked up here
        joined = broadcast_latest_join(batch_df, dims, keys, ts_col, tiebreak)
        sink(joined, batch_id)

    writer = (
        fact_stream.writeStream.foreachBatch(batch_fn)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
