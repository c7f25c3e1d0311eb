"""Streaming sink with transient-error retry and a dead-letter queue.

The analog of the reference's streaming-insert write path
(``bigquery/SaveSpecificRecord.scala:81-97``): ``STREAMING_INSERTS`` with
``withFailedInsertRetryPolicy(retryTransientErrors())`` and
``withExtendedErrorInfo()`` (failed rows surface with their error). The
Spark-idiomatic shape is ``foreachBatch``: deliver each micro-batch with
bounded retries; after retries are exhausted, hand the batch to a DLQ
callback together with the error instead of failing the query.

Retry granularity is the micro-batch, not the row — foreachBatch is
Spark's exactly-once-ish boundary (each batch id is replayed as a unit on
recovery), so per-batch retry + idempotent delivery is the standard
production pattern (the MERGE/upsert shape). Extended error info = the
exception object passed to ``on_failed``.

Scale notes: nothing is collected on the driver; the batch DataFrame is
handed to the delivery/DLQ functions as-is, so both sides stay
distributed. Backoff is constant (streaming micro-batches already pace
retries); delivery MUST be idempotent, as with any foreachBatch sink.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame


def foreach_batch_with_retry(
    deliver: Callable[[DataFrame, int], None],
    on_failed: Callable[[DataFrame, int, Exception], None],
    max_retries: int = 3,
    backoff_seconds: float = 0.0,
    transient: Callable[[Exception], bool] = lambda e: True,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch delivery function with retry + DLQ.

    ``deliver(batch_df, batch_id)`` is attempted up to ``1 + max_retries``
    times while ``transient(exc)`` is true; a non-transient error or
    exhausted retries routes the whole batch to ``on_failed(batch_df,
    batch_id, exc)`` (the DLQ), and the query keeps running.

    Use as ``df.writeStream.foreachBatch(foreach_batch_with_retry(...))``.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        attempts = 0
        while True:
            try:
                deliver(batch_df, batch_id)
                return
            except Exception as exc:  # noqa: BLE001 — routed to the DLQ
                attempts += 1
                if not transient(exc) or attempts > max_retries:
                    on_failed(batch_df, batch_id, exc)
                    return
                if backoff_seconds:
                    time.sleep(backoff_seconds)

    return sink
