"""Decompose the enrich_repeat_stream drain wall (r14 optimization).

Phases probed on one warm session:
  a) a stateLESS availableNow drain over the same staged reader
     (foreachBatch write parquet) — the fixed streaming-query cost
     (start/stop, per-batch planning, file-source listing, sink write);
  b) the full repeat drain at several shuffle-partition counts and both
     state-store providers;
  c) the full repeat drain with RocksDB changelog checkpointing on.

Prints one JSON line per cell. Row counts asserted identical.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from example_beam_spark.registry import drain_cleanups, load_registry
from example_beam_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="repeat_probe")
    reg = load_registry()

    # warm JVM
    reg["enrich_repeat_stream"].fn(spark, sf_dir).count()
    drain_cleanups()

    # (a) stateless drain cost over the same reader
    from example_beam_spark.streaming.entries import (
        read_events_stream_flushed,
        run_to_append,
    )

    t0 = time.perf_counter()
    ev = read_events_stream_flushed(spark, sf_dir, shuffle_partitions=8)
    n = run_to_append(ev, spark).count()
    print(json.dumps({"cell": "stateless_drain", "sec": round(time.perf_counter() - t0, 3), "rows": n}))
    drain_cleanups()

    baseline_rows = None
    for shuffle, provider, changelog in [
        ("8", "rocksdb", False),
        ("8", "rocksdb", True),
        ("8", "hdfs", False),
        ("4", "hdfs", False),
        ("2", "hdfs", False),
        ("1", "hdfs", False),
        ("2", "rocksdb", False),
        ("2", "rocksdb", True),
    ]:
        os.environ["EBS_STREAM_SHUFFLE"] = shuffle
        if provider == "hdfs":
            os.environ["EBS_STATE_PROVIDER"] = "hdfs"
        else:
            os.environ.pop("EBS_STATE_PROVIDER", None)
        key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        spark.conf.set(key, "true" if changelog else "false")
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            cnt = reg["enrich_repeat_stream"].fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            drain_cleanups()
        if baseline_rows is None:
            baseline_rows = cnt
        assert cnt == baseline_rows, (cnt, baseline_rows)
        print(
            json.dumps(
                {
                    "cell": f"shuffle={shuffle} provider={provider} changelog={changelog}",
                    "runs": runs,
                    "rows": cnt,
                }
            ),
            flush=True,
        )
    for k in ("EBS_STREAM_SHUFFLE", "EBS_STATE_PROVIDER"):
        os.environ.pop(k, None)
    spark.stop()


if __name__ == "__main__":
    main()
