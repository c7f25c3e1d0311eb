"""Streaming-drain overhead matrix (round-9 verdict #6).

The whole-surface lane (tools/time_surface.py) showed the sf0.1 total
dominated by two drains — the custom merging window (15.5 s) and the
stream-stream time-range join (12.0 s) — on a 100k-row corpus, i.e.
pure per-micro-batch machinery, not plan cost. Two knobs drive that
machinery, both of which bind at checkpoint creation (each entry makes
a fresh checkpoint per invocation, so they can be swept in-session):

- ``spark.sql.shuffle.partitions`` (via EBS_STREAM_SHUFFLE): the
  state-store INSTANCE count. Every micro-batch opens/commits one
  store per partition per stateful operator; a bounded 100k-row drain
  on 32 partitions pays 32× that for partitions holding ~3k rows each.
- the state-store provider (via EBS_STATE_PROVIDER): RocksDB (the
  at-scale default here — state bounded by disk, not heap) vs the
  HDFS-backed in-memory provider (no per-batch SST/changelog work —
  right when state provably fits executor memory, as on these drains).

This lane times each slow entry under the 2×2 matrix and prints one
JSON line. It MEASURES the knobs; it does not change any default —
production sizing is by state volume, and the registered entries stay
on cores × RocksDB so the driver sees the at-scale configuration.

Usage: python tools/drain_tuning.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ENTRIES = (
    "ctr_custom_window_stream",
    "enrich_stream_stream_join",
    "sessionize_events_stream",
    "lookup_cache_join_stream",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--entries", nargs="*", default=list(ENTRIES))
    args = ap.parse_args()

    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="drain_tuning")
    reg = load_registry()
    names = [n for n in args.entries if n in reg]
    unknown = set(args.entries) - set(names)
    if unknown:
        raise SystemExit(f"unknown entries (not in registry): {sorted(unknown)}")
    if not names:
        raise SystemExit("--entries filtered to zero known names")

    # one untimed warmup drain so JVM/codegen/Python-worker startup does
    # not land on the first matrix cell
    reg[names[0]].fn(spark, args.sf_dir).count()
    drain_cleanups()

    out: dict = {"section": "drain_tuning", "sf_dir": args.sf_dir, "cells": []}
    saved_env = {
        k: os.environ.get(k) for k in ("EBS_STREAM_SHUFFLE", "EBS_STATE_PROVIDER")
    }
    try:
        for shuffle in ("32", "8"):
            for provider in ("rocksdb", "hdfs"):
                os.environ["EBS_STREAM_SHUFFLE"] = shuffle
                if provider == "hdfs":
                    os.environ["EBS_STATE_PROVIDER"] = "hdfs"
                else:
                    os.environ.pop("EBS_STATE_PROVIDER", None)
                cell = {"shuffle": int(shuffle), "provider": provider, "queries": {}}
                for name in names:
                    t0 = time.time()
                    n = reg[name].fn(spark, args.sf_dir).count()
                    cell["queries"][name] = {
                        "sec": round(time.time() - t0, 2),
                        "rows": n,
                    }
                    drain_cleanups()
                cell["total"] = round(
                    sum(q["sec"] for q in cell["queries"].values()), 2
                )
                out["cells"].append(cell)
                print(f"# {shuffle}/{provider}: {json.dumps(cell)}", flush=True)
    finally:
        # a mid-matrix failure must not leak the override into any
        # subsequent use of the process
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    # row-count agreement across cells — a tuning knob must never change
    # the answer
    counts = {
        name: {(c["shuffle"], c["provider"]): c["queries"][name]["rows"] for c in out["cells"]}
        for name in names
    }
    out["rows_agree"] = all(len(set(v.values())) == 1 for v in counts.values())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
