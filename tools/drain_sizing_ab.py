"""Interleaved 32-vs-8 store-instance A/B for the drains still running at
default cores (r14). EBS_STREAM_SHUFFLE drives the knob; rows asserted
identical per entry across cells. Interleaves A/B/A/B per entry so machine
drift cannot masquerade as a knob effect.

Usage: python tools/drain_sizing_ab.py [--entries n1 n2 ...] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_ENTRIES = (
    "events_markov_stream",
    "events_cusum_stream",
    "hll_distinct_users_stream",
    "ctr_fixed_capped_stream",
    "dedup_stream_within_watermark",
    "docs_decontaminate_stream",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--entries", nargs="*", default=list(DEFAULT_ENTRIES))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="drain_sizing_ab")
    reg = load_registry()

    out = []
    for name in args.entries:
        reg[name].fn(spark, args.sf_dir).count()  # warm this entry's path
        drain_cleanups()
        cells: dict[str, list[float]] = {"32": [], "8": []}
        rows: dict[str, int] = {}
        for _ in range(args.reps):
            for shuffle in ("32", "8"):
                os.environ["EBS_STREAM_SHUFFLE"] = shuffle
                t0 = time.perf_counter()
                n = reg[name].fn(spark, args.sf_dir).count()
                cells[shuffle].append(round(time.perf_counter() - t0, 3))
                rows[shuffle] = n
                drain_cleanups()
        os.environ.pop("EBS_STREAM_SHUFFLE", None)
        assert rows["32"] == rows["8"], (name, rows)
        rec = {"entry": name, "rows": rows["32"], **cells}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
