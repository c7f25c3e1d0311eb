"""Whole-surface timing: run EVERY registered query once in a single
warm session at a given SF and print per-query seconds + row counts,
slowest first, plus the total. Complements bench.py (frozen headline
window, cross-round comparable) by timing the complete registry.

Usage: python tools/time_surface.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from example_beam_spark.registry import load_registry
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="time_surface")
    reg = load_registry()
    timings: dict[str, dict] = {}
    t_all = time.time()
    from example_beam_spark.registry import drain_cleanups

    for name, q in reg.items():
        t0 = time.time()
        n = q.fn(spark, args.sf_dir).count()
        timings[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        drain_cleanups()  # release per-query persisted intermediates
        print(f"# {name}: {timings[name]}", flush=True)
    total = round(time.time() - t_all, 1)
    slowest = sorted(timings.items(), key=lambda kv: -kv[1]["sec"])[:10]
    print("# slowest:", [(k, v["sec"]) for k, v in slowest])
    print(
        json.dumps(
            {
                "metric": "whole_surface_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf_dir": args.sf_dir,
                "queries": timings,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
