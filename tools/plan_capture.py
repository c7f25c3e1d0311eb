"""Capture .explain("formatted") for headline queries into plans/<tag>/,
with a timing attribution line per query: fn-build (driver-side DataFrame
construction, including any probe jobs the query runs), explain
(analysis+optimization), and two executions (cold codegen+run, warm run)
via the noop sink (guide §1.4 — times the computation, not the sink).

Usage: python tools/plan_capture.py --tag r14 --suffix before [--queries a b c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from example_beam_spark.plans.inspect import explain_formatted
from example_beam_spark.registry import drain_cleanups, load_registry
from example_beam_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="plan_capture")
    reg = load_registry()
    names = args.queries or sorted(n for n, q in reg.items() if q.headline)
    out_dir = Path(__file__).resolve().parents[1] / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    # warm the JVM + footers like bench.py does
    reg[names[0]].fn(spark, args.sf_dir).limit(1).collect()
    drain_cleanups()

    summary = {}
    for name in names:
        q = reg[name]
        spark.sparkContext.setJobDescription(f"{name}: build")
        t0 = time.perf_counter()
        df = q.fn(spark, args.sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        plan = explain_formatted(df)
        t_explain = time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"{name}: exec cold")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec1 = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"{name}: exec warm")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec2 = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        drain_cleanups()

        hdr = (
            f"-- {name} @ {args.sf_dir} ({args.suffix})\n"
            f"-- build={t_build:.3f}s explain={t_explain:.3f}s "
            f"exec_cold={t_exec1:.3f}s exec_warm={t_exec2:.3f}s\n"
        )
        (out_dir / f"{name}_{args.suffix}.txt").write_text(hdr + plan)
        summary[name] = {
            "build": round(t_build, 3),
            "explain": round(t_explain, 3),
            "exec_cold": round(t_exec1, 3),
            "exec_warm": round(t_exec2, 3),
        }
        print(f"# {name}: build={t_build:.2f} explain={t_explain:.2f} "
              f"exec={t_exec1:.2f}/{t_exec2:.2f}", flush=True)

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
