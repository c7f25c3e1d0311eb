"""Driver-simulation sweep: run EVERY registry query against its DuckDB
oracle at a given SF under a *vanilla* SparkSession (no engine conf from
``session.get_spark`` — catches hidden dependencies on our session
settings, e.g. UTC timezone, exactly the way the external driver loads
``__spark_entry__.py``).

Usage: python tools/verify_all.py [--sf-dir /root/testdata/sf0.01]
Exit code 0 iff every query value-matches its oracle.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to check (default: all)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]"
    ).getOrCreate()

    from tests.oracle import assert_matches_oracle
    from example_beam_spark.registry import drain_cleanups

    qs, oracles = mod.queries(), mod.oracle_sql()
    if args.only:
        keep = {n.strip() for n in args.only.split(",")}
        unknown = keep - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {n: f for n, f in qs.items() if n in keep}
    fails: list[str] = []
    for i, (name, fn) in enumerate(qs.items(), 1):
        try:
            if name not in oracles:
                # driver contract: no oracle entry -> rows-only check
                n = fn(spark, args.sf_dir).count()
                print(f"[{i}/{len(qs)}] rows-only ({n} rows): {name}", flush=True)
                continue
            assert_matches_oracle(
                fn(spark, args.sf_dir), oracles[name], args.sf_dir, name
            )
            print(f"[{i}/{len(qs)}] match: {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — summarized below
            fails.append(name)
            print(
                f"[{i}/{len(qs)}] FAIL: {name}: {type(e).__name__} {str(e)[:200]}",
                flush=True,
            )
        finally:
            drain_cleanups()  # release per-query persisted intermediates
    print(f"DONE: {len(qs) - len(fails)}/{len(qs)} green; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
