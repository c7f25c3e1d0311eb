"""Full-precision oracle sweep — the verify_all gate with a STRICT
comparator.

``tests/oracle.py`` normalizes floats to 9 significant digits, which is
what the driver-simulation sweep uses. This tool re-runs every
oracle-backed registry entry with floats compared at FULL precision
(``repr``), which is strictly harder: any entry that passes here is
bit-exact across engines, with nothing owed to normalizer leniency.

Round-8 provenance — this audit found two real cross-engine hazards the
lenient gate hid (both fixed, both now recorded rules):

1. DECIMAL(38,6) - DECIMAL(38,6) needs precision 39; DuckDB promotes
   the subtraction to DOUBLE while Spark truncates back to (38,6) —
   last-ulp divergence (events_cusum_alarms). Rule: convert to DOUBLE,
   then subtract, on any compared path.
2. DuckDB parses bare numeric literals as DECIMAL, so (1.0 - 0.85)
   evaluates exactly while Spark's lit is a double — 1 ulp compounding
   through unrolled iterations (pagerank_term_graph). Rule: CAST every
   oracle literal on a compared float path to DOUBLE.

CLI: ``python tools/strict_verify.py [--sf-dir /root/testdata/sf0.001]
[--only name,name]``
Exit 0 iff every oracle-backed entry matches at full precision.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to check (default: all)",
    )
    args = ap.parse_args()

    import tests.oracle as O

    orig = O._norm

    def strict_norm(v):
        if isinstance(v, float) and not math.isnan(v):
            return ("f", repr(v))
        return orig(v)

    O._norm = strict_norm

    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="strict_verify")
    reg = load_registry()
    if args.only:
        keep = {s.strip() for s in args.only.split(",")}
        unknown = keep - set(reg)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
        reg = {k: v for k, v in reg.items() if k in keep}
    fails: list[str] = []
    n = sum(1 for q in reg.values() if q.oracle)
    i = 0
    for name, q in reg.items():
        if not q.oracle:
            continue
        i += 1
        try:
            O.assert_matches_oracle(q.fn(spark, args.sf_dir), q.oracle, args.sf_dir, name)
            print(f"[{i}/{n}] bit-exact: {name}", flush=True)
        except AssertionError as e:
            fails.append(name)
            print(f"[{i}/{n}] FULLPREC-DIFF {name}: {str(e)[:200]}", flush=True)
        except Exception as e:  # noqa: BLE001 — a runtime error (Py4J,
            # analysis) must be RECORDED as a failure row, not abort the
            # sweep and lose every already-collected result (the same
            # defect was fixed in skew_lane.py in round 10; r10 verdict #6
            # asked for the same fix here).
            fails.append(name)
            print(
                f"[{i}/{n}] RUNTIME-ERROR {name}: "
                f"{type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
        finally:
            drain_cleanups()
    print(f"DONE: {n - len(fails)}/{n} bit-exact; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
