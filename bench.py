"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute); results are consumed via
a count-style action (no driver-side collect of full results). Each query
is then run a SECOND time and reported under "queries_warm"/"warm_total":
the first-run totals are dominated by JVM JIT + whole-stage-codegen
compilation on a fresh local session, while a production cluster runs
warm — the cold-vs-warm gap separates compile overhead from plan cost.
The headline "value" stays the cold total (unchanged series vs earlier
rounds).

Guard: a timing is only meaningful if the query computed the RIGHT thing
(round 3 timed 9 corrupted-timestamp queries and the 18 s headline was
partly fiction). After timing, each query's Spark row count is checked
against DuckDB running the registered oracle SQL on the same parquet;
mismatches are listed in a "tainted_queries" field and the process exits
non-zero so the driver can see the run is partially invalid.

A "control" block (round 9) carries the run's own machine-noise bar:
five warm re-runs of the plan-frozen q1_pricing_summary. Cross-round
wall comparisons should be read relative to the control medians.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from example_beam_spark.registry import drain_cleanups, load_registry
from example_beam_spark.session import get_spark


_LEGACY14 = (
    "ann_topk_bruteforce ann_topk_lsh ctr_fixed_capped ctr_sliding_total "
    "dedup_exact dedup_minhash_lsh enrich_broadcast_latest "
    "enrich_lookup_ttl_asof enrich_time_range_join q1_pricing_summary "
    "q3_top_revenue_orders q5_revenue_by_nation sessionize_events text_stats"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="example_beam_spark_bench")

    reg = load_registry()
    headline = {n: q for n, q in reg.items() if q.headline} or reg

    # warm the JVM + parquet footers once with the cheapest action
    next(iter(headline.values())).fn(spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    counts: dict[str, int] = {}
    unstable: list[tuple[str, int, int]] = []
    for name, q in sorted(headline.items()):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        counts[name] = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        # second run: JIT/codegen warmed — the steady-state cost a
        # long-running cluster sees (cold-vs-warm gap = compile overhead,
        # not plan cost). Its row count feeds the same taint guard below:
        # a warm timing of a wrong result must not be reported either.
        t0 = time.perf_counter()
        warm_count = q.fn(spark, sf_dir).count()
        warm[name] = round(time.perf_counter() - t0, 3)
        if warm_count != counts[name]:
            # unconditionally tainted (even for oracle-less queries the
            # disagreement alone invalidates the timing)
            unstable.append((name, counts[name], warm_count))
        drain_cleanups()  # untimed: release per-query persisted intermediates
        print(
            f"# {name}: {timings[name]:.3f}s (warm {warm[name]:.3f}s) "
            f"rows={counts[name]}",
            file=sys.stderr,
        )

    # Machine-noise control (round-9 verdict #5): the bench series crept
    # 11.2 → 13.2 s cold over r6-r8 with zero code changes to the headline
    # queries — attributed to machine load via ad-hoc old-commit re-runs
    # recorded only in NOTES. Make the control part of the artifact: five
    # warm re-runs of q1_pricing_summary (graded-window position 11,
    # plan-frozen since round 1 — any cross-round wall change on it is
    # environment, not code). A future round separates code from machine
    # by comparing its control median against this one before reading
    # anything into the headline totals.
    control_runs: list[float] = []
    q1 = reg["q1_pricing_summary"]
    for _ in range(5):
        t0 = time.perf_counter()
        q1.fn(spark, sf_dir).count()
        control_runs.append(round(time.perf_counter() - t0, 3))
    control = {
        "query": "q1_pricing_summary",
        "runs": control_runs,
        "min": min(control_runs),
        "median": sorted(control_runs)[len(control_runs) // 2],
        "max": max(control_runs),
    }
    print(f"# control q1_pricing_summary warm x5: {control_runs}", file=sys.stderr)

    # Taint guard (outside the timed section): a timing only counts if the
    # query computed the right thing — check each row count against DuckDB
    # running the same oracle SQL on the same parquet.
    tainted: list[str] = []
    for name, cold_n, warm_n in unstable:
        tainted.append(name)
        print(
            f"# TAINTED {name}: cold rows={cold_n} warm rows={warm_n} "
            "(nondeterministic result)",
            file=sys.stderr,
        )
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, q in sorted(headline.items()):
        if not q.oracle:
            continue
        expected = con.execute(
            f"SELECT COUNT(*) FROM ({q.oracle})"
        ).fetchone()[0]
        if counts[name] != expected and name not in tainted:
            tainted.append(name)
            print(
                f"# TAINTED {name}: spark rows={counts[name]} oracle rows={expected}",
                file=sys.stderr,
            )
    con.close()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "warm_total": round(sum(warm.values()), 3),
                # the r1-r9 series totaled these 14; the round-10
                # additions (attribution/neardup/sessionize twins/repeat
                # drain) grow "value" additively, so the cross-round
                # series continues on this sub-total
                "legacy14_total": round(
                    sum(timings[n] for n in _LEGACY14 if n in timings), 3
                ),
                # Control-normalized series (r10 verdict #6): cross-round
                # comparisons in one field. 0.225 s is the r9 anchor
                # control median (BENCH_r09.json) — multiplying by
                # (anchor / this run's control median) expresses this
                # run's legacy total in r9-machine seconds.
                "legacy14_normalized": round(
                    sum(timings[n] for n in _LEGACY14 if n in timings)
                    * (0.225 / control["median"]),
                    3,
                )
                if control["median"] > 0
                else None,
                "control": control,
                "sf": sf,
                "tainted_queries": tainted,
            }
        )
    )
    spark.stop()
    if tainted:
        sys.exit(1)


if __name__ == "__main__":
    main()
