"""Multi-batch streaming convergence lane (see tools/multibatch.py).

The corpus-scale stateful entries were oracle-exact under a ONE-batch
drain by construction; this suite drains them across many time-ordered
micro-batches — the watermark advancing BETWEEN data batches, timers
interleaving with data — and pins:

- sessionize + stream-stream join: EXACT convergence to the same oracle;
- lookup-cache join: exact match to an independent driver-side schedule
  simulator, and every divergence from the converged oracle confined to
  the documented delta class (after-dim gap > TTL → DLQ);
- custom window: exact match to its schedule simulator, and the
  multi-window-per-key delta pinned by a constructed case.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.multibatch import (
    chunked_sf_dir,
    event_batches,
    run_lane,
    simulate_custom_window,
    simulate_lookup_cache,
)


# Slow lane (multi-chunk corpus lane: minutes per entry sweep) —
# skipped unless EBS_RUN_SLOW=1 so the external verify pytest run
# completes; see pytest.ini / conftest.py.
pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_corpus_lane_all_entries_converge(spark, tmp_path):
    """All eighteen stateful entries over the sf0.001 corpus split into 8
    time-ordered chunks (10 micro-batches with the sentinels): exact
    oracle / simulator match per entry, delta classes enforced inside
    run_lane — plus the round-8 state-size measurements: eviction
    OBSERVED (state rows rise then fall as the watermark advances) for
    the watermark-evicting entries, constant-bounded state for the
    sketches, and zero rows dropped as late on the time-ordered
    schedule."""
    results = run_lane(SF_DIR, 8, spark)
    assert len(results) == 18
    for r in results:
        assert r["match"], r
    by = {r["entry"]: r for r in results}
    # the lane is only meaningful if the custom window actually split
    # keys across windows (i.e. watermark-driven closes happened)
    assert by["ctr_custom_window_stream"]["extra_windows_vs_converged"] > 0

    # eviction observed, not argued: final state rows well below the
    # peak, with actual removals recorded by the state store
    for name in [
        "sessionize_events_stream",
        "enrich_stream_stream_join",
        "enrich_stream_join_dlq",
        "ctr_custom_window_stream",
        "ctr_fixed_capped_stream",
        "ctr_sliding_total_stream",
        "dedup_stream_within_watermark",
    ]:
        r = by[name]
        assert r["state_removed_total"] > 0, (name, r)
        assert r["state_final"] <= r["state_peak"] // 4, (name, r)
        # state is bounded by the watermark horizon, not by rows
        # processed: the drain ends nearly empty
        assert r["state_final"] <= 5, (name, r)

    # sketch / unbounded-distinct entries: state size is a constant
    # function of the sketch geometry (registers/bins/buckets), NOT of
    # rows processed — "64 counters ever" as a measured number
    assert by["hll_distinct_users_stream"]["state_peak"] <= 16
    assert by["value_quantile_histogram_stream"]["state_peak"] <= 64
    assert by["events_weekly_drift_stream"]["state_peak"] <= 40

    # events_markov_stream keeps ONE state row per user ever (last-event
    # state, NoTimeout): peak == final == distinct users, no eviction —
    # the O(1)-per-key posture as a measured number
    mk = by["events_markov_stream"]
    assert mk["state_peak"] == mk["state_final"], mk
    assert mk["state_peak"] <= 15, mk  # sf0.001 has 15 distinct users

    # events_cusum_stream keeps one (R, minR, counters) row per event
    # TYPE ever — constant state at any SF
    cs = by["events_cusum_stream"]
    assert cs["state_peak"] == cs["state_final"] == 5, cs

    # the time-ordered chunk schedule must never drop a row as late —
    # the exact hazard the staging-order gate exists to prevent
    for r in results:
        assert r.get("state_dropped_late_total", 0) == 0, r


def _tiny_events_dir(tmp_path, rows) -> str:
    """A minimal sf_dir holding just an events table (the two entries
    under test read nothing else)."""
    src = tmp_path / "src"
    src.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(src / "events.parquet"))
    return chunked_sf_dir(str(src), str(tmp_path / "chunked"), len(rows))


def _us(s: str):
    import pandas as pd

    return pd.Timestamp(s).to_pydatetime()


def test_custom_window_splits_across_watermark_closes(spark, tmp_path):
    """DELTA PIN (constructed): one key with two impressions 10 h apart,
    filler events advancing the watermark in between. The first filler
    batch advances the watermark past the window end; the SECOND filler
    batch runs the timeout pass that closes it (data is processed before
    timeouts, so a batch carrying the key's own data would merge first —
    that ordering is exactly what the simulator replays). The second
    impression then opens a NEW window → TWO windows for the key; the
    converged one-batch semantics (the entry's registered oracle) merges
    them into ONE."""
    from example_beam_spark.registry import load_registry

    rows = [
        (1, _us("2024-01-01 10:00:00"), 1, "view", '{"k": 7}'),
        (2, _us("2024-01-01 13:00:00"), 9, "purchase", None),  # wm -> 12:00
        (3, _us("2024-01-01 14:00:00"), 9, "purchase", None),  # GC pass: closes w1
        (4, _us("2024-01-01 20:00:00"), 1, "view", '{"k": 7}'),
    ]
    derived = _tiny_events_dir(tmp_path, rows)
    df = load_registry()["ctr_custom_window_stream"].fn(spark, derived)
    got = sorted(
        (r.screen_id, r.ad_id, r.clicks, r.impressions, r.window_start, r.window_end)
        for r in df.collect()
    )
    assert got == [
        ("1", "7", 0, 1, _us("2024-01-01 10:00:00"), _us("2024-01-01 10:10:00")),
        ("1", "7", 0, 1, _us("2024-01-01 20:00:00"), _us("2024-01-01 20:10:00")),
    ]
    # the simulator predicts exactly this schedule-dependent result
    sim = sorted(
        (r[0], r[1], r[2], r[3], r[5], r[6])
        for r in simulate_custom_window(event_batches(derived))
    )
    assert sim == got


def test_lookup_cache_gc_beats_far_future_dim(spark, tmp_path):
    """DELTA PIN (constructed): a fact with no prior dim buffers; its
    first at-or-after dim arrives 41 h later (> 24 h TTL), AFTER filler
    batches advanced the watermark past the GC timer (fact_ts + TTL).
    Multi-batch → the fact flushes to the DLQ before the dim's batch is
    processed; the converged one-batch oracle would match them. This is
    the allowed flip class run_lane's classifier enforces corpus-wide."""
    from example_beam_spark.registry import load_registry

    rows = [
        (10, _us("2024-01-01 10:00:00"), 5, "click", None),  # the fact
        (11, _us("2024-01-02 12:00:00"), 9, "purchase", None),  # wm -> 11:00
        (12, _us("2024-01-02 13:00:00"), 9, "purchase", None),  # GC fires here
        (13, _us("2024-01-03 03:00:00"), 5, "signup", None),  # dim, gap 41 h
    ]
    derived = _tiny_events_dir(tmp_path, rows)
    df = load_registry()["lookup_cache_join_stream"].fn(spark, derived)
    got = sorted(
        (r.key, r.fact_id, r.fact_time, r.dim_version, r.dim_time, r.match_status)
        for r in df.collect()
    )
    assert got == [("5", "10", _us("2024-01-01 10:00:00"), None, None, "dlq")]
    assert sorted(simulate_lookup_cache(event_batches(derived))) == got


def test_lookup_cache_within_ttl_after_dim_still_matches(spark, tmp_path):
    """MUST-MATCH class pin: a buffered fact whose first at-or-after dim
    arrives within TTL is matched under ANY batch schedule — the GC
    timer sits at ≥ fact_ts + TTL while the dim's batch starts with the
    watermark still a delay behind the dim's own timestamp."""
    from example_beam_spark.registry import load_registry

    rows = [
        (20, _us("2024-01-01 10:00:00"), 5, "click", None),  # buffers
        (21, _us("2024-01-01 20:00:00"), 9, "purchase", None),  # wm -> 19:00
        (22, _us("2024-01-02 06:00:00"), 5, "signup", None),  # gap 20 h < TTL
        (23, _us("2024-01-02 12:00:00"), 9, "purchase", None),
    ]
    derived = _tiny_events_dir(tmp_path, rows)
    df = load_registry()["lookup_cache_join_stream"].fn(spark, derived)
    got = sorted(
        (r.key, r.fact_id, r.fact_time, r.dim_version, r.dim_time, r.match_status)
        for r in df.collect()
    )
    assert got == [
        (
            "5",
            "20",
            _us("2024-01-01 10:00:00"),
            "22",
            _us("2024-01-02 06:00:00"),
            "matched",
        )
    ]
    assert sorted(simulate_lookup_cache(event_batches(derived))) == got


def _ordered_chunks_dir(tmp_path, rows) -> str:
    """Like _tiny_events_dir but DELIVERY order == the given row order
    (one row per chunk, increasing mtimes, NO time sort) — builds the
    out-of-order arrival schedules chunked_sf_dir's sort can't."""
    import time as _t

    out = tmp_path / "ooo"
    ev_dir = out / "events.parquet"
    ev_dir.mkdir(parents=True)
    now = _t.time()
    for i, r in enumerate(rows):
        table = pa.table(
            {
                "event_id": pa.array([r[0]], pa.int64()),
                "ts": pa.array([r[1]], pa.timestamp("us")),
                "user_id": pa.array([r[2]], pa.int64()),
                "event_type": pa.array([r[3]], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array([r[4]], pa.string()),
            }
        )
        f = ev_dir / f"chunk-{i:04d}.parquet"
        pq.write_table(table, str(f))
        mt = now - 86400 + i * 10
        os.utime(str(f), (mt, mt))
    return str(out)


def test_funnel_stream_rewrites_chain_on_late_early_event(spark, tmp_path):
    """CONVERGENCE PIN (constructed, out-of-order): the user's later
    funnel stages arrive FIRST; the signup — the chain's root — arrives
    in the LAST batch. An incremental chain would have discarded the
    view/click/purchase as unreachable; the buffered-recompute state
    (streaming/funnel_stream.py) rebuilds the full chain, so the final
    emission reports a complete funnel."""
    from example_beam_spark.registry import load_registry

    rows = [
        (1, _us("2024-01-01 12:10:00"), 1, "view", None),
        (2, _us("2024-01-01 12:15:00"), 1, "click", None),
        (3, _us("2024-01-01 12:20:00"), 1, "purchase", None),
        (4, _us("2024-01-01 12:00:00"), 1, "signup", None),  # late root
    ]
    derived = _ordered_chunks_dir(tmp_path, rows)
    got = load_registry()["events_funnel_stream"].fn(spark, derived).collect()
    assert [tuple(r) for r in got] == [(1, 1, 1, 1, 1)]


def test_funnel_stream_strictly_after_semantics(spark, tmp_path):
    """Chain comparisons are STRICT (ts > prev, same as the batch
    MIN-CASE windows): a view at exactly the signup timestamp does not
    advance the funnel."""
    from example_beam_spark.registry import load_registry

    rows = [
        (1, _us("2024-01-01 12:00:00"), 1, "signup", None),
        (2, _us("2024-01-01 12:00:00"), 1, "view", None),  # ties: NOT after
        (3, _us("2024-01-01 12:30:00"), 2, "signup", None),
        (4, _us("2024-01-01 12:31:00"), 2, "view", None),
    ]
    derived = _ordered_chunks_dir(tmp_path, rows)
    got = load_registry()["events_funnel_stream"].fn(spark, derived).collect()
    # 2 users signed up; only user 2's view is strictly after their signup
    assert [tuple(r) for r in got] == [(2, 2, 1, 0, 0)]
