"""Behavior operators: the degenerate paths the driver fixture cannot
exercise — constant-value (zero-variance) groups through the z-score
guard, on BOTH engines."""

from __future__ import annotations

import math

import duckdb

from example_beam_spark.operators.behavior import _ZSCORE_ORACLE, zscore_frame


def test_zscore_constant_group_emits_zero_spark(spark):
    """A constant-value group's variance is rounding noise (±ε, possibly
    negative); the guard must emit std=0 / z=0 — never NaN, inf, or a
    garbage ~1e9 z-score."""
    ev = spark.createDataFrame(
        [
            # constant group: var = sq/n - mean^2 = ±O(1e-18) noise
            (1, "const", 0.2),
            (2, "const", 0.2),
            (3, "const", 0.2),
            # normal group for contrast
            (4, "spread", 1.0),
            (5, "spread", 3.0),
        ],
        "event_id long, event_type string, value double",
    )
    rows = {r["event_id"]: r for r in zscore_frame(ev).collect()}
    for eid in (1, 2, 3):
        assert rows[eid]["grp_std"] == 0.0
        assert rows[eid]["zscore"] == 0.0
    assert rows[4]["grp_std"] > 0.9
    assert math.isfinite(rows[4]["zscore"]) and rows[4]["zscore"] < 0
    assert not any(
        math.isnan(v)
        for r in rows.values()
        for v in (r["grp_mean"], r["grp_std"], r["zscore"])
    )


def test_zscore_constant_group_oracle_does_not_abort():
    """The unguarded oracle crashed DuckDB with sqrt(-ε) on a constant
    group; the guarded one must run and agree: std=0, z=0."""
    con = duckdb.connect()
    con.sql(
        """
        CREATE VIEW events AS
        SELECT * FROM (VALUES
            (1, 'const', 0.2), (2, 'const', 0.2), (3, 'const', 0.2),
            (4, 'spread', 1.0), (5, 'spread', 3.0)
        ) AS t(event_id, event_type, value)
        """
    )
    rows = {r[0]: r for r in con.sql(_ZSCORE_ORACLE).fetchall()}
    # columns: event_id, event_type, value, grp_mean, grp_std, zscore
    for eid in (1, 2, 3):
        assert rows[eid][4] == 0.0 and rows[eid][5] == 0.0
    assert rows[4][4] > 0.9 and rows[4][5] < 0


def test_pivot_event_types_canary():
    """events_pivot_monthly hardcodes _EVENT_TYPES as pivot columns; a
    fixture regeneration that adds an event type would be silently
    uncounted in BOTH engines (so the value oracle cannot catch it).
    This canary fails loudly instead: the fixture's distinct event_type
    set must equal the hardcoded tuple at every generated SF."""
    import duckdb

    from example_beam_spark.operators.olap import _EVENT_TYPES

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        got = tuple(
            r[0]
            for r in con.sql(
                "SELECT DISTINCT event_type FROM "
                f"'/root/testdata/{sf}/events.parquet' ORDER BY 1"
            ).fetchall()
        )
        assert got == _EVENT_TYPES, (
            f"{sf}: fixture event types {got} != pivot columns "
            f"{_EVENT_TYPES} — update olap._EVENT_TYPES (and its oracle)"
        )
