"""events_weekly_drift must charge the FULL |0 − baseline_share| term
for a type absent from a week — a vanished type is the sharpest drift
signal, and the pre-fix inner join silently halved it (identically in
both engines, so the value oracle could not catch it)."""

from __future__ import annotations

import duckdb

from example_beam_spark.operators.analytics import _DRIFT_ORACLE


def _rows(con):
    return {str(r[0]): (r[1], r[2]) for r in con.sql(_DRIFT_ORACLE).fetchall()}


def test_vanished_type_contributes_full_term():
    """Baseline 50/50 A/B; week 1 has only A (4 events), week 2 is the
    balancing 50/50 week... construct: week1 = 2×A, week2 = 1×A + 3×B.
    Baseline: A=3/7? — use exact numbers below."""
    con = duckdb.connect()
    # week of 2024-01-01: A,A  (B VANISHED)
    # week of 2024-01-08: A,B,B,B
    con.sql(
        """
        CREATE VIEW events AS
        SELECT * FROM (VALUES
            (1, TIMESTAMP '2024-01-01 10:00:00', 'A'),
            (2, TIMESTAMP '2024-01-02 10:00:00', 'A'),
            (3, TIMESTAMP '2024-01-08 10:00:00', 'A'),
            (4, TIMESTAMP '2024-01-09 10:00:00', 'B'),
            (5, TIMESTAMP '2024-01-10 10:00:00', 'B'),
            (6, TIMESTAMP '2024-01-11 10:00:00', 'B')
        ) AS t(event_id, ts, event_type)
        """
    )
    rows = _rows(con)
    # baseline: A=3/6, B=3/6. Week1 shares: A=1, B=0 (vanished).
    # TRUE L1 = |1 - 0.5| + |0 - 0.5| = 1.0; the inner-join bug gave 0.5.
    n1, l1 = rows["2024-01-01"]
    assert n1 == 2
    assert abs(l1 - 1.0) < 1e-12, l1
    # week2: A=1/4 vs 1/2 -> 0.25; B=3/4 vs 1/2 -> 0.25; L1 = 0.5
    n2, l2 = rows["2024-01-08"]
    assert n2 == 4
    assert abs(l2 - 0.5) < 1e-12, l2


def test_spark_matches_fixed_oracle(spark, tmp_path):
    """Same constructed corpus through the SPARK implementation: the
    grid fix must hold on both engines (parquet round-trip so the query
    reads through load_table like production)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    from example_beam_spark.operators.analytics import events_weekly_drift

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 'A'),
        (2, dt.datetime(2024, 1, 2, 10), 'A'),
        (3, dt.datetime(2024, 1, 8, 10), 'A'),
        (4, dt.datetime(2024, 1, 9, 10), 'B'),
        (5, dt.datetime(2024, 1, 10, 10), 'B'),
        (6, dt.datetime(2024, 1, 11, 10), 'B'),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * 6, pa.float64()),
            "props": pa.array(['{"k": 1}'] * 6, pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    got = {
        str(r["week"]): (r["n_events"], r["l1_drift"])
        for r in events_weekly_drift(spark, str(tmp_path)).collect()
    }
    assert got["2024-01-01"][0] == 2 and abs(got["2024-01-01"][1] - 1.0) < 1e-12
    assert got["2024-01-08"][0] == 4 and abs(got["2024-01-08"][1] - 0.5) < 1e-12
