"""RepeatDoFn fidelity twin — branch pins on a constructed corpus.

The sf-fixture oracle sweep exercises the aggregate schedule; these
scenarios pin each branch of RepeatDoFn.scala:60-114 individually:
silent cache update mid-chain, the death tick emitting the STALE
element, restart after death, and the same-microsecond arrival tie
(event_id order decides which element the next tick re-emits).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from example_beam_spark.streaming.repeat_stream import (
    _I_US,
    _TTL_US,
    enrich_repeat_stream,
)
from tests.oracle import assert_matches_oracle

US = 1_000_000
HOUR = 3600 * US
BASE = 1_704_067_200 * US  # 2024-01-01 UTC


def _write(tmp_path, rows):
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["signup"] * len(rows), pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.nulls(len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def test_repeat_branches(spark, tmp_path):
    rows = [
        # user 1: chain anchored at BASE; a second element 1 h in
        # (silent cache update — no emission, grid unchanged); ticks at
        # +12/24/36 h emit element 2; death at +48 h (window (12h, 48h]
        # empty) still emits element 2; element at +72 h restarts.
        (1, BASE, 1, 10.0),
        (2, BASE + 1 * HOUR, 1, 20.0),
        (3, BASE + 72 * HOUR, 1, 30.0),
        # user 2: same-microsecond pair — initial emits id 10 (first in
        # (ts, id) order, cache empty), id 11 silently replaces it, the
        # +12 h tick re-emits id 11.
        (10, BASE, 2, 1.0),
        (11, BASE, 2, 2.0),
    ]
    sf = _write(tmp_path, rows)
    df = enrich_repeat_stream(spark, sf)
    got = sorted(
        (r.user_id, int(r.emit_ts.timestamp() * US), r.src_event_id, r.kind)
        for r in df.collect()
    )

    def ticks(anchor_us, ks):
        return [anchor_us + k * _I_US for k in ks]

    want = sorted(
        [
            (1, BASE, 1, "initial"),
            # ticks +12/24/36/48h all emit the NEWER element 2 (the
            # death tick at +48h included: emit precedes the TTL check)
            *[(1, t, 2, "repeat") for t in ticks(BASE, (1, 2, 3, 4))],
            (1, BASE + 72 * HOUR, 3, "initial"),
            # restarted chain: lastSeen == anchor, so the death tick is
            # the first T with T >= anchor + 36 h → k = 3 (it emits)
            *[(1, t, 3, "repeat") for t in ticks(BASE + 72 * HOUR, (1, 2, 3))],
            (2, BASE, 10, "initial"),
            *[(2, t, 11, "repeat") for t in ticks(BASE, (1, 2, 3))],
        ]
    )
    assert got == want
    # and the recursive oracle reproduces the same schedule on this corpus
    assert_matches_oracle(
        enrich_repeat_stream(spark, sf),
        __import__(
            "example_beam_spark.streaming.repeat_stream", fromlist=["_REPEAT_ORACLE"]
        )._REPEAT_ORACLE,
        sf,
        "enrich_repeat_stream/constructed",
    )


def test_repeat_death_uses_last_seen_not_anchor(spark, tmp_path):
    """TTL is measured from lastSeen (the cached element), not the
    anchor: a mid-chain element extends the chain's life."""
    rows = [
        (1, BASE, 1, 1.0),
        # 30 h in: inside (T-36h, T] for many more ticks — chain now
        # lives until 30h + 36h = 66h; death = first tick >= 66h → 72h
        (2, BASE + 30 * HOUR, 1, 2.0),
    ]
    sf = _write(tmp_path, rows)
    got = sorted(
        (int(r.emit_ts.timestamp() * US), r.src_event_id, r.kind)
        for r in enrich_repeat_stream(spark, sf).collect()
    )
    emitted_ticks = [t for t, _, k in got if k == "repeat"]
    assert emitted_ticks == [BASE + k * _I_US for k in range(1, 7)]  # 12..72h
    # ticks at 36h+ re-emit element 2
    assert [e for t, e, k in got if k == "repeat"] == [1, 1, 2, 2, 2, 2]
    assert _TTL_US == 36 * HOUR  # the scenario arithmetic above assumes it


def test_repeat_oracle_guards_grid_overflow(tmp_path):
    """A chain alive past the oracle's 2000-interval tick grid must
    fail LOUDLY (error() in the death CTE), never silently drop the
    chain's ticks and its successors. Elements every 24 h (inside the
    36 h ttl) for 1001 days keep one chain alive for > 2000 ticks."""
    import duckdb
    import pytest

    from example_beam_spark.streaming.repeat_stream import _REPEAT_ORACLE
    from tests.oracle import run_oracle

    rows = [
        (i, BASE + i * 24 * HOUR, 1, 1.0) for i in range(1001)
    ]
    sf = _write(tmp_path, rows)
    with pytest.raises(duckdb.Error, match="chain alive past"):
        run_oracle(_REPEAT_ORACLE, sf)
