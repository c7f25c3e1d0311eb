"""Stream-stream left-outer join with a time-range validity condition —
the Spark-native replacement for the reference's repeater join
(AdEventFixedWindowWithRepeaterEnricher.scala:50-54 + RepeatDoFn.scala:
48-120).

The reference needed a stateful "repeater" because Beam's windowed join
only matches elements in the SAME window: the screen (dimension) row is
re-emitted by a timer every window for a TTL so later ad events can still
join it. Spark's stream-stream join takes an arbitrary event-time range
predicate, so the whole workaround collapses into the join condition:

    fact.event_time BETWEEN dim.event_time AND dim.event_time + TTL

Watermarks on BOTH inputs bound the join state: the dim side is held for
TTL + watermark delay, then evicted; unmatched facts emit (with null dim
columns — the DLQ shape, J5/J6) once the watermark passes their validity
range. This is exactly the state GC the reference hand-codes with timers
(RepeatDoFn.scala:89-114), done by the engine.

Scale notes: the join shuffles both sides by the equi-key; state per key
is bounded by TTL × arrival rate. Skewed hot keys are the operational
risk at 100 TB/day — :func:`salted_stream_stream_time_range_join` spreads
a hot key across N (key, salt) state partitions (dim rows replicated per
salt, facts salted deterministically); the range predicate itself adds no
extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_time_range_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    ttl_seconds: int,
    fact_ts: str = "event_time",
    dim_ts: str = "dim_event_time",
    how: str = "leftOuter",
) -> DataFrame:
    """Join each fact to every dim row with the same ``key`` whose
    validity window ``[dim_ts, dim_ts + ttl]`` covers the fact's event
    time. Both inputs MUST already carry watermarks (the engine needs
    them to bound state and emit outer-null rows).

    Dim columns must be pre-renamed to avoid collisions (including the
    key: ``<key>_dim``); unmatched facts surface with null dim columns.
    """
    cond = (
        (F.col(key) == F.col(f"{key}_dim"))
        & (F.col(fact_ts) >= F.col(dim_ts))
        & (F.col(fact_ts) <= F.col(dim_ts) + F.expr(f"INTERVAL {ttl_seconds} SECOND"))
    )
    return facts.join(dims, cond, how).drop(f"{key}_dim")


def split_matched(joined: DataFrame, probe_col: str) -> tuple[DataFrame, DataFrame]:
    """DLQ fork (P6/J6): (matched, unmatched) on a right-side column being
    null — the reference's two-output enricher shape
    (AdEventFixedWindowWithRepeaterEnricher.scala:61-67)."""
    return (
        joined.filter(F.col(probe_col).isNotNull()),
        joined.filter(F.col(probe_col).isNull()),
    )


def salted_stream_stream_time_range_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    ttl_seconds: int,
    n_salts: int,
    salt_cols: list[str],
    fact_ts: str = "event_time",
    dim_ts: str = "dim_event_time",
    how: str = "leftOuter",
) -> DataFrame:
    """Skew-hardened form of :func:`stream_stream_time_range_join`: a hot
    join key (one screen serving most of the traffic) would put that key's
    entire state and probe load on ONE StateStore partition. Salting
    splits it ``n_salts`` ways:

    - facts get a deterministic salt in ``[0, n_salts)`` hashed from
      ``salt_cols`` (must be stable per fact — e.g. the fact id — so
      micro-batch replays land on the same partition);
    - every dim row is replicated once per salt value (the dim side is
      the small side; ×n_salts rows is the price of spreading the hot
      key, exactly the classic broadcast-less skew-salt);
    - the join key becomes (key, salt) packed into one string column, so
      the engine hash-partitions state on the salted key.

    Join semantics are unchanged: each fact sees every dim row of its
    original key (each dim copy exists for the fact's salt), and each
    (fact, dim) pair exists exactly once. Unmatched facts still emit one
    outer-null row.
    """
    skey, salt = f"__salted_{key}", "__salt"
    facts_s = facts.withColumn(
        salt, F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    ).withColumn(skey, F.concat_ws("#", F.col(key), F.col(salt)))
    dims_s = dims.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(
        f"{skey}_dim", F.concat_ws("#", F.col(f"{key}_dim"), F.col(salt))
    )
    joined = stream_stream_time_range_join(
        facts_s.drop(salt),
        dims_s.drop(salt, f"{key}_dim"),
        key=skey,
        ttl_seconds=ttl_seconds,
        fact_ts=fact_ts,
        dim_ts=dim_ts,
        how=how,
    )
    return joined.drop(skey)
