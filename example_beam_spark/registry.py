"""Query registry — binds every implemented operator to (a) a PySpark
callable ``(spark, sf_dir) -> DataFrame`` and (b) where SQL-expressible,
an equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. This is the correctness contract consumed by ``__spark_entry__.py``.

Float-stability convention for oracle-hashed results
----------------------------------------------------
The harness hashes values, so floating-point aggregates must be bit-equal
between Spark and DuckDB. Per-row double arithmetic is IEEE-deterministic
across engines, but *aggregation order* is not. Rule used everywhere:

- per-row expressions: compute in DOUBLE (identical in both engines);
- before SUM/AVG: cast to DECIMAL(38,6) — decimal addition is exact and
  order-independent, so both engines produce the identical decimal;
- cast the final aggregate back to DOUBLE (deterministic conversion).

Helpers ``dsum``/``davg`` (Spark) and the matching SQL fragments encode
this convention.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


_SERIAL = itertools.count()


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    headline: bool = False  # include in bench.py
    # registration sequence — preserves SOURCE order of register() calls
    # within a module no matter when the module happened to be imported
    serial: int = field(default_factory=lambda: next(_SERIAL))


QUERIES: dict[str, Query] = {}


# ---- deferred cache cleanup ----------------------------------------------
# Queries that .persist() an intermediate cannot unpersist it eagerly (the
# returned DataFrame is lazy — the cache must survive until the CALLER has
# consumed the result). Relying on LRU eviction instead leaks one cached
# relation per invocation in long-lived sessions (verify_all / bench /
# time_surface run all ~110 queries in one session). Contract: a query
# registers its cleanup via defer_cleanup(); every runner calls
# drain_cleanups() AFTER consuming (collect/count) the returned DataFrame.
# Unpersist after consumption is always safe — a re-used DataFrame simply
# recomputes.

_CLEANUPS: list[Callable[[], None]] = []


def defer_cleanup(fn: Callable[[], None]) -> None:
    """Register a cleanup (typically ``lambda: df.unpersist()``) to run
    once the current query's result has been consumed."""
    _CLEANUPS.append(fn)


def drain_cleanups() -> int:
    """Run and clear all deferred cleanups; returns how many ran.
    Cleanup errors are suppressed (an unpersist on a stopped session
    must never mask the query result that already materialized)."""
    n = len(_CLEANUPS)
    while _CLEANUPS:
        fn = _CLEANUPS.pop()
        try:
            fn()
        except Exception:
            pass
    return n


def register(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


# ---- float-stability helpers (see module docstring) -----------------------

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM: sum in exact decimal, return double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )


# The registry has grown past the driver's graded window (first 50 entries,
# positionally frozen since round 1). Ordering is the NATURAL registration
# order — _MODULE_ORDER (the order modules were added to the repo, new
# modules appended at the tail) then source order within each module — and
# the registry does not reorder itself around the window. The canonical sort
# below reproduces that order deterministically even if some operator module
# was imported directly (e.g. by a test) before load_registry() ran;
# otherwise an early `import textops` would silently rotate the graded
# window (tests/test_registry_order.py pins it). Entries past the window are
# still fully oracle-checked every round by tests/test_registry_oracle.py,
# which runs EVERY registered query against its DuckDB oracle at sf0.001
# regardless of position.

_MODULE_ORDER = [
    "example_beam_spark.operators.ctr",
    "example_beam_spark.operators.enrich",
    "example_beam_spark.operators.relational",
    "example_beam_spark.operators.dedup",
    "example_beam_spark.operators.similarity",
    "example_beam_spark.operators.textops",
    "example_beam_spark.operators.multimodal",
    "example_beam_spark.operators.io_roundtrip",
    "example_beam_spark.operators.setops",
    "example_beam_spark.operators.subqueries",
    "example_beam_spark.operators.tpch",
    "example_beam_spark.streaming.entries",
    # appended after round 4
    "example_beam_spark.operators.avro_io",
    "example_beam_spark.operators.corpusqa",
    "example_beam_spark.operators.ivf",
    # round 5, session 3
    "example_beam_spark.operators.curation",
    "example_beam_spark.operators.sketches",
    "example_beam_spark.operators.analytics",
    # round 5, session 4
    "example_beam_spark.operators.behavior",
    "example_beam_spark.operators.corpus_ops",
    "example_beam_spark.operators.olap",
    # round 8
    "example_beam_spark.operators.retrieval",
    "example_beam_spark.operators.graphtext",
    "example_beam_spark.streaming.markov_stream",
    "example_beam_spark.streaming.cusum_stream",
    # round 9
    "example_beam_spark.operators.scaleops",
    "example_beam_spark.streaming.repeat_stream",
    # round 10
    "example_beam_spark.streaming.neardup_stream",
    # round 11
    "example_beam_spark.operators.trainprep",
    "example_beam_spark.operators.structures",
    # round 12
    "example_beam_spark.streaming.join_dlq_stream",
    "example_beam_spark.operators.decontam",
    # round 13
    "example_beam_spark.operators.scalepaths",
]


def load_registry() -> dict[str, Query]:
    """Import every operator module (each registers its queries on import);
    return the registry in canonical order: _MODULE_ORDER, then source
    order within each module."""
    import importlib

    for mod in _MODULE_ORDER:
        importlib.import_module(mod)

    def key(q: Query) -> tuple[int, int]:
        try:
            return (_MODULE_ORDER.index(q.fn.__module__), q.serial)
        except ValueError:
            raise RuntimeError(
                f"query {q.name!r} registered from {q.fn.__module__!r}, which is "
                "not in registry._MODULE_ORDER — append the new module at the "
                "TAIL of that list (never insert mid-list: the driver grades "
                "the first 50 entries positionally)"
            ) from None

    return {q.name: q for q in sorted(QUERIES.values(), key=key)}
