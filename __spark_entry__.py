"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (fixed-window capped CTR — the
reference's canonical computation, AdCtrFixedWindowCalculator.scala:30-40)
at sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-data pipeline extensions,
backed by :mod:`example_beam_spark.registry`.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from example_beam_spark.registry import drain_cleanups, load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = load_registry()["ctr_fixed_capped"]
    return q.fn(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Release the PREVIOUS query's persisted intermediates before building
    the next one.

    SEQUENCING CONTRACT (API boundary): callables returned by
    ``queries()`` assume build→consume→build — consume (collect/count)
    each returned DataFrame before building the next. This matches the
    driver's and bench's loops. A caller that builds several DataFrames
    before collecting any still gets CORRECT results, but earlier
    queries' persisted intermediates are unpersisted pre-consumption and
    silently recomputed (performance and the persist-dependent plan
    shape lost, never values). We drain here rather than in a
    result-consumed hook because Spark offers no portable "this
    DataFrame was consumed" callback; the contract is the documented
    alternative."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        drain_cleanups()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.fn) for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible operators — driver records a rows-only check)."""
    return {
        name: q.oracle for name, q in load_registry().items() if q.oracle is not None
    }
