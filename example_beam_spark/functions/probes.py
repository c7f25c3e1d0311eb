"""Transform naming and debug probes (P10/P11) — the Spark analogs of
Scio's ``withName`` stage labels and its ``debug()``/``take``/``count``
inspection helpers (the reference leaves debug probes as commented-out
``.withWindow``/``.withPaneInfo`` calls, AdCtrCustomWindowCalculator
.scala:49-50; named transforms appear throughout, e.g.
AdCtrFixedWindowCalculator.scala:30-38).

Beam's names attach to the transform graph; Spark's closest surfaces are

- the **job description / job group** (shows in the Spark UI per action),
- a DataFrame **alias** (shows in the analyzed plan and disambiguates
  self-join lineage),

so ``named`` sets both. Probes must NOT change the plan they observe —
each helper runs its own bounded action against the same logical plan
(Catalyst re-optimizes independently; a ``limit(n)`` probe pushes the
limit into the scan, so probing a 100-TB frame stays cheap) and returns
the input frame for chaining.
"""

from __future__ import annotations

import sys
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def named(df: DataFrame, name: str) -> DataFrame:
    """P10 — name a transform: alias the frame (visible in plan lineage)
    and set the session's job description so subsequent actions show
    ``name`` in the Spark UI (Beam: ``transform.withName(name)``)."""
    df.sparkSession.sparkContext.setJobDescription(name)
    return df.alias(name)


@contextmanager
def job_named(spark: SparkSession, name: str):
    """Scope a job description to a block of actions, restoring the
    previous description on exit — the with-block analog of ``named``
    for multi-action sections."""
    sc = spark.sparkContext
    prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(name)
    try:
        yield
    finally:
        sc.setJobDescription(prev)


def probe(df: DataFrame, n: int = 5, label: str = "probe", out=None) -> DataFrame:
    """P11 — Scio ``debug()``: print up to ``n`` rows (bounded action on
    the same plan; the limit pushes to the scan) and return ``df``
    unchanged for chaining."""
    out = out or sys.stderr
    for row in df.limit(n).collect():
        print(f"[{label}] {row.asDict()}", file=out)
    return df


def probe_count(df: DataFrame, label: str = "count", out=None) -> DataFrame:
    """P11 — Scio ``count`` probe: print the row count, return ``df``."""
    out = out or sys.stderr
    print(f"[{label}] rows={df.count()}", file=out)
    return df


def probe_plan(df: DataFrame, out=None) -> DataFrame:
    """P11 — plan probe: print the formatted physical plan (the analog of
    inspecting window/pane assignment — what the engine will actually
    run), return ``df``."""
    out = out or sys.stderr
    jvm = df.sparkSession._jvm
    print(
        jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"),
        file=out,
    )
    return df
