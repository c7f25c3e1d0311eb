"""Physical-plan introspection — the engine's scale-contract checks.

The reference encodes its physical strategies manually (predicate pushdown
via BigQuery rowRestriction — TypedBigQueryStorage.scala:14-16; broadcast
via side inputs — ScreenGlobalWindowWithSideInputEnricher.scala:32; column
pruning via typed reads — TypedBigQuery.scala:14). On Spark those are
Catalyst's job; these helpers make them ASSERTABLE so tests pin the plan
shape that keeps queries viable at 100 TB:

- filters reach the parquet scan (``PushedFilters``),
- scans read only referenced columns (``ReadSchema``),
- small dimensions broadcast instead of shuffling,
- the hot path stays inside whole-stage codegen,
- the shuffle count doesn't silently regress.

All parsing is over ``explain("formatted")`` output — the same surface a
human uses to review a plan, so test failures print actionable plans.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True when some scan's PushedFilters mentions ``fragment``
    (e.g. 'StringContains', 'IsNotNull(o_custkey)', 'GreaterThan')."""
    plan = explain_formatted(df)
    for m in re.finditer(r"PushedFilters: \[(?P<f>[^\]]*)\]", plan):
        if fragment in m.group("f"):
            return True
    return False


def read_schema_columns(df: DataFrame, table_hint: str) -> set[str]:
    """Column names in the ReadSchema of the scan whose Location mentions
    ``table_hint`` (e.g. 'part.parquet') — the column-pruning check."""
    plan = explain_formatted(df)
    blocks = plan.split("(")  # formatted plan numbers nodes "(1) Scan ..."
    cols: set[str] = set()
    current_match = False
    for block in blocks:
        if "Location:" in block and table_hint in block:
            current_match = True
        if current_match and "ReadSchema:" in block:
            m = re.search(r"ReadSchema: struct<([^>]*)>", block)
            if m:
                for field in m.group(1).split(","):
                    name = field.split(":")[0].strip()
                    if name:
                        cols.add(name)
            current_match = False
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def num_exchanges(df: DataFrame) -> int:
    """Shuffle count (Exchange nodes, excluding broadcast exchanges) —
    the number that must not silently grow with refactors. Counts the
    formatted plan's '(n) Exchange' detail blocks (BroadcastExchange is a
    distinct node name and is not counted)."""
    plan = explain_formatted(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen regions the EXECUTED plan has (fewer,
    wider spans = more of the query compiled into single JVM loops).

    Under AQE the final physical plan only exists after execution, so this
    runs the query (count()) and parses the final adaptive plan's ``*(n)``
    markers — intended for tests at small SF, not production paths."""
    df.collect()  # count() would execute a different (re-optimized) plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
