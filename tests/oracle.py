"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, then compare
row-count, column names, and order-insensitive values (columns sorted by
name, rows sorted, values normalized). Catches mismatches before the
driver's CORRECTNESS gate does."""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb

from example_beam_spark.schemas import TABLES


def run_oracle(sql: str, sf_dir: str):
    import os

    con = duckdb.connect()
    for name in TABLES:
        # Lane corpora (tools/skew_lane.py) carry only the tables the
        # lane's queries touch; skip absent files so events-only sf_dirs
        # can be oracle-checked (full fixtures always have all tables).
        if not os.path.exists(f"{sf_dir}/{name}.parquet"):
            continue
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # guard against representation noise only; engines should agree bit-for-bit
        return ("f", f"{v:.9g}")
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    return (type(v).__name__, v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc, dc = _canon(s_cols, s_rows), _canon(d_cols, d_rows)
    if sc != dc:
        diff = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diff}")
