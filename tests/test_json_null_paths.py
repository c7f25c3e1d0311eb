"""events_json_stats NULL-path parity: the fixture's props are all valid
numeric JSON, so the missing-key / malformed-JSON / non-numeric paths
the operator documents are pinned here against hand-built rows — both
engines must extract NULL (never error) for every degenerate shape."""

from __future__ import annotations

import duckdb
import pytest

_CASES = [
    ('{"k": 42}', 42),  # the fixture shape
    ('{"k": "7"}', 7),  # numeric string still casts
    ('{"j": 1}', None),  # missing key
    ('{"k": "x"}', None),  # non-numeric value
    ("{bad", None),  # malformed JSON
    ("", None),  # empty string
    (None, None),  # NULL payload
]


def test_spark_extraction_null_paths(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(p,) for p, _ in _CASES], "props string")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    got = [r.k for r in df.select(k.alias("k")).collect()]
    assert got == [want for _, want in _CASES], got


def test_duckdb_oracle_null_paths():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (props VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(p,) for p, _ in _CASES])
    got = [
        r[0]
        for r in con.execute(
            """
            SELECT TRY_CAST(CASE WHEN json_valid(props)
                                 THEN json_extract_string(props, '$.k') END
                            AS BIGINT)
            FROM t
            """
        ).fetchall()
    ]
    assert got == [want for _, want in _CASES], got


@pytest.mark.parametrize("payload,want", _CASES)
def test_both_engines_agree(spark, payload, want):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(payload,)], "props string")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    spark_val = df.select(k.alias("k")).collect()[0].k
    duck_val = duckdb.sql(
        "SELECT TRY_CAST(CASE WHEN json_valid(v) THEN json_extract_string(v, '$.k') END AS BIGINT) "
        "FROM (SELECT ?::VARCHAR AS v)",
        params=[payload],
    ).fetchone()[0]
    assert spark_val == duck_val == want
