"""Unit tests for the scalar function library (functions/scalar.py)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from example_beam_spark.functions import (
    cosine_similarity,
    minhash_component,
    one_hot,
    salted_md5,
    shingle_array,
    token_array,
)


def test_one_hot(spark):
    df = spark.createDataFrame(
        [("click",), ("impression",), ("unknown",)], ["action"]
    )
    rows = df.select(
        one_hot("action", "click").alias("c"),
        one_hot("action", "impression").alias("i"),
    ).collect()
    assert [(r.c, r.i) for r in rows] == [(1, 0), (0, 1), (0, 0)]


def test_shingle_array(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    rows = df.select(shingle_array("text", 3).alias("s")).collect()
    assert rows[0].s == ["a b c", "b c d"]
    assert rows[1].s == []


def test_token_array(spark):
    df = spark.createDataFrame([("x y z",)], ["text"])
    assert df.select(token_array("text").alias("t")).collect()[0].t == [
        "x", "y", "z",
    ]


def test_salted_md5_matches_hashlib(spark):
    df = spark.createDataFrame([("hello",)], ["v"])
    got = df.select(salted_md5("v", "7:").alias("h")).collect()[0].h
    assert got == hashlib.md5(b"7:hello").hexdigest()
    got2 = df.select(minhash_component("v", 7).alias("h")).collect()[0].h
    assert got2 == got


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0], b=[1.0, 0.0]), Row(a=[1.0, 0.0], b=[0.0, 1.0]),
         Row(a=[1.0, 2.0], b=[2.0, 4.0])]
    )
    got = [r.c for r in df.select(cosine_similarity("a", "b").alias("c")).collect()]
    assert got[0] == 1.0
    assert got[1] == 0.0
    assert math.isclose(got[2], 1.0, rel_tol=1e-12)


def test_reassign_to_fixed_buckets_by_period(spark):
    """W3: each sliding aggregate lands in the tumbling period-window
    containing its exclusive end - 1 ms (AdCtrSlidingWindowCalculator
    .scala:38-39)."""
    from datetime import datetime

    from example_beam_spark.operators.ctr import reassign_to_fixed

    df = spark.createDataFrame(
        [
            ("u1", datetime(1970, 1, 1, 10), datetime(1970, 1, 1, 12)),
            ("u1", datetime(1970, 1, 1, 11), datetime(1970, 1, 1, 13)),
        ],
        ["user_id", "window_start", "window_end"],
    )
    got = {
        (r.window_start.hour, r.fixed_window_start.hour, r.fixed_window_end.hour)
        for r in reassign_to_fixed(df, "1 hour").collect()
    }
    # end 12:00 -> fixed [11:00, 12:00); end 13:00 -> fixed [12:00, 13:00)
    assert got == {(10, 11, 12), (11, 12, 13)}


def test_named_and_probes_do_not_change_results(spark):
    """P10/P11: naming sets the UI job description + plan alias; probes
    run bounded side actions and return the SAME frame for chaining."""
    import io

    from example_beam_spark.functions.probes import (
        job_named,
        named,
        probe,
        probe_count,
        probe_plan,
    )

    df = spark.range(100).withColumnRenamed("id", "v")
    out = io.StringIO()
    chained = probe_plan(probe_count(probe(named(df, "hundred"), n=3, out=out), out=out), out=out)
    assert chained.count() == 100  # unchanged by probes
    text = out.getvalue()
    assert text.count("[probe]") == 3
    assert "[count] rows=100" in text
    assert "Physical Plan" in text
    assert spark.sparkContext.getLocalProperty("spark.job.description") == "hundred"

    with job_named(spark, "scoped-section"):
        assert (
            spark.sparkContext.getLocalProperty("spark.job.description")
            == "scoped-section"
        )
        df.count()
    # restored after the block
    assert spark.sparkContext.getLocalProperty("spark.job.description") == "hundred"
