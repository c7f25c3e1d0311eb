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
