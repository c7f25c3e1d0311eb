"""I/O layer tests: file-load sink dispositions (SaveSpecificRecord.scala
:59-79 analog), streaming-insert retry + DLQ (:81-97 analog), and the
nested-record round-trip (BigQueryRecord.scala:8-16, avro-example.avdl)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from example_beam_spark.sinks import (
    CreateDisposition,
    WriteDisposition,
    foreach_batch_with_retry,
    write_file_loads,
)
from example_beam_spark.sources import range_records


def _tmp(name: str) -> str:
    return os.path.join(tempfile.mkdtemp(prefix="io_test_"), name)


def test_write_append_accumulates(spark):
    path = _tmp("t")
    df = range_records(spark, 10)
    write_file_loads(df, path)
    write_file_loads(df, path)  # WRITE_APPEND default
    assert spark.read.parquet(path).count() == 20


def test_write_truncate_replaces(spark):
    path = _tmp("t")
    write_file_loads(range_records(spark, 10), path)
    write_file_loads(
        range_records(spark, 5), path,
        write_disposition=WriteDisposition.WRITE_TRUNCATE,
    )
    assert spark.read.parquet(path).count() == 5


def test_create_never_requires_existing_target(spark):
    path = _tmp("missing")
    with pytest.raises(FileNotFoundError, match="CREATE_NEVER"):
        write_file_loads(
            range_records(spark, 3), path,
            create_disposition=CreateDisposition.CREATE_NEVER,
        )
    # once the target exists, CREATE_NEVER appends fine
    write_file_loads(range_records(spark, 3), path)
    write_file_loads(
        range_records(spark, 3), path,
        create_disposition=CreateDisposition.CREATE_NEVER,
    )
    assert spark.read.parquet(path).count() == 6


def test_write_empty_refuses_nonempty_target(spark):
    path = _tmp("t")
    write_file_loads(range_records(spark, 3), path)
    with pytest.raises(FileExistsError, match="WRITE_EMPTY"):
        write_file_loads(
            range_records(spark, 3), path,
            write_disposition=WriteDisposition.WRITE_EMPTY,
        )


def test_nested_record_roundtrip_preserves_types(spark):
    """Struct-in-array, map, nullable, timestamp survive the sink+source."""
    path = _tmp("records")
    df = range_records(spark, 20)
    write_file_loads(df, path)
    back = spark.read.schema(df.schema).parquet(path)
    # file sources relax nullability on read (standard Spark behavior, at
    # every nesting level); names and data types must survive exactly
    assert back.schema.simpleString() == df.schema.simpleString()
    row = back.filter(F.col("id") == 7).collect()[0]
    assert row.attributes[0].value == "someValue 7"
    assert row.attributes_map["someKey"] == "someValue 7"
    assert row.description == "some description 7"
    assert back.filter(F.col("id") == 10).collect()[0].description is None


def test_foreach_batch_retry_transient_then_succeeds(spark):
    """Transient failures are retried; the batch lands, DLQ stays empty."""
    attempts, delivered, dead = [], [], []

    def deliver(bdf, bid):
        attempts.append(bid)
        if len(attempts) < 3:
            raise IOError("transient write failure")
        delivered.append((bid, bdf.count()))

    sink = foreach_batch_with_retry(
        deliver, on_failed=lambda bdf, bid, e: dead.append((bid, str(e))),
        max_retries=3,
    )
    sink(spark.range(5), 0)
    assert delivered == [(0, 5)]
    assert len(attempts) == 3
    assert dead == []


def test_foreach_batch_exhausted_retries_route_to_dlq(spark):
    delivered, dead = [], []

    def deliver(bdf, bid):
        raise IOError("still failing")

    sink = foreach_batch_with_retry(
        deliver, on_failed=lambda bdf, bid, e: dead.append((bid, bdf.count(), str(e))),
        max_retries=2,
    )
    sink(spark.range(4), 7)
    assert delivered == []
    assert dead == [(7, 4, "still failing")]


def test_foreach_batch_nontransient_goes_straight_to_dlq(spark):
    """The retry policy mirrors retryTransientErrors: a non-transient
    error is NOT retried."""
    attempts, dead = [], []

    def deliver(bdf, bid):
        attempts.append(bid)
        raise ValueError("schema mismatch — permanent")

    sink = foreach_batch_with_retry(
        deliver,
        on_failed=lambda bdf, bid, e: dead.append(bid),
        max_retries=5,
        transient=lambda e: isinstance(e, IOError),
    )
    sink(spark.range(1), 3)
    assert len(attempts) == 1
    assert dead == [3]


def test_foreach_batch_retry_in_real_stream(spark):
    """End-to-end: a rate-limited parquet sink that fails on first touch
    per batch, wrapped in the retry policy, inside a real streaming query."""
    src = tempfile.mkdtemp(prefix="stream_in_")
    out = _tmp("out")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    spark.range(10).coalesce(1).write.mode("append").parquet(src)

    failed_once: set[int] = set()

    def deliver(bdf, bid):
        if bid not in failed_once:
            failed_once.add(bid)
            raise IOError("transient")
        bdf.write.mode("append").parquet(out)

    q = (
        spark.readStream.schema("id long")
        .parquet(src)
        .writeStream.foreachBatch(
            foreach_batch_with_retry(deliver, on_failed=lambda *a: None)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 10


def test_json_roundtrip_preserves_nested_values(spark):
    """S6 wire-format coverage beyond parquet: the nested Record survives a
    json write/read (schema re-imposed on read — json carries no types)."""
    path = _tmp("t")
    df = range_records(spark, 25)
    write_file_loads(df, path, fmt="json")
    back = spark.read.schema(df.schema).json(path)
    assert back.count() == 25
    a = {r["id"]: r for r in df.collect()}
    b = {r["id"]: r for r in back.collect()}
    assert a == b


def test_csv_roundtrip_flat_projection(spark):
    """csv cannot carry nested columns; the flat projection round-trips
    with header + declared schema, and options pass through the sink."""
    path = _tmp("t")
    df = range_records(spark, 25).select("id", "timestamp", "name", "description")
    write_file_loads(df, path, fmt="csv", options={"header": "true"})
    back = spark.read.schema(df.schema).option("header", "true").csv(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_avro_falls_back_to_ocf_writer_without_module(spark):
    """No spark-avro jar here: fmt='avro' must transparently write OCF
    files via the pure-Python path (tests/test_avro.py covers the codec
    and dispositions in depth)."""
    from example_beam_spark.formats.avro_spark import read_avro

    path = _tmp("t")
    df = range_records(spark, 5)
    write_file_loads(df, path, fmt="avro")
    assert sorted(read_avro(spark, path).collect(), key=lambda r: r.id) == sorted(
        df.collect(), key=lambda r: r.id
    )


def test_partitioned_layout_and_dynamic_overwrite(spark):
    """Hive-style partition layout + dynamic partition overwrite: a
    WRITE_TRUNCATE load carrying only some partitions must replace those
    partitions and leave the others untouched."""
    path = _tmp("t")
    df = range_records(spark, 20).withColumn("bucket", F.col("id") % 2)
    write_file_loads(df, path, partition_by=["bucket"])
    assert os.path.isdir(os.path.join(path, "bucket=0"))
    assert spark.read.parquet(path).count() == 20

    # partition-key predicate prunes to one directory
    assert spark.read.parquet(path).filter(F.col("bucket") == 1).count() == 10

    # replace ONLY bucket=0 (5 fresh rows); bucket=1 keeps its 10
    repl = (
        range_records(spark, 5)
        .withColumn("bucket", F.lit(0))
        .withColumn("id", F.col("id") + 1000)
    )
    write_file_loads(
        repl,
        path,
        write_disposition=WriteDisposition.WRITE_TRUNCATE,
        partition_by=["bucket"],
        dynamic_partition_overwrite=True,
    )
    back = spark.read.parquet(path)
    assert back.filter(F.col("bucket") == 0).count() == 5
    assert back.filter(F.col("bucket") == 1).count() == 10

    # static overwrite (the default) replaces the WHOLE table
    write_file_loads(
        repl, path,
        write_disposition=WriteDisposition.WRITE_TRUNCATE,
        partition_by=["bucket"],
    )
    assert spark.read.parquet(path).count() == 5
