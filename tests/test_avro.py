"""Avro wire-format tests: pure-Python OCF codec, cross-implementation
interop with the official Apache Avro Java library (avro-1.12.1.jar on
Spark's classpath), and the distributed Spark sink/source built on it."""

from __future__ import annotations

import datetime as dt
import decimal
import glob
import io
import json
import os

import pytest

from example_beam_spark.formats.avro_ocf import read_ocf, write_ocf
from example_beam_spark.formats.avro_spark import read_avro, write_avro
from example_beam_spark.sinks import (
    CreateDisposition,
    WriteDisposition,
    write_file_loads,
)
from example_beam_spark.sources import range_records

UTC = dt.timezone.utc

FULL_SCHEMA = {
    "type": "record",
    "name": "Rec",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "name", "type": "string"},
        {"name": "desc", "type": ["null", "string"], "default": None},
        {
            "name": "attrs",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "KV",
                    "fields": [
                        {"name": "key", "type": "string"},
                        {"name": "value", "type": "string"},
                    ],
                },
            },
        },
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "x", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "b", "type": "bytes"},
        {
            "name": "dec",
            "type": {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": 12,
                "scale": 2,
            },
        },
        {"name": "flag", "type": "boolean"},
    ],
}


def _full_rows(n: int) -> list[dict]:
    return [
        {
            "id": i - 3,  # include negative longs (zigzag path)
            "ts": dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=i, microseconds=i),
            "name": f"n{i}",
            "desc": None if i % 3 == 0 else f"d{i}",
            "attrs": [{"key": "k", "value": f"v{i}"}],
            "m": {"a": f"x{i}"},
            "d": dt.date(2024, 1, 1) + dt.timedelta(days=i),
            "x": i * 1.5,
            "f": float(i),
            "b": bytes([i % 256, 0, 255]),
            "dec": decimal.Decimal(i - 50) + decimal.Decimal("0.25"),
            "flag": i % 2 == 0,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_codec_roundtrip(codec):
    rows = _full_rows(500)
    buf = io.BytesIO()
    n = write_ocf(buf, FULL_SCHEMA, rows, codec=codec, block_records=64)
    assert n == 500
    schema, it = read_ocf(buf.getvalue())
    out = list(it)
    assert schema == FULL_SCHEMA
    assert len(out) == 500
    for i in (0, 1, 7, 499):
        r, exp = out[i], rows[i]
        assert r["id"] == exp["id"] and r["ts"] == exp["ts"] and r["d"] == exp["d"]
        assert r["desc"] == exp["desc"] and r["attrs"] == exp["attrs"]
        assert r["m"] == [("a", f"x{i}")]
        assert r["x"] == exp["x"] and r["b"] == exp["b"] and r["flag"] == exp["flag"]
        assert r["dec"] == exp["dec"].quantize(decimal.Decimal("0.01"))


def test_java_reads_python_written_file(spark, tmp_path):
    """The official Apache Avro Java DataFileReader must accept our files
    byte-for-byte — the real interop bar for the wire format."""
    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "name", "type": "string"},
            {"name": "desc", "type": ["null", "string"], "default": None},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ],
    }
    rows = [
        {
            "id": i,
            "ts": 1_700_000_000_000_000 + i,
            "name": f"n{i}",
            "desc": None if i % 3 == 0 else f"d{i}",
            "m": {"a": f"x{i}"},
        }
        for i in range(40)
    ]
    path = str(tmp_path / "py.avro")
    with open(path, "wb") as f:
        write_ocf(f, schema, rows, codec="deflate", block_records=7)

    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), reader)
    got = []
    while dfr.hasNext():
        got.append(json.loads(dfr.next().toString()))
    dfr.close()
    assert len(got) == 40
    assert got[7] == {
        "id": 7,
        "ts": 1_700_000_000_000_007,
        "name": "n7",
        "desc": "d7",
        "m": {"a": "x7"},
    }
    assert got[0]["desc"] is None


def test_python_reads_java_written_file(spark, tmp_path):
    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "desc", "type": ["null", "string"], "default": None},
        ],
    }
    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / "java.avro")
    dfw.create(jschema, jvm.java.io.File(path))
    for i in range(20):
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("id", jvm.java.lang.Long(i))
        rec.put("name", f"jn{i}")
        rec.put("desc", None if i % 2 else f"jd{i}")
        dfw.append(rec)
    dfw.close()

    with open(path, "rb") as f:
        _, it = read_ocf(f.read())
    back = list(it)
    assert len(back) == 20
    assert back[3] == {"id": 3, "name": "jn3", "desc": None}
    assert back[2] == {"id": 2, "name": "jn2", "desc": "jd2"}


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = range_records(spark, 100).repartition(4)
    path = str(tmp_path / "records")
    n = write_avro(df, path, mode="overwrite", codec="deflate", max_records_per_file=20)
    assert n == 100
    # 4 partitions x 25 rows capped at 20/file -> 8 part files
    assert len(glob.glob(os.path.join(path, "*.avro"))) == 8

    expected = sorted(df.collect(), key=lambda r: r.id)
    inferred = sorted(read_avro(spark, path).collect(), key=lambda r: r.id)
    explicit = sorted(read_avro(spark, path, schema=df.schema).collect(), key=lambda r: r.id)
    assert inferred == expected
    assert explicit == expected

    # append mode adds files; overwrite replaces them
    write_avro(df, path, mode="append")
    assert read_avro(spark, path).count() == 200
    write_avro(df, path, mode="overwrite")
    assert read_avro(spark, path).count() == 100


def test_file_loads_avro_fallback_and_dispositions(spark, tmp_path):
    """write_file_loads(fmt='avro') must transparently use the OCF writer
    (no spark-avro jar here) while still honoring dispositions."""
    df = range_records(spark, 30)
    path = str(tmp_path / "loads")

    with pytest.raises(FileNotFoundError):
        write_file_loads(
            df, path, create_disposition=CreateDisposition.CREATE_NEVER, fmt="avro"
        )

    write_file_loads(df, path, fmt="avro")
    assert read_avro(spark, path).count() == 30

    with pytest.raises(FileExistsError):
        write_file_loads(
            df, path, write_disposition=WriteDisposition.WRITE_EMPTY, fmt="avro"
        )

    write_file_loads(
        df, path, write_disposition=WriteDisposition.WRITE_APPEND, fmt="avro"
    )
    assert read_avro(spark, path).count() == 60
    write_file_loads(
        df, path, write_disposition=WriteDisposition.WRITE_TRUNCATE, fmt="avro"
    )
    assert read_avro(spark, path).count() == 30


def test_avro_stream_sink_availablenow_and_idempotent_replay(spark, tmp_path):
    """Unbounded file-loads variant: stream -> foreachBatch avro sink.
    Batch-id-prefixed files make micro-batch replay idempotent."""
    from example_beam_spark.formats.avro_spark import avro_stream_sink

    df = range_records(spark, 100)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    out = str(tmp_path / "out")

    sink = avro_stream_sink(out, max_records_per_file=40)
    q = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = read_avro(spark, out)
    assert back.count() == 100
    assert sorted(back.collect(), key=lambda r: r.id) == sorted(
        df.collect(), key=lambda r: r.id
    )
    files = glob.glob(os.path.join(out, "batch-*.avro"))
    assert files and all(os.path.basename(f).startswith("batch-") for f in files)

    # replaying the same batch id replaces its own files instead of appending
    sink(df, 0)
    sink(df, 0)
    assert read_avro(spark, out).count() == 100


def test_spark_roundtrip_all_logical_types(spark, tmp_path):
    """Date / decimal / binary / float / int / boolean through the
    distributed sink+source (the codec-level test covers the encoding;
    this pins the Spark value conversions both ways)."""
    from pyspark.sql import functions as F

    df = spark.range(1, 21).select(
        F.col("id"),
        F.col("id").cast("int").alias("i32"),
        (F.col("id") * 1.5).cast("float").alias("f32"),
        (F.col("id") * 2.5).alias("f64"),
        F.to_date(F.lit("2024-01-01")).alias("d"),
        F.date_add(F.to_date(F.lit("2024-01-01")), F.col("id").cast("int")).alias("d2"),
        (F.col("id") * 100 + 0.25).cast("decimal(12,2)").alias("dec"),
        F.encode(F.concat(F.lit("b"), F.col("id")), "utf-8").alias("bin"),
        (F.col("id") % 2 == 0).alias("flag"),
        F.when(F.col("id") % 4 == 0, F.col("id")).alias("opt_long"),
    )
    path = str(tmp_path / "logical")
    write_avro(df, path, mode="overwrite")
    for schema in (None, df.schema):
        back = sorted(read_avro(spark, path, schema=schema).collect(), key=lambda r: r.id)
        assert back == sorted(df.collect(), key=lambda r: r.id)


def test_empty_write_and_corrupt_block_errors(spark, tmp_path):
    """Zero-row writes produce no part files but DO commit: the manifest
    carries the schema, so both inferred and explicit reads return an
    empty frame (a successfully committed empty table is a table, not an
    error — changed from pre-manifest FileNotFoundError behavior). A
    corrupted block surfaces as a sync-marker mismatch."""
    df = range_records(spark, 10).filter("id > 100")
    path = str(tmp_path / "empty")
    assert write_avro(df, path, mode="overwrite") == 0
    inferred = read_avro(spark, path)
    assert inferred.count() == 0
    assert [f.name for f in inferred.schema.fields] == [
        f.name for f in df.schema.fields
    ]
    assert read_avro(spark, path, schema=df.schema).count() == 0
    # a truly nonexistent/never-written dir still fails loudly
    with pytest.raises(FileNotFoundError, match="no .avro files"):
        read_avro(spark, str(tmp_path / "never_written"))

    full = range_records(spark, 10)
    path2 = str(tmp_path / "full")
    write_avro(full, path2, mode="overwrite", codec="null")
    f = glob.glob(os.path.join(path2, "*.avro"))[0]
    data = bytearray(open(f, "rb").read())
    data[-8] ^= 0xFF  # flip a byte inside the trailing sync marker
    with pytest.raises(ValueError, match="sync marker mismatch"):
        list(read_ocf(bytes(data))[1])


def test_avro_streaming_source_picks_up_new_files(spark, tmp_path):
    """read_avro_stream: the first availableNow run drains existing
    files; after new part files land, a resumed run (same checkpoint)
    processes ONLY the new ones."""
    from pyspark.sql import functions as F

    from example_beam_spark.formats.avro_spark import read_avro_stream

    df = range_records(spark, 30)
    src = str(tmp_path / "src")
    write_avro(df, src, mode="overwrite")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            read_avro_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 30

    more = range_records(spark, 40).filter(F.col("id") > 30)  # ids 31..40
    write_avro(more, src, mode="append")
    drain()
    back = spark.read.parquet(out)
    assert back.count() == 40
    assert back.select(F.max("id")).collect()[0][0] == 40


def test_decimal_38_precision_roundtrip(spark, tmp_path):
    """decimal(38,6) at full precision survives the wire (the default
    Python decimal context caps at 28 significant digits — the encoder
    must widen it)."""
    from pyspark.sql import functions as F

    df = spark.range(1, 4).select(
        "id",
        (
            F.lit("12345678901234567890123456789012.3456")
            .cast("decimal(38,6)")
            + F.col("id").cast("decimal(38,6)")
        ).alias("big"),
    )
    path = str(tmp_path / "dec38")
    write_avro(df, path, mode="overwrite")
    back = sorted(read_avro(spark, path).collect(), key=lambda r: r.id)
    assert back == sorted(df.collect(), key=lambda r: r.id)
    assert str(back[0].big) == "12345678901234567890123456789013.345600"


def test_schema_inference_resolves_named_record_references(spark):
    """Spec-compliant writers emit a bare name when a record type is
    reused; inference must resolve it like the decoder does."""
    from pyspark.sql import types as T

    from example_beam_spark.formats.avro_spark import avro_schema_to_spark

    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "KV",
                        "fields": [
                            {"name": "key", "type": "string"},
                            {"name": "value", "type": "string"},
                        ],
                    },
                },
            },
            {"name": "b", "type": {"type": "array", "items": "KV"}},
        ],
    }
    st = avro_schema_to_spark(schema)
    assert isinstance(st, T.StructType)
    assert st["a"].dataType == st["b"].dataType


def test_overwrite_same_path_read_is_safe(spark, tmp_path):
    """Staged commit: overwriting a path the input is read from must not
    destroy the input mid-job (native writers forbid this shape)."""
    path = str(tmp_path / "self")
    write_avro(range_records(spark, 20), path, mode="overwrite")
    filtered = read_avro(spark, path).filter("id <= 5")
    write_avro(filtered, path, mode="overwrite")
    assert read_avro(spark, path).count() == 5
    assert not glob.glob(os.path.join(path, ".staging-*"))


def test_invalid_avro_column_name_raises(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.col("id").alias("user-id"))
    with pytest.raises(ValueError, match="valid Avro name"):
        write_avro(df, str(tmp_path / "bad"), mode="overwrite")


def test_truncate_clears_foreign_format_files(spark, tmp_path):
    """WRITE_TRUNCATE through the avro fallback replaces the TABLE: data
    files previously written in another format must not survive."""
    path = str(tmp_path / "mixed")
    df = range_records(spark, 10)
    write_file_loads(df, path, fmt="parquet")
    assert glob.glob(os.path.join(path, "*.parquet"))
    write_file_loads(
        df, path, write_disposition=WriteDisposition.WRITE_TRUNCATE, fmt="avro"
    )
    assert not glob.glob(os.path.join(path, "*.parquet"))
    assert read_avro(spark, path).count() == 10


def test_fallback_rejects_unsupported_requests(spark, tmp_path):
    df = range_records(spark, 5)
    with pytest.raises(ValueError, match="partition_by"):
        write_file_loads(
            df, str(tmp_path / "p"), fmt="avro", partition_by=["name"]
        )
    with pytest.raises(ValueError, match="not supported by the pure-Python"):
        write_file_loads(
            df, str(tmp_path / "o"), fmt="avro", options={"recordName": "X"}
        )
    with pytest.raises(ValueError, match="requires partition_by"):
        write_file_loads(
            df, str(tmp_path / "d"), dynamic_partition_overwrite=True
        )


def test_namespace_fullname_refs_and_recursion():
    """Java writers reference reused record types by dotted fullname with
    namespace inheritance; recursive schemas must compile (lazy refs)."""
    from pyspark.sql import types as T

    from example_beam_spark.formats.avro_ocf import _enc_long, compile_decoder
    from example_beam_spark.formats.avro_spark import avro_schema_to_spark

    ns_schema = {
        "type": "record",
        "name": "Rec",
        "namespace": "com.x",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "KV",
                    "fields": [{"name": "k", "type": "string"}],
                },
            },
            {"name": "b", "type": "com.x.KV"},  # fullname (inherited ns)
            {"name": "c", "type": "KV"},  # bare name
        ],
    }
    st = avro_schema_to_spark(ns_schema)
    assert isinstance(st, T.StructType)
    assert st["a"].dataType == st["b"].dataType == st["c"].dataType

    rec = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    dec = compile_decoder(rec)  # must not RecursionError
    buf = bytearray()
    _enc_long(buf, 1)  # v=1
    _enc_long(buf, 1)  # union branch: Node
    _enc_long(buf, 2)  # v=2
    _enc_long(buf, 0)  # union branch: null
    out, _ = dec(bytes(buf), 0)
    assert out == {"v": 1, "next": {"v": 2, "next": None}}


def test_fallback_codec_aliases_and_cap_validation(spark, tmp_path):
    df = range_records(spark, 5)
    path = str(tmp_path / "unc")
    # native spark-avro's 'uncompressed' maps to the fallback's null codec
    write_file_loads(df, path, fmt="avro", options={"compression": "uncompressed"})
    assert read_avro(spark, path).count() == 5
    with pytest.raises(ValueError, match="compression 'snappy'"):
        write_file_loads(
            df, str(tmp_path / "sn"), fmt="avro", options={"compression": "snappy"}
        )
    with pytest.raises(ValueError, match="max_records_per_file"):
        write_avro(df, str(tmp_path / "z"), max_records_per_file=0)


def test_truncate_clears_partitioned_subdirectories(spark, tmp_path):
    """A pre-existing hive-partitioned table must not survive a
    WRITE_TRUNCATE through the avro fallback."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "hive")
    df = range_records(spark, 10).withColumn("bucket", F.col("id") % 2)
    write_file_loads(df, path, partition_by=["bucket"])
    assert os.path.isdir(os.path.join(path, "bucket=0"))
    write_file_loads(
        range_records(spark, 4),
        path,
        write_disposition=WriteDisposition.WRITE_TRUNCATE,
        fmt="avro",
    )
    assert not os.path.isdir(os.path.join(path, "bucket=0"))
    assert read_avro(spark, path).count() == 4


def test_cross_namespace_aliasing_and_inference_recursion_error():
    """Two same-named records in different namespaces must not alias
    (bare refs resolve in the enclosing namespace first); recursive
    schemas decode via the codec but raise a CLEAR error from Spark
    schema inference (Spark types cannot represent recursion)."""
    from example_beam_spark.formats.avro_ocf import (
        _enc_bytes,
        _enc_long,
        compile_decoder,
    )
    from example_beam_spark.formats.avro_spark import avro_schema_to_spark

    alias = {
        "type": "record",
        "name": "Top",
        "fields": [
            {
                "name": "x",
                "type": {
                    "type": "record",
                    "name": "P",
                    "namespace": "a",
                    "fields": [{"name": "v", "type": "long"}],
                },
            },
            {
                "name": "y",
                "type": {
                    "type": "record",
                    "name": "Q",
                    "namespace": "b",
                    "fields": [
                        {
                            "name": "p",
                            "type": {
                                "type": "record",
                                "name": "P",
                                "fields": [{"name": "s", "type": "string"}],
                            },
                        },
                        {"name": "p2", "type": "P"},  # must be b.P, not a.P
                    ],
                },
            },
        ],
    }
    buf = bytearray()
    _enc_long(buf, 7)
    _enc_bytes(buf, b"hi")
    _enc_bytes(buf, b"yo")
    out, _ = compile_decoder(alias)(bytes(buf), 0)
    assert out == {"x": {"v": 7}, "y": {"p": {"s": "hi"}, "p2": {"s": "yo"}}}

    rec = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"]},
        ],
    }
    with pytest.raises(ValueError, match="recursive Avro schema"):
        avro_schema_to_spark(rec)


def test_top_level_name_validation_and_commit_preserves_staging(
    spark, tmp_path, monkeypatch
):
    from example_beam_spark.formats import avro_spark
    from example_beam_spark.formats.avro_ocf import spark_schema_to_avro

    with pytest.raises(ValueError, match="valid Avro name"):
        spark_schema_to_avro(spark.range(1).schema, name="bad-name")

    # a directory that matches *.avro must NOT abort the overwrite cleanup
    path = str(tmp_path / "t")
    df = range_records(spark, 5)
    write_avro(df, path, mode="overwrite")
    os.makedirs(os.path.join(path, "decoy.avro", "sub"))
    write_avro(df, path, mode="overwrite")
    assert read_avro(spark, path, schema=df.schema).count() == 5

    # a commit-stage failure (simulated) must PRESERVE the staged output
    # for recovery and name it in the error
    def boom(src, dst):
        raise OSError("disk went away")

    monkeypatch.setattr(avro_spark.os, "replace", boom)
    with pytest.raises(RuntimeError, match="staged output preserved") as ei:
        write_avro(df, path, mode="append")
    monkeypatch.undo()
    staged = str(ei.value).split("preserved at ")[1].split("'")[1]
    assert glob.glob(os.path.join(staged, "*.avro"))
