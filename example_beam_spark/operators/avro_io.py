"""Avro round-trip query — the reference's wire format, end to end.

The reference writes Avro ``GenericRecord``s with logical types as its
bulk-load wire format (``bigquery/SaveSpecificRecord.scala:66-70``
``useAvroLogicalTypes``; ``bigquery/AvroFunctions.scala:16-28`` builds
the Avro schema from the table schema). This query drives the same
surface: typed in-memory records → ``write_file_loads(fmt="avro")``
(distributed OCF writer, deflate codec) → distributed Avro read-back
with the schema taken from the file header → flatten for the value-hash
compare. Same oracle as ``record_roundtrip`` — the wire format must not
change the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from example_beam_spark.formats.avro_spark import read_avro
from example_beam_spark.operators.io_roundtrip import (
    _ROUNDTRIP_ORACLE,
    roundtrip_frame,
)
from example_beam_spark.registry import register


@register("record_roundtrip_avro", oracle=_ROUNDTRIP_ORACLE)
def record_roundtrip_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write 100 nested records through the Avro file-load sink, read them
    back from the OCF files, flatten nested fields to scalars. Body and
    oracle shared with the parquet/orc entries (io_roundtrip.py); only
    the read-back differs (the OCF source takes its schema from the file
    header, not the caller)."""
    return roundtrip_frame(
        spark, "avro", reader=lambda s, _schema, path: read_avro(s, path)
    )


@register("record_roundtrip_json", oracle=_ROUNDTRIP_ORACLE)
def record_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same round-trip through newline-delimited JSON — the reference's
    OTHER bulk-load wire format (BigQuery file loads accept
    NEWLINE_DELIMITED_JSON alongside Avro). Typed read-back supplies the
    schema, so timestamps and the nested attribute struct/map survive
    the text encoding; nulls (description every 10th record) round-trip
    as absent fields."""
    return roundtrip_frame(spark, "json")
