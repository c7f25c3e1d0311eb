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

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.formats.avro_spark import read_avro
from example_beam_spark.operators.io_roundtrip import _ROUNDTRIP_ORACLE
from example_beam_spark.registry import register
from example_beam_spark.sinks import (
    CreateDisposition,
    WriteDisposition,
    write_file_loads,
)
from example_beam_spark.sources import range_records


@register("record_roundtrip_avro", oracle=_ROUNDTRIP_ORACLE)
def record_roundtrip_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write 100 nested records through the Avro file-load sink, read them
    back from the OCF files, flatten nested fields to scalars."""
    records = range_records(spark, 100)
    path = os.path.join(tempfile.mkdtemp(prefix="roundtrip_avro_"), "records")
    write_file_loads(
        records,
        path,
        create_disposition=CreateDisposition.CREATE_IF_NEEDED,
        write_disposition=WriteDisposition.WRITE_TRUNCATE,
        fmt="avro",
    )
    back = read_avro(spark, path)
    return back.select(
        "id",
        "timestamp",
        "name",
        "description",
        F.col("attributes")[0]["key"].alias("attr_key"),
        F.col("attributes")[0]["value"].alias("attr_value"),
        F.col("attributes_map")["someKey"].alias("map_value"),
    )
