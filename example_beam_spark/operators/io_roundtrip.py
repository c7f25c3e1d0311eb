"""I/O round-trip query: in-memory typed records → file-load sink →
typed read-back → flatten.

One oracle-gated query covering the reference's batch I/O surface end to
end (SURVEY.md §2.1):

- S1 in-memory bounded source: ``range_records`` mirrors
  ``parallelize(1 to 100).map(buildRecord)``
  (bigquery/SaveSpecificRecord.scala:36-51);
- S6 file-load sink with dispositions (``write_file_loads`` —
  SaveSpecificRecord.scala:59-79);
- S8 typed-record storage round-trip across every nested type the
  reference's schemas use (BigQueryRecord.scala:8-16 struct/array/
  nullable; avro-example.avdl:4-10 map + timestamp logical type);
- S4 typed read-back with an explicit schema (TypedBigQueryTable.scala:14).

The flattening projection exists because the driver's oracle compare
hashes scalar columns; the parquet files on disk hold the real nested
struct/array/map shapes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.registry import register
from example_beam_spark.sinks import (
    CreateDisposition,
    WriteDisposition,
    write_file_loads,
)
from example_beam_spark.sources import range_records

_ROUNDTRIP_ORACLE = """
    SELECT i AS id,
           CAST(to_timestamp(i) AS TIMESTAMP) AS timestamp,
           'some name ' || i AS name,
           CASE WHEN i % 10 <> 0 THEN 'some description ' || i END AS description,
           'someKey' AS attr_key,
           'someValue ' || i AS attr_value,
           'someValue ' || i AS map_value
    FROM range(1, 101) t(i)
"""


def roundtrip_frame(spark: SparkSession, fmt: str, reader=None) -> DataFrame:
    """Shared S6/S8 round-trip body, parameterized by wire format: write
    100 nested records through the file-load sink, read them back typed,
    flatten nested fields to scalars for the value-hash compare. Every
    fmt variant shares _ROUNDTRIP_ORACLE — the on-disk format is the only
    thing that differs. ``reader(spark, schema, path)`` overrides the
    read-back for formats Spark's built-in reader cannot load (the
    repo's pure-Python Avro OCF source)."""
    records = range_records(spark, 100)
    path = os.path.join(tempfile.mkdtemp(prefix=f"roundtrip_{fmt}_"), "records")
    write_file_loads(
        records,
        path,
        create_disposition=CreateDisposition.CREATE_IF_NEEDED,
        write_disposition=WriteDisposition.WRITE_TRUNCATE,
        fmt=fmt,
    )
    if reader is not None:
        back = reader(spark, records.schema, path)
    else:
        back = spark.read.schema(records.schema).format(fmt).load(path)
    return back.select(
        "id",
        "timestamp",
        "name",
        "description",
        F.col("attributes")[0]["key"].alias("attr_key"),
        F.col("attributes")[0]["value"].alias("attr_value"),
        F.col("attributes_map")["someKey"].alias("map_value"),
    )


@register("record_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def record_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write 100 nested records through the file-load sink, read them back
    typed, flatten nested fields to scalars for the value-hash compare."""
    return roundtrip_frame(spark, "parquet")
