"""In-memory bounded sources.

Analog of the reference's ``sc.parallelize(1 to 100)`` record generator
(``bigquery/SaveSpecificRecord.scala:36-51``, ``SaveTypedBigQuery.scala:16-28``):
a deterministic range mapped into the nested RECORD schema — exercised by
the I/O round-trip tests (nested struct, nullable, array, map types).

Built from ``spark.range`` + column expressions (JVM-side, no Python rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def range_records(spark: SparkSession, n: int = 100) -> DataFrame:
    """``Record(id, timestamp, name, description, attributes, attributes_map)``
    for ids 1..n — mirrors SaveSpecificRecord.scala:37-51 field-for-field
    (name = "some name {i}", description nullable-present, one attribute).
    """
    ids = spark.range(1, n + 1).withColumnRenamed("id", "rid")
    return ids.select(
        F.col("rid").alias("id"),
        F.timestamp_seconds(F.col("rid")).alias("timestamp"),
        F.concat(F.lit("some name "), F.col("rid")).alias("name"),
        F.when(F.col("rid") % 10 != 0, F.concat(F.lit("some description "), F.col("rid"))).alias(
            "description"
        ),
        F.array(
            F.struct(
                F.lit("someKey").alias("key"),
                F.concat(F.lit("someValue "), F.col("rid")).alias("value"),
            )
        ).alias("attributes"),
        F.create_map(F.lit("someKey"), F.concat(F.lit("someValue "), F.col("rid"))).alias(
            "attributes_map"
        ),
    )
