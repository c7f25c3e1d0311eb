from example_beam_spark.formats.avro_ocf import (
    read_ocf,
    spark_schema_to_avro,
    write_ocf,
)
from example_beam_spark.formats.avro_spark import (
    avro_schema_to_spark,
    avro_stream_sink,
    read_avro,
    read_avro_stream,
    write_avro,
)

__all__ = [
    "avro_schema_to_spark",
    "avro_stream_sink",
    "read_avro",
    "read_avro_stream",
    "read_ocf",
    "spark_schema_to_avro",
    "write_avro",
    "write_ocf",
]
