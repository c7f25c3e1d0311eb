from example_beam_spark.formats.avro_ocf import (
    read_ocf,
    spark_schema_to_avro,
    write_ocf,
)

__all__ = ["read_ocf", "spark_schema_to_avro", "write_ocf"]
