"""Batch file-load sink with BigQuery-style dispositions.

The analog of the reference's bulk-load write path
(``bigquery/SaveSpecificRecord.scala:59-79``): ``FILE_LOADS`` method with
``withCreateDisposition(CREATE_NEVER)`` / ``withWriteDisposition(
WRITE_APPEND)`` and Avro as the wire format (``useAvroLogicalTypes``,
``AvroFunctions.scala:16-28``). In Spark the "load job" collapses into the
data-source writer; dispositions become existence checks + save modes:

- CREATE_IF_NEEDED / CREATE_NEVER → does the target directory have to
  pre-exist (the reference fails when the table is missing);
- WRITE_APPEND / WRITE_TRUNCATE / WRITE_EMPTY → mode("append") /
  mode("overwrite") / fail when the target already holds data.

Format: parquet by default. Avro (the reference's wire format) is an
external Spark module (spark-avro jar) not bundled in this container —
requesting ``format="avro"`` raises a clear error unless the jar is on
the classpath; the schema mapping (nested struct / array / map /
timestamp-micros logical type) is identical for both formats.

Scale notes: the writer fans out one file per partition —
``max_records_per_file`` (the analog of ``withNumFileShards``,
``SaveSpecificRecord.scala:77``) bounds file sizes at 100 TB without a
repartition; no driver-side materialization anywhere.
"""

from __future__ import annotations

import enum
import os

from pyspark.sql import DataFrame


class CreateDisposition(str, enum.Enum):
    CREATE_IF_NEEDED = "CREATE_IF_NEEDED"
    CREATE_NEVER = "CREATE_NEVER"


class WriteDisposition(str, enum.Enum):
    WRITE_APPEND = "WRITE_APPEND"
    WRITE_TRUNCATE = "WRITE_TRUNCATE"
    WRITE_EMPTY = "WRITE_EMPTY"


def _target_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        not n.startswith(("_", ".")) for n in os.listdir(path)
    )


def write_file_loads(
    df: DataFrame,
    path: str,
    create_disposition: CreateDisposition = CreateDisposition.CREATE_IF_NEEDED,
    write_disposition: WriteDisposition = WriteDisposition.WRITE_APPEND,
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Bulk write ``df`` to ``path`` honoring the dispositions above.

    ``fmt`` is any Spark data-source name (parquet/json/csv/orc/...);
    ``options`` passes format options through (e.g. ``{"header": "true"}``
    for csv). Avro needs the external spark-avro module — absent from this
    container, so that format fails with an explicit error."""
    exists = _target_exists(path)
    if create_disposition is CreateDisposition.CREATE_NEVER and not exists:
        raise FileNotFoundError(
            f"CREATE_NEVER: target {path!r} does not exist (reference analog: "
            "BigQuery load fails when the table is missing)"
        )
    if write_disposition is WriteDisposition.WRITE_EMPTY and exists:
        raise FileExistsError(
            f"WRITE_EMPTY: target {path!r} already contains data"
        )

    mode = (
        "overwrite"
        if write_disposition is WriteDisposition.WRITE_TRUNCATE
        else "append"
    )
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    try:
        writer.format(fmt).save(path)
    except Exception as e:
        if fmt == "avro" and "Failed to find" in str(e):
            raise RuntimeError(
                "fmt='avro' needs the external spark-avro module on the "
                "classpath (the reference's wire format, "
                "SaveSpecificRecord.scala:66-70); it is not bundled here — "
                "use parquet/json/csv or add the spark-avro jar"
            ) from e
        raise
