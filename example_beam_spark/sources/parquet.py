"""Explicit-schema parquet sources.

The analog of the reference's typed BigQuery reads
(``bigquery/TypedBigQueryTable.scala:14``, ``TypedBigQueryStorage.scala:14-16``):
every read declares its schema up front (never inferred), and predicates /
projections written against the result are pushed into the parquet scan by
Catalyst — the Spark-native equivalent of BigQuery Storage API
``rowRestriction`` / ``selectedFields`` pushdown.

Scale notes: parquet scans parallelize by row-group; at 100 TB the same
``load_table`` call fans out across executors with
``spark.sql.files.maxPartitionBytes`` (default 128 MB) splits, and filter /
column pushdown keeps IO proportional to what the query touches
(verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from example_beam_spark import schemas


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def parquet_members(path: str) -> list[str]:
    """Physical parquet files behind a table path. The corpus fixtures are
    single files today, but every real table is a DIRECTORY of part-files
    (``df.write.parquet`` layout) — support both so a driver-side fixture
    regeneration can't strand the footer probe or the streaming stage dir.
    Hidden/metadata members (``_SUCCESS``, ``.crc``) are skipped."""
    if os.path.isdir(path):
        members = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if not members:
            raise FileNotFoundError(f"no *.parquet part-files under {path}")
        return members
    return [path]


def parquet_rowcount(sf_dir: str, name: str) -> int:
    """Exact table row count from the parquet FOOTERS (guide §6) — zero
    Spark jobs, no data read. Parquet footers record num_rows per file;
    summing members equals COUNT(*) of the unfiltered table. Used where
    a query needs |table| only to size a parameter (e.g. the dkmeans
    k = ceil(sqrt(n)) ladder) so the pre-count scan job disappears."""
    import pyarrow.parquet as _pq

    return sum(
        _pq.ParquetFile(m).metadata.num_rows
        for m in parquet_members(table_path(sf_dir, name))
    )


def first_parquet_member(path: str) -> str:
    """First physical parquet file behind a table path (file or directory) —
    the footer-negotiation probe target. Part-files of one write share one
    schema, so any member's footer speaks for the table."""
    return parquet_members(path)[0]


_EVENTS_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """Timestamp unit ('s'|'ms'|'us'|'ns') of ``events.ts`` as physically
    stored, read ONCE from the parquet footer (cached per path).

    The writer's encoding is negotiated, never assumed — the analog of the
    reference's schema-negotiating IO (Avro logical types,
    ``bigquery/SaveSpecificRecord.scala:66-70``; macro-typed reads
    ``TypedBigQueryTable.scala:14``). A footer read is a few KB of driver-side
    IO regardless of table size, so this costs nothing at 100 TB."""
    path = table_path(sf_dir, "events")
    key = os.path.abspath(path)
    unit = _EVENTS_TS_UNIT_CACHE.get(key)
    if unit is None:
        import pyarrow.parquet as pq

        ts_type = pq.ParquetFile(first_parquet_member(path)).schema_arrow.field("ts").type
        unit = getattr(ts_type, "unit", None)
        if unit not in ("s", "ms", "us", "ns"):
            raise TypeError(
                f"events.ts in {path} is {ts_type}, not a parquet timestamp; "
                "the engine reads event time as TimestampType"
            )
        _EVENTS_TS_UNIT_CACHE[key] = unit
    return unit


def events_read_schema(spark: SparkSession, sf_dir: str) -> tuple[T.StructType, bool]:
    """(read schema for the events table, whether the ns→µs shim applies).

    Spark's parquet reader rejects TIMESTAMP(NANOS) outright
    (PARQUET_TYPE_ILLEGAL), so for ``timestamp[ns]`` files we read ``ts`` as
    raw INT64 (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microseconds — the same ns→µs truncation DuckDB applies. For every other
    unit (s/ms/us) the declared ``TimestampType`` reads natively and the shim
    MUST NOT run (dividing µs by 1000 corrupts every timestamp 1000×)."""
    if events_ts_unit(sf_dir) != "ns":
        return schemas.EVENTS, False
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType(), False)
            for f in schemas.EVENTS.fields
        ]
    )
    return raw, True


def apply_ns_shim(df: DataFrame) -> DataFrame:
    """Truncate a raw-INT64-nanos ``ts`` column to a µs timestamp."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table with its declared schema (schemas.TABLES).

    ``events.ts`` physical encoding is detected from the parquet footer
    (:func:`events_read_schema`) — ns-encoded files get the legacy raw-INT64
    read + ns→µs truncation; s/ms/us files read natively as TimestampType.
    """
    if name not in schemas.TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(schemas.TABLES)}")
    # Defensive: the harness may hand us a session it built itself; event-time
    # semantics and the DuckDB oracle comparison require UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        schema, shim = events_read_schema(spark, sf_dir)
        df = spark.read.schema(schema).parquet(table_path(sf_dir, name))
        return apply_ns_shim(df) if shim else df
    return spark.read.schema(schemas.TABLES[name]).parquet(table_path(sf_dir, name))


def spread_small_input(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition ONLY when the scan yields fewer partitions
    than cores — the corpus tables are single small parquet files, so a
    CPU-heavy map stage (shingling, per-shingle md5, vector math) would
    otherwise run on one core before its first shuffle. At real scale a
    100 TB table scans into thousands of splits (>= parallelism) and this
    is a no-op, so the hot path never pays an extra shuffle."""
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for the SQL surface."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
