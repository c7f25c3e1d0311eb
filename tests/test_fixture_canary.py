"""Fixture-drift canary: assert the physical parquet encodings the engine
expects, so a driver-side fixture regeneration with a different writer
(e.g. the round-3 TIMESTAMP(NANOS) → TIMESTAMP(MICROS) switch) fails ONE
named assertion here instead of silently corrupting downstream queries.

Two layers:
1. footer checks — every corpus table's column names match the declared
   StructType, and ``events.ts`` is a parquet timestamp in a unit the
   source layer negotiates ({s, ms, us, ns});
2. value round-trip — the MIN/MAX of ``events.ts`` read through the engine
   (``load_table``, with whatever shim the footer dictates) equals the
   MIN/MAX pyarrow reads directly from the file. This catches any future
   unit/shim mismatch regardless of which encoding the driver picks.
"""

from __future__ import annotations

import datetime

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from example_beam_spark.schemas import TABLES
from example_beam_spark.sources.parquet import (
    events_ts_unit,
    first_parquet_member,
    load_table,
    table_path,
)
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(TABLES))
def test_footer_columns_match_declared_schema(name):
    footer = pq.ParquetFile(first_parquet_member(table_path(SF_DIR, name))).schema_arrow
    assert footer.names == [f.name for f in TABLES[name].fields], (
        f"{name}: parquet column layout drifted from declared schema"
    )


def test_events_ts_is_negotiable_timestamp():
    ts_type = pq.ParquetFile(
        first_parquet_member(table_path(SF_DIR, "events"))
    ).schema_arrow.field("ts").type
    unit = getattr(ts_type, "unit", None)
    assert unit in ("s", "ms", "us", "ns"), (
        f"events.ts stored as {ts_type}; the source layer only negotiates "
        "parquet timestamp units s/ms/us/ns — extend events_read_schema"
    )
    assert events_ts_unit(SF_DIR) == unit


def test_events_ts_roundtrip_matches_pyarrow(spark):
    """The engine's view of event time must equal the file's, whatever the
    physical unit: compare Spark MIN/MAX (post-shim) to pyarrow MIN/MAX
    truncated to µs (Spark timestamps are µs precision)."""
    col = pq.read_table(table_path(SF_DIR, "events"), columns=["ts"])["ts"]
    # as_py() truncates ns → µs, matching Spark's µs timestamp precision
    arrow_min, arrow_max = pc.min(col).as_py(), pc.max(col).as_py()
    df = load_table(spark, SF_DIR, "events")
    assert df.schema["ts"].dataType == T.TimestampType()
    row = df.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    spark_min = row["lo"].replace(tzinfo=None)
    spark_max = row["hi"].replace(tzinfo=None)
    a_min = arrow_min.replace(tzinfo=None)
    a_max = arrow_max.replace(tzinfo=None)
    assert spark_min == a_min, f"events.ts MIN drift: spark={spark_min} file={a_min}"
    assert spark_max == a_max, f"events.ts MAX drift: spark={spark_max} file={a_max}"
    # sanity: the corpus is a modern date range, not a 1970 sliver
    assert a_min.year >= 2000, f"corpus min year {a_min.year} looks corrupted"
    assert (a_max - a_min) > datetime.timedelta(days=1), (
        "corpus event-time span collapsed below one day — encoding bug"
    )


@pytest.mark.parametrize("unit", ["s", "ms", "us", "ns"])
def test_events_unit_negotiation_all_branches(spark, tmp_path, unit):
    """Write a tiny events table in each parquet timestamp unit and read
    it back through load_table: every branch of the footer negotiation
    (native TimestampType for s/ms/us; raw-INT64 + ns→µs shim for ns)
    must yield the same wall-clock instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq_w

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    instants = [
        base + datetime.timedelta(seconds=i, milliseconds=i, microseconds=i)
        for i in range(5)
    ]
    # drop precision the unit cannot physically carry
    if unit == "s":
        instants = [t.replace(microsecond=0) for t in instants]
    elif unit == "ms":
        instants = [t.replace(microsecond=t.microsecond // 1000 * 1000) for t in instants]
    d = tmp_path / unit
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(instants, pa.timestamp(unit)),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5, pa.string()),
            "value": pa.array([0.0] * 5, pa.float64()),
            "props": pa.array([None] * 5, pa.string()),
        }
    )
    pq_w.write_table(table, str(d / "events.parquet"))
    got = sorted(
        r["ts"].replace(tzinfo=None)
        for r in load_table(spark, str(d), "events").select("ts").collect()
    )
    assert got == instants, f"unit={unit}: {got[:2]} != {instants[:2]}"
