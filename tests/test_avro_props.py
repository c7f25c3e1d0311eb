"""Property-based tests for the Avro OCF codec (hypothesis): arbitrary
values through encode->decode must come back identical. Pure-codec level
— no Spark session, so these run in milliseconds and fuzz the binary
encoding far beyond the example-based tests."""

from __future__ import annotations

import datetime as dt
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from example_beam_spark.formats.avro_ocf import (
    compile_decoder,
    compile_encoder,
    read_ocf,
    write_ocf,
)

LONGS = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(LONGS)
def test_varint_roundtrip_any_long(n):
    enc = compile_encoder("long")
    dec = compile_decoder("long")
    buf = bytearray()
    enc(buf, n)
    out, pos = dec(bytes(buf), 0)
    assert out == n and pos == len(buf)


@given(st.binary(max_size=64))
def test_bytes_roundtrip(b):
    enc = compile_encoder("bytes")
    dec = compile_decoder("bytes")
    buf = bytearray()
    enc(buf, b)
    out, pos = dec(bytes(buf), 0)
    assert out == b and pos == len(buf)


@given(st.text(max_size=64))
def test_string_roundtrip_unicode(s):
    enc = compile_encoder("string")
    dec = compile_decoder("string")
    buf = bytearray()
    enc(buf, s)
    out, _ = dec(bytes(buf), 0)
    assert out == s


ROW = st.fixed_dictionaries(
    {
        "id": LONGS,
        "name": st.text(max_size=20),
        "desc": st.none() | st.text(max_size=20),
        "x": st.floats(allow_nan=False, width=64),
        "ts": st.datetimes(
            min_value=dt.datetime(1, 1, 2),
            max_value=dt.datetime(9999, 12, 30),
        ).map(lambda d: d.replace(tzinfo=dt.timezone.utc)),
        "tags": st.lists(st.text(max_size=8), max_size=4),
        "attrs": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
    }
)

SCHEMA = {
    "type": "record",
    "name": "Fuzz",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "desc", "type": ["null", "string"], "default": None},
        {"name": "x", "type": "double"},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}


@settings(max_examples=50, deadline=None)
@given(st.lists(ROW, max_size=20), st.sampled_from(["null", "deflate"]))
def test_ocf_file_roundtrip_arbitrary_rows(rows, codec):
    recs = [
        {
            "id": r["id"],
            "name": r["name"],
            "desc": r["desc"],
            "x": r["x"],
            "ts": r["ts"],
            "tags": r["tags"],
            "m": r["attrs"],
        }
        for r in rows
    ]
    buf = io.BytesIO()
    n = write_ocf(buf, SCHEMA, recs, codec=codec, block_records=3)
    assert n == len(recs)
    _, it = read_ocf(buf.getvalue())
    out = list(it)
    assert len(out) == len(recs)
    for got, exp in zip(out, recs):
        assert got["id"] == exp["id"] and got["name"] == exp["name"]
        assert got["desc"] == exp["desc"] and got["tags"] == exp["tags"]
        assert got["ts"] == exp["ts"]
        assert sorted(got["m"]) == sorted(exp["m"].items())
        assert got["x"] == exp["x"] or (got["x"] != got["x"] and exp["x"] != exp["x"])
