"""Pure-Python Avro Object Container File codec (writer + reader).

The reference's entire bulk write path is Avro with logical types
(``bigquery/SaveSpecificRecord.scala:66-70`` ``useAvroLogicalTypes``,
``bigquery/AvroFunctions.scala:16-28`` builds the Avro schema and
``GenericRecord``s). This container ships neither the spark-avro
datasource jar nor a Python avro package, so the wire format is
implemented here directly from the public Avro 1.12 specification
(https://avro.apache.org/docs/1.12.0/specification/):

- binary encoding: zigzag-varint int/long, little-endian IEEE
  float/double, length-prefixed bytes/string, blocked array/map,
  branch-indexed unions, field-ordered records;
- object container files: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` / ``avro.codec``), 16-byte sync marker, blocks of
  ``(count, byte-length, payload, sync)``;
- codecs: ``null`` and ``deflate`` (raw DEFLATE, RFC 1951 — zlib with a
  -15 window);
- logical types the reference uses: ``timestamp-micros`` (long),
  ``date`` (int), ``decimal`` (bytes, two's-complement big-endian
  unscaled value).

Interoperability is proven, not assumed: ``tests/test_avro.py``
round-trips files through the *official Apache Avro Java implementation*
(avro-1.12.1.jar, already on Spark's classpath) via py4j — Java
``DataFileReader`` reads files written here, and files written by Java
``DataFileWriter`` decode here.

This module is engine-free (no pyspark imports); the distributed Spark
sink/source built on it lives in ``formats/avro_spark.py``.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import io
import json
import os
import re
import struct
import zlib
from collections.abc import Callable, Iterable, Iterator

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


# ---------------------------------------------------------------------------
# primitive binary encoding (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _enc_long(out: bytearray, n: int) -> None:
    """Zigzag + base-128 varint (spec: int and long use the same wire form)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _dec_long(data: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_bytes(out: bytearray, b: bytes) -> None:
    _enc_long(out, len(b))
    out += b


def _dec_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _dec_long(data, pos)
    return data[pos : pos + n], pos + n


# ---------------------------------------------------------------------------
# schema-compiled encoders / decoders
# ---------------------------------------------------------------------------

Encoder = Callable[[bytearray, object], None]
Decoder = Callable[[bytes, int], tuple[object, int]]


def _ts_to_micros(v: object) -> int:
    if isinstance(v, int):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        delta = v - _EPOCH_DT
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    raise TypeError(f"timestamp-micros: unsupported value {type(v)}")


def _date_to_days(v: object) -> int:
    if isinstance(v, int):
        return v
    if isinstance(v, _dt.datetime):
        v = v.date()
    if isinstance(v, _dt.date):
        return (v - _EPOCH_DATE).days
    raise TypeError(f"date: unsupported value {type(v)}")


def compile_encoder(schema: object) -> Encoder:
    """Compile an Avro schema (parsed-JSON form) into a closure that appends
    a Python value's binary encoding to a bytearray."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return lambda out, v: None
        if t == "boolean":
            return lambda out, v: out.append(1 if v else 0)
        if t in ("int", "long"):
            return lambda out, v: _enc_long(out, int(v))
        if t == "float":
            return lambda out, v: out.extend(struct.pack("<f", v))
        if t == "double":
            return lambda out, v: out.extend(struct.pack("<d", v))
        if t == "bytes":
            return lambda out, v: _enc_bytes(out, bytes(v))
        if t == "string":
            return lambda out, v: _enc_bytes(out, v.encode("utf-8"))
        raise ValueError(f"unsupported avro type {t!r}")

    if isinstance(schema, list):  # union — only the nullable form is emitted
        branches = [compile_encoder(s) for s in schema]
        null_idx = schema.index("null") if "null" in schema else -1
        if len(schema) == 2 and null_idx >= 0:
            val_idx = 1 - null_idx
            val_enc = branches[val_idx]

            def enc_union(out: bytearray, v: object) -> None:
                if v is None:
                    _enc_long(out, null_idx)
                else:
                    _enc_long(out, val_idx)
                    val_enc(out, v)

            return enc_union
        raise ValueError("only [null, T] unions are supported for writing")

    assert isinstance(schema, dict)
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical == "timestamp-micros" and t == "long":
        return lambda out, v: _enc_long(out, _ts_to_micros(v))
    if logical == "local-timestamp-micros" and t == "long":
        return lambda out, v: _enc_long(out, _ts_to_micros(v))
    if logical == "date" and t == "int":
        return lambda out, v: _enc_long(out, _date_to_days(v))
    if logical == "decimal" and t == "bytes":
        scale = schema.get("scale", 0)
        q = _decimal.Decimal(1).scaleb(-scale)
        # default context caps at 28 significant digits — decimal(38, s)
        # values would raise InvalidOperation on quantize without this
        ctx = _decimal.Context(prec=schema.get("precision", 38) + scale + 2)

        def enc_decimal(out: bytearray, v: object) -> None:
            unscaled = int(
                _decimal.Decimal(v).quantize(q, context=ctx).scaleb(scale, context=ctx)
            )
            length = max(1, (unscaled.bit_length() + 8) // 8)
            _enc_bytes(out, unscaled.to_bytes(length, "big", signed=True))

        return enc_decimal
    if t == "record":
        field_encs = [(f["name"], compile_encoder(f["type"])) for f in schema["fields"]]

        def enc_record(out: bytearray, v: object) -> None:
            for name, enc in field_encs:
                enc(out, v[name])

        return enc_record
    if t == "array":
        item_enc = compile_encoder(schema["items"])

        def enc_array(out: bytearray, v: object) -> None:
            items = list(v)
            if items:
                _enc_long(out, len(items))
                for item in items:
                    item_enc(out, item)
            _enc_long(out, 0)

        return enc_array
    if t == "map":
        val_enc = compile_encoder(schema["values"])

        def enc_map(out: bytearray, v: object) -> None:
            pairs = list(v.items()) if isinstance(v, dict) else list(v)
            if pairs:
                _enc_long(out, len(pairs))
                for k, item in pairs:
                    _enc_bytes(out, k.encode("utf-8"))
                    val_enc(out, item)
            _enc_long(out, 0)

        return enc_map
    if t in ("int", "long", "float", "double", "string", "bytes", "boolean", "null"):
        return compile_encoder(t)  # annotated primitive (unknown logical type)
    raise ValueError(f"unsupported avro schema {schema!r}")


def record_names(schema: dict, enclosing_ns: str | None = None) -> list[str]:
    """The names under which a named schema may be referenced: bare name
    and (when a namespace applies — own or inherited from the enclosing
    record, per the spec) the dotted fullname. Java writers reference
    reused types by fullname."""
    name = schema["name"]
    if "." in name:  # fullname given inline
        return [name.rsplit(".", 1)[1], name]
    ns = schema.get("namespace", enclosing_ns)
    return [name, f"{ns}.{name}"] if ns else [name]


def resolve_named(
    ref: str, named: dict[str, object], enclosing_ns: str | None
) -> tuple[str, object | None]:
    """Resolve a name reference per the spec's scoping: a bare name is
    looked up in the enclosing namespace first, then unqualified (so two
    same-named records in different namespaces don't alias). Returns
    (resolved_key, schema_or_None)."""
    if "." not in ref and enclosing_ns:
        qualified = f"{enclosing_ns}.{ref}"
        if qualified in named:
            return qualified, named[qualified]
    if ref in named:
        return ref, named[ref]
    return ref, None


def _effective_ns(schema: dict, enclosing_ns: str | None) -> str | None:
    name = schema.get("name", "")
    if "." in name:
        return name.rsplit(".", 1)[0]
    return schema.get("namespace", enclosing_ns)


def compile_decoder(
    schema: object,
    named: dict[str, object] | None = None,
    enclosing_ns: str | None = None,
) -> Decoder:
    """Compile an Avro schema into ``(data, pos) -> (value, pos)``. Logical
    types decode to datetime/date/Decimal. ``named`` resolves record-name
    references (Java writers emit them for repeated types, by fullname
    when a namespace — own or inherited — applies); resolution is lazy,
    so recursive (self-referencing) schemas compile and decode."""
    named = named if named is not None else {}
    if isinstance(schema, str):
        t = schema
        _, target = resolve_named(t, named, enclosing_ns)
        if target is not None:
            compiled: list[Decoder] = []
            ref_ns = enclosing_ns

            def dec_ref(data: bytes, pos: int) -> tuple[object, int]:
                # resolved on first use — a self-referencing record would
                # otherwise recurse forever at compile time
                if not compiled:
                    compiled.append(compile_decoder(target, named, ref_ns))
                return compiled[0](data, pos)

            return dec_ref
        if t == "null":
            return lambda data, pos: (None, pos)
        if t == "boolean":
            return lambda data, pos: (data[pos] == 1, pos + 1)
        if t in ("int", "long"):
            return _dec_long
        if t == "float":
            return lambda data, pos: (struct.unpack_from("<f", data, pos)[0], pos + 4)
        if t == "double":
            return lambda data, pos: (struct.unpack_from("<d", data, pos)[0], pos + 8)
        if t == "bytes":
            return _dec_bytes
        if t == "string":

            def dec_string(data: bytes, pos: int) -> tuple[object, int]:
                b, pos = _dec_bytes(data, pos)
                return b.decode("utf-8"), pos

            return dec_string
        raise ValueError(f"unsupported avro type {t!r}")

    if isinstance(schema, list):
        branches = [compile_decoder(s, named, enclosing_ns) for s in schema]

        def dec_union(data: bytes, pos: int) -> tuple[object, int]:
            idx, pos = _dec_long(data, pos)
            return branches[idx](data, pos)

        return dec_union

    assert isinstance(schema, dict)
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical in ("timestamp-micros", "local-timestamp-micros") and t == "long":

        def dec_ts(data: bytes, pos: int) -> tuple[object, int]:
            micros, pos = _dec_long(data, pos)
            return _EPOCH_DT + _dt.timedelta(microseconds=micros), pos

        return dec_ts
    if logical == "date" and t == "int":

        def dec_date(data: bytes, pos: int) -> tuple[object, int]:
            days, pos = _dec_long(data, pos)
            return _EPOCH_DATE + _dt.timedelta(days=days), pos

        return dec_date
    if logical == "decimal" and t == "bytes":
        scale = schema.get("scale", 0)
        # widen past the 28-digit default context (see enc_decimal)
        ctx = _decimal.Context(prec=schema.get("precision", 38) + scale + 2)

        def dec_decimal(data: bytes, pos: int) -> tuple[object, int]:
            b, pos = _dec_bytes(data, pos)
            unscaled = _decimal.Decimal(int.from_bytes(b, "big", signed=True))
            return unscaled.scaleb(-scale, context=ctx), pos

        return dec_decimal
    if t == "record":
        ns = _effective_ns(schema, enclosing_ns)
        for ref in record_names(schema, enclosing_ns):
            named[ref] = schema
        field_decs = [
            (f["name"], compile_decoder(f["type"], named, ns))
            for f in schema["fields"]
        ]

        def dec_record(data: bytes, pos: int) -> tuple[object, int]:
            rec = {}
            for name, dec in field_decs:
                rec[name], pos = dec(data, pos)
            return rec, pos

        return dec_record
    if t == "array":
        item_dec = compile_decoder(schema["items"], named, enclosing_ns)

        def dec_array(data: bytes, pos: int) -> tuple[object, int]:
            items: list[object] = []
            while True:
                n, pos = _dec_long(data, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # block with explicit byte size — skip the size
                    n = -n
                    _, pos = _dec_long(data, pos)
                for _ in range(n):
                    item, pos = item_dec(data, pos)
                    items.append(item)

        return dec_array
    if t == "map":
        val_dec = compile_decoder(schema["values"], named, enclosing_ns)

        def dec_map(data: bytes, pos: int) -> tuple[object, int]:
            pairs: list[tuple[str, object]] = []
            while True:
                n, pos = _dec_long(data, pos)
                if n == 0:
                    return pairs, pos
                if n < 0:
                    n = -n
                    _, pos = _dec_long(data, pos)
                for _ in range(n):
                    kb, pos = _dec_bytes(data, pos)
                    item, pos = val_dec(data, pos)
                    pairs.append((kb.decode("utf-8"), item))

        return dec_map
    if t in ("int", "long", "float", "double", "string", "bytes", "boolean", "null"):
        return compile_decoder(t, named, enclosing_ns)
    raise ValueError(f"unsupported avro schema {schema!r}")


# ---------------------------------------------------------------------------
# Spark schema -> Avro schema (mirrors spark-avro's public mapping)
# ---------------------------------------------------------------------------


def spark_schema_to_avro(schema, name: str = "topLevelRecord", namespace: str = "") -> dict:
    """Map a ``StructType`` to an Avro record schema (parsed-JSON form),
    following the documented spark-avro mapping: nullable field → ``[null,
    T]`` union with null default; Timestamp → long/timestamp-micros
    (``useAvroLogicalTypes``, SaveSpecificRecord.scala:66); Date →
    int/date; Decimal(p,s) → bytes/decimal."""
    # local import so the codec stays usable without pyspark on the path
    from pyspark.sql import types as T

    name_re = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

    def check_name(n: str) -> str:
        # Avro names are restricted; an invalid name would produce files
        # the official Java implementation rejects at parse time — fail
        # here with a clear message instead (rename the column upstream)
        if not name_re.match(n):
            raise ValueError(
                f"column/record name {n!r} is not a valid Avro name "
                "([A-Za-z_][A-Za-z0-9_]*) — rename the column before an "
                "Avro write (the official Java parser would reject the file)"
            )
        return n

    counter = [0]

    def conv(dt, field_name: str) -> object:
        if isinstance(dt, T.StructType):
            counter[0] += 1
            rec_name = field_name if counter[0] == 1 else f"{field_name}_{counter[0]}"
            return {
                "type": "record",
                "name": check_name(rec_name),
                "fields": [
                    {
                        "name": check_name(f.name),
                        "type": (["null", conv(f.dataType, f.name)] if f.nullable else conv(f.dataType, f.name)),
                        **({"default": None} if f.nullable else {}),
                    }
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            items = conv(dt.elementType, field_name)
            if dt.containsNull:
                items = ["null", items]
            return {"type": "array", "items": items}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("avro maps require string keys")
            values = conv(dt.valueType, field_name)
            if dt.valueContainsNull:
                values = ["null", values]
            return {"type": "map", "values": values}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.TimestampNTZType):
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        simple = {
            T.BooleanType: "boolean",
            T.ByteType: "int",
            T.ShortType: "int",
            T.IntegerType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.StringType: "string",
            T.BinaryType: "bytes",
        }
        for cls, avro_t in simple.items():
            if isinstance(dt, cls):
                return avro_t
        raise ValueError(f"no avro mapping for spark type {dt}")

    top = conv(schema, name)
    top["name"] = check_name(name)
    if namespace:
        for part in namespace.split("."):
            check_name(part)
        top["namespace"] = namespace
    return top


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def write_ocf(
    fobj: io.BufferedIOBase,
    schema: dict,
    rows: Iterable[object],
    codec: str = "null",
    sync_marker: bytes | None = None,
    block_records: int = 4096,
) -> int:
    """Stream ``rows`` (dicts keyed by field name) into an Avro OCF.
    Returns the record count. Memory is bounded by one block."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = sync_marker or os.urandom(SYNC_SIZE)
    if len(sync) != SYNC_SIZE:
        raise ValueError("sync marker must be 16 bytes")

    header = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("ascii"),
    }
    _enc_long(header, len(meta))
    for k, v in meta.items():
        _enc_bytes(header, k.encode("utf-8"))
        _enc_bytes(header, v)
    _enc_long(header, 0)
    header += sync
    fobj.write(bytes(header))

    enc = compile_encoder(schema)
    buf = bytearray()
    count = 0
    total = 0

    def flush() -> None:
        nonlocal buf, count
        if not count:
            return
        payload = bytes(buf)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        blk = bytearray()
        _enc_long(blk, count)
        _enc_long(blk, len(payload))
        fobj.write(bytes(blk))
        fobj.write(payload)
        fobj.write(sync)
        buf = bytearray()
        count = 0

    for row in rows:
        enc(buf, row)
        count += 1
        total += 1
        if count >= block_records or len(buf) >= (1 << 20):
            flush()
    flush()
    return total


def read_ocf(data: bytes) -> tuple[dict, Iterator[dict]]:
    """Parse an OCF held in memory; returns ``(avro_schema, row_iterator)``.
    Rows are dicts; maps decode to ``[(key, value), ...]`` pairs."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _dec_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _dec_long(data, pos)
        for _ in range(n):
            kb, pos = _dec_bytes(data, pos)
            vb, pos = _dec_bytes(data, pos)
            meta[kb.decode("utf-8")] = vb
    sync = data[pos : pos + SYNC_SIZE]
    pos += SYNC_SIZE

    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    dec = compile_decoder(schema)

    def rows() -> Iterator[dict]:
        p = pos
        while p < len(data):
            n, p = _dec_long(data, p)
            size, p = _dec_long(data, p)
            payload = data[p : p + size]
            p += size
            if data[p : p + SYNC_SIZE] != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            p += SYNC_SIZE
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            bp = 0
            for _ in range(n):
                row, bp = dec(payload, bp)
                yield row

    return schema, rows()
