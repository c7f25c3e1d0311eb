"""Round-10 multimodal codec pins: the BMP/WAV containers are REAL
(stdlib struct/wave), so the codec pair gets the same treatment as the
Avro OCF codec — round-trips, independently-constructed reference
bytes, and cross-engine signature equality for the DCT pHash. The
oracle's substr/repeat-as-bytes trick additionally requires the corpus
to be pure ASCII; that invariant is asserted here so a regenerated
fixture that breaks it fails loudly in tests, not in the driver gate.
"""

from __future__ import annotations

import struct

import duckdb
import pytest

from example_beam_spark.formats.media import (
    bmp_rowstride,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def test_bmp_roundtrip_padded_and_aligned():
    for w, h in ((5, 3), (4, 4), (67, 51), (1, 1)):
        stream = bytes((i * 31 + 7) % 256 for i in range(3 * w * h))
        data = encode_bmp(stream, w, h)
        assert len(data) == 54 + bmp_rowstride(w) * h
        assert decode_bmp(data) == (w, h, stream)


def test_bmp_reference_bytes():
    """Decode a BMP packed HERE, field by field from the public layout
    (not via encode_bmp) — proves the parser reads the real format,
    not a private convention."""
    w, h = 2, 2
    stride = bmp_rowstride(w)  # 8
    pixels = [
        b"\x01\x02\x03" + b"\x04\x05\x06" + b"\x00" * (stride - 6),
        b"\x07\x08\x09" + b"\x0a\x0b\x0c" + b"\x00" * (stride - 6),
    ]
    img = b"".join(pixels)
    data = (
        struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 0, 0, 0, 0)
        + img
    )
    got_w, got_h, stream = decode_bmp(data)
    assert (got_w, got_h) == (w, h)
    assert stream == b"\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c"
    # and encode_bmp reproduces the same pixel section
    assert decode_bmp(encode_bmp(stream, w, h))[2] == stream


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG garbage")
    # 8bpp header -> explicit NotImplementedError, not silent garbage
    data = bytearray(encode_bmp(b"\x00" * 12, 2, 2))
    data[28] = 8  # bpp field
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(data))


def test_wav_roundtrip_and_reference_header():
    frames = struct.pack("<5h", 0, 100, -100, 32767, -32768)
    data = encode_wav(frames)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # canonical fmt chunk: PCM(1), mono(1), 16000 Hz, 16-bit
    fmt = struct.unpack_from("<HHIIHH", data, 20)
    assert fmt == (1, 1, 16000, 32000, 2, 16)
    assert decode_wav(data) == (5, 16000, frames)
    with pytest.raises(ValueError):
        encode_wav(b"\x01")  # odd byte count


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_corpus_is_ascii(sf):
    """Oracle precondition: substr/repeat on VARCHAR must equal byte
    slicing, i.e. every text is single-byte characters."""
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '/root/testdata/sf{sf}/documents.parquet' "
        "WHERE octet_length(encode(text)) <> length(text) "
        "   OR octet_length(encode(text)) = 0"
    ).fetchone()[0]
    assert n == 0


def test_phash_kernel_equals_sql_signatures(spark):
    """Signature-level cross-engine equality (stronger than the
    registered pair-level oracle: pair equality could survive
    compensating per-doc errors; signatures cannot)."""
    from example_beam_spark.operators.graphtext import (
        _PHASH_SIGS_SQL,
        _phash_batches,
    )
    from example_beam_spark.operators.multimodal import with_payload
    from example_beam_spark.sources import load_table
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    got = {
        r.doc_id: r.phash
        for r in with_payload(docs)
        .mapInPandas(_phash_batches, schema="doc_id long, phash long")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = dict(
        con.execute(
            f"WITH {_PHASH_SIGS_SQL} SELECT doc_id, phash FROM sigs"
        ).fetchall()
    )
    con.close()
    assert len(got) > 0
    assert got == want


def test_decode_dispatch(spark):
    """Video surrogate keeps deterministic fake metadata; unknown
    content types fail loudly."""
    from example_beam_spark.operators.multimodal import _decode_payload

    w, h, n, _ = _decode_payload("video/mp4", b"x" * 100)
    assert (w, h, n) == (100 % 640 + 16, 700 % 480 + 16, 100 % 30 + 1)
    with pytest.raises(NotImplementedError):
        _decode_payload("application/pdf", b"%PDF-1.4")


def test_decode_dispatch_is_content_type_first():
    """A video/mp4 surrogate whose raw-text payload happens to start
    with the BMP/WAV magic bytes must take the VIDEO branch (deterministic
    fake metadata), never be misrouted into decode_bmp/decode_wav; and a
    declared image/audio payload with the wrong magic fails loudly
    instead of decoding garbage."""
    from example_beam_spark.operators.multimodal import _decode_payload

    for evil in (b"BM fake bitmap text payload!", b"RIFFnot really a wav.."):
        ln = len(evil)
        w, h, n, _ = _decode_payload("video/mp4", evil)
        assert (w, h, n) == (ln % 640 + 16, (ln * 7) % 480 + 16, ln % 30 + 1)
    with pytest.raises(ValueError):
        _decode_payload("image/bmp", b"XX not a bitmap")
    with pytest.raises(ValueError):
        _decode_payload("audio/wav", b"JUNKnot riff")
