"""Multimodal column operators: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, decode/feature-extract via
Arrow-batched ``mapInPandas``. North-star extension (BASELINE.json).

Since round 10 the payloads are REAL media containers and the decode
kernel is a REAL decoder for the formats the stdlib can express
(formats/media.py): documents sourced src0/src1 become 24bpp BMP images
whose pixel stream is the document text tiled to fill the raster;
src2 documents become 16-bit mono PCM WAV files whose samples are the
text bytes; everything else stays a video/mp4 SURROGATE (raw bytes —
no stdlib MP4 codec exists; ``NotImplementedError`` guards the real
path and a documented deterministic fake supplies its metadata).
Payload construction is itself deterministic from the text, so a full
DuckDB oracle exists for every decoded feature (byte_len is the real
container size, width/height are parsed from the BMP header, n_frames
counts real WAV samples, checksums hash the decoded pixel/sample
bytes).

Scale design (100 TB of media):
- payloads stay in executor-side Arrow batches end-to-end — never
  collected, never stringified; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds batch memory for fat rows;
- construction AND decode are narrow per-partition maps (mapInPandas)
  — no shuffle, scales with input splits; feature columns come back as
  ordinary columns for downstream relational ops (in production the
  construction kernel disappears — payloads arrive as real bytes from
  storage — and only the decode seam remains);
- metadata filters (content type by source) prune JVM-side *before*
  any Python runs (e.g. decode only ``audio/*`` rows).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.formats.media import (
    WAV_SAMPLE_RATE,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)
from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

# Raster geometry derived from the text length (deterministic, so the
# oracle can reproduce every decoded feature in SQL):
#   width  = blen % 64 + 4   (4..67)
#   height = (blen * 7) % 48 + 4   (4..51)
# Pixel stream = text bytes tiled to 3*w*h (BGR, stored row order).
_IMG_W_MOD, _IMG_H_MOD, _DIM_MIN = 64, 48, 4

# video surrogate metadata (the round-4 deterministic fake, kept ONLY
# for the one content type the stdlib cannot decode)
_VID_W_MOD, _VID_H_MOD, _VID_F_MOD, _VID_MIN = 640, 480, 30, 16


def _image_dims(blen: int) -> tuple[int, int]:
    return blen % _IMG_W_MOD + _DIM_MIN, (blen * 7) % _IMG_H_MOD + _DIM_MIN


def _media_payload(text_bytes: bytes, source: str) -> tuple[bytes, str]:
    """Deterministic payload construction (test stand-in for real media
    bytes arriving from storage; see module doc)."""
    blen = len(text_bytes)
    if not blen:
        raise ValueError("media surrogate requires non-empty document text")
    if source in ("src0", "src1"):
        w, h = _image_dims(blen)
        need = 3 * w * h
        reps = -(-need // blen)
        return encode_bmp((text_bytes * reps)[:need], w, h), "image/bmp"
    if source == "src2":
        return encode_wav(text_bytes[: blen // 2 * 2]), "audio/wav"
    return text_bytes, "video/mp4"


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + content type (real BMP/WAV
    containers; see module doc)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ctypes = [], []
            for t, s in zip(pdf["text"], pdf["source"]):
                p, ct = _media_payload(t.encode("utf-8"), s)
                payloads.append(p)
                ctypes.append(ct)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "content_type": ctypes,
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(
        build, schema="doc_id long, payload binary, content_type string"
    )


_DECODE_SCHEMA = (
    "doc_id long, content_type string, byte_len long, width long, height long, "
    "n_frames long, checksum string"
)


def _decode_payload(
    content_type: str, payload: bytes
) -> tuple[int | None, int | None, int, str]:
    """(width, height, n_frames, checksum) — REAL decode for BMP/WAV;
    the video surrogate keeps the documented deterministic fake (no
    stdlib MP4 codec; a real build swaps in ffmpeg behind this
    branch).

    Dispatch is on content_type FIRST; the magic bytes are a validation
    check, not the router. (A video surrogate payload that happened to
    start with 'BM'/'RIFF' must not be misrouted into the image/audio
    codecs — it would crash or emit features diverging from the oracle's
    video branch.)"""
    if content_type == "image/bmp":
        if payload[:2] != b"BM":
            raise ValueError("image/bmp payload without BM magic")
        w, h, stream = decode_bmp(payload)
        return w, h, 1, hashlib.md5(stream).hexdigest()
    if content_type in ("audio/wav", "audio/x-wav"):
        if payload[:4] != b"RIFF":
            raise ValueError("wav payload without RIFF magic")
        n, _sr, frames = decode_wav(payload)
        return None, None, n, hashlib.md5(frames).hexdigest()
    if content_type.startswith("video/"):
        n = len(payload)
        return (
            n % _VID_W_MOD + _VID_MIN,
            (n * 7) % _VID_H_MOD + _VID_MIN,
            n % _VID_F_MOD + 1,
            hashlib.md5(payload).hexdigest(),
        )
    raise NotImplementedError(f"no stdlib decoder for {content_type}")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [
            _decode_payload(ct, bytes(p))
            for ct, p in zip(pdf["content_type"], pdf["payload"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "content_type": pdf["content_type"],
                "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                "width": pd.array([f[0] for f in feats], dtype="Int64"),
                "height": pd.array([f[1] for f in feats], dtype="Int64"),
                "n_frames": [f[2] for f in feats],
                "checksum": [f[3] for f in feats],
            }
        )


# Shared SQL fragments mirroring the construction rules (ASCII corpus —
# octet_length == length, asserted by tests/test_multimodal_codecs.py —
# so substr/repeat operate on bytes).
_SQL_BLEN = "octet_length(encode(text))"
_SQL_W = f"({_SQL_BLEN} % {_IMG_W_MOD} + {_DIM_MIN})"
_SQL_H = f"(({_SQL_BLEN} * 7) % {_IMG_H_MOD} + {_DIM_MIN})"
_SQL_STRIDE = f"((3 * {_SQL_W} + 3) // 4 * 4)"
_SQL_PIX_STREAM = (
    f"substr(repeat(text, CAST(CEIL(3.0 * {_SQL_W} * {_SQL_H} / {_SQL_BLEN}) "
    f"AS BIGINT)), 1, 3 * {_SQL_W} * {_SQL_H})"
)
_SQL_WAV_FRAMES = f"substr(text, 1, {_SQL_BLEN} // 2 * 2)"

_DECODE_ORACLE = f"""
    SELECT doc_id,
           CASE WHEN source IN ('src0', 'src1') THEN 'image/bmp'
                WHEN source = 'src2' THEN 'audio/wav'
                ELSE 'video/mp4' END AS content_type,
           CAST(CASE WHEN source IN ('src0', 'src1')
                     THEN 54 + {_SQL_STRIDE} * {_SQL_H}
                WHEN source = 'src2' THEN 44 + {_SQL_BLEN} // 2 * 2
                ELSE {_SQL_BLEN} END AS BIGINT) AS byte_len,
           CAST(CASE WHEN source IN ('src0', 'src1') THEN {_SQL_W}
                WHEN source = 'src2' THEN NULL
                ELSE {_SQL_BLEN} % {_VID_W_MOD} + {_VID_MIN} END AS BIGINT)
               AS width,
           CAST(CASE WHEN source IN ('src0', 'src1') THEN {_SQL_H}
                WHEN source = 'src2' THEN NULL
                ELSE ({_SQL_BLEN} * 7) % {_VID_H_MOD} + {_VID_MIN} END
               AS BIGINT) AS height,
           CAST(CASE WHEN source IN ('src0', 'src1') THEN 1
                WHEN source = 'src2' THEN {_SQL_BLEN} // 2
                ELSE {_SQL_BLEN} % {_VID_F_MOD} + 1 END AS BIGINT) AS n_frames,
           CASE WHEN source IN ('src0', 'src1') THEN md5({_SQL_PIX_STREAM})
                WHEN source = 'src2' THEN md5({_SQL_WAV_FRAMES})
                ELSE md5(text) END AS checksum
    FROM documents
"""


@register("multimodal_decode", oracle=_DECODE_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed features through the Arrow/mapInPandas
    path. BMP and WAV payloads decode FOR REAL (header parse + pixel /
    sample extraction, formats/media.py); only the video surrogate
    keeps fake metadata (module doc)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


_FRAMES_ORACLE = f"""
    WITH meta AS (
        SELECT doc_id,
               CAST({_SQL_BLEN} % {_VID_F_MOD} + 1 AS BIGINT) AS n_frames
        FROM documents
        WHERE source NOT IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS frame_hash
    FROM meta CROSS JOIN UNNEST(generate_series(0, n_frames - 1, 4)) AS u(i)
"""


@register("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: every 4th frame index, with a
    deterministic frame fingerprint — all built-in expressions (sequence +
    explode), no Python; the decode-per-frame would slot into a second
    mapInPandas over this frame list. (n_frames is the video SURROGATE's
    metadata — the one content type with no stdlib codec.)"""
    docs = load_table(spark, sf_dir, "documents").filter(
        ~F.col("source").isin("src0", "src1", "src2")
    )
    n_frames = (
        F.octet_length(F.encode(F.col("text"), "UTF-8")) % _VID_F_MOD + 1
    ).cast("long")
    frames = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(4))).alias("frame_idx")
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("frame_idx").cast("string"))
        ).alias("frame_hash"),
    )


_RESIZE_ORACLE = f"""
    WITH meta AS (
        SELECT doc_id, CAST({_SQL_W} AS BIGINT) AS width,
               CAST({_SQL_H} AS BIGINT) AS height
        FROM documents
        WHERE source IN ('src0', 'src1')
    )
    SELECT doc_id, width, height,
           CAST(width * 224 // GREATEST(width, height) AS BIGINT) AS new_width,
           CAST(height * 224 // GREATEST(width, height) AS BIGINT) AS new_height,
           md5(CAST(doc_id AS VARCHAR) || ':'
               || CAST(width * 224 // GREATEST(width, height) AS VARCHAR) || 'x'
               || CAST(height * 224 // GREATEST(width, height) AS VARCHAR)) AS resize_key
    FROM meta
"""


@register("multimodal_resize", oracle=_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for 'image' payloads: dimensions come from REALLY
    decoding the BMP header (mapInPandas over the payload column), then
    fit into 224×224 preserving aspect ratio with INTEGER geometry
    (multiply-then-floor-divide, never a float scale factor, so both
    engines agree exactly). The content-type filter prunes BEFORE the
    Python decode runs; the actual pixel resample is the per-row kernel
    that would slot in behind the same seam (PIL at a real site)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )

    def dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [decode_bmp(bytes(p))[:2] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in parsed],
                    "height": [d[1] for d in parsed],
                }
            )

    m = with_payload(docs).mapInPandas(
        dims, schema="doc_id long, width long, height long"
    )
    new_w = F.expr("width * 224 div greatest(width, height)").cast("long")
    new_h = F.expr("height * 224 div greatest(width, height)").cast("long")
    return m.select(
        "doc_id",
        "width",
        "height",
        new_w.alias("new_width"),
        new_h.alias("new_height"),
        F.md5(
            F.concat_ws(
                "", F.col("doc_id").cast("string"), F.lit(":"),
                new_w.cast("string"), F.lit("x"), new_h.cast("string"),
            )
        ).alias("resize_key"),
    )


_AUDIO_HOP = WAV_SAMPLE_RATE // 2  # 1 s windows, 50% overlap


_AUDIO_ORACLE = f"""
    WITH meta AS (
        SELECT doc_id, CAST({_SQL_BLEN} // 2 AS BIGINT) AS n_samples
        FROM documents
        WHERE source = 'src2'
    )
    SELECT doc_id, CAST(s AS BIGINT) AS start_sample,
           CAST(LEAST(s + {WAV_SAMPLE_RATE}, n_samples) AS BIGINT) AS end_sample,
           md5(CAST(doc_id AS VARCHAR) || '@' || CAST(s AS VARCHAR)) AS segment_key
    FROM meta CROSS JOIN UNNEST(generate_series(0, n_samples - 1, {_AUDIO_HOP})) AS u(s)
"""


@register("multimodal_audio_segments", oracle=_AUDIO_ORACLE)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window segmentation for 'audio' payloads: sample counts come
    from REALLY decoding the WAV container (stdlib ``wave`` via the
    mapInPandas seam), then 1-second windows at the container's 16 kHz
    rate with 50% overlap fan out JVM-side (sequence + explode). Each
    (doc, window) row is the unit a feature kernel (spectrogram,
    fingerprint) would consume — segmentation fans out BEFORE the
    expensive per-window work so it parallelizes across the cluster,
    which is the point at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src2")

    def samples(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [decode_wav(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": [d[0] for d in parsed],
                    "rate": [d[1] for d in parsed],
                }
            )

    m = with_payload(docs).mapInPandas(
        samples, schema="doc_id long, n_samples long, rate long"
    )
    # window/hop derive from the DECODED rate column (constant by
    # construction, but read from the container like a real pipeline)
    hop = (F.col("rate") / F.lit(2)).cast("long")
    seq = F.when(
        F.col("n_samples") >= 1,
        F.sequence(F.lit(0).cast("long"), F.col("n_samples") - 1, hop),
    ).otherwise(F.array().cast("array<long>"))
    segs = m.select(
        "doc_id",
        "n_samples",
        "rate",
        F.explode(seq).alias("start_sample"),
    )
    return segs.select(
        "doc_id",
        F.col("start_sample").cast("long").alias("start_sample"),
        F.least(F.col("start_sample") + F.col("rate"), F.col("n_samples"))
        .cast("long")
        .alias("end_sample"),
        F.md5(
            F.concat_ws(
                "", F.col("doc_id").cast("string"), F.lit("@"),
                F.col("start_sample").cast("string"),
            )
        ).alias("segment_key"),
    )
