"""Multimodal column operators: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, decode/feature-extract via
Arrow-batched ``mapInPandas``. North-star extension (BASELINE.json).

The container has no image/audio codecs, so the *decode kernel* is a
deterministic fake (documented below) behind the real Spark plumbing —
binary column, Arrow batch transfer, pandas batch iterator, fixed output
schema. Swapping in a real decoder (PIL/ffmpeg) changes only
``_decode_payload``; the distributed shape is what's being engineered:

Scale design (100 TB of media):
- payloads stay in executor-side Arrow batches end-to-end — never
  collected, never stringified; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds batch memory for fat rows;
- decode is a narrow per-partition map (mapInPandas) — no shuffle, scales
  with input splits; feature columns come back as ordinary columns for
  downstream relational ops;
- metadata (content_type, byte_len) is computed with built-in expressions
  so filters on it prune *before* any Python runs (e.g. decode only
  ``video/*`` rows).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

_DECODE_SCHEMA = (
    "doc_id long, content_type string, byte_len long, width long, height long, "
    "n_frames long, checksum string"
)


def _decode_payload(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, n_frames) from the byte
    stream. A real build replaces this with PIL/ffmpeg behind the same
    signature."""
    try:
        import PIL.Image  # noqa: F401  (not present in this container)

        raise NotImplementedError("real image decode not wired up yet")
    except ImportError:
        n = len(payload)
        return n % 640 + 16, (n * 7) % 480 + 16, n % 30 + 1


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        payloads = pdf["payload"]
        dims = [_decode_payload(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "content_type": pdf["content_type"],
                "byte_len": [len(p) for p in payloads],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
                "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
            }
        )


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata columns.
    (Here the payload is the utf-8 text bytes — a stand-in for real media
    bytes; everything downstream treats it as opaque binary.)"""
    content_type = (
        F.when(F.col("source").isin("src0", "src1"), F.lit("image/png"))
        .when(F.col("source") == "src2", F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        content_type.alias("content_type"),
    )


_DECODE_ORACLE = """
    SELECT doc_id,
           CASE WHEN source IN ('src0', 'src1') THEN 'image/png'
                WHEN source = 'src2' THEN 'audio/wav'
                ELSE 'video/mp4' END AS content_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 + 16 AS BIGINT) AS height,
           CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames,
           md5(text) AS checksum
    FROM documents
"""


@register("multimodal_decode", oracle=_DECODE_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed features through the Arrow/mapInPandas path
    (the decode kernel itself is the deterministic stub)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


_FRAMES_ORACLE = """
    WITH meta AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 30 + 1 AS BIGINT) AS n_frames
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
    mapInPandas over this frame list."""
    docs = load_table(spark, sf_dir, "documents").filter(
        ~F.col("source").isin("src0", "src1", "src2")
    )
    n_frames = (F.octet_length(F.encode(F.col("text"), "UTF-8")) % 30 + 1).cast("long")
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


_RESIZE_ORACLE = """
    WITH meta AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT) AS width,
               CAST((octet_length(encode(text)) * 7) % 480 + 16 AS BIGINT) AS height
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
    """Resize planning for 'image' payloads: fit into 224×224 preserving
    aspect ratio — all INTEGER geometry (multiply-then-floor-divide, never
    a float scale factor, so both engines agree exactly). The content-type
    filter prunes BEFORE any per-pixel work would run; the actual pixel
    resample is the per-row kernel that slots into a ``mapInPandas`` over
    this plan's output (absent here — no codecs in the container), while
    the geometry, pruning, and batch shape are the real distributed
    content."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    blen = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    width = (blen % 640 + 16).cast("long")
    height = ((blen * 7) % 480 + 16).cast("long")
    m = docs.select("doc_id", width.alias("width"), height.alias("height"))
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


_AUDIO_SR = 16000  # stand-in PCM rate; 16-bit mono => n_samples = bytes // 2
_AUDIO_HOP = _AUDIO_SR // 2  # 1 s windows, 50% overlap


_AUDIO_ORACLE = f"""
    WITH meta AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) // 2 AS BIGINT) AS n_samples
        FROM documents
        WHERE source = 'src2'
    )
    SELECT doc_id, CAST(s AS BIGINT) AS start_sample,
           CAST(LEAST(s + {_AUDIO_SR}, n_samples) AS BIGINT) AS end_sample,
           md5(CAST(doc_id AS VARCHAR) || '@' || CAST(s AS VARCHAR)) AS segment_key
    FROM meta CROSS JOIN UNNEST(generate_series(0, n_samples - 1, {_AUDIO_HOP})) AS u(s)
"""


@register("multimodal_audio_segments", oracle=_AUDIO_ORACLE)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window segmentation for 'audio' payloads: 1-second windows at
    a 16 kHz PCM stand-in rate with 50% overlap (sequence + explode, all
    built-ins, no Python). Each (doc, window) row is the unit a feature
    kernel (spectrogram, fingerprint) would consume via ``mapInPandas`` —
    segmentation fans out BEFORE the expensive per-window work so it
    parallelizes across the cluster, which is the point at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src2")
    n_samples = (F.octet_length(F.encode(F.col("text"), "UTF-8")) / 2).cast("long")
    # Guard the degenerate short-doc case (n_samples == 0): Spark's
    # sequence(0, -1, +hop) throws where DuckDB's generate_series returns
    # empty — same guard as shingles_raw / span_dedup.
    seq = F.when(
        n_samples >= 1, F.sequence(F.lit(0), n_samples - 1, F.lit(_AUDIO_HOP))
    ).otherwise(F.array().cast("array<long>"))
    segs = docs.select(
        "doc_id",
        n_samples.alias("n_samples"),
        F.explode(seq).alias("start_sample"),
    )
    return segs.select(
        "doc_id",
        F.col("start_sample").cast("long").alias("start_sample"),
        F.least(F.col("start_sample") + _AUDIO_SR, F.col("n_samples"))
        .cast("long")
        .alias("end_sample"),
        F.md5(
            F.concat_ws(
                "", F.col("doc_id").cast("string"), F.lit("@"),
                F.col("start_sample").cast("string"),
            )
        ).alias("segment_key"),
    )
