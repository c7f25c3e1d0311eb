"""Stdlib-only media container codecs (round-10 verdict #3).

The container has no image/audio libraries, but two real formats decode
in pure stdlib, so the multimodal operators' decode kernels operate on
REAL bytes instead of the round-4 deterministic fake:

- **BMP** (24bpp uncompressed, BITMAPINFOHEADER): ``struct`` packs the
  14-byte file header + 40-byte info header + bottom-up rows with
  4-byte stride padding — written from the public format layout
  (Windows BITMAPFILEHEADER/BITMAPINFOHEADER, widely documented).
- **WAV** (16-bit mono PCM): the stdlib ``wave`` module reads/writes
  the canonical 44-byte RIFF/fmt/data layout.

``NotImplementedError`` remains only for genuinely external codecs
(JPEG/MP4 — entropy coding no stdlib module provides).

Reference analog: the reference's typed storage round-trips
(FileLoader.scala) treat container encode/decode as a symmetric codec
pair proven by round-trip tests; same discipline here
(tests/test_multimodal_codecs.py round-trips both formats and pins
decode against independently constructed reference bytes).
"""

from __future__ import annotations

import io
import struct
import wave

WAV_SAMPLE_RATE = 16000
WAV_HEADER_BYTES = 44  # RIFF(12) + fmt(8+16) + data chunk header(8)
BMP_HEADER_BYTES = 54  # file header(14) + BITMAPINFOHEADER(40)


def bmp_rowstride(width: int) -> int:
    """Bytes per stored row: 3 bytes/pixel padded to a 4-byte boundary."""
    return (3 * width + 3) // 4 * 4


def encode_bmp(pixel_stream: bytes, width: int, height: int) -> bytes:
    """24bpp bottom-up BMP. ``pixel_stream`` is exactly 3*width*height
    bytes in STORED row order (row 0 of the stream = bottom image row,
    matching the file layout); per-row padding is added here."""
    if len(pixel_stream) != 3 * width * height:
        raise ValueError(
            f"pixel stream {len(pixel_stream)}B != 3*{width}*{height}"
        )
    stride = bmp_rowstride(width)
    img_size = stride * height
    header = struct.pack("<2sIHHI", b"BM", BMP_HEADER_BYTES + img_size, 0, 0,
                         BMP_HEADER_BYTES)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
        2835, 2835, 0, 0,
    )
    pad = b"\x00" * (stride - 3 * width)
    rows = [
        pixel_stream[r * 3 * width : (r + 1) * 3 * width] + pad
        for r in range(height)
    ]
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, pixel_stream) — the stream is unpadded, stored
    row order (the exact bytes given to :func:`encode_bmp`)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    _, width, height, _, bpp = struct.unpack_from("<IiiHH", data, 14)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed BMP decodes here (bpp={bpp}, "
            f"compression={comp})"
        )
    h = abs(height)
    stride = bmp_rowstride(width)
    rows = [
        data[offset + r * stride : offset + r * stride + 3 * width]
        for r in range(h)
    ]
    return width, h, b"".join(rows)


def encode_wav(frames: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """16-bit mono PCM WAV; ``frames`` length must be even (2 bytes per
    sample, little-endian int16)."""
    if len(frames) % 2:
        raise ValueError("frames must be an even byte count (int16 PCM)")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, bytes]:
    """(n_samples, sample_rate, frame_bytes) for a mono 16-bit WAV."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit mono PCM decodes here")
        n = w.getnframes()
        return n, w.getframerate(), w.readframes(n)
