"""Pure-stdlib PNG codec for the multimodal column path (VERDICT r06
"Next round" #6 — replace the deterministic-fake decode with a REAL
one).

The container ships no image libraries (PIL/opencv absent by design),
but PNG is a fully public format (RFC 2083 / W3C PNG spec) and 8-bit
grayscale needs only ``zlib`` + ``struct``: signature, CRC-verified
chunks, IHDR geometry, inflate IDAT, undo per-scanline filters. That
is enough to make the engine's multimodal claim real end-to-end —
opaque ``binary`` payloads carrying actual image bytes, decoded to
typed metadata + pixel statistics inside the Arrow ``mapInPandas``
batch path (queries/llm.py::multimodal_load), with closed-form pixel
oracles so the driver's DuckDB gate verifies the DECODED values.

Scope: 8-bit grayscale (color type 0), filters None/Sub/Up — the
encoder below only emits these, and the decoder REJECTS anything else
loudly rather than guessing (truncated streams, bad CRCs, interlacing,
palette/color images). A production deployment swaps this for a
vectorized decoder (pyarrow + pillow-simd) behind the same mapInPandas
signature; the Spark-side plumbing is identical.
"""

from __future__ import annotations

import struct
import zlib
from typing import Callable

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def encode_png_gray(
    width: int,
    height: int,
    pixel: Callable[[int, int], int],
    filter_type: int = 0,
) -> bytes:
    """Encode an 8-bit grayscale PNG. ``pixel(x, y)`` -> 0..255.

    ``filter_type`` selects the per-scanline filter written (0=None,
    1=Sub, 2=Up) — the non-zero variants exist so tests can prove the
    decoder genuinely unfilters rather than assuming filter 0."""
    if filter_type not in (0, 1, 2):
        raise ValueError("supported scanline filters: 0 (None), 1 (Sub), 2 (Up)")
    raw = bytearray()
    prev_row = bytes(width)
    for y in range(height):
        row = bytes(pixel(x, y) & 0xFF for x in range(width))
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:  # Sub: delta vs left neighbour
            raw += bytes(
                (row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(width)
            )
        else:  # Up: delta vs same column previous row
            raw += bytes((row[x] - prev_row[x]) & 0xFF for x in range(width))
        prev_row = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes) -> tuple[int, int, bytearray]:
    """Decode an 8-bit grayscale PNG to ``(width, height, pixels)``
    (row-major bytearray). Verifies the signature and every chunk CRC;
    rejects non-grayscale, non-8-bit, interlaced, or unknown-filter
    images with a clear error instead of silently mis-decoding."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = -1
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: chunk header cut off")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG: chunk body cut off")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (bit_depth, color_type) != (8, 0):
                raise ValueError(
                    "decoder scope is 8-bit grayscale (bit_depth=8, color_type=0); "
                    f"got bit_depth={bit_depth} color_type={color_type}"
                )
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter-method/interlace")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width < 0 or not seen_end:
        raise ValueError("malformed PNG: missing IHDR or IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("inflated size does not match geometry")
    pixels = bytearray(width * height)
    prev = bytes(width)
    for y in range(height):
        ftype = raw[y * stride]
        line = raw[y * stride + 1 : (y + 1) * stride]
        if ftype == 0:
            row = bytes(line)
        elif ftype == 1:
            out = bytearray(width)
            for x in range(width):
                out[x] = (line[x] + (out[x - 1] if x else 0)) & 0xFF
            row = bytes(out)
        elif ftype == 2:
            row = bytes((line[x] + prev[x]) & 0xFF for x in range(width))
        else:
            raise ValueError(f"unsupported scanline filter {ftype}")
        pixels[y * width : (y + 1) * width] = row
        prev = row
    return width, height, pixels
