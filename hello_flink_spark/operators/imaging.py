"""Shared image/video helpers over the stdlib PNG codec.

Two utilities three round-9 call-site families were duplicating
(review r09):

- ``iter_pngv_frames``: strict walk of the PNGV multi-PNG clip
  container (the video fixture format ``extras._video_encode_batches``
  ships) yielding each frame's RAW PNG bytes without decoding — so
  stride-sampling callers only pay decode cost for the frames they
  keep, and every container consumer shares one verification path
  (bad magic, truncated lengths, and trailing bytes all reject
  loudly, the wav_codec discipline).
- ``avg_hash_64``: the generic block-mean perceptual hash (Zauner's
  average-hash family) shared by the image near-dup tier
  (``multimodal_dedup_phash``) and the video near-dup tier
  (``multimodal_video_dedup_framehash``) — bit b = block b's mean
  above the global pixel mean, packed little-endian by block index
  with the int64 two's-complement wrap the DuckDB oracles mirror via
  a HUGEINT fold.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

PNGV_MAGIC = b"PNGV"


def iter_pngv_frames(blob: bytes) -> Iterator[bytes]:
    """Yield each frame's raw PNG bytes from a PNGV clip container.

    Container layout: ``b"PNGV"`` + big-endian u32 frame count +
    per frame (big-endian u32 length + PNG bytes). Verification is
    strict: bad magic, a cut-off length prefix or frame body, and
    trailing bytes after the final frame all raise.
    """
    if blob[:4] != PNGV_MAGIC:
        raise ValueError("not a PNGV clip container: bad magic")
    (n,) = struct.unpack(">I", blob[4:8])
    pos = 8
    for _ in range(n):
        if pos + 4 > len(blob):
            raise ValueError("truncated PNGV: frame length cut off")
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        frame = blob[pos + 4 : pos + 4 + ln]
        if len(frame) != ln:
            raise ValueError("truncated PNGV: frame body cut off")
        yield frame
        pos += 4 + ln
    if pos != len(blob):
        raise ValueError("malformed PNGV: trailing bytes after the final frame")


def avg_hash_64(px) -> int:
    """64-bit block-mean average hash of a 2-D uint8 grayscale array
    whose sides are multiples of 8: bit ``b = by*8 + bx`` is set iff
    block b's mean exceeds the global mean; packed little-endian by
    block index, int64 two's-complement wrap (so bit 63 makes the
    hash negative, exactly like the oracles' HUGEINT fold)."""
    h, w = px.shape
    bm = px.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (bm > px.mean()).flatten()
    hsh = sum(1 << b for b in range(64) if bits[b])
    if hsh >= 1 << 63:
        hsh -= 1 << 64
    return hsh
