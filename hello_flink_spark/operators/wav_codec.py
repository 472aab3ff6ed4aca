"""Pure-stdlib WAV (RIFF PCM16) codec for the multimodal AUDIO path.

The mandate's multimodal pillar names image/AUDIO/video as opaque
``binary`` columns; the image tier already decodes real PNG bytes
(operators/png_codec.py). This module gives audio the same treatment:
the container ships no audio libraries, but WAV is a fully public
format (RIFF, Microsoft/IBM multimedia spec; PCM audio needs only
``struct``): a RIFF/WAVE container, an ``fmt `` chunk declaring
16-bit mono PCM, and a little-endian ``data`` chunk of int16 samples.
That is enough to make the engine's audio claim real end-to-end —
opaque payloads carrying actual WAV bytes, decoded to typed metadata
plus exact sample statistics inside the Arrow ``mapInPandas`` batch
path, with closed-form sample oracles so the driver's DuckDB gate
verifies the DECODED values.

Scope: 16-bit mono PCM (format tag 1), the shape every speech-corpus
pipeline normalizes to before feature extraction. The decoder REJECTS
anything else loudly — stereo, other bit depths, compressed formats,
truncated chunks, size mismatches — rather than guessing. A
production deployment swaps this for a vectorized decoder (soundfile/
libsndfile) behind the same mapInPandas signature; the Spark-side
plumbing is identical.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable


def encode_wav_pcm16(sample_rate: int, samples: Iterable[int]) -> bytes:
    """Encode 16-bit mono PCM samples into a real WAV file.

    ``samples`` are ints in [-32768, 32767]; values outside the int16
    range are a caller bug and raise (struct.error) instead of
    silently wrapping.
    """
    sample_list = list(samples)
    data = struct.pack(f"<{len(sample_list)}h", *sample_list)
    byte_rate = sample_rate * 2  # mono, 2 bytes per sample
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[int, list[int]]:
    """Decode a 16-bit mono PCM WAV to ``(sample_rate, samples)``.

    Verifies the RIFF/WAVE magic and the declared RIFF size, walks the
    chunk list (skipping unknown chunks like LIST/INFO, honoring the
    spec's even-byte chunk padding), and rejects non-PCM, non-mono,
    non-16-bit, inconsistent-rate, or truncated files with a clear
    error instead of silently mis-decoding.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError("truncated WAV: RIFF size does not match file size")
    pos = 12
    sample_rate = -1
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated WAV: {tag!r} chunk body cut off")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("malformed WAV: fmt chunk too short")
            audio_fmt, channels, rate, byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    "decoder scope is 16-bit mono PCM (fmt=1, channels=1, bits=16); "
                    f"got fmt={audio_fmt} channels={channels} bits={bits}"
                )
            if byte_rate != rate * 2 or block_align != 2:
                raise ValueError("malformed WAV: inconsistent byte_rate/block_align")
            sample_rate = rate
        elif tag == b"data":
            if sample_rate < 0:
                raise ValueError("malformed WAV: data chunk before fmt")
            if length % 2:
                raise ValueError("malformed WAV: odd data size for 16-bit samples")
            samples = list(struct.unpack(f"<{length // 2}h", body))
        # chunks are padded to even sizes per the RIFF spec
        pos += 8 + length + (length % 2)
    if pos != len(data):
        # 1-7 leftover bytes would otherwise fall out of the walk
        # silently — loud rejection, per the codec's contract
        raise ValueError("malformed WAV: trailing bytes after the final chunk")
    if sample_rate < 0 or samples is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    return sample_rate, samples
