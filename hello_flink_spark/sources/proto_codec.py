"""Pure-Python protobuf WIRE-FORMAT codec — the jar-free decode path
for the ``protobuf`` format (VERDICT r11 "Next round" #7).

[F] Flink's ``protobuf`` format decodes proto-encoded bytes into table
rows; Spark's equivalent (``from_protobuf``) lives in the external
spark-protobuf module, absent from this sandbox (and protoc is absent
too, so compiled FileDescriptorSets cannot even be produced here).
This module implements the protobuf wire format itself — a fully
public encoding (protobuf.dev "Encoding" doc): ``(field_number << 3 |
wire_type)`` varint tags; wire types 0 (varint), 1 (64-bit LE),
2 (length-delimited), 5 (32-bit LE); zigzag for sint*; packed repeated
scalars; maps as repeated ``{1: key, 2: value}`` message entries.

Schemas are the descriptor-shaped dicts ``formats.proto_message_to_
spark`` already defines (``{"name", "fields": [{"name", "num",
"type", "repeated"?, "map_key"?, "message"?}, ...]}`` — ``num`` is the
field number); decoded values land in exactly the Spark-row shape that
converter declares (uint64 → Decimal, enum → symbol string via the
spec's ``symbols`` list when present else the raw int as string,
``google.protobuf.Timestamp`` → naive-UTC datetime, Duration →
timedelta). Proto3 semantics: missing scalar fields take their zero
default; missing message fields stay None; unknown field numbers are
skipped by wire type (forward compatibility).

Scale shape: identical to avro_codec.py — Arrow-batched pandas UDFs,
zero shuffles, the documented Python slow path; the jar-gated wrapper
in formats.py remains the fast path where spark-protobuf ships.

An encoder is included for round-trip property tests and golden
fixtures; decoder correctness is pinned against hand-written wire
bytes in tests/test_formats.py, not against this encoder.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import io
import struct
from typing import Any, Mapping

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool", "enum"}
_I64_TYPES = {"fixed64", "sfixed64", "double"}
_I32_TYPES = {"fixed32", "sfixed32", "float"}


def _wire_type(t: str) -> int:
    if t in _VARINT_TYPES:
        return _WT_VARINT
    if t in _I64_TYPES:
        return _WT_I64
    if t in _I32_TYPES:
        return _WT_I32
    return _WT_LEN  # string, bytes, message, map entries


def write_varint(out: io.BytesIO, n: int) -> None:
    n &= (1 << 64) - 1  # two's-complement 64-bit for negative int32/int64
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated protobuf varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            # the 10th byte carries shift 63: any bit past 2^64 makes a
            # 65-70-bit value no canonical writer emits (sign-extended
            # negatives end with a 10th byte of exactly 0x01; Java
            # masks to 64 bits), and the int32/int64 two's-complement
            # fold below would then return wrong positives — fail loud
            # (review r13)
            if acc >> 64:
                raise ValueError("protobuf varint exceeds 64 bits")
            return acc, pos
        shift += 7
        # 10-byte spec max: the 10th byte carries shift 63; reject the
        # 11th before reading it (was off-by-one at shift > 70)
        if shift > 63:
            raise ValueError("protobuf varint longer than 10 bytes")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


# --- encode ------------------------------------------------------------------


def encode_message(value: Mapping[str, Any], spec: Mapping[str, Any]) -> bytes:
    out = io.BytesIO()
    for f in spec["fields"]:
        v = value.get(f["name"])
        if v is None:
            continue
        # a NaN float on a NON-float field is the Arrow→pandas null
        # sentinel of a coerced nullable int column — treat as absent
        # (proto3 default); on double/float fields NaN is a genuine
        # IEEE value and encodes as itself (review r12)
        if (
            isinstance(v, float)
            and v != v
            and f["type"] not in ("double", "float")
        ):
            continue
        if "map_key" in f:
            entry_spec = _map_entry_spec(f)
            for k, item in v.items():
                _write_tag(out, f["num"], _WT_LEN)
                raw = encode_message({"key": k, "value": item}, entry_spec)
                write_varint(out, len(raw))
                out.write(raw)
        elif f.get("repeated"):
            for item in v:
                _write_field(out, f, item)
        else:
            _write_field(out, f, v)
    return out.getvalue()


def _map_entry_spec(f: Mapping[str, Any]) -> dict[str, Any]:
    val = {k: v for k, v in f.items() if k not in ("map_key", "name", "num", "repeated")}
    return {
        "name": f"{f['name']}_entry",
        "fields": [
            {"name": "key", "num": 1, "type": f["map_key"]},
            {"name": "value", "num": 2, **val},
        ],
    }


def _write_tag(out: io.BytesIO, num: int, wt: int) -> None:
    write_varint(out, (num << 3) | wt)


def _write_field(out: io.BytesIO, f: Mapping[str, Any], v: Any) -> None:
    t = f["type"]
    if t == "message" or t in _WELL_KNOWN_ENC:
        _write_tag(out, f["num"], _WT_LEN)
        raw = (
            _WELL_KNOWN_ENC[t](v)
            if t in _WELL_KNOWN_ENC
            else encode_message(v, f["message"])
        )
        write_varint(out, len(raw))
        out.write(raw)
        return
    _write_tag(out, f["num"], _wire_type(t))
    if t in ("int32", "int64", "uint32", "uint64"):
        write_varint(out, int(v))
    elif t in ("sint32", "sint64"):
        write_varint(out, _zigzag(int(v)))
    elif t == "bool":
        write_varint(out, 1 if v else 0)
    elif t == "enum":
        write_varint(out, f["symbols"].index(v) if isinstance(v, str) else int(v))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "fixed64":
        out.write(struct.pack("<Q", int(v)))
    elif t == "sfixed64":
        out.write(struct.pack("<q", int(v)))
    elif t == "fixed32":
        out.write(struct.pack("<I", int(v)))
    elif t == "sfixed32":
        out.write(struct.pack("<i", int(v)))
    elif t == "string":
        raw = v.encode("utf-8")
        write_varint(out, len(raw))
        out.write(raw)
    elif t == "bytes":
        write_varint(out, len(v))
        out.write(bytes(v))
    else:
        raise ValueError(f"unknown protobuf field type {t!r}")


def _enc_timestamp(v: Any) -> bytes:
    if isinstance(v, _dt.datetime):
        # shared epoch anchor (avro_codec._epoch_for): tz-aware values
        # anchor to the TRUE epoch 1970-01-01T00:00Z, naive = already-UTC
        from hello_flink_spark.sources.avro_codec import _epoch_for

        delta = v - _epoch_for(v)
        secs, us = delta.days * 86400 + delta.seconds, delta.microseconds
    else:
        secs, us = int(v), 0
    out = io.BytesIO()
    if secs:
        _write_tag(out, 1, _WT_VARINT)
        write_varint(out, secs)
    if us:
        _write_tag(out, 2, _WT_VARINT)
        write_varint(out, us * 1000)
    return out.getvalue()


def _enc_duration(v: Any) -> bytes:
    if isinstance(v, _dt.timedelta):
        # the Duration spec requires seconds and nanos to SHARE a sign
        # (truncation toward zero); Python's timedelta normalization
        # (days=-1, microseconds=+999999) would otherwise emit the
        # mixed-sign pair real protobuf consumers reject (review r13)
        total_us = (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
        sign = -1 if total_us < 0 else 1
        secs, rem_us = divmod(abs(total_us), 1_000_000)
        secs, nanos = sign * secs, sign * rem_us * 1000
    else:
        secs, nanos = int(v), 0
    out = io.BytesIO()
    if secs:
        _write_tag(out, 1, _WT_VARINT)
        write_varint(out, secs)
    if nanos:
        _write_tag(out, 2, _WT_VARINT)
        write_varint(out, nanos)
    return out.getvalue()


_WELL_KNOWN_ENC = {
    "google.protobuf.Timestamp": _enc_timestamp,
    "google.protobuf.Duration": _enc_duration,
}


# --- decode ------------------------------------------------------------------


def decode_message(payload: bytes, spec: Mapping[str, Any]) -> dict[str, Any]:
    """Decode one wire-format message to the Spark-row shape
    ``formats.proto_message_to_spark`` declares for the same spec.
    Proto3 defaults: absent scalars → zero value; absent messages →
    None; absent repeated/map → empty list/dict."""
    by_num = {f["num"]: f for f in spec["fields"]}
    out: dict[str, Any] = {}
    for f in spec["fields"]:
        if "map_key" in f:
            out[f["name"]] = {}
        elif f.get("repeated"):
            out[f["name"]] = []
        else:
            out[f["name"]] = _default(f)
    pos = 0
    while pos < len(payload):
        tag, pos = read_varint(payload, pos)
        num, wt = tag >> 3, tag & 7
        f = by_num.get(num)
        if f is None:
            pos = _skip(payload, pos, wt)
            continue
        if "map_key" in f:
            if wt != _WT_LEN:
                raise ValueError(f"map field {f['name']} with wire type {wt}")
            n, pos = read_varint(payload, pos)
            end = _bounded(payload, pos, n)
            entry = decode_message(payload[pos:end], _map_entry_spec(f))
            pos = end
            out[f["name"]][entry["key"]] = entry["value"]
            continue
        # packed repeated scalars arrive as ONE length-delimited blob
        t = f["type"]
        if (
            f.get("repeated")
            and wt == _WT_LEN
            and t not in ("string", "bytes", "message")
            and t not in _WELL_KNOWN_ENC
        ):
            n, pos = read_varint(payload, pos)
            end = _bounded(payload, pos, n)
            while pos < end:
                v, pos = _read_scalar(payload, pos, f)
                # the packed region is its own boundary: an element that
                # reads past it would silently swallow the NEXT field's
                # bytes (review r13 — a fixed32 crossing the boundary
                # consumed the following tag+value and the next field
                # reverted to its default, no error)
                if pos > end:
                    raise ValueError(
                        f"packed {t} element for field {f['name']!r} "
                        f"overruns its {n}-byte region"
                    )
                out[f["name"]].append(v)
            continue
        # validate the tag's wire type against the declared field type:
        # a mismatch (schema drift, corruption) would otherwise be
        # silently MIS-decoded — e.g. a length-delimited payload read
        # as a varint yields a garbage number with no error (review
        # r13). Upstream parsers route mismatches to unknown fields;
        # this decoder's contract is fail-loud, and a KNOWN field
        # number changing wire type is a breaking schema change the
        # pipeline must surface, not mask.
        expected = _wire_type(t) if t not in _WELL_KNOWN_ENC else _WT_LEN
        if wt != expected:
            raise ValueError(
                f"field {f['name']!r} ({t}) has wire type {wt}, "
                f"expected {expected}"
            )
        v, pos = _read_value(payload, pos, f, wt)
        if f.get("repeated"):
            out[f["name"]].append(v)
        else:
            out[f["name"]] = v
    return out


def _default(f: Mapping[str, Any]) -> Any:
    t = f["type"]
    if t == "message" or t in _WELL_KNOWN_ENC:
        return None
    if t in ("string",):
        return ""
    if t == "bytes":
        return b""
    if t == "bool":
        return False
    if t == "enum":
        syms = f.get("symbols")
        return syms[0] if syms else "0"
    if t in ("double", "float"):
        return 0.0
    if t in ("uint64", "fixed64"):
        return _decimal.Decimal(0)
    return 0


def _bounded(buf: bytes, pos: int, n: int) -> int:
    """End offset of an n-byte read, validated against the buffer —
    malformed length claims must fail LOUD, never silently truncate
    (Python slices past the end would otherwise return short data)."""
    end = pos + n
    if n < 0 or end > len(buf):
        raise ValueError(
            f"protobuf length {n} at offset {pos} exceeds buffer ({len(buf)} bytes)"
        )
    return end


def _skip(buf: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = read_varint(buf, pos)
        return pos
    if wt == _WT_I64:
        return _bounded(buf, pos, 8)
    if wt == _WT_I32:
        return _bounded(buf, pos, 4)
    if wt == _WT_LEN:
        n, pos = read_varint(buf, pos)
        return _bounded(buf, pos, n)
    raise ValueError(f"unknown/ungroupable wire type {wt}")


def _read_scalar(buf: bytes, pos: int, f: Mapping[str, Any]) -> tuple[Any, int]:
    t = f["type"]
    if t in ("int32", "int64"):
        v, pos = read_varint(buf, pos)
        # negative int32/int64 are sign-extended 64-bit varints on the
        # wire: fold two's complement back to signed
        if v >= 1 << 63:
            v -= 1 << 64
        return int(v), pos
    if t == "uint32":
        v, pos = read_varint(buf, pos)
        return v, pos
    if t in ("uint64",):
        v, pos = read_varint(buf, pos)
        return _decimal.Decimal(v), pos
    if t in ("sint32", "sint64"):
        z, pos = read_varint(buf, pos)
        return _unzigzag(z), pos
    if t == "bool":
        v, pos = read_varint(buf, pos)
        return bool(v), pos
    if t == "enum":
        v, pos = read_varint(buf, pos)
        syms = f.get("symbols")
        return (syms[v] if syms and 0 <= v < len(syms) else str(v)), pos
    # fixed-width reads validate bounds FIRST so truncation raises the
    # codec's uniform ValueError, not a bare struct.error (review r13)
    if t == "double":
        end = _bounded(buf, pos, 8)
        return struct.unpack_from("<d", buf, pos)[0], end
    if t == "float":
        end = _bounded(buf, pos, 4)
        return struct.unpack_from("<f", buf, pos)[0], end
    if t == "fixed64":
        end = _bounded(buf, pos, 8)
        return _decimal.Decimal(struct.unpack_from("<Q", buf, pos)[0]), end
    if t == "sfixed64":
        end = _bounded(buf, pos, 8)
        return struct.unpack_from("<q", buf, pos)[0], end
    if t == "fixed32":
        end = _bounded(buf, pos, 4)
        return struct.unpack_from("<I", buf, pos)[0], end
    if t == "sfixed32":
        end = _bounded(buf, pos, 4)
        return struct.unpack_from("<i", buf, pos)[0], end
    raise ValueError(f"not a packed-able scalar: {t!r}")


def _read_value(
    buf: bytes, pos: int, f: Mapping[str, Any], wt: int
) -> tuple[Any, int]:
    t = f["type"]
    if t == "string":
        n, pos = read_varint(buf, pos)
        end = _bounded(buf, pos, n)
        return buf[pos:end].decode("utf-8"), end
    if t == "bytes":
        n, pos = read_varint(buf, pos)
        end = _bounded(buf, pos, n)
        return bytes(buf[pos:end]), end
    if t == "message":
        n, pos = read_varint(buf, pos)
        end = _bounded(buf, pos, n)
        return decode_message(buf[pos:end], f["message"]), end
    if t == "google.protobuf.Timestamp":
        n, pos = read_varint(buf, pos)
        end = _bounded(buf, pos, n)
        inner = decode_message(
            buf[pos:end],
            {"name": "ts", "fields": [
                {"name": "seconds", "num": 1, "type": "int64"},
                {"name": "nanos", "num": 2, "type": "int32"},
            ]},
        )
        return (
            _dt.datetime(1970, 1, 1)
            + _dt.timedelta(
                seconds=inner["seconds"], microseconds=inner["nanos"] // 1000
            ),
            end,
        )
    if t == "google.protobuf.Duration":
        n, pos = read_varint(buf, pos)
        end = _bounded(buf, pos, n)
        inner = decode_message(
            buf[pos:end],
            {"name": "dur", "fields": [
                {"name": "seconds", "num": 1, "type": "int64"},
                {"name": "nanos", "num": 2, "type": "int32"},
            ]},
        )
        return (
            _dt.timedelta(
                seconds=inner["seconds"], microseconds=inner["nanos"] // 1000
            ),
            end,
        )
    return _read_scalar(buf, pos, f)
