"""Property suites for the jar-free wire codecs (sources/avro_codec.py,
sources/proto_codec.py): encode→decode must be the IDENTITY for every
representable value, over randomized schemas and the full value ranges
(int64 edges, unicode, empty/nested collections, nullable unions).
Pure Python — no Spark session — so the example budget is generous.
The golden tests in tests/test_formats.py pin the byte layout against
hand-written specification bytes; these suites pin totality."""

from __future__ import annotations

import datetime as dt
import io
from decimal import Decimal

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from hello_flink_spark.sources.avro_codec import (
    decode_value,
    encode_container,
    decode_container,
    encode_value,
    read_long,
    write_long,
)
from hello_flink_spark.sources.proto_codec import (
    decode_message,
    encode_message,
    read_varint,
    write_varint,
)

SETTINGS = settings(max_examples=200, deadline=None)
FAST = settings(max_examples=50, deadline=None)

# utf-8-encodable text (no lone surrogates)
TEXT = st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)

I64 = st.integers(-(2**63), 2**63 - 1)
I32 = st.integers(-(2**31), 2**31 - 1)


@SETTINGS
@given(n=I64)
def test_avro_varint_roundtrip_full_int64(n):
    out = io.BytesIO()
    write_long(out, n)
    got, pos = read_long(out.getvalue(), 0)
    assert got == n and pos == len(out.getvalue())


@SETTINGS
@given(n=I64)
def test_proto_varint_roundtrip_is_twos_complement_64(n):
    out = io.BytesIO()
    write_varint(out, n)
    got, pos = read_varint(out.getvalue(), 0)
    assert got == (n & (2**64 - 1)) and pos == len(out.getvalue())


# --- Avro value round-trip over randomized record schemas --------------------

_AVRO_PRIMS: list[tuple[object, st.SearchStrategy]] = [
    ("long", I64),
    ("int", I32),
    ("boolean", st.booleans()),
    ("string", TEXT),
    ("bytes", st.binary(max_size=32)),
    ("double", st.floats(allow_nan=False)),
    ("float", st.floats(width=32, allow_nan=False)),
    (
        {"type": "int", "logicalType": "date"},
        st.integers(-100_000, 100_000).map(
            lambda d: dt.date(1970, 1, 1) + dt.timedelta(days=d)
        ),
    ),
    (
        {"type": "long", "logicalType": "timestamp-micros"},
        st.integers(-(2**50), 2**50).map(
            lambda us: dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
        ),
    ),
    (
        {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 3},
        st.integers(-(10**15), 10**15).map(lambda u: Decimal(u).scaleb(-3)),
    ),
    (
        {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]},
        st.sampled_from(["A", "B", "C"]),
    ),
    (
        {"type": "fixed", "name": "F4", "size": 4},
        st.binary(min_size=4, max_size=4),
    ),
]


@st.composite
def _avro_record_and_value(draw):
    """A random record schema (1-4 fields) with a matching value: each
    field is a primitive/logical leaf, optionally nullable, optionally
    lifted into an array or a string-keyed map; one field may be a
    nested one-leaf record."""
    n_fields = draw(st.integers(1, 4))
    fields, value = [], {}
    for i in range(n_fields):
        leaf_schema, leaf_strat = draw(st.sampled_from(_AVRO_PRIMS))
        shape = draw(st.sampled_from(["plain", "nullable", "array", "map", "record"]))
        name = f"f{i}"
        if shape == "nullable":
            fields.append({"name": name, "type": ["null", leaf_schema]})
            value[name] = draw(st.none() | leaf_strat)
        elif shape == "array":
            fields.append(
                {"name": name, "type": {"type": "array", "items": leaf_schema}}
            )
            value[name] = draw(st.lists(leaf_strat, max_size=5))
        elif shape == "map":
            fields.append(
                {"name": name, "type": {"type": "map", "values": leaf_schema}}
            )
            value[name] = draw(
                st.dictionaries(TEXT, leaf_strat, max_size=4)
            )
        elif shape == "record":
            fields.append(
                {
                    "name": name,
                    "type": {
                        "type": "record",
                        "name": f"Inner{i}",
                        "fields": [{"name": "x", "type": leaf_schema}],
                    },
                }
            )
            value[name] = {"x": draw(leaf_strat)}
        else:
            fields.append({"name": name, "type": leaf_schema})
            value[name] = draw(leaf_strat)
    schema = {"type": "record", "name": "R", "fields": fields}
    return schema, value


@SETTINGS
@given(sv=_avro_record_and_value())
def test_avro_value_roundtrip_random_records(sv):
    schema, value = sv
    assert decode_value(encode_value(value, schema), schema) == value


@FAST
@given(sv=_avro_record_and_value(), codec=st.sampled_from(["null", "deflate", "bzip2", "xz"]))
def test_avro_container_roundtrip_random_records(sv, codec):
    schema, value = sv
    records = [value] * 3
    got_schema, got = decode_container(encode_container(records, schema, codec=codec))
    assert got == records and got_schema["fields"] == schema["fields"]


# --- protobuf message round-trip over randomized specs -----------------------

_PROTO_LEAVES: list[tuple[str, st.SearchStrategy]] = [
    ("int32", I32),
    ("int64", I64),
    ("sint32", I32),
    ("sint64", I64),
    ("uint32", st.integers(0, 2**32 - 1)),
    ("uint64", st.integers(0, 2**64 - 1).map(Decimal)),
    ("bool", st.booleans()),
    ("string", TEXT),
    ("bytes", st.binary(max_size=32)),
    ("double", st.floats(allow_nan=False)),
    ("float", st.floats(width=32, allow_nan=False)),
    ("fixed32", st.integers(0, 2**32 - 1)),
    ("sfixed32", I32),
    ("fixed64", st.integers(0, 2**64 - 1).map(Decimal)),
    ("sfixed64", I64),
]


@st.composite
def _proto_spec_and_value(draw):
    n_fields = draw(st.integers(1, 4))
    fields, value = [], {}
    for i in range(n_fields):
        t, strat = draw(st.sampled_from(_PROTO_LEAVES))
        shape = draw(st.sampled_from(["plain", "repeated", "map", "message"]))
        name, num = f"f{i}", i + 1
        if shape == "repeated":
            fields.append({"name": name, "num": num, "type": t, "repeated": True})
            value[name] = draw(st.lists(strat, max_size=5))
        elif shape == "map":
            fields.append({"name": name, "num": num, "type": t, "map_key": "string"})
            value[name] = draw(st.dictionaries(TEXT, strat, max_size=4))
        elif shape == "message":
            fields.append(
                {
                    "name": name,
                    "num": num,
                    "type": "message",
                    "message": {
                        "name": f"Inner{i}",
                        "fields": [{"name": "x", "num": 1, "type": t}],
                    },
                }
            )
            value[name] = {"x": draw(strat)}
        else:
            fields.append({"name": name, "num": num, "type": t})
            value[name] = draw(strat)
    return {"name": "M", "fields": fields}, value


@SETTINGS
@given(sv=_proto_spec_and_value())
def test_proto_message_roundtrip_random_specs(sv):
    """Exact round-trip: this repo's encoder emits PRESENT fields even
    at their proto3 zero value (legal on the wire — serializers may
    skip them, decoders must accept them), so no zero-default
    substitution is needed in the expectation."""
    spec, value = sv
    got = decode_message(encode_message(value, spec), spec)
    assert got == value


@SETTINGS
@given(sv=_proto_spec_and_value(), n=st.integers(0, 6))
def test_proto_delimited_framing_roundtrip(sv, n):
    """The varint length-delimited stream framing used by the jar-free
    protobuf file source/sink: N frames concatenated, then split back
    by the same boundary arithmetic read_protobuf_delimited runs —
    including the N=0 empty stream and frames whose length needs a
    multi-byte varint."""
    from hello_flink_spark.sources.proto_codec import read_varint, write_varint

    spec, value = sv
    raw = encode_message(value, spec)
    out = io.BytesIO()
    for _ in range(n):
        write_varint(out, len(raw))
        out.write(raw)
    b = out.getvalue()
    pos, got = 0, []
    while pos < len(b):
        ln, pos = read_varint(b, pos)
        assert pos + ln <= len(b)
        got.append(decode_message(b[pos : pos + ln], spec))
        pos += ln
    assert got == [value] * n


# --- Avro schema resolution properties ----------------------------------------


@SETTINGS
@given(sv=_avro_record_and_value())
def test_avro_resolution_identity_random_records(sv):
    """Resolving a decoded value against its OWN schema is the
    identity, over the full randomized schema space (nullable unions,
    arrays, maps, nested records, logical types, enums, fixed)."""
    from hello_flink_spark.sources.avro_codec import resolve_value

    schema, value = sv
    assert resolve_value(value, schema, schema) == value


@SETTINGS
@given(sv=_avro_record_and_value(), dflt=I64)
def test_avro_resolution_evolution_random_records(sv, dflt):
    """A canonical evolution of any random writer schema — drop its
    first field, append a defaulted long — resolves every decoded
    value to the evolved shape: first field gone, default present,
    the rest unchanged."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    schema, value = sv
    reader = {
        "type": "record",
        "name": "R",
        "fields": schema["fields"][1:]
        + [{"name": "zz_new", "type": "long", "default": int(dflt)}],
    }
    got = decode_value(encode_value(value, schema), schema, reader_schema=reader)
    want = {k: v for k, v in value.items() if k != schema["fields"][0]["name"]}
    want["zz_new"] = int(dflt)
    assert got == want


@SETTINGS
@given(sv=_avro_record_and_value(), sid=st.integers(0, 2**32 - 1))
def test_confluent_framing_roundtrip_random_records(sv, sid):
    """The Confluent wire framing over the full randomized record
    space: magic 0x00 + big-endian id + Avro body frames and unframes
    losslessly for any schema id in the 4-byte range."""
    schema, value = sv
    body = encode_value(value, schema)
    framed = b"\x00" + sid.to_bytes(4, "big") + body
    assert framed[0] == 0
    assert int.from_bytes(framed[1:5], "big") == sid
    assert decode_value(framed[5:], schema) == value


# --- named-reference registry properties (r14) ---------------------------------


@st.composite
def _avro_named_ref_schema_and_value(draw):
    """A record defining a named inner type — random enclosing/explicit
    namespace, optional aliases — then REFERENCING it again by a
    randomly chosen referable name (bare, fullname, alias, qualified
    alias), each occurrence optionally inside a nullable union whose
    null branch may be the one taken. Exercises the registration walk,
    enclosing-namespace inheritance, alias qualification and the
    union-branch reference resolution together."""
    top_ns = draw(st.sampled_from([None, "org.z"]))
    inner_ns = draw(st.sampled_from([None, "com.x", "a.b.c"]))
    alias = draw(st.sampled_from([None, "Old", "legacy.Old"]))
    leaf_schema, leaf_strat = draw(st.sampled_from(_AVRO_PRIMS))

    # Inner defines a nested named Leaf (inheriting Inner's namespace)
    # and references it BARE — so any cross-namespace re-entry into
    # Inner must resolve that bare ref in Inner's DEFINING namespace
    # (the r14 fourth-wave shape), not the referencing context's
    inner = {
        "type": "record",
        "name": "Inner",
        "fields": [
            {"name": "x", "type": {
                "type": "record", "name": "Leaf",
                "fields": [{"name": "y", "type": leaf_schema}],
            }},
            {"name": "x2", "type": "Leaf"},
        ],
    }
    if inner_ns:
        inner["namespace"] = inner_ns
    if alias:
        inner["aliases"] = [alias]

    own_ns = inner_ns or top_ns  # spec: enclosing namespace inherited
    # the reference lives inside a Mid wrapper with its own (random)
    # namespace — the reference context is MID's namespace, so a
    # cross-namespace fullname reference exercises the re-entry path
    mid_ns = draw(st.sampled_from([None, "com.mid"]))
    ctx = mid_ns or top_ns
    # VALID reference forms from Mid's context, per the spec's Names
    # rules: a dotted fullname always works; bare forms ONLY when the
    # context qualification lands on Inner's fullname (own_ns == ctx,
    # including the both-None case). A null-namespace type has an
    # UNDOTTED fullname, so it is unreachable from any non-null context
    # except via a dotted alias — the r15 strictness fix dropped the
    # null-namespace fallback that used to accept those schemas (Java
    # Avro rejects them; see test_avro_null_namespace_ref_rejected)
    refs = []
    if own_ns:
        refs.append(f"{own_ns}.Inner")
    if own_ns == ctx:
        refs.append("Inner")
    if alias:
        if "." in alias:
            refs.append(alias)  # dotted alias is absolute
        else:
            if own_ns:
                refs.append(f"{own_ns}.{alias}")
            if own_ns == ctx:
                refs.append(alias)
    assume(refs)  # no spec-legal way to reference Inner from this context
    ref = draw(st.sampled_from(refs))

    def inner_val():
        return {"x": {"y": draw(leaf_strat)}, "x2": {"y": draw(leaf_strat)}}

    fields, value = [], {}
    def_nullable = draw(st.booleans())
    fields.append({"name": "d", "type": ["null", inner] if def_nullable else inner})
    value["d"] = (
        None if def_nullable and draw(st.booleans()) else inner_val()
    )
    ref_nullable = draw(st.booleans())
    mid = {
        "type": "record",
        "name": "Mid",
        "fields": [{"name": "w", "type": ["null", ref] if ref_nullable else ref}],
    }
    if mid_ns:
        mid["namespace"] = mid_ns
    fields.append({"name": "r", "type": mid})
    value["r"] = {
        "w": None if ref_nullable and draw(st.booleans()) else inner_val()
    }

    schema = {"type": "record", "name": "Top", "fields": fields}
    if top_ns:
        schema["namespace"] = top_ns
    return schema, value


@SETTINGS
@given(sv=_avro_named_ref_schema_and_value())
def test_avro_named_reference_roundtrip_random(sv):
    schema, value = sv
    assert decode_value(encode_value(value, schema), schema) == value


@SETTINGS
@given(sv=_avro_named_ref_schema_and_value())
def test_avro_named_reference_schema_maps_and_containers_roundtrip(sv):
    """The Spark schema mapper accepts every reference form the codec
    accepts (the r14 public-surface gap class), and the container
    layer round-trips the same schemas."""
    from pyspark.sql.types import StructType

    from hello_flink_spark.sources.formats import avro_schema_to_spark

    schema, value = sv
    spark_type = avro_schema_to_spark(schema)
    assert isinstance(spark_type, StructType)
    assert [f.name for f in spark_type.fields] == ["d", "r"]
    _, got = decode_container(encode_container([value] * 2, schema))
    assert got == [value] * 2


@SETTINGS
@given(sv=_avro_named_ref_schema_and_value())
def test_avro_validator_accepts_every_mapper_accepted_schema(sv):
    """Consistency property behind the r17 construction-time guards:
    ``_validate_refs`` must accept every schema the type mapper
    accepts, over the full named-reference space (random namespaces,
    aliases, qualified forms, unions) — otherwise adding the validator
    to the column-UDF constructors could reject a previously-working
    decode schema. Checks the ACCEPT direction only; the REJECT
    direction (dangling references at every constructor) is pinned by
    the deterministic goldens in test_formats.py."""
    from hello_flink_spark.sources.avro_codec import _register_named, _validate_refs
    from hello_flink_spark.sources.formats import avro_schema_to_spark

    schema, _ = sv
    avro_schema_to_spark(schema)  # generator emits only mapper-legal forms
    named: dict = {}
    _register_named(schema, named)
    _validate_refs(schema, named)  # must never raise where the mapper passed


@SETTINGS
@given(sv=_avro_named_ref_schema_and_value(), dflt=I64)
def test_avro_named_reference_resolution_random(sv, dflt):
    """Schema Resolution over reference-using schemas (the r14
    second-wave gap): the reader adds a defaulted long INSIDE the named
    definition; every decoded occurrence — inline definition and
    reference alike, through null unions — carries the default."""
    from hello_flink_spark.sources.avro_codec import resolve_value

    schema, value = sv

    def evolve(node):
        if isinstance(node, list):
            return [evolve(b) for b in node]
        if isinstance(node, dict) and node.get("name") == "Inner":
            return {
                **node,
                "fields": node["fields"]
                + [{"name": "zz", "type": "long", "default": int(dflt)}],
            }
        if isinstance(node, dict) and node.get("type") == "record":
            return {**node, "fields": [
                {**f, "type": evolve(f["type"])} for f in node["fields"]
            ]}
        return node

    reader = evolve(schema)
    got = resolve_value(value, schema, reader)

    def want_of(name, v):
        if v is None:
            return None
        if name == "d":
            return {**v, "zz": int(dflt)}
        # r: the Mid wrapper — the default lands on the Inner inside w
        return {"w": None if v["w"] is None else {**v["w"], "zz": int(dflt)}}

    assert got == {k: want_of(k, v) for k, v in value.items()}
