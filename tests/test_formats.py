"""Avro / Protobuf format layer (sources/formats.py — VERDICT r10
"What's missing" #5, closed in r12 per VERDICT r11 #7): the
schema-mapping rules are jar-independent and fully unit-tested, and the
decode step now WORKS jar-free — avro_codec.py / proto_codec.py
implement the public wire formats in Python. Decoder correctness is
pinned two independent ways: GOLDEN tests against hand-written bytes
derived from the specifications (never from this repo's encoders), and
encode→decode round-trips over the rich schemas."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from hello_flink_spark.sources.formats import (
    avro_schema_to_spark,
    proto_message_to_spark,
    read_avro,
)

AVRO_RICH = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": ["double", "null"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {
            "name": "attrs",
            "type": {"type": "map", "values": ["null", "long"]},
        },
        {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        {"name": "blob", "type": {"type": "fixed", "name": "F16", "size": 16}},
        {
            "name": "price",
            "type": {"type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2},
        },
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {
            "name": "local_at",
            "type": {"type": "long", "logicalType": "local-timestamp-millis"},
        },
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
        {"name": "either", "type": ["int", "string"]},
    ],
}


def test_avro_rich_record_maps_field_by_field():
    got = avro_schema_to_spark(AVRO_RICH)
    assert isinstance(got, StructType)
    by_name = {f.name: f for f in got.fields}
    assert by_name["id"].dataType == LongType() and not by_name["id"].nullable
    # [null, X] and [X, null] both mean nullable X
    assert by_name["name"].dataType == StringType() and by_name["name"].nullable
    assert by_name["score"].dataType == DoubleType() and by_name["score"].nullable
    assert by_name["tags"].dataType == ArrayType(StringType(), containsNull=False)
    assert by_name["attrs"].dataType == MapType(
        StringType(), LongType(), valueContainsNull=True
    )
    assert by_name["kind"].dataType == StringType()  # enum
    assert by_name["blob"].dataType == BinaryType()  # fixed
    assert by_name["price"].dataType == DecimalType(12, 2)
    assert by_name["day"].dataType == DateType()
    assert by_name["at"].dataType == TimestampType()
    assert by_name["local_at"].dataType == TimestampNTZType()
    assert by_name["nested"].dataType == StructType(
        [StructField("x", IntegerType(), nullable=False)]
    )
    # complex (non-null multi-branch) union → memberN struct
    assert by_name["either"].dataType == StructType(
        [
            StructField("member0", IntegerType(), nullable=True),
            StructField("member1", StringType(), nullable=True),
        ]
    )


def test_avro_json_string_and_primitives():
    assert avro_schema_to_spark('"boolean"') == BooleanType()
    assert avro_schema_to_spark(
        '{"type": "array", "items": ["null", "int"]}'
    ) == ArrayType(IntegerType(), containsNull=True)


def test_avro_recursion_and_unknowns_fail_loud():
    rec = {
        "type": "record",
        "name": "Node",
        "fields": [{"name": "next", "type": "Node"}],
    }
    with pytest.raises(ValueError, match="recursive"):
        avro_schema_to_spark(rec)
    with pytest.raises(ValueError, match="unknown Avro type"):
        avro_schema_to_spark('"wat"')


PROTO_RICH = {
    "name": "Profile",
    "fields": [
        {"name": "uid", "type": "int64"},
        {"name": "big", "type": "uint64"},
        {"name": "small", "type": "uint32"},
        {"name": "ok", "type": "bool"},
        {"name": "names", "type": "string", "repeated": True},
        {"name": "labels", "type": "string", "map_key": "string"},
        {
            "name": "inner",
            "type": "message",
            "message": {"name": "Inner", "fields": [{"name": "x", "type": "sint32"}]},
        },
        {"name": "kind", "type": "enum"},
        {"name": "at", "type": "google.protobuf.Timestamp"},
        {"name": "span", "type": "google.protobuf.Duration"},
    ],
}


def test_proto_message_maps_field_by_field():
    got = proto_message_to_spark(PROTO_RICH)
    by_name = {f.name: f for f in got.fields}
    assert by_name["uid"].dataType == LongType()
    assert by_name["big"].dataType == DecimalType(20, 0)  # unsigned 64-bit
    assert by_name["small"].dataType == LongType()  # unsigned 32-bit widens
    assert by_name["ok"].dataType == BooleanType()
    assert by_name["names"].dataType == ArrayType(StringType(), containsNull=False)
    assert by_name["labels"].dataType == MapType(
        StringType(), StringType(), valueContainsNull=True
    )
    assert by_name["inner"].dataType == StructType(
        [StructField("x", IntegerType(), nullable=True)]
    )
    assert by_name["kind"].dataType == StringType()
    assert by_name["at"].dataType == TimestampType()
    assert by_name["span"].dataType == DayTimeIntervalType()
    assert all(f.nullable for f in got.fields)  # proto3 presence


def test_proto_unknown_type_fails_loud():
    with pytest.raises(ValueError, match="unknown protobuf"):
        proto_message_to_spark({"name": "m", "fields": [{"name": "x", "type": "wat"}]})


# --- Avro wire codec: GOLDEN bytes (hand-written from the Avro 1.12
# specification "Binary encoding" section — independent of this repo's
# encoder) -------------------------------------------------------------------

AVRO_SIMPLE = {
    "type": "record",
    "name": "Simple",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["null", "int"]},
    ],
}

# a=-2 → zigzag(−2)=3 → 0x03; b="hi" → len 2 → zigzag 4 → 0x04 then
# UTF-8 'h','i'; c=3 → union index 1 → zigzag 2 → 0x02, int 3 → zigzag
# 6 → 0x06.
AVRO_SIMPLE_GOLDEN = b"\x03\x04hi\x02\x06"


def test_avro_decode_golden_record():
    from hello_flink_spark.sources.avro_codec import decode_value

    assert decode_value(AVRO_SIMPLE_GOLDEN, AVRO_SIMPLE) == {
        "a": -2,
        "b": "hi",
        "c": 3,
    }


def test_avro_encode_matches_golden():
    from hello_flink_spark.sources.avro_codec import encode_value

    assert (
        encode_value({"a": -2, "b": "hi", "c": 3}, AVRO_SIMPLE)
        == AVRO_SIMPLE_GOLDEN
    )


def test_avro_golden_array_blocks_and_null_union():
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    arr = {"type": "array", "items": "int"}
    # [1, 2] → count 2 (zigzag 4), items zigzag(1)=2, zigzag(2)=4, end 0
    assert decode_value(b"\x04\x02\x04\x00", arr) == [1, 2]
    assert encode_value([1, 2], arr) == b"\x04\x02\x04\x00"
    # negative-count block form (writer may prefix block byte size)
    assert decode_value(b"\x03\x04\x02\x04\x00", arr) == [1, 2]
    # null branch of [null, int]: index 0, no body
    assert decode_value(b"\x00", ["null", "int"]) is None


def test_avro_roundtrip_rich_record():
    """Encode→decode over AVRO_RICH covers enum/fixed/decimal/date/
    timestamp logical types, maps with nullable values, nested records
    and the complex-union member struct."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    value = {
        "id": 7,
        "name": None,
        "score": 2.5,
        "tags": ["x", "y"],
        "attrs": {"k1": 10, "k2": None},
        "kind": "B",
        "blob": bytes(range(16)),
        "price": Decimal("123.45"),
        "day": dt.date(2026, 8, 15),
        "at": dt.datetime(2026, 8, 15, 12, 30, 0, 250_000),
        "local_at": dt.datetime(2026, 8, 15, 9, 0, 0),
        "nested": {"x": -5},
        "either": "s",
    }
    got = decode_value(encode_value(value, AVRO_RICH), AVRO_RICH)
    expect = dict(value, either={"member0": None, "member1": "s"})
    assert got == expect


def test_avro_container_roundtrip_and_codecs():
    from hello_flink_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    records = [{"a": i, "b": f"r{i}", "c": None if i % 2 else i} for i in range(10)]
    for codec in ("null", "deflate"):
        blob = encode_container(records, AVRO_SIMPLE, codec=codec)
        schema, got = decode_container(blob)
        assert schema["name"] == "Simple"
        assert got == records
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"PAR1xxxx")


def test_from_avro_col_decodes_in_spark(spark):
    """from_avro_col must WORK jar-free (VERDICT r11 #7): binary column
    → struct column via the Arrow-batched Python decoder, values and
    schema matching the jar-independent converter."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.avro_codec import encode_value
    from hello_flink_spark.sources.formats import from_avro_col

    rows = [(i, encode_value({"a": i, "b": f"v{i}", "c": i * 2}, AVRO_SIMPLE)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = df.select(
        "id", from_avro_col(F.col("payload"), json.dumps(AVRO_SIMPLE)).alias("rec")
    ).select("id", "rec.a", "rec.b", "rec.c")
    got = {r["id"]: (r["a"], r["b"], r["c"]) for r in out.collect()}
    assert got == {i: (i, f"v{i}", i * 2) for i in range(20)}


def test_read_avro_reads_container_files(spark, tmp_path):
    """read_avro must WORK jar-free on real object container files —
    including the deflate codec — via binaryFile + mapInPandas."""
    from hello_flink_spark.sources.avro_codec import encode_container
    from hello_flink_spark.sources.formats import read_avro

    d = tmp_path / "avro_in"
    d.mkdir()
    for part, codec in ((0, "null"), (1, "deflate")):
        records = [
            {"a": part * 100 + i, "b": f"p{part}r{i}", "c": i if i % 2 else None}
            for i in range(50)
        ]
        (d / f"part-{part}.avro").write_bytes(
            encode_container(records, AVRO_SIMPLE, codec=codec)
        )
    df = read_avro(spark, str(d))
    assert [f.name for f in df.schema.fields] == ["a", "b", "c"]
    got = sorted((r["a"], r["b"], r["c"]) for r in df.collect())
    assert len(got) == 100
    assert got[0] == (0, "p0r0", None) and got[-1] == (149, "p1r49", 49)


def test_write_avro_roundtrip_through_read_avro(spark, tmp_path):
    """The jar-free Avro SINK: schema derived from df.schema
    (nullable unions, date/timestamp/decimal logical types, arrays),
    one container file per partition, read back losslessly by
    read_avro."""
    import datetime as dtm
    from decimal import Decimal as D

    from hello_flink_spark.sources.formats import read_avro, write_avro

    rows = [
        (
            i,
            None if i % 3 == 0 else f"n{i}",
            dtm.date(2026, 1, 1 + i),
            dtm.datetime(2026, 8, 15, 12, 0, i),
            D(f"{i}.25"),
            [float(i), i + 0.5],
        )
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows,
        "id long, name string, d date, ts timestamp_ntz, amt decimal(10,2), "
        "xs array<double>",
    ).repartition(3)
    out = str(tmp_path / "avro_out")
    write_avro(df, out, codec="deflate")
    back = read_avro(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_spark_type_to_avro_rejects_non_string_map_keys():
    from pyspark.sql.types import MapType

    from hello_flink_spark.sources.formats import spark_type_to_avro

    with pytest.raises(ValueError, match="string keys"):
        spark_type_to_avro(MapType(LongType(), StringType()))


def test_read_avro_missing_path_fails_loud(spark, tmp_path):
    from hello_flink_spark.sources.formats import read_avro

    with pytest.raises(Exception):  # noqa: B017 — jar path raises AnalysisException
        read_avro(spark, str(tmp_path / "nothing"))


# --- protobuf wire codec ------------------------------------------------------

PROTO_SIMPLE = {
    "name": "Test1",
    "fields": [
        {"name": "a", "num": 1, "type": "int32"},
        {"name": "b", "num": 2, "type": "string"},
    ],
}


def test_proto_decode_golden():
    """The canonical example from the public protobuf encoding doc:
    field 1 (varint) = 150 encodes as 08 96 01; field 2 (string)
    "testing" as 12 07 74 65 73 74 69 6e 67."""
    from hello_flink_spark.sources.proto_codec import decode_message

    golden = bytes.fromhex("089601") + bytes.fromhex("1207") + b"testing"
    assert decode_message(golden, PROTO_SIMPLE) == {"a": 150, "b": "testing"}


def test_proto_encode_matches_golden():
    from hello_flink_spark.sources.proto_codec import encode_message

    golden = bytes.fromhex("089601") + bytes.fromhex("1207") + b"testing"
    assert encode_message({"a": 150, "b": "testing"}, PROTO_SIMPLE) == golden


def test_proto_golden_negatives_zigzag_and_skip():
    from hello_flink_spark.sources.proto_codec import decode_message

    # int32 -1 is a 10-byte sign-extended varint on the wire
    neg = bytes.fromhex("08") + b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    assert decode_message(neg, PROTO_SIMPLE)["a"] == -1
    # sint32 -1 zigzags to 1
    spec = {"name": "S", "fields": [{"name": "z", "num": 1, "type": "sint32"}]}
    assert decode_message(bytes.fromhex("0801"), spec) == {"z": -1}
    # unknown field numbers are skipped by wire type (forward compat)
    with_unknown = bytes.fromhex("089601") + bytes.fromhex("1a03") + b"xyz"
    assert decode_message(with_unknown, PROTO_SIMPLE)["a"] == 150
    # proto3 zero defaults for absent fields
    assert decode_message(b"", PROTO_SIMPLE) == {"a": 0, "b": ""}


PROTO_RICH_NUMBERED = {
    "name": "Profile",
    "fields": [
        {"name": "uid", "num": 1, "type": "int64"},
        {"name": "big", "num": 2, "type": "uint64"},
        {"name": "ok", "num": 3, "type": "bool"},
        {"name": "names", "num": 4, "type": "string", "repeated": True},
        {"name": "nums", "num": 5, "type": "sint64", "repeated": True},
        {"name": "labels", "num": 6, "type": "string", "map_key": "string"},
        {
            "name": "inner",
            "num": 7,
            "type": "message",
            "message": {
                "name": "Inner",
                "fields": [{"name": "x", "num": 1, "type": "sint32"}],
            },
        },
        {"name": "kind", "num": 8, "type": "enum", "symbols": ["NONE", "GOOD"]},
        {"name": "at", "num": 9, "type": "google.protobuf.Timestamp"},
        {"name": "span", "num": 10, "type": "google.protobuf.Duration"},
    ],
}


def test_proto_roundtrip_rich_message():
    from hello_flink_spark.sources.proto_codec import decode_message, encode_message

    value = {
        "uid": -42,
        "big": Decimal(2**63 + 11),
        "ok": True,
        "names": ["a", "b"],
        "nums": [-1, 2, -3],
        "labels": {"k": "v", "k2": "v2"},
        "inner": {"x": -7},
        "kind": "GOOD",
        "at": dt.datetime(2026, 8, 15, 10, 0, 0, 500_000),
        "span": dt.timedelta(seconds=90, microseconds=250_000),
    }
    got = decode_message(encode_message(value, PROTO_RICH_NUMBERED), PROTO_RICH_NUMBERED)
    assert got == value


def test_proto_packed_repeated_scalars_decode():
    """proto3 writers pack repeated scalars into one length-delimited
    blob — the decoder must accept both packed and unpacked forms."""
    from hello_flink_spark.sources.proto_codec import decode_message

    spec = {"name": "P", "fields": [{"name": "v", "num": 1, "type": "int32", "repeated": True}]}
    # packed: tag 0a (field 1, wire 2), len 3, varints 1 2 3
    assert decode_message(bytes.fromhex("0a03010203"), spec) == {"v": [1, 2, 3]}
    # unpacked: three varint fields
    assert decode_message(bytes.fromhex("080108020803"), spec) == {"v": [1, 2, 3]}


def test_from_protobuf_col_decodes_in_spark(spark):
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import from_protobuf_col
    from hello_flink_spark.sources.proto_codec import encode_message

    rows = [
        (i, encode_message({"a": i * 10, "b": f"m{i}"}, PROTO_SIMPLE))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = df.select(
        "id",
        from_protobuf_col(
            F.col("payload"), "Test1", message_spec=PROTO_SIMPLE
        ).alias("rec"),
    ).select("id", "rec.a", "rec.b")
    got = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert got == {i: (i * 10, f"m{i}") for i in range(20)}


def test_from_protobuf_col_without_spec_or_jar_is_honest():
    from hello_flink_spark.sources.formats import from_protobuf_col

    try:
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401

        jar_present = True
    except Exception:  # noqa: BLE001
        jar_present = False
    if not jar_present:
        with pytest.raises(NotImplementedError, match="spark-protobuf"):
            from_protobuf_col(None, "M", desc_file_path=None, message_spec=None)


def test_read_protobuf_delimited_golden_frames(spark, tmp_path):
    """Hand-built varint-length-delimited stream (the writeDelimitedTo
    framing): frame lengths 03 and 0b prefix the canonical encoding-doc
    payloads; the reader must split frames and decode both."""
    from hello_flink_spark.sources.formats import read_protobuf_delimited

    msg1 = bytes.fromhex("089601")  # a=150
    msg2 = bytes.fromhex("0802") + bytes.fromhex("1207") + b"testing"  # a=2, b="testing"
    d = tmp_path / "pb_in"
    d.mkdir()
    (d / "part-0.pb").write_bytes(bytes([len(msg1)]) + msg1 + bytes([len(msg2)]) + msg2)
    df = read_protobuf_delimited(spark, str(d), PROTO_SIMPLE)
    assert [f.name for f in df.schema.fields] == ["a", "b"]
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [(2, "testing"), (150, "")]


def test_read_protobuf_delimited_truncated_frame_fails_loud(spark, tmp_path):
    from hello_flink_spark.sources.formats import read_protobuf_delimited

    d = tmp_path / "pb_bad"
    d.mkdir()
    (d / "part-0.pb").write_bytes(bytes([10]) + bytes.fromhex("089601"))  # claims 10, has 3
    with pytest.raises(Exception, match="truncated delimited protobuf frame"):
        read_protobuf_delimited(spark, str(d), PROTO_SIMPLE).collect()


def test_write_protobuf_delimited_roundtrip(spark, tmp_path):
    """The jar-free protobuf SINK: one .pb frame-stream file per
    partition, read back losslessly (repeated, map, nested message,
    enum symbols) by read_protobuf_delimited."""
    from hello_flink_spark.sources.formats import read_protobuf_delimited, write_protobuf_delimited

    spec = {
        "name": "Doc",
        "fields": [
            {"name": "uid", "num": 1, "type": "int64"},
            {"name": "tags", "num": 2, "type": "string", "repeated": True},
            {"name": "props", "num": 3, "type": "string", "map_key": "string"},
            {
                "name": "inner",
                "num": 4,
                "type": "message",
                "message": {
                    "name": "Inner",
                    "fields": [{"name": "x", "num": 1, "type": "sint32"}],
                },
            },
            {"name": "kind", "num": 5, "type": "enum", "symbols": ["NONE", "GOOD"]},
        ],
    }
    rows = [
        (i, [f"t{i}", "z"], {"k": f"v{i}"}, (-i,), "GOOD" if i % 2 else "NONE")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "uid long, tags array<string>, props map<string,string>, "
        "inner struct<x:int>, kind string",
    ).repartition(4)
    out = str(tmp_path / "pb_out")
    write_protobuf_delimited(df, out, spec)
    import glob as _glob

    assert len(_glob.glob(out + "/part-*.pb")) == 4
    back = read_protobuf_delimited(spark, out, spec)
    got = sorted(
        (r["uid"], tuple(r["tags"]), dict(r["props"]), tuple(r["inner"]), r["kind"])
        for r in back.collect()
    )
    want = sorted((u, tuple(t), p, x, k) for u, t, p, x, k in rows)
    assert got == want


# --- Avro schema resolution (spec "Schema Resolution") ------------------------


def test_avro_resolve_value_rules():
    """Spec rules on decoded values: record field add (reader default) /
    drop, primitive promotions, enum fallback, nullable widening, and
    the fail-loud cases (missing default, incompatible types, complex
    unions refused)."""
    from hello_flink_spark.sources.avro_codec import resolve_value

    writer = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "gone", "type": "string"},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["X", "Y"]}},
        ],
    }
    reader = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "double"},          # promotion int->double
            {"name": "added", "type": "long", "default": 7},
            {"name": "opt", "type": ["null", "string"], "default": None},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["X", "Z"], "default": "Z"}},
        ],
    }
    got = resolve_value({"a": 3, "gone": "bye", "e": "Y"}, writer, reader)
    assert got == {"a": 3.0, "added": 7, "opt": None, "e": "Z"}
    assert isinstance(got["a"], float)
    # promotions standalone
    assert resolve_value("hi", "string", "bytes") == b"hi"
    assert resolve_value(b"hi", "bytes", "string") == "hi"
    # nullable widening: writer plain, reader nullable
    assert resolve_value(5, "int", ["null", "long"]) == 5
    # narrowing a null fails loud
    with pytest.raises(ValueError, match="non-nullable reader"):
        resolve_value(None, ["null", "int"], "int")
    # reader-only field without default fails loud
    bad_reader = {"type": "record", "name": "R",
                  "fields": [{"name": "nope", "type": "int"}]}
    with pytest.raises(ValueError, match="no default"):
        resolve_value({"a": 1, "gone": "x", "e": "X"}, writer, bad_reader)
    # incompatible primitive pair fails loud
    with pytest.raises(ValueError, match="cannot resolve"):
        resolve_value(1.5, "double", "int")
    # complex unions refused loudly
    with pytest.raises(ValueError, match="complex"):
        resolve_value(1, ["int", "string"], ["int", "string"])


def test_avro_resolve_nested_and_containers():
    from hello_flink_spark.sources.avro_codec import resolve_value

    writer = {"type": "array", "items": "int"}
    reader = {"type": "array", "items": "long"}
    assert resolve_value([1, 2], writer, reader) == [1, 2]
    wm = {"type": "map", "values": "float"}
    rm = {"type": "map", "values": "double"}
    assert resolve_value({"k": 1.5}, wm, rm) == {"k": 1.5}


def test_read_avro_mixed_generation_directory_with_reader_schema(spark, tmp_path):
    """SCHEMA EVOLUTION through read_avro: a directory holding a v1
    container (no 'score' field) and a v2 container, read under the v2
    reader schema — v1 rows take the default, v2 rows keep their
    values. Each container decodes under its OWN embedded writer
    schema first (self-describing), then resolves."""
    from hello_flink_spark.sources.avro_codec import encode_container
    from hello_flink_spark.sources.formats import read_avro

    v1 = {
        "type": "record",
        "name": "Doc",
        "fields": [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}],
    }
    v2 = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": ["null", "double"], "default": None},
        ],
    }
    d = tmp_path / "avro_evolving"
    d.mkdir()
    (d / "gen1.avro").write_bytes(
        encode_container([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], v1)
    )
    (d / "gen2.avro").write_bytes(
        encode_container([{"id": 3, "name": "c", "score": 0.5}], v2, codec="deflate")
    )
    df = read_avro(spark, str(d), reader_schema=v2)
    assert [f.name for f in df.schema.fields] == ["id", "name", "score"]
    got = sorted((r["id"], r["name"], r["score"]) for r in df.collect())
    assert got == [(1, "a", None), (2, "b", None), (3, "c", 0.5)]


def test_decode_value_with_reader_schema_golden():
    """decode_value(reader_schema=...) end-to-end on wire bytes: an
    int 3 (zigzag 06) under writer {a int} reads as {a: 3.0, b: "d"}
    under the evolved reader."""
    from hello_flink_spark.sources.avro_codec import decode_value

    writer = {"type": "record", "name": "R", "fields": [{"name": "a", "type": "int"}]}
    reader = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "double"},
            {"name": "b", "type": "string", "default": "d"},
        ],
    }
    got = decode_value(bytes.fromhex("06"), writer, reader_schema=reader)
    assert got == {"a": 3.0, "b": "d"} and isinstance(got["a"], float)


# --- ENCODE column functions (the sink direction) -----------------------------


def test_to_avro_col_roundtrips_through_from_avro_col(spark):
    """to_avro_col must ENCODE a struct column to wire bytes that
    from_avro_col decodes back identically — the Kafka-value sink
    direction, jar-free."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import from_avro_col, to_avro_col

    schema = json.dumps(
        {
            "type": "record",
            "name": "Ev",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
                {"name": "xs", "type": {"type": "array", "items": "double"}},
            ],
        }
    )
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"n{i}", [float(i), i + 0.5]) for i in range(20)],
        "id long, name string, xs array<double>",
    ).select(F.struct("id", "name", "xs").alias("rec"))
    out = df.select(
        from_avro_col(to_avro_col(F.col("rec"), schema), schema).alias("back")
    ).select("back.id", "back.name", "back.xs")
    got = sorted((r["id"], r["name"], list(r["xs"])) for r in out.collect())
    assert got == sorted(
        (i, None if i % 3 == 0 else f"n{i}", [float(i), i + 0.5]) for i in range(20)
    )


def test_avro_col_named_reference_roundtrips_on_executors(spark):
    """The encode/decode UDF pair with a NAMED-TYPE-REFERENCE schema,
    executed on real executors (round 15): the prebuilt named-type
    registry is captured in the pandas-UDF closures and cloudpickled to
    workers — shared definition references inside the (schema, registry)
    pair must survive that trip, or reference resolution breaks exactly
    where the sf0.01 gate (flat fixture schemas) cannot see it. The
    schema defines `Pt` once inside a namespace and references it again
    undotted from the same namespace plus dotted from the top record."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import from_avro_col, to_avro_col

    schema = json.dumps(
        {
            "type": "record",
            "name": "Seg",
            "namespace": "com.geo",
            "fields": [
                {"name": "a", "type": {
                    "type": "record", "name": "Pt",
                    "fields": [
                        {"name": "x", "type": "double"},
                        {"name": "y", "type": "double"},
                    ]}},
                {"name": "b", "type": "Pt"},  # undotted, same namespace
                {"name": "c", "type": ["null", "com.geo.Pt"]},  # dotted
            ],
        }
    )
    rows = [
        ((float(i), i + 0.5), (i - 0.5, float(-i)),
         None if i % 3 == 0 else (i * 2.0, i * 3.0))
        for i in range(20)
    ]
    pt = "struct<x double, y double>"
    df = spark.createDataFrame(rows, f"a {pt}, b {pt}, c {pt}").select(
        F.struct("a", "b", "c").alias("rec")
    )
    out = df.select(
        from_avro_col(to_avro_col(F.col("rec"), schema), schema).alias("back")
    )
    got = sorted(
        (
            (r["back"]["a"]["x"], r["back"]["a"]["y"]),
            (r["back"]["b"]["x"], r["back"]["b"]["y"]),
            None if r["back"]["c"] is None
            else (r["back"]["c"]["x"], r["back"]["c"]["y"]),
        )
        for r in out.collect()
    )
    assert got == sorted(
        ((a, b, None if c is None else (float(c[0]), float(c[1]))))
        for a, b, c in ((tuple(map(float, a)), tuple(map(float, b)), c)
                        for a, b, c in rows)
    )


def test_to_protobuf_col_roundtrips_through_from_protobuf_col(spark):
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import from_protobuf_col, to_protobuf_col

    spec = {
        "name": "Ev",
        "fields": [
            {"name": "id", "num": 1, "type": "int64"},
            {"name": "name", "num": 2, "type": "string"},
            {"name": "tags", "num": 3, "type": "string", "repeated": True},
        ],
    }
    df = spark.createDataFrame(
        [(i, f"n{i}", [f"t{i}", "z"]) for i in range(20)],
        "id long, name string, tags array<string>",
    ).select(F.struct("id", "name", "tags").alias("rec"))
    out = df.select(
        from_protobuf_col(
            to_protobuf_col(F.col("rec"), "Ev", spec), "Ev", message_spec=spec
        ).alias("back")
    ).select("back.id", "back.name", "back.tags")
    got = sorted((r["id"], r["name"], list(r["tags"])) for r in out.collect())
    assert got == sorted((i, f"n{i}", [f"t{i}", "z"]) for i in range(20))


# --- malformed-input hardening (untrusted bytes must fail LOUD) ---------------


def test_proto_decode_overlength_claims_fail_loud():
    """Length-delimited fields claiming more bytes than the buffer holds
    must raise, never silently truncate (Python slices past the end
    would otherwise return short data and desync the stream)."""
    from hello_flink_spark.sources.proto_codec import decode_message

    # field 1 wire type 2, claimed length 100, 3 bytes present
    spec = {"name": "S", "fields": [{"name": "s", "num": 1, "type": "string"}]}
    with pytest.raises(ValueError, match="exceeds buffer"):
        decode_message(bytes.fromhex("0a64") + b"abc", spec)
    # nested message over-claim
    mspec = {
        "name": "M",
        "fields": [{"name": "m", "num": 1, "type": "message",
                    "message": {"name": "I", "fields": [{"name": "x", "num": 1, "type": "int32"}]}}],
    }
    with pytest.raises(ValueError, match="exceeds buffer"):
        decode_message(bytes.fromhex("0a7f") + bytes.fromhex("0801"), mspec)
    # unknown-field skip with an over-claimed length
    with pytest.raises(ValueError, match="exceeds buffer"):
        decode_message(bytes.fromhex("1a64") + b"ab", spec)


def test_avro_decode_malformed_lengths_fail_loud():
    """Negative or oversized Avro length claims must raise mid-stream
    (inside containers there is no trailing-bytes backstop)."""
    from hello_flink_spark.sources.avro_codec import decode_value

    # negative string length: zigzag(-5) = 9 -> 0x09
    with pytest.raises(ValueError, match="exceeds buffer"):
        decode_value(b"\x09abcde", '"string"')
    # bytes length past the buffer: zigzag(1000) -> d0 0f
    with pytest.raises(ValueError, match="exceeds buffer"):
        decode_value(b"\xd0\x0fab", '"bytes"')
    # enum index out of range
    enum = {"type": "enum", "name": "E", "symbols": ["A", "B"]}
    with pytest.raises(ValueError, match="enum index"):
        decode_value(b"\x08", enum)  # zigzag(4) = 8
    # fixed past the buffer
    fixed = {"type": "fixed", "name": "F8", "size": 8}
    with pytest.raises(ValueError, match="exceeds buffer"):
        decode_value(b"abc", fixed)


def test_wire_decoders_fuzz_bounded_failure():
    """Random bytes under real schemas must either decode or raise a
    BOUNDED, typed error (ValueError / struct.error / UnicodeDecodeError
    / OverflowError) — never hang, never crash with anything else.
    Deterministic LCG fuzz corpus, no test-order dependence."""
    import struct as _struct

    from hello_flink_spark.sources.avro_codec import decode_value
    from hello_flink_spark.sources.proto_codec import decode_message

    ok = (ValueError, _struct.error, UnicodeDecodeError, OverflowError)
    seed = 0x2545F4914F6CDD1D
    blobs = []
    x = seed
    for n in (0, 1, 3, 7, 16, 64, 256):
        b = bytearray()
        for _ in range(n):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            b.append((x >> 33) & 0xFF)
        blobs.append(bytes(b))
    pspec = {
        "name": "F",
        "fields": [
            {"name": "a", "num": 1, "type": "int64"},
            {"name": "s", "num": 2, "type": "string"},
            {"name": "r", "num": 3, "type": "sint32", "repeated": True},
            {"name": "m", "num": 4, "type": "message",
             "message": {"name": "I", "fields": [{"name": "x", "num": 1, "type": "bool"}]}},
        ],
    }
    aschema = {
        "type": "record",
        "name": "F",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "xs", "type": {"type": "array", "items": "double"}},
        ],
    }
    for blob in blobs:
        try:
            decode_message(blob, pspec)
        except ok:
            pass
        try:
            decode_value(blob, aschema)
        except ok:
            pass


# --- Confluent Schema Registry wire framing (the avro-confluent format) -------


def test_avro_confluent_framing_multi_generation(spark):
    """from_avro_confluent_col: magic 0x00 + 4-byte big-endian schema
    id + Avro body. A mixed-generation payload column (ids 7 and 12,
    the older schema missing a field) decodes per-message under its
    id's writer schema and resolves to the reader — the multi-schema
    Kafka topic shape, offline."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.avro_codec import encode_value
    from hello_flink_spark.sources.formats import from_avro_confluent_col

    v1 = {"type": "record", "name": "D", "fields": [{"name": "id", "type": "long"}]}
    v2 = {
        "type": "record",
        "name": "D",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "tag", "type": "string", "default": "old"},
        ],
    }

    def frame(sid, body):
        return b"\x00" + sid.to_bytes(4, "big") + body

    rows = [(i, frame(7, encode_value({"id": i}, v1))) for i in range(5)] + [
        (i, frame(12, encode_value({"id": i, "tag": f"t{i}"}, v2)))
        for i in range(5, 8)
    ]
    df = spark.createDataFrame(rows, "n long, payload binary")
    out = df.select(
        from_avro_confluent_col(
            F.col("payload"), v2, {7: v1, 12: json.dumps(v2)}
        ).alias("rec")
    ).select("rec.id", "rec.tag")
    got = sorted((r["id"], r["tag"]) for r in out.collect())
    assert got == [(i, "old") for i in range(5)] + [(i, f"t{i}") for i in range(5, 8)]


def test_avro_confluent_bad_magic_and_unknown_id_fail_loud(spark):
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.avro_codec import encode_value
    from hello_flink_spark.sources.formats import from_avro_confluent_col

    v1 = {"type": "record", "name": "D", "fields": [{"name": "id", "type": "long"}]}
    bad_magic = spark.createDataFrame([(b"\x01\x00\x00\x00\x07\x02",)], "payload binary")
    with pytest.raises(Exception, match="magic"):
        bad_magic.select(
            from_avro_confluent_col(F.col("payload"), v1, {7: v1}).alias("r")
        ).collect()
    unknown = spark.createDataFrame(
        [(b"\x00" + (99).to_bytes(4, "big") + encode_value({"id": 1}, v1),)],
        "payload binary",
    )
    with pytest.raises(Exception, match="registry snapshot"):
        unknown.select(
            from_avro_confluent_col(F.col("payload"), v1, {7: v1}).alias("r")
        ).collect()


def test_avro_confluent_encode_roundtrip(spark):
    """to_avro_confluent_col frames with the declared id; the decode
    side reads it back through the registry snapshot."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import (
        from_avro_confluent_col,
        to_avro_confluent_col,
    )

    schema = {
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "k", "type": "string"},
            {"name": "v", "type": "long"},
        ],
    }
    df = spark.createDataFrame(
        [(f"k{i}", i) for i in range(15)], "k string, v long"
    ).select(F.struct("k", "v").alias("rec"))
    enc = df.select(
        to_avro_confluent_col(F.col("rec"), json.dumps(schema), 42).alias("payload")
    )
    first = enc.limit(1).collect()[0]["payload"]
    assert bytes(first)[:5] == b"\x00" + (42).to_bytes(4, "big")
    back = enc.select(
        from_avro_confluent_col(F.col("payload"), schema, {42: schema}).alias("rec")
    ).select("rec.k", "rec.v")
    assert sorted((r["k"], r["v"]) for r in back.collect()) == sorted(
        (f"k{i}", i) for i in range(15)
    )


# --- review-r12 regression pins ----------------------------------------------


def test_container_negative_block_size_fails_loud_not_hangs():
    """A crafted block header (count 0, size -18) used to rewind pos
    onto the header sync and loop forever; it must raise instead."""
    from hello_flink_spark.sources.avro_codec import decode_container, encode_container

    good = encode_container([{"a": 1, "b": "x", "c": None}], AVRO_SIMPLE)
    # append a malformed block: count=0 (0x00), size=-18 (zigzag 0x23)
    with pytest.raises(ValueError, match="exceeds buffer|negative"):
        decode_container(good + b"\x00\x23" + b"\x00" * 16)
    with pytest.raises(ValueError, match="negative container block count"):
        decode_container(good + b"\x23\x00" + b"\x00" * 16)


def test_eleven_byte_varints_rejected_both_codecs():
    """Spec max is 10 bytes; the 11th used to slip through and yield a
    silently wrong 77-bit value."""
    from hello_flink_spark.sources.avro_codec import read_long
    from hello_flink_spark.sources.proto_codec import read_varint

    eleven = b"\xff" * 10 + b"\x7f"
    with pytest.raises(ValueError, match="longer than 10 bytes"):
        read_varint(eleven, 0)
    with pytest.raises(ValueError, match="longer than 10 bytes"):
        read_long(eleven, 0)
    # a FULL legal 10-byte varint still decodes (protobuf -1 int64)
    ten = b"\xff" * 9 + b"\x01"
    v, pos = read_varint(ten, 0)
    assert v == (1 << 64) - 1 and pos == 10


def test_tz_aware_timestamps_anchor_to_true_epoch():
    """Encoding a tz-aware instant must produce its real epoch offset;
    the old epoch-in-own-tz arithmetic shifted it by the UTC offset."""
    import datetime as dtm

    from hello_flink_spark.sources.avro_codec import decode_value, encode_value
    from hello_flink_spark.sources.proto_codec import decode_message, encode_message

    tz5 = dtm.timezone(dtm.timedelta(hours=5))
    aware = dtm.datetime(2026, 1, 1, 0, 0, 0, tzinfo=tz5)  # == 2025-12-31T19:00Z
    schema = {"type": "long", "logicalType": "timestamp-micros"}
    want_us = int(
        (aware - dtm.datetime(1970, 1, 1, tzinfo=dtm.timezone.utc)).total_seconds()
    ) * 1_000_000
    assert decode_value(encode_value(aware, schema), {"type": "long"}) == want_us
    # decoder returns the naive-UTC instant
    assert decode_value(encode_value(aware, schema), schema) == dtm.datetime(
        2025, 12, 31, 19, 0, 0
    )
    spec = {"name": "T", "fields": [{"name": "at", "num": 1,
                                     "type": "google.protobuf.Timestamp"}]}
    got = decode_message(encode_message({"at": aware}, spec), spec)
    assert got["at"] == dtm.datetime(2025, 12, 31, 19, 0, 0)


def test_encode_cols_handle_nullable_numeric_nulls(spark):
    """A nullable LONG struct field with any null in the batch arrives
    from Arrow as float64 + NaN; both encode fallbacks must map NaN to
    null and integral floats back to the integer branch."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import (
        from_avro_col,
        from_protobuf_col,
        to_avro_col,
        to_protobuf_col,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, v long"
    ).select(F.struct("id", "v").alias("rec"))
    aschema = json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "id", "type": "long"},
                    {"name": "v", "type": ["null", "long"]}]}
    )
    back = df.select(
        from_avro_col(to_avro_col(F.col("rec"), aschema), aschema).alias("b")
    ).select("b.id", "b.v")
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (1, 10), (2, None), (3, 30)
    ]
    pspec = {"name": "R", "fields": [{"name": "id", "num": 1, "type": "int64"},
                                     {"name": "v", "num": 2, "type": "int64"}]}
    pback = df.select(
        from_protobuf_col(
            to_protobuf_col(F.col("rec"), "R", pspec), "R", message_spec=pspec
        ).alias("b")
    ).select("b.id", "b.v")
    # proto3 has no presence for plain int64: null encodes as absent -> 0
    assert sorted((r["id"], r["v"]) for r in pback.collect()) == [
        (1, 10), (2, 0), (3, 30)
    ]


def test_read_avro_ignores_stray_non_avro_files(spark, tmp_path):
    """A _SUCCESS marker (or any non-.avro sibling) must poison neither
    schema inference nor the scan."""
    from hello_flink_spark.sources.avro_codec import encode_container
    from hello_flink_spark.sources.formats import read_avro

    d = tmp_path / "avro_with_stray"
    d.mkdir()
    (d / "_SUCCESS").write_bytes(b"")
    (d / "part-0.avro").write_bytes(
        encode_container([{"a": 1, "b": "x", "c": None}], AVRO_SIMPLE)
    )
    got = read_avro(spark, str(d)).collect()
    assert [(r["a"], r["b"], r["c"]) for r in got] == [(1, "x", None)]


# --- review-r12 second-wave regression pins -----------------------------------


def test_genuine_nan_doubles_survive_where_unambiguous():
    """NaN policy: in a union WITH null, NaN is the pandas null
    sentinel → null; in a NON-nullable double (or a protobuf
    double/float field) NaN is a genuine IEEE value and must encode as
    itself — the first-wave blanket NaN→None broke both."""
    import math

    from hello_flink_spark.sources.avro_codec import decode_value, encode_value
    from hello_flink_spark.sources.proto_codec import decode_message, encode_message

    assert math.isnan(decode_value(encode_value(float("nan"), '"double"'), '"double"'))
    assert decode_value(encode_value(float("nan"), ["null", "double"]), ["null", "double"]) is None
    spec = {"name": "N", "fields": [{"name": "d", "num": 1, "type": "double"},
                                    {"name": "i", "num": 2, "type": "int64"}]}
    got = decode_message(encode_message({"d": float("nan"), "i": float("nan")}, spec), spec)
    assert math.isnan(got["d"])
    assert got["i"] == 0  # NaN on an int field = coerced null -> proto3 default


def test_container_count_bomb_rejected():
    """A crafted block claiming millions of records in zero bytes must
    raise, not spin the per-record loop unboundedly."""
    from hello_flink_spark.sources.avro_codec import decode_container, encode_container
    import io

    from hello_flink_spark.sources.avro_codec import write_long

    good = encode_container([{"a": 1, "b": "x", "c": None}], AVRO_SIMPLE)
    bomb = io.BytesIO()
    write_long(bomb, 50_000_000)  # count
    write_long(bomb, 0)           # size
    with pytest.raises(ValueError, match="claims 50000000 records"):
        decode_container(good + bomb.getvalue() + b"\x00" * 16)


def test_integral_float_fallback_bounded_at_2_53():
    """A float64-coerced long above 2^53 has already lost precision —
    claiming the long branch would silently corrupt; it must raise."""
    from hello_flink_spark.sources.avro_codec import encode_value

    ok = encode_value(float(2**53), ["null", "long"])
    assert ok  # at the bound: exact, accepted
    with pytest.raises(ValueError, match="no union branch"):
        encode_value(float(2**53) * 2, ["null", "long"])


def test_local_timestamp_keeps_wall_clock_for_aware_values():
    """Avro local-timestamp stores wall-clock fields regardless of
    zone: a tz-aware midnight encodes as midnight, not its UTC
    instant (the UTC anchor belongs to timestamp-* only)."""
    import datetime as dtm

    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    tz5 = dtm.timezone(dtm.timedelta(hours=5))
    aware = dtm.datetime(2026, 1, 1, 0, 0, 0, tzinfo=tz5)
    local = {"type": "long", "logicalType": "local-timestamp-micros"}
    assert decode_value(encode_value(aware, local), local) == dtm.datetime(2026, 1, 1)
    instant = {"type": "long", "logicalType": "timestamp-micros"}
    assert decode_value(encode_value(aware, instant), instant) == dtm.datetime(
        2025, 12, 31, 19, 0, 0
    )


def test_read_avro_reads_extensionless_containers(spark, tmp_path):
    """Containers without a .avro extension (non-Spark producers) must
    be read, not silently dropped — only hidden/metadata files are
    excluded."""
    from hello_flink_spark.sources.avro_codec import encode_container
    from hello_flink_spark.sources.formats import read_avro

    d = tmp_path / "avro_extless"
    d.mkdir()
    (d / "_SUCCESS").write_bytes(b"")
    (d / "part-0.avro").write_bytes(
        encode_container([{"a": 1, "b": "x", "c": None}], AVRO_SIMPLE)
    )
    (d / "part-1").write_bytes(
        encode_container([{"a": 2, "b": "y", "c": 7}], AVRO_SIMPLE)
    )
    got = sorted((r["a"], r["b"], r["c"]) for r in read_avro(spark, str(d)).collect())
    assert got == [(1, "x", None), (2, "y", 7)]


def test_to_avro_col_accepts_parsed_dict_schema(spark):
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import from_avro_col, to_avro_col

    schema = {"type": "record", "name": "R",
              "fields": [{"name": "k", "type": "string"}]}
    df = spark.createDataFrame([("a",), ("b",)], "k string").select(
        F.struct("k").alias("rec")
    )
    back = df.select(
        from_avro_col(to_avro_col(F.col("rec"), schema), schema).alias("b")
    ).select("b.k")
    assert sorted(r["k"] for r in back.collect()) == ["a", "b"]


# --- advisor-r12 regression pins ----------------------------------------------


def test_container_compressed_repetitive_roundtrip():
    """The count-bomb guard must bound against DECOMPRESSED bytes:
    deflate exceeds 8x on repetitive data, so a compressed-size bound
    rejected this codec's own legal write_avro output (advisor r12,
    reproduced). 100k identical records compress ~1000x; the
    round-trip must succeed under every compressed codec."""
    from hello_flink_spark.sources.avro_codec import decode_container, encode_container

    recs = [{"a": 0, "b": "", "c": None}] * 100_000
    for codec in ("deflate", "bzip2", "xz"):
        blob = encode_container(recs, AVRO_SIMPLE, codec=codec)
        # the ratio that broke the old guard: count >> compressed_size*8
        assert 100_000 > (len(blob) * 8 + 65_536), "fixture no longer repro-shaped"
        schema, got = decode_container(blob)
        assert len(got) == 100_000 and got[0] == {"a": 0, "b": "", "c": None}


def test_encode_cols_handle_nullable_timestamp_nulls(spark):
    """A null in a nullable TIMESTAMP struct field arrives from Arrow
    as pd.NaT — a datetime subclass the float-NaN policy never sees;
    both encode fallbacks must map it to null, not crash (advisor
    r12, both crashes reproduced)."""
    import datetime as dtm
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import (
        from_avro_col,
        from_protobuf_col,
        to_avro_col,
        to_protobuf_col,
    )

    t1 = dtm.datetime(2026, 3, 1, 12, 30, 0)
    df = spark.createDataFrame(
        [(1, t1), (2, None)], "id long, at timestamp"
    ).select(F.struct("id", "at").alias("rec"))
    aschema = json.dumps(
        {"type": "record", "name": "R",
         "fields": [{"name": "id", "type": "long"},
                    {"name": "at", "type": ["null", {
                        "type": "long", "logicalType": "timestamp-micros"}]}]}
    )
    back = df.select(
        from_avro_col(to_avro_col(F.col("rec"), aschema), aschema).alias("b")
    ).select("b.id", "b.at")
    assert sorted(((r["id"], r["at"]) for r in back.collect()),
                  key=lambda t: t[0]) == [(1, t1), (2, None)]
    pspec = {"name": "R", "fields": [
        {"name": "id", "num": 1, "type": "int64"},
        {"name": "at", "num": 2, "type": "google.protobuf.Timestamp"}]}
    pback = df.select(
        from_protobuf_col(
            to_protobuf_col(F.col("rec"), "R", pspec), "R", message_spec=pspec
        ).alias("b")
    ).select("b.id", "b.at")
    # Timestamp is a MESSAGE field: null encodes as absent -> None
    assert sorted(((r["id"], r["at"]) for r in pback.collect()),
                  key=lambda t: t[0]) == [(1, t1), (2, None)]


def test_read_avro_skips_hidden_directory_components(spark, tmp_path):
    """Spark's file index hides _/.-prefixed names at EVERY path level,
    so a commit-log file with a PLAIN basename inside a hidden
    directory (the _spark_metadata/0 / .staging/task-X layout) must
    poison neither schema inference nor the scan — a basename-only
    filter globbed it first and crashed on bad magic (review r13).
    The fixture uses a generic hidden dir name: Spark special-cases
    the literal `_spark_metadata` as a FileStreamSink log, which is a
    different (JVM-side) code path from the listing filter under
    test."""
    from hello_flink_spark.sources.avro_codec import encode_container
    from hello_flink_spark.sources.formats import read_avro

    d = tmp_path / "avro_sink_dir"
    (d / "_commits").mkdir(parents=True)
    # plain basename, hidden parent; sorts BEFORE part-0 — exactly the
    # poison ordering
    (d / "_commits" / "0").write_text('{"commit": 1}')
    (d / "part-0").write_bytes(
        encode_container([{"a": 1, "b": "x", "c": None}], AVRO_SIMPLE)
    )
    got = read_avro(spark, str(d)).collect()
    assert [(r["a"], r["b"], r["c"]) for r in got] == [(1, "x", None)]


# --- review-r13 full-file codec review pins -----------------------------------


def test_packed_element_must_not_overrun_its_region():
    """A packed element reading past its declared region would silently
    swallow the NEXT field's bytes (fixed32 crossing the boundary
    consumed the following tag+value; the next field reverted to its
    default with no error — review r13)."""
    from hello_flink_spark.sources.proto_codec import decode_message

    spec = {"name": "P", "fields": [
        {"name": "xs", "num": 1, "type": "fixed32", "repeated": True},
        {"name": "n", "num": 2, "type": "int32"}]}
    # field 1 packed, claims 2 bytes; a fixed32 needs 4 -> would cross
    # into field 2's tag/value (10 05)
    evil = bytes([0x0A, 0x02, 0x01, 0x00, 0x10, 0x05])
    with pytest.raises(ValueError, match="overruns"):
        decode_message(evil, spec)


def test_wire_type_mismatch_fails_loud():
    """A KNOWN field number arriving with the wrong wire type (schema
    drift/corruption) must raise, not be mis-decoded — a
    length-delimited payload read as a varint yields a garbage number
    with no error (review r13)."""
    from hello_flink_spark.sources.proto_codec import decode_message

    spec = {"name": "M", "fields": [
        {"name": "n", "num": 1, "type": "int32"},
        {"name": "s", "num": 2, "type": "string"}]}
    # field 1 written as wt=2 (len 4, bytes 08 08 08 08), field 2 ok
    drifted = bytes([0x0A, 0x04, 0x08, 0x08, 0x08, 0x08, 0x12, 0x02]) + b"hi"
    with pytest.raises(ValueError, match="wire type"):
        decode_message(drifted, spec)


def test_named_type_reference_resolves_across_union_branches():
    """A named record defined inside a union branch and REFERENCED by a
    later field must resolve even when the defining branch is never
    taken by the data (a=null left R unregistered and the bare-name
    reference self-recursed to RecursionError — review r13). Unknown
    bare names now also fail loud instead of recursing."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    top = {"type": "record", "name": "Top", "fields": [
        {"name": "a", "type": ["null", {
            "type": "record", "name": "R",
            "fields": [{"name": "x", "type": "int"}]}]},
        {"name": "b", "type": "R"}]}
    v = {"a": None, "b": {"x": 7}}
    assert decode_value(encode_value(v, top), top) == v
    with pytest.raises(ValueError, match="unresolved"):
        encode_value({"q": 1}, {"type": "record", "name": "T",
                                "fields": [{"name": "q", "type": "Nope"}]})


def test_avro_null_namespace_ref_rejected_from_non_null_context():
    """An UNDOTTED reference inside a non-null namespace resolves ONLY
    to ``ns.name`` — there is no null-namespace fallback (advisor r14:
    the spec and Java Avro's parser reject these schemas, and accepting
    one embeds an unreadable-elsewhere writer schema in
    ``encode_container`` output). A null-namespace type's fullname is
    undotted, so it is unreachable from a non-null context; all three
    public surfaces (encode, decode, the Spark schema mapper) fail loud
    rather than guess. The same schema WITH a null reference context
    keeps working — the strictness cut exactly the invalid case."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value
    from hello_flink_spark.sources.formats import avro_schema_to_spark

    def top(mid_ns: str | None):
        mid = {"type": "record", "name": "Mid",
               "fields": [{"name": "w", "type": "Inner"}]}
        if mid_ns:
            mid["namespace"] = mid_ns
        return {"type": "record", "name": "Top", "fields": [
            {"name": "d", "type": {
                "type": "record", "name": "Inner",  # null namespace
                "fields": [{"name": "x", "type": "int"}]}},
            {"name": "r", "type": mid}]}

    v = {"d": {"x": 1}, "r": {"w": {"x": 2}}}
    bad = top("com.mid")
    with pytest.raises(ValueError, match="unresolved"):
        encode_value(v, bad)
    with pytest.raises(ValueError, match="unresolved|unknown"):
        # decode needs bytes; any payload works — resolution fails first
        decode_value(b"\x02\x02\x04", bad)
    with pytest.raises(ValueError, match="unknown Avro type"):
        avro_schema_to_spark(bad)
    good = top(None)  # null context: bare ref IS the fullname
    assert decode_value(encode_value(v, good), good) == v
    avro_schema_to_spark(good)

    # the UNION shape (review r15): an unresolvable reference BRANCH
    # must reject at encode even when the value taken is the null
    # branch — without the union-prologue guard every null row encoded
    # fine and the invalid schema rode into container output. (Decode
    # stays resolution-site-strict by design: reading a null union
    # index never touches the other branch, so only values that REACH
    # the bad reference raise — the encode-side guard is what keeps
    # such schemas out of container output in the first place.)
    def top_union(mid_ns):
        t = top(mid_ns)
        t["fields"][1]["type"]["fields"][0]["type"] = ["null", "Inner"]
        return t

    vu = {"d": {"x": 1}, "r": {"w": None}}
    with pytest.raises(ValueError, match="unresolved.*union"):
        encode_value(vu, top_union("com.mid"))
    with pytest.raises(ValueError, match="unknown Avro type"):
        avro_schema_to_spark(top_union("com.mid"))
    # the CONTAINER writer validates at SCHEMA level (review r15 second
    # pass): with ZERO records no per-value guard ever runs, yet the
    # schema is embedded as the file's writer schema — an empty Spark
    # partition writing its own container file is the production shape
    from hello_flink_spark.sources.avro_codec import encode_container

    with pytest.raises(ValueError, match="unresolved"):
        encode_container([], top_union("com.mid"))
    with pytest.raises(ValueError, match="unresolved"):
        encode_container([], bad)
    assert encode_container([], top_union(None))  # valid schema: fine
    gu = top_union(None)
    assert decode_value(encode_value(vu, gu), gu) == vu
    assert decode_value(
        encode_value({"d": {"x": 1}, "r": {"w": {"x": 5}}}, gu), gu
    ) == {"d": {"x": 1}, "r": {"w": {"x": 5}}}


def test_empty_container_rejects_mapping_wrapped_unresolved_ref():
    """The mapping-WRAPPED reference form ``{"type": "SomeName"}`` is
    accepted by _enc/_dec via the nested-schema tail call, so the
    schema-level walk behind ``encode_container`` must chase it too
    (advisor r15): with ZERO records no per-value guard runs, and
    before the fix ``encode_container([], ...)`` embedded the
    unresolvable writer schema while ``encode_value`` on the same
    schema raised. Valid-schema controls: a wrapped ref to a REAL
    definition still round-trips, and wrapped enum/fixed DEFINITIONS
    are not mistaken for references."""
    from hello_flink_spark.sources.avro_codec import (
        decode_value,
        encode_container,
        encode_value,
    )

    bad = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": {"type": "Nope"}}]}
    with pytest.raises(ValueError, match="unresolved"):
        encode_value({"f": 1}, bad)  # value path already rejected
    with pytest.raises(ValueError, match="unresolved"):
        encode_container([], bad)  # the r15 escape: now rejected too

    good = {"type": "record", "name": "Top", "fields": [
        {"name": "inner", "type": {"type": "record", "name": "Inner",
                                   "fields": [{"name": "x",
                                               "type": "long"}]}},
        {"name": "again", "type": {"type": "Inner"}}]}
    v = {"inner": {"x": 1}, "again": {"x": 2}}
    assert decode_value(encode_value(v, good), good) == v
    assert encode_container([], good)
    assert encode_container([v], good)

    # wrapped enum/fixed definitions must stay definitions, and an
    # undotted wrapped ref must resolve against the ENCLOSING namespace
    defs = {"type": "record", "name": "E", "namespace": "com.ns",
            "fields": [
                {"name": "c", "type": {"type": "enum", "name": "Color",
                                       "symbols": ["R", "G"]}},
                {"name": "fx", "type": {"type": "fixed", "name": "F4",
                                        "size": 4}},
                {"name": "c2", "type": {"type": "Color"}}]}
    assert encode_container([], defs)
    ve = {"c": "R", "fx": b"\x01\x02\x03\x04", "c2": "G"}
    assert decode_value(encode_value(ve, defs), defs) == ve


def test_decode_container_rejects_unresolved_refs_even_when_empty():
    """Decode-side twin of the r15/r16 encode escape (review r16): with
    ZERO records no per-value guard runs, so (a) a FOREIGN container
    whose embedded writer schema has a dangling reference decoded to a
    silently-bogus (schema, []) and (b) an unresolvable READER schema
    was handed back as the dataset's schema. Both now fail loud at
    file level; valid-schema controls round-trip."""
    import io
    import json as _json

    from hello_flink_spark.sources.avro_codec import (
        _META_SCHEMA,
        _enc,
        decode_container,
        encode_container,
    )

    good = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": "long"}]}
    bad_ref = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": "Nope"}]}
    bad_wrapped = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": {"type": "Nope"}}]}

    # (a) handcraft a foreign empty container embedding the invalid
    # writer schema (encode_container itself now refuses to write one):
    # magic, meta map with avro.schema/avro.codec, header sync, one
    # empty block (count 0, size 0), sync.
    def foreign_empty(writer_schema):
        out = io.BytesIO()
        out.write(b"Obj\x01")
        meta = {
            "avro.schema": _json.dumps(writer_schema).encode("utf-8"),
            "avro.codec": b"null",
        }
        _enc(out, meta, _META_SCHEMA, named={})
        sync = b"\x00" * 16
        out.write(sync)
        out.write(b"\x00\x00")  # varint 0 count, varint 0 size
        out.write(sync)
        return out.getvalue()

    assert decode_container(foreign_empty(good)) == (good, [])
    for bad in (bad_ref, bad_wrapped):
        with pytest.raises(ValueError, match="unresolved"):
            decode_container(foreign_empty(bad))

    # (b) reader-schema validation on an EMPTY container
    empty = encode_container([], good)
    reader_ok = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": "long"},
        {"name": "g", "type": "long", "default": 7}]}
    assert decode_container(empty, reader_schema=reader_ok) == (reader_ok, [])
    for bad in (bad_ref, bad_wrapped):
        with pytest.raises(ValueError, match="unresolved"):
            decode_container(empty, reader_schema=bad)

    # control: resolution over real records still works after the walk
    one = encode_container([{"f": 1}], good)
    schema, records = decode_container(one, reader_schema=reader_ok)
    assert (schema, records) == (reader_ok, [{"f": 1, "g": 7}])


def test_decode_value_rejects_unresolved_ref_in_untaken_reader_branch():
    """decode_value's reader path resolved only the union branch the
    value TAKES, so a dangling reference in the untaken branch rode
    along silently (review r16) — the decode-side mirror of the r15
    union-branch encode bypass. Now the reader schema is walked once up
    front; a valid nullable-union reader still resolves both ways."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    writer = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": ["null", "long"]}]}
    reader_bad = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": ["null", "long"]},
        {"name": "g", "type": ["null", "Nope"], "default": None}]}
    reader_ok = {"type": "record", "name": "Top", "fields": [
        {"name": "f", "type": ["null", "long"]},
        {"name": "g", "type": ["null", "long"], "default": None}]}

    blob = encode_value({"f": None}, writer)  # null branch: guards never
    # touch reader field g during resolution
    assert decode_value(blob, writer, reader_schema=reader_ok) == {
        "f": None, "g": None}
    with pytest.raises(ValueError, match="unresolved"):
        decode_value(blob, writer, reader_schema=reader_bad)


def test_avro_column_udfs_reject_unresolved_refs_at_construction(spark):
    """The four Avro COLUMN-UDF constructors validate named-type
    references when the UDF is built, not when a record first takes
    the broken branch (advisor r16). The encode side is the real
    escape (reproduced pre-fix): ``to_avro_col`` /
    ``to_avro_confluent_col`` never pass the schema through
    ``avro_schema_to_spark`` (their output is BinaryType), and the
    per-record union matcher resolves only the branches it inspects —
    a dangling reference NESTED inside an untaken branch's record (or
    any bad schema over a zero-row partition) encoded silently. The
    decode side (``from_avro_col``) is contract-pinning: the type
    mapper already walks and rejects today, but the guarantee now
    lives on the codec path itself. Valid wrapped-reference controls
    round-trip through both directions."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import (
        from_avro_col,
        to_avro_col,
        to_avro_confluent_col,
    )

    # the pre-fix encode escape shape: the union matcher sees the Inner
    # DEFINITION (resolvable as a branch) and never descends into its
    # dangling field when the value takes the null branch
    nested_bad = {"type": "record", "name": "N", "fields": [
        {"name": "x", "type": ["null", {"type": "record", "name": "Inner",
                                        "fields": [{"name": "y",
                                                    "type": "Nope"}]}]}]}
    df = spark.createDataFrame([(1,)], "v long")
    struct_col = F.struct(F.lit(None).cast("struct<y:long>").alias("x"))
    with pytest.raises(ValueError, match="unresolved"):
        df.select(to_avro_col(struct_col, json.dumps(nested_bad)))
    with pytest.raises(ValueError, match="unresolved"):
        df.select(to_avro_confluent_col(struct_col, json.dumps(nested_bad), 5))
    with pytest.raises(ValueError, match="unknown Avro type|unresolved"):
        df.select(from_avro_col(F.lit(b"\x00").cast("binary"),
                                json.dumps(nested_bad)))

    # valid control: a mapping-WRAPPED reference to a real definition
    # builds, encodes, and decodes back through the public columns
    good = {"type": "record", "name": "G", "fields": [
        {"name": "d", "type": {"type": "record", "name": "D2",
                               "fields": [{"name": "x", "type": "long"}]}},
        {"name": "a", "type": {"type": "D2"}}]}
    rec = F.struct(
        F.struct(F.col("v").alias("x")).alias("d"),
        F.struct((F.col("v") * 2).alias("x")).alias("a"),
    )
    src = spark.createDataFrame([(i,) for i in range(4)], "v long")
    enc = src.select(to_avro_col(rec, json.dumps(good)).alias("payload"))
    back = enc.select(from_avro_col(F.col("payload"), json.dumps(good)).alias("r"))
    got = sorted((r["r"]["d"]["x"], r["r"]["a"]["x"]) for r in back.collect())
    assert got == [(i, 2 * i) for i in range(4)]


def test_confluent_dangling_writer_ref_fails_at_first_sight(spark):
    """Writer schemas in the Confluent registry snapshot never pass
    through the type mapper (only the READER shapes the output
    column), and the decode UDF calls ``decode_value``/``resolve_value``
    with prebuilt registries — so before the r17 fix a writer schema
    whose untaken union branch held a dangling reference decoded its
    messages SILENTLY (reproduced). Now ``_w_reg`` validates each
    writer once at first sight on the wire; an id that never appears
    still doesn't abort the topic (the r14 lazy contract), and valid
    ids keep decoding."""
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.avro_codec import encode_value
    from hello_flink_spark.sources.formats import from_avro_confluent_col

    good = {"type": "record", "name": "D", "fields": [
        {"name": "f", "type": ["null", "long"]}]}
    bad_writer = {"type": "record", "name": "D", "fields": [
        {"name": "f", "type": ["null", "Nope"]}]}

    def frame(sid, body):
        return b"\x00" + sid.to_bytes(4, "big") + body

    null_body = encode_value({"f": None}, good)  # same bytes either
    # writer would claim for the null branch: union index 0
    on_wire = spark.createDataFrame(
        [(frame(9, null_body),)], "payload binary")
    with pytest.raises(Exception, match="unresolved"):
        on_wire.select(
            from_avro_confluent_col(F.col("payload"), good,
                                    {9: bad_writer}).alias("r")
        ).collect()

    # lazy contract: the SAME dangling-ref schema under an id that
    # never appears on the wire must not abort other ids' messages
    ok_wire = spark.createDataFrame(
        [(frame(1, encode_value({"f": i}, good)),) for i in range(3)],
        "payload binary")
    dec = ok_wire.select(
        from_avro_confluent_col(F.col("payload"), good,
                                {1: good, 9: bad_writer}).alias("r"))
    assert sorted(r["r"]["f"] for r in dec.collect()) == [0, 1, 2]


def test_duration_negative_fraction_same_sign():
    """protobuf Duration requires seconds and nanos to SHARE a sign;
    Python timedelta normalization (days=-1, microseconds=+999999)
    must not leak onto the wire as a mixed-sign pair (review r13)."""
    import datetime as dtm

    from hello_flink_spark.sources.proto_codec import decode_message, encode_message

    spec = {"name": "D", "fields": [{"name": "d", "num": 1,
                                     "type": "google.protobuf.Duration"}]}
    neg = dtm.timedelta(microseconds=-1)
    blob = encode_message({"d": neg}, spec)
    # crack the inner message open with a raw seconds/nanos spec
    inner_spec = {"name": "dur", "fields": [
        {"name": "seconds", "num": 1, "type": "int64"},
        {"name": "nanos", "num": 2, "type": "int32"}]}
    outer = {"name": "D", "fields": [{"name": "d", "num": 1, "type": "message",
                                      "message": inner_spec}]}
    inner = decode_message(blob, outer)["d"]
    assert inner == {"seconds": 0, "nanos": -1000}
    assert decode_message(blob, spec)["d"] == neg


def test_varint_past_64_bits_rejected_both_codecs():
    """A 10-byte varint whose 10th byte sets bits past 2^64 is a
    65-70-bit value no canonical writer emits; both codecs must reject
    it instead of returning a silently-wrong wide integer (review
    r13). The canonical 10-byte sign-extended form (10th byte 0x01)
    must still decode."""
    from hello_flink_spark.sources.avro_codec import read_long
    from hello_flink_spark.sources.proto_codec import read_varint

    evil = bytes([0xFF] * 9 + [0x7F])
    with pytest.raises(ValueError, match="64 bits"):
        read_long(evil, 0)
    with pytest.raises(ValueError, match="64 bits"):
        read_varint(evil, 0)
    legal = bytes([0xFF] * 9 + [0x01])  # two's-complement -1
    assert read_varint(legal, 0)[0] == (1 << 64) - 1
    assert read_long(legal, 0)[0] == -(1 << 63)  # zigzag of 2^64-1


def test_container_truncated_header_sync_fails_loud():
    """A container cut inside its 16-byte header sync marker read as
    ZERO records (unchecked slice + blind pos advance) — a corrupt
    file decoding to an empty dataset (review r13)."""
    from hello_flink_spark.sources.avro_codec import decode_container, encode_container

    blob = encode_container([{"a": 1, "b": "x", "c": None}], AVRO_SIMPLE)
    # find the header end: magic+meta+16-byte sync precede the first
    # block; truncate 8 bytes into the sync by cutting the whole file
    # to (its full length - block bytes - 8): easier — rebuild just the
    # header by encoding ZERO records (header + empty-ish) and cut 8.
    empty = encode_container([], AVRO_SIMPLE)
    # empty container = header + one (0, 0) block + sync; cut into the
    # HEADER sync: header ends 16+2+? ... simplest robust cut: strip
    # the trailing block (count 0 varint, size 0 varint, sync 16) and
    # then 8 more bytes, landing inside the header sync marker.
    truncated = empty[: len(empty) - (1 + 1 + 16) - 8]
    with pytest.raises(ValueError, match="Avro length|sync"):
        decode_container(truncated)
    assert decode_container(blob)[1] == [{"a": 1, "b": "x", "c": None}]


def test_int_accepted_for_float_double_union_branch():
    """_enc accepts a Python int for a bare double schema, so the union
    matcher must too (it raised 'no union branch for int' — review
    r13); int/long branches still win when present."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    assert encode_value(5, ["null", "double"]) == encode_value(5.0, ["null", "double"])
    assert decode_value(encode_value(5, ["null", "double"]), ["null", "double"]) == 5.0
    # exact pass still wins: int prefers the long branch in a mixed
    # union (complex unions decode to the memberN struct shape)
    assert decode_value(encode_value(5, ["long", "double"]), ["long", "double"]) == {
        "member0": 5, "member1": None
    }


def test_python_fallbacks_require_utc_session_for_instants(spark):
    """The pure-Python paths exchange timestamp INSTANTS as naive UTC
    datetimes; a non-UTC session tz would re-anchor them to local wall
    clock (silent shift vs the jar path — review r13). The fallback
    must fail loud on such sessions, and only when the schema actually
    carries an instant type."""
    import json

    from pyspark.sql import functions as F

    from hello_flink_spark.sources.formats import from_avro_col, to_protobuf_col

    ts_schema = json.dumps({"type": "record", "name": "T", "fields": [
        {"name": "at", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}}]})
    plain_schema = json.dumps({"type": "record", "name": "P", "fields": [
        {"name": "k", "type": "string"}]})
    ts_spec = {"name": "T", "fields": [
        {"name": "at", "num": 1, "type": "google.protobuf.Timestamp"}]}
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        with pytest.raises(NotImplementedError, match="timeZone"):
            from_avro_col(F.lit(b"").alias("x"), ts_schema)
        with pytest.raises(NotImplementedError, match="timeZone"):
            to_protobuf_col(F.struct(F.lit(1).alias("at")), "T", ts_spec)
        # instant-free schemas stay usable on any session tz
        from_avro_col(F.lit(b"").alias("x"), plain_schema)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


# --- advisor-r14 regression pins ----------------------------------------------


def test_avro_fullname_reference_resolves():
    """A namespaced definition must be referable by its FULLNAME
    ('com.x.R') as well as its bare name — registering only the bare
    name mislabelled valid Avro schemas as 'unresolved named-type
    reference' (advisor r14; before the r13 pre-walk this class hit
    RecursionError instead)."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    schema = {
        "type": "record",
        "name": "Top",
        "namespace": "com.x",
        "fields": [
            {"name": "first", "type": ["null", {
                "type": "record", "name": "R", "namespace": "com.x",
                "fields": [{"name": "v", "type": "long"}],
            }]},
            {"name": "second", "type": ["null", "com.x.R"]},
        ],
    }
    val = {"first": None, "second": {"v": 7}}
    # the defining branch is NOT exercised by the value (first=None), so
    # resolution must come from the pre-walk registration
    assert decode_value(encode_value(val, schema), schema) == val


def test_avro_alias_reference_resolves():
    """Aliases register alongside the name (qualified against the
    type's own namespace when unqualified), so a reference by alias
    resolves instead of raising (advisor r14)."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    schema = {
        "type": "record",
        "name": "Top",
        "fields": [
            {"name": "first", "type": {
                "type": "record", "name": "New", "aliases": ["Old"],
                "fields": [{"name": "v", "type": "long"}],
            }},
            {"name": "second", "type": "Old"},
        ],
    }
    val = {"first": {"v": 1}, "second": {"v": 2}}
    assert decode_value(encode_value(val, schema), schema) == val


def test_avro_enclosing_namespace_inherited():
    """A nested named type without its own namespace attribute inherits
    the ENCLOSING namespace (spec 'Names'), so its fullname is
    'com.x.Inner' and resolvable as such."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    schema = {
        "type": "record",
        "name": "Top",
        "namespace": "com.x",
        "fields": [
            {"name": "first", "type": {
                "type": "record", "name": "Inner",
                "fields": [{"name": "v", "type": "long"}],
            }},
            {"name": "second", "type": "com.x.Inner"},
        ],
    }
    val = {"first": {"v": 1}, "second": {"v": 2}}
    assert decode_value(encode_value(val, schema), schema) == val


def test_visible_files_matches_spark_file_index(spark, tmp_path):
    """_visible_files must equal the set a binaryFile DATA scan yields
    (advisor r14): '_'-names containing '=' are data, '*._COPYING_' is
    not, and '_metadata*' — though KEPT by the listing-level
    shouldFilterOutPathName — is re-excluded by isDataPath before the
    scan. Pinned directly against the live index, not a re-statement
    of the rule.

    Two deliberate layout exclusions: no _spark_metadata/ (a dir of
    that name flips Spark into reading the directory AS a streaming
    file-sink output — metadata log replaces the listing; pinned
    separately below), and no root-file + partition-dir mixing (Spark
    drops rootside files once a partition spec is inferred — a
    degenerate layout neither reader targets)."""
    import os

    from hello_flink_spark.sources.formats import _visible_files

    d = tmp_path / "flat_layout"
    d.mkdir()
    for n, b in [("plain", b"a"), ("_SUCCESS", b"b"), (".hidden", b"c"),
                 ("mid._COPYING_", b"d"), ("_metadata", b"e"),
                 ("_common_metadata.x", b"f"), ("_x=1", b"g"), ("zz.avro", b"h")]:
        (d / n).write_bytes(b)

    ours = {os.path.relpath(p, d) for p in _visible_files(str(d))}
    theirs = {
        os.path.basename(r["path"])
        for r in spark.read.format("binaryFile").load(str(d)).select("path").collect()
    }
    assert ours == theirs
    assert ours == {"plain", "_x=1", "zz.avro"}

    # partitioned layout: files under k=... dirs are data, hidden names
    # below a partition dir stay hidden
    p = tmp_path / "part_layout"
    (p / "k=1").mkdir(parents=True)
    (p / "k=2").mkdir()
    (p / "k=1" / "part-0").write_bytes(b"a")
    (p / "k=1" / "_hidden").write_bytes(b"b")
    (p / "k=2" / "part-0").write_bytes(b"c")
    ours_p = {os.path.relpath(x, p) for x in _visible_files(str(p))}
    theirs_p = {
        os.path.relpath(r["path"].removeprefix("file:"), str(p))
        for r in spark.read.format("binaryFile").load(str(p)).select("path").collect()
    }
    assert ours_p == theirs_p == {os.path.join("k=1", "part-0"),
                                  os.path.join("k=2", "part-0")}


def test_visible_files_skips_spark_metadata_dir(tmp_path):
    """The r13 guarantee stands: a streaming-sink commit log
    (_spark_metadata/0 — plain basename, hidden PARENT) never reaches
    schema inference. Unit-pinned because the live index can't see this
    layout at all: a _spark_metadata dir flips Spark into metadata-log
    listing for the whole directory."""
    from hello_flink_spark.sources.formats import _visible_files

    d = tmp_path / "sink_out"
    (d / "_spark_metadata").mkdir(parents=True)
    (d / "_spark_metadata" / "0").write_bytes(b"v1")
    (d / "part-0").write_bytes(b"a")
    import os

    assert [os.path.relpath(p, d) for p in _visible_files(str(d))] == ["part-0"]


def test_container_decompression_bomb_capped(monkeypatch):
    """A tiny deflate block claiming a huge expansion must fail at the
    STREAMING cap, never materialize the full output first — the r13
    count guard runs only after decompression (advisor r14)."""
    import io

    import hello_flink_spark.sources.avro_codec as ac

    good = ac.encode_container([{"a": 1, "b": "x", "c": None}], AVRO_SIMPLE)
    # a legit deflate block whose decompressed size exceeds a small cap
    rows = [{"a": i, "b": "y" * 100, "c": None} for i in range(200)]
    bomb = ac.encode_container(rows, AVRO_SIMPLE, codec="deflate")
    monkeypatch.setattr(ac, "BLOCK_DECOMPRESS_CAP", 4096)
    with pytest.raises(ValueError, match="decompresses past"):
        ac.decode_container(bomb)
    # under the cap the same codec path still round-trips
    small = ac.encode_container(rows[:5], AVRO_SIMPLE, codec="deflate")
    assert ac.decode_container(small)[1] == rows[:5]
    assert ac.decode_container(good)[1] == [{"a": 1, "b": "x", "c": None}]
    del io


def test_container_truncated_deflate_fails_loud():
    """The streaming decompressor must preserve the one-shot function's
    fail-loud contract on a truncated stream (partial output, no
    error, was the silent alternative)."""
    from hello_flink_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    rows = [{"a": i, "b": "z" * 50, "c": i} for i in range(50)]
    blob = encode_container(rows, AVRO_SIMPLE, codec="deflate")
    # chop bytes out of the middle of the compressed block body
    cut = blob[: len(blob) - 40] + blob[len(blob) - 16 :]
    with pytest.raises(ValueError):
        decode_container(cut)


# --- review-r14 regression pins (post-advisor full-diff review) ---------------


def test_avro_schema_to_spark_resolves_named_references():
    """The r14 codec fix must reach the PUBLIC read path: the schema
    mapper resolves named references (bare, fullname, alias) through
    the same registry the value codec uses, instead of demanding
    inline definitions (review r14 — from_avro_col/read_avro failed on
    exactly the schemas the codec fix legitimized)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = {
        "type": "record",
        "name": "Top",
        "namespace": "com.x",
        "fields": [
            {"name": "first", "type": {
                "type": "record", "name": "R", "aliases": ["Old"],
                "fields": [{"name": "v", "type": "long"}],
            }},
            {"name": "by_full", "type": "com.x.R"},
            {"name": "by_bare", "type": "R"},
            {"name": "by_alias", "type": "Old"},
        ],
    }
    inner = StructType([StructField("v", LongType(), nullable=False)])
    got = avro_schema_to_spark(schema)
    assert [f.dataType for f in got.fields] == [inner] * 4


def test_avro_named_reference_end_to_end_read(spark, tmp_path):
    """A container whose writer schema reuses a type BY REFERENCE (the
    layout Java-written Avro files commonly have) reads end-to-end."""
    from hello_flink_spark.sources.avro_codec import encode_container
    from hello_flink_spark.sources.formats import read_avro

    schema = {
        "type": "record",
        "name": "Pair",
        "namespace": "com.x",
        "fields": [
            {"name": "a", "type": {
                "type": "record", "name": "P", "namespace": "com.x",
                "fields": [{"name": "v", "type": "long"}],
            }},
            {"name": "b", "type": "com.x.P"},
        ],
    }
    d = tmp_path / "avro_named_ref"
    d.mkdir()
    rows = [{"a": {"v": i}, "b": {"v": i * 10}} for i in range(4)]
    (d / "part-0.avro").write_bytes(encode_container(rows, schema))
    got = sorted(
        (r["a"]["v"], r["b"]["v"]) for r in read_avro(spark, str(d)).collect()
    )
    assert got == [(i, i * 10) for i in range(4)]


def test_avro_ambiguous_bare_reference_fails_loud():
    """Two definitions in DIFFERENT explicit namespaces sharing a bare
    name: an undotted reference qualifies against the ENCLOSING
    definition's namespace (spec Names rules, implemented r14 third
    wave), so from null-namespace Top it reaches NEITHER — it must
    raise unresolved, never silently pick whichever registered first;
    the FULLNAME references stay valid."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    def schema(second_ref):
        return {
            "type": "record",
            "name": "Top",
            "fields": [
                {"name": "f1", "type": {
                    "type": "record", "name": "R", "namespace": "com.x",
                    "fields": [{"name": "a", "type": "long"}],
                }},
                {"name": "f2", "type": {
                    "type": "record", "name": "R", "namespace": "com.y",
                    "fields": [{"name": "b", "type": "string"}],
                }},
                {"name": "f3", "type": second_ref},
            ],
        }

    ok = schema("com.y.R")
    val = {"f1": {"a": 1}, "f2": {"b": "x"}, "f3": {"b": "y"}}
    assert decode_value(encode_value(val, ok), ok) == val
    with pytest.raises(ValueError, match="unresolved"):
        encode_value({"f1": {"a": 1}, "f2": {"b": "x"}, "f3": {"b": "y"}},
                     schema("R"))


def test_avro_bare_alias_resolves_in_namespaced_schema():
    """Aliases register bare AND qualified, like names — qualifying
    only made a bare alias reference fail in any namespaced schema
    while the analogous bare NAME worked (review r14)."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    schema = {
        "type": "record",
        "name": "Top",
        "namespace": "com.x",
        "fields": [
            {"name": "first", "type": {
                "type": "record", "name": "New", "aliases": ["Old"],
                "fields": [{"name": "v", "type": "long"}],
            }},
            {"name": "second", "type": "Old"},
            {"name": "third", "type": "com.x.Old"},
        ],
    }
    val = {"first": {"v": 1}, "second": {"v": 2}, "third": {"v": 3}}
    assert decode_value(encode_value(val, schema), schema) == val


def test_avro_recursion_via_reference_still_refused():
    """Reference-based recursion (Node -> Node) must still raise the
    recursive error, now detected by definition identity rather than
    name equality."""
    from hello_flink_spark.sources.formats import avro_schema_to_spark as a2s

    rec = {
        "type": "record",
        "name": "Node",
        "namespace": "com.x",
        "fields": [{"name": "next", "type": ["null", "com.x.Node"]}],
    }
    with pytest.raises(ValueError, match="recursive"):
        a2s(rec)


def test_container_deflate_trailing_garbage_fails_loud():
    """Trailing bytes after a complete deflate stream inside a block
    must raise like the bzip2/xz branches (and like the one-shot
    zlib.decompress) — the streaming decompressor left them silently
    in unused_data (review r14)."""
    import io
    import zlib

    from hello_flink_spark.sources.avro_codec import (
        decode_container,
        encode_value,
        write_long,
    )

    body = io.BytesIO()
    for i in range(3):
        body.write(encode_value({"a": i, "b": "x", "c": None}, AVRO_SIMPLE))
    raw = zlib.compress(body.getvalue())[2:-4] + b"JUNKJUNK"
    blob = io.BytesIO()
    blob.write(b"Obj\x01")
    meta = {"avro.schema": __import__("json").dumps(AVRO_SIMPLE).encode(),
            "avro.codec": b"deflate"}
    from hello_flink_spark.sources.avro_codec import _enc

    _enc(blob, meta, {"type": "map", "values": "bytes"}, named={})
    blob.write(b"\x00" * 16)
    write_long(blob, 3)
    write_long(blob, len(raw))
    blob.write(raw)
    blob.write(b"\x00" * 16)
    with pytest.raises(ValueError, match="trailing bytes after deflate"):
        decode_container(blob.getvalue())


def test_container_concatenated_bzip2_streams_decode():
    """A block body of CONCATENATED bzip2 streams (pbzip2-style output,
    valid input to the one-shot bz2.decompress this path replaced)
    must decode fully, not raise on the second stream (review r14)."""
    import bz2
    import io

    from hello_flink_spark.sources.avro_codec import (
        decode_container,
        encode_value,
        write_long,
    )

    half1, half2 = io.BytesIO(), io.BytesIO()
    rows = [{"a": i, "b": f"s{i}", "c": i} for i in range(6)]
    for r in rows[:3]:
        half1.write(encode_value(r, AVRO_SIMPLE))
    for r in rows[3:]:
        half2.write(encode_value(r, AVRO_SIMPLE))
    raw = bz2.compress(half1.getvalue()) + bz2.compress(half2.getvalue())
    blob = io.BytesIO()
    blob.write(b"Obj\x01")
    meta = {"avro.schema": __import__("json").dumps(AVRO_SIMPLE).encode(),
            "avro.codec": b"bzip2"}
    from hello_flink_spark.sources.avro_codec import _enc

    _enc(blob, meta, {"type": "map", "values": "bytes"}, named={})
    blob.write(b"\x00" * 16)
    write_long(blob, len(rows))
    write_long(blob, len(raw))
    blob.write(raw)
    blob.write(b"\x00" * 16)
    assert decode_container(blob.getvalue())[1] == rows


def test_visible_files_skips_plain_subdirs_like_the_scan(spark, tmp_path):
    """The batch index drops files under PLAIN-named subdirectories
    (no partition spec covers them) — _visible_files must too, or
    inference reads a file the scan never yields (review r14). Pinned
    against the live index."""
    import os

    from hello_flink_spark.sources.formats import _visible_files

    d = tmp_path / "plain_subdir_layout"
    (d / "ok").mkdir(parents=True)
    (d / "top").write_bytes(b"y")
    (d / "ok" / "part-0").write_bytes(b"x")
    ours = {os.path.relpath(p, d) for p in _visible_files(str(d))}
    theirs = {
        os.path.relpath(r["path"].removeprefix("file:"), str(d))
        for r in spark.read.format("binaryFile").load(str(d)).select("path").collect()
    }
    assert ours == theirs == {"top"}


def test_resolve_value_resolves_named_references():
    """Schema Resolution must resolve references on BOTH sides (review
    r14 second wave): ref-vs-ref matched as equal strings and skipped
    resolution (evolved defaults silently missing); ref-vs-inline
    spuriously failed. Both directions pinned, end-to-end through the
    container evolution read."""
    from hello_flink_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    writer = {
        "type": "record", "name": "Pair", "namespace": "com.x",
        "fields": [
            {"name": "a", "type": {
                "type": "record", "name": "P", "namespace": "com.x",
                "fields": [{"name": "v", "type": "long"}],
            }},
            {"name": "b", "type": "com.x.P"},
        ],
    }
    # reader evolves P with a defaulted field; field b REFERENCES it,
    # field a spells it inline — both must resolve
    evolved_p = {
        "type": "record", "name": "P", "namespace": "com.x",
        "fields": [{"name": "v", "type": "long"},
                   {"name": "w", "type": "long", "default": 9}],
    }
    reader = {
        "type": "record", "name": "Pair", "namespace": "com.x",
        "fields": [{"name": "a", "type": evolved_p},
                   {"name": "b", "type": "com.x.P"}],
    }
    blob = encode_container([{"a": {"v": 1}, "b": {"v": 2}}], writer)
    _, got = decode_container(blob, reader_schema=reader)
    assert got == [{"a": {"v": 1, "w": 9}, "b": {"v": 2, "w": 9}}]


def test_null_namespace_fullname_never_tombstoned():
    """A null-namespace definition's FULLNAME is its bare name. From a
    null-namespace context, an undotted reference 'R' must reach it —
    the earlier shorthand-key schemes variously tombstoned or displaced
    this binding (review r14 second/third waves); under the spec's
    Names rules it is simply the fullname lookup."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    schema = {
        "type": "record", "name": "Top",
        "fields": [
            {"name": "f1", "type": {
                # null-namespace R: its fullname IS "R"
                "type": "record", "name": "R",
                "fields": [{"name": "a", "type": "long"}],
            }},
            {"name": "f2", "type": {
                "type": "record", "name": "R", "namespace": "com.x",
                "fields": [{"name": "b", "type": "string"}],
            }},
            {"name": "f3", "type": "R"},        # fullname of the first
            {"name": "f4", "type": "com.x.R"},  # fullname of the second
        ],
    }
    val = {"f1": {"a": 1}, "f2": {"b": "x"}, "f3": {"a": 2}, "f4": {"b": "y"}}
    assert decode_value(encode_value(val, schema), schema) == val


def test_container_bzip2_xz_trailing_garbage_is_valueerror():
    """Trailing garbage after a complete bzip2/xz stream must raise the
    codec layer's ValueError trailing-bytes contract — not the raw
    OSError/LZMAError from the next header parse, and not a misleading
    'truncated' diagnosis for a short tail (review r14 second wave)."""
    import bz2
    import io
    import lzma

    from hello_flink_spark.sources.avro_codec import (
        _enc,
        decode_container,
        encode_value,
        write_long,
    )

    def container(codec, raw):
        blob = io.BytesIO()
        blob.write(b"Obj\x01")
        meta = {"avro.schema": __import__("json").dumps(AVRO_SIMPLE).encode(),
                "avro.codec": codec.encode()}
        _enc(blob, meta, {"type": "map", "values": "bytes"}, named={})
        blob.write(b"\x00" * 16)
        write_long(blob, 1)
        write_long(blob, len(raw))
        blob.write(raw)
        blob.write(b"\x00" * 16)
        return blob.getvalue()

    body = encode_value({"a": 1, "b": "x", "c": None}, AVRO_SIMPLE)
    for codec, compress in (("bzip2", bz2.compress),
                            ("xz", lambda b: lzma.compress(b, format=lzma.FORMAT_XZ))):
        for tail in (b"JUNK", b"JUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNK"):
            with pytest.raises(ValueError, match=f"trailing bytes after {codec}"):
                decode_container(container(codec, compress(body) + tail))


def test_bare_reference_resolves_namespace_relative():
    """The r14 third-wave repro: Top (namespace org.z) defines Inner
    twice — one inheriting org.z, one explicitly com.x — and a bare
    reference 'Inner'. Spec Names rules: the undotted reference
    qualifies against the ENCLOSING namespace, so it deterministically
    means org.z.Inner (the inherited one). The flat-shorthand registry
    either tombstoned this (fail on valid schema) or, after traversal
    re-registration, silently resolved it wrong."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    schema = {
        "type": "record",
        "name": "Top",
        "namespace": "org.z",
        "fields": [
            {"name": "f1", "type": {
                "type": "record", "name": "Inner",  # inherits org.z
                "fields": [{"name": "a", "type": "long"}],
            }},
            {"name": "f2", "type": {
                "type": "record", "name": "Inner", "namespace": "com.x",
                "fields": [{"name": "b", "type": "string"}],
            }},
            {"name": "f3", "type": "Inner"},      # = org.z.Inner
            {"name": "f4", "type": "com.x.Inner"},
        ],
    }
    val = {"f1": {"a": 1}, "f2": {"b": "x"}, "f3": {"a": 2}, "f4": {"b": "y"}}
    assert decode_value(encode_value(val, schema), schema) == val


def test_cross_namespace_reentry_uses_defining_namespace():
    """Review r14 fourth wave: a definition re-entered via a
    cross-namespace fullname reference must resolve ITS internal bare
    references in its DEFINING namespace, not the referencing one. Top
    (org.z) defines Leaf and Inner (both inheriting org.z; Inner
    references 'Leaf' bare); Mid (com.a) references 'org.z.Inner' — and
    a com.a.Leaf with a DIFFERENT shape exists, so resolving in the
    caller's namespace would not just fail but silently pick the wrong
    type. Pinned through the codec, the Spark mapper and schema
    resolution."""
    from pyspark.sql.types import StructType

    from hello_flink_spark.sources.avro_codec import (
        decode_value,
        encode_value,
        resolve_value,
    )

    schema = {
        "type": "record",
        "name": "Top",
        "namespace": "org.z",
        "fields": [
            {"name": "leaf0", "type": {
                "type": "record", "name": "Leaf",  # org.z.Leaf (inherited)
                "fields": [{"name": "y", "type": "long"}],
            }},
            {"name": "shadow", "type": {
                "type": "record", "name": "Leaf", "namespace": "com.a",
                "fields": [{"name": "z", "type": "string"}],  # different shape
            }},
            {"name": "inner0", "type": {
                "type": "record", "name": "Inner",  # org.z.Inner (inherited)
                "fields": [{"name": "l", "type": "Leaf"}],  # = org.z.Leaf
            }},
            {"name": "mid", "type": {
                "type": "record", "name": "Mid", "namespace": "com.a",
                "fields": [{"name": "w", "type": "org.z.Inner"}],
            }},
        ],
    }
    val = {
        "leaf0": {"y": 1},
        "shadow": {"z": "s"},
        "inner0": {"l": {"y": 2}},
        "mid": {"w": {"l": {"y": 3}}},  # re-entry: Inner's bare Leaf ref
    }
    assert decode_value(encode_value(val, schema), schema) == val
    spark_type = avro_schema_to_spark(schema)
    assert isinstance(spark_type, StructType)
    # mid.w.l must be the org.z.Leaf shape (long y), not com.a.Leaf
    assert spark_type["mid"].dataType["w"].dataType["l"].dataType.fieldNames() == ["y"]
    assert resolve_value(val, schema, schema) == val


def test_duplicate_fullname_fails_loud():
    """Two DISTINCT definitions claiming one fullname is invalid Avro —
    references through it must fail at registration, never silently
    resolve to whichever registered first (review r14 fourth wave)."""
    from hello_flink_spark.sources.avro_codec import encode_value

    schema = {
        "type": "record", "name": "Top", "namespace": "org.z",
        "fields": [
            {"name": "f1", "type": {
                "type": "record", "name": "R",
                "fields": [{"name": "a", "type": "long"}],
            }},
            {"name": "f2", "type": {
                "type": "record", "name": "R",
                "fields": [{"name": "b", "type": "string"}],
            }},
        ],
    }
    with pytest.raises(ValueError, match="duplicate Avro fullname"):
        encode_value({"f1": {"a": 1}, "f2": {"b": "x"}}, schema)


def test_alias_colliding_with_name_keeps_working():
    """Spec-legal schema: record B carries alias 'A' while a DISTINCT
    record is legitimately NAMED A in the same namespace (the standard
    renamed-type pattern next to its replacement). Registration must
    not raise duplicate-fullname (aliases are leniency, not name
    claims), and a reference 'A' resolves to the NAMED type whatever
    the definition order (review r14 fifth wave)."""
    from hello_flink_spark.sources.avro_codec import decode_value, encode_value

    def schema(order):
        b = {"type": "record", "name": "B", "aliases": ["A"],
             "fields": [{"name": "vb", "type": "long"}]}
        a = {"type": "record", "name": "A",
             "fields": [{"name": "va", "type": "string"}]}
        first, second = (b, a) if order == "alias_first" else (a, b)
        return {
            "type": "record", "name": "Top", "namespace": "org.z",
            "fields": [
                {"name": "f1", "type": first},
                {"name": "f2", "type": second},
                {"name": "f3", "type": "A"},  # the NAME wins
            ],
        }

    for order in ("alias_first", "name_first"):
        s = schema(order)
        val_f1 = {"vb": 1} if order == "alias_first" else {"va": "x"}
        val_f2 = {"va": "x"} if order == "alias_first" else {"vb": 1}
        val = {"f1": val_f1, "f2": val_f2, "f3": {"va": "y"}}
        assert decode_value(encode_value(val, s), s) == val, order


def test_confluent_bad_unused_schema_id_does_not_abort(spark):
    """A stale entry in the registry snapshot whose schema fails
    registration (duplicate fullname) must not abort decoding of
    messages that never reference that id — writer registries build
    lazily per schema id on first sight (review r14 fifth wave)."""
    from pyspark.sql import functions as F

    from hello_flink_spark.sources.avro_codec import encode_value
    from hello_flink_spark.sources.formats import from_avro_confluent_col

    good = {"type": "record", "name": "E",
            "fields": [{"name": "k", "type": "string"}]}
    bad = {"type": "record", "name": "T", "fields": [
        {"name": "f1", "type": {"type": "record", "name": "R",
                                "fields": [{"name": "a", "type": "long"}]}},
        {"name": "f2", "type": {"type": "record", "name": "R",
                                "fields": [{"name": "b", "type": "string"}]}},
    ]}
    rows = [
        (b"\x00" + (1).to_bytes(4, "big") + encode_value({"k": f"k{i}"}, good),)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "payload binary")
    dec = df.select(
        from_avro_confluent_col(F.col("payload"), good, {1: good, 7: bad}).alias("r")
    )
    assert sorted(r["r"]["k"] for r in dec.collect()) == [f"k{i}" for i in range(4)]
