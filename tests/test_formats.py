"""Avro / Protobuf format layer (sources/formats.py — VERDICT r10
"What's missing" #5): the schema-mapping rules are jar-independent and
fully unit-tested; the decode wrappers are jar-gated stubs exercised
for their honest-failure contract (same class as the Kafka stub)."""

from __future__ import annotations

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


def test_read_avro_gate_is_honest(spark, tmp_path):
    """In this sandbox the spark-avro module is absent (pyspark/jars
    holds avro-core only): the wrapper must raise NotImplementedError
    naming the artifact to ship — NOT a raw ClassNotFoundException.
    Where the jar IS present the same call must just work, so the test
    accepts a successful read of a real file too (self-adjusting, like
    the Kafka stub's contract)."""
    try:
        df = read_avro(spark, str(tmp_path / "nothing.avro"))
    except NotImplementedError as exc:
        assert "spark-avro" in str(exc)
    except Exception as exc:  # pragma: no cover — jar present, bad path
        raise AssertionError(f"gate leaked a raw error: {exc!r}") from exc
    else:  # pragma: no cover — jar present
        assert df is not None
