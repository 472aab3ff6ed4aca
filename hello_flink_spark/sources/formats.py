"""Avro / Protobuf format layer (VERDICT r10 "What's missing" #5).

[F] Flink's ``avro`` / ``avro-confluent`` / ``protobuf`` formats decode
those encodings into table rows. Spark's equivalents are the
``spark-avro`` and ``spark-protobuf`` external modules (``from_avro`` /
``from_protobuf`` column functions and the ``avro`` DataSource) — both
CONNECTOR JARS that are not bundled with pip pyspark and are absent in
this sandbox (verified: ``pyspark/jars`` holds avro-core only, no
``spark-avro_*`` / ``spark-protobuf_*``). Same environment-blocked
class as the Kafka connector (streaming/jobs.py::kafka_source_stub),
handled the same honest way:

- The SCHEMA-MAPPING layer — the part that carries real design
  content and needs no JVM class — is implemented and unit-tested
  here: Avro JSON schemas and protobuf message specs map to Spark
  ``StructType`` following the documented SchemaConverters /
  SchemaConvertersSuite rules of the two modules, so a real
  deployment's DDL is already right.
- The DECODE step is a thin, jar-gated wrapper that raises
  ``NotImplementedError`` with the exact artifact to ship when the
  module is absent, and works unchanged when it is present.

Mapping rules implemented (public spark-avro / spark-protobuf docs):

Avro: null/boolean/int/long/float/double/bytes/string → the obvious
Spark primitives; ``record`` → struct; ``array`` → array; ``map`` →
map (string keys, per Avro); ``enum`` → string; ``fixed`` → binary;
union ``[null, X]`` (either order) → nullable X; union of N non-null
branches → ``struct<member0, …, memberN-1>`` (each nullable — the
spark-avro complex-union representation); logical types ``decimal``
(on bytes/fixed) → decimal(precision, scale), ``date`` → date,
``timestamp-millis/micros`` → timestamp, ``local-timestamp-millis/
micros`` → timestamp_ntz, ``time-millis/micros`` → long (spark-avro
has no TimeType), ``uuid`` → string. Recursive record references are
REFUSED (spark-avro raises on recursion; relational schemas cannot
express them).

Protobuf: double/float → double/float; int32/sint32/sfixed32 → int;
int64/sint64/sfixed64/fixed32 → long; uint32 → long; uint64/fixed64 →
decimal(20, 0) (unsigned 64-bit exceeds signed long); bool → boolean;
string → string; bytes → binary; enum → string; message → struct
(nullable — proto3 message fields carry presence); ``repeated T`` →
array<T>; ``map<K, V>`` → map<K, V>; ``google.protobuf.Timestamp`` →
timestamp and ``google.protobuf.Duration`` → day-time interval, the
two well-known types spark-protobuf special-cases.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    NullType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_AVRO_PRIMITIVES: dict[str, DataType] = {
    "null": NullType(),
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}

_AVRO_LOGICAL: dict[tuple[str, str], DataType] = {
    ("int", "date"): DateType(),
    ("long", "timestamp-millis"): TimestampType(),
    ("long", "timestamp-micros"): TimestampType(),
    ("long", "local-timestamp-millis"): TimestampNTZType(),
    ("long", "local-timestamp-micros"): TimestampNTZType(),
    # spark-avro has no TimeType: time-of-day stays the carrier type
    ("int", "time-millis"): IntegerType(),
    ("long", "time-micros"): LongType(),
    ("string", "uuid"): StringType(),
}


def avro_schema_to_spark(schema: str | Mapping[str, Any] | list) -> DataType:
    """Map an Avro schema (JSON string or parsed) to a Spark DataType.

    Follows spark-avro's ``SchemaConverters.toSqlType`` rules (module
    docstring). Raises ``ValueError`` on recursive record references
    and unknown types — fail loud, never guess."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _avro_type(schema, seen=frozenset())


def _avro_type(s: Any, seen: frozenset[str]) -> DataType:
    if isinstance(s, str):
        if s in _AVRO_PRIMITIVES:
            return _AVRO_PRIMITIVES[s]
        if s in seen:
            raise ValueError(
                f"recursive Avro record reference {s!r}: relational "
                "schemas cannot express recursion (spark-avro refuses too)"
            )
        raise ValueError(f"unknown Avro type {s!r} (named-type references "
                         "require inline definitions in this mapper)")
    if isinstance(s, list):  # union
        branches = [b for b in s if b != "null"]
        nullable = len(branches) != len(s)
        if not branches:
            return NullType()
        if len(branches) == 1:
            return _avro_type(branches[0], seen)
        # complex union → struct<member0, …> (spark-avro representation);
        # nullability of the members is inherent (one branch set at a time)
        del nullable
        return StructType(
            [
                StructField(f"member{i}", _avro_type(b, seen), nullable=True)
                for i, b in enumerate(branches)
            ]
        )
    if not isinstance(s, Mapping):
        raise ValueError(f"malformed Avro schema node: {s!r}")
    t = s["type"]
    logical = s.get("logicalType")
    if logical:
        if logical == "decimal":
            if t not in ("bytes", "fixed"):
                raise ValueError("Avro decimal logical type requires bytes/fixed")
            return DecimalType(int(s["precision"]), int(s.get("scale", 0)))
        key = (t if isinstance(t, str) else "", logical)
        if key in _AVRO_LOGICAL:
            return _AVRO_LOGICAL[key]
        # unknown logical type: per Avro spec, fall through to carrier
    if t == "record":
        name = s.get("name", "")
        inner = seen | ({name} if name else frozenset())
        fields = []
        for f in s["fields"]:
            ftype = _avro_type(f["type"], inner)
            nullable = _avro_nullable(f["type"])
            fields.append(StructField(f["name"], ftype, nullable=nullable))
        return StructType(fields)
    if t == "array":
        item = _avro_type(s["items"], seen)
        return ArrayType(item, containsNull=_avro_nullable(s["items"]))
    if t == "map":
        val = _avro_type(s["values"], seen)
        return MapType(StringType(), val, valueContainsNull=_avro_nullable(s["values"]))
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    # {"type": "string"} style wrapping of a primitive / nested schema
    return _avro_type(t, seen)


def _avro_nullable(s: Any) -> bool:
    return isinstance(s, list) and "null" in s


# --- protobuf ---------------------------------------------------------------

_PROTO_SCALARS: dict[str, DataType] = {
    "double": DoubleType(),
    "float": FloatType(),
    "int32": IntegerType(),
    "sint32": IntegerType(),
    "sfixed32": IntegerType(),
    "int64": LongType(),
    "sint64": LongType(),
    "sfixed64": LongType(),
    "fixed32": LongType(),  # unsigned 32-bit needs the wider carrier
    "uint32": LongType(),
    "uint64": DecimalType(20, 0),  # unsigned 64-bit exceeds signed long
    "fixed64": DecimalType(20, 0),
    "bool": BooleanType(),
    "string": StringType(),
    "bytes": BinaryType(),
}

_PROTO_WELL_KNOWN: dict[str, DataType] = {
    "google.protobuf.Timestamp": TimestampType(),
    "google.protobuf.Duration": DayTimeIntervalType(),
}


def proto_message_to_spark(message: Mapping[str, Any]) -> StructType:
    """Map a protobuf message spec to a Spark StructType.

    ``message`` is the descriptor-shaped dict this layer defines (no
    compiled FileDescriptorSet in a sandbox without protoc):
    ``{"name": ..., "fields": [{"name", "type", "repeated"?: bool,
    "map_key"?: scalar, "message"?: nested-spec}, ...]}``. ``type``
    is a scalar name, "enum", "message" (with the nested spec), or a
    well-known type name. Follows spark-protobuf's documented
    ``SchemaConverters`` rules (module docstring)."""
    fields = []
    for f in message["fields"]:
        fields.append(
            StructField(f["name"], _proto_field_type(f), nullable=True)
        )
    return StructType(fields)


def _proto_field_type(f: Mapping[str, Any]) -> DataType:
    if "map_key" in f:
        key = _PROTO_SCALARS[f["map_key"]]
        val = _proto_field_type({k: v for k, v in f.items() if k != "map_key"})
        return MapType(key, val, valueContainsNull=True)
    t = f["type"]
    base: DataType
    if t in _PROTO_SCALARS:
        base = _PROTO_SCALARS[t]
    elif t in _PROTO_WELL_KNOWN:
        base = _PROTO_WELL_KNOWN[t]
    elif t == "enum":
        base = StringType()
    elif t == "message":
        base = proto_message_to_spark(f["message"])
    else:
        raise ValueError(f"unknown protobuf field type {t!r}")
    if f.get("repeated"):
        return ArrayType(base, containsNull=False)
    return base


# --- jar-gated decode wrappers ----------------------------------------------


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """[F] ``format = 'avro'`` file source. Jar-gated like
    kafka_source_stub: builds the canonical reader and raises with the
    exact artifact to ship if the spark-avro module is absent."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # noqa: BLE001 — datasource class absent
        raise NotImplementedError(
            "spark-avro module not available in this environment; ship "
            "org.apache.spark:spark-avro_2.13 with the real deployment "
            "(schema mapping above is jar-independent and already tested)"
        ) from exc


def from_avro_col(data_col, json_schema: str):
    """[F] ``avro`` value format on a stream (e.g. Kafka values):
    ``from_avro(col, schema)``. Jar-gated; the returned Column is
    usable unchanged where spark-avro ships."""
    try:
        from pyspark.sql.avro.functions import from_avro

        return from_avro(data_col, json_schema)
    except Exception as exc:  # noqa: BLE001 — module/jar absent
        raise NotImplementedError(
            "spark-avro module not available in this environment; ship "
            "org.apache.spark:spark-avro_2.13 with the real deployment"
        ) from exc


def from_protobuf_col(data_col, message_name: str, desc_file_path: str):
    """[F] ``protobuf`` value format: ``from_protobuf(col, messageName,
    descFilePath)``. Jar-gated; needs a protoc-compiled descriptor set
    at deploy time (no protoc in the sandbox — the schema layer above
    is the tested part)."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        return from_protobuf(data_col, message_name, descFilePath=desc_file_path)
    except Exception as exc:  # noqa: BLE001 — module/jar absent
        raise NotImplementedError(
            "spark-protobuf module not available in this environment; ship "
            "org.apache.spark:spark-protobuf_2.13 with the real deployment"
        ) from exc
