"""Declared-query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 that is oracle-expressible ("O" rows)
registers here with BOTH a Spark callable ``(spark, sf_dir) ->
DataFrame`` and the equivalent DuckDB ANSI-SQL string. Rows-only ops
("R" rows) register with ``oracle=None``. Streaming-only ops ("S")
are covered by pytest golden tests, not this registry.

The driver's correctness gate sorts result columns by name and
hash-compares values, so every computed column MUST carry the same
alias in the Spark plan and the oracle SQL (SURVEY §5.1).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register declared queries on import.
_QUERY_MODULES = [
    "hello_flink_spark.queries.relational",
    "hello_flink_spark.queries.functions",
    "hello_flink_spark.queries.analytic",
    "hello_flink_spark.queries.timewindows",
    "hello_flink_spark.queries.udfs",
    "hello_flink_spark.queries.llm",
    "hello_flink_spark.queries.sources",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a declared query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
