"""Local clone of the driver's correctness gate (SURVEY §5.1).

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, schema (column names sorted),
and an order-insensitive canonical value multiset. Used by pytest so
we catch oracle mismatches before the driver does.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from hello_flink_spark.sources.readers import TABLES

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-6


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(value):
    """Canonicalize one cell so Spark and DuckDB values compare equal."""
    if value is None:
        return None
    if isinstance(value, bool):
        return bool(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # round-trip through a fixed decimal print; queries are expected
        # to ROUND, this only absorbs representation noise.
        return f"{value:.6f}"
    if isinstance(value, int):
        return int(value)
    if isinstance(value, _dt.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, _dt.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, _canon(v)) for k, v in value.items()))
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    return str(value)


def _rows_canonical(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_canon(row[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [columns[i] for i in order], out


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str

    def __bool__(self) -> bool:
        return self.ok


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    duck = con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        return CompareResult(name, False, f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        return CompareResult(name, False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")

    _, s_canon = _rows_canonical([c.lower() for c in spark_cols], spark_rows)
    _, d_canon = _rows_canonical([c.lower() for c in duck_cols], duck_rows)
    if s_canon != d_canon:
        diff_i = next(i for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b)
        return CompareResult(
            name,
            False,
            f"value mismatch at sorted-row {diff_i}:\n  spark={s_canon[diff_i]}\n  duck ={d_canon[diff_i]}",
        )
    return CompareResult(name, True, f"{len(spark_rows)} rows match")


def run_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from hello_flink_spark.registry import all_specs

    con = duck_connection(sf_dir)
    results = []
    for qname, spec in sorted(all_specs().items()):
        if names and qname not in names:
            continue
        if spec.oracle is None:
            continue
        try:
            results.append(compare(qname, spec.fn(spark, sf_dir), spec.oracle, con))
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            results.append(CompareResult(qname, False, f"EXCEPTION: {exc}"))
    return results
