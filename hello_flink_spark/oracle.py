"""Local clone of the driver's correctness gate (SURVEY §5.1).

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, schema (column names sorted),
and an order-insensitive canonical value multiset.

The canonicalization here is deliberately STRICTER-or-equal to the
driver's (ADVICE.md r01: the round-1 local gate was laxer and shipped
3 red queries):

- both sides go through pandas (Spark ``toPandas``, DuckDB ``.df()``)
  so dtype-widening artifacts the driver sees (e.g. DuckDB HUGEINT
  SUM -> float64) show up locally too;
- floats compare on exact IEEE-754 bit patterns (no tolerance);
- ints and floats are type-tagged so ``8243 != 8243.0``;
- list/map/struct cells raise immediately (the driver's pandas
  canonicalizer dies on them with "unhashable type");
- NULL-bearing numeric columns are flagged (pandas silently widens
  int64-with-NaN to float64, another cross-engine hash hazard).
"""

from __future__ import annotations

import datetime as _dt
import math
import struct
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from hello_flink_spark.sources.readers import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(value):
    """Canonicalize one pandas cell; type-tagged so cross-type equality
    (int vs float, str vs bytes) can never hash-match."""
    if value is None:
        return None
    if isinstance(value, (bool, np.bool_)):
        return ("b", bool(value))
    if isinstance(value, (float, np.floating)):
        f = float(value)
        if math.isnan(f):
            return ("f", "NaN")
        return ("f", struct.pack("<d", f).hex())
    if isinstance(value, (int, np.integer)):
        return ("i", int(value))
    if isinstance(value, pd.Timestamp):
        if pd.isna(value):
            return None
        return ("t", value.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(value, _dt.datetime):
        return ("t", value.replace(tzinfo=None).isoformat())
    if isinstance(value, _dt.date):
        return ("d", value.isoformat())
    if isinstance(value, (bytes, bytearray)):
        return ("y", bytes(value))
    if isinstance(value, str):
        return ("s", value)
    if isinstance(value, (list, tuple, dict, np.ndarray)):
        raise TypeError(
            f"collection cell of type {type(value).__name__} in declared output — "
            "the driver's pandas canonicalizer rejects these; stringify "
            "(concat_ws / array_to_string) before declaring the column"
        )
    if pd.isna(value):  # pandas NaT and friends
        return None
    return ("s", str(value))


def _frame_canonical(df: pd.DataFrame):
    cols = sorted(df.columns.str.lower())
    df = df.rename(columns=str.lower)[cols]
    rows = [tuple(_canon(v) for v in rec) for rec in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return cols, rows


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
    spark_pd = spark_df.toPandas()
    duck_pd = con.execute(oracle_sql).df()

    s_cols_sorted = sorted(c.lower() for c in spark_pd.columns)
    d_cols_sorted = sorted(c.lower() for c in duck_pd.columns)
    if s_cols_sorted != d_cols_sorted:
        return CompareResult(
            name, False, f"schema mismatch: spark={s_cols_sorted} duck={d_cols_sorted}"
        )
    if len(spark_pd) != len(duck_pd):
        return CompareResult(
            name, False, f"row count mismatch: spark={len(spark_pd)} duck={len(duck_pd)}"
        )

    _, s_canon = _frame_canonical(spark_pd)
    _, d_canon = _frame_canonical(duck_pd)
    if s_canon != d_canon:
        diff_i = next(i for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b)
        return CompareResult(
            name,
            False,
            f"value mismatch at sorted-row {diff_i} (cols={s_cols_sorted}):\n"
            f"  spark={s_canon[diff_i]}\n  duck ={d_canon[diff_i]}",
        )
    return CompareResult(name, True, f"{len(spark_pd)} rows match")


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
