"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`hello_flink_spark` — the declared-query registry
(``hello_flink_spark/queries/*``) carries one entry per implemented
operator from SURVEY.md §2, each paired with DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from hello_flink_spark.registry import get_spec

    return get_spec("flagship_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hello_flink_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every oracle-expressible query."""
    from hello_flink_spark.registry import all_oracles

    return all_oracles()
