"""Declared queries (SURVEY §2) — one module per operator family.

Each module registers ``(spark, sf_dir) -> DataFrame`` callables plus
DuckDB oracle SQL via :func:`hello_flink_spark.registry.register`.
"""
