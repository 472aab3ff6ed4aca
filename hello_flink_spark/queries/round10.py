"""Round-10 declared queries.

VERDICT r09 "Next round" deliveries that add NEW driver-gated rows:

- ``window_cumulate_batch`` (#5): the streaming CUMULATE
  construction's batch shadow, hash-verified — upgrades the cumulate
  story's S-tier plan to oracle-checked evidence.
- CEP composition goldens live in tests (property-suite-first, §3/#4);
  compositions that are batch-expressible get declared rows here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


@register(
    "window_cumulate_batch",
    oracle="""
    SELECT ts - to_microseconds(epoch_us(ts) % 3600000000)
             + to_microseconds(k * 900000000) AS window_end,
           event_type, COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS total_value
    FROM events,
         UNNEST(generate_series(
             CAST((epoch_us(ts) % 3600000000) // 900000000 AS BIGINT) + 1, 4)) AS u(k)
    GROUP BY window_end, event_type
    """,
)
def window_cumulate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL CUMULATE TVF (span 1 h, step 15 min) — the batch
    shadow of the STREAMING construction (VERDICT r09 #5), hash-
    verified: ``streaming/jobs.py::cumulate_counts`` explodes each
    event statelessly into its expanding windows with a synthetic
    ``step_ts`` one second before each window's end, then runs a
    plain NATIVE 15-minute tumbling aggregation whose ``w.end`` IS
    the cumulate window_end. This query runs that exact plan (explode
    → ``F.window`` tumble → agg) in batch and the DuckDB oracle
    recomputes the expanding-window membership arithmetically — so
    the synthetic-timestamp trick itself (not just the simpler
    explode-groupBy of ``window_cumulate``) is pinned by the driver
    hash gate, and the streaming twin's goldens inherit an
    oracle-checked reference.

    Scale shape: the ≤4× row expansion happens map-side before the
    single (window, event_type) shuffle, where partial aggregation
    absorbs it — state and shuffle bytes are per-open-window
    aggregates, identical to a plain tumbling count."""
    e = t(spark, sf_dir, "events")
    ep = F.col("ts").cast("long")  # epoch seconds (floor for 2024 data)
    hour_start = ep - (ep % 3600)
    first_k = ((ep % 3600) / 900).cast("long") + 1
    return (
        e.withColumn("k", F.explode(F.sequence(first_k, F.lit(4))))
        .withColumn(
            "step_ts", F.timestamp_seconds(hour_start + F.col("k") * 900 - 1)
        )
        .groupBy(F.window("step_ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.end").alias("window_end"), "event_type", "cnt", "total_value")
    )
