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


@register(
    "join_async_enrich",
    oracle=f"""
    SELECT event_id, user_id,
           CASE WHEN user_id % 97 = 0 THEN NULL
                ELSE ['bronze','silver','gold','platinum','diamond'][(user_id % 5) + 1]
           END AS profile_tier,
           CASE WHEN user_id % 97 = 0 THEN NULL
                ELSE ((user_id * 2654435761) % 1000000) / 1000000
           END AS profile_score,
           CAST(CASE WHEN user_id % 97 = 0 THEN NULL
                ELSE (user_id * 40503) % 100
           END AS BIGINT) AS profile_segment
    FROM events
    """,
)
def join_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] ``AsyncDataStream.unorderedWait`` (async I/O enrichment,
    VERDICT r09 "What's missing" #5) — each event enriched against an
    external profile service, mapped Spark-first as ``mapInPandas``
    with a batched client (``operators/async_enrich.py``): one client
    per task, per-Arrow-batch key coalescing, ``capacity``-chunked
    bulk requests, a retry loop for unanswered keys, typed-null
    fallback for permanent misses (Flink's timeout override).

    The service is the deterministic in-process fake (no network in
    the sandbox), so the driver hash gate pins the WHOLE operator
    surface: deleted users (uid % 97 == 0) must come back as typed
    nulls (fallback path), flaky users (uid % 7 == 3, missing on bulk
    attempt 1) must come back FULLY populated (retry path — a broken
    retry loop turns them null and the hash fails), and capacity=64
    forces multi-chunk bulk requests at every sf. Map-only: zero
    shuffles at any corpus scale; Spark cores × capacity bounds
    outstanding keys exactly like the Flink operator's capacity."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id")
    from hello_flink_spark.operators.async_enrich import enrich_with_service

    return enrich_with_service(e, "user_id", capacity=64)
