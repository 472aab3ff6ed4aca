"""Streaming time-window batch shadows — SURVEY §2.9 (+ the dedup/CEP
batch shadows of §2.10).

Spark's ``F.window``/``F.session_window`` work identically over batch
DataFrames, so every streaming window op gets an oracle-checkable
batch shadow here; the streaming twins (same grouping over a
file-replayed stream with watermarks) live in
``hello_flink_spark/streaming/jobs.py`` and are golden-tested in
``tests/test_streaming.py``.

Oracle-side window starts are computed with pure ``epoch_us``
arithmetic (no ``time_bucket``/``to_timestamp``), which sidesteps
DuckDB's TIMESTAMPTZ session-timezone coercions entirely — both
engines bucket the same integer microseconds.

[F] Flink `TumblingEventTimeWindows` / `SlidingEventTimeWindows` /
`EventTimeSessionWindows` / `CUMULATE` TVF / `countWindow` — empty
reference checkout (SURVEY §0); anchors are SURVEY.md §2.9–2.10 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


@register(
    "window_tumbling",
    oracle="""
    SELECT ts - to_microseconds(epoch_us(ts) % 600000000) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] TumblingEventTimeWindows.of(10 min) / SQL TUMBLE — batch shadow.

    Streaming twin: streaming/jobs.py::tumbling_counts (same grouping +
    watermark, append mode).
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value"
        )
    )


@register(
    "window_sliding",
    oracle="""
    WITH hop AS (
      SELECT ts - to_microseconds(epoch_us(ts) % 300000000) AS wstart, event_type, value
      FROM events
      UNION ALL
      SELECT ts - to_microseconds(epoch_us(ts) % 300000000) - INTERVAL 5 MINUTE,
             event_type, value
      FROM events
    )
    SELECT wstart AS window_start, event_type,
           COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total_value
    FROM hop
    GROUP BY wstart, event_type
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SlidingEventTimeWindows.of(10 min, 5 min) / SQL HOP — batch
    shadow. Each event lands in exactly size/slide = 2 windows; the
    oracle materializes both hops per event and re-groups."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value"
        )
    )


@register(
    "window_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessioned AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total_value
    FROM sessioned
    GROUP BY user_id, sid
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] EventTimeSessionWindows.withGap(30 min) / SQL SESSION — batch
    shadow of session_window. The oracle rebuilds sessions with the
    classic gaps-and-islands (lag + cumulative flag); Spark starts a
    new session when the gap is >= the timeout, mirrored in the flag.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "cnt", "total_value"
        )
    )


@register(
    "window_cumulate",
    oracle="""
    SELECT ts - to_microseconds(epoch_us(ts) % 3600000000)
             + to_microseconds(k * 900000000) AS window_end,
           event_type, COUNT(*) AS cnt
    FROM events,
         UNNEST(generate_series(
             CAST((epoch_us(ts) % 3600000000) // 900000000 AS BIGINT) + 1, 4)) AS u(k)
    GROUP BY window_end, event_type
    """,
)
def window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL CUMULATE TVF (span 1 h, step 15 min) — no native
    Spark equivalent: an event at offset o in its hour belongs to every
    expanding window [hour, hour + k*15min) with k*15min > o, built by
    exploding the k range. Fully epoch-based, so timezone-independent.

    Streaming twin: streaming/jobs.py::cumulate_counts (same expansion
    + 15-min tumbling agg over a synthetic step timestamp).
    """
    e = t(spark, sf_dir, "events")
    ep = F.col("ts").cast("long")  # epoch seconds (truncation == floor for 2024 data)
    hour_start = ep - (ep % 3600)
    first_k = ((ep % 3600) / 900).cast("long") + 1
    return (
        e.withColumn("k", F.explode(F.sequence(first_k, F.lit(4))))
        .withColumn("window_end", F.timestamp_seconds(hour_start + F.col("k") * 900))
        .groupBy("window_end", "event_type")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "window_count",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, CAST((rn - 1) // 5 AS BIGINT) AS chunk,
           COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, chunk
    """,
)
def window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] countWindow(5) — count-based windows have no Structured
    Streaming native; batch shadow buckets each user's event sequence
    into chunks of 5 via a partitioned row_number (trailing partial
    chunk kept, mirroring Flink's final partial window on EOF). The
    streaming twin (stateful counter) is streaming/jobs.py."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("chunk", ((F.col("rn") - 1) / 5).cast("long"))
        .groupBy("user_id", "chunk")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "window_session_dynamic",
    oracle="""
    WITH base AS (
      SELECT user_id, ts,
             ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
                       ELSE INTERVAL 30 MINUTE END AS reach
      FROM events
    ), flagged AS (
      SELECT user_id, ts, reach,
             CASE WHEN MAX(reach) OVER wprev IS NULL
                  OR ts >= MAX(reach) OVER wprev
                  THEN 1 ELSE 0 END AS new_s
      FROM base
      WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, reach
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sessioned AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, reach
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt
    FROM sessioned GROUP BY user_id, sid
    """,
)
def window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] dynamic session gap (SessionWindowTimeGapExtractor): the gap
    depends on the event — 60 min after a purchase, 30 min otherwise.
    Spark expresses this natively: session_window accepts a COLUMN gap
    expression evaluated per event, merging each event's [ts, ts+gap)
    interval into sessions. The oracle mirrors the UNION-of-intervals
    semantics (session end = running max of ts+gap — a long-gap event
    bridges over a short-gap successor; plain chain-adjacent
    gaps-and-islands would split 2 sessions differently on this
    fixture)."""
    e = t(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "60 minutes").otherwise("30 minutes")
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("user_id", F.col("w.start").alias("session_start"), "cnt")
    )


@register(
    "window_global_trigger_batch",
    oracle="""
    WITH numbered AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_total
      FROM events
    )
    SELECT user_id, CAST(rn AS BIGINT) AS fire_at,
           ROUND(run_total, 2) AS total_value
    FROM numbered WHERE rn % 5 = 0
    """,
)
def window_global_trigger_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] GlobalWindows + CountTrigger.of(5) — batch shadow: the
    running per-user aggregate sampled at every 5th event, exactly the
    rows the count trigger would have fired. Streaming twin:
    streaming/stateful.py::global_count_trigger_stream (golden-tested).
    Closes SURVEY §2.9's last row (previously out of scope; the
    processing-time trigger half remains query-level
    Trigger.ProcessingTime, SEMANTICS §3)."""
    from hello_flink_spark.streaming.stateful import GLOBAL_TRIGGER_EVERY

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("run_total", running)
        .filter(F.col("rn") % GLOBAL_TRIGGER_EVERY == 0)
        .select(
            "user_id",
            F.col("rn").cast("long").alias("fire_at"),
            F.round("run_total", 2).alias("total_value"),
        )
    )


@register(
    "dedup_stream_batch",
    oracle="""
    SELECT user_id, event_type, event_id, ts
    FROM (SELECT user_id, event_type, event_id, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def dedup_stream_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL deduplication (ROW_NUMBER()=1 over proctime/rowtime)
    — batch shadow: first event per (user, type). Streaming twin:
    dropDuplicatesWithinWatermark in streaming/jobs.py."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@register(
    "cep_pattern_batch",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           MIN(p.ts) AS first_purchase_ts
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    GROUP BY c.user_id, c.event_id, c.ts
    """,
)
def cep_pattern_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink CEP `A followedBy B within(t)` — batch shadow: each
    click matched to its earliest purchase within 30 min. Equi-key
    (user_id) + residual time band → shuffle-hash join, linear per key;
    the streaming NFA twin is streaming/jobs.py::cep_click_purchase."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts > clicks.click_ts)
        & (purchases.p_ts <= clicks.click_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        clicks.join(purchases, cond)
        .groupBy("user_id", "click_id", "click_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )


@register(
    "cep3_pattern_batch",
    oracle="""
    WITH vc AS (
        SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
               MIN(c.ts) AS click_ts
        FROM events v
        JOIN events c
          ON c.user_id = v.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 4 HOUR
        GROUP BY v.user_id, v.event_id, v.ts
    )
    SELECT vc.user_id, vc.view_id, vc.view_ts, vc.click_ts,
           MIN(p.ts) AS purchase_ts
    FROM vc
    JOIN events p
      ON p.user_id = vc.user_id AND p.event_type = 'purchase'
     AND p.ts > vc.click_ts AND p.ts <= vc.click_ts + INTERVAL 4 HOUR
    GROUP BY vc.user_id, vc.view_id, vc.view_ts, vc.click_ts
    """,
)
def cep3_pattern_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink CEP 3-step `A followedBy B followedBy C within(t)` —
    batch shadow: each view matched to its first click within 4 h,
    that pair matched to the click's first purchase within 4 h.
    Two equi-key joins + min-aggregations — shuffle on user_id reused,
    linear per key; the streaming NFA twin is
    streaming/stateful.py::cep3_view_click_purchase."""
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts")
    )
    vc = (
        views.join(
            clicks,
            (views.user_id == clicks.c_user_id)
            & (clicks.c_ts > views.view_ts)
            & (clicks.c_ts <= views.view_ts + F.expr("INTERVAL 4 HOURS")),
        )
        .groupBy("user_id", "view_id", "view_ts")
        .agg(F.min("c_ts").alias("click_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    return (
        vc.join(
            purchases,
            (vc.user_id == purchases.p_user_id)
            & (purchases.p_ts > vc.click_ts)
            & (purchases.p_ts <= vc.click_ts + F.expr("INTERVAL 4 HOURS")),
        )
        .groupBy("user_id", "view_id", "view_ts", "click_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )


@register(
    "window_tumbling_offset",
    oracle="""
    SELECT ts - to_microseconds((epoch_us(ts) - 300000000) % 600000000)
             + INTERVAL 10 MINUTE AS window_end,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1
    """,
)
def window_tumbling_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] TumblingEventTimeWindows.of(size, offset) — offset-aligned
    tumbling windows (the mechanism behind timezone-aligned daily
    windows: a +5-min offset here stands in for a +8h TZ shift). The
    oracle shifts epoch arithmetic by the offset; Spark's window()
    takes it natively as startTime."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.end").alias("window_end"), "cnt")
    )
