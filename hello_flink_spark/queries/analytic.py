"""OVER-window analytic functions — SURVEY §2.5.

[F] Flink SQL OVER aggregations and the canonical Top-N pattern
(`ROW_NUMBER() ... WHERE rn <= N`) — the reference checkout is empty
(SURVEY §0); anchors are SURVEY.md §2.5 rows.

Design rules (VERDICT r01):

- every per-row window is PARTITIONED (no global ORDER BY windows —
  an unpartitioned window funnels every row through one WindowExec
  task, the classic single-partition choke at scale);
- ORDER BY keys end in a unique column wherever ROW_NUMBER needs
  determinism; RANK/DENSE_RANK/PERCENT_RANK order by columns whose
  values are bit-identical across engines, so ties resolve the same;
- rank-family outputs are cast to long (Spark emits INT, DuckDB
  BIGINT);
- LAG/LEAD NULLs are COALESCEd to sentinels (NULL-bearing numeric
  columns widen to float64 in pandas — a cross-engine hash hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


@register(
    "win_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w2 AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w2 AS BIGINT) AS drnk
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] OVER ranking trio: ROW_NUMBER (unique tiebreak), RANK and
    DENSE_RANK (gap vs no-gap on ties)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w2 = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w2).cast("long").alias("rnk"),
        F.dense_rank().over(w2).cast("long").alias("drnk"),
    )


@register(
    "win_topn",
    oracle="""
    SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS acctbal, CAST(rn AS BIGINT) AS rn
    FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 3
    """,
)
def win_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL Top-N — *the* canonical pattern of the category:
    rank window + rn <= N filter. Spark pushes the rank filter into the
    window operator (WindowGroupLimit), so each partition only keeps N."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "rn")
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           COALESCE(LAG(value)  OVER w, -1.0) AS prev_value,
           COALESCE(LEAD(value) OVER w, -1.0) AS next_value,
           COALESCE(LAG(event_type, 2) OVER w, 'none') AS prev2_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] OVER LAG/LEAD — previous/next row values per key, NULL edges
    coalesced to sentinels."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.coalesce(F.lag("value").over(w), F.lit(-1.0)).alias("prev_value"),
        F.coalesce(F.lead("value").over(w), F.lit(-1.0)).alias("next_value"),
        F.coalesce(F.lag("event_type", 2).over(w), F.lit("none")).alias("prev2_type"),
    )


@register(
    "win_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS order_seq
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] OVER ROWS UNBOUNDED PRECEDING — cumulative sum/count per key.
    Accumulation order is pinned by the unique tiebreak, so the float
    sum is bit-reproducible across engines."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count("*").over(w).cast("long").alias("order_seq"),
    )


@register(
    "win_sliding_frame",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER w, 4) AS mov_avg4,
           CAST(COUNT(*) OVER w AS BIGINT) AS frame_cnt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] OVER ROWS k PRECEDING — moving aggregate over a row frame."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg4"),
        F.count("*").over(w).cast("long").alias("frame_cnt"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
           ROUND(SUM(value) OVER w, 2) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] OVER RANGE BETWEEN INTERVAL — time-range frame (events in the
    trailing hour). Both engines order by the integer epoch second
    (Spark long-cast truncates, DuckDB floor()s — identical for
    positive epochs), so frame membership matches exactly."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("cnt_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


@register(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] OVER distribution functions: NTILE / PERCENT_RANK / CUME_DIST.
    Unique tiebreak in the ordering makes all three deterministic."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_spend,
           ROUND(LAST_VALUE(o_totalprice)  OVER w, 2) AS last_spend,
           FIRST_VALUE(o_orderdate) OVER w AS first_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] OVER FIRST_VALUE/LAST_VALUE on the full-partition frame —
    each order row annotated with its customer's first/last order."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_spend"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_spend"),
        F.first("o_orderdate").over(w).alias("first_date"),
    )
