"""Batch sources & sinks as declared queries — SURVEY §2.1.

[F] Flink `FileSource` / `filesystem` connector / CSV & JSON formats /
`env.fromElements` / `FileSink` — empty reference checkout (SURVEY §0);
anchors are SURVEY.md §2.1 rows.

CSV/JSON/text scans need non-parquet fixtures; they are derived
deterministically from the parquet test bed into
``/root/repo/.cache/fixtures/<sf>/`` on first use (idempotent,
content-identical to the source table), so the DuckDB oracle can run
on the original parquet view and still hash-match. Streaming sources
and sinks (rate, file-stream, socket, kafka stub, memory, console,
foreachBatch) live in hello_flink_spark/streaming/jobs.py (S rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache")


def _fixture_dir(sf_dir: str, kind: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_CACHE_ROOT, "fixtures", sf_name, kind)


def _ensure(path: str, write) -> str:
    """Idempotently materialize a derived fixture (marker = _SUCCESS)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write(path)
    return path


@register(
    "scan_parquet",
    oracle="""
    SELECT COUNT(*) AS row_cnt, ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] FileSource / filesystem connector, parquet format: schema from
    the footer, vectorized reader, column pruning (only l_extendedprice
    is read — check ReadSchema in .explain)."""
    return t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("row_cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "scan_csv",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS nation_cnt,
           MIN(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] CsvReaderFormat: header CSV with an explicit schema (required
    for streaming parity; also skips Spark's inference pass). Fixture =
    the nation table round-tripped through our own CSV sink."""
    path = _ensure(
        _fixture_dir(sf_dir, "nation_csv"),
        lambda p: t(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option("header", True).csv(p),
    )
    df = spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", True
    ).csv(path)
    return df.groupBy("n_regionkey").agg(
        F.count("*").alias("nation_cnt"), F.min("n_name").alias("first_name")
    )


@register(
    "scan_json",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] JSON-lines scan with explicit schema over a fixture derived
    from the region table."""
    path = _ensure(
        _fixture_dir(sf_dir, "region_json"),
        lambda p: t(spark, sf_dir, "region").coalesce(1).write.mode("overwrite").json(p),
    )
    return spark.read.schema("r_regionkey int, r_name string").json(path).select(
        "r_regionkey", "r_name"
    )


@register(
    "scan_text",
    oracle="""
    SELECT COUNT(*) AS line_cnt,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] TextLineInputFormat (the WordCount source): whole-line scan of
    the documents text dumped one-per-line."""
    path = _ensure(
        _fixture_dir(sf_dir, "documents_text"),
        lambda p: t(spark, sf_dir, "documents")
        .select("text")
        .coalesce(1)
        .write.mode("overwrite")
        .text(p),
    )
    lines = spark.read.text(path)
    return lines.agg(
        F.count("*").alias("line_cnt"),
        F.sum(F.length("value")).alias("total_chars"),
    )


@register(
    "source_collection",
    oracle="""
    SELECT event_type, weight, weight * 10 AS weight10
    FROM (VALUES ('click', 1), ('view', 2), ('purchase', 10),
                 ('signup', 5), ('error', 0)) AS v(event_type, weight)
    """,
)
def source_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] env.fromElements/fromCollection — the in-memory bounded source
    of every Flink tutorial → spark.createDataFrame over local rows."""
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 10), ("signup", 5), ("error", 0)],
        "event_type string, weight int",
    )
    return dim.select("event_type", "weight", (F.col("weight") * 10).alias("weight10"))


@register(
    "sink_parquet",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS cust_cnt,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment, c_nationkey
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] FileSink, partitioned write: aggregate → write partitioned by
    segment (the at-scale layout: partition pruning on read) → read
    back. The declared result is the round-trip, so the oracle verifies
    write+read is lossless."""
    out = _fixture_dir(sf_dir, "sink_parquet_out")
    agg = (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("cust_cnt"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )
    agg.write.mode("overwrite").partitionBy("c_mktsegment").parquet(out)
    df = spark.read.parquet(out)
    # partitionBy lifts the partition column; restore the declared order/types.
    return df.select(
        "c_mktsegment",
        "c_nationkey",
        "cust_cnt",
        "total_bal",
    ).withColumn("c_mktsegment", F.col("c_mktsegment").cast("string"))


@register(
    "sink_csv",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] FileSink, CSV format: top-50 orders written to CSV and read
    back with explicit schema — checks the text round-trip of doubles."""
    out = _fixture_dir(sf_dir, "sink_csv_out")
    top = (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(50)
    )
    top.coalesce(1).write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema("o_orderkey bigint, totalprice double").option(
        "header", True
    ).csv(out)


@register(
    "scan_parquet_evolving",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def scan_parquet_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] filesystem connector schema evolution: a dataset written in
    two generations — the older files lack a column added later — read
    as ONE table via mergeSchema (footer union; old rows surface NULL
    for the new column). The at-scale ingestion reality: 100 TB of
    history is never rewritten when the producer adds a field.
    Fixture = orders split by key parity; even keys written WITHOUT
    o_orderpriority (generation 1), odd keys with it (generation 2)."""
    o = t(spark, sf_dir, "orders")
    gen1 = _ensure(
        _fixture_dir(sf_dir, "orders_gen1"),
        lambda p: o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(p),
    )
    gen2 = _ensure(
        _fixture_dir(sf_dir, "orders_gen2"),
        lambda p: o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(p),
    )
    merged = spark.read.option("mergeSchema", True).parquet(gen1, gen2)
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
