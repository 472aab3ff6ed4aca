"""UDF / UDAF / UDTF surface — SURVEY §2.11.

[F] Flink `ScalarFunction` / `AggregateFunction` (UDAGG) /
`TableFunction` + LATERAL — empty reference checkout (SURVEY §0);
anchors are SURVEY.md §2.11 rows.

Every UDF here is a pure function of its inputs with a SQL-mirrorable
definition, so the DuckDB oracle re-implements the logic and the gate
checks the whole Python boundary (Arrow serialization included).
Perf tiering per SURVEY §4.3: pandas_udf (Arrow-vectorized) is the
default; row-at-a-time ``F.udf`` appears once, Arrow-enabled, on logic
with no built-in equivalent (iterative Roman-numeral encoding) — never
in a hot path, never where a built-in exists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


# NOTE: pandas_udf wrapping happens INSIDE each query function —
# F.pandas_udf parses the DDL return type, which needs a live
# SparkContext, and the registry imports this module before any
# session exists.


def _tier_fn(value: pd.Series) -> pd.Series:
    """Vectorized scalar: bucket a double into named tiers."""
    return pd.cut(
        value,
        bins=[float("-inf"), 10.0, 100.0, float("inf")],
        labels=["low", "mid", "high"],
        right=False,
    ).astype(str)


_ROMAN_VALUES = (
    (1000, "M"), (900, "CM"), (500, "D"), (400, "CD"), (100, "C"),
    (90, "XC"), (50, "L"), (40, "XL"), (10, "X"), (9, "IX"),
    (5, "V"), (4, "IV"), (1, "I"),
)


def _roman_fn(n: int | None) -> str | None:
    """Greedy Roman-numeral encoding (1..3999) — genuinely iterative
    row logic with no pyspark.sql.functions equivalent; this is what
    the row-UDF tier exists for."""
    if n is None:
        return None
    out = []
    for value, symbol in _ROMAN_VALUES:
        while n >= value:
            out.append(symbol)
            n -= value
    return "".join(out)


@register(
    "udf_scalar",
    oracle="""
    WITH base AS (
      SELECT event_id, value, ((event_id % 3999) + 1) AS n FROM events
    )
    SELECT event_id,
           CASE WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid'
                ELSE 'high' END AS tier,
           (['','M','MM','MMM'])[(n // 1000) + 1]
           || (['','C','CC','CCC','CD','D','DC','DCC','DCCC','CM'])[((n // 100) % 10) + 1]
           || (['','X','XX','XXX','XL','L','LX','LXX','LXXX','XC'])[((n // 10) % 10) + 1]
           || (['','I','II','III','IV','V','VI','VII','VIII','IX'])[(n % 10) + 1] AS roman
    FROM base
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] ScalarFunction: a pandas_udf tier bucketer (Arrow-vectorized,
    the 100 TB path) plus one Arrow-enabled row UDF demonstrating the
    row tier on logic with NO built-in equivalent (greedy Roman-numeral
    encoding — the oracle mirrors it with positional lookup tables)."""
    tier = F.pandas_udf(_tier_fn, "string")
    roman = F.udf(_roman_fn, "string", useArrow=True)
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        tier(F.col("value")).alias("tier"),
        roman((F.col("event_id") % 3999 + 1).cast("int")).alias("roman"),
    )


def _weighted_avg_fn(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas_udf body: quantity-weighted mean price."""
    q = qty.sum()
    return float((price * qty).sum() / q) if q else float("nan")


@register(
    "udaf",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] AggregateFunction (UDAGG): grouped-agg pandas_udf computing a
    weighted average per key — Arrow batches per group, no row loop."""
    weighted_avg = F.pandas_udf(_weighted_avg_fn, "double")
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@register(
    "udtf",
    oracle="""
    SELECT doc_id, tokens[i] AS word, CAST(i AS BIGINT) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
         UNNEST(generate_series(1, LEAST(len(tokens), 5))) AS u(i)
    """,
)
def udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] TableFunction + LATERAL TABLE: Python UDTF (Spark 4.x) that
    explodes each document into its first 5 (word, position) rows,
    joined laterally in SQL."""
    from pyspark.sql.functions import udtf as udtf_decorator

    @udtf_decorator(returnType="word string, pos long")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, word in enumerate(text.split(" ")[:5], start=1):
                yield word, i

    spark.udtf.register("split_words", SplitWords)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.pos
        FROM documents d, LATERAL split_words(d.text) s
        """
    )


def _l2_norm_fn(embedding: pd.Series) -> pd.Series:
    """Vectorized over the whole Arrow batch: one numpy call, no per-row
    Python — the 10-100x-over-row-UDF tier (SURVEY §2.11 udf_vectorized)."""
    import numpy as np

    mat = np.stack(embedding.to_numpy())
    return pd.Series(np.sqrt((mat.astype("float64") ** 2).sum(axis=1)))


@register(
    "udf_vectorized",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 6) AS l2
    FROM embeddings
    """,
)
def udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] n/a in row-at-a-time Flink — the Spark-native vectorized
    tier: batch numpy L2 norm over the embedding column."""
    l2_norm = F.pandas_udf(_l2_norm_fn, "double")
    e = t(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(l2_norm("embedding"), 6).alias("l2"))
