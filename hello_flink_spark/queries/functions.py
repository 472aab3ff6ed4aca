"""Scalar function families — SURVEY §2.8.

One declared query per family; each SELECT exercises the family's
functions over a test-bed table and is oracled against the DuckDB
equivalents. All pure built-ins (JVM-side, whole-stage codegen) —
no Python in any of these paths.

Cross-engine rules baked in (probed against DuckDB 1.x this session):

- computed integers: Spark ``F.length``/``F.year``/``F.instr`` return
  INT while DuckDB returns BIGINT → every computed int is cast to
  ``long`` on the Spark side;
- DuckDB ``floor``/``ceil``/``sign`` on DOUBLE return DOUBLE → cast to
  BIGINT in the oracle;
- DuckDB ``date_trunc`` on TIMESTAMP returns DATE → cast back to
  TIMESTAMP in the oracle (and declared outputs never use DATE cells,
  whose pandas dtype differs between engines);
- DuckDB ``log`` is log10; Spark ``F.log`` is ln → oracle uses ``ln``;
- DuckDB ``CAST(double AS INT)`` ROUNDS, Spark truncates → oracle uses
  ``trunc`` before the cast;
- transcendental results (ln/exp/sqrt) are rounded to 6 decimals —
  libm implementations may differ in the last ulp;
- no array/map/struct cells in declared output (driver canon) —
  collections are reduced or stringified.

[F] Flink SQL built-in function library (`CONCAT`, `REGEXP_EXTRACT`,
`DATE_FORMAT`, `TIMESTAMPDIFF`, `JSON_VALUE`, collection functions,
`MD5`/`SHA2`, `CAST`) — the reference checkout is empty (SURVEY §0);
anchors are SURVEY.md §2.8 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                                   AS up,
           LOWER(c_mktsegment)                             AS low,
           LENGTH(c_name)                                  AS name_len,
           SUBSTRING(c_name, 1, 8)                         AS sub8,
           REPLACE(c_name, 'Customer', 'C')                AS repl,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0')       AS padded,
           SPLIT_PART(c_name, '#', 2)                      AS after_hash,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1)           AS digits,
           INSTR(c_name, '#')                              AS hash_pos,
           c_mktsegment LIKE 'A%'                          AS is_a,
           CONCAT_WS('-', c_mktsegment, TRIM(c_name))      AS joined
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL string functions (SURVEY §2.8 fn_string)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("low"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.col("c_mktsegment").like("A%").alias("is_a"),
        F.concat_ws("-", F.col("c_mktsegment"), F.trim("c_name")).alias("joined"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate)                                         AS yr,
           MONTH(o_orderdate)                                        AS mon,
           DAY(o_orderdate)                                          AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)       AS month_start,
           o_orderdate + INTERVAL 30 DAY                             AS plus30,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01')     AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m')                            AS ym,
           CAST(epoch(o_orderdate) AS BIGINT)                        AS epoch_s,
           dayofweek(o_orderdate) + 1                                AS dow
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL temporal functions (DATE_FORMAT, TIMESTAMPDIFF,
    FLOOR(ts TO unit), EXTRACT). DuckDB dayofweek is 0-based Sunday,
    Spark is 1-based Sunday → oracle adds 1."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        # TIMESTAMP_NTZ has no direct long cast; go via (UTC-session) TIMESTAMP.
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_s"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                         AS price_r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT)            AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT)             AS price_ceil,
           ROUND(ABS(l_discount - 0.05), 4)                  AS disc_dev,
           ROUND(SQRT(l_quantity), 6)                        AS qty_sqrt,
           ROUND(POW(l_quantity, 2), 2)                      AS qty_sq,
           ROUND(LN(l_extendedprice), 6)                     AS price_ln,
           ROUND(EXP(l_discount), 6)                         AS disc_exp,
           MOD(l_orderkey, 7)                                AS key_mod7,
           CAST(SIGN(l_extendedprice - 30000) AS BIGINT)     AS price_sign,
           GREATEST(l_quantity, 25.0)                        AS qty_hi,
           LEAST(l_quantity, 25.0)                           AS qty_lo
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL math functions. ln/exp/sqrt rounded to 6 (libm ulp)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_extendedprice") - 30000).cast("long").alias("price_sign"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                      AS dim,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4)     AS vec_sum,
           CAST(list_max(embedding) AS DOUBLE)                 AS vec_max,
           CAST(list_min(embedding) AS DOUBLE)                 AS vec_min,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)              AS first_elem,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS pos_cnt,
           ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4)
                                                               AS sq_sum
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL collection functions + higher-order lambdas
    (transform/filter/aggregate) — reduced to scalars because declared
    outputs cannot carry array cells (driver canon)."""
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4).alias("vec_sum"),
        F.array_max("embedding").cast("double").alias("vec_max"),
        F.array_min("embedding").cast("double").alias("vec_min"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("long").alias("pos_cnt"),
        F.round(
            F.aggregate(F.transform(dbl, lambda x: x * x), F.lit(0.0), lambda a, x: a + x),
            4,
        ).alias("sq_sum"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           'et,uid'                                                        AS key_str,
           event_type                                                      AS et_val,
           array_to_string(list_sort([event_type, CAST(user_id AS VARCHAR)]), ',')
                                                                           AS val_str,
           2                                                               AS map_size
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL map functions (MAP literal, element access, keys/values).

    The map is built and consumed Spark-side; the oracle recomputes the
    same scalar values from the raw columns (DuckDB's MAP element access
    returns a list, so the map type never appears in declared output).
    """
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("et"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("key_str"),
        F.element_at(m, F.lit("et")).alias("et_val"),
        F.concat_ws(",", F.array_sort(F.map_values(m))).alias("val_str"),
        F.size(m).cast("int").alias("map_size"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                       AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT)       AS k_num,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10  AS k_bucket,
           json_extract_string(props, '$.missing') IS NULL         AS missing_is_null
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL JSON_VALUE/JSON_QUERY over events.props ('{"k": N}')."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
        (k.cast("long") % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING')                          AS seg_or_null,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')       AS seg_coalesced,
           IF(c_acctbal < 0, 'neg', 'pos')                           AS bal_sign,
           c_acctbal IS NULL                                         AS bal_is_null,
           COALESCE(NULL, CAST(c_nationkey AS BIGINT))               AS nvl_nation
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL conditional functions: COALESCE/NULLIF/IF/ISNULL/NVL."""
    c = t(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("OTHER")).alias("seg_coalesced"),
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos").alias("bal_sign"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.nvl(F.lit(None).cast("long"), F.col("c_nationkey").cast("long")).alias(
            "nvl_nation"
        ),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                       AS name_md5,
           sha256(c_name)                    AS name_sha256,
           md5(CONCAT(c_name, '|', c_mktsegment)) AS composite_md5
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL hash functions (dedup keys). md5/sha256 are the
    cross-engine subset; Spark-only xxhash64/crc32 are exercised by the
    dedup_simhash R-query (queries/llm.py)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.concat_ws("|", "c_name", "c_mktsegment")).alias("composite_md5"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                   AS key_str,
           CAST(trunc(o_totalprice) AS BIGINT)           AS price_int,
           CAST('3.14' AS DOUBLE)                        AS str_to_dbl,
           CAST(o_orderdate AS VARCHAR)                  AS ts_str,
           TIMESTAMP '1995-06-17 12:30:00'               AS str_to_ts,
           CAST(o_totalprice > 100000 AS BIGINT)         AS big_flag
    FROM orders
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL CAST incl. string↔number↔timestamp. DuckDB CAST(double AS
    INT) rounds while Spark truncates → oracle trunc()s first."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.lit("3.14").cast("double").alias("str_to_dbl"),
        F.col("o_orderdate").cast("string").alias("ts_str"),
        F.lit("1995-06-17 12:30:00").cast("timestamp").alias("str_to_ts"),
        (F.col("o_totalprice") > 100000).cast("long").alias("big_flag"),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT c_custkey,
               'https://n' || CAST(c_nationkey AS VARCHAR)
                   || '.example.com/seg/' || lower(c_mktsegment)
                   || '?cust=' || CAST(c_custkey AS VARCHAR)
                   || '&bal=' || CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END
                   AS url
        FROM customer
    )
    SELECT c_custkey,
           url,
           regexp_extract(url, '^https?://([^/]+)', 1)      AS url_host,
           regexp_extract(url, '^https?://[^/]+([^?#]*)', 1) AS url_path,
           regexp_extract(url, '\\?([^#]*)', 1)              AS url_query,
           regexp_extract(url, '[?&]cust=([^&#]*)', 1)       AS cust_param
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL PARSE_URL — URL decomposition (host/path/query and
    a named query parameter). URLs are synthesized from customer
    columns so both engines parse identical inputs; the DuckDB oracle
    mirrors Java's parse_url componentization with anchored regexes
    (exact on these well-formed URLs)."""
    c = t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://n"),
        F.col("c_nationkey").cast("string"),
        F.lit(".example.com/seg/"),
        F.lower("c_mktsegment"),
        F.lit("?cust="),
        F.col("c_custkey").cast("string"),
        F.lit("&bal="),
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos"),
    )
    return c.select(
        "c_custkey",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY")).alias("url_query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("cust")).alias("cust_param"),
    )


@register(
    "fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity - 1, 0)           AS safe_ratio,
           TRY_CAST(l_returnflag AS INTEGER)                     AS flag_as_int,
           TRY_CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT)       AS key_roundtrip,
           string_split(CAST(l_shipdate AS VARCHAR), '-')[l_linenumber] AS date_part
    FROM lineitem
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] error-safe expression tier (Flink SQL TRY_CAST): Spark 4
    ANSI mode makes divide-by-zero / bad casts / out-of-bounds access
    runtime ERRORS unless the try_* forms are used — at 100 TB one
    poison row must degrade to NULL, not kill the job. DuckDB oracle:
    TRY_CAST + NULLIF-guarded division + native NULL list indexing."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 1).alias(
            "safe_ratio"
        ),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias(
            "flag_as_int"
        ),
        F.col("l_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.try_element_at(
            F.split(F.col("l_shipdate").cast("string"), "-"), F.col("l_linenumber")
        ).alias("date_part"),
    )
