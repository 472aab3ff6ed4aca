"""Batch relational core — SURVEY §2.2 (row ops), §2.3 (joins),
§2.4 (aggregations), §2.6 (sort/limit), §2.7 (set ops).

Every query here is pure built-in DataFrame API (no Python UDFs), so it
runs entirely inside Tungsten/WholeStageCodegen and hash-matches the
DuckDB oracle deterministically (SURVEY §4.3). Double aggregates are
ROUNDed per SURVEY §5.1; every computed column is aliased identically
in the Spark plan and the oracle SQL.

Flink surface each family re-expresses is cited per-query ([F] tags —
the reference checkout is empty, see SURVEY §0 citation policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hello_flink_spark.operators.joins import asof_join, asof_join_window, lookup_join
from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


# ---------------------------------------------------------------------------
# Flagship (M0): TPC-H Q1-style pricing summary.
# Exercises scan → pushed filter → partial+final hash agg → sort.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("flagship_pricing_summary", oracle=FLAGSHIP_ORACLE, tags=("flagship", "agg"))
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] the canonical batch aggregate: KeyedStream#sum / SQL GROUP BY."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# §2.2 Projection / filter / row ops
# ---------------------------------------------------------------------------


@register(
    "project",
    oracle="""
    SELECT c_custkey, UPPER(c_name) AS name_upper,
           CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)), 2)
                AS DOUBLE) AS boosted_bal
    FROM customer
    """,
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataStream#map / Table#select: compute + rename columns.

    Money arithmetic is done in DECIMAL on BOTH engines (ADVICE.md r01):
    double math hits half-cent ties (9107.05*1.1 = 10017.755) that Spark
    and DuckDB round differently; decimal multiply is exact and both
    round HALF_UP, so the hash matches by construction.
    """
    boosted = (
        F.col("c_acctbal").cast("decimal(12,2)") * F.lit("1.1").cast("decimal(3,1)")
    )
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.round(boosted, 2).cast("double").alias("boosted_bal"),
    )


@register(
    "filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataStream#filter / SQL WHERE. Predicate reaches the parquet scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "flatmap",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataStream#flatMap — THE hello-flink op (WordCount tokenizer).

    1→N row expansion via explode(split(...)), then keyed count.
    """
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "case_when",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                ELSE 'cold' END AS priority_class,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY priority_class
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL CASE: conditional projection."""
    o = t(spark, sf_dir, "orders")
    cls = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
        .alias("priority_class")
    )
    return o.groupBy(cls).agg(
        F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL SELECT DISTINCT: duplicate elimination (hash agg, partial-combined)."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register("sample", oracle=None)
def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataSet#sample. PERMANENT no_oracle (r11 R-row audit):
    Spark's seeded XORShiftRandom Bernoulli stream is the surveyed
    surface and no other engine reproduces it → rows-only check; the
    deterministic alternative is `sample_deterministic_hash`."""
    return t(spark, sf_dir, "customer").sample(fraction=0.5, seed=42)


@register(
    "repartition_ops",
    oracle="SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey",
)
def repartition_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataStream#rebalance/rescale/shuffle: physical re-distribution.

    Result content is invariant under repartitioning, so this IS
    oracle-checkable — the op under test is the exchange, the agg just
    makes the output stable.
    """
    c = t(spark, sf_dir, "customer").repartition(8, "c_nationkey")
    return c.groupBy("c_nationkey").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS order_cnt, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Table#join / SQL JOIN — equi inner join, Catalyst picks the strategy."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("order_cnt"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@register(
    "join_left",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL LEFT OUTER JOIN — customers keep their row with 0 orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_right",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS supp_cnt
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL RIGHT OUTER JOIN — every nation appears even with no supplier."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("supp_cnt"))
    )


@register(
    "join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt FROM customer GROUP BY nk),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS supp_cnt FROM supplier GROUP BY nk)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(cust_cnt, 0) AS cust_cnt,
           COALESCE(supp_cnt, 0) AS supp_cnt
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL FULL OUTER JOIN over two pre-aggregated sides."""
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("supp_cnt"))
    )
    j = cust.join(supp, "nk", "full")  # USING-style join merges the key column
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("cust_cnt", F.lit(0)).alias("cust_cnt"),
        F.coalesce("supp_cnt", F.lit(0)).alias("supp_cnt"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL WHERE EXISTS → semi join (Calcite rewrite; Spark left_semi)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL NOT EXISTS → anti join (Spark left_anti).

    The build side is filtered to URGENT orders so the anti-join result
    is non-empty at sf0.01 (every customer has *some* order — the r01
    unfiltered variant passed vacuously at 0 rows).
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast",
    oracle="""
    SELECT n_name, COUNT(*) AS cust_cnt, ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] broadcast join (Blink BroadcastHashJoin) — explicit broadcast hint
    pins the map-side plan: at 100 TB the fact table never shuffles.
    The broadcast side is `nation` (25 rows by construction, scale-
    INDEPENDENT) — a hint is only honest when the side is bounded by
    construction, not merely small at the current SF (VERDICT r05:
    the part table scales with data and must not be pinned)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("cust_cnt"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "join_theta",
    oracle="""
    SELECT n1.n_name AS left_nation, COUNT(*) AS bigger_cnt
    FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey
    GROUP BY n1.n_name
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] non-equi join predicate → BroadcastNestedLoopJoin (tiny sides only;
    at scale a theta join must be banded/bucketed first)."""
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(n2, F.col("n1.n_nationkey") < F.col("n2.n_nationkey"))
        .groupBy(F.col("n1.n_name").alias("left_nation"))
        .agg(F.count("*").alias("bigger_cnt"))
    )


@register(
    "join_range",
    oracle="""
    SELECT s_suppkey, COUNT(c_custkey) AS near_cnt
    FROM supplier LEFT JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] band/range-predicate join — bucketed so it scales.

    A raw band predicate between two fact-scale tables compiles to
    BroadcastNestedLoopJoin: O(|S|*|C|) comparisons (the r01 plan — a
    scale-killer). Instead, both sides are bucketed by
    floor(acctbal/band): a customer in [s-100, s+100] must fall in one
    of the 3 buckets around the supplier's, so exploding the (smaller)
    supplier side to those 3 buckets turns the band join into an
    equi-join on the bucket + an exact residual filter. Shuffle-hash,
    linear in data size, skew handled by AQE.
    """
    band = 100.0
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").withColumn(
        "bucket", F.floor(F.col("c_acctbal") / band)
    )
    sb = F.floor(F.col("s_acctbal") / band)
    s_exploded = s.withColumn("bucket", F.explode(F.array(sb - 1, sb, sb + 1)))
    matches = (
        s_exploded.join(c, "bucket")
        .filter(
            (F.col("c_acctbal") >= F.col("s_acctbal") - band)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + band)
        )
        .groupBy("s_suppkey")
        .agg(F.count("c_custkey").alias("cnt"))
    )
    # LEFT semantics: suppliers with zero nearby customers keep a 0 row.
    return (
        s.select("s_suppkey")
        .join(matches, "s_suppkey", "left")
        .select("s_suppkey", F.coalesce("cnt", F.lit(0).cast("long")).alias("near_cnt"))
    )


@register(
    "join_interval_batch",
    oracle="""
    SELECT c.user_id, COUNT(*) AS pair_cnt
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    GROUP BY c.user_id
    """,
)
def join_interval_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] KeyedStream#intervalJoin(...).between(0, 30min) — batch shadow.

    Equi key (user_id) + time band; the streaming twin is in
    streaming/jobs.py with watermarks on both sides.
    """
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts >= clicks.c_ts)
        & (purchases.p_ts <= clicks.c_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    return clicks.join(purchases, cond).groupBy("user_id").agg(F.count("*").alias("pair_cnt"))


ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts AS purchase_ts, value AS purchase_value
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
)
SELECT c.click_id, c.user_id, c.click_ts, p.purchase_ts, p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND p.purchase_ts <= c.click_ts
"""


def _asof_sides(spark: SparkSession, sf_dir: str):
    """Shared click/purchase sides for both as-of formulations. Right
    side deduped to one row per (user, ts) so the as-of pick is
    deterministic."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("purchase_ts"), F.col("value").alias("purchase_value"))
    )
    return clicks, purchases


@register("join_asof", oracle=ASOF_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] temporal table join FOR SYSTEM_TIME AS OF — for each click,
    the user's latest purchase at or before the click.

    Default formulation: union + per-key carry-forward window
    (operators/joins.py::asof_join_window) — one shuffle, all JVM,
    ~7x faster than the Arrow cogroup path at sf0.1 (BASELINE.md).
    """
    clicks, purchases = _asof_sides(spark, sf_dir)
    joined = asof_join_window(
        clicks, purchases, key="user_id", left_ts="click_ts", right_ts="purchase_ts"
    )
    return joined.select("click_id", "user_id", "click_ts", "purchase_ts", "purchase_value")


@register("join_asof_pandas", oracle=ASOF_ORACLE)
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics through the cogroup + pandas.merge_asof
    escape hatch (operators/joins.py::asof_join) — kept declared so the
    Python path stays correctness-gated; use when per-key logic
    outgrows a window expression."""
    clicks, purchases = _asof_sides(spark, sf_dir)
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        schema="click_id bigint, user_id bigint, click_ts timestamp, "
        "purchase_ts timestamp, purchase_value double",
    )


ASOF_TOLERANCE_ORACLE = """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts AS purchase_ts, value AS purchase_value
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
), cand AS (
  SELECT c.click_id, p.purchase_ts, p.purchase_value,
         ROW_NUMBER() OVER (PARTITION BY c.click_id
                            ORDER BY p.purchase_ts DESC) AS rn
  FROM clicks c
  JOIN purchases p
    ON p.user_id = c.user_id
   AND p.purchase_ts <= c.click_ts
   AND p.purchase_ts >= c.click_ts - INTERVAL 60 MINUTE
)
SELECT c.click_id, c.user_id, c.click_ts, x.purchase_ts, x.purchase_value
FROM clicks c
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) x ON x.click_id = c.click_id
"""


@register("join_asof_tolerance", oracle=ASOF_TOLERANCE_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] temporal join with bounded staleness (pandas merge_asof
    `tolerance`): the latest purchase at or before each click, but a
    match older than 60 minutes is as good as none — stale quotes
    null out instead of silently enriching. Same one-shuffle window
    plan as join_asof; the tolerance is a post-fill column mask."""
    clicks, purchases = _asof_sides(spark, sf_dir)
    joined = asof_join_window(
        clicks,
        purchases,
        key="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        tolerance="60 minutes",
    )
    return joined.select("click_id", "user_id", "click_ts", "purchase_ts", "purchase_value")


@register(
    "join_lookup",
    oracle="""
    SELECT e.event_type, CAST(SUM(w.weight) AS BIGINT) AS weighted_cnt
    FROM events e
    JOIN (VALUES ('click', 1), ('view', 2), ('purchase', 10),
                 ('signup', 5), ('error', 0)) AS w(event_type, weight)
      ON e.event_type = w.event_type
    GROUP BY e.event_type
    """,
)
def join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] lookup join (LookupTableSource): per-record dim enrichment →
    broadcast hash join against the dim snapshot."""
    e = t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 10), ("signup", 5), ("error", 0)],
        "event_type string, weight int",
    )
    return (
        lookup_join(e, dim, "event_type")
        .groupBy("event_type")
        .agg(F.sum("weight").alias("weighted_cnt"))
    )


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataSet#cross: Cartesian product (tiny sides only)."""
    return t(spark, sf_dir, "region").crossJoin(t(spark, sf_dir, "nation")).select(
        "r_name", "n_name"
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS row_cnt,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] AllWindowedStream#aggregate / SQL agg without GROUP BY."""
    return t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("row_cnt"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "agg_keyed",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] KeyedStream#sum/reduce / SQL GROUP BY — partial+final hash agg."""
    return t(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "agg_multi_key",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] keyBy(k1, k2): composite grouping key."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS uniq_custs
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL COUNT(DISTINCT) (Blink split-distinct agg; Spark expands
    distinct aggregates into a two-stage plan automatically)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("uniq_custs"))
    )


@register("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] approximate distinct agg (HyperLogLog++). Approx ≠ exact oracle →
    rows-only check here; tests/test_operators.py bounds the error vs exact."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_uniq_custs"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS cust_cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL GROUP BY ROLLUP — hierarchical subtotals region→nation→grand."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("cust_cnt"))


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL GROUP BY CUBE — all grouping combinations."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL GROUPING SETS — explicit subtotal combinations."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS order_cnt
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL HAVING: post-aggregation filter."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_cnt"))
        .filter(F.col("order_cnt") >= 15)
    )


@register(
    "agg_collect",
    oracle="""
    SELECT n_name, array_to_string(list_sort(list(s_name)), '|') AS supplier_names
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] ListState accumulation / SQL COLLECT — array sorted for determinism.

    Declared output is the '|'-joined string, not the raw array: the
    driver's pandas canonicalizer cannot hash list cells (r01 red), so
    collection outputs are always stringified (repo-wide rule, see
    oracle._canon).
    """
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("s_name"))).alias(
                "supplier_names"
            )
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_stddev,
           ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Table aggregate functions: stddev/variance/correlation."""
    return t(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
    )


@register(
    "agg_reduce",
    oracle="""
    SELECT user_id, COUNT(*) AS event_cnt, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def agg_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] KeyedStream#reduce / AggregateFunction: per-key running fold.

    The fold here (count + sum) is expressible as built-in aggregates, so
    it compiles to partial+final hash agg — the streaming twin
    (update-mode running agg) is in streaming/jobs.py.
    """
    return t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("event_cnt"), F.round(F.sum("value"), 2).alias("total_value")
    )


# ---------------------------------------------------------------------------
# §2.6 Sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "sort",
    oracle="""
    SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal,
           ROW_NUMBER() OVER (ORDER BY ROUND(c_acctbal, 2) DESC, c_custkey) AS rn
    FROM customer
    """,
)
def sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL ORDER BY (total order). The driver's hash is order-insensitive,
    so a global rank column materializes the order into checkable content.

    Scale-safe global rank (the r01 plan was ROW_NUMBER over an
    unpartitioned window — every row through ONE WindowExec task):
    rank within a value bucket (partitioned window, parallel) + the
    total row count of all better buckets (tiny aggregate, broadcast
    back). Bucket count ~ O(value_range/width), independent of row
    count, so the only serial structure is the bucket-offset table.
    """
    base = t(spark, sf_dir, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("acctbal")
    )
    # Buckets in DESCENDING rank order: negate so higher acctbal => smaller bucket.
    base = base.withColumn("bucket", -F.floor(F.col("acctbal") / 100))
    w_in = Window.partitionBy("bucket").orderBy(F.col("acctbal").desc(), F.col("c_custkey"))
    ranked = base.withColumn("rn_in", F.row_number().over(w_in))
    bucket_counts = base.groupBy("bucket").agg(F.count("*").alias("bcnt"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_counts.withColumn(
        "offset", F.coalesce(F.sum("bcnt").over(w_off), F.lit(0))
    ).select("bucket", "offset")
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            "c_custkey",
            "acctbal",
            (F.col("offset") + F.col("rn_in")).alias("rn"),
        )
        .orderBy("rn")
    )


@register(
    "limit",
    oracle="SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderkey LIMIT 10",
)
def limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL LIMIT — deterministic because ordered by the unique key."""
    return t(spark, sf_dir, "orders").orderBy("o_orderkey").select("o_orderkey", "o_orderdate").limit(10)


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] global Top-N. orderBy+limit compiles to TakeOrderedAndProject —
    no full sort, each partition keeps k rows then the driver merges."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(10)
    )


@register(
    "sort_within_partitions",
    oracle="SELECT l_orderkey, l_linenumber FROM lineitem",
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataSet#sortPartition — partition-local order; content invariant,
    so the oracle checks the (order-insensitive) multiset."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .sortWithinPartitions("l_orderkey")
    )


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------


@register(
    "union_all",
    oracle="""
    SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataStream#union / SQL UNION ALL (bag union, no shuffle)."""
    c = t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s)


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL UNION (set union = union all + distinct)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL INTERSECT."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL EXCEPT ALL (multiset difference — keeps surplus duplicates)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "intersect_all",
    oracle="""
    SELECT o_orderstatus AS status FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_orderstatus FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL INTERSECT ALL (multiset intersection — keeps min
    multiplicity per value, unlike the set variant)."""
    o = t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("status")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_orderstatus").alias("status")
    )
    return urgent.intersectAll(low)


@register(
    "except_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL EXCEPT (set difference): nations with BUILDING customers
    but no high-balance supplier. (Supplier side filtered so the result
    is non-empty at sf0.01 — 5 rows; an unfiltered variant passes
    vacuously at 0, the r01 join_anti trap.)"""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@register(
    "agg_argmax",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS biggest_order_key,
           arg_min(o_orderkey, o_totalprice) AS smallest_order_key,
           ROUND(MAX(o_totalprice), 2)       AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] SQL MAX_BY/MIN_BY (argmax/argmin — 'which row holds the
    extreme', the agg that otherwise costs a self-join or a window):
    per priority, the order keys carrying the highest and lowest
    price. o_totalprice is duplicate-free per group at every SF
    (continuous doubles), so the pick is deterministic cross-engine."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order_key"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order_key"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
