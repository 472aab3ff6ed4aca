"""Round-6 batch-4 operators (SURVEY §2.15, second wave).

Registered strictly AFTER ``round6`` in registry._QUERY_MODULES. The
driver window holds ~50 queries and 46 round-6 names are already
queued never-verified, so this batch is sized to exactly fill the
remaining slots — every declared query in the repo keeps a
driver-green or scheduled-this-round status with zero never-checked
overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t
from hello_flink_spark.sources.readers import register_views

# ---------------------------------------------------------------------------
# LLM-pipeline: Gopher-style quality rules
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
# single source of truth: the oracle SQL interpolates the same tuple the
# Spark lambda consumes (llm.py's STOPWORDS pattern), so the list can
# never drift between engines.
_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)


@register(
    "text_gopher_quality",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS words,
             length(replace(text, ' ', '')) AS len_nospace
      FROM documents
    )
    SELECT doc_id, lang,
           len(words) AS word_cnt,
           len(list_filter(words, x -> regexp_matches(x, '^[a-z]+$')))
             AS n_alpha,
           len(list_filter(words, x -> x IN ({_GOPHER_STOP_SQL})))
             AS stop_hits,
           len_nospace,
           (len(words) BETWEEN 5 AND 100000
            AND len_nospace BETWEEN 2 * len(words) AND 10 * len(words)
            AND 5 * len(list_filter(words, x -> regexp_matches(x, '^[a-z]+$')))
                >= 4 * len(words)
            AND len(list_filter(words,
                    x -> x IN ({_GOPHER_STOP_SQL}))) >= 2)
             AS keep
    FROM w
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter (Rae et al. 2021 §A1.1 heuristics,
    public paper): per-doc word count bounds, mean-word-length band,
    alphabetic-word fraction floor, and stop-word presence — the
    standard pre-training quality gate. Every rule is evaluated in
    INTEGER arithmetic (the ratio thresholds are cross-multiplied:
    ``alpha/words >= 0.8`` becomes ``5*alpha >= 4*words``; the
    mean-word-length band [2,10] becomes ``2*words <= chars <=
    10*words``) so no float division can land on a rounding boundary
    and flip `keep` between engines. Pure per-row JVM lambda
    expressions — zero shuffle, trivially scan-parallel at 100 TB."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("^[a-z]+$")))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*_GOPHER_STOPWORDS)))
    word_cnt = F.size(words)
    len_nospace = F.length(F.translate(F.col("text"), " ", "")).cast("long")
    return d.select(
        "doc_id",
        "lang",
        word_cnt.cast("long").alias("word_cnt"),
        n_alpha.cast("long").alias("n_alpha"),
        stop_hits.cast("long").alias("stop_hits"),
        len_nospace.alias("len_nospace"),
        (
            word_cnt.between(5, 100000)
            & len_nospace.between(2 * word_cnt, 10 * word_cnt)
            & (5 * n_alpha >= 4 * word_cnt)
            & (stop_hits >= 2)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: the linear-regression family
# ---------------------------------------------------------------------------


@register(
    "agg_linear_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) + 0.0
             AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 4) + 0.0 AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 4) + 0.0 AS avg_x,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 2) + 0.0 AS avg_y
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 linear-regression aggregate family (regr_slope /
    regr_intercept / regr_r2 / regr_count / regr_avgx / regr_avgy) —
    ordinary least squares of price on quantity per return flag.
    Single-pass partial-aggregable moments exactly like corr/covar:
    one shuffle of tiny (group, moment-tuple) rows regardless of input
    size; map-side combine does the heavy lifting. ``+ 0.0``
    canonicalizes IEEE -0.0 (see agg_corr_covar)."""
    li = t(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        (F.round(F.regr_slope(y, x), 4) + 0.0).alias("slope"),
        (F.round(F.regr_intercept(y, x), 2) + 0.0).alias("intercept"),
        (F.round(F.regr_r2(y, x), 4) + 0.0).alias("r2"),
        F.regr_count(y, x).cast("long").alias("n"),
        (F.round(F.regr_avgx(y, x), 4) + 0.0).alias("avg_x"),
        (F.round(F.regr_avgy(y, x), 2) + 0.0).alias("avg_y"),
    )


# ---------------------------------------------------------------------------
# SQL surface: LATERAL correlated derived table
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, tc.c_custkey, ROUND(tc.c_acctbal, 2) AS acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) tc
"""


@register("join_lateral", oracle=_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink/Calcite LATERAL TABLE (correlated derived table, SQL
    standard LATERAL): top-2 customers by account balance per nation.
    The same SQL text runs on both engines — Catalyst decorrelates the
    ORDER BY .. LIMIT lateral into a partitioned rank under the hood
    (DecorrelateInnerQuery), so the physical plan is one customer
    shuffle by nation key + per-group top-k, never a per-nation
    re-scan: N nations do NOT cost N passes at 100 TB. Tie-break on
    c_custkey makes the top-2 deterministic for the hash gate."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Iterative tier: PageRank over the customer<->supplier trade graph
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 8
PAGERANK_DAMPING = 0.85


def pagerank_detail(
    spark: SparkSession,
    sf_dir: str,
    iters: int = PAGERANK_ITERS,
    with_residuals: bool = False,
):
    """PageRank (Brin & Page 1998) by power iteration on DataFrames.

    Graph: customers and suppliers are nodes (ids disjoint by even/odd
    encoding), one undirected edge per distinct (customer, supplier)
    trade pair from orders ⋈ lineitem. Symmetrization guarantees every
    node has degree ≥ 1, so there is no dangling mass and the
    N-scaled formulation ``rank' = (1-d) + d·Σ rank/deg`` conserves
    Σrank = N exactly — the invariant the tests pin.

    Scale shape: the edge list carries its STATIC source degree (one
    build-time join, round-17) and is eagerly checkpointed; every
    iteration is then ONE join on that layout + one keyed agg — the
    pre-r17 plan also joined ranks to the degree table every iteration
    (guide §2.4: two operations keyed the same way should share one
    exchange — rank/deg now divides inside the single edges⋈ranks
    join), 16 joins over 8 iterations down to 8. The declared query
    checkpoints ONCE at the end (non-eager): r17 measured each extra
    localCheckpoint site paying a full driver-side Catalyst pass over
    the accumulated tree (~1.3 s at depth 4) while the executed task
    DAG — whose 8-iteration wall is 0.09 s at sf0.1 — is identical, so
    mid-loop ckpts bought recovery granularity the bench pays for
    every run. (On a real cluster the localCheckpoint becomes a
    reliable checkpoint / intermediate parquet, and its cadence a
    recovery-granularity knob — shape unchanged.)

    Returns (ranks_df, residuals, n_nodes); residuals (L1 delta per
    iteration) and n_nodes are populated only when ``with_residuals``
    (n_nodes is None otherwise) — the count action and the residual
    join are test-only cost, kept off the declared query's benchmarked
    path.
    """
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = pairs.selectExpr("cust_node AS src", "supp_node AS dst").unionAll(
        pairs.selectExpr("supp_node AS src", "cust_node AS dst")
    )
    # one eager materialization job for the (src, dst, deg) layout —
    # the degree rides on the edge from here on (round-17), attached
    # by a src-partitioned count window: ONE exchange of the edge
    # table, vs the old groupBy + self-join's two plus the join
    # (measured build job 2.75 → 1.51 s at sf0.1, rows identical). No
    # repartition either — but for the RIGHT reason (ADVICE r17):
    # localCheckpoint PRESERVES the executed plan's outputPartitioning
    # in the LogicalRDD, so a pre-checkpoint repartition("src") WOULD
    # let iteration joins skip re-exchanging edges; it is redundant
    # here only because the count window's Exchange below already
    # establishes hashpartitioning(src) before the checkpoint. If the
    # window ever goes away, the explicit repartition must come back
    # or every iteration pays a fresh edge-table exchange.
    from pyspark.sql.window import Window

    edges = edges.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).localCheckpoint(eager=False)
    deg_n = (
        edges.select(F.col("src").alias("node"), "deg")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = deg_n.count() if with_residuals else None

    d = PAGERANK_DAMPING
    # test-only residual joins need per-iteration lineage breaks (the
    # old/new frames would otherwise share an ambiguous self-join
    # lineage); the declared query checkpoints once at the end — each
    # extra ckpt site costs a full Catalyst pass over the accumulated
    # tree (~1.3 s at depth 4, measured r17), while one pass over the
    # 8-deep tree is ~2.0 s total and the executed DAG is identical.
    ckpt_every = 1 if with_residuals else iters
    ranks = deg_n.select("node", F.lit(1.0).alias("rank"))
    residuals: list[float] = []
    for i in range(iters):
        new_ranks = (
            edges.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .groupBy("dst")
            .agg(
                (
                    F.lit(1.0 - d)
                    + F.lit(d) * F.sum(F.col("rank") / F.col("deg"))
                ).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
        if (i + 1) % ckpt_every == 0 or i == iters - 1:
            # eager only on the test path (its per-iteration residual
            # collect materializes immediately anyway); the declared
            # query keeps the depth-4 persistence but runs ONE job.
            new_ranks = new_ranks.localCheckpoint(eager=with_residuals)
        if with_residuals:
            joined = ranks.alias("o").join(new_ranks.alias("n"), "node")
            delta = joined.agg(
                F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("l1")
            ).collect()[0]["l1"]
            residuals.append(float(delta))
        ranks = new_ranks
    return ranks, residuals, n_nodes


@register("graph_pagerank", oracle=None)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of the customer↔supplier trade graph — the
    who-matters query over a transaction network, and the third member
    of the iterative-algorithm tier (with k-means and power iteration:
    the fixed-point family SQL cannot express ⇒ rows-only + invariant
    tests in tests/test_llm.py: Σrank = N conservation, rank ≥ 1-d
    floor, monotonically shrinking L1 residual, determinism). Output:
    top-20 nodes by rank, rounded + id-tiebroken for stability."""
    ranks, _, _ = pagerank_detail(spark, sf_dir)
    return (
        ranks.select(
            F.col("node").cast("long").alias("node"),
            (F.col("node") % 2 == 1).alias("is_supplier"),
            F.round("rank", 6).alias("rank"),
        )
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )
