"""Round-8 declared queries (SURVEY §2.18).

This round adds the last two join-expressible tiers of the Flink CEP
pattern API (VERDICT r07 "Next round" #4/#5): [F]
``IterativeCondition`` — a per-step predicate over previously-accepted
events, compiled as a carried value column + one extra join predicate
— and [F] ``Pattern#followedByAny`` — any-match (not first-match)
promotion, compiled as the band join WITHOUT the MIN collapse. Both
are oracle-verified here and golden-twinned against the streaming NFA
in tests/test_streaming.py, with the hypothesis reference-model suite
extended first (tests/test_properties.py) per the r07 discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


def _rel_guard_oracle() -> str:
    from hello_flink_spark.streaming.cep import RELGUARD3, oracle_sql

    return oracle_sql(RELGUARD3)


@register("cep_pattern_relative_guard", oracle=_rel_guard_oracle())
def cep_pattern_relative_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink CEP ``IterativeCondition``: view → click → purchase
    within 24 h stages, where the purchase's value must be >= 2x the
    ANCHOR view's value (``ctx.getEventsForPattern("view")`` in Flink).
    The guard is per-partial — one purchase event promotes only the
    anchors whose value it clears — which the batch chain expresses by
    carrying the anchor's value down the chain (one column, no extra
    shuffle: the same user_id exchange is reused) and adding one join
    predicate to the final stage; a right-type purchase failing the
    guard is relaxed-contiguity ignored, exactly like a failed
    ``step_min_value`` guard. Non-vacuous on the fixture: 5 matches at
    sf0.001 / 86 at sf0.01 vs 27 / 225 unguarded."""
    from hello_flink_spark.streaming.cep import RELGUARD3, compile_batch

    return compile_batch(RELGUARD3, t(spark, sf_dir, "events"))


def _any_match_oracle() -> str:
    from hello_flink_spark.streaming.cep import ANYCLICK3, oracle_sql

    return oracle_sql(ANYCLICK3)


@register("cep_pattern_followed_by_any", oracle=_any_match_oracle())
def cep_pattern_followed_by_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink CEP ``Pattern#followedByAny``: view →(any) click →
    purchase within 24 h stages — EVERY click within the window of the
    view forks its own match branch (first-match promotion collapses
    to one), and each branch is completed by its own first later
    purchase: multi-touch attribution, where every touchpoint gets a
    row. Compiled as the stage's band join WITHOUT the MIN collapse
    (``_any_join``): every candidate row IS a branch, so the plan is
    one keyed equi-join with the time-band residual — same single
    user_id exchange as the first-match chain, minus the aggregate.
    NFA twin: promotion spawns a branch and the waiting partial stays
    armed until window expiry (branch-count = candidate-count by
    construction; property-tested batch-split invariant). Non-vacuous
    vs the first-match twin: 27→39 matches at sf0.001, 225→277 at
    sf0.01."""
    from hello_flink_spark.streaming.cep import ANYCLICK3, compile_batch

    return compile_batch(ANYCLICK3, t(spark, sf_dir, "events"))


from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


@register("sim_ann_ivf_pq", tags=("iterative", "rows_only"))
def sim_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ / IVFADC (Jégou, Douze & Schmid, "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011): the actual
    billion-scale ANN query shape — coarse IVF buckets bound the scan,
    PQ codes stand in for the vectors inside them, and each query
    scores candidates through its own ADC lookup table instead of
    touching raw floats (VERDICT r07 #8: wires agg_pq_quantize's
    codebook into sim_ann_ivf's probe path).

    Plan shape (all bounded-state, no all-pairs):
    1. ``pq_train`` — per-iteration MAP-ONLY argmin + one keyed agg
       (unchanged); its codebook (1024 doubles) is the only driver
       state. Corpus codes = one groupBy(vec_id) pivot of the final
       assignment (8 small ints per vector — the RAM-resident index).
    2. Coarse quantizer — the shared first-C centroid broadcast
       (``ivf_nearest_buckets``): corpus → 1 bucket, probes → NPROBE
       buckets. Probes are a constant-size set (PROBE_ID_MAX bound).
    3. ADC lookup tables — per (query, subspace): ||q_s − c_{s,j}||²
       for all PQ_K codes, built by ONE broadcast join of the 8-row
       codebook frame against the exploded query subvectors, then
       re-assembled per query (8×16 doubles per query — broadcast-safe
       with the probes).
    4. Scoring — probes ⋈ bucket-matched candidate codes; ADC distance
       is an O(PQ_SUBS) array-lambda fold over LUT hits (never the
       64-dim vectors), then top-5 per query (rounded-distance +
       id tiebreak, the sim_knn determinism rule).

    At 100 TB the bucket join is the only data-scale shuffle; every
    other operand is constant-size and broadcast. R-tier: recall@5 vs
    the exact scan + an exact numpy ADC replay are pinned in
    tests/test_llm.py."""
    from hello_flink_spark.queries.llm import (
        IVF_NPROBE,
        PROBE_ID_MAX,
        ivf_centroids_and_vecs,
        ivf_nearest_buckets,
    )
    from hello_flink_spark.queries.round7 import PQ_K, PQ_SUBDIM, PQ_SUBS, pq_train

    books, assigned = pq_train(spark, sf_dir)
    codes = assigned.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sub, code))), x -> x.code)"
        ).alias("codes")
    )

    centroids, vecs = ivf_centroids_and_vecs(spark, sf_dir)
    assign_b = ivf_nearest_buckets(centroids, vecs, "vec_id", 1)
    probes = ivf_nearest_buckets(
        centroids,
        vecs.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < PROBE_ID_MAX)),
        "vec_id",
        IVF_NPROBE,
    ).select(F.col("vec_id").alias("query_id"), F.col("vec").alias("q_vec"), "bucket")

    # ADC lookup tables: one row per (query, subspace) via the SAME
    # 8-row broadcast codebook frame the trainer assigns with
    cb = spark.createDataFrame(
        [(s, [list(books[(s, c)]) for c in range(PQ_K)]) for s in range(PQ_SUBS)],
        "sub int, cvs array<array<double>>",
    )
    qsub = (
        probes.select("query_id", "q_vec")
        .dropDuplicates(["query_id"])
        .select(
            "query_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {PQ_SUBS - 1}), s -> struct("
                    f"s AS sub, slice(q_vec, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM}) AS qs))"
                )
            ).alias("x"),
        )
        .select("query_id", F.col("x.sub").alias("sub"), F.col("x.qs").alias("qs"))
    )
    luts = (
        qsub.join(F.broadcast(cb), "sub")
        .select(
            "query_id",
            "sub",
            F.expr(
                "transform(cvs, cv -> aggregate("
                "zip_with(qs, cv, (a, b) -> (a - b) * (a - b)),"
                " 0D, (acc, x) -> acc + x))"
            ).alias("lut"),
        )
        .groupBy("query_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(sub, lut))), x -> x.lut)"
            ).alias("luts")
        )
    )

    cand = (
        probes.select("query_id", "bucket")
        .join(F.broadcast(luts), "query_id")
        .join(
            assign_b.select(F.col("vec_id").alias("neighbor_id"), "bucket").join(
                codes.select(F.col("vec_id").alias("neighbor_id"), "codes"),
                "neighbor_id",
            ),
            "bucket",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.expr(
                f"aggregate(sequence(0, {PQ_SUBS - 1}), 0D,"
                f" (acc, s) -> acc + luts[s][codes[s]])"
            ),
            6,
        ).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= 5
    )
