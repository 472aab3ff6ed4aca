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
