"""Round-7 declared queries (SURVEY §2.17).

This round finishes the Flink CEP public surface in the pattern
compiler (VERDICT r06 "Next round" #1/#2): [F] ``Pattern#times(n)``
(fixed quantifier — join-expressible, oracle-verified here), [F]
``Pattern#within`` (pattern-GLOBAL window, also join-expressible), and
[F] ``Pattern#next`` (strict contiguity — expressible as a
first-any-event vs first-matching-event MIN comparison, oracle-verified
here). The non-join-expressible tiers added alongside —
``timesOrMore(n)`` and ``AfterMatchSkipStrategy.skipPastLastEvent`` —
are streaming-NFA-only and pinned by the hypothesis reference-model
suite + fixture goldens (tests/test_properties.py,
tests/test_streaming.py), the same rigor split as oneOrMore/optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


def _times_oracle() -> str:
    from hello_flink_spark.streaming.cep import TIMES3, oracle_sql

    return oracle_sql(TIMES3)


@register("cep_pattern_times", oracle=_times_oracle())
def cep_pattern_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink CEP ``Pattern#times(n)``: view, click times(2),
    purchase — the fixed quantifier expands to adjacent same-type steps
    (``CepPattern.of``), so the whole existing compiler applies: the
    NFA's strict ts > ordering and highest-stage-first promotion handle
    one event type at several consecutive steps, and the batch chain is
    the same keyed MIN-join ladder (one user_id exchange reused down
    the chain). Golden twin: tests/test_streaming.py drives the NFA
    over the chunked replay and asserts equality with this plan."""
    from hello_flink_spark.streaming.cep import TIMES3, compile_batch

    return compile_batch(TIMES3, t(spark, sf_dir, "events"))


def _total_oracle() -> str:
    from hello_flink_spark.streaming.cep import TOTAL3, oracle_sql

    return oracle_sql(TOTAL3)


@register("cep_pattern_within_total", oracle=_total_oracle())
def cep_pattern_within_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] ``Pattern#within(Duration)`` — the PATTERN-GLOBAL window:
    view→click→purchase, 24 h per stage, whole match bounded to 36 h
    (``CepPattern.total_minutes``). Removes the r06-documented semantic
    delta where only per-stage windows existed (a k-step chain under
    per-stage t alone allows first→last spans up to (k-1)·t). The
    bound is exercised, not vacuous: 225→207 matches at sf0.01 vs the
    per-stage-only twin. Compiles to one extra anchor-ts predicate in
    every chain join (batch) and an anchor-based expiry in the NFA
    (stream) — no extra shuffle."""
    from hello_flink_spark.streaming.cep import TOTAL3, compile_batch

    return compile_batch(TOTAL3, t(spark, sf_dir, "events"))


def _strict_oracle() -> str:
    from hello_flink_spark.streaming.cep import STRICT3, oracle_sql

    return oracle_sql(STRICT3)


@register("cep_pattern_strict", oracle=_strict_oracle())
def cep_pattern_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] ``Pattern#next`` — STRICT contiguity: view, then the
    IMMEDIATELY next event of the user's stream (any type) must be a
    click, then a purchase (relaxed) within 24 h windows. Compiled as
    first-any-event vs first-matching-event: one LEFT join over ALL
    events + two MINs per strict stage; the stage matches iff the
    earliest strictly-later timestamp carries a matching event
    (``_strict_join``). A mismatch is a contiguity violation — dropped
    silently in both NFA and chain, never a timeout. Same single
    user_id exchange as every other stage."""
    from hello_flink_spark.streaming.cep import STRICT3, compile_batch

    return compile_batch(STRICT3, t(spark, sf_dir, "events"))
