"""Round-6 extension operators (SURVEY §2.15).

Registered strictly AFTER ``round5`` (see registry._QUERY_MODULES):
the driver's rotation fills its ~50-query window with never- or
least-recently-verified names first, and VERDICT r05 #2 wants the
r01/r02-era cohort re-confirmed post-NTZ-normalization before any new
round-6 names take slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


def _cep4_oracle() -> str:
    from hello_flink_spark.streaming.cep import FUNNEL4, oracle_sql

    return oracle_sql(FUNNEL4)


@register("cep4_pattern_batch", oracle=_cep4_oracle())
def cep4_pattern_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink CEP 4-step `A followedBy B followedBy C followedBy D,
    each within t` — the general-pattern-compiler instance (VERDICT
    r05 #6): the full signup → view → click → purchase acquisition
    funnel, 12 h per stage. Batch shadow COMPILED from the same
    declarative ``CepPattern`` the streaming NFA twin runs
    (streaming/cep.py::compile_batch / compile_stream — golden-tested
    equal in tests/test_streaming.py). The join chain shuffles on
    user_id once and reuses the exchange for all three stages."""
    from hello_flink_spark.streaming.cep import FUNNEL4, compile_batch

    return compile_batch(FUNNEL4, t(spark, sf_dir, "events"))
