"""hello_flink_spark — a PySpark-native analytics engine with the
capabilities of the ``lessonone1/hello-flink`` reference.

Evidence policy (SURVEY.md §0): the reference checkout at
``/root/reference/`` is EMPTY, so no ``file:line`` citations into it are
possible. Docstrings instead cite the public Apache Flink API surface
([F] tags, fully-qualified class names) whose semantics each operator
re-expresses, per the survey's citation policy.

Architecture (SURVEY.md §3.2): this engine implements no parser,
planner, optimizer, or scheduler — Catalyst/Tungsten/AQE provide those.
The engine is:

- :mod:`hello_flink_spark.session` — tuned SparkSession factory (the
  "100 TB design" defaults, SURVEY §4.2);
- :mod:`hello_flink_spark.sources` — batch + streaming readers/writers;
- :mod:`hello_flink_spark.operators` — composable DataFrame→DataFrame
  combinators for every operator family in SURVEY §2;
- :mod:`hello_flink_spark.streaming` — Structured Streaming job
  templates (replay harness, watermarked windows, joins, sinks) and
  stateful processors (running agg, sessionization, timers, CEP NFA,
  count windows);
- :mod:`hello_flink_spark.queries` — the declared-query registry that
  backs ``__spark_entry__.py`` (one entry per SURVEY §2 "O" row, each
  paired with DuckDB oracle SQL; ``queries.llm`` holds the
  LLM-data-pipeline operators — dedup, similarity search, text
  analysis, multimodal plumbing).
"""

from hello_flink_spark.registry import all_queries, all_oracles, get_spec
from hello_flink_spark.session import get_spark

__all__ = ["all_queries", "all_oracles", "get_spec", "get_spark"]
