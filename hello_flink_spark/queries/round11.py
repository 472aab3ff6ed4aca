"""Round-11 declared queries.

VERDICT r10 "Next round" deliveries that add NEW driver-gated rows:

- ``text_substring_dedup_fp`` (#5): the fingerprinted-gram variant of
  the exact-substring duplication audit — xxhash64 the 32-char gram
  BEFORE the first shuffle, cutting shuffle bytes ~5x (8-byte long vs
  32-char string + overhead) on the suite's most byte-amplified
  shuffle. The raw-string query stays registered as the oracle-pinned
  twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.queries.round10 import SUBSTR_K
from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


@register(
    "text_substring_dedup_fp",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, length(text) AS n_len,
             substr(text, CAST(i AS INT), {SUBSTR_K}) AS gram
      FROM documents, UNNEST(generate_series(1, length(text) - {SUBSTR_K - 1})) AS u(i)
      WHERE length(text) >= {SUBSTR_K}
    ),
    pdg AS (
      SELECT gram, doc_id, ANY_VALUE(n_len) AS n_len,
             CAST(COUNT(*) AS BIGINT) AS n_pos
      FROM grams GROUP BY gram, doc_id
    ),
    flagged AS (
      SELECT *, COUNT(*) OVER (PARTITION BY gram) AS n_docs FROM pdg
    )
    SELECT doc_id,
           CAST(ANY_VALUE(n_len) - {SUBSTR_K - 1} AS BIGINT) AS n_grams,
           CAST(SUM(n_pos) AS BIGINT) AS dup_grams,
           ROUND(SUM(n_pos) / (ANY_VALUE(n_len) - {SUBSTR_K - 1}), 6) AS dup_frac
    FROM flagged
    WHERE n_docs >= 2
    GROUP BY doc_id
    """,
)
def text_substring_dedup_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit, FINGERPRINTED-gram variant
    (VERDICT r10 "Next round" #5 — the production 100 TB shape the raw
    twin's docstring names): identical semantics to
    ``text_substring_dedup`` except each sliding 32-char gram is
    hashed to an 8-byte ``xxhash64`` fingerprint INSIDE the map-side
    transform, before anything shuffles. The raw twin's first shuffle
    carries the 32-char gram strings themselves (~16x the bytes of
    the carried key+count payload — the single most byte-amplified
    shuffle in the suite, sf1-probed 14.3x wall for 16.1x grams);
    here the same shuffle carries one long per gram position.

    Collision awareness: xxhash64 collisions MERGE two distinct grams
    into one fingerprint, which can only over-count duplication
    (n_docs unions, n_pos sums) — never under-count. At fixture scale
    the path is provably collision-free (tests/test_llm.py asserts
    distinct-gram count == distinct-fingerprint count at sf0.001, and
    the driver oracle — the raw-gram SQL, shared verbatim with the
    twin — hash-matches, which it could not if any collision changed
    a count). At 10^12 grams the expected collision count under
    2^-64 uniformity is ~0.03 merged pairs, each inflating one doc's
    dup_grams by its n_pos — an audit-acceptable bias with no
    false-negative mode; a paranoid deployment widens to 128 bits
    (two seeded xxhash64 columns), doubling key bytes but still 4x
    under the raw twin.

    Scale shape is otherwise the twin's, unchanged: map-side explode
    (no UDF), (fp, doc_id) collapse, count window partitioned by fp
    (aggregate-shaped — never pair enumeration), per-doc rollup, and
    the denominator from a second column-pruned scan (the r10 lesson:
    carrying anything through the explode drags it through every gram
    row)."""
    from pyspark.sql.window import Window

    from hello_flink_spark.operators.scale import spread_small_scan

    # Same r12 spread as the raw twin: the map-side gram explode+hash
    # must use every core (2.9 s -> 0.9 s at sf0.1 on a one-split scan).
    d = spread_small_scan(
        t(spark, sf_dir, "documents").filter(F.length("text") >= SUBSTR_K)
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {SUBSTR_K - 1}),"
                f" i -> xxhash64(substring(text, i, {SUBSTR_K})))"
            )
        ).alias("fp"),
    )
    # r17 (guide §2.4, same change as the raw twin): one
    # repartition(fp) feeds both the (fp, doc_id) aggregate and the
    # count window — hashpartitioning(fp) satisfies both distributions,
    # fusing the two instance-scale exchanges into one (map-side
    # partials collapsed next to nothing: a 32-char gram rarely
    # repeats within a document).
    pdg = (
        grams.repartition("fp")
        .groupBy("fp", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_pos"))
    )
    flagged = pdg.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    )
    dup = (
        flagged.filter(F.col("n_docs") >= 2)
        .groupBy("doc_id")
        .agg(F.sum("n_pos").cast("long").alias("dup_grams"))
    )
    lens = d.select(
        "doc_id",
        (F.length("text") - (SUBSTR_K - 1)).cast("long").alias("n_grams"),
    )
    return dup.join(lens, "doc_id").select(
        "doc_id",
        "n_grams",
        "dup_grams",
        F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias("dup_frac"),
    )
