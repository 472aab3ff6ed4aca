"""Round-10 declared queries.

VERDICT r09 "Next round" deliveries that add NEW driver-gated rows:

- ``window_cumulate_batch`` (#5): the streaming CUMULATE
  construction's batch shadow, hash-verified — upgrades the cumulate
  story's S-tier plan to oracle-checked evidence.
- CEP composition goldens live in tests (property-suite-first, §3/#4);
  compositions that are batch-expressible get declared rows here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.registry import register
from hello_flink_spark.sources.readers import load_table as t


@register(
    "window_cumulate_batch",
    oracle="""
    SELECT ts - to_microseconds(epoch_us(ts) % 3600000000)
             + to_microseconds(k * 900000000) AS window_end,
           event_type, COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS total_value
    FROM events,
         UNNEST(generate_series(
             CAST((epoch_us(ts) % 3600000000) // 900000000 AS BIGINT) + 1, 4)) AS u(k)
    GROUP BY window_end, event_type
    """,
)
def window_cumulate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL CUMULATE TVF (span 1 h, step 15 min) — the batch
    shadow of the STREAMING construction (VERDICT r09 #5), hash-
    verified: ``streaming/jobs.py::cumulate_counts`` explodes each
    event statelessly into its expanding windows with a synthetic
    ``step_ts`` one second before each window's end, then runs a
    plain NATIVE 15-minute tumbling aggregation whose ``w.end`` IS
    the cumulate window_end. This query runs that exact plan (explode
    → ``F.window`` tumble → agg) in batch and the DuckDB oracle
    recomputes the expanding-window membership arithmetically — so
    the synthetic-timestamp trick itself (not just the simpler
    explode-groupBy of ``window_cumulate``) is pinned by the driver
    hash gate, and the streaming twin's goldens inherit an
    oracle-checked reference.

    Scale shape: the ≤4× row expansion happens map-side before the
    single (window, event_type) shuffle, where partial aggregation
    absorbs it — state and shuffle bytes are per-open-window
    aggregates, identical to a plain tumbling count."""
    e = t(spark, sf_dir, "events")
    ep = F.col("ts").cast("long")  # epoch seconds (floor for 2024 data)
    hour_start = ep - (ep % 3600)
    first_k = ((ep % 3600) / 900).cast("long") + 1
    return (
        e.withColumn("k", F.explode(F.sequence(first_k, F.lit(4))))
        .withColumn(
            "step_ts", F.timestamp_seconds(hour_start + F.col("k") * 900 - 1)
        )
        .groupBy(F.window("step_ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.end").alias("window_end"), "event_type", "cnt", "total_value")
    )


@register(
    "join_async_enrich",
    oracle=f"""
    SELECT event_id, user_id,
           CASE WHEN user_id % 97 = 0 THEN NULL
                ELSE ['bronze','silver','gold','platinum','diamond'][(user_id % 5) + 1]
           END AS profile_tier,
           CASE WHEN user_id % 97 = 0 THEN NULL
                ELSE (((user_id % 1000000) * 2654435761) % 1000000) / 1000000
           END AS profile_score,
           CAST(CASE WHEN user_id % 97 = 0 THEN NULL
                ELSE ((user_id % 100) * 40503) % 100
           END AS BIGINT) AS profile_segment
    FROM events
    """,
)
def join_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] ``AsyncDataStream.unorderedWait`` (async I/O enrichment,
    VERDICT r09 "What's missing" #5) — each event enriched against an
    external profile service, mapped Spark-first as ``mapInPandas``
    with a batched client (``operators/async_enrich.py``): one client
    per task, per-Arrow-batch key coalescing, ``capacity``-chunked
    bulk requests, a retry loop for unanswered keys, typed-null
    fallback for permanent misses (Flink's timeout override).

    The service is the deterministic in-process fake (no network in
    the sandbox), so the driver hash gate pins the WHOLE operator
    surface: deleted users (uid % 97 == 0) must come back as typed
    nulls (fallback path), flaky users (uid % 7 == 3, missing on bulk
    attempt 1) must come back FULLY populated (retry path — a broken
    retry loop turns them null and the hash fails), and capacity=64
    forces multi-chunk bulk requests at every sf. Map-only: zero
    shuffles at any corpus scale; Spark cores × capacity bounds
    outstanding keys exactly like the Flink operator's capacity."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id")
    from hello_flink_spark.operators.async_enrich import enrich_with_service

    return enrich_with_service(e, "user_id", capacity=64)


# Deterministic "trained" weight table for the quality classifier:
# bucket b in [0, 256) gets w = ((b * 2654435761) % 2001 - 1000) / 1000
# in [-1, 1] — a stand-in for fasttext-style learned weights (no model
# files in the sandbox), shared verbatim by the oracle SQL.
QC_BUCKETS = 256
QC_WEIGHT_MULT = 2654435761
QC_BIAS = 0.1


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH weights AS (
      SELECT printf('%02x', b) AS bucket,
             ((b * {QC_WEIGHT_MULT}) % 2001 - 1000) / 1000.0 AS w
      FROM (SELECT UNNEST(generate_series(0, {QC_BUCKETS - 1})) AS b)
    ),
    tok AS (
      SELECT doc_id, substr(md5(tok), 1, 2) AS bucket
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
    ),
    pooled AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(w.w) AS sw
      FROM tok t JOIN weights w ON w.bucket = t.bucket
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(1.0 / (1.0 + exp(-({QC_BIAS} + sw / n_tokens))), 6) AS quality_score,
           CAST(CASE WHEN 1.0 / (1.0 + exp(-({QC_BIAS} + sw / n_tokens))) >= 0.5
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM pooled
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fasttext-shaped document quality classifier — the standard
    LLM-corpus quality gate (CCNet/RefinedWeb class): hashed bag-of-
    words features (md5-prefix buckets, the `text_hashing_features`
    device — no vocabulary join at any scale), a BROADCAST 256-row
    weight table standing in for the trained linear model, mean-pooled
    dot product, logistic score, keep decision at 0.5.

    Spark-first shape for 100 TB: explode is map-side; the model join
    is an explicit `F.broadcast` of a 256-row frame (a real deployment
    broadcasts its ~2M-bucket × 1 float weight vector the same way —
    a few MB); ONE doc_id shuffle with map-side partial aggregation
    carries only (Σw, count) per doc. The weights here are derived by
    modular arithmetic from the bucket id so the DuckDB oracle can
    rebuild the identical "model" and the driver hash gate pins
    hashing, pooling, and the sigmoid boundary end-to-end."""
    d = t(spark, sf_dir, "documents")
    weights = spark.range(QC_BUCKETS).select(
        F.lpad(F.lower(F.hex(F.col("id"))), 2, "0").alias("bucket"),
        (((F.col("id") * QC_WEIGHT_MULT) % 2001 - 1000) / 1000.0).alias("w"),
    )
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    pooled = (
        tok.withColumn("bucket", F.substring(F.md5(F.col("tok")), 1, 2))
        # bounded broadcast: exactly QC_BUCKETS=256 rows by construction
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("w").alias("sw"))
    )
    z = F.lit(QC_BIAS) + F.col("sw") / F.col("n_tokens")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return pooled.select(
        "doc_id",
        "n_tokens",
        F.round(score, 6).alias("quality_score"),
        F.when(score >= 0.5, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("keep"),
    )


@register(
    "join_window_batch",
    oracle="""
    SELECT date_trunc('hour', c.ts) AS window_start,
           c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           ROUND(p.value - c.value, 4) AS value_delta
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND date_trunc('hour', c.ts) = date_trunc('hour', p.ts)
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def join_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataStream window join —
    ``clicks.join(purchases).where(u).equalTo(u).window(TumblingEventTimeWindows
    .of(Time.hours(1))).apply(JoinFunction)``: pair every click with
    every purchase of the SAME user inside the SAME 1-hour tumbling
    window (unlike ``join_interval_batch``'s ±bound, membership is the
    shared window bucket — two events 1 s apart across a boundary do
    NOT join). The JoinFunction projection here emits the pair ids and
    the purchase-minus-click value delta.

    Spark-first: each side derives its tumbling bucket with the native
    ``F.window`` TVF, then a plain equi-join on (user_id,
    window_start) — exactly the co-partitioning Flink's window join
    keys by, so Catalyst picks a single-shuffle-per-side SMJ/SHJ and
    AQE handles skewed users. Per-pair fan-out is bounded per (user,
    hour) bucket, never cross-window."""
    e = t(spark, sf_dir, "events")
    sides = []
    for etype in ("click", "purchase"):
        sides.append(
            e.filter(F.col("event_type") == etype).select(
                F.col("user_id"),
                F.window("ts", "1 hour")["start"].alias("window_start"),
                F.col("event_id").alias(f"{etype}_id"),
                F.col("value").alias(f"{etype}_value"),
            )
        )
    clicks, purchases = sides
    return clicks.join(purchases, ["user_id", "window_start"]).select(
        "window_start",
        "user_id",
        F.col("click_id"),
        F.col("purchase_id"),
        F.round(F.col("purchase_value") - F.col("click_value"), 4).alias(
            "value_delta"
        ),
    )


@register(
    "join_cogroup_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
           ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'click'), 0), 4) AS click_value,
           ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0), 4) AS purchase_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY window_start, user_id
    """,
)
def join_cogroup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] DataStream window coGroup —
    ``clicks.coGroup(purchases).where(u).equalTo(u).window(Tumbling 1h)
    .apply(CoGroupFunction)``: unlike the window join's inner pair
    fan-out, the CoGroupFunction receives BOTH sides' bags per (key,
    window) — including groups where one side is empty — and emits one
    row per group (here: per-side counts and value sums, zeros for the
    absent side).

    Spark-first: coGroup-then-aggregate does NOT need a full-outer
    join of two pre-aggregates — the union of both inputs through ONE
    conditional ``groupBy(user, window)`` with FILTER-style aggregates
    produces exactly the either-side-nonempty group set in a single
    shuffle with map-side partials (the two-agg + full-outer plan
    would shuffle twice and join). This is the general mapping for
    aggregating CoGroupFunctions; a bag-materializing CoGroupFunction
    would fall back to ``applyInPandas`` over the same key."""
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_c = F.col("event_type") == "click"
    is_p = F.col("event_type") == "purchase"
    return (
        e.groupBy(
            F.window("ts", "1 hour")["start"].alias("window_start"),
            "user_id",
        )
        .agg(
            F.count_if(is_c).alias("n_clicks"),
            F.count_if(is_p).alias("n_purchases"),
            F.round(
                F.coalesce(F.sum(F.when(is_c, F.col("value"))), F.lit(0.0)), 4
            ).alias("click_value"),
            F.round(
                F.coalesce(F.sum(F.when(is_p, F.col("value"))), F.lit(0.0)), 4
            ).alias("purchase_value"),
        )
    )


@register(
    "window_topn_batch",
    oracle="""
    WITH counted AS (
      SELECT date_trunc('hour', ts) AS window_start, user_id,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY window_start, user_id
    )
    SELECT window_start, user_id, cnt, CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY window_start ORDER BY cnt DESC, user_id) AS rn
          FROM counted)
    WHERE rn <= 3
    """,
)
def window_topn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[F] Flink SQL Window Top-N — ``ROW_NUMBER() OVER (PARTITION BY
    window_start ORDER BY cnt DESC)`` over a windowed aggregate, the
    documented "Window Top-N" pattern: the 3 most active users per
    1-hour tumbling window (deterministic tie-break on user_id).

    Spark-first: tumbling bucket via the native ``F.window`` TVF,
    count aggregate (map-side partials), then ``row_number`` over a
    window PARTITIONED by window_start — never an unpartitioned
    window, so both shuffles are keyed and the filter ``rn <= 3``
    collapses per-partition state immediately. At 100 TB the first
    aggregate reduces cardinality to (windows × active users) before
    the rank shuffle ever sees a row."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    counted = e.groupBy(
        F.window("ts", "1 hour")["start"].alias("window_start"), "user_id"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("window_start").orderBy(
        F.col("cnt").desc(), F.col("user_id")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("window_start", "user_id", "cnt", "rn")
    )


# Epoch-based mixture constants: cap epochs at 4 (the diminishing-
# returns bound for data-constrained repetition, Muennighoff et al.
# 2023), salt decoupled from every other deterministic sampler.
MIX_EPOCH_CAP = 4.0
MIX_EPOCH_SALT = "epochmix:"


@register(
    "data_mixture_epochs",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, n_docs,
             LEAST({MIX_EPOCH_CAP}, (SELECT MAX(n_docs) FROM counts) * 1.0 / n_docs)
               AS epochs
      FROM counts
    ),
    drawn AS (
      SELECT d.lang, r.n_docs, r.epochs,
             CAST(FLOOR(r.epochs) AS BIGINT)
               + CASE WHEN CAST(('0x' || substr(
                        md5('{MIX_EPOCH_SALT}' || CAST(d.doc_id AS VARCHAR)), 1, 8
                      )) AS BIGINT) / 4294967296.0 < r.epochs - FLOOR(r.epochs)
                      THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN rates r USING (lang)
    )
    SELECT lang, n_docs,
           ROUND(epochs, 6) AS target_epochs,
           CAST(SUM(n_copies) AS BIGINT) AS n_rows_out,
           ROUND(SUM(n_copies) * 1.0 / n_docs, 6) AS realized_epochs
    FROM drawn
    GROUP BY lang, n_docs, epochs
    """,
)
def data_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH-based mixture UPSAMPLING — the complement of the
    downsample-only `data_mixture_temperature`: every language is
    repeated up toward the LARGEST one (equal post-mix shares), with
    epochs capped at 4 (past ~4 repetitions, extra epochs of the same
    data stop helping — Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models"). Fractional epochs realize
    deterministically: every doc contributes floor(E) full copies and
    one extra copy iff its salted md5-prefix u32 draw falls under the
    fractional remainder — the portable `sample_deterministic_hash`
    device, so the SAME docs get the extra epoch on any engine and any
    run. Output per language: target vs realized epochs and the
    resulting row count.

    Scale shape: per-language counts are ONE tiny hash agg; epoch
    rates ride back as a broadcast join (≤ |langs| rows); the copy
    count is one JVM md5 + conv per row inside codegen; the audit agg
    is the same tiny shuffle. The actual corpus materialization would
    be `F.explode(F.sequence(1, n_copies))` map-side — row expansion
    AFTER every filter, never shuffled. No data-scale exchange beyond
    the two bounded aggs."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    nmax = counts.agg(F.max("n_docs").alias("n_max"))
    rates = counts.crossJoin(F.broadcast(nmax)).select(
        "lang",
        "n_docs",
        F.least(
            F.lit(MIX_EPOCH_CAP),
            F.col("n_max").cast("double") / F.col("n_docs"),
        ).alias("epochs"),
    )
    u01 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(MIX_EPOCH_SALT), F.col("doc_id").cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") / F.lit(4294967296.0)
    # bounded broadcast: ≤ |langs| rows by construction
    drawn = d.select("doc_id", "lang").join(F.broadcast(rates), "lang").select(
        "lang",
        "n_docs",
        "epochs",
        (
            F.floor(F.col("epochs")).cast("long")
            + (u01 < F.col("epochs") - F.floor(F.col("epochs"))).cast("long")
        ).alias("n_copies"),
    )
    return drawn.groupBy("lang", "n_docs", "epochs").agg(
        F.sum("n_copies").alias("n_rows_out"),
        F.round(F.sum("n_copies") / F.col("n_docs"), 6).alias("realized_epochs"),
    ).select(
        "lang",
        "n_docs",
        F.round(F.col("epochs"), 6).alias("target_epochs"),
        "n_rows_out",
        "realized_epochs",
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
      FROM documents
    ),
    shingles AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
      FROM docs WHERE len(w) >= 3
    ),
    per_doc AS (
      SELECT shingle, doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos
      FROM shingles GROUP BY shingle, doc_id
    ),
    attributed AS (
      SELECT *, MIN(doc_id) OVER (PARTITION BY shingle) AS first_doc
      FROM per_doc
    )
    SELECT doc_id,
           CAST(SUM(n_pos) AS BIGINT) AS n_shingles,
           CAST(COALESCE(SUM(n_pos) FILTER (WHERE first_doc = doc_id), 0) AS BIGINT)
             AS novel_shingles,
           ROUND(COALESCE(SUM(n_pos) FILTER (WHERE first_doc = doc_id), 0) * 1.0
                 / SUM(n_pos), 6) AS novelty
    FROM attributed
    GROUP BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram NOVELTY scoring (first-occurrence attribution): each
    word 3-gram is credited to the LOWEST doc_id containing it; a
    document's novelty is the fraction of its 3-gram occurrences it is
    the first to contribute. The incremental-curation signal ("what
    does this document add that the corpus does not already have")
    that ordered ingestion pipelines threshold on — boilerplate-heavy
    late arrivals score near 0, fresh content near 1.

    Scale shape (same aggregate discipline as `text_substring_dedup`):
    shingles explode map-side from a JVM word-array zip (no UDF); the
    first shuffle collapses to (shingle, doc) with occurrence counts;
    first-occurrence attribution is a MIN window PARTITIONED BY
    shingle over the collapsed set (one keyed shuffle — a shingle in
    10⁶ docs is one keyed MIN, never a pair join); the per-doc rollup
    is the third keyed shuffle. At 100 TB the ordered doc_id doubles
    as ingestion time, making this the standing novelty audit of a
    growing corpus."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    tri = F.expr(
        "transform(sequence(1, greatest(size(w) - 2, 0)),"
        " i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"
    )
    shingles = (
        d.select("doc_id", words.alias("w"))
        .filter(F.size("w") >= 3)
        .select("doc_id", F.explode(tri).alias("shingle"))
    )
    per_doc = shingles.groupBy("shingle", "doc_id").agg(
        F.count(F.lit(1)).alias("n_pos")
    )
    attributed = per_doc.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("shingle"))
    )
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), F.col("n_pos")))
    return attributed.groupBy("doc_id").agg(
        F.sum("n_pos").alias("n_shingles"),
        F.coalesce(novel, F.lit(0)).alias("novel_shingles"),
        F.round(F.coalesce(novel, F.lit(0)) / F.sum("n_pos"), 6).alias("novelty"),
    )


# Exact-substring dedup gram width (characters). 32 is the smallest
# power-of-two window that makes cross-document collisions of natural
# text overwhelmingly true duplication (Lee et al. 2022 use 50-token
# spans at corpus scale; chars here because the fixture documents are
# short).
SUBSTR_K = 32


@register(
    "text_substring_dedup",
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
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit (the Lee et al. 2022
    "Deduplicating Training Data" class, char-gram formulation): for
    every document, how many of its sliding 32-char windows also
    occur verbatim in ANOTHER document — the signal suffix-array
    substring dedup thresholds on. Emits docs with >= 1 cross-doc
    duplicated gram: total gram positions, duplicated positions, and
    the duplicated fraction.

    Spark-first scale shape: grams explode MAP-SIDE (transform +
    explode, no UDF); the first shuffle collapses to (gram, doc_id)
    with position counts — so a gram repeated inside one doc is ONE
    row; cross-doc support comes from a count window PARTITIONED BY
    gram over that collapsed set (aggregate-shaped: a boilerplate gram
    shared by 10^6 docs is 10^6 rows through one keyed count, never a
    pair enumeration — the all-pairs blow-up suffix arrays suffer is
    structurally absent); the final per-doc rollup is the third keyed
    shuffle. Total grams per doc is closed-form (n_chars - K + 1), so
    no join back to the corpus. At 100 TB you'd hash grams to 16-byte
    fingerprints before the shuffle; kept as raw strings here so the
    DuckDB oracle pins the exact gram semantics."""
    # length(text) throughout — never the n_chars METADATA column, so
    # the gram set, the filter, and the denominator stay consistent
    # even on data where the column has drifted from the text
    # (review finding r10: the sf1 probe's replica-tagged docs). The
    # denominator does NOT ride the explode: carrying any extra
    # column there either drags the full text string through every
    # gram row or (array-first) triggers a generator-emptiness scan
    # filter that rebuilds the gram array per doc — both measured at
    # ~1.4-1.5× wall. Instead the hot path explodes (doc_id, gram)
    # only, and per-doc gram totals come from a SECOND column-pruned
    # docs scan joined to the (small) duplicated-doc rollup.
    from hello_flink_spark.operators.scale import spread_small_scan

    # The map-side gram explode is the dominant term; spread the
    # narrow (doc_id, text) feed across cores when the scan arrives
    # under-split (r12: 3.5 s -> 1.1 s at sf0.1 — the explode ran on
    # ONE core otherwise; a no-op on many-split cluster scans).
    d = spread_small_scan(
        t(spark, sf_dir, "documents").filter(F.length("text") >= SUBSTR_K)
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {SUBSTR_K - 1}),"
                f" i -> substring(text, i, {SUBSTR_K}))"
            )
        ).alias("gram"),
    )
    # r17 (guide §2.4 "share one exchange"): partition the gram stream
    # by gram ONCE — hashpartitioning(gram) satisfies the clustered
    # distribution of BOTH the (gram, doc_id) aggregate and the
    # count window partitioned by gram, so the old plan's two
    # instance-scale exchanges (partial-agged shuffle by (gram,
    # doc_id), then a re-shuffle of the collapsed set by gram) fuse
    # into one. Map-side partial aggregation is lost, but a 32-char
    # gram almost never repeats within one document, so the partials
    # collapsed next to nothing — the bytes moved are ~identical and
    # one full exchange of the collapsed table disappears.
    pdg = (
        grams.repartition("gram")
        .groupBy("gram", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_pos"))
    )
    from pyspark.sql.window import Window

    flagged = pdg.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("gram"))
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
