"""Structured Streaming topologies — SURVEY §2.9 (time windows) and
§2.10 (watermarks, late data, dedup, joins) streaming twins, plus the
streaming sources/sinks of §2.1 (rate, socket, kafka stub, console,
memory, parquet, foreachBatch).

Each builder takes an (unbounded) DataFrame and returns the
transformed streaming DataFrame; sink helpers attach a writer. Golden
tests in tests/test_streaming.py replay the events fixture through
these with ``Trigger.AvailableNow`` and compare against the batch
shadows declared in queries/timewindows.py — same grouping
expressions, so batch == final streaming state by construction
(SURVEY §5.3).

[F] Flink surface per topology in docstrings — empty reference
checkout (SURVEY §0); anchors are SURVEY.md §2.9–2.10 rows.

100 TB notes: every stateful op carries a watermark so state is
bounded (SURVEY §4.2); state lives in RocksDB (session factory);
stream-static joins broadcast the dim side; stream-stream joins carry
watermarks + a time band on BOTH sides so join state evicts.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

DEFAULT_WATERMARK = "30 minutes"


# ---------------------------------------------------------------------------
# §2.9 windowed aggregations (streaming twins of the batch shadows)
# ---------------------------------------------------------------------------


def tumbling_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """[F] TumblingEventTimeWindows.of(10 min) — watermark_bounded +
    late_drop come with the watermark: rows older than it never reach
    the window state. Twin of queries/timewindows.py::window_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
    )


def tumbling_offset_counts(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """[F] TumblingEventTimeWindows.of(size, offset) — streaming twin of
    queries/timewindows.py::window_tumbling_offset (same 10-min windows
    shifted +5 min; the timezone-alignment mechanism under watermarks)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.end").alias("window_end"), "cnt")
    )


def sliding_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """[F] SlidingEventTimeWindows.of(10 min, 5 min). Twin of window_sliding."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
    )


def session_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """[F] EventTimeSessionWindows.withGap(30 min). Twin of window_session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "cnt", "total_value")
    )


def session_counts_dynamic(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """[F] SessionWindowTimeGapExtractor: dynamic per-event session gap
    (60 min after a purchase, 30 min otherwise) — session_window takes
    a Column gap in streaming too. Twin of
    queries/timewindows.py::window_session_dynamic."""
    gap = F.when(F.col("event_type") == "purchase", "60 minutes").otherwise("30 minutes")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("user_id", F.col("w.start").alias("session_start"), "cnt")
    )


def cumulate_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """[F] Flink SQL CUMULATE TVF (span 1 h, step 15 min) — streaming
    twin of queries/timewindows.py::window_cumulate.

    No native cumulate in Structured Streaming; union-of-k-tumbling
    fails for the 45-min step (not hour-aligned as a tumbling size).
    Instead each event is exploded STATELESSLY into its expanding
    windows at ingest: for step k the event gets a synthetic step_ts
    one second before that window's end, so a plain 15-minute tumbling
    aggregation over step_ts yields w.end == the cumulate window_end.
    State cost is the same as tumbling (per-open-window aggregates);
    the ≤4x row expansion happens before the shuffle where map-side
    partial aggregation absorbs it.
    """
    ep = F.col("ts").cast("long")
    hour_start = ep - (ep % 3600)
    first_k = ((ep % 3600) / 900).cast("long") + 1
    return (
        events.withColumn("k", F.explode(F.sequence(first_k, F.lit(4))))
        .withColumn("step_ts", F.timestamp_seconds(hour_start + F.col("k") * 900 - 1))
        .withWatermark("step_ts", watermark)
        .groupBy(F.window("step_ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.end").alias("window_end"), "event_type", "cnt")
    )


def running_totals(events: DataFrame) -> DataFrame:
    """[F] unbounded group-agg on a dynamic table (retract stream) —
    SURVEY §2.4 agg_incremental: per-user running count/sum, update
    output mode re-emits changed keys each micro-batch."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("event_cnt"), F.round(F.sum("value"), 2).alias("total_value")
    )


def count_min_cells(events: DataFrame) -> DataFrame:
    """Streaming count-min sketch — the §2.12 sketch ladder's
    frequency member as a live stream (twin of the declared
    agg_count_min): explode each event into CM_DEPTH (d, bucket)
    cells with the same portable md5-prefix hash, then an update-mode
    running count per cell. The sketch IS a plain streaming
    aggregation over a CONSTANT 4x256 cell space, so state is bounded
    by the sketch dimensions, not the stream — the whole point of
    sketching an unbounded stream. Probe: est(key) = min over d of
    cell(d, h_d(key)); golden-tested cell-exact vs the batch sketch.
    """
    from hello_flink_spark.queries.round6 import CM_DEPTH, CM_WIDTH_HEX

    cells = events.select(
        F.explode(F.sequence(F.lit(0), F.lit(CM_DEPTH - 1))).alias("d"), "user_id"
    ).withColumn(
        "bucket",
        F.substring(
            F.md5(F.concat_ws(":", F.col("d"), F.col("user_id"))), 1, CM_WIDTH_HEX
        ),
    )
    return cells.groupBy("d", "bucket").agg(F.count("*").alias("s"))


def rolling_wau_hll(events: DataFrame) -> DataFrame:
    """Streaming rolling 7-day active users via mergeable HLL sketches
    — the streaming twin of events_rolling_active_users with the
    distinct-count swapped for the sketch the 100 TB path needs
    (COUNT(DISTINCT) is not partial-aggregable; HLL union is
    order-independent, so batch == streaming-final exactly).
    Pipeline: stateful (user, day) dedup, the bounded ×7 contribution
    explode, then an update-mode hll_sketch_agg per report day. State:
    one dedup row per (user, active-day) + 7 sketches per day — the
    sketch side is constant-size per key."""
    ud = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).dropDuplicates(["user_id", "day"])
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select(
        "user_id",
        F.timestamp_add("DAY", F.col("off"), F.col("day")).alias("report_day"),
    )
    return contrib.groupBy("report_day").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("wau_est")
    )


def running_quantiles(events: DataFrame) -> DataFrame:
    """Streaming quantile sketch — the RANK member completing the
    streaming sketch family (count_min_cells = frequency,
    rolling_wau_hll = distinct, this = quantiles): per-type live
    p50/p90/p99 of event value as an update/complete-mode aggregation.
    ApproximatePercentile keeps one mergeable epsilon-summary
    (Greenwald-Khanna) per event_type, so state is bounded by the type
    alphabet × sketch size, never the stream — the only way to
    quantile an unbounded stream, exactly like the batch op's
    100 TB argument (agg_approx_quantile_merge, the declared twin —
    both run the SHARED queries/round6.py::value_quantiles plan, so
    the golden-tested equality holds by construction)."""
    from hello_flink_spark.queries.round6 import value_quantiles

    return value_quantiles(events)


def stream_temporal_join(probes: DataFrame, dim: DataFrame) -> DataFrame:
    """[F] Flink's event-time temporal table join on the STREAM side:
    unbounded probe rows enriched with the static versioned dimension
    AS OF each probe's own event time. Spark accepts the validity-range
    residual in a stream-static join because only the probe side is
    unbounded — the dim snapshot is broadcast/hashed per micro-batch.
    Golden-tested equal to the declared batch query
    (queries/round6.py::join_temporal_table) on a replayed probe
    stream. For a CHANGING dim, the Spark-model equivalents are the
    broadcast-rules foreachBatch job (dynamic_rules_foreach_batch) or
    a stream-stream interval join; documented in docs/SEMANTICS.md."""
    from hello_flink_spark.operators.joins import temporal_join

    return temporal_join(
        probes, dim, key="cust_key", probe_key="o_custkey", probe_ts="o_orderdate"
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("status").alias("status_asof"),
        "valid_from",
    )


# ---------------------------------------------------------------------------
# §2.10 dedup / joins
# ---------------------------------------------------------------------------


def with_observed_metrics(df: DataFrame, name: str = "metrics") -> DataFrame:
    """[F] Flink operator metrics (numRecordsIn / custom counters) →
    Spark's `observe`: named aggregate metrics evaluated per
    micro-batch and surfaced in StreamingQueryProgress.observedMetrics
    — the monitoring hook a production job wires to its metrics sink.
    Zero extra passes: the aggregates ride the existing plan."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


def json_payload_counts(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """[F] the canonical Kafka-consumer pattern: a JSON string payload
    parsed with an explicit schema mid-stream (`from_json`), then a
    watermarked windowed aggregation on a parsed field. Here the
    payload is events.props ('{"k": N}') → bucket k % 10 → 30-min
    tumbling counts. Malformed payloads become NULL structs (from_json
    PERMISSIVE default) and land in the NULL bucket rather than
    killing the query."""
    parsed = events.withColumn(
        "payload", F.from_json(F.col("props"), "k long")
    ).withColumn("k_bucket", F.pmod(F.col("payload.k"), F.lit(10)))
    return (
        parsed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "30 minutes").alias("w"), "k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "k_bucket", "cnt")
    )


def dedup_events(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """[F] Flink SQL dedup (ROW_NUMBER()=1 over rowtime) →
    dropDuplicatesWithinWatermark: exactly-once per event_id within the
    watermark horizon; state for seen ids evicts with the watermark
    (bounded — the 100 TB requirement)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def dedup_documents_stream(
    docs: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Streaming exact dedup for a document firehose (the ingest edge
    of the LLM pipeline): key = sha2 of normalized text, kept
    exactly-once within the watermark horizon via
    dropDuplicatesWithinWatermark — state holds one hash per UNIQUE
    document and evicts with the watermark, so an unbounded crawl
    stream cannot grow state without bound. Expects an event-time
    column ``ingest_ts`` on the stream."""
    return (
        docs.withColumn("norm_hash", F.sha2(F.lower(F.trim(F.col("text"))), 256))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["norm_hash"])
    )


def stream_static_join(events: DataFrame, dim: DataFrame) -> DataFrame:
    """[F] lookup join (LookupTableSource): per-record enrichment against
    a static dim snapshot — broadcast hash join per micro-batch."""
    return events.join(F.broadcast(dim), "event_type")


def stream_window_join(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """[F] DataStream window join —
    ``clicks.join(purchases).where(u).equalTo(u).window(TumblingEventTimeWindows
    .of(Time.hours(1)))``: same-user (click, purchase) pairs inside the
    SAME 1-hour tumbling bucket — bucket MEMBERSHIP, not the interval
    join's ±band (two events 1 s apart across a boundary do not join).
    Both sides are watermarked and equi-join on (user_id, window), so
    the micro-batch planner evicts a bucket's join state once the
    watermark passes its end — the same per-window state lifetime
    Flink's window join has. Twin of
    queries/round10.py::join_window_batch (hash-verified vs DuckDB);
    golden-matched row-for-row in tests/test_streaming.py."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            F.window("ts", "1 hour").alias("w"),
            F.col("event_id").alias("click_id"),
            F.col("value").alias("click_value"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.window("ts", "1 hour").alias("p_w"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user_id) & (clicks.w == purchases.p_w),
    ).select(
        F.col("w.start").alias("window_start"),
        "user_id",
        "click_id",
        "purchase_id",
        F.round(F.col("purchase_value") - F.col("click_value"), 4).alias(
            "value_delta"
        ),
    )


def stream_cogroup_window(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """[F] DataStream window coGroup —
    ``clicks.coGroup(purchases).where(u).equalTo(u).window(Tumbling 1h)
    .apply(CoGroupFunction)`` (VERDICT r10 #4): one row per (user,
    window) group holding BOTH sides' bags — INCLUDING groups where
    one side is empty, the contract that separates coGroup from the
    window join's inner pair fan-out.

    Spark-first mapping, identical to the batch shadow
    (queries/round10.py::join_cogroup_window, hash-verified): the
    union of both inputs through ONE watermarked windowed aggregation
    with FILTER-style conditional aggregates. A (user, window) group
    with only clicks emits n_purchases=0 — no outer join needed,
    because group EXISTENCE comes from the union, not from either
    side. One keyed shuffle with map-side partials; window state
    evicts with the watermark exactly like the plain tumbling agg.
    Golden-matched row-for-row (one-side-empty groups included) in
    tests/test_streaming.py."""
    e = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).withWatermark("ts", watermark)
    is_c = F.col("event_type") == "click"
    is_p = F.col("event_type") == "purchase"
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
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
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_clicks",
            "n_purchases",
            "click_value",
            "purchase_value",
        )
    )


def stream_stream_interval_join(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """[F] KeyedStream#intervalJoin(...).between(0, 30 min): clicks
    joined to same-user purchases within the next 30 minutes. Both
    sides watermarked + both-sided time band → join state evicts.
    Twin of queries/relational.py::join_interval_batch."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts >= clicks.c_ts)
        & (purchases.p_ts <= clicks.c_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    return clicks.join(purchases, cond).select("user_id", "c_ts", "p_ts")


def stream_stream_left_outer_join(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """[F] Table API windowed LEFT OUTER stream-stream join: every click
    paired with same-user purchases in the next 30 minutes, clicks with
    no purchase emitted with NULL p_ts once the watermark has passed
    their match window (so the engine can prove no match will arrive).
    Same state-eviction bounds as the inner variant; the extra
    capability is the watermark-gated NULL emission.

    Caveat (documented Spark semantics): a click's NULL row is emitted
    only after a later micro-batch advances the watermark past
    ``c_ts + 30 min``; clicks near the end of a bounded replay stay in
    state when the stream ends. The golden test asserts exactly that
    split: matched rows equal the batch join, emitted NULL rows are
    precisely the batch anti-join rows old enough to be closed."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts >= clicks.c_ts)
        & (purchases.p_ts <= clicks.c_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    return clicks.join(purchases, cond, "leftOuter").select("user_id", "c_ts", "p_ts")


def stream_stream_full_outer_join(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """[F] Table API windowed FULL OUTER stream-stream join — completes
    the inner / left-outer / full-outer family: clicks and same-user
    purchases matched within the next 30 minutes; watermark-closed rows
    from EITHER side emit with NULLs for the other (unmatched clicks →
    NULL p_ts, unmatched purchases → NULL c_ts). Both sides carry the
    both-sided time band, so join state evicts on both inputs — same
    bounds as the inner variant. Shares the left-outer caveat: NULL
    rows emit only once a later micro-batch's watermark closes the
    window, so tail rows of a bounded replay stay in state at EOF (the
    golden test asserts the matched rows equal the batch inner join
    and every emitted NULL row is a watermark-closed batch anti-join
    row, on both sides)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts >= clicks.c_ts)
        & (purchases.p_ts <= clicks.c_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    return clicks.join(purchases, cond, "fullOuter").select(
        "user_id", "p_user_id", "c_ts", "p_ts"
    )


def dynamic_rules_foreach_batch(
    rules_path: str, out_dir: str
) -> Callable[[DataFrame, int], None]:
    """[F] Broadcast state pattern (`MapStateDescriptor` +
    `BroadcastProcessFunction`): a control stream of rules broadcast to
    every task so the data stream is evaluated against the CURRENT
    rule set. Spark has no broadcast-state primitive; the micro-batch
    expression re-snapshots the (small) rules table at every batch and
    broadcast-joins it, so a rule update takes effect at the next
    micro-batch boundary (batch-quantized control propagation, same
    class of delta as SURVEY §4.4 #3/#4).

    Rules schema: ``event_type string, min_value double, rule_rev
    long``. Emits matching events tagged with the applied rule_rev and
    batch_id, appended to ``out_dir`` — so tests (and audits) can prove
    WHICH revision filtered each batch. Attach with
    ``to_foreach_batch``; checkpoint-resume keeps exactly-once over
    rule changes."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        rules = spark.read.parquet(rules_path)
        (
            batch.join(F.broadcast(rules), "event_type")
            .filter(F.col("value") >= F.col("min_value"))
            .withColumn("batch_id", F.lit(batch_id))
            .select("event_id", "event_type", "value", "rule_rev", "batch_id")
            .write.mode("append")
            .parquet(out_dir)
        )

    return fn


def late_split_foreach_batch(
    on_time_dir: str,
    late_dir: str,
    allowed_lateness: str = "30 minutes",
) -> Callable[[DataFrame, int], None]:
    """[F] sideOutputLateData(OutputTag) — Spark has no native late-data
    side output (SURVEY §4.4), so this is the documented foreachBatch
    approximation: track the max event time seen across batches and
    fan each micro-batch out to on-time/late parquet sinks. Returns
    the foreachBatch function; attach with ``to_foreach_batch``.

    Restart safety: the max-event-time watermark lives driver-side, not
    in the streaming checkpoint, so on the first batch after a (re)start
    it is rehydrated from max(ts) of whatever the on-time/late sinks
    already hold — recovered runs keep tagging late rows instead of
    resetting to "everything is on time" (ADVICE r02)."""
    state: dict = {"max_ts": None, "rehydrated": False}
    lateness = F.expr(f"INTERVAL {allowed_lateness}")

    def handle(batch: DataFrame, _batch_id: int) -> None:
        if not state["rehydrated"]:
            state["rehydrated"] = True
            for path in (on_time_dir, late_dir):
                if os.path.exists(path):
                    row = batch.sparkSession.read.parquet(path).agg(F.max("ts").alias("m")).head()
                    if row.m is not None and (state["max_ts"] is None or row.m > state["max_ts"]):
                        state["max_ts"] = row.m
        prev_max = state["max_ts"]
        stats = batch.agg(F.max("ts").alias("m")).head()
        if prev_max is None:
            tagged = batch.withColumn("is_late", F.lit(False))
        else:
            tagged = batch.withColumn("is_late", F.col("ts") < (F.lit(prev_max) - lateness))
        tagged.filter(~F.col("is_late")).drop("is_late").write.mode("append").parquet(on_time_dir)
        tagged.filter(F.col("is_late")).drop("is_late").write.mode("append").parquet(late_dir)
        if stats.m is not None and (prev_max is None or stats.m > prev_max):
            state["max_ts"] = stats.m

    return handle


# ---------------------------------------------------------------------------
# §2.1 streaming sources
# ---------------------------------------------------------------------------


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """[F] datagen connector / DataGeneratorSource: synthetic ticking
    source (timestamp, value) for demos and load tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumn("bucket", F.col("value") % 10)
    )


def socket_source(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """[F] env.socketTextStream — the canonical Flink WordCount source.
    Builder only (no socket server in the test environment); the
    returned plan is start()-able wherever a server exists."""
    return spark.readStream.format("socket").option("host", host).option("port", port).load()


def kafka_source_stub(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """[F] KafkaSource — interface-compatible stub (SURVEY §2.1: no
    broker in this environment, and the kafka-sql connector jar is not
    bundled). Builds the canonical reader; raises with a clear message
    if the connector is genuinely unavailable at analysis time."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    try:
        df = reader.load()
    except Exception as exc:  # noqa: BLE001 — connector jar absent
        raise NotImplementedError(
            "kafka connector not available in this environment; "
            "ship spark-sql-kafka-0-10 with the real deployment"
        ) from exc
    return df.select(
        F.col("key").cast("string"), F.col("value").cast("string"), "topic", "timestamp"
    )


# ---------------------------------------------------------------------------
# §2.1 streaming sinks
# ---------------------------------------------------------------------------


def to_memory_sink(
    df: DataFrame, name: str, output_mode: str = "append", available_now: bool = True
) -> StreamingQuery:
    """[F] CollectSink (test sink): memory table, the golden-test basis."""
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def to_console_sink(df: DataFrame, output_mode: str = "append") -> StreamingQuery:
    """[F] DataStream#print — the tutorial console sink."""
    return (
        df.writeStream.format("console")
        .outputMode(output_mode)
        .option("numRows", 20)
        .trigger(availableNow=True)
        .start()
    )


def to_parquet_sink(df: DataFrame, path: str, checkpoint: str) -> StreamingQuery:
    """[F] FileSink: append-mode partitioned parquet with a checkpoint —
    the exactly-once file sink (offset WAL + atomic file manifest)."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def to_foreach_batch(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """[F] retract/upsert sinks (JdbcSink.upsert): per-batch custom sink —
    the fidelity path for changelog semantics (SURVEY §4.4: Spark has
    no retractions; foreachBatch + MERGE emulates keyed upserts)."""
    return (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def windowed_topn_foreach_batch(
    target_dir: str, n: int = 3
) -> Callable[[DataFrame, int], None]:
    """[F] Flink SQL windowed Top-N (rank over window aggregate,
    continuously maintained): Structured Streaming forbids rank
    functions on a streaming aggregate, so the pattern is complete-mode
    aggregation + foreachBatch — each micro-batch holds the FULL
    aggregate state, rank it per window, overwrite the materialized
    top-N. The sink always shows the current top-N per window, exactly
    like Flink's retractable Top-N view."""

    def handle(batch: DataFrame, _batch_id: int) -> None:
        w = Window.partitionBy("window_start").orderBy(
            F.col("cnt").desc(), F.col("event_type")
        )
        top = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )
        top.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_dir)

    return handle


def upsert_by_key_foreach_batch(
    target_dir: str, key: str = "user_id", version_col: str | None = None
) -> Callable[[DataFrame, int], None]:
    """foreachBatch upsert: keep only the latest row per key in a
    parquet 'table' (full-file MERGE emulation — a real deployment
    would target Delta/Iceberg MERGE INTO).

    "Latest" must be deterministic (ADVICE r02): pass ``version_col``
    to pick the max-version row per key within a batch. Without it the
    batch must carry at most ONE row per key — true for update-mode
    aggregations, which emit one changed row per key per micro-batch —
    and the handler raises if that precondition is violated rather than
    upserting an arbitrary row.

    Retraction fidelity under OUT-OF-ORDER arrival (VERDICT r06 #3):
    with ``version_col`` the MERGE compares against the EXISTING table
    row too — ``WHEN MATCHED AND source.version > target.version THEN
    UPDATE`` — so a late update arriving after its key was already
    merged with a newer version is a no-op instead of silently
    clobbering newer data (the bug class Flink's -U/+U retractions
    prevent by construction). Golden-tested equal to the batch MERGE
    twin on an out-of-order replay (test_stream_upsert_merge_*).
    Without ``version_col`` the batch row wins unconditionally — the
    correct contract for update-mode aggregates, whose every emission
    supersedes the previous state by construction."""

    def handle(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        if version_col is not None:
            # Deterministic tie within a batch (ADVICE r07): two rows
            # with EQUAL versions for one key must pick the same winner
            # on every replay — order by the full-row fingerprint after
            # version (to_json handles map/array/binary columns that a
            # raw multi-column sort could not).
            row_fp = F.xxhash64(F.to_json(F.struct(*batch.columns)))
            w = Window.partitionBy(key).orderBy(
                F.col(version_col).desc(), row_fp.asc()
            )
            batch = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        elif not batch.groupBy(key).count().filter(F.col("count") > 1).isEmpty():
            raise ValueError(
                f"upsert batch has multiple rows per {key!r} and no version_col; "
                "pass version_col to define which row wins"
            )
        if os.path.exists(target_dir):
            existing = spark.read.parquet(target_dir)
            if version_col is not None:
                # MERGE with version guard: max-version row per key
                # across existing ∪ batch (ties keep the existing row —
                # a replayed identical version must be idempotent)
                wv = Window.partitionBy(key).orderBy(
                    F.col(version_col).desc(), F.col("__src").asc()
                )
                merged = (
                    existing.withColumn("__src", F.lit(0))
                    .unionByName(batch.withColumn("__src", F.lit(1)))
                    .withColumn("__rn", F.row_number().over(wv))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn", "__src")
                )
            else:
                merged = existing.join(
                    batch.select(key), on=key, how="left_anti"
                ).unionByName(batch)
        else:
            merged = batch
        # localCheckpoint materializes BEFORE the overwrite truncates the
        # input files (classic read-overwrite hazard).
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_dir)

    return handle
