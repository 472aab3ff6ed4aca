"""Measure sustained Structured Streaming throughput on this machine
and write docs/STREAMING.md. Two probes, each at TWO key
cardinalities (VERDICT r12 #6 — the state-store axis a 100 TB
deployment actually stresses is KEY count, not row rate):

1. JVM stateful pipeline: rate source -> event-time watermark -> 10 s
   tumbling window x K-key aggregation -> memory sink (shuffle +
   state store, whole-stage codegen end to end), K in {100, 1000}.
2. Reorder-buffered Python stateful op (VERDICT r08 #6): the same
   rate source driving ``stateful_value_ewma`` — Arrow transfer into
   applyInPandasWithState, per-key watermark-delay reorder buffer
   (sort + held rows), EWMA fold, state round-trip — K in
   {1000, 10000}. This prices what the buffer + Python state path
   costs relative to probe 1, and what a key decade costs each path.

The rate source is asked for more rows/s than the pipeline can absorb
so it runs saturated; the reported number is the median
processedRowsPerSecond over the steady-state micro-batches.

Run: python scripts/streaming_throughput.py [seconds]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RUN_S = int(sys.argv[1]) if len(sys.argv) > 1 else 30
TARGET_ROWS_PER_S = 5_000_000
JVM_KEYS = (100, 1_000)  # base + one decade in state cardinality
# the Python-stateful path is 1-2 orders slower than the JVM pipeline;
# a saturating-but-not-explosive target keeps batch sizes sane
EWMA_TARGET_ROWS_PER_S = 2_000_000
EWMA_KEYS = (1_000, 10_000)  # base + one decade
EWMA_DELAY = "2 seconds"  # reorder horizon: releases happen in-probe


def _measure(q, run_s):
    time.sleep(run_s)
    progress = list(q.recentProgress)
    try:  # stopping a saturated query mid-batch surfaces the batch's
        # interruption as an exception — the measurements are already
        # collected, so a noisy stop must not kill the probe
        q.stop()
    except Exception as e:  # noqa: BLE001
        print(f"(query stop raised: {type(e).__name__} — ignored)")
    active = [
        p
        for p in progress
        if p.get("processedRowsPerSecond") and p["numInputRows"] > 0
    ]
    rates = [p["processedRowsPerSecond"] for p in active]
    latencies = [
        p["durationMs"]["triggerExecution"]
        for p in active
        if p.get("durationMs", {}).get("triggerExecution") is not None
    ]
    # drop the warm-up batches (first quarter)
    steady = rates[max(1, len(rates) // 4):] or rates
    steady_lat = latencies[max(1, len(latencies) // 4):] or latencies
    med = statistics.median(steady) if steady else float("nan")
    med_lat = statistics.median(steady_lat) if steady_lat else float("nan")
    return med, med_lat, max(steady, default=float("nan")), len(steady)


def probe_jvm(spark, keys: int):
    """Probe 1 at ``keys`` state-store groups per window."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", TARGET_ROWS_PER_S)
        .option("numPartitions", 8)
        .load()
        .withWatermark("timestamp", "10 seconds")
        .groupBy(
            F.window("timestamp", "10 seconds"),
            (F.col("value") % keys).alias("k"),
        )
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(f"throughput_probe_{keys}")
        .outputMode("update")
        .start()
    )
    return _measure(q, RUN_S)


def probe_ewma(spark, keys: int):
    """Probe 2 at ``keys`` reorder-buffer/state keys."""
    from pyspark.sql import functions as F

    from hello_flink_spark.streaming.stateful import stateful_value_ewma

    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", EWMA_TARGET_ROWS_PER_S)
        .option("numPartitions", 8)
        .load()
        .select(
            (F.col("value") % keys).alias("user_id"),
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 97).cast("double").alias("value"),
        )
    )
    q = (
        stateful_value_ewma(events, delay=EWMA_DELAY)
        .writeStream.format("memory")
        .queryName(f"throughput_probe_ewma_{keys}")
        .outputMode("update")
        .start()
    )
    return _measure(q, RUN_S)


def main() -> None:
    from hello_flink_spark.session import get_spark

    spark = get_spark("streaming-throughput")

    jvm = {}
    for k in JVM_KEYS:
        jvm[k] = probe_jvm(spark, k)
        print(f"jvm keys={k}: median={jvm[k][0]:,.0f} rows/s "
              f"latency={jvm[k][1]:,.0f} ms ({jvm[k][3]} batches)")
    ewma = {}
    for k in EWMA_KEYS:
        ewma[k] = probe_ewma(spark, k)
        print(f"ewma keys={k}: median={ewma[k][0]:,.0f} rows/s "
              f"latency={ewma[k][1]:,.0f} ms ({ewma[k][3]} batches)")

    (med, med_lat, peak, batches) = jvm[JVM_KEYS[0]]
    (med2, med_lat2, peak2, batches2) = ewma[EWMA_KEYS[0]]
    jvm_decade = jvm[JVM_KEYS[1]][0] / med if med else float("nan")
    ewma_decade = ewma[EWMA_KEYS[1]][0] / med2 if med2 else float("nan")

    doc = Path(__file__).resolve().parent.parent / "docs" / "STREAMING.md"
    # preserve the hand-written Kafka deployment recipe (round 7) across
    # probe regens — only the probe section above it is generated
    tail = ""
    if doc.exists():
        old = doc.read_text()
        marker = "# Kafka deployment recipe"
        if marker in old:
            tail = "\n" + old[old.index(marker):]
    doc.write_text(
        "# Streaming throughput probe (generated — "
        "scripts/streaming_throughput.py)\n\n"
        "Saturated rate source through a STATEFUL pipeline (event-time\n"
        f"watermark, 10 s tumbling window x {JVM_KEYS[0]} keys, "
        "update-mode state\n"
        "store) on local[32]:\n\n"
        f"- sustained throughput (median of {batches} steady-state "
        f"micro-batches over ~{RUN_S} s): **{med:,.0f} rows/s**\n"
        f"- peak micro-batch rate: {peak:,.0f} rows/s\n"
        f"- median micro-batch latency (triggerExecution): "
        f"**{med_lat:,.0f} ms**\n\n"
        "## Reorder-buffered Python stateful op (VERDICT r08 #6)\n\n"
        "Same machine, same rate source driving `stateful_value_ewma`\n"
        f"({EWMA_KEYS[0]} keys, `{EWMA_DELAY}` watermark delay = reorder\n"
        "horizon): Arrow into applyInPandasWithState, per-key buffer\n"
        "sort + strict `ts < cutoff` release, EWMA fold, state\n"
        "round-trip:\n\n"
        f"- sustained throughput (median of {batches2} steady-state "
        f"micro-batches): **{med2:,.0f} rows/s**\n"
        f"- peak micro-batch rate: {peak2:,.0f} rows/s\n"
        f"- median micro-batch latency: **{med_lat2:,.0f} ms**\n\n"
        "The gap vs the JVM probe is the measured price of the Python\n"
        "state path (Arrow transfer + pandas grouping + buffer sort +\n"
        "state encode/decode), not of the reorder logic alone; the\n"
        "buffer holds <= delay x per-key rate rows regardless of\n"
        "stream length. Use the JVM built-ins when the op is\n"
        "expressible; the reorder-buffered tier is for order-sensitive\n"
        "recurrences that are not.\n\n"
        "## Key-cardinality decade (VERDICT r12 #6)\n\n"
        "Same row rate, 10x the STATE KEYS — the axis a 100 TB\n"
        "deployment stresses (state-store size and per-batch group\n"
        "count), measured this run:\n\n"
        "| probe | keys | median rows/s | median latency | keys | "
        "median rows/s | median latency | decade ratio |\n"
        "|---|---|---|---|---|---|---|---|\n"
        f"| JVM window agg | {JVM_KEYS[0]} | {med:,.0f} | "
        f"{med_lat:,.0f} ms | {JVM_KEYS[1]:,} | {jvm[JVM_KEYS[1]][0]:,.0f} "
        f"| {jvm[JVM_KEYS[1]][1]:,.0f} ms | {jvm_decade:.2f}x |\n"
        f"| Python EWMA (reorder-buffered) | {EWMA_KEYS[0]:,} | "
        f"{med2:,.0f} | {med_lat2:,.0f} ms | {EWMA_KEYS[1]:,} | "
        f"{ewma[EWMA_KEYS[1]][0]:,.0f} | {ewma[EWMA_KEYS[1]][1]:,.0f} ms "
        f"| {ewma_decade:.2f}x |\n\n"
        "Both paths hold their throughput within normal run variance\n"
        "across the key decade when the ratio is near 1.0: state is\n"
        "hash-partitioned, so 10x keys spreads over the same partitions\n"
        "and per-batch work stays row-bound, not key-bound. A future\n"
        "ratio well under the recorded floor (BASELINE.md: 0.5x for\n"
        "either path) would mean per-key overhead (state-store lookups,\n"
        "pandas group dispatch) has become the bottleneck.\n\n"
        "Scale note: these are ONE machine's numbers; both plans\n"
        "distribute by key shuffle, so cluster throughput scales with\n"
        "executors until the state store or sink saturates. Latency is\n"
        "micro-batch-quantized (SURVEY §4.4) — this probe measures\n"
        "throughput, not per-event latency.\n" + tail
    )
    print(
        f"jvm median={med:,.0f} rows/s latency={med_lat:,.0f} ms "
        f"({batches} batches); ewma median={med2:,.0f} rows/s "
        f"latency={med_lat2:,.0f} ms ({batches2} batches); "
        f"key-decade ratios jvm={jvm_decade:.2f}x ewma={ewma_decade:.2f}x "
        f"-> {doc}"
    )


if __name__ == "__main__":
    main()
