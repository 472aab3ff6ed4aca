"""Measure sustained Structured Streaming throughput on this machine
and write docs/STREAMING.md: rate source -> event-time watermark ->
10 s tumbling window x 100-key aggregation -> memory sink, i.e. a
realistic stateful pipeline (shuffle + state store), not a pass-through.

The rate source is asked for more rows/s than one machine can emit so
the pipeline runs saturated; the reported number is the median
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


def main() -> None:
    from pyspark.sql import functions as F

    from hello_flink_spark.session import get_spark

    spark = get_spark("streaming-throughput")
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", TARGET_ROWS_PER_S)
        .option("numPartitions", 8)
        .load()
        .withWatermark("timestamp", "10 seconds")
        .groupBy(F.window("timestamp", "10 seconds"), (F.col("value") % 100).alias("k"))
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("throughput_probe")
        .outputMode("update")
        .start()
    )
    time.sleep(RUN_S)
    progress = list(q.recentProgress)
    q.stop()

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
    med = statistics.median(steady)
    med_lat = statistics.median(steady_lat) if steady_lat else float("nan")
    batches = len(steady)

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
        "watermark, 10 s tumbling window x 100 keys, update-mode state\n"
        "store) on local[32]:\n\n"
        f"- sustained throughput (median of {batches} steady-state "
        f"micro-batches over ~{RUN_S} s): **{med:,.0f} rows/s**\n"
        f"- peak micro-batch rate: {max(steady):,.0f} rows/s\n"
        f"- median micro-batch latency (triggerExecution): "
        f"**{med_lat:,.0f} ms**\n\n"
        "Scale note: this is ONE machine saturating its Python-free\n"
        "JVM pipeline; the same plan distributes by window/key shuffle,\n"
        "so cluster throughput scales with executors until the state\n"
        "store or sink saturates. Latency is micro-batch-quantized\n"
        "(SURVEY §4.4) — this probe measures throughput, not per-event\n"
        "latency.\n" + tail
    )
    print(
        f"median={med:,.0f} rows/s, latency={med_lat:,.0f} ms "
        f"over {batches} steady batches -> {doc}"
    )


if __name__ == "__main__":
    main()
