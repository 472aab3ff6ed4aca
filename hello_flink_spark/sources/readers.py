"""Batch sources (SURVEY §2.1).

The Flink reference surface here is the ``filesystem`` table connector
and ``FileSource`` [F]; in Spark these are ``spark.read.*`` one-liners.
Schema comes from the parquet footer (SURVEY §1.1), so scans get
vectorized reading, predicate pushdown, and column pruning for free.

``load_table`` is the single entry point every declared query uses; it
never caches, never collects, and keeps the scan lazy so Catalyst can
push filters/projections from downstream operators into the reader.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test-bed table (``{sf_dir}/{name}.parquet``).

    ``events.ts`` normalization: the generated parquet has shipped both
    as TIMESTAMP(NANOS) (vectorized reader rejects it; read via
    ``spark.sql.legacy.parquet.nanosAsLong`` and truncate ns → µs, the
    same coercion DuckDB applies) and as naive TIMESTAMP(MICROS) (Spark
    4 infers TIMESTAMP_NTZ, which rejects ``cast(... as long)`` and the
    epoch arithmetic every time-bucketing operator uses). Either way we
    emit one canonical type — TIMESTAMP (LTZ) under a UTC session — so
    the declared queries see identical epoch values across formats and
    bit-identical buckets to the DuckDB oracle.

    Session contract (ADVICE r05): the NTZ→LTZ cast REQUIRES a UTC
    session, so ``load_table`` enforces ``spark.sql.session.timeZone =
    UTC`` for the NTZ-events path. ``get_spark`` sessions already pin
    UTC; an externally-supplied session with a different timezone is
    switched to UTC with an explicit ``UserWarning`` (not silently),
    because the change affects every later timestamp expression in
    that session.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            # Session built outside get_spark (e.g. the driver's own): the
            # flag is read at scan time, so setting it here still works.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ→LTZ cast goes through the session timezone; pin UTC so
            # the stored wall clock and the epoch agree (DuckDB semantics
            # for naive parquet timestamps).
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz != "UTC":
                warnings.warn(
                    f"load_table('events'): switching session timeZone "
                    f"{tz!r} -> 'UTC' (required for the TIMESTAMP_NTZ->LTZ "
                    f"normalization); other timestamp queries in this "
                    f"session now evaluate under UTC",
                    UserWarning,
                    stacklevel=2,
                )
                spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so declared queries can use ``spark.sql`` with
    the same unqualified table names the DuckDB oracle sees."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
