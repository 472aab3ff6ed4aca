"""External-service enrichment — the Spark mapping of Flink async I/O.

[F] ``AsyncDataStream.unorderedWait(stream, asyncFn, timeout, unit,
capacity)`` enriches each stream record against an external service
(typically a remote KV store), bounding in-flight requests by
``capacity`` and emitting results in completion order; ``orderedWait``
restores arrival order; [F] ``AsyncFunction#timeout`` decides what an
unanswered request does (default: fail the job).

Spark has no per-record async operator — and does not need one. The
idiomatic mapping is ``mapInPandas`` with a BATCHED client, which
recovers every property the Flink operator exists for:

- **Connection amortization** ([F] ``RichAsyncFunction#open``): the
  client is opened once per task, not per record.
- **In-flight bounding** (``capacity``): each bulk request carries at
  most ``capacity`` keys; Spark's task parallelism bounds concurrent
  bulk requests at (executor cores), so peak outstanding keys are
  ``cores × capacity`` — the same backpressure knob.
- **Request coalescing**: within an Arrow batch, duplicate keys are
  deduplicated before the bulk call — strictly fewer requests than
  Flink's per-record model on skewed streams (an AsyncFunction needs
  an explicit cache to match this).
- **Unordered emission**: output interleaves across partitions and
  follows batch order within one — exactly ``unorderedWait``'s
  contract (no total order). ``orderedWait`` within a key's timeline
  is a downstream ``sortWithinPartitions`` after a key repartition,
  which callers add only when they need it.
- **Timeout/retry**: unanswered keys are re-requested up to
  ``max_attempts``; still-missing keys either fail the job
  (``on_miss="fail"``, Flink's default timeout behavior) or emit a
  typed-null fallback row (``on_miss="fallback"``, the common
  production override).

Scale shape: the enrichment is MAP-ONLY — zero shuffles at any corpus
size; the only data-scale cost is one Arrow round-trip of the carried
columns. When the key space is small enough to aggregate, prefer
``distinct keys → bulk lookup → broadcast join back`` (one request per
key total); the pass-through shape here is for per-event responses or
key spaces too large to collect — the case async I/O exists for.

The sandbox has no network, so the shipped service is a DETERMINISTIC
in-process fake whose responses are pure modular arithmetic over the
key — which is precisely what makes the operator hash-verifiable: the
DuckDB oracle recomputes the "service" in SQL, so the driver gate pins
batching, retry, miss-fallback, and merge-back exactly. A real
deployment swaps ``FakeProfileService`` for an HTTP/gRPC/Redis client
with the same three-method surface; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pandas only inside executors at runtime
    import pandas as pd

from pyspark.sql import DataFrame

# Deterministic "profile service" arithmetic — shared by the fake
# client, the oracle SQL, and the tests. All int64-safe at any uid.
TIERS = ("bronze", "silver", "gold", "platinum", "diamond")
SCORE_MULT = 2654435761  # Knuth multiplicative-hash constant
SCORE_MOD = 1_000_000
SEGMENT_MULT = 40503
SEGMENT_MOD = 100
DELETED_EVERY = 97  # uid % 97 == 0 -> permanent miss ("deleted user")
FLAKY_EVERY = 7  # uid % 7 == 3 -> missing on attempt 1, present after


class FakeProfileService:
    """Deterministic stand-in for a remote profile KV store.

    ``lookup_batch`` mirrors real bulk APIs: it returns responses for a
    SUBSET of the requested keys — permanently-deleted users are never
    present, and a deterministic "flaky" set is absent on the first
    attempt only (network timeout), exercising the caller's retry
    loop. ``attempts``/``requested`` counters let tests assert the
    retry and coalescing behavior without any nondeterminism.
    """

    def __init__(self) -> None:
        self.opened = False
        self.attempts = 0  # bulk calls issued
        self.requested = 0  # total keys across bulk calls

    def open(self) -> None:  # [F] RichAsyncFunction#open
        self.opened = True

    def lookup_batch(self, keys: list[int], attempt: int) -> dict[int, tuple]:
        assert self.opened, "client used before open()"
        self.attempts += 1
        self.requested += len(keys)
        out: dict[int, tuple] = {}
        for k in keys:
            if k % DELETED_EVERY == 0:
                continue  # deleted user: never answers
            if attempt == 1 and k % FLAKY_EVERY == 3:
                continue  # transient miss: answers from attempt 2 on
            # raw IEEE division (no round): the oracle's BIGINT/double
            # division produces the bit-identical value. The key is
            # reduced mod the modulus BEFORE multiplying — identical
            # value by modular arithmetic, but both this side and the
            # DuckDB oracle's checked BIGINT multiply stay in int64
            # range at ANY uid (ADVICE r10: unmasked, uids above
            # ~3.4e9 overflow the oracle while Python succeeds).
            out[k] = (
                TIERS[k % len(TIERS)],
                (((k % SCORE_MOD) * SCORE_MULT) % SCORE_MOD) / SCORE_MOD,
                ((k % SEGMENT_MOD) * SEGMENT_MULT) % SEGMENT_MOD,
            )
        return out

    def close(self) -> None:  # [F] RichAsyncFunction#close
        self.opened = False


RESPONSE_FIELDS = (
    ("profile_tier", "string"),
    ("profile_score", "double"),
    ("profile_segment", "bigint"),
)


def enrich_with_service(
    df: DataFrame,
    key_col: str,
    client_factory: Callable[[], FakeProfileService] = FakeProfileService,
    capacity: int = 1024,
    max_attempts: int = 3,
    on_miss: str = "fallback",
) -> DataFrame:
    """Append the service's response columns to ``df`` by ``key_col``.

    Map-only (no shuffle): one client per task, per-Arrow-batch key
    coalescing, ≤``capacity`` keys per bulk request, ``max_attempts``
    retries for unanswered keys, then ``on_miss`` ("fallback" → typed
    nulls, "fail" → raise like Flink's default timeout handler).
    """
    if on_miss not in ("fallback", "fail"):
        raise ValueError(f"on_miss must be 'fallback' or 'fail', got {on_miss!r}")
    # Programmatic StructType, not a DDL string built from
    # simpleString() — the string form drops nullability and breaks on
    # column names needing backtick quoting (ADVICE r10). Response
    # fields are nullable (typed-null fallback rows).
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    _resp_types = {"string": StringType(), "double": DoubleType(), "bigint": LongType()}
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(n, _resp_types[t], nullable=True) for n, t in RESPONSE_FIELDS]
    )
    run = make_runner(key_col, client_factory, capacity, max_attempts, on_miss)
    return df.mapInPandas(run, schema=out_schema)


def make_runner(
    key_col: str,
    client_factory: Callable[[], FakeProfileService],
    capacity: int,
    max_attempts: int,
    on_miss: str,
):
    """Build the per-task batch-iterator function (exposed so unit
    tests can drive the retry/coalescing/chunking contract directly —
    executor-side client instances are invisible to the driver)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        client = client_factory()
        client.open()
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                pending = [int(k) for k in pdf[key_col].dropna().unique()]
                resolved: dict[int, tuple] = {}
                for attempt in range(1, max_attempts + 1):
                    if not pending:
                        break
                    missing: list[int] = []
                    for i in range(0, len(pending), capacity):
                        chunk = pending[i : i + capacity]
                        got = client.lookup_batch(chunk, attempt)
                        resolved.update(got)
                        missing.extend(k for k in chunk if k not in got)
                    pending = missing
                if pending and on_miss == "fail":
                    raise TimeoutError(
                        f"{len(pending)} keys unanswered after "
                        f"{max_attempts} attempts (first: {pending[0]})"
                    )
                cols = {n: [] for n, _ in RESPONSE_FIELDS}
                fallback = (None,) * len(RESPONSE_FIELDS)
                for k in pdf[key_col]:
                    resp = fallback if pd.isna(k) else resolved.get(int(k), fallback)
                    for (n, _), v in zip(RESPONSE_FIELDS, resp):
                        cols[n].append(v)
                out = pdf.copy()
                for (n, t) in RESPONSE_FIELDS:
                    s = pd.Series(cols[n], index=pdf.index)
                    if t == "bigint":
                        s = s.astype("Int64")  # nullable int for misses
                    out[n] = s
                yield out
        finally:
            client.close()

    return run
