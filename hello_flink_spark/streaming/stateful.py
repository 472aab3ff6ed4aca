"""Arbitrary keyed-state processors — SURVEY §2.10 stateful_running_agg,
stateful_timer, stateful_sessionize, cep_pattern, and the streaming
twin of window_count (§2.9).

[F] KeyedProcessFunction + ValueState/ListState + event-time timers /
org.apache.flink.cep.CEP.pattern — re-expressed as
``applyInPandasWithState`` processors: per-key state rows in the
state store (RocksDB via session factory), Arrow-batched per-group
Python, event-time timeouts driven by the query watermark. State is a
flat tuple per key — bounded, evictable, 100 TB-safe (SURVEY §4.2).

API note: Spark 4.x also ships ``transformWithStateInPandas``
(StatefulProcessor + named ValueState/ListState/MapState + timers —
the closest 1:1 of Flink's keyed-state API). Probed twice in this
environment: round 2 (2026-08-13 a.m.) found ``google.protobuf``
present but broken ("cannot import name 'descriptor'"); the round-3
re-probe (2026-08-13 p.m.), the round-5 re-probe (2026-08-13), the
round-6 re-probe, the round-8 re-probe (both 2026-08-14), and the
round-12, round-13 and round-14 re-probes (2026-08-15/16, all
unchanged: ``import google`` → ModuleNotFoundError) found NO protobuf
runtime on the machine
at all (``import google`` → ModuleNotFoundError;
``pyspark.sql.streaming.proto.StateMessage_pb2`` fails on it; a
filesystem sweep found only typeshed stubs, no descriptor_pb2.py
anywhere, no cached wheel), so the driver↔worker state protocol
cannot start and vendoring is not possible without a package install,
which is out of scope for this container. The processors below
therefore use the stable ``applyInPandasWithState`` API, which
expresses the same state machines (value state = the state tuple,
list state = an array column in it, timers = setTimeoutTimestamp);
port one processor to TWS with named states + TTL when protobuf
exists in the deployment image.

Ordering contract: each processor sorts its per-key batch by event
time; the replay harness delivers chunks in time order, so cross-batch
order matches event order (the same assumption Flink tutorials make
with ascending-timestamp sources).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 30 * 60 * 1_000_000
# CEP windows live in the pattern declarations below (streaming/cep.py
# compiles them): 30 min for the 2-step, 4 h per stage for the 3-step
# (full v->c->p funnels are rare within 30 min in the fixture — 0 rows
# at sf0.01; 4 h keeps the golden test non-vacuous at every SF).
COUNT_WINDOW_SIZE = 5


def _sorted_concat(pdfs: Iterator[pd.DataFrame], by: list[str]) -> pd.DataFrame:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    return pdf.sort_values(by, ignore_index=True)


# ---------------------------------------------------------------------------
# stateful_running_agg — [F] KeyedProcessFunction + ValueState
# ---------------------------------------------------------------------------


def _running_agg(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, total = state.get if state.exists else (0, 0.0)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    cnt += len(pdf)
    total += float(pdf["value"].sum())
    state.update((cnt, total))
    yield pd.DataFrame({"user_id": [key[0]], "event_cnt": [cnt], "total_value": [round(total, 2)]})


def stateful_running_agg(events: DataFrame) -> DataFrame:
    """Per-key running fold with explicit ValueState — the arbitrary-
    state twin of jobs.running_totals (which Catalyst handles natively;
    this one demonstrates the KeyedProcessFunction escape hatch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_agg,
        outputStructType="user_id long, event_cnt long, total_value double",
        stateStructType="cnt long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_sessionize + stateful_timer — [F] MapState + event-time timers
# ---------------------------------------------------------------------------


def _sessionize(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom sessionization: emit a (user, session_start, cnt, total)
    row when a session closes — either because a later event arrived
    past the gap (in-order closure) or because the event-time timer
    fired (watermark passed start+gap with no successor: the
    stateful_timer path)."""
    out: list[dict] = []

    def close(sess):
        out.append(
            {
                "user_id": key[0],
                # integer µs → exactly representable in Arrow timestamp[us]
                "session_start": pd.Timestamp(int(sess[0]), unit="us"),
                "cnt": int(sess[2]),
                "total_value": round(float(sess[3]), 2),
            }
        )

    if state.hasTimedOut:
        if state.exists:
            close(state.get)
            state.remove()
        yield pd.DataFrame(out)
        return

    pdf = _sorted_concat(pdfs, ["ts", "event_id"])
    sess = list(state.get) if state.exists else None  # [start_us, last_us, cnt, total]
    for ts, value in zip(pdf["ts"], pdf["value"]):
        ts_us = ts.value // 1000  # pd.Timestamp ns → µs, exact
        if sess is None:
            sess = [ts_us, ts_us, 0, 0.0]
        elif ts_us - sess[1] >= SESSION_GAP_US:
            close(sess)
            sess = [ts_us, ts_us, 0, 0.0]
        sess[1] = ts_us
        sess[2] += 1
        sess[3] += float(value)
    state.update(tuple(sess))
    # [F] timerService().registerEventTimeTimer(last_ts + gap)
    state.setTimeoutTimestamp((sess[1] + SESSION_GAP_US) // 1000)
    yield pd.DataFrame(out)


def stateful_sessionize(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Sessionization with explicit state + event-time timers (the
    custom path; F.session_window covers the declarative case)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType="user_id long, session_start timestamp, cnt long, total_value double",
            stateStructType="start_us long, last_us long, cnt long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# stateful_timer — [F] Context#timerService().registerEventTimeTimer
# ---------------------------------------------------------------------------

INACTIVITY_US = 60 * 60 * 1_000_000


def _inactivity(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        last_us, cnt = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_seen": [pd.Timestamp(int(last_us), unit="us")],
                "events_before_idle": [int(cnt)],
            }
        )
        return
    pdf = _sorted_concat(pdfs, ["ts", "event_id"])
    last_us = int(pdf["ts"].iloc[-1].value // 1000)
    cnt = (state.get[1] if state.exists else 0) + len(pdf)
    state.update((last_us, cnt))
    # pure timer semantics: the ONLY output is timer-driven (the alert)
    state.setTimeoutTimestamp((last_us + INACTIVITY_US) // 1000)
    yield pd.DataFrame([])


def inactivity_alerts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Per-key event-time timer callback in isolation: emit an alert row
    when a user goes quiet for INACTIVITY_US of event time — every event
    re-registers the timer; only the timeout path produces output."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _inactivity,
            outputStructType="user_id long, last_seen timestamp, events_before_idle long",
            stateStructType="last_us long, cnt long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# cep_pattern — [F] CEP.pattern(click followedBy purchase, within 30 min)
# Both NFAs are instances of the general pattern compiler
# (streaming/cep.py, VERDICT r05 #6); the hand-rolled machines they
# replace are pinned by the same golden tests that verified them.
# ---------------------------------------------------------------------------


def cep_click_purchase(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """CEP 'A followedBy B within t' — no MATCH_RECOGNIZE in Spark
    (SURVEY §2.10): compiled 2-step NFA over keyed state (streaming/
    cep.py), partial matches expired by event-time timers so state
    stays bounded. Batch shadow: queries/timewindows.py::
    cep_pattern_batch."""
    from hello_flink_spark.streaming.cep import CepPattern, compile_stream

    pat = CepPattern(steps=("click", "purchase"), within_minutes=30)
    return compile_stream(pat, events, watermark).select(
        "user_id", "click_ts", "purchase_ts"
    )


def cep3_view_click_purchase(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """CEP 'A followedBy B followedBy C, each within t' (SURVEY §2.10:
    the 3-step tier; Flink CEP Pattern.begin.followedBy x2) — compiled
    3-step NFA (streaming/cep.py). State = open partials expired by
    event-time timers, bounded by the window span. 4 h per stage keeps
    the golden test non-vacuous at every SF. Batch shadow: queries/
    timewindows.py::cep3_pattern_batch."""
    from hello_flink_spark.streaming.cep import CepPattern, compile_stream

    pat = CepPattern(steps=("view", "click", "purchase"), within_minutes=240)
    return compile_stream(pat, events, watermark).select(
        "user_id", "view_ts", "click_ts", "purchase_ts"
    )


# ---------------------------------------------------------------------------
# window_count streaming twin — [F] countWindow(n)
# ---------------------------------------------------------------------------


def _count_window(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    chunk_idx, buf_cnt, buf_sum = state.get if state.exists else (0, 0, 0.0)
    pdf = _sorted_concat(pdfs, ["ts", "event_id"])
    out: list[dict] = []
    for value in pdf["value"]:
        buf_cnt += 1
        buf_sum += float(value)
        if buf_cnt == COUNT_WINDOW_SIZE:
            out.append(
                {
                    "user_id": key[0],
                    "chunk": chunk_idx,
                    "cnt": COUNT_WINDOW_SIZE,
                    "total_value": round(buf_sum, 2),
                }
            )
            chunk_idx += 1
            buf_cnt, buf_sum = 0, 0.0
    state.update((chunk_idx, buf_cnt, buf_sum))
    yield pd.DataFrame(out)


GLOBAL_TRIGGER_EVERY = 5


def _global_count_trigger(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, total = state.get if state.exists else (0, 0.0)
    pdf = _sorted_concat(pdfs, ["ts", "event_id"])
    out: list[dict] = []
    for value in pdf["value"]:
        cnt += 1
        total += float(value)
        if cnt % GLOBAL_TRIGGER_EVERY == 0:
            out.append(
                {"user_id": key[0], "fire_at": cnt, "total_value": round(total, 2)}
            )
    state.update((cnt, total))
    yield pd.DataFrame(out)


def global_count_trigger_stream(events: DataFrame) -> DataFrame:
    """[F] GlobalWindows.create() + CountTrigger.of(N): one unbounded
    window per key whose trigger fires a running-aggregate snapshot
    every N records — SURVEY §2.9's last row, previously documented out
    of scope. Spark has no custom-trigger surface, but the COUNT
    trigger is a keyed state machine: a counter + running sum emitting
    at each N-boundary (the processing-time trigger variant is the
    query-level Trigger.ProcessingTime, see docs/SEMANTICS.md §3).
    State is two scalars per key — bounded without eviction, unlike a
    buffering global window."""
    return events.groupBy("user_id").applyInPandasWithState(
        _global_count_trigger,
        outputStructType="user_id long, fire_at long, total_value double",
        stateStructType="cnt long, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def count_window_stream(events: DataFrame) -> DataFrame:
    """Count-based windows (every N events per key) — no Structured
    Streaming native (SURVEY §2.9): a stateful counter emitting a row
    per completed chunk; the trailing partial stays in state (a stream
    never ends — the batch shadow window_count emits it on EOF)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_window,
        outputStructType="user_id long, chunk long, cnt long, total_value double",
        stateStructType="chunk_idx long, buf_cnt long, buf_sum double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# window_count_evictor streaming twin — [F] countWindow(n) +
# CountEvictor.of(keep)
# ---------------------------------------------------------------------------

# single source for the batch/stream twin pair: queries/round9.py
# imports both this and COUNT_WINDOW_SIZE
COUNT_EVICT_KEEP = 3


def _count_window_evictor(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    chunk_idx, buf_cnt, ring = state.get if state.exists else (0, 0, [])
    ring = list(ring)
    pdf = _sorted_concat(pdfs, ["ts", "event_id"])
    out: list[dict] = []
    for value in pdf["value"]:
        buf_cnt += 1
        ring.append(float(value))
        # the evictor's buffer bound IS the state bound: only the last
        # `keep` elements can ever be aggregated, so older ones drop
        # the moment they are displaced — state stays O(keep), not O(n)
        if len(ring) > COUNT_EVICT_KEEP:
            ring.pop(0)
        if buf_cnt == COUNT_WINDOW_SIZE:
            out.append(
                {
                    "user_id": key[0],
                    "chunk": chunk_idx,
                    "cnt_kept": len(ring),
                    "total_value": round(sum(ring), 2),
                }
            )
            chunk_idx += 1
            buf_cnt, ring = 0, []
    state.update((chunk_idx, buf_cnt, ring))
    yield pd.DataFrame(out)


def count_window_evictor_stream(events: DataFrame) -> DataFrame:
    """[F] ``countWindow(5)`` + ``CountEvictor.of(3)`` — streaming
    twin of queries/round9.py::window_count_evictor. Flink's evictor
    trims the buffer when the window FIRES; because CountEvictor keeps
    a suffix, the same result falls out of keeping only the trailing
    ``keep`` elements as they arrive — which also bounds state at
    O(keep) scalars per key instead of the full window buffer (the
    very reason evictors exist). The trailing partial window stays in
    state (a stream never ends; the batch shadow emits it on EOF).

    Per-batch arrivals are (ts, event_id)-sorted like the other count
    machines; the fold order across batches is the replay order, the
    same contract ``count_window_stream`` documents."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_window_evictor,
        outputStructType="user_id long, chunk long, cnt_kept long, total_value double",
        stateStructType="chunk_idx long, buf_cnt long, ring array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_markov_transitions — [F] KeyedProcessFunction + ValueState
# (streaming twin of queries/round5.py::events_markov_transitions)
# ---------------------------------------------------------------------------


def _wm_cutoff_ns(state: GroupState, tz: str) -> int | None:
    """Watermark cutoff as SESSION-LOCAL naive nanoseconds (the frame
    Arrow delivers ``ts`` in), or None before the first watermark."""
    try:
        wm_ms = state.getCurrentWatermarkMs()
    except Exception:  # noqa: BLE001 — test double without a watermark
        wm_ms = 0
    if not wm_ms:
        return None
    return (
        pd.Timestamp(wm_ms, unit="ms", tz="UTC").tz_convert(tz).tz_localize(None).value
    )


def _local_ns_to_epoch_ms(ns: int, tz: str) -> int:
    """Session-local naive ns → epoch ms (for event-time timers).
    DST-safe for non-UTC session timezones: an ambiguous fall-back
    wall time resolves to the earlier instant and a nonexistent
    spring-forward time shifts forward — a timer may fire a step
    early, never crash (the session factory pins UTC, where both
    branches are no-ops)."""
    return (
        pd.Timestamp(ns)
        .tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
        .value
        // 1_000_000
    )


def _reorder_split(buf: list, arrivals: list, cutoff: int | None):
    """Merge buffered rows with this batch's arrivals, sort by the
    leading (ts_ns, ...) key, and split at the watermark: rows the
    watermark has passed are READY to fold in event-time order; the
    rest stay HELD (the watermark-delay reorder buffer, VERDICT r07
    #7). With no watermark yet, everything holds.

    The release bound is STRICT (ts < cutoff): a row exactly at the
    watermark is not yet safe to fold, because an equal-timestamp
    sibling is still admissible ("late" means ts < watermark) and
    could arrive in a later micro-batch — folding the first row early
    would break the (ts, event_id) order for the pair. Boundary rows
    drain as soon as the watermark moves past them."""
    buf = sorted(buf + arrivals)
    k = 0
    if cutoff is not None:
        while k < len(buf) and buf[k][0] < cutoff:
            k += 1
    return buf[:k], buf[k:]


def _arm_release_timer(state: GroupState, buf: list, cutoff: int | None, tz: str) -> None:
    """Event-time timer at the earliest held row (clamped future of the
    watermark) so the buffer drains when the watermark advances on
    OTHER keys' data — the mechanism behind the bounded-input
    MAX_WATERMARK flush."""
    if buf:
        wm_ms = 0 if cutoff is None else _local_ns_to_epoch_ms(cutoff, tz)
        state.setTimeoutTimestamp(max(_local_ns_to_epoch_ms(buf[0][0], tz), wm_ms + 1))


_DRAIN_CAST = {"event_id": int, "event_type": str, "value": float}


def _drain_arrivals(
    tz: str, pdfs: Iterator[pd.DataFrame], state: GroupState, cols: tuple = ()
):
    """Shared arrival intake for the reorder-buffered processors:
    returns (arrival tuples ``(ts_ns, *cols)``, watermark cutoff).
    Below-watermark arrivals (ts < cutoff — Spark's own lateness
    definition) are dropped here; ordering is _reorder_split's job, so
    the frame is NOT pre-sorted (one sort per batch, not two)."""
    cutoff = _wm_cutoff_ns(state, tz)
    if state.hasTimedOut:
        return [], cutoff
    pdf = pd.concat(list(pdfs), ignore_index=True)
    ts = pdf["ts"].astype("int64")
    if cutoff is not None:
        keep = ts >= cutoff
        pdf, ts = pdf[keep], ts[keep]
    series = [ts] + [pdf[c] for c in cols]
    casts = [int] + [_DRAIN_CAST[c] for c in cols]
    return [
        tuple(f(x) for f, x in zip(casts, row)) for row in zip(*series)
    ], cutoff


def _markov(
    tz: str, key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user Markov ValueState + WATERMARK-DELAY REORDER BUFFER
    (VERDICT r07 #7): rows are HELD in state until the watermark
    passes their event time, then folded onto the carried ``prev``
    chain in (ts, event_id) order — so an out-of-order event WITHIN
    the watermark delay that crosses a micro-batch boundary still
    counts in true event-time order (the r06/r07 arrival-order
    residual is gone). Each release emits transition-pair count
    DELTAS (append mode); the sink aggregates them into the matrix.
    State = one string + the in-flight window of rows — bounded by
    the watermark delay × per-key rate, the same bound Flink's
    reorder/timer pattern carries. An event-time timer (earliest
    buffered row) drains the buffer when the watermark advances on
    other keys' data — Flink's MAX_WATERMARK end-of-stream flush is
    the same mechanism at +inf."""
    if state.exists:
        prev0, bts, beid, bet = state.get
        prev = prev0 if prev0 else None
        buf = list(zip(bts, beid, bet))
    else:
        prev, buf = None, []
    arrivals, cutoff = _drain_arrivals(tz, pdfs, state, ("event_id", "event_type"))
    ready, buf = _reorder_split(buf, arrivals, cutoff)

    pairs: dict = {}
    for _, _, nxt in ready:
        if prev is not None:
            pairs[(prev, nxt)] = pairs.get((prev, nxt), 0) + 1
        prev = nxt
    if prev is None and not buf and not state.exists:
        # a first-seen key whose every arrival fell below the watermark:
        # writing state here would create a permanent ('', [], [], [])
        # entry with no timer and no removal path (ADVICE r08) — mirror
        # _burst's early return instead
        yield pd.DataFrame([])
        return
    state.update(
        (
            prev or "",
            [t for t, _, _ in buf],
            [e for _, e, _ in buf],
            [et for _, _, et in buf],
        )
    )
    _arm_release_timer(state, buf, cutoff, tz)
    if pairs:
        yield pd.DataFrame(
            [
                {"user_id": key[0], "prev_type": a, "next_type": b, "cnt": c}
                for (a, b), c in sorted(pairs.items())
            ]
        )
    else:
        yield pd.DataFrame([])


def stateful_markov_transitions(events: DataFrame) -> DataFrame:
    """Streaming first-order Markov transition counting: the batch
    shadow is queries/round5.py::events_markov_transitions; the golden
    test sums the emitted per-batch deltas and compares against it.

    Late-data contract (VERDICT r07 #7 — the arrival-order residual is
    gone): a watermark-delay REORDER BUFFER holds each row in state
    until the watermark passes its event time, then folds in strict
    (ts, event_id) order — so ANY out-of-orderness within the
    watermark delay, micro-batch boundaries included, counts in true
    event-time order; rows the watermark already passed are dropped
    (standard late_drop). Streaming deltas sum to the batch shadow
    over the non-late rows exactly; rows still inside the delay when
    the stream pauses stay buffered until the watermark moves — the
    end-of-stream flush is a watermark advance (Flink's MAX_WATERMARK
    on bounded input; the goldens advance it with a sentinel-key
    chunk). State = one string + ≤ delay×rate in-flight rows per
    key."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return events.withWatermark("ts", "30 minutes").groupBy(
        "user_id"
    ).applyInPandasWithState(
        partial(_markov, tz),
        outputStructType="user_id long, prev_type string, next_type string, cnt long",
        stateStructType=(
            "prev string, buf_ts array<long>, buf_eid array<long>, "
            "buf_et array<string>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_burst_detector — streaming twin of round6.events_bot_burst
# ---------------------------------------------------------------------------

BURST_WINDOW_S = 86400


def _burst(
    tz: str, key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user rolling-24 h burst maximum. State = per-second event
    counts inside the trailing window (pruned each batch — bounded by
    window span × rate) + the running max. The batch shadow's RANGE
    frame is value-based over floored epoch seconds, so the windowed
    sum here also groups by second and sums seconds in
    [s − 86399, s] — same arithmetic, incremental state.

    Late-data contract (VERDICT r07 #7, like
    stateful_markov_transitions): a watermark-delay REORDER BUFFER
    holds row timestamps in state until the watermark passes them,
    then folds them in event-time order — a within-delay out-of-order
    row can never land behind the pruned horizon, because the horizon
    only advances past seconds the watermark has already passed;
    below-watermark arrivals are dropped (standard late_drop). The
    streamed running max equals the batch RANGE frame over the
    non-late rows, golden-tested on the in-order, out-of-order and
    late-tail replays (sentinel-key flush chunk = the bounded-input
    MAX_WATERMARK)."""
    secs: list[int] = []
    cnts: list[int] = []
    max_burst = 0
    buf: list[int] = []
    if state.exists:
        secs, cnts, max_burst = list(state.get[0]), list(state.get[1]), state.get[2]
        buf = [(int(t),) for t in state.get[3]]
    counts = dict(zip(secs, cnts))
    arrivals, cutoff = _drain_arrivals(tz, pdfs, state)
    ready, buf = _reorder_split(buf, arrivals, cutoff)

    if not ready and not buf and not state.exists:
        # every row for a first-seen key was late: no state, no output
        yield pd.DataFrame([])
        return
    released = bool(ready)
    for (t,) in ready:
        s = t // 1_000_000_000
        counts[s] = counts.get(s, 0) + 1

    if counts and released:
        ordered = sorted(counts)
        # windowed sum per present second (two-pointer over sorted secs)
        lo = 0
        run = 0
        vals = [counts[s] for s in ordered]
        for hi, s in enumerate(ordered):
            run += vals[hi]
            while ordered[lo] < s - (BURST_WINDOW_S - 1):
                run -= vals[lo]
                lo += 1
            if run > max_burst:
                max_burst = run
        horizon = ordered[-1] - (BURST_WINDOW_S - 1)
        counts = {s: c for s, c in counts.items() if s >= horizon}

    state.update(
        (
            sorted(counts),
            [counts[s] for s in sorted(counts)],
            max_burst,
            [t for (t,) in buf],
        )
    )
    _arm_release_timer(state, buf, cutoff, tz)
    if released:
        yield pd.DataFrame({"user_id": [key[0]], "max_burst_24h": [max_burst]})
    else:
        # nothing left the buffer this batch: state unchanged except
        # the buffer itself, so update mode emits nothing (ADVICE r07)
        yield pd.DataFrame([])


def stateful_burst_detector(events: DataFrame) -> DataFrame:
    """Streaming bot/burst detection: update-mode running maximum of
    each user's rolling-24 h event count (batch shadow:
    queries/round6.py::events_bot_burst). The per-user state is one
    (second → count) map covering a single window span plus the
    ≤ delay×rate reorder buffer — bounded regardless of stream length,
    the keyed-state analog of the batch RANGE frame. Below-watermark
    rows are dropped; within-delay rows fold in event-time order via
    the reorder buffer (VERDICT r07 #7)."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return events.withWatermark("ts", "30 minutes").groupBy(
        "user_id"
    ).applyInPandasWithState(
        partial(_burst, tz),
        outputStructType="user_id long, max_burst_24h long",
        stateStructType=(
            "secs array<long>, cnts array<long>, max_burst long, "
            "buf_ts array<long>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_value_ewma — streaming twin of queries/round7.py::events_value_ewma
# ---------------------------------------------------------------------------


def _ewma(
    tz: str, key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user EWMA ValueState + watermark-delay reorder buffer
    (VERDICT r07 #7, extended round-8 to every order-sensitive
    stateful op): rows fold in true (ts, event_id) order once the
    watermark passes them, so the recurrence — which is
    order-sensitive by definition — matches the batch fold under ANY
    within-delay out-of-orderness, not just in-order replays. State =
    (ewma, n) + the in-flight row window."""
    from hello_flink_spark.queries.round7 import EWMA_ALPHA

    if state.exists:
        cur0, n, bts, beid, bval = state.get
        cur = cur0 if n else None
        buf = list(zip(bts, beid, bval))
    else:
        cur, n, buf = None, 0, []
    arrivals, cutoff = _drain_arrivals(tz, pdfs, state, ("event_id", "value"))
    ready, buf = _reorder_split(buf, arrivals, cutoff)

    for _, _, v in ready:
        cur = v if cur is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * cur
        n += 1
    if n or buf:
        state.update(
            (
                cur if n else 0.0,
                n,
                [t for t, _, _ in buf],
                [e for _, e, _ in buf],
                [v for _, _, v in buf],
            )
        )
        _arm_release_timer(state, buf, cutoff, tz)
    if ready and n:
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma_value": [cur]}
        )
    else:
        # nothing folded this batch: the running value is unchanged,
        # so update mode emits nothing (ADVICE r07)
        yield pd.DataFrame([])


def stateful_value_ewma(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Streaming EWMA (update mode): emits each user's running
    exponentially weighted average whenever the watermark releases
    rows from the reorder buffer (VERDICT r07 #7, extended round-8:
    the recurrence folds in true event-time order under any
    within-delay out-of-orderness). State = two scalars + the
    in-flight row window per key; below-watermark arrivals drop.
    ``delay`` is the watermark delay (= reorder-buffer horizon): the
    fixture goldens use the 30 min default; the throughput probe
    (scripts/streaming_throughput.py) shortens it so releases happen
    within the probe window — the buffer size scales with
    delay x per-key rate either way."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return events.withWatermark("ts", delay).groupBy(
        "user_id"
    ).applyInPandasWithState(
        partial(_ewma, tz),
        outputStructType="user_id long, n_events long, ewma_value double",
        stateStructType=(
            "ewma double, n long, buf_ts array<long>, buf_eid array<long>, "
            "buf_val array<double>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_autocorr — streaming twin of queries/round7.py::events_autocorrelation
# ---------------------------------------------------------------------------


def _autocorr(
    tz: str, key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user lag-1 Pearson moments as ValueState: seven scalars
    (prev value, n, Σx, Σy, Σxy, Σx², Σy²) — the incremental form of
    the batch LAG+corr plan, O(1) state per key. Each micro-batch
    folds its in-order values into the moments and emits the running
    correlation (update mode); the sample-corr denominator uses
    n-1-normalized moments so the result equals covar_samp/(sx·sy)."""
    import math

    if state.exists:
        prev, n, sx, sy, sxy, sxx, syy = state.get[:7]
        buf = list(zip(state.get[7], state.get[8], state.get[9]))
    else:
        prev, n, sx, sy, sxy, sxx, syy = None, 0, 0.0, 0.0, 0.0, 0.0, 0.0
        buf = []
    arrivals, cutoff = _drain_arrivals(tz, pdfs, state, ("event_id", "value"))
    ready, buf = _reorder_split(buf, arrivals, cutoff)
    if not ready:
        # nothing folded: moments unchanged, update mode emits nothing
        # (ADVICE r07); still persist/arm the buffer if it exists
        if buf or state.exists:
            state.update(
                (prev, n, sx, sy, sxy, sxx, syy,
                 [t for t, _, _ in buf], [e for _, e, _ in buf],
                 [v for _, _, v in buf])
            )
            _arm_release_timer(state, buf, cutoff, tz)
        yield pd.DataFrame([])
        return
    for _, _, v in ready:
        if prev is not None:
            n += 1
            sx += v
            sy += prev
            sxy += v * prev
            sxx += v * v
            syy += prev * prev
        prev = v
    state.update(
        (prev, n, sx, sy, sxy, sxx, syy,
         [t for t, _, _ in buf], [e for _, e, _ in buf],
         [v for _, _, v in buf])
    )
    _arm_release_timer(state, buf, cutoff, tz)
    corr = None
    if n >= 2:
        cov = (sxy - sx * sy / n) / (n - 1)
        vx = (sxx - sx * sx / n) / (n - 1)
        vy = (syy - sy * sy / n) / (n - 1)
        denom = math.sqrt(vx) * math.sqrt(vy)
        corr = cov / denom if denom > 0 else None
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_pairs": [n], "lag1_autocorr": [corr]}
    )


def stateful_autocorr(events: DataFrame) -> DataFrame:
    """Streaming lag-1 autocorrelation (update mode): the keyed-state
    twin of events_autocorrelation — seven scalars of state per user,
    rows fold in event-time order via the watermark-delay reorder
    buffer (round-8 extension of VERDICT r07 #7), zero-variance
    series yield NULL exactly like the batch try_divide form."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return events.withWatermark("ts", "30 minutes").groupBy(
        "user_id"
    ).applyInPandasWithState(
        partial(_autocorr, tz),
        outputStructType="user_id long, n_pairs long, lag1_autocorr double",
        stateStructType=(
            "prev double, n long, sx double, sy double, sxy double, "
            "sxx double, syy double, buf_ts array<long>, "
            "buf_eid array<long>, buf_val array<double>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_session_funnel — streaming twin of round8.events_session_funnel
# ---------------------------------------------------------------------------

FUNNEL_GAP_US = 30 * 60 * 1_000_000


def _session_funnel(
    tz: str, key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session funnel: one active session (start, last, and
    the three funnel markers fv/fc/fp as µs, -1 = unreached) plus the
    reorder buffer. Rows fold in event-time order once the watermark
    releases them; a session CLOSES — emitting (session_start,
    reached_stage 0-3) — whenever the watermark passes its gap
    horizon (last + 30 min), in whichever invocation first observes
    that (new data for the key, or the event-time timer armed at the
    earliest of next-buffer-release and gap-horizon). The in-order
    marker scan (first view; first click strictly after it; first
    purchase strictly after that) computes exactly the batch query's
    chained conditional MINs."""
    if state.exists:
        start, last, fv, fc, fp = state.get[:5]
        buf = list(zip(state.get[5], state.get[6], state.get[7]))
        sess = None if start < 0 else [start, last, fv, fc, fp]
    else:
        sess, buf = None, []
    arrivals, cutoff = _drain_arrivals(tz, pdfs, state, ("event_id", "event_type"))
    ready, buf = _reorder_split(buf, arrivals, cutoff)

    out: list[dict] = []

    def close(s) -> None:
        stage = 3 if s[4] >= 0 else 2 if s[3] >= 0 else 1 if s[2] >= 0 else 0
        out.append(
            {
                "user_id": key[0],
                "session_start": pd.Timestamp(int(s[0]), unit="us"),
                "reached_stage": stage,
            }
        )

    for ts_ns, _eid, et in ready:
        us = ts_ns // 1000
        if sess is None:
            sess = [us, us, -1, -1, -1]
        elif us - sess[1] > FUNNEL_GAP_US:
            close(sess)
            sess = [us, us, -1, -1, -1]
        sess[1] = us
        if et == "view" and sess[2] < 0:
            sess[2] = us
        elif et == "click" and sess[3] < 0 and 0 <= sess[2] < us:
            sess[3] = us
        elif et == "purchase" and sess[4] < 0 and 0 <= sess[3] < us:
            sess[4] = us

    # close on the watermark passing the gap horizon: any buffered row
    # is strictly above the cutoff, so it can only start a NEW session
    if sess is not None and cutoff is not None and cutoff // 1000 > sess[1] + FUNNEL_GAP_US:
        close(sess)
        sess = None

    if sess is None and not buf:
        if state.exists:
            state.remove()
    else:
        s = sess or [-1, -1, -1, -1, -1]
        state.update(
            (
                s[0],
                s[1],
                s[2],
                s[3],
                s[4],
                [t for t, _, _ in buf],
                [e for _, e, _ in buf],
                [et for _, _, et in buf],
            )
        )
        wm_ms = 0 if cutoff is None else _local_ns_to_epoch_ms(cutoff, tz)
        deadlines = []
        if buf:
            deadlines.append(_local_ns_to_epoch_ms(buf[0][0], tz))
        if sess is not None:
            deadlines.append(
                _local_ns_to_epoch_ms((sess[1] + FUNNEL_GAP_US + 1) * 1000, tz)
            )
        state.setTimeoutTimestamp(max(min(deadlines), wm_ms + 1))
    yield pd.DataFrame(
        out, columns=["user_id", "session_start", "reached_stage"]
    )


def stateful_session_funnel(events: DataFrame) -> DataFrame:
    """Streaming session-funnel (append mode): emits one
    (user, session_start, reached_stage) row per CLOSED 30-min-gap
    session — the keyed-state twin of events_session_funnel's batch
    windows, golden-tested so that the emitted rows aggregate to the
    batch query's four counters exactly. State per key = five µs
    scalars + the reorder buffer."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return events.withWatermark("ts", "30 minutes").groupBy(
        "user_id"
    ).applyInPandasWithState(
        partial(_session_funnel, tz),
        outputStructType="user_id long, session_start timestamp, reached_stage int",
        stateStructType=(
            "start long, last long, fv long, fc long, fp long, "
            "buf_ts array<long>, buf_eid array<long>, buf_et array<string>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_delta_trigger — [F] GlobalWindows + DeltaTrigger.of(thresh, delta)
# (streaming twin of queries/round9.py::events_delta_trigger)
# ---------------------------------------------------------------------------


def _delta_trigger(
    tz: str, key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user DeltaTrigger state machine + the watermark-delay
    reorder buffer: the trigger is a recurrence (the baseline updates
    only at fires), so fold order matters — rows fold in true
    (ts, event_id) order once the watermark passes them, exactly like
    the other order-sensitive stateful ops. State = four scalars
    (baseline, n, total, fires) + the in-flight row window; each fire
    emits an immutable snapshot row (append mode)."""
    from hello_flink_spark.queries.round9 import DELTA_TRIGGER_THRESH

    if state.exists:
        baseline0, has_base, n, total, fires, bts, beid, bval = state.get
        baseline = baseline0 if has_base else None
        buf = list(zip(bts, beid, bval))
    else:
        baseline, n, total, fires, buf = None, 0, 0.0, 0, []
    arrivals, cutoff = _drain_arrivals(tz, pdfs, state, ("event_id", "value"))
    ready, buf = _reorder_split(buf, arrivals, cutoff)

    out: list[dict] = []
    for _, _, v in ready:
        v = float(v)
        n += 1
        total += v
        if baseline is None:
            baseline = v
        elif abs(v - baseline) > DELTA_TRIGGER_THRESH:
            fires += 1
            baseline = v
            out.append(
                {
                    "user_id": key[0],
                    "fire_seq": fires,
                    "n_events": n,
                    "total_value": round(total, 2),
                    "trigger_value": v,
                }
            )
    if baseline is None and not buf and not state.exists:
        # first-seen key whose every arrival fell below the watermark
        # (the _markov/_burst guard, ADVICE r08): no state entry
        yield pd.DataFrame([])
        return
    state.update(
        (
            baseline if baseline is not None else 0.0,
            1 if baseline is not None else 0,
            n,
            total,
            fires,
            [t for t, _, _ in buf],
            [e for _, e, _ in buf],
            [v for _, _, v in buf],
        )
    )
    _arm_release_timer(state, buf, cutoff, tz)
    yield pd.DataFrame(
        out, columns=["user_id", "fire_seq", "n_events", "total_value", "trigger_value"]
    )


def stateful_delta_trigger(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """[F] ``GlobalWindows`` + ``DeltaTrigger.of(200, |v − v_last|)``
    — the last unmapped trigger strategy, as a keyed state machine
    (docs/SEMANTICS.md §3; count + processing-time triggers were
    mapped in round 3): the first element seeds the delta baseline
    without firing; each later element fires iff it deviates from the
    baseline by more than the threshold, emitting the global window's
    running (count, sum) snapshot and re-seeding the baseline — the
    emit-on-meaningful-change shape. Fires are immutable → append
    mode. State is FOUR scalars + the reorder-buffer window per key
    (the trigger never buffers the window contents — running
    aggregates carry them), and the reorder buffer gives the
    recurrence true event-time fold order under any within-delay
    out-of-orderness, golden-matched to the batch shadow
    ``events_delta_trigger``."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return events.withWatermark("ts", delay).groupBy(
        "user_id"
    ).applyInPandasWithState(
        partial(_delta_trigger, tz),
        outputStructType=(
            "user_id long, fire_seq long, n_events long, "
            "total_value double, trigger_value double"
        ),
        stateStructType=(
            "baseline double, has_base long, n long, total double, fires long, "
            "buf_ts array<long>, buf_eid array<long>, buf_val array<double>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# stateful_cusum — streaming CUSUM drift detector
# (streaming twin of queries/round9.py::events_cusum_alarms)
# ---------------------------------------------------------------------------


def _cusum(
    tz: str, key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user CUSUM (Page's test) + the watermark-delay reorder
    buffer: s ← max(0, s + v − μ − k) with alarm + restart at the h
    crossing — a recurrence whose restart couples every step to the
    alarm history, so fold order matters exactly like the delta
    trigger. State = three scalars + the in-flight row window."""
    from hello_flink_spark.queries.round9 import CUSUM_H, CUSUM_K, CUSUM_MU

    if state.exists:
        s, n, alarms, bts, beid, bval = state.get
        buf = list(zip(bts, beid, bval))
    else:
        s, n, alarms, buf = 0.0, 0, 0, []
    arrivals, cutoff = _drain_arrivals(tz, pdfs, state, ("event_id", "value"))
    ready, buf = _reorder_split(buf, arrivals, cutoff)

    out: list[dict] = []
    for _, _, v in ready:
        n += 1
        # pre-associated d-form: identical IEEE op sequence to the
        # batch lockstep scan / reference fold / recursive-CTE oracle
        s = max(0.0, s + (float(v) - CUSUM_MU - CUSUM_K))
        if s > CUSUM_H:
            alarms += 1
            out.append(
                {
                    "user_id": key[0],
                    "alarm_seq": alarms,
                    "n_events": n,
                    "cusum_stat": round(s, 6),
                    "trigger_value": float(v),
                }
            )
            s = 0.0
    if not ready and not buf and not state.exists:
        # first-seen key whose every arrival fell below the watermark
        # (the _markov/_burst guard, ADVICE r08): no state entry
        yield pd.DataFrame([])
        return
    state.update(
        (
            s,
            n,
            alarms,
            [t for t, _, _ in buf],
            [e for _, e, _ in buf],
            [v for _, _, v in buf],
        )
    )
    _arm_release_timer(state, buf, cutoff, tz)
    yield pd.DataFrame(
        out, columns=["user_id", "alarm_seq", "n_events", "cusum_stat", "trigger_value"]
    )


def stateful_cusum(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Streaming CUSUM drift alarms (append mode): each h-crossing
    emits an immutable (user, alarm_seq, n_events, statistic, value)
    row and restarts the statistic — the online form of the batch
    detector ``events_cusum_alarms``, golden-matched row-for-row over
    the out-of-order replay. State is THREE scalars + the reorder
    buffer per key; the buffer gives the restart-coupled recurrence
    true event-time fold order under any within-delay
    out-of-orderness."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    return events.withWatermark("ts", delay).groupBy(
        "user_id"
    ).applyInPandasWithState(
        partial(_cusum, tz),
        outputStructType=(
            "user_id long, alarm_seq long, n_events long, "
            "cusum_stat double, trigger_value double"
        ),
        stateStructType=(
            "s double, n long, alarms long, "
            "buf_ts array<long>, buf_eid array<long>, buf_val array<double>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
