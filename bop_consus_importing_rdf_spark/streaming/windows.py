"""Event-time streaming operators: watermarked windows + stateful sessions.

The reference's Kotlin Flow is bounded/sequential (batch semantics), so these
are north-rule extensions for continuously-arriving data:

- :func:`windowed_mention_counts` — per-window mention volume with a real
  event-time watermark: late rows beyond the allowed delay are DROPPED by
  the engine, bounding state for an unbounded stream (the 100-TB failure
  mode of naive streaming aggs is unbounded window state).
- :func:`stream_sessionize` — gap-based sessionization as a CUSTOM stateful
  operator via ``applyInPandasWithState``: per-user state (last event time,
  running session index) survives across micro-batches, so a session
  spanning two batches keeps one index. Arrow-batched; state is a 3-field
  tuple per user — O(users), not O(events).

- :func:`stream_sessionize_reordering` — the same semantics under BOUNDED
  CROSS-BATCH DISORDER: events are buffered in state until the event-time
  watermark passes them, so any event arriving within the watermark delay
  of the stream's max event time lands in the right session even if it
  arrives batches after its event-time successors. Buffer size is bounded
  by the watermark horizon (events older than the watermark are finalized
  and leave state; later-than-that arrivals are dropped by the engine —
  the same bounded-lateness contract as the windowed aggregation).

Both are exercised with ``availableNow`` triggers in tests (drain-then-stop)
and checked for batch equivalence where the semantics allow it: plain
``stream_sessionize`` equals the batch window computation whenever each
user's events arrive in event-time order across batches (the standard
contract for incremental sessionization without a reordering buffer; within
a batch any order is fine — the state function sorts), and the reordering
variant equals it for ANY arrival order with disorder bounded by the
watermark delay.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_SECONDS = 1800

_SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("session_idx", LongType()),
    ]
)
# (last event time in epoch micros, current session index)
_SESSION_STATE = StructType(
    [
        StructField("last_us", LongType()),
        StructField("session_idx", LongType()),
    ]
)


def windowed_mention_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "kind",
) -> DataFrame:
    """Watermarked tumbling-window counts per key over an event stream.

    Returns ``(window, key, n_events)``. In append output mode a window
    only emits once the watermark passes its end — exactly-once finalized
    aggregates; rows later than ``watermark_delay`` are dropped by the
    engine instead of growing state forever.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("window"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _sessionize_state_func(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user incremental sessionization.

    State carries (last event epoch-micros, session index); a gap >
    SESSION_GAP_SECONDS starts a new session. Events are sorted within the
    delivered batch — cross-batch order is the caller's contract.
    """
    (user_id,) = key
    if state.exists:
        last_us, session_idx = state.get
    else:
        last_us, session_idx = None, 0

    out_event_ids: list[int] = []
    out_sessions: list[int] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, event_id in zip(pdf["ts"], pdf["event_id"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is None or us - last_us > SESSION_GAP_SECONDS * 1_000_000:
                session_idx += 1
            last_us = us
            out_event_ids.append(int(event_id))
            out_sessions.append(session_idx)

    state.update((last_us, session_idx))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": out_event_ids,
            "session_idx": out_sessions,
        }
    )


def stream_sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessionization over a stream of ``(user_id, event_id, ts)``.

    A custom stateful operator: ``applyInPandasWithState`` keeps one small
    state tuple per user across micro-batches. Output rows carry the same
    ``session_idx`` semantics as the batch ``events_sessionize`` query
    (1-based, new session when the gap exceeds 1800 s).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_state_func,
        outputStructType=_SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# (last finalized event micros, session index, buffered event micros,
# buffered event ids) — the buffer holds only events newer than the
# watermark, so its size is bounded by the watermark horizon per user
_SESSION_BUF_STATE = StructType(
    [
        StructField("last_us", LongType()),
        StructField("session_idx", LongType()),
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_event_id", ArrayType(LongType())),
    ]
)


def _sessionize_reorder_func(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Reorder-buffering incremental sessionization.

    New events join the per-user buffer; only buffered events STRICTLY
    OLDER than the current event-time watermark are finalized (in
    (ts, event_id) order — the batch comparator), because the engine
    guarantees no future arrival can carry an event time below the
    watermark (it drops such rows as late). Everything else stays
    buffered for a later batch. With no watermark yet
    (``getCurrentWatermarkMs() == 0``) nothing finalizes — correct and
    safe, just deferred.
    """
    (user_id,) = key
    if state.exists:
        last_us, session_idx, buf_us, buf_ids = state.get
        buf = [(int(u), int(e)) for u, e in zip(buf_us, buf_ids)]
    else:
        last_us, session_idx, buf = None, 0, []

    for pdf in pdfs:
        for ts, event_id in zip(pdf["ts"], pdf["event_id"]):
            buf.append((int(pd.Timestamp(ts).value // 1000), int(event_id)))

    wm_ms = state.getCurrentWatermarkMs()
    wm_us = wm_ms * 1000
    buf.sort()
    out_event_ids: list[int] = []
    out_sessions: list[int] = []
    keep: list[tuple[int, int]] = []
    for us, event_id in buf:
        if us < wm_us:
            if last_us is None or us - last_us > SESSION_GAP_SECONDS * 1_000_000:
                session_idx += 1
            last_us = us
            out_event_ids.append(event_id)
            out_sessions.append(session_idx)
        else:
            keep.append((us, event_id))

    state.update(
        (last_us, session_idx, [u for u, _ in keep], [e for _, e in keep])
    )
    if keep:
        # groups are only re-invoked on NEW DATA or on timeout — without
        # this, a user whose events stop arriving would hold a buffered
        # tail forever. Schedule a wake-up for when the watermark passes
        # the oldest buffered event (strictly greater than the current
        # watermark, as the engine requires).
        state.setTimeoutTimestamp(max(keep[0][0] // 1000, wm_ms + 1))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "event_id": out_event_ids,
            "session_idx": out_sessions,
        }
    )


def stream_sessionize_reordering(
    events: DataFrame, watermark_delay: str = "30 minutes"
) -> DataFrame:
    """Gap-based sessionization tolerant of bounded cross-batch disorder.

    Same output contract as :func:`stream_sessionize`, but events may
    arrive up to ``watermark_delay`` out of event-time order ACROSS
    micro-batches and still land in the correct session: arrivals are
    buffered in per-user state and finalized only once the event-time
    watermark passes them. An event is emitted exactly once, when
    finalized — so emission lags the watermark, the price of reordering
    (same trade as append-mode windowed aggregation). State is
    O(users × events-per-watermark-horizon).
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_reorder_func,
            outputStructType=_SESSION_OUTPUT,
            stateStructType=_SESSION_BUF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
