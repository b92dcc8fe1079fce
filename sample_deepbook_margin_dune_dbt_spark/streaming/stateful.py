"""Custom stateful streaming operators via ``applyInPandasWithState``.

``streaming_sessionize`` is the streaming twin of
``operators/sessions.py``: per-key session windows maintained as explicit
state across micro-batches. A session closes when a new event arrives more
than ``gap`` after the session's last event (the closed session is emitted
and a new one opens); open sessions persist in the state store between
batches, so sessions spanning micro-batch boundaries are stitched correctly.

State per key: (session_start, last_ts, n_events, sum_value) — constant
size, so state-store growth is O(active keys), not O(events). At scale the
state store shuffles on the group key exactly once per batch.

Two eviction modes:

- ``timeout="none"`` — sessions close only when a later event arrives.
  Deterministic (no clock, no watermark), right for tests and replay, but
  state is O(ever-seen keys): an idle key's open session lives forever.
- ``timeout="event_time"`` — the production mode: the stream carries a
  watermark (``ts_us`` microseconds → event time), each open session arms
  an event-time timeout at ``last_ts + gap``, and once the watermark
  passes it the session is EMITTED and its state REMOVED. State is
  O(active-within-gap keys) — bounded — and idle sessions reach the sink
  without needing a closing event.

Out-of-order events within ``gap`` fold into the open session without
moving its end backwards (``last_ts = max(last_ts, ts)``,
``session_start = min(session_start, ts)``); events later than ``gap``
out of order still open a new session — cross-session reordering needs
the watermark bound, which is exactly what ``event_time`` mode enforces.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long, sum_value double"
)
SESSION_STATE_SCHEMA = "session_start long, last_ts long, n_events long, sum_value double"


def _emit(key: Tuple[Any, ...], session_start, last_ts, n_events, sum_value) -> pd.DataFrame:
    return pd.DataFrame(
        [(key[0], session_start, last_ts, n_events, sum_value)],
        columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
    )


def _session_func(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap: int,
    event_timeout: bool,
) -> Iterator[pd.DataFrame]:
    if event_timeout and state.hasTimedOut:
        # watermark passed last_ts + gap with no new events: the session is
        # definitively over — emit it and free the state slot.
        session_start, last_ts, n_events, sum_value = state.get
        state.remove()
        yield _emit(key, session_start, last_ts, n_events, sum_value)
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
    if state.exists:
        session_start, last_ts, n_events, sum_value = state.get
    else:
        session_start = last_ts = None
        n_events, sum_value = 0, 0.0

    closed = []
    for ts, value in zip(rows["ts_us"], rows["value"]):
        ts, value = int(ts), float(value)
        if last_ts is None:
            session_start, last_ts, n_events, sum_value = ts, ts, 1, value
        elif ts - last_ts > gap:
            closed.append((key[0], session_start, last_ts, n_events, sum_value))
            session_start, last_ts, n_events, sum_value = ts, ts, 1, value
        else:
            # fold in without regressing the session bounds: a cross-batch
            # out-of-order event (ts < last_ts but within gap) must not pull
            # session_end backwards or later events would spuriously re-open
            # an already-extended session.
            last_ts = max(last_ts, ts)
            session_start = min(session_start, ts)
            n_events += 1
            sum_value += value
    state.update((session_start, last_ts, n_events, sum_value))
    if event_timeout:
        # arm the eviction alarm: fire when the watermark clears the gap.
        # ts_us is microseconds; timeouts are epoch millis. Must be strictly
        # beyond the current watermark or Spark rejects it, hence the clamp.
        timeout_ms = (last_ts + gap) // 1000 + 1
        timeout_ms = max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(timeout_ms)
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )


def streaming_sessionize(
    stream_df: DataFrame,
    gap: int,
    timeout: str = "none",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Sessionize a stream of (user_id, ts_us, value) rows.

    Emits one row per CLOSED session (append mode). ``timeout="none"``
    closes sessions only via a later event (state never evicts — test/
    replay mode); ``timeout="event_time"`` adds a watermark on the event
    time (``ts_us`` interpreted as epoch microseconds, lateness bound
    ``watermark_delay``) and evicts-and-emits any session idle past
    ``gap``, keeping the state store bounded.
    """
    if timeout not in ("none", "event_time"):
        raise ValueError(f"timeout must be 'none' or 'event_time', got {timeout!r}")
    event_timeout = timeout == "event_time"

    def func(key, pdfs, state):
        yield from _session_func(key, pdfs, state, gap, event_timeout)

    src = stream_df
    conf = GroupStateTimeout.NoTimeout
    if event_timeout:
        src = stream_df.withColumn(
            "_event_time", F.timestamp_micros(F.col("ts_us"))
        ).withWatermark("_event_time", watermark_delay)
        conf = GroupStateTimeout.EventTimeTimeout

    return src.groupBy("user_id").applyInPandasWithState(
        func,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
