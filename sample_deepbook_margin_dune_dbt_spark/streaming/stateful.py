"""Custom stateful streaming operators via ``applyInPandasWithState``.

``streaming_sessionize`` is the streaming twin of
``operators/sessions.py``: per-key session windows maintained as explicit
state across micro-batches. A session closes when a new event arrives more
than ``gap`` after the session's last event (the closed session is emitted
and a new one opens); open sessions persist in the state store between
batches, so sessions spanning micro-batch boundaries are stitched correctly.

State per key: (session_start, last_ts, n_events, sum_value) — constant
size, so state-store growth is O(active keys), not O(events). At scale the
state store shuffles on the group key exactly once per batch; use
watermark-based timeouts (``GroupStateTimeout.EventTimeTimeout``) in
production to evict idle keys — here sessions close on the next event,
keeping the operator deterministic for tests without a wall clock.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long, sum_value double"
)
SESSION_STATE_SCHEMA = "session_start long, last_ts long, n_events long, sum_value double"


def _session_func(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState, gap: int
) -> Iterator[pd.DataFrame]:
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
            last_ts = ts
            n_events += 1
            sum_value += value
    state.update((session_start, last_ts, n_events, sum_value))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )


def streaming_sessionize(stream_df: DataFrame, gap: int) -> DataFrame:
    """Sessionize a stream of (user_id, ts_us, value) rows.

    Emits one row per CLOSED session (append mode); open sessions remain in
    state until a later event closes them.
    """

    def func(key, pdfs, state):
        yield from _session_func(key, pdfs, state, gap)

    return stream_df.groupBy("user_id").applyInPandasWithState(
        func,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
