"""Stateful streaming funnel tracker: real-time conversion state per user.

The streaming twin of ``queries/eventseq.py::q_events_funnel`` — the same
strict-ordering semantics (a user converts step k only with a step-k
event STRICTLY AFTER their step-(k-1) conversion time), held as explicit
per-user state across micro-batches via ``applyInPandasWithState``.

State per user is three epoch-µs conversion times ``(t1, t2, t3)`` —
constant size, so the state store grows O(users), not O(events). Each
batch folds its events in event-time order into the state and emits the
user's row only when the state CHANGED (update-style output: the sink
MERGEs on user_id, so the target table always holds each user's current
funnel position).

Ordering contract (the streaming caveat, same family as the batch 7-day
lookback): events are applied in event-time order WITHIN a batch, so any
in-batch disorder is absorbed; an event delivered in a LATER batch than
a successor it should have preceded (cross-batch disorder) can miss a
conversion the batch query would find — e.g. a step-1 event arriving
after a step-2 event was already discarded. Bound that window with the
source's watermark/file ordering; the batch query is the backfill
authority (run it over history to correct, exactly as the reference
reprocesses its lookback window).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUTPUT_SCHEMA = "user_id long, stage int, t1 long, t2 long, t3 long"
FUNNEL_STATE_SCHEMA = "t1 long, t2 long, t3 long"


def _fold(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    steps: tuple[str, str, str],
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    before = (t1, t2, t3)
    for ts, et in zip(rows["ts_us"], rows["event_type"]):
        ts = int(ts)
        if et == steps[0] and (t1 is None or ts < t1):
            t1 = ts
        elif et == steps[1] and t1 is not None and ts > t1 and (t2 is None or ts < t2):
            t2 = ts
        elif et == steps[2] and t2 is not None and ts > t2 and (t3 is None or ts < t3):
            t3 = ts
    if (t1, t2, t3) != before:
        state.update((t1, t2, t3))
        stage = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        yield pd.DataFrame(
            [(key[0], stage, t1, t2, t3)],
            columns=["user_id", "stage", "t1", "t2", "t3"],
        )


def streaming_funnel(
    stream_df: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Track per-user funnel position over a stream of
    (user_id, ts_us, event_type) rows.

    Emits (user_id, stage, t1, t2, t3) whenever a user's position
    changes; stage ∈ {1, 2, 3} is the furthest step reached. Pair with a
    foreachBatch MERGE on user_id for a live conversion table.
    """

    def func(key, pdfs, state):
        yield from _fold(key, pdfs, state, steps)

    return stream_df.groupBy("user_id").applyInPandasWithState(
        func,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
