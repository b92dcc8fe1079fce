"""Watermarked stream-stream interval join: attribute events across two
live streams (the impression ⋈ click / order ⋈ payment pattern).

The remaining canonical Structured Streaming operator family: both sides
buffer in the state store, a row joins any matching-key row of the other
side whose event time falls inside the interval, and the two watermarks
bound how long either side waits — state is evicted once the other
side's watermark passes ``event time + interval``, so the buffers hold
O(in-flight interval) rows, never history. Without BOTH the watermarks
and the time-range join condition Spark must buffer forever (it errors
on an unbounded stream-stream inner join in append mode — the guardrail
this wrapper makes unhittable).

Same column contract as the batch twin it parities against in
``tests/test_streaming_joins.py``: an inner equi-join on the key plus
``right.ts ∈ [left.ts, left.ts + interval]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event lands
    within ``[left_ts, left_ts + interval]``.

    Both inputs must be streaming DataFrames carrying event-time columns
    ``left_ts`` / ``right_ts``. Returns the joined stream (append mode —
    a match is final once emitted, which is exactly what the watermark
    guarantees). Column names from both sides are preserved, so pick
    distinct names upstream.
    """
    l_wm = left.withWatermark(left_ts, watermark_delay)
    r_wm = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (l_wm[key] == r_wm[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {interval}"))
    )
    return l_wm.join(r_wm, cond, "inner").drop(r_wm[key])
