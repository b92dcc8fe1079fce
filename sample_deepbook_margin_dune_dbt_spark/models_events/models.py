"""Event-analytics models (see package docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine.model import ModelContext, model
from ..queries.common import normalize_event_ts


@model(
    "events_user_reach_daily",
    unique_key=["d"],
    materialized="incremental",
    incremental_strategy="merge",
    tags=["events"],
    not_null=["d", "n_exact", "user_sketch"],
)
def events_user_reach_daily(ctx: ModelContext) -> DataFrame:
    """Per-day user-reach row: mergeable HLL sketch + exact daily distinct.

    Incremental on the date watermark with the reference's
    reprocess-the-boundary pattern (``fct_deepbook_margin_pool_daily.sql:34``):
    days ``>= max(d)`` rebuild from source and MERGE, so late events
    landing on the current day update its sketch instead of being lost.
    The sketch column is what makes the table re-aggregatable: any date
    range's distinct-user count is one ``hll_union_agg`` over the stored
    rows (see :func:`total_reach`) — constant work per day, no history
    re-scan, which summed daily exacts cannot provide (returnees double
    count; the table stores both so the gap is observable).
    """
    ev = normalize_event_ts(ctx.source("main", "events"))
    daily = ev.select(F.to_date("ts").alias("d"), "user_id")
    if ctx.is_incremental():
        row = ctx.this().agg(F.max("d").alias("wm")).first()
        if row["wm"] is not None:
            daily = daily.filter(F.col("d") >= F.lit(row["wm"]))
    return daily.groupBy("d").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("user_sketch"),
        F.count_distinct("user_id").cast("long").alias("n_exact"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ).withColumn("updated_at", ctx.now())


def total_reach(reach_table: DataFrame) -> DataFrame:
    """Distinct-user estimate over any slice of ``events_user_reach_daily``
    rows: union the stored sketches. Filter the input first for a date
    range ("reach last 30 days") — the union cost is rows-in-range, not
    corpus size."""
    return reach_table.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("user_sketch")))
        .cast("long")
        .alias("est_total_users"),
        F.sum("n_exact").cast("long").alias("sum_daily_exact"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
