"""Watermarked tumbling-window streaming agg (``streaming/windows.py``):
stream ≡ batch parity over the same drops, cross-batch window updates,
and watermark late-event dropping."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import TableStore
from sample_deepbook_margin_dune_dbt_spark.streaming import stream_tumbling_agg

SCHEMA = "ts TIMESTAMP, event_type STRING, value DOUBLE"


def _rows(*specs):
    return [
        (dt.datetime(2026, 1, 1) + dt.timedelta(hours=h), et, float(v))
        for h, et, v in specs
    ]


@pytest.fixture()
def harness(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def run():
        q = stream_tumbling_agg(
            spark, landing, SCHEMA, store, "hourly", ckpt,
            window_duration="6 hours", watermark_delay="1 hour",
        )
        q.awaitTermination(120)

    return drop, run, store


def _table(store):
    return {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["volume"])
        for r in store.read("hourly").collect()
    }


def test_stream_matches_batch_windows(spark, harness):
    drop, run, store = harness
    rows = _rows((0, "view", 1.5), (1, "view", 2.0), (7, "click", 3.25),
                 (8, "view", 1.0), (13, "click", 4.0))
    drop(rows)
    run()
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["volume"])
        for r in spark.createDataFrame(rows, SCHEMA)
        .groupBy(
            F.window("ts", "6 hours").start.alias("bucket_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("volume"),
        )
        .collect()
    }
    assert _table(store) == batch


def test_stream_matches_batch_hopping_windows(spark, tmp_path):
    """Hopping twin (6h windows every 3h): the stream-built table must
    equal the batch F.window(..., slide) aggregation over the same rows —
    each event lands in two overlapping windows."""
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    rows = _rows((0, "view", 1.5), (2, "view", 2.0), (4, "click", 3.25),
                 (7, "view", 1.0), (10, "click", 4.0))
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(landing)
    q = stream_tumbling_agg(
        spark, landing, SCHEMA, store, "hopping", str(tmp_path / "ckpt"),
        window_duration="6 hours", watermark_delay="1 hour",
        slide_duration="3 hours",
    )
    q.awaitTermination(120)
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["volume"])
        for r in store.read("hopping").collect()
    }
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["volume"])
        for r in spark.createDataFrame(rows, SCHEMA)
        .groupBy(
            F.window("ts", "6 hours", "3 hours").start.alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("volume"),
        )
        .collect()
    }
    assert got == batch
    # overlap factor sanity: an hour-2 view sits in both the 00:00 and
    # the 21:00(-3h) windows → more (window,key) rows than tumbling would give
    assert len({b for b, _ in got}) >= 4


def test_cross_batch_window_update_and_late_drop(spark, harness):
    """A second drop inside the watermark updates its window (MERGE
    upsert); an event older than max_event_time - delay is dropped by the
    watermark — the streaming form of the late-data cutoff."""
    drop, run, store = harness
    drop(_rows((0, "view", 1.0), (12, "view", 5.0)))
    run()
    first = _table(store)
    b0 = dt.datetime(2026, 1, 1)
    assert first[(b0, "view")] == (1, 1.0)

    # within-watermark update for the hour-12 window (MERGE upsert); this
    # batch also commits the advanced watermark (hour 11) for the next one
    drop(_rows((12, "view", 7.0)))
    run()
    second = _table(store)
    assert second[(b0 + dt.timedelta(hours=12), "view")] == (2, 12.0)

    # a far-late event for the hour-0 window (12h late >> 1h delay) in the
    # NEXT batch: the restored watermark drops it (Spark applies the
    # watermark advanced by batch N starting at batch N+1)
    drop(_rows((0, "view", 100.0)))
    run()
    third = _table(store)
    assert third[(b0, "view")] == (1, 1.0), "late event must be dropped"
    assert third[(b0 + dt.timedelta(hours=12), "view")] == (2, 12.0)
