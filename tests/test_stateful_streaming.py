"""Stateful streaming sessionizer: sessions must stitch across micro-batches."""

from __future__ import annotations

import pandas as pd

from sample_deepbook_margin_dune_dbt_spark.streaming.stateful import streaming_sessionize

GAP = 1000


def _run_batch(spark, src_dir, ckpt_dir, out_dir):
    stream = spark.readStream.schema("user_id long, ts_us long, value double").parquet(src_dir)
    q = (
        streaming_sessionize(stream, gap=GAP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_sessions_stitch_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: user 1 — session A (2 events), then a gap, session B starts
    pd.DataFrame(
        {"user_id": [1, 1, 1], "ts_us": [100, 600, 5000], "value": [1.0, 2.0, 3.0]}
    ).to_parquet(str(src / "b1.parquet"), index=False)
    _run_batch(spark, str(src), ckpt, out)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1  # session A closed when the 5000 event arrived
    a = got[0]
    assert (a["session_start"], a["session_end"], a["n_events"], a["sum_value"]) == (100, 600, 2, 3.0)

    # batch 2: event at 5400 extends session B across the batch boundary;
    # event at 99999 closes it
    pd.DataFrame(
        {"user_id": [1, 1], "ts_us": [5400, 99999], "value": [4.0, 5.0]}
    ).to_parquet(str(src / "b2.parquet"), index=False)
    _run_batch(spark, str(src), ckpt, out)
    got = {(r["session_start"], r["session_end"]): r for r in spark.read.parquet(out).collect()}
    assert (100, 600) in got
    b = got[(5000, 5400)]  # session B spans batches 1 and 2
    assert b["n_events"] == 2 and b["sum_value"] == 7.0
    assert len(got) == 2  # the 99999 session is still open (in state)
