"""Stateful streaming sessionizer: sessions must stitch across micro-batches."""

from __future__ import annotations

import pandas as pd

from sample_deepbook_margin_dune_dbt_spark.streaming.stateful import streaming_sessionize

GAP = 1000


def _run_batch(spark, src_dir, ckpt_dir, out_dir, gap=GAP, timeout="none"):
    stream = spark.readStream.schema("user_id long, ts_us long, value double").parquet(src_dir)
    q = (
        streaming_sessionize(stream, gap=gap, timeout=timeout)
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


def test_out_of_order_within_gap_keeps_session_end_monotonic(spark, tmp_path):
    """A late event inside the gap must fold into the session without
    pulling session_end backwards (else a following event could spuriously
    not close the session)."""
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    pd.DataFrame({"user_id": [1, 1], "ts_us": [100, 900], "value": [1.0, 2.0]}).to_parquet(
        str(src / "b1.parquet"), index=False
    )
    _run_batch(spark, str(src), ckpt, out)
    # batch 2: ts=500 is out-of-order but within gap of last_ts=900 → folds
    # in; last_ts stays 900. Then 5000 closes the session (100..900, 3 ev).
    pd.DataFrame({"user_id": [1, 1], "ts_us": [500, 5000], "value": [3.0, 4.0]}).to_parquet(
        str(src / "b2.parquet"), index=False
    )
    _run_batch(spark, str(src), ckpt, out)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["session_start"], r["session_end"], r["n_events"], r["sum_value"]) == (
        100, 900, 3, 6.0,
    )


def test_event_time_timeout_evicts_idle_sessions(spark, tmp_path):
    """Production mode: an idle session must EMIT via watermark timeout
    (state removed) without ever seeing a closing event from its own key."""
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sec = 1_000_000  # ts_us is epoch micros; use second-scale values so the
    # millisecond-granularity watermark actually advances

    # user 1: two events, then goes idle forever
    pd.DataFrame(
        {"user_id": [1, 1], "ts_us": [1 * sec, 2 * sec], "value": [1.0, 2.0]}
    ).to_parquet(str(src / "b1.parquet"), index=False)
    _run_batch(spark, str(src), ckpt, out, gap=sec, timeout="event_time")
    assert spark.read.parquet(out).count() == 0  # still open, nothing idle yet

    # batch 2: only user 2 appears, far in the future → after this batch the
    # watermark (max event time) is way past user 1's timeout at 3s
    pd.DataFrame({"user_id": [2], "ts_us": [100 * sec], "value": [9.0]}).to_parquet(
        str(src / "b2.parquet"), index=False
    )
    _run_batch(spark, str(src), ckpt, out, gap=sec, timeout="event_time")
    # batch 3: another user-2 event; at batch start the watermark is 100s >
    # user 1's 3s timeout → user 1's session times out and emits
    pd.DataFrame({"user_id": [2], "ts_us": [101 * sec], "value": [1.0]}).to_parquet(
        str(src / "b3.parquet"), index=False
    )
    _run_batch(spark, str(src), ckpt, out, gap=sec, timeout="event_time")

    got = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert 1 in got, "idle session must be emitted by event-time timeout"
    r = got[1]
    assert (r["session_start"], r["session_end"], r["n_events"], r["sum_value"]) == (
        1 * sec, 2 * sec, 2, 3.0,
    )
    assert 2 not in got  # user 2 still active (keeps extending its session)


# ------------------------------------------------------ streaming funnel


def _run_funnel(spark, src_dir, ckpt_dir, store, table):
    from sample_deepbook_margin_dune_dbt_spark.streaming import streaming_funnel

    stream = spark.readStream.schema(
        "user_id long, ts_us long, event_type string"
    ).parquet(src_dir)

    def _sink(batch_df, batch_id):
        store.merge(batch_df, table, ["user_id"])

    q = (
        streaming_funnel(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_funnel_matches_batch_semantics(spark, tmp_path):
    """One drop with in-batch disorder: per-user stages in the MERGEd
    live table must equal the batch funnel's strict-ordering
    memberships."""
    from sample_deepbook_margin_dune_dbt_spark.engine import TableStore

    src = tmp_path / "src"
    src.mkdir()
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    rows = [
        # u1 full conversion (delivered shuffled within the batch)
        (1, 300, "purchase"), (1, 100, "view"), (1, 200, "click"),
        # u2 click before first view -> stage 1 only
        (2, 100, "click"), (2, 200, "view"),
        # u3 view then purchase, no click -> stage 1
        (3, 100, "view"), (3, 200, "purchase"),
        # u4 never views -> no state, no row
        (4, 100, "click"),
    ]
    pd.DataFrame(rows, columns=["user_id", "ts_us", "event_type"]).to_parquet(
        str(src / "b1.parquet"), index=False
    )
    _run_funnel(spark, str(src), ckpt, store, "funnel")
    got = {r["user_id"]: r for r in store.read("funnel").collect()}
    assert {u: r["stage"] for u, r in got.items()} == {1: 3, 2: 1, 3: 1}
    assert (got[1]["t1"], got[1]["t2"], got[1]["t3"]) == (100, 200, 300)


def test_streaming_funnel_progresses_across_batches(spark, tmp_path):
    """State carries between micro-batches: a user at stage 1 advances to
    3 when later batches deliver the remaining steps; unchanged users
    keep their merged row."""
    from sample_deepbook_margin_dune_dbt_spark.engine import TableStore

    src = tmp_path / "src"
    src.mkdir()
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    pd.DataFrame(
        [(1, 100, "view"), (2, 100, "view")],
        columns=["user_id", "ts_us", "event_type"],
    ).to_parquet(str(src / "b1.parquet"), index=False)
    _run_funnel(spark, str(src), ckpt, store, "funnel")
    got = {r["user_id"]: r["stage"] for r in store.read("funnel").collect()}
    assert got == {1: 1, 2: 1}

    pd.DataFrame(
        [(1, 200, "click"), (1, 300, "purchase")],
        columns=["user_id", "ts_us", "event_type"],
    ).to_parquet(str(src / "b2.parquet"), index=False)
    _run_funnel(spark, str(src), ckpt, store, "funnel")
    got = {r["user_id"]: r for r in store.read("funnel").collect()}
    assert got[1]["stage"] == 3 and (got[1]["t2"], got[1]["t3"]) == (200, 300)
    assert got[2]["stage"] == 1  # untouched by the second batch's MERGE
    assert store.read("funnel").count() == 2
