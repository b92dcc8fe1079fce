"""Stream-stream interval join (``streaming/joins.py``): batch parity,
interval bounds, and cross-batch matching through the state store."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.streaming.joins import stream_interval_join

IMP_SCHEMA = "user_id long, imp_ts timestamp, ad string"
CLK_SCHEMA = "user_id long, clk_ts timestamp, target string"


def _t(minutes: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=minutes)


@pytest.fixture()
def harness(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drop(dir_, rows, cols):
        pd.DataFrame(rows, columns=cols).to_parquet(
            f"{dir_}/b{len(rows)}_{abs(hash(str(rows))) % 10**8}.parquet",
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    import os

    os.makedirs(imp_dir), os.makedirs(clk_dir)

    def run():
        imp = spark.readStream.schema(IMP_SCHEMA).parquet(imp_dir)
        clk = spark.readStream.schema(CLK_SCHEMA).parquet(clk_dir)
        q = (
            stream_interval_join(
                imp, clk, "user_id", "imp_ts", "clk_ts", interval="30 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    return drop, run, imp_dir, clk_dir, out


def test_interval_join_matches_batch(spark, harness):
    drop, run, imp_dir, clk_dir, out = harness
    imps = [
        (1, _t(0), "adA"),
        (1, _t(100), "adB"),
        (2, _t(0), "adC"),
    ]
    clks = [
        (1, _t(10), "siteX"),   # joins adA (within 30m)
        (1, _t(45), "siteY"),   # outside adA's window, before adB
        (1, _t(110), "siteZ"),  # joins adB
        (3, _t(5), "siteW"),    # no impression for user 3
    ]
    drop(imp_dir, imps, ["user_id", "imp_ts", "ad"])
    drop(clk_dir, clks, ["user_id", "clk_ts", "target"])
    run()
    got = {
        (r["user_id"], r["ad"], r["target"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["user_id"], r["ad"], r["target"])
        for r in spark.createDataFrame(imps, IMP_SCHEMA)
        .alias("i")
        .join(
            spark.createDataFrame(clks, CLK_SCHEMA).alias("c"),
            (F.col("i.user_id") == F.col("c.user_id"))
            & (F.col("clk_ts") >= F.col("imp_ts"))
            & (F.col("clk_ts") <= F.col("imp_ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select("i.user_id", "ad", "target")
        .collect()
    }
    assert got == batch == {(1, "adA", "siteX"), (1, "adB", "siteZ")}


def test_interval_join_matches_across_batches(spark, harness):
    """An impression buffered in batch 1 must join a click arriving in a
    later micro-batch (state-store buffering), and watermark-expired
    impressions must not."""
    drop, run, imp_dir, clk_dir, out = harness
    drop(imp_dir, [(1, _t(0), "adA")], ["user_id", "imp_ts", "ad"])
    drop(clk_dir, [(9, _t(0), "noise")], ["user_id", "clk_ts", "target"])
    run()
    assert spark.read.parquet(out).count() == 0

    # batch 2: click for user 1 inside the window -> joins the buffered imp
    drop(clk_dir, [(1, _t(20), "siteX")], ["user_id", "clk_ts", "target"])
    run()
    got = [
        (r["user_id"], r["ad"], r["target"]) for r in spark.read.parquet(out).collect()
    ]
    assert got == [(1, "adA", "siteX")]
