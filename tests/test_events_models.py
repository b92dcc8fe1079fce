"""Incremental sketch-reach model (``models_events``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark.models_events.models import total_reach
from sample_deepbook_margin_dune_dbt_spark.queries.common import load
from sample_deepbook_margin_dune_dbt_spark.sources import testdata_sources
import sample_deepbook_margin_dune_dbt_spark.models_events  # noqa: F401


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    store = TableStore(spark, str(tmp_path_factory.mktemp("events_wh")))
    runner = Runner(spark, store, testdata_sources(sf_dir))
    runner.run("+events_user_reach_daily")
    return runner, store


def test_daily_rows_match_exact(built, spark, sf_dir):
    _, store = built
    reach = store.read("events_user_reach_daily")
    ev = load(spark, sf_dir, "events")
    want = {
        r["d"]: (r["n_exact"], r["n_events"])
        for r in ev.groupBy(F.to_date("ts").alias("d")).agg(
            F.count_distinct("user_id").cast("long").alias("n_exact"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        ).collect()
    }
    got = {
        r["d"]: (r["n_exact"], r["n_events"]) for r in reach.collect()
    }
    assert got == want


def test_incremental_rerun_idempotent(built):
    runner, store = built
    before = {
        r["d"]: r["n_exact"]
        for r in store.read("events_user_reach_daily").collect()
    }
    runner.run("+events_user_reach_daily")  # boundary-day reprocess + MERGE
    after = {
        r["d"]: r["n_exact"]
        for r in store.read("events_user_reach_daily").collect()
    }
    assert after == before
    assert runner.test("+events_user_reach_daily") == {}


def test_sketch_union_estimates_total_reach(built, spark, sf_dir):
    """Unioned daily sketches ≈ exact all-time distinct (within HLL lg14
    error), while summed daily exacts overcount returnees — the reason
    the sketch column exists."""
    _, store = built
    got = total_reach(store.read("events_user_reach_daily")).first()
    exact = (
        load(spark, sf_dir, "events")
        .agg(F.count_distinct("user_id"))
        .first()[0]
    )
    assert abs(got["est_total_users"] - exact) <= 0.05 * exact
    assert got["sum_daily_exact"] >= exact  # returnees double-count


def test_range_filtered_reach(built):
    """Reach over a date slice unions only the rows in range."""
    _, store = built
    reach = store.read("events_user_reach_daily")
    days = sorted(r["d"] for r in reach.select("d").collect())
    half = reach.filter(F.col("d") <= days[len(days) // 2])
    got = total_reach(half).first()
    assert 0 < got["n_days"] < len(days)
    assert got["est_total_users"] > 0
