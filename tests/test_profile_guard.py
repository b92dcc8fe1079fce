"""Overflow guard for events_outlier_zscore (ADVICE r5): the squared
decimal(38,0) z-score terms silently NULL past 38 digits with ANSI off,
so the screen must fail loudly — not undercount — once n*max|c| exceeds
the overflow-safe bound 7e17. Single values are already bounded by the
DECIMAL(12,2) input grid (< 1e12 cents), so the realistic trip is row
count × magnitude; the factored core is tested at that scale directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.queries.profileq import (
    _outlier_screen,
    q_events_outlier_zscore,
)


def _ev(spark, cents: list[tuple[str, int]]):
    return spark.createDataFrame(cents, "event_type string, c_raw long").select(
        "event_type", F.col("c_raw").cast("decimal(38,0)").alias("c")
    )


def test_outlier_guard_trips_on_overflow_scale(spark):
    # two rows at 5e17 cents → n·max|c| = 1e18 > 7e17; the guard rides the
    # stats join as a raise_error branch, so it surfaces as a Spark
    # execution error carrying the diagnostic message
    big = _ev(spark, [("a", 5 * 10**17), ("a", 5 * 10**17 - 1)])
    with pytest.raises(Exception, match="overflow-safe bound"):
        _outlier_screen(big).collect()


def test_outlier_guard_passes_within_bound(spark):
    # 30 baseline rows + one spike: the spike is the only >3σ row (with
    # tiny n a single extreme can't exceed 3σ — max z is (n−1)/√n)
    ok = _ev(spark, [("a", 100)] * 30 + [("a", 10_000)])
    rows = {r["event_type"]: r for r in _outlier_screen(ok).collect()}
    assert rows["a"]["n_rows"] == 31
    assert rows["a"]["n_outliers"] == 1
    assert rows["a"]["max_outlier_cents"] == 10_000


def test_outlier_query_passes_normal_scale(spark, sf_dir):
    out = {r["event_type"]: r for r in q_events_outlier_zscore(spark, sf_dir).collect()}
    assert out, "screen must produce per-type rows"
    # the planted extremes keep the screen non-vacuous
    assert out["purchase"]["n_outliers"] >= 1
