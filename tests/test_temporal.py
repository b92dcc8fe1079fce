"""As-of join and binned range join operator contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "A"), (2, 15, "A"), (3, 5, "B"), (4, 100, "A"), (5, 8, "A")],
        "id long, t long, k string",
    )
    right = spark.createDataFrame(
        [(8, "A", 1.0), (12, "A", 2.0), (50, "A", 3.0), (7, "B", 9.0)],
        "rt long, k string, px double",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _sides(spark)
    out = {r["id"]: r["px"] for r in asof_join(left, right, "t", "rt", by=["k"]).collect()}
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: 3.0, 5: 1.0}
    # t == rt exactly → inclusive (row 5 at t=8 sees rt=8)


def test_asof_tolerance(spark):
    left, right = _sides(spark)
    out = {
        r["id"]: r["px"]
        for r in asof_join(left, right, "t", "rt", by=["k"], tolerance=5).collect()
    }
    # id 4: t=100, latest right at 50 → staleness 50 > 5 → NULL
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: None, 5: 1.0}


def test_asof_row_atomicity_and_null_values(spark):
    """The match must be row-atomic (merge_asof semantics): every value
    column comes from the SAME right row, and a matched right row whose
    value is legitimately NULL yields NULL — never an older non-null value
    stitched in per-column."""
    left = spark.createDataFrame([(1, 20, "A"), (2, 40, "A")], "id long, t long, k string")
    right = spark.createDataFrame(
        [(10, "A", 1.0, "x"), (30, "A", None, None)],
        "rt long, k string, px double, src string",
    )
    rows = {
        r["id"]: (r["px"], r["src"])
        for r in asof_join(left, right, "t", "rt", by=["k"]).collect()
    }
    assert rows[1] == (1.0, "x")
    # latest right row at t=40 is rt=30 with NULL values → NULLs, not (1.0, "x")
    assert rows[2] == (None, None)


def test_asof_no_join_node(spark):
    """The as-of plan is union+window — no join operator at all."""
    from sample_deepbook_margin_dune_dbt_spark.plans import explain_str

    left, right = _sides(spark)
    plan = explain_str(asof_join(left, right, "t", "rt", by=["k"]), "simple")
    assert "Join" not in plan, plan


def test_range_join_binned_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, "u", i * 7) for i in range(100)], "pid long, k string, t long"
    )
    intervals = spark.createDataFrame(
        [(0, "u", 10, 50), (1, "u", 45, 200), (2, "u", 600, 610)],
        "iid long, k string, s long, e long",
    )
    binned = {
        (r["pid"], r["iid"])
        for r in range_join_binned(points, intervals, "t", "s", "e", bin_size=30, by=["k"]).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.join(intervals, "k")
        .filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
        .collect()
    }
    assert binned == naive and len(naive) > 0
