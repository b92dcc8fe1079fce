"""Approximate-analytics tier: the 100 TB defaults next to the exact forms.

At cluster scale, exact ``COUNT(DISTINCT)`` shuffles every distinct value
and exact ``percentile`` buffers whole groups; the production defaults are
HyperLogLog++ (``approx_count_distinct``) and the Greenwald-Khanna sketch
(``approx_percentile``) — both single-pass, partial-aggregated, constant
memory per group. (Reference context: Dune's Trino exposes the same tier as
``approx_distinct`` / ``approx_percentile``; the reference's 30 s query
budget is exactly why these exist.)

Cross-engine checkability: sketch outputs differ between engines by design,
so the oracle contract is *tolerance booleans computed inside Spark* —
the query emits the exact value plus ``approx_*_ok`` flags asserting the
sketch landed within tolerance; the DuckDB oracle emits the exact value and
literal TRUE. The driver's value-hash then fails iff a sketch drifts out of
tolerance, giving a hard (not rows-only) correctness gate on approximate
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import load


def q_a_approx_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct + GK percentile vs their exact twins, per order status.

    ``approx_distinct_ok``: |HLL(rsd=0.02) - exact| ≤ 5% of exact.
    ``approx_p95_ok``: |GK(0.95, acc=10000) - exact discrete p95| ≤ 1% of
    exact (GK returns a data value; compare against ``percentile``'s
    interpolated p95 with a tolerance that absorbs the discrete/continuous
    gap).
    """
    o = load(spark, sf_dir, "orders")
    # The distinct count is aggregated SEPARATELY from the sketches: a
    # mixed distinct + non-distinct agg makes Catalyst key its first
    # stage on (group, distinct-col), so every (status, custkey) pair
    # carries its own HLL/GK/percentile partial buffer — ~|pairs| object
    # allocations whose per-status merge is single-keyed. Split, the
    # sketch pass partial-aggregates per (partition, status) with
    # constant buffers and the distinct pass stays whole-stage-codegen
    # longs; the re-join is |status| rows. Same result, same oracle,
    # ~|distinct pairs| fewer sketch buffers per scan.
    sketches = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_n_approx"),
        F.percentile(F.col("o_totalprice").cast("double"), F.lit(0.95)).alias("_p95_exact"),
        F.expr("approx_percentile(CAST(o_totalprice AS DOUBLE), 0.95, 10000)").alias(
            "_p95_approx"
        ),
    )
    exact = o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_exact")
    )
    agg = sketches.join(F.broadcast(exact), "o_orderstatus")
    return agg.select(
        "o_orderstatus",
        "n_exact",
        (
            F.abs(F.col("_n_approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("approx_distinct_ok"),
        (
            F.abs(F.col("_p95_approx") - F.col("_p95_exact"))
            <= 0.01 * F.col("_p95_exact")
        ).alias("approx_p95_ok"),
    )


SQL_APPROX_TIER = """
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
       TRUE AS approx_distinct_ok,
       TRUE AS approx_p95_ok
FROM orders
GROUP BY 1
"""


def q_a_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct: per-day Apache DataSketches HLL sketches
    (``hll_sketch_agg``) unioned into a total-reach estimate
    (``hll_union_agg``), gated against the exact total.

    THIS is the scalable incremental-distinct pattern: per-partition/
    per-batch sketches are small, mergeable, and re-aggregatable at any
    grain — an incremental model can MERGE daily sketch rows and answer
    "distinct users ever" without re-scanning history (exact distinct
    cannot compose that way: summing daily exacts overcounts returnees,
    which ``sum_daily_exact > total_exact`` in this query's own output
    demonstrates). Same tolerance-boolean oracle contract as
    :func:`q_a_approx_tier`.
    """
    from .common import event_ts

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(event_ts()).alias("d")).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("_sk"),
        F.count_distinct("user_id").cast("long").alias("_n_day"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk")))
        .cast("long")
        .alias("_est_total"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_n_day").cast("long").alias("sum_daily_exact"),
    )
    exact = ev.agg(F.count_distinct("user_id").cast("long").alias("total_exact"))
    return merged.crossJoin(exact).select(
        "n_days",
        "total_exact",
        "sum_daily_exact",
        (
            F.abs(F.col("_est_total") - F.col("total_exact"))
            <= 0.05 * F.col("total_exact")
        ).alias("sketch_union_ok"),
    )


SQL_SKETCH_UNION = """
SELECT (SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) FROM events) AS n_days,
       CAST(count(DISTINCT user_id) AS BIGINT) AS total_exact,
       (SELECT CAST(sum(n) AS BIGINT)
        FROM (SELECT count(DISTINCT user_id) AS n FROM events GROUP BY CAST(ts AS DATE))) AS sum_daily_exact,
       TRUE AS sketch_union_ok
FROM events
"""


APPROX_QUERIES = {
    "a_approx_tier": (q_a_approx_tier, SQL_APPROX_TIER),
    "a_sketch_union": (q_a_sketch_union, SQL_SKETCH_UNION),
}
