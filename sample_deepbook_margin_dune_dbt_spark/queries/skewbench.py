"""Skew-mitigation demonstration queries (SURVEY §4 / 100 TB notes).

The testdata's ``events.user_id`` is uniform, so these queries MANUFACTURE
a zipf-grade hot key deterministically: every even ``user_id`` collapses
into key 1 (~50% of all rows — one key funnels half the table), the odd
ids stay distinct. That is exactly the shape AQE's skew handling covers
for sort-merge joins but plain hash aggregation/pre-AQE plans do not:

- ``skew_plain_agg`` / ``skew_salted_agg`` — identical semantics (grouped
  SUM/COUNT over the skewed key; both oracle-checked against the same
  DuckDB SQL); the salted twin runs ``operators/skew.salted_agg``'s
  two-phase (key, salt) → key aggregation so the hot key's partials
  spread over ``n_salts`` reduce tasks instead of one.
- ``skew_salted_join`` — the skewed fact joined to the 15k-row customer
  dim through ``operators/skew.salted_join_left`` (dim exploded per
  salt, fact salted), then re-aggregated; same oracle as the plain join.

At local bench scale the absolute skew cost is small (a 50k-row hot group
still fits one task); the queries exist so the salting machinery is
exercised and timed on actually-skewed data, and `tests/test_skew.py`
asserts the shuffle-level split (max-partition-rows drops ~n_salts×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import skew
from .common import dsum2, load, sql_dsum2

_SKEW_KEY_SQL = "CASE WHEN user_id % 2 = 0 THEN 1 ELSE user_id END"


def _skew_key() -> F.Column:
    """The hot-key rewrite: even user_ids → key 1 (half the table), odds
    keep their id. Key 1 also exists in customer (c_custkey 1), so joins
    stay total. A function, not a module constant — F.col needs an active
    session."""
    return F.when(F.col("user_id") % 2 == 0, F.lit(1)).otherwise(F.col("user_id"))


def skewed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").withColumn("skew_key", _skew_key())


def q_plain_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        skewed_events(spark, sf_dir)
        .groupBy("skew_key")
        .agg(dsum2(F.col("value")).alias("total_value"), F.count("*").alias("n"))
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skew.salted_agg(
        skewed_events(spark, sf_dir),
        keys=["skew_key"],
        aggs={
            "total_value": (
                lambda c: F.sum(c.cast("decimal(12,2)")),
                lambda c: F.sum(c).cast("double"),
                "value",
            ),
            # count like count(*) — F.count('value') would skip NULLs and
            # silently diverge from the count(*) oracle if value were ever
            # NULL (ADVICE r2)
            "n": (lambda c: F.count(F.lit(1)), F.sum, "value"),
        },
        n_salts=16,
    )


_AGG_ORACLE = f"""
SELECT {_SKEW_KEY_SQL} AS skew_key,
       {sql_dsum2('value')} AS total_value,
       count(*) AS n
FROM events
GROUP BY 1
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_key"), "c_mktsegment"
    )
    joined = skew.salted_join_left(
        skewed_events(spark, sf_dir), dim, on="skew_key", n_salts=16
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), dsum2(F.col("value")).alias("total_value")
    )


_JOIN_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS n,
       {sql_dsum2('value')} AS total_value
FROM (SELECT {_SKEW_KEY_SQL} AS skew_key, value FROM events) e
JOIN customer c ON c.c_custkey = e.skew_key
GROUP BY 1
"""

SKEW_QUERIES = {
    "skew_plain_agg": (q_plain_agg, _AGG_ORACLE),
    "skew_salted_agg": (q_salted_agg, _AGG_ORACLE),
    "skew_salted_join": (q_salted_join, _JOIN_ORACLE),
}


def q_hotness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotness diagnostics over the manufactured-skew key: the hot key
    surfaces at rank 1 with ~500000 ppm share (half the table)."""
    return skew.hotness_report(skewed_events(spark, sf_dir), "skew_key", top_k=5)


_HOTNESS_ORACLE = f"""
WITH k AS (SELECT {_SKEW_KEY_SQL} AS skew_key FROM events),
c AS (SELECT skew_key, count(*) AS n FROM k GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total_rows,
             CAST(count(*) AS BIGINT) AS n_keys FROM c),
r AS (
    SELECT CAST(row_number() OVER (ORDER BY n DESC, skew_key) AS BIGINT) AS rank,
           skew_key, CAST(n AS BIGINT) AS n
    FROM c
)
SELECT rank, skew_key, n,
       CAST(n * 1000000 // total_rows AS BIGINT) AS share_ppm,
       total_rows, n_keys
FROM r, t WHERE rank <= 5
"""

SKEW_QUERIES["skew_hotness_report"] = (q_hotness_report, _HOTNESS_ORACLE)
