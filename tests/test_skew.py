"""Skew salting exercised on actually-skewed data (verdict r1 item 6).

The round-1 suite proved salted ≡ plain on uniform toy data; these tests
use the manufactured zipf-grade hot key (~50% of events collapse into one
key) and assert the thing salting is FOR: the hot key's rows split across
shuffle partitions instead of funnelling through one task.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators import skew
from sample_deepbook_margin_dune_dbt_spark.queries.skewbench import (
    q_plain_agg,
    q_salted_agg,
    q_salted_join,
    skewed_events,
)


def _partition_rows(df) -> list[int]:
    counts = (
        df.withColumn("_pid", F.spark_partition_id()).groupBy("_pid").count().collect()
    )
    return [r["count"] for r in counts]


def test_hot_key_is_actually_hot(spark, sf_dir):
    ev = skewed_events(spark, sf_dir)
    total = ev.count()
    hot = ev.filter(F.col("skew_key") == 1).count()
    assert hot >= 0.4 * total, f"fixture lost its skew: {hot}/{total}"


def test_salting_splits_the_hot_key_shuffle(spark, sf_dir):
    """Partitioning by the raw key funnels ≥40% of rows into one partition;
    partitioning by (key, salt) caps the max partition near uniform."""
    ev = skewed_events(spark, sf_dir)
    total = ev.count()
    n_part, n_salts = 16, 16

    plain = _partition_rows(ev.repartition(n_part, "skew_key"))
    salted = _partition_rows(
        skew.with_salt(ev, n_salts).repartition(n_part, "skew_key", "_salt")
    )
    assert max(plain) >= 0.4 * total, "hot key should dominate one partition"
    # the hot key's rows must spread: the busiest salted partition carries
    # at most a third of what the busiest plain partition does (≈3-8× split
    # depending on sf; hash collisions from the cold keys add noise)
    assert max(salted) < max(plain) / 3, (max(plain), max(salted))


def test_salted_agg_matches_plain_on_skewed_data(spark, sf_dir):
    plain = {r["skew_key"]: (r["total_value"], r["n"]) for r in q_plain_agg(spark, sf_dir).collect()}
    salted = {r["skew_key"]: (r["total_value"], r["n"]) for r in q_salted_agg(spark, sf_dir).collect()}
    assert plain == salted and len(plain) > 1


def test_salted_join_matches_plain_on_skewed_data(spark, sf_dir):
    from sample_deepbook_margin_dune_dbt_spark.queries.common import dsum2, load

    ev = skewed_events(spark, sf_dir)
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_key"), "c_mktsegment"
    )
    plain = {
        r["c_mktsegment"]: (r["n"], r["total_value"])
        for r in ev.join(dim, "skew_key")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), dsum2(F.col("value")).alias("total_value"))
        .collect()
    }
    salted = {
        r["c_mktsegment"]: (r["n"], r["total_value"])
        for r in q_salted_join(spark, sf_dir).collect()
    }
    assert plain == salted and len(plain) >= 3


def test_hotness_report_flags_hot_key(spark, sf_dir):
    from sample_deepbook_margin_dune_dbt_spark.operators.skew import hotness_report
    from sample_deepbook_margin_dune_dbt_spark.queries.skewbench import skewed_events

    rows = hotness_report(skewed_events(spark, sf_dir), "skew_key", top_k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    top = rows[0]
    assert top["skew_key"] == 1  # the manufactured hot key
    assert 400_000 <= top["share_ppm"] <= 700_000  # the one hot key holds ~half+ of rows
    assert top["n_keys"] >= 3 and top["total_rows"] > top["n"]
