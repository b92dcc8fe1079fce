"""Deterministic hash-sampling operator contracts.

Oracle parity for the three sampling queries runs in
``test_oracle_parity.py`` (they're in FULL_QUERIES); these tests pin the
semantic properties parity can't see: determinism across runs, nesting,
split disjointness/stability, and quota bounds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators import sampling as SM
from sample_deepbook_margin_dune_dbt_spark.queries.common import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_hash_sample_reproducible_and_calibrated(docs):
    total = docs.count()
    s1 = _ids(SM.hash_sample(docs, "doc_id", 0.3, salt="a"))
    s2 = _ids(SM.hash_sample(docs, "doc_id", 0.3, salt="a"))
    assert s1 == s2, "same key+salt+fraction must select identical rows"
    # md5 variate is uniform: observed rate within ±8 points at n=500
    assert abs(len(s1) / total - 0.3) < 0.08


def test_hash_sample_nested_and_salt_independent(docs):
    small = _ids(SM.hash_sample(docs, "doc_id", 0.1, salt="a"))
    big = _ids(SM.hash_sample(docs, "doc_id", 0.4, salt="a"))
    assert small <= big, "same salt: larger fraction must be a superset"
    other = _ids(SM.hash_sample(docs, "doc_id", 0.1, salt="b"))
    assert small != other, "different salts must draw different samples"


def test_train_val_test_disjoint_total_and_stable_under_growth(docs):
    split = SM.train_val_test_split(docs, "doc_id", 0.1, 0.1)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # disjoint + exhaustive
    # split membership is per-key: the same doc keeps its split when the
    # corpus shrinks/grows (here: recompute on a half corpus)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_map = {r["doc_id"]: r["split"] for r in split.select("doc_id", "split").collect()}
    for r in SM.train_val_test_split(half, "doc_id", 0.1, 0.1).select("doc_id", "split").collect():
        assert full_map[r["doc_id"]] == r["split"]


def test_stratified_quota_bounds_and_determinism(docs):
    out = SM.stratified_quota_sample(docs, ["lang", "source"], 3, "doc_id")
    per = out.groupBy("lang", "source").agg(F.count("*").alias("n"))
    assert per.agg(F.max("n")).first()[0] <= 3
    # strata smaller than the quota keep all their rows
    sizes = {
        (r["lang"], r["source"]): r["n"]
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    kept = {(r["lang"], r["source"]): r["n"] for r in per.collect()}
    for k, n in sizes.items():
        assert kept[k] == min(n, 3), (k, n, kept[k])
    assert _ids(out) == _ids(SM.stratified_quota_sample(docs, ["lang", "source"], 3, "doc_id"))


def test_sampling_is_map_only(spark, docs):
    """Bernoulli sampling must stay a scan+filter — no shuffle, no UDF."""
    from sample_deepbook_margin_dune_dbt_spark.plans import explain_str

    plan = explain_str(SM.hash_sample(docs, "doc_id", 0.5), "formatted")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temporal_split_wide_range_no_overflow(spark):
    """ADVICE r11 (high): the naive ``range * frac`` cutoff wraps int64
    once the time range exceeds ~1.15e13 µs (~133 days), silently
    mislabeling train/holdout. The decomposed form must match the exact
    Python-integer cutoff on a multi-year range (and on a sub-second
    range, covering the remainder term)."""
    for mn, mx in [
        (1_500_000_000_000_000, 1_500_000_000_000_000 + 4_000_000_000_000_000),
        (7, 999_991),  # range < 1e6: cutoff carried entirely by remainder
    ]:
        rng = mx - mn
        cut = mn + (rng // 1_000_000) * 800_000 + ((rng % 1_000_000) * 800_000) // 1_000_000
        probes = sorted({mn, mx, cut - 1, cut, cut + 1, mn + rng // 3})
        probes = [t for t in probes if mn <= t <= mx]
        df = spark.createDataFrame([(t,) for t in probes], "ts_us long")
        got = {r["ts_us"]: r["split"] for r in SM.temporal_split(df, "ts_us").collect()}
        for t in probes:
            want = "train" if t < cut else "holdout"
            assert got[t] == want, (mn, mx, t, cut, got[t])
    with pytest.raises(ValueError):
        SM.temporal_split(spark.range(1).select(F.col("id").alias("ts_us")), "ts_us", train_frac_e6=2_000_000)


def test_fingerprint_split_never_straddles(spark, sf_dir):
    """Leakage-safe split invariant: a content fingerprint appears in
    exactly ONE split, however many doc ids carry it (the property the
    fingerprint keying exists for — a doc_id-keyed split scatters the
    planted duplicates across splits)."""
    from pyspark.sql import functions as F

    from sample_deepbook_margin_dune_dbt_spark.operators import sampling as SM
    from sample_deepbook_margin_dune_dbt_spark.queries.common import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    keyed = docs.unionByName(dups).withColumn("fp", F.md5("text"))

    by_fp = SM.train_val_test_split(keyed, "fp", 0.1, 0.1)
    straddle = (
        by_fp.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0

    # the contrast: id-keyed splitting DOES scatter duplicated content
    by_id = SM.train_val_test_split(keyed, "doc_id", 0.1, 0.1)
    scattered = (
        by_id.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert scattered > 0, "planted dups must expose the id-keyed leakage"
