"""Unit tests for the r9 retrieval/linkage/canonical-selection operators.

Oracle parity for the five query-level surfaces lives in
``tests/test_oracle_parity.py`` (they are registered in FULL_QUERIES);
this file pins the operator-level contracts the oracles can't see:
tie-breaks, caps, truncation semantics, and plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators import linkage as L
from sample_deepbook_margin_dune_dbt_spark.operators import retrieval as R
from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
    cluster_trust,
    keep_best_per_cluster,
)


# ------------------------------------------------------------------- BM25


def test_bm25_basic_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),  # high tf of one query term
            (2, "spark table"),  # two distinct query terms
            (3, "other words only"),  # no hit → absent
            (4, "table"),
        ],
        ["doc_id", "text"],
    )
    out = R.bm25_scores(docs, "doc_id", "text", ["spark", "table"], top_k=10)
    rows = {r["id"]: r for r in out.collect()}
    assert 3 not in rows  # docs with zero query terms never appear
    assert rows[2]["n_terms_hit"] == 2 and rows[1]["n_terms_hit"] == 1
    # two rare-ish terms beat repeated occurrences of one (idf + saturation)
    assert rows[2]["bm25_e8"] > rows[1]["bm25_e8"]
    ranks = [r["rank"] for r in sorted(rows.values(), key=lambda r: r["rank"])]
    assert ranks == list(range(1, len(rows) + 1))


def test_bm25_rank_tie_breaks_by_id(spark):
    docs = spark.createDataFrame(
        [(10, "same text"), (2, "same text"), (7, "same text")],
        ["doc_id", "text"],
    )
    out = R.bm25_scores(docs, "doc_id", "text", ["same"], top_k=10).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert [r["id"] for r in by_rank] == [2, 7, 10]  # equal scores → id asc


def test_bm25_top_k_bounds_output(spark):
    docs = spark.createDataFrame(
        [(i, "term filler") for i in range(30)], ["doc_id", "text"]
    )
    out = R.bm25_scores(docs, "doc_id", "text", ["term"], top_k=5)
    assert out.count() == 5


def _idf_e4(n_docs: int, df: int) -> int:
    return ((2 * (n_docs - df) + 1) * 10_000) // (2 * df + 1)


def _tfnorm_e4(tf: int, dl: int, n_docs: int, sum_dl: int) -> int:
    dlr_e3 = (dl * n_docs * 1000) // sum_dl
    return (22000 * tf * 10_000) // (10000 * tf + 3000 + 9 * dlr_e3)


def test_bm25_integer_formula_properties():
    """Formula-level pins for the fixed-point arithmetic (pure Python —
    both engines evaluate the identical integer expressions)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    I64 = 2**63 - 1

    @settings(max_examples=200, deadline=None)
    @given(
        n_docs=st.integers(1, 10**9),
        df=st.integers(1, 10**9),
        tf=st.integers(1, 10**4),
        dl=st.integers(1, 10**6),
        avg_dl=st.integers(1, 10**4),
    )
    def check(n_docs, df, tf, dl, avg_dl):
        df = min(df, n_docs)
        sum_dl = n_docs * avg_dl  # keeps dl/avgdl in a realistic range
        idf = _idf_e4(n_docs, df)
        tfn = _tfnorm_e4(tf, dl, n_docs, sum_dl)
        # every intermediate of the staged form stays int64 — the
        # docstring's web-scale safety claim (dl ≤ 1e6, N ≤ 1e9)
        assert (2 * (n_docs - df) + 1) * 10_000 <= I64
        assert dl * n_docs * 1000 <= I64
        dlr_e3 = (dl * n_docs * 1000) // sum_dl
        assert 10000 * tf + 3000 + 9 * dlr_e3 <= I64
        assert 22000 * tf * 10_000 <= I64
        assert 0 <= idf * tfn <= I64
        # idf monotone non-increasing in df
        if df < n_docs:
            assert _idf_e4(n_docs, df + 1) <= idf
        # tf saturation: more occurrences never lower the term score
        assert _tfnorm_e4(tf + 1, dl, n_docs, sum_dl) >= tfn
        # longer documents are penalized (fixed tf)
        assert _tfnorm_e4(tf, dl + 1, n_docs, sum_dl) <= tfn
        # saturation ceiling: tfnorm < (k1+1) = 2.2 at fixed point
        assert tfn <= 22_000

    check()


# ------------------------------------------------- edit-distance verify


def _mk_candidates(spark, pairs):
    return spark.createDataFrame(pairs, ["id_a", "id_b"])


def test_edit_distance_verify_filters_by_normalized_ratio(spark):
    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"),  # len 10
            (2, "abcdefghiX"),  # dist 1 → 10% → kept at 30%
            (3, "XXXXefghij"),  # dist 4 → 40% → dropped
        ],
        ["doc_id", "text"],
    )
    cand = _mk_candidates(spark, [(1, 2), (1, 3)])
    out = L.edit_distance_verify(docs, "doc_id", "text", cand, max_dist_pct=30)
    rows = out.collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 2)}
    (r,) = rows
    assert r["dist"] == 1 and r["max_len"] == 10
    assert r["dist_pct_e4"] == 100_000  # 1/10 → 10% at fixed-point 1e6


def test_edit_distance_verify_max_chars_truncates_both_sides(spark):
    # identical prefixes, all edits past the cap → dist 0 under the cap
    docs = spark.createDataFrame(
        [(1, "prefix AAAA"), (2, "prefix BBBB")], ["doc_id", "text"]
    )
    cand = _mk_candidates(spark, [(1, 2)])
    capped = L.edit_distance_verify(
        docs, "doc_id", "text", cand, max_dist_pct=0, max_chars=6
    ).collect()
    assert len(capped) == 1 and capped[0]["dist"] == 0
    uncapped = L.edit_distance_verify(
        docs, "doc_id", "text", cand, max_dist_pct=0
    ).collect()
    assert uncapped == []  # dist 4 > 0%


def test_edit_distance_verify_empty_texts_no_div_zero(spark):
    docs = spark.createDataFrame([(1, ""), (2, "")], ["doc_id", "text"])
    cand = _mk_candidates(spark, [(1, 2)])
    (r,) = L.edit_distance_verify(
        docs, "doc_id", "text", cand, max_dist_pct=30
    ).collect()
    assert r["dist"] == 0 and r["max_len"] == 0 and r["dist_pct_e4"] == 0


# --------------------------------------------------- blocked fuzzy pairs


def test_blocked_fuzzy_pairs_blocks_and_matches(spark):
    df = spark.createDataFrame(
        [
            (1, "red bolt"),
            (2, "rod bolt"),  # dist 2 from "red bolt", same block "bolt"
            (3, "red ring"),  # different block → never compared
            (4, "blue bolt"),  # dist 3 from "red bolt" → filtered
        ],
        ["id", "name"],
    )
    out = L.blocked_fuzzy_pairs(
        df, "id", "name", ["element_at(split(name, ' '), -1)"], max_dist=2
    ).collect()
    assert {(r["id_a"], r["id_b"], r["dist"]) for r in out} == {(1, 2, 1)}
    assert out[0]["block_key"] == "bolt"


def test_blocked_fuzzy_pairs_drops_oversized_blocks(spark):
    rows = [(i, "dup name") for i in range(6)] + [(100, "solo x"), (101, "solo y")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = L.blocked_fuzzy_pairs(
        df,
        "id",
        "name",
        ["element_at(split(name, ' '), -1)"],
        max_dist=2,
        max_block_size=5,
    ).collect()
    # the 6-member "name" block exceeds the cap and is dropped whole;
    # the 2-member "x"/"y" blocks are singletons (no pairs)
    assert out == []


def test_blocked_fuzzy_pairs_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["id", "name"])
    plan = L.blocked_fuzzy_pairs(
        df, "id", "name", ["element_at(split(name, ' '), -1)"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------- shingle containment


def test_containment_catches_subset_jaccard_misses(spark):
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    page = quote + " " + " ".join(f"w{i} x{i} y{i}" for i in range(12))
    docs = spark.createDataFrame([(1, quote), (2, page)], ["doc_id", "text"])
    cont = shingle_containment_pairs(
        docs, "doc_id", "text", n=3, threshold_e6=900_000
    ).collect()
    assert len(cont) == 1
    (r,) = cont
    # every shingle of the quote appears in the page → containment 1.0
    assert r["containment_e6"] == 1_000_000
    assert r["size_a"] == 3 and r["n_inter"] == 3
    # symmetric Jaccard under-scores the same pair by the length ratio
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    assert jac.count() == 0


# ------------------------------------------------- canonical selection


def test_keep_best_per_cluster_argmax_and_tiebreak(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], ["id", "cluster_id"]
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (10, 5), (11, 5)], ["doc_id", "n_chars"]
    )
    out = {
        r["cluster_id"]: r
        for r in keep_best_per_cluster(clusters, docs, "doc_id", "n_chars").collect()
    }
    # quality argmax: 2 and 3 tie at 90 → min id 2 wins
    assert out[1]["canonical_doc_id"] == 2 and out[1]["canonical_quality"] == 90
    assert out[1]["cluster_size"] == 3
    # tie across the whole cluster → min id
    assert out[10]["canonical_doc_id"] == 10 and out[10]["cluster_size"] == 2


def test_keep_best_is_grouped_agg_not_window(spark):
    clusters = spark.createDataFrame([(1, 1), (2, 1)], ["id", "cluster_id"])
    docs = spark.createDataFrame([(1, 5), (2, 6)], ["doc_id", "n_chars"])
    plan = (
        keep_best_per_cluster(clusters, docs, "doc_id", "n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the argmax must be a partial-aggregating groupBy (combine tree),
    # never a Window buffering a whole cluster in one task. struct-max is
    # not hash-aggregable, so Catalyst plans SortAggregate — the partial_
    # prefix is what proves map-side combining.
    assert "Window" not in plan
    assert "partial_max" in plan


# ----------------------------------------------------- cluster trust


def _trust(spark, clusters, docs):
    c = spark.createDataFrame(clusters, ["id", "cluster_id"])
    d = spark.createDataFrame(docs, ["doc_id", "source"])
    out = cluster_trust(c, d, "doc_id", F.col("source") == "wiki")
    return {r["id"]: r for r in out.collect()}


def test_cluster_trust_mirror_inherits_and_singletons_self(spark):
    # cluster {1,2,3}: one trusted member → every member scores 1/3;
    # 4 is a trusted singleton (own cluster, trust 1.0); 5 untrusted
    got = _trust(
        spark,
        [(1, 1), (2, 1), (3, 1)],
        [(1, "wiki"), (2, "mirror"), (3, "spam"), (4, "wiki"), (5, "crawl")],
    )
    assert len(got) == 5
    for i in (1, 2, 3):
        assert got[i]["cluster_size"] == 3 and got[i]["n_trusted"] == 1
        assert got[i]["trust_e6"] == 1_000_000 // 3
    assert got[2]["is_trusted"] is False and got[1]["is_trusted"] is True
    assert got[4]["cluster_size"] == 1 and got[4]["trust_e6"] == 1_000_000
    assert got[5]["trust_e6"] == 0 and got[5]["cluster_id"] == 5


def test_cluster_trust_all_or_none(spark):
    got = _trust(
        spark,
        [(1, 1), (2, 1)],
        [(1, "wiki"), (2, "wiki"), (3, "spam")],
    )
    assert got[1]["trust_e6"] == got[2]["trust_e6"] == 1_000_000
    assert got[3]["trust_e6"] == 0
