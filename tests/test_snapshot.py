"""Corpus snapshot diffing (``operators/snapshot.py``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_summary,
)


def test_snapshot_diff_planted(spark):
    old = spark.createDataFrame(
        [
            (1, "alpha", "en"),
            (2, "beta", "en"),
            (3, "gamma", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha", "en"),        # unchanged
            (2, "beta REWRITTEN", "en"),  # changed
            (4, "delta", "de"),        # added; 3 removed
        ],
        "doc_id long, text string, lang string",
    )
    diff = snapshot_diff(old, new, "doc_id", ["text", "lang"])
    got = {r["doc_id"]: r["status"] for r in diff.collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    # fingerprints populated on the sides that exist
    rows = {r["doc_id"]: r for r in diff.collect()}
    assert rows[4]["old_fp"] is None and rows[4]["new_fp"] is not None
    assert rows[3]["new_fp"] is None and rows[3]["old_fp"] is not None
    assert rows[1]["old_fp"] == rows[1]["new_fp"]
    summary = {
        r["status"]: r["n"] for r in snapshot_diff_summary(diff).collect()
    }
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_lang_only_change_detected(spark):
    """The fingerprint must cover every content column, and the column
    separator must prevent cross-boundary collisions ('ab'+'c' vs
    'a'+'bc')."""
    old = spark.createDataFrame(
        [(1, "text", "en"), (2, "ab", "c")],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [(1, "text", "fr"), (2, "a", "bc")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, "doc_id", ["text", "lang"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_swap_symmetry(spark, sf_dir):
    """diff(old, new) and diff(new, old) must mirror: added ↔ removed,
    changed/unchanged fixed points — the involution any diff must satisfy."""
    from sample_deepbook_margin_dune_dbt_spark.queries.common import load

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0)
    fwd = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, "doc_id", ["text"]).collect()
    }
    rev = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(new, old, "doc_id", ["text"]).collect()
    }
    flip = {"added": "removed", "removed": "added",
            "changed": "changed", "unchanged": "unchanged"}
    assert rev == {k: flip[v] for k, v in fwd.items()}


def test_snapshot_diff_self_is_all_unchanged(spark, sf_dir):
    from sample_deepbook_margin_dune_dbt_spark.queries.common import load

    docs = load(spark, sf_dir, "documents")
    diff = snapshot_diff(docs, docs, "doc_id", ["text", "lang"])
    assert diff.filter(F.col("status") != "unchanged").count() == 0
