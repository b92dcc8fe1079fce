"""Corpus snapshot diffing: what changed between two dataset versions.

Training corpora are rebuilt continuously (new crawls land, takedowns
remove documents, cleaning passes rewrite text). Before retraining on —
or incrementally merging — a new snapshot, the operational questions are
"what was added, what vanished, what changed?" and "how much?". This is
the dataset-versioning diff a lakehouse gives you via table history,
expressed engine-neutrally over any two DataFrames.

Shape at scale: each side reduces to ``(id, fingerprint)`` — a narrow
map — then one FULL OUTER equi-join on the id. On bucketed/co-partitioned
snapshots the join is shuffle-free; otherwise it shuffles only the
two-column projections, never document payloads. No driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII unit separator: cannot appear in normal text, so multi-column
# fingerprints cannot collide across column boundaries
_SEP = "\x1f"


def content_fingerprint(*cols: str) -> F.Column:
    """md5 hex fingerprint over one or more columns (engine-portable:
    the DuckDB/Trino twin is ``md5(concat_ws(chr(31), ...))``)."""
    return F.md5(F.concat_ws(_SEP, *[F.col(c) for c in cols]))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Per-id diff of two corpus snapshots.

    Returns ``(id_col, status, old_fp, new_fp)`` where ``status`` ∈
    {'added', 'removed', 'changed', 'unchanged'} — added/removed by id
    presence, changed by content fingerprint inequality.
    """
    fp = content_fingerprint(*content_cols)
    return snapshot_diff_fingerprints(
        old.select(F.col(id_col), fp.alias("old_fp")),
        new.select(F.col(id_col), fp.alias("new_fp")),
        id_col,
    )


def snapshot_diff_fingerprints(
    old: DataFrame, new: DataFrame, id_col: str
) -> DataFrame:
    """:func:`snapshot_diff` over PRE-computed fingerprints: ``old`` must
    carry ``(id_col, old_fp)`` and ``new`` ``(id_col, new_fp)``. Use when
    a feature table already stores content fingerprints (any hash works —
    both sides just have to use the same one)."""
    joined = old.join(new, id_col, "full_outer")
    return joined.select(
        id_col,
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_fp",
        "new_fp",
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """Roll a :func:`snapshot_diff` up to one row per status (the
    dashboard/alerting projection; map-side combined)."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
