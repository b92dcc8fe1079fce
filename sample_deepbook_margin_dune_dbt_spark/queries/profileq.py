"""Corpus profiling query: the ANALYZE-style one-pass column statistics
(``operators/profile.py``) over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import histogram_fixed, profile_table
from .common import load


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of documents: one EXPAND-pass scan, ≤ n_cols
    output rows. The stats every downstream decision reads first —
    distinct counts size shuffle keys, null spikes gate quarantine,
    min/max+cardinality triage skew."""
    return profile_table(
        load(spark, sf_dir, "documents"),
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def _col_sql(c: str, dtype: str, is_str: bool) -> str:
    sl = (
        f"CAST(sum(length({c})) * 1000000 // count({c}) AS BIGINT)"
        if is_str
        else "CAST(NULL AS BIGINT)"
    )
    return f"""
SELECT '{c}' AS "column", '{dtype}' AS dtype,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_repr,
       CAST(max({c}) AS VARCHAR) AS max_repr,
       {sl} AS avg_len_e6
FROM documents"""


SQL_CORPUS_PROFILE = "\nUNION ALL\n".join(
    _col_sql(c, dt, s)
    for c, dt, s in [
        ("doc_id", "bigint", False),
        ("text", "string", True),
        ("lang", "string", True),
        ("source", "string", True),
        ("n_chars", "bigint", False),
    ]
)


def q_corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in 20 fixed 0..2000-char buckets
    (+ overflow): the drift-monitoring histogram, one agg pass."""
    return histogram_fixed(
        load(spark, sf_dir, "documents"), "n_chars", lo=0, hi=2000, bins=20
    )


SQL_LENGTH_HISTOGRAM = """
SELECT CAST(CASE WHEN x < 0 THEN 0
            WHEN x >= 2000 THEN 21
            ELSE 1 + floor((x - 0) * 20 / 2000.0) END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL)
GROUP BY 1
"""


PROFILE_QUERIES = {
    "corpus_profile": (q_corpus_profile, SQL_CORPUS_PROFILE),
    "corpus_length_histogram": (q_corpus_length_histogram, SQL_LENGTH_HISTOGRAM),
}
