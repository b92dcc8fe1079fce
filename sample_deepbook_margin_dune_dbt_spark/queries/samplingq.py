"""Driver queries for the deterministic sampling operators.

Every query is exactly reproducible in DuckDB because the sampling
variate is the md5-derived uniform (``operators/sampling.py``), not an
RNG — the oracles run the same hash arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling as SM
from .common import load


def q_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25% reproducible Bernoulli sample of documents, keyed on doc_id."""
    docs = load(spark, sf_dir, "documents")
    return SM.hash_sample(docs, "doc_id", 0.25, salt="bench").select(
        "doc_id", "lang", "source"
    )


_SQL_BERNOULLI = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {SM.sql_hash_uniform('doc_id', salt='bench')} < 0.25
"""


def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split census: rows per (split, lang) under a 10/10 val/test split."""
    docs = load(spark, sf_dir, "documents")
    split = SM.train_val_test_split(docs, "doc_id", val_fraction=0.1, test_fraction=0.1)
    return split.groupBy("split", "lang").agg(F.count("*").alias("n"))


_U_SPLIT = SM.sql_hash_uniform("doc_id", salt="split")
_SQL_TVT = f"""
SELECT CASE WHEN {_U_SPLIT} < 0.1 THEN 'test'
            WHEN {_U_SPLIT} < 0.2 THEN 'val'
            ELSE 'train' END AS split,
       lang,
       count(*) AS n
FROM documents
GROUP BY 1, 2
"""


def q_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix balancing: at most 5 docs per (lang, source) cell,
    selected deterministically by hash order."""
    docs = load(spark, sf_dir, "documents")
    return SM.stratified_quota_sample(
        docs, ["lang", "source"], n_per_stratum=5, key_col="doc_id", salt="quota"
    ).select("lang", "source", "doc_id")


_U_QUOTA = SM.sql_hash_uniform("doc_id", salt="quota")
_SQL_QUOTA = f"""
SELECT lang, source, doc_id
FROM (
    SELECT lang, source, doc_id,
           row_number() OVER (
               PARTITION BY lang, source
               ORDER BY {_U_QUOTA} ASC, doc_id ASC
           ) AS qrn
    FROM documents
)
WHERE qrn <= 5
"""

def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted training mix: 10 docs per source, inclusion odds
    proportional to document length (Efraimidis–Spirakis keys) — longer
    docs preferred but the draw stays reproducible and without
    replacement."""
    docs = load(spark, sf_dir, "documents")
    return SM.weighted_sample(
        docs, key_col="doc_id", weight_col="n_chars", n=10, strata_cols=["source"]
    ).select("source", "doc_id", "n_chars")


_U_W = SM.sql_hash_uniform("doc_id", salt="wsample")
_SQL_WEIGHTED = f"""
SELECT source, doc_id, n_chars
FROM (
    SELECT source, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY source
               ORDER BY pow({_U_W}, 1.0 / CAST(n_chars AS DOUBLE)) DESC, doc_id ASC
           ) AS wrn
    FROM documents WHERE n_chars > 0
)
WHERE wrn <= 10
"""

SAMPLING_QUERIES = {
    "sample_hash_bernoulli": (q_hash_bernoulli, _SQL_BERNOULLI),
    "sample_train_val_test": (q_train_val_test, _SQL_TVT),
    "sample_stratified_quota": (q_stratified_quota, _SQL_QUOTA),
    "sample_weighted": (q_weighted_sample, _SQL_WEIGHTED),
}
