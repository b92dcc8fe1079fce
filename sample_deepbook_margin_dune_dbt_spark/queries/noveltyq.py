"""Novelty / hybrid-retrieval / hard-negative / source-gate query family.

Four more capabilities a training-data pipeline needs that the reference's
Jinja-SQL rollup surface (reference ``models/deepbook_margin/*``) has no
counterpart for, each exact-integer so the DuckDB oracle hash-compares:

- ``text_novelty`` — per-document first-occurrence shingle novelty (the
  corpus-cumulative "new information" signal; ``operators/novelty.py``).
- ``retrieval_rrf_fusion`` — reciprocal-rank fusion of the BM25 and
  query-likelihood rankings (the standard hybrid first-stage retriever;
  ``operators/retrieval.py::hybrid_rrf``).
- ``emb_hard_negatives`` — per-anchor top-k most-similar NON-near-dup
  vectors (contrastive-training negative mining;
  ``operators/similarity.py::cosine_hard_negatives``).
- ``curation_source_gate`` — source/domain-level quality gating (the
  RefinedWeb-style "judge the domain, not just the page" pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint64
from ..operators import retrieval as R
from ..operators.novelty import shingle_novelty
from ..operators.similarity import cosine_hard_negatives
from .common import load
from .llmops import _SQL_SHINGLES, _augment_near_dups
from .retrievalq import BM25_TERMS

# ------------------------------------------------------------ text novelty


def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence shingle novelty per document (fixed-point 1e6)."""
    docs = load(spark, sf_dir, "documents")
    return shingle_novelty(docs, "doc_id", "text").withColumnRenamed("id", "doc_id")


SQL_NOVELTY = f"""
WITH {_SQL_SHINGLES.strip()},
tagged AS (
    SELECT doc_id,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY s) THEN 1 ELSE 0 END
               AS is_novel
    FROM sh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(is_novel) AS BIGINT) AS n_novel,
       (CAST(sum(is_novel) AS BIGINT) * 1000000) // count(*) AS novelty_e6
FROM tagged GROUP BY doc_id
"""

# ----------------------------------------------------- hybrid RRF retrieval

_RRF_K_EACH = 50
_RRF_K_OUT = 15


def q_retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of BM25 and query-likelihood rankings over
    the shared ``BM25_TERMS`` query — integer RRF (k=60), global top-15."""
    docs = load(spark, sf_dir, "documents")
    return R.hybrid_rrf(
        docs, "doc_id", "text", list(BM25_TERMS), k_each=_RRF_K_EACH, k_out=_RRF_K_OUT
    )


SQL_RRF = R.rrf_sql(
    "documents", "doc_id", "text", list(BM25_TERMS), k_each=_RRF_K_EACH, k_out=_RRF_K_OUT
)

# ------------------------------------------------------ hard-negative mining

_HN_NQUERIES = 10
_HN_K = 5
_HN_MAX_E6 = 980_000


def q_emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor top-5 hardest negatives: most-similar vectors below the
    near-dup band (``cosine_e6 < 980000``) over the near-dup-augmented
    table — the planted scaled copies (cosine exactly 1) are excluded by
    the band, the perturbed copies below it are recovered as the hardest
    negatives, exercising both sides of the exclusion edge."""
    emb = load(spark, sf_dir, "embeddings")
    aug = _augment_near_dups(emb)
    queries = aug.filter(F.col("vec_id") < _HN_NQUERIES)
    out = cosine_hard_negatives(
        aug, queries, "vec_id", "embedding", "vec_id", k=_HN_K, max_cosine_e6=_HN_MAX_E6
    )
    return out.select(
        "query_id", "neighbor_id", "cosine_e6", F.col("rank").cast("long").alias("rank")
    )


SQL_HARD_NEGATIVES = f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
aug AS (
    SELECT vec_id, v FROM base
    UNION ALL
    SELECT vec_id + 1000000, list_transform(v, x -> x * 1.5) FROM base WHERE vec_id < 25
    UNION ALL
    SELECT vec_id + 2000000, list_transform(v, x -> x + 0.05) FROM base WHERE vec_id < 25
),
q AS (SELECT vec_id AS query_id, v AS vq FROM aug WHERE vec_id < {_HN_NQUERIES}),
scored AS (
    SELECT q.query_id, a.vec_id AS neighbor_id,
           list_cosine_similarity(q.vq, a.v) AS cos
    FROM q, aug a
    WHERE q.query_id <> a.vec_id
),
banded AS (
    SELECT query_id, neighbor_id, cos,
           CAST(floor(cos * 1000000) AS BIGINT) AS cosine_e6
    FROM scored
    WHERE CAST(floor(cos * 1000000) AS BIGINT) < {_HN_MAX_E6}
),
ranked AS (
    SELECT query_id, neighbor_id, cosine_e6,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
               AS rank
    FROM banded
)
SELECT query_id, neighbor_id, cosine_e6, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_HN_K}
"""

# ------------------------------------------------------- source-level gating

#: gate thresholds — integer fixed-point so both engines agree exactly;
#: chosen to split the synthetic sources both ways (some pass, some fail)
_GATE_MIN_AVG_CHARS = 290
_GATE_MAX_SHORT_E6 = 300_000
_GATE_MAX_DUP_E6 = 200_000
_GATE_SHORT_CHARS = 200


def q_curation_source_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/domain-level quality gate: aggregate per-source statistics
    (mean length, short-doc share, exact-dup share, english share) and a
    pass/fail verdict — the "judge the whole domain" curation pass that
    catches low-quality sources whose individual pages each clear the
    per-document filters.

    Scale shape: ONE map-side-combined groupBy on the source key — every
    statistic (including the dup share, via a distinct-fingerprint
    sub-aggregation on (source, fingerprint)) is corpus-linear with
    partial aggregation; the output is |sources| rows, broadcastable back
    as a gate for the follow-on document filter. Skewed sources (one
    domain = half the crawl) cost a fat but streaming-aggregated
    partition; AQE skew-split applies because nothing here needs a
    window or ordering."""
    docs = load(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        fingerprint64(F.col("text")).alias("fp"),
    )
    # distinct contents per source first (map-side combined on the pair),
    # then the per-source rollup — two cheap exchanges on small keys
    distinct_fp = (
        docs.select("source", "fp")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    )
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum((F.col("n_chars") < _GATE_SHORT_CHARS).cast("long"))
        .cast("long")
        .alias("n_short"),
        F.sum((F.col("lang") == "en").cast("long")).cast("long").alias("n_en"),
    )
    rep = (
        stats.join(distinct_fp, "source")
        .withColumn("avg_chars", F.expr("total_chars div n_docs"))
        .withColumn("short_share_e6", F.expr("n_short * 1000000L div n_docs"))
        .withColumn("dup_share_e6", F.expr("(n_docs - n_distinct) * 1000000L div n_docs"))
        .withColumn("en_share_e6", F.expr("n_en * 1000000L div n_docs"))
        .withColumn(
            "passes",
            (
                (F.col("avg_chars") >= _GATE_MIN_AVG_CHARS)
                & (F.col("short_share_e6") <= _GATE_MAX_SHORT_E6)
                & (F.col("dup_share_e6") <= _GATE_MAX_DUP_E6)
            ).cast("long"),
        )
    )
    return rep.select(
        "source",
        "n_docs",
        "avg_chars",
        "short_share_e6",
        "dup_share_e6",
        "en_share_e6",
        "passes",
    )


SQL_SOURCE_GATE = f"""
WITH docs AS (
    SELECT source, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS fp
    FROM documents
),
dfp AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
    FROM (SELECT DISTINCT source, fp FROM docs) GROUP BY source
),
stats AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN n_chars < {_GATE_SHORT_CHARS} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
    FROM docs GROUP BY source
)
SELECT s.source, s.n_docs,
       s.total_chars // s.n_docs AS avg_chars,
       (s.n_short * 1000000) // s.n_docs AS short_share_e6,
       ((s.n_docs - d.n_distinct) * 1000000) // s.n_docs AS dup_share_e6,
       (s.n_en * 1000000) // s.n_docs AS en_share_e6,
       CAST(CASE WHEN s.total_chars // s.n_docs >= {_GATE_MIN_AVG_CHARS}
                  AND (s.n_short * 1000000) // s.n_docs <= {_GATE_MAX_SHORT_E6}
                  AND ((s.n_docs - d.n_distinct) * 1000000) // s.n_docs <= {_GATE_MAX_DUP_E6}
            THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM stats s JOIN dfp d ON s.source = d.source
"""


NOVELTY_QUERIES = {
    "text_novelty": (q_text_novelty, SQL_NOVELTY),
    "retrieval_rrf_fusion": (q_retrieval_rrf_fusion, SQL_RRF),
    "emb_hard_negatives": (q_emb_hard_negatives, SQL_HARD_NEGATIVES),
    "curation_source_gate": (q_curation_source_gate, SQL_SOURCE_GATE),
}
