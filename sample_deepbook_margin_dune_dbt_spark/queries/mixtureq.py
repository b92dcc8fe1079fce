"""Driver queries for domain-mixture planning (``operators/mixture.py``).

The mix is a pure function of (doc_id, salt, weights), so DuckDB oracles
reproduce it exactly. Weights are chosen binary-exact (0.5/0.25/0.125)
so Python-side normalization equals the SQL literals bit-for-bit;
``n_chars`` (exact bigint) stands in for the token count so budgets and
running sums are integer-exact on both engines. Rates are doubles but
both engines compute the same ``target/tokens`` quotient; the emitted
``rate_e6`` uses the floor contract (see ``queries/curation.py`` on why
``round`` diverges).

'es' is deliberately absent from the weights: weight-0 domains must be
excluded from the mix, and the oracle checks that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import mixture as MX
from ..operators.sampling import sql_hash_uniform
from .common import load

_WEIGHTS = {"en": 0.5, "de": 0.25, "zh": 0.125, "fr": 0.125}
_BUDGET = 30_000

_SQL_PLAN_CTE = f"""
totals AS (
    SELECT lang AS domain,
           CAST(sum(n_chars) AS BIGINT) AS domain_tokens,
           CAST(count(*) AS BIGINT) AS domain_docs
    FROM documents
    GROUP BY 1
),
plan AS (
    SELECT domain, domain_tokens, domain_docs,
           CAST(floor({float(_BUDGET)} * (CASE domain
                WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                WHEN 'zh' THEN 0.125 WHEN 'fr' THEN 0.125
                ELSE 0.0 END)) AS BIGINT) AS target_tokens
    FROM totals
),
rated AS (
    SELECT *,
           least(1.0, CAST(target_tokens AS DOUBLE) / CAST(domain_tokens AS DOUBLE))
               AS sample_rate
    FROM plan
)
"""


def _plan(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = load(spark, sf_dir, "documents")
    return docs, MX.mixture_plan(docs, "lang", "n_chars", _WEIGHTS, _BUDGET)


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain mixture plan over documents (lang domains, char budget)."""
    _, plan = _plan(spark, sf_dir)
    return plan.select(
        "domain",
        "domain_tokens",
        "domain_docs",
        "target_tokens",
        F.floor(F.col("sample_rate") * 1e6).cast("long").alias("rate_e6"),
    )


SQL_MIXTURE_PLAN = f"""
WITH {_SQL_PLAN_CTE}
SELECT domain, domain_tokens, domain_docs, target_tokens,
       CAST(floor(sample_rate * 1000000) AS BIGINT) AS rate_e6
FROM rated
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli scale tier: per-domain kept docs/tokens at planned rates."""
    docs, plan = _plan(spark, sf_dir)
    kept = MX.mixture_sample(docs, plan, "lang", "doc_id", salt="mix")
    return kept.groupBy(F.col("lang").alias("domain")).agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_chars").cast("long").alias("kept_tokens"),
    )


SQL_MIXTURE_SAMPLE = f"""
WITH {_SQL_PLAN_CTE}
SELECT lang AS domain,
       CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(n_chars) AS BIGINT) AS kept_tokens
FROM documents JOIN rated ON lang = domain
WHERE {sql_hash_uniform('doc_id', salt='mix')} < sample_rate
GROUP BY 1
"""


def q_mixture_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact greedy tier: docs kept in hash order until each domain's
    char budget is met (cum_tokens audits the running budget)."""
    docs, plan = _plan(spark, sf_dir)
    sel = MX.token_budget_select(docs, plan, "lang", "n_chars", "doc_id", salt="mix")
    return sel.select("doc_id", "lang", F.col("n_chars").cast("long"), "cum_tokens")


SQL_MIXTURE_SELECT = f"""
WITH {_SQL_PLAN_CTE},
sel AS (
    SELECT doc_id, lang, n_chars, target_tokens,
           CAST(sum(n_chars) OVER (
               PARTITION BY lang
               ORDER BY {sql_hash_uniform('doc_id', salt='mix')} ASC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens
    FROM documents JOIN rated ON lang = domain
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, cum_tokens
FROM sel
WHERE cum_tokens - n_chars < target_tokens
"""


MIXTURE_QUERIES = {
    "corpus_mixture_plan": (q_mixture_plan, SQL_MIXTURE_PLAN),
    "corpus_mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "corpus_mixture_select": (q_mixture_select, SQL_MIXTURE_SELECT),
}
