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


_DSIR_K = 100
_DSIR_B = 4096


def q_corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (``operators/dsir.py``): hashed-bigram
    importance weights of the English subset against the whole pool,
    every document scored by the average fixed-point probability ratio
    of its features, global top-100 by (score desc, doc_id). The
    content-distribution complement to the metadata-keyed mixture rows
    above: mixture weighs documents by their DOMAIN label, DSIR by what
    their n-grams look like — a French doc written in borrowed English
    phrasing outranks a French doc that isn't."""
    from ..operators.dsir import dsir_select

    docs = load(spark, sf_dir, "documents")
    return dsir_select(
        docs,
        "doc_id",
        "text",
        F.col("lang") == "en",
        top_k=_DSIR_K,
        n_buckets=_DSIR_B,
    )


SQL_DSIR_SELECT = f"""
WITH toks AS (
    SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
           string_split(lower(trim(text)), ' ') AS w
    FROM documents
),
feat AS (
    SELECT doc_id, t,
           CAST(concat('0x', substr(md5(array_to_string(w[i:i+1], ' ')), 1, 15))
               AS BIGINT) % {_DSIR_B} AS b
    FROM toks, LATERAL (
        SELECT unnest(generate_series(1, len(w) - 1)) AS i
    ) g
    WHERE len(w) >= 2
),
cnt AS (
    SELECT b, CAST(count(*) AS BIGINT) AS cr, CAST(sum(t) AS BIGINT) AS ct
    FROM feat GROUP BY b
),
tot AS (
    SELECT CAST(sum(cr) AS BIGINT) AS r_total, CAST(sum(ct) AS BIGINT) AS t_total
    FROM cnt
),
wt AS (
    SELECT b, ((ct + 1) * 1000000 // (cr + 1))
              * ((r_total + {_DSIR_B}) * 1000 // (t_total + {_DSIR_B})) // 1000
              AS w_e6
    FROM cnt, tot
),
scored AS (
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(wt.w_e6) AS BIGINT) AS w_sum
    FROM feat f JOIN wt USING (b) GROUP BY f.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_feats,
       CAST(w_sum // n_feats AS BIGINT) AS score_e6,
       CAST(row_number() OVER (ORDER BY w_sum // n_feats DESC, doc_id)
           AS BIGINT) AS rank
FROM scored
ORDER BY score_e6 DESC, doc_id
LIMIT {_DSIR_K}
"""


MIXTURE_QUERIES = {
    "corpus_mixture_plan": (q_mixture_plan, SQL_MIXTURE_PLAN),
    "corpus_mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "corpus_mixture_select": (q_mixture_select, SQL_MIXTURE_SELECT),
    "corpus_dsir_select": (q_corpus_dsir_select, SQL_DSIR_SELECT),
}
