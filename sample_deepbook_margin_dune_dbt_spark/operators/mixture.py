"""Domain-mixture planning: hit a global token budget at target weights.

The pretraining-mix primitive: given per-domain target weights (e.g.
``{"web": 0.6, "code": 0.3, "wiki": 0.1}``) and a global token budget,
decide how much of each domain's corpus to keep. Two tiers:

- :func:`mixture_plan` — one small aggregation over the corpus producing a
  per-domain plan row (tokens available, target tokens, sampling rate).
  The plan is tiny (one row per domain) and broadcast to the samplers.
- :func:`mixture_sample` — the 100-TB tier: Bernoulli-keep each document
  at its domain's rate using the same md5 variate as
  ``operators.sampling`` (map-only after a broadcast join; hits the
  budget in expectation, error O(1/sqrt(docs per domain))).
- :func:`token_budget_select` — the exact tier: per-domain greedy
  selection in hash order until the cumulative token count reaches the
  domain's target (one shuffle on the domain key; overshoots by at most
  one document per domain). Use when budgets are small or domains few;
  the running-sum window buffers a domain per task, so pre-thin with
  ``mixture_sample`` at ~2× the target rate when a single domain's
  corpus exceeds executor memory.

Everything is a pure function of (document key, salt, weights): the same
mix is reproduced across runs, engines, and repartitioning, and the
DuckDB oracle reproduces it bit-for-bit (``queries/mixtureq.py``).

No reference analog (the reference is a DeFi dbt project); built for the
LLM-data-pipeline surface required by the build brief alongside
``operators/sampling.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_uniform


def _weight_map(weights: dict[str, float]) -> F.Column:
    pairs: list[F.Column] = []
    for k, v in weights.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(float(v)))
    return F.create_map(*pairs)


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Per-domain sampling plan: (domain, tokens, docs, target, rate).

    Weights are normalized to sum to 1; domains absent from ``weights``
    get weight 0 (excluded from the mix). ``target_tokens`` is the
    domain's share of the budget; ``sample_rate`` caps at 1.0 when the
    domain has fewer tokens than its target (under-represented domains
    are kept whole — upsampling/epoch repetition is a trainer concern).

    One grouped aggregation (map-side partial) over the corpus; the
    result has one row per domain and is meant to be broadcast.
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    normalized = {k: v / wsum for k, v in weights.items()}
    totals = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(token_col)).cast("long").alias("domain_tokens"),
        F.count(F.lit(1)).alias("domain_docs"),
    )
    weight = F.coalesce(_weight_map(normalized)[F.col("domain")], F.lit(0.0))
    target = F.floor(F.lit(float(token_budget)) * weight).cast("long")
    return (
        totals.withColumn("target_tokens", target)
        .withColumn(
            "sample_rate",
            F.least(
                F.lit(1.0),
                F.col("target_tokens").cast("double")
                / F.col("domain_tokens").cast("double"),
            ),
        )
    )


def mixture_sample(
    df: DataFrame,
    plan: DataFrame,
    domain_col: str,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Bernoulli-keep each document at its domain's planned rate.

    Broadcast-joins the (tiny) plan and filters on the md5 variate —
    map-only on the corpus side, composes with partition pruning, never
    shuffles the corpus. Expected kept tokens per domain =
    ``rate * domain_tokens`` = ``target_tokens`` (capped domains kept
    whole).
    """
    keyed = df.join(
        F.broadcast(plan.select("domain", "sample_rate")),
        df[domain_col] == F.col("domain"),
        "inner",
    ).drop("domain")
    return keyed.filter(hash_uniform(key_col, salt) < F.col("sample_rate")).drop(
        "sample_rate"
    )


def token_budget_select(
    df: DataFrame,
    plan: DataFrame,
    domain_col: str,
    token_col: str,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Exact tier: greedy per-domain selection in hash order up to target.

    Documents are ranked inside each domain by their md5 variate (a
    deterministic uniform shuffle) and kept while the cumulative token
    count BEFORE the document is under the domain's target — so the mix
    overshoots by less than one document per domain and is reproducible
    across engines. Adds ``cum_tokens`` (running total including the row)
    for budget auditing.

    One hash-partition shuffle on the domain key; the running-sum window
    is streaming (rows unbounded-preceding..current), not buffered.
    """
    u = hash_uniform(key_col, salt)
    w = Window.partitionBy(F.col(domain_col)).orderBy(u.asc(), F.col(key_col).asc())
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(
            F.broadcast(plan.select("domain", "target_tokens")),
            df[domain_col] == F.col("domain"),
            "inner",
        )
        .drop("domain")
        .withColumn("cum_tokens", cum.cast("long"))
        .filter(F.col("cum_tokens") - F.col(token_col) < F.col("target_tokens"))
        .drop("target_tokens")
    )
