"""Corpus-trained n-gram LM familiarity scoring — the learned quality
filter tier (CCNet-style: Wenzek et al. 2020 filter CommonCrawl by the
perplexity of a LM trained on a reference corpus; here the reference is a
reproducible hash split of the corpus itself).

Deliberately integer-only: instead of log-probability perplexity (whose
``ln`` is libm-dependent and so not bit-reproducible across engines), a
document's quality signal is (a) the average corpus-wide occurrence count
of its bigrams — machine-generated or pathological text is built from
bigrams the training split never produced — and (b) its out-of-vocabulary
bigram rate. Both are exact integer arithmetic, so the DuckDB oracle
hash-matches.

Scale shape: the bigram count table is vocabulary-bounded (Heaps' law —
sublinear in corpus size, shuffled once with map-side combine); scoring is
a fingerprint equi-join (8-byte keys, AQE-skew-splittable — hot stopword
bigrams skew the probe side, and an equi-join splits where a count-over-
window would pin each hot fingerprint to one task); per-doc aggregation is
map-side combined. No driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint64
from .dedup import ws_tokens_exact
from .sampling import hash_sample


def _bigram_fps(text_col: str) -> F.Column:
    # guard: sequence(0, -1) is a DESCENDING sequence in Spark, so a
    # sub-bigram document must short-circuit to an empty array
    toks = ws_tokens_exact(text_col)
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: fingerprint64(F.concat_ws(" ", F.slice(toks, i + 1, 2))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def bigram_lm_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_frac: float = 0.5,
    salt: str = "lm",
) -> DataFrame:
    """Bigram occurrence counts over a reproducible hash split.

    The split is ``hash_uniform(id) < train_frac`` — stable across runs,
    engines, and repartitioning, so retraining on the same corpus always
    reproduces the same table. Returns ``(bigram_fp, c)``.
    """
    train = hash_sample(df, id_col, train_frac, salt)
    # no token-count pre-filter: _bigram_fps already yields an empty
    # array for sub-bigram docs, which explode drops
    return (
        train.select(F.explode(_bigram_fps(text_col)).alias("bigram_fp"))
        .groupBy("bigram_fp")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stats: DataFrame,
) -> DataFrame:
    """Score every document (with >= 1 bigram) against trained counts.

    Output per doc: ``n_bigrams``, ``familiar_sum`` (sum of corpus counts
    over the doc's bigram occurrences), ``avg_bigram_count``
    (``familiar_sum div n_bigrams`` — low for unnatural text), and
    ``oov_ppm`` (parts-per-million of bigrams absent from the training
    split). Training docs score against counts that include their own
    contribution — the standard corpus-familiarity convention; pass a
    disjoint split to ``bigram_lm_stats`` for held-out scoring.
    """
    occ = df.select(
        F.col(id_col), F.explode(_bigram_fps(text_col)).alias("bigram_fp")
    )
    joined = occ.join(stats, "bigram_fp", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.coalesce("c", F.lit(0))).cast("long").alias("familiar_sum"),
        F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("_oov"),
    ).select(
        id_col,
        "n_bigrams",
        "familiar_sum",
        F.expr("familiar_sum div n_bigrams").cast("long").alias("avg_bigram_count"),
        F.expr("(_oov * 1000000) div n_bigrams").cast("long").alias("oov_ppm"),
    )
