"""Deterministic hash-based sampling for training-data pipelines.

RNG-based sampling (``df.sample``) is irreproducible across engines, runs,
and partition layouts — useless for corpus curation, where the same
document must land in the same split on every rebuild and the oracle must
reproduce the sample exactly. These operators derive a uniform [0, 1)
variate from a cryptographic hash of a stable key instead:

    u(key) = first-15-hex(md5(key)) / 16^15

Content- or id-keyed, so membership is a pure function of the row —
stable under corpus growth, repartitioning, and engine choice (DuckDB
twin: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) / 16^15``). The
``salt`` argument decorrelates independent samples drawn from the same
corpus.

All three operators are pure Catalyst expressions (md5 + arithmetic + a
window for the quota variant): no shuffles beyond what the semantics
require — Bernoulli sampling and splitting are map-only (filters push to
the scan); quota sampling shuffles once on the strata key.

Scale note (100 TB): map-only sampling composes with partition pruning
and never materializes the corpus; quota sampling's window is per-stratum
and spills only if a single stratum exceeds executor memory — cap strata
cardinality upstream, or pre-filter with ``hash_sample`` when quotas are
small relative to stratum sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^15 — the hash occupies 60 bits, so u = h / 16^15 ∈ [0, 1)
_HASH_SPACE = float(16**15)


def hash_uniform(col: F.Column | str, salt: str = "") -> F.Column:
    """Deterministic uniform [0, 1) variate from a stable key.

    ``conv(substr(md5(salt || key), 1, 15), 16, 10) / 16^15`` — the md5
    idiom shared with ``functions.text.fingerprint64`` so DuckDB oracles
    reproduce the variate bit-for-bit (both engines divide the same
    integer by the same power of two; the quotient is exact in double
    precision well past 53 bits of the 60-bit hash).
    """
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(F.lit(salt), c.cast("string"))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("double") / F.lit(_HASH_SPACE)
    )


def sql_hash_uniform(expr: str, salt: str = "") -> str:
    """DuckDB twin of ``hash_uniform``."""
    keyed = f"concat('{salt}', CAST({expr} AS VARCHAR))"
    return f"(CAST(concat('0x', substr(md5({keyed}), 1, 15)) AS BIGINT) / {16**15}.0)"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Reproducible Bernoulli sample: keep rows with u(key) < fraction.

    Unlike ``df.sample`` this is stable across runs, engines, and
    repartitioning, and composable: two samples with different salts are
    independent; the same salt at a larger fraction is a superset (nested
    samples — grow a 1% pilot corpus to 10% without resampling the 1%).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_uniform(key_col, salt) < F.lit(fraction))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a disjoint 'train' / 'val' / 'test' label by key hash.

    Membership is a pure function of the key: documents keep their split
    across corpus rebuilds and growth (no leakage of test docs into
    training after a re-shuffle), and duplicate keys land in the same
    split — hash-split BEFORE exact dedup is still leak-free.
    """
    if val_fraction < 0 or test_fraction < 0 or val_fraction + test_fraction > 1:
        raise ValueError("fractions must be non-negative and sum to ≤ 1")
    u = hash_uniform(key_col, salt)
    return df.withColumn(
        split_col,
        F.when(u < test_fraction, F.lit("test"))
        .when(u < test_fraction + val_fraction, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def stratified_quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen by hash order.

    The training-mix balancer: cap each (lang, source, …) cell at a quota
    so one domain can't dominate the mix. Hash order makes the selection
    deterministic AND uniform within the stratum (the md5 variate is the
    sort key), unlike ``LIMIT`` after an arbitrary scan order. One shuffle
    on the strata key; ties broken by the key column.

    Determinism contract (ADVICE r2): ``key_col`` should uniquely identify
    rows. Rows sharing a ``key_col`` value within a stratum share both
    sort keys, so WHICH duplicate survives is tie-broken here by a hash
    over the full row — deterministic within Spark, but an oracle engine
    with the same underspecified tie may legitimately keep a different
    duplicate; cross-engine parity is only guaranteed under unique keys.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_uniform(key_col, salt).asc(),
        F.col(key_col).asc(),
        F.xxhash64(*[F.col(c) for c in df.columns]).asc(),
    )
    return (
        df.withColumn("_qrn", F.row_number().over(w))
        .filter(F.col("_qrn") <= n_per_stratum)
        .drop("_qrn")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    strata_cols: list[str] | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (top-n, optionally per
    stratum): Efraimidis–Spirakis keys ``k = u(key)^(1/w)``.

    The training-mix primitive "prefer higher-quality/longer documents but
    keep randomness": inclusion probability is proportional to weight, yet
    the draw is a pure function of (key, salt, weight) — reproducible
    across engines, runs, and repartitioning like every sampler here.
    Rows with non-positive weight are excluded (their inclusion
    probability is 0). Ties (astronomically unlikely for distinct keys)
    break on the key column.

    Determinism caveat: ``pow`` is evaluated in each engine's libm; the
    ORDER of keys is what matters, and key gaps for md5-derived uniforms
    dwarf any 1-ulp libm divergence, so cross-engine selection agrees in
    practice (oracle-checked on the fixtures).

    Scale: one window shuffle on the strata key (or a single global
    top-n); pre-filter with ``hash_sample`` first when n ≪ stratum size
    to keep the sorted buffer small.
    """
    strata = strata_cols or []
    k = F.pow(hash_uniform(key_col, salt), 1.0 / F.col(weight_col).cast("double"))
    w = Window.partitionBy(*[F.col(c) for c in strata] or [F.lit(1)]).orderBy(
        F.desc("_wk"), F.col(key_col).asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_wk", k)
        .withColumn("_wrn", F.row_number().over(w))
        .filter(F.col("_wrn") <= n)
        .drop("_wk", "_wrn")
    )


def temporal_split(
    df: DataFrame,
    ts_us_col: F.Column | str,
    train_frac_e6: int = 800_000,
) -> DataFrame:
    """Time-based train/holdout split: events before the cutoff train,
    events at/after it are held out — the forecasting-safe split for
    sequence/recommendation models, where a hash split (random in time)
    leaks the future into training.

    The cutoff is a pure integer function of the data's own time range:
    ``min_us + (max_us − min_us) · train_frac_e6 div 1e6`` — exact on
    both engines, stable under replay, no wall clock. Adds ``split``
    ('train' | 'holdout') to every row.

    The product form ``range · frac`` overflows int64 once the range
    exceeds ~1.15e13 µs (~133 days at frac 800000), so the math is
    decomposed as ``(range div 1e6)·frac + ((range % 1e6)·frac) div 1e6``
    — algebraically identical (frac ≤ 1e6 keeps the first term ≤ range
    and the second ≤ 1e12), overflow-safe for any epoch-µs range.

    Scale shape: one ungrouped min/max aggregation (map-side combined to
    a single row — the watermark-scalar pattern), broadcast back via a
    single-row crossJoin; the assignment itself is a narrow map. At
    100 TB the scalar pass and the labeled pass both stream; persist the
    scalar if the caller runs many splits.
    """
    if not 0 <= train_frac_e6 <= 1_000_000:
        raise ValueError(
            f"train_frac_e6 must be in [0, 1000000], got {train_frac_e6}"
        )
    ts = F.col(ts_us_col) if isinstance(ts_us_col, str) else ts_us_col
    scalars = df.agg(
        F.min(ts).cast("long").alias("_min_us"),
        F.max(ts).cast("long").alias("_max_us"),
    )
    return (
        df.crossJoin(F.broadcast(scalars))
        .withColumn(
            "_cut_us",
            F.expr(
                f"_min_us"
                f" + ((_max_us - _min_us) div 1000000L) * {train_frac_e6}L"
                f" + (((_max_us - _min_us) % 1000000L) * {train_frac_e6}L)"
                f" div 1000000L"
            ),
        )
        .withColumn(
            "split",
            F.when(ts < F.col("_cut_us"), F.lit("train")).otherwise(
                F.lit("holdout")
            ),
        )
        .drop("_min_us", "_max_us", "_cut_us")
    )
