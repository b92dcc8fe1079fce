"""Privacy governance: k-anonymity / l-diversity census and suppression.

Training corpora assembled from user-generated data carry re-identification
risk alongside the literal-PII channel that ``functions/pii.py`` scrubs:
a row whose quasi-identifier combination (event type × value band × day,
zip × age × gender, …) is shared by only a handful of users is linkable
even after direct identifiers are removed. The standard releasability
gates are

- **k-anonymity** — every released quasi-identifier (QI) group contains
  at least ``k`` records, and
- **l-diversity** — every group spans at least ``l`` distinct values of
  the sensitive attribute (a group of 50 rows all belonging to one user
  is k-anonymous yet still identifies that user's behaviour).

The reference's Jinja-SQL surface (reference ``models/deepbook_margin/*``)
has no privacy counterpart — public on-chain data needs none — but a
general training-data engine does, so this family follows the repo's
beyond-reference extension pattern (``operators/novelty.py``,
``operators/dsir.py``).

Scale shape (100 TB): the census is ONE map-side-combined groupBy on the
QI key — ``count`` and ``count_distinct(sensitive)`` both partial-aggregate
(distinct via Spark's two-phase EXPAND, keyed by (QI, sensitive), still
shuffle-bounded by the distinct pair count, not the corpus). Suppression
re-joins the census verdict on the same QI key: the census side is
|QI-combinations| rows — orders of magnitude smaller than the corpus —
so AQE picks a broadcast join at any realistic grain, and the corpus side
never shuffles. Generalization (banding) is a narrow map. Nothing here
windows, sorts, or collects.

Cross-engine determinism: group sizes and distinct counts are exact
integers; band edges use integer ``div`` so Spark and the DuckDB oracle
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def generalize_band(col: Column | str, width: float | int) -> Column:
    """Generalize a numeric column to the lower edge of its ``width`` band.

    ``floor(x / width) * width`` as exact integer arithmetic when ``width``
    is integral — the QI-coarsening move that trades resolution for larger
    (hence releasable) groups. Narrow map; pushes through the scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(width, int):
        return (F.floor(c / F.lit(width)).cast("long") * F.lit(width)).cast("long")
    return F.floor(c / F.lit(float(width))) * F.lit(float(width))


def k_anonymity_census(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """Per-QI-group census with k-anonymity and l-diversity verdicts.

    Returns one row per distinct QI combination with ``n_rows`` (group
    size), ``n_sensitive`` (distinct sensitive values), and integer flags
    ``k_ok`` (``n_rows >= k``) / ``l_ok`` (``n_sensitive >= l_div``).
    The census IS the privacy audit artifact; :func:`suppress_below_k`
    applies it back to the data.

    One shuffle on the QI key, map-side combined; output is
    |QI-combinations| rows.
    """
    if k < 1 or l_div < 1:
        raise ValueError(f"k and l_div must be >= 1, got k={k}, l_div={l_div}")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(F.col(sensitive_col)).cast("long").alias("n_sensitive"),
        (F.count(F.lit(1)) >= k).cast("long").alias("k_ok"),
        (F.count_distinct(F.col(sensitive_col)) >= l_div).cast("long").alias("l_ok"),
    )


def suppress_below_k(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 1,
    broadcast_census: bool = False,
) -> DataFrame:
    """Drop every row whose QI group fails the k-anonymity / l-diversity
    gate (cell suppression — the conservative release transform).

    The verdict join is a plain equi-join on the QI key by default: at a
    coarse grain AQE broadcasts the |QI|-row census side at runtime, and
    at a FINE grain (|QI| approaching the corpus — exactly when privacy
    risk is highest) a forced broadcast would OOM the driver, so the hint
    is opt-in via ``broadcast_census`` for callers that know their grain.
    Suppression is monotone in ``k``: raising ``k`` only removes rows.
    """
    census = k_anonymity_census(df, qi_cols, sensitive_col, k=k, l_div=l_div)
    keep = census.filter((F.col("k_ok") == 1) & (F.col("l_ok") == 1)).select(*qi_cols)
    if broadcast_census:
        keep = F.broadcast(keep)
    return df.join(keep, on=qi_cols, how="inner")


def suppression_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    report_col: str,
    k: int = 5,
    l_div: int = 1,
) -> DataFrame:
    """Per-``report_col`` retention audit of the suppression transform:
    total rows, retained rows, and the retained share (fixed-point 1e6).

    Computed entirely from the census (no second corpus pass): group
    sizes already carry the per-group row counts, so the report is a
    rollup of |QI| census rows — the audit costs O(|QI|) after the one
    census shuffle.
    """
    census = k_anonymity_census(df, qi_cols, sensitive_col, k=k, l_div=l_div)
    if report_col not in [c for c in census.columns]:
        raise ValueError(f"report_col {report_col!r} must be one of qi_cols {qi_cols}")
    return (
        census.groupBy(report_col)
        .agg(
            F.sum("n_rows").cast("long").alias("n_total"),
            F.sum(F.when((F.col("k_ok") == 1) & (F.col("l_ok") == 1), F.col("n_rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_retained"),
        )
        .withColumn("retained_share_e6", F.expr("n_retained * 1000000L div n_total"))
    )
