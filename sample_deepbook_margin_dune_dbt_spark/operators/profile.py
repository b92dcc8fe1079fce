"""Table profiling: per-column statistics in one pass (ANALYZE analog).

The lake-ops step every pipeline runs before trusting a new corpus drop:
row counts, null counts, distinct cardinalities, min/max, and mean string
length per column — the inputs to partition planning (distinct counts size
shuffle keys), quarantine thresholds (null spikes), and skew triage
(min/max vs cardinality).

Shape: ONE scan. All per-column measures compute inside a single global
aggregate — Spark plans a multi-distinct aggregate as one EXPAND pass
(each input row fans out once per distinct-column, map-side, then
partial-aggregates), so the corpus is read once regardless of column
count. The wide single-row result is then unpivoted driver-side into one
row per column via ``stack`` — ≤ n_cols rows, never data-scale. At
100 TB the EXPAND factor (×n_profiled_columns) is the knob: profile the
columns you need, or swap exact ``count_distinct`` for
``approx_count_distinct`` (same plan minus EXPAND) where ±2% suffices —
the exact form is the ORACLE-DETERMINISM variant.

Cross-engine exactness: counts are longs; min/max are emitted as strings
only for long/string columns (double formatting diverges between
engines); mean length uses integer µ-arithmetic (``sum·1e6 div n``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

SUPPORTED_TYPES = (LongType, StringType)


def histogram_fixed(
    df: DataFrame, col: str, lo: float, hi: float, bins: int
) -> DataFrame:
    """Equal-width histogram over a fixed range: one map-side-combined
    aggregation pass, ``bins + 2`` output rows max (bucket 0 =
    underflow < lo, bucket bins+1 = overflow ≥ hi, NULLs excluded).

    The monitoring companion to :func:`profile_table` — drift dashboards
    and data-quality gates consume it. The fixed range is what makes it
    ONE pass (a data-derived range needs a min/max probe first) and what
    makes day-over-day histograms comparable. Bucket arithmetic is pure
    integer-on-scaled-values, so the DuckDB oracle reproduces it bit-for-
    bit: ``bucket = 1 + floor((x - lo) * bins / (hi - lo))`` clamped.
    """
    if bins < 1 or not hi > lo:
        raise ValueError(f"need bins >= 1 and hi > lo, got {bins=}, {lo=}, {hi=}")
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) * bins / F.lit(float(hi) - float(lo)))
    bucket = (
        F.when(x < lo, F.lit(0))
        .when(x >= hi, F.lit(bins + 1))
        .otherwise(F.lit(1) + raw)
        .cast("long")
    )
    return (
        df.filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, n_distinct,
    min_repr, max_repr, avg_len_e6).

    ``avg_len_e6`` is the mean string length ×1e6 (integer), NULL for
    non-string columns. ``min_repr``/``max_repr`` are string renderings
    (exact for long/string; other dtypes are rejected — render them to a
    supported type first so the representation is engine-independent).
    """
    names = cols or df.columns
    for c in names:
        dt = df.schema[c].dataType
        if not isinstance(dt, SUPPORTED_TYPES):
            raise TypeError(
                f"profile_table: column {c!r} has {dt.simpleString()}; "
                "cast to bigint/string first (cross-engine min/max "
                "rendering is only exact for those)"
            )

    aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in names:
        col = F.col(c)
        is_str = isinstance(df.schema[c].dataType, StringType)
        aggs += [
            F.count(col).cast("long").alias(f"_nn_{c}"),
            F.count_distinct(col).cast("long").alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
            (
                F.sum(F.length(col)).cast("long")
                if is_str
                else F.lit(None).cast("long")
            ).alias(f"_sl_{c}"),
        ]
    wide = df.agg(*aggs)

    # unpivot the single wide row into one row per column; stack is a
    # narrow projection over ≤ 1 row
    branches = ", ".join(
        f"'{c}', '{df.schema[c].dataType.simpleString()}', "
        f"_nn_{c}, _nd_{c}, _min_{c}, _max_{c}, _sl_{c}"
        for c in names
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {branches}) AS "
            "(column, dtype, _nn, n_distinct, min_repr, max_repr, _sl)"
        ),
        "_n_rows",
    ).select(
        "column",
        "dtype",
        F.col("_n_rows").alias("n_rows"),
        (F.col("_n_rows") - F.col("_nn")).cast("long").alias("n_nulls"),
        "n_distinct",
        "min_repr",
        "max_repr",
        F.expr("_sl * 1000000L div _nn").alias("avg_len_e6"),
    )
