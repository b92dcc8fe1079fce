"""Temporal join operators Spark lacks natively: as-of join, binned range join.

Both are built from shuffle-on-key primitives (union + window; bin +
equi-join) rather than inequality joins, because Catalyst plans a raw
inequality join as broadcast-nested-loop / cartesian — the shapes that die
at 100 TB.

``asof_join`` — point-in-time lookup (each left row gets the latest right
row at or before its time, per key): the classic quote-to-trade /
price-to-event join. Implementation: union both sides tagged, one window
pass per key ordered by (time, tag) carrying the last right value forward.
One shuffle on the key, no join at all.

``range_join_binned`` — join left points to right intervals containing
them: bin both sides by a fixed granularity, equi-join on (key?, bin),
refine with the exact predicate. Turns the inequality join into an
equi-join whose fan-out is bounded by interval_length/bin + 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_time_left: str,
    on_time_right: str,
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """As-of (backward) join: latest ``right`` row with time ≤ left time.

    ``by``: equi-keys (e.g. symbol). ``value_cols``: right columns to carry
    (default: all non-key, non-time). ``tolerance``: max allowed staleness
    in time units (left rows with no right row within tolerance get NULLs,
    matching DuckDB/pandas ``merge_asof`` tolerance semantics).

    Plan shape: union(tagged left, tagged right) → window ``last(struct,
    ignorenulls)`` over (by) ordered by (time, tag) → filter left rows. One
    hash-shuffle on ``by``; a single sort; zero joins. Right-side ties at
    the same timestamp resolve to the LAST right row (max over later sort
    order), matching ASOF semantics of 'the latest known value'.

    The right-side values travel as ONE struct (non-null only on right
    rows), so the matched row is atomic — all value columns come from the
    SAME right row, and a right row whose value column is legitimately
    NULL stays NULL instead of inheriting an older non-null value
    (pandas/DuckDB ``merge_asof`` row-level semantics).
    """
    by = by or []
    if value_cols is None:
        excluded = set(by) | {on_time_right}
        value_cols = [c for c in right.columns if c not in excluded]

    lt = left.withColumn("_t", F.col(on_time_left)).withColumn("_tag", F.lit(1))
    rt = right.select(
        *by, F.col(on_time_right).alias("_t"), F.lit(0).alias("_tag"),
        *[F.col(c) for c in value_cols],
    )
    # align schemas: left gets null value slots, right gets null left slots
    left_cols = [c for c in left.columns]
    lt = lt.select(
        *left_cols, "_t", "_tag", *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols]
    )
    rt_full = rt.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by],
        *by, "_t", "_tag", *value_cols,
    ).select(*left_cols, "_t", "_tag", *value_cols)

    unioned = lt.unionByName(rt_full)
    w = Window.partitionBy(*by).orderBy(F.asc("_t"), F.asc("_tag")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # one struct per right row (NULL on left rows): carrying it with a
    # single last(ignorenulls) keeps the match atomic — every value column
    # plus the matched right time come from the same right row.
    right_row = F.when(
        F.col("_tag") == 0,
        F.struct(F.col("_t").alias("_rt"), *[F.col(c) for c in value_cols]),
    )
    filled = unioned.select(
        *left_cols,
        "_t",
        "_tag",
        F.last(right_row, ignorenulls=True).over(w).alias("_r"),
    )
    out = filled.filter(F.col("_tag") == 1)
    if tolerance is not None:
        miss = F.col("_r").isNull() | ((F.col("_t") - F.col("_r._rt")) > tolerance)
        out = out.select(
            *left_cols,
            *[F.when(miss, F.lit(None)).otherwise(F.col(f"_r.{c}")).alias(c) for c in value_cols],
        )
    else:
        out = out.select(*left_cols, *[F.col(f"_r.{c}").alias(c) for c in value_cols])
    return out


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_size: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Join points to the intervals containing them ([start, end] inclusive).

    Both sides map to bin ids (intervals explode to every bin they overlap);
    the join is an equi-join on (by..., bin) refined by the exact range
    predicate, then de-duplicated. ``bin_size`` trades fan-out (small bins →
    more interval replicas) against refine selectivity (big bins → more
    false candidates) — pick ≈ median interval length.
    """
    by = by or []
    p = points.withColumn("_bin", (F.col(point_col) / bin_size).cast("long"))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start_col) / bin_size).cast("long"),
                (F.col(end_col) / bin_size).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on=by + ["_bin"], how="inner").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_bin").dropDuplicates(
        [c for c in points.columns if c != "_bin"] + [start_col, end_col]
    )
