"""Z-order (Morton-curve) data layout for multi-dimensional file pruning.

The lake-ops layout step the reference delegates to its warehouse's
``OPTIMIZE`` post-hook (``/root/reference/macros/dune_dbt_overrides/
optimize_table.sql:1-6`` compacts files; Delta's production variant adds
``ZORDER BY``): rewrite a table so that file-level min/max statistics are
simultaneously tight on TWO columns, letting a predicate on EITHER column
prune most files. A single-column sort gives perfect pruning on that
column and none on the other; interleaving the bits of both columns into
one Morton key gives near-√-optimal pruning on each.

All of it is Catalyst expression algebra — the bit interleave is a sum of
shift/mask terms (whole-stage-codegen'd, zero Python), and the layout is
``repartitionByRange`` on the key (one range-exchange, Spark's standard
distributed sort machinery — no single-partition stage) followed by a
partition-local sort. At 100 TB this is exactly how a ``ZORDER BY``
table rewrite executes; the only non-scalable alternative (a global
``orderBy`` collect) never appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "sql_zvalue", "zorder_layout", "zorder_bucket_stats"]


def zvalue(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Morton key: interleave the low ``bits`` bits of two non-negative
    integer columns (x takes even positions, y odd). Pure integer
    shift/mask algebra — bit-identical across engines (see
    :func:`sql_zvalue`). Callers must pre-scale inputs into
    ``[0, 2**bits)``; out-of-range values are masked (wrap) rather than
    clamped, so scale first.
    """
    x, y = F.col(x) if isinstance(x, str) else x, F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(x.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftrightunsigned(y.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def sql_zvalue(x: str, y: str, bits: int = 10) -> str:
    """ANSI-SQL twin of :func:`zvalue` (DuckDB-ready), same term order."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    n_files: int = 16,
    key_col: str = "zval",
) -> DataFrame:
    """Lay ``df`` out in Morton order: range-partition into ``n_files``
    key ranges and sort each partition by the key, so a subsequent
    parquet write produces one file per contiguous z-range — tight
    min/max footer stats on BOTH source columns. The caller writes with
    ``.write.parquet(...)`` (one file per partition when the writer is
    not splitting on size).
    """
    keyed = df.withColumn(key_col, zvalue(x_col, y_col, bits))
    return keyed.repartitionByRange(n_files, key_col).sortWithinPartitions(key_col)


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    bucket_bits: int = 4,
) -> DataFrame:
    """Per-z-bucket min/max envelope of both dimensions — the file-stats
    table a z-ordered write would produce, computed without writing:
    bucket = the top ``bucket_bits`` bits of the z key (fixed-width, so
    the whole thing is one map + one grouped agg; no range exchange and
    no data-dependent boundaries — deterministic for the oracle).

    Reading the result: a predicate ``x BETWEEN a AND b`` needs to scan
    only the buckets whose ``[min_x, max_x]`` intersects it; same for y.
    """
    z = zvalue(x_col, y_col, bits)
    bucket = F.shiftrightunsigned(z, 2 * bits - bucket_bits).cast("long")
    return (
        df.withColumn("z_bucket", bucket)
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(x_col).cast("long").alias("min_x"),
            F.max(x_col).cast("long").alias("max_x"),
            F.min(y_col).cast("long").alias("min_y"),
            F.max(y_col).cast("long").alias("max_y"),
        )
    )
