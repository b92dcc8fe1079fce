"""Deterministic global ordering: epoch shuffle for training-data runs.

Trainers consume the corpus in a different-but-reproducible order every
epoch. ``ORDER BY md5(epoch || key)`` gives exactly that order, but a
naive global ``row_number()`` window collapses to a single partition —
the canonical Spark scale-killer. :func:`global_hash_rank` computes the
same rank distributed:

1. hash every key to a 60-bit integer ``h`` (the repo's md5-prefix idiom,
   bit-reproducible in DuckDB);
2. assign an ORDER-PRESERVING bucket ``h div ceil(16^15 / n_buckets)`` —
   a pure expression, independent of partitioning;
3. one tiny aggregation counts rows per bucket (≤ ``n_buckets`` rows,
   collected to the driver — the bounded parameterize-the-scan pattern);
4. cumulative bucket offsets broadcast back; rank = offset +
   ``row_number()`` windowed PER BUCKET (parallel, ~N/n_buckets rows
   per window task).

Cost: two passes over the input (count + rank) and one hash-partition
shuffle on the bucket; no stage ever sees more than one bucket's rows.
At 100 TB raise ``n_buckets`` so N/n_buckets rows fit an executor
(md5 is uniform, so buckets are balanced within sampling error).

Ties: distinct keys collide on ``h`` with probability ~2^-60; order
falls back to the key itself, so the rank is total and deterministic
even then.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^15: the md5-prefix hash space (60 bits), shared with operators.sampling
_HASH_SPACE = 16**15


def _hash60(col: F.Column | str, salt: str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(F.lit(salt), c.cast("string"))
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str, salt: str) -> str:
    """DuckDB twin of the 60-bit hash (same value, same order)."""
    keyed = f"concat('{salt}', CAST({expr} AS VARCHAR))"
    return f"CAST(concat('0x', substr(md5({keyed}), 1, 15)) AS BIGINT)"


def global_hash_rank(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    n_buckets: int = 1024,
    rank_col: str = "rank",
) -> DataFrame:
    """Add a 1-based global rank equal to ``row_number() OVER (ORDER BY
    md5(salt||key), key)`` — computed without a single-partition window.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    width = -(-_HASH_SPACE // n_buckets)  # ceil: buckets are order-preserving
    h = _hash60(key_col, salt)
    hashed = df.withColumn("_h60", h).withColumn(
        "_bkt", (F.col("_h60") / F.lit(width)).cast("long")
    )
    raw_counts = [
        (r["_bkt"], r["n"])
        for r in hashed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    if any(b is None for b, _ in raw_counts):
        raise ValueError(
            f"global_hash_rank: key column {key_col!r} contains NULLs — "
            "a hash order over NULL keys is undefined; filter or coalesce first"
        )
    counts = sorted(raw_counts)
    offsets, running = [], 0
    for bkt, n in counts:
        offsets.append((bkt, running))
        running += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_bkt long, _off long")
    w = Window.partitionBy("_bkt").orderBy(F.col("_h60").asc(), F.col(key_col).asc())
    return (
        hashed.join(F.broadcast(off_df), "_bkt")
        .withColumn(rank_col, (F.col("_off") + F.row_number().over(w)).cast("long"))
        .drop("_h60", "_bkt", "_off")
    )


def global_hash_cumsum(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    salt: str = "",
    n_buckets: int = 1024,
    out_col: str = "cumsum",
    order_u_col: str = "_u",
) -> DataFrame:
    """Add the running sum of ``weight_col`` over the deterministic hash
    order ``ORDER BY hash_uniform(salt||key), key`` — computed without a
    single-partition window (the weighted twin of
    :func:`global_hash_rank`; sequence packing is the canonical caller).

    Buckets on ``floor(u * n_buckets)`` — order-preserving in ``u``, so
    (bucket, u, key) is exactly the (u, key) total order and the bucketed
    cumsum is bit-identical to the global-window one. One tiny per-bucket
    SUM (≤ ``n_buckets`` rows to the driver), broadcast cumulative
    offsets back, per-bucket window cumsum in parallel. The ``u`` variate
    is left on the output as ``order_u_col`` for callers that need the
    layout order itself.
    """
    from .sampling import hash_uniform

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w_long = F.col(weight_col).cast("long")
    hashed = df.withColumn(order_u_col, hash_uniform(key_col, salt)).withColumn(
        "_bkt",
        # u < 1 exactly, but u*n can round UP to n at the top of the range —
        # clamp; floor∘clamp stays monotone so the total order is unchanged.
        # The isNotNull gate keeps the bucket NULL-propagating (F.least
        # IGNORES nulls), so NULL keys hit the guard below instead of
        # silently landing in the last bucket
        F.when(
            F.col(order_u_col).isNotNull(),
            F.least(
                F.floor(F.col(order_u_col) * n_buckets), F.lit(n_buckets - 1)
            ),
        ).cast("long"),
    )
    raw_totals = [
        (r["_bkt"], r["t"] or 0)
        for r in hashed.groupBy("_bkt").agg(F.sum(w_long).alias("t")).collect()
    ]
    if any(b is None for b, _ in raw_totals):
        raise ValueError(
            f"global_hash_cumsum: key column {key_col!r} contains NULLs — "
            "a hash order over NULL keys is undefined; filter or coalesce first"
        )
    totals = sorted(raw_totals)
    offsets, running = [], 0
    for bkt, t in totals:
        offsets.append((bkt, running))
        running += t
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_bkt long, _off long")
    w = Window.partitionBy("_bkt").orderBy(
        F.col(order_u_col).asc(), F.col(key_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        hashed.join(F.broadcast(off_df), "_bkt")
        .withColumn(out_col, F.col("_off") + F.sum(w_long).over(w))
        .drop("_bkt", "_off")
    )


def global_value_rank(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int = 256,
    rank_col: str = "rank",
) -> DataFrame:
    """Add a 1-based global rank equal to ``row_number() OVER (ORDER BY
    order_cols)`` — computed without a single-partition window.

    The value-ordered twin of :func:`global_hash_rank` (leaderboards,
    quantile/curriculum assignment, ordered export): range-repartition on
    the order columns (order-preserving ACROSS partitions, equal keys
    co-located), materialize the partition id as data, count rows per
    partition (≤ ``n_partitions`` rows to the driver — the bounded
    parameterize-the-scan pattern), broadcast cumulative offsets back,
    and rank per partition in parallel windows.

    ``order_cols`` must include a unique tiebreaker (e.g. the id column)
    for the rank to be total and deterministic. The one materialization
    (``localCheckpoint``) pins the sampled range bounds so the id column,
    counts, and window all see the same partitioning.
    """
    if n_partitions < 1:
        raise ValueError(f"n_partitions must be >= 1, got {n_partitions}")
    cols = [F.col(c) for c in order_cols]
    parted = (
        df.repartitionByRange(n_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, running = [], 0
    for pid, n in counts:
        offsets.append((pid, running))
        running += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*[c.asc() for c in cols])
    return (
        parted.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.row_number().over(w)).cast("long"))
        .drop("_pid", "_off")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    n_buckets: int = 1024,
    rank_col: str = "epoch_rank",
) -> DataFrame:
    """Reproducible per-epoch training order: a different deterministic
    permutation of the corpus for every epoch number.

    The rank is a pure function of (key, epoch): stable across runs,
    engines, and repartitioning; decorrelated across epochs (the epoch
    salts the hash). Writing out ``ORDER BY epoch_rank`` shards (e.g.
    ``repartitionByRange(rank)`` + sortWithinPartitions) gives the
    trainer sequential reads in shuffle order.
    """
    return global_hash_rank(
        df, key_col, salt=f"epoch{epoch}:", n_buckets=n_buckets, rank_col=rank_col
    )
