"""Training-shard export: deterministic sharding, manifests, and the sink.

The last stage of a training-data pipeline is the one the reference's
Dune-hosted surface never needs (Dune owns the storage layer; reference
``models/deepbook_margin/*`` materialize into Dune's Delta tables): writing
the curated corpus out as a fixed set of balanced shards that a data
loader can stream, plus a manifest that makes the export verifiable and
reproducible. Three pieces:

- :func:`assign_shards` — content/id-keyed deterministic shard assignment
  (md5-uniform, the ``operators/sampling.py`` idiom), so a document lands
  in the same shard on every rebuild, on any engine, under any partition
  layout. Narrow map; composes with every upstream filter.
- :func:`shard_manifest` — per-shard row/token/byte counts plus an
  order-independent 60-bit XOR content checksum (``bit_xor`` of the
  md5-derived content fingerprint — both engines aggregate the identical
  integers, and XOR is commutative so the checksum is independent of scan
  order and partitioning). The manifest is the export's contract: a loader
  can verify a shard without re-reading the corpus, and two exports are
  byte-equivalent iff their manifests match.
- :func:`write_training_shards` — the actual sink:
  ``partitionBy(shard_col)`` parquet write (one directory per shard, the
  layout loaders expect) with the manifest written alongside.

Scale shape (100 TB): assignment is a narrow map (no shuffle — the hash
is computed where the row already lives); the manifest is ONE map-side-
combined groupBy on the shard key (n_shards groups, each partial-aggregated
before the exchange); the write repartitions by shard so each shard's
files are produced by the executors that own its rows — one shuffle,
which IS the export (a global re-layout is the operation's semantics, not
overhead). Shard balance is hash-uniform: for D documents into S shards
the relative imbalance concentrates around sqrt(S/D), negligible at any
training scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint64, token_count
from .sampling import hash_uniform


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shard",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Deterministic shard assignment: ``floor(u(key) * n_shards)``.

    ``u`` is the md5-derived uniform shared with the samplers, so shard
    membership is a pure function of (key, salt, n_shards) — stable across
    runs, engines, corpus growth, and repartitioning, and independent of
    samples drawn with other salts. DuckDB twin:
    ``CAST(floor(u_expr * n) AS BIGINT)``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    u = hash_uniform(key_col, salt)
    return df.withColumn(
        shard_col, F.floor(u * F.lit(float(n_shards))).cast("long")
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str = "shard_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest: rows, whitespace tokens, bytes, XOR checksum.

    ``content_xor`` is ``bit_xor`` over the 60-bit md5 content fingerprint:
    order-independent (XOR commutes), partition-independent, and exact in
    both engines — flipping one character in one document flips the shard's
    checksum with probability 1 - 2^-60. One map-side-combined groupBy on
    the shard key; output is n_shards rows.
    """
    fp: Column = fingerprint64(F.col(text_col))
    return df.groupBy(shard_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("long")).cast("long").alias("n_tokens"),
        F.sum(F.length(text_col).cast("long")).cast("long").alias("n_chars"),
        F.bit_xor(fp).alias("content_xor"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """Materialize the corpus as ``n_shards`` hash-sharded parquet
    directories plus a ``_manifest`` parquet; returns the manifest.

    Layout: ``{path}/data/shard_id=K/…parquet`` (one directory per shard —
    the partition-discovery layout every reader understands) and
    ``{path}/_manifest/…parquet``. The write repartitions by the shard
    column so each shard's files are written by the executors owning its
    rows (no tiny-file explosion: files per shard = DISTINCT writer tasks
    per shard = 1 after the repartition). The manifest is computed from
    the SAME assigned DataFrame the write consumed, so a loader verifying
    ``bit_xor`` of what it read against the manifest proves the export
    round-trips.
    """
    assigned = assign_shards(df, key_col, n_shards, salt=salt)
    assigned.repartition(n_shards, F.col("shard_id")).write.mode(
        "overwrite"
    ).partitionBy("shard_id").parquet(f"{path}/data")
    manifest = shard_manifest(assigned, "shard_id", text_col=text_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest
