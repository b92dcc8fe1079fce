"""Distributed epoch-shuffle contracts (``operators/ordering.py``).

Oracle parity for ``corpus_epoch_shuffle`` runs in
``test_oracle_parity.py``; these pin what parity can't see: equivalence
with the naive single-partition window, epoch decorrelation, rank
totality, and stability under repartitioning/bucket count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators import ordering as O
from sample_deepbook_margin_dune_dbt_spark.queries.common import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def _ranks(df, rank_col="rank"):
    return {r["doc_id"]: r[rank_col] for r in df.select("doc_id", rank_col).collect()}


def test_matches_global_window(docs):
    """Bucketed rank ≡ the naive row_number over a global ORDER BY."""
    got = _ranks(O.global_hash_rank(docs, "doc_id", salt="s:", n_buckets=32))
    naive = docs.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(O._hash60("doc_id", "s:").asc(), F.col("doc_id").asc())
        ),
    )
    assert got == _ranks(naive)


def test_rank_is_total_and_stable(docs):
    n = docs.count()
    a = O.global_hash_rank(docs, "doc_id", n_buckets=16)
    ranks = sorted(_ranks(a).values())
    assert ranks == list(range(1, n + 1)), "rank must be a 1..N permutation"
    # invariant to physical layout and bucket count
    b = O.global_hash_rank(docs.repartition(17), "doc_id", n_buckets=7)
    assert _ranks(a) == _ranks(b)


def test_epochs_decorrelated(docs):
    e1 = _ranks(O.epoch_shuffle(docs, "doc_id", epoch=1), "epoch_rank")
    e2 = _ranks(O.epoch_shuffle(docs, "doc_id", epoch=2), "epoch_rank")
    assert set(e1) == set(e2)
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    assert moved > 0.9 * len(e1), "epoch salt must permute nearly every rank"


def test_no_single_partition_stage(spark, docs):
    """The scale contract: no SinglePartition exchange anywhere in the
    plan (the naive global window's signature)."""
    df = O.epoch_shuffle(docs, "doc_id", epoch=3, n_buckets=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_validates_buckets(docs):
    with pytest.raises(ValueError):
        O.global_hash_rank(docs, "doc_id", n_buckets=0)


def test_value_rank_matches_global_window(docs):
    """Range-bucketed value rank ≡ naive row_number over a global ORDER BY
    on (value, id), including tie groups (lang has ~4 distinct values)."""
    scored = docs.select("doc_id", "lang")
    got = _ranks(
        O.global_value_rank(scored, ["lang", "doc_id"], n_partitions=16)
    )
    w = Window.orderBy(F.col("lang").asc(), F.col("doc_id").asc())
    want = _ranks(scored.withColumn("rank", F.row_number().over(w)))
    assert got == want


def test_value_rank_is_permutation_and_param_stable(docs):
    n = docs.count()
    for parts in (1, 7, 64):
        r = O.global_value_rank(docs, ["doc_id"], n_partitions=parts)
        ranks = sorted(_ranks(r).values())
        assert ranks == list(range(1, n + 1)), f"n_partitions={parts}"
    # doc_id order ⇒ rank follows doc_id order exactly
    by_id = _ranks(O.global_value_rank(docs, ["doc_id"], n_partitions=8))
    ids = sorted(by_id)
    assert [by_id[i] for i in ids] == list(range(1, n + 1))


def test_value_rank_no_single_partition_stage(spark, docs):
    """The scale contract: range partitioning, never SinglePartition."""
    plan = (
        O.global_value_rank(docs, ["doc_id"], n_partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_value_rank_validates_partitions(docs):
    with pytest.raises(ValueError):
        O.global_value_rank(docs, ["doc_id"], n_partitions=0)


def _cumsums(df, col="cumsum"):
    return {r["doc_id"]: r[col] for r in df.select("doc_id", col).collect()}


def test_hash_cumsum_matches_global_window(docs, spark):
    """Bucketed running sum ≡ the naive global-window cumsum over
    (hash_uniform, id) — the pack_sequences layout order."""
    from sample_deepbook_margin_dune_dbt_spark.operators.sampling import hash_uniform

    weighted = docs.select("doc_id", F.length("text").alias("w"))
    got = _cumsums(
        O.global_hash_cumsum(weighted, "doc_id", "w", salt="p:", n_buckets=32)
    )
    w = (
        Window.orderBy(hash_uniform("doc_id", "p:").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = weighted.withColumn("cumsum", F.sum(F.col("w").cast("long")).over(w))
    assert got == _cumsums(naive)
    # invariant to physical layout and bucket count
    again = O.global_hash_cumsum(
        weighted.repartition(17), "doc_id", "w", salt="p:", n_buckets=7
    )
    assert got == _cumsums(again)


def test_hash_cumsum_no_single_partition_stage(docs):
    """The scale contract pack_sequences relies on: bucketed windows,
    never a SinglePartition global sort."""
    weighted = docs.select("doc_id", F.length("text").alias("w"))
    df = O.global_hash_cumsum(weighted, "doc_id", "w", n_buckets=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_sequences_no_single_partition_stage(docs):
    """The driver-declared packing query inherits the bucketed-cumsum
    scale contract end to end."""
    from sample_deepbook_margin_dune_dbt_spark.operators.chunking import pack_sequences

    weighted = docs.select("doc_id", F.length("text").alias("w"))
    df = pack_sequences(weighted, "doc_id", "w", 512)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_hash_cumsum_validates_buckets(docs):
    with pytest.raises(ValueError):
        O.global_hash_cumsum(docs.select("doc_id"), "doc_id", "doc_id", n_buckets=0)


def test_hash_ops_reject_null_keys(spark):
    """NULL keys have no defined hash order — both bucketed operators
    fail actionably instead of crashing in the driver sort."""
    df = spark.createDataFrame([(1, 5), (None, 7)], "doc_id long, w long")
    with pytest.raises(ValueError, match="contains NULLs"):
        O.global_hash_rank(df, "doc_id")
    with pytest.raises(ValueError, match="contains NULLs"):
        O.global_hash_cumsum(df, "doc_id", "w")
