"""Streaming shard export (``streaming/export.py``): drop-by-drop manifest
maintenance equals the batch manifest of everything ingested, re-dropped
documents don't perturb it, and a fresh-checkpoint replay over the same
landing directory is idempotent (the (shard_id, batch_id) delta ledger)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import TableStore
from sample_deepbook_margin_dune_dbt_spark.operators.export import (
    assign_shards,
    shard_manifest,
)
from sample_deepbook_margin_dune_dbt_spark.streaming import stream_shard_export

SCHEMA = "doc_id BIGINT, text STRING"
N_SHARDS = 4

DOCS = {
    1: "alpha beta gamma delta",
    2: "the quick brown fox jumps over the lazy dog",
    3: "completely different content about adaptive query execution",
    4: "epsilon zeta eta theta iota kappa",
    5: "streaming manifests compose by xor and addition",
    6: "short text",
}


def _drop(landing: str, name: str, ids: list[int], texts=None) -> None:
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, name), "w") as f:
        for i in ids:
            f.write(json.dumps({"doc_id": i, "text": (texts or DOCS)[i]}) + "\n")


def _run(spark, landing, store, ckpt):
    q = stream_shard_export(
        spark, landing, SCHEMA, store, "corpus", ckpt, n_shards=N_SHARDS
    )
    q.awaitTermination(120)


def _manifest(store):
    return {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["content_xor"], r["max_doc_id"])
        for r in store.read("corpus_shard_manifest").collect()
    }


def _batch_twin(spark, ids):
    df = spark.createDataFrame(
        [(i, DOCS[i]) for i in ids], ["doc_id", "text"]
    )
    a = assign_shards(df, "doc_id", N_SHARDS)
    man = shard_manifest(a, "shard_id").join(
        a.groupBy("shard_id").agg(F.max("doc_id").alias("max_doc_id")), "shard_id"
    )
    return {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["content_xor"], r["max_doc_id"])
        for r in man.collect()
    }


def test_drops_accumulate_to_batch_manifest(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    _drop(landing, "a.jsonl", [1, 2, 3])
    _run(spark, landing, store, ckpt)
    assert _manifest(store) == _batch_twin(spark, [1, 2, 3])

    # drop 2 re-delivers doc 2 (ignored: first occurrence wins) + new docs
    _drop(landing, "b.jsonl", [2, 4, 5])
    _run(spark, landing, store, ckpt)
    assert _manifest(store) == _batch_twin(spark, [1, 2, 3, 4, 5])
    assert {r["doc_id"] for r in store.read("corpus").collect()} == {1, 2, 3, 4, 5}

    # re-dropped doc with CHANGED text must not perturb the manifest
    _drop(landing, "c.jsonl", [2], texts={2: "mutated content for doc two"})
    _run(spark, landing, store, ckpt)
    assert _manifest(store) == _batch_twin(spark, [1, 2, 3, 4, 5])


def test_fresh_checkpoint_replay_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))

    _drop(landing, "a.jsonl", [1, 2, 3])
    _run(spark, landing, store, str(tmp_path / "ckpt1"))
    _drop(landing, "b.jsonl", [4, 5, 6])
    _run(spark, landing, store, str(tmp_path / "ckpt1"))
    before = _manifest(store)
    assert before == _batch_twin(spark, [1, 2, 3, 4, 5, 6])

    # a FRESH checkpoint re-delivers every file against the same store:
    # the corpus probe filters all docs as already ingested — no deltas,
    # manifest unchanged
    _run(spark, landing, store, str(tmp_path / "ckpt2"))
    assert _manifest(store) == before


def test_stream_matches_batch_shard_assignment(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    _drop(landing, "a.jsonl", list(DOCS))
    _run(spark, landing, store, str(tmp_path / "ckpt"))
    got = {
        r["doc_id"]: r["shard_id"] for r in store.read("corpus").collect()
    }
    df = spark.createDataFrame(list(DOCS.items()), ["doc_id", "text"])
    want = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(df, "doc_id", N_SHARDS).collect()
    }
    assert got == want, "stream and batch must agree on every document's shard"
