"""Frozen-tokenizer model pair (``corpus_bpe_rules`` +
``corpus_tokenized_documents``): train-once stability, watermark
incrementality, cross-run token consistency."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark.sources import (
    testdata_sources as _testdata_sources,  # underscore: keep pytest from collecting it
)
import sample_deepbook_margin_dune_dbt_spark.models_corpus as corpus  # noqa: F401


@pytest.fixture()
def env(spark, sf_dir, tmp_path):
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    half = docs.iloc[: len(docs) // 2]
    half.to_parquet(src_dir / "documents.parquet")
    sources = dict(_testdata_sources(sf_dir))
    sources["main.documents"] = str(src_dir / "documents.parquet")
    store = TableStore(spark, str(tmp_path / "wh"))
    runner = Runner(spark, store, sources)
    return runner, store, docs, src_dir


def test_rules_train_once_and_tokens_grow(spark, env):
    runner, store, docs, src_dir = env
    runner.run("+corpus_tokenized_documents")
    rules1 = sorted(
        (r["rank"], r["merged"]) for r in store.read("corpus_bpe_rules").collect()
    )
    assert len(rules1) == 32
    n1 = store.read("corpus_tokenized_documents").count()
    assert n1 == len(docs) // 2

    # the corpus grows; an incremental run must tokenize ONLY the new
    # docs and must NOT move the frozen rules
    docs.to_parquet(src_dir / "documents.parquet")
    runner.run("+corpus_tokenized_documents")
    rules2 = sorted(
        (r["rank"], r["merged"]) for r in store.read("corpus_bpe_rules").collect()
    )
    assert rules2 == rules1, "rules must stay frozen across incremental runs"
    tok = store.read("corpus_tokenized_documents")
    assert tok.count() == len(docs)
    assert runner.test("+corpus_tokenized_documents") == {}


def test_cross_run_tokens_match_single_run(spark, env):
    """Two-phase ingestion under frozen rules produces the same token
    fingerprints as... itself rerun — and crucially each doc's tokens
    depend only on the rules, so re-encoding any doc now reproduces its
    stored fingerprint (the consistency the train-once model buys)."""
    from sample_deepbook_margin_dune_dbt_spark.operators import bpe as B

    runner, store, docs, src_dir = env
    runner.run("+corpus_tokenized_documents")
    docs.to_parquet(src_dir / "documents.parquet")
    runner.run("+corpus_tokenized_documents")

    rules = store.read("corpus_bpe_rules").orderBy("rank").collect()
    all_docs = spark.createDataFrame(docs[["doc_id", "text"]])
    fresh = B.bpe_encode(all_docs, "text", rules).select(
        "doc_id",
        F.md5(F.concat_ws("", F.col("bpe_tokens"))).alias("fresh_md5"),
    )
    stored = store.read("corpus_tokenized_documents").select("doc_id", "tokens_md5")
    mismatches = (
        stored.join(fresh, "doc_id")
        .filter(F.col("tokens_md5") != F.col("fresh_md5"))
        .count()
    )
    assert mismatches == 0


def test_full_refresh_retrains(spark, env):
    runner, store, docs, src_dir = env
    runner.run("+corpus_bpe_rules")
    docs.to_parquet(src_dir / "documents.parquet")  # different corpus
    runner.run("+corpus_bpe_rules", full_refresh=True)
    rules = store.read("corpus_bpe_rules")
    assert rules.count() == 32  # retrained from the full corpus
