"""Text-format ingestion + training-shard export (``sources/files.py``)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators.ordering import epoch_shuffle
from sample_deepbook_margin_dune_dbt_spark.queries.common import load
from sample_deepbook_margin_dune_dbt_spark.sources import files as FS

SCHEMA = "doc_id BIGINT, text STRING, lang STRING"


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "drop.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr"}),
        '{"doc_id": 3, "text": "truncated',  # corrupt line
        json.dumps({"doc_id": 4, "text": "hallo", "lang": "de"}),
        "not json at all",
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_permissive_quarantine(spark, jsonl_path):
    df = FS.read_jsonl(spark, jsonl_path, SCHEMA)
    clean, bad = FS.quarantine(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2, 4}
    assert FS.CORRUPT_COL not in clean.columns
    bad_lines = [r[FS.CORRUPT_COL] for r in bad.collect()]
    assert len(bad_lines) == 2 and "not json at all" in bad_lines


def test_quarantine_scope_releases_cache(spark, jsonl_path):
    df = FS.read_jsonl(spark, jsonl_path, SCHEMA)
    with FS.quarantine_scope(df) as (clean, bad):
        assert {r["doc_id"] for r in clean.collect()} == {1, 2, 4}
        assert bad.count() == 2
        assert df.storageLevel.useMemory  # parse cache live inside the scope
    assert not df.storageLevel.useMemory  # handed back on exit


def test_jsonl_dropmalformed_and_failfast(spark, jsonl_path):
    dropped = FS.read_jsonl(spark, jsonl_path, SCHEMA, mode="DROPMALFORMED")
    assert dropped.count() == 3 and FS.CORRUPT_COL not in dropped.columns
    with pytest.raises(Exception):
        FS.read_jsonl(spark, jsonl_path, SCHEMA, mode="FAILFAST").collect()


def test_csv_roundtrip_with_corrupt_line(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text("doc_id,n\n1,10\n2,twenty\n3,30\n")
    df = FS.read_csv(spark, str(p), "doc_id BIGINT, n BIGINT")
    clean, bad = FS.quarantine(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 3}
    assert bad.count() == 1


def test_jsonl_write_read_roundtrip(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "export")
    FS.write_jsonl(docs, out)
    back = FS.read_jsonl(spark, out, SCHEMA)
    clean, bad = FS.quarantine(back)
    assert bad.count() == 0
    assert clean.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in clean.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert a == b


def test_training_shards_ordered_and_disjoint(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    ranked = epoch_shuffle(docs, "doc_id", epoch=1, n_buckets=16)
    out = str(tmp_path / "shards")
    manifest = FS.write_training_shards(
        ranked, out, "epoch_rank", records_per_shard=64
    ).collect()
    n = docs.count()
    assert sum(r["n_rows"] for r in manifest) == n
    assert all(r["n_rows"] <= 64 for r in manifest)
    assert len(manifest) >= n // 64
    # shard rank ranges are disjoint and ordered ⇒ file-order == global order
    spans = [(r["min_rank"], r["max_rank"]) for r in manifest]
    for (lo, hi), (lo2, _) in zip(spans, spans[1:]):
        assert lo <= hi < lo2
    # within-shard order: each file is sorted by rank
    one = manifest[0]["shard_file"]
    rows = (
        spark.read.parquet(out)
        .withColumn("_f", F.input_file_name())
        .filter(F.col("_f") == one)
        .select("epoch_rank")
        .collect()
    )
    ranks = [r["epoch_rank"] for r in rows]
    assert ranks == sorted(ranks)


def test_training_shards_validates(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        FS.write_training_shards(docs, str(tmp_path / "x"), "doc_id", 0)


def test_training_shards_compose_with_curriculum_rank(spark, sf_dir, tmp_path):
    """Curriculum-ordered export: value-ranked docs (quality asc) shard
    into disjoint ordered spans — low-quality warmup shards first, the
    curriculum-learning read order, via the same sink as epoch shuffle."""
    from sample_deepbook_margin_dune_dbt_spark.functions.text import quality_score
    from sample_deepbook_margin_dune_dbt_spark.operators.ordering import (
        global_value_rank,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", (F.floor(quality_score(F.col("text")) * 10000)).alias("q")
    )
    ranked = global_value_rank(docs, ["q", "doc_id"], n_partitions=8)
    out = str(tmp_path / "curr_shards")
    manifest = FS.write_training_shards(
        ranked, out, "rank", records_per_shard=100
    ).collect()
    assert sum(r["n_rows"] for r in manifest) == docs.count()
    spans = [(r["min_rank"], r["max_rank"]) for r in manifest]
    for (lo, hi), (lo2, _) in zip(spans, spans[1:]):
        assert lo <= hi < lo2
    # the first shard holds the lowest-quality tail of the corpus
    back = spark.read.parquet(out)
    first_file = manifest[0]["shard_file"]
    qmax_first = (
        back.withColumn("_f", F.input_file_name())
        .filter(F.col("_f") == first_file)
        .agg(F.max("q")).first()[0]
    )
    qmin_last = (
        back.withColumn("_f", F.input_file_name())
        .filter(F.col("_f") == manifest[-1]["shard_file"])
        .agg(F.min("q")).first()[0]
    )
    assert qmax_first <= qmin_last
