"""Incremental training-shard manifest model: ``corpus_training_shards``
maintains per-shard counts and the XOR content checksum across runs by
combining each run's delta with the stored row (counts add, disjoint-union
XOR composes). Pins:

- N incremental growth steps ≡ one batch ``shard_manifest`` over the
  final corpus (every column, checksum included);
- a no-growth rerun is idempotent;
- the ``n_shards`` var reaches the assignment;
- the CLI drives the node end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark.operators.export import (
    assign_shards,
    shard_manifest,
)
import sample_deepbook_margin_dune_dbt_spark.models_corpus  # noqa: F401

SEL = "+corpus_training_shards"


@pytest.fixture(scope="module")
def slices(spark, sf_dir, tmp_path_factory):
    """Three growth snapshots of documents."""
    root = tmp_path_factory.mktemp("shards")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3], ids[-1]]
    out = []
    for i, cut in enumerate(cuts):
        p = str(root / f"step{i}")
        docs.filter(F.col("doc_id") <= cut).write.parquet(p)
        out.append(p)
    return out


def _state(store):
    return {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["content_xor"], r["max_doc_id"])
        for r in store.read("corpus_training_shards").collect()
    }


def _batch_twin(spark, docs_path, n_shards=8):
    docs = spark.read.parquet(docs_path)
    assigned = assign_shards(docs, "doc_id", n_shards)
    man = shard_manifest(assigned, "shard_id").join(
        assigned.groupBy("shard_id").agg(F.max("doc_id").alias("max_doc_id")),
        "shard_id",
    )
    return {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["content_xor"], r["max_doc_id"])
        for r in man.collect()
    }


def test_growth_steps_equal_full_rebuild(spark, slices, tmp_path):
    store = TableStore(spark, str(tmp_path / "inc"))
    for p in slices:
        Runner(spark, store, {"main.documents": p}).run(SEL)
    assert _state(store) == _batch_twin(spark, slices[-1])


def test_no_growth_rerun_is_idempotent(spark, slices, tmp_path):
    store = TableStore(spark, str(tmp_path / "idem"))
    runner = Runner(spark, store, {"main.documents": slices[0]})
    runner.run(SEL)
    before = _state(store)
    runner.run(SEL)
    assert _state(store) == before


def test_n_shards_var(spark, slices, tmp_path):
    store = TableStore(spark, str(tmp_path / "nvar"))
    Runner(
        spark, store, {"main.documents": slices[0]}, vars={"n_shards": 4}
    ).run(SEL)
    got = _state(store)
    assert set(got) <= set(range(4)) and len(got) == 4
    assert got == _batch_twin(spark, slices[0], n_shards=4)


AUDIT_SEL = "+corpus_shard_export_audit"


def test_audit_node_all_ok_across_growth(spark, slices, tmp_path):
    """The audit node proves ledger ≡ fresh recompute after every growth
    step — the pytest growth invariant as a queryable DAG node."""
    store = TableStore(spark, str(tmp_path / "aud"))
    for p in slices:
        Runner(spark, store, {"main.documents": p}).run(AUDIT_SEL)
        rows = store.read("corpus_shard_export_audit").collect()
        assert rows and all(
            r["docs_ok"] == 1 and r["tokens_ok"] == 1 and r["xor_ok"] == 1
            for r in rows
        )
        assert all(r["content_xor"] == r["content_xor_fresh"] for r in rows)


def test_audit_node_catches_mutated_history(spark, slices, tmp_path):
    """An in-place edit BEHIND the watermark (which the incremental ledger
    never re-reads) must surface as xor_ok=0 / tokens mismatch."""
    store = TableStore(spark, str(tmp_path / "mut"))
    Runner(spark, store, {"main.documents": slices[0]}).run(SEL)

    # rewrite the source with one historical document's text mutated
    docs = spark.read.parquet(slices[0])
    first_id = docs.agg(F.min("doc_id")).first()[0]
    mutated_path = str(tmp_path / "mutated_docs")
    docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == first_id, F.concat(F.col("text"), F.lit(" TAMPERED"))
        ).otherwise(F.col("text")),
    ).write.parquet(mutated_path)

    Runner(spark, store, {"main.documents": mutated_path}).run(AUDIT_SEL)
    bad = [
        r
        for r in store.read("corpus_shard_export_audit").collect()
        if r["xor_ok"] == 0
    ]
    assert len(bad) == 1, "exactly the tampered document's shard must fail"
    assert bad[0]["n_docs"] == bad[0]["n_docs_fresh"]  # counts agree
    assert bad[0]["content_xor"] != bad[0]["content_xor_fresh"]


def test_cli_drive(spark, slices, tmp_path):
    from sample_deepbook_margin_dune_dbt_spark.__main__ import main

    wh = str(tmp_path / "cliwh")
    rc = main(
        [
            "run",
            "--warehouse",
            wh,
            "--source",
            f"main.documents={slices[0]}",
            "--select",
            SEL,
        ]
    )
    assert rc == 0
    store = TableStore(spark, wh)
    assert _state(store) == _batch_twin(spark, slices[0])
