"""``corpus_trust_scores`` DAG node: trust propagation through the
incremental near-dup closures. Pins:

- every corpus document gets exactly one row (clustered or singleton);
- the emitted shares are EXACTLY what the clusters table implies
  (recomputed independently from the stored clusters + documents);
- the ``trusted_sources`` var retargets the trust set without code
  changes;
- the CLI drives the node end-to-end with ``--vars``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
import sample_deepbook_margin_dune_dbt_spark.models_corpus  # noqa: F401

SEL = "+corpus_trust_scores"
DEFAULT_TRUSTED = {"src0", "src5", "src10", "src15"}


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("trustwh"))
    store = TableStore(spark, wh)
    Runner(
        spark, store, {"main.documents": f"{sf_dir}/documents.parquet"}
    ).run(SEL)
    return store


def _expected(spark, sf_dir, store, trusted):
    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    cluster_of = {
        r["doc_id"]: r["cluster_id"]
        for r in store.read("corpus_neardup_clusters_inc")
        .select("doc_id", "cluster_id")
        .collect()
    }
    members: dict[int, list[int]] = {}
    for d in docs:
        members.setdefault(cluster_of.get(d, d), []).append(d)
    want = {}
    for cid, ms in members.items():
        nt = sum(1 for m in ms if docs[m] in trusted)
        for m in ms:
            want[m] = (cid, len(ms), nt, nt * 1_000_000 // len(ms), docs[m] in trusted)
    return want


def test_one_row_per_document_and_shares_match_clusters(spark, sf_dir, built):
    got = {
        r["doc_id"]: (
            r["cluster_id"],
            r["cluster_size"],
            r["n_trusted"],
            r["trust_e6"],
            r["is_trusted"],
        )
        for r in built.read("corpus_trust_scores").collect()
    }
    want = _expected(spark, sf_dir, built, DEFAULT_TRUSTED)
    assert got == want
    assert any(v[1] > 1 for v in got.values()), "fixture must contain clusters"


def test_var_retargets_trusted_set(spark, sf_dir, tmp_path):
    store = TableStore(spark, str(tmp_path / "varwh"))
    Runner(
        spark,
        store,
        {"main.documents": f"{sf_dir}/documents.parquet"},
        vars={"trusted_sources": "src1"},
    ).run(SEL)
    got = {
        r["doc_id"]: (
            r["cluster_id"],
            r["cluster_size"],
            r["n_trusted"],
            r["trust_e6"],
            r["is_trusted"],
        )
        for r in store.read("corpus_trust_scores").collect()
    }
    assert got == _expected(spark, sf_dir, store, {"src1"})


def test_cli_drive_with_vars(spark, sf_dir, tmp_path, capsys):
    from sample_deepbook_margin_dune_dbt_spark.__main__ import main

    wh = str(tmp_path / "cliwh")
    main(
        [
            "run",
            "--warehouse",
            wh,
            "--source",
            f"main.documents={sf_dir}/documents.parquet",
            "--vars",
            "{trusted_sources: 'src2,src3'}",
            "--select",
            SEL,
        ]
    )
    assert "corpus_trust_scores" in capsys.readouterr().out
    store = TableStore(spark, wh)
    out = store.read("corpus_trust_scores")
    assert out.count() > 0
    trusted_rows = out.filter(F.col("is_trusted")).join(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source"),
        "doc_id",
    )
    assert set(
        r["source"] for r in trusted_rows.select("source").distinct().collect()
    ) == {"src2", "src3"}
