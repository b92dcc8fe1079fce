"""Benchmark-versioned cross-run decontamination model (VERDICT r8 item 6):
``corpus_decontaminated_documents`` re-scrubs ONLY new docs on the doc_id
watermark while the benchmark content fingerprint is stable, and a
benchmark bump forces a retrain-equivalent full re-scrub. Pins:

- N incremental growth steps ≡ one batch ``scrub_contaminated_spans``
  over the final corpus (same benchmark);
- a no-growth rerun is idempotent;
- changing the registered ``main.benchmark_documents`` content re-scrubs
  EVERY row under the new fingerprint (old scrubs cannot survive);
- with no benchmark registered the model is the identity pass-through in
  normalized token space;
- the CLI drives the node end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
    scrub_contaminated_spans,
)
import sample_deepbook_margin_dune_dbt_spark.models_corpus  # noqa: F401

SEL = "+corpus_decontaminated_documents"


@pytest.fixture(scope="module")
def fixtures(spark, sf_dir, tmp_path_factory):
    """Three growth snapshots of documents + two benchmark versions."""
    root = tmp_path_factory.mktemp("decontam")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3], ids[-1]]
    slices = []
    for i, cut in enumerate(cuts):
        p = str(root / f"step{i}")
        docs.filter(F.col("doc_id") <= cut).write.parquet(p)
        slices.append(p)
    b1 = str(root / "bench_v1")
    docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text").write.parquet(b1)
    b2 = str(root / "bench_v2")
    docs.filter(F.col("doc_id") % 89 == 0).select("doc_id", "text").write.parquet(b2)
    return slices, b1, b2


def _state(store):
    return {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_dropped"], r["benchmark_fp"])
        for r in store.read("corpus_decontaminated_documents").collect()
    }


def _batch_twin(spark, docs_path, bench_path, fp):
    docs = spark.read.parquet(docs_path)
    bench = spark.read.parquet(bench_path)
    return {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_dropped"], fp)
        for r in scrub_contaminated_spans(
            docs, "doc_id", "text", bench, "doc_id", "text", k=8
        ).collect()
    }


def _bench_fp(spark, bench_path):
    from sample_deepbook_margin_dune_dbt_spark.functions.text import fingerprint64

    row = (
        spark.read.parquet(bench_path)
        .agg(F.bit_xor(fingerprint64(F.col("text"))).alias("x"), F.count(F.lit(1)).alias("c"))
        .first()
    )
    return f"{row['x']}_{row['c']}"


def test_growth_steps_equal_full_rebuild(spark, fixtures, tmp_path):
    slices, b1, _ = fixtures
    store = TableStore(spark, str(tmp_path / "inc"))
    for p in slices:
        Runner(
            spark, store, {"main.documents": p, "main.benchmark_documents": b1}
        ).run(SEL)
    fp = _bench_fp(spark, b1)
    got = _state(store)
    want = _batch_twin(spark, slices[-1], b1, fp)
    assert got == want
    assert any(v[2] > 0 for v in got.values()), (
        "fixture benchmark must contaminate some corpus docs"
    )


def test_no_growth_rerun_is_idempotent_and_prunes(spark, fixtures, tmp_path):
    slices, b1, _ = fixtures
    store = TableStore(spark, str(tmp_path / "idem"))
    runner = Runner(
        spark, store, {"main.documents": slices[0], "main.benchmark_documents": b1}
    )
    runner.run(SEL)
    before = _state(store)
    runner.run(SEL)
    assert _state(store) == before


def test_benchmark_bump_forces_full_rescrub(spark, fixtures, tmp_path):
    slices, b1, b2 = fixtures
    store = TableStore(spark, str(tmp_path / "bump"))
    full = slices[-1]
    Runner(
        spark, store, {"main.documents": full, "main.benchmark_documents": b1}
    ).run(SEL)
    fp1 = _bench_fp(spark, b1)
    assert all(v[3] == fp1 for v in _state(store).values())

    # same corpus, NEW benchmark content → every row re-scrubbed/re-stamped
    Runner(
        spark, store, {"main.documents": full, "main.benchmark_documents": b2}
    ).run(SEL)
    fp2 = _bench_fp(spark, b2)
    assert fp2 != fp1
    got = _state(store)
    assert all(v[3] == fp2 for v in got.values()), "stale benchmark stamps survived"
    assert got == _batch_twin(spark, full, b2, fp2)


def test_no_benchmark_is_identity_passthrough(spark, fixtures, tmp_path):
    slices, _, _ = fixtures
    store = TableStore(spark, str(tmp_path / "nobench"))
    Runner(spark, store, {"main.documents": slices[0]}).run(SEL)
    got = _state(store)
    assert got
    assert all(v[2] == 0 for v in got.values())
    assert all(v[3] == "none_0" for v in got.values())
    # normalized token space: clean text is the ws-join of the tokens
    n_docs = spark.read.parquet(slices[0]).count()
    assert len(got) == n_docs


def test_cli_drive(spark, fixtures, tmp_path, capsys):
    from sample_deepbook_margin_dune_dbt_spark.__main__ import main

    slices, b1, _ = fixtures
    wh = str(tmp_path / "cliwh")
    main(
        [
            "run",
            "--warehouse",
            wh,
            "--source",
            f"main.documents={slices[0]}",
            "--source",
            f"main.benchmark_documents={b1}",
            "--select",
            SEL,
        ]
    )
    out = capsys.readouterr().out
    assert "corpus_decontaminated_documents" in out
    store = TableStore(spark, wh)
    assert store.read("corpus_decontaminated_documents").count() > 0
