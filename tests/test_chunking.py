"""Token-window chunking operator contracts (oracle parity runs separately)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators.chunking import chunk_documents


@pytest.fixture()
def toy(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (2, "a b c"),  # shorter than one window
        (3, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_starts_overlap_and_tail(spark, toy):
    out = chunk_documents(toy, "doc_id", "text", chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1 (10 tokens): starts run while start + overlap < n → 0,2,4,6;
    # the start-6 window already covers through t9, so no degenerate tail
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_index"])
    assert [r["chunk_text"] for r in d1] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]
    assert [r["chunk_n_tokens"] for r in d1] == [4, 4, 4, 4]
    # overlap: consecutive chunks share exactly `overlap` tokens
    for a, b in zip(d1, d1[1:]):
        assert a["chunk_text"].split()[-2:] == b["chunk_text"].split()[:2]
    # short docs yield exactly one chunk, unpadded
    assert [(r["chunk_text"], r["chunk_n_tokens"]) for r in by_doc[2]] == [("a b c", 3)]
    assert [(r["chunk_text"], r["chunk_n_tokens"]) for r in by_doc[3]] == [("solo", 1)]


def test_no_overlap_partitions_tokens_exactly(spark, toy):
    out = chunk_documents(toy, "doc_id", "text", chunk_tokens=3, overlap=0).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    orig = {r["doc_id"]: r["text"] for r in toy.collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_index"])
        rejoined = " ".join(r["chunk_text"] for r in rows)
        assert rejoined == orig[doc_id]
        assert sum(r["chunk_n_tokens"] for r in rows) == len(orig[doc_id].split())


def test_chunking_is_narrow_map(spark, toy):
    from sample_deepbook_margin_dune_dbt_spark.plans import explain_str

    plan = explain_str(chunk_documents(toy, "doc_id", "text", 32, 8), "formatted")
    assert "Exchange" not in plan
    # no Python eval in the operator itself (the createDataFrame scan node
    # mentions Python; that's the test harness, not the plan)
    assert "EvalPython" not in plan


def test_bad_params_raise(spark, toy):
    with pytest.raises(ValueError):
        chunk_documents(toy, "doc_id", "text", 0)
    with pytest.raises(ValueError):
        chunk_documents(toy, "doc_id", "text", 4, overlap=4)
