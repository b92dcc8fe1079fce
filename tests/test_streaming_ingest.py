"""Streaming JSONL file-drop ingestion (``streaming/ingest.py``):
quarantine split, MERGE upserts across drops, and batch≡stream parity."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import TableStore
from sample_deepbook_margin_dune_dbt_spark.sources import files as FS
from sample_deepbook_margin_dune_dbt_spark.streaming import stream_jsonl_ingest

SCHEMA = "doc_id BIGINT, text STRING, lang STRING"


def _drop(landing: str, name: str, lines: list[str]) -> None:
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _doc(i: int, text: str) -> str:
    return json.dumps({"doc_id": i, "text": text, "lang": "en"})


def test_ingest_quarantines_and_upserts_across_drops(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    _drop(landing, "a.jsonl", [_doc(1, "one"), _doc(2, "two"), "NOT JSON"])
    q = stream_jsonl_ingest(
        spark, landing, SCHEMA, store, "corpus", ["doc_id"], ckpt
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r["text"] for r in store.read("corpus").collect()}
    assert got == {1: "one", 2: "two"}
    bad = store.read("corpus_quarantine").collect()
    assert [r["raw_line"] for r in bad] == ["NOT JSON"]

    # second drop: new doc + re-drop of doc 2 (revised) → upsert, not dup
    _drop(landing, "b.jsonl", [_doc(2, "two-v2"), _doc(3, "three")])
    q2 = stream_jsonl_ingest(
        spark, landing, SCHEMA, store, "corpus", ["doc_id"], ckpt
    )
    q2.awaitTermination(120)

    got = {r["doc_id"]: r["text"] for r in store.read("corpus").collect()}
    assert got == {1: "one", 2: "two-v2", 3: "three"}
    # quarantine unchanged: file a was NOT reprocessed (checkpoint tracking)
    assert store.read("corpus_quarantine").count() == 1


def test_ingest_dedups_within_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    _drop(landing, "a.jsonl", [_doc(7, "first"), _doc(7, "dup-of-7")])
    q = stream_jsonl_ingest(
        spark, landing, SCHEMA, store, "corpus", ["doc_id"], str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    rows = store.read("corpus").collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 7


def _tdoc(i: int, text: str, ts: str) -> str:
    return json.dumps(
        {"doc_id": i, "text": text, "lang": "en", "updated_at": ts}
    )


def test_out_of_order_late_drop_is_audited_not_merged(spark, tmp_path):
    """Mirror of the reference's 7-day late-data contract on the streaming
    path: a re-drop older than max(ingested event time) - 7 days lands in
    the ``_late`` audit table and does NOT rewrite corpus state; late data
    inside the window still upserts."""
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    tschema = SCHEMA + ", updated_at TIMESTAMP"

    def run():
        q = stream_jsonl_ingest(
            spark, landing, tschema, store, "corpus", ["doc_id"], ckpt,
            event_time_col="updated_at", max_lateness="7 days",
        )
        q.awaitTermination(120)

    _drop(landing, "a.jsonl", [
        _tdoc(1, "one", "2026-01-01T00:00:00"),
        _tdoc(2, "two", "2026-01-10T00:00:00"),
    ])
    run()
    got = {r["doc_id"]: r["text"] for r in store.read("corpus").collect()}
    assert got == {1: "one", 2: "two"}  # first batch: no floor yet

    # out-of-order second drop: doc 3 is 1 day late (inside the window),
    # doc 4 and a doc-1 revision predate the floor (2026-01-03) → audited
    _drop(landing, "b.jsonl", [
        _tdoc(3, "three", "2026-01-09T00:00:00"),
        _tdoc(4, "four", "2026-01-02T00:00:00"),
        _tdoc(1, "one-rewritten", "2026-01-02T12:00:00"),
    ])
    run()

    got = {r["doc_id"]: r["text"] for r in store.read("corpus").collect()}
    assert got == {1: "one", 2: "two", 3: "three"}  # doc 1 NOT rewritten
    late = {(r["doc_id"], r["text"]) for r in store.read("corpus_late").collect()}
    assert late == {(4, "four"), (1, "one-rewritten")}
    # batch numbering continues across restarts of the same checkpoint
    assert {r["batch_id"] for r in store.read("corpus_late").collect()} == {1}


def test_null_event_time_row_merges_not_dropped(spark, tmp_path):
    """A clean row whose event-time field is missing (permissive parse →
    NULL ts) must stay on the merge path once the late-data floor is
    active — NULL fails both `<= floor` and `> floor`, so a naive filter
    pair silently drops it (ADVICE r4)."""
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    tschema = SCHEMA + ", updated_at TIMESTAMP"

    def run():
        q = stream_jsonl_ingest(
            spark, landing, tschema, store, "corpus", ["doc_id"], ckpt,
            event_time_col="updated_at", max_lateness="7 days",
        )
        q.awaitTermination(120)

    _drop(landing, "a.jsonl", [_tdoc(1, "one", "2026-01-10T00:00:00")])
    run()
    # second drop: floor is now active (2026-01-03); doc 2 has no
    # updated_at field at all → NULL event time
    _drop(landing, "b.jsonl", [
        json.dumps({"doc_id": 2, "text": "no-ts", "lang": "en"}),
        _tdoc(3, "in-window", "2026-01-09T00:00:00"),
    ])
    run()
    got = {r["doc_id"]: r["text"] for r in store.read("corpus").collect()}
    assert got == {1: "one", 2: "no-ts", 3: "in-window"}
    assert not store.exists("corpus_late")


def test_stream_matches_batch_build(spark, tmp_path):
    """The stream-built corpus ≡ a batch quarantine+merge over the same drops."""
    landing = str(tmp_path / "landing")
    lines = [_doc(i, f"t{i}") for i in range(20)] + ["BAD1", "{broken"]
    _drop(landing, "a.jsonl", lines[:10])
    _drop(landing, "b.jsonl", lines[10:])

    s_store = TableStore(spark, str(tmp_path / "wh_s"))
    q = stream_jsonl_ingest(
        spark, landing, SCHEMA, s_store, "corpus", ["doc_id"], str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    clean, bad = FS.quarantine(FS.read_jsonl(spark, landing, SCHEMA))
    s_rows = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in s_store.read("corpus").collect()
    )
    b_rows = sorted(
        (r["doc_id"], r["text"], r["lang"])
        for r in clean.select("doc_id", "text", "lang").collect()
    )
    assert s_rows == b_rows
    assert s_store.read("corpus_quarantine").count() == bad.count() == 2
