"""Streaming cross-run dedup (``streaming/dedup.py``): within-batch and
cross-drop exact dedup, band-index maintenance, pair emission, and
parity with the batch operators on the same content."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import TableStore
from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
    dedup_exact,
    minhash_band_rows,
    minhash_lsh_candidates,
)
from sample_deepbook_margin_dune_dbt_spark.streaming import stream_dedup_ingest

SCHEMA = "doc_id BIGINT, text STRING"

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different content about adaptive query execution plans"


def _drop(landing: str, name: str, docs: list[tuple[int, str]]) -> None:
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, name), "w") as f:
        for i, t in docs:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")


def _run(spark, landing, store, ckpt):
    q = stream_dedup_ingest(
        spark, landing, SCHEMA, store, "corpus", ckpt, emit_clusters=True
    )
    q.awaitTermination(120)


def test_stream_dedup_two_drops(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # drop 1: docs 2 and 3 share content → 3 dropped within-batch
    _drop(landing, "a.jsonl", [(1, BASE), (2, OTHER), (3, OTHER)])
    _run(spark, landing, store, ckpt)
    assert {r["doc_id"] for r in store.read("corpus").collect()} == {1, 2}
    dups = {r["doc_id"]: r["kept_id"] for r in store.read("corpus_dups").collect()}
    assert dups == {3: 2}

    # drop 2: doc 4 repeats drop-1 content (cross-run dropped), doc 5 is a
    # near-dup of doc 1 (one word differs → shared shingles → band hit)
    _drop(landing, "b.jsonl", [(4, OTHER), (5, NEAR)])
    _run(spark, landing, store, ckpt)

    assert {r["doc_id"] for r in store.read("corpus").collect()} == {1, 2, 5}
    dups = {r["doc_id"]: r["kept_id"] for r in store.read("corpus_dups").collect()}
    assert dups == {3: 2, 4: 2}

    # the index carries band rows exactly for the surviving corpus
    corpus = store.read("corpus")
    want = minhash_band_rows(corpus, "doc_id", "text")
    idx = store.read("corpus_fingerprint_index")
    assert idx.count() == want.count()
    assert idx.select("doc_id", "band", "band_key").exceptAll(want).count() == 0

    # pair emission found the planted near-dup
    pairs = {(r["id_a"], r["id_b"]) for r in store.read("corpus_neardup_pairs").collect()}
    assert (1, 5) in pairs

    # stream ≡ batch: survivors match batch exact-dedup over ALL dropped
    # docs (first id per content), pairs match the batch LSH candidates
    # over the surviving corpus
    all_docs = spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, OTHER), (4, OTHER), (5, NEAR)],
        "doc_id long, text string",
    )
    batch_survivors = {r["doc_id"] for r in dedup_exact(all_docs, "doc_id", "text").collect()}
    assert {r["doc_id"] for r in store.read("corpus").collect()} == batch_survivors
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(corpus, "doc_id", "text").collect()
    }
    assert pairs == batch_pairs

    # streaming clusters fold ≡ batch CC over the surviving corpus
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        duplicate_clusters,
    )

    got_clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in store.read("corpus_neardup_clusters").collect()
    }
    want_clusters = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(
            minhash_lsh_candidates(corpus, "doc_id", "text")
        ).collect()
    }
    for d, c in want_clusters.items():
        assert got_clusters[d] == c, (d, got_clusters[d], c)
    # every surviving doc holds a label; singletons label themselves
    assert set(got_clusters) == {1, 2, 5}


def test_stream_dedup_three_drop_bridge(spark, tmp_path):
    """A later micro-batch whose doc is near BOTH existing clusters must
    merge them through the fold — the streaming twin of the batch
    contracted-graph relabel case
    (``test_incremental_dedup.py::test_incremental_clusters_merge_across_steps``),
    so stream and batch incremental CC stay provably equivalent on the
    cross-cluster bridge path, not just on two-drop growth."""
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    t_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    t_b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    # 16 hash functions (8 bands): with the default 4 bands the
    # deterministic minhash of the union text happens to band with only
    # ONE family — each of the bridge's hash slots takes whichever
    # family's min is smaller, so a band links A only when both its
    # slots fall to A (p=1/4/band); 8 bands make the chosen texts link
    # BOTH families, verified against the batch LSH below
    N_HASHES = 16

    def _run16():
        stream_dedup_ingest(
            spark, landing, SCHEMA, store, "corpus", ckpt,
            emit_clusters=True, num_hashes=N_HASHES,
        ).awaitTermination(120)

    # drop 1: family A; drop 2: family B — two separate clusters
    _drop(landing, "a.jsonl", [(1, t_a), (2, t_a + " one")])
    _run16()
    _drop(landing, "b.jsonl", [(10, t_b), (11, t_b + " two")])
    _run16()
    mid = {
        r["doc_id"]: r["cluster_id"]
        for r in store.read("corpus_neardup_clusters").collect()
    }
    assert mid[2] == mid[1] and mid[11] == mid[10]
    assert mid[1] != mid[10], "families must start as separate clusters"

    # drop 3: doc 20 shares shingles with BOTH families → one cluster
    _drop(landing, "c.jsonl", [(20, t_b + " " + t_a)])
    _run16()
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in store.read("corpus_neardup_clusters").collect()
    }
    assert len({got[d] for d in (1, 2, 10, 11, 20)}) == 1, got
    # OLD rows of both families were relabeled, not just the new doc
    assert got[10] == got[1] and got[11] == got[1]

    # fold ≡ batch CC over the full corpus
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        duplicate_clusters,
    )

    corpus = store.read("corpus")
    batch_pairs = minhash_lsh_candidates(
        corpus, "doc_id", "text", num_hashes=N_HASHES
    )
    bp = {(r["id_a"], r["id_b"]) for r in batch_pairs.collect()}
    assert any(p in bp for p in [(1, 20), (2, 20)]), bp
    assert any(p in bp for p in [(10, 20), (11, 20)]), bp
    want = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(batch_pairs).collect()
    }
    for d, c in want.items():
        assert got[d] == c, (d, got[d], c)


def test_stream_dedup_rerun_is_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    _drop(landing, "a.jsonl", [(1, BASE), (2, OTHER)])
    _run(spark, landing, store, ckpt)
    n_corpus = store.read("corpus").count()
    n_idx = store.read("corpus_fingerprint_index").count()
    # restart against the same checkpoint: no files to process, no change
    _run(spark, landing, store, ckpt)
    assert store.read("corpus").count() == n_corpus
    assert store.read("corpus_fingerprint_index").count() == n_idx


def test_stream_decontaminate_three_drops_matches_batch(spark, tmp_path):
    """Span-tier decontamination twin (VERDICT r7 item 8): three drops
    through ``stream_decontaminate`` must reproduce EXACTLY the batch
    authority — ``contaminated_spans`` for the spans table and
    ``scrub_contaminated_spans`` for the clean table — over the union of
    all dropped documents, and a full re-run from a fresh checkpoint must
    be idempotent (MERGE keys, at-least-once replay)."""
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        contaminated_spans,
        scrub_contaminated_spans,
    )
    from sample_deepbook_margin_dune_dbt_spark.streaming import stream_decontaminate

    bench = spark.createDataFrame(
        [(900, "q1 q2 q3 q4 q5 q6"), (901, "r1 r2 r3 r4 r5")],
        "doc_id long, text string",
    )
    drops = [
        [(1, "x1 x2 q1 q2 q3 q4 q5 q6 x3"), (2, "clean words nothing shared here at all")],
        [(3, "r1 r2 r3 r4 r5 y1 y2 y3"), (4, "z1 z2 z3 z4 z5 z1 z2 z3 z4 z5")],
        [(5, "a1 q1 q2 q3 q4 a2 r2 r3 r4 r5 a3"), (6, "b1 b2")],
    ]
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    for i, docs in enumerate(drops):
        _drop(landing, f"d{i}.jsonl", docs)
        q = stream_decontaminate(
            spark, landing, SCHEMA, store, bench, "clean", ckpt, k=4
        )
        q.awaitTermination(120)

    all_docs = spark.createDataFrame(
        [d for batch in drops for d in batch], "doc_id long, text string"
    )
    want_spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in contaminated_spans(
            all_docs, "doc_id", "text", bench, "doc_id", "text", k=4
        ).collect()
    )
    got_spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in store.read("clean_contaminated_spans").collect()
    )
    assert got_spans == want_spans and len(want_spans) >= 3

    want_clean = sorted(
        (r["doc_id"], r["text_clean"], r["n_tokens"], r["n_dropped"])
        for r in scrub_contaminated_spans(
            all_docs, "doc_id", "text", bench, "doc_id", "text", k=4
        ).collect()
    )
    got_clean = sorted(
        (r["doc_id"], r["text_clean"], r["n_tokens"], r["n_dropped"])
        for r in store.read("clean").collect()
    )
    assert got_clean == want_clean
    # every document is represented; contaminated extents are gone
    assert {d for d, *_ in got_clean} == {1, 2, 3, 4, 5, 6}
    assert dict((d, nd) for d, _, _, nd in got_clean)[2] == 0

    # replay from a fresh checkpoint: MERGE keys make it a no-op
    q = stream_decontaminate(
        spark, landing, SCHEMA, store, bench, "clean", str(tmp_path / "ckpt2"), k=4
    )
    q.awaitTermination(120)
    assert sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in store.read("clean_contaminated_spans").collect()
    ) == want_spans
    assert sorted(
        (r["doc_id"], r["text_clean"], r["n_tokens"], r["n_dropped"])
        for r in store.read("clean").collect()
    ) == want_clean


def test_stream_decontaminate_redrop_supersedes_stale_spans(spark, tmp_path):
    """A re-dropped document with CHANGED text must fully supersede its
    earlier span rows (ADVICE r8): the old (id, start)-keyed MERGE left
    stale spans behind when the new text had fewer (or shifted) spans;
    the scoped delete+insert keeps the spans table equal to the batch
    authority over each document's LATEST drop."""
    from sample_deepbook_margin_dune_dbt_spark.operators.dedup import (
        contaminated_spans,
        scrub_contaminated_spans,
    )
    from sample_deepbook_margin_dune_dbt_spark.streaming import stream_decontaminate

    bench = spark.createDataFrame(
        [(900, "q1 q2 q3 q4 q5 q6"), (901, "r1 r2 r3 r4 r5")],
        "doc_id long, text string",
    )
    landing = str(tmp_path / "landing")
    store = TableStore(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # drop 1: doc 1 contaminated by BOTH benchmark docs (two spans),
    # doc 2 contaminated by one
    _drop(landing, "d0.jsonl", [
        (1, "x1 q1 q2 q3 q4 x2 r1 r2 r3 r4 r5 x3"),
        (2, "r1 r2 r3 r4 r5 y1"),
    ])
    q = stream_decontaminate(spark, landing, SCHEMA, store, bench, "clean", ckpt, k=4)
    q.awaitTermination(120)
    assert store.read("clean_contaminated_spans").filter(F.col("doc_id") == 1).count() == 2

    # drop 2: doc 1 re-dropped with text that now has ONE shifted span;
    # doc 2 re-dropped fully clean (zero spans)
    redrop = [(1, "z1 z2 z3 q1 q2 q3 q4 z4"), (2, "all clean now nothing shared")]
    _drop(landing, "d1.jsonl", redrop)
    q = stream_decontaminate(spark, landing, SCHEMA, store, bench, "clean", ckpt, k=4)
    q.awaitTermination(120)

    latest = spark.createDataFrame(redrop, "doc_id long, text string")
    want_spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in contaminated_spans(
            latest, "doc_id", "text", bench, "doc_id", "text", k=4
        ).collect()
    )
    got_spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in store.read("clean_contaminated_spans").collect()
    )
    assert got_spans == want_spans, "stale span rows survived the re-drop"
    assert [d for d, *_ in got_spans] == [1], "doc 2 must have zero span rows now"

    # and the clean table reflects the latest drop too
    want_clean = sorted(
        (r["doc_id"], r["text_clean"], r["n_dropped"])
        for r in scrub_contaminated_spans(
            latest, "doc_id", "text", bench, "doc_id", "text", k=4
        ).collect()
    )
    got_clean = sorted(
        (r["doc_id"], r["text_clean"], r["n_dropped"])
        for r in store.read("clean").collect()
    )
    assert got_clean == want_clean
