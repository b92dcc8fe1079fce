"""BPE vocabulary-induction contracts (``operators/bpe.py``).

The operator is iterative (argmax + merge per round) and has no SQL
oracle; its authority here is a pure-Python implementation of the
published algorithm (Sennrich et al. 2016) run on the same histogram
with the same deterministic tie-break.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators import bpe as B
from sample_deepbook_margin_dune_dbt_spark.queries.common import load


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE: symbol sequences = chars + </w>; each round counts
    weighted adjacent pairs, merges the (count desc, pair asc) argmax
    left-to-right without overlap."""
    seqs = {w: list(w) + [B.END_OF_WORD] for w in word_freqs}
    rules = []
    for rank in range(n_merges):
        counts = collections.Counter()
        for w, syms in seqs.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rank, a, b, a + b, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return rules, seqs


@pytest.fixture(scope="module")
def hist_df(spark, sf_dir):
    return B.word_histogram(load(spark, sf_dir, "documents")).localCheckpoint()


def test_matches_python_reference_on_corpus(spark, hist_df):
    """20 merges on the real documents histogram: identical rules, in
    order, and identical post-merge symbol sequences."""
    wf = {r["word"]: r["freq"] for r in hist_df.collect()}
    want_rules, want_seqs = _py_bpe(wf, 20)

    rules, seqs = B.learn_bpe(hist_df, 20)
    got_rules = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"]) for r in rules]
    assert got_rules == want_rules

    got_seqs = {r["word"]: list(r["syms"]) for r in seqs.collect()}
    assert got_seqs == want_seqs


def test_textbook_example(spark):
    """The classic low/lower/newest/widest corpus: 'es', then 'est',
    then 'est</w>' merge first (the published walkthrough)."""
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    df = spark.createDataFrame(list(wf.items()), "word string, freq long")
    rules, _ = B.learn_bpe(df, 3)
    assert [(r["left"], r["right"]) for r in rules] == [
        ("e", "s"),
        ("es", "t"),
        ("est", B.END_OF_WORD),
    ]
    assert rules[0]["pair_freq"] == 9  # newest(6) + widest(3)


def test_early_stop_when_no_pairs_remain(spark):
    """Single-char words exhaust after one merge per word shape; the
    loop must stop early rather than emit empty rules."""
    df = spark.createDataFrame([("a", 3), ("b", 2)], "word string, freq long")
    rules, seqs = B.learn_bpe(df, 10)
    # 'a</w>' and 'b</w>' merge (freq order), then nothing is adjacent
    assert [(r["left"], r["right"]) for r in rules] == [
        ("a", B.END_OF_WORD),
        ("b", B.END_OF_WORD),
    ]
    assert all(len(r["syms"]) == 1 for r in seqs.collect())


def test_histogram_is_single_scan_partial_agg(spark, sf_dir):
    """The corpus pass partial-aggregates below its one exchange (the
    vocab-sized reduce side is the scale contract)."""
    from sample_deepbook_margin_dune_dbt_spark.plans import explain_str

    plan = explain_str(
        B.word_histogram(load(spark, sf_dir, "documents")), "simple"
    )
    assert "partial_count" in plan
    assert plan.count("Exchange") == 1


def test_encode_reproduces_training_state(spark, hist_df):
    """The ENCODE side (greedy lowest-rank merge application) must
    reproduce the training loop's final symbol sequences on the training
    words — the classical BPE round-trip invariant."""
    rules, seqs = B.learn_bpe(hist_df, 15)
    want = {r["word"]: list(r["syms"]) for r in seqs.collect()}

    words = hist_df.select(F.col("word").alias("text"))
    enc = B.bpe_encode(words, "text", rules)
    got = {r["text"]: list(r["bpe_tokens"]) for r in enc.collect()}
    assert got == want


def test_encode_is_narrow_map(spark, sf_dir):
    from sample_deepbook_margin_dune_dbt_spark.plans import explain_str

    docs = load(spark, sf_dir, "documents")
    rules, _ = B.learn_bpe(B.word_histogram(docs).limit(50), 3)
    plan = explain_str(B.bpe_encode(docs, "text", rules), "simple")
    assert "Exchange" not in plan, "encode must not shuffle"
