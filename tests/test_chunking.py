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


# ---------------------------------------------------------------------------
# best-fit-decreasing remainder packing (operators.chunking.pack_bestfit)


def _reference_bestfit(pieces: list[tuple[int, int]], cap: int) -> dict[int, int]:
    """Pure-Python best-fit-decreasing: (id, rem) sorted rem desc / id asc;
    place into the fitting open bin of max fill (tie → highest bin idx),
    else open a new bin. Independent linear-scan implementation of the
    operator's bisect rule."""
    assign: dict[int, int] = {}
    fills: list[int] = []
    for doc_id, r in sorted(pieces, key=lambda p: (-p[1], p[0])):
        best = -1
        for b, f in enumerate(fills):
            if f + r <= cap and (best < 0 or (f, b) > (fills[best], best)):
                best = b
        if best < 0:
            fills.append(r)
            assign[doc_id] = len(fills) - 1
        else:
            fills[best] += r
            assign[doc_id] = best
    return assign


def test_pack_bestfit_matches_python_reference(spark):
    """With a single partition the operator must reproduce the pure-Python
    best-fit-decreasing assignment bin-for-bin."""
    from sample_deepbook_margin_dune_dbt_spark.operators.chunking import pack_bestfit

    lengths = [(i, 17 + (i * 37) % 90) for i in range(60)]  # rem in [1, 107)
    cap = 100
    df = spark.createDataFrame(lengths, "doc_id long, t long")
    got = {
        r["doc_id"]: (r["bin_idx"], r["rem_tokens"], r["bin_fill"])
        for r in pack_bestfit(df, "doc_id", "t", cap, n_partitions=1).collect()
    }
    ref = _reference_bestfit([(i, t % cap) for i, t in lengths if t % cap], cap)
    assert {d: b for d, (b, _, _) in got.items()} == ref
    # bin_fill is the true final fill of each bin
    fills: dict[int, int] = {}
    for _, (b, r, _) in got.items():
        fills[b] = fills.get(b, 0) + r
    assert all(f == fills[b] for _, (b, _, f) in got.items())
    assert all(f <= cap for f in fills.values())


def test_pack_bestfit_deterministic_and_partition_invariant(spark):
    """The hash-group assignment makes the packing a pure function of
    (rows, seq_len, n_partitions, salt): reshuffling the INPUT layout must
    not change a single output row."""
    from sample_deepbook_margin_dune_dbt_spark.operators.chunking import pack_bestfit

    rows = [(i, 1 + (i * 131) % 97) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, t long")
    a = sorted(
        map(tuple, pack_bestfit(df, "doc_id", "t", 64, n_partitions=8).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_bestfit(
                df.repartition(13, "t"), "doc_id", "t", 64, n_partitions=8
            ).collect(),
        )
    )
    assert a == b and len(a) == sum(1 for _, t in rows if t % 64)


def test_pack_bestfit_invariants_and_waste(spark):
    """Per-group any-fit guarantees: every bin within capacity, at most one
    bin at ≤ half capacity per group (⇒ the global ⌊2·Σrem/L⌋ + P bound),
    bins ≥ the ⌈Σrem/L⌉ lower bound, and strictly less waste than the
    naive one-bin-per-remainder padded layout on a remainder-rich input."""
    from sample_deepbook_margin_dune_dbt_spark.operators.chunking import pack_bestfit

    cap, P = 128, 4
    rows = [(i, 1 + (i * 53) % 120) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, t long")
    out = pack_bestfit(df, "doc_id", "t", cap, n_partitions=P).collect()
    assert len(out) == sum(1 for _, t in rows if t % cap)
    per_bin: dict[tuple[int, int], int] = {}
    for r in out:
        assert 0 < r["rem_tokens"] < cap
        per_bin[(r["part_id"], r["bin_idx"])] = r["bin_fill"]
        assert r["bin_id"] == (r["part_id"] << 32) | r["bin_idx"]
    assert all(0 < f <= cap for f in per_bin.values())
    by_part: dict[int, list[int]] = {}
    for (p, _), f in per_bin.items():
        by_part.setdefault(p, []).append(f)
    for p, fills in by_part.items():
        assert sum(1 for f in fills if f <= cap // 2) <= 1, (p, sorted(fills))
    total_rem = sum(r["rem_tokens"] for r in out)
    n_bins = len(per_bin)
    assert -(-total_rem // cap) <= n_bins <= 2 * total_rem // cap + P
    assert n_bins * cap - total_rem < len(out) * cap - total_rem  # beats padded


def test_pack_bestfit_plan_no_single_partition(spark):
    """The packing shuffles on the hash group key only — no global sort,
    no SinglePartition stage; the sequential work is one Arrow-batched
    FlatMapGroupsInPandas per group."""
    from sample_deepbook_margin_dune_dbt_spark.operators.chunking import pack_bestfit
    from sample_deepbook_margin_dune_dbt_spark.plans import explain_str

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 90 + 1).alias("t")
    )
    plan = explain_str(pack_bestfit(df, "doc_id", "t", 64, n_partitions=8), "formatted")
    assert "SinglePartition" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(part_id" in plan
