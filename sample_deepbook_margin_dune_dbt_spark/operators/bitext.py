"""Margin-based parallel-pair (bitext) mining over embeddings.

The training-data shape: two monolingual corpora embedded in a shared
space (LASER/LaBSE-style), mine the sentence/document pairs that are
mutual translations — the data source behind most machine-translation
and multilingual-LLM corpora (CCMatrix, NLLB). Raw cosine is a poor
mining score (hubness: some vectors are near everything), so the
standard fix is the RATIO MARGIN of Artetxe & Schwenk 2019 ("Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings"):

    margin(a, b) = cos(a, b) / ( (avgk_fwd(a) + avgk_bwd(b)) / 2 )

— the candidate's cosine relative to the mean of each side's k-nearest
cosines. A hub's high cosines are discounted by its high neighborhood
mean; an isolated true pair stands out.

Exact-integer discipline (the house rule for cross-engine hashes): all
scoring is on ``cos_e6 = floor(cosine · 1e6)`` with integer ``div``
averages, so a DuckDB oracle reproduces every margin bit-for-bit. Only
non-negative cosines enter the margin (``div`` truncates toward zero in
Spark but floors in DuckDB on negatives; translation candidates are
high-cosine by nature, so the guard costs nothing semantically).

Scale shape: the exact tier scores side B against the closure-shipped
side-A anchor matrix in one Arrow pass (``_anchor_cosines_vectorized`` —
the ``emb_hard_negatives`` contract: the anchor side is bounded; at
100 TB the forward/backward top-k swap to the IVF/LSH candidate
generators with this module's margin tail unchanged). Top-k selection is
the salted two-level bounded aggregation — never a corpus-wide window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _anchor_cosines_vectorized, _bounded_topk

E6 = 1_000_000


def _topk_e6(scored: DataFrame, k: int) -> DataFrame:
    """Per-query bounded top-k of the scored pairs with the e6 floor
    applied AFTER selection (selection by the full double, the same
    order the oracle's row_number uses)."""
    return _bounded_topk(scored, k).select(
        "query_id",
        "neighbor_id",
        F.floor(F.col("cosine") * E6).cast("long").alias("cos_e6"),
        "rank",
    )


def mine_parallel_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    side_col: str,
    k: int = 4,
    margin_threshold_e6: int = 1_000_000,
) -> DataFrame:
    """Mined pairs (one per side-A vector with any non-negative-cosine
    forward neighbor): A's best-margin B-match, with the margin score
    and a ``mutual`` flag (B's best-margin A-match is this A — the
    high-precision subset a mining run actually keeps).

    ``side_col``: boolean column — True rows are side A (the anchor
    side; bounded by contract), False rows side B.

    Output: (id_a, id_b, cos_e6, margin_e6, mutual), filtered to
    ``margin_e6 ≥ margin_threshold_e6``, where

        margin_e6 = (cos_e6 · 2·1e6) div (avgk_fwd_e6 + avgk_bwd_e6)
        avgk_*_e6 = (Σ top-k cos_e6) div k_actual

    (k_actual = the neighbors that exist — never padded, so thin sides
    stay exact). Deterministic: top-k ties break on neighbor id; the
    best-match pick breaks margin ties on lower id_b.
    """
    a_side = df.filter(F.col(side_col)).select(id_col, vec_col)
    b_side = df.filter(~F.col(side_col)).select(id_col, vec_col)
    anchors = a_side.collect()
    if not anchors:
        raise ValueError("mine_parallel_pairs: side A is empty")

    # one Arrow pass: every B vector scored against the A anchor matrix
    # (query_id = the A anchor, neighbor_id = the B vector). The forward
    # AND backward top-k both read it, so the Arrow pass executes TWICE —
    # deliberately: the scored matrix is |A|·|B| rows (QUADRATIC), and
    # materializing it (localCheckpoint) costs more than recomputing the
    # linear scoring pass (measured r12 at sf0.1: 7.1 s staged vs 5.9 s
    # recomputed) — "never persist/exchange the quadratic intermediate",
    # the read twin of the candidate×payload lesson. Non-negative
    # cosines only, in BOTH engines: keeps every downstream integer
    # `div` on non-negative operands (Spark truncates toward zero,
    # DuckDB floors — they agree only there), and translation candidates
    # are high-cosine by nature.
    scored = _anchor_cosines_vectorized(b_side, id_col, vec_col, anchors).filter(
        F.col("cosine") >= 0
    )

    # forward: per A, top-k B neighbors
    fwd = _topk_e6(scored, k)
    avg_fwd = fwd.groupBy(F.col("query_id").alias("id_a")).agg(
        F.expr("sum(cos_e6) div count(1)").cast("long").alias("avg_fwd_e6")
    )
    # backward: per B, top-k A neighbors — the SAME scored matrix with
    # the roles swapped (cos is symmetric), so no second scoring pass
    bwd = _topk_e6(
        scored.select(
            F.col("neighbor_id").alias("query_id"),
            F.col("query_id").alias("neighbor_id"),
            "cosine",
        ),
        k,
    )
    avg_bwd = bwd.groupBy(F.col("query_id").alias("id_b")).agg(
        F.expr("sum(cos_e6) div count(1)").cast("long").alias("avg_bwd_e6")
    )

    def _margined(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(avg_fwd, "id_a")
            .join(avg_bwd, "id_b")
            .filter(
                (F.col("cos_e6") >= 0)
                & (F.col("avg_fwd_e6") + F.col("avg_bwd_e6") > 0)
            )
            .withColumn(
                "margin_e6",
                F.expr(
                    "(cos_e6 * 2000000L) div (avg_fwd_e6 + avg_bwd_e6)"
                ).cast("long"),
            )
        )

    fwd_m = _margined(
        fwd.select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cos_e6",
        )
    )
    # best B per A: max margin, ties → lower id_b (k-bounded groups)
    pick = F.struct(
        (-F.col("margin_e6")).alias("_nm"),
        F.col("id_b").alias("id_b"),
        F.col("cos_e6").alias("cos_e6"),
        F.col("margin_e6").alias("margin_e6"),
    )
    best_fwd = (
        fwd_m.groupBy("id_a")
        .agg(F.min(pick).alias("_p"))
        .select(
            "id_a",
            F.col("_p.id_b").alias("id_b"),
            F.col("_p.cos_e6").alias("cos_e6"),
            F.col("_p.margin_e6").alias("margin_e6"),
        )
    )
    # B's best A (same margin formula over the backward top-k pairs)
    bwd_m = _margined(
        bwd.select(
            F.col("query_id").alias("id_b"),
            F.col("neighbor_id").alias("id_a"),
            "cos_e6",
        )
    )
    pick_b = F.struct(
        (-F.col("margin_e6")).alias("_nm"),
        F.col("id_a").alias("id_a"),
    )
    best_bwd = (
        bwd_m.groupBy("id_b")
        .agg(F.min(pick_b).alias("_p"))
        .select("id_b", F.col("_p.id_a").alias("best_a"))
    )
    return (
        best_fwd.join(best_bwd, "id_b", "left")
        .withColumn(
            "mutual", F.coalesce(F.col("best_a") == F.col("id_a"), F.lit(False))
        )
        .filter(F.col("margin_e6") >= margin_threshold_e6)
        .select("id_a", "id_b", "cos_e6", "margin_e6", "mutual")
    )
