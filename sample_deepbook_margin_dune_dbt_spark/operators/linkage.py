"""Approximate string matching: edit-distance verification and blocked
record linkage.

The reference's dedup story is key-equality MERGE (reference
``models/deepbook_margin/daily/fct_deepbook_margin_pool_daily.sql``
merges on ``(pool_id, day)``); a corpus pipeline additionally needs
FUZZY matching — near-duplicate verification and entity/record linkage
where keys are noisy strings. Two operators:

- :func:`edit_distance_verify` — the verification tier: given candidate
  pairs from a cheap blocker (minhash-LSH bands, prefix blocks), compute
  the exact normalized Levenshtein distance and keep pairs under a
  threshold. Levenshtein is O(len²) per pair, so it must NEVER run
  all-pairs — the contract is candidates-in, verdicts-out.
- :func:`blocked_fuzzy_pairs` — classic record-linkage blocking: records
  sharing a deterministic block key are compared pairwise within the
  block; a block-size cap bounds the quadratic blowup exactly like the
  LSH bucket cap (``dedup.minhash_lsh_candidates``).

Scale shape: candidates are id pairs (16 bytes/row); the two text
lookups are equi-joins hinted ``shuffle_hash`` so the fat text side is
hash-built per partition and the candidate stream is never sorted (the
r9 cosine-refine SMJ-spill lesson, ``similarity.py::cosine_pairs_lsh``).
``F.levenshtein`` is JVM codegen — no Python in the loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_verify(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    candidates: DataFrame,
    max_dist_pct: int = 30,
    max_chars: Optional[int] = None,
) -> DataFrame:
    """Exact Levenshtein verification of candidate near-duplicate pairs.

    ``candidates`` carries ``(id_a, id_b)``; output keeps pairs whose
    edit distance is at most ``max_dist_pct``% of the longer text:
    ``dist * 100 <= max_dist_pct * max_len`` (pure int64 — cross-engine
    exact). Columns: ``(id_a, id_b, dist, max_len, dist_pct_e4)`` with
    ``dist_pct_e4 = dist * 1e6 div max_len`` (fixed-point percent).

    ``max_chars`` optionally truncates both sides before comparison —
    at lake scale edit distance over multi-MB documents is O(len²) per
    pair, and a production pipeline caps the window (the cap is part of
    the operator's semantics, applied identically in the oracle).
    """
    t = F.lower(F.trim(F.col(text_col)))
    if max_chars is not None:
        t = F.substring(t, 1, max_chars)
    texts = docs.select(F.col(id_col).alias("_lid"), t.alias("_ltxt"))

    joined = (
        candidates.select("id_a", "id_b")
        .join(
            texts.hint("shuffle_hash").withColumnRenamed("_lid", "id_a"),
            "id_a",
        )
        .withColumnRenamed("_ltxt", "_ta")
        .join(
            texts.hint("shuffle_hash").withColumnRenamed("_lid", "id_b"),
            "id_b",
        )
        .withColumnRenamed("_ltxt", "_tb")
    )
    out = (
        joined.withColumn("dist", F.levenshtein("_ta", "_tb").cast("long"))
        .withColumn(
            "max_len",
            F.greatest(F.length("_ta"), F.length("_tb")).cast("long"),
        )
        .filter(F.col("dist") * 100 <= F.lit(max_dist_pct) * F.col("max_len"))
        .withColumn(
            "dist_pct_e4",
            F.expr("(dist * 1000000L) div greatest(max_len, 1L)"),
        )
    )
    return out.select("id_a", "id_b", "dist", "max_len", "dist_pct_e4")


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_exprs: Sequence[str],
    max_dist: int = 2,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Record-linkage blocking + within-block Levenshtein matching.

    ``block_exprs`` are SQL expressions over ``df``'s columns forming the
    deterministic block key (e.g. last name token + first character —
    multi-key blocking). Records sharing the key are compared pairwise;
    pairs with ``levenshtein <= max_dist`` survive. Output:
    ``(id_a, id_b, name_a, name_b, block_key, dist)``.

    Blocks larger than ``max_block_size`` are dropped whole (b members
    → b·(b-1)/2 pairs; a degenerate block is the quadratic cliff) — the
    same bounded-loss contract as the LSH bucket cap, and like there the
    dropped mass is reportable by counting block sizes first.

    Scale: all joins are block-key equi-joins — AQE-splittable, no
    cartesian — and the O(len²) Levenshtein runs once per DISTINCT name
    pair within a block (exact duplicates collapse first), so heavy name
    duplication costs joins, not string compute.
    """
    key = F.concat_ws("", *[F.expr(e) for e in block_exprs])
    rows = df.select(
        F.col(id_col).alias("_bid"),
        F.col(name_col).alias("_bname"),
        key.alias("block_key"),
    )
    # the size table is one row per block key — vocabulary-sized, so NOT
    # force-broadcast: the equi-join lets AQE pick (it broadcasts small
    # actuals at runtime and splits skewed keys otherwise)
    sizes = rows.groupBy("block_key").agg(F.count(F.lit(1)).alias("_bsz"))
    bounded = rows.join(
        sizes.filter(F.col("_bsz") <= max_block_size).drop("_bsz"), "block_key"
    )

    # Exact-duplicate collapse BEFORE the fuzzy compare: Levenshtein runs
    # once per DISTINCT (block, name) pair, not per record pair — on real
    # name data (heavy-tailed frequency) this cuts the O(b²) string work
    # by the square of the dup factor (25M → 224 comparisons on the part
    # fixture). Matched name pairs then expand back to record pairs by
    # two cheap equi-joins; the expansion emits only MATCHED mass.
    names = bounded.groupBy("block_key", "_bname").agg(
        F.count(F.lit(1)).alias("_n")
    )
    na = names.select("block_key", F.col("_bname").alias("_na"))
    nb = names.select("block_key", F.col("_bname").alias("_nb"))
    name_pairs = (
        na.join(nb, "block_key")
        .filter(F.col("_na") <= F.col("_nb"))
        .withColumn("dist", F.levenshtein("_na", "_nb").cast("long"))
        .filter(F.col("dist") <= max_dist)
        # spread the matched name pairs before expansion: each pair fans
        # out to cnt_a·cnt_b record pairs, and with broadcast id lookups
        # the fan-out runs in the PROBE side's partitions — unspread, one
        # task would emit the whole expansion
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    ia = bounded.select(
        "block_key", F.col("_bid").alias("_ida"), F.col("_bname").alias("_na")
    )
    ib = bounded.select(
        "block_key", F.col("_bid").alias("_idb"), F.col("_bname").alias("_nb")
    )
    expanded = (
        name_pairs.join(ia, ["block_key", "_na"])
        .join(ib, ["block_key", "_nb"])
        # distinct-name pairs appear once per unordered {na, nb}; the
        # equal-name diagonal would double-count, so it keeps id order
        .filter((F.col("_na") < F.col("_nb")) | (F.col("_ida") < F.col("_idb")))
    )
    lt = F.col("_ida") < F.col("_idb")
    return expanded.select(
        F.least("_ida", "_idb").alias("id_a"),
        F.greatest("_ida", "_idb").alias("id_b"),
        F.when(lt, F.col("_na")).otherwise(F.col("_nb")).alias("name_a"),
        F.when(lt, F.col("_nb")).otherwise(F.col("_na")).alias("name_b"),
        "block_key",
        "dist",
    )
