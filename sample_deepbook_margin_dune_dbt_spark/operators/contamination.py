"""Benchmark decontamination: per-document n-gram overlap vs a held-out set.

The training-data hygiene step the big-model reports all describe
(GPT-3 appendix C, PaLM §6.2 style): a training document is
"contaminated" when too many of its word n-grams also occur in an
evaluation/benchmark corpus, and must be dropped (or flagged) before
training. Spark-first shape:

- the corpus side reuses ``dedup.shingles`` — distinct n-grams built
  inside codegen, exploded once, NO extra dedup shuffle (the array is
  already distinct per document);
- the benchmark side is collapsed to a distinct shingle set and
  broadcast — benchmark suites are tiny (thousands of documents)
  relative to a 100 TB corpus, so the membership probe is a map-side
  broadcast LEFT SEMI join: the corpus never shuffles on content;
- per-document totals/hits are map-side-combined counts keyed by the
  document id.

If a benchmark ever outgrew broadcast, the same plan degrades to a
shuffle equi-join on the shingle — the code path is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, shingles, shingles_vectorized


def ngram_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    vectorized: bool = True,
) -> DataFrame:
    """Per-document overlap with the benchmark's n-gram shingle set.

    Output: (id, n_shingles, n_hits, overlap, contaminated) — overlap is
    the raw fraction of the document's DISTINCT shingles found in the
    benchmark set, and ``contaminated`` applies ``threshold`` to the raw
    value. (Query layers needing cross-engine-stable output emit
    ``floor(overlap * 10^k)`` — see ``queries/curation.py`` on why
    ``round`` diverges between Spark and DuckDB.)
    """
    bench_col = bench_text_col or text_col
    _sh_fn = shingles_vectorized if vectorized else shingles
    # repartition before the CPU-heavy shingle explode: small corpora
    # arrive as one file → one task (same guard as the dedup pipeline)
    doc_sh = _spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(_sh_fn(F.col(text_col), n)).alias("_s")
    )
    bench_sh = F.broadcast(
        benchmark.select(F.explode(_sh_fn(F.col(bench_col), n)).alias("_s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass: broadcast LEFT join marks benchmark membership (bench set
    # is distinct → at most one match per shingle, cardinality preserved)
    # and a single map-side-combined groupBy counts totals and hits
    # together — the corpus shingles are exploded and scanned exactly once
    marked = doc_sh.join(bench_sh, "_s", "left")
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("_hit").alias("n_hits"),
    )
    overlap = F.col("n_hits") / F.col("n_shingles")
    return (
        agg.withColumn("overlap", overlap)
        .withColumn("contaminated", F.col("overlap") >= threshold)
        .select(id_col, "n_shingles", "n_hits", "overlap", "contaminated")
    )
