"""Inter-document novelty scoring: what does each document ADD?

The reference repo's surface is SQL aggregation over exchange events
(reference ``models/deepbook_margin/daily/*.sql`` — Jinja-SQL rollups);
a training-data pipeline additionally wants an *information-contribution*
signal per document: what fraction of a document's content is FIRST SEEN
in that document, scanning the corpus in a deterministic order (doc_id —
in production, crawl timestamp). Low-novelty documents are rehashes of
earlier content even when no single earlier document is a near-duplicate
(the Jaccard/MinHash tiers in ``operators/dedup.py`` only catch pairwise
similarity; novelty is a set-cover-style corpus-cumulative signal, the
shape used for "new information" curation passes over web crawls).

Semantics: with S(d) the distinct word n-gram shingles of document d
(same shingle definition as every other shingle consumer —
``operators/dedup.py::shingles``), a shingle s is *novel in d* iff
``d = min{d' : s ∈ S(d')}``. Per document:

    novelty(d) = |{s ∈ S(d) : s novel in d}| / |S(d)|

The first document is fully novel by construction; an exact duplicate of
any earlier document scores 0.

Scale shape (100 TB corpus, 1000 executors):

- One pass computes per-doc shingle sets (Arrow-vectorized
  ``shingles_vectorized`` — the shared twin, ~1 µs/shingle) and explodes
  them; the only corpus-proportional shuffle is the hash exchange on the
  shingle key, where a WINDOW ``min(doc_id) over (partition by s)``
  computes each shingle's first owner without a second join shuffle —
  first-owner tagging and per-row comparison happen inside the same
  exchange.
- The per-doc rollup is a map-side-combined grouped count on doc_id —
  the second (and last) shuffle, carrying two int64s per (doc, shingle).
- Skew: a shingle shared by millions of documents lands in one window
  partition. The window computes only ``min`` (no ordering, no running
  frame), so the partition cost is a streaming min — linear, no buffer.
  For pathological head shingles (boilerplate), the upstream
  boilerplate-strip tier (``dedup.py::boilerplate_segments``) is the
  production pre-pass; AQE skew-split handles the residue.
- Everything is exact integer output (counts and a fixed-point 1e6
  ratio), so the result hash-compares against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles, shingles_vectorized


def shingle_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """Per-document first-occurrence novelty over word ``n``-gram shingles.

    Returns ``(id, n_shingles, n_novel, novelty_e6)`` — one row per input
    document; ``novelty_e6 = n_novel * 1e6 div n_shingles`` (fixed-point,
    exact in int64: n_novel ≤ n_shingles ≤ ~1e6 per doc).

    ``vectorized=True`` uses the Arrow shingle twin (production path);
    ``False`` keeps shingle construction in pure Catalyst expressions
    (the engine-portable oracle shape) — both produce identical arrays.
    """
    mk = shingles_vectorized if vectorized else shingles
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(mk(F.col(text_col), n)).alias("s"),
    )
    # first owner per shingle: a min-only window inside the single
    # shingle-key exchange (no join-back, no ordering buffer)
    first_owner = F.min("id").over(Window.partitionBy("s"))
    tagged = sh.select(
        "id", (F.col("id") == first_owner).cast("long").alias("is_novel")
    )
    return (
        tagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("is_novel").cast("long").alias("n_novel"),
        )
        .withColumn("novelty_e6", F.expr("n_novel * 1000000L div n_shingles"))
    )
