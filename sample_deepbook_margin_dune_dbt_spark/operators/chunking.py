"""Token-window document chunking for training pipelines.

LLM pretraining/fine-tuning consumes fixed-size token windows, not whole
documents: every corpus pipeline ends with a chunking pass that slices
each document into ``chunk_tokens``-sized windows overlapping by
``overlap`` tokens (the overlap preserves cross-boundary context for
retrieval and next-token training).

Spark-first shape: tokenize once (``split``), generate the window start
offsets as an array (``sequence`` with the stride as step), then ONE
``posexplode`` — all pure Catalyst expressions, fan-out exactly
``ceil((n_tokens - overlap) / stride)`` per document. No Python, no
shuffle: chunking is a narrow map and composes with partition pruning.
Memory per row is bounded by the document length (the token array), the
same bound the dedup shingle pipeline already carries.

Determinism/oracle: whitespace tokenization + arithmetic only, so DuckDB
reproduces chunks byte-for-byte (``queries/chunkingq.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Slice each document into overlapping ``chunk_tokens`` windows.

    Output: one row per (document, window) with ``chunk_index`` (0-based),
    ``chunk_text`` (space-rejoined tokens) and ``chunk_n_tokens``. Windows
    start every ``chunk_tokens - overlap`` tokens; the final window may be
    short; documents shorter than one window yield exactly one chunk.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap

    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(toks)
    # window starts: 0, stride, 2·stride, … while start + overlap < n —
    # equivalently while start ≤ n - overlap - 1 (≥ one window always)
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(overlap) - 1, F.lit(0)), F.lit(stride)
    )
    tokked = df.select(
        F.col(id_col), toks.alias("_toks"), F.posexplode(starts).alias("chunk_index", "_start")
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return tokked.select(
        id_col,
        "chunk_index",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("chunk_n_tokens"),
    )
