"""Driver query + DuckDB oracle for token-window chunking."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.chunking import chunk_documents
from .common import load

_CHUNK, _OVERLAP = 32, 8


def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document sliced into 32-token windows overlapping by 8."""
    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", _CHUNK, _OVERLAP)


# DuckDB twin: same tokenization (split on single space after trim), same
# start offsets (0, stride, … while start ≤ n - overlap - 1), 1-based list
# slice w[s+1 : s+chunk] (inclusive bounds, clamped like Spark's slice)
_SQL_CHUNKS = f"""
WITH toks AS (
    SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
)
SELECT doc_id,
       CAST(g.i AS INT) AS chunk_index,
       array_to_string(w[s + 1 : s + {_CHUNK}], ' ') AS chunk_text,
       CAST(len(w[s + 1 : s + {_CHUNK}]) AS INT) AS chunk_n_tokens
FROM toks, LATERAL (
    SELECT unnest(generate_series(0,
               greatest(len(w) - {_OVERLAP} - 1, 0) // {_CHUNK - _OVERLAP}))
           AS i
) g,
LATERAL (SELECT g.i * {_CHUNK - _OVERLAP} AS s) st
"""

CHUNKING_QUERIES = {
    "chunk_token_windows": (q_chunk_windows, _SQL_CHUNKS),
}
