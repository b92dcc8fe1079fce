"""Driver query for the distributed epoch shuffle (``operators/ordering.py``).

The oracle states the SEMANTIC definition — a global ``row_number()``
over the md5 hash order — while the Spark side computes the same rank
via order-preserving hash buckets + per-bucket windows (no
single-partition stage). Hash-equality across engines is the same
md5-prefix idiom as ``operators/sampling.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import ordering as O
from .common import load


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-1 training order over documents (distributed global rank)."""
    docs = load(spark, sf_dir, "documents")
    out = O.epoch_shuffle(docs, "doc_id", epoch=1, n_buckets=64)
    return out.select("epoch_rank", "doc_id", "lang")


SQL_EPOCH_SHUFFLE = f"""
SELECT CAST(row_number() OVER (
           ORDER BY {O.sql_hash60('doc_id', 'epoch1:')} ASC, doc_id ASC
       ) AS BIGINT) AS epoch_rank,
       doc_id, lang
FROM documents
"""


ORDERING_QUERIES = {
    "corpus_epoch_shuffle": (q_epoch_shuffle, SQL_EPOCH_SHUFFLE),
}
