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


def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout envelope over events on (day-offset, user-bucket):
    the per-file min/max stats table a Morton-ordered table rewrite
    would produce (``operators/zorder.py``). Both dims' envelopes stay
    narrow in every bucket — the multi-dimensional pruning evidence.
    The min-date scalar enters as a broadcast row (watermark idiom);
    everything else is one narrow map + one grouped agg.
    """
    from pyspark.sql import functions as F

    from ..operators import zorder as Z
    from .common import event_ts

    ev = load(spark, sf_dir, "events").select(
        F.to_date(event_ts()).alias("d"), "user_id"
    )
    m = ev.agg(F.min("d").alias("d0"))
    pts = ev.join(F.broadcast(m)).select(
        F.datediff("d", "d0").cast("long").alias("dx"),
        (F.col("user_id") % 1024).alias("uy"),
    )
    return Z.zorder_bucket_stats(pts, "dx", "uy", bits=10, bucket_bits=4)


def _zorder_sql() -> str:
    from ..operators.zorder import sql_zvalue

    return f"""
WITH m AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
pts AS (
    SELECT CAST(CAST(ts AS DATE) - m.d0 AS BIGINT) AS dx,
           user_id % 1024 AS uy
    FROM events CROSS JOIN m
),
z AS (SELECT dx, uy, {sql_zvalue('dx', 'uy', 10)} AS zv FROM pts)
SELECT CAST(zv >> 16 AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(dx) AS BIGINT) AS min_x,
       CAST(max(dx) AS BIGINT) AS max_x,
       CAST(min(uy) AS BIGINT) AS min_y,
       CAST(max(uy) AS BIGINT) AS max_y
FROM z
GROUP BY 1
"""


ORDERING_QUERIES = {
    "corpus_epoch_shuffle": (q_epoch_shuffle, SQL_EPOCH_SHUFFLE),
    "corpus_zorder_stats": (q_zorder_stats, _zorder_sql()),
}
