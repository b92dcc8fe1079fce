"""Bitext / parallel-pair mining queries (r12 — new capability family).

House protocol: new families enter ``EXTRA_QUERIES`` with two-SF oracle
parity and rotate into the driver window the following round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bitext as BX
from .common import load

MINE_K = 4
MINE_MARGIN_E6 = 1_000_000  # margin ≥ 1.0: above the neighborhood mean


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk ratio
    margin) across the two pseudo-languages defined by embedding label
    parity: per even-label vector, its best-margin odd-label match with
    the exact-integer margin score and the mutual-best flag —
    ``operators/bitext.py::mine_parallel_pairs``."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "_side", F.col("label") % 2 == 0
    )
    return BX.mine_parallel_pairs(
        emb, "vec_id", "embedding", "_side",
        k=MINE_K, margin_threshold_e6=MINE_MARGIN_E6,
    ).orderBy("id_a")


def q_bitext_mine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB bitext tier (r13, VERDICT r12 item 1b): the SAME
    mining query through the shared-quantizer IVF candidate generator —
    both sides stay distributed, A×B cosines are computed bucket-locally,
    and the margin tail is unchanged, so at the operating point
    (``n_probes=16`` on these noise-like fixtures — production
    translation pairs are high-cosine and need far fewer probes) the
    output is bit-identical to the exact tier and shares its oracle.
    ``operators/bitext.py::mine_parallel_pairs(strategy='ivf')``."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "_side", F.col("label") % 2 == 0
    )
    return BX.mine_parallel_pairs(
        emb, "vec_id", "embedding", "_side",
        k=MINE_K, margin_threshold_e6=MINE_MARGIN_E6,
        strategy="ivf", n_probes=16,
    ).orderBy("id_a")


SQL_BITEXT_MINE = f"""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
sa AS (SELECT vec_id, v FROM base WHERE label % 2 = 0),
sb AS (SELECT vec_id, v FROM base WHERE label % 2 = 1),
scored AS (
    SELECT sa.vec_id AS id_a, sb.vec_id AS id_b,
           list_cosine_similarity(sa.v, sb.v) AS cos,
           CAST(floor(list_cosine_similarity(sa.v, sb.v) * 1000000) AS BIGINT)
               AS cos_e6
    FROM sa, sb
    WHERE list_cosine_similarity(sa.v, sb.v) >= 0
),
fwd_k AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY id_a ORDER BY cos DESC, id_b ASC
        ) AS rn FROM scored
    ) WHERE rn <= {MINE_K}
),
avg_fwd AS (
    SELECT id_a, CAST(sum(cos_e6) // count(*) AS BIGINT) AS avg_fwd_e6
    FROM fwd_k GROUP BY id_a
),
bwd_k AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY id_b ORDER BY cos DESC, id_a ASC
        ) AS rn FROM scored
    ) WHERE rn <= {MINE_K}
),
avg_bwd AS (
    SELECT id_b, CAST(sum(cos_e6) // count(*) AS BIGINT) AS avg_bwd_e6
    FROM bwd_k GROUP BY id_b
),
fwd_m AS (
    SELECT f.id_a, f.id_b, f.cos_e6,
           CAST((f.cos_e6 * 2000000) // (af.avg_fwd_e6 + ab.avg_bwd_e6)
                AS BIGINT) AS margin_e6
    FROM fwd_k f
    JOIN avg_fwd af USING (id_a) JOIN avg_bwd ab USING (id_b)
    WHERE af.avg_fwd_e6 + ab.avg_bwd_e6 > 0
),
best_fwd AS (
    SELECT * FROM (
        SELECT id_a, id_b, cos_e6, margin_e6, row_number() OVER (
            PARTITION BY id_a ORDER BY margin_e6 DESC, id_b ASC
        ) AS rn FROM fwd_m
    ) WHERE rn = 1
),
bwd_m AS (
    SELECT b2.id_b, b2.id_a,
           CAST((b2.cos_e6 * 2000000) // (af.avg_fwd_e6 + ab.avg_bwd_e6)
                AS BIGINT) AS margin_e6
    FROM bwd_k b2
    JOIN avg_fwd af USING (id_a) JOIN avg_bwd ab USING (id_b)
    WHERE af.avg_fwd_e6 + ab.avg_bwd_e6 > 0
),
best_bwd AS (
    SELECT id_b, id_a AS best_a FROM (
        SELECT id_b, id_a, row_number() OVER (
            PARTITION BY id_b ORDER BY margin_e6 DESC, id_a ASC
        ) AS rn FROM bwd_m
    ) WHERE rn = 1
)
SELECT f.id_a, f.id_b, f.cos_e6, f.margin_e6,
       coalesce(bb.best_a = f.id_a, FALSE) AS mutual
FROM best_fwd f LEFT JOIN best_bwd bb USING (id_b)
WHERE f.margin_e6 >= {MINE_MARGIN_E6}
ORDER BY id_a
"""


BITEXT_QUERIES = {
    "emb_bitext_mine": (q_bitext_mine, SQL_BITEXT_MINE),
    # the generator-fed tier is pinned bit-identical to the exact tier
    # at its operating point, so it shares the exact tier's oracle
    "emb_bitext_mine_ivf": (q_bitext_mine_ivf, SQL_BITEXT_MINE),
}
