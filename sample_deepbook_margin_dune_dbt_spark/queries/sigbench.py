"""High-dimension LSH-signature bench probes (verdict r1: show the cliff).

``hyperplane_signature`` (pure Catalyst expression) carries ``planes ×
dim`` literal weight nodes; at production embedding dims the expression
tree and its codegen dominate runtime. These probes tile the testdata's
dim-64 embeddings to dim 512 (``flatten(array_repeat(v, 8))`` — no new
data, deterministic) and compute a 16-plane signature both ways so
``bench.py`` can print the gap side by side. The two paths are proven
bit-identical at dim 64 by ``tests/test_operators.py``
(``test_hyperplane_signature_paths_agree``); ``tests/test_sigbench.py``
extends the bit-for-bit assertion to the tiled dim-512 input.

Rows-only (no oracle): the outputs reduce to one row per signature value;
their EQUALITY across the two paths is the correctness claim and is
pytest-asserted — a DuckDB re-implementation of 8192 sin() weights would
re-test determinism of libm, not the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from .common import load

DIM, TILE, PLANES = 64, 8, 16


def _tiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.flatten(F.array_repeat(F.col("embedding"), TILE)).alias("v512")
    )


def q_sig_expr_d512(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = S.hyperplane_signature(F.col("v512"), DIM * TILE, PLANES)
    return (
        _tiled(spark, sf_dir)
        .select(sig.alias("sig"))
        .groupBy("sig")
        .agg(F.count("*").alias("n"))
    )


def q_sig_vec_d512(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = S.hyperplane_signature_vectorized(F.col("v512"), DIM * TILE, PLANES)
    return (
        _tiled(spark, sf_dir)
        .select(sig.alias("sig"))
        .groupBy("sig")
        .agg(F.count("*").alias("n"))
    )


SIGBENCH_QUERIES = {
    "sig_expr_d512": (q_sig_expr_d512, None),
    "sig_vec_d512": (q_sig_vec_d512, None),
}
