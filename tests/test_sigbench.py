"""The dim-512 signature probes must agree bit-for-bit across paths."""

from __future__ import annotations

from sample_deepbook_margin_dune_dbt_spark.queries.sigbench import (
    q_sig_expr_d512,
    q_sig_vec_d512,
)


def test_expression_and_vectorized_signatures_agree_at_dim512(spark, sf_dir):
    expr = {r["sig"]: r["n"] for r in q_sig_expr_d512(spark, sf_dir).collect()}
    vec = {r["sig"]: r["n"] for r in q_sig_vec_d512(spark, sf_dir).collect()}
    assert expr == vec and len(expr) > 1
