"""Domain-mixture planning contracts (``operators/mixture.py``).

Oracle parity for the three mixture queries runs in
``test_oracle_parity.py``; these pin the semantics parity can't see:
budget math, the keep-whole cap, greedy overshoot bounds, weight-0
exclusion, and determinism under repartitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.operators import mixture as MX
from sample_deepbook_margin_dune_dbt_spark.queries.common import load

WEIGHTS = {"en": 0.5, "de": 0.25, "zh": 0.125, "fr": 0.125}
BUDGET = 10_000


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def plan(docs):
    return MX.mixture_plan(docs, "lang", "n_chars", WEIGHTS, BUDGET)


def test_plan_targets_and_rates(plan):
    rows = {r["domain"]: r for r in plan.collect()}
    # every domain present in the corpus gets a plan row
    assert set(rows) >= set(WEIGHTS)
    for d, w in WEIGHTS.items():
        r = rows[d]
        assert r["target_tokens"] == int(BUDGET * w)
        assert 0.0 <= r["sample_rate"] <= 1.0
        if r["domain_tokens"] <= r["target_tokens"]:
            assert r["sample_rate"] == 1.0
    # weight-0 domains plan to zero
    for d, r in rows.items():
        if d not in WEIGHTS:
            assert r["target_tokens"] == 0 and r["sample_rate"] == 0.0


def test_plan_normalizes_weights(docs):
    # scaled weights produce the identical plan
    scaled = {k: v * 8 for k, v in WEIGHTS.items()}
    a = MX.mixture_plan(docs, "lang", "n_chars", WEIGHTS, BUDGET).collect()
    b = MX.mixture_plan(docs, "lang", "n_chars", scaled, BUDGET).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bernoulli_sample_excludes_zero_weight_and_hits_budget(docs, plan):
    kept = MX.mixture_sample(docs, plan, "lang", "doc_id", salt="t")
    by_dom = {
        r["lang"]: r["tok"]
        for r in kept.groupBy("lang").agg(F.sum("n_chars").alias("tok")).collect()
    }
    assert set(by_dom) <= set(WEIGHTS)
    targets = {r["domain"]: r for r in plan.collect()}
    for d, tok in by_dom.items():
        t = targets[d]
        if t["sample_rate"] == 1.0:
            assert tok == t["domain_tokens"]  # kept whole
        else:
            # Bernoulli: within 4 sigma of target (sigma ~ max_doc * sqrt(n))
            assert tok == pytest.approx(t["target_tokens"], rel=0.6)


def test_greedy_select_budget_and_overshoot(docs, plan):
    sel = MX.token_budget_select(docs, plan, "lang", "n_chars", "doc_id", salt="t")
    targets = {r["domain"]: r for r in plan.collect()}
    agg = {
        r["lang"]: (r["tok"], r["mx"], r["n"])
        for r in sel.groupBy("lang")
        .agg(
            F.sum("n_chars").alias("tok"),
            F.max("n_chars").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(agg) <= set(WEIGHTS)
    for d, (tok, mx, _) in agg.items():
        t = targets[d]
        if t["domain_tokens"] >= t["target_tokens"]:
            # budget met, overshoot < the last (largest possible) document
            assert tok >= t["target_tokens"]
            assert tok - t["target_tokens"] < mx
        else:
            assert tok == t["domain_tokens"]
    # cum_tokens audits the running sum: max(cum) == sum per domain
    cum = {
        r["lang"]: r["c"]
        for r in sel.groupBy("lang").agg(F.max("cum_tokens").alias("c")).collect()
    }
    assert cum == {d: tok for d, (tok, _, _) in agg.items()}


def test_select_deterministic_under_repartition(docs, plan):
    a = MX.token_budget_select(docs, plan, "lang", "n_chars", "doc_id")
    b = MX.token_budget_select(
        docs.repartition(13, "doc_id"), plan, "lang", "n_chars", "doc_id"
    )
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in b.select("doc_id").collect()
    )


def test_plan_validates_inputs(docs):
    with pytest.raises(ValueError):
        MX.mixture_plan(docs, "lang", "n_chars", {"en": 0.0}, 100)
    with pytest.raises(ValueError):
        MX.mixture_plan(docs, "lang", "n_chars", WEIGHTS, -1)
