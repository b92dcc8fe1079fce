"""Threaded DAG execution, ad-hoc SQL layer, and skew-salting tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark.operators import skew
import sample_deepbook_margin_dune_dbt_spark.models_deepbook as mdl  # noqa: F401
from tests.fixtures import write_fixtures

FIXED_NOW = dt.datetime(2026, 2, 1)


def test_threaded_run_equals_serial(spark, tmp_path, no_aqe):
    sources = write_fixtures(str(tmp_path / "src"))
    serial = TableStore(spark, str(tmp_path / "wh_serial"))
    Runner(spark, serial, sources, fixed_now=FIXED_NOW).run(mdl.ALL_MODELS)
    threaded = TableStore(spark, str(tmp_path / "wh_threaded"))
    built = Runner(spark, threaded, sources, fixed_now=FIXED_NOW).run(mdl.ALL_MODELS, threads=4)
    assert set(built) == set(mdl.ALL_MODELS)
    for name in mdl.ALL_MODELS:
        a = serial.read(name).drop("updated_at")
        b = threaded.read(name).drop("updated_at")
        assert a.count() == b.count(), name
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name


def test_threaded_respects_dependencies(spark, tmp_path):
    """The fact model must see fully-built upstreams even under threads."""
    sources = write_fixtures(str(tmp_path / "src"))
    store = TableStore(spark, str(tmp_path / "wh"))
    built = Runner(spark, store, sources, fixed_now=FIXED_NOW).run(
        "+fct_deepbook_margin_pool_daily", threads=4
    )
    assert built.index("fct_deepbook_margin_pool_daily") == len(built) - 1
    assert store.read("fct_deepbook_margin_pool_daily").count() > 0


def test_warehouse_sql(spark, tmp_path):
    sources = write_fixtures(str(tmp_path / "src"))
    store = TableStore(spark, str(tmp_path / "wh"))
    Runner(spark, store, sources, fixed_now=FIXED_NOW).run(mdl.ALL_MODELS)
    out = store.sql(
        "SELECT coin_symbol, count(*) AS n FROM fct_deepbook_margin_pool_daily GROUP BY 1"
    ).collect()
    assert {r["coin_symbol"] for r in out} >= {"USDC", "SUI"}
    assert set(store.tables()) == set(mdl.ALL_MODELS)


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)] + [(0, 5.0)] * 500,  # key 0 is hot
        "k int, v double",
    )
    plain = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["total"], r["n"])
        for r in skew.salted_agg(
            df,
            ["k"],
            {"total": (F.sum, F.sum, "v"), "n": (F.count, F.sum, "v")},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(i % 5, i) for i in range(2000)] + [(0, -1)] * 300, "k int, payload long"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k int, name string")
    plain = big.join(small, "k").groupBy("name").count().collect()
    salted = skew.salted_join_left(big, small, "k", n_salts=4).groupBy("name").count().collect()
    assert {(r["name"], r["count"]) for r in plain} == {(r["name"], r["count"]) for r in salted}


def test_threaded_run_propagates_failure(spark, tmp_path):
    """A failing model raises out of the threaded runner (no silent loss)."""
    import pytest
    from sample_deepbook_margin_dune_dbt_spark.engine.model import _REGISTRY, model

    @model("exploding_model", materialized="table")
    def exploding_model(ctx):
        raise RuntimeError("boom")

    try:
        store = TableStore(spark, str(tmp_path))
        with pytest.raises(RuntimeError, match="boom"):
            Runner(spark, store, {}).run("exploding_model", threads=4)
    finally:
        _REGISTRY.pop("exploding_model", None)
