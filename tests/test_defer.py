"""dbt --defer: a dev build of one model reads its unbuilt upstreams
from a fallback (prod) warehouse instead of rebuilding the world; a
locally-built upstream always wins over the deferred one."""

from __future__ import annotations

import pytest

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore, model
from sample_deepbook_margin_dune_dbt_spark.engine.model import _REGISTRY


@pytest.fixture
def two_envs(spark, tmp_path):
    @model("df_up", materialized="table")
    def df_up(ctx):
        return ctx.spark.createDataFrame([(1, "prod")], "id long, env string")

    @model("df_down", materialized="table", deps=["df_up"])
    def df_down(ctx):
        return ctx.ref("df_up")

    prod = TableStore(spark, str(tmp_path / "prod"))
    dev = TableStore(spark, str(tmp_path / "dev"))
    Runner(spark, prod, {}).run("+df_down")  # prod fully built
    yield prod, dev
    for n in ("df_up", "df_down"):
        _REGISTRY.pop(n, None)


def test_defer_reads_unbuilt_upstream_from_fallback(spark, two_envs):
    prod, dev = two_envs
    runner = Runner(spark, dev, {}, defer_store=prod)
    # select ONLY the downstream: its upstream is unbuilt in dev and
    # must come from prod
    runner.run("df_down")
    assert not dev.exists("df_up")
    assert [r["env"] for r in dev.read("df_down").collect()] == ["prod"]


def test_local_build_wins_over_deferred(spark, two_envs):
    prod, dev = two_envs

    # rebind the upstream builder so a dev build is distinguishable
    @model("df_up", materialized="table")
    def df_up(ctx):
        return ctx.spark.createDataFrame([(1, "dev")], "id long, env string")

    @model("df_down", materialized="table", deps=["df_up"])
    def df_down(ctx):
        return ctx.ref("df_up")

    runner = Runner(spark, dev, {}, defer_store=prod)
    runner.run("+df_down")  # builds df_up locally first
    assert [r["env"] for r in dev.read("df_down").collect()] == ["dev"]


def test_without_defer_unbuilt_ref_fails(spark, two_envs):
    prod, dev = two_envs
    with pytest.raises(Exception):
        Runner(spark, dev, {}).run("df_down")


def test_defer_cli_drive(spark, two_envs, tmp_path):
    from sample_deepbook_margin_dune_dbt_spark.__main__ import main

    prod, dev = two_envs
    rc = main(
        [
            "run",
            "--warehouse", str(tmp_path / "dev"),
            "--defer-warehouse", str(tmp_path / "prod"),
            "--select", "df_down",
        ]
    )
    assert rc == 0
    assert [r["env"] for r in dev.read("df_down").collect()] == ["prod"]
