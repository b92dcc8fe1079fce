"""CLI odds and ends (r6): ls --select, clean, model descriptions in
the manifest."""

from __future__ import annotations

import pytest

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore, model
from sample_deepbook_margin_dune_dbt_spark.engine.model import _REGISTRY
from sample_deepbook_margin_dune_dbt_spark.__main__ import main


@pytest.fixture
def mini(spark):
    @model("mi_a", materialized="table", description="upstream seed of the mini DAG")
    def mi_a(ctx):
        return ctx.spark.createDataFrame([(1,)], "id long")

    @model("mi_b", materialized="table", deps=["mi_a"])
    def mi_b(ctx):
        return ctx.ref("mi_a")

    yield
    for n in ("mi_a", "mi_b"):
        _REGISTRY.pop(n, None)


def test_ls_select_filters(mini, capsys):
    assert main(["ls", "--select", "+mi_b"]) == 0
    out = capsys.readouterr().out
    assert "mi_a" in out and "mi_b" in out
    assert main(["ls", "--select", "+mi_b", "--exclude", "mi_a"]) == 0
    listed = [l.split()[0] for l in capsys.readouterr().out.splitlines() if l]
    assert "mi_b" in listed and "mi_a" not in listed


def test_clean_removes_artifacts(mini, spark, tmp_path):
    wh = str(tmp_path / "wh")
    store = TableStore(spark, wh)
    Runner(spark, store, {}).run("mi_a")
    art = store.path("_artifacts")
    import os

    assert os.path.isdir(art)
    assert main(["clean", "--warehouse", wh]) == 0
    assert not os.path.isdir(art)
    assert main(["clean", "--warehouse", wh]) == 0  # idempotent no-op


def test_description_reaches_manifest(mini, spark, tmp_path):
    runner = Runner(spark, TableStore(spark, str(tmp_path / "wh")), {})
    m = runner.manifest("+mi_b")["models"]
    assert m["mi_a"]["description"] == "upstream seed of the mini DAG"
    assert m["mi_b"]["description"] == ""
