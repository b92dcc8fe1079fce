"""dbt catalog.json + exposures (r6): materialized-state catalog,
exposure registry, manifest section, and the exposure: selector."""

from __future__ import annotations

import json

import pytest

from sample_deepbook_margin_dune_dbt_spark.engine import (
    Runner,
    TableStore,
    exposure,
    model,
)
from sample_deepbook_margin_dune_dbt_spark.engine.model import _EXPOSURES, _REGISTRY


@pytest.fixture
def project(spark, tmp_path):
    @model("cx_a", materialized="table")
    def cx_a(ctx):
        return ctx.spark.createDataFrame([(1, "x"), (2, None)], "id long, v string")

    @model("cx_b", materialized="table", deps=["cx_a"])
    def cx_b(ctx):
        return ctx.ref("cx_a")

    store = TableStore(spark, str(tmp_path / "wh"))
    runner = Runner(spark, store, {})
    yield runner, store
    for n in ("cx_a", "cx_b"):
        _REGISTRY.pop(n, None)
    _EXPOSURES.pop("cx_dash", None)


def test_catalog_reflects_materialized_state(project):
    runner, store = project
    cat = runner.catalog(["cx_a", "cx_b"])
    assert cat["tables"] == {"cx_a": {"exists": False}, "cx_b": {"exists": False}}

    runner.run("+cx_b")
    cat = runner.catalog(["cx_a", "cx_b"])
    a = cat["tables"]["cx_a"]
    assert a["exists"] and a["row_count"] == 2
    assert {c["name"]: c["type"] for c in a["columns"]} == {
        "id": "bigint", "v": "string",
    }
    path = runner.write_catalog(["cx_a"])
    assert json.load(open(path))["tables"]["cx_a"]["row_count"] == 2


def test_exposure_registry_manifest_and_selector(project):
    runner, store = project
    exposure(
        "cx_dash", depends_on=["cx_b"], type="dashboard",
        owner="data-team", url="https://example.invalid/dash",
    )
    m = runner.manifest()
    assert m["exposures"]["cx_dash"]["depends_on"] == ["cx_b"]
    # selecting the exposure builds its upstream closure
    assert runner._closure("exposure:cx_dash") == ["cx_a", "cx_b"]
    assert runner._closure("+exposure:cx_dash") == ["cx_a", "cx_b"]
    # scoped manifest omits exposures whose deps fall outside the view
    assert runner.manifest("cx_a")["exposures"] == {}
    # unknown exposure: strict select fails actionably, exclude is a no-op
    with pytest.raises(KeyError, match="unknown exposure"):
        runner._closure("exposure:nope")
    assert runner._closure("cx_a", exclude="exposure:nope") == ["cx_a"]


def test_exposure_validation(project):
    with pytest.raises(ValueError, match="non-empty"):
        exposure("e1", depends_on=[])
    with pytest.raises(ValueError, match="unregistered model"):
        exposure("e2", depends_on=["no_such_model"])
    with pytest.raises(ValueError, match="type="):
        exposure("e3", depends_on=["cx_a"], type="bogus")
    assert not {"e1", "e2", "e3"} & set(_EXPOSURES)
