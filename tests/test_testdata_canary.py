"""Canary over the driver-generated testdata contract.

The driver regenerates ``/root/testdata`` between rounds and has already
changed a physical type once (``events.ts``: TIMESTAMP(NANOS) →
``timestamp[us]``), which surfaced as nine opaque driver errors. This
module fails FAST and READABLY when the next drift happens: every table
must load, carry the columns the query inventory depends on, and the
column families the engine normalizes must stay normalizable.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import ArrayType, NumericType, StringType, TimestampType

from sample_deepbook_margin_dune_dbt_spark.queries.common import load

# columns the query inventory references — presence, not exact dtype
REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"},
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source"},
    "embeddings": {"vec_id", "embedding"},
}


@pytest.mark.parametrize("table", sorted(REQUIRED_COLUMNS))
def test_table_loads_with_required_columns(spark, sf_dir, table):
    df = load(spark, sf_dir, table)
    missing = REQUIRED_COLUMNS[table] - set(df.columns)
    assert not missing, (
        f"driver testdata drift: {table}.parquet lost column(s) {missing} — "
        "update the query inventory or the canary"
    )
    assert df.limit(1).count() == 1, f"{table} is empty at {sf_dir}"


def test_normalized_column_families(spark, sf_dir):
    """The dtype families the engine's normalization layer depends on."""
    ev = load(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        "events.ts did not normalize to TimestampType — a new physical "
        "encoding appeared; extend queries.common.normalize_event_ts"
    )
    assert isinstance(ev.schema["value"].dataType, NumericType)
    docs = load(spark, sf_dir, "documents")
    assert isinstance(docs.schema["text"].dataType, StringType)
    emb = load(spark, sf_dir, "embeddings")
    edt = emb.schema["embedding"].dataType
    assert isinstance(edt, ArrayType) and isinstance(
        edt.elementType, NumericType
    ), f"embeddings.embedding drifted to {edt}"


def test_all_scale_factors_share_the_events_encoding(spark):
    """If the driver ever regenerates SFs inconsistently, queries would
    pass at the pytest SF and die at the driver SF — catch it here."""
    kinds = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if os.path.isdir(d):
            kinds[sf] = type(
                load(spark, d, "events").schema["ts"].dataType
            ).__name__
    assert len(set(kinds.values())) == 1, f"mixed events.ts encodings: {kinds}"


def test_funnel_step_types_present(spark, sf_dir):
    """events_funnel's oracle integer-divides by the step-1 user count; a
    regenerated events table missing the funnel step types would error
    opaquely at the driver — fail here with a readable message instead."""
    from sample_deepbook_margin_dune_dbt_spark.queries.eventseq import FUNNEL_STEPS

    ev = load(spark, sf_dir, "events")
    present = {
        r["event_type"]
        for r in ev.select("event_type").distinct().collect()
    }
    missing = set(FUNNEL_STEPS) - present
    assert not missing, (
        f"events.event_type lost funnel steps {sorted(missing)} — update "
        "FUNNEL_STEPS in queries/eventseq.py to match the new testdata"
    )
