"""Pin events.ts dtype handling against testdata drift.

The driver's ``events.parquet`` physical type has already changed once
(TIMESTAMP(NANOS) in rounds 1-2 → ``timestamp[us]`` in round 3), silently
breaking every query that did raw ``ts`` arithmetic. These tests write the
same rows in each physical encoding and assert that
``queries.common.load``'s normalization (``normalize_event_ts``) yields
identical values for ``event_ts()``/``event_ts_us()`` — so the next silent
testdata change fails here with a readable message, not as nine driver ERRs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from sample_deepbook_margin_dune_dbt_spark.queries.common import (
    event_ts,
    event_ts_us,
    load,
)

# Instants chosen to exercise date/hour bucketing and sub-second precision.
US_VALUES = [
    0,                        # epoch
    1_700_000_000_000_000,    # 2023-11-14 22:13:20
    1_700_000_123_456_789,    # sub-second µs precision
    1_760_000_000_999_999,    # just below a whole second
]


def _write(sf_dir: str, arr: pa.Array) -> str:
    n = len(arr)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": arr,
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.5] * n),
        }
    )
    pq.write_table(table, f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """The same events rows under each physical ts encoding the driver has
    shipped: int64 TIMESTAMP(NANOS) and plain timestamp[us] (NTZ)."""
    ns_dir = _write(
        str(tmp_path_factory.mktemp("ev_ns")),
        pa.array([v * 1000 for v in US_VALUES], pa.timestamp("ns")),
    )
    us_dir = _write(
        str(tmp_path_factory.mktemp("ev_us")),
        pa.array(US_VALUES, pa.timestamp("us")),
    )
    return {"ns": ns_dir, "us": us_dir}


def _collect(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            event_ts().alias("t"),
            event_ts_us().alias("t_us"),
            F.to_date(event_ts()).alias("d"),
            F.hour(event_ts()).alias("h"),
        )
        .orderBy("event_id")
        .collect()
    )
    return [(r["event_id"], r["t"], r["t_us"], r["d"], r["h"]) for r in rows]


def test_ts_normalized_identically_across_encodings(spark, encoded_dirs):
    got = {k: _collect(spark, d) for k, d in encoded_dirs.items()}
    assert got["ns"] == got["us"], (
        "event_ts()/event_ts_us() disagree between int64-ns and "
        "timestamp[us] encodings — queries.common.normalize_event_ts lost a "
        "branch, or the driver testdata changed physical type again"
    )
    # values are right in absolute terms, not just mutually consistent
    assert [r[2] for r in got["us"]] == US_VALUES


def test_normalized_ts_is_timestamp_type(spark, encoded_dirs):
    """TimestampType is the canonical form — it is what hash-matched the
    DuckDB oracle in rounds 1-2, so both branches must land on it."""
    for d in encoded_dirs.values():
        dt = load(spark, d, "events").schema["ts"].dataType
        assert isinstance(dt, TimestampType), dt


def test_driver_testdata_encoding_is_supported(spark, sf_dir):
    """Canary on the real driver testdata: load() must normalize whatever
    the current generation ships without raising."""
    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.select(event_ts_us()).first()[0] is not None


def test_ts_min_us_bound_is_pushed_to_scan(spark, encoded_dirs):
    """``load(..., ts_min_us=...)`` must put the bound on the RAW column so
    it reaches the parquet scan (PushedFilters) in BOTH physical
    encodings — the predicate below the normalization cast is what lets
    row-group min/max stats prune at 100 TB (VERDICT r4 item 5). Values
    must equal the post-normalization filter's."""
    floor = 1_700_000_000_000_000
    for enc, d in encoded_dirs.items():
        df = load(spark, d, "events", ts_min_us=floor)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan, plan
        pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "GreaterThanOrEqual(ts" in pushed, (enc, pushed)
        got = sorted(r[0] for r in df.select(event_ts_us()).collect())
        want = [v for v in US_VALUES if v >= floor]
        assert got == want, (enc, got)


def test_p4_watermark_plan_has_pushed_ts_bound(spark, sf_dir):
    """The driver-facing watermark query itself must push its ts floor to
    the scan on the real testdata encoding."""
    from sample_deepbook_margin_dune_dbt_spark.queries.parity import q_p4_watermark

    plan = (
        q_p4_watermark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(ts" in plan, plan


from hypothesis import given, settings, strategies as st


@settings(max_examples=5, deadline=None)
@given(
    us=st.lists(
        # full µs range DuckDB/Spark timestamps share (years 1 to 9999
        # would overflow ns int64; stay in the ns-representable window
        # since the ns encoding must round-trip too)
        st.integers(min_value=0, max_value=4_102_444_800_000_000),  # ≤ year 2100
        min_size=1, max_size=6, unique=True,
    )
)
def test_property_encodings_agree_on_random_instants(spark, tmp_path_factory, us):
    """For ANY µs instants, the ns-long and timestamp[us] encodings must
    normalize to identical (timestamp, µs, date, hour) tuples."""
    vals = sorted(us)
    dirs = {
        "ns": _write(
            str(tmp_path_factory.mktemp("p_ns")),
            pa.array([v * 1000 for v in vals], pa.timestamp("ns")),
        ),
        "us": _write(
            str(tmp_path_factory.mktemp("p_us")),
            pa.array(vals, pa.timestamp("us")),
        ),
    }
    got = {k: _collect(spark, d) for k, d in dirs.items()}
    assert got["ns"] == got["us"]
    assert [r[2] for r in got["us"]] == vals
