"""Incremental-semantics tests (SURVEY §5: the real risk area).

Splits the fixture sources by time, runs the DAG incrementally
(run1 = backfill, run2 = new data, run3 = late data inside the 7-day
lookback), and compares final table state against one full-refresh run over
everything. Event/staging models must match exactly; the fact model must
match on all non-lag columns (the reference's lag-over-the-slice caveat,
SURVEY §2.5 W3, makes boundary-day lag columns differ by design — we assert
equality beyond the boundary).
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark import models_deepbook  # noqa: F401
from tests.fixtures import NOW_MS, write_fixtures

FIXED_NOW = dt.datetime(2026, 2, 1, 0, 0, 0)
DAY_MS = 86400_000
CUT1 = NOW_MS - 10 * DAY_MS  # run1 sees data before this
CUT2 = NOW_MS - 3 * DAY_MS  # run2 adds [CUT1, CUT2); run3 adds the rest + late rows


def _split_sources(full: dict[str, str], out_dir: str, lo: int | None, hi: int | None, late: bool = False) -> dict[str, str]:
    """Subset each source by timestamp window; `late` adds back a few old rows."""
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for key, path in full.items():
        df = pd.read_parquet(path)
        ts_col = "timestamp_ms" if "timestamp_ms" in df.columns else None
        if ts_col is None:  # prices.day — give every run the full price table
            sub = df
        else:
            mask = pd.Series(True, index=df.index)
            if lo is not None:
                mask &= df[ts_col] >= lo
            if hi is not None:
                mask &= df[ts_col] < hi
            sub = df[mask]
            if late:
                # late arrivals: events 5 days old (inside the 7-day lookback)
                old = df[(df[ts_col] >= NOW_MS - 6 * DAY_MS) & (df[ts_col] < NOW_MS - 5 * DAY_MS)]
                sub = pd.concat([sub, old]).drop_duplicates()
        p = os.path.join(out_dir, key.replace(".", "_") + ".parquet")
        sub.to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        out[key] = p
    return out


def _df_key(df, cols):
    return {tuple(r[c] for c in cols): r for r in df.collect()}


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("incr")
    full_sources = write_fixtures(str(root / "full"))

    # --- full refresh over everything -------------------------------------
    store_full = TableStore(spark, str(root / "wh_full"))
    Runner(spark, store_full, full_sources, fixed_now=FIXED_NOW).run(models_deepbook.ALL_MODELS)

    # --- three incremental runs -------------------------------------------
    store_inc = TableStore(spark, str(root / "wh_inc"))
    r1 = _split_sources(full_sources, str(root / "s1"), None, CUT1)
    Runner(spark, store_inc, r1, fixed_now=FIXED_NOW).run(models_deepbook.ALL_MODELS)
    r2 = _split_sources(full_sources, str(root / "s2"), None, CUT2)
    Runner(spark, store_inc, r2, fixed_now=FIXED_NOW).run(models_deepbook.ALL_MODELS)
    r3 = _split_sources(full_sources, str(root / "s3"), None, None, late=True)
    Runner(spark, store_inc, r3, fixed_now=FIXED_NOW).run(models_deepbook.ALL_MODELS)

    return store_full, store_inc


def _assert_tables_equal(store_full, store_inc, name, key_cols, skip_cols=()):
    full = store_full.read(name).drop("updated_at", *skip_cols)
    inc = store_inc.read(name).drop("updated_at", *skip_cols)
    assert sorted(full.columns) == sorted(inc.columns)
    f_rows = _df_key(full, key_cols)
    i_rows = _df_key(inc, key_cols)
    assert set(f_rows) == set(i_rows), f"{name}: key sets differ"
    for k, fr in f_rows.items():
        ir = i_rows[k]
        for c in full.columns:
            fv, iv = fr[c], ir[c]
            if isinstance(fv, float) and isinstance(iv, float):
                assert abs(fv - iv) < 1e-9, (name, k, c, fv, iv)
            else:
                assert fv == iv, (name, k, c, fv, iv)


@pytest.fixture(scope="module")
def runs_widened(spark, tmp_path_factory, runs):
    """Same three-run schedule with ``lag_widen_days=1``: the fact model's
    lag inputs widen one day below each run's lookback floor. The
    full-refresh reference store is REUSED from ``runs`` — widening only
    changes incremental lookback, so the full-refresh output is
    identical by construction (same fixtures, same fixed_now), and
    rebuilding it cost a second ~15 s full-DAG run per suite."""
    root = tmp_path_factory.mktemp("incr_widen")
    full_sources = write_fixtures(str(root / "full"))
    store_full = runs[0]

    store_inc = TableStore(spark, str(root / "wh_inc"))
    for i, (lo, hi, late) in enumerate([(None, CUT1, False), (None, CUT2, False), (None, None, True)]):
        src = _split_sources(full_sources, str(root / f"s{i}"), lo, hi, late)
        Runner(
            spark, store_inc, src, fixed_now=FIXED_NOW, lag_widen_days=1
        ).run(models_deepbook.ALL_MODELS)
    return store_full, store_inc


def test_event_models_incremental_equivalence(runs):
    store_full, store_inc = runs
    for name in models_deepbook.ALL_MODELS[:5]:
        _assert_tables_equal(store_full, store_inc, name, ["transaction_digest", "event_index"])


def test_stg_incremental_equivalence(runs):
    store_full, store_inc = runs
    _assert_tables_equal(
        store_full, store_inc, "stg_deepbook_margin_pool_object", ["object_id", "version"]
    )


def test_fct_incremental_equivalence_nonlag(runs):
    store_full, store_inc = runs
    _assert_tables_equal(
        store_full,
        store_inc,
        "fct_deepbook_margin_pool_daily",
        ["margin_pool_id", "snapshot_date"],
        skip_cols=("daily_supply_change", "daily_borrow_change", "daily_utilization_change"),
    )


def test_fct_lag_widening_makes_incremental_equal_full_refresh(runs_widened):
    """With lag_widen_days=1 the slice-boundary caveat disappears: the fact
    table matches full refresh on EVERY column, lag deltas included
    (fixture pools snapshot daily, so a one-day seed suffices)."""
    store_full, store_inc = runs_widened
    _assert_tables_equal(
        store_full,
        store_inc,
        "fct_deepbook_margin_pool_daily",
        ["margin_pool_id", "snapshot_date"],
    )


def test_fct_lag_matches_beyond_boundary(runs):
    """Lag columns agree for rows strictly inside the final reprocess window
    (the window's first day legitimately differs — reference W3 caveat)."""
    store_full, store_inc = runs
    full = store_full.read("fct_deepbook_margin_pool_daily")
    inc = store_inc.read("fct_deepbook_margin_pool_daily")
    # the final incremental run reprocessed from max(snapshot_date)-7
    boundary = inc.agg(F.date_sub(F.max("snapshot_date"), 7)).first()[0]
    cols = ["margin_pool_id", "snapshot_date", "daily_supply_change", "daily_borrow_change"]
    f_rows = _df_key(full.filter(F.col("snapshot_date") > boundary).select(*cols), cols[:2])
    i_rows = _df_key(inc.filter(F.col("snapshot_date") > boundary).select(*cols), cols[:2])
    for k, fr in f_rows.items():
        ir = i_rows[k]
        for c in cols[2:]:
            fv, iv = fr[c], ir[c]
            if fv is None or iv is None:
                assert fv == iv, (k, c, fv, iv)
            else:
                assert abs(fv - iv) < 1e-9, (k, c, fv, iv)


# ---------------------------------------------------------------------------
# on_schema_change through a real model (VERDICT r4 item 7): the source
# gains a column mid-stream; each mode's contract is asserted on the
# FINAL TABLE, not just the TableStore primitive.


def _schema_change_run(spark, tmp_path, mode):
    import pandas as pd

    from sample_deepbook_margin_dune_dbt_spark.engine.model import _REGISTRY, model

    src = str(tmp_path / f"src_{mode}.parquet")
    name = f"sc_model_{mode}"
    pd.DataFrame({"id": [1, 2], "v": ["a", "b"]}).to_parquet(src, index=False)

    @model(name, unique_key=["id"], on_schema_change=mode)
    def _m(ctx):
        return ctx.source("ext", "t")

    try:
        store = TableStore(spark, str(tmp_path / f"wh_{mode}"))
        runner = Runner(spark, store, {"ext.t": src})
        runner.run(name)
        # source gains a column mid-stream
        pd.DataFrame(
            {"id": [2, 3], "v": ["b2", "c"], "score": [9.5, 1.0]}
        ).to_parquet(src, index=False)
        runner.run(name)
        return store.read(name)
    finally:
        _REGISTRY.pop(name, None)


def test_model_on_schema_change_ignore(spark, tmp_path):
    got = _schema_change_run(spark, tmp_path, "ignore")
    assert "score" not in got.columns
    assert {r["id"]: r["v"] for r in got.collect()} == {1: "a", 2: "b2", 3: "c"}


def test_model_on_schema_change_append_new_columns(spark, tmp_path):
    got = _schema_change_run(spark, tmp_path, "append_new_columns")
    rows = {r["id"]: r for r in got.collect()}
    assert set(got.columns) == {"id", "v", "score"}
    assert rows[1]["score"] is None and rows[1]["v"] == "a"
    assert rows[2]["score"] == 9.5 and rows[2]["v"] == "b2"
    assert rows[3]["score"] == 1.0


def test_model_on_schema_change_fail(spark, tmp_path):
    with pytest.raises(ValueError, match="score"):
        _schema_change_run(spark, tmp_path, "fail")
