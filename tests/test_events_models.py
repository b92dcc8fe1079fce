"""Incremental sketch-reach model (``models_events``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_deepbook_margin_dune_dbt_spark.engine import Runner, TableStore
from sample_deepbook_margin_dune_dbt_spark.models_events.models import total_reach
from sample_deepbook_margin_dune_dbt_spark.queries.common import load
from sample_deepbook_margin_dune_dbt_spark.sources import testdata_sources as load_testdata_sources
import sample_deepbook_margin_dune_dbt_spark.models_events  # noqa: F401


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    store = TableStore(spark, str(tmp_path_factory.mktemp("events_wh")))
    runner = Runner(spark, store, load_testdata_sources(sf_dir))
    runner.run("+events_user_reach_daily")
    return runner, store


def test_daily_rows_match_exact(built, spark, sf_dir):
    _, store = built
    reach = store.read("events_user_reach_daily")
    ev = load(spark, sf_dir, "events")
    want = {
        r["d"]: (r["n_exact"], r["n_events"])
        for r in ev.groupBy(F.to_date("ts").alias("d")).agg(
            F.count_distinct("user_id").cast("long").alias("n_exact"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        ).collect()
    }
    got = {
        r["d"]: (r["n_exact"], r["n_events"]) for r in reach.collect()
    }
    assert got == want


def test_incremental_rerun_idempotent(built):
    runner, store = built
    before = {
        r["d"]: r["n_exact"]
        for r in store.read("events_user_reach_daily").collect()
    }
    runner.run("+events_user_reach_daily")  # boundary-day reprocess + MERGE
    after = {
        r["d"]: r["n_exact"]
        for r in store.read("events_user_reach_daily").collect()
    }
    assert after == before
    assert runner.test("+events_user_reach_daily") == {}


def test_sketch_union_estimates_total_reach(built, spark, sf_dir):
    """Unioned daily sketches ≈ exact all-time distinct (within HLL lg14
    error), while summed daily exacts overcount returnees — the reason
    the sketch column exists."""
    _, store = built
    got = total_reach(store.read("events_user_reach_daily")).first()
    exact = (
        load(spark, sf_dir, "events")
        .agg(F.count_distinct("user_id"))
        .first()[0]
    )
    assert abs(got["est_total_users"] - exact) <= 0.05 * exact
    assert got["sum_daily_exact"] >= exact  # returnees double-count


def test_range_filtered_reach(built):
    """Reach over a date slice unions only the rows in range."""
    _, store = built
    reach = store.read("events_user_reach_daily")
    days = sorted(r["d"] for r in reach.select("d").collect())
    half = reach.filter(F.col("d") <= days[len(days) // 2])
    got = total_reach(half).first()
    assert 0 < got["n_days"] < len(days)
    assert got["est_total_users"] > 0


# ------------------------------------------------- retention model pair


@pytest.fixture(scope="module")
def retention_runs(spark, sf_dir, tmp_path_factory):
    """Full refresh vs three time-split incremental runs over the same
    events (run boundaries on event date), for the first-seen dim and
    the retention fact."""
    import pandas as pd

    root = tmp_path_factory.mktemp("ret")
    full = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = sorted(full["ts"].dt.date.unique())
    cut1, cut2 = days[len(days) // 3], days[2 * len(days) // 3]

    def write(sub, name):
        p = str(root / f"{name}.parquet")
        sub.to_parquet(p, index=False, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        return {"main.events": p}

    store_full = TableStore(spark, str(root / "wh_full"))
    Runner(spark, store_full, write(full, "full")).run("+events_retention_daily")

    store_inc = TableStore(spark, str(root / "wh_inc"))
    final_runner = None
    for i, hi in enumerate([cut1, cut2, None]):
        sub = full if hi is None else full[full["ts"].dt.date <= hi]
        final_runner = Runner(spark, store_inc, write(sub, f"s{i}"))
        final_runner.run("+events_retention_daily")
    return store_full, store_inc, final_runner


def _rows(store, table, key_cols):
    return {
        tuple(r[c] for c in key_cols): tuple(
            v for c, v in r.asDict().items()
            if c not in key_cols and c != "updated_at"
        )
        for r in store.read(table).collect()
    }


def test_first_seen_incremental_equals_full(retention_runs):
    full, inc, _ = retention_runs
    assert _rows(full, "events_user_first_seen", ["user_id"]) == _rows(
        inc, "events_user_first_seen", ["user_id"]
    )


def test_retention_incremental_equals_full(retention_runs):
    full, inc, _ = retention_runs
    assert _rows(full, "events_retention_daily", ["cohort_date", "day_offset"]) == _rows(
        inc, "events_retention_daily", ["cohort_date", "day_offset"]
    )


def test_retention_matches_batch_query(retention_runs, spark, sf_dir):
    """The incremental fact must equal the one-shot events_retention
    query over the same events (modulo the activity_date audit col)."""
    from sample_deepbook_margin_dune_dbt_spark.queries.eventseq import (
        q_events_retention,
    )

    _, inc, _ = retention_runs
    want = {
        (r["cohort_date"], r["day_offset"]): (
            r["n_users"], r["cohort_size"], r["retention_ppm"]
        )
        for r in q_events_retention(spark, sf_dir).collect()
    }
    got = {
        (r["cohort_date"], r["day_offset"]): (
            r["n_users"], r["cohort_size"], r["retention_ppm"]
        )
        for r in inc.read("events_retention_daily").collect()
    }
    assert got == want


def test_retention_rerun_idempotent(retention_runs):
    """Re-running against the already-complete source must change
    nothing (boundary-day reprocess + MERGE), and the generic tests
    must pass on both tables."""
    _, inc, runner = retention_runs
    before_dim = _rows(inc, "events_user_first_seen", ["user_id"])
    before = _rows(inc, "events_retention_daily", ["cohort_date", "day_offset"])
    assert before
    runner.run("+events_retention_daily")
    assert _rows(inc, "events_user_first_seen", ["user_id"]) == before_dim
    assert _rows(inc, "events_retention_daily", ["cohort_date", "day_offset"]) == before
    assert runner.test("+events_retention_daily") == {}


def test_corpus_from_events_renders_sessions(spark, sf_dir):
    """Every session document carries exactly its session's events as
    time-ordered tokens, and the (user, session) keys match the
    sessionize query's."""
    import re

    from pyspark.sql import functions as F

    from sample_deepbook_margin_dune_dbt_spark.queries.eventseq import (
        q_corpus_from_events,
    )
    from sample_deepbook_margin_dune_dbt_spark.queries.parity import q_sessionize
    from sample_deepbook_margin_dune_dbt_spark.queries.common import load

    docs = q_corpus_from_events(spark, sf_dir).collect()
    total_events = load(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in docs) == total_events
    pat = re.compile(r"^[a-z_]+:-?\d+$")
    for r in docs:
        toks = r["text"].split(" ")
        assert len(toks) == r["n_events"]
        assert all(pat.match(t) for t in toks), toks[:3]
    keys = {(r["user_id"], r["session_id"]) for r in docs}
    sess_keys = {
        (r["user_id"], r["session_id"]) for r in q_sessionize(spark, sf_dir).collect()
    }
    assert keys == sess_keys
