"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (the reference fct-daily shape: FOJ
  volume chain + latest-state dedup + lag deltas) on sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY §2 plus
  the LLM-data-pipeline extensions (dedup / similarity / text / multimodal).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every declared query
  (50/50 since r4: approximate ANN tiers project their deterministic
  structural contract — DERIVED from k since r6, not hardcoded;
  tolerance-boolean contract for sketch ops). The r9 window rotates
  driver evidence onto the r1-vintage families that had gone 7 rounds
  without a driver row plus the never-driver rows — a5_cube,
  a5_grouping_sets, j_semi_anti, o5_set_ops, p_scalar_subquery,
  a_pivot, a_unpivot, tpch_q11/q16/q20 — rotating out r8-green rows
  whose families stay represented (a5_rollup, a_percentiles,
  o4_union_all, tpch_q4/q7/q14, text_langid, j2_left_join,
  events_retention, w_hopping_agg; the full rationale is in
  ``queries/__init__.py``). Late-r9 additions: ``corpus_dsir_select``
  and ``events_transitions`` took the data-selection / events-family
  rows from the r8-green ``corpus_mixture_select`` /
  ``events_cohort_value``. Everything rotated out stays oracle-checked
  by ``tests/test_oracle_parity.py`` over the full 147-query inventory (140 oracle-bearing + 7 rows-only)
  under the r8-tightened type gate (no TIMESTAMPTZ leniency; exact
  decimal precision/scale).

Implementation lives in ``sample_deepbook_margin_dune_dbt_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sample_deepbook_margin_dune_dbt_spark.queries import ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = ALL_QUERIES["flagship_daily_user_fact"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; approximate operators are omitted
    (driver records a rows-only check for those)."""
    return {name: sql for name, (_, sql) in ALL_QUERIES.items() if sql is not None}
