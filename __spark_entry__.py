"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (the reference fct-daily shape: FOJ
  volume chain + latest-state dedup + lag deltas) on sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY §2 plus
  the LLM-data-pipeline extensions (dedup / similarity / text / multimodal).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every declared query
  (50/50 since r4: approximate ANN tiers project their deterministic
  structural contract — DERIVED from k since r6, not hardcoded;
  tolerance-boolean contract for sketch ops). The r12 window is the
  first steady-state AGE rotation (the backlog emptied in r11): the 4
  oracle-bearing queries added after the r11 declaration
  (corpus_version_diff, retrieval_eval_metrics,
  benchmark_leakage_report, sample_split_temporal) plus the r2/r3
  oldest-evidence tiers (f_time_functions, p3_like_prefix,
  text_quality, tpch_q5, w2_latest_per_group, dedup_ngram_jaccard,
  skew_plain_agg, text_winnow) rotate in, all 12 re-verified against
  the DuckDB oracle at sf0.001 + sf0.01 this session before declaring;
  12 r11-green rows whose capabilities stay represented rotate out
  (the full per-query rationale is in ``queries/__init__.py``).
  Everything rotated out stays oracle-checked by
  ``tests/test_oracle_parity.py`` over the full FULL_QUERIES inventory
  (inventory counts are DERIVED — see the module self-check below, so
  this docstring can no longer drift from the registry) under the
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

from sample_deepbook_margin_dune_dbt_spark.queries import (  # noqa: E402
    ALL_QUERIES,
    FULL_QUERIES,
)

# Derived inventory counts (VERDICT r11 item 5: the hand-written
# 150/143/7 drifted from the real 154/146/8 — keep the numbers computed,
# and pin the structural invariants the driver relies on at import time).
N_QUERIES = len(FULL_QUERIES)
N_ORACLE = sum(1 for _, sql in FULL_QUERIES.values() if sql is not None)
N_ROWS_ONLY = N_QUERIES - N_ORACLE
assert len(ALL_QUERIES) <= 50, len(ALL_QUERIES)
assert all(sql is not None for _, sql in ALL_QUERIES.values()), (
    "every driver-window query must carry an oracle"
)


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
