"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (the reference fct-daily shape: FOJ
  volume chain + latest-state dedup + lag deltas) on sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY §2 plus
  the LLM-data-pipeline extensions (dedup / similarity / text / multimodal).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every declared query
  (50/50 since r4: approximate ANN tiers project their deterministic
  structural contract — DERIVED from k since r6, not hardcoded;
  tolerance-boolean contract for sketch ops). The r8 window rotates
  driver evidence onto the stalest (r2-vintage) families — tpch_q4/q7/
  q14, text_langid, j2_left_join, o4_union_all, a_percentiles — plus
  the NEW ``chunk_pack_bestfit`` (length-bucketed best-fit-decreasing
  remainder packing; structural-contract oracle per the ANN precedent),
  rotating out r7-green rows whose families stay represented (tpch_q2/
  q9, dedup_strip_spans, emb_similarity_profile, events_drift_tvd,
  dedup_embedding_clusters, emb_decontaminate, chunk_pack_efficiency).
  Everything rotated out stays oracle-checked by
  ``tests/test_oracle_parity.py`` over the full inventory under the
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
