"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (the reference fct-daily shape: FOJ
  volume chain + latest-state dedup + lag deltas) on sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY §2 plus
  the LLM-data-pipeline extensions (dedup / similarity / text / multimodal).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every declared query
  (50/50 since r4: approximate ANN tiers project their deterministic
  structural contract — DERIVED from k since r6, not hardcoded;
  tolerance-boolean contract for sketch ops). The r10 window rotates
  driver evidence onto the 14 never-driver families per VERDICT r9
  item 1 — text_novelty, retrieval_rrf_fusion, emb_hard_negatives,
  dedup_containment, dedup_cluster_trust, corpus_datasheet,
  sample_split_cluster_safe, privacy_suppression, corpus_from_events,
  linkage_blocked_report, curation_source_gate, the NEW
  corpus_shard_audit (export→re-read→verify round-trip), and the
  r1-stale tpch_q15/q19 — rotating out r9-green rows whose families
  stay represented (text_tfidf_topterms, text_bm25_topk,
  ann_cosine_topk, dedup_edit_distance, dedup_canonical_select,
  corpus_profile, sample_split_leakage_safe, privacy_k_anonymity,
  events_funnel, corpus_curation_report, decontaminate_spans,
  tpch_q11/q16/q20; the full rationale is in ``queries/__init__.py``).
  Everything rotated out stays oracle-checked by
  ``tests/test_oracle_parity.py`` over the full 149-query inventory
  (142 oracle-bearing + 7 rows-only) under the r8-tightened type gate
  (no TIMESTAMPTZ leniency; exact decimal precision/scale).

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
