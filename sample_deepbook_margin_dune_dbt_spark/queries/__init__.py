"""Driver-contract query inventory.

Each entry couples a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the equivalent DuckDB oracle SQL (or ``None`` for non-SQL-expressible
operators, which the driver checks rows-only). Names map to SURVEY §2
operator IDs; the LLM-pipeline extensions are named by capability.
"""

from __future__ import annotations

from .parity import PARITY_QUERIES
from .tpch import TPCH_QUERIES
from .llmops import LLMOPS_QUERIES

# name -> (spark_fn, oracle_sql | None)
ALL_QUERIES = {**PARITY_QUERIES, **TPCH_QUERIES, **LLMOPS_QUERIES}

__all__ = ["ALL_QUERIES", "PARITY_QUERIES", "TPCH_QUERIES", "LLMOPS_QUERIES"]
