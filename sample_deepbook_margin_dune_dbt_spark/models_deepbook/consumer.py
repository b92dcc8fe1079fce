"""Canonical consumer queries over the materialized DeepBook tables.

Reproduces the reference's published sample queries (``README.md:75-120`` —
pool TVL over time, total TVL, daily borrow volume, recent loan events) as
DataFrame builders against a ``TableStore`` warehouse. These are SURVEY §2.6
O2 / §2.4 A4 coverage: the ad-hoc SELECT layer a Dune user runs against the
materialized tables, re-expressed over the engine's warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine.materialize import TableStore


def pool_tvl_over_time(store: TableStore, coin_symbol: str = "USDC") -> DataFrame:
    """Pool TVL over time (USD) — reference ``README.md:77-89``."""
    return (
        store.read("fct_deepbook_margin_pool_daily")
        .filter(F.col("coin_symbol") == coin_symbol)
        .select(
            "snapshot_date",
            "coin_symbol",
            F.col("total_supply_usd").alias("tvl_usd"),
            "total_borrow_usd",
            "utilization_rate",
        )
        .orderBy("snapshot_date")
    )


def total_tvl_across_pools(store: TableStore) -> DataFrame:
    """Total TVL across all pools — reference ``README.md:91-100``."""
    return (
        store.read("fct_deepbook_margin_pool_daily")
        .groupBy("snapshot_date")
        .agg(
            F.sum("total_supply_usd").alias("total_tvl_usd"),
            F.sum("total_borrow_usd").alias("total_borrowed_usd"),
        )
        .orderBy(F.desc("snapshot_date"))
    )


def daily_borrow_volume_by_pool(store: TableStore) -> DataFrame:
    """Daily borrow/repay volume (USD) — reference ``README.md:102-111``."""
    return (
        store.read("fct_deepbook_margin_pool_daily")
        .select(
            "snapshot_date",
            "coin_symbol",
            "daily_borrow_volume_usd",
            "daily_repay_volume_usd",
        )
        .orderBy(F.desc("snapshot_date"))
    )


def recent_loan_events(store: TableStore, limit: int = 100) -> DataFrame:
    """Recent loan events — reference ``README.md:113-120`` (O3: LIMIT)."""
    return (
        store.read("deepbook_margin_loan_borrowed")
        .select(
            F.timestamp_seconds(F.col("timestamp_ms") / F.lit(1000)).alias("time"),
            "margin_pool_id",
            (F.col("loan_amount") / F.lit(1e6)).alias("loan_amount_normalized"),
        )
        .orderBy(F.desc("time"))
        .limit(limit)
    )
