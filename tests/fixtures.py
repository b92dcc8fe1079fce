"""Deterministic synthetic fixtures for the DeepBook domain pipeline tests.

Generates the three reference source tables per FIXTURES.md (schemas derived
from how the reference SQL reads each source):

- ``sui.events``  — all 5 margin event types + unrelated types + malformed
  JSON + multi-event digests + >30-day spread + late arrivals
- ``sui.objects`` — versioned MarginPool<T> blobs covering every coin in the
  seed (incl. SUI short form + an unknown coin), multiple versions per day,
  zero-share/zero-supply rows, boolean-string fields
- ``prices.day``  — intraday duplicate prices, missing days, mixed-case
  symbols, stablecoin prices ≠ 1.0

Pure pandas/pyarrow — no Spark needed at generation time.
"""

from __future__ import annotations

import json
import os
import random

import pandas as pd

PACKAGE = "0x97d9473771b01f77b0940c589484184b49f6444627ec121314fae6a6d36fb86b"

POOLS = [
    ("0xpool_sui", "0x2::sui::SUI", "SUI"),
    (
        "0xpool_usdc",
        "0xdba34672e30cb065b1f93e3ab55318768fd6fef66c15942c9f7cb846e2f900e7::usdc::USDC",
        "USDC",
    ),
    (
        "0xpool_deep",
        "0xdeeb7a4662eec9f2f3def03fb937a663dddaa2e215b8078a284d026b7946c270::deep::DEEP",
        "DEEP",
    ),
    ("0xpool_mystery", "0xmystery::coin::MYST", "UNKNOWN"),
]

# fixture "now": 2026-02-01T00:00:00Z
NOW_MS = 1769904000000
DAY_MS = 86400_000


def _event_rows(rng: random.Random) -> pd.DataFrame:
    rows = []
    managers = [f"0xmgr{i}" for i in range(6)]
    types = {
        "borrow": f"{PACKAGE}::margin_manager::LoanBorrowedEvent",
        "repay": f"{PACKAGE}::margin_manager::LoanRepaidEvent",
        "deposit": f"{PACKAGE}::margin_manager::DepositCollateralEvent",
        "supply": f"{PACKAGE}::margin_pool::AssetSupplied",
        "withdraw": f"{PACKAGE}::margin_pool::AssetWithdrawn",
    }
    eid = 0
    # 40 days of events → rows older than the 30-day backfill bound exist
    for day in range(40):
        ts_base = NOW_MS - (39 - day) * DAY_MS
        for _ in range(rng.randint(3, 8)):
            kind = rng.choice(list(types))
            pool_id, asset_type, _sym = rng.choice(POOLS)
            ts = ts_base + rng.randint(0, DAY_MS - 1)
            amount = round(rng.uniform(1e6, 5e9), 0)
            shares = round(amount * rng.uniform(0.9, 1.0), 0)
            if kind == "borrow":
                payload = {
                    "loan_amount": str(amount),
                    "loan_shares": str(shares),
                    "margin_manager_id": rng.choice(managers),
                    "margin_pool_id": pool_id,
                    "timestamp": str(ts),
                }
            elif kind == "repay":
                payload = {
                    "margin_manager_id": rng.choice(managers),
                    "margin_pool_id": pool_id,
                    "repay_amount": str(amount),
                    "repay_shares": str(shares),
                    "timestamp": str(ts),
                }
            elif kind == "deposit":
                payload = {
                    "amount": str(amount),
                    "asset": {"name": asset_type},
                    "margin_manager_id": rng.choice(managers),
                    "pyth_decimals": str(rng.choice([6, 8, 9])),
                    "pyth_price": str(round(rng.uniform(0.5, 5.0), 4)),
                    "timestamp": str(ts),
                }
            elif kind == "supply":
                payload = {
                    "margin_pool_id": pool_id,
                    "supplier_cap_id": f"0xcap{rng.randint(0, 9)}",
                    "asset_type": {"name": asset_type},
                    "supply_amount": str(amount),
                    "supply_shares": str(shares),
                    "timestamp": str(ts),
                }
            else:
                payload = {
                    "margin_pool_id": pool_id,
                    "supplier_cap_id": f"0xcap{rng.randint(0, 9)}",
                    "asset_type": {"name": asset_type},
                    "withdraw_amount": str(amount),
                    "withdraw_shares": str(shares),
                    "timestamp": str(ts),
                }
            rows.append(
                {
                    "transaction_digest": f"0xdigest{eid // 2}",  # 2 events per digest
                    "event_index": eid % 2,
                    "timestamp_ms": ts,
                    "sender": f"0xsender{rng.randint(0, 20)}",
                    "event_type": types[kind],
                    "event_json": json.dumps(payload),
                }
            )
            eid += 1
    # unrelated event types (must be filtered out)
    for i in range(30):
        rows.append(
            {
                "transaction_digest": f"0xother{i}",
                "event_index": 0,
                "timestamp_ms": NOW_MS - rng.randint(0, 30 * DAY_MS),
                "sender": "0xother",
                "event_type": "0xother::module::OtherEvent",
                "event_json": json.dumps({"x": 1}),
            }
        )
    # malformed payloads (exercise try_cast → NULL)
    for i in range(5):
        rows.append(
            {
                "transaction_digest": f"0xbad{i}",
                "event_index": 0,
                "timestamp_ms": NOW_MS - rng.randint(0, 10 * DAY_MS),
                "sender": "0xbad",
                "event_type": types["borrow"],
                "event_json": json.dumps(
                    {"loan_amount": "not-a-number", "margin_pool_id": POOLS[0][0]}
                ),
            }
        )
    return pd.DataFrame(rows)


def _object_rows(rng: random.Random) -> pd.DataFrame:
    rows = []
    version = 1000
    for day in range(40):
        ts_base = NOW_MS - (39 - day) * DAY_MS
        for pool_id, asset_type, _sym in POOLS:
            # multiple versions per day → exercises W1 dedup
            for v in range(rng.randint(1, 3)):
                version += 1
                ts = ts_base + rng.randint(0, DAY_MS - 1)
                supply = float(rng.randint(0, 10**13))
                borrow = supply * rng.uniform(0.0, 0.9)
                supply_shares = 0.0 if rng.random() < 0.05 else supply * 0.98
                blob = {
                    "id": {"id": pool_id},
                    "state": {
                        "total_borrow": str(round(borrow, 0)),
                        "total_supply": str(supply),
                        "borrow_shares": str(round(borrow * 0.97, 0)),
                        "supply_shares": str(supply_shares),
                        "last_update_timestamp": str(ts),
                    },
                    "vault": str(round(supply - borrow, 0)),
                    "protocol_fees": {
                        "fees_per_share": str(round(rng.uniform(0, 0.01), 6)),
                        "maintainer_fees": str(rng.randint(0, 10**6)),
                        "protocol_fees": str(rng.randint(0, 10**6)),
                        "total_shares": str(round(supply_shares, 0)),
                        "referrals": {"size": str(rng.randint(0, 50))},
                    },
                    "positions": {
                        "positions": {"size": str(rng.randint(0, 200)), "id": {"id": f"0xtbl{pool_id}"}}
                    },
                    "config": {
                        "interest_config": {
                            "base_rate": "50000000",
                            "base_slope": "100000000",
                            "excess_slope": "2000000000",
                            "optimal_utilization": "800000000",
                        },
                        "margin_pool_config": {
                            "max_utilization_rate": "950000000",
                            "min_borrow": "1000000",
                            "protocol_spread": "100000000",
                            "supply_cap": str(10**15),
                            "rate_limit_enabled": rng.choice(["true", "false"]),
                            "rate_limit_capacity": str(10**12),
                        },
                    },
                    "rate_limiter": {
                        "available": str(rng.randint(0, 10**12)),
                        "capacity": str(10**12),
                        "enabled": rng.choice(["true", "false"]),
                        "last_updated_ms": str(ts),
                    },
                    "allowed_deepbook_pools": {"contents": [f"0xdb{i}" for i in range(3)]},
                }
                rows.append(
                    {
                        "object_id": pool_id,
                        "version": version,
                        "type_": f"{PACKAGE}::margin_pool::MarginPool<{asset_type}>",
                        "object_status": "Exists",
                        "object_json": json.dumps(blob),
                        "timestamp_ms": ts,
                    }
                )
    # non-matching object types (filtered by the LIKE predicate)
    for i in range(20):
        rows.append(
            {
                "object_id": f"0xnoise{i}",
                "version": i,
                "type_": "0xother::module::Whatever<T>",
                "object_status": "Exists",
                "object_json": json.dumps({"id": {"id": f"0xnoise{i}"}}),
                "timestamp_ms": NOW_MS - rng.randint(0, 30 * DAY_MS),
            }
        )
    return pd.DataFrame(rows)


def _price_rows(rng: random.Random) -> pd.DataFrame:
    rows = []
    for day in range(45):
        day_start = pd.Timestamp(NOW_MS - (44 - day) * DAY_MS, unit="ms", tz="UTC")
        for sym, base in [("SUI", 3.5), ("USDC", 1.0002), ("DEEP", 0.15), ("Sui", 3.4)]:
            if sym == "DEEP" and day % 5 == 0:
                continue  # missing price days
            # intraday duplicates → W2 dedup
            for hour in (0, 12, 23):
                rows.append(
                    {
                        "timestamp": (day_start + pd.Timedelta(hours=hour)).tz_localize(None),
                        "symbol": sym,
                        "price": round(base * rng.uniform(0.95, 1.05), 6),
                        "blockchain": "sui",
                    }
                )
        rows.append(
            {
                "timestamp": day_start.tz_localize(None),
                "symbol": "SUI",
                "price": 99.9,
                "blockchain": "ethereum",  # wrong chain — must be filtered
            }
        )
    return pd.DataFrame(rows)


def write_fixtures(out_dir: str, seed: int = 7) -> dict[str, str]:
    """Write the three source tables; returns the source mapping."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    paths = {}
    for name, df in [
        ("sui.events", _event_rows(rng)),
        ("sui.objects", _object_rows(rng)),
        ("prices.day", _price_rows(rng)),
    ]:
        p = os.path.join(out_dir, name.replace(".", "_") + ".parquet")
        # micros, not pandas-default nanos: Spark 4 rejects TIMESTAMP(NANOS)
        df.to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        paths[name] = p
    return paths
