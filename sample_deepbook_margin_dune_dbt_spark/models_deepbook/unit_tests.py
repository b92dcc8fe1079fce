"""Unit tests for the reference-parity DAG (dbt ``unit_tests:`` analog):
the event-decode builder verified against literal mocked ``sui.events``
rows — type filter, JSON extraction, try_cast null-on-garbage, the
30-day backfill bound on first runs, and the watermark bound on
incremental runs (via the ``this`` mock)."""

from __future__ import annotations

import datetime as dt
import json

from ..engine import unit_test
from .common import PACKAGE

_EV_SCHEMA = (
    "transaction_digest string, event_index bigint, timestamp_ms bigint, "
    "sender string, event_type string, event_json string"
)

_BORROW = f"{PACKAGE}::margin_manager::LoanBorrowedEvent"
_NOW = dt.datetime(2026, 2, 1)
_NOW_MS = int(_NOW.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
_DAY = 86_400_000


def _ev(digest, idx, ts_ms, etype, payload):
    return (digest, idx, ts_ms, "0xsender", etype, json.dumps(payload))


# first run: type filter + 30-day backfill bound + JSON decode; the
# malformed amount try_casts to NULL instead of failing the build
unit_test(
    "loan_borrowed_first_run_decode",
    model="deepbook_margin_loan_borrowed",
    given={
        "source:sui.events": (
            _EV_SCHEMA,
            [
                _ev("0xd1", 0, _NOW_MS - _DAY,
                    _BORROW, {"loan_amount": 5.5, "loan_shares": 2.0,
                              "margin_manager_id": "0xmm", "margin_pool_id": "0xmp",
                              "timestamp": 1700000000}),
                # wrong event type: filtered out
                _ev("0xd2", 0, _NOW_MS - _DAY,
                    f"{PACKAGE}::margin_manager::LoanRepaidEvent",
                    {"repay_amount": 1.0}),
                # older than the 30-day backfill bound: filtered out
                _ev("0xd3", 0, _NOW_MS - 31 * _DAY, _BORROW, {"loan_amount": 1.0}),
                # malformed amount: row kept, amount NULL (try_cast)
                _ev("0xd4", 1, _NOW_MS - 2 * _DAY,
                    _BORROW, {"loan_amount": "not-a-number",
                              "margin_pool_id": "0xmp2"}),
            ],
        ),
    },
    expect=(
        "transaction_digest string, event_index bigint, "
        "loan_amount double, margin_pool_id string",
        [
            ("0xd1", 0, 5.5, "0xmp"),
            ("0xd4", 1, None, "0xmp2"),
        ],
    ),
    fixed_now=_NOW,
    tags=["deepbook"],
)

# incremental run: rows below max(timestamp_ms) of `this` are skipped
# (the P4 watermark), even inside the 30-day window
unit_test(
    "loan_borrowed_incremental_watermark",
    model="deepbook_margin_loan_borrowed",
    given={
        "source:sui.events": (
            _EV_SCHEMA,
            [
                _ev("0xold", 0, _NOW_MS - 5 * _DAY, _BORROW, {"loan_amount": 1.0}),
                _ev("0xnew", 0, _NOW_MS - 1 * _DAY, _BORROW, {"loan_amount": 9.0}),
            ],
        ),
        "this": ("timestamp_ms bigint", [(_NOW_MS - 2 * _DAY,)]),
    },
    expect=(
        "transaction_digest string, loan_amount double",
        [("0xnew", 9.0)],
    ),
    incremental=True,
    fixed_now=_NOW,
    tags=["deepbook"],
)
