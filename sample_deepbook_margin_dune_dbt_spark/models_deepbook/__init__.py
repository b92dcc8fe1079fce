"""The 7 reference-parity models (SURVEY §1.1, §7 build order).

Importing this package registers every model with the engine registry.
DAG (reference ``README.md:52-73``):

    sui.events  ─→ 5 event models ─┐
    sui.objects ─→ stg pool object ┼─→ fct pool daily
    prices.day  ───────────────────┘
"""

from .common import PACKAGE  # noqa: F401
from . import events  # noqa: F401
from . import objects  # noqa: F401
from . import daily  # noqa: F401
from . import unit_tests  # noqa: F401  (registers dbt-style unit tests)

ALL_MODELS = [
    "deepbook_margin_loan_borrowed",
    "deepbook_margin_loan_repaid",
    "deepbook_margin_deposit_collateral",
    "deepbook_margin_pool_asset_supplied",
    "deepbook_margin_pool_asset_withdrawn",
    "stg_deepbook_margin_pool_object",
    "fct_deepbook_margin_pool_daily",
]
