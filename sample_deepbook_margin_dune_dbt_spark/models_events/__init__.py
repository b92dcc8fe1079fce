"""Event-analytics models: a third DAG domain on the same engine.

Demonstrates that the model/runner/MERGE machinery serves event streams
as well as the reference's DeFi pipeline (``models_deepbook``) and the
corpus DAG (``models_corpus``):

- ``events_user_reach_daily`` — incremental (date watermark, MERGE):
  one row per day carrying a mergeable DataSketches HLL sketch of that
  day's users plus the exact daily distinct. Cross-day reach ("distinct
  users over any date range") is answered by unioning the stored
  sketches — no re-scan of history, which exact distinct cannot do
  (daily exacts are not additive across returnees).
"""

from . import models  # noqa: F401

ALL_MODELS = [
    "events_user_reach_daily",
]
