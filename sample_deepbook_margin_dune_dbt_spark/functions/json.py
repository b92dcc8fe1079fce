"""Scalar JSON-path function surface (SURVEY §2.7 F1-F4).

The reference's entire JSON API is three Trino functions; their Spark twins:

- ``json_extract_scalar(j, '$.p')`` → ``F.get_json_object`` (exact twin:
  scalar at JSONPath as string, NULL if absent; deep paths supported) —
  reference usage e.g.
  ``models/deepbook_margin/events/deepbook_margin_loan_borrowed.sql:34-38``,
  ``models/deepbook_margin/objects/stg_deepbook_margin_pool_object.sql:48-89``.
- ``json_format(json_extract(j, '$.p'))`` → ``F.get_json_object`` already
  returns non-scalar matches *serialized*, covering F2+F3 in one call —
  reference ``stg_deepbook_margin_pool_object.sql:92``.
- ``try_cast(x as T)`` → ``Column.try_cast`` (NULL on failure) — reference
  ``stg_deepbook_margin_pool_object.sql:51-89``.

All JVM-side Catalyst expressions — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_extract_scalar(col: Column | str, path: str) -> Column:
    """Trino ``json_extract_scalar``: scalar at JSONPath as string."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path)


def json_extract(col: Column | str, path: str) -> Column:
    """Trino ``json_format(json_extract(...))``: sub-JSON serialized to string.

    ``get_json_object`` returns matched objects/arrays as their JSON text,
    which is exactly the reference's serialize-back-to-varchar behavior.
    """
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path)


def try_cast_scalar(col: Column, dtype: str) -> Column:
    """Trino ``try_cast``: NULL on conversion failure (never raises)."""
    return col.try_cast(dtype)
