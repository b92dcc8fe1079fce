"""Shared helpers for the driver-contract queries.

The driver hands us an arbitrary SparkSession, so every query defensively
pins the runtime confs its correctness depends on (all runtime-settable):

- ``nanosAsLong`` — the testdata's ``events.ts`` is TIMESTAMP(NANOS), which
  Spark 4 otherwise refuses to read; under this conf it surfaces as a long
  (ns since epoch) and ``EVENT_TS`` converts it.
- UTC session timezone — date bucketing must agree with the DuckDB oracle.
- ANSI off — parity with Trino-style ``try_cast``/lenient arithmetic
  (Spark 4 defaults ANSI on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# events.ts (long ns under nanosAsLong) → µs-precision timestamp, matching
# DuckDB's TIMESTAMP truncation of the same parquet column.
# Functions (not module constants): F.expr needs an active session.
def event_ts() -> F.Column:
    return F.expr("timestamp_micros(ts div 1000)")


def event_ts_us() -> F.Column:
    """µs since epoch as long."""
    return F.expr("ts div 1000")


# ---------------------------------------------------------------------------
# Exact-decimal aggregation: every money/value column in the testdata sits
# exactly on a 2-decimal grid (verified), so casting to DECIMAL before
# summing makes the aggregate EXACT — independent of summation order — and
# therefore bit-identical between Spark and the DuckDB oracle. Double sums
# differ at ~1e-9 across engines (different reduction orders), which would
# flip value hashes at rounding boundaries.
#
# Performance note: decimal aggregation costs ~1.3-2× a double sum. These
# helpers exist for *oracle-checked* queries; a pure-performance pipeline
# would sum doubles.

def dec2(c: F.Column) -> F.Column:
    """Money column → exact DECIMAL(12,2)."""
    return c.cast("decimal(12,2)")


def rate(c: F.Column) -> F.Column:
    """Rate column (discount/tax ∈ [0,1)) → exact DECIMAL(3,2)."""
    return c.cast("decimal(3,2)")


def dsum2(c: F.Column) -> F.Column:
    """Exact sum of a 2-decimal money column, emitted as double."""
    return F.sum(dec2(c)).cast("double")


# SQL-side twins (DuckDB)
def sql_dsum2(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE)"
