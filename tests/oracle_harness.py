"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs each declared query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and exact values
(rows sorted, columns sorted by name — the driver hashes after sorting
columns by name, so exact value equality here predicts a hash match).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, date):
        return v
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


# Spark simpleString dtype → acceptable DuckDB relation types. The driver's
# hash is type-aware (DuckDB HUGEINT vs Spark LONG hashes differently even
# when every value collates equal as a Python int — the r6
# chunk_pack_sequences red row), so the local gate must reject type drift,
# not just value drift.
_TYPE_EQUIV = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    # Spark session-local timestamp vs DuckDB TIMESTAMP (ntz) collate the
    # same under the UTC-pinned session; TIMESTAMPTZ is deliberately NOT
    # accepted — the driver's hash may render the offset (ADVICE r7) —
    # oracles must CAST tz-producing expressions to TIMESTAMP.
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


def types_compatible(spark_dt: str, duck_dt: str) -> bool:
    spark_dt = spark_dt.lower().strip()
    duck_dt = duck_dt.upper().strip()
    if spark_dt.startswith("decimal"):
        # precision/scale must agree exactly when both sides are DECIMAL —
        # the driver's hash renders scale (DECIMAL(38,2) "1.50" vs
        # DECIMAL(10,1) "1.5" differ), so accepting any (p,s) pair could
        # pass locally and hash-red at the driver (ADVICE r7). HUGEINT
        # (int128) is only ever produced where Spark would need
        # DECIMAL(38,0).
        if duck_dt == "HUGEINT":
            return spark_dt == "decimal(38,0)"
        return duck_dt.startswith("DECIMAL") and (
            spark_dt.replace(" ", "").upper() == duck_dt.replace(" ", "")
        )
    if spark_dt.startswith("array<"):
        return duck_dt.endswith("[]") and types_compatible(
            spark_dt[6:-1], duck_dt[:-2]
        )
    if spark_dt.startswith("struct<"):
        return duck_dt.startswith("STRUCT")
    if spark_dt.startswith("map<"):
        return duck_dt.startswith("MAP")
    return duck_dt in _TYPE_EQUIV.get(spark_dt, set())


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r[c] for c in sorted(spark_cols)) for r in spark_df.collect()]

    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_types = {c: str(t) for c, t in zip(duck_cols, rel.types)}
    duck_raw = rel.fetchall()
    col_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    duck_rows = [tuple(r[i] for i in col_idx) for r in duck_raw]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"{name}: columns differ spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems

    for c, spark_dt in spark_df.dtypes:
        if not types_compatible(spark_dt, duck_types[c]):
            problems.append(
                f"{name}: column {c} type mismatch spark={spark_dt} "
                f"duck={duck_types[c]} (driver hash is type-aware)"
            )
    if problems:
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")

    s_sorted = sorted([tuple(_norm(v) for v in r) for r in spark_rows], key=_sort_key)
    d_sorted = sorted([tuple(_norm(v) for v in r) for r in duck_rows], key=_sort_key)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if sr != dr:
            n_bad += 1
            if n_bad <= 3:
                cols = sorted(spark_cols)
                detail = [
                    f"{c}: spark={sv!r} duck={dv!r}"
                    for c, sv, dv in zip(cols, sr, dr)
                    if sv != dv
                ]
                problems.append(f"{name}: row {i} differs → {'; '.join(detail)}")
    if n_bad > 3:
        problems.append(f"{name}: ... {n_bad} rows differ total")
    return problems
