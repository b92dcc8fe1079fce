"""Governance query family: privacy release gates + training-shard export.

Two more capabilities a training-data pipeline needs that the reference's
Jinja-SQL rollup surface (reference ``models/deepbook_margin/*``) has no
counterpart for, each exact-integer so the DuckDB oracle hash-compares:

- ``privacy_k_anonymity`` — quasi-identifier census with k-anonymity and
  l-diversity verdicts over the events table (``operators/privacy.py``).
- ``privacy_suppression`` — per-event-type retention audit of the cell-
  suppression transform (computed from the census, no second corpus pass).
- ``corpus_shard_manifest`` — deterministic hash-sharding of the document
  corpus plus the per-shard manifest (rows / tokens / bytes / XOR content
  checksum) a training loader verifies against (``operators/export.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.export import assign_shards, shard_manifest
from ..operators.privacy import (
    generalization_ladder,
    generalize_band,
    k_anonymity_census,
    suppression_report,
)
from ..operators.sampling import sql_hash_uniform
from .common import event_ts, load

# ------------------------------------------------------- k-anonymity census

#: QI grain chosen so the sf0.01 fixture splits both ways: 5 event types ×
#: ~10 value bands × 30 days ≈ 1.4k groups over 10k rows → plenty of groups
#: on each side of k=5, and of l=3 on the user_id sensitive attribute.
_K = 5
_L = 3
_BAND = 50


def _events_with_qi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        generalize_band(F.col("value"), _BAND).alias("value_band"),
        F.to_date(event_ts()).alias("day"),
        "user_id",
    )


def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QI-group census: (event_type, 50-unit value band, day) → group size,
    distinct users, k/l verdicts."""
    qi = _events_with_qi(spark, sf_dir)
    return k_anonymity_census(
        qi, ["event_type", "value_band", "day"], "user_id", k=_K, l_div=_L
    )


SQL_K_ANONYMITY = f"""
WITH qi AS (
    SELECT event_type,
           CAST(floor(value / {_BAND}) AS BIGINT) * {_BAND} AS value_band,
           CAST(ts AS DATE) AS day,
           user_id
    FROM events
)
SELECT event_type, value_band, day,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive,
       CAST(CASE WHEN count(*) >= {_K} THEN 1 ELSE 0 END AS BIGINT) AS k_ok,
       CAST(CASE WHEN count(DISTINCT user_id) >= {_L} THEN 1 ELSE 0 END AS BIGINT)
           AS l_ok
FROM qi GROUP BY 1, 2, 3
"""

# --------------------------------------------------- suppression audit


def q_privacy_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type retention audit of cell suppression at (k=5, l=3):
    how much of each event stream survives the release gate."""
    qi = _events_with_qi(spark, sf_dir)
    return suppression_report(
        qi,
        ["event_type", "value_band", "day"],
        "user_id",
        report_col="event_type",
        k=_K,
        l_div=_L,
    )


SQL_SUPPRESSION = f"""
WITH qi AS (
    SELECT event_type,
           CAST(floor(value / {_BAND}) AS BIGINT) * {_BAND} AS value_band,
           CAST(ts AS DATE) AS day,
           user_id
    FROM events
),
census AS (
    SELECT event_type, value_band, day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CASE WHEN count(*) >= {_K}
                 AND count(DISTINCT user_id) >= {_L} THEN 1 ELSE 0 END AS ok
    FROM qi GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(sum(n_rows) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN ok = 1 THEN n_rows ELSE 0 END) AS BIGINT) AS n_retained,
       (CAST(sum(CASE WHEN ok = 1 THEN n_rows ELSE 0 END) AS BIGINT) * 1000000)
           // CAST(sum(n_rows) AS BIGINT) AS retained_share_e6
FROM census GROUP BY 1
"""

# -------------------------------------------------- generalization ladder

#: a NESTED hierarchy (each width divides the next), so every coarsening
#: step exactly merges the previous step's bands — group count is then
#: provably non-increasing and retention non-decreasing up the ladder
_WIDTHS = [10, 50, 250, 1000]
_TARGET_E6 = 900_000


def q_privacy_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive generalization search over a ladder of value-band widths:
    per width, the share of rows surviving the (k=5, l=3) gate, and the
    smallest width meeting the 90% retention target — one corpus pass
    (widths exploded into the group key), not one scan per width."""
    ev = load(spark, sf_dir, "events")
    qi = ev.select("event_type", F.to_date(event_ts()).alias("day"), "value", "user_id")
    return generalization_ladder(
        qi,
        ["event_type", "day"],
        "value",
        _WIDTHS,
        "user_id",
        k=_K,
        l_div=_L,
        target_share_e6=_TARGET_E6,
    )


_W_VALUES = ", ".join(f"({w})" for w in _WIDTHS)

SQL_GENERALIZATION = f"""
WITH widths(band_width) AS (VALUES {_W_VALUES}),
qi AS (
    SELECT event_type, CAST(ts AS DATE) AS day, value, user_id FROM events
),
expanded AS (
    SELECT w.band_width, qi.event_type, qi.day,
           CAST(floor(qi.value / w.band_width) AS BIGINT) * w.band_width
               AS value_band,
           qi.user_id
    FROM qi CROSS JOIN widths w
),
census AS (
    SELECT band_width, event_type, day, value_band,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive
    FROM expanded GROUP BY 1, 2, 3, 4
),
scored AS (
    SELECT band_width,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_rows) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN n_rows >= {_K} AND n_sensitive >= {_L}
                    THEN n_rows ELSE 0 END) AS BIGINT) AS n_retained,
           (CAST(sum(CASE WHEN n_rows >= {_K} AND n_sensitive >= {_L}
                     THEN n_rows ELSE 0 END) AS BIGINT) * 1000000)
               // CAST(sum(n_rows) AS BIGINT) AS retained_share_e6
    FROM census GROUP BY 1
),
best AS (
    SELECT min(band_width) AS bw FROM scored
    WHERE retained_share_e6 >= {_TARGET_E6}
)
SELECT CAST(band_width AS BIGINT) AS band_width,
       n_groups, n_total, n_retained, retained_share_e6,
       CAST(CASE WHEN retained_share_e6 >= {_TARGET_E6} THEN 1 ELSE 0 END AS BIGINT)
           AS meets_target,
       CAST(CASE WHEN band_width = (SELECT bw FROM best) THEN 1 ELSE 0 END AS BIGINT)
           AS chosen
FROM scored
"""

# ------------------------------------------------------- shard manifest

_N_SHARDS = 8
_SHARD_SALT = "shard"

# per-process export cache for q_corpus_shard_audit (ADVICE r10):
# (abs sf_dir, n_shards, salt) -> export dir
_AUDIT_EXPORT_CACHE: dict[tuple[str, int, str], str] = {}


def q_corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8-way hash-shard assignment over documents + the
    per-shard manifest (rows / whitespace tokens / chars / XOR checksum)."""
    docs = load(spark, sf_dir, "documents")
    assigned = assign_shards(docs, "doc_id", _N_SHARDS, salt=_SHARD_SALT)
    return shard_manifest(assigned, "shard_id", text_col="text")


_U_DOC = sql_hash_uniform("doc_id", salt=_SHARD_SALT)

SQL_SHARD_MANIFEST = f"""
WITH assigned AS (
    SELECT CAST(floor({_U_DOC} * {_N_SHARDS}) AS BIGINT) AS shard_id,
           text
    FROM documents
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS content_xor
FROM assigned GROUP BY 1
"""


# ------------------------------------------------------- shard export audit


def q_corpus_shard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run shard-export VERIFICATION: actually export the corpus as
    hash-sharded parquet, re-read the exported files, and prove per shard
    that the written manifest equals a manifest recomputed from what a
    loader would read back (counts + XOR checksum).

    This closes the export loop as a verified query surface: the Spark
    side performs a REAL ``write_training_shards`` round-trip (partitioned
    parquet write → partition-discovery re-read → independent
    ``shard_manifest`` recompute), so a dropped row, a corrupted file, a
    mis-assigned shard, or a lossy type round-trip in the export path
    diverges from the oracle (which pins the expected manifest values and
    all-ok verdicts from the source table). Scale shape: the write IS the
    one export shuffle (repartition on shard_id); both manifests are
    map-side-combined n_shards-key groupBys; the compare joins
    n_shards × n_shards rows.

    Temp-dir lifecycle (ADVICE r10): the export dir is cached per-process
    keyed on ``(sf_dir, n_shards, salt)`` — the first invocation pays the
    export write, repeated invocations in one session (bench warmup +
    timed rounds, the oracle-parity suite) reuse the same files instead
    of accumulating corpus-sized mkdtemp copies. The path is never
    deleted mid-process because earlier invocations' LAZY DataFrames
    still reference it (the driver evaluates later); one atexit reclaims
    it. Every evaluation still re-reads the exported files and recomputes
    the manifest — the verification round-trip is per-run, only the write
    is once-per-process (source parquet is immutable within a session).
    """
    import atexit
    import shutil
    import tempfile

    from ..operators.export import write_training_shards

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cache_key = (os.path.abspath(sf_dir), _N_SHARDS, _SHARD_SALT)
    path = _AUDIT_EXPORT_CACHE.get(cache_key)
    if path is None or not os.path.isdir(path):
        path = tempfile.mkdtemp(prefix="corpus_shard_audit_")
        atexit.register(shutil.rmtree, path, True)
        write_training_shards(docs, path, "doc_id", _N_SHARDS, salt=_SHARD_SALT)
        _AUDIT_EXPORT_CACHE[cache_key] = path

    written = spark.read.parquet(f"{path}/_manifest").select(
        "shard_id", "n_docs", "n_tokens", "n_chars", "content_xor"
    )
    reread = spark.read.parquet(f"{path}/data").withColumn(
        "shard_id", F.col("shard_id").cast("long")
    )
    recomputed = shard_manifest(reread, "shard_id", text_col="text").select(
        F.col("shard_id"),
        F.col("n_docs").alias("n_docs_reread"),
        F.col("n_tokens").alias("n_tokens_reread"),
        F.col("n_chars").alias("n_chars_reread"),
        F.col("content_xor").alias("content_xor_reread"),
    )
    return written.join(recomputed, "shard_id", "full").select(
        "shard_id",
        "n_docs",
        "n_tokens",
        "n_chars",
        "content_xor",
        "n_docs_reread",
        "n_tokens_reread",
        "n_chars_reread",
        "content_xor_reread",
        F.when(F.col("n_docs") == F.col("n_docs_reread"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("docs_ok"),
        F.when(F.col("content_xor") == F.col("content_xor_reread"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("xor_ok"),
    )


#: oracle: the export round-trip must reproduce the source-table manifest
#: exactly on both sides, every shard verified (ok = 1)
SQL_SHARD_AUDIT = f"""
WITH m AS (
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS content_xor
    FROM (
        SELECT CAST(floor({_U_DOC} * {_N_SHARDS}) AS BIGINT) AS shard_id, text
        FROM documents
    ) GROUP BY 1
)
SELECT shard_id, n_docs, n_tokens, n_chars, content_xor,
       n_docs AS n_docs_reread, n_tokens AS n_tokens_reread,
       n_chars AS n_chars_reread, content_xor AS content_xor_reread,
       CAST(1 AS BIGINT) AS docs_ok, CAST(1 AS BIGINT) AS xor_ok
FROM m
"""


GOVERNANCE_QUERIES = {
    "privacy_k_anonymity": (q_privacy_k_anonymity, SQL_K_ANONYMITY),
    "privacy_suppression": (q_privacy_suppression, SQL_SUPPRESSION),
    "privacy_generalization": (q_privacy_generalization, SQL_GENERALIZATION),
    "corpus_shard_manifest": (q_corpus_shard_manifest, SQL_SHARD_MANIFEST),
    "corpus_shard_audit": (q_corpus_shard_audit, SQL_SHARD_AUDIT),
}
