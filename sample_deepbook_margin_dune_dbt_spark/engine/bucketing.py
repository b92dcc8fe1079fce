"""Bucketed managed tables: the co-located (shuffle-free) join path.

At 100 TB, fact⋈fact joins on a shared key (orders ⋈ lineitem on orderkey;
events ⋈ events on user) should not shuffle both sides on every query.
Writing both tables bucketed on the join key — same bucket count — lets
Catalyst plan a SortMergeJoin whose children read bucket-aligned files with
NO Exchange. Bucketing is Spark's answer to the reference warehouse's
clustered Delta layout (SURVEY §2.1 S9's compaction is the file-level
cousin; bucketing adds the join-alignment guarantee).

Bucketed tables require the session catalog (``saveAsTable``), unlike the
path-based ``TableStore`` — the warehouse dir is
``spark.sql.warehouse.dir`` (``spark-warehouse/`` by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    by: list[str],
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the Sort from the
    SortMergeJoin children — the join degenerates to a streamed merge.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key (no shuffle planned)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def mirror_table_name(
    model_name: str, schema_suffix: str = "", store_root: str | None = None
) -> str:
    """Catalog name of a model's bucketed mirror (``bucket_by`` config):
    the store's schema suffix keeps dev/prod/PR mirrors isolated in the
    shared session catalog exactly as the path store isolates parquet,
    and ``store_root`` (ADVICE r12 item 1) keys the mirror to its
    WAREHOUSE as well — two TableStores with different roots and the
    same suffix would otherwise share one session-catalog mirror, so
    building against warehouse B silently overwrote warehouse A's
    mirror and ``read_mirror`` consumers could get fp_rows inconsistent
    with the store table they read. The root rides as a short content
    hash of its absolute path (catalog names can't hold slashes)."""
    import hashlib
    import os

    prefix = f"{schema_suffix}_" if schema_suffix else ""
    root_tag = ""
    if store_root is not None:
        digest = hashlib.md5(os.path.abspath(store_root).encode()).hexdigest()[:8]
        root_tag = f"_{digest}"
    return f"{prefix}{model_name}_bucketed{root_tag}"


def drop_bucketed_table(spark: SparkSession, table: str) -> None:
    """DROP a managed bucketed table AND its surviving warehouse dir —
    a fresh session's in-memory catalog forgets the table but the
    warehouse directory persists, and a later CTAS errors with
    LOCATION_ALREADY_EXISTS (the ``operators/dedup.py`` staging lesson)."""
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    stale = os.path.join(wh.removeprefix("file:"), table.lower())
    if os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)


def read_mirror(
    spark: SparkSession,
    model_name: str,
    schema_suffix: str = "",
    store_root: str | None = None,
) -> DataFrame | None:
    """The model's bucketed mirror as a DataFrame, or None if absent —
    consumers (the dedup self-join family) fall back to building the
    projection inline when no mirror is maintained. Pass the same
    ``store_root`` the building Runner's TableStore used (mirrors are
    warehouse-keyed; ADVICE r12 item 1)."""
    tbl = mirror_table_name(model_name, schema_suffix, store_root)
    if not spark.catalog.tableExists(tbl):
        return None
    return spark.table(tbl)
