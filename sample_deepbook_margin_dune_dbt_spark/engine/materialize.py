"""Incremental MERGE materialization over parquet table directories.

Replaces the reference's dbt-trino incremental materializations (SURVEY §2.1
S6-S10; reference config blocks e.g.
``models/deepbook_margin/daily/fct_deepbook_margin_pool_daily.sql:1-8``
``materialized='incremental', unique_key=[...], incremental_strategy='merge'``).

Design for scale
----------------
The MERGE here is an **upsert on a composite natural key**. Without Delta Lake
in the environment, a table is a parquet directory and MERGE is expressed as::

    kept = old.join(new, on=unique_key, how="left_anti")   # rows not replaced
    result = kept.unionByName(new)

Two physical strategies, chosen by whether the table is partitioned:

1. **Partitioned tables** (e.g. a fact partitioned by ``snapshot_date``):
   only the partitions *touched by new data* are read back and rewritten,
   using Spark's dynamic partition overwrite. New data for 7 days out of 5
   years rewrites 7 partitions, not the table. This is the strategy that
   holds at 100 TB — the rewrite cost is proportional to the incremental
   slice, not the table size. (Equivalent of Delta's MERGE file-pruning /
   Hive dynamic-partition insert-overwrite.)

2. **Unpartitioned tables**: full anti-join + atomic directory swap. Fine for
   dimension-sized tables; incremental *fact* tables should declare
   ``partition_by``.

On a cluster with Delta/Iceberg available, ``TableStore`` is the single seam
to swap: ``merge`` becomes ``MERGE INTO target USING updates ON <keys> WHEN
MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` and
``optimize``/``vacuum`` become the native table operations (reference
post-hooks ``macros/dune_dbt_overrides/optimize_table.sql:3``,
``vacuum_table.sql:3``).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _split_merge_scope(
    old: DataFrame, incremental_predicates: list[str] | None
) -> tuple[DataFrame, DataFrame | None]:
    """Split target rows into (in-scope, out-of-scope) under dbt-style
    ``incremental_predicates``. Out-of-scope rows (predicate false OR
    NULL, per SQL MERGE match semantics) bypass the key anti-join
    entirely — that bypass IS the scan-bounding the config exists for.
    Returns ``(old, None)`` when no predicates are configured.
    """
    if not incremental_predicates:
        return old, None
    scope = None
    for p in incremental_predicates:
        cond = F.expr(p)
        scope = cond if scope is None else (scope & cond)
    in_scope = F.coalesce(scope, F.lit(False))
    return old.filter(in_scope), old.filter(~in_scope)


def _touched_partition_predicate(touched_rows, partition_by: list[str]) -> F.Column:
    """OR-of-ANDs predicate selecting exactly the touched partitions.

    Uses NULL-SAFE equality (``<=>``): a NULL partition value lands in
    Hive's ``__HIVE_DEFAULT_PARTITION__`` directory and must select that
    partition's existing rows into the merge slice — plain ``=`` never
    matches NULL, which would exclude the null partition from the
    old-slice read while the new snapshot still overwrites (or, in the
    versioned store, skip-links) its directory, silently dropping every
    non-updated key there (ADVICE r10). Catalyst prunes partitions on
    ``EqualNullSafe`` the same as on ``EqualTo``, so the predicate still
    reaches the scan as partition pruning.
    """
    pred = None
    for row in touched_rows:
        clause = None
        for c in partition_by:
            cond = F.col(c).eqNullSafe(F.lit(row[c]))
            clause = cond if clause is None else (clause & cond)
        pred = clause if pred is None else (pred | clause)
    return pred


class TableStore:
    """A named-table store rooted at a directory; tables are parquet dirs.

    The store plays the role of the warehouse the reference writes into
    (Dune's ``delta_prod`` Delta Lake; SURVEY §2.1 S4/S11). ``schema_suffix``
    reproduces the reference's dev/prod/PR schema isolation
    (``macros/dune_dbt_overrides/get_custom_schema.sql:9-24``).
    """

    def __init__(self, spark: SparkSession, root: str, schema_suffix: str = ""):
        self.spark = spark
        self.root = root
        self.schema_suffix = schema_suffix
        os.makedirs(self._base(), exist_ok=True)

    def _base(self) -> str:
        return os.path.join(self.root, self.schema_suffix) if self.schema_suffix else self.root

    def path(self, name: str) -> str:
        return os.path.join(self._base(), name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        # a dir containing only _SUCCESS/_temporary is not a table yet
        return any(
            f.endswith(".parquet") or ("=" in f and os.path.isdir(os.path.join(p, f)))
            for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    # ------------------------------------------------------------------ sinks

    def _has_partition_dirs(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            "=" in f and os.path.isdir(os.path.join(p, f)) for f in os.listdir(p)
        )

    def write_full(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        op: str = "overwrite",
    ) -> None:
        """CREATE TABLE AS (first run / full refresh; SURVEY §2.1 S7, C8).

        Writes to a staging dir then atomically swaps, so a failed job never
        leaves a half-written table (the reference gets this from Trino CTAS
        atomicity).

        ``op`` labels what the full rewrite IS semantically ("merge",
        "replace_scope", "optimize", …); the plain store ignores it, the
        versioned store records it in the commit manifest so the history
        can distinguish a MERGE that took the full-rewrite path from a
        user full refresh (ADVICE r10).

        Empty-input edge: a *partitioned* write of zero rows produces no
        files at all (no partition dirs, no schema), which would leave a
        schema-less unreadable table. Zero-row inputs are therefore written
        unpartitioned — one empty, schema-bearing parquet file — and the
        table upgrades to the partitioned layout on the first non-empty
        write (``merge`` detects the actual layout on disk).
        """
        staging = self.path(f".staging-{name}-{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if partition_by and not df.isEmpty():
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        final = self.path(name)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(staging, final)

    def append(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        """Pure insert-append incremental (SURVEY §2.1 S8)."""
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))

    def merge(
        self,
        updates: DataFrame,
        name: str,
        unique_key: list[str],
        partition_by: list[str] | None = None,
        on_schema_change: str = "ignore",
        incremental_predicates: list[str] | None = None,
    ) -> None:
        """Upsert ``updates`` into table ``name`` on ``unique_key`` (S6).

        ``incremental_predicates`` (dbt's config of the same name) bound
        the TARGET side of the match: only target rows satisfying every
        predicate enter the key anti-join; the rest are carried through
        untouched without being compared. On a lake engine this is the
        knob that stops a MERGE from scanning years of target history
        (the predicates ride into the target scan as partition/file
        pruning). dbt's hazard is reproduced faithfully: an update whose
        key matches only an out-of-scope row counts as NOT MATCHED and
        is inserted — predicates must cover every window the build can
        emit. NULL-valued predicates count as out-of-scope (SQL MERGE
        match semantics).

        Semantics match dbt-trino's merge strategy: rows whose key matches an
        incoming row are replaced wholesale; new keys are inserted; rows
        outside the incoming key set are untouched. If ``updates`` contains
        several rows for one key, all are kept (same as the reference, whose
        MERGE sources are already key-unique by construction).

        ``on_schema_change`` mirrors dbt's contract for schema drift:
        ``'ignore'`` (default, the reference's effective setting) drops
        NEW source columns; ``'append_new_columns'`` widens the target
        for them, NULL-backfilling existing rows; ``'sync_all_columns'``
        additionally DROPS target columns the source no longer carries
        (full two-way sync — the one mode where a column missing from
        ``updates`` is legal); ``'fail'`` raises on any new column. Under
        every other mode a column MISSING from ``updates`` errors, as in
        dbt. A schema-altering merge always takes the full-rewrite path,
        even on partitioned tables — rewriting only the touched
        partitions would leave the directory with mixed file schemas,
        and a plain parquet read samples one footer (silently dropping
        the new column for readers without ``mergeSchema``). A lake
        format with real schema metadata (the Delta seam) alters without
        the rewrite.
        """
        modes = ("ignore", "append_new_columns", "fail", "sync_all_columns")
        if on_schema_change not in modes:
            # a typo must not silently behave as 'ignore' and drop columns
            raise ValueError(
                f"unsupported on_schema_change={on_schema_change!r}; "
                f"expected one of {modes}"
            )
        if not self.exists(name):
            self.write_full(updates, name, partition_by)
            return

        old0 = self.read(name)
        new_fields = [
            f for f in updates.schema.fields if f.name not in set(old0.columns)
        ]
        if new_fields and on_schema_change == "fail":
            raise ValueError(
                f"schema change on {name}: new column(s) "
                f"{[f.name for f in new_fields]} with on_schema_change='fail'"
            )
        sync = on_schema_change == "sync_all_columns"
        gone_cols = (
            [c for c in old0.columns if c not in set(updates.columns)] if sync else []
        )
        if any(k in gone_cols for k in unique_key):
            raise ValueError(
                f"sync_all_columns would drop unique_key column(s) "
                f"{[k for k in unique_key if k in gone_cols]} from {name}"
            )
        widen = bool(new_fields) and on_schema_change in (
            "append_new_columns",
            "sync_all_columns",
        )
        altering = widen or bool(gone_cols)

        if partition_by and self._has_partition_dirs(name) and not altering:
            self._merge_partitioned(
                updates, name, unique_key, partition_by, incremental_predicates
            )
        else:
            # unpartitioned layout (incl. a table created empty that now
            # receives its first real rows) or a schema-altering merge:
            # full rewrite, upgrading to the partitioned layout when declared
            old = old0.drop(*gone_cols) if gone_cols else old0
            if widen:
                for f in new_fields:
                    old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
            old, out_scope = _split_merge_scope(old, incremental_predicates)
            kept = old.join(updates.select(*unique_key).distinct(), on=unique_key, how="left_anti")
            result = kept.unionByName(updates.select(*old.columns))
            if out_scope is not None:
                result = out_scope.unionByName(result)
            # full rewrite; write_full stages then swaps, so the result
            # (which reads the current table files) materializes before
            # the old directory is replaced
            self.write_full(result, name, partition_by, op="merge")

    def replace_scope(
        self,
        updates: DataFrame,
        name: str,
        scope_keys: DataFrame,
        key_cols: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """Delete-then-insert within a key scope, in ONE rewrite: drop every
        existing row whose ``key_cols`` tuple appears in ``scope_keys``,
        then insert ``updates`` (whose rows must lie inside the scope).

        This is the sink primitive for derived per-key DETAIL tables whose
        row COUNT per key can shrink: a plain MERGE keyed on (id, detail)
        upserts matching rows but cannot remove superseded ones — e.g. a
        re-dropped document whose new text has fewer contaminated spans
        would keep stale span rows forever (ADVICE r8,
        ``streaming/dedup.py::stream_decontaminate``). Scoped
        delete+insert keeps the table exactly equal to "recompute the
        detail for these keys", which is what makes an at-least-once
        foreachBatch replay idempotent.
        """
        if not self.exists(name):
            self.write_full(updates, name, partition_by)
            return
        old = self.read(name)
        kept = old.join(
            scope_keys.select(*key_cols).distinct(), on=key_cols, how="left_anti"
        )
        result = kept.unionByName(updates.select(*old.columns))
        # full rewrite via write_full's staging swap (same constraint as
        # merge: cannot stream onto the directory being read)
        self.write_full(result, name, partition_by, op="replace_scope")

    def insert_overwrite(
        self,
        updates: DataFrame,
        name: str,
        partition_by: list[str],
    ) -> None:
        """dbt's third incremental strategy: replace every partition
        present in ``updates`` WHOLESALE, leave the rest untouched.

        No key matching at all — the unit of idempotency is the
        partition, which is why this beats MERGE for append-mostly daily
        data at 100 TB: the writer streams straight to the touched
        directories (no anti-join, no old-slice read), and re-running a
        day reproduces it exactly. The trade: ``updates`` must carry the
        COMPLETE new content of each touched partition (a partial slice
        silently drops that partition's other rows — dbt's documented
        contract for the strategy).
        """
        if not partition_by:
            raise ValueError("insert_overwrite requires partition_by")
        if not self.exists(name):
            self.write_full(updates, name, partition_by)
            return
        # same data-loss guard as the partitioned MERGE: only DYNAMIC
        # mode scopes the overwrite to the partitions actually written
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            updates.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(self.path(name))
        )

    def _merge_partitioned(
        self,
        updates: DataFrame,
        name: str,
        unique_key: list[str],
        partition_by: list[str],
        incremental_predicates: list[str] | None = None,
    ) -> None:
        """Partition-pruned upsert: rewrite only partitions present in ``updates``.

        1. Collect the (small) set of touched partition values from the
           incremental slice — bounded by the lookback window, never by table
           size.
        2. Read ONLY those partitions of the existing table (partition
           pruning via filter on partition columns).
        3. Anti-join old-slice against new keys, union with new rows.
        4. ``INSERT OVERWRITE`` with dynamic partition overwrite — untouched
           partitions are not rewritten.
        """
        updates = updates.persist()
        touched = updates.select(*partition_by).distinct().collect()
        if not touched:
            updates.unpersist()
            return
        pred = _touched_partition_predicate(touched, partition_by)

        old_slice = self.read(name).filter(pred)
        old_slice, out_scope = _split_merge_scope(old_slice, incremental_predicates)
        kept = old_slice.join(
            updates.select(*unique_key).distinct(), on=unique_key, how="left_anti"
        )
        result = kept.unionByName(updates.select(*old_slice.columns))
        if out_scope is not None:
            result = out_scope.unionByName(result)
        # Dynamic partition overwrite can't read and overwrite the same files in
        # one job; stage the merged slice first (slice-sized, not table-sized).
        staging = self.path(f".staging-{name}-{uuid.uuid4().hex[:8]}")
        result.write.mode("overwrite").parquet(staging)
        merged_slice = self.spark.read.parquet(staging)
        # The overwrite below is only partition-scoped under DYNAMIC
        # partition-overwrite; Spark's default is STATIC, under which this
        # write would silently DELETE every untouched partition. get_spark()
        # sets the conf, but TableStore must not trust its session's
        # provenance — pin it here (runtime-settable) so a caller-supplied
        # vanilla session can't turn an incremental merge into data loss.
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            merged_slice.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(self.path(name))
        )
        shutil.rmtree(staging)
        updates.unpersist()

    # ------------------------------------------------------------ maintenance

    def file_count(self, name: str) -> int:
        """Number of data files in the table (walked from the directory —
        no Spark job, no RDD conversion)."""
        total = 0
        for _root, _dirs, files in os.walk(self.path(name)):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    def partition_cols(self, name: str) -> list[str]:
        """Partition columns inferred from the on-disk ``col=value`` layout."""
        cols: list[str] = []
        p = self.path(name)
        while True:
            subs = [f for f in os.listdir(p) if "=" in f and os.path.isdir(os.path.join(p, f))]
            if not subs:
                return cols
            cols.append(subs[0].split("=")[0])
            p = os.path.join(p, subs[0])

    def optimize(
        self,
        name: str,
        target_files: int | None = None,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> None:
        """File compaction (reference prod post-hook ``optimize_table.sql:1-6``,
        gated to the prod target there and to the Runner's prod profile here).

        Without Delta's OPTIMIZE, compaction = rewrite at a chosen file
        count, derived from the on-disk file count (a directory walk — not
        an RDD conversion, which would spin up a job just to pick a
        number). Partitioned tables keep their layout: rows are
        re-clustered on the partition columns so each partition compacts
        to one file under dynamic partition overwrite.

        ``cluster_by`` is the Delta ``ZORDER``/``CLUSTER BY`` analog for
        range predicates: unpartitioned tables range-partition on the
        cluster columns and every file sorts on them, so each file covers
        a tight, near-disjoint min/max range and parquet footer stats
        prune whole files/row-groups on ``col BETWEEN``-style scans — the
        data-skipping layer that matters most at 100 TB. Partitioned
        tables keep their partition layout and sort within it.

        ``zorder_by`` (exactly two non-negative integer columns) is the
        multi-dimensional variant — Delta's ``OPTIMIZE ... ZORDER BY``:
        files lay out along the Morton curve of both columns
        (``operators/zorder.py``), so footer stats stay tight on BOTH
        dimensions instead of only the leading sort column. Mutually
        exclusive with ``cluster_by`` (one layout per table).
        """
        if not self.exists(name):
            return
        if cluster_by and zorder_by:
            raise ValueError("choose cluster_by OR zorder_by, not both")
        df = self.read(name)
        n = target_files or max(1, self.file_count(name) // 8)
        parts = self.partition_cols(name)
        if zorder_by:
            from ..operators.zorder import zvalue

            if len(zorder_by) != 2:
                raise ValueError("zorder_by takes exactly two columns")
            # zvalue interleaves the LOW bits only, so raw columns whose
            # range exceeds 2^bits would wrap (value mod 2^bits) and the
            # layout would silently degenerate. Normalize both columns
            # into [0, 2^bits) from their observed min/max first — one
            # scalar agg (footer-cheap), integer arithmetic throughout.
            bits = 10
            xc, yc = zorder_by
            b = df.agg(
                F.min(F.col(xc).cast("long")).alias("x0"),
                F.max(F.col(xc).cast("long")).alias("x1"),
                F.min(F.col(yc).cast("long")).alias("y0"),
                F.max(F.col(yc).cast("long")).alias("y1"),
            ).first()

            def _scaled(c: str, lo, hi) -> F.Column:
                if lo is None:  # all-null column: constant key
                    return F.lit(0).cast("long")
                span = max(1, int(hi) - int(lo))
                return F.expr(
                    f"CAST((CAST(`{c}` AS BIGINT) - {int(lo)}) * "
                    f"{(1 << bits) - 1} DIV {span} AS BIGINT)"
                )

            cluster = [
                zvalue(
                    _scaled(xc, b["x0"], b["x1"]),
                    _scaled(yc, b["y0"], b["y1"]),
                    bits,
                ).alias("_zval")
            ]
        else:
            cluster = [F.col(c) for c in (cluster_by or [])]
        if parts:
            out = df.repartition(n, *[F.col(c) for c in parts])
            if cluster:
                out = out.sortWithinPartitions(*[F.col(c) for c in parts], *cluster)
            self.write_full(out, name, parts, op="optimize")
        else:
            if cluster:
                out = df.repartitionByRange(n, *cluster).sortWithinPartitions(*cluster)
            else:
                out = df.repartition(n)
            self.write_full(out, name, op="optimize")

    def vacuum(self, name: str, retain_hours: int = 168) -> None:
        """Snapshot cleanup (reference ``vacuum_table.sql:1-6``).

        Parquet dirs have no snapshots; clean stray staging dirs older than
        the retention window.
        """
        cutoff = time.time() - retain_hours * 3600
        base = self._base()
        for f in os.listdir(base):
            p = os.path.join(base, f)
            if f.startswith(".staging-") and os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)

    def drop(self, name: str) -> None:
        p = self.path(name)
        if os.path.isdir(p):
            shutil.rmtree(p)

    # --------------------------------------------------------------- ad hoc

    def tables(self) -> list[str]:
        base = self._base()
        return sorted(
            f for f in os.listdir(base)
            if not f.startswith(".") and self.exists(f)  # readable tables only
        )

    def register_views(self) -> list[str]:
        """Register every materialized table as a temp view for spark.sql —
        the ad-hoc SELECT layer (reference lifecycle entry point 3:
        ``dbt show --inline`` / Dune UI queries, ``DEVELOPMENT.md:149-151``)."""
        names = self.tables()
        for name in names:
            self.read(name).createOrReplaceTempView(name)
        return names

    def sql(self, query: str) -> DataFrame:
        """Run ad-hoc SQL over the registered warehouse tables."""
        self.register_views()
        return self.spark.sql(query)
