"""Model registry: the engine's replacement for dbt's Jinja control plane.

Maps the reference's control-plane operators (SURVEY §2.9) onto plain Python:

- ``@model(...)``        ≈ ``{{ config(...) }}``          (C5)
- ``ctx.ref(name)``      ≈ ``{{ ref('name') }}``          (C1 — also declares
  the DAG edge; deps are declared statically on the decorator so the runner
  can topo-sort without executing builders)
- ``ctx.source(db, t)``  ≈ ``{{ source('db','t') }}``     (C2, with the
  database rebinding of ``macros/dune_dbt_overrides/source.sql`` replaced by
  the source catalog)
- ``ctx.is_incremental()``≈ ``is_incremental()``          (C3 — true iff the
  target table exists and we're not in full-refresh)
- ``ctx.this()``         ≈ ``{{ this }}``                 (C4 — the model's
  own previous materialization)
- ``ctx.now()``          ≈ ``now()``                      (F9 — injectable
  fixed clock so tests and golden hashes are deterministic)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .materialize import TableStore


@dataclass
class ModelConfig:
    name: str
    builder: Callable[["ModelContext"], DataFrame]
    unique_key: list[str] = field(default_factory=list)
    materialized: str = "incremental"  # 'incremental' | 'table'
    incremental_strategy: str = "merge"  # 'merge' | 'append' | 'insert_overwrite'
    # dbt's schema-drift contract for incremental MERGE models: 'ignore'
    # (reference default) | 'append_new_columns' | 'sync_all_columns' | 'fail'
    on_schema_change: str = "ignore"
    partition_by: list[str] | None = None
    deps: list[str] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)
    # declarative data tests (dbt generic tests; C9). The reference uses
    # only not_null; the other three standard dbt tests are supported for
    # the extended engine:
    not_null: list[str] = field(default_factory=list)
    # columns (or the unique_key combination) that must be unique
    unique: list[str] = field(default_factory=list)
    # column → allowed value list
    accepted_values: dict[str, list] = field(default_factory=dict)
    # (column, other_model, other_column): every non-null value must exist
    # in the referenced model's column (dbt `relationships`)
    relationships: list[tuple[str, str, str]] = field(default_factory=list)
    # maintenance post-hooks run after a successful build. None → the
    # Runner's profile default (prod: ['optimize', 'vacuum'], matching the
    # reference's target.name == 'prod' gate in
    # macros/dune_dbt_overrides/optimize_table.sql:1-6 / vacuum_table.sql:1-6);
    # a list (possibly empty) overrides per model.
    post_hooks: list[str] | None = None
    # range-clustering columns applied by the optimize post-hook (Delta
    # ZORDER/CLUSTER BY analog): files sort on these so parquet footer
    # min/max stats prune range scans
    cluster_by: list[str] = field(default_factory=list)
    # two-column Morton layout applied by the optimize post-hook (Delta
    # OPTIMIZE ZORDER BY analog; operators/zorder.py) — tight footer
    # stats on BOTH columns; mutually exclusive with cluster_by
    zorder_by: list[str] = field(default_factory=list)
    # dbt model contract (`contract: {enforced: true}` + per-column
    # data_type): column name → Spark DDL type string. When set, the
    # built DataFrame's schema must carry EXACTLY these columns with
    # these types (order-insensitive, both directions) or the build
    # fails BEFORE materializing — downstream consumers never see a
    # drifted schema.
    contract: dict[str, str] | None = None
    # dbt `description:` — surfaces in the manifest for docs/lineage;
    # a description edit counts as modified for state:modified (the
    # conservative CI behavior)
    description: str = ""
    # SCD2 snapshot node config (materialized='snapshot'; dbt `dbt
    # snapshot`): change-detection strategy + its per-strategy column(s)
    snapshot_strategy: str = "check"  # 'check' | 'timestamp'
    check_cols: list[str] = field(default_factory=list)
    updated_at: str | None = None
    invalidate_hard_deletes: bool = False
    # dbt `incremental_predicates`: SQL predicates over TARGET rows that
    # bound the merge's match scope. Rows outside the predicate window
    # are carried through untouched WITHOUT entering the key anti-join —
    # on a real lake this is what keeps a MERGE from scanning years of
    # target history. dbt's documented hazard applies identically: an
    # update whose key matches only an out-of-scope row is treated as
    # NOT MATCHED and inserted, so predicates must cover every window
    # the incremental build can emit.
    incremental_predicates: list[str] = field(default_factory=list)
    # r12: maintain a bucketed managed-table MIRROR of this model
    # (``<schema>_<name>_bucketed``, ``bucketBy(n_buckets, *bucket_by)
    # sortBy(*bucket_by)``) alongside the parquet store table. The
    # mirror is what makes self-joins on the bucket key plan
    # bucket-local (zero Exchange on the join — the PERF.md r11 Part B
    # shape, 1 Exchange total with the downstream groupBy); incremental
    # 'append' runs append only the new slice, so the projection build
    # amortizes across every consumer (the dedup family's
    # fingerprint self-join). Only 'table' and incremental 'append'
    # models can carry a mirror: MERGE/insert_overwrite rewrite
    # arbitrary rows, which an append-maintained mirror cannot track.
    bucket_by: list[str] = field(default_factory=list)
    n_buckets: int = 128


_REGISTRY: dict[str, ModelConfig] = {}


def model(
    name: str,
    unique_key: list[str] | None = None,
    materialized: str = "incremental",
    incremental_strategy: str = "merge",
    on_schema_change: str = "ignore",
    partition_by: list[str] | None = None,
    deps: list[str] | None = None,
    tags: list[str] | None = None,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    accepted_values: dict[str, list] | None = None,
    relationships: list[tuple[str, str, str]] | None = None,
    post_hooks: list[str] | None = None,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    contract: dict[str, str] | None = None,
    incremental_predicates: list[str] | None = None,
    description: str = "",
    bucket_by: list[str] | None = None,
    n_buckets: int = 128,
):
    """Register a model builder. The builder is ``(ctx) -> DataFrame``."""
    if materialized not in ("incremental", "table"):
        raise ValueError(
            f"model {name!r}: materialized={materialized!r}; expected "
            "'incremental' or 'table'"
        )
    if incremental_strategy not in ("merge", "append", "insert_overwrite"):
        # an unknown strategy must not silently materialize as merge
        raise ValueError(
            f"model {name!r}: incremental_strategy={incremental_strategy!r}; "
            "expected 'merge', 'append', or 'insert_overwrite'"
        )
    if incremental_strategy == "insert_overwrite" and not partition_by:
        raise ValueError(
            f"model {name!r}: insert_overwrite replaces whole partitions — "
            "partition_by is required"
        )
    if on_schema_change not in (
        "ignore", "append_new_columns", "sync_all_columns", "fail"
    ):
        raise ValueError(
            f"model {name!r}: on_schema_change={on_schema_change!r}; expected "
            "'ignore', 'append_new_columns', 'sync_all_columns', or 'fail'"
        )
    if cluster_by and zorder_by:
        raise ValueError(f"model {name!r}: choose cluster_by OR zorder_by, not both")
    if zorder_by and len(zorder_by) != 2:
        raise ValueError(f"model {name!r}: zorder_by takes exactly two columns")
    if incremental_predicates and incremental_strategy != "merge":
        raise ValueError(
            f"model {name!r}: incremental_predicates only apply to the "
            "'merge' strategy"
        )
    if bucket_by:
        if n_buckets < 1:
            raise ValueError(f"model {name!r}: n_buckets must be >= 1")
        if materialized == "incremental" and incremental_strategy != "append":
            raise ValueError(
                f"model {name!r}: bucket_by mirrors are append-maintained; "
                "MERGE/insert_overwrite rewrite rows the mirror cannot "
                "track — use materialized='table' or "
                "incremental_strategy='append'"
            )

    def deco(fn: Callable[["ModelContext"], DataFrame]):
        _REGISTRY[name] = ModelConfig(
            name=name,
            builder=fn,
            unique_key=unique_key or [],
            materialized=materialized,
            incremental_strategy=incremental_strategy,
            on_schema_change=on_schema_change,
            partition_by=partition_by,
            deps=deps or [],
            tags=tags or [],
            not_null=not_null or [],
            unique=unique or [],
            accepted_values=accepted_values or {},
            relationships=relationships or [],
            post_hooks=post_hooks,
            cluster_by=cluster_by or [],
            zorder_by=zorder_by or [],
            contract=contract,
            incremental_predicates=incremental_predicates or [],
            description=description,
            bucket_by=bucket_by or [],
            n_buckets=n_buckets,
        )
        return fn

    return deco


def snapshot(
    name: str,
    unique_key: list[str],
    strategy: str = "check",
    check_cols: list[str] | None = None,
    updated_at: str | None = None,
    invalidate_hard_deletes: bool = False,
    deps: list[str] | None = None,
    tags: list[str] | None = None,
    post_hooks: list[str] | None = None,
    description: str = "",
):
    """Register an SCD2 snapshot node (dbt ``{% snapshot %}`` / the
    ``dbt snapshot`` command; reference scaffold ``dbt_project.yml``
    ``snapshot-paths``). The builder returns the source's CURRENT state;
    the runner folds it into the ``(…, valid_from, valid_to)`` history
    table via ``engine.snapshots.snapshot_scd2``. Snapshot nodes live in
    the same registry/DAG as models — selectors, manifest, run-results,
    and ``build`` all see them — and are never dropped by
    ``--full-refresh`` (history is the point; dbt behaves the same).
    """
    if not unique_key:
        raise ValueError(f"snapshot {name!r}: unique_key is required")
    if strategy not in ("check", "timestamp"):
        raise ValueError(
            f"snapshot {name!r}: strategy={strategy!r}; expected 'check' or 'timestamp'"
        )
    if strategy == "check" and not check_cols:
        raise ValueError(f"snapshot {name!r}: strategy='check' requires check_cols")
    if strategy == "timestamp" and not updated_at:
        raise ValueError(f"snapshot {name!r}: strategy='timestamp' requires updated_at")

    def deco(fn: Callable[["ModelContext"], DataFrame]):
        _REGISTRY[name] = ModelConfig(
            name=name,
            builder=fn,
            unique_key=list(unique_key),
            materialized="snapshot",
            deps=deps or [],
            tags=tags or [],
            post_hooks=post_hooks if post_hooks is not None else [],
            snapshot_strategy=strategy,
            check_cols=check_cols or [],
            updated_at=updated_at,
            invalidate_hard_deletes=invalidate_hard_deletes,
            description=description,
        )
        return fn

    return deco


@dataclass
class ExposureConfig:
    """dbt exposure: a declared DOWNSTREAM consumer of the DAG (a
    dashboard, an ML training job, an export feed). Metadata-only — it
    never executes — but it appears in the manifest for lineage tools
    and is selectable (``exposure:<name>`` resolves to its upstream
    closure), so CI can rebuild exactly what a consumer reads."""

    name: str
    depends_on: list[str]
    type: str = "application"  # dbt: dashboard|notebook|analysis|ml|application
    owner: str = ""
    url: str = ""
    description: str = ""


_EXPOSURES: dict[str, ExposureConfig] = {}

_EXPOSURE_TYPES = ("dashboard", "notebook", "analysis", "ml", "application")


def exposure(
    name: str,
    depends_on: list[str],
    type: str = "application",
    owner: str = "",
    url: str = "",
    description: str = "",
) -> ExposureConfig:
    """Register a dbt-style exposure; returns its config."""
    if not depends_on:
        raise ValueError(f"exposure {name!r}: depends_on must be non-empty")
    if type not in _EXPOSURE_TYPES:
        raise ValueError(
            f"exposure {name!r}: type={type!r}; expected one of {_EXPOSURE_TYPES}"
        )
    missing = [d for d in depends_on if d not in _REGISTRY]
    if missing:
        raise ValueError(
            f"exposure {name!r}: depends_on names unregistered model(s) {missing}"
        )
    cfg = ExposureConfig(
        name=name, depends_on=list(depends_on), type=type,
        owner=owner, url=url, description=description,
    )
    _EXPOSURES[name] = cfg
    return cfg


def all_exposures() -> dict[str, ExposureConfig]:
    return dict(_EXPOSURES)


# common spellings → Spark simpleString() canonical names, so a contract
# can say 'long' for what simpleString reports as 'bigint'
_TYPE_ALIASES = {
    "long": "bigint",
    "integer": "int",
    "short": "smallint",
    "byte": "tinyint",
    "bool": "boolean",
}


def _canon_type(t: str) -> str:
    t = t.strip().lower().replace(" ", "")
    return _TYPE_ALIASES.get(t, t)


def enforce_contract(df: DataFrame, contract: dict[str, str], model_name: str) -> None:
    """dbt model-contract check: the DataFrame must carry exactly the
    contracted columns with the contracted types. Schema-only — no job
    runs; the check happens before any materialization so a violated
    contract never reaches storage. Raises ``ValueError`` listing every
    violation at once (missing / extra / mistyped)."""
    actual = {f.name: _canon_type(f.dataType.simpleString()) for f in df.schema.fields}
    want = {c: _canon_type(t) for c, t in contract.items()}
    problems = []
    for col, typ in want.items():
        if col not in actual:
            problems.append(f"missing contracted column {col!r} ({typ})")
        elif actual[col] != typ:
            problems.append(
                f"column {col!r} is {actual[col]}, contract says {typ}"
            )
    for col in actual:
        if col not in want:
            problems.append(f"uncontracted column {col!r} in model output")
    if problems:
        raise ValueError(
            f"model {model_name!r} violates its contract: " + "; ".join(problems)
        )


def get_model(name: str) -> ModelConfig:
    return _REGISTRY[name]


def all_models() -> dict[str, ModelConfig]:
    return dict(_REGISTRY)


def clear_registry() -> None:
    _REGISTRY.clear()


class ModelContext:
    """Execution context handed to each model builder."""

    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        sources: dict[str, str],
        current: ModelConfig,
        full_refresh: bool = False,
        fixed_now: Optional[datetime] = None,
        backfill_days: int = 30,
        lookback_days: int = 7,
        lag_widen_days: int = 0,
        vars: dict[str, object] | None = None,
        defer_store: Optional[TableStore] = None,
    ):
        self.spark = spark
        self.store = store
        # dbt --defer: refs not materialized HERE fall back to another
        # environment's warehouse (a dev build of one model reads its
        # unbuilt upstreams from prod instead of rebuilding the world)
        self.defer_store = defer_store
        self._sources = sources
        self.current = current
        self.full_refresh = full_refresh
        self.fixed_now = fixed_now
        self._vars = dict(vars or {})
        # reference time-bounding knobs (BASELINE.md): 30-day first-run
        # backfill, 7-day late-data lookback
        self.backfill_days = backfill_days
        self.lookback_days = lookback_days
        # W3 slice-lag remedy (SURVEY §2.5 caveat): incremental models that
        # lag() over their output can widen their INPUT window by this many
        # days below the lookback floor and trim the extra days after the
        # window, so the slice's first in-window day sees its true
        # predecessor instead of NULL. 0 (default) reproduces the
        # reference's incremental behavior exactly.
        self.lag_widen_days = lag_widen_days

    # --------------------------------------------------------------- dbt-isms

    def source(self, database: str, table: str) -> DataFrame:
        key = f"{database}.{table}"
        if key not in self._sources:
            raise KeyError(f"source {key!r} not registered (have: {sorted(self._sources)})")
        spec = self._sources[key]
        if isinstance(spec, str):  # plain parquet path (the common case)
            return self.spark.read.parquet(spec)
        # SourceCatalog-style spec: {"path", "format", "schema", "options"}
        reader = self.spark.read.format(spec.get("format", "parquet")).options(
            **spec.get("options", {})
        )
        if spec.get("schema"):
            reader = reader.schema(spec["schema"])
        return reader.load(spec["path"])

    def ref(
        self,
        name: str,
        as_of: float | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """dbt ``ref()``; on a versioned store it additionally accepts the
        Delta time-travel selectors (``SELECT … TIMESTAMP AS OF`` /
        ``VERSION AS OF`` — the "build against yesterday's upstream"
        move): ``as_of`` (epoch seconds) or ``version``. On a plain store
        a time-travel request fails loudly rather than silently reading
        the current table."""
        if name not in self.current.deps:
            raise ValueError(
                f"model {self.current.name!r} refs {name!r} but does not declare it in deps"
            )
        if as_of is not None or version is not None:
            try:
                return self.store.read(name, version=version, as_of_ts=as_of)
            except TypeError:
                raise ValueError(
                    f"ref({name!r}, as_of/version=…) requires a versioned "
                    "store (run with --versioned); the plain TableStore "
                    "keeps no history"
                ) from None
        if (
            self.defer_store is not None
            and not self.store.exists(name)
            and self.defer_store.exists(name)
        ):
            return self.defer_store.read(name)
        return self.store.read(name)

    def var(self, name: str, default=None):
        """dbt ``var()``: project-level variable with an optional default
        (``Runner(vars={...})`` / CLI ``--vars k=v``)."""
        return self._vars.get(name, default)

    def is_incremental(self) -> bool:
        return (not self.full_refresh) and self.store.exists(self.current.name)

    def this(self) -> DataFrame:
        return self.store.read(self.current.name)

    # ------------------------------------------------------------------ clock

    def now(self) -> F.Column:
        """``now()`` as a Column; fixed for deterministic tests (F9 caveat)."""
        if self.fixed_now is not None:
            return F.lit(self.fixed_now).cast("timestamp")
        return F.current_timestamp()

    def now_dt(self) -> datetime:
        return self.fixed_now or datetime.now(timezone.utc)

    # ------------------------------------------------- incremental predicates

    def watermark_ms(self, column: str = "timestamp_ms") -> int:
        """``select coalesce(max(col), 0) from {{ this }}`` (SURVEY §2.2 P4/A2).

        A scalar aggregate over the target — one column scanned, footer-level
        min/max at parquet/Delta level make this cheap even on huge tables.
        """
        row = self.this().agg(F.max(F.col(column)).alias("wm")).first()
        return int(row["wm"]) if row["wm"] is not None else 0

    def backfill_floor_ms(self) -> int:
        """First-run bound: ``to_unixtime(now() - interval '30' day) * 1000``
        (SURVEY §2.2 P5; reference ``deepbook_margin_loan_borrowed.sql:24``)."""
        return int(self.now_dt().timestamp() * 1000) - self.backfill_days * 86400_000

    def lookback_floor_date(self, date_column: str = "snapshot_date"):
        """``select date_add('day', -7, max(snapshot_date)) from {{ this }}``
        (SURVEY §2.2 P6). Returns a python date or None when target is empty."""
        row = (
            self.this()
            .agg(F.date_sub(F.max(F.col(date_column)), self.lookback_days).alias("floor"))
            .first()
        )
        return row["floor"]

    def lag_input_floor_date(self, floor_date):
        """The widened input bound for lag()-bearing incremental models:
        ``floor_date - lag_widen_days`` (or ``floor_date`` unchanged when
        widening is off / the target is empty). Rows in the widened margin
        exist only to seed the lag window; trim them with
        ``trim_to_floor`` before returning."""
        if floor_date is None or self.lag_widen_days <= 0:
            return floor_date
        return floor_date - timedelta(days=self.lag_widen_days)

    def trim_to_floor(self, df: DataFrame, floor_date, date_column: str) -> DataFrame:
        """Drop the widened lag-seed margin: keep rows ≥ the true floor."""
        if floor_date is None or self.lag_widen_days <= 0:
            return df
        return df.filter(F.col(date_column) >= F.lit(floor_date))
