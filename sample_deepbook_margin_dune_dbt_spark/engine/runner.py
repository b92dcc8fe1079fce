"""DAG runner: topo-sort, graph-closure selection, full refresh.

Replaces ``dbt run --select +model`` / ``--full-refresh``
(SURVEY §2.9 C7/C8; reference ``README.md:46``, ``DEVELOPMENT.md:156-160``).
"""

from __future__ import annotations

from datetime import datetime
from graphlib import TopologicalSorter
from typing import Optional

from pyspark.sql import SparkSession

from .materialize import TableStore
from .model import ModelConfig, ModelContext, all_models, enforce_contract


class Runner:
    #: post-hooks applied by profile when a model doesn't override them.
    #: Mirrors the reference, which optimizes + vacuums every table/
    #: incremental model after a prod build and skips both elsewhere
    #: (macros/dune_dbt_overrides/optimize_table.sql:2, vacuum_table.sql:2).
    PROFILE_POST_HOOKS = {"prod": ["optimize", "vacuum"]}

    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        sources: dict[str, str],
        fixed_now: Optional[datetime] = None,
        backfill_days: int = 30,
        lookback_days: int = 7,
        profile: str = "dev",
        vacuum_retain_hours: int = 168,  # the reference's '7d'
        lag_widen_days: int = 0,
        vars: dict[str, object] | None = None,
        state: Optional[str] = None,
        defer_store: Optional[TableStore] = None,
    ):
        self.spark = spark
        self.store = store
        #: dbt --defer: refs not materialized in this warehouse read from
        #: this fallback store (a prod environment) instead of failing
        self.defer_store = defer_store
        self.sources = sources
        self.fixed_now = fixed_now
        self.backfill_days = backfill_days
        self.lookback_days = lookback_days
        self.profile = profile
        self.vacuum_retain_hours = vacuum_retain_hours
        self.lag_widen_days = lag_widen_days
        #: dbt --vars: project-level variables handed to builders via
        #: ctx.var(name, default)
        self.vars = dict(vars or {})
        #: dbt --state: path to a prior manifest.json for state:modified
        self.state = state
        #: per-model outcomes of the most recent run() (see _run_one)
        self.last_run_results: list[dict] = []

    # ------------------------------------------------------------- selection

    def _closure(
        self,
        select: str | list[str] | None,
        exclude: str | list[str] | None = None,
    ) -> list[str]:
        """Resolve dbt-style selector(s) to an execution-ordered model list.

        ``None`` → all models; ``'+name'`` → name plus upstream closure;
        ``'name+'`` → name plus downstream closure (everything that
        depends on it — the rebuild-after-a-fix selector); ``'tag:x'`` →
        models carrying the tag; ``'name'`` → just that model; a list
        unions each selector's set. ``exclude`` takes the same selector
        syntax and removes its resolved set AFTER selection (dbt
        ``--exclude``); excluding a dependency of a still-selected model
        is allowed — the dependent reads whatever materialization the
        excluded model last produced, exactly dbt's semantics.
        """
        wanted = self._resolve(select)
        if exclude is not None:
            # non-strict: excluding a selector that matches nothing (e.g. a
            # tag no model carries anymore) removes nothing rather than
            # aborting the run — dbt's behavior for --exclude
            wanted -= self._resolve(exclude, strict=False)
        registry = all_models()
        ts = TopologicalSorter({m: [d for d in registry[m].deps if d in wanted] for m in wanted})
        return list(ts.static_order())

    def _resolve(
        self, select: str | list[str] | None, strict: bool = True
    ) -> set[str]:
        registry = all_models()
        if select is None:
            wanted = set(registry)
        else:
            children: dict[str, list[str]] = {m: [] for m in registry}
            for m, cfg in registry.items():
                for d in cfg.deps:
                    if d in children:
                        children[d].append(m)
            selectors = [select] if isinstance(select, str) else list(select)
            wanted = set()

            def _known(name: str, sel: str) -> bool:
                # strict (--select): unknown names abort with an actionable
                # message instead of a bare KeyError deep in the traversal;
                # non-strict (--exclude): they match nothing, dbt-style
                if name in registry:
                    return True
                if strict:
                    known = ", ".join(sorted(registry))
                    raise KeyError(
                        f"selector {sel!r} names unknown model {name!r}; "
                        f"registered models: {known}"
                    )
                return False

            for sel in selectors:
                if sel == "state:modified":
                    wanted |= self._modified_models()
                elif sel.startswith("exposure:") or (
                    sel.startswith("+exposure:")
                ):
                    # an exposure selects its upstream closure (dbt
                    # `--select +exposure:x`; the bare form is the same —
                    # an exposure has no node of its own to build)
                    from .model import all_exposures

                    ename = sel.split("exposure:", 1)[1]
                    exposures = all_exposures()
                    if ename not in exposures:
                        if strict:
                            raise KeyError(
                                f"selector {sel!r} names unknown exposure "
                                f"{ename!r}; registered: {sorted(exposures)}"
                            )
                        continue
                    stack = list(exposures[ename].depends_on)
                    while stack:
                        m = stack.pop()
                        if m in wanted:
                            continue
                        wanted.add(m)
                        stack.extend(registry[m].deps)
                elif sel.startswith("tag:"):
                    tagged = {m for m, c in registry.items() if sel[4:] in c.tags}
                    if not tagged and strict:
                        raise KeyError(f"no models carry {sel!r}")
                    wanted |= tagged
                elif sel.startswith("+"):
                    if not _known(sel[1:], sel):
                        continue
                    stack = [sel[1:]]
                    while stack:
                        m = stack.pop()
                        if m in wanted:
                            continue
                        wanted.add(m)
                        stack.extend(registry[m].deps)
                elif sel.endswith("+"):
                    if not _known(sel[:-1], sel):
                        continue
                    stack = [sel[:-1]]
                    seen: set[str] = set()
                    while stack:
                        m = stack.pop()
                        if m in seen:
                            continue
                        seen.add(m)
                        stack.extend(children[m])
                    # downstream models still need their upstreams built
                    stack = list(seen)
                    while stack:
                        m = stack.pop()
                        if m in wanted:
                            continue
                        wanted.add(m)
                        stack.extend(registry[m].deps)
                else:
                    if _known(sel, sel):
                        wanted.add(sel)
        return wanted

    def _modified_models(self) -> set[str]:
        """dbt ``state:modified`` (CI's build-only-what-changed selector):
        models that are NEW or whose manifest entry differs from the
        ``--state`` manifest — builder source hash included, so editing a
        builder body selects it even with identical config (the analog
        of dbt hashing compiled SQL). Requires ``Runner(state=...)``.
        """
        import json

        if not self.state:
            raise ValueError("state:modified requires Runner(state=<old manifest.json>)")
        with open(self.state) as f:
            old = json.load(f).get("models", {})
        current = self.manifest()["models"]
        return {
            name
            for name, entry in current.items()
            if name not in old or old[name] != entry
        }

    # ------------------------------------------------------------- execution

    def run(
        self,
        select: str | None = None,
        full_refresh: bool = False,
        threads: int = 1,
        exclude: str | list[str] | None = None,
        fail_fast: bool = True,
    ) -> list[str]:
        """Build the selected models in dependency order; returns the order.

        ``threads > 1`` builds independent models concurrently (the
        reference's dbt profile runs 4 threads, ``profiles.yml:14``): a
        thread pool walks the DAG, submitting a model as soon as its deps
        complete. Spark schedules jobs from multiple threads fine; each
        model is still one job chain.

        ``fail_fast=False`` is dbt's keep-going walk: a failing model
        marks its DOWNSTREAM closure ``skipped`` in run-results and the
        walk continues through independent branches, raising one summary
        error at the end — ``retry`` then resumes exactly the failed +
        skipped set. The default raises at the first failure (the
        conservative CI behavior this engine has always had).
        """
        if not fail_fast and threads > 1:
            # the threaded walk re-raises at the first failed future; a
            # silently fail-fast "keep-going" run would also mis-record
            # the invocation for retry
            raise ValueError(
                "fail_fast=False (--keep-going) requires threads=1; the "
                "threaded DAG walk does not implement skip tracking"
            )
        order = self._closure(select, exclude)
        registry = all_models()
        self.last_run_results = []  # reset per invocation
        self._last_args = {
            "command": "run", "select": select, "exclude": exclude,
            "full_refresh": full_refresh, "threads": threads,
            "fail_fast": fail_fast, "vars": dict(self.vars),
        }
        try:
            if threads > 1:
                return self._run_threaded(order, registry, full_refresh, threads)
            if fail_fast:
                for name in order:
                    self._run_one(registry[name], full_refresh)
                return order
            # keep-going: compute the downstream map once, skip transitively
            children: dict[str, list[str]] = {m: [] for m in registry}
            for m, cfg in registry.items():
                for d in cfg.deps:
                    if d in children:
                        children[d].append(m)
            failed: list[str] = []
            skipped: set[str] = set()
            for name in order:
                if name in skipped:
                    self.last_run_results.append(
                        {
                            "model": name,
                            "status": "skipped",
                            "error": "upstream failure",
                            "execution_time_s": 0.0,
                            "strategy": registry[name].incremental_strategy,
                            "materialized": registry[name].materialized,
                        }
                    )
                    continue
                try:
                    self._run_one(registry[name], full_refresh)
                except Exception:
                    failed.append(name)
                    stack = list(children[name])
                    while stack:
                        m = stack.pop()
                        if m in skipped:
                            continue
                        skipped.add(m)
                        stack.extend(children[m])
            if failed:
                raise RuntimeError(
                    f"run completed with failures: {failed} "
                    f"(skipped downstream: {sorted(skipped & set(order))}); "
                    "see run_results.json; `retry` resumes them"
                )
            return order
        finally:
            self._write_run_results(full_refresh)

    def snapshot(
        self,
        select: str | None = None,
        exclude: str | list[str] | None = None,
    ) -> list[str]:
        """dbt ``snapshot``: fold every selected SNAPSHOT node's current
        source state into its SCD2 history table. Only snapshot nodes
        execute (their non-snapshot upstreams must already be
        materialized — dbt's contract too); run-results record each with
        ``materialized='snapshot'``. Returns the executed order."""
        registry = all_models()
        order = [
            n for n in self._closure(select, exclude)
            if registry[n].materialized == "snapshot"
        ]
        self.last_run_results = []
        self._last_args = {
            "command": "snapshot", "select": select, "exclude": exclude,
            "vars": dict(self.vars),
        }
        try:
            for name in order:
                self._run_one(registry[name], full_refresh=False)
            return order
        finally:
            self._write_run_results(False)

    def retry(self) -> list[str]:
        """dbt ``retry``: resume the LAST recorded run/build/snapshot from
        its point of failure. Reads ``_artifacts/run_results.json``,
        replays the same command with the same selection, but EXCLUDES
        every model that already succeeded — their dependents read the
        existing materializations, so only the failed node and everything
        after it execute. Returns the re-executed order (empty when the
        last invocation fully succeeded)."""
        import json
        import os

        path = os.path.join(self.store.path("_artifacts"), "run_results.json")
        if not os.path.exists(path):
            raise ValueError("retry: no run_results.json — nothing was run yet")
        with open(path) as f:
            payload = json.load(f)
        args = payload.get("args")
        if not args:
            raise ValueError(
                "retry: run_results.json predates args recording — re-run "
                "the original command instead"
            )
        succeeded = [
            r["model"] for r in payload["results"] if r["status"] == "success"
        ]
        if not any(r["status"] != "success" for r in payload["results"]):
            # every attempted model succeeded AND the walk completed (an
            # aborted walk leaves unattempted models, which the replayed
            # closure-minus-successes below would still catch — but a fully
            # green artifact means there is nothing to resume)
            registry = all_models()
            attempted = {r["model"] for r in payload["results"]}
            cmd = args["command"]
            wanted = self._closure(args.get("select"), args.get("exclude"))
            if cmd == "snapshot":
                wanted = [
                    n for n in wanted
                    if registry[n].materialized == "snapshot"
                ]
            if set(wanted) <= attempted:
                return []
        exclude = args.get("exclude")
        exclude = [exclude] if isinstance(exclude, str) else list(exclude or [])
        exclude += succeeded
        cmd = args["command"]
        # replay with the ORIGINAL invocation's vars (dbt retry reuses the
        # previous parameters) — a bare `retry` must not rebuild the failed
        # model with default var values
        prev_vars = self.vars
        if args.get("vars") is not None:
            self.vars = dict(args["vars"])
        try:
            if cmd == "run":
                return self.run(
                    args.get("select"),
                    full_refresh=bool(args.get("full_refresh")),
                    threads=int(args.get("threads") or 1),
                    exclude=exclude,
                    fail_fast=bool(args.get("fail_fast", True)),
                )
            if cmd == "build":
                return self.build(
                    args.get("select"),
                    full_refresh=bool(args.get("full_refresh")),
                    exclude=exclude,
                )
            if cmd == "snapshot":
                return self.snapshot(args.get("select"), exclude=exclude)
            raise ValueError(f"retry: unknown recorded command {cmd!r}")
        finally:
            self.vars = prev_vars

    def seed(self, seed_dir: str, delimiter: str = ",") -> list[str]:
        """dbt ``seed``: load every ``*.csv`` under ``seed_dir`` into the
        warehouse as a full-refresh table named after the file. Types are
        inferred (dbt's agreed-value behavior for seeds); seeds are small
        reference data by contract, so the inference pass is cheap and the
        write is a single full create — no incremental machinery.
        """
        import glob as _glob
        import os as _os

        loaded = []
        for path in sorted(_glob.glob(_os.path.join(seed_dir, "*.csv"))):
            name = _os.path.splitext(_os.path.basename(path))[0]
            df = (
                self.spark.read.option("header", "true")
                .option("inferSchema", "true")
                .option("delimiter", delimiter)
                .csv(path)
            )
            self.store.write_full(df, name)
            loaded.append(name)
        return loaded

    def source_freshness(
        self, freshness: dict[str, dict]
    ) -> dict[str, dict]:
        """dbt ``source freshness``: age of each source's newest row vs
        warn/error thresholds.

        ``freshness`` maps ``"db.table"`` → ``{"loaded_at_field": col,
        "warn_after_s": n, "error_after_s": n}``. Returns per-source
        ``{"max_loaded_at", "age_s", "status"}`` with status
        pass/warn/error (error also when the source is empty — an empty
        feed is the stalest possible feed). The probe is one scalar MAX
        per source — footer-level stats make it cheap on huge tables
        (same shape as the incremental watermark). The clock is the
        runner's injectable ``fixed_now`` so tests are deterministic.
        """
        from datetime import datetime as _dt

        from pyspark.sql import functions as F

        probe_cfg = ModelConfig(name="_freshness_probe", builder=lambda ctx: None)
        ctx = ModelContext(
            self.spark, self.store, self.sources, probe_cfg, fixed_now=self.fixed_now
        )
        now = self.fixed_now or _dt.utcnow()  # naive UTC, matching session tz
        out: dict[str, dict] = {}
        for key, cfg in freshness.items():
            db, table = key.split(".", 1)
            src = ctx.source(db, table)
            mx = src.agg(F.max(cfg["loaded_at_field"]).alias("m")).first()["m"]
            if mx is None:
                out[key] = {"max_loaded_at": None, "age_s": None, "status": "error"}
                continue
            if not isinstance(mx, _dt):  # DATE column → midnight datetime
                import datetime as _dtm

                mx = _dt.combine(mx, _dtm.time.min)
            age = (now - mx).total_seconds()
            if age > cfg["error_after_s"]:
                status = "error"
            elif age > cfg["warn_after_s"]:
                status = "warn"
            else:
                status = "pass"
            out[key] = {
                "max_loaded_at": mx.isoformat(),
                "age_s": round(age, 3),
                "status": status,
            }
        return out

    def _run_threaded(
        self,
        order: list[str],
        registry: dict[str, ModelConfig],
        full_refresh: bool,
        threads: int,
    ) -> list[str]:

        import concurrent.futures as cf
        from graphlib import TopologicalSorter

        wanted = set(order)
        ts = TopologicalSorter(
            {m: [d for d in registry[m].deps if d in wanted] for m in wanted}
        )
        ts.prepare()
        built: list[str] = []
        with cf.ThreadPoolExecutor(max_workers=threads) as pool:
            futures: dict[cf.Future, str] = {}
            while ts.is_active():
                for name in ts.get_ready():
                    futures[pool.submit(self._run_one, registry[name], full_refresh)] = name
                done, _ = cf.wait(list(futures), return_when=cf.FIRST_COMPLETED)
                for f in done:
                    name = futures.pop(f)
                    f.result()  # re-raise model failures
                    ts.done(name)
                    built.append(name)
        return built

    def _run_one(self, cfg: ModelConfig, full_refresh: bool) -> None:
        """Build one model, recording a run-results row (dbt's
        run_results.json analog) whatever the outcome."""
        import time as _time

        t0 = _time.perf_counter()
        try:
            self._build_one(cfg, full_refresh)
        except Exception as e:  # record, then surface
            self.last_run_results.append(
                {
                    "model": cfg.name,
                    "status": "error",
                    "error": f"{type(e).__name__}: {e}"[:500],
                    "execution_time_s": round(_time.perf_counter() - t0, 3),
                    "strategy": cfg.incremental_strategy,
                    "materialized": cfg.materialized,
                }
            )
            raise
        self.last_run_results.append(
            {
                "model": cfg.name,
                "status": "success",
                "execution_time_s": round(_time.perf_counter() - t0, 3),
                "strategy": cfg.incremental_strategy,
                "materialized": cfg.materialized,
            }
        )

    def _write_run_results(self, full_refresh: bool) -> None:
        """Persist the invocation's per-model results next to the tables
        (``<warehouse>/_artifacts/run_results.json``) — the artifact CI
        and orchestration read instead of scraping logs. Driver-side
        metadata only: bytes written are O(models), never data-scale."""
        import json
        import os
        import time as _time

        art_dir = self.store.path("_artifacts")
        os.makedirs(art_dir, exist_ok=True)
        payload = {
            "generated_at_unix": round(_time.time(), 3),
            "profile": self.profile,
            "full_refresh": full_refresh,
            # the invoking command + its selection, so `retry` can resume
            # the same invocation from its point of failure (dbt records
            # args in run_results.json for the same reason)
            "args": getattr(self, "_last_args", None),
            "elapsed_s": round(
                sum(r["execution_time_s"] for r in self.last_run_results), 3
            ),
            "results": self.last_run_results,
        }
        with open(os.path.join(art_dir, "run_results.json"), "w") as f:
            # default=str: vars may carry non-JSON types (dates, paths);
            # stringifying keeps the artifact writable — retry replays the
            # recorded form
            json.dump(payload, f, indent=1, default=str)

    def _build_one(self, cfg: ModelConfig, full_refresh: bool) -> None:
        ctx = ModelContext(
            self.spark,
            self.store,
            self.sources,
            cfg,
            full_refresh=full_refresh,
            fixed_now=self.fixed_now,
            backfill_days=self.backfill_days,
            lookback_days=self.lookback_days,
            lag_widen_days=self.lag_widen_days,
            vars=self.vars,
            defer_store=self.defer_store,
        )
        if full_refresh and cfg.materialized != "snapshot":
            # snapshot history survives --full-refresh (dbt: snapshots are
            # append-only audit state, never rebuilt)
            self.store.drop(cfg.name)
        df = cfg.builder(ctx)
        if cfg.contract:
            enforce_contract(df, cfg.contract, cfg.name)
        if cfg.materialized == "snapshot":
            from .snapshots import snapshot_scd2

            snapshot_scd2(
                self.store,
                df,
                cfg.name,
                cfg.unique_key,
                strategy=cfg.snapshot_strategy,
                check_cols=cfg.check_cols,
                updated_at=cfg.updated_at,
                now=self.fixed_now,
                invalidate_hard_deletes=cfg.invalidate_hard_deletes,
            )
            self._post_hooks(cfg)
            return
        incremental_run = (
            cfg.materialized == "incremental"
            and ctx.store.exists(cfg.name)
            and not full_refresh
        )
        if incremental_run and cfg.bucket_by:
            # one materialization feeds BOTH the store append and the
            # mirror append (ADVICE r12 item 2): without it the mirror
            # sync re-executes the builder's plan AFTER the store append,
            # and a builder whose incremental filter reads ctx.this()
            # lazily (or is non-deterministic) would compute the mirror
            # slice against the already-appended store — appending a
            # wrong/empty slice and silently desyncing mirror from store
            df = df.localCheckpoint(eager=True)
        if incremental_run:
            if cfg.incremental_strategy == "append":
                self.store.append(df, cfg.name, cfg.partition_by)
            elif cfg.incremental_strategy == "insert_overwrite":
                self.store.insert_overwrite(df, cfg.name, cfg.partition_by)
            else:
                self.store.merge(
                    df,
                    cfg.name,
                    cfg.unique_key,
                    cfg.partition_by,
                    on_schema_change=cfg.on_schema_change,
                    incremental_predicates=cfg.incremental_predicates,
                )
        else:
            self.store.write_full(df, cfg.name, cfg.partition_by)
        if cfg.bucket_by:
            # the mirror append is only content-correct for the 'append'
            # strategy — merge/insert_overwrite update or replace store
            # rows, so the appended slice would desync the mirror and the
            # reconcile would pay a wasted append + full rebuild every run
            # (ADVICE r13 item 3); those strategies rebuild directly
            self._sync_bucketed_mirror(
                cfg,
                df,
                incremental_append=incremental_run
                and cfg.incremental_strategy == "append",
            )
        self._post_hooks(cfg)

    def _sync_bucketed_mirror(
        self, cfg: ModelConfig, df: DataFrame, incremental_append: bool
    ) -> None:
        """Maintain the model's bucketed managed-table mirror
        (``bucket_by`` config; ``engine/bucketing.py``).

        Incremental 'append' runs append ONLY the new slice — read from
        the SAME eagerly-checkpointed DataFrame the store append consumed
        (``run()`` materializes it once for bucket_by models; ADVICE r12
        item 2), never re-projecting the accumulated table — so the
        bucketed layout's write cost amortizes across runs the way the
        reference's incremental MERGE amortizes the daily fact rebuild
        (``models/fct_deepbook_margin_pool_daily.sql:33-35``). Fresh
        builds and --full-refresh rebuild the mirror from the store
        table. Appends keep the bucket spec (Spark validates) but leave
        multiple files per bucket, so plans keep the Exchange-free join
        and re-sort within tasks — the optimize post-hook analog for
        mirrors is a full rebuild, which ``--full-refresh`` provides.

        Store and mirror writes are not atomic, so every incremental
        sync ends with a cheap RECONCILE (ADVICE r12 item 3): a crash
        between the two appends — or any historical gap — leaves the
        mirror permanently short, and nothing downstream would notice
        until fp_rows consumers computed wrong pair sets; a row-count
        compare (two parquet-stats scans) catches it and triggers the
        full-rebuild branch.
        """
        from .bucketing import drop_bucketed_table, mirror_table_name, write_bucketed

        spark = self.store.spark
        tbl = mirror_table_name(cfg.name, self.store.schema_suffix, self.store.root)

        def _rebuild() -> None:
            drop_bucketed_table(spark, tbl)
            # warehouse-keying (ADVICE r12 item 1) renamed mirrors; a mirror
            # built before that under the un-keyed name is now unreachable
            # by read_mirror and would leak in the session catalog + on
            # disk forever — reclaim it here (ADVICE r13 item 2)
            legacy = mirror_table_name(cfg.name, self.store.schema_suffix, None)
            if legacy != tbl:
                drop_bucketed_table(spark, legacy)
            write_bucketed(
                self.store.read(cfg.name), tbl, cfg.n_buckets, cfg.bucket_by,
                sort_by=cfg.bucket_by, mode="overwrite",
            )

        if incremental_append and spark.catalog.tableExists(tbl):
            write_bucketed(
                df, tbl, cfg.n_buckets, cfg.bucket_by,
                sort_by=cfg.bucket_by, mode="append",
            )
            if spark.table(tbl).count() != self.store.read(cfg.name).count():
                _rebuild()
        else:
            _rebuild()

    def _post_hooks(self, cfg: ModelConfig) -> None:
        """Maintenance after a successful build: the reference's prod
        post-hooks (``alter table ... execute optimize`` + 7-day vacuum),
        profile-gated, per-model overridable via ``post_hooks=[...]``."""
        hooks = cfg.post_hooks
        if hooks is None:
            hooks = self.PROFILE_POST_HOOKS.get(self.profile, [])
        for hook in hooks:
            if hook == "optimize":
                self.store.optimize(cfg.name, cluster_by=cfg.cluster_by, zorder_by=cfg.zorder_by)
            elif hook == "vacuum":
                self.store.vacuum(cfg.name, retain_hours=self.vacuum_retain_hours)
            else:
                raise ValueError(f"unknown post-hook {hook!r} on model {cfg.name}")

    # ----------------------------------------------------------------- tests

    def manifest(
        self,
        select: str | list[str] | None = None,
        exclude: str | list[str] | None = None,
    ) -> dict:
        """The project manifest (dbt ``manifest.json`` analog): every
        selected model's declared config and DAG edges, as plain data —
        what docs generators, lineage tools, and CI diff checks consume.
        Driver-side metadata only; no Spark job runs."""
        import hashlib
        import inspect

        registry = all_models()
        models = {}
        for name in self._closure(select, exclude):
            cfg = registry[name]
            try:
                src = inspect.getsource(cfg.builder)
            except (OSError, TypeError):
                # builtins / REPL- or exec-defined builders without
                # retrievable source: a process-stable token, NOT repr()
                # (whose embedded memory address would make state:modified
                # select the model forever)
                src = (
                    f"{getattr(cfg.builder, '__module__', '?')}."
                    f"{getattr(cfg.builder, '__qualname__', repr(type(cfg.builder)))}"
                )
            models[name] = {
                # the state:modified fingerprint: a model counts as
                # modified when its BUILDER SOURCE changes (the analog of
                # dbt hashing the compiled SQL) or any declared config does
                "builder_sha": hashlib.md5(src.encode()).hexdigest(),
                "materialized": cfg.materialized,
                "incremental_strategy": cfg.incremental_strategy,
                "on_schema_change": cfg.on_schema_change,
                "unique_key": cfg.unique_key,
                "partition_by": cfg.partition_by or [],
                "cluster_by": cfg.cluster_by,
                "zorder_by": cfg.zorder_by,
                "bucket_by": cfg.bucket_by,
                "n_buckets": cfg.n_buckets,
                "contract": cfg.contract,
                "incremental_predicates": cfg.incremental_predicates,
                "depends_on": cfg.deps,
                "tags": cfg.tags,
                "description": cfg.description,
                "tests": {
                    "not_null": cfg.not_null,
                    "unique": cfg.unique,
                    "accepted_values": cfg.accepted_values,
                    "relationships": [list(r) for r in cfg.relationships],
                },
            }
            if cfg.materialized == "snapshot":
                # scoped to snapshot nodes so pre-existing model entries
                # (and their state:modified hashes) are unchanged
                models[name]["snapshot"] = {
                    "strategy": cfg.snapshot_strategy,
                    "check_cols": cfg.check_cols,
                    "updated_at": cfg.updated_at,
                    "invalidate_hard_deletes": cfg.invalidate_hard_deletes,
                }
        from .model import all_exposures

        return {
            "profile": self.profile,
            "sources": sorted(self.sources),
            "models": models,
            # exposures whose full upstream set is inside the selection —
            # lineage consumers see only consumers their view can serve
            "exposures": {
                e.name: {
                    "type": e.type,
                    "depends_on": e.depends_on,
                    "owner": e.owner,
                    "url": e.url,
                    "description": e.description,
                }
                for e in all_exposures().values()
                if set(e.depends_on) <= set(models)
            },
        }

    def write_manifest(
        self,
        select: str | list[str] | None = None,
        exclude: str | list[str] | None = None,
    ) -> str:
        """Persist the manifest next to run_results.json; returns the path."""
        import json
        import os

        art_dir = self.store.path("_artifacts")
        os.makedirs(art_dir, exist_ok=True)
        path = os.path.join(art_dir, "manifest.json")
        with open(path, "w") as f:
            json.dump(self.manifest(select, exclude), f, indent=1, default=str)
        return path

    def catalog(
        self,
        select: str | list[str] | None = None,
        exclude: str | list[str] | None = None,
    ) -> dict:
        """dbt ``catalog.json``: what is ACTUALLY materialized — per table
        the storage schema (column name/type/nullable) and row count,
        as opposed to the manifest's declared config. Models not yet
        built are listed with ``exists: false``. Schema comes from the
        parquet footers (metadata-cheap); the row count is one
        footer-level count per table."""
        tables: dict[str, dict] = {}
        for name in self._closure(select, exclude):
            if not self.store.exists(name):
                tables[name] = {"exists": False}
                continue
            df = self.store.read(name)
            tables[name] = {
                "exists": True,
                "columns": [
                    {
                        "name": f.name,
                        "type": f.dataType.simpleString(),
                        "nullable": f.nullable,
                    }
                    for f in df.schema.fields
                ],
                "row_count": df.count(),
            }
        return {"tables": tables}

    def write_catalog(
        self,
        select: str | list[str] | None = None,
        exclude: str | list[str] | None = None,
    ) -> str:
        """Persist the catalog next to manifest.json; returns the path."""
        import json
        import os

        art_dir = self.store.path("_artifacts")
        os.makedirs(art_dir, exist_ok=True)
        path = os.path.join(art_dir, "catalog.json")
        with open(path, "w") as f:
            json.dump(self.catalog(select, exclude), f, indent=1, default=str)
        return path

    def build(
        self,
        select: str | None = None,
        full_refresh: bool = False,
        exclude: str | list[str] | None = None,
    ) -> list[str]:
        """dbt ``build``: run each selected model in DAG order and gate
        its DOWNSTREAM on its data tests — a model's test failure stops
        the walk before dependents consume bad data (the semantic
        difference from ``run`` + ``test``, which tests only after
        everything built). Returns the build order; raises on the first
        test failure, with the failing checks in the message.
        """
        order = self._closure(select, exclude)
        registry = all_models()
        self.last_run_results = []
        self._last_args = {
            "command": "build", "select": select, "exclude": exclude,
            "full_refresh": full_refresh, "vars": dict(self.vars),
        }
        try:
            for name in order:
                self._run_one(registry[name], full_refresh)
                failures = self.test(name)
                if failures:
                    # the build succeeded but the gate failed: the model's
                    # run-results row must say test_failed, not success —
                    # replace, don't append alongside (a CI consumer scans
                    # for ONE row per model)
                    self.last_run_results = [
                        r for r in self.last_run_results if r["model"] != name
                    ]
                    self.last_run_results.append(
                        {
                            "model": name,
                            "status": "test_failed",
                            "error": str(failures)[:500],
                            "execution_time_s": 0.0,
                            "strategy": registry[name].incremental_strategy,
                            "materialized": registry[name].materialized,
                        }
                    )
                    raise RuntimeError(
                        f"build stopped: tests failed on {name!r}: {failures}"
                    )
        finally:
            self._write_run_results(full_refresh)
        return order

    def test(
        self,
        select: str | list[str] | None = None,
        store_failures: bool = False,
        exclude: str | list[str] | None = None,
    ) -> dict[str, int]:
        """Run declared data tests (``dbt test``; SURVEY §5 item 1 + the
        standard dbt generic-test set).

        Returns {model.test_description: offending_row_count}, failures only.
        ``store_failures`` (dbt config of the same name) additionally
        materializes each failing test's OFFENDING ROWS to an audit table
        ``_test_failures__<model>__<test>`` in the warehouse, so a failure
        is debuggable from storage instead of re-querying — and a test
        that PASSES drops its stale audit table, so the audit surface
        always reflects the latest run (dbt's rewritten-per-run contract).
        """
        from pyspark.sql import functions as F

        def _store(bad_df, model: str, test_id: str, failed: bool) -> None:
            if not store_failures:
                return
            table = f"_test_failures__{model}__{test_id}"
            if failed:
                self.store.write_full(bad_df, table)
            elif self.store.exists(table):
                self.store.drop(table)

        failures: dict[str, int] = {}
        for name in self._closure(select, exclude):
            cfg = all_models()[name]
            if not self.store.exists(name):
                continue
            has_tests = cfg.not_null or cfg.unique or cfg.accepted_values or cfg.relationships
            if not has_tests:
                continue
            df = self.store.read(name)

            if cfg.not_null:
                # one pass for all null checks, not one scan per column
                aggs = [
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
                    for c in cfg.not_null
                ]
                row = df.agg(*aggs).first()
                for c in cfg.not_null:
                    failed = bool(row[c] and row[c] > 0)
                    if failed:
                        failures[f"{name}.{c}"] = int(row[c])
                    _store(df.filter(F.col(c).isNull()), name, f"not_null_{c}", failed)

            for c in cfg.unique:
                dup_keys = df.groupBy(c).count().filter(F.col("count") > 1)
                dup = dup_keys.count()
                if dup:
                    failures[f"{name}.unique:{c}"] = int(dup)
                _store(
                    df.join(dup_keys.select(c), on=c, how="left_semi"),
                    name,
                    f"unique_{c}",
                    bool(dup),
                )

            for c, allowed in cfg.accepted_values.items():
                bad_rows = df.filter(~F.col(c).isin(allowed) & F.col(c).isNotNull())
                bad = bad_rows.count()
                if bad:
                    failures[f"{name}.accepted_values:{c}"] = int(bad)
                _store(bad_rows, name, f"accepted_values_{c}", bool(bad))

            for c, other_model, other_col in cfg.relationships:
                if not self.store.exists(other_model):
                    failures[f"{name}.relationships:{c}->{other_model}.{other_col}"] = -1
                    continue
                other = self.store.read(other_model).select(
                    F.col(other_col).alias(c)
                ).distinct()
                orphan_rows = df.filter(F.col(c).isNotNull()).join(
                    other, on=c, how="left_anti"
                )
                orphans = orphan_rows.count()
                if orphans:
                    failures[f"{name}.relationships:{c}->{other_model}.{other_col}"] = int(orphans)
                _store(
                    orphan_rows, name, f"relationships_{c}__{other_model}", bool(orphans)
                )
        return failures
