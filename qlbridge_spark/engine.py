"""QLBridge-on-Spark engine: statements → DataFrame plans.

Replaces the reference's plan/exec layers (/root/reference/plan/planner_select.go,
exec/executor.go) entirely with Catalyst: we *declare* the logical plan via
the DataFrame API and let Spark pick physical strategies (hash/sort-merge/
broadcast joins, partial aggregation, spill, whole-stage codegen) — the
things the reference hand-rolls as goroutine tasks (exec/join.go,
exec/groupby.go, exec/order.go) or explicitly defers to its distributed
caller.

Scale notes (100 TB design):
- every operator is a narrow/declarative DataFrame op → Catalyst keeps
  predicate pushdown + column pruning into the parquet scan
- joins: Spark AQE picks broadcast for small sides; we additionally
  broadcast sources marked small via WITH {"broadcast": true} or detected
  dimension tables
- no collect()/driver loops anywhere in the query path
"""

from __future__ import annotations

import re

from pyspark.sql import Column as SparkColumn
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import functions as funcs
from .nodes import (
    BinaryNode,
    BooleanNode,
    BoolNode,
    FuncNode,
    IdentityNode,
    Node,
    NumberNode,
    StringNode,
    UnaryNode,
    WindowNode,
    transform,
)
from .rel import (
    Column,
    CteQuery,
    FilterStatement,
    FromSource,
    SqlAlter,
    SqlCommand,
    SqlCopy,
    SqlCreate,
    SqlDelete,
    SqlDescribe,
    SqlDrop,
    SqlInsert,
    SqlMerge,
    SqlOptimize,
    SqlRefresh,
    SqlSelect,
    SqlSetOp,
    SqlShow,
    SqlRestore,
    SqlUpdate,
    SqlVacuum,
    SubqueryNode,
    parse_filterql,
    parse_sql,
)
from .translate import Scope, TranslateError, to_column

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")


class ExecError(ValueError):
    pass


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet reader tolerant of TIMESTAMP(NANOS) columns, which Spark's
    vectorized reader rejects. Nanos columns are read as longs
    (spark.sql.legacy.parquet.nanosAsLong) and converted to timestamps
    JVM-side — still fully vectorized + pushdown-friendly."""
    nanos_cols: list[str] = []
    try:
        import pyarrow.parquet as pq

        nanos_cols = [f_.name for f_ in pq.read_schema(path) if str(f_.type).startswith("timestamp[ns")]
    except Exception:
        pass  # non-local path or no pyarrow footer access — let Spark try
    if not nanos_cols:
        return spark.read.parquet(path)
    # left set for the session: the lazy scan re-reads it at execution time
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # integer FLOOR division, NOT `/` (float division loses precision
        # above 2^53 — epoch-nanos are ~1.7e18, a double round-trip lands
        # ±1µs off) and not bare `div` (truncates toward zero, which would
        # convert pre-1970 nanos 1µs late). (n - pmod(n,1000)) is exact
        # long arithmetic and pmod is non-negative, so this floors.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"(`{c}` - pmod(`{c}`, 1000)) div 1000")))
    return df


class Engine:
    """The user-facing engine — ≈ the reference's schema registry +
    BuildSqlJob (exec/executor.go:46) + database/sql driver ergonomics
    (exec/sqldriver.go)."""

    #: warn once per process, not per Engine
    _tz_warned = False

    def __init__(self, spark: SparkSession, name: str = "default"):
        self.spark = spark
        self.name = name
        # TIMESTAMP_NTZ contract: parquet timestamp[us] reads as NTZ in
        # Spark 4. NTZ walls mean UTC: every epoch-extracting path
        # (epoch_us/totimestamp/unixtrunc/EXTRACT(epoch), asof tolerance,
        # session gaps) is session-tz-independent via tzutil's pure
        # wall-field arithmetic (tests/test_tz_stability.py pins this
        # under Europe/Berlin incl. DST-gap walls). What STILL follows
        # the session tz, per standard SQL: rendering/wall-extraction of
        # true TIMESTAMP (ltz) columns, and parsing of zoneless string
        # literals — surface that once for non-UTC sessions.
        try:
            tz = spark.conf.get("spark.sql.session.timeZone")
        except Exception:  # pragma: no cover - conf lookup should not fail
            tz = ""
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00") and not Engine._tz_warned:
            import warnings

            Engine._tz_warned = True
            warnings.warn(
                f"session time zone is {tz!r}: TIMESTAMP_NTZ epochs are UTC-stable, but "
                "TIMESTAMP (ltz) wall rendering and zoneless string-literal parsing "
                "follow the session zone (standard SQL); the oracle-tested "
                "configuration is spark.sql.session.timeZone=UTC",
                RuntimeWarning,
                stacklevel=2,
            )
        self.tables: dict[str, DataFrame] = {}
        self.broadcast_hints: set[str] = set()
        self.includes: dict[str, Node] = {}
        self.session_vars: dict[str, object] = {}
        self.views: dict[str, SqlSelect] = {}
        # materialized views: name → matview.MatView metadata (the
        # materialized frame itself lives in self.tables so reads, SHOW
        # TABLES and cache invalidation work unchanged)
        self.mat_views: dict[str, object] = {}
        self.streams: dict[str, object] = {}
        # plannable sources: name → SourcePlanner-style object
        # (≈ plan.SourcePlanner registry, plan/plan.go:116-123)
        self.planner_sources: dict[str, object] = {}
        # custom dialects: leading keyword → (Dialect, handler)
        # (≈ lex.Dialect registration, lex/dialect.go + dialects/example)
        self.dialects: dict[str, tuple[object, object]] = {}
        # declared table keys (≈ schema.Key, datasource/key.go) for UPSERT
        self.table_keys: dict[str, str] = {}
        # writable sinks: name → MERGE-capable table (sinks.DeltaMergeSink
        # protocol ≈ ConnUpsert/ConnPatchWhere/ConnDeletion,
        # schema/datasource.go:96-161); DML routes here instead of the
        # in-memory registry swap
        self.sinks: dict[str, object] = {}
        # plan/fold caches (superset of reference PREPARE, which is
        # parse-only — exec/executor.go:144-146). Epoch bumps on ANY
        # registry/DDL/DML/SET mutation and clears both caches; entries
        # also carry a TTL so plan-time-frozen datemath ("now") literals
        # do not live forever.
        self._cache_epoch = 0
        self._plan_cache: dict[tuple, tuple[float, DataFrame]] = {}
        self._fold_cache: dict[tuple, tuple] = {}
        # statement-scoped memo of the sink-version fingerprint: computed
        # once per outermost execute_stmt instead of once per fold-key
        # (a statement with N subquery folds would otherwise read every
        # sink's _VERSION file N+1 times)
        self._stmt_depth = 0
        self._stmt_sink_fp = None
        self._seed_sink_fp = None  # one-shot handoff from execute() to execute_stmt()
        self._bound_params: dict[str, object] = {}
        self.plan_cache_ttl_s = 60.0
        self.plan_cache_max = 128
        self.plan_cache_stats = {"hits": 0, "misses": 0, "fold_hits": 0, "fold_misses": 0}

    # ------------------------------------------------------------------
    # registry (≈ schema.RegisterSourceAsSchema, schema/registry.go:71)
    # ------------------------------------------------------------------
    def register_df(self, name: str, df: DataFrame, broadcast: bool = False, key: str | None = None) -> None:
        """Register a DataFrame as a table. ``key`` declares the table's
        unique key column (≈ schema.Key / datasource.KeyCol,
        datasource/key.go:27-42) — UPSERT uses it to decide which rows to
        replace instead of silently assuming the first column."""
        self.tables[name.lower()] = df
        self._bump_cache_epoch()
        if broadcast:
            self.broadcast_hints.add(name.lower())
        if key is not None:
            self.table_keys[name.lower()] = key

    def register_rows(self, name: str, rows: list[dict], schema=None) -> None:
        """In-memory source ≈ membtree/memdb static sources."""
        df = self.spark.createDataFrame(rows, schema=schema) if schema else self.spark.createDataFrame(rows)
        self.register_df(name, df)

    def load_parquet_dir(self, sf_dir: str, tables=TABLES) -> None:
        """Register the driver's synthetic star schema (TESTDATA.md).
        Dimension tables get broadcast hints — at 100 TB the fact tables
        (lineitem/orders/events) shuffle, dims broadcast."""
        import os

        for t in tables:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                self.register_df(t, read_parquet(self.spark, p), broadcast=t in ("region", "nation", "supplier", "part"))

    def register_source(self, name: str, source) -> None:
        """Register a plannable source (planner.SourcePlanner protocol).
        When a query's FROM references it, the engine offers the source its
        rewritten sub-select (pruned columns + pushable predicates) via
        ``walk_source_select``; the source may return a DataFrame embodying
        any subset of it — the engine re-applies the WHERE regardless."""
        self.planner_sources[name.lower()] = source
        self._bump_cache_epoch()

    def register_dialect(self, dialect, handler) -> None:
        """Register a custom statement dialect (dialect.Dialect) with a
        ``handler(engine, CustomStatement)`` executor. Statements whose
        leading keyword matches one of the dialect's grammars are parsed by
        the dialect and dispatched to the handler — the reference's runtime
        dialect extension (/root/reference/dialects/example/main.go:15-40,
        lex/dialect.go)."""
        for kw in dialect.leading_keywords():
            self.dialects[kw] = (dialect, handler)

    def register_sink(self, name: str, sink, key: str | None = None) -> None:
        """Register a writable MERGE-capable sink (sinks.DeltaMergeSink
        protocol). INSERT/UPSERT/UPDATE/DELETE against ``name`` execute as
        transactional table operations (append / MERGE INTO / UPDATE WHERE
        / DELETE WHERE) instead of the in-memory registry swap; reads scan
        the sink's current table state. Any in-memory table or view of the
        same name is EVICTED — otherwise reads would keep hitting the
        stale frame while DML mutates the sink."""
        self.sinks[name.lower()] = sink
        self._bump_cache_epoch()
        self.tables.pop(name.lower(), None)
        self.views.pop(name.lower(), None)
        if key or getattr(sink, "key", None):
            self.table_keys[name.lower()] = key or sink.key

    def register_include(self, name: str, filter_text: str) -> None:
        """Named filter for INCLUDE resolution (expr/include.go:23-25)."""
        stmt = parse_filterql(filter_text) if filter_text.upper().lstrip().startswith("FILTER") else None
        self.includes[name.lower()] = stmt.filter if stmt else parse_sql(f"SELECT 1 WHERE {filter_text}").where
        self._bump_cache_epoch()

    def _scope_params(self) -> dict:
        """Values resolvable as ``@var`` / ``?N`` identities in expressions:
        session vars overlaid with the active prepared-statement binds."""
        if not self._bound_params:
            return self.session_vars
        return {**self.session_vars, **self._bound_params}

    def table(self, name: str) -> DataFrame:
        df = self.tables.get(name.lower())
        if df is None:
            if name.lower() in self.sinks:
                return self.sinks[name.lower()].scan(self.spark)
            if name.lower() in self.views:
                return self._select_any(self.views[name.lower()])
            src = self.planner_sources.get(name.lower())
            if src is not None and hasattr(src, "scan"):
                return src.scan(self.spark)
            raise ExecError(f"unknown table {name!r}; registered: {sorted(self.tables)}")
        return df

    # ------------------------------------------------------------------
    # entry points
    # ------------------------------------------------------------------
    # statement classes that can mutate engine/table state — executing one
    # invalidates the plan/fold caches
    _MUTATING_STMTS = ("SqlInsert", "SqlUpdate", "SqlDelete", "SqlCreate", "SqlDrop", "SqlCommand", "SqlAlter", "SqlCopy", "SqlMerge", "SqlVacuum", "SqlRestore", "SqlOptimize", "SqlRefresh")

    def _bump_cache_epoch(self) -> None:
        self._cache_epoch += 1
        self._plan_cache.clear()
        self._fold_cache.clear()

    def clear_plan_cache(self) -> None:
        """Drop all cached analyzed plans and subquery folds."""
        self._bump_cache_epoch()

    # nondeterministic constructs whose seeds freeze in an analyzed plan:
    # caching them would return identical "random" values for the TTL
    _NONDET_RE = re.compile(r"\b(rand|randn|random|uuid|shuffle)\s*\(", re.IGNORECASE)

    def _cacheable(self, text: str, head: str) -> bool:
        # read-only statements only; bound ?-params make the text
        # non-reusable (prepare() handles that path); planner sources
        # (SQLite & co.) materialize rows at PLAN time, so a cached plan
        # would freeze external data and skip plan-inspection state
        # (mirrors the _fold_key guard); rand()/uuid()/unseeded
        # TABLESAMPLE must produce fresh values per execution
        if head not in ("SELECT", "WITH", "FILTER") or self._bound_params or self.planner_sources:
            return False
        if self._NONDET_RE.search(text):
            return False
        low = text.lower()
        if "tablesample" in low and "repeatable" not in low:
            return False
        return True

    def _sink_version_key(self):
        """Monotonic version fingerprint of all registered sinks, or None
        when any sink cannot report one. Sink-backed tables mutate OUTSIDE
        the engine (streaming upserts, direct sink calls), so cached plans
        are keyed on sink versions instead of disabling caching outright —
        one registered merge sink no longer turns off caching for pure
        registry tables; a sink commit changes the key and forces a miss."""
        if not self.sinks:
            return ()
        fps = []
        for name, s in sorted(self.sinks.items()):
            # cache_token (current version + oldest retained) also moves
            # on DIRECT sink.vacuum() calls, which preserve _version but
            # delete dirs a cached VERSION AS OF plan may be pinned to
            tok = getattr(s, "cache_token", None) or getattr(s, "_version", None)
            if not callable(tok):
                return None  # unversioned sink → cache off (as before)
            try:
                fps.append((name, tok()))
            except Exception:
                return None
        return tuple(fps)

    def execute(self, text: str):
        """Run any statement. SELECT/SHOW/DESCRIBE/FILTER → DataFrame;
        DML → affected row count; DDL/commands → None. Statements whose
        leading keyword matches a registered custom dialect are parsed by
        that dialect and dispatched to its handler.

        Read-only statements are served from a statement-level plan cache
        (text → analyzed DataFrame incl. folded subquery literals),
        invalidated on any registry/DDL/DML/SET mutation and after
        ``plan_cache_ttl_s`` (datemath "now" literals are frozen at plan
        time). Superset of the reference's PREPARE, which is parse-only
        (exec/executor.go:144-146)."""
        head = text.lstrip().split(None, 1)[0].upper() if text.strip() else ""
        if head in self.dialects:
            from .dialect import parse_dialect_statement

            dialect, handler = self.dialects[head]
            return handler(self, parse_dialect_statement(text, dialect))
        key = None
        seed_fp = None
        if self._cacheable(text, head):
            import time as _time

            sink_fp = self._sink_version_key()
            seed_fp = (sink_fp,)
            key = (text, self._cache_epoch, sink_fp) if sink_fp is not None else None
        if key is not None:
            hit = self._plan_cache.get(key)
            if hit is not None and (_time.monotonic() - hit[0]) < self.plan_cache_ttl_s:
                self.plan_cache_stats["hits"] += 1
                return hit[1]
            self.plan_cache_stats["misses"] += 1
        stmt = parse_sql(text)
        # seed the statement-scoped memo ONLY when we are about to run
        # (never on a cache hit, which returns above — a lingering seed
        # would hand a stale fingerprint to the next direct execute_stmt)
        self._seed_sink_fp = seed_fp
        out = self.execute_stmt(stmt)
        if key is not None and isinstance(out, DataFrame):
            import time as _time

            if len(self._plan_cache) >= self.plan_cache_max:
                # drop the oldest entry (insertion-ordered dict)
                self._plan_cache.pop(next(iter(self._plan_cache)), None)
            self._plan_cache[key] = (_time.monotonic(), out)
        return out

    def prepare(self, text: str) -> "PreparedStatement":
        """Parse once, execute many: ``?`` placeholders (PEP 249 qmark,
        numbered left-to-right) bind per execution at TRANSLATE time — no
        re-parse, and parameter-free subquery folds are reused across
        executions via the fold cache. Superset: the reference parses
        PREPARE but cannot execute it (exec/executor.go:144-146)."""
        return PreparedStatement(self, text)

    def execute_stmt(self, stmt):
        outermost = self._stmt_depth == 0
        self._stmt_depth += 1
        if outermost:
            seed = self._seed_sink_fp
            self._seed_sink_fp = None
            self._stmt_sink_fp = seed[0] if seed is not None else self._sink_version_key()
        try:
            return self._execute_stmt_inner(stmt)
        finally:
            self._stmt_depth -= 1
            if outermost:
                self._stmt_sink_fp = None

    def _execute_stmt_inner(self, stmt):
        if type(stmt).__name__ in self._MUTATING_STMTS:
            self._bump_cache_epoch()
        if isinstance(stmt, SqlSelect):
            return self._select(stmt)
        if isinstance(stmt, SqlSetOp):
            return self._set_op(stmt)
        if isinstance(stmt, CteQuery):
            return self._cte_query(stmt)
        if isinstance(stmt, FilterStatement):
            return self._filterql(stmt)
        if isinstance(stmt, SqlShow):
            return self._show(stmt)
        if isinstance(stmt, SqlDescribe):
            return self._describe(stmt)
        if isinstance(stmt, SqlInsert):
            return self._insert(stmt)
        if isinstance(stmt, SqlUpdate):
            return self._update(stmt)
        if isinstance(stmt, SqlDelete):
            return self._delete(stmt)
        if isinstance(stmt, SqlCreate):
            return self._create(stmt)
        if isinstance(stmt, SqlDrop):
            return self._drop(stmt)
        if isinstance(stmt, SqlCommand):
            return self._command(stmt)
        if isinstance(stmt, SqlCopy):
            return self._copy(stmt)
        if isinstance(stmt, SqlMerge):
            return self._merge(stmt)
        if isinstance(stmt, SqlVacuum):
            return self._vacuum(stmt)
        if isinstance(stmt, SqlRestore):
            return self._restore(stmt)
        if isinstance(stmt, SqlOptimize):
            return self._optimize(stmt)
        if isinstance(stmt, SqlRefresh):
            return self._refresh(stmt)
        if isinstance(stmt, SqlAlter):
            # parity: reference plans but never executes ALTER
            # (exec/ddl.go:136-152 → ErrNotImplemented)
            raise ExecError("ALTER is not implemented")
        raise ExecError(f"cannot execute {type(stmt).__name__}")

    def sql(self, text: str) -> DataFrame:
        out = self.execute(text)
        if not isinstance(out, DataFrame):
            raise ExecError(f"statement did not produce rows: {text[:50]}")
        return out

    def query(self, text: str):
        """database/sql-driver ergonomics (exec/sqldriver.go:50): returns an
        iterator of Row."""
        return self.sql(text).toLocalIterator()

    def execute_script(self, text: str) -> list:
        """Run `;`-separated statements in order (rel.ParseSqlStatements,
        rel/parse_sql.go:69); returns the per-statement results."""
        from .rel import parse_sql_statements

        return [self.execute_stmt(stmt) for stmt in parse_sql_statements(text)]

    def explain(self, text: str, mode: str = "formatted") -> str:
        """Formatted physical plan for a statement — the plan-inspection
        loop (`PushedFilters` / `ReadSchema` / join strategies). Bypasses
        the plan cache: a cached DataFrame that has already executed shows
        its FINALIZED adaptive plan, not the statement's initial plan."""
        out = self.execute_stmt(parse_sql(text))
        if not isinstance(out, DataFrame):
            raise ExecError(f"statement did not produce rows: {text[:50]}")
        df = out
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )

    def explain_analyze(self, text: str) -> str:
        """Execute the statement to completion (noop sink — executor-
        parallel, nothing collected) and return the physical plan
        annotated with RUNTIME per-operator SQL metrics (rows, scan/agg
        times, shuffle bytes, peak memory …) — DuckDB/Postgres-style
        EXPLAIN ANALYZE, from Spark's own SQLMetric registry.

        The report footer carries the plan/fold cache activity of THIS
        statement (how many subquery folds were served from cache vs
        computed) plus the session totals — the observability hook for
        tuning ``plan_cache_ttl_s`` on repeated-statement workloads."""
        before = dict(self.plan_cache_stats)
        # identity snapshot of each sink's pruning record: scan_pruned
        # assigns a fresh dict per pruned scan, so `is` tells us whether
        # THIS statement pruned (an equal-valued dict from a repeat of
        # the same query still differs by identity)
        scans_before = {n: getattr(s, "last_scan", None) for n, s in self.sinks.items()}
        out = self.execute_stmt(parse_sql(text))
        if not isinstance(out, DataFrame):
            raise ExecError(f"EXPLAIN ANALYZE needs a row-producing statement: {text[:50]}")
        report = self._analyze_plan(out, stats_before=before)
        skipped = []
        for n, s in self.sinks.items():
            ls = getattr(s, "last_scan", None)
            if ls is not None and ls is not scans_before.get(n):
                line = f"{n}: read {ls['files_read']}/{ls['files_total']} files of v{ls['version']}"
                if "partitions_total" in ls:
                    line += f", {ls['partitions_read']}/{ls['partitions_total']} partitions"
                skipped.append(line)
        if skipped:
            report += "\nDataSkipping: " + "; ".join(skipped)
        return report

    def _cache_stats_footer(self, before: dict) -> str:
        delta = {k: self.plan_cache_stats[k] - before.get(k, 0) for k in self.plan_cache_stats}
        this = ", ".join(f"{k}={v}" for k, v in sorted(delta.items()) if v) or "none"
        total = ", ".join(f"{k}={v}" for k, v in sorted(self.plan_cache_stats.items()))
        return f"PlanCache: this statement: {this}  [session: {total}]"

    def _analyze_plan(self, df: DataFrame, stats_before: dict | None = None) -> str:
        # run the DataFrame's OWN queryExecution (a writer would attach
        # metrics to a separate wrapping execution): toRdd().count() is
        # executor-parallel and ships only per-partition counts back
        df._jdf.queryExecution().toRdd().count()
        lines: list[str] = []

        def kids(node):
            out = []
            ch = node.children()
            for i in range(ch.length()):
                out.append(ch.apply(i))
            if not out:
                # AQE wrappers (AdaptiveSparkPlan / QueryStage / ReusedExchange)
                # hold their subtree outside children()
                for meth in ("executedPlan", "plan", "child"):
                    try:
                        out.append(getattr(node, meth)())
                        break
                    except Exception:
                        continue
            return out

        def walk(node, depth):
            if depth > 100:  # pragma: no cover - plans are never this deep
                return
            ms = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m = kv._2()
                v = m.value()
                if v:
                    label = m.name().get() if m.name().isDefined() else kv._1()
                    ms[label] = v
            rendered = ", ".join(f"{k}={v:,}" for k, v in sorted(ms.items()))
            lines.append("  " * depth + node.nodeName() + (f"  [{rendered}]" if rendered else ""))
            for c in kids(node):
                walk(c, depth + 1)

        walk(df._jdf.queryExecution().executedPlan(), 0)
        if stats_before is not None:
            lines.append(self._cache_stats_footer(stats_before))
        return "\n".join(lines)

    def filter(self, df: DataFrame, filterql_text: str) -> DataFrame:
        """Apply a FilterQL statement to an arbitrary DataFrame
        (vm.Matches ≈ vm/filterqlvm.go:81)."""
        stmt = parse_filterql(filterql_text)
        scope = Scope({"_": df}, includes=self.includes, strict=False)
        return df.filter(to_column(stmt.filter, scope))

    # ------------------------------------------------------------------
    # SELECT
    # ------------------------------------------------------------------
    def _select(self, sel: SqlSelect) -> DataFrame:
        if sel.windows:
            sel = self._resolve_named_windows(sel)
        if not sel.from_:
            # no outer frame to correlate against or join onto → eager
            # plan-time materialization (the only option here)
            sel = self._resolve_scalar_subqueries(sel)
            return self._literal_select(sel)

        sel = self._rewrite_select_unnest(sel)
        df, scope = self._build_from(sel)

        # Select-list + WHERE + (non-agg) QUALIFY subqueries lower lazily
        # (decorrelation) in _rewrite_subqueries; HAVING and aggregated
        # QUALIFY subqueries lower inside _aggregate against the
        # aggregated frame (correlation binds to group keys)
        if getattr(sel, "group_all", False) and not sel.group_by:
            # GROUP BY ALL (DuckDB/Snowflake superset): every non-aggregate
            # select expression is a group key (idempotent on cached ASTs)
            sel.group_by = [
                c.expr for c in sel.columns if not c.is_star and not funcs.is_agg_tree(c.expr)
            ]
        is_agg = bool(sel.group_by) or any(funcs.is_agg_tree(c.expr) for c in sel.columns if not c.is_star)
        df, sel = self._rewrite_subqueries(df, scope, sel, include_qualify=not is_agg)

        # WHERE — decompose AND-conjuncts; IN (SELECT) → semi/anti join
        # (superset: reference parses but errors, plan/planner_select.go:94-98)
        if sel.where is not None:
            df, scope = self._apply_where(df, scope, sel)

        if getattr(sel, "distinct_on", None):
            # DISTINCT ON (k, ...) — Postgres/DuckDB: keep ONE row per key
            # tuple, the first under ORDER BY (arbitrary without one).
            # Lowered to a row_number window: one shuffle on the keys.
            from pyspark.sql.window import Window

            if is_agg:
                raise ExecError("DISTINCT ON cannot combine with aggregation")
            # resolve ORDER BY keys like the main path does: positional
            # (ORDER BY 2) and select-list-alias keys bind to the
            # PROJECTION expression — translated in the raw scope they
            # would fold to a constant / raise (ADVICE r7)
            d_proj, d_names = self._projection(sel, scope)
            w_order = []
            for e, direction in sel.order_by:
                if isinstance(e, NumberNode):
                    idx = int(e.text) - 1
                    if not (0 <= idx < len(d_names)):
                        raise ExecError(f"ORDER BY position {e.text} is not in the select list")
                    col = d_proj[idx]
                elif isinstance(e, IdentityNode) and e.name in d_names and e.name.lower() not in {c.lower() for c in df.columns}:
                    col = d_proj[d_names.index(e.name)]
                else:
                    col = to_column(e, scope)
                w_order.extend(self._directional(col, direction))
            w = Window.partitionBy(*[to_column(k, scope) for k in sel.distinct_on]).orderBy(
                *(w_order or [F.lit(1)])
            )
            df = df.withColumn("__don_rn", F.row_number().over(w)).where(F.col("__don_rn") == 1).drop("__don_rn")

        if is_agg:
            df = self._aggregate(df, scope, sel)
            out_scope = Scope({"_": df}, includes=self.includes, params=self._scope_params())
            df = self._order_limit(df, out_scope, sel, post_agg=True)
            return df

        # projection with hidden sort columns so ORDER BY can reference
        # non-selected expressions (standard SQL; Catalyst prunes the rest);
        # ORDER BY keys naming a select alias sort on the projected column
        proj, names = self._projection(sel, scope)
        order_pairs = sel.order_by
        if getattr(sel, "order_all", None) and not order_pairs:
            # ORDER BY ALL: every output column, left to right (DuckDB)
            order_pairs = [(IdentityNode((n,)), sel.order_all) for n in names]
        sort_cols: list[tuple[str, SparkColumn | None, str]] = []
        for i, (e, direction) in enumerate(order_pairs):
            if isinstance(e, IdentityNode) and e.name in names:
                sort_cols.append((e.name, None, direction))
            elif isinstance(e, NumberNode):  # ORDER BY 2 → positional
                sort_cols.append((names[int(e.text) - 1], None, direction))
            else:
                sort_cols.append((f"__sort_{i}", to_column(e, scope), direction))
        if sel.qualify is not None:
            # QUALIFY: post-window filter (superset; Snowflake/DuckDB).
            # The predicate is computed ALONGSIDE the projection (same base
            # scope, select aliases substituted), so window values in the
            # select list are over the pre-filter rows — filtering first
            # and re-projecting would renumber row_number() etc. Catalyst
            # CSEs the duplicated window expressions into one WindowExec.
            qnode = self._substitute_select_aliases(sel.qualify, sel)
            qcol = to_column(qnode, scope).cast("boolean")
            hidden = [c.alias(n) for n, c, _ in sort_cols if c is not None]
            df = df.select(*(proj + hidden + [qcol.alias("__qualify")])).filter(F.col("__qualify"))
            if sel.distinct:
                df = df.select(*names).distinct()
                out_scope = Scope({"_": df}, includes=self.includes, params=self._scope_params())
                order = []
                for (name, c, direction), (e, _) in zip(sort_cols, order_pairs):
                    col = F.col(name) if c is None else to_column(e, out_scope)
                    order.extend(self._directional(col, direction))
                if order:
                    df = df.orderBy(*order)
            else:
                if sort_cols:
                    df = df.orderBy(*[d for n, _, direction in sort_cols for d in self._directional(F.col(n), direction)])
                df = df.select(*names)
        elif sel.distinct:
            # DISTINCT applies to the projected rows; sort keys must be
            # output columns (or re-translatable against them)
            df = df.select(*proj).distinct()
            out_scope = Scope({"_": df}, includes=self.includes, params=self._scope_params())
            order = []
            for (name, c, direction), (e, _) in zip(sort_cols, order_pairs):
                col = F.col(name) if c is None else to_column(e, out_scope)
                order.extend(self._directional(col, direction))
            if order:
                df = df.orderBy(*order)
        elif sort_cols:
            hidden = [c.alias(n) for n, c, _ in sort_cols if c is not None]
            df = df.select(*(proj + hidden))
            df = df.orderBy(*[d for n, _, direction in sort_cols for d in self._directional(F.col(n), direction)])
            df = df.select(*names)
        else:
            df = df.select(*proj)
        if sel.offset:
            df = df.offset(sel.offset)
        if sel.limit is not None:
            df = df.limit(sel.limit)
        if sel.into:
            self.register_df(sel.into, df)
        return df

    def _select_any(self, sel) -> DataFrame:
        """SELECT, set-op chain, or CTE query → DataFrame."""
        if isinstance(sel, CteQuery):
            return self._cte_query(sel)
        return self._set_op(sel) if isinstance(sel, SqlSetOp) else self._select(sel)

    def _cte_query(self, stmt: CteQuery) -> DataFrame:
        """WITH … AS (…) SELECT …: each CTE registers as a LAZY DataFrame
        (a declared plan, not a materialization — Catalyst inlines it and
        still pushes filters/prunes columns through it; Spark's own CTE
        handling is identical). Later CTEs see earlier ones; names shadow
        registered tables for the statement's duration only."""
        saved: dict[str, DataFrame] = {}
        added: list[str] = []
        self._cte_binding_depth = getattr(self, "_cte_binding_depth", 0) + 1
        try:
            for name, csel in stmt.ctes:
                key = name.lower()
                if stmt.recursive and self._references_table(csel, key):
                    df = self._recursive_cte(key, csel)
                else:
                    df = self._select_any(csel)
                if key in self.tables:
                    saved[key] = self.tables[key]
                else:
                    added.append(key)
                self.tables[key] = df
            return self._select_any(stmt.query)
        finally:
            self._cte_binding_depth -= 1
            self.tables.update(saved)
            for k in added:
                self.tables.pop(k, None)

    @classmethod
    def _references_table(cls, sel, key: str) -> bool:
        """Does this select-chain read table ``key`` anywhere in a FROM
        (including derived tables and set-op operands)?"""
        if isinstance(sel, SqlSetOp):
            return cls._references_table(sel.left, key) or cls._references_table(sel.right, key)
        if isinstance(sel, CteQuery):  # pragma: no cover - nested WITH
            return any(cls._references_table(c, key) for _, c in sel.ctes) or cls._references_table(sel.query, key)
        for src in getattr(sel, "from_", []) or []:
            if src.name is not None and src.name.lower() == key:
                return True
            if src.subquery is not None and cls._references_table(src.subquery, key):
                return True
        return False

    def _recursive_cte(self, key: str, body) -> DataFrame:
        """``WITH RECURSIVE r AS (anchor UNION [ALL] step) …`` — iterative
        union fixpoint (semi-naive): each round binds ``r`` to the rows
        produced by the PREVIOUS round only (the delta), unions the new
        rows in, and stops when a round adds nothing. UNION dedupes the
        delta against everything seen (so cyclic graphs terminate); UNION
        ALL keeps bag semantics and relies on the recursion being finite.

        Scale: the per-round frames are ``localCheckpoint``-ed — without
        that the logical plan doubles every round and Catalyst analysis
        goes quadratic. The only driver action per round is an
        ``isEmpty`` on the delta (Spark's own recursive-CTE runtime does
        the same loop; its depth limit default of 100 is mirrored via
        session var ``max_recursion_depth``). Superset: the reference has
        no recursion of any kind."""
        if not isinstance(body, SqlSetOp) or body.op not in ("UNION", "UNION ALL"):
            raise ExecError("recursive CTE body must be: anchor-SELECT UNION [ALL] recursive-SELECT")
        if self._references_table(body.left, key):
            # left-assoc chains put extra anchors on the left; the
            # recursive member must be the RIGHT operand
            raise ExecError("recursive CTE: only the right UNION operand may reference the CTE itself")
        distinct = body.op == "UNION"
        anchor = self._select_any(body.left)
        limit = int(self.session_vars.get("max_recursion_depth", 100))
        result = anchor.distinct() if distinct else anchor
        result = result.localCheckpoint(eager=True)
        frontier = result
        saved = self.tables.get(key)
        try:
            for _ in range(limit):
                self.tables[key] = frontier
                step = self._select_any(body.right)
                if len(step.columns) != len(result.columns):
                    raise ExecError(
                        f"recursive CTE column counts differ: anchor {len(result.columns)} vs step {len(step.columns)}"
                    )
                step = step.toDF(*result.columns)
                if distinct:
                    step = step.distinct().subtract(result)
                step = step.localCheckpoint(eager=True)
                if step.isEmpty():
                    return result
                result = result.unionAll(step).localCheckpoint(eager=True)
                frontier = step
            raise ExecError(
                f"recursive CTE {key!r} exceeded max_recursion_depth={limit} "
                "(SET max_recursion_depth = N to raise)"
            )
        finally:
            if saved is not None:
                self.tables[key] = saved
            else:
                self.tables.pop(key, None)

    def _set_op(self, stmt: SqlSetOp) -> DataFrame:
        """Set operations — superset (SURVEY §2.6: reference has none).
        Spark resolves set-op columns POSITIONALLY, same as ANSI SQL;
        UNION/INTERSECT/EXCEPT dedup, the ALL forms keep bag semantics.
        A chain-level ORDER BY/LIMIT/OFFSET (hoisted by the parser from
        the trailing operand, ANSI binding) applies to the combined set."""
        left = self._select_any(stmt.left)
        right = self._select_any(stmt.right)
        if len(left.columns) != len(right.columns):
            raise ExecError(f"set-op column counts differ: {len(left.columns)} vs {len(right.columns)}")
        if stmt.op == "UNION ALL":
            out = left.unionAll(right)
        elif stmt.op == "UNION":
            out = left.unionAll(right).distinct()
        elif stmt.op == "INTERSECT":
            out = left.intersect(right)
        elif stmt.op == "INTERSECT ALL":
            out = left.intersectAll(right)
        elif stmt.op == "EXCEPT":
            out = left.subtract(right)
        elif stmt.op == "EXCEPT ALL":
            out = left.exceptAll(right)
        else:
            raise ExecError(f"unknown set op {stmt.op}")
        if stmt.order_by:
            scope = Scope({"_": out}, includes=self.includes, params=self._scope_params())
            cols = []
            for e, direction in stmt.order_by:
                c = F.col(out.columns[int(e.text) - 1]) if isinstance(e, NumberNode) else to_column(e, scope)
                cols.extend(self._directional(c, direction))
            out = out.orderBy(*cols)
        if stmt.offset:
            out = out.offset(stmt.offset)
        if stmt.limit is not None:
            out = out.limit(stmt.limit)
        return out

    # -- FROM / joins ----------------------------------------------------
    def _values_frame(self, src: FromSource) -> DataFrame:
        """(VALUES (…), (…)) AS t(c1, c2) — ANSI row constructor
        (superset; the reference's VALUES exists only inside INSERT).
        Each row is a 1-row projection over ``range(1)`` (rows may hold
        expressions — now(), uuid()); positional union coerces types the
        ANSI way. VALUES lists are small by construction — this never
        scales with data, so the union chain is fine."""
        ncols = len(src.values_rows[0])
        names = src.out_cols or [f"col{i}" for i in range(ncols)]
        if len(names) != ncols:
            raise ExecError(f"VALUES arity {ncols} does not match column list {names}")
        scope = Scope({}, includes=self.includes, params=self._scope_params())
        out = None
        for r in src.values_rows:
            one = self.spark.range(1).select(
                *[to_column(node, scope).alias(n) for node, n in zip(r, names)]
            )
            out = one if out is None else out.unionAll(one)
        return out

    def _apply_pivot(self, df: DataFrame, src: FromSource) -> DataFrame:
        """Bracketed PIVOT (Snowflake/DuckDB shape, superset): implicit
        group keys are every column not consumed by the aggregate or the
        FOR column — then one groupBy().pivot(values).agg(). Passing the
        explicit IN-list to .pivot() skips Spark's distinct-values scan
        AND keeps the map-side partial aggregation: one shuffle total."""
        spec = src.pivot
        scope = Scope({"_": df}, includes=self.includes, params=self._scope_params())
        agg_node = spec["agg"]
        agg_col = to_column(agg_node, scope)
        if not funcs.is_agg_tree(agg_node):
            raise ExecError("PIVOT needs an aggregate function")
        from .nodes import BoolNode as _B
        from .nodes import NumberNode as _Num
        from .nodes import StringNode as _S
        from .planner import _walk_identities

        idents: list[IdentityNode] = []
        _walk_identities(agg_node, idents)
        used = {p.parts[-1].lower() for p in idents}
        used.add(spec["for"].lower())
        keys = [c for c in df.columns if c.lower() not in used]
        vals, names = [], []
        for v, alias in spec["in"]:
            if isinstance(v, (_Num, _S, _B)):
                lit = v.value
            else:
                raise ExecError("PIVOT IN values must be literals")
            vals.append(lit)
            names.append(alias or str(lit))
        out = df.groupBy(*[F.col(k) for k in keys]).pivot(spec["for"], vals).agg(agg_col)
        # single-agg pivot names columns by value string — re-alias to the
        # user-facing names (IN-list aliases win)
        for spark_name, want in zip(out.columns[len(keys):], names):
            if spark_name != want:
                out = out.withColumnRenamed(spark_name, want)
        # ANSI: count over an EMPTY pivot cell is 0, but Spark's pivot
        # leaves the cell NULL (fuzz-v4-found divergence vs DuckDB) — only
        # the count family has a non-NULL empty-group value to restore
        if getattr(agg_node, "name", "").lower() in ("count", "count_distinct", "approx_count_distinct"):
            out = out.withColumns({c: F.coalesce(F.col(c), F.lit(0)) for c in names})
        return out

    def _apply_unpivot(self, df: DataFrame, src: FromSource) -> DataFrame:
        """Bracketed UNPIVOT (superset): Spark's native unpivot (melt).
        NULL measure values are dropped by default (Snowflake/DuckDB
        semantics); INCLUDE NULLS keeps them. Narrow op — no shuffle."""
        spec = src.unpivot
        lower = {c.lower(): c for c in df.columns}
        melt_cols, labels = [], []
        for c, label in spec["cols"]:
            hit = lower.get(c.lower())
            if hit is None:
                raise ExecError(f"UNPIVOT column {c!r} not in source")
            melt_cols.append(hit)
            labels.append(label or hit)
        ids = [c for c in df.columns if c not in melt_cols]
        out = df.unpivot(ids, melt_cols, spec["name"], spec["value"])
        if labels != melt_cols:
            mapping = F.create_map(*[x for c, l in zip(melt_cols, labels) for x in (F.lit(c), F.lit(l))])
            out = out.withColumn(spec["name"], mapping[F.col(spec["name"])])
        if not spec["include_nulls"]:
            out = out.filter(F.col(spec["value"]).isNotNull())
        return out

    def _sink_scan(self, sink, src: "FromSource", sel: "SqlSelect | None",
                   version: int | None = None) -> DataFrame:
        """Scan a versioned sink table, with FILE-LEVEL data skipping when
        the sink supports it: the SELECT's pushable WHERE conjuncts
        (col-vs-literal ranges / IN sets / null checks that reference only
        this source) are handed to ``sink.scan_pruned`` so files whose
        min/max stats cannot match are never opened. Pruning is purely an
        I/O optimization — the engine applies the FULL WHERE to the frame
        afterwards, so kept-but-unneeded files are filtered exactly as
        before and results are identical to an unpruned scan."""
        if sel is not None and sel.where is not None and hasattr(sink, "scan_pruned"):
            from .skipping import extract_conjuncts

            refs = {r for r in ((src.ref or "").lower(), (src.name or "").lower()) if r}
            conj = extract_conjuncts(sel.where, refs, allow_bare=len(sel.from_) == 1)
            if conj:
                return sink.scan_pruned(self.spark, conj, version=version)
        if version is None:
            # current-state scan: minimal protocol (fake/duck-typed sinks
            # need not accept a version kwarg)
            return sink.scan(self.spark)
        return sink.scan(self.spark, version=version)

    def _resolve_source(self, src: FromSource, sel: SqlSelect | None = None) -> DataFrame:
        if getattr(src, "table_changes", None) is not None:
            df = self._table_changes_df(*src.table_changes)
        elif src.values_rows is not None:
            df = self._values_frame(src)
        elif src.subquery is not None:
            df = self._select_any(src.subquery)
        else:
            df = None
            planner_src = self.planner_sources.get((src.name or "").lower())
            if planner_src is not None and sel is not None and hasattr(planner_src, "walk_source_select"):
                # source-owned pushdown: offer the rewritten sub-select
                # (plan.SourcePlanner ≈ plan/plan.go:116-123); a None return
                # declines and we fall back to the plain scan
                from .planner import rewrite_source_select

                df = planner_src.walk_source_select(self, rewrite_source_select(sel, src).select)
            want_version = getattr(src, "version", None)
            as_of = getattr(src, "as_of_ts", None)
            if df is None and (want_version is not None or as_of is not None):
                # time travel: resolve the named snapshot of a versioned
                # sink (ParquetMergeSink `v<N>` dirs / Delta versionAsOf)
                sink = self.sinks.get((src.name or "").lower())
                if sink is None:
                    raise ExecError(
                        f"VERSION/TIMESTAMP AS OF requires a versioned sink table; {src.name!r} is not one"
                    )
                if as_of is not None:
                    if not hasattr(sink, "version_at"):
                        raise ExecError(f"sink for {src.name!r} does not support TIMESTAMP AS OF")
                    want_version = sink.version_at(as_of)
                try:
                    df = self._sink_scan(sink, src, sel, version=want_version)
                except TypeError as e:
                    raise ExecError(f"sink for {src.name!r} does not support time travel") from e
            if df is None:
                nm = (src.name or "").lower()
                # file-level data skipping: a versioned sink scan gets the
                # pushable WHERE conjuncts so non-matching files are never
                # opened (skipping.py). Registry tables shadow sinks
                # (self.table precedence), so only route when the sink
                # actually owns the name.
                sink = self.sinks.get(nm) if nm not in self.tables else None
                if sink is not None:
                    df = self._sink_scan(sink, src, sel)
                else:
                    df = self.table(src.name)
            if src.name.lower() in self.broadcast_hints:
                df = F.broadcast(df)
        if src.pivot is not None:
            df = self._apply_pivot(df, src)
        if src.unpivot is not None:
            df = self._apply_unpivot(df, src)
        if src.sample is not None:
            # TABLESAMPLE: PERCENT → per-row Bernoulli sample at the scan
            # (SampleExec, narrow, no shuffle; REPEATABLE pins the seed);
            # ROWS → limit, matching Spark SQL's TABLESAMPLE (n ROWS)
            sp = src.sample
            if sp["kind"] == "percent":
                if not 0 <= sp["value"] <= 100:
                    raise ExecError(f"TABLESAMPLE percent must be in [0, 100], got {sp['value']}")
                # NOTE: fraction must be a KEYWORD arg — PySpark's sample()
                # arg-shuffles a positional float into withReplacement and
                # silently drops the seed
                df = df.sample(fraction=sp["value"] / 100.0, seed=sp["seed"])
            else:
                df = df.limit(sp["value"])
        return df.alias(src.ref)

    def _table_changes_df(self, tname: str, v_from: int, v_to: int | None) -> DataFrame:
        """``FROM TABLE_CHANGES('t', v_from[, v_to])`` — Delta-style change
        data feed over a versioned sink: one row per changed table row per
        commit in ``(v_from, v_to]``, tagged ``_change_type`` (insert /
        delete / update_preimage / update_postimage) with
        ``_commit_version`` and ``_commit_timestamp``.

        Snapshot sinks (ParquetMergeSink) keep full snapshots, not change
        logs, so each version step is reconstructed as a key-joined diff:
        one full-outer join per step on the sink key — honest cost
        O(versions × table). That is the right tool for incremental
        downstream consumption of a MERGE-maintained table (read ONLY
        what changed since the version you last processed instead of
        rescanning 100 TB); a Delta sink with native CDF enabled should
        read ``table_changes`` through Delta and skip this reconstruction.
        Vacuumed versions raise (the diff needs both endpoints on disk)."""
        sink = self.sinks.get(tname.lower())
        if sink is None or not hasattr(sink, "versions"):
            raise ExecError(f"TABLE_CHANGES requires a versioned sink table; {tname!r} is not one")
        have = sorted(sink.versions())
        if not have:
            raise ExecError(f"TABLE_CHANGES: {tname!r} has no committed versions")
        if isinstance(v_from, str) or isinstance(v_to, str):
            # Delta startingTimestamp/endingTimestamp parity: a string
            # start bound resolves to the FIRST commit at or after it, a
            # string end bound to the LAST commit at or before it —
            # against the durable commit-time sidecar, failing loudly
            # when the bound falls outside the retained history
            if not hasattr(sink, "commit_time"):
                raise ExecError(
                    f"TABLE_CHANGES: sink for {tname!r} has no commit timestamps; "
                    "use version-number bounds"
                )
            import datetime as _dt

            def _want(bound: str):
                try:
                    w = _dt.datetime.fromisoformat(bound)
                except ValueError:
                    raise ExecError(
                        f"TABLE_CHANGES: {bound!r} is neither a version number "
                        "nor an ISO timestamp"
                    ) from None
                return w.replace(tzinfo=_dt.timezone.utc) if w.tzinfo is None else w

            times = {v: sink.commit_time(v) for v in have}
            if isinstance(v_from, str):
                w = _want(v_from)
                later = [v for v in have if times[v] >= w]
                if not later:
                    raise ExecError(
                        f"TABLE_CHANGES: no commit of {tname!r} at or after "
                        f"{v_from!r} (latest: {times[max(have)].isoformat()})"
                    )
                v_from = min(later)
            if isinstance(v_to, str):
                w = _want(v_to)
                earlier = [v for v in have if times[v] <= w]
                if not earlier:
                    raise ExecError(
                        f"TABLE_CHANGES: no commit of {tname!r} at or before "
                        f"{v_to!r} (earliest retained: {times[min(have)].isoformat()})"
                    )
                v_to = max(earlier)
        v_to = max(have) if v_to is None else int(v_to)
        v_from = int(v_from)
        if v_from < 0:
            raise ExecError(f"TABLE_CHANGES: start version must be >= 0, got {v_from}")
        if v_from > v_to:
            raise ExecError(f"TABLE_CHANGES: start version {v_from} is after end version {v_to}")
        # Delta semantics: [v_from, v_to] are COMMITS whose changes are
        # returned; commit v diffs v-1 → v (commit 0 = the initial inserts).
        # Commits with a commit-time change RECORDING (ParquetMergeSink
        # c<N> dirs — the Delta _change_data design) are read directly:
        # O(|changes|), no snapshot diff, and they stay readable even
        # after the flanking snapshots are vacuumed. Only unrecorded
        # steps need both diff endpoints on disk.
        if v_to not in have:
            raise ExecError(
                f"TABLE_CHANGES: version {v_to} of {tname!r} is not on disk "
                f"(vacuumed or never committed; have {have})"
            )
        # recording KIND per version from driver-side path checks only —
        # an N-commit backlog must not pay N schema-inference jobs just to
        # plan the feed (every 'files' version below batches into ONE read)
        has_kind = hasattr(sink, "recording_kind")
        if has_kind:
            kinds = {v: sink.recording_kind(v) for v in range(v_from, v_to + 1)}
            recorded: dict[int, DataFrame | None] = {}
        else:
            kinds = {}
            recorded = {
                v: (
                    sink.recorded_changes(self.spark, v)
                    if hasattr(sink, "recorded_changes")
                    else None
                )
                for v in range(v_from, v_to + 1)
            }

        def _has_recording(v: int) -> bool:
            return kinds[v] != "none" if has_kind else recorded[v] is not None

        def _needs_endpoints(v: int) -> bool:
            # an 'overwrite' marker derives its rows from BOTH flanking
            # snapshots (delete-all v-1 + insert-all v), same on-disk
            # needs as the diff fallback; other recordings stand alone
            if not _has_recording(v):
                return True
            return has_kind and kinds[v] == "overwrite"

        missing = [
            v
            for v in range(v_from, v_to + 1)
            if _needs_endpoints(v) and not (v in have and (v == 0 or v - 1 in have))
        ]
        if missing:
            raise ExecError(
                f"TABLE_CHANGES: versions {missing} of {tname!r} have neither a change "
                f"recording nor both diff endpoints on disk (vacuumed or never "
                f"committed; have {have})"
            )
        key = sink.key

        def _ct(v: int):
            # a recorded step stays readable after its snapshot dir is
            # vacuumed, but then has no commit-time source — NULL timestamp
            try:
                return sink.commit_time(v) if hasattr(sink, "commit_time") else None
            except Exception:
                return None

        commit_ts = {v: _ct(v) for v in range(v_from, v_to + 1)}
        # column list from the sidecar when possible (driver-side) — a
        # feed build must not pay a Spark schema job just to learn names
        cols = sink.snapshot_columns(v_to) if hasattr(sink, "snapshot_columns") else None
        if cols is None:
            cols = sink.scan(self.spark, version=v_to).columns
        steps = []
        batch_dirs: list[tuple[int, str]] = []  # 'files' recordings → ONE read
        for v in range(v_from, v_to + 1):
            if has_kind and kinds[v] != "none":
                k = kinds[v]
                if k == "no_changes":
                    continue  # layout-only commit: zero change rows
                if k == "all_insert":
                    steps.append(
                        sink.scan(self.spark, version=v).select(
                            *cols,
                            F.lit("insert").alias("_change_type"),
                            F.lit(v).cast("long").alias("_commit_version"),
                            F.lit(commit_ts.get(v)).cast("timestamp").alias("_commit_timestamp"),
                        )
                    )
                elif k == "overwrite":
                    # delete-all(v-1) + insert-all(v): two plain scans, no
                    # join/shuffle — cheaper than the full-outer diff and
                    # exactly Delta's CDF semantics for a replace commit
                    def _ow_side(vv: int, ct: str):
                        d = sink.scan(self.spark, version=vv)
                        picked = [
                            (F.col(c) if c in d.columns else F.lit(None)).alias(c)
                            for c in cols
                        ]
                        return d.select(
                            *picked,
                            F.lit(ct).alias("_change_type"),
                            F.lit(v).cast("long").alias("_commit_version"),
                            F.lit(commit_ts.get(v)).cast("timestamp").alias("_commit_timestamp"),
                        )

                    steps.append(_ow_side(v - 1, "delete"))
                    steps.append(_ow_side(v, "insert"))
                else:  # 'files'
                    batch_dirs.append((v, sink._changes_dir(v)))
                continue
            if not has_kind and recorded[v] is not None:
                steps.append(
                    recorded[v].select(
                        *cols,
                        F.col("_change_type"),
                        F.lit(v).cast("long").alias("_commit_version"),
                        F.lit(commit_ts.get(v)).cast("timestamp").alias("_commit_timestamp"),
                    )
                )
                continue
            cur = sink.scan(self.spark, version=v)
            prev = cur.limit(0) if v == 0 else sink.scan(self.spark, version=v - 1)
            prev, cur = prev.alias("__p"), cur.alias("__c")
            j = prev.join(cur, on=F.col(f"__p.{key}").eqNullSafe(F.col(f"__c.{key}")), how="full_outer")
            p_key, c_key = F.col(f"__p.{key}"), F.col(f"__c.{key}")
            changed = None
            for c in cols:
                ne = ~F.col(f"__p.{c}").eqNullSafe(F.col(f"__c.{c}"))
                changed = ne if changed is None else (changed | ne)
            # ONE pass over the join: each row maps to 0-2 change records
            # (array + explode) instead of four filtered branch selects
            # that would each re-execute the full-outer join — at 100 TB,
            # 1 scan per version step, not 4
            p_struct = F.struct(*[F.col(f"__p.{c}").alias(c) for c in cols])
            c_struct = F.struct(*[F.col(f"__c.{c}").alias(c) for c in cols])
            rec = lambda ct, row: F.struct(F.lit(ct).alias("_ct"), row.alias("_row"))  # noqa: E731
            pairs = F.array(
                F.when(p_key.isNull(), rec("insert", c_struct)).when(
                    p_key.isNotNull() & c_key.isNotNull() & changed,
                    rec("update_preimage", p_struct),
                ),
                F.when(c_key.isNull(), rec("delete", p_struct)).when(
                    p_key.isNotNull() & c_key.isNotNull() & changed,
                    rec("update_postimage", c_struct),
                ),
            )
            steps.append(
                j.select(F.explode(pairs).alias("_e"))
                .filter(F.col("_e").isNotNull())
                .select(
                    *[F.col(f"_e._row.{c}").alias(c) for c in cols],
                    F.col("_e._ct").alias("_change_type"),
                    F.lit(v).cast("long").alias("_commit_version"),
                    F.lit(commit_ts.get(v)).cast("timestamp").alias("_commit_timestamp"),
                )
            )
        if batch_dirs:
            # ALL recorded-files commits in ONE parquet read (mergeSchema
            # tolerates schema-widening commits); the commit version is
            # derived from each file's c<N> path component, the timestamp
            # looked up from a literal map — O(backlog) stat calls + one
            # schema job, not one read per version
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *[d for _, d in batch_dirs]
            )
            # anchor to the file's IMMEDIATE parent dir (recordings are
            # flat): a first-match regex would mis-tag every commit when
            # the warehouse path itself contains a c<N> segment
            vcol = F.regexp_extract(
                F.input_file_name(), r"[/\\]c(\d+)[/\\][^/\\]+$", 1
            ).cast("long")
            map_items: list = []
            for v, _ in batch_dirs:
                map_items += [
                    F.lit(v).cast("long"),
                    F.lit(commit_ts.get(v)).cast("timestamp"),
                ]
            ts_expr = F.element_at(F.create_map(*map_items), F.col("_commit_version"))
            steps.append(
                df.withColumn("_commit_version", vcol).select(
                    *cols,
                    F.col("_change_type"),
                    F.col("_commit_version"),
                    ts_expr.alias("_commit_timestamp"),
                )
            )
        if not steps:
            # every requested commit was layout-only: empty feed, full schema
            return (
                sink.scan(self.spark, version=v_to)
                .limit(0)
                .select(
                    *cols,
                    F.lit("").alias("_change_type"),
                    F.lit(0).cast("long").alias("_commit_version"),
                    F.lit(None).cast("timestamp").alias("_commit_timestamp"),
                )
            )
        out = steps[0]
        for s in steps[1:]:
            out = out.unionByName(s)
        return out

    def changes_since(self, table: str, after_version: int) -> tuple[DataFrame, int]:
        """Incremental CDC consumption: ``(changes, current_version)`` for
        every commit AFTER ``after_version`` up to the sink's current
        version — the checkpoint-and-resume loop a downstream pipeline
        runs instead of rescanning a 100 TB table:

            df, v = engine.changes_since("t", last_processed)
            ... apply df ...; persist v as the new checkpoint

        Caught-up callers (``after_version`` == current) get an EMPTY
        frame with the full CDF schema and the unchanged version. Columns
        and semantics match ``FROM TABLE_CHANGES(...)`` (commit v = diff
        v-1 → v; vacuumed versions raise — checkpoint lag longer than the
        vacuum retention is a hard error, not silent data loss)."""
        sink = self.sinks.get(table.lower())
        if sink is None or not hasattr(sink, "versions"):
            raise ExecError(f"changes_since requires a versioned sink table; {table!r} is not one")
        have = sink.versions()
        if not have:
            raise ExecError(f"changes_since: {table!r} has no committed versions")
        cur = max(have)
        after_version = int(after_version)
        if after_version > cur:
            raise ExecError(
                f"changes_since: checkpoint version {after_version} is ahead of the sink's "
                f"current version {cur} (stale checkpoint from a restored/copied warehouse?)"
            )
        if after_version == cur:
            return self._table_changes_df(table, cur, cur).limit(0), cur
        return self._table_changes_df(table, after_version + 1, cur), cur

    def stream_changes(self, table: str, starting_version: int | str = 0) -> DataFrame:
        """The sink's change feed as a Structured Streaming DataFrame —
        the streaming tail to :meth:`changes_since`'s batch loop (Delta
        ``readChangeFeed`` stream parity). Offsets are sink versions, so
        Spark's checkpoint gives exactly-once consumption across
        restarts; each micro-batch reads ONLY the commit-time change
        recordings of new versions (O(|changes|) parquet files fanned
        across executors as Arrow batches — see
        ``streaming/cdf_source.py``). ``starting_version`` may be a
        version number (0 = full history incl. the initial load) or
        ``'latest'`` (tail only). Every commit class records its changes
        (DML/MERGE/upsert as change rows, overwrite as an O(1) marker,
        restore by inverting its window), so only legacy pre-recording
        commits or recordings vacuumed past the stream's lag are
        unrecorded — and those fail the stream loudly rather than
        degrading to an O(table) snapshot diff inside a micro-batch."""
        sink = self.sinks.get(table.lower())
        if sink is None or not hasattr(sink, "versions"):
            raise ExecError(f"stream_changes requires a versioned sink table; {table!r} is not one")
        if not getattr(sink, "path", None):
            raise ExecError(f"stream_changes: sink {table!r} has no filesystem path")
        sv = str(starting_version)
        if sv.lower() != "latest" and not sv.lstrip("-").isdigit():
            # Delta startingTimestamp parity: an ISO timestamp resolves to
            # the first commit at or after it (durable sidecar times)
            import datetime as _dt

            try:
                w = _dt.datetime.fromisoformat(sv)
            except ValueError:
                raise ExecError(
                    f"stream_changes: startingVersion {sv!r} is neither a "
                    "version number, 'latest', nor an ISO timestamp"
                ) from None
            if w.tzinfo is None:
                w = w.replace(tzinfo=_dt.timezone.utc)
            if not hasattr(sink, "commit_time"):
                raise ExecError(
                    f"stream_changes: sink {table!r} has no commit timestamps; "
                    "use a version-number startingVersion"
                )
            later = [v for v in sorted(sink.versions()) if sink.commit_time(v) >= w]
            if not later:
                raise ExecError(
                    f"stream_changes: no commit of {table!r} at or after {sv!r}"
                )
            starting_version = min(later)
        from .streaming import cdf_source

        cdf_source.register(self.spark)
        schema = (
            sink.scan(self.spark)
            .schema.add("_change_type", T.StringType())
            .add("_commit_version", T.LongType())
            .add("_commit_timestamp", T.TimestampType())
        )
        return (
            self.spark.readStream.format(cdf_source.FORMAT_NAME)
            .schema(schema)
            .option("path", sink.path)
            .option("startingVersion", str(starting_version))
            .load()
        )

    def replicate_changes(
        self,
        source: str,
        target: str,
        key: str | None = None,
        checkpoint: str | None = None,
        starting_version: int | str = 0,
    ):
        """Start a stream that keeps ``target`` converged to ``source`` by
        applying the source's change feed — CDC replication without ever
        rescanning the source table (each micro-batch is O(|changes|), the
        apply is one MERGE per batch; see streaming ``format:
        'replicate'``). ``target`` must already exist (a registered table
        or sink with matching columns); ``key`` defaults to the source
        sink's merge key. Returns the StreamingQuery."""
        from .streaming import _start

        feed = self.stream_changes(source, starting_version)
        if key is None:
            key = getattr(self.sinks.get(source.lower()), "key", None)
        if target.lower() not in self.tables and target.lower() not in self.sinks:
            raise ExecError(f"replicate_changes: target table {target!r} does not exist")
        cfg = {"format": "replicate", "target": target, "key": key}
        if checkpoint:
            cfg["checkpoint"] = checkpoint
        return _start(feed, f"replicate_{source}_{target}".lower(), cfg, engine=self)

    def _apply_unnest(
        self,
        joined: DataFrame,
        src: FromSource,
        frames: dict[str, DataFrame],
        physical: dict[str, str],
    ) -> DataFrame:
        """Lateral UNNEST: explode the array expression against the frame
        built so far. CROSS/INNER drops rows whose array is empty/NULL
        (explode); LEFT keeps them with a NULL element (explode_outer) —
        ANSI lateral-join semantics. WITH ORDINALITY adds a 1-based
        position column via posexplode. The generator output lands as an
        UNQUALIFIED column on the joined frame under a collision-proof
        internal name; ``physical`` lets the scope route ``u.x`` (and the
        bare name) to it. No shuffle: Generate is a narrow operator."""
        scope = Scope(
            dict(frames), includes=self.includes, params=self._scope_params(), physical=dict(physical)
        )
        arr = to_column(src.unnest, scope)
        ref = src.ref
        val_name = src.out_cols[0] if src.out_cols else ref
        phys_val = f"__un_{ref}_{val_name}"
        outer = src.join_type.startswith("LEFT") or src.join_type.startswith("FULL")
        if src.join_expr is not None and not (
            isinstance(src.join_expr, BoolNode) and src.join_expr.value
        ):
            raise ExecError("JOIN UNNEST(...) supports only ON true (lateral joins have no key)")
        if src.unnest_zip is not None and len(src.unnest_zip) > 1:
            # several same-level unnests zip element-wise (DuckDB):
            # project the arrays, arrays_zip (NULL-pads the shorter), one
            # explode, then unpack the struct fields — still a narrow plan
            tmp = [f"__unz_{ref}_{i}" for i in range(len(src.unnest_zip))]
            joined = joined.select(
                "*", *[to_column(a, scope).alias(t) for a, t in zip(src.unnest_zip, tmp)]
            )
            zipped = F.arrays_zip(*[F.col(t) for t in tmp])
            phys_struct = f"__un_{ref}_zip"
            gen = F.explode_outer(zipped) if outer else F.explode(zipped)
            joined = joined.select("*", gen.alias(phys_struct))
            out_names = []
            for name, t in zip(src.out_cols, tmp):
                phys = f"__un_{ref}_{name}"
                joined = joined.withColumn(phys, F.col(phys_struct)[t])
                out_names.append((name, phys))
            joined = joined.drop(phys_struct, *tmp)
        elif src.ordinality:
            ord_name = src.out_cols[1] if len(src.out_cols) > 1 else "ordinality"
            phys_ord = f"__un_{ref}_{ord_name}"
            gen = F.posexplode_outer(arr) if outer else F.posexplode(arr)
            joined = joined.select("*", gen.alias("__un_pos", phys_val))
            joined = joined.withColumn(phys_ord, F.col("__un_pos") + F.lit(1)).drop("__un_pos")
            out_names = [(val_name, phys_val), (ord_name, phys_ord)]
        else:
            gen = F.explode_outer(arr) if outer else F.explode(arr)
            joined = joined.select("*", gen.alias(phys_val))
            out_names = [(val_name, phys_val)]
        for name, phys in out_names:
            physical[f"{ref.lower()}.{name.lower()}"] = phys
        # register a schema-only view of the generator output so the scope
        # (and `u.*` expansion) sees the user-facing names/dtypes; never
        # executed — resolution goes through ``physical``
        frames[ref] = joined.select(
            *[F.col(phys).alias(name) for name, phys in out_names]
        ).alias(ref)
        return joined

    def _rewrite_select_unnest(self, sel: SqlSelect) -> SqlSelect:
        """Select-list ``unnest(arr)`` (DuckDB style) — rewritten into a
        lateral FROM-position UNNEST. One generator explodes; SEVERAL
        zip element-wise (shorter arrays NULL-padded), matching DuckDB's
        same-level-unnest semantics, via one arrays_zip + one explode."""
        gens = [
            (i, c)
            for i, c in enumerate(sel.columns)
            if not c.is_star
            and isinstance(c.expr, FuncNode)
            and c.expr.name.lower() == "unnest"
            and len(c.expr.args) == 1
        ]
        if not gens or not sel.from_:
            return sel
        import dataclasses

        ref = "__gen"
        new_cols = list(sel.columns)
        out_cols: list[str] = []
        args: list[Node] = []
        for k, (i, c) in enumerate(gens):
            name = c.alias or ("unnest" if len(gens) == 1 else f"unnest_{k}")
            out_cols.append(name)
            args.append(c.expr.args[0])
            new_cols[i] = dataclasses.replace(c, expr=IdentityNode((ref, name)), alias=name)
        src = FromSource(unnest=args[0], alias=ref, out_cols=out_cols)
        if len(args) > 1:
            src.unnest_zip = args
        return dataclasses.replace(sel, columns=new_cols, from_=list(sel.from_) + [src])

    def _apply_lateral(
        self,
        joined: DataFrame,
        src: FromSource,
        frames: dict[str, DataFrame],
        physical: dict[str, str],
    ) -> DataFrame:
        """LATERAL (SELECT …) — ANSI lateral derived table (superset; the
        reference refuses every subquery position). The correlated
        subquery is DECORRELATED into one join — never a per-outer-row
        re-execution:

        - plain select            → inner keys projected, equi-join (+ any
                                    range conjuncts as join residuals)
        - ORDER BY … LIMIT n      → per-key top-n via one row_number
                                    window, then equi-join (the top-k-per-
                                    group idiom, one shuffle)
        - aggregate select        → groupBy correlation keys; a global agg
                                    ALWAYS yields one row per outer row
                                    (ANSI), so missing keys substitute the
                                    empty-relation value (count→0, sum→NULL)
        - GROUP BY inside         → keys + group keys aggregated

        CROSS/comma/INNER drops outer rows with an empty lateral result;
        LEFT JOIN LATERAL … ON true keeps them NULL-filled. The lateral's
        output columns land under collision-proof internal names routed
        through the scope's ``physical`` map (same trick as UNNEST)."""
        sub_sel = src.subquery
        outer_scope = Scope(
            dict(frames), includes=self.includes, params=self._scope_params(), physical=dict(physical)
        )
        left = src.join_type.startswith("LEFT") or src.join_type.startswith("FULL")
        if src.join_expr is not None and not (
            isinstance(src.join_expr, BoolNode) and src.join_expr.value
        ):
            raise ExecError("JOIN LATERAL supports only ON true (correlation lives in the subquery)")
        ref = src.ref
        try:
            # uncorrelated lateral — just a derived table
            lat = self._select_any(sub_sel).alias(ref)
            frames[ref] = lat
            return joined.join(lat, on=F.lit(True), how="left") if left else joined.crossJoin(lat)
        except TranslateError:
            pass
        if isinstance(sub_sel, SqlSetOp):
            raise ExecError("correlated LATERAL subquery must be a plain SELECT (no set-ops)")
        import dataclasses

        having = sub_sel.having
        if having is not None and not funcs.is_agg_tree(having):
            raise ExecError("LATERAL HAVING must be an aggregate predicate (e.g. count(*) > 2)")
        inner_df, inner_scope, pairs, ranges = self._correlation_split(
            outer_scope,
            dataclasses.replace(sub_sel, order_by=[], limit=None, offset=None, having=None),
            "LATERAL", allow_range=True, allow_group=True,
        )
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        n = self._subq_n
        key_names = [f"__lat{n}_k{i}" for i in range(len(pairs))]
        key_cols = [ic.alias(kn) for (ic, _), kn in zip(pairs, key_names)]
        is_agg = bool(sub_sel.group_by) or any(
            funcs.is_agg_tree(c.expr) for c in sub_sel.columns if not c.is_star
        )
        out_phys: list[tuple[str, str]] = []  # (user name, internal name)

        def internal(name: str) -> str:
            return f"__lat{n}_{name}"

        if is_agg:
            if ranges:
                raise ExecError(
                    "aggregate LATERAL supports equality correlation only "
                    "(use the as-of/range-correlated scalar forms for range aggregates)"
                )
            group_cols, group_sqls = [], {}
            for i, g in enumerate(sub_sel.group_by):
                gn = internal(f"g{i}")
                group_cols.append(to_column(g, inner_scope).alias(gn))
                group_sqls[g.sql()] = gn
            aggs, post = [], []
            for c in sub_sel.columns:
                if c.is_star:
                    raise ExecError("aggregate LATERAL cannot use *")
                name = c.output_name
                if funcs.is_agg_tree(c.expr):
                    aggs.append(to_column(c.expr, inner_scope).alias(internal(name)))
                    post.append((name, internal(name), c.expr))
                elif c.expr.sql() in group_sqls:
                    post.append((name, group_sqls[c.expr.sql()], None))
                else:
                    raise ExecError(f"LATERAL select column {c.expr.sql()} is neither aggregate nor group key")
            cnt = internal("cnt")
            hav_name = internal("hav")
            if having is not None:
                aggs.append(to_column(having, inner_scope).cast("boolean").alias(hav_name))
            lat = inner_df.groupBy(*key_cols, *group_cols).agg(*aggs, F.count(F.lit(1)).alias(cnt))
            global_agg = not sub_sel.group_by
            if having is not None:
                # HAVING filters groups (hidden agg column); for a GLOBAL
                # agg the empty-set row only survives when the predicate
                # holds over the empty relation (one folded plan-time job)
                lat = lat.where(F.col(hav_name)).drop(hav_name)
                if global_agg:
                    empty_ok = self._empty_agg_value(
                        inner_df, to_column(having, inner_scope).cast("boolean")
                    )
                    global_agg = bool(empty_ok)
            on = None
            for i, ((_, oc), kn) in enumerate(zip(pairs, key_names)):
                cond = self._pair_cond(pairs, i, lat[kn], oc)
                on = cond if on is None else (on & cond)
            joined = joined.join(lat, on=on, how="left" if (left or global_agg) else "inner")
            if global_agg:
                # ANSI: a global aggregate subquery yields a row even for
                # an empty correlated set — substitute empty-relation values
                for name, phys, expr in post:
                    if expr is None:
                        continue
                    empty = self._empty_agg_value(inner_df, to_column(expr, inner_scope))
                    joined = joined.withColumn(
                        phys, F.when(F.col(cnt).isNull(), F.lit(empty)).otherwise(F.col(phys))
                    )
            joined = joined.drop(cnt, *key_names)
            out_phys = [(name, phys) for name, phys, _ in post]
        else:
            proj, names = self._projection(sub_sel, inner_scope)
            proj = [c.alias(internal(nm)) for c, nm in zip(proj, names)]
            range_names = [internal(f"r{i}") for i in range(len(ranges))]
            range_cols = [ic.alias(rn) for (_, ic, _), rn in zip(ranges, range_names)]
            lat = inner_df.select(*key_cols, *range_cols, *proj)
            if sub_sel.limit is not None:
                if ranges:
                    raise ExecError("LATERAL with LIMIT supports equality correlation only")
                from pyspark.sql.window import Window

                order = []
                for okey, direction in sub_sel.order_by:
                    order.extend(self._directional(to_column(okey, inner_scope), direction))
                # LIMIT without ORDER BY: any rows satisfy ANSI — arbitrary pick
                w = Window.partitionBy(*key_names).orderBy(*(order or [F.lit(1)]))
                rn = internal("rn")
                lo = sub_sel.offset or 0
                lat = (
                    inner_df.select(*key_cols, *[to_column(k, inner_scope).alias(internal(f"o{i}")) for i, (k, _) in enumerate(sub_sel.order_by)], *proj)
                    .withColumn(rn, F.row_number().over(
                        Window.partitionBy(*key_names).orderBy(*(
                            [d for i, (_, direc) in enumerate(sub_sel.order_by) for d in self._directional(F.col(internal(f"o{i}")), direc)]
                            or [F.lit(1)]
                        ))
                    ))
                    .where((F.col(rn) > lo) & (F.col(rn) <= lo + sub_sel.limit))
                    .drop(rn, *[internal(f"o{i}") for i in range(len(sub_sel.order_by))])
                )
            on = None
            for i, ((_, oc), kn) in enumerate(zip(pairs, key_names)):
                cond = self._pair_cond(pairs, i, lat[kn], oc)
                on = cond if on is None else (on & cond)
            for (op, _, oc), rn_ in zip(ranges, range_names):
                cond = {"<": lat[rn_] < oc, "<=": lat[rn_] <= oc, ">": lat[rn_] > oc, ">=": lat[rn_] >= oc}[op]
                on = cond if on is None else (on & cond)
            joined = joined.join(lat, on=on, how="left" if left else "inner")
            joined = joined.drop(*key_names, *range_names)
            out_phys = [(nm, internal(nm)) for nm in names]

        for name, phys in out_phys:
            physical[f"{ref.lower()}.{name.lower()}"] = phys
        frames[ref] = joined.select(*[F.col(p).alias(nm) for nm, p in out_phys]).alias(ref)
        return joined

    @staticmethod
    def _source_bytes(df: DataFrame):
        """On-disk bytes of a file-backed frame (None when unknown) — the
        plan-time size signal the join reorderer ranks by. Driver-side
        metadata only; no job runs."""
        import os

        try:
            files = df.inputFiles()
        except Exception:
            return None
        if not files:
            return None
        total = 0
        for f in files:
            p = f
            if p.startswith("file://"):
                p = p[7:]
            elif p.startswith("file:"):
                p = p[5:]
            try:
                total += os.path.getsize(p)
            except OSError:
                return None
        return total

    def _reorder_inner_joins(self, first, joins, sel, resolved):
        """Star-schema join reorder: hoist SMALL inner-joined relations
        (dims, by on-disk size) ahead of big fact-fact joins whenever the
        ON keys are already available — smallest-satisfiable-first greedy.

        Catalyst does not reorder DataFrame inner joins without CBO table
        stats, so a FROM written fact-first (customer ⋈ orders ⋈ lineitem
        ⋈ nation ⋈ region WHERE r_name = …) pays the big shuffles BEFORE
        the selective dim filter trims anything. Hoisting the dim chain
        (broadcast-sized, filter pushed to its scan) in front shrinks the
        fact shuffles by the dims' selectivity — at 100 TB that is the
        difference between shuffling the table and shuffling the slice.

        Inner equi-joins commute, so this is safe exactly when EVERY join
        in the FROM is a plain INNER with an ON expression; anything else
        (outer/cross, unnest/lateral/pivot/sample/VALUES/feeds) keeps the
        written order, as does a SELECT * (star column order follows the
        join order) or any bare ON column name owned by more than one
        source (reordering could re-bind it). Disable with
        ``SET planner.join_reorder = false``."""
        flag = self.session_vars.get("planner.join_reorder", True)
        if isinstance(flag, str):
            flag = flag.strip().lower() not in ("false", "0", "off", "no")
        if not flag or len(joins) < 2:
            return joins
        if any(c.is_star for c in sel.columns):
            return joins
        for src in joins:
            if (
                src.unnest is not None
                or getattr(src, "lateral", False)
                or src.values_rows is not None
                or src.pivot is not None
                or src.unpivot is not None
                or src.sample is not None
                or src.table_changes is not None
                or src.join_type not in ("", "INNER")
                or src.join_expr is None
            ):
                return joins
        # column ownership across ALL sources (for bare ON names)
        sources = [first] + joins
        cols_of: dict[str, set] = {}
        try:
            for src in sources:
                d = resolved.get(id(src))
                if d is None:
                    d = self._resolve_source(src, sel)
                    resolved[id(src)] = d
                cols_of[src.ref.lower()] = {c.lower() for c in d.columns}
        except (ExecError, TranslateError):
            return joins
        owner: dict[str, str | None] = {}
        for ref, cols in cols_of.items():
            for c in cols:
                owner[c] = None if c in owner else ref
        refs = {s.ref.lower() for s in sources}

        def needs(src) -> set | None:
            """Source refs the ON expression touches, or None → bail."""
            out = set()
            for n in src.join_expr.walk():
                if isinstance(n, IdentityNode) and not getattr(n, "is_star", False):
                    parts = [p.lower() for p in n.parts]
                    if len(parts) > 1:
                        if parts[0] not in refs:
                            return None
                        out.add(parts[0])
                    else:
                        o = owner.get(parts[0], "__missing__")
                        if o is None or o == "__missing__":
                            return None  # ambiguous or unknown bare name
                        out.add(o)
            return out

        need = {}
        for src in joins:
            n = needs(src)
            if n is None:
                return joins
            need[id(src)] = n
        # only DIM-SMALL sources hoist: anything at or under the broadcast
        # threshold joins as a BHJ wherever it lands, so pulling it ahead
        # of the fact joins is free — and its (pushed-down) filters trim
        # the fact side BEFORE the big shuffles. Mid-size sources keep
        # their written position: promoting them (e.g. a 12 MB orders in
        # front of lineitem) makes AQE broadcast-build a fact, trading a
        # cheap stream for an expensive broadcast.
        try:
            thresh = int(self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
        except (TypeError, ValueError):
            thresh = 10 << 20
        if thresh <= 0:
            return joins

        def small(s) -> bool:
            sz = self._source_bytes(resolved[id(s)])
            return sz is not None and sz <= thresh

        avail = {first.ref.lower()}
        order: list = []
        remaining = list(joins)
        while remaining:
            sat = [
                s for s in remaining if need[id(s)] <= avail | {s.ref.lower()}
            ]
            if not sat:
                return joins  # ON references a later source: keep written order
            sm = [s for s in sat if small(s)]
            pick = min(sm or sat, key=joins.index)
            order.append(pick)
            avail.add(pick.ref.lower())
            remaining.remove(pick)
        return order

    def _build_from(self, sel: SqlSelect) -> tuple[DataFrame, Scope]:
        frames: dict[str, DataFrame] = {}
        physical: dict[str, str] = {}
        first = sel.from_[0]
        if first.unnest is not None:
            raise ExecError("UNNEST needs a preceding FROM source to be lateral over")
        df = self._resolve_source(first, sel)
        frames[first.ref] = df
        joined = df
        resolved: dict[int, DataFrame] = {id(first): df}
        for src in self._reorder_inner_joins(first, list(sel.from_[1:]), sel, resolved):
            if src.unnest is not None:
                joined = self._apply_unnest(joined, src, frames, physical)
                continue
            if getattr(src, "lateral", False) and src.subquery is not None:
                joined = self._apply_lateral(joined, src, frames, physical)
                continue
            other = resolved.get(id(src))
            if other is None:
                other = self._resolve_source(src, sel)
            frames[src.ref] = other
            scope = Scope(dict(frames), includes=self.includes, params=self._scope_params(), physical=dict(physical))
            how = {
                "": "inner",
                "INNER": "inner",
                "LEFT": "left",
                "LEFT OUTER": "left",
                "RIGHT": "right",
                "RIGHT OUTER": "right",
                "OUTER": "full",
                "FULL": "full",
                "FULL OUTER": "full",
                "CROSS": "cross",
            }.get(src.join_type, "inner")
            if src.join_expr is not None:
                cond = to_column(src.join_expr, scope)
                joined = joined.join(other, on=cond, how=how)
            else:
                joined = joined.crossJoin(other)
        scope = Scope(frames, includes=self.includes, params=self._scope_params(), physical=physical)
        return joined, scope

    # -- WHERE -------------------------------------------------------------
    def _conjuncts(self, node: Node) -> list[Node]:
        if isinstance(node, BinaryNode) and node.op == "AND":
            return self._conjuncts(node.left) + self._conjuncts(node.right)
        if isinstance(node, BooleanNode) and node.op == "AND" and not node.negated:
            out = []
            for a in node.args:
                out.extend(self._conjuncts(a))
            return out
        return [node]

    def _apply_where(self, df: DataFrame, scope: Scope, sel: SqlSelect):
        plain: list[Node] = []
        for conj in self._conjuncts(sel.where):
            ex = self._as_exists_subquery(conj)
            if ex is not None:
                ex_sel, ex_anti = ex
                # innermost scoping first: if the inner select resolves
                # standalone (all names bind inner, even when the table
                # name shadows an outer one) the EXISTS is UNCORRELATED —
                # one bounded job folds it to a constant filter
                try:
                    inner = self._select_any(ex_sel)
                except TranslateError:
                    df = self._correlated_exists_join(df, scope, ex_sel, ex_anti)
                    continue
                if (inner.limit(1).count() > 0) == ex_anti:
                    df = df.filter(F.lit(False))
                continue
            sub = self._as_subquery_in(conj)
            if sub is not None:
                lhs_node, sub_sel, anti = sub
                try:
                    sub_df = self._select_any(sub_sel)
                except TranslateError:
                    if anti:
                        # correlated NOT IN: ANSI NULL poisoning is
                        # per-correlation-group, so lower through the
                        # membership flag and keep only TRUE rows
                        x = to_column(self._qualify_identities(lhs_node, scope), scope)
                        node, df = self._lower_in_membership_corr(df, scope, x, sub_sel, negated=True)
                        df = df.filter(node.col)
                        continue
                    # correlated IN: x IN (SELECT y FROM t WHERE c) ≡
                    # EXISTS (SELECT 1 FROM t WHERE c AND y = x) — reuse
                    # the EXISTS decorrelation. x is outer-context, so its
                    # identities are pre-qualified with their outer frame
                    # alias (a bare name would re-bind innermost once
                    # inside the EXISTS where-clause)
                    import dataclasses

                    if isinstance(sub_sel, SqlSetOp) or not sub_sel.columns or sub_sel.columns[0].is_star:
                        raise ExecError("correlated IN needs a plain single-column inner SELECT") from None
                    eq = BinaryNode("=", sub_sel.columns[0].expr, self._qualify_identities(lhs_node, scope))
                    new_where = eq if sub_sel.where is None else BinaryNode("AND", sub_sel.where, eq)
                    ex_sel = dataclasses.replace(sub_sel, where=new_where)
                    df = self._correlated_exists_join(df, scope, ex_sel, anti)
                    continue
                # unique key name — the subquery may project a column name
                # that also exists on the outer side (ambiguous reference)
                sub_df = sub_df.select(sub_df[sub_df.columns[0]].alias("__subq_key"))
                lhs = to_column(lhs_node, scope)
                if anti:
                    # ANSI NOT IN: an inner NULL poisons EVERY unmatched
                    # row (UNKNOWN → filtered) and a NULL x never passes —
                    # except against the EMPTY set, which passes all rows.
                    # One lazy broadcast stats frame + the same anti-join:
                    # rows survive iff set empty OR (x non-null AND set
                    # null-free AND x unmatched)
                    self._subq_n = getattr(self, "_subq_n", 0) + 1
                    t, nn = f"__nin{self._subq_n}_t", f"__nin{self._subq_n}_nn"
                    key = sub_df["__subq_key"]
                    stats = sub_df.agg(F.count(F.lit(1)).alias(t), F.count(key).alias(nn))
                    df = (
                        df.crossJoin(F.broadcast(stats))
                        .filter((F.col(t) == 0) | (lhs.isNotNull() & (F.col(nn) == F.col(t))))
                        .drop(t, nn)
                    )
                    df = df.join(sub_df, on=lhs == F.col("__subq_key"), how="left_anti")
                else:
                    # semi-join: distributed IN; Catalyst/AQE broadcasts when small
                    df = df.join(sub_df, on=lhs == F.col("__subq_key"), how="left_semi")
            else:
                plain.append(conj)
        if plain:
            cond = None
            for p in plain:
                c = to_column(p, scope)
                cond = c if cond is None else (cond & c)
            df = df.filter(cond)
        # rebuild scope frames to the post-join df for projection? frames
        # stay valid: filter/semi-join preserve the aliased lineage.
        return df, scope

    @staticmethod
    def _qualify_identities(node: Node, scope: Scope) -> Node:
        """Rewrite single-part identities to their ``alias.column`` form
        using ``scope``'s resolution — pins outer-context expressions to
        outer frames before they are moved into a subquery's WHERE."""

        def fn(n: Node) -> Node:
            if isinstance(n, IdentityNode) and len(n.parts) == 1 and not n.is_star:
                hit = scope._fields.get(n.parts[0].lower())
                if hit is not None and n.parts[0].lower() not in scope._ambiguous:
                    alias, fld = hit
                    return IdentityNode((alias, fld.name))
            return n

        return transform(node, fn)

    @staticmethod
    def _as_exists_subquery(node: Node):
        """EXISTS (SELECT …) [under NOT] as a WHERE conjunct →
        (select, anti) or None."""
        anti = False
        while isinstance(node, UnaryNode) and node.op == "NOT":
            node = node.child
            anti = not anti
        if isinstance(node, UnaryNode) and node.op == "EXISTS" and isinstance(node.child, SubqueryNode):
            return node.child.select, anti
        return None

    def _correlated_exists_join(self, df: DataFrame, scope: Scope, sub_sel, anti: bool) -> DataFrame:
        """Decorrelate ``EXISTS (SELECT … WHERE inner-and-outer preds)``
        into a LEFT SEMI (ANTI under NOT) join — the only plan that runs
        this distributed: the correlated re-execution a tuple-at-a-time
        engine would do is O(rows × subquery).

        Inner-only conjuncts stay filters on the inner frame (pushed to
        its scan); conjuncts referencing outer columns — equality or not
        (``o.ts < u.ts`` works) — become the join condition, translated
        against a combined inner+outer scope. All sources are
        ``.alias()``-ed, so cross-frame references resolve by name.

        SINGLE-RANGE shapes first reduce to a per-key extremum:
        ``EXISTS(… r.k = o.k AND r.ts <= o.ts)`` holds iff
        ``min(r.ts) per k <= o.ts``, so the semi/anti join runs against a
        one-row-per-key aggregate (broadcastable) instead of range-joining
        the full inner relation — O(|keys|) join input, no hot-key pair
        explosion."""
        if isinstance(sub_sel, SqlSetOp) or sub_sel.group_by or sub_sel.having is not None:
            raise ExecError("correlated EXISTS supports a plain inner SELECT (no set-ops/GROUP BY/HAVING)")
        reduced = self._exists_range_extremum_join(df, scope, sub_sel, anti)
        if reduced is not None:
            return reduced
        inner_df, inner_scope = self._build_from(sub_sel)
        overlap = set(inner_scope.frames) & set(scope.frames)
        if overlap:
            raise ExecError(
                f"correlated EXISTS: alias {sorted(overlap)} names both an outer and an inner table; "
                "alias one side (… FROM orders AS o)"
            )
        combined = Scope({**scope.frames, **inner_scope.frames}, includes=self.includes, params=self._scope_params())
        inner_preds: list[Node] = []
        join_conds: list[SparkColumn] = []
        for c in self._conjuncts(sub_sel.where) if sub_sel.where is not None else []:
            try:
                inner_preds.append(to_column(c, inner_scope))
                continue
            except TranslateError:
                pass
            join_conds.append(to_column(c, combined))
        if not join_conds:
            raise ExecError("EXISTS subquery is uncorrelated here; this path needs an outer-column reference")
        for p in inner_preds:
            inner_df = inner_df.filter(p)
        on = join_conds[0]
        for c in join_conds[1:]:
            on = on & c
        return df.join(inner_df, on=on, how="left_anti" if anti else "left_semi")

    def _exists_range_extremum_join(self, df: DataFrame, scope: Scope, sub_sel, anti: bool) -> DataFrame | None:
        """Reduce a single-range correlated EXISTS to a per-key extremum
        semi/anti join (see _correlated_exists_join). Returns None when
        the shape doesn't fit (no/multiple ranges, non-binary correlation
        conjuncts, != range) — callers fall back to the generic join.
        NULL inner operands drop out of min/max exactly as ANSI wants
        (NULL <op> x is UNKNOWN, never a witness); an empty/absent key
        gives no aggregate row, so the semi join rejects and the anti
        join keeps — NOT EXISTS over the empty set is TRUE."""
        import dataclasses

        one = dataclasses.replace(sub_sel, columns=[Column(expr=NumberNode("1"))], order_by=[], limit=None)
        try:
            inner_df, inner_scope, pairs, ranges = self._correlation_split(scope, one, "EXISTS", allow_range=True)
        except (ExecError, TranslateError):
            return None
        if len(ranges) != 1 or not pairs:
            return None
        op, r_ic, r_oc = ranges[0]
        if op not in ("<", "<=", ">", ">="):
            return None
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        p = f"__exr{self._subq_n}"
        key_names = [f"{p}_k{i}" for i in range(len(pairs))]
        ext = F.min if op in ("<", "<=") else F.max
        agg = inner_df.groupBy(*[ic.alias(kn) for (ic, _), kn in zip(pairs, key_names)]).agg(
            ext(r_ic).alias(f"{p}_ext")
        )
        cmp = {
            "<": agg[f"{p}_ext"] < r_oc,
            "<=": agg[f"{p}_ext"] <= r_oc,
            ">": agg[f"{p}_ext"] > r_oc,
            ">=": agg[f"{p}_ext"] >= r_oc,
        }[op]
        on = cmp
        for i, ((_, oc), kn) in enumerate(zip(pairs, key_names)):
            on = self._pair_cond(pairs, i, agg[kn], oc) & on
        return df.join(agg, on=on, how="left_anti" if anti else "left_semi")

    @staticmethod
    def _as_subquery_in(node: Node):
        if isinstance(node, BinaryNode) and node.op == "IN" and isinstance(node.right, SubqueryNode):
            return node.left, node.right.select, node.negated
        if isinstance(node, UnaryNode) and node.op == "NOT":
            inner = Engine._as_subquery_in(node.child)
            if inner is not None:
                return inner[0], inner[1], not inner[2]
        return None

    # -- aggregation -------------------------------------------------------
    def _aggregate(self, df: DataFrame, scope: Scope, sel: SqlSelect) -> DataFrame:
        group_cols: list[SparkColumn] = []
        group_aliased: list[tuple[SparkColumn, bool]] = []  # (pre-alias col, was aliased)
        group_names: list[str] = []
        group_sqls: dict[str, str] = {}
        qualified_group_keys: list[tuple[str, str]] = []
        for i, g in enumerate(sel.group_by):
            if isinstance(g, NumberNode):  # GROUP BY 1 → positional
                g = sel.columns[int(g.text) - 1].expr
            name = None
            for c in sel.columns:
                if not c.is_star and c.expr.sql() == g.sql():
                    name = c.output_name
                    break
                if c.alias and isinstance(g, IdentityNode) and g.name == c.alias:
                    name = c.alias
                    g = c.expr
                    break
            name = name or (g.name if isinstance(g, IdentityNode) else f"_g{i}")
            raw_gcol = to_column(g, scope)
            gcol = raw_gcol
            if isinstance(g, IdentityNode) and scope.physical_name(g) is not None:
                # lateral (UNNEST) output: the physical column carries an
                # internal name — always re-alias to the user-facing one
                gcol = raw_gcol.alias(name)
            elif not (isinstance(g, IdentityNode) and g.parts[-1] == name):
                # alias only when the output name differs from the bare
                # column — a redundant alias would break grouping():
                # Spark matches its argument against the grouping columns
                # by expression, and `col AS col` is a different expression
                gcol = raw_gcol.alias(name)
            group_cols.append(gcol)
            group_aliased.append((raw_gcol, gcol is not raw_gcol))
            group_names.append(name)
            group_sqls[g.sql()] = name
            # remember the group key's ORIGINAL qualified name so HAVING
            # subqueries can correlate on `frame.col` (post-agg, only the
            # bare output name exists — and inside a subquery the bare
            # name would re-bind innermost to the inner frame)
            if isinstance(g, IdentityNode) and not g.is_star:
                hit = scope._fields.get(g.name.lower())
                if hit is not None:
                    alias, fld = hit
                    qualified_group_keys.append((f"{alias.lower()}.{fld.name.lower()}", name))

        agg_cols: list[SparkColumn] = []
        out_names: list[str] = []
        hidden: list[SparkColumn] = []
        #: (output name, post-agg expr) — ANSI: window functions in the
        #: projection evaluate AFTER grouping and HAVING; their group-agg
        #: subtrees become hidden agg columns and the window itself runs
        #: over the aggregated frame (rank() OVER (ORDER BY sum(x)) ranks
        #: the GROUPS — lowering it inside the aggregation would be
        #: Spark's "window inside aggregate" error)
        win_proj: list[tuple[str, Node]] = []
        for c in sel.columns:
            if c.is_star:
                raise ExecError("SELECT * with GROUP BY not supported")
            name = c.output_name
            if any(isinstance(n, WindowNode) for n in c.expr.walk()):
                wnode, wextra = self._rewrite_having(c.expr, scope)
                hidden.extend(wextra)
                win_proj.append((name, wnode))
                out_names.append(name)
                continue
            if funcs.is_agg_tree(c.expr):
                col = to_column(c.expr, scope)
                if c.guard is not None:
                    col = F.when(to_column(c.guard, scope), col)
                agg_cols.append(col.alias(name))
            elif c.expr.sql() in group_sqls:
                name = group_sqls[c.expr.sql()]
            elif isinstance(c.expr, IdentityNode) and c.expr.name in group_names:
                name = c.expr.name
            else:
                # non-agg, non-grouped select col → first() (permissive,
                # reference passes grouped value through exec/groupby.go:338)
                agg_cols.append(F.first(to_column(c.expr, scope)).alias(name))
            out_names.append(name)

        # HAVING may reference aggregates not in the select list — compute
        # them as hidden agg columns (exec/where.go HAVING = post-agg filter)
        having_node = sel.having
        if having_node is not None:
            having_node, extra = self._rewrite_having(having_node, scope)
            hidden.extend(extra)
        # QUALIFY windows over the aggregated rows; its group-agg subtrees
        # (e.g. ORDER BY sum(x) inside OVER) become hidden agg columns too.
        # Select aliases need no substitution here — they ARE columns of
        # the aggregated frame the predicate is evaluated against.
        qualify_node = sel.qualify
        if qualify_node is not None:
            qualify_node, qextra = self._rewrite_having(qualify_node, scope)
            hidden.extend(qextra)

        gset_renames: list[tuple[str, str]] = []
        if group_cols and sel.group_mode in ("ROLLUP", "CUBE", "GROUPING SETS"):
            # Spark's rollup/cube/groupingSets match set members and
            # grouping() arguments against the grouping columns by
            # EXPRESSION, and a computed `expr AS g` alias mints a fresh
            # exprId per use — matching then fails (set values silently
            # NULLed, or GROUPING_COLUMN_MISMATCH; v4-fuzz-found).
            # Pre-project every aliased key to an internal plain column,
            # group by the attribute (always matches), rename after agg.
            new_cols = []
            for i, ((raw, aliased), name) in enumerate(zip(group_aliased, group_names)):
                if aliased:
                    internal = f"__gk{i}_{name}"
                    df = df.withColumn(internal, raw)
                    new_cols.append(F.col(internal))
                    gset_renames.append((internal, name))
                else:
                    new_cols.append(group_cols[i])
            group_cols = new_cols
        if group_cols:
            if sel.group_mode == "ROLLUP":
                grouped = df.rollup(*group_cols)
            elif sel.group_mode == "CUBE":
                grouped = df.cube(*group_cols)
            elif sel.group_mode == "GROUPING SETS":
                # each set lists a subset of the grouping columns, matched
                # by expression text; one Expand+Aggregate, not a union of
                # groupBys
                by_sql = {g.sql(): c for g, c in zip(sel.group_by, group_cols)}
                sets = []
                for one in sel.grouping_sets:
                    try:
                        sets.append([by_sql[e.sql()] for e in one])
                    except KeyError as exc:
                        raise ExecError(f"grouping set expression {exc} not in GROUP BY union") from None
                grouped = df.groupingSets(sets, *group_cols)
            else:
                grouped = df.groupBy(*group_cols)
            agged = grouped.agg(*(agg_cols + hidden)) if (agg_cols + hidden) else grouped.agg(F.count(F.lit(1)).alias("__cnt")).drop("__cnt")
            for internal, name in gset_renames:
                agged = agged.withColumnRenamed(internal, name)
        else:
            agged = df.agg(*(agg_cols + hidden))

        if having_node is not None:
            hscope = Scope({"_": agged}, includes=self.includes, params=self._scope_params())
            agged_types = {f_.name: f_.dataType for f_ in agged.schema.fields}
            for qual, out_name in qualified_group_keys:
                hscope._fields.setdefault(qual, ("_", T.StructField(out_name, agged_types[out_name])))
            if self._node_has_subquery(having_node):
                # HAVING subqueries lower HERE, against the aggregated
                # frame: correlation conjuncts bind to the group-key
                # columns, so the same decorrelating join machinery applies
                # (aggregates in the predicate are already hidden-column
                # references via _rewrite_having)
                agged, having_node = self._lower_having_subqueries(agged, hscope, having_node)
            agged = agged.filter(to_column(having_node, hscope))
        for wname, wnode in win_proj:
            # after HAVING (ANSI): projection windows see the surviving
            # groups; computed in SELECT order so a later window can
            # reference an earlier window column's alias
            wscope = Scope({"_": agged}, includes=self.includes, params=self._scope_params())
            agged_types = {f_.name: f_.dataType for f_ in agged.schema.fields}
            for qual, out_name in qualified_group_keys:
                wscope._fields.setdefault(qual, ("_", T.StructField(out_name, agged_types[out_name])))
            agged = agged.withColumn(wname, to_column(wnode, wscope))
        if qualify_node is not None:
            # after HAVING (ANSI order): windows see the post-HAVING groups.
            # Window exprs can't appear in a Filter directly — project the
            # predicate, then filter on the projected column
            qscope = Scope({"_": agged}, includes=self.includes, params=self._scope_params())
            agged_types = {f_.name: f_.dataType for f_ in agged.schema.fields}
            for qual, out_name in qualified_group_keys:
                qscope._fields.setdefault(qual, ("_", T.StructField(out_name, agged_types[out_name])))
            if self._node_has_subquery(qualify_node):
                # QUALIFY subqueries lower like HAVING's: against the
                # aggregated frame, correlation binding to group keys
                agged, qualify_node = self._lower_having_subqueries(agged, qscope, qualify_node)
            agged = (
                agged.withColumn("__qualify", to_column(qualify_node, qscope).cast("boolean"))
                .filter(F.col("__qualify"))
                .drop("__qualify")
            )  # joined __csub/__inq columns fall away at the final select
        # drop hidden having columns by name
        drop_hidden = [n for n in agged.columns if n.startswith("__hav_")]
        if drop_hidden:
            agged = agged.drop(*drop_hidden)

        # order output columns as selected
        return agged.select(*out_names)

    def _materialize_scalar(self, sub_select) -> Node:
        """Run an UNCORRELATED scalar subquery once at plan time and return
        its value as a literal node (a bounded driver action — Spark's own
        uncorrelated-scalar-subquery execution is likewise a separate job).
        One column, at most one row (ANSI). Raises ``TranslateError``
        through if the inner select references outer columns (correlated) —
        callers decide whether to decorrelate or error."""
        from .nodes import SparkColNode

        key = self._fold_key("scalar", sub_select)
        hit = self._fold_cache.get(key) if key else None
        if hit is not None:
            self.plan_cache_stats["fold_hits"] += 1
            val, dtype = hit
            return SparkColNode(col=F.lit(val), dtype=dtype)
        sub_df = self._select_any(sub_select)
        if len(sub_df.columns) != 1:
            raise ExecError(f"scalar subquery must return one column, got {len(sub_df.columns)}")
        rows = sub_df.limit(2).collect()
        if len(rows) > 1:
            raise ExecError("scalar subquery returned more than one row")
        val = rows[0][0] if rows else None
        dtype = sub_df.schema.fields[0].dataType
        if key:
            self.plan_cache_stats["fold_misses"] += 1
            self._fold_cache[key] = (val, dtype)
        return SparkColNode(col=F.lit(val), dtype=dtype)

    def _fold_key(self, kind: str, sub_select):
        """Cache key for a plan-time subquery fold: the sub-AST's dataclass
        repr (deterministic for pure parsed nodes) + the cache epoch; binds
        join the key only when the subquery actually references a ``?N``/
        ``@var`` parameter, so parameter-free folds are shared across
        prepared-statement executions."""
        # context hazards: (a) CTE bindings shadow table names for the
        # statement's duration WITHOUT an epoch bump — the same sub-AST
        # repr can mean different data inside vs outside the binding;
        # (b) planner sources re-scan external state per call. No fold
        # caching in either situation. Versioned sinks join the KEY
        # instead (round 9, mirroring the plan cache): a fold stays
        # reusable while every sink's version is unchanged, and a direct
        # sink commit changes the key; unversioned sinks disable.
        if getattr(self, "_cte_binding_depth", 0) or self.planner_sources:
            return None
        sink_fp = self._stmt_sink_fp if self._stmt_depth > 0 else self._sink_version_key()
        if sink_fp is None:
            return None
        try:
            text = repr(sub_select)
        except Exception:  # pragma: no cover - dataclass reprs don't raise
            return None
        if "SparkColNode" in text:  # rewritten nodes carry live Columns
            return None
        key = (kind, text, self._cache_epoch, sink_fp)
        params = self._scope_params()
        if params and any(f"'{p}'" in text or f'"{p}"' in text for p in params):
            key = key + (tuple(sorted((k, repr(v)) for k, v in params.items())),)
        return key

    def _lazy_scalar(self, df: DataFrame, sub_select) -> tuple[Node, DataFrame]:
        """UNCORRELATED scalar subquery as a LAZY 1-row broadcast cross
        join (no plan-time collect — the whole statement stays one Spark
        job): ``limit(2)`` bounds the inner work, the aggregate yields
        (first value, row count), and the >1-row ANSI violation raises at
        RUNTIME via ``raise_error``. Raises ``TranslateError`` through
        when the inner select references outer columns (correlated)."""
        from .nodes import SparkColNode

        sub_df = self._select_any(sub_select)
        if len(sub_df.columns) != 1:
            raise ExecError(f"scalar subquery must return one column, got {len(sub_df.columns)}")
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        p = f"__usub{self._subq_n}"
        lim = sub_df.limit(2)
        c = lim[lim.columns[0]]
        stats = lim.agg(F.first(c).alias(f"{p}_val"), F.count(F.lit(1)).alias(f"{p}_cnt"))
        out = df.crossJoin(F.broadcast(stats))
        val = F.when(
            F.col(f"{p}_cnt") > 1,
            F.raise_error(F.lit("scalar subquery returned more than one row")),
        ).otherwise(F.col(f"{p}_val"))
        return SparkColNode(col=val, dtype=sub_df.schema.fields[0].dataType), out

    def _lazy_quantified(self, df: DataFrame, x: SparkColumn, sub_select, base: str, quant: str) -> tuple[Node, DataFrame]:
        """UNCORRELATED quantified comparison, lazily: the inner column's
        (count, non-null, min, max) ride along as a 1-row broadcast frame
        and the min/max rewrite reads them as columns — zero plan-time
        jobs, same three-valued semantics."""
        from .nodes import SparkColNode

        sub_df = self._select_any(sub_select)
        if len(sub_df.columns) != 1:
            raise ExecError(f"quantified subquery must return one column, got {len(sub_df.columns)}")
        c = sub_df[sub_df.columns[0]]
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        p = f"__usub{self._subq_n}"
        stats = sub_df.agg(
            F.count(F.lit(1)).alias(f"{p}_t"),
            F.count(c).alias(f"{p}_nn"),
            F.min(c).alias(f"{p}_mn"),
            F.max(c).alias(f"{p}_mx"),
        )
        out = df.crossJoin(F.broadcast(stats))
        col = self._quantified_expr(
            x,
            base,
            quant,
            F.col(f"{p}_t"),
            F.col(f"{p}_nn"),
            F.col(f"{p}_t") - F.col(f"{p}_nn"),
            F.col(f"{p}_mn"),
            F.col(f"{p}_mx"),
        )
        return SparkColNode(col=col, dtype=T.BooleanType(), text=f"(x {base} {quant} subquery)"), out

    def _rewrite_subqueries(
        self, df: DataFrame, scope: Scope, sel: SqlSelect, include_qualify: bool = False
    ) -> tuple[DataFrame, SqlSelect]:
        """Lower select-list / WHERE scalar subqueries against the built
        FROM frame.

        - UNCORRELATED ``(SELECT max(x) FROM t)`` → in the SELECT LIST a
          LAZY 1-row broadcast cross join via ``_lazy_scalar`` (no
          plan-time job); in WHERE the eager ``_materialize_scalar``
          literal fold, which keeps the predicate pushable to the scan.
          FROM-less and HAVING/QUALIFY positions are eager too (no frame
          to join onto).
        - CORRELATED ``(SELECT max(x) FROM t WHERE t.k = o.k)`` →
          decorrelated: the inner select is aggregated by its correlation
          keys once, then LEFT-JOINed onto the outer frame — a single
          distributed join instead of the O(outer-rows × subquery)
          re-execution a tuple-at-a-time engine would do. Superset: the
          reference refuses every WHERE subquery
          (/root/reference/plan/planner_select.go:94-98).

        Returns the (possibly join-extended) frame and the rewritten
        select; injected ``__csub*`` columns disappear at projection.
        ``include_qualify``: non-aggregated QUALIFY predicates lower here
        too (the joined columns ride to the post-window filter);
        aggregated QUALIFY lowers in _aggregate instead."""
        fields = ("columns", "where") + (("qualify",) if include_qualify else ())
        if not self._has_scalar_subquery(sel, fields, include_in=True):
            return df, sel

        holder = {"df": df}

        def make_scalar_fn(lazy: bool):
            def scalar_fn(sub: SubqueryNode) -> Node:
                try:
                    if lazy:
                        node, holder["df"] = self._lazy_scalar(holder["df"], sub.select)
                        return node
                    # WHERE position: the EAGER literal fold keeps the
                    # predicate PUSHABLE to the scan (price >= lit(42)
                    # reaches PushedFilters; a joined column never does —
                    # at scale the scan pruning beats saving one bounded
                    # job, which is also how Spark itself runs uncorrelated
                    # scalar subqueries)
                    return self._materialize_scalar(sub.select)
                except TranslateError:
                    pass  # inner references outer columns → decorrelate
                node, holder["df"] = self._decorrelate_scalar(holder["df"], scope, sub.select)
                return node

            return scalar_fn

        def make_quant_fn(lazy: bool):
            def quant_fn(left_node: Node, sub: SubqueryNode, base: str, quant: str) -> Node:
                x = to_column(left_node, scope)
                try:
                    if lazy:
                        node, holder["df"] = self._lazy_quantified(holder["df"], x, sub.select, base, quant)
                        return node
                    return self._materialize_quantified(x, sub.select, base, quant)
                except TranslateError:
                    pass  # correlated → decorrelate
                node, holder["df"] = self._decorrelate_quantified(holder["df"], scope, x, sub.select, base, quant)
                return node

            return quant_fn

        def in_fn(left_node: Node, sub: SubqueryNode, negated: bool) -> Node:
            # membership as a BOOLEAN COLUMN (select list / disjunctions —
            # positions the semi-join can't serve); ANSI three-valued
            x = to_column(left_node, scope)
            node, holder["df"] = self._lower_in_membership(holder["df"], x, sub.select, negated, scope)
            return node

        def exists_fn(sub: SubqueryNode) -> Node:
            node, holder["df"] = self._lower_exists_mark(holder["df"], scope, sub.select)
            return node

        import dataclasses

        # SUBQUERY COALESCING: scalar aggregates sharing (FROM, WHERE) —
        # i.e. the same inner relation and correlation — merge into ONE
        # per-key aggregate + ONE join carrying every value column,
        # instead of a join per subquery (q38's three bare aggregates
        # over `orders WHERE o_custkey = c_custkey` become one)
        coalesced = self._coalesce_scalar_subqueries(holder, scope, sel, include_qualify)

        def wrap_scalar(lazy):
            base = make_scalar_fn(lazy)

            def fn(sub: SubqueryNode) -> Node:
                hit = coalesced.get(id(sub))
                return hit() if hit is not None else base(sub)

            return fn

        # select list: LAZY (saves a job, nothing pushable at stake);
        # WHERE: EAGER literal fold (keeps scan pushdown)
        walk_cols = lambda n: self._walk_subqueries(n, wrap_scalar(True), make_quant_fn(True), in_fn, exists_fn)  # noqa: E731
        walk_where = lambda n: self._walk_subqueries(n, wrap_scalar(False), make_quant_fn(False), in_fn, exists_fn)  # noqa: E731
        repl = dict(
            columns=[dataclasses.replace(c, expr=walk_cols(c.expr), guard=walk_cols(c.guard)) for c in sel.columns],
            where=self._walk_where_protected(sel.where, walk_where),
        )
        if include_qualify and sel.qualify is not None:
            repl["qualify"] = walk_cols(sel.qualify)
        sel = dataclasses.replace(sel, **repl)
        return holder["df"], sel

    def _coalesce_scalar_subqueries(self, holder, scope: Scope, sel: SqlSelect, include_qualify: bool = True):
        """Group SELECT-LIST scalar-aggregate subqueries by their
        (FROM, WHERE) text; each group of ≥2 lowers as ONE per-key
        aggregate carrying every member's value column + ONE left join —
        the classic subquery-coalescing optimization (a join per
        subquery otherwise). WHERE-position subqueries are never
        coalesced (they fold to pushable literals instead). Returns
        {id(SubqueryNode): thunk → replacement node}; groups whose
        correlation is absent, ranged, or unsplittable silently fall
        back to the per-subquery paths."""
        from .nodes import SparkColNode

        def candidates(n: Node | None, out):
            if n is None:
                return
            if isinstance(n, SubqueryNode):
                ss = n.select
                if (
                    not isinstance(ss, SqlSetOp)
                    and len(ss.columns) == 1
                    and not ss.columns[0].is_star
                    and funcs.is_agg_tree(ss.columns[0].expr)
                    and not ss.group_by
                    and ss.having is None
                    and not ss.order_by
                    and ss.limit is None
                    and not ss.distinct
                    and ss.from_
                    and all(s.subquery is None for s in ss.from_)
                ):
                    sig = (
                        "|".join(
                            f"{s.name}:{s.alias}:{s.join_type}:{s.join_expr.sql() if s.join_expr else ''}"
                            for s in ss.from_
                        ),
                        ss.where.sql() if ss.where is not None else "",
                    )
                    out.setdefault(sig, []).append(n)
                return  # don't descend into the subquery's own tree
            for c in n.children():
                candidates(c, out)

        groups: dict = {}
        for c in sel.columns:
            candidates(c.expr, groups)
            candidates(c.guard, groups)
        if include_qualify:
            candidates(sel.qualify, groups)

        mapping: dict[int, object] = {}
        for members in groups.values():
            if len(members) < 2:
                continue
            try:
                self._select_any(members[0].select)
                continue  # uncorrelated → lazy/eager paths handle it
            except TranslateError:
                pass
            try:
                inner_df, inner_scope, pairs, ranges = self._correlation_split(
                    scope, members[0].select, "scalar", allow_range=True
                )
            except ExecError:
                continue
            if ranges or not pairs:
                continue  # range shapes keep the window/probe lowering
            self._subq_n = getattr(self, "_subq_n", 0) + 1
            prefix = f"__csub{self._subq_n}"
            exprs = [m.select.columns[0].expr for m in members]
            shapes = [self._count_shape(e) for e in exprs]

            def build(key_cols, p, _inner=inner_df, _scope=inner_scope, _exprs=exprs, _shapes=shapes):
                aggs = [to_column(e, _scope).alias(f"{p}_v{i}") for i, e in enumerate(_exprs)]
                if any(s == "composite" for s in _shapes):
                    aggs.append(F.count(F.lit(1)).alias(f"{p}_cnt"))
                return _inner.groupBy(*key_cols).agg(*aggs)

            holder["df"], p = self._decorrelate_join(holder["df"], pairs, build)
            for i, (m, shape, e) in enumerate(zip(members, shapes, exprs)):
                val = F.col(f"{p}_v{i}")
                if shape == "bare":
                    val = F.coalesce(val, F.lit(0))
                elif shape == "composite":
                    ev = self._empty_agg_value(inner_df, to_column(e, inner_scope))
                    val = F.when(F.col(f"{p}_cnt").isNull(), F.lit(ev)).otherwise(val)
                node = SparkColNode(col=val, dtype=None, text="(coalesced correlated subquery)")
                mapping[id(m)] = (lambda n=node: n)
        return mapping

    @staticmethod
    def _node_has_subquery(n: Node | None) -> bool:
        if n is None:
            return False
        if isinstance(n, SubqueryNode):
            return True
        return any(Engine._node_has_subquery(c) for c in n.children())

    def _lower_having_subqueries(self, agged: DataFrame, hscope: Scope, having_node: Node):
        """Lower HAVING-position subqueries against the AGGREGATED frame:
        uncorrelated → bounded plan-time job; correlated (on group keys) →
        per-key aggregate + left join; IN (SELECT) → membership column
        (a semi-join can't carry the rest of the predicate here)."""
        holder = {"df": agged}

        def scalar_fn(sub: SubqueryNode) -> Node:
            try:
                return self._materialize_scalar(sub.select)
            except TranslateError:
                pass
            node, holder["df"] = self._decorrelate_scalar(holder["df"], hscope, sub.select)
            return node

        def quant_fn(left_node: Node, sub: SubqueryNode, base: str, quant: str) -> Node:
            x = to_column(left_node, hscope)
            try:
                return self._materialize_quantified(x, sub.select, base, quant)
            except TranslateError:
                pass
            node, holder["df"] = self._decorrelate_quantified(holder["df"], hscope, x, sub.select, base, quant)
            return node

        def in_fn(left_node: Node, sub: SubqueryNode, negated: bool) -> Node:
            x = to_column(left_node, hscope)
            node, holder["df"] = self._lower_in_membership(holder["df"], x, sub.select, negated, hscope)
            return node

        def exists_fn(sub: SubqueryNode) -> Node:
            node, holder["df"] = self._lower_exists_mark(holder["df"], hscope, sub.select)
            return node

        new_node = self._walk_subqueries(having_node, scalar_fn, quant_fn, in_fn, exists_fn)
        return holder["df"], new_node

    def _walk_where_protected(self, where: Node | None, walk) -> Node | None:
        """Walk a WHERE tree, PRESERVING top-level ``IN (SELECT)`` and
        ``EXISTS`` conjuncts — `_apply_where` lowers those to semi/anti
        joins, strictly better plans than a membership-marker join (no
        NULL-handling columns, AQE-broadcastable). Everything else —
        disjunctive INs, scalar/quantified subqueries — lowers here."""
        if where is None:
            return None
        out: Node | None = None
        for c in self._conjuncts(where):
            # = ANY / != ALL conjuncts are IN / NOT IN — normalize so the
            # semi/anti-join path claims them too
            if isinstance(c, BinaryNode) and isinstance(c.right, SubqueryNode):
                if c.op == "= ANY":
                    c = BinaryNode("IN", c.left, c.right, c.negated)
                elif c.op == "!= ALL":
                    c = BinaryNode("IN", c.left, c.right, not c.negated)
            if self._as_subquery_in(c) is not None or self._as_exists_subquery(c) is not None:
                # semi/anti-join path claims conjunct INs and conjunct
                # [NOT] EXISTS — strictly better plans than a mark column
                lowered = c
            else:
                # everything else walks — disjunctive/select-list EXISTS
                # lowers to a boolean mark column here
                lowered = walk(c)
            out = lowered if out is None else BinaryNode("AND", out, lowered)
        return out

    @staticmethod
    def _membership_flag(x: SparkColumn, t: SparkColumn, nn: SparkColumn, matched: SparkColumn, negated: bool) -> SparkColumn:
        """ANSI three-valued membership from per-row set statistics:
        FALSE on empty set, UNKNOWN when x is NULL (non-empty set) or when
        unmatched against a set containing NULL, else matched."""
        null_b = F.lit(None).cast("boolean")
        flag = (
            F.when(t == 0, F.lit(False))
            .when(x.isNull(), null_b)
            .when(matched, F.lit(True))
            .when(t - nn > 0, null_b)
            .otherwise(F.lit(False))
        )
        return ~flag if negated else flag  # three-valued NOT: NULL stays NULL

    def _lower_in_membership(self, df: DataFrame, x: SparkColumn, sub_sel, negated: bool, scope: Scope | None = None):
        """``x IN (SELECT …)`` as a BOOLEAN COLUMN (select list /
        disjunctive WHERE — positions a semi-join can't serve): LEFT JOIN
        the distinct non-null inner values with a match marker, then fold
        ANSI three-valued membership — FALSE on empty set, UNKNOWN when
        unmatched against a set containing NULL (or when x is NULL).

        Fully LAZY: the inner set's (size, null-count) ride along as a
        1-row broadcast frame instead of a plan-time collect, so the whole
        statement stays one job. CORRELATED inner selects (equality
        correlation) decorrelate via per-correlation-key statistics +
        per-(key, value) match join — see ``_lower_in_membership_corr``."""
        from .nodes import SparkColNode

        try:
            sub_df = self._select_any(sub_sel)
        except TranslateError as exc:
            if scope is not None:
                return self._lower_in_membership_corr(df, scope, x, sub_sel, negated)
            raise ExecError(
                "correlated IN (SELECT …) is supported only as a top-level WHERE conjunct "
                f"(semi/anti-join); in this position the inner select must be self-contained: {exc}"
            ) from None
        if len(sub_df.columns) != 1:
            raise ExecError(f"IN subquery must return one column, got {len(sub_df.columns)}")
        c = sub_df[sub_df.columns[0]]
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        n = self._subq_n
        key, mark, tcol, nncol = f"__inq{n}_k", f"__inq{n}_m", f"__inq{n}_t", f"__inq{n}_nn"
        stats = sub_df.agg(F.count(F.lit(1)).alias(tcol), F.count(c).alias(nncol))
        vals = sub_df.select(c.alias(key)).where(c.isNotNull()).distinct().withColumn(mark, F.lit(True))
        # 1-row broadcast cross join carries (size, null-count) per row;
        # the __inq* stat/mark columns vanish at the final projection
        out = df.crossJoin(F.broadcast(stats)).join(F.broadcast(vals), on=x == F.col(key), how="left").drop(key)
        flag = self._membership_flag(x, F.col(tcol), F.col(nncol), F.col(mark).isNotNull(), negated)
        return SparkColNode(col=flag, dtype=T.BooleanType(), text="(x IN subquery)"), out

    def _lower_exists_mark(self, df: DataFrame, scope: Scope, sub_sel):
        """CORRELATED ``EXISTS (SELECT …)`` as a BOOLEAN COLUMN (select
        list / disjunctive WHERE — top-level conjuncts keep the strictly
        better semi/anti-join). One per-correlation-key TRUE marker +
        LEFT JOIN; EXISTS is two-valued, so unmatched keys coalesce to
        FALSE. The select list of the inner query is irrelevant to EXISTS
        (ANSI) — normalized to ``SELECT 1`` before the split so ``SELECT
        *`` inner selects work. Superset: the reference refuses every
        WHERE subquery (/root/reference/plan/planner_select.go:94-98)."""
        import dataclasses

        from .nodes import SparkColNode

        if isinstance(sub_sel, SqlSetOp):
            raise ExecError("correlated EXISTS subquery must be a plain SELECT (no set-ops)")
        one = dataclasses.replace(sub_sel, columns=[Column(expr=NumberNode("1"))], order_by=[], limit=None)
        inner_df, inner_scope, pairs, ranges = self._correlation_split(scope, one, "EXISTS", allow_range=True)
        if len(ranges) > 1 or (ranges and (ranges[0][0] not in ("<", "<=", ">", ">=") or not pairs)):
            raise ExecError(
                "correlated EXISTS column supports equality correlation plus at most one <,<=,>,>= conjunct"
            )
        if ranges:
            # per-key extremum: EXISTS(r.ts <= o.ts …) ⇔ min(r.ts) <= o.ts
            # (max for >/>=); missing keys coalesce to FALSE
            op, r_ic, r_oc = ranges[0]
            ext = F.min if op in ("<", "<=") else F.max

            def build(key_cols, prefix):
                return inner_df.groupBy(*key_cols).agg(ext(r_ic).alias(f"{prefix}_ex"))

            out, p = self._decorrelate_join(df, pairs, build)
            e = F.col(f"{p}_ex")
            cmp = {"<": e < r_oc, "<=": e <= r_oc, ">": e > r_oc, ">=": e >= r_oc}[op]
            flag = F.coalesce(cmp, F.lit(False))
            return SparkColNode(col=flag, dtype=T.BooleanType(), text="EXISTS(range-correlated)"), out

        def build(key_cols, prefix):
            return inner_df.groupBy(*key_cols).agg(F.lit(True).alias(f"{prefix}_ex"))

        out, p = self._decorrelate_join(df, pairs, build)
        flag = F.coalesce(F.col(f"{p}_ex"), F.lit(False))
        return SparkColNode(col=flag, dtype=T.BooleanType(), text="EXISTS(correlated)"), out

    def _lower_in_membership_corr(self, df: DataFrame, scope: Scope, x: SparkColumn, sub_sel, negated: bool):
        """CORRELATED membership column — ``x IN (SELECT v FROM t WHERE
        t.k = o.k)`` in the select list or a disjunction. Decorrelated to
        two equality joins, both AQE-broadcastable when the inner side is
        small:

          stats = inner groupBy correlation keys → (count, non-null count)
          match = distinct (keys, value) LEFT-JOINed on keys AND value = x

        Outer rows with no key match see an empty set (counts coalesce to
        0 → FALSE, or TRUE→FALSE under NOT IN), matching ANSI. RANGE
        correlation (``t.ts < o.ts`` conjuncts) routes through a distinct
        probe-tuple aggregation instead — see the branch below. Superset:
        the reference refuses every WHERE subquery
        (/root/reference/plan/planner_select.go:94-98)."""
        from .nodes import SparkColNode

        inner_df, inner_scope, pairs, ranges = self._correlation_split(scope, sub_sel, "IN", allow_range=True)
        val = to_column(sub_sel.columns[0].expr, inner_scope)
        if ranges:
            return self._lower_in_membership_range(df, x, inner_df, val, pairs, ranges, negated)

        def build(key_cols, prefix):
            return inner_df.groupBy(*key_cols).agg(
                F.count(F.lit(1)).alias(f"{prefix}_t"), F.count(val).alias(f"{prefix}_nn")
            )

        out, p = self._decorrelate_join(df, pairs, build)
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        m = self._subq_n
        key_names = [f"__inq{m}_k{i}" for i in range(len(pairs))]
        vkey, mark = f"__inq{m}_v", f"__inq{m}_m"
        vals = (
            inner_df.where(val.isNotNull())
            .select(*[ic.alias(kn) for (ic, _), kn in zip(pairs, key_names)], val.alias(vkey))
            .distinct()
            .withColumn(mark, F.lit(True))
        )
        on = vals[vkey] == x
        for i, ((_, oc), kn) in enumerate(zip(pairs, key_names)):
            on = on & self._pair_cond(pairs, i, vals[kn], oc)
        out = out.join(vals, on=on, how="left").drop(vkey, *key_names)
        flag = self._membership_flag(
            x,
            F.coalesce(F.col(f"{p}_t"), F.lit(0)),
            F.coalesce(F.col(f"{p}_nn"), F.lit(0)),
            F.col(mark).isNotNull(),
            negated,
        )
        return SparkColNode(col=flag, dtype=T.BooleanType(), text="(x IN correlated subquery)"), out

    def _lower_in_membership_range(self, df, x, inner_df, val, pairs, ranges, negated):
        """RANGE-correlated membership column — ``x IN (SELECT v FROM t
        WHERE t.k = o.k AND t.ts < o.ts)``. The per-key stats of the
        equality path can't serve a range predicate, so aggregate per
        distinct PROBE tuple (eq keys + range operands + x itself):

          probes  = distinct outer (keys, operands, x)        [1 shuffle]
          matched = probes ⋈ inner: eq keys + range residual
          stats   = matched groupBy probe → (count, non-null, any v = x)
          out     = outer LEFT JOIN stats on probe tuple      [equi]

        Folding the match marker into the same aggregate (``x`` rides in
        the probe tuple) keeps this ONE join instead of the equality
        path's two. The ``x`` join-back component is null-safe: an x-NULL
        outer row must still see the true set size (ANSI: NULL IN
        non-empty-set is UNKNOWN, not FALSE). NULL eq keys/operands match
        nothing → empty set → FALSE, via the plain == components."""
        from .nodes import SparkColNode

        self._subq_n = getattr(self, "_subq_n", 0) + 1
        prefix = f"__inq{self._subq_n}"
        probe_specs = [
            (f"{prefix}_k{i}", oc, ic, "<=>" if i in getattr(pairs, "nullsafe", ()) else "=")
            for i, (ic, oc) in enumerate(pairs)
        ]
        probe_specs += [(f"{prefix}_r{j}", oc, ic, op) for j, (op, ic, oc) in enumerate(ranges)]
        xn = f"{prefix}_x"
        names = [nm for nm, _, _, _ in probe_specs]
        probes = df.select(*[oc.alias(nm) for nm, oc, _, _ in probe_specs], x.alias(xn)).distinct()
        cond = None
        for nm, _, ic, op in probe_specs:
            pc = probes[nm]
            c = {"=": ic == pc, "<=>": ic.eqNullSafe(pc), "<": ic < pc, "<=": ic <= pc, ">": ic > pc, ">=": ic >= pc, "!=": ic != pc}[op]
            cond = c if cond is None else cond & c
        matched = probes.join(inner_df, on=cond, how="inner")
        t, nn, m = f"{prefix}_t", f"{prefix}_nn", f"{prefix}_m"
        stats = matched.groupBy(*names, xn).agg(
            F.count(F.lit(1)).alias(t),
            F.count(val).alias(nn),
            F.max(F.when(val == F.col(xn), F.lit(True))).alias(m),
        )
        on = stats[xn].eqNullSafe(x)
        for nm, oc, _, _ in probe_specs:
            on = on & stats[nm].eqNullSafe(oc)
        out = df.join(stats, on=on, how="left").drop(xn, *names)
        flag = self._membership_flag(
            x,
            F.coalesce(F.col(t), F.lit(0)),
            F.coalesce(F.col(nn), F.lit(0)),
            F.coalesce(F.col(m), F.lit(False)),
            negated,
        )
        return SparkColNode(col=flag, dtype=T.BooleanType(), text="(x IN range-correlated subquery)"), out

    _RANGE_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "!=": "!="}

    class _CorrPairs(list):
        """Equality-correlation pairs; ``nullsafe`` holds the indexes of
        ``IS NOT DISTINCT FROM`` conjuncts (join with eqNullSafe — a NULL
        outer key MATCHES the inner NULL group, unlike ANSI ``=``)."""

        nullsafe: frozenset = frozenset()

    @staticmethod
    def _pair_cond(pairs, i: int, key_col, outer_col):
        """Join condition for correlation pair ``i``: null-safe pairs use
        eqNullSafe; plain ``=`` pairs keep ANSI semantics (a NULL outer
        key matches nothing, so the subquery is empty there)."""
        if i in getattr(pairs, "nullsafe", ()):
            return key_col.eqNullSafe(outer_col)
        return key_col == outer_col

    def _correlation_split(self, scope: Scope, sub_sel, kind: str, allow_range: bool = False, allow_group: bool = False):
        """Shared decorrelation front-end: build the inner frame, split the
        inner WHERE into inner-only filters (applied, stay pushed to the
        inner scan), EQUALITY correlation conjuncts, and (when
        ``allow_range``) NON-EQUALITY correlation conjuncts.

        Returns ``(inner_df, inner_scope, pairs, ranges)`` with pairs as
        (inner key Column, outer key Column) and ranges as
        (op, inner Column, outer Column) normalized so the predicate reads
        ``inner <op> outer``. Without ``allow_range`` a non-equality
        correlated conjunct raises (ranges is then always empty)."""
        if isinstance(sub_sel, SqlSetOp):
            raise ExecError(f"correlated {kind} subquery must be a plain SELECT (no set-ops)")
        if not allow_group and (len(sub_sel.columns) != 1 or sub_sel.columns[0].is_star):
            raise ExecError(f"{kind} subquery must return exactly one column")
        if not allow_group and (sub_sel.group_by or sub_sel.having is not None):
            raise ExecError(f"correlated {kind} subquery cannot use GROUP BY/HAVING")
        if allow_group and sub_sel.having is not None:
            raise ExecError(f"correlated {kind} subquery cannot use HAVING")
        if not sub_sel.from_:
            raise ExecError(f"correlated {kind} subquery needs a FROM clause")
        inner_df, inner_scope = self._build_from(sub_sel)
        overlap = set(inner_scope.frames) & set(scope.frames)
        if overlap:
            raise ExecError(
                f"correlated {kind} subquery: alias {sorted(overlap)} names both an outer and an inner "
                "table; alias one side (… FROM orders AS o)"
            )
        inner_filters: list[SparkColumn] = []
        pairs = self._CorrPairs()  # (inner key, outer key)
        nullsafe: set[int] = set()
        ranges: list[tuple[str, SparkColumn, SparkColumn]] = []  # (op, inner, outer)
        range_ops = set(self._RANGE_FLIP) if allow_range else set()
        for c in self._conjuncts(sub_sel.where) if sub_sel.where is not None else []:
            try:
                inner_filters.append(to_column(c, inner_scope))
                continue
            except TranslateError:
                pass
            # `x IS NOT DISTINCT FROM y` is NULL-SAFE equality — decorrelates
            # like `=` but the join must match NULL keys (eqNullSafe)
            ns = isinstance(c, BinaryNode) and c.op == "IS DISTINCT FROM" and c.negated
            if not ns and not (
                isinstance(c, BinaryNode) and not c.negated and (c.op == "=" or c.op in range_ops)
            ):
                raise ExecError(
                    f"correlated {kind} subquery: only equality{'/range' if allow_range else ''} "
                    f"correlation decorrelates to a join (got {c.sql()})"
                )
            sides = []
            for side in (c.left, c.right):
                try:
                    sides.append(("inner", to_column(side, inner_scope)))
                except TranslateError:
                    # not inner-resolvable → must be outer; a genuine
                    # translation error (unknown column/function) raises
                    # here with its original message
                    sides.append(("outer", to_column(side, scope)))
            kinds = [k for k, _ in sides]
            if kinds == ["inner", "outer"]:
                inner_col, outer_col, op = sides[0][1], sides[1][1], c.op
            elif kinds == ["outer", "inner"]:
                inner_col, outer_col, op = sides[1][1], sides[0][1], self._RANGE_FLIP.get(c.op, c.op)
            else:
                raise ExecError("correlation conjunct must compare an inner column to an outer column")
            if op == "=" or ns:
                if ns:
                    nullsafe.add(len(pairs))
                pairs.append((inner_col, outer_col))
            else:
                ranges.append((op, inner_col, outer_col))
        pairs.nullsafe = frozenset(nullsafe)
        if not pairs and not ranges:
            # nothing correlated after all — the earlier TranslateError was
            # a genuine failure; re-run the inner select to surface it
            self._select_any(sub_sel)
            raise ExecError(f"{kind} subquery resolution failed")  # pragma: no cover
        for p in inner_filters:
            inner_df = inner_df.filter(p)
        return inner_df, inner_scope, pairs, ranges

    def _decorrelate_join(self, df: DataFrame, pairs, agg_df_builder):
        """Back-end: groupBy the correlation keys with the caller's
        aggregates, LEFT-JOIN the 1-row-per-key frame onto the outer.
        ``agg_df_builder(grouped_key_cols) -> aggregated DataFrame`` keyed
        by ``key_names``. Returns (joined df, unique name prefix)."""
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        n = self._subq_n
        key_names = [f"__csub{n}_k{i}" for i in range(len(pairs))]
        agg_df = agg_df_builder([ic.alias(kn) for (ic, _), kn in zip(pairs, key_names)], f"__csub{n}")
        on = None
        for i, ((_, oc), kn) in enumerate(zip(pairs, key_names)):
            # plain `=` pairs keep ANSI semantics (NULL outer key matches
            # nothing); IS NOT DISTINCT FROM pairs join null-safely
            cond = self._pair_cond(pairs, i, agg_df[kn], oc)
            on = cond if on is None else (on & cond)
        return df.join(agg_df, on=on, how="left").drop(*key_names), f"__csub{n}"

    @staticmethod
    def _count_shape(expr) -> str:
        """'bare' (a count-family call IS the whole expression → coalesce
        its NULL-on-empty to 0), 'composite' (a count is buried in a larger
        expression, e.g. ``count(*)+1`` → needs the full empty-relation
        value), or 'none'. The classic count-bug: COUNT over an empty
        correlated set is 0/defined, not the NULL a left join produces."""
        names = {"count", "count_distinct", "approx_count_distinct"}
        if isinstance(expr, FuncNode) and expr.name.lower() in names:
            return "bare"

        def has(n: Node) -> bool:
            if isinstance(n, FuncNode) and n.name.lower() in names:
                return True
            return any(has(c) for c in n.children())

        return "composite" if has(expr) else "none"

    def _empty_agg_value(self, inner_df: DataFrame, val_col: SparkColumn):
        """Evaluate the aggregate expression over the EMPTY relation — the
        ANSI value a scalar subquery takes for outer rows with no matching
        inner rows (``count(*)+1`` → 1, ``2*count(x)`` → 0, ``max(x)`` →
        NULL). One bounded plan-time job Catalyst folds to a LocalRelation
        (PropagateEmptyRelation), so no cluster work."""
        return inner_df.where(F.lit(False)).agg(val_col.alias("__empty")).collect()[0][0]

    def _scalar_val_expr(self, prefix: str, is_agg: bool, count_shape: str, top1: bool, limit1_any: bool, empty_val):
        """Post-join value expression for a decorrelated scalar subquery.
        ``empty_val`` is a lazy callable giving the empty-set value for
        composite count expressions (only invoked for that shape)."""
        val = F.col(f"{prefix}_val")
        if not is_agg and not top1 and not limit1_any:
            val = F.when(
                F.col(f"{prefix}_cnt") > 1,
                F.raise_error(F.lit("scalar subquery returned more than one row")),
            ).otherwise(val)
        elif count_shape == "bare":
            val = F.coalesce(val, F.lit(0))
        elif count_shape == "composite":
            val = F.when(F.col(f"{prefix}_cnt").isNull(), F.lit(empty_val())).otherwise(val)
        return val

    #: window aggregates for the single-range fast path
    _RANGE_WINDOW_AGGS = ("count", "sum", "min", "max", "avg")

    def _range_window_aggd(
        self, expr, inner_df, inner_scope, pairs, ranges, probes, prefix, is_agg, count_shape, order_by=None, top1=False
    ):
        """Running-window lowering for a SINGLE-range correlated aggregate
        (the as-of shape, ``(SELECT max(y) FROM t WHERE t.k=o.k AND
        t.ts <= o.ts)``): union the distinct probe tuples with the inner
        rows, sort each equality-key partition by the range operand, and
        read the running aggregate at each probe row.

        Why this beats the probe-join path: the join materializes
        |matching probes| × |inner| intermediate rows per equality key
        (quadratic on hot keys) and then aggregates them away; the window
        touches each union row ONCE — linear, skew-tolerant, and one
        fewer shuffle (no matched/groupBy pair). Strict and inclusive
        bounds are exact via a tie-break sort on the probe/inner tag, so
        ties never depend on row order. Returns the aggregated frame
        keyed by the probe-tuple names, or None when ineligible (multiple
        ranges, no equality key, non-whitelisted aggregate, composite
        count, DISTINCT agg, probe/inner type mismatch)."""
        if count_shape == "composite" or len(ranges) != 1 or not pairs:
            return None
        op, r_ic, _ = ranges[0]
        if op not in ("<", "<=", ">", ">="):
            return None
        pick = None  # top-1: F.first / F.last over the running frame
        if top1:
            # as-of lookup `(SELECT v … AND t.ts <= o.ts ORDER BY t.ts
            # [DESC] LIMIT 1)`: valid only when the ORDER BY key IS the
            # range operand — then "latest before" is the last non-null
            # value in the running frame (LOCF), "earliest" the first
            if is_agg or order_by is None or len(order_by) != 1:
                return None
            okey, direction = order_by[0]
            if str(to_column(okey, inner_scope)) != str(r_ic):
                return None
            want_latest = direction.upper().startswith("DESC")
            asc_window = op in ("<", "<=")
            pick = F.last if (asc_window == want_latest) else F.first
            # struct wrapper: a top-1 row whose VALUE is NULL must still
            # win (ignorenulls may only skip probe rows, not inner rows)
            pval = F.struct(F.lit(1).alias("m"), to_column(expr, inner_scope).alias("v"))
        elif not is_agg:
            return None
        elif not isinstance(expr, FuncNode) or expr.filter_where is not None:
            return None
        else:
            fname = expr.name.lower()
            if fname not in self._RANGE_WINDOW_AGGS:
                return None
            if fname == "count":
                a = expr.args[0]
                if isinstance(a, IdentityNode) and a.is_star:
                    pval = F.lit(1)
                elif isinstance(a, FuncNode) and a.name == "distinct":
                    return None  # DISTINCT not window-expressible
                else:
                    pval = to_column(a, inner_scope)
            else:
                pval = to_column(expr.args[0], inner_scope)
                if fname == "avg":
                    pval = pval.cast("double")
        from pyspark.sql.window import Window

        k_names = [f"{prefix}_k{i}" for i in range(len(pairs))]
        r_name = f"{prefix}_r0"
        tag = f"{prefix}_tag"
        vname = f"{prefix}_pv"
        # rows whose correlation predicate is UNKNOWN (NULL key/operand)
        # can never match — drop them so NULL grouping can't leak them in.
        # EXCEPT null-safe pairs (IS NOT DISTINCT FROM): there the NULL
        # group is a real match target, and partitionBy's NULL grouping
        # gives exactly the null-safe semantics
        keep = r_ic.isNotNull()
        for i, (ic, _) in enumerate(pairs):
            if i not in getattr(pairs, "nullsafe", ()):
                keep = keep & ic.isNotNull()
        inner_side = inner_df.where(keep).select(
            *[ic.alias(kn) for (ic, _), kn in zip(pairs, k_names)],
            r_ic.alias(r_name),
            pval.alias(vname),
            F.lit(1).alias(tag),
        )
        vtype = inner_side.schema[vname].dataType
        probe_side = probes.select(*k_names, r_name, F.lit(None).cast(vtype).alias(vname), F.lit(0).alias(tag))
        # the union compares probe operands against inner columns by
        # POSITION — identical types only (the join path coerces; here a
        # silent cross-type sort would reorder, so bail to the join path)
        if [f.dataType for f in probe_side.schema.fields] != [f.dataType for f in inner_side.schema.fields]:
            return None
        unioned = probe_side.union(inner_side)
        rv = F.col(r_name)
        # inclusive ops sort tied inner rows BEFORE the probe (frame
        # includes them); strict ops sort them after (frame excludes).
        # NULL probe operands sort first → empty frame → ANSI empty set.
        ordering = {
            "<=": [rv.asc_nulls_first(), F.col(tag).desc()],
            "<": [rv.asc_nulls_first(), F.col(tag).asc()],
            ">=": [rv.desc_nulls_first(), F.col(tag).desc()],
            ">": [rv.desc_nulls_first(), F.col(tag).asc()],
        }[op]
        w = (
            Window.partitionBy(*k_names)
            .orderBy(*ordering)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        if pick is not None:
            win_col = pick(F.col(vname), ignorenulls=True).over(w).getField("v")
        else:
            agg = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[fname](F.col(vname))
            win_col = agg.over(w)
        return (
            unioned.withColumn(f"{prefix}_val", win_col)
            .where(F.col(tag) == 0)
            .select(*k_names, r_name, f"{prefix}_val")
        )

    def _decorrelate_scalar_range(
        self,
        df,
        expr,
        inner_df,
        inner_scope,
        pairs,
        ranges,
        is_agg,
        count_shape,
        agg_exprs,
        top1,
        top1_window_frame,
        limit1_any,
        order_by=None,
    ):
        """RANGE-correlated scalar subquery — ``(SELECT max(y) FROM t WHERE
        t.k = o.k AND t.ts <= o.ts)``, the latest-value-before lookup. A
        per-key pre-aggregate can't serve a non-equality predicate, so
        aggregate per distinct PROBE tuple instead:

          probes  = distinct outer (eq keys + range operands)  [1 shuffle]
          matched = probes ⋈ inner: eq keys + range residual   [equi-join]
          aggd    = matched groupBy probe tuple                [1 shuffle]
          out     = outer LEFT JOIN aggd on probe tuple        [equi, AQE-broadcastable]

        Scale: both shuffles key on the probe tuple (≤ outer cardinality,
        usually far less after distinct); the equality keys keep the middle
        join an equi-join with the range as a residual condition — never a
        cartesian (when only range conjuncts exist it degrades to a
        broadcast-nested-loop against the distinct probes, still bounded by
        |probes| × |inner-after-filters|). NULL probe operands match
        nothing → empty set (ANSI: the correlation predicate is UNKNOWN).
        Superset: the reference refuses every WHERE subquery
        (/root/reference/plan/planner_select.go:94-98)."""
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        prefix = f"__csub{self._subq_n}"
        probe_specs = []  # (name, outer Column, inner Column, op)
        for i, (ic, oc) in enumerate(pairs):
            probe_specs.append(
                (f"{prefix}_k{i}", oc, ic, "<=>" if i in getattr(pairs, "nullsafe", ()) else "=")
            )
        for j, (op, ic, oc) in enumerate(ranges):
            probe_specs.append((f"{prefix}_r{j}", oc, ic, op))
        names = [nm for nm, _, _, _ in probe_specs]
        probes = df.select(*[oc.alias(nm) for nm, oc, _, _ in probe_specs]).distinct()
        aggd = self._range_window_aggd(
            expr, inner_df, inner_scope, pairs, ranges, probes, prefix, is_agg, count_shape, order_by, top1
        )
        if aggd is None:
            # general fallback: range join against the distinct probes
            cond = None
            for nm, _, ic, op in probe_specs:
                pc = probes[nm]
                c = {"=": ic == pc, "<=>": ic.eqNullSafe(pc), "<": ic < pc, "<=": ic <= pc, ">": ic > pc, ">=": ic >= pc, "!=": ic != pc}[op]
                cond = c if cond is None else cond & c
            matched = probes.join(inner_df, on=cond, how="inner")
            aggs = agg_exprs(prefix, names)
            aggd = top1_window_frame(matched, prefix, names) if aggs is None else matched.groupBy(*names).agg(*aggs)
        on = None
        for nm, oc, _, _ in probe_specs:
            # null-safe join-back: the probe tuple came from the OUTER frame
            # verbatim, so <=> is exact — for plain `=` components a NULL
            # probe never produced an aggd row (ANSI empty-set), and for
            # IS NOT DISTINCT FROM components the NULL probe's row matches
            c = aggd[nm].eqNullSafe(oc)
            on = c if on is None else on & c
        out = df.join(aggd, on=on, how="left").drop(*names)
        val = self._scalar_val_expr(
            prefix,
            is_agg,
            count_shape,
            top1,
            limit1_any,
            lambda: self._empty_agg_value(inner_df, to_column(expr, inner_scope)),
        )
        return val, out

    def _decorrelate_scalar_grouped(self, df: DataFrame, scope: Scope, sub_sel, expr, is_agg) -> tuple[Node, DataFrame]:
        """Correlated scalar whose FROM is a GROUPED derived table —
        ``(SELECT max(s) FROM (SELECT sum(x) AS s FROM t WHERE t.k = o.k
        GROUP BY t.g) q)`` — the max-per-group-per-key lookup (max daily
        spend per customer, busiest hour per host, …).

        Two-level decorrelation, both levels one distributed aggregate:
        the derived table re-aggregates by (correlation keys + its own
        GROUP BY), the outer aggregate collapses that to one row per
        correlation key, and the standard LEFT JOIN carries the value
        back. A tuple-at-a-time engine re-runs the whole grouped query
        per outer row. Equality correlation only (a range conjunct would
        need the probe machinery threaded through both levels)."""
        from .nodes import SparkColNode

        if not is_agg:
            raise ExecError(
                "correlated scalar over a grouped derived table must aggregate "
                "(the derived table has one row per group, not per outer row)"
            )
        src = sub_sel.from_[0]
        q_sel = src.subquery
        if any(c.is_star for c in q_sel.columns):
            raise ExecError("correlated grouped derived table cannot use *")
        inner_df, inner_scope, pairs, _ = self._correlation_split(scope, q_sel, "scalar", allow_group=True)
        self._subq_n = getattr(self, "_subq_n", 0) + 1
        prefix = f"__csub{self._subq_n}"
        key_names = [f"{prefix}_k{i}" for i in range(len(pairs))]
        g_names = [f"{prefix}_g{j}" for j in range(len(q_sel.group_by))]
        g_sqls = [g.sql() for g in q_sel.group_by]
        group_cols = [to_column(g, inner_scope).alias(gn) for g, gn in zip(q_sel.group_by, g_names)]
        aggs: list[SparkColumn] = []
        post: list[SparkColumn] = []  # output columns of the derived table
        for c in q_sel.columns:
            name = c.output_name
            if funcs.is_agg_tree(c.expr):
                aggs.append(to_column(c.expr, inner_scope).alias(name))
                post.append(F.col(name))
            else:
                try:
                    j = g_sqls.index(c.expr.sql())
                except ValueError:
                    raise ExecError(
                        f"derived-table column {c.expr.sql()} is neither an aggregate nor a GROUP BY key"
                    ) from None
                post.append(F.col(g_names[j]).alias(name))
        qprime = (
            inner_df.groupBy(*[ic.alias(kn) for (ic, _), kn in zip(pairs, key_names)], *group_cols)
            .agg(*aggs)
            .select(*key_names, *post)
            .alias(src.ref)
        )
        # the OUTER level evaluates against the derived table's columns
        qscope = Scope({src.ref: qprime}, includes=self.includes, params=self._scope_params())
        for conj in self._conjuncts(sub_sel.where) if sub_sel.where is not None else []:
            qprime = qprime.filter(to_column(conj, qscope))
        count_shape = self._count_shape(expr)
        out_aggs = [to_column(expr, qscope).alias(f"{prefix}_val")]
        if count_shape == "composite":
            out_aggs.append(F.count(F.lit(1)).alias(f"{prefix}_cnt"))
        agg_df = qprime.groupBy(*key_names).agg(*out_aggs)
        on = None
        for i, ((_, oc), kn) in enumerate(zip(pairs, key_names)):
            c = self._pair_cond(pairs, i, agg_df[kn], oc)
            on = c if on is None else (on & c)
        out = df.join(agg_df, on=on, how="left").drop(*key_names)
        val = self._scalar_val_expr(
            prefix,
            True,
            count_shape,
            False,
            False,
            lambda: self._empty_agg_value(qprime, to_column(expr, qscope)),
        )
        return SparkColNode(col=val, dtype=None, text="(grouped correlated subquery)"), out

    def _decorrelate_scalar(self, df: DataFrame, scope: Scope, sub_sel) -> tuple[Node, DataFrame]:
        """Decorrelate one correlated scalar subquery: aggregate the inner
        relation by its correlation keys, LEFT-JOIN the 1-row-per-key frame
        onto the outer, and return (value node, joined frame).

        Requirements (ANSI ≤1-row-per-outer-row guarantee by construction):
        a plain single-column aggregate SELECT, correlation via equality
        conjuncts. Inner-only conjuncts stay filters on the inner frame
        (pushed to its scan). COUNT over an empty correlated set is 0, not
        NULL (the classic count-bug) → coalesced."""
        from .nodes import SparkColNode

        if not isinstance(sub_sel, SqlSetOp) and sub_sel.columns and not sub_sel.columns[0].is_star:
            expr = sub_sel.columns[0].expr
        else:
            raise ExecError("scalar subquery must return exactly one column")
        is_agg = funcs.is_agg_tree(expr)
        if (
            len(sub_sel.from_) == 1
            and sub_sel.from_[0].subquery is not None
            and not isinstance(sub_sel.from_[0].subquery, SqlSetOp)
            and sub_sel.from_[0].subquery.group_by
        ):
            # aggregate-over-grouped-correlated-derived-table, e.g.
            # (SELECT max(s) FROM (SELECT sum(x) AS s FROM t
            #  WHERE t.k = o.k GROUP BY t.g) q)
            return self._decorrelate_scalar_grouped(df, scope, sub_sel, expr, is_agg)
        if getattr(sub_sel, "group_by", None):
            # direct GROUP BY inside the correlated scalar: legal exactly
            # when the group keys are a subset of the correlation equality
            # keys — then every outer row sees at most ONE group (the
            # WHERE pins all keys), and an EMPTY set yields no group row
            # → NULL, NOT the count-bug 0 (no coalesce here; that is the
            # ANSI difference from the ungrouped form)
            if not is_agg:
                raise ExecError("correlated scalar subquery with GROUP BY must select an aggregate")
            if len(sub_sel.columns) != 1:
                raise ExecError(f"scalar subquery must return one column, got {len(sub_sel.columns)}")
            import dataclasses

            having = sub_sel.having
            if having is not None and not funcs.is_agg_tree(having):
                raise ExecError(
                    "correlated scalar HAVING must be an aggregate predicate (e.g. count(*) > 2)"
                )
            inner_df, inner_scope, pairs, ranges = self._correlation_split(
                scope, dataclasses.replace(sub_sel, having=None), "scalar",
                allow_range=False, allow_group=True,
            )
            pair_strs = {str(ic) for ic, _ in pairs}
            for g in sub_sel.group_by:
                if str(to_column(g, inner_scope)) not in pair_strs:
                    raise ExecError(
                        f"correlated scalar GROUP BY key {g.sql()} must be one of the "
                        "correlation equality keys (anything else can return more than "
                        "one row per outer row)"
                    )

            def build_grouped(key_cols, prefix):
                aggs = [to_column(expr, inner_scope).alias(f"{prefix}_val")]
                if having is not None:
                    # HAVING filters the (single) group: a filtered-out
                    # group joins nothing → NULL, same as an empty group
                    aggs.append(to_column(having, inner_scope).cast("boolean").alias(f"{prefix}_hav"))
                g = inner_df.groupBy(*key_cols).agg(*aggs)
                if having is not None:
                    g = g.where(F.col(f"{prefix}_hav")).drop(f"{prefix}_hav")
                return g

            out, prefix = self._decorrelate_join(df, pairs, build_grouped)
            return (
                SparkColNode(col=F.col(f"{prefix}_val"), dtype=None, text="(grouped correlated scalar)"),
                out,
            )
        inner_df, inner_scope, pairs, ranges = self._correlation_split(scope, sub_sel, "scalar", allow_range=True)

        order_keys = [ok for ok in sub_sel.order_by if not isinstance(ok[0], NumberNode)]
        top1 = not is_agg and sub_sel.limit == 1 and sub_sel.order_by and len(order_keys) == len(sub_sel.order_by)
        # LIMIT 1 with no ORDER BY: any row is a valid answer (the limit
        # itself is nondeterministic) — first() without the >1-row error
        limit1_any = not is_agg and sub_sel.limit == 1 and not top1
        count_shape = self._count_shape(expr) if is_agg else "none"

        def agg_exprs(prefix, key_names):
            """Aggregate list for one correlation group; or None when the
            top-1 lowering needs a window (multi-key ORDER BY)."""
            val_col = to_column(expr, inner_scope)
            if is_agg:
                aggs = [val_col.alias(f"{prefix}_val")]
                if count_shape == "composite":
                    # composite count expr (count(*)+1): need a matched
                    # marker so the empty-set value can be substituted
                    aggs.append(F.count(F.lit(1)).alias(f"{prefix}_cnt"))
                return aggs
            if top1 and len(order_keys) == 1:
                # `… ORDER BY y [DESC] LIMIT 1` — the latest/first-value
                # lookup: exactly one row per key by construction, lowered
                # to max_by/min_by (single partial-aggregable pass; ties
                # nondeterministic, same as LIMIT 1 itself)
                okey, direction = sub_sel.order_by[0]
                ocol = to_column(okey, inner_scope)
                fn = F.max_by if direction.upper().startswith("DESC") else F.min_by
                return [fn(val_col, ocol).alias(f"{prefix}_val")]
            if top1:
                return None  # multi-key ORDER BY → windowed top-1
            if limit1_any:
                return [F.first(val_col).alias(f"{prefix}_val")]
            # NON-AGGREGATE inner select (the lookup-join pattern,
            # `(SELECT c_name FROM customer WHERE c_custkey = o_custkey)`):
            # ANSI demands ≤1 inner row PER MATCHED outer row — enforced
            # distributed via a per-key count + raise_error, evaluated only
            # for keys an outer row actually joins (unmatched multi-row
            # keys don't error, per ANSI)
            return [
                F.first(val_col).alias(f"{prefix}_val"),
                F.count(F.lit(1)).alias(f"{prefix}_cnt"),
            ]

        def top1_window_frame(keyed_df, prefix, key_names):
            """Multi-key (possibly mixed-direction) ORDER BY … LIMIT 1:
            row_number over the correlation keys; NULLS LAST both ways for
            parity with the max_by/min_by single-key path (which ignores
            NULL ordering values)."""
            from pyspark.sql.window import Window

            val_col = to_column(expr, inner_scope)
            osel = [to_column(k, inner_scope).alias(f"{prefix}_o{i}") for i, (k, _) in enumerate(sub_sel.order_by)]
            sel = keyed_df.select(*key_names, val_col.alias(f"{prefix}_val"), *osel) if isinstance(key_names[0], str) else None
            ordered = [
                F.col(f"{prefix}_o{i}").desc_nulls_last()
                if d.upper().startswith("DESC")
                else F.col(f"{prefix}_o{i}").asc_nulls_last()
                for i, (_, d) in enumerate(sub_sel.order_by)
            ]
            w = Window.partitionBy(*key_names).orderBy(*ordered)
            rn = f"{prefix}_rn"
            return (
                sel.withColumn(rn, F.row_number().over(w))
                .where(F.col(rn) == 1)
                .select(*key_names, f"{prefix}_val")
            )

        if ranges:
            # NON-EQUALITY correlation (`t.ts <= o.ts`): the per-key
            # pre-aggregate can't serve — lower through a distinct PROBE
            # frame instead (see _decorrelate_scalar_range)
            val, out = self._decorrelate_scalar_range(
                df,
                expr,
                inner_df,
                inner_scope,
                pairs,
                ranges,
                is_agg,
                count_shape,
                agg_exprs,
                top1,
                top1_window_frame,
                limit1_any,
                order_by=sub_sel.order_by,
            )
            from .nodes import SparkColNode as _SCN

            return _SCN(col=val, dtype=None, text="(range-correlated subquery)"), out

        def build(key_cols, prefix):
            key_names = [f"{prefix}_k{i}" for i in range(len(key_cols))]
            aggs = agg_exprs(prefix, key_names)
            if aggs is None:
                # aliased keys + original inner columns so the window frame
                # can resolve both by name and by expression id
                return top1_window_frame(inner_df.select(*key_cols, *inner_df.columns), prefix, key_names)
            return inner_df.groupBy(*key_cols).agg(*aggs)

        out, prefix = self._decorrelate_join(df, pairs, build)
        val = self._scalar_val_expr(
            prefix,
            is_agg,
            count_shape,
            top1,
            limit1_any,
            lambda: self._empty_agg_value(inner_df, to_column(expr, inner_scope)),
        )
        return SparkColNode(col=val, dtype=None, text=f"({sub_sel.sql() if hasattr(sub_sel, 'sql') else 'correlated subquery'})"), out

    # quantified comparison (x <op> ANY/ALL (SELECT …)) lowering ---------
    @staticmethod
    def _quantified_expr(x: SparkColumn, base: str, quant: str, total, n_nn, n_null, mn, mx) -> SparkColumn:
        """ANSI three-valued quantified comparison from the inner column's
        (count, non-null count, null count, min, max) — the min/max rewrite
        every distributed engine uses (a literal per-row probe would be
        O(outer×inner)). Empty set: ALL → TRUE, ANY → FALSE; NULLs in the
        inner set poison only the otherwise-deciding branch (UNKNOWN)."""
        null_b = F.lit(None).cast("boolean")
        if base in ("<", "<=", ">", ">="):
            if quant == "ALL":
                viol = {">": x <= mx, ">=": x < mx, "<": x >= mn, "<=": x > mn}[base]
                return (
                    F.when(total == 0, F.lit(True))
                    .when(x.isNull(), null_b)
                    .when((n_nn > 0) & viol, F.lit(False))
                    .when(n_null > 0, null_b)
                    .otherwise(F.lit(True))
                )
            sat = {">": x > mn, ">=": x >= mn, "<": x < mx, "<=": x <= mx}[base]
            return (
                F.when(total == 0, F.lit(False))
                .when(x.isNull(), null_b)
                .when((n_nn > 0) & sat, F.lit(True))
                .when(n_null > 0, null_b)
                .otherwise(F.lit(False))
            )
        if base == "=" and quant == "ALL":
            viol = (mn != x) | (mx != x)
            return (
                F.when(total == 0, F.lit(True))
                .when(x.isNull(), null_b)
                .when((n_nn > 0) & viol, F.lit(False))
                .when(n_null > 0, null_b)
                .otherwise(F.lit(True))
            )
        if base == "!=" and quant == "ANY":
            sat = (mn != x) | (mx != x)
            return (
                F.when(total == 0, F.lit(False))
                .when(x.isNull(), null_b)
                .when((n_nn > 0) & sat, F.lit(True))
                .when(n_null > 0, null_b)
                .otherwise(F.lit(False))
            )
        raise ExecError(f"unsupported quantified comparison {base} {quant}")  # pragma: no cover

    def _materialize_quantified(self, x: SparkColumn, sub_select, base: str, quant: str) -> Node:
        """UNCORRELATED quantified comparison: one bounded plan-time job
        computes (count, non-null, min, max) of the inner column; the
        comparison folds to a literal-threshold expression."""
        from .nodes import SparkColNode

        key = self._fold_key("quant", sub_select)
        hit = self._fold_cache.get(key) if key else None
        if hit is not None:
            self.plan_cache_stats["fold_hits"] += 1
            total, n_nn, mn, mx = hit
            col = self._quantified_expr(
                x, base, quant, F.lit(total), F.lit(n_nn), F.lit(total - n_nn), F.lit(mn), F.lit(mx)
            )
            return SparkColNode(col=col, dtype=T.BooleanType(), text=f"(x {base} {quant} subquery)")
        sub_df = self._select_any(sub_select)
        if len(sub_df.columns) != 1:
            raise ExecError(f"quantified subquery must return one column, got {len(sub_df.columns)}")
        c = sub_df[sub_df.columns[0]]
        row = sub_df.agg(
            F.count(F.lit(1)).alias("t"), F.count(c).alias("nn"), F.min(c).alias("mn"), F.max(c).alias("mx")
        ).collect()[0]
        total, n_nn = row["t"], row["nn"]
        if key:
            self.plan_cache_stats["fold_misses"] += 1
            self._fold_cache[key] = (total, n_nn, row["mn"], row["mx"])
        col = self._quantified_expr(
            x, base, quant, F.lit(total), F.lit(n_nn), F.lit(total - n_nn), F.lit(row["mn"]), F.lit(row["mx"])
        )
        return SparkColNode(col=col, dtype=T.BooleanType(), text=f"(x {base} {quant} subquery)")

    def _decorrelate_quantified(self, df: DataFrame, scope: Scope, x: SparkColumn, sub_sel, base: str, quant: str):
        """CORRELATED quantified comparison: the per-correlation-key
        (count, non-null, min, max) frame joins on like the scalar case;
        outer rows with no matching key see an empty inner set (left-join
        NULLs → counts coalesced to 0). RANGE correlation aggregates the
        same statistics per distinct PROBE tuple instead (the
        _decorrelate_scalar_range strategy)."""
        from .nodes import SparkColNode

        inner_df, inner_scope, pairs, ranges = self._correlation_split(scope, sub_sel, "quantified", allow_range=True)
        val = to_column(sub_sel.columns[0].expr, inner_scope)

        def stat_aggs(prefix):
            return [
                F.count(F.lit(1)).alias(f"{prefix}_t"),
                F.count(val).alias(f"{prefix}_nn"),
                F.min(val).alias(f"{prefix}_mn"),
                F.max(val).alias(f"{prefix}_mx"),
            ]

        if ranges:
            self._subq_n = getattr(self, "_subq_n", 0) + 1
            p = f"__csub{self._subq_n}"
            probe_specs = [
            (f"{p}_k{i}", oc, ic, "<=>" if i in getattr(pairs, "nullsafe", ()) else "=")
            for i, (ic, oc) in enumerate(pairs)
        ]
            probe_specs += [(f"{p}_r{j}", oc, ic, op) for j, (op, ic, oc) in enumerate(ranges)]
            names = [nm for nm, _, _, _ in probe_specs]
            probes = df.select(*[oc.alias(nm) for nm, oc, _, _ in probe_specs]).distinct()
            cond = None
            for nm, _, ic, op in probe_specs:
                pc = probes[nm]
                c = {"=": ic == pc, "<=>": ic.eqNullSafe(pc), "<": ic < pc, "<=": ic <= pc, ">": ic > pc, ">=": ic >= pc, "!=": ic != pc}[op]
                cond = c if cond is None else cond & c
            stats = probes.join(inner_df, on=cond, how="inner").groupBy(*names).agg(*stat_aggs(p))
            on = None
            for nm, oc, _, _ in probe_specs:
                c = stats[nm].eqNullSafe(oc)
                on = c if on is None else on & c
            out = df.join(stats, on=on, how="left").drop(*names)
        else:

            def build(key_cols, prefix):
                return inner_df.groupBy(*key_cols).agg(*stat_aggs(prefix))

            out, p = self._decorrelate_join(df, pairs, build)
        col = self._quantified_expr(
            x,
            base,
            quant,
            F.coalesce(F.col(f"{p}_t"), F.lit(0)),
            F.coalesce(F.col(f"{p}_nn"), F.lit(0)),
            F.coalesce(F.col(f"{p}_t") - F.col(f"{p}_nn"), F.lit(0)),
            F.col(f"{p}_mn"),
            F.col(f"{p}_mx"),
        )
        return SparkColNode(col=col, dtype=T.BooleanType(), text=f"(x {base} {quant} correlated subquery)"), out

    def _resolve_scalar_subqueries(
        self,
        sel: SqlSelect,
        fields: tuple[str, ...] = ("columns", "where", "having", "qualify"),
        scalar_fn=None,
        quant_fn=None,
    ) -> SqlSelect:
        """Rewrite scalar-subquery positions — ``(SELECT max(x) FROM t)``
        in a comparison / select position, ``EXISTS (SELECT …)`` — through
        ``scalar_fn`` (default: eager uncorrelated materialization via
        ``_materialize_scalar``; correlated errors).

        The eager default is used where a join-based lowering is
        impossible: FROM-less selects (no outer frame to join onto) and
        HAVING/QUALIFY (post-aggregation positions where a joined column
        would not survive the groupBy). Select-list + WHERE positions go
        through ``_rewrite_subqueries``, which passes a ``scalar_fn`` that
        decorrelates. ``IN (SELECT …)`` is NOT handled here — the WHERE
        path lowers it to a semi/anti-join."""
        import dataclasses

        from .nodes import SparkColNode

        def scalar(sub: SubqueryNode) -> Node:
            try:
                return self._materialize_scalar(sub.select)
            except TranslateError as exc:
                raise ExecError(
                    f"correlated scalar subqueries are supported in the select list and WHERE only "
                    f"(this position aggregates before the decorrelating join could apply; inner resolution failed: {exc})"
                ) from exc

        def quant_default(left_node: Node, sub: SubqueryNode, base: str, quant: str) -> Node:
            raise ExecError(
                f"quantified subquery comparison ({base} {quant} (SELECT …)) is supported "
                "in the select list and WHERE only"
            )

        if scalar_fn is None:
            scalar_fn = scalar
        if quant_fn is None:
            quant_fn = quant_default

        def walk(n):
            return self._walk_subqueries(n, scalar_fn, quant_fn, None)

        if not self._has_scalar_subquery(sel, fields):
            return sel
        repl: dict[str, object] = {}
        if "columns" in fields:
            repl["columns"] = [dataclasses.replace(c, expr=walk(c.expr), guard=walk(c.guard)) for c in sel.columns]
        if "where" in fields:
            repl["where"] = walk(sel.where)
        if "having" in fields:
            repl["having"] = walk(sel.having)
        if "qualify" in fields:
            repl["qualify"] = walk(sel.qualify)
        return dataclasses.replace(sel, **repl)

    def _walk_subqueries(self, n: Node | None, scalar_fn, quant_fn, in_fn=None, exists_fn=None) -> Node | None:
        """Bottom-up subquery lowering over one expression tree. ``in_fn``
        of None PRESERVES ``IN (SELECT)`` nodes (the WHERE semi-join path
        claims them); a callable lowers them to a membership column.
        ``exists_fn`` likewise: None preserves correlated EXISTS for the
        semi-join; a callable lowers it to a boolean mark column
        (select-list / disjunctive positions)."""
        import dataclasses

        from .nodes import ArrayNode, SparkColNode, TriNode

        def walk(node: Node | None) -> Node | None:
            return self._walk_subqueries(node, scalar_fn, quant_fn, in_fn, exists_fn)

        if n is None:
            return None
        if isinstance(n, SubqueryNode):
            return scalar_fn(n)
        if isinstance(n, UnaryNode):
            if n.op == "EXISTS" and isinstance(n.child, SubqueryNode):
                try:
                    inner = self._select_any(n.child.select)
                except TranslateError:
                    # inner references outer columns → CORRELATED; mark
                    # column when the position allows it, else left intact
                    # for _apply_where's semi-join rewrite
                    return n if exists_fn is None else exists_fn(n.child)
                return SparkColNode(col=F.lit(inner.limit(1).count() > 0), dtype=None, text="EXISTS(...)")
            return UnaryNode(n.op, walk(n.child))
        if isinstance(n, BinaryNode):
            if n.op == "IN" and isinstance(n.right, SubqueryNode):
                if in_fn is None:
                    return BinaryNode(n.op, walk(n.left), n.right, n.negated)  # semi-join path
                return in_fn(walk(n.left), n.right, n.negated)
            if (n.op.endswith(" ANY") or n.op.endswith(" ALL")) and isinstance(n.right, SubqueryNode):
                base, _, quant = n.op.partition(" ")
                # = ANY ≡ IN and != ALL ≡ NOT IN — membership tests the
                # min/max rewrite can't express; route to the semi/anti
                # join path (NOT IN's anti-join shortcut documented)
                if base == "=" and quant == "ANY":
                    inner = BinaryNode("IN", walk(n.left), n.right, n.negated)
                    return inner if in_fn is None else in_fn(inner.left, n.right, n.negated)
                if base == "!=" and quant == "ALL":
                    inner = BinaryNode("IN", walk(n.left), n.right, not n.negated)
                    return inner if in_fn is None else in_fn(inner.left, n.right, not n.negated)
                return quant_fn(walk(n.left), n.right, base, quant)
            return BinaryNode(n.op, walk(n.left), walk(n.right), n.negated)
        if isinstance(n, BooleanNode):
            return BooleanNode(n.op, [walk(a) for a in n.args], n.negated)
        if isinstance(n, FuncNode):
            return dataclasses.replace(n, args=[walk(a) for a in n.args])
        if isinstance(n, WindowNode):
            return dataclasses.replace(
                n,
                func=dataclasses.replace(n.func, args=[walk(a) for a in n.func.args]),
                partition_by=[walk(e) for e in n.partition_by],
                order_by=[(walk(e), d) for e, d in n.order_by],
            )
        if isinstance(n, TriNode):
            return dataclasses.replace(n, args=[walk(a) for a in n.args])
        if isinstance(n, ArrayNode):
            return dataclasses.replace(n, items=[walk(i) for i in n.items])
        return n

    @staticmethod
    def _has_scalar_subquery(
        sel: SqlSelect,
        fields: tuple[str, ...] = ("columns", "where", "having", "qualify"),
        include_in: bool = False,
    ) -> bool:
        """``include_in`` also counts ``IN (SELECT …)`` nodes — used by
        `_rewrite_subqueries`, whose walk lowers select-list/disjunctive
        INs (top-level WHERE conjunct INs stay with the semi-join path)."""

        def scan(n: Node | None) -> bool:
            if n is None:
                return False
            if isinstance(n, SubqueryNode):
                return True
            if isinstance(n, BinaryNode) and n.op == "IN" and isinstance(n.right, SubqueryNode):
                return include_in or scan(n.left)
            return any(scan(c) for c in n.children())

        hit = False
        if "columns" in fields:
            hit = any(scan(c.expr) or scan(c.guard) for c in sel.columns)
        if "where" in fields:
            hit = hit or scan(sel.where)
        if "having" in fields:
            hit = hit or scan(sel.having)
        if "qualify" in fields:
            hit = hit or scan(sel.qualify)
        return hit

    @staticmethod
    def _resolve_named_windows(sel: SqlSelect) -> SqlSelect:
        """Resolve ``OVER w`` references against the select's ``WINDOW w AS
        (...)`` specs, returning a rewritten copy (the parsed statement may
        be shared, e.g. stored in a view)."""
        import dataclasses

        def lookup(name: str, seen: tuple = ()) -> WindowNode:
            spec = sel.windows.get(name)
            if spec is None:
                raise ExecError(f"unknown window name {name!r} (no WINDOW {name} AS (...))")
            if spec.ref is not None:
                # WINDOW w2 AS (w [frame]) — chained named-window extension
                if name in seen:
                    raise ExecError(f"window definition cycle through {name!r}")
                base = lookup(spec.ref, seen + (name,))
                spec = dataclasses.replace(base, frame=spec.frame if spec.frame is not None else base.frame, ref=None)
            return spec

        def resolve(n: Node) -> Node:
            if isinstance(n, WindowNode) and n.ref is not None:
                spec = lookup(n.ref)
                # OVER (w ROWS BETWEEN ...): the use-site frame wins
                frame = n.frame if n.frame is not None else spec.frame
                return dataclasses.replace(spec, func=n.func, frame=frame, ref=None)
            return n

        def rw(node):
            return transform(node, resolve) if node is not None else None

        return dataclasses.replace(
            sel,
            columns=[dataclasses.replace(c, expr=rw(c.expr)) for c in sel.columns],
            where=rw(sel.where),
            having=rw(sel.having),
            qualify=rw(sel.qualify),
            order_by=[(rw(e), d) for e, d in sel.order_by],
            windows={},
        )

    @staticmethod
    def _substitute_select_aliases(node: Node, sel: SqlSelect) -> Node:
        """QUALIFY sees select-list aliases (ANSI): replace single-part
        identifiers naming an alias with the aliased expression. The
        substituted expr is inserted as-is (no re-walk), so an alias
        shadowing a base column (``amt*2 AS amt``) cannot recurse."""
        amap = {c.alias: c.expr for c in sel.columns if not c.is_star and c.alias}

        def fn(n: Node) -> Node:
            if isinstance(n, IdentityNode) and len(n.parts) == 1 and n.name in amap:
                return amap[n.name]
            return n

        return transform(node, fn)

    _hav_counter = 0

    def _rewrite_having(self, node: Node, scope: Scope):
        """Replace maximal group-agg subtrees with hidden column refs so
        HAVING / QUALIFY can be evaluated against the aggregated frame.

        A WindowNode's own function is NOT extracted even when it is an
        aggregate name (``sum(x) OVER (...)`` windows over the result
        rows); agg subtrees in its ARGUMENTS / PARTITION BY / ORDER BY are
        (``rank() OVER (ORDER BY sum(x))`` ranks groups by their sum)."""
        import dataclasses

        hidden: list[SparkColumn] = []

        def walk(n: Node) -> Node:
            if isinstance(n, WindowNode):
                return dataclasses.replace(
                    n,
                    func=dataclasses.replace(n.func, args=[walk(a) for a in n.func.args]),
                    partition_by=[walk(e) for e in n.partition_by],
                    order_by=[(walk(e), d) for e, d in n.order_by],
                )
            if isinstance(n, FuncNode):
                if funcs.is_agg_func(n.name):
                    Engine._hav_counter += 1
                    name = f"__hav_{Engine._hav_counter}"
                    hidden.append(to_column(n, scope).alias(name))
                    return IdentityNode((name,))
                return dataclasses.replace(n, args=[walk(a) for a in n.args])
            if isinstance(n, BinaryNode):
                return BinaryNode(n.op, walk(n.left), walk(n.right), n.negated)
            if isinstance(n, UnaryNode):
                return UnaryNode(n.op, walk(n.child))
            if isinstance(n, BooleanNode):
                return BooleanNode(n.op, [walk(a) for a in n.args], n.negated)
            return n

        return walk(node), hidden

    # -- projection ----------------------------------------------------------
    def _projection(self, sel: SqlSelect, scope: Scope) -> tuple[list[SparkColumn], list[str]]:
        proj: list[SparkColumn] = []
        names: list[str] = []
        for c in sel.columns:
            if c.is_star:
                excl = {x.lower() for x in getattr(c, "exclude", ())}
                repl = getattr(c, "replace", None) or {}
                if len(c.expr.parts) > 1:  # t.* — one source's columns
                    tref = c.expr.parts[0]
                    frame = scope.frames.get(tref)
                    if frame is None:
                        raise ExecError(f"unknown alias {tref}.*")
                    expand = [(fc, IdentityNode((tref, fc))) for fc in frame.columns]
                else:
                    expand = [(fc, IdentityNode((fc,))) for fc in scope.columns()]
                for fc, ident in expand:
                    if fc.lower() in excl:  # * EXCLUDE (…) — DuckDB superset
                        continue
                    rep = repl.get(fc.lower())
                    if rep is not None:  # * REPLACE (expr AS col) keeps position
                        proj.append(to_column(rep, scope).alias(fc))
                    else:
                        # scope.col routes lateral (UNNEST) outputs to
                        # their physical unqualified columns
                        proj.append(scope.col(ident).alias(fc))
                    names.append(fc)
                continue
            col = to_column(c.expr, scope)
            if c.guard is not None:
                # `col IF guard` → NULL when guard fails (divergence noted in
                # SURVEY §7.4: reference drops the field entirely)
                col = F.when(to_column(c.guard, scope), col)
            proj.append(col.alias(c.output_name))
            names.append(c.output_name)
        return proj, names

    def _order_col(self, e: Node, scope: Scope, out_names: list[str]) -> SparkColumn:
        if isinstance(e, IdentityNode) and e.name in out_names:
            pass  # fall through — still translatable from base scope if column exists
        if isinstance(e, NumberNode):  # ORDER BY 2 → positional
            return F.col(out_names[int(e.text) - 1])
        return to_column(e, scope)

    @staticmethod
    def _directional(col: SparkColumn, direction: str):
        """ASC/DESC with optional ANSI NULLS FIRST/LAST. Spark's defaults
        (ASC→NULLS FIRST, DESC→NULLS LAST) apply when unspecified."""
        words = direction.upper().split()
        desc = bool(words) and words[0] == "DESC"
        nulls = words[-1] if "NULLS" in words else None
        if nulls == "FIRST":
            return [col.desc_nulls_first() if desc else col.asc_nulls_first()]
        if nulls == "LAST":
            return [col.desc_nulls_last() if desc else col.asc_nulls_last()]
        return [col.desc() if desc else col.asc()]

    def _order_limit(self, df: DataFrame, scope: Scope, sel: SqlSelect, post_agg: bool) -> DataFrame:
        if sel.distinct:
            df = df.distinct()
        order_pairs = sel.order_by
        if getattr(sel, "order_all", None) and not order_pairs:
            order_pairs = [(IdentityNode((n,)), sel.order_all) for n in df.columns]
        if order_pairs:
            cols = []
            for e, direction in order_pairs:
                if isinstance(e, NumberNode):
                    c = F.col(df.columns[int(e.text) - 1])
                else:
                    out_scope = Scope({"_": df}, includes=self.includes, params=self._scope_params())
                    try:
                        c = to_column(e, out_scope)
                    except TranslateError:
                        # qualified group key (`ORDER BY t.k` after GROUP BY
                        # t.k): post-agg only the bare output name survives
                        if isinstance(e, IdentityNode) and len(e.parts) > 1:
                            c = to_column(IdentityNode((e.parts[-1],)), out_scope)
                        else:
                            raise
                cols.extend(self._directional(c, direction))
            df = df.orderBy(*cols)
        if sel.offset:
            df = df.offset(sel.offset)
        if sel.limit is not None:
            df = df.limit(sel.limit)
        if sel.into:
            self.register_df(sel.into, df)
        return df

    def _literal_select(self, sel: SqlSelect) -> DataFrame:
        """``SELECT 1, "hello"`` — no FROM (plan/planner_select.go:267-286)."""
        scope = Scope({}, includes=self.includes, params=self._scope_params())
        cols = []
        for i, c in enumerate(sel.columns):
            cols.append(to_column(c.expr, scope).alias(c.alias or c.expr.sql().strip("'")))
        df = self.spark.range(1).select(*cols)
        if sel.where is not None:
            df = df.filter(to_column(sel.where, Scope({"_": df}, includes=self.includes)))
        if sel.limit is not None:
            df = df.limit(sel.limit)
        return df

    # ------------------------------------------------------------------
    # FilterQL
    # ------------------------------------------------------------------
    def _filterql(self, stmt: FilterStatement) -> DataFrame:
        if not stmt.from_:
            raise ExecError("FILTER without FROM requires engine.filter(df, ...)")
        planner_src = self.planner_sources.get(stmt.from_.lower())
        if planner_src is not None and hasattr(planner_src, "walk_source_filter"):
            out = planner_src.walk_source_filter(self, stmt)
            if out is not None:
                # same safety contract as the SELECT path (planner.py): the
                # source may have applied any SUBSET of the filter, so the
                # engine re-applies it (idempotent); LIMIT re-applied after
                scope = Scope({"_": out}, includes=self.includes, strict=False)
                out = out.filter(to_column(stmt.filter, scope))
                if stmt.limit:
                    out = out.limit(stmt.limit)
                if stmt.alias:
                    self.includes[stmt.alias.lower()] = stmt.filter
                return out
        df = self.table(stmt.from_)
        scope = Scope({stmt.from_: df}, includes=self.includes, strict=False)
        out = df.filter(to_column(stmt.filter, scope))
        if stmt.limit:
            out = out.limit(stmt.limit)
        if stmt.alias:
            self.includes[stmt.alias.lower()] = stmt.filter
        return out

    def matches(self, context: dict, filterql_text: str) -> bool:
        """Single-record FilterQL match ≈ vm.Matches (vm/filterqlvm.go:81)."""
        stmt = parse_filterql(filterql_text)
        df = self.spark.createDataFrame([context])
        scope = Scope({"_": df}, includes=self.includes, strict=False)
        return df.filter(to_column(stmt.filter, scope)).count() > 0

    # ------------------------------------------------------------------
    # SHOW / DESCRIBE (plan/sql_rewrite.go:49-240 — we synthesize directly)
    # ------------------------------------------------------------------
    def _show(self, s: SqlShow) -> DataFrame:
        if s.show in ("TABLES",):
            names = sorted(set(self.tables) | set(self.planner_sources))
            if s.full:
                # SHOW FULL TABLES → name + table_type (plan/sql_rewrite.go:66)
                rows = [{"Table": t, "Table_type": "VIEW" if t in self.views else "BASE TABLE"} for t in names]
                schema = "Table string, Table_type string"
            else:
                rows = [{"Table": t} for t in names]
                schema = "Table string"
            df = self.spark.createDataFrame(rows, schema=schema) if rows else self.spark.createDataFrame([], schema)
        elif s.show == "DATABASES":
            df = self.spark.createDataFrame([{"Database": self.name}])
        elif s.show in ("COLUMNS", "FIELDS"):
            df = self._schema_df(s.ident)
        elif s.show == "VARIABLES":
            rows = [{"Variable_name": k, "Value": str(v)} for k, v in sorted(self.session_vars.items())]
            schema = "Variable_name string, Value string"
            df = self.spark.createDataFrame(rows, schema=schema) if rows else self.spark.createDataFrame([], schema)
        elif s.show == "STATUS":
            # MySQL-compat SHOW STATUS (plan/sql_rewrite.go:157): empty set,
            # schema-correct — no server counters in a library engine
            df = self.spark.createDataFrame([], "Variable_name string, Value string")
        elif s.show == "INDEX":
            # SHOW INDEX FROM t — 12-column MySQL shape (schema.ShowIndexCols,
            # schema/schema.go:37; schemadb.go:360-374 returns no rows too)
            self.table(s.ident)  # raises on unknown table
            schema = (
                "Table string, Non_unique long, Key_name string, Seq_in_index long, "
                "Column_name string, Collation string, Cardinality long, Sub_part string, "
                "Packed string, Null string, Index_type string, Index_comment string"
            )
            df = self.spark.createDataFrame([], schema)
        elif s.show == "CREATE":
            t = self.table(s.ident)
            ddl = f"CREATE TABLE `{s.ident}` (" + ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in t.schema.fields) + ")"
            df = self.spark.createDataFrame([{"Table": s.ident, "Create Table": ddl}])
        else:
            raise ExecError(f"SHOW {s.show} not supported")
        if s.like:
            first = df.columns[0]
            from .translate import glob_to_regex

            df = df.filter(F.col(first).rlike(glob_to_regex(s.like.replace("%", "*"))))
        if s.where is not None:
            df = df.filter(to_column(s.where, Scope({"_": df}, includes=self.includes)))
        return df

    def _schema_df(self, table: str) -> DataFrame:
        t = self.table(table)
        rows = [
            {"Field": f.name, "Type": f.dataType.simpleString(), "Null": "YES" if f.nullable else "NO", "Key": "", "Default": None, "Extra": ""}
            for f in t.schema.fields
        ]
        return self.spark.createDataFrame(rows, schema="Field string, Type string, Null string, Key string, Default string, Extra string")

    def _describe(self, d: SqlDescribe) -> DataFrame:
        if d.stmt is not None and d.analyze:  # EXPLAIN ANALYZE <select>
            before = dict(self.plan_cache_stats)
            report = self._analyze_plan(self.execute_stmt(d.stmt), stats_before=before)
            return self.spark.createDataFrame(
                [{"plan": line} for line in report.split("\n")], schema="plan string"
            )
        if d.stmt is not None:  # EXPLAIN <select>
            df = self.execute_stmt(d.stmt)
            plan = df._jdf.queryExecution().explainString(self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            return self.spark.createDataFrame([{"plan": line} for line in plan.split("\n")], schema="plan string")
        ident = d.ident or ""
        if ident.lower().startswith("detail "):
            # DESCRIBE DETAIL <sink table> — current-snapshot physical
            # facts (Delta-parity; pairs with OPTIMIZE: check numFiles /
            # sizeInBytes before and after a compaction)
            tname = ident.split(None, 1)[1].strip().lower()
            sink = self.sinks.get(tname)
            if sink is None or not hasattr(sink, "versions"):
                raise ExecError(f"DESCRIBE DETAIL requires a versioned sink table; {tname!r} is not one")
            v = max(sink.versions())
            num_files = size_bytes = None
            if hasattr(sink, "_snapshot_stats"):
                num_files, size_bytes = sink._snapshot_stats(v)
            ts = sink.commit_time(v).replace(tzinfo=None) if hasattr(sink, "commit_time") else None
            return self.spark.createDataFrame(
                [
                    {
                        "name": tname,
                        "format": type(sink).__name__,
                        "location": getattr(sink, "path", None),
                        "key": getattr(sink, "key", None),
                        "version": v,
                        "num_files": num_files,
                        "size_bytes": size_bytes,
                        "committed_at": ts,
                        "retained_versions": len(sink.versions()),
                        "partition_by": ",".join(getattr(sink, "partition_by", []) or []),
                        "cluster_by": ",".join(getattr(sink, "cluster_by", []) or []),
                    }
                ],
                schema=(
                    "name string, format string, location string, key string, "
                    "version long, num_files long, size_bytes long, "
                    "committed_at timestamp, retained_versions long, "
                    "partition_by string, cluster_by string"
                ),
            )
        if ident.lower().startswith("history "):
            # DESCRIBE HISTORY <sink table> — retained snapshot versions of
            # a versioned sink (Delta-parity; pairs with VERSION AS OF)
            tname = ident.split(None, 1)[1].strip().lower()
            sink = self.sinks.get(tname)
            if sink is None or not hasattr(sink, "versions"):
                raise ExecError(f"DESCRIBE HISTORY requires a versioned sink table; {tname!r} is not one")
            import datetime
            import os

            has_ct = hasattr(sink, "commit_time")
            if not has_ct and not hasattr(sink, "_data_dir"):
                raise ExecError(
                    f"DESCRIBE HISTORY: sink for {tname!r} exposes versions() but "
                    "neither commit_time() (durable timestamps) nor _data_dir() "
                    "(mtime fallback)"
                )
            has_info = hasattr(sink, "commit_info")
            rows = []
            for v in sink.versions():
                if has_ct:
                    # durable sidecar timestamp (survives warehouse copies)
                    ts = sink.commit_time(v)
                else:  # duck-typed pre-round-9 sink: best-effort mtimes
                    ts = datetime.datetime.fromtimestamp(
                        os.path.getmtime(sink._data_dir(v)), datetime.timezone.utc
                    )
                info = (sink.commit_info(v) or {}) if has_info else {}
                rows.append(
                    {
                        "version": v,
                        "operation": info.get("op"),  # NULL for legacy versions
                        "mode": info.get("mode"),
                        "committed_at": ts.replace(tzinfo=None),
                        "is_current": v == sink._version(),
                    }
                )
            return self.spark.createDataFrame(
                rows,
                schema="version long, operation string, mode string, "
                "committed_at timestamp, is_current boolean",
            )
        return self._schema_df(d.ident)

    # ------------------------------------------------------------------
    # DML — in-memory/registered tables (≈ exec/mutations.go over membtree)
    # at 100 TB scale the same statements route to Delta-style sinks; here
    # the registry swap keeps DataFrame lineage (no collect of data rows)
    # ------------------------------------------------------------------
    def _insert(self, ins: SqlInsert) -> int:
        base = self.table(ins.table)
        # ANSI: no column list = positional against the table's columns
        # (INSERT INTO t VALUES (...) / INSERT INTO t SELECT ...)
        cols_target = ins.columns or list(base.columns)
        if ins.select is not None:
            sel_df = self._select_any(ins.select)
            if len(sel_df.columns) != len(cols_target):
                raise ExecError(
                    f"INSERT INTO {ins.table}: SELECT produces "
                    f"{len(sel_df.columns)} columns, target expects "
                    f"{len(cols_target)} ({', '.join(cols_target)})"
                )
            new = sel_df.toDF(*cols_target)
        else:
            # VALUES may contain expressions — uuid(), now(), todate(...)
            # (exec/exec_test.go INSERT/UPSERT cases) — translate each row
            # as a 1-row projection and union
            scope = Scope({}, includes=self.includes, params=self._scope_params())
            row_dfs = []
            for r in ins.rows:
                if len(r) != len(cols_target):
                    raise ExecError(
                        f"INSERT INTO {ins.table}: VALUES row has {len(r)} "
                        f"values, expected {len(cols_target)} "
                        f"({', '.join(cols_target)})"
                    )
                cols = [to_column(node, scope).alias(cname) for cname, node in zip(cols_target, r)]
                row_dfs.append(self.spark.range(1).select(*cols))
            new = row_dfs[0]
            for d in row_dfs[1:]:
                new = new.unionByName(d)
            for f in base.schema.fields:
                if f.name in new.columns:
                    new = new.withColumn(f.name, F.col(f.name).cast(f.dataType))
        n = new.count()
        # upsert key: the table's DECLARED key when registered
        # (datasource/key.go KeyCol); fallback = first insert column
        key = self.table_keys.get(ins.table.lower()) or cols_target[0]
        sink = self.sinks.get(ins.table.lower())
        if sink is not None:
            # cluster write path: append / MERGE INTO on the sink table
            if ins.upsert:
                sink.merge_upsert(new, key)
            else:
                sink.insert_append(new)
            self._maybe_auto_compact(sink)
            self._maybe_auto_refresh(ins.table)
            return n
        merged = base.unionByName(new, allowMissingColumns=True)
        if ins.upsert:
            old_only = base.join(new.select(key), on=key, how="left_anti")
            merged = old_only.unionByName(new, allowMissingColumns=True)
        self.register_df(ins.table, merged)
        return n

    def _maybe_auto_compact(self, sink) -> None:
        """Delta-``autoCompact``-parity: after a DML commit, when
        ``SET optimize.auto_compact = true`` and the new snapshot holds
        at least ``optimize.auto_compact_min_files`` (default 16) files
        under ``optimize.target_file_mb``, run the INCREMENTAL
        compaction (rewrite only the small files, hardlink the rest) as
        a follow-up layout-only commit. Streaming CDC appends/merges
        fragment a table one tiny file per batch; this keeps the file
        count bounded without an operator remembering to OPTIMIZE.
        Driver-side size check only; losing a commit race just defers
        compaction to the next statement."""
        # normalize the flag: SET arrives as whatever the statement's
        # literal evaluated to (bool, int, or string) — only explicit
        # true-ish spellings enable; 'false'/'off'/'0' must DISABLE
        # (raw truthiness would treat any non-empty string as enabled)
        flag = self.session_vars.get("optimize.auto_compact")
        if isinstance(flag, str):
            flag = flag.strip().lower() in ("true", "1", "on", "yes")
        if not flag:
            return
        if not (hasattr(sink, "optimize") and hasattr(sink, "_data_rels")):
            return
        import os

        from .sinks import ConcurrentWriteError

        target_mb = float(self.session_vars.get("optimize.target_file_mb", 128))
        min_files = int(self.session_vars.get("optimize.auto_compact_min_files", 16))
        cur = sink._version()
        if cur < 0:
            return
        vdir = sink._data_dir(cur)
        rels = sink._data_rels(cur)
        # hive-partitioned sinks: scope to the partitions the triggering
        # DML actually touched. A COW commit hardlinks unchanged files
        # under their SAME relative paths, so this commit's fresh files
        # are exactly rels(cur) − rels(cur−1); their partition dirs are
        # the touched set. Steady-state CDC into one hot partition then
        # never re-reads (or recompacts) cold partitions' small-file
        # survivors — at 100 TB the candidate set is O(hot partition),
        # not O(table).
        scope_dirs = None
        if getattr(sink, "partition_by", None):
            prev = set(sink._data_rels(cur - 1)) if cur > 0 else set()
            touched = {os.path.dirname(r) for r in rels if r not in prev}
            if not touched:
                return  # layout-only / no-op commit: nothing new to compact
            scope_dirs = sorted(touched)
            rels = [r for r in rels if os.path.dirname(r) in touched]
        thresh = int(target_mb * (1 << 20))
        small = 0
        for r in rels:
            try:
                if os.path.getsize(os.path.join(vdir, r)) < thresh:
                    small += 1
            except OSError:
                return  # concurrent vacuum/commit mid-listing: skip this round
            if small >= min_files:
                break
        if small < min_files:
            return
        try:
            sink.optimize(target_file_mb=target_mb, scope_dirs=scope_dirs)
        except ConcurrentWriteError:
            pass  # another writer committed first — next DML re-checks

    def _dml_conjuncts(self, table: str, where) -> list:
        """Pushable WHERE conjuncts of a single-table DML statement, for
        the sink's file-pruned (copy-on-write) rewrite path. Best-effort:
        an unextractable predicate just means a full rewrite."""
        if where is None:
            return []
        try:
            from .skipping import extract_conjuncts

            return extract_conjuncts(where, {table.lower()}, allow_bare=True)
        except Exception:
            return []

    def _update(self, upd: SqlUpdate) -> int:
        df = self.table(upd.table)
        scope = Scope({upd.table: df}, includes=self.includes)
        mask = to_column(upd.where, scope) if upd.where is not None else F.lit(True)
        sink = self.sinks.get(upd.table.lower())
        assignments: dict[str, SparkColumn] = {}
        for cname, node in upd.values.items():
            newv = to_column(node, scope)
            fld = next((f for f in df.schema.fields if f.name.lower() == cname.lower()), None)
            if fld is not None:
                newv = newv.cast(fld.dataType)
                cname = fld.name
            assignments[cname] = newv
        if sink is not None:
            # ConnPatchWhere.PatchWhere parity: predicate + assignments
            # pushed into the table format (transactional UPDATE WHERE).
            # COW-capable sinks also get the pushable WHERE conjuncts so
            # they rewrite only the files whose stats could match and
            # hardlink the rest (O(changed files), not O(table)) — and
            # they measure the affected count ON the rewrite job
            # (df.observe), so no separate count scan runs per statement
            if hasattr(sink, "_cow_split"):
                r = sink.update_where(
                    mask, assignments, conjuncts=self._dml_conjuncts(upd.table, upd.where)
                )
                self._maybe_auto_compact(sink)
                self._maybe_auto_refresh(upd.table)
                return int(r) if r is not None else df.filter(mask).count()
            n = df.filter(mask).count()
            sink.update_where(mask, assignments)
            return n
        n = df.filter(mask).count()
        for cname, newv in assignments.items():
            df = df.withColumn(cname, F.when(mask, newv).otherwise(F.col(cname)))
        self.register_df(upd.table, df)
        return n

    def _delete(self, d: SqlDelete) -> int:
        df = self.table(d.table)
        scope = Scope({d.table: df}, includes=self.includes)
        sink = self.sinks.get(d.table.lower())
        if d.where is None:
            if sink is not None:
                if hasattr(sink, "_cow_split"):
                    r = sink.delete_where(None)
                    if r is not None:
                        return int(r)
                    return df.count()
                # non-counting sinks (e.g. Delta) mutate in place: count
                # BEFORE the delete, or the lazy frame would read 0
                n = df.count()
                sink.delete_where(None)
                return n
            n = df.count()
            self.register_df(d.table, df.limit(0))
            return n
        mask = to_column(d.where, scope)
        if sink is not None:
            # ConnDeletion.DeleteExpression parity: predicate pushed down.
            # COW sinks measure the deleted count ON the rewrite job
            # (df.observe) — no separate count scan per statement
            if hasattr(sink, "_cow_split"):
                r = sink.delete_where(mask, conjuncts=self._dml_conjuncts(d.table, d.where))
                self._maybe_auto_compact(sink)
                self._maybe_auto_refresh(d.table)
                return int(r) if r is not None else df.filter(mask).count()
            n = df.filter(mask).count()
            sink.delete_where(mask)
            return n
        n = df.filter(mask).count()
        self.register_df(d.table, df.filter(~mask | mask.isNull()))
        return n

    # ------------------------------------------------------------------
    # DDL (exec/ddl.go:54-134)
    # ------------------------------------------------------------------
    def _create(self, c: SqlCreate):
        tok = c.tok
        if tok in ("SOURCE", "SCHEMA"):
            from .sources import load_source

            if not c.with_:
                raise ExecError(f"CREATE {tok} requires WITH {{json}}")
            typ = (c.with_.get("type") or c.with_.get("format") or "").lower()
            if typ == "sqlite" and "query" not in c.with_:
                # sqlite registers as a *plannable* source: sub-selects are
                # compiled to native SQLite SQL (SourcePlanner parity,
                # plan/plan.go:116-123 + datasource/sqlite/source.go:20-49)
                from .sources import SqliteSource

                dbf = c.with_.get("file") or c.with_.get("path")
                self.register_source(c.ident, SqliteSource(dbf, c.with_.get("dbtable") or c.with_.get("table", "t")))
                return None
            dfs = load_source(self.spark, c.with_)
            for tname, df in dfs.items():
                self.register_df(tname if len(dfs) > 1 else c.ident, df)
            return None
        if tok == "VIEW":
            if c.select is None:
                raise ExecError("CREATE VIEW requires AS SELECT")
            self.views[c.ident.lower()] = c.select
            return None
        if tok == "MATERIALIZED VIEW":
            return self._create_matview(c)
        if tok == "CONTINUOUSVIEW":
            from .streaming import create_continuous_view

            return create_continuous_view(self, c)
        if tok == "TABLE":
            # WITH {"path": ...} creates a DURABLE versioned parquet sink
            # (optionally hive-partitioned) instead of an in-memory frame:
            #   CREATE TABLE t AS SELECT ...
            #     WITH {"path": "/w/t", "key": "id", "partition_by": ["dt"]}
            with_cfg = dict(getattr(c.select, "with_", None) or {})
            with_cfg.update(c.with_ or {})
            path = with_cfg.get("path")
            if path:
                from .sinks import ParquetMergeSink

                part = with_cfg.get("partition_by") or []
                if isinstance(part, str):
                    part = [part]
                clus = with_cfg.get("cluster_by") or []
                if isinstance(clus, str):
                    clus = [clus]
                if c.select is not None:
                    df = self._select_any(c.select)
                else:
                    fields = [T.StructField(n, _ddl_type(ty), True) for n, ty in c.cols]
                    df = self.spark.createDataFrame([], T.StructType(fields))
                for kind, cols_ in (("partition_by", part), ("cluster_by", clus)):
                    bad = [p for p in cols_ if p not in df.columns]
                    if bad:
                        raise ExecError(
                            f"CREATE TABLE {c.ident}: {kind} columns {bad} "
                            f"not in the table's columns {df.columns}"
                        )
                key = with_cfg.get("key") or (df.columns[0] if df.columns else "id")
                try:
                    sink = ParquetMergeSink(
                        self.spark,
                        str(path),
                        key=str(key),
                        partition_by=[str(p) for p in part],
                        cluster_by=[str(p) for p in clus],
                    )
                except ValueError as e:  # reopen with conflicting layout spec
                    raise ExecError(str(e)) from None
                existed = sink._version() >= 0
                if existed and c.if_not_exists:
                    pass  # keep the existing table state
                elif existed and not c.or_replace:
                    raise ExecError(
                        f"CREATE TABLE {c.ident}: {path} already holds a table "
                        "(use OR REPLACE or IF NOT EXISTS)"
                    )
                elif existed:  # OR REPLACE: new snapshot, history preserved
                    sink.overwrite(df)
                else:
                    sink.ensure(df)
                self.register_sink(c.ident, sink)
                return None
            if c.select is not None:  # CTAS
                self.register_df(c.ident, self._select_any(c.select))
                return None
            fields = [T.StructField(n, _ddl_type(ty), True) for n, ty in c.cols]
            self.register_df(c.ident, self.spark.createDataFrame([], T.StructType(fields)))
            return None
        raise ExecError(f"CREATE {tok} not supported")

    def _drop(self, d: SqlDrop):
        key = d.ident.lower()
        if d.tok == "MATERIALIZED VIEW" and key not in self.mat_views:
            if d.if_exists:
                return None
            raise ExecError(f"cannot drop unknown materialized view {d.ident}")
        if key in self.tables:
            del self.tables[key]
            self.mat_views.pop(key, None)  # dropping an MV's frame drops its metadata
        elif key in self.views:
            del self.views[key]
        elif key in self.planner_sources:
            del self.planner_sources[key]
        elif not d.if_exists:
            raise ExecError(f"cannot drop unknown {d.ident}")
        return None

    def _create_matview(self, c: SqlCreate):
        """CREATE MATERIALIZED VIEW — materialize the query and, when it
        fits the signed-delta algebra over a versioned-sink base
        (matview.analyze), store it in incremental STATE form so REFRESH
        consumes only the change feed. ``WITH {"path": "..."}`` persists
        the state in a ParquetMergeSink (durable + versioned) instead of
        a localCheckpoint."""
        from .matview import MatView, analyze, exposed_frame, persist_state, state_frame

        if c.select is None:
            raise ExecError("CREATE MATERIALIZED VIEW requires AS SELECT")
        lname = c.ident.lower()
        if c.if_not_exists and lname in self.mat_views:
            return None
        mv = analyze(self, c.select) if isinstance(c.select, SqlSelect) else None
        if mv is None:
            mv = MatView(name=lname, select=c.select)
        mv.name = lname
        # the trailing WITH {...} config map parses onto the SELECT itself
        # (reference grammar); accept it from either position
        with_cfg = dict(getattr(c.select, "with_", None) or {})
        with_cfg.update(c.with_ or {})
        path = with_cfg.get("path")
        if path:
            from .sinks import ParquetMergeSink

            mv.state_sink = ParquetMergeSink(
                self.spark, str(path), key=mv.key_cols[0] if mv.key_cols else "__mv_n"
            )
            if mv.incremental and mv.has_distinct:
                # durable substates: one sibling sink per DISTINCT agg
                mv.sub_sinks = [
                    ParquetMergeSink(
                        self.spark, f"{path}__d{a.d_idx}", key="__mv_dv"
                    )
                    for a in mv.aggs
                    if a.d_idx is not None
                ]
        if mv.incremental:
            from .matview import persist_substates, sub_state_frames

            sink = self.sinks[mv.base]
            mv.base_version = max(sink.versions())
            if mv.dim:
                mv.dim_version = max(self.sinks[mv.dim].versions())
            # exposed dtypes from the ORIGINAL query's analyzed schema
            # (analysis only — no job): incremental refreshes cast back to
            # these, so the view stays schema-identical to a recompute
            mv.exposed_types = {
                f.name: f.dataType for f in self._select_any(c.select).schema.fields
            }
            base_df = sink.scan(self.spark, version=mv.base_version)
            # the delete-repair flag is delta-only state; never persisted
            mv.internal = persist_state(
                mv, state_frame(self, mv, base_df, F.lit(1), weight_mode="one").drop("__mv_neg")
            )
            if mv.has_distinct:
                mv.substates = persist_substates(
                    mv, sub_state_frames(self, mv, base_df, F.lit(1), weight_mode="one")
                )
        else:
            mv.internal = persist_state(mv, self._select_any(c.select))
        self.mat_views[lname] = mv
        self.register_df(lname, exposed_frame(mv))
        return None

    _REFRESH_REPORT_SCHEMA = "view string, mode string, from_version long, to_version long"

    def _refresh(self, r: SqlRefresh) -> DataFrame:
        """REFRESH [ALL] MATERIALIZED VIEW[S] — incremental when possible;
        one report row per refreshed view naming the mode that ran. ALL
        refreshes every registered view through a shared feed cache, so N
        views over one base plan (and read) that base's backlog ONCE."""
        if r.all_views:
            rows = self._refresh_views(list(self.mat_views), full=r.full)
            return self.spark.createDataFrame(rows, self._REFRESH_REPORT_SCHEMA)
        return self.spark.createDataFrame(
            [self._refresh_one(r.view, r.full, None)], self._REFRESH_REPORT_SCHEMA
        )

    def _refresh_views(self, names: list, full: bool = False) -> list:
        """Refresh ``names`` in order, planning each base/dim table's
        change backlog ONCE: the feed cache keys on (table, checkpoint
        version), and a feed that more than one view will fold is
        materialized (localCheckpoint) so the second consumer reads the
        captured delta instead of re-reading the recordings. Returns the
        report rows."""
        from collections import Counter

        shared: Counter = Counter()
        for n in names:
            mv = self.mat_views.get(n)
            if mv is not None and mv.incremental and not full:
                shared[(mv.base, mv.base_version)] += 1
                if mv.dim:
                    shared[(mv.dim, mv.dim_version)] += 1
        cache = {"shared": {k for k, c in shared.items() if c > 1}, "feeds": {}}
        return [self._refresh_one(n, full, cache) for n in names]

    def _changes_since_cached(self, cache, table: str, after: int):
        """changes_since through the shared multi-view feed cache (None →
        direct). Cached per (table, checkpoint); feeds expected by more
        than one view are materialized once, caught-up (empty) feeds are
        not worth a checkpoint job."""
        if cache is None:
            return self.changes_since(table, after)
        key = (table, after)
        hit = cache["feeds"].get(key)
        if hit is None:
            changes, cur = self.changes_since(table, after)
            if key in cache["shared"] and cur != after:
                changes = changes.localCheckpoint(eager=True)
            hit = cache["feeds"][key] = (changes, cur)
        return hit

    def _maybe_auto_refresh(self, table: str) -> None:
        """ON-COMMIT materialized-view maintenance: after a DML commit on
        a versioned sink, when ``SET matview.auto_refresh = true``, fold
        the commit's delta into every registered view whose base OR dim
        is that table — the per-commit delta is tiny (O(changes)), so the
        views stay query-consistent with no explicit REFRESH. Views
        sharing the table plan the backlog once (shared feed cache). The
        refresh reads a pinned version window, so a concurrent writer
        committing mid-refresh just leaves a later delta for the next
        hook invocation."""
        flag = self.session_vars.get("matview.auto_refresh")
        if isinstance(flag, str):
            flag = flag.strip().lower() in ("true", "1", "on", "yes")
        if not flag or getattr(self, "_auto_refreshing", False):
            return
        t = table.lower()
        names = [
            n for n, mv in self.mat_views.items() if t in (mv.base, mv.dim)
        ]
        if not names:
            return
        self._auto_refreshing = True
        try:
            self._refresh_views(names)
        finally:
            self._auto_refreshing = False

    def _refresh_one(self, view: str, full: bool, cache) -> tuple:
        """One view's refresh — incremental when possible: fold the
        base sink's commits since the last refresh (changes_since CDF)
        into the stored aggregation state; O(|changes| + |view|), never a
        base rescan. Falls back to full recompute when FULL is forced,
        the view isn't incrementally maintainable, or the change feed has
        a vacuumed gap. Returns the report row naming the mode that
        actually ran."""
        from .matview import (
            exposed_frame,
            merge_state,
            merge_substates,
            persist_state,
            persist_substates,
            repair_extrema,
            state_frame,
            sub_state_frames,
        )

        def _fold_substates(mv, deltas):
            mv.substates = persist_substates(
                mv, merge_substates(mv, mv.substates, deltas)
            )

        lname = view.lower()
        mv = self.mat_views.get(lname)
        if mv is None:
            raise ExecError(f"REFRESH MATERIALIZED VIEW: unknown materialized view {view!r}")
        mode = "full"
        v_from = mv.base_version
        dim_moved = False
        dsink = None
        if mv.dim:
            dsink = self.sinks.get(mv.dim)
            if dsink is None:
                raise ExecError(
                    f"materialized view {view!r}: dim {mv.dim!r} is no longer a registered sink"
                )
            dim_moved = max(dsink.versions()) != mv.dim_version
        # a dim commit maintains incrementally for INNER joins (bilinear
        # higher-order identity) and for LEFT joins over a plain
        # equi-join ON (the NULL-extension term isn't bilinear, but with
        # a single-equality key the flip set is computable: a fact row's
        # null-extended row flips exactly when its key's dim match count
        # crosses 0↔1 — see the null-flip term below). LEFT joins with a
        # compound/non-equi ON fall back to full recompute inside the
        # branch once the ON shape is known.
        jt = mv.select.from_[1].join_type if len(mv.select.from_) > 1 else None
        # dim-preserved outer joins need the match-count terms on EVERY
        # refresh (a fact-only delta can flip a dim row's null extension)
        right_like = jt in ("RIGHT", "RIGHT OUTER", "FULL", "FULL OUTER")
        dim_incrementable = not dim_moved or jt in (
            "INNER",
            "LEFT",
            "LEFT OUTER",
            "RIGHT",
            "RIGHT OUTER",
            "FULL",
            "FULL OUTER",
        )
        if mv.incremental and not full and dim_incrementable:
            if self.sinks.get(mv.base) is None:
                raise ExecError(
                    f"materialized view {view!r}: base {mv.base!r} is no longer a registered sink"
                )
            try:
                changes, cur = self._changes_since_cached(cache, mv.base, mv.base_version)
                dim_changes = d_cur = None
                if dim_moved or (right_like and cur != mv.base_version):
                    dim_changes, d_cur = self._changes_since_cached(cache, mv.dim, mv.dim_version)
                    if mv.base_version not in self.sinks[mv.base].versions():
                        # the F_old ⋈ ΔD / match-count terms need the
                        # fact's OLD snapshot; vacuumed → full recompute
                        changes = None
                    elif dsink is not None and mv.dim_version not in dsink.versions():
                        # the null-flip / match-count terms (T4/T5) scan the
                        # dim's OLD snapshot; recordings can outlive a
                        # vacuumed version, so guard symmetrically
                        changes = None
            except ExecError:
                changes = None  # vacuumed gap / stale checkpoint → full recompute
            if changes is not None:
                if cur == mv.base_version and not dim_moved:
                    mode = "noop"
                else:
                    mode = "incremental"
                    w = F.when(
                        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
                    ).otherwise(F.lit(-1))
                    if not dim_moved and not right_like:
                        delta = state_frame(self, mv, changes, w)
                        merged = merge_state(mv, mv.internal, delta)
                        if mv.has_extrema:
                            # min/max don't fold under deletes; re-aggregate
                            # exactly the delete-touched groups from the base
                            merged = repair_extrema(self, mv, merged, cur, dim_version=mv.dim_version)
                        mv.internal = persist_state(mv, merged)
                        if mv.has_distinct:
                            _fold_substates(
                                mv, sub_state_frames(self, mv, changes, w)
                            )
                    else:
                        # higher-order join maintenance. Matched part
                        # (bilinearity of INNER join over signed multiset
                        # union: F_new⋈D_new − F_old⋈D_old
                        #   = ΔF⋈(D_old+ΔD) + F_old⋈ΔD):
                        #   T1 = ΔF ⋈ D_new   (dim PINNED at its new version)
                        #   T2 = F_old ⋈ ΔD   (signed dim delta substituted
                        #        for the dim relation; INNER semantics)
                        # Null-extension parts (plain equi key required —
                        # a side's null-extended row flips exactly when
                        # its key's match count on the OTHER side crosses
                        # 0↔1, computable per key from two snapshots
                        # restricted to the delta's keys):
                        #   LEFT/FULL:  T3 = ΔF rows unmatched in D_new
                        #               T4 = F_old rows whose key's dim
                        #                    match count crossed (ΔD)
                        #   RIGHT/FULL: T5 = ΔD rows unmatched in F_old
                        #               T6 = D_new rows whose key's fact
                        #                    match count crossed (ΔF)
                        # (for LEFT, T1 runs the view's own LEFT join, so
                        # T3 is folded into it; RIGHT/FULL T1 must run
                        # INNER — a dim-preserved join of a fact DELTA
                        # would drag in every unmatched dim row.)
                        from .matview import _UNSET, equi_join_prune_cols

                        left_like = jt in ("LEFT", "LEFT OUTER", "FULL", "FULL OUTER")
                        full_join = jt in ("FULL", "FULL OUTER")
                        d_cur = d_cur if d_cur is not None else mv.dim_version
                        d_new = dsink.scan(self.spark, version=d_cur)
                        dw = F.when(
                            F.col("_change_type").isin("insert", "update_postimage"),
                            F.lit(1),
                        ).otherwise(F.lit(-1))
                        if dim_changes is not None:
                            keep = [
                                c
                                for c in dim_changes.columns
                                if c in set(d_new.columns)
                            ]
                            d_delta = dim_changes.select(*keep, dw.alias("__dw"))
                        else:
                            d_delta = None
                        f_old_full = self.sinks[mv.base].scan(
                            self.spark, version=mv.base_version
                        )
                        f_old = f_old_full
                        pj = equi_join_prune_cols(
                            mv,
                            {c.lower() for c in f_old.columns},
                            {c.lower() for c in d_new.columns},
                        )
                        if (left_like or right_like) and pj is None:
                            mode = "full"  # non-equi outer ON: flips unknowable
                        else:
                            fact_col = dim_col = None
                            dkeys_df = None
                            if pj is not None:
                                fact_col, dim_col = pj
                            if pj is not None and d_delta is not None:
                                # the dim delta's distinct join keys: the
                                # affected-fact filter; IN-list pushdown
                                # (file/row-group skipping) when small
                                dkeys_df = (
                                    d_delta.filter(F.col(dim_col).isNotNull())
                                    .select(F.col(dim_col).alias("__mv_dk"))
                                    .distinct()
                                )
                                dkeys = [
                                    row[0]
                                    for row in dkeys_df.limit(1001).collect()
                                ]
                                if len(dkeys) <= 1000:
                                    # matched-part rows require a non-null
                                    # key in this set; empty set → no rows
                                    f_old = f_old.filter(
                                        F.col(fact_col).isin(dkeys)
                                        if dkeys
                                        else F.lit(False)
                                    )
                            saved = self.tables.get(mv.dim, _UNSET)
                            self.tables[mv.dim] = d_new
                            try:
                                terms = []
                                sub_specs = []  # (df, weight, dim_df, mode, override)

                                def _add(df, wt, dd=None, wmode=None, jo=None):
                                    terms.append(
                                        state_frame(
                                            self, mv, df, wt, dim_df=dd,
                                            weight_mode=wmode, join_override=jo,
                                        )
                                    )
                                    sub_specs.append((df, wt, dd, wmode, jo))

                                # T1 (+ T3 folded in for LEFT; explicit for FULL)
                                _add(changes, w, jo="INNER" if right_like else None)
                                if full_join:
                                    fkeys1 = (
                                        changes.filter(F.col(fact_col).isNotNull())
                                        .select(F.col(fact_col).alias("__mv_fk"))
                                        .distinct()
                                    )
                                    c3 = (
                                        d_new.join(
                                            F.broadcast(fkeys1),
                                            d_new[dim_col] == fkeys1["__mv_fk"],
                                            "left_semi",
                                        )
                                        .groupBy(F.col(dim_col).alias("__mv_fk"))
                                        .agg(F.count(F.lit(1)).alias("__mv_c3"))
                                    )
                                    f3 = (
                                        changes.join(
                                            F.broadcast(c3),
                                            changes[fact_col] == c3["__mv_fk"],
                                            "left",
                                        )
                                        .filter(F.col("__mv_c3").isNull())
                                        .drop("__mv_fk", "__mv_c3")
                                    )
                                    _add(f3, w, dd=d_new.limit(0))
                                # T2 — matched part of the dim delta
                                if d_delta is not None:
                                    _add(
                                        f_old, F.lit(1), dd=d_delta,
                                        wmode="product", jo="INNER",
                                    )
                                # T4 — fact-side null-extension flips (ΔD)
                                if left_like and dkeys_df is not None:
                                    d_old_snap = dsink.scan(
                                        self.spark, version=mv.dim_version
                                    )

                                    def _dkc(ddf, out):
                                        return (
                                            ddf.join(
                                                F.broadcast(dkeys_df),
                                                ddf[dim_col] == dkeys_df["__mv_dk"],
                                                "left_semi",
                                            )
                                            .groupBy(F.col(dim_col).alias("__mv_dk"))
                                            .agg(F.count(F.lit(1)).alias(out))
                                        )

                                    flips = (
                                        dkeys_df.join(
                                            _dkc(d_old_snap, "__mv_mo"), "__mv_dk", "left"
                                        )
                                        .join(_dkc(d_new, "__mv_mn"), "__mv_dk", "left")
                                        .select(
                                            "__mv_dk",
                                            F.coalesce("__mv_mo", F.lit(0)).alias("__mv_mo"),
                                            F.coalesce("__mv_mn", F.lit(0)).alias("__mv_mn"),
                                        )
                                        .filter(
                                            (F.col("__mv_mo") == 0)
                                            != (F.col("__mv_mn") == 0)
                                        )
                                        # key gained matches → null-extended
                                        # rows RETRACT (−1); lost all → +1
                                        .withColumn(
                                            "__mv_fw",
                                            F.when(
                                                F.col("__mv_mn") == 0, F.lit(1)
                                            ).otherwise(F.lit(-1)),
                                        )
                                        .select("__mv_dk", "__mv_fw")
                                    )
                                    f_flip = f_old_full.join(
                                        F.broadcast(flips),
                                        f_old_full[fact_col] == flips["__mv_dk"],
                                        "inner",
                                    ).drop("__mv_dk")
                                    _add(
                                        f_flip, F.col("__mv_fw"),
                                        dd=d_new.limit(0),
                                    )
                                # T5 — dim-side null extensions of ΔD at F_old
                                if right_like and d_delta is not None:
                                    mo5 = (
                                        f_old_full.join(
                                            F.broadcast(dkeys_df),
                                            f_old_full[fact_col] == dkeys_df["__mv_dk"],
                                            "left_semi",
                                        )
                                        .groupBy(F.col(fact_col).alias("__mv_dk"))
                                        .agg(F.count(F.lit(1)).alias("__mv_m5"))
                                    )
                                    d5 = (
                                        d_delta.join(
                                            F.broadcast(mo5),
                                            d_delta[dim_col] == mo5["__mv_dk"],
                                            "left",
                                        )
                                        .filter(F.col("__mv_m5").isNull())
                                        .drop("__mv_dk", "__mv_m5")
                                    )
                                    _add(
                                        f_old_full.limit(0), F.lit(1),
                                        dd=d5, wmode="dim",
                                    )
                                # T6 — dim rows whose fact match count
                                # crossed 0↔1 via ΔF
                                if right_like and cur != mv.base_version:
                                    fkeys6 = (
                                        changes.filter(F.col(fact_col).isNotNull())
                                        .select(F.col(fact_col).alias("__mv_fk"))
                                        .distinct()
                                    )
                                    f_new_full = self.sinks[mv.base].scan(
                                        self.spark, version=cur
                                    )

                                    def _fkc(fdf, out):
                                        return (
                                            fdf.join(
                                                F.broadcast(fkeys6),
                                                fdf[fact_col] == fkeys6["__mv_fk"],
                                                "left_semi",
                                            )
                                            .groupBy(F.col(fact_col).alias("__mv_fk"))
                                            .agg(F.count(F.lit(1)).alias(out))
                                        )

                                    fflips = (
                                        fkeys6.join(
                                            _fkc(f_old_full, "__mv_mo"), "__mv_fk", "left"
                                        )
                                        .join(_fkc(f_new_full, "__mv_mn"), "__mv_fk", "left")
                                        .select(
                                            "__mv_fk",
                                            F.coalesce("__mv_mo", F.lit(0)).alias("__mv_mo"),
                                            F.coalesce("__mv_mn", F.lit(0)).alias("__mv_mn"),
                                        )
                                        .filter(
                                            (F.col("__mv_mo") == 0)
                                            != (F.col("__mv_mn") == 0)
                                        )
                                        .withColumn(
                                            "__dw",
                                            F.when(
                                                F.col("__mv_mn") == 0, F.lit(1)
                                            ).otherwise(F.lit(-1)),
                                        )
                                        .select("__mv_fk", "__dw")
                                    )
                                    d6 = d_new.join(
                                        F.broadcast(fflips),
                                        d_new[dim_col] == fflips["__mv_fk"],
                                        "inner",
                                    ).drop("__mv_fk")
                                    _add(
                                        f_old_full.limit(0), F.lit(1),
                                        dd=d6, wmode="dim",
                                    )

                                delta = terms[0]
                                for t in terms[1:]:
                                    delta = delta.unionByName(t)
                                merged = merge_state(mv, mv.internal, delta)
                                if mv.has_extrema:
                                    merged = repair_extrema(self, mv, merged, cur, dim_version=d_cur)
                                mv.internal = persist_state(mv, merged)
                                if mv.has_distinct:
                                    sub_terms = [
                                        sub_state_frames(
                                            self, mv, df, wt, dim_df=dd,
                                            weight_mode=wmode,
                                            join_override=jo,
                                        )
                                        for df, wt, dd, wmode, jo in sub_specs
                                    ]
                                    deltas = []
                                    for i in range(len(sub_terms[0])):
                                        u = sub_terms[0][i]
                                        for t in sub_terms[1:]:
                                            u = u.unionByName(t[i])
                                        deltas.append(u)
                                    _fold_substates(mv, deltas)
                            finally:
                                if saved is _UNSET:
                                    self.tables.pop(mv.dim, None)
                                else:
                                    self.tables[mv.dim] = saved
                            mv.dim_version = d_cur
                    if mode == "incremental":
                        mv.base_version = cur
        if mode == "full":
            if mv.incremental:
                sink = self.sinks[mv.base]
                mv.base_version = max(sink.versions())
                if mv.dim:
                    # a dim commit forced this full recompute; re-pin it
                    mv.dim_version = max(self.sinks[mv.dim].versions())
                base_df = sink.scan(self.spark, version=mv.base_version)
                mv.internal = persist_state(
                    mv, state_frame(self, mv, base_df, F.lit(1), weight_mode="one").drop("__mv_neg")
                )
                if mv.has_distinct:
                    mv.substates = persist_substates(
                        mv, sub_state_frames(self, mv, base_df, F.lit(1), weight_mode="one")
                    )
            else:
                mv.internal = persist_state(mv, self._select_any(mv.select))
        if mode != "noop":
            self.register_df(lname, exposed_frame(mv))
        return (view, mode, v_from, mv.base_version)

    def _command(self, cmd: SqlCommand):
        if cmd.kw == "SET":
            self.session_vars[cmd.ident] = _literal_value(cmd.value) if cmd.value is not None else None
            return None
        if cmd.kw == "USE":
            self.name = cmd.ident
            return None
        return None  # ROLLBACK/COMMIT are parse-only no-ops (lex/dialect_sql.go:203-210)

    # ------------------------------------------------------------------
    # MERGE INTO — ANSI conditional upsert/delete (superset: the
    # reference only exposes sink-level whole-row upsert)
    # ------------------------------------------------------------------
    @staticmethod
    def _normalize_merge_sets(m: SqlMerge, t_ref: str, tcols: list) -> None:
        """Normalize UPDATE SET keys in place: strip a leading target
        alias/name qualifier (the lexer folds ``t.v`` into one IDENT),
        case-fold to the target column's spelling, and reject keys that
        resolve to no target column (silently dropping an assignment
        would corrupt data while still counting the row as affected).
        Idempotent, so prepared statements re-running the same parsed
        tree are safe."""
        by_lower = {c.lower(): c for c in tcols}
        prefixes = (f"{t_ref.lower()}.", f"{m.target.lower()}.")
        for cl in m.clauses:
            if cl.action != "update" or cl.set_values == "*":
                continue
            norm = {}
            for k, v in cl.set_values.items():
                kl = k.lower()
                for p in prefixes:
                    if kl.startswith(p):
                        kl = kl[len(p):]
                        break
                col = by_lower.get(kl)
                if col is None:
                    raise ExecError(
                        f"MERGE UPDATE SET references unknown target column {k!r} "
                        f"(target columns: {tcols})"
                    )
                norm[col] = v
            cl.set_values = norm

    # expression constructs whose qlbridge semantics MATCH Spark SQL's —
    # only these may be lowered verbatim onto a native sink merge builder.
    # Deliberately excluded (engine semantics diverge): BETWEEN (exclusive
    # bounds), LIKE (glob), CONTAINS/INTERSECTS/IN, `/` and `%` (div-by-
    # zero / float-mod shims), qlbridge-only builtins, @var params.
    _ANSI_SAFE_OPS = frozenset({"+", "-", "*", "=", "==", "!=", "<>", "<", "<=", ">", ">=", "AND", "OR"})
    _ANSI_SAFE_FUNCS = frozenset({
        "coalesce", "upper", "lower", "abs", "length", "trim", "ltrim", "rtrim",
        "concat", "greatest", "least", "nullif", "floor", "ceil", "round", "substring",
    })

    @classmethod
    def _render_ansi(cls, node) -> str:
        """Render an expression tree as Spark SQL, raising ExecError on any
        construct the engine evaluates differently from Spark — the MERGE
        native-lowering path falls back to the (semantics-authoritative)
        translated full-outer-join plan for those."""
        from .nodes import BoolNode, BooleanNode, NullNode, UnaryNode

        if isinstance(node, NumberNode):
            # float literals get the D suffix: Spark parses bare decimals
            # as DECIMAL, the engine's NumberNode floats are doubles
            return node.text if node.is_int else f"{node.text}D"
        if isinstance(node, StringNode):
            # NOT node.sql(): the lexer already decoded escapes, and Spark
            # SQL's default parser re-interprets C-style escapes inside
            # string literals — render for SPARK's escaping rules ('a\b'
            # must not become 'a<backspace>' on the native merge path)
            v = (
                node.value.replace("\\", "\\\\")
                .replace("'", "\\'")
                .replace("\n", "\\n")
                .replace("\r", "\\r")
                .replace("\t", "\\t")
                .replace("\0", "\\0")
            )
            return f"'{v}'"
        if isinstance(node, NullNode):
            return node.sql()
        if isinstance(node, BoolNode):
            return "true" if node.value else "false"
        if isinstance(node, IdentityNode):
            if node.is_star or any(p[:1] in "@?" for p in node.parts):
                raise ExecError("merge-native: star/param identity")
            return node.sql()
        if isinstance(node, BinaryNode):
            if node.op not in cls._ANSI_SAFE_OPS or node.negated:
                raise ExecError(f"merge-native: operator {node.op} diverges")
            op = "=" if node.op == "==" else node.op
            return f"({cls._render_ansi(node.left)} {op} {cls._render_ansi(node.right)})"
        if isinstance(node, UnaryNode) and node.op in ("-", "NOT"):
            return f"({node.op} ({cls._render_ansi(node.child)}))"
        if isinstance(node, BooleanNode) and not node.negated:
            return "(" + f" {node.op} ".join(cls._render_ansi(a) for a in node.args) + ")"
        if (
            isinstance(node, FuncNode)
            and node.name in cls._ANSI_SAFE_FUNCS
            and node.filter_where is None
            and not node.agg_order
            and not node.ignore_nulls
        ):
            return f"{node.name}({', '.join(cls._render_ansi(a) for a in node.args)})"
        raise ExecError(f"merge-native: {type(node).__name__} not ANSI-renderable")

    def _merge_native(self, m: SqlMerge, sink, src: DataFrame, t_ref: str, s_ref: str, tcols: list):
        """Lower the when-chains to the sink's native merge builder
        (``merge_when`` — Delta: file-pruned incremental MERGE, no
        full-table rewrite). Expressions are rendered by the conservative
        ``_render_ansi`` walker BEFORE the sink is touched; any refused
        construct returns None and the caller falls back to the generic
        full-outer-join path. Once ``merge_when`` starts, errors propagate
        (the sink is transactional — nothing partial to unwind)."""
        # '*' clauses: native builders (Delta whenMatchedUpdateAll /
        # whenNotMatchedInsertAll) REQUIRE the source to cover the target
        # columns; the generic path instead keeps target values (update)
        # or NULL-fills (insert) for columns missing from the source. Only
        # lower '*' natively when the semantics coincide — source covers
        # target case-insensitively — else take the generic fallback.
        if any(
            (cl.action == "update" and cl.set_values == "*")
            or (cl.action == "insert" and cl.insert_values == "*")
            for cl in m.clauses
        ):
            if not {c.lower() for c in tcols} <= {c.lower() for c in src.columns}:
                return None
        try:
            render = self._render_ansi
            on_sql = render(m.on)
            clauses = []
            for cl in m.clauses:
                d = {
                    "matched": cl.matched,
                    "action": cl.action,
                    "cond": render(cl.cond) if cl.cond is not None else None,
                }
                if cl.action == "update":
                    d["set"] = (
                        "*" if cl.set_values == "*"
                        else {c: render(n) for c, n in cl.set_values.items()}
                    )
                elif cl.action == "insert":
                    if cl.insert_values == "*":
                        d["values"] = "*"
                    else:
                        cols = cl.insert_cols or tcols[: len(cl.insert_values)]
                        d["values"] = {
                            cols[i]: render(n) for i, n in enumerate(cl.insert_values)
                        }
                clauses.append(d)
        except ExecError:
            return None  # not ANSI-renderable → generic path
        return sink.merge_when(src, on_sql, clauses, t_alias=t_ref, s_alias=s_ref)

    @staticmethod
    def _merge_equi_pairs(on, t_ref: str, s_ref: str, src_cols: list) -> list:
        """(target col, source col actual-case) for every plain
        ``t.col = s.col`` equi-conjunct of the MERGE ON condition. Only
        qualified bare-column refs on both sides count; null-safe
        equality (``IS NOT DISTINCT FROM``) is deliberately excluded —
        its NULL=NULL matches would break null-rejecting file pruning."""
        from .nodes import BinaryNode, BooleanNode, IdentityNode

        srcmap = {c.lower(): c for c in src_cols}
        tl, sl = t_ref.lower(), s_ref.lower()
        pairs = []
        stack = [on]
        while stack:
            n = stack.pop()
            if isinstance(n, BinaryNode) and n.op == "AND" and not n.negated:
                stack.extend((n.left, n.right))
                continue
            if isinstance(n, BooleanNode) and n.op == "AND" and not n.negated:
                stack.extend(n.args)
                continue
            if not (isinstance(n, BinaryNode) and n.op == "=" and not n.negated):
                continue
            sides = {}
            for node in (n.left, n.right):
                if isinstance(node, IdentityNode) and len(node.parts) == 2:
                    sides[node.parts[0].lower()] = node.parts[1]
            if tl in sides and sl in sides and sides[sl].lower() in srcmap:
                pairs.append((sides[tl].lower(), srcmap[sides[sl].lower()]))
        return pairs

    def _merge_cow_split(
        self, m: SqlMerge, sink, src: DataFrame, t_ref: str, s_ref: str,
        base: int | None = None,
    ):
        """(base version, files to rewrite, files to link) when the MERGE
        ON condition lets file statistics prove which target files cannot
        hold a matching row, else None. Sound because this MERGE dialect
        has no NOT MATCHED BY SOURCE arm: a target row with no source
        match passes through unchanged, so a file provably containing
        only such rows can hardlink into the new snapshot untouched.
        Conjuncts: literal comparisons on the target side of ON prune
        directly; ONE ``t.col = s.col`` equi-pair adds the source batch's
        key summary (IN-set / min-max range — one bounded job)."""
        import dataclasses

        from .sinks import _ALL_NULL_KEYS
        from .skipping import extract_conjuncts, load_stats_sidecar, prune_files

        basev = sink._version() if base is None else base
        if basev < 0:
            return None
        stats = load_stats_sidecar(sink._data_dir(basev))
        if stats is None:
            return None
        actual = sink._data_rels(basev)
        if not actual or not set(actual) <= set(stats.get("files") or {}):
            return None
        conjs = extract_conjuncts(m.on, {t_ref.lower()}, allow_bare=False)
        for tcol, scol in self._merge_equi_pairs(m.on, t_ref, s_ref, list(src.columns)):
            c = sink.batch_key_conjunct(src, scol)
            if c is _ALL_NULL_KEYS:
                # every source key NULL: equality can match no target row,
                # the whole table links (only insert arms can fire)
                return basev, [], list(actual)
            if c is not None:
                conjs.append(dataclasses.replace(c, col=tcol))
                break  # one key-summary job is enough
        if not conjs:
            return None
        kept, _total = prune_files(stats, conjs)
        ks = set(kept)
        rewrite = [r for r in actual if r in ks]
        link = [r for r in actual if r not in ks]
        if not link:
            return None  # nothing provably untouched — full path
        return basev, rewrite, link

    def _merge(self, m: SqlMerge) -> int:
        """One-pass plan: target FULL OUTER JOIN source on the merge
        condition; a first-match-wins when-chain picks the acting clause
        per row; every target column is rebuilt with per-clause value
        chains; kept rows = non-deleted target rows + inserted
        source-only rows. Cardinality rule enforced like ANSI/Delta,
        CONDITION-AWARE: a target row is an error only when more than one
        source row's first-matching arm would UPDATE or DELETE it
        (matching rows whose conditions route them to no arm don't
        count), checked with one bounded agg; the acting row then wins
        the per-target-id reduction.

        Scale path: the full-outer join is persisted and executed ONCE
        (cardinality check, affected count, and both output branches all
        read the cache — previously up to 4 executions per statement),
        and sinks exposing ``merge_when`` (DeltaMergeSink) get the
        when-chains lowered to their native merge builder instead of a
        full-table overwrite."""
        t_ref = m.target_alias or m.target
        s_ref = m.source_alias or m.source or "__src"
        if t_ref == s_ref:
            raise ExecError("MERGE target and source need distinct names/aliases")
        sink = self.sinks.get(m.target.lower())
        # base-pin versioned sinks for the WHOLE statement: the snapshot
        # we scan is the version the commit CAS targets +1, so a
        # concurrent commit landing anywhere inside the (multi-second)
        # scan→join→commit window raises ConcurrentWriteError instead of
        # being silently clobbered (Serializable, matching
        # update_where/delete_where/optimize/restore)
        basev: int | None = None
        if sink is not None and hasattr(sink, "_version"):
            v = sink._version()
            if v >= 0:
                basev = v
        if sink is None:
            target = self.table(m.target)
        elif basev is not None:
            target = sink.scan(self.spark, basev)
        else:
            target = sink.scan(self.spark)
        src = self._select_any(m.source_query) if m.source_query is not None else self.table(m.source)
        self._normalize_merge_sets(m, t_ref, list(target.columns))
        if sink is not None and hasattr(sink, "merge_when"):
            n = self._merge_native(m, sink, src, t_ref, s_ref, list(target.columns))
            if n is not None:
                return n
        import inspect as _inspect

        ow_params = (
            set(_inspect.signature(sink.overwrite).parameters)
            if sink is not None and hasattr(sink, "overwrite")
            else set()
        )
        # file-pruned COW over versioned parquet sinks (Delta's MERGE
        # economics on the generic path): files whose stats PROVE no ON
        # match hardlink through; the join below runs over the rewritten
        # region only. At 100 TB a CDC batch touching one day of a
        # date-clustered table joins against that day, not the table.
        # Only when the changes-capable commit branch will consume it: a
        # duck-typed sink exposing overwrite_cow but a legacy overwrite
        # signature would otherwise commit just the rewritten region as
        # the full table (silent data loss on the linked files' rows).
        cow = None
        if sink is not None and hasattr(sink, "overwrite_cow") and "changes" in ow_params:
            cow = self._merge_cow_split(m, sink, src, t_ref, s_ref, base=basev)
            if cow is not None:
                basev, rewrite, _link = cow
                target = (
                    sink._read_files(sink._data_dir(basev), rewrite)
                    if rewrite
                    else sink.scan(self.spark, basev).limit(0)
                )
        TID, SM = "__merge_tid", "__merge_smatch"
        t = target.withColumn(TID, F.monotonically_increasing_id()).alias(t_ref)
        s = src.withColumn(SM, F.lit(1)).alias(s_ref)
        scope = Scope({t_ref: t, s_ref: s}, includes=self.includes, params=self._scope_params())
        # persist: the cardinality check, the affected count, and both
        # output branches below all read this ONE materialization instead
        # of re-executing the full-outer join (at 100 TB, 4 scans → 1)
        joined = t.join(s, on=to_column(m.on, scope), how="full_outer").persist()

        matched = F.col(TID).isNotNull() & F.col(SM).isNotNull()
        not_matched = F.col(TID).isNull()
        try:
            # first-match-wins clause selection
            action = None
            for i, cl in enumerate(m.clauses):
                base = matched if cl.matched else not_matched
                if cl.cond is not None:
                    base = base & to_column(cl.cond, scope)
                action = F.when(base, F.lit(f"a{i}")) if action is None else action.when(base, F.lit(f"a{i}"))
            act = F.coalesce(action, F.lit(""))

            # ANSI/Delta cardinality rule, CONDITION-AWARE (round 9 — the
            # earlier raw-match check errored even when WHEN conditions
            # disambiguated which source row acts): a target row is in
            # violation only when MORE THAN ONE source row's first-matching
            # arm would UPDATE or DELETE it.
            mids = [f"a{i}" for i, cl in enumerate(m.clauses) if cl.matched]
            if mids:
                dups = (
                    joined.filter(F.col(TID).isNotNull() & act.isin(mids))
                    .groupBy(TID)
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .filter(F.col("__n") > 1)
                    .limit(1)
                    .count()
                )
                if dups:
                    raise ExecError(
                        "MERGE cardinality violation: multiple source rows attempted "
                        "to update or delete the same target row"
                    )

            tcols = list(target.columns)
            scols = set(src.columns)
            val_exprs: list = []  # (col, unaliased value expr) — reused for CDF recording
            for c in tcols:
                dtype = target.schema[c].dataType
                e = F.col(f"{t_ref}.{c}")
                for i, cl in enumerate(m.clauses):
                    sub = None
                    if cl.action == "update":
                        if cl.set_values == "*":
                            if c in scols:
                                sub = F.col(f"{s_ref}.{c}")
                        elif c in cl.set_values:
                            sub = to_column(cl.set_values[c], scope)
                    elif cl.action == "insert":
                        if cl.insert_values == "*":
                            sub = F.col(f"{s_ref}.{c}") if c in scols else F.lit(None)
                        else:
                            cols = cl.insert_cols or tcols[: len(cl.insert_values)]
                            low = [x.lower() for x in cols]
                            sub = (
                                to_column(cl.insert_values[low.index(c.lower())], scope)
                                if c.lower() in low
                                else F.lit(None)
                            )
                    if sub is not None:
                        e = F.when(act == f"a{i}", sub.cast(dtype)).otherwise(e)
                val_exprs.append((c, e))
            exprs = [e.alias(c) for c, e in val_exprs]

            del_ids = [f"a{i}" for i, cl in enumerate(m.clauses) if cl.action == "delete"]
            ins_ids = [f"a{i}" for i, cl in enumerate(m.clauses) if cl.action == "insert"]
            ins_pred = act.isin(ins_ids) if ins_ids else F.lit(False)
            # target side reduced to ONE row per target id, preferring the
            # ACTING joined row: under the condition-aware cardinality rule
            # a target row may join several source rows of which at most one
            # acts (checked above) — the acting row carries the update (or
            # marks the delete), the non-acting duplicates carry the old
            # values and must not survive alongside it. Window over the
            # persisted join; same single shuffle the old dropDuplicates did.
            from pyspark.sql import Window as _W

            # sole order key: acting row first. Ties among NON-acting
            # duplicates are value-identical in the selected exprs (they
            # differ only in unselected source columns), so no further
            # tie-break is needed (and TID would be a no-op — it is the
            # partition column).
            pick = F.row_number().over(
                _W.partitionBy(TID).orderBy(F.col("__merge_acted").desc())
            )
            t_part = (
                joined.filter(F.col(TID).isNotNull())
                .select(F.col(TID), act.alias("__merge_act"), (act != "").alias("__merge_acted"), *exprs)
                .withColumn("__merge_rn", pick)
                .filter(
                    (F.col("__merge_rn") == 1)
                    & ~F.col("__merge_act").isin(del_ids if del_ids else ["__none"])
                )
                .drop(TID, "__merge_act", "__merge_acted", "__merge_rn")
            )
            s_part = joined.filter(F.col(TID).isNull() & ins_pred).select(*exprs)
            final = t_part.unionByName(s_part)
            n_affected = joined.filter(act != "").count()
            if sink is not None:
                if not hasattr(sink, "overwrite"):
                    raise ExecError(f"sink for {m.target!r} does not support MERGE (needs overwrite())")
                if "changes" in ow_params:
                    # CDF recording: the merge knows its change rows exactly
                    # (the persisted join is re-read from cache, not
                    # re-executed). Update rows are recorded only when a
                    # value actually changed — matching snapshot-diff
                    # semantics, where an x = x update emits nothing.
                    upd_ids = [f"a{i}" for i, cl in enumerate(m.clauses) if cl.action == "update"]
                    old_cols = [F.col(f"{t_ref}.{c}").alias(c) for c in tcols]
                    pieces = []
                    if upd_ids:
                        differs = None
                        for c, e in val_exprs:
                            ne = ~e.eqNullSafe(F.col(f"{t_ref}.{c}"))
                            differs = ne if differs is None else (differs | ne)
                        upd = joined.filter(
                            F.col(TID).isNotNull() & act.isin(upd_ids) & differs
                        )
                        pieces.append(
                            upd.select(*old_cols).withColumn(
                                "_change_type", F.lit("update_preimage")
                            )
                        )
                        pieces.append(
                            upd.select(*exprs).withColumn(
                                "_change_type", F.lit("update_postimage")
                            )
                        )
                    if del_ids:
                        pieces.append(
                            joined.filter(F.col(TID).isNotNull() & act.isin(del_ids))
                            .select(*old_cols)
                            .withColumn("_change_type", F.lit("delete"))
                        )
                    if ins_ids:
                        pieces.append(s_part.withColumn("_change_type", F.lit("insert")))
                    ch = pieces[0]
                    for p in pieces[1:]:
                        ch = ch.unionByName(p)
                    if cow is not None:
                        sink.overwrite_cow(
                            final, cow[2], changes=ch, base=cow[0], files_rewritten=len(cow[1])
                        )
                    elif "base" in ow_params and basev is not None:
                        if "op" in ow_params:
                            sink.overwrite(final, changes=ch, base=basev, op="MERGE")
                        else:
                            sink.overwrite(final, changes=ch, base=basev)
                    else:
                        sink.overwrite(final, changes=ch)
                else:
                    # cow is None here by construction (COW is only
                    # computed when the changes-capable branch above will
                    # commit it) — a legacy overwrite always gets the FULL
                    # final frame, never just the rewritten region
                    assert cow is None
                    sink.overwrite(final)
                self._maybe_auto_compact(sink)
                self._maybe_auto_refresh(m.target)
            else:
                # materialize through the cache before it is released: the
                # registered result must not re-execute the full-outer join
                # on every later read (and chained MERGEs must not build an
                # O(n²) lineage of nested joins)
                self.register_df(m.target, final.localCheckpoint(eager=True))
            return n_affected
        finally:
            joined.unpersist()

    def _vacuum(self, v: SqlVacuum) -> int:
        """``VACUUM t [RETAIN n VERSIONS | RETAIN h HOURS]`` — lifecycle
        statement for the versioned MERGE sinks (Delta-parity; the
        reference has no versioned storage). Returns the number of
        snapshot versions dropped. VERSIONS is count-based
        (ParquetMergeSink; Delta rejects it — its retention is
        time-based); HOURS drops non-current snapshots older than
        now−h (both sinks). Classed as mutating so cached plans pinned
        to old version dirs (VERSION AS OF reads) are invalidated."""
        sink = self.sinks.get(v.table.lower())
        if sink is None or not hasattr(sink, "vacuum"):
            raise ExecError(
                f"VACUUM requires a versioned sink table; {v.table!r} is not one"
            )
        if v.retain_hours is not None and v.retain_hours < 0:
            raise ExecError("VACUUM RETAIN HOURS must be >= 0")
        if v.retain is not None and v.retain < 1:
            raise ExecError("VACUUM RETAIN must keep at least 1 version")
        from .sinks import SinkCapabilityError

        kwargs: dict = {}
        if v.retain_hours is not None:
            kwargs["retention_hours"] = float(v.retain_hours)
        elif v.retain is not None:
            kwargs["keep"] = int(v.retain)
        if v.dry_run:
            # Delta VACUUM ... DRY RUN parity: report the victims, delete
            # nothing — the audit step before an irreversible prune
            import inspect as _inspect

            if "dry_run" not in _inspect.signature(sink.vacuum).parameters:
                raise ExecError(
                    f"sink for {v.table!r} does not support VACUUM DRY RUN"
                )
            victims = sink.vacuum(dry_run=True, **kwargs)
            return self.spark.createDataFrame(
                victims or [],
                schema="version long, files long, bytes long",
            )
        try:
            return sink.vacuum(**kwargs)
        except SinkCapabilityError as e:  # e.g. Delta cannot do RETAIN VERSIONS
            raise ExecError(str(e)) from e

    def _restore(self, r: SqlRestore) -> int:
        """``RESTORE [TABLE] t TO VERSION AS OF n | TO TIMESTAMP AS OF
        '<ts>'`` — roll a versioned sink back to a past snapshot by
        committing it as the NEW current version (history preserved;
        Delta-parity). Returns the new current version number."""
        sink = self.sinks.get(r.table.lower())
        if sink is None or not hasattr(sink, "restore"):
            raise ExecError(
                f"RESTORE requires a versioned sink table; {r.table!r} is not one"
            )
        return sink.restore(version=r.version, timestamp=r.timestamp)

    def _optimize(self, o: "SqlOptimize") -> DataFrame:
        """``OPTIMIZE t [ZORDER BY (...)]`` — layout maintenance on a
        versioned sink: compact small files accumulated by MERGE/append
        commits and optionally Z-order-cluster on the listed columns so
        parquet min/max stats prune scans on ANY of them (the multi-
        column data-skipping story at 100 TB — see datapipe/zorder.py).
        Delta sinks route to the native incremental OPTIMIZE; parquet
        sinks compact incrementally too — only under-target files are
        rewritten, right-sized files hardlink through (ZORDER stays a
        full rewrite: clustering re-sorts every row). Returns a one-row
        metrics frame (Delta-style). File sizing: session var
        ``optimize.target_file_mb`` (default 128)."""
        sink = self.sinks.get(o.table.lower())
        if sink is None or not hasattr(sink, "optimize"):
            raise ExecError(
                f"OPTIMIZE requires a versioned sink table; {o.table!r} is not one"
            )
        if o.zorder:
            cols = {c.lower() for c in sink.scan(self.spark).columns}
            bad = [c for c in o.zorder if c.lower() not in cols]
            if bad:
                raise ExecError(f"OPTIMIZE ZORDER BY references unknown columns: {bad}")
        target_mb = float(self.session_vars.get("optimize.target_file_mb", 128))
        curve = str(self.session_vars.get("optimize.curve", "morton")).lower()
        if curve not in ("morton", "hilbert"):
            raise ExecError(f"optimize.curve must be 'morton' or 'hilbert', got {curve!r}")
        scope = None
        if o.where is not None:
            # the WHERE scopes WHICH FILES rewrite (rows are never
            # filtered): it must reduce to pushable conjuncts, else the
            # scope would silently mean "the whole table"
            scope = self._dml_conjuncts(o.table, o.where)
            if not scope:
                raise ExecError(
                    "OPTIMIZE WHERE must be a pushable predicate over the "
                    "table's columns (partition / stats pruning conjuncts); "
                    "drop the WHERE to optimize the whole table"
                )
        kwargs = {"zorder_by": o.zorder or None, "target_file_mb": target_mb}
        import inspect as _inspect

        params = set(_inspect.signature(sink.optimize).parameters)
        if scope is not None:
            if "scope_conjuncts" not in params:
                raise ExecError(
                    f"sink for {o.table!r} does not support OPTIMIZE WHERE"
                )
            kwargs["scope_conjuncts"] = scope
        if "curve" in params:
            kwargs["curve"] = curve
        elif curve != "morton":
            # sink without a curve knob (e.g. Delta's native OPTIMIZE
            # chooses its own layout): only the default passes through
            raise ExecError(
                f"sink for {o.table!r} does not support optimize.curve={curve!r}"
            )
        m = sink.optimize(**kwargs)
        return self.spark.createDataFrame(
            [
                {
                    "table": o.table,
                    "version": m.get("version"),
                    "files_before": m.get("files_before"),
                    "files_after": m.get("files_after"),
                    "zorder_by": ",".join(m.get("zorder_by") or []),
                }
            ],
            schema="table string, version long, files_before long, files_after long, zorder_by string",
        )

    # ------------------------------------------------------------------
    # COPY — bulk I/O (DuckDB-style superset; executor-parallel writes)
    # ------------------------------------------------------------------
    _COPY_FORMATS = {"parquet", "csv", "json", "jsonl", "orc", "text"}

    def _copy(self, c: SqlCopy) -> int:
        fmt = str(c.options.get("format", "parquet")).lower()
        if fmt == "jsonl":
            fmt = "json"  # Spark's json source IS json-lines
        if fmt not in self._COPY_FORMATS:
            raise ExecError(f"COPY format {fmt!r} not supported (one of {sorted(self._COPY_FORMATS)})")
        if c.direction == "TO":
            from pyspark.sql import Observation

            df = self._select_any(c.query) if c.query is not None else self.table(c.table)
            # row count piggybacks on the write job itself (Observation):
            # no re-read of the output — previously a full data re-scan
            # for csv/json, and the csv re-read miscounted under
            # HEADER false / custom DELIMITER
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
            writer = df.write.format(fmt)
            if c.options.get("overwrite"):
                writer = writer.mode("overwrite")
            if fmt == "csv":
                writer = writer.option("header", str(c.options.get("header", True)).lower())
                if "delimiter" in c.options:
                    writer = writer.option("sep", str(c.options["delimiter"]))
            if "compression" in c.options:
                writer = writer.option("compression", str(c.options["compression"]))
            part = c.options.get("partition_by")
            if part:
                writer = writer.partitionBy(*part)
            writer.save(c.path)
            return int(obs.get["n"])
        # COPY <table> FROM '<path>': append into the registered table /
        # sink (DuckDB semantics — the table must exist)
        reader = self.spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", str(c.options.get("header", True)).lower()).option(
                "inferSchema", "true"
            )
            if "delimiter" in c.options:
                reader = reader.option("sep", str(c.options["delimiter"]))
        new = reader.load(c.path)
        n = new.count()
        tname = c.table.lower()
        sink = self.sinks.get(tname)
        if sink is not None and hasattr(sink, "insert_append"):
            sink.insert_append(new)
            return n
        base = self.table(c.table)
        self.register_df(c.table, base.unionByName(new, allowMissingColumns=True))
        return n


def _literal_value(node: Node):
    if isinstance(node, NumberNode):
        return node.value
    if isinstance(node, StringNode):
        return node.value
    from .nodes import BoolNode, NullNode

    if isinstance(node, BoolNode):
        return node.value
    if isinstance(node, NullNode):
        return None
    if isinstance(node, UnaryNode) and node.op == "-" and isinstance(node.child, NumberNode):
        return -node.child.value
    raise ExecError(f"expected literal, got {node.sql()}")


_DDL_TYPES = {
    "int": T.LongType(), "integer": T.LongType(), "bigint": T.LongType(),
    "float": T.DoubleType(), "double": T.DoubleType(), "number": T.DoubleType(),
    "varchar": T.StringType(), "char": T.StringType(), "string": T.StringType(), "text": T.StringType(),
    "bool": T.BooleanType(), "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(), "datetime": T.TimestampType(), "date": T.DateType(),
    "json": T.StringType(),
}


def _ddl_type(ty: str) -> T.DataType:
    base = re.sub(r"\(.*\)", "", ty).lower()
    return _DDL_TYPES.get(base, T.StringType())


class PreparedStatement:
    """Parse-once handle from :meth:`Engine.prepare`.

    ``?`` placeholders are numbered left-to-right at lex time (``?0``,
    ``?1``, ...) and bind at translate time as literals — each
    ``execute(*args)`` skips parsing entirely and, via the engine's fold
    cache, re-uses plan-time subquery folds whose text does not reference
    a parameter. Reference parity note: qlbridge parses PREPARE but
    returns ErrNotImplemented on execution (exec/executor.go:144-146) —
    this API is a documented superset.
    """

    def __init__(self, engine: Engine, text: str):
        from .lexer import tokenize

        self.engine = engine
        self.text = text
        self.stmt = parse_sql(text)
        self.n_params = sum(
            1 for t in tokenize(text) if t.kind == "IDENT" and re.fullmatch(r"\?\d+", t.val)
        )

    def execute(self, *args):
        """Execute with positional binds; returns what Engine.execute
        returns (DataFrame for queries)."""
        if len(args) != self.n_params:
            raise ExecError(f"prepared statement takes {self.n_params} parameter(s), got {len(args)}")
        binds = {f"?{i}": v for i, v in enumerate(args)}
        prev = self.engine._bound_params
        self.engine._bound_params = binds
        try:
            return self.engine.execute_stmt(self.stmt)
        finally:
            self.engine._bound_params = prev

    def sql(self, *args) -> DataFrame:
        out = self.execute(*args)
        if not isinstance(out, DataFrame):
            raise ExecError("prepared statement did not produce rows")
        return out
