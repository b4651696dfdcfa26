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
from .errors import ExecError
from .engine_dml import DmlMixin
from .engine_select import SelectMixin
from .engine_matview import MatViewMixin
from .engine_subquery import SubqueryMixin

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")


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


class Engine(SubqueryMixin, DmlMixin, MatViewMixin, SelectMixin):
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

    def _broadcast_threshold_bytes(self) -> int:
        """``spark.sql.autoBroadcastJoinThreshold`` in bytes. The conf
        accepts byte-suffixed strings ('10m', '100MB', '512k', '-1');
        plain ``int()`` raised on those and silently fell back to 10MB,
        so a user-lowered threshold was ignored by the planner hints.
        Parse exactly as Spark does (JavaUtils) with a pure-Python
        fallback."""
        raw = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        try:
            return int(raw)
        except (TypeError, ValueError):
            pass
        try:
            return int(self.spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
        except Exception:
            pass
        try:
            s = str(raw).strip().lower()
            for suf, mult in (("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
                              ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10), ("b", 1)):
                if s.endswith(suf):
                    return int(float(s[: -len(suf)]) * mult)
        except (TypeError, ValueError):
            pass
        return 10 << 20

    def _source_bytes(self, df: DataFrame):
        """On-disk bytes of a file-backed frame (None when unknown) — the
        plan-time size signal the join reorderer ranks by. Driver-side
        metadata only; no job runs. Per-path sizes are cached for the
        engine's lifetime (the same dims are re-stat'ed by every
        statement; at real scale a table is 10^5-10^6 files and the
        listing/stat cost is planning-path driver time)."""
        import os

        cache = getattr(self, "_file_size_cache", None)
        if cache is None:
            cache = self._file_size_cache = {}
        try:
            files = df.inputFiles()
        except Exception:
            return None
        if not files:
            return None
        total = 0
        for f in files:
            sz = cache.get(f)
            if sz is None:
                p = f
                if p.startswith("file://"):
                    p = p[7:]
                elif p.startswith("file:"):
                    p = p[5:]
                try:
                    sz = os.path.getsize(p)
                except OSError:
                    return None
                cache[f] = sz
            total += sz
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
        thresh = self._broadcast_threshold_bytes()
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
        # chain-broadcast hint state: cumulative ON-DISK bytes of every
        # source joined so far (None = a side with unknown size joined).
        # When an over-threshold FACT joins a chain whose sources total
        # under the broadcast threshold, Spark's column-pruned estimates
        # can pick the FACT as the broadcast build side (measured on q05:
        # the pruned 600k-row lineitem scan estimate sits under 10MB while
        # the dim-filtered chain does not) — backwards at any scale.
        # Hinting broadcast on the chain pins the build side the right way
        # round; the hint key is on-disk bytes, the same size signal
        # Spark's own leaf estimates use, so at 10× data the chain stops
        # qualifying and the planner (plus AQE runtime broadcast) takes
        # over. Disable with ``SET planner.chain_broadcast = false``.
        cb_flag = self.session_vars.get("planner.chain_broadcast", True)
        if isinstance(cb_flag, str):
            cb_flag = cb_flag.strip().lower() not in ("false", "0", "off", "no")
        cb_thresh = self._broadcast_threshold_bytes()
        chain_bytes = self._source_bytes(df) if cb_flag and cb_thresh > 0 else None
        if chain_bytes is not None and chain_bytes > cb_thresh:
            # over threshold already — the hint can never fire (bytes only
            # grow), so stop tracking; this also short-circuits every later
            # per-source _source_bytes listing on the planning path
            chain_bytes = None
        for src in self._reorder_inner_joins(first, list(sel.from_[1:]), sel, resolved):
            if src.unnest is not None:
                joined = self._apply_unnest(joined, src, frames, physical)
                # a lateral explode multiplies rows: on-disk bytes of the
                # chain's sources no longer bound its in-memory size, so
                # the broadcast hint must not fire downstream of it
                chain_bytes = None
                continue
            if getattr(src, "lateral", False) and src.subquery is not None:
                joined = self._apply_lateral(joined, src, frames, physical)
                chain_bytes = None  # row-multiplying, as above
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
            # once the chain is untracked (None: unknown size, over
            # threshold, or row-multiplied), no later source needs sizing
            other_bytes = self._source_bytes(other) if chain_bytes is not None else None
            if src.join_expr is not None:
                cond = to_column(src.join_expr, scope)
                left = joined
                if (
                    how == "inner"
                    and chain_bytes is not None
                    and chain_bytes <= cb_thresh
                    and (other_bytes is None or other_bytes > cb_thresh)
                ):
                    left = F.broadcast(joined)
                joined = left.join(other, on=cond, how=how)
                chain_bytes = (
                    None if (chain_bytes is None or other_bytes is None) else chain_bytes + other_bytes
                )
            else:
                joined = joined.crossJoin(other)
                # a cross join multiplies rows — summing source bytes
                # under-counts arbitrarily, so stop tracking (ADVICE r16)
                chain_bytes = None
            if chain_bytes is not None and chain_bytes > cb_thresh:
                chain_bytes = None  # can never re-qualify; skip later stats
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

    def _command(self, cmd: SqlCommand):
        if cmd.kw == "SET":
            self.session_vars[cmd.ident] = _literal_value(cmd.value) if cmd.value is not None else None
            return None
        if cmd.kw == "USE":
            self.name = cmd.ident
            return None
        return None  # ROLLBACK/COMMIT are parse-only no-ops (lex/dialect_sql.go:203-210)

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
