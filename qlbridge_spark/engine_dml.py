"""DML + storage maintenance statements (split verbatim from engine.py).

INSERT/UPDATE/DELETE over registered frames and versioned sinks, ANSI
MERGE INTO, VACUUM/RESTORE/OPTIMIZE, COPY, and the ON-COMMIT
auto-compact hook. Mixed into Engine; see engine.py for the statement
pipeline."""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import functions as funcs
from .errors import ExecError
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
    FromSource,
    SqlCreate,
    SqlDelete,
    SqlInsert,
    SqlMerge,
    SqlOptimize,
    SqlRefresh,
    SqlRestore,
    SqlSelect,
    SqlSetOp,
    SqlUpdate,
    SqlVacuum,
    SqlCopy,
    SubqueryNode,
    parse_sql,
)
from .translate import Scope, TranslateError, to_column


class DmlMixin:
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
        where = d.where
        if where is not None and not any(
            isinstance(n, IdentityNode) for n in where.walk()
        ):
            from .matview import _row_local

            if _row_local(where):
                # constant predicate (WHERE TRUE / 1 = 1): a literal-true
                # filter constant-folds the kept relation to an empty
                # LocalRelation, which silently drops the COW sink's
                # observed CollectMetrics node (Observation.get then
                # fails) — evaluate the constant ONCE driver-side and
                # route TRUE to the full-table-delete path. FALSE/NULL
                # constants keep every row, so the normal path is safe.
                v = (
                    self.spark.range(1)
                    .select(to_column(where, scope).cast("boolean").alias("v"))
                    .collect()[0][0]
                )
                if v:
                    where = None
        if where is None:
            if sink is not None:
                if hasattr(sink, "_cow_split"):
                    r = sink.delete_where(None)
                    self._maybe_auto_compact(sink)
                    self._maybe_auto_refresh(d.table)
                    if r is not None:
                        return int(r)
                    return df.count()
                # non-counting sinks (e.g. Delta) mutate in place: count
                # BEFORE the delete, or the lazy frame would read 0
                n = df.count()
                sink.delete_where(None)
                self._maybe_auto_refresh(d.table)
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
