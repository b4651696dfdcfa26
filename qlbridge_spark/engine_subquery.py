"""Subquery lowering & decorrelation (split verbatim from engine.py).

Scalar / EXISTS / IN / quantified subqueries — uncorrelated ones fold
to plan-time literals (bounded single-row jobs), correlated ones
decorrelate into joins (semi/anti/left + grouped or windowed
aggregation) so nothing row-at-a-time ever runs. Mixed into Engine;
see engine.py for the statement pipeline."""

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


class SubqueryMixin:
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
            inner = SubqueryMixin._as_subquery_in(node.child)
            if inner is not None:
                return inner[0], inner[1], not inner[2]
        return None

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
        fields = ("columns", "where", "order_by") + (
            ("qualify",) if include_qualify else ()
        )
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

        # select list: LAZY (saves a job, nothing pushable at stake) —
        # EXCEPT in aggregated selects, where the injected 1-row
        # cross-join column would sit outside the GROUP BY (Spark's
        # MISSING_AGGREGATION); the eager literal fold is
        # aggregation-transparent. WHERE: EAGER (keeps scan pushdown).
        from . import functions as funcs

        is_agged = bool(sel.group_by) or any(
            (not c.is_star) and c.expr is not None and funcs.is_agg_tree(c.expr)
            for c in sel.columns
        )
        walk_cols = lambda n: self._walk_subqueries(n, wrap_scalar(not is_agged), make_quant_fn(not is_agged), in_fn, exists_fn)  # noqa: E731
        walk_where = lambda n: self._walk_subqueries(n, wrap_scalar(False), make_quant_fn(False), in_fn, exists_fn)  # noqa: E731
        repl = dict(
            columns=[dataclasses.replace(c, expr=walk_cols(c.expr), guard=walk_cols(c.guard)) for c in sel.columns],
            where=self._walk_where_protected(sel.where, walk_where),
        )
        if include_qualify and sel.qualify is not None:
            repl["qualify"] = walk_cols(sel.qualify)
        if sel.order_by and self._has_scalar_subquery(sel, ("order_by",)):
            # ORDER BY position: eager literal fold only (the sort runs
            # over the PROJECTED frame, so a joined column can't ride);
            # correlated/set forms raise through, as before
            def _order_scalar(sub):
                return self._materialize_scalar(sub.select)

            def _order_no(*_a, **_k):
                raise TranslateError("subquery form not supported in ORDER BY")

            walk_order = lambda n: self._walk_subqueries(n, _order_scalar, _order_no, _order_no, _order_no)  # noqa: E731
            repl["order_by"] = [(walk_order(e), d_) for e, d_ in sel.order_by]
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
        return any(SubqueryMixin._node_has_subquery(c) for c in n.children())

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

        from .nodes import ArrayNode, CaseNode, SparkColNode, TriNode

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
        if isinstance(n, CaseNode):
            # subqueries hide inside CASE arms (ANSI: CASE WHEN x >
            # (SELECT …) THEN … END in any expression position)
            return dataclasses.replace(
                n,
                operand=None if n.operand is None else walk(n.operand),
                whens=[(walk(c), walk(r)) for c, r in n.whens],
                default=None if n.default is None else walk(n.default),
            )
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
        if "order_by" in fields:
            hit = hit or any(scan(e) for e, _ in (sel.order_by or []))
        return hit
