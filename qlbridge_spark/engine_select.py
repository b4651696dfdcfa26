"""The SELECT execution plane: projection, aggregation, HAVING/QUALIFY
rewriting, and ORDER/LIMIT — split from engine.py (r14 verdict hygiene
note: the select tail is where two rounds' buzzer-beaters landed; a
540-line plane of its own keeps the next change reviewable).

Mixin methods expect the Engine host: ``self.includes``,
``self._scope_params()``, ``self.register_df``, ``self._build_from``,
``self._apply_where``, and the subquery-lowering hooks from
SubqueryMixin.
"""

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
    CaseNode,
    FuncNode,
    IdentityNode,
    Node,
    NumberNode,
    UnaryNode,
    WindowNode,
    transform,
)
from .rel import SqlSelect
from .translate import Scope, TranslateError, to_column


class SelectMixin:
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
            df, agg_order_pairs = self._aggregate(df, scope, sel)
            out_scope = Scope({"_": df}, includes=self.includes, params=self._scope_params())
            df = self._order_limit(df, out_scope, sel, post_agg=True, agg_order_pairs=agg_order_pairs)
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


    # -- aggregation -------------------------------------------------------
    def _aggregate(self, df: DataFrame, scope: Scope, sel: SqlSelect):
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
        # ORDER BY may reference aggregates too (ANSI: ORDER BY count(*)
        # after GROUP BY, incl. composites like count(*) + 1): rewrite
        # their agg subtrees to hidden agg columns now, carry those
        # columns through the final projection under their __hav_ names,
        # and hand the rewritten keys to _order_limit (which drops the
        # hidden columns after sorting)
        agg_order_pairs = None
        order_hidden_names: list[str] = []
        if sel.order_by and any(
            (not isinstance(e, NumberNode))
            and any(
                isinstance(n, FuncNode) and funcs.is_agg_func(n.name) and n.name != "distinct"
                for n in e.walk()
            )
            for e, _ in sel.order_by
        ):
            agg_order_pairs = []
            for e, direction in sel.order_by:
                if (not isinstance(e, NumberNode)) and any(
                    isinstance(n, FuncNode) and funcs.is_agg_func(n.name) and n.name != "distinct"
                    for n in e.walk()
                ):
                    ne, oextra = self._rewrite_having(e, scope)
                    hidden.extend(oextra)
                    for nd in ne.walk():
                        if isinstance(nd, IdentityNode) and nd.parts[0].startswith("__hav_"):
                            order_hidden_names.append(nd.parts[0])
                    agg_order_pairs.append((ne, direction))
                else:
                    agg_order_pairs.append((e, direction))

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
        # drop hidden having columns by name — EXCEPT the ones the
        # rewritten ORDER BY keys still need (dropped post-sort)
        keep_hidden = set(order_hidden_names)
        drop_hidden = [
            n for n in agged.columns if n.startswith("__hav_") and n not in keep_hidden
        ]
        if drop_hidden:
            agged = agged.drop(*drop_hidden)

        # order output columns as selected. Backtick-quoted: an
        # UNALIASED aggregate over a qualified column is named after its
        # text ("min(d2.dk)"), and a bare name reference would parse the
        # dot as a path separator.
        agged = agged.select(
            *[F.col("`" + n.replace("`", "``") + "`") for n in out_names],
            *[F.col(n) for n in dict.fromkeys(order_hidden_names)],
        )
        # agg_order_pairs: ORDER BY keys rewritten over hidden __hav_
        # columns, threaded explicitly to the caller's _order_limit
        return agged, agg_order_pairs

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
                    SelectMixin._hav_counter += 1
                    name = f"__hav_{SelectMixin._hav_counter}"
                    hidden.append(to_column(n, scope).alias(name))
                    return IdentityNode((name,))
                return dataclasses.replace(n, args=[walk(a) for a in n.args])
            if isinstance(n, BinaryNode):
                return BinaryNode(n.op, walk(n.left), walk(n.right), n.negated)
            if isinstance(n, UnaryNode):
                return UnaryNode(n.op, walk(n.child))
            if isinstance(n, BooleanNode):
                return BooleanNode(n.op, [walk(a) for a in n.args], n.negated)
            if isinstance(n, CaseNode):
                # agg subtrees hide inside CASE arms too (ANSI: HAVING
                # CASE WHEN sum(x) > … THEN … END, and the ORDER BY twin)
                return dataclasses.replace(
                    n,
                    operand=None if n.operand is None else walk(n.operand),
                    whens=[(walk(c), walk(r)) for c, r in n.whens],
                    default=None if n.default is None else walk(n.default),
                )
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

    def _order_limit(
        self, df: DataFrame, scope: Scope, sel: SqlSelect, post_agg: bool,
        agg_order_pairs=None,
    ) -> DataFrame:
        if sel.distinct:
            df = df.distinct()
        order_pairs = sel.order_by
        hidden_order = False
        if post_agg and agg_order_pairs is not None:
            # _aggregate rewrote ORDER BY aggregate subtrees over hidden
            # __hav_ columns it carried through its projection
            order_pairs = agg_order_pairs
            hidden_order = any(n.startswith("__hav_") for n in df.columns)
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
        if hidden_order:
            df = df.drop(*[n for n in df.columns if n.startswith("__hav_")])
        if sel.into:
            self.register_df(sel.into, df)
        return df

