"""Materialized views with INCREMENTAL maintenance over the change feed.

``CREATE MATERIALIZED VIEW mv AS SELECT g, sum(x) AS s ... FROM t GROUP
BY g`` materializes the result; ``REFRESH MATERIALIZED VIEW mv`` brings
it up to date. When the base is a versioned sink and the query is a
filter + GROUP BY over the distributive aggregates (sum / count /
count(*) / avg), the refresh is INCREMENTAL: it consumes only the
commits since the last refresh via the engine's change-data-feed
machinery (``changes_since``) and folds the signed delta into the
stored aggregation state. The aggregation work is O(|changes| +
|view|), never O(|base|) — at 100 TB, re-aggregating a table because
0.1 % of it changed is the difference between seconds and hours.
Scale honesty on the feed itself: the feed's cost is the SINK's —
Delta's native CDF reads only changed files, and ParquetMergeSink
records change rows AT COMMIT TIME for EVERY commit class — DML/MERGE
(the c<N> recordings; engine reads an N-commit backlog in ONE batched
scan), bare overwrite (an O(1) delete-all+insert-all marker), and
RESTORE (the window's recordings inverted, O(|window changes|)) — so
its feed is O(|changes|) I/O universally. Only pre-recording
warehouses and torn recordings fall back to the O(|base|)
adjacent-snapshot diff. min/max (extrema repair via
delete-touched-group re-agg), count/sum/avg(DISTINCT x) (two-level
state: a (keys, value) → signed-occurrence-count substate, exposed by
re-aggregating the O(|distinct values|) substate), filter-only
multisets, and JOIN shapes also maintain incrementally — including
BOTH sides of a fact-JOIN-dim view mutating (INNER joins fold
ΔF ⋈ D_new ∪ F_old ⋈ ΔD; the F_old scan is IN-list-pruned to the dim
delta's join keys). OUTER joins over a plain equi key fold their
NULL-EXTENSION flip terms too — a side's null-extended row
appears/disappears exactly when its key's match count on the OTHER
side crosses 0↔1, computed per key from two snapshots restricted to
the delta's keys. The full join matrix maintains incrementally:
INNER/LEFT for any row-local ON, LEFT-with-dim-deltas / RIGHT / FULL
for single-equality ONs (RIGHT/FULL run the match-count terms on every
refresh — a fact-only delta can flip a dim row's extension), and INNER
self-joins (the bilinear identity with F = D). HAVING
and ORDER BY [+LIMIT/OFFSET] apply at EXPOSE time over the aggregated
state (aggs referenced only there become hidden state columns), so
filtered-out groups re-appear the moment a delta makes them qualify.
The variance family (stddev/variance, sample and population) is
algebraic — per-group CENTERED (Σw(x−z), Σw(x−z)², n) state. DISTINCT
substates fold through every join shape (pure signed counting); FILTER
(WHERE …) folds into a guarded argument; projection windows and QUALIFY
evaluate at expose time; compound equality ONs key the flip terms on
the full tuple; median/percentile_cont and mode() maintain through the
substate multiset (exact weighted-percentile / deterministic-argmax
exposure). Extrema maintain on EVERY join shape: probe-able shapes
(single-table, INNER/LEFT/RIGHT, INNER self-joins with single-side
keys) keep O(1) scalar state + delete-repair; FULL joins and
mixed-side-key self-joins ride the multiset substate instead, where
deletes fold with no repair at all. Join ONs decompose into equality
pairs + row-local SINGLE-SIDE residual conjuncts (f.k = d.k AND
d.x > 5): residual-failing rows can never match, so the
match-count/flip terms count over residual-filtered snapshots and
treat failing rows as unconditionally unmatched. Named WINDOW specs
resolve inline at analyze time. The two-argument moment family
(corr/covar_samp/covar_pop) maintains over centered CO-moments — the
bivariate variance state (see _COVAR_AGGS). Ordered-set collects
(array_agg/string_agg(x ORDER BY x)) and variance(DISTINCT) ride the
substate multiset too. Anything beyond the algebra
(set-context/correlated subqueries, two-sided non-equi ON conjuncts,
OR-tree ONs under the flip terms, collects ordered by a DIFFERENT key
than the argument) still works as a materialized view — it just
refreshes by full recompute, and the refresh report says so.

Superset: the reference has no materialized views (its closest notion
is the continuously-evaluated view, which the engine maps to Structured
Streaming); this is the batch-incremental counterpart, modeled on the
classic view-maintenance algebra (signed delta rows: insert/update_post
= +1, delete/update_pre = −1) used by Delta Live Tables / Materialize.

Design notes:

* The view's SELECT is rewritten ONCE into a "state form" that reuses
  the parsed AST subtrees verbatim (no SQL text round-trip): key
  expressions stay as-is; each aggregate becomes signed-weight state —
  ``count(*)`` → ``sum(__w)``, ``count(x)`` → ``sum(CASE WHEN x IS NULL
  THEN 0 ELSE __w END)``, ``sum(x)`` → ``sum(__w * x)`` plus a non-null
  count so an all-NULL group still exposes NULL, ``avg(x)`` → the
  sum/count pair. The SAME state select runs for the initial build
  (over the base with ``__w = 1``) and for every delta (over the change
  rows with ``__w = ±1``), through the engine's own select pipeline —
  one semantics, no drift.
* Merging old state with a delta is one ``unionByName`` + one hash
  aggregation on the group keys (one shuffle over |view| + |delta|);
  groups whose row count reaches zero drop out (except the global-agg
  case, where ANSI keeps the single row).
* The WHERE filter is applied to delta rows too — row-local predicates
  commute with the signed-delta algebra, so an update that moves a row
  across the filter boundary nets out correctly (preimage −1 inside,
  postimage filtered out).
* Exposed columns are cast to the exact dtypes of the original query
  (captured from its analyzed schema at CREATE — analysis only, no
  job), so an incremental view is schema-identical to a recompute.
* State persists via ``localCheckpoint`` by default; ``WITH {"path":
  "..."}`` stores it in a ``ParquetMergeSink`` instead — durable,
  versioned (the view itself becomes time-travelable), and the refresh
  then reads/writes only the state table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .nodes import (
    BinaryNode,
    BooleanNode,
    CaseNode,
    FuncNode,
    IdentityNode,
    Node,
    NullNode,
    NumberNode,
    StringNode,
    UnaryNode,
    WindowNode,
)
from .rel import Column, FromSource, SqlSelect, SubqueryNode


# foundations / state / exposure planes (round-14 split — same pattern
# as the engine.py split; everything re-exports from here so importers
# are unchanged)
from .matview_core import (  # noqa: F401
    _COVAR_AGGS,
    _DISTINCT_AGGS,
    _EXTREMUM_AGGS,
    _HOLISTIC_AGGS,
    _INCREMENTAL_AGGS,
    _ORDERED_AGGS,
    _ORDERED_BASE,
    _PAIR_AGGS,
    _SET_EXTREMA,
    _SORT_AGGS,
    _SORT_DISTINCT,
    _SUBSTATE_AGGS,
    _UNSET,
    _VARIANCE_AGGS,
    _VARIANCE_DISTINCT,
    _W,
    AggSpec,
    MatView,
    NEG_FLAG,
    _and_tree,
    _conjuncts,
    _contains_distinct,
    _row_local,
    _snapshot_cols,
    _subst,
    effective_where,
    equi_join_pairs,
    equi_join_prune_cols,
    join_on_parts,
)
from .matview_expose import exposed_frame  # noqa: F401
from .matview_state import (  # noqa: F401
    _apply_variance_overlay,
    _semi_by_keys,
    _state_select,
    _sub_select,
    _variance_row_select,
    _weight_node,
    merge_state,
    merge_substates,
    persist_state,
    persist_substates,
    repair_extrema,
    state_frame,
    sub_state_frames,
)

def _corr_split(engine, base_name: str, base_src, sub):
    """The shared correlation decomposition for WHERE-context subqueries
    (EXISTS / correlated scalar): ``(s_src, sname, s_expr, outer_expr,
    rest)`` when ``sub`` is a single-table select over a versioned sink
    (not the base itself) whose WHERE splits into exactly ONE cross-side
    correlation equality plus s-local row-local conjuncts; None
    otherwise. Column-list constraints are the callers' — membership
    ignores the list, a scalar requires one aggregate."""
    if not isinstance(sub, SqlSelect) or len(sub.from_) != 1:
        return None
    s = sub.from_[0]
    if (
        s.name is None
        or s.subquery is not None
        or s.pivot is not None
        or s.unpivot is not None
        or s.sample is not None
        or s.unnest is not None
        or s.values_rows is not None
        or s.table_changes is not None
        or s.version is not None
        or s.as_of_ts is not None
    ):
        return None
    sname = s.name.lower()
    if sname == base_name:
        return None  # self-referential subquery: correlation ambiguity
    snk = engine.sinks.get(sname)
    if snk is None or not hasattr(snk, "versions") or sname in engine.tables:
        return None
    if (
        sub.group_by
        or sub.having is not None
        or getattr(sub, "qualify", None) is not None
        or getattr(sub, "windows", None)
        or sub.limit is not None
        or getattr(sub, "offset", None)
        or getattr(sub, "grouping_sets", None)
    ):
        return None
    if sub.where is None:
        return None  # uncorrelated: the callers' constant-truth/frozen paths
    if any(isinstance(n, (SubqueryNode, WindowNode)) for n in sub.where.walk()):
        return None
    s_cols = _snapshot_cols(engine, snk)
    base_cols = _snapshot_cols(engine, engine.sinks[base_name])
    s_refs = {sname, (s.alias or "").lower()} - {""}
    b_refs = {base_name, (base_src.alias or "").lower()} - {""}

    def _side(node):
        """('ok', side) — side 's' / 'b' / None (no identifiers); None
        when any identifier is unresolvable or the sides mix."""
        side = None
        for n in node.walk():
            if isinstance(n, IdentityNode):
                parts = [p.lower() for p in n.parts]
                col = parts[-1]
                if len(parts) > 1:
                    if parts[0] in s_refs and col in s_cols:
                        cur = "s"
                    elif parts[0] in b_refs and col in base_cols:
                        cur = "b"
                    else:
                        return None
                elif col in s_cols and col not in base_cols:
                    cur = "s"
                elif col in base_cols and col not in s_cols:
                    cur = "b"
                else:
                    return None
                if side is not None and cur != side:
                    return None
                side = cur
        return ("ok", side)

    corr = None
    rest = []
    for cj in _conjuncts(sub.where):
        if (
            isinstance(cj, BinaryNode)
            and cj.op in ("=", "==")
            and not getattr(cj, "negated", False)
        ):
            ls, rs = _side(cj.left), _side(cj.right)
            if (
                ls is not None
                and rs is not None
                and {ls[1], rs[1]} == {"s", "b"}
            ):
                if corr is not None:
                    return None  # one correlation key only
                corr = (cj.left, cj.right) if ls[1] == "s" else (cj.right, cj.left)
                continue
        sd = _side(cj)
        if sd is None or sd[1] == "b" or not _row_local(cj):
            return None
        rest.append(cj)
    if corr is None:
        return None
    s_expr, outer_expr = corr
    if not _row_local(outer_expr) or not _row_local(s_expr):
        return None
    return s, sname, s_expr, outer_expr, rest, _side


def _analyze_exists_sub(engine, base_name: str, base_src, sub):
    """``(outer key expr, membership select, table)`` for a CORRELATED
    ``[NOT] EXISTS (SELECT … FROM s WHERE s.col = <outer expr> AND
    <s-local rest>)`` the semi-join delta algebra maintains. The
    subquery's select list is irrelevant — membership only needs the
    correlation column — so this rewrites to the same 1-column-dim
    shape as ``IN (SELECT …)``: exactly one cross-side correlation
    equality, everything else s-local and row-local."""
    from . import functions as funcs

    if isinstance(sub, SqlSelect) and any(
        (not c.is_star) and c.expr is not None and funcs.is_agg_tree(c.expr)
        for c in sub.columns
    ):
        return None
    split = _corr_split(engine, base_name, base_src, sub)
    if split is None:
        return None
    s, sname, s_expr, outer_expr, rest, _ = split
    mem = SqlSelect(
        columns=[Column(expr=s_expr, alias="__mv_inv0")],
        from_=[s],
        where=_and_tree(rest),
    )
    return outer_expr, mem, sname


def _analyze_csc_sub(engine, base_name: str, base_src, sub):
    """``(outer key expr, grouped select, empty select, table)`` for a
    CORRELATED SCALAR subquery ``(SELECT <agg over s> FROM s WHERE
    s.col = <outer expr> AND <s-local rest>)`` the per-row flip algebra
    maintains (MatView.csc_pred). The per-key scalar is a 1-column dim:
    the grouped select computes (correlation key → scalar) over any
    slice of s, and the empty select computes ANSI's agg-over-no-rows
    value (the scalar for keys with no matching s rows). The aggregate
    expression can be ANY engine-executable aggregation tree — both
    refresh-time evaluations run it through the engine itself, so no
    agg-specific delta algebra is assumed (min/median/DISTINCT all
    work); the reference executes these via the same per-key
    decorrelation (exec/join.go's subquery path), one key at a time."""
    from . import functions as funcs

    if not isinstance(sub, SqlSelect) or len(sub.columns) != 1 or sub.order_by:
        return None
    col = sub.columns[0]
    if col.is_star or col.expr is None or col.guard is not None or col.exclude or col.replace:
        return None
    if not funcs.is_agg_tree(col.expr):
        return None  # non-aggregate scalar: >1-row errors aren't provable static
    if any(isinstance(n, (SubqueryNode, WindowNode)) for n in col.expr.walk()):
        return None
    split = _corr_split(engine, base_name, base_src, sub)
    if split is None:
        return None
    s, sname, s_expr, outer_expr, rest, side_of = split
    # the aggregate must be s-local once the correlation is split out
    # (_corr_split side-checks only the WHERE; the select list could
    # still smuggle an outer reference). count(*)'s star identity is
    # side-neutral — skip it, side-check every other identifier.
    if not _row_local(col.expr):
        return None
    for n in col.expr.walk():
        if isinstance(n, IdentityNode) and n.parts != ("*",):
            sd = side_of(n)
            if sd is None or sd[1] == "b":
                return None
    grouped = SqlSelect(
        columns=[
            Column(expr=s_expr, alias="__mv_cck"),
            Column(expr=col.expr, alias="__mv_csc"),
        ],
        from_=[s],
        where=_and_tree(rest),
        group_by=[s_expr],
    )
    empty = SqlSelect(
        columns=[Column(expr=col.expr, alias="__mv_csc")],
        from_=[s],
        where=_and_tree(
            rest + [BinaryNode(op="=", left=NumberNode("1"), right=NumberNode("0"))]
        ),
    )
    return outer_expr, grouped, empty, sname


def _null_rejecting(conjs: list, expr) -> bool:
    """True when one of ``conjs`` proves ``expr`` non-NULL on qualifying
    rows: the exact ``expr IS NOT NULL``, or an un-negated SQL comparison
    with expr as one whole side — comparisons propagate NULL, so a NULL
    expr can never satisfy them."""
    for c in conjs:
        if not isinstance(c, BinaryNode):
            continue
        if (
            c.op == "IS"
            and getattr(c, "negated", False)
            and isinstance(c.right, NullNode)
            and c.left == expr
        ):
            return True
        if (
            c.op in ("=", "==", "!=", "<", ">", "<=", ">=")
            and not getattr(c, "negated", False)
            and (c.left == expr or c.right == expr)
        ):
            return True
    return False


def _not_in_provable(engine, base_name: str, base_src, cj, rest: list) -> bool:
    """NOT IN (and ``<> ALL``) ride the anti-membership machinery ONLY
    when ANSI's two NULL traps are statically closed:

    - one NULL in the inner set empties the whole result (``k NOT IN
      {…, NULL}`` is never TRUE) — the inner value must be provably
      non-NULL;
    - a NULL outer key qualifies under NOT IN iff the set is EMPTY, but
      always under an anti-join — the outer key must be provably
      non-NULL on qualifying rows.

    Proof, per side: a null-rejecting sibling conjunct
    (``_null_rejecting``), else Catalyst's analyzed ``nullable=False``
    (schema-only, no job). Unprovable → the view stays full-recompute,
    the pre-r15 behavior."""
    sub = cj.right.select
    inner = sub.columns[0].expr
    sub_conjs = _conjuncts(sub.where) if sub.where is not None else []
    if not _null_rejecting(sub_conjs, inner):
        try:
            if engine._select_any(sub).schema.fields[0].nullable:
                return False
        except Exception:
            return False
    if not _null_rejecting(rest, cj.left):
        from .translate import Scope, to_column

        try:
            df = engine.sinks[base_name].scan(engine.spark)
            col = to_column(
                cj.left,
                Scope({base_src.alias or base_name: df}, includes=engine.includes),
            )
            if df.select(col).schema.fields[0].nullable:
                return False
        except Exception:
            return False
    return True


def _analyze_in_sub(engine, sub) -> str | None:
    """The IN-subquery's base-table name when the semi-join delta
    algebra can maintain membership: ``SELECT <row-local expr> FROM <one
    versioned sink> [WHERE row-local]``, optionally DISTINCT (membership
    is a >0 test, so multiplicity never matters). Grouping, aggregation,
    windows, nested subqueries, limits and set ops stay full-recompute —
    their deltas aren't row-local in the subquery's base."""
    from . import functions as funcs

    if not isinstance(sub, SqlSelect) or len(sub.from_) != 1:
        return None
    s = sub.from_[0]
    if (
        s.name is None
        or s.subquery is not None
        or s.pivot is not None
        or s.unpivot is not None
        or s.sample is not None
        or s.unnest is not None
        or s.values_rows is not None
        or s.table_changes is not None
        or s.version is not None
        or s.as_of_ts is not None
    ):
        return None
    sname = s.name.lower()
    snk = engine.sinks.get(sname)
    if snk is None or not hasattr(snk, "versions") or sname in engine.tables:
        return None
    if (
        sub.group_by
        or sub.having is not None
        or getattr(sub, "qualify", None) is not None
        or getattr(sub, "windows", None)
        or sub.limit is not None
        or getattr(sub, "offset", None)
        or getattr(sub, "grouping_sets", None)
        or getattr(sub, "group_mode", None)
        or getattr(sub, "group_all", None)
        or getattr(sub, "distinct_on", None)
        or getattr(sub, "into", None)
        or len(sub.columns) != 1
    ):
        return None
    col = sub.columns[0]
    if col.is_star or col.guard is not None or col.exclude or col.replace:
        return None
    if funcs.is_agg_tree(col.expr) or not _row_local(col.expr):
        return None
    if any(isinstance(n, (WindowNode, SubqueryNode)) for n in col.expr.walk()):
        return None
    if sub.where is not None and not _row_local(sub.where):
        return None
    return sname



def _parse_agg(e: Node):
    """``(kind, arg, p, arg2)`` when ``e`` is an aggregate call the
    signed-delta algebra maintains (the AggSpec vocabulary), else None;
    ``p`` is the percentile fraction for the sort-agg family and
    ``arg2`` the second argument of the corr/covar family (None
    otherwise).

    ``agg(x) FILTER (WHERE p)`` folds into the ARG: every agg in the
    vocabulary ignores NULL inputs, so guarding the argument with
    ``CASE WHEN p THEN x END`` makes the existing state algebra compute
    the filtered aggregate exactly — count(*) FILTER becomes a plain
    count over a guarded 1, DISTINCT substates group the guarded value
    (non-qualifying rows land on the NULL value, dropped at expose)."""
    if (
        not isinstance(e, FuncNode)
        or e.name
        not in _INCREMENTAL_AGGS
        | _EXTREMUM_AGGS
        | _VARIANCE_AGGS
        | _SORT_AGGS
        | _HOLISTIC_AGGS
        | _COVAR_AGGS
        | _ORDERED_BASE
    ):
        return None
    if e.ignore_nulls:
        return None
    if e.name in _ORDERED_BASE:
        # ordered-set collect. ONE key == argument: the multiset's
        # sorted support with repeats IS the collected sequence (kinds
        # *_sorted). Any other single-direction key list: the substate
        # grains by (keys, order-keys…, value) so the pairing is
        # retained — state is O(distinct (okeys, value) tuples per
        # group), the inherent cost (kinds *_pair); ties fall through
        # key by key to the value, exactly the engine's struct
        # comparator. Mixed directions are out (the engine's sort_array
        # contract is single-direction); unordered forms are
        # NONDETERMINISTIC (engine contract) — never maintained.
        # FILTER stays out: the guard would desync keys and argument.
        if not e.agg_order or e.filter_where is not None:
            return None
        dirs = {str(d_).upper().startswith("DESC") for _, d_ in e.agg_order}
        if len(dirs) != 1:
            return None
        okeys = [k for k, _ in e.agg_order]
        arg = e.args[0]
        if (
            _contains_distinct(arg)
            or not _row_local(arg)
            or any(_contains_distinct(k) or not _row_local(k) for k in okeys)
        ):
            return None
        sep = None
        if e.name in ("string_agg", "listagg"):
            if len(e.args) > 1:
                if not isinstance(e.args[1], StringNode):
                    return None
                sep = e.args[1]
            base = "string_agg"
        else:
            if len(e.args) != 1:
                return None
            base = "array_agg"
        sorted_form = len(okeys) == 1 and okeys[0] == arg
        base += "_sorted" if sorted_form else "_pair"
        kind = base + ("_desc" if dirs.pop() else "")
        if sorted_form:
            return (kind, arg, None, sep)
        return (kind, arg, None, sep, tuple(okeys))
    if e.agg_order:
        return None
    p = None
    if e.name in _COVAR_AGGS:
        if len(e.args) != 2:
            return None
        x, y = e.args
        if any(
            _contains_distinct(a) or not _row_local(a) for a in (x, y)
        ):
            return None
        filt = e.filter_where
        if filt is not None and not _row_local(filt):
            return None
        if filt is not None:
            guard_c = lambda a: CaseNode(operand=None, whens=[(filt, a)], default=None)  # noqa: E731
            x, y = guard_c(x), guard_c(y)
        return (e.name, x, None, y)
    if e.name == "percentile_cont":
        # percentile_cont(x, p) — p must be a literal fraction (the
        # substate exposure bakes it into the interpolation target)
        if (
            len(e.args) != 2
            or not isinstance(e.args[1], NumberNode)
            or not 0.0 <= float(e.args[1].value) <= 1.0
        ):
            return None
        p = float(e.args[1].value)
    elif e.name == "median":
        if len(e.args) != 1:
            return None
        p = 0.5
    elif len(e.args) != 1:
        return None
    filt = e.filter_where
    if filt is not None and not _row_local(filt):
        return None

    def guard(a: Node) -> Node:
        if filt is None:
            return a
        return CaseNode(operand=None, whens=[(filt, a)], default=None)

    arg = e.args[0]
    if isinstance(arg, IdentityNode) and arg.is_star:
        if e.name != "count":
            return None
        if filt is not None:
            return ("count", guard(NumberNode("1")), None, None)
        return ("count_star", None, None, None)
    if isinstance(arg, FuncNode) and arg.name == "distinct":
        # count/sum/avg(DISTINCT x); min/max(DISTINCT x) ≡ min/max(x);
        # the variance family rides the substate too (exposure = plain
        # variance over the multiset's values), as do the sort aggs
        # (exposure interpolates over the support counting each distinct
        # value ONCE). mode(DISTINCT x) ≡ min(x): every distinct value
        # occurs once, so the deterministic tie-to-smallest argmax IS
        # the minimum — it rides the plain extremum machinery.
        if len(arg.args) != 1:
            return None
        inner = arg.args[0]
        if _contains_distinct(inner) or not _row_local(inner):
            return None
        if e.name == "mode":
            return ("min", guard(inner), None, None)
        if e.name in _EXTREMUM_AGGS:
            return (e.name, guard(inner), None, None)
        return (f"{e.name}_distinct", guard(inner), p, None)
    if _contains_distinct(arg) or not _row_local(arg):
        return None
    return (e.name, guard(arg), p, None)



def analyze(engine, select: SqlSelect) -> MatView | None:
    """Incremental-maintenance analysis. Returns a MatView skeleton
    (keys + agg specs, no frames) when the query fits the signed-delta
    algebra over a versioned-sink base; None → full-recompute MV."""
    if len(select.from_) not in (1, 2):
        return None

    def _plain_table(s: FromSource) -> bool:
        return not (
            s.name is None
            or s.subquery is not None
            or s.pivot is not None
            or s.unpivot is not None
            or s.sample is not None
            or s.unnest is not None
            or s.values_rows is not None
            or s.table_changes is not None
            or s.version is not None
            or s.as_of_ts is not None
        )

    src = select.from_[0]
    if not _plain_table(src):
        return None
    nm = src.name.lower()
    sink = engine.sinks.get(nm)
    if sink is None or not hasattr(sink, "versions") or nm in engine.tables:
        return None
    dim_name = None
    if len(select.from_) == 2:
        # incremental JOIN view: Δ(F ⋈ D) = ΔF ⋈ D holds when the dim is
        # unchanged and the join is INNER/LEFT (each fact row contributes
        # exactly its own joined rows — row-local in the fact). When the
        # dim also moved, INNER joins still maintain incrementally via
        # ΔF ⋈ D_new ∪ F_old ⋈ ΔD (see engine._refresh). The dim must be
        # a versioned sink so its commits are DETECTABLE.
        d = select.from_[1]
        if not _plain_table(d):
            return None
        if d.join_type not in (
            "INNER",
            "LEFT",
            "LEFT OUTER",
            "RIGHT",
            "RIGHT OUTER",
            "FULL",
            "FULL OUTER",
        ):
            return None
        if d.join_expr is None or not _row_local(d.join_expr):
            return None
        dn = d.name.lower()
        if dn == nm and d.join_type != "INNER":
            return None  # outer self-join: null terms entangle both sides
        # INNER self-joins maintain via the SAME bilinear identity with
        # F = D: Δ(F⋈F) = ΔF⋈F_new ∪ F_old⋈ΔF — both refresh terms read
        # the one table's delta/snapshots (the dim side resolves by
        # table NAME, the fact side by the reserved temp frame, so the
        # pin/substitute machinery works unchanged). Extrema repair
        # probes one OCCURRENCE when every group key is alias-qualified
        # to a single side; mixed-side keys ride the multiset substate
        # (deduced below). DISTINCT substates maintain unchanged
        # (test_distinct_on_dim_preserved_and_self_joins).
        dim_sink = engine.sinks.get(dn)
        if dim_sink is None or not hasattr(dim_sink, "versions") or dn in engine.tables:
            return None  # drift-undetectable dim → full recompute
        dim_name = dn
    if select.windows:
        # named WINDOW w AS (...) specs: apply the SAME ref-resolution
        # rewrite the engine runs pre-translate, so the expose-time
        # window machinery below sees plain inline OVER (...) windows
        # (the rewrite returns a copy with windows={})
        from .engine import Engine

        select = Engine._resolve_named_windows(select)
    if (
        select.distinct
        or select.distinct_on
        or select.group_mode
        or select.grouping_sets
        or select.group_all
        or select.order_all
        or select.into
    ):
        # NOTE: select.with_ is the reference's trailing config map (not
        # CTEs — those parse as CteQuery), so it does not block
        # incremental maintenance
        return None
    if select.where is not None and not _row_local(select.where):
        # RANGE-QUANTIFIED conjuncts rewrite to scalar extrema so the
        # frozen-scalar machinery below can take them (r15):
        #   x > ANY(S) ⟺ x > min(S)   x > ALL(S) ⟺ x > max(S)
        #   x < ANY(S) ⟺ x < max(S)   x < ALL(S) ⟺ x < min(S)
        # ANY is unconditionally sound in WHERE context: empty set →
        # extremum NULL → comparison not-TRUE = ANY's FALSE, and inner
        # NULLs are ignored by the extremum exactly as ANY's three-
        # valued result never turns TRUE on them. ALL diverges on BOTH
        # (empty set → TRUE; one inner NULL → never TRUE), so it needs
        # the inner value provably non-NULL and an OR'd empty-set guard.
        import dataclasses as _dc

        def _quant_rewrite(cj):
            if not (
                isinstance(cj, BinaryNode)
                and isinstance(cj.right, SubqueryNode)
                and not getattr(cj, "negated", False)
                and (cj.op.endswith(" ANY") or cj.op.endswith(" ALL"))
            ):
                return cj
            base, _, quant = cj.op.partition(" ")
            eq_form = (base, quant) in (("=", "ALL"), ("!=", "ANY"))
            if base not in (">", ">=", "<", "<=") and not eq_form:
                return cj  # = ANY / != ALL are membership (the IN machinery's)
            sub = cj.right.select
            if (
                not isinstance(sub, SqlSelect)
                or len(sub.columns) != 1
                or sub.columns[0].is_star
                or sub.columns[0].expr is None
            ):
                return cj
            col = sub.columns[0].expr
            from . import functions as funcs

            if funcs.is_agg_tree(col) or sub.group_by:
                return cj
            if eq_form:
                # r16: the equality-quantified twins pair BOTH extrema:
                #   x  = ALL(S) ⟺ count(S)=0 OR (x = min(S) AND x = max(S))
                #   x != ANY(S) ⟺ count(S)>0 AND (x != min(S) OR x != max(S))
                # `!= ANY` is unconditionally sound in WHERE context: an
                # inner NULL makes the quantifier NULL only when every
                # non-NULL element equals x — then min=max=x and the
                # rewrite reads FALSE, the same not-TRUE; empty set →
                # both are not-TRUE via the count guard. `= ALL` shares
                # `op ALL`'s traps (empty set → TRUE is the count guard;
                # an inner NULL blocks TRUE but min/max silently drop
                # NULLs) → inner value must be provably non-NULL.
                def _ext(agg):
                    return SubqueryNode(
                        select=_dc.replace(
                            sub, columns=[Column(expr=FuncNode(agg, [col]))]
                        )
                    )

                count_sub = SubqueryNode(
                    select=_dc.replace(
                        sub,
                        columns=[Column(expr=FuncNode("count", [IdentityNode(("*",))]))],
                    )
                )
                if quant == "ALL":
                    sub_conjs = _conjuncts(sub.where) if sub.where is not None else []
                    if not _null_rejecting(sub_conjs, col):
                        try:
                            if engine._select_any(sub).schema.fields[0].nullable:
                                return cj
                        except Exception:
                            return cj
                    return BinaryNode(
                        "OR",
                        BinaryNode(
                            "AND",
                            BinaryNode("=", cj.left, _ext("min")),
                            BinaryNode("=", cj.left, _ext("max")),
                        ),
                        BinaryNode("=", count_sub, NumberNode("0")),
                    )
                return BinaryNode(
                    "AND",
                    BinaryNode(
                        "OR",
                        BinaryNode("!=", cj.left, _ext("min")),
                        BinaryNode("!=", cj.left, _ext("max")),
                    ),
                    BinaryNode(">", count_sub, NumberNode("0")),
                )
            agg = "min" if (base in (">", ">=")) == (quant == "ANY") else "max"
            cmp_node = BinaryNode(
                base,
                cj.left,
                SubqueryNode(
                    select=_dc.replace(
                        sub, columns=[Column(expr=FuncNode(agg, [col]))]
                    )
                ),
            )
            if quant == "ANY":
                return cmp_node
            sub_conjs = _conjuncts(sub.where) if sub.where is not None else []
            if not _null_rejecting(sub_conjs, col):
                try:
                    if engine._select_any(sub).schema.fields[0].nullable:
                        return cj
                except Exception:
                    return cj
            empty = BinaryNode(
                "=",
                SubqueryNode(
                    select=_dc.replace(
                        sub,
                        columns=[Column(expr=FuncNode("count", [IdentityNode(("*",))]))],
                    )
                ),
                NumberNode("0"),
            )
            return BinaryNode("OR", cmp_node, empty)

        def _exists_rewrite(cj):
            """UNCORRELATED and NON-EQUI-CORRELATED ``[NOT] EXISTS``
            conjuncts rewrite to uncorrelated scalar subqueries (r16) so
            the frozen-scalar machinery below can take them:

              EXISTS(SELECT … FROM s WHERE <s-local>)
                ⟺ (SELECT count(*) FROM s WHERE <s-local>) > 0
              EXISTS(… WHERE s_expr > X AND <s-local>)      [X outer]
                ⟺ X < (SELECT max(s_expr) FROM s WHERE <s-local>)
              NOT EXISTS(… WHERE s_expr > X AND <s-local>)
                ⟺ X >= (SELECT max …) OR X IS NULL
                  OR (SELECT count(s_expr) …) = 0

            The count forms are EXACT (EXISTS/count are never NULL);
            the extremum forms are WHERE-context sound: a NULL outer X
            or an all-NULL witness column makes both sides not-TRUE
            (positive form) or lands on the explicit guards (negated
            form, which counts NON-NULL witnesses). Equality-correlated
            EXISTS is deliberately left alone — the membership
            machinery maintains it with per-key flips, which beats a
            frozen scalar's full-rebuild-on-move."""
            neg = False
            node = cj
            if isinstance(node, UnaryNode) and node.op.upper() == "NOT":
                node, neg = node.child, True
            if not (
                isinstance(node, UnaryNode)
                and node.op.upper() == "EXISTS"
                and isinstance(node.child, SubqueryNode)
            ):
                return cj
            sub = node.child.select
            if not isinstance(sub, SqlSelect) or len(sub.from_) != 1:
                return cj
            s = sub.from_[0]
            if not _plain_table(s):
                return cj
            if (
                sub.group_by
                or sub.having is not None
                or getattr(sub, "qualify", None) is not None
                or sub.limit is not None
                or getattr(sub, "offset", None)
                or getattr(sub, "grouping_sets", None)
            ):
                return cj
            from . import functions as funcs

            if any(
                (not c.is_star) and c.expr is not None and funcs.is_agg_tree(c.expr)
                for c in sub.columns
            ):
                # an aggregate select list yields exactly one row even
                # over zero inputs — EXISTS is then unconditionally
                # TRUE, which the count rewrite would get wrong
                return cj
            sname = s.name.lower()
            try:
                if sname in engine.tables:
                    s_cols = {c.lower() for c in engine.tables[sname].columns}
                else:
                    s_cols = _snapshot_cols(engine, engine.sinks[sname])
                base_cols = _snapshot_cols(engine, sink)
            except Exception:
                return cj
            s_refs = {sname, (s.alias or "").lower()} - {""}
            b_refs = {nm, (src.alias or "").lower()} - {""}

            def _sd(node_):
                """'s' / 'b' / None(no idents) for every identifier in
                ``node_``; 'x' on a mix; False on an unresolvable name.
                Bare names prefer the INNER scope (SQL shadowing)."""
                side = None
                for n in node_.walk():
                    if isinstance(n, IdentityNode):
                        parts = [p.lower() for p in n.parts]
                        col = parts[-1]
                        if len(parts) > 1:
                            if parts[0] in s_refs and col in s_cols:
                                cur = "s"
                            elif parts[0] in b_refs and col in base_cols:
                                cur = "b"
                            else:
                                return False
                        elif col in s_cols:
                            cur = "s"  # inner scope shadows the outer
                        elif col in base_cols:
                            cur = "b"
                        else:
                            return False
                        if side is not None and cur != side:
                            side = "x"
                        elif side != "x":
                            side = cur
                return side

            wconjs = _conjuncts(sub.where) if sub.where is not None else []
            if any(
                isinstance(n, (SubqueryNode, WindowNode))
                for c in wconjs
                for n in c.walk()
            ):
                return cj
            rest = []
            corr = None  # (s_expr, outer_expr, base_op) normalized s-side-first
            _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            for c in wconjs:
                sd = _sd(c)
                if sd in ("s", None):
                    if not _row_local(c):
                        return cj
                    rest.append(c)
                    continue
                if (
                    isinstance(c, BinaryNode)
                    and c.op in _FLIP
                    and not getattr(c, "negated", False)
                ):
                    ls, rs = _sd(c.left), _sd(c.right)
                    if {ls, rs} == {"s", "b"} and _row_local(c.left) and _row_local(c.right):
                        if corr is not None:
                            return cj  # one comparison correlation only
                        corr = (
                            (c.left, c.right, c.op)
                            if ls == "s"
                            else (c.right, c.left, _FLIP[c.op])
                        )
                        continue
                return cj  # equality correlation (membership's) or unclassifiable

            def _sub_of(cols):
                return SubqueryNode(
                    select=SqlSelect(
                        columns=cols, from_=[s], where=_and_tree(rest)
                    )
                )

            if corr is None:
                # uncorrelated: an exact count guard
                cnt = _sub_of([Column(expr=FuncNode("count", [IdentityNode(("*",))]))])
                return BinaryNode("=" if neg else ">", cnt, NumberNode("0"))
            s_expr, outer_expr, base_op = corr
            # EXISTS(s_expr <op> X): the witness extremum is max for
            # >/>= (any witness below the max works), min for </<=
            agg = "max" if base_op in (">", ">=") else "min"
            ext = _sub_of([Column(expr=FuncNode(agg, [s_expr]))])
            if not neg:
                # X <flipped-op> extremum
                return BinaryNode(_FLIP[base_op], outer_expr, ext)
            # NOT EXISTS: negate the comparison on the NON-NULL witness
            # set, with the NULL-outer and empty-set traps as OR guards
            _NEG = {">": "<=", ">=": "<", "<": ">=", "<=": ">"}
            cmpn = BinaryNode(_NEG[_FLIP[base_op]], outer_expr, ext)
            isnull = BinaryNode("IS", outer_expr, NullNode())
            cnt_nn = _sub_of([Column(expr=FuncNode("count", [s_expr]))])
            return BinaryNode(
                "OR",
                BinaryNode("OR", cmpn, isnull),
                BinaryNode("=", cnt_nn, NumberNode("0")),
            )

        qconjs = [_exists_rewrite(_quant_rewrite(c)) for c in _conjuncts(select.where)]
        new_where = _and_tree(qconjs)
        if new_where != select.where:
            select = _dc.replace(select, where=new_where)
    scalar_subs: list = []
    in_sub: tuple | None = None  # (key expr, subquery select, table)
    in_sub2: tuple | None = None  # second membership conjunct (r16)
    where_rest = select.where
    if select.where is not None and not _row_local(select.where):
        # set-context decomposition first: ONE top-level conjunct that
        # is either ``<row-local> IN (SELECT v FROM s ...)`` or a
        # correlated ``[NOT] EXISTS (SELECT ... FROM s WHERE s.col =
        # <outer expr> ...)`` over a single-table view — both maintain
        # as a 1-column dim with match-state flip terms
        # (engine._refresh_one); NOT EXISTS is the anti-membership twin
        # (inverted signs, anti-join filter). NOT IN stays full (ANSI
        # NULL semantics: one NULL in the list empties the view — not a
        # per-key flip).
        def _exists_of(cj):
            neg = False
            if isinstance(cj, UnaryNode) and cj.op.upper() == "NOT":
                cj, neg = cj.child, True
            if (
                isinstance(cj, UnaryNode)
                and cj.op.upper() == "EXISTS"
                and isinstance(cj.child, SubqueryNode)
            ):
                return cj.child, neg
            return None

        # r15: set contexts also maintain on INNER-join views when the
        # outer key is FACT-side — the trilinear identity adds one term:
        #   Δ = (ΔF⋉M_new) ⋈ D_new  +  (F_old⋉M_new) ⋈ ΔD
        #       +  (F_old·flip) ⋈ D_old
        # (membership/scalar filters apply to fact INPUT frames; the
        # per-term dim pinning is engine._refresh_one's). LEFT joins
        # compose too — only the FACT side null-extends, and membership
        # is a fact-side filter, so T_a/flip rows carry their own LEFT
        # images; a DIM commit folds as well (r16): the T4
        # null-extension flips compose with membership over the
        # trilinear midpoint G_mid = F_old ⋉ M_new, keyed on the ON's
        # equality pairs (pairless ONs take one full recompute —
        # engine._refresh_one's guard). RIGHT/FULL
        # stay single-table (the dim-preserved side needs fact match
        # counts on EVERY refresh, which membership perturbs); s must
        # differ from the dim (shared feed → cross-terms).
        _set_ctx_join = dim_name is not None and dim_name != nm and (
            select.from_[1].join_type in ("INNER", "LEFT", "LEFT OUTER")
        )
        _set_ctx_ok = len(select.from_) == 1 or _set_ctx_join

        def _fact_side(expr) -> bool:
            """Every identifier in ``expr`` resolves on the FACT side
            (trivially true for single-table views)."""
            if len(select.from_) == 1:
                return True
            f_cols = _snapshot_cols(engine, sink)
            d_cols = _snapshot_cols(engine, engine.sinks[dim_name])
            f_refs = {nm, (src.alias or "").lower()} - {""}
            for n in expr.walk():
                if isinstance(n, IdentityNode):
                    parts = [p.lower() for p in n.parts]
                    col = parts[-1]
                    if len(parts) > 1:
                        if parts[0] in f_refs and col in f_cols:
                            continue
                        return False
                    elif col in f_cols and col not in d_cols:
                        continue
                    else:
                        return False
            return True

        conjs = _conjuncts(select.where)
        ctx_idx: list = []  # [(kind, conjunct index)], kind ∈ {"in", "ex"}
        for i, cj in enumerate(conjs):
            if isinstance(cj, BinaryNode) and isinstance(cj.right, SubqueryNode) and (
                cj.op == "IN"  # either negation: NOT IN handled below
                # quantified-equality forms: `= ANY` IS membership and
                # `<> ALL` IS anti-membership, NULL semantics included
                or (cj.op == "= ANY" and not getattr(cj, "negated", False))
                or (cj.op == "!= ALL" and not getattr(cj, "negated", False))
            ):
                ctx_idx.append(("in", i))
            elif _exists_of(cj) is not None:
                ctx_idx.append(("ex", i))

        def _ctx_of(kind, i, rest):
            """``(key, select, table, negated)`` when conjunct ``i`` is
            an eligible membership context given the row-local ``rest``
            (NULL-trap provability for the negated forms), else None."""
            cj = conjs[i]
            if kind == "in":
                if not (_row_local(cj.left) and _fact_side(cj.left)):
                    return None
                sub_tbl = _analyze_in_sub(engine, cj.right.select)
                neg = getattr(cj, "negated", False) or cj.op == "!= ALL"
                if sub_tbl is None or sub_tbl == dim_name:
                    return None
                if neg and not _not_in_provable(engine, nm, src, cj, rest):
                    # NOT IN / <> ALL: only with both NULL traps
                    # statically closed (inner value and outer key
                    # provably non-NULL) — then it IS anti-membership
                    return None
                return (cj.left, cj.right.select, sub_tbl, neg)
            sub_node, neg = _exists_of(cj)
            ex = _analyze_exists_sub(engine, nm, src, sub_node.select)
            if ex is None or ex[2] == dim_name or not _fact_side(ex[0]):
                return None
            return (ex[0], ex[1], ex[2], neg)

        if len(ctx_idx) == 1 and _set_ctx_ok:
            kind, i = ctx_idx[0]
            rest = [c for j, c in enumerate(conjs) if j != i]
            if all(_row_local(c) for c in rest):
                got = _ctx_of(kind, i, rest)
                if got is not None:
                    in_sub = got
                    where_rest = _and_tree(rest)
        elif len(ctx_idx) == 2 and len(select.from_) == 1:
            # r16: TWO independent membership conjuncts compose when the
            # subquery tables are DISTINCT sinks, both different from
            # the base: the product of memberships telescopes exactly
            # (Δ([M1][M2]) = flip1·[M2_new] + [M1_old]·flip2 — see
            # engine._in_sub_terms2). Same-table pairs (one commit moves
            # both memberships at once — a cross term) and
            # self-membership stay full, pinned.
            idxs = {i for _, i in ctx_idx}
            rest = [c for j, c in enumerate(conjs) if j not in idxs]
            if all(_row_local(c) for c in rest):
                c1 = _ctx_of(*ctx_idx[0], rest)
                c2 = _ctx_of(*ctx_idx[1], rest)
                if (
                    c1 is not None
                    and c2 is not None
                    and c1[2] != c2[2]
                    and nm not in (c1[2], c2[2])
                ):
                    in_sub, in_sub2 = c1, c2
                    where_rest = _and_tree(rest)
    csc: tuple | None = None
    if (
        select.where is not None
        and not _row_local(select.where)
        and in_sub is None
        and (
            len(select.from_) == 1
            or (dim_name is not None and dim_name != nm
                and select.from_[1].join_type in ("INNER", "LEFT", "LEFT OUTER"))
        )
    ):
        # CORRELATED SCALAR subquery conjunct (x > (SELECT agg(s.y) FROM
        # s WHERE s.k = f.ck)): exactly ONE conjunct carries exactly ONE
        # subquery in a scalar position; with the subquery replaced by
        # the ``__mv_csc`` placeholder the conjunct must be row-local —
        # any row-local shape around the scalar (NOT, OR, arithmetic)
        # maintains, because the flip algebra re-evaluates the WHOLE
        # conjunct per fact row under the old and new scalar values.
        conjs = _conjuncts(select.where)
        sub_idx = [
            i
            for i, cj in enumerate(conjs)
            if any(isinstance(n, SubqueryNode) for n in cj.walk())
        ]
        if len(sub_idx) == 1:
            cj = conjs[sub_idx[0]]
            subs = [n for n in cj.walk() if isinstance(n, SubqueryNode)]
            setctx = False
            for n in cj.walk():
                if isinstance(n, BinaryNode) and isinstance(n.right, SubqueryNode):
                    if n.op in ("IN", "NOT IN") or n.op.endswith(" ANY") or n.op.endswith(" ALL"):
                        setctx = True
                if isinstance(n, UnaryNode) and isinstance(n.child, SubqueryNode):
                    if "EXISTS" in n.op.upper():
                        setctx = True
            rest = [c for i, c in enumerate(conjs) if i != sub_idx[0]]
            if not setctx and len(subs) == 1 and all(_row_local(c) for c in rest):
                got = _analyze_csc_sub(engine, nm, src, subs[0].select)
                if got is not None and got[3] != dim_name:
                    pred = _subst(cj, [(subs[0], IdentityNode(("__mv_csc",)))])
                    # join views: the correlation key AND the predicate's
                    # fact references must be fact-side (the flip term
                    # re-evaluates the conjunct over fact-only frames)
                    fact_ok = True
                    if dim_name is not None:
                        f_cols = _snapshot_cols(engine, sink)
                        d_cols = _snapshot_cols(engine, engine.sinks[dim_name])
                        f_refs = {nm, (src.alias or "").lower()} - {""}
                        for n in list(got[0].walk()) + list(pred.walk()):
                            if isinstance(n, IdentityNode) and n.parts != ("__mv_csc",):
                                parts = [p.lower() for p in n.parts]
                                col = parts[-1]
                                if len(parts) > 1:
                                    if parts[0] in f_refs and col in f_cols:
                                        continue
                                    fact_ok = False
                                elif not (col in f_cols and col not in d_cols):
                                    fact_ok = False
                    if _row_local(pred) and fact_ok:
                        csc = (got[0], got[1], got[2], got[3], pred)
                        where_rest = _and_tree(rest)
    if select.where is not None and not _row_local(select.where) and in_sub is None and csc is None:
        # the ONE tolerated non-row-local WHERE shape: uncorrelated
        # SCALAR subqueries (x > (SELECT avg(x) FROM other)) — frozen
        # per refresh. Every SubqueryNode must sit in a scalar position
        # (IN/EXISTS/ANY/ALL right-hand sides are set contexts — a
        # literal substitution would be wrong) and the WHERE must be
        # row-local once the subqueries are replaced by literals.
        # Correlation is checked at CREATE: evaluation raises on an
        # unbound outer reference and the view falls back to full MV.
        nonscalar: set = set()
        for n in select.where.walk():
            if isinstance(n, BinaryNode) and isinstance(n.right, SubqueryNode):
                if n.op in ("IN", "NOT IN") or n.op.endswith(" ANY") or n.op.endswith(" ALL"):
                    nonscalar.add(id(n.right))
            if isinstance(n, UnaryNode) and isinstance(n.child, SubqueryNode):
                if "EXISTS" in n.op.upper():
                    nonscalar.add(id(n.child))
        if nonscalar:
            return None
        scalar_subs = [
            n for n in select.where.walk() if isinstance(n, SubqueryNode)
        ]
        probe = _subst(select.where, [(s, NumberNode("0")) for s in scalar_subs])
        if not scalar_subs or not _row_local(probe):
            return None
    if not select.columns:
        return None

    from . import functions as funcs

    # filter-only mode (no GROUP BY, no aggregate anywhere): the state is
    # a MULTISET of projected rows (whole row → signed count); exposing it
    # re-expands each row count times. A DELETE just decrements.
    filter_only = not select.group_by and not any(
        funcs.is_agg_tree(c.expr) for c in select.columns if not c.is_star
    )

    keys_remaining = list(select.group_by)
    key_nodes: list = []
    key_cols: list[str] = []
    aggs: list[AggSpec] = []
    out_order: list[str] = []
    raw_win_cols: list = []  # (alias, raw expr) — rewritten after the loop
    for col in select.columns:
        if col.is_star or col.guard is not None or col.exclude or col.replace:
            return None
        e = col.expr
        if any(isinstance(n, (WindowNode, SubqueryNode)) for n in e.walk()):
            # projection window column — or one carrying an uncorrelated
            # scalar SUBQUERY: both evaluate at EXPOSE time over the
            # aggregated state (group-agg subtrees rewrite to
            # exposed/hidden agg columns below, once all aggs are known;
            # subqueries substitute their frozen values as literals)
            if filter_only or col.alias is None:
                return None
            raw_win_cols.append((col.alias, e))
            out_order.append(col.alias)
            continue
        if e in keys_remaining or filter_only:
            # a group key (or a filter-only projection column, which the
            # multiset state treats as a key); needs a stable exposed name
            if col.alias:
                name = col.alias
            elif isinstance(e, IdentityNode):
                name = e.parts[-1]
            else:
                return None  # unaliased computed key: name undefined
            if not _row_local(e) or name in key_cols:
                return None
            if e in keys_remaining:
                keys_remaining.remove(e)
            key_nodes.append(e)
            key_cols.append(name)
            out_order.append(name)
            continue
        if col.alias is None:
            return None  # exposed agg name undefined without an alias
        parsed = _parse_agg(e)
        if parsed is None:
            return None
        aggs.append(
            AggSpec(
                parsed[0], parsed[1], col.alias, p=parsed[2], arg2=parsed[3],
                okey=parsed[4] if len(parsed) > 4 else None,
            )
        )
        out_order.append(col.alias)
    if keys_remaining:
        return None  # GROUP BY key not exposed in the select list
    if not aggs and not filter_only and not select.group_by:
        return None  # unreachable guard: nothing the delta algebra maintains
    if not key_cols and not aggs:
        return None

    hidden_n = [0]

    # EXPOSE-TIME scalar subqueries (SELECT-list / HAVING / QUALIFY):
    # unlike the WHERE's state-context freeze-and-verify, these only
    # affect the exposed projection/filters, so a moved value needs a
    # RE-EXPOSE, never a state rebuild. Each subquery is replaced by a
    # placeholder identifier here; exposed_frame substitutes the frozen
    # value as a typed literal.
    expose_subs: list = []
    es_names: list[str] = []

    def _extract_es(node: Node):
        """``node`` with every scalar SubqueryNode replaced by its
        placeholder (registering new ones); None when a subquery sits in
        a set context (IN/EXISTS/ANY/ALL — not literal-substitutable)."""
        subs = [n for n in node.walk() if isinstance(n, SubqueryNode)]
        if not subs:
            return node
        for n in node.walk():
            if isinstance(n, BinaryNode) and isinstance(n.right, SubqueryNode):
                if n.op in ("IN", "NOT IN") or n.op.endswith(" ANY") or n.op.endswith(" ALL"):
                    return None
            if isinstance(n, UnaryNode) and isinstance(n.child, SubqueryNode):
                if "EXISTS" in n.op.upper():
                    return None
        pairs = []
        for s in subs:
            idx = next((i for i, x in enumerate(expose_subs) if x == s), None)
            if idx is None:
                expose_subs.append(s)
                es_names.append(f"__mv_es{len(expose_subs) - 1}")
                idx = len(expose_subs) - 1
            pairs.append((s, IdentityNode((es_names[idx],))))
        return _subst(node, pairs)

    def _post_agg(node: Node, extra=()):
        """Rewrite a POST-aggregation expression (HAVING predicate, ORDER
        BY key) over the exposed columns: each aggregate call becomes the
        matching exposed column — aggs referenced only here become HIDDEN
        AggSpecs (maintained in state, dropped from the exposed
        projection). ``extra`` allows additional names (window column
        aliases for QUALIFY/ORDER BY). None when not maintainable."""
        roots = [
            n
            for n in node.walk()
            if isinstance(n, FuncNode) and funcs.is_agg_func(n.name) and n.name != "distinct"
        ]
        contained = {id(d) for r in roots for d in r.walk() if d is not r}
        roots = [r for r in roots if id(r) not in contained]
        pairs = []
        for r in roots:
            parsed = _parse_agg(r)
            if parsed is None:
                return None  # e.g. stddev(x) — not maintainable
            kind, arg, pfrac, arg2 = parsed[:4]
            okey = parsed[4] if len(parsed) > 4 else None
            match = next(
                (
                    a
                    for a in aggs
                    if a.kind == kind and a.arg == arg and a.p == pfrac
                    and a.arg2 == arg2 and a.okey == okey
                ),
                None,
            )
            if match is None:
                match = AggSpec(
                    kind, arg, f"__mv_h{hidden_n[0]}", p=pfrac, arg2=arg2, okey=okey
                )
                hidden_n[0] += 1
                aggs.append(match)
            pairs.append((r, IdentityNode((match.out,))))
        # raw group-key exprs (possibly qualified, e.g. d.dname) rewrite
        # to their exposed aliases — post-agg frames only carry those
        pairs += [
            (k, IdentityNode((name,))) for k, name in zip(key_nodes, key_cols)
        ]
        out = _subst(node, pairs)
        if not _row_local(out):
            return None
        exposed = set(key_cols) | {a.out for a in aggs} | set(extra)
        for n in out.walk():
            if isinstance(n, IdentityNode):
                if getattr(n, "is_star", False) or len(n.parts) != 1:
                    return None
                if n.parts[0] not in exposed:
                    return None  # unknown name (or un-rewritten agg ref)
        return out

    def _post_any(node: Node, extra=()):
        """:func:`_post_agg` over trees that may CONTAIN WindowNodes: the
        window call itself survives to expose time (it runs over the
        aggregated frame there), while its arguments / PARTITION BY /
        ORDER BY — and every windowless part of the tree — rewrite via
        _post_agg. None when not maintainable."""
        import dataclasses

        if isinstance(node, WindowNode):
            if node.ref is not None:
                return None  # named WINDOW spec: engine resolves pre-translate
            new_args = []
            for a in node.func.args:
                ra = _post_any(a, extra)
                if ra is None:
                    return None
                new_args.append(ra)
            rp = []
            for p in node.partition_by:
                r = _post_any(p, extra)
                if r is None:
                    return None
                rp.append(r)
            ro = []
            for oe, d in node.order_by:
                r = _post_any(oe, extra)
                if r is None:
                    return None
                ro.append((r, d))
            return dataclasses.replace(
                node,
                func=dataclasses.replace(node.func, args=new_args),
                partition_by=rp,
                order_by=ro,
            )
        if not any(isinstance(n, WindowNode) for n in node.walk()):
            return _post_agg(node, extra)
        # mixed tree (e.g. rank() OVER (...) + 1): rebuild children,
        # recursing into the window-bearing parts
        if not dataclasses.is_dataclass(node):
            return node
        kwargs = {}
        for fld in dataclasses.fields(node):
            val = getattr(node, fld.name)
            if isinstance(val, Node):
                r = _post_any(val, extra)
                if r is None:
                    return None
                kwargs[fld.name] = r
            elif isinstance(val, list) and val and all(isinstance(v, Node) for v in val):
                rl = []
                for v in val:
                    r = _post_any(v, extra)
                    if r is None:
                        return None
                    rl.append(r)
                kwargs[fld.name] = rl
            elif (
                isinstance(val, list)
                and val
                and all(isinstance(v, tuple) and v and isinstance(v[0], Node) for v in val)
            ):
                # tuple lists: CASE whens (Node, Node), ORDER BY (Node, str)
                rl = []
                for v in val:
                    parts = []
                    for x in v:
                        if isinstance(x, Node):
                            r = _post_any(x, extra)
                            if r is None:
                                return None
                            parts.append(r)
                        else:
                            parts.append(x)
                    rl.append(tuple(parts))
                kwargs[fld.name] = rl
        return dataclasses.replace(node, **kwargs)

    win_cols: list = []
    if raw_win_cols:
        win_names: list = []
        for alias, raw in raw_win_cols:
            raw = _extract_es(raw)
            if raw is None:
                return None
            rewritten = _post_any(raw, tuple(win_names) + tuple(es_names))
            if rewritten is None:
                return None
            win_cols.append((alias, rewritten))
            win_names.append(alias)

    qualify_expr = None
    if select.qualify is not None:
        # QUALIFY filters AFTER the window columns (ANSI) — expose-time,
        # over exposed + hidden aggs + window column aliases
        if filter_only:
            return None
        q_raw = _extract_es(select.qualify)
        if q_raw is None:
            return None
        qualify_expr = _post_any(
            q_raw, tuple(n for n, _ in win_cols) + tuple(es_names)
        )
        if qualify_expr is None:
            return None

    having_expr = None
    if select.having is not None:
        # HAVING filters the AGGREGATED result, so it applies at EXPOSE
        # time — the state keeps every group (one filtered out today may
        # satisfy the predicate after the next delta).
        if filter_only:
            return None  # HAVING without aggregation: engine edge, stay full
        h_raw = _extract_es(select.having)
        if h_raw is None:
            return None
        having_expr = _post_agg(h_raw, tuple(es_names))
        if having_expr is None:
            return None

    order_exprs: list = []
    if select.order_by or select.limit is not None or select.offset is not None:
        # top-k views: ORDER BY (presentation) and ORDER BY + LIMIT /
        # OFFSET (content!) apply at EXPOSE time over the full state —
        # a group entering or leaving the top k needs no special
        # maintenance, the state always holds every group. LIMIT without
        # a total order would be nondeterministic content → full MV.
        if filter_only:
            return None
        if (select.limit is not None or select.offset is not None) and not select.order_by:
            return None
        for e, direction in select.order_by:
            oe = _post_any(e, tuple(n for n, _ in win_cols))
            if oe is None:
                return None
            order_exprs.append((oe, direction))

    extrema_side = "fact"
    if dim_name and any(a.kind in _EXTREMUM_AGGS for a in aggs):
        # extrema repair probes group-key exprs on ONE side alone (the
        # semi-join that names which rows to re-aggregate), so a joined
        # extrema view maintains incrementally exactly when every group
        # key is evaluable on a single side. Which sides are sound:
        #   fact probe — INNER/LEFT (fact-preserved: every group's rows
        #     trace to a fact row; the repair re-runs the join over the
        #     pruned facts);
        #   dim probe — INNER/RIGHT (the pruned dim substituted into the
        #     join yields exactly the stale groups' rows, null-extended
        #     dim rows included for RIGHT).
        # LEFT with dim-side keys and FULL are out: the fact-origin
        # null-extension group (dim cols NULL) has no probe-able row on
        # the dim side. The extremum ARG may live on either side.
        d = select.from_[1]
        jt = d.join_type
        if dim_name == nm:
            # self-join: each occurrence is referenced by its own alias
            # (or by the bare table name for the at-most-one occurrence
            # NOT aliased away); identical refs would be ambiguous and
            # yield no probe side
            f_ref = (src.alias or nm).lower()
            d_ref = (d.alias or nm).lower()
            fact_refs = {f_ref} if f_ref != d_ref else set()
            dim_refs = {d_ref} if f_ref != d_ref else set()
        else:
            fact_refs = {nm, (src.alias or "").lower()} - {""}
            dim_refs = {dim_name, (d.alias or "").lower()} - {""}
        fact_cols = _snapshot_cols(engine, sink)
        dim_cols = _snapshot_cols(engine, engine.sinks[dim_name])

        def _on_side(node: Node, refs: set, cols: set, other_cols: set) -> bool:
            for n in node.walk():
                if isinstance(n, IdentityNode):
                    parts = [p.lower() for p in n.parts]
                    if len(parts) > 1:
                        if parts[0] not in refs:
                            return False
                    elif parts[0] not in cols or parts[0] in other_cols:
                        return False  # other-side or ambiguous name
            return True

        fact_ok = all(
            _on_side(k, fact_refs, fact_cols, dim_cols) for k in key_nodes
        )
        dim_ok = all(_on_side(k, dim_refs, dim_cols, fact_cols) for k in key_nodes)
        if jt in ("INNER",):
            # incl. INNER self-joins: the probe prunes ONE occurrence by
            # the stale group keys and re-runs the join against the
            # other occurrence's full current snapshot
            extrema_side = "fact" if fact_ok else ("dim" if dim_ok else None)
        elif jt in ("LEFT", "LEFT OUTER"):
            extrema_side = "fact" if fact_ok else None
        elif jt in ("RIGHT", "RIGHT OUTER"):
            extrema_side = "dim" if dim_ok else None
        else:  # FULL: both sides null-extend — no probe-able side
            extrema_side = None
        if extrema_side is None:
            # no single-side repair probe exists (FULL joins; mixed-side
            # or un-sided group keys): the extrema ride the substate
            # MULTISET instead — min/max over a signed (keys, value)
            # multiset fold under deletes with no repair at all
            for a in aggs:
                if a.kind in _EXTREMUM_AGGS:
                    a.kind = f"{a.kind}_set"
            extrema_side = "fact"  # unused: no probe-backed extrema remain

    if dim_name and select.from_[1].join_type in (
        "RIGHT",
        "RIGHT OUTER",
        "FULL",
        "FULL OUTER",
    ):
        # dim-preserved outer joins: EVERY refresh (fact-only included)
        # needs per-key match-count bookkeeping for the dim side's null
        # extensions, so the ON must decompose into fact-col = dim-col
        # equality pairs plus (optionally) row-local SINGLE-SIDE
        # residual conjuncts — the flip terms key on the (possibly
        # compound) tuple and count over residual-filtered snapshots —
        # or (r16) be PAIRLESS with two-sided non-equi conjuncts, where
        # the per-row T5'/T6' terms prune the affected slice with an
        # ON-semi-join against the delta's images instead of a key
        # lookup. (DISTINCT is fine: substates are pure signed counting
        # and fold through the same six terms; extrema ride the probe or
        # the multiset, deduced above.)
        probe = MatView(name="", select=select, base=nm, dim=dim_name)
        if (
            join_on_parts(
                probe,
                _snapshot_cols(engine, sink),
                _snapshot_cols(engine, engine.sinks[dim_name]),
                allow_cross=True,
                allow_pairless=True,
            )
            is None
        ):
            return None

    if (in_sub is not None or csc is not None) and any(
        a.kind in _EXTREMUM_AGGS for a in aggs
    ):
        # membership/predicate flips act as inserts/deletes of base
        # rows, and the extrema repair probe would re-run the state
        # select WITHOUT the IN / correlated-scalar conjunct — so
        # probe-backed extrema ride the substate MULTISET instead
        # (fold-only, no repair; same cost note as FULL joins)
        for a in aggs:
            if a.kind in _EXTREMUM_AGGS:
                a.kind = f"{a.kind}_set"

    i = 0
    di = 0
    for a in aggs:
        if a.kind in ("sum", "avg"):
            a.s_col, a.c_col = f"__mv_s{i}", f"__mv_c{i}"
        elif a.kind == "count":
            a.c_col = f"__mv_c{i}"
        elif a.kind in _VARIANCE_AGGS:
            a.s_col, a.c_col, a.q_col, a.z_col = (
                f"__mv_s{i}", f"__mv_c{i}", f"__mv_q{i}", f"__mv_z{i}",
            )
        elif a.kind in _COVAR_AGGS:
            a.s_col, a.c_col, a.z_col = f"__mv_s{i}", f"__mv_c{i}", f"__mv_z{i}"
            a.s2_col, a.qc_col, a.z2_col = (
                f"__mv_s2{i}", f"__mv_qc{i}", f"__mv_z2{i}",
            )
            if a.kind == "corr":
                a.q_col, a.q2_col = f"__mv_q{i}", f"__mv_q2{i}"
        elif a.kind in _EXTREMUM_AGGS:
            a.m_col = f"__mv_m{i}"
        elif a.kind in _SUBSTATE_AGGS:
            a.d_idx = di
            di += 1
        i += 1
    return MatView(
        name="",
        select=select,
        base=nm,
        dim=dim_name,
        key_nodes=key_nodes,
        key_cols=key_cols,
        aggs=aggs,
        expand=filter_only,
        out_order=out_order,
        having=having_expr,
        order_exprs=order_exprs,
        limit=select.limit,
        offset=select.offset,
        extrema_side=extrema_side,
        win_cols=win_cols,
        qualify=qualify_expr,
        scalar_subs=scalar_subs,
        expose_subs=expose_subs,
        in_key=in_sub[0] if in_sub else (csc[0] if csc else None),
        in_select=in_sub[1] if in_sub else None,
        in_table=in_sub[2] if in_sub else (csc[3] if csc else None),
        in_negated=bool(in_sub[3]) if in_sub else False,
        in2_key=in_sub2[0] if in_sub2 else None,
        in2_select=in_sub2[1] if in_sub2 else None,
        in2_table=in_sub2[2] if in_sub2 else None,
        in2_negated=bool(in_sub2[3]) if in_sub2 else False,
        where_rest=where_rest if (in_sub or csc) else None,
        csc_select=csc[1] if csc else None,
        csc_empty=csc[2] if csc else None,
        csc_pred=csc[4] if csc else None,
    )



def in_membership_filter(
    engine, mv: MatView, df: DataFrame, s_df: DataFrame | None = None, ctx: int = 1
) -> DataFrame:
    """Semi-join ``df`` (a base snapshot or signed delta) to the
    IN-subquery's value set, evaluated at whatever version of the
    subquery's table is CURRENTLY REGISTERED (refresh pins it via an
    ``engine.tables`` override, exactly like the dim machinery) — or,
    with ``s_df``, at that explicit snapshot (registered for the
    evaluation's duration). ``ctx=2`` filters through the SECOND
    membership conjunct (r16). NULL keys never match — SQL IN
    semantics. At 100 TB this is the broadcast/shuffle semi-join you'd
    write by hand; AQE picks the strategy from the runtime size of the
    value set."""
    from .translate import Scope, to_column

    sel, keyn, neg, tbl = (
        (mv.in_select, mv.in_key, mv.in_negated, mv.in_table)
        if ctx == 1
        else (mv.in2_select, mv.in2_key, mv.in2_negated, mv.in2_table)
    )
    saved = _UNSET
    if s_df is not None:
        saved = engine.tables.get(tbl, _UNSET)
        engine.tables[tbl] = s_df
    try:
        sub_df = engine._select_any(sel)
    finally:
        if s_df is not None:
            if saved is _UNSET:
                engine.tables.pop(tbl, None)
            else:
                engine.tables[tbl] = saved
    vals = (
        sub_df.select(F.col(sub_df.columns[0]).alias("__mv_inv"))
        .filter(F.col("__mv_inv").isNotNull())
        .distinct()
    )
    src = mv.select.from_[0]
    key = to_column(
        keyn, Scope({src.alias or src.name: df}, includes=engine.includes)
    )
    # NOT EXISTS: anti-membership — rows whose key has NO match qualify
    # (NULL keys never match, so they qualify; exactly ANSI NOT EXISTS)
    how = "left_anti" if neg else "left_semi"
    return df.join(vals, key == F.col("__mv_inv"), how)


def csc_default(engine, mv: MatView) -> tuple:
    """ANSI's scalar for correlation keys with NO matching s rows: the
    aggregate over an empty input (count → 0, sum/avg/min/max → NULL),
    as ``(value, dtype)``. Evaluated through the engine itself — one
    bounded 1-row job whose FALSE filter Catalyst folds to an empty
    scan — so every agg the engine executes gets the right default."""
    sub_df = engine._select_any(mv.csc_empty)
    rows = sub_df.limit(1).collect()
    return (rows[0][0] if rows else None, sub_df.schema.fields[0].dataType)


def csc_scalars(engine, mv: MatView, s_df: DataFrame, keys_df: DataFrame) -> DataFrame:
    """``(__mv_cck, __mv_csc)`` — the correlated scalar per correlation
    key, computed by the ENGINE (so any engine-executable aggregate
    works) over ``s_df`` RESTRICTED to ``keys_df`` (one ``__mv_cfk``
    column) — O(affected slice), never a full s aggregation. The s
    table is pinned to the slice for the execution, the in-sub/dim
    pinning pattern."""
    from .translate import Scope, to_column

    sub_src = mv.csc_select.from_[0]
    sref = sub_src.alias or sub_src.name
    skey = to_column(
        mv.csc_select.group_by[0], Scope({sref: s_df}, includes=engine.includes)
    )
    sliced = s_df.join(keys_df, skey == F.col("__mv_cfk"), "left_semi")
    sname = sub_src.name.lower()
    saved = engine.tables.get(sname, _UNSET)
    engine.tables[sname] = sliced
    try:
        return engine._select_any(mv.csc_select)
    finally:
        if saved is _UNSET:
            engine.tables.pop(sname, None)
        else:
            engine.tables[sname] = saved


def csc_pred_col(engine, mv: MatView, df: DataFrame, value_col, dtype):
    """The WHERE conjunct's boolean Column over ``df`` with the scalar
    placeholder bound to ``value_col`` (NULL → not true → filtered,
    exactly ANSI WHERE)."""
    from .nodes import SparkColNode
    from .translate import Scope, to_column

    node = _subst(
        mv.csc_pred,
        [(IdentityNode(("__mv_csc",)), SparkColNode(col=value_col, dtype=dtype, text="__mv_csc"))],
    )
    src = mv.select.from_[0]
    scope = Scope({src.alias or src.name: df}, includes=engine.includes)
    return to_column(node, scope).cast("boolean")


def csc_filter(engine, mv: MatView, df: DataFrame, s_df: DataFrame | None = None) -> DataFrame:
    """Filter ``df`` (a base snapshot or signed delta) by the correlated-
    scalar predicate, with s at the currently pinned/registered version
    (the ``in_membership_filter`` contract). The scalar dim is computed
    only for ``df``'s OWN keys (semi-join restriction), left-joined back
    (NULL keys get the empty-agg default — they match no s row), and the
    predicate evaluated per row."""
    if s_df is None:
        s_df = engine.tables.get(mv.in_table)
        if s_df is None:
            s_df = engine.sinks[mv.in_table].scan(
                engine.spark, version=mv.in_version
            )
    from .translate import Scope, to_column

    src = mv.select.from_[0]
    key = to_column(
        mv.in_key, Scope({src.alias or src.name: df}, includes=engine.includes)
    )
    dfk = df.withColumn("__mv_cfk", key)
    keys = dfk.select("__mv_cfk").filter(F.col("__mv_cfk").isNotNull()).distinct()
    scal = csc_scalars(engine, mv, s_df, keys)
    v0, dt = csc_default(engine, mv)
    joined = dfk.join(scal, F.col("__mv_cfk") == F.col("__mv_cck"), "left")
    val = F.coalesce(F.col("__mv_csc"), F.lit(v0).cast(dt))
    pred = csc_pred_col(engine, mv, joined, val, dt)
    return joined.filter(pred).drop("__mv_cfk", "__mv_cck", "__mv_csc")


def eval_scalar_subs(engine, mv: MatView, subs: list | None = None) -> list:
    """Evaluate the view's frozen scalar subqueries (``mv.scalar_subs``
    by default; pass ``mv.expose_subs`` for the expose-time set) — one
    bounded single-row job each, the same contract as the engine's
    plan-time scalar fold — returning (value, dtype) pairs. Raises
    through on a correlated subquery (unbound outer identifier) or an
    ANSI violation; CREATE demotes the view to a full-recompute MV on
    that."""
    from .errors import ExecError

    vals = []
    for s in subs if subs is not None else mv.scalar_subs:
        sub_df = engine._select_any(s.select)
        if len(sub_df.columns) != 1:
            raise ExecError(
                f"scalar subquery must return one column, got {len(sub_df.columns)}"
            )
        rows = sub_df.limit(2).collect()
        if len(rows) > 1:
            raise ExecError("scalar subquery returned more than one row")
        vals.append((rows[0][0] if rows else None, sub_df.schema.fields[0].dataType))
    return vals


def apply_scalar_subs(mv: MatView, vals: list) -> None:
    """Pin ``vals`` as the frozen scalar-subquery values: rebuilds
    ``where_subst`` with each subquery replaced by its literal (cast to
    the evaluated dtype, so comparisons keep the analyzed types)."""
    from .nodes import SparkColNode

    mv.scalar_vals = vals
    mv.where_subst = _subst(
        mv.select.where,
        [
            (s, SparkColNode(col=F.lit(v).cast(dt), dtype=dt, text="(SELECT ...)"))
            for s, (v, dt) in zip(mv.scalar_subs, vals)
        ],
    )

