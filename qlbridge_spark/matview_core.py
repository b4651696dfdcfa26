"""Materialized-view FOUNDATIONS: the maintained-aggregate vocabulary
(kind sets), the AggSpec/MatView dataclasses, node utilities shared by
the analysis / state / exposure planes, and the join-ON decomposition
(equality pairs + single-side residuals + two-sided cross conjuncts).

Split from matview.py in round 14 (same pattern as the engine.py
split); matview.py re-exports everything, so importers are unchanged.
See matview.py for the architecture overview."""

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

_INCREMENTAL_AGGS = {"sum", "count", "avg"}
#: the variance family is ALGEBRAIC — but raw power sums (Σwx, Σwx²)
#: suffer catastrophic cancellation for large-magnitude low-variance
#: columns (epoch-millis: x² ≈ 3e24, ulp ≈ 3e8, so q − s²/n can lose
#: EVERY significant digit and the ≥0 clamp would silently report 0).
#: The state therefore stores CENTERED moments around a per-group shift
#: z (the group's min, captured when the group is first built):
#: s = Σw(x−z), q = Σw(x−z)². Deltas center around their own shift and
#: merge_state re-centers to the common min before folding
#: (Σw(x−Z) = s + (z−Z)·c; Σw(x−Z)² = q + 2(z−Z)s + (z−Z)²c) — exact
#: algebra, and |x−z| is bounded by the group's data RANGE, so the
#: exposed var = (q − s²/n)/denominator is well-conditioned whenever
#: the range is within ~8 orders of magnitude of σ. A NULL shift means
#: raw sums (shift 0) — the legacy state encoding folds unchanged.
#: Residual drift vs Spark's central-moments accumulation stays in the
#: last ulps (different summation order), same class as any
#: re-aggregation.
_VARIANCE_AGGS = {
    "stddev",
    "stddev_samp",
    "stddev_pop",
    "variance",
    "var_samp",
    "var_pop",
}
#: two-argument moment family — algebraic over CENTERED co-moments,
#: the bivariate generalization of the variance state: per group
#: c = Σw over PAIRWISE-non-null rows (ANSI: a NULL in either argument
#: drops the pair), sx = Σw(x−zx), sy = Σw(y−zy), qxy = Σw(x−zx)(y−zy),
#: and for corr additionally qxx/qyy. Shifts zx/zy are the group's
#: observed minima (same conditioning argument as the variance note
#: above — raw power sums cancel catastrophically at epoch-millis
#: magnitudes). Exposure: covar = (qxy − sx·sy/c)/denominator;
#: corr = m_xy / sqrt(m_xx · m_yy), NULL when either variance is zero —
#: exactly the engine's corr() (try_divide convention).
_COVAR_AGGS = {"corr", "covar_samp", "covar_pop"}
#: DISTINCT aggregates maintain through a TWO-LEVEL state: a per-view
#: substate frame grained by (group keys, value) holding a signed
#: occurrence count — deltas fold into it exactly like the main state,
#: and the exposed count/sum/avg re-aggregates the O(|distinct values|)
#: substate (never the base). This is the classic DBSP/Materialize
#: answer to the "COUNT(DISTINCT) isn't distributive" problem.
_DISTINCT_AGGS = {"count_distinct", "sum_distinct", "avg_distinct"}
#: sort-based aggregates ride the SAME two-level substate — the
#: (keys, value) → signed-occurrence-count multiset IS the sorted-agg
#: input, so deltas fold in O(|delta|) and the exposed value is a
#: weighted interpolated percentile over the O(|distinct values|)
#: substate (Spark/DuckDB median semantics: linear interpolation at
#: index (N−1)/2 over the sorted multiset). State is O(distinct values
#: per group) — the inherent cost of an exact holistic aggregate.
_SORT_AGGS = {"median", "percentile_cont"}
#: median/percentile_cont(DISTINCT x): same substate, but the exposure's
#: weighted interpolation counts each distinct value ONCE (occurrence
#: counts collapse to 1 — the DISTINCT qualifier).
_SORT_DISTINCT = {f"{k}_distinct" for k in _SORT_AGGS}
#: mode() rides the SAME multiset: the exposed value is the argmax of
#: the signed occurrence counts, ties to the smallest value — exactly
#: Spark's deterministic mode, which the engine's mode() maps to.
_HOLISTIC_AGGS = {"mode"}
#: extrema SHAPES with no single-side repair probe (FULL joins,
#: self-joins with mixed-side group keys) ride the multiset too:
#: min/max over a signed (keys, value) multiset fold under deletes with
#: no repair at all — the eligible value is just the multiset's edge.
#: State is O(distinct values per group) instead of O(1), so the probe
#: stays the default wherever a probe side exists.
_SET_EXTREMA = {"min_set", "max_set"}
#: variance-family(DISTINCT x) rides the substate too: the distinct
#: non-null values ARE the (keys, value) multiset's support, so the
#: exposed value is just the plain variance over the substate's values
#: (occurrence counts ignored — DISTINCT collapses them to 1).
_VARIANCE_DISTINCT = {f"{k}_distinct" for k in _VARIANCE_AGGS}
#: ordered-set collects (array_agg/string_agg(x ORDER BY k)) ride the
#: multiset: when the single ORDER key IS the data argument the sorted
#: support with per-value repeats is exactly the collected sequence
#: (*_sorted kinds); when it DIFFERS, the substate grains by
#: (keys, order-key, value) so the pairing is retained (*_pair kinds).
#: Exposure mirrors the engine's sort_array comparator (same NULL
#: placement, ties fall through to the value); _desc kinds sort
#: descending. AggSpec.arg2 carries the separator literal for the
#: string form. Multiple ORDER keys stay full-recompute.
_ORDERED_BASE = {"array_agg", "string_agg", "listagg"}
#: ORDER BY a DIFFERENT key (r14): the PAIR substate grains by
#: (keys, order-key, value) — the pairing is retained, state is
#: O(distinct (okey, value) pairs per group), the inherent cost.
_PAIR_AGGS = {
    "array_agg_pair", "array_agg_pair_desc",
    "string_agg_pair", "string_agg_pair_desc",
}
_ORDERED_AGGS = {
    "array_agg_sorted", "array_agg_sorted_desc",
    "string_agg_sorted", "string_agg_sorted_desc",
} | _PAIR_AGGS
#: every agg kind maintained through a substate (AggSpec.d_idx)
_SUBSTATE_AGGS = (
    _DISTINCT_AGGS
    | _SORT_AGGS
    | _SORT_DISTINCT
    | _HOLISTIC_AGGS
    | _SET_EXTREMA
    | _VARIANCE_DISTINCT
    | _ORDERED_AGGS
)
#: extrema fold under inserts (min of mins) but not deletes — a delete
#: may remove the reigning extremum. The change feed names exactly which
#: groups a delete touched, so REFRESH re-aggregates ONLY those groups'
#: base rows (repair_extrema) instead of the whole table.
_EXTREMUM_AGGS = {"min", "max"}
#: per-group "a negative-weight row hit this group" flag (delta only;
#: never persisted in the stored state)
NEG_FLAG = "__mv_neg"


@dataclass
class AggSpec:
    kind: str  # 'count_star' | 'count' | 'sum' | 'avg' | 'min' | 'max'
    #      | 'count_distinct' | 'sum_distinct' | 'avg_distinct'
    arg: Node | None  # None for count(*); the INNER arg for DISTINCT aggs
    out: str  # exposed column name
    s_col: str | None = None  # internal sum-state column (sum/avg/variance)
    c_col: str | None = None  # internal non-null-count state (count/sum/avg)
    m_col: str | None = None  # internal extremum state column (min/max)
    d_idx: int | None = None  # index into MatView.substates (DISTINCT aggs)
    q_col: str | None = None  # internal sum-of-squares state (variance family)
    #: per-group centering shift (variance family): the group's observed
    #: min, captured when the group's state is first built. s/q store
    #: CENTERED moments Σw(x−z) / Σw(x−z)² — see _VARIANCE_AGGS note.
    #: NULL shift ⇒ raw (shift 0), which is also the legacy encoding.
    z_col: str | None = None
    #: percentile fraction (sort-agg family): median ≡ 0.5
    p: float | None = None
    #: second argument (two-argument moment family: corr/covar)
    arg2: Node | None = None
    #: ORDER BY keys of a pair-substate ordered collect (ORDER BY
    #: anything other than the argument alone): a TUPLE of Nodes; the
    #: substate grains by (keys, order-keys…, value) so the per-row
    #: pairing is retained
    okey: tuple | None = None
    #: bivariate state columns (corr/covar): Σw(y−zy), Σw(y−zy)²
    #: (corr only), the co-moment Σw(x−zx)(y−zy), and the y shift
    s2_col: str | None = None
    q2_col: str | None = None
    qc_col: str | None = None
    z2_col: str | None = None


@dataclass
class MatView:
    name: str
    select: SqlSelect
    #: versioned-sink base table when incrementally maintainable
    base: str | None = None
    base_version: int | None = None
    #: incremental JOIN views: the dimension table (itself a versioned
    #: sink so its commits are DETECTABLE). Fact deltas join the dim
    #: row-locally: Δ(F ⋈ D) = ΔF ⋈ D when D is unchanged (INNER/LEFT).
    #: When the dim ALSO moved, INNER joins maintain via the bilinear
    #: higher-order identity Δ(F ⋈ D) = ΔF ⋈ D_new ∪ F_old ⋈ ΔD (the
    #: engine's refresh computes both terms); LEFT joins fall back to
    #: full recompute there — the NULL-extension term isn't bilinear.
    dim: str | None = None
    dim_version: int | None = None
    key_nodes: list = field(default_factory=list)  # group-key expr Nodes
    key_cols: list[str] = field(default_factory=list)  # exposed key names
    aggs: list[AggSpec] | None = None  # None → full-recompute-only
    #: filter-only views: state is a multiset (whole projected row →
    #: signed count); exposing it re-expands each row count times
    expand: bool = False
    internal: DataFrame | None = None  # state frame (or the full result)
    #: one (keys, __mv_dv, __mv_dn) frame per DISTINCT agg (AggSpec.d_idx)
    substates: list = field(default_factory=list)
    #: exposed column names in the ORIGINAL select order
    out_order: list = field(default_factory=list)
    #: HAVING predicate REWRITTEN over exposed/hidden agg columns —
    #: applied at expose time (state keeps every group: a group filtered
    #: out today may satisfy the predicate after the next delta)
    having: Node | None = None
    #: top-k views: ORDER BY keys (rewritten like `having`) + LIMIT /
    #: OFFSET, applied at expose time over the full state
    order_exprs: list = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    exposed_types: dict | None = None  # exposed name → Spark DataType
    state_sink: object | None = None  # durable state store (WITH {"path"})
    #: durable substate stores, parallel to the DISTINCT aggs (d_idx
    #: order); sibling sinks at "<path>__d<i>" when WITH {"path"} is set
    sub_sinks: list = field(default_factory=list)
    #: which relation the extrema delete-repair probes by group key:
    #: 'fact' (default) or 'dim' (INNER/RIGHT views with dim-side keys)
    extrema_side: str = "fact"
    #: projection window columns, evaluated at EXPOSE time over the
    #: aggregated state (ANSI: windows run after grouping/HAVING) —
    #: (output name, expr rewritten over exposed/hidden agg columns)
    win_cols: list = field(default_factory=list)
    #: QUALIFY predicate (rewritten like `having`), applied at expose
    #: time AFTER the window columns — the state keeps every group
    qualify: Node | None = None
    #: FROZEN uncorrelated scalar subqueries in the WHERE: evaluated
    #: once per refresh (a bounded driver job each); while the values
    #: are unchanged the WHERE is a row-local predicate with the values
    #: folded as literals (`where_subst`) and deltas fold incrementally;
    #: a moved value forces a full state rebuild under the new values.
    scalar_subs: list = field(default_factory=list)
    scalar_vals: list | None = None  # last-evaluated (value, dtype) pairs
    where_subst: Node | None = None  # WHERE with the values folded in
    #: EXPOSE-TIME uncorrelated scalar subqueries (SELECT-list / HAVING /
    #: QUALIFY): placeholder identifiers ``__mv_es<i>`` in the stored
    #: nodes substitute the frozen values as typed literals at expose
    #: time — a moved value re-exposes (O(|view|)), never rebuilds state.
    expose_subs: list = field(default_factory=list)
    expose_vals: list | None = None  # last-evaluated (value, dtype) pairs
    #: SET-CONTEXT subquery in the WHERE (``k IN (SELECT v FROM s)``):
    #: the IN-list is a 1-COLUMN DIM. State folds rows filtered by the
    #: membership set M; when s commits, per-value match counts that
    #: cross 0↔1 flip the base rows carrying that key in/out of the
    #: state (semi-join delta algebra — see engine._refresh_one):
    #:   Δstate = ΔF ⋉ M_new  +  F_old ⋉ flip_in  −  F_old ⋉ flip_out
    in_key: Node | None = None  # row-local fact-side key expression
    in_select: SqlSelect | None = None  # the subquery (single column)
    in_table: str | None = None  # the subquery's versioned-sink table
    in_version: int | None = None
    #: NOT-membership (correlated ``NOT EXISTS``, or NOT IN / ``<> ALL``
    #: whose two ANSI NULL traps are statically closed — inner value and
    #: outer key provably non-NULL, see ``_not_in_provable``): rows
    #: qualify when the key has NO match — the same flip algebra with
    #: inverted signs and an anti-join membership filter. Unprovable
    #: NOT IN stays full-recompute (one inner NULL empties the result —
    #: not a per-key flip).
    in_negated: bool = False
    #: SECOND independent membership conjunct (r16): ``k1 IN (SELECT …
    #: FROM s1) AND k2 IN (SELECT … FROM s2)`` over a SINGLE-TABLE base
    #: with s1 ≠ s2 ≠ base. The product of memberships telescopes
    #: exactly — [M1n][M2n] − [M1o][M2o] = flip1·[M2n] + [M1o]·flip2 —
    #: so each context's flip rows filter through the OTHER membership
    #: (ctx1's flips at s2's NEW version, ctx2's at s1's OLD) and no
    #: cross term exists. Same-table pairs and self-membership stay
    #: full (analysis gate).
    in2_key: Node | None = None
    in2_select: SqlSelect | None = None
    in2_table: str | None = None
    in2_version: int | None = None
    in2_negated: bool = False
    #: the WHERE minus the IN conjunct(s) (row-local; None when empty) —
    #: what the state selects actually evaluate; membership is applied
    #: to their INPUT frames instead
    where_rest: Node | None = None
    #: CORRELATED SCALAR subquery in the WHERE (``x > (SELECT agg(s.y)
    #: FROM s WHERE s.k = f.ck AND <s-local>)``): the per-key scalar is
    #: a 1-column dim KEYED BY THE CORRELATION KEY with the aggregate as
    #: payload — the same shape as the IN machinery (it shares
    #: ``in_table``/``in_version`` and every pinning/vacuum site), but
    #: the flip set is PER FACT ROW, not per key: when s commits, keys
    #: whose scalar moved re-evaluate the predicate against both the old
    #: and new value for each base row carrying that key, and rows whose
    #: truth changed enter (+1) / leave (−1) the state:
    #:   Δstate = ΔF·[P_new] + F_old·([P(f,v_new(k))] − [P(f,v_old(k))])
    #: ``csc_pred`` is the WHERE conjunct with the subquery replaced by
    #: the placeholder identifier ``__mv_csc`` (row-local after the
    #: substitution); ``csc_select`` the grouped (key → scalar) query
    #: executed over restricted slices of s; ``csc_empty`` the agg over
    #: an empty input — ANSI's scalar for keys with no matching s rows
    #: (count → 0, sum/avg/min/max → NULL).
    csc_pred: Node | None = None
    csc_select: SqlSelect | None = None
    csc_empty: SqlSelect | None = None

    @property
    def incremental(self) -> bool:
        return self.aggs is not None

    @property
    def has_extrema(self) -> bool:
        return bool(self.aggs) and any(a.kind in _EXTREMUM_AGGS for a in self.aggs)

    @property
    def has_distinct(self) -> bool:
        """True when the view maintains any two-level SUBSTATE agg —
        DISTINCT family or sort-based (median); the name predates the
        sort aggs and gates the shared substate machinery."""
        return bool(self.aggs) and any(a.kind in _SUBSTATE_AGGS for a in self.aggs)

    @property
    def has_variance(self) -> bool:
        return bool(self.aggs) and any(a.kind in _VARIANCE_AGGS for a in self.aggs)



def _conjuncts(node: Node) -> list:
    """Flatten a predicate's top-level AND tree into its conjuncts
    (binary AND and FilterQL's n-ary un-negated AND forms)."""
    if isinstance(node, BinaryNode) and node.op == "AND" and not getattr(node, "negated", False):
        return _conjuncts(node.left) + _conjuncts(node.right)
    if isinstance(node, BooleanNode) and node.op == "AND" and not node.negated:
        out = []
        for a in node.args:
            out.extend(_conjuncts(a))
        return out
    return [node]


def _and_tree(conjs: list) -> Node | None:
    """Rebuild a conjunct list into a left-assoc AND tree (None when
    empty)."""
    node = None
    for c in conjs:
        node = c if node is None else BinaryNode(op="AND", left=node, right=c)
    return node




def _row_local(node: Node) -> bool:
    """True when evaluating ``node`` on a single row needs nothing beyond
    that row — the precondition for running it over delta rows."""
    from .rel import SubqueryNode

    from .nodes import IncludeNode, SparkColNode, WindowNode

    for n in node.walk():
        if isinstance(n, (SubqueryNode, WindowNode, SparkColNode, IncludeNode)):
            return False
        if isinstance(n, FuncNode) and n.name in ("rand", "random", "uuid", "now", "utcnow"):
            return False  # non-deterministic / wall-clock: delta re-eval diverges
    return True


def _contains_distinct(node: Node) -> bool:
    return any(isinstance(n, FuncNode) and n.name == "distinct" for n in node.walk())


def _snapshot_cols(engine, s) -> set[str]:
    """Lower-cased column names of a sink's current snapshot (driver-side
    sidecar when available, else a schema-only scan)."""
    cols = None
    if hasattr(s, "snapshot_columns") and hasattr(s, "versions"):
        try:
            cols = s.snapshot_columns(max(s.versions()))
        except Exception:
            cols = None
    if cols is None:
        cols = s.scan(engine.spark).columns
    return {c.lower() for c in cols}




def _subst(node: Node, pairs: list) -> Node:
    """Structural find-replace over a Node tree: every subtree equal to a
    ``pairs`` key is replaced by its value (dataclass rebuild; CASE
    whens-tuples handled)."""
    import dataclasses

    for k, v in pairs:
        if node == k:
            return v
    if not dataclasses.is_dataclass(node):
        return node
    kwargs = {}
    for f in dataclasses.fields(node):
        val = getattr(node, f.name)
        if isinstance(val, Node):
            kwargs[f.name] = _subst(val, pairs)
        elif isinstance(val, (list, tuple)):
            items = []
            for it in val:
                if isinstance(it, Node):
                    items.append(_subst(it, pairs))
                elif isinstance(it, tuple):
                    items.append(
                        tuple(
                            _subst(x, pairs) if isinstance(x, Node) else x
                            for x in it
                        )
                    )
                else:
                    items.append(it)
            kwargs[f.name] = type(val)(items)
    return dataclasses.replace(node, **kwargs) if kwargs else node



_W = IdentityNode(("__w",))


def effective_where(mv: MatView):
    """The view's WHERE as the state selects evaluate it: the frozen
    scalar-subquery substitution (``MatView.scalar_subs``), or the WHERE
    minus the IN-subquery conjunct (``MatView.in_table`` — membership is
    applied to the state selects' INPUT frames), or the original."""
    if mv.in_table is not None:
        return mv.where_rest
    return mv.where_subst if mv.scalar_subs else mv.select.where



_UNSET = object()


def join_on_parts(
    mv: MatView,
    fact_cols: set,
    dim_cols: set,
    allow_cross: bool = False,
    allow_pairless: bool = False,
):
    """Decompose the view's join ON into ``(pairs, fact_preds,
    dim_preds[, cross_preds])``: the plain fact-column = dim-column
    equality pairs plus the row-local SINGLE-SIDE residual conjuncts
    (Node lists, possibly empty). With ``allow_cross``, row-local
    conjuncts referencing BOTH sides (two-sided non-equi: f.a < d.b)
    land in a fourth list instead of rejecting — the LEFT-join flip
    terms handle them by per-ROW match recounting over the ΔD-affected
    fact slice (engine._refresh_one). None when any conjunct is not
    row-local (or, without ``allow_cross``, two-sided non-equi), or
    when no equality pair exists.

    Why residuals are fine for the outer-join flip terms: a row failing
    its OWN side's residual can never match anything, so (a) match
    counting runs over residual-filtered snapshots, and (b) a
    residual-failing row is unconditionally unmatched (null-extended in
    its side's outer shapes). The equality pairs alone drive the key
    bookkeeping — exactly the terms the refresh already runs.

    Used by the F_old ⋈ ΔD maintenance term to pre-filter the fact scan
    to rows whose join key appears in the dim delta — at 100 TB that
    turns a full fact pass into a stats/row-group-skipped read (single
    key: IN-list pushed to the parquet scan; compound key: broadcast
    semi-join on the delta's distinct key tuples) — and by the
    outer-join null-flip terms, whose match counting groups by the
    (possibly compound) join key."""
    if len(mv.select.from_) < 2:
        return None
    src, d = mv.select.from_[0], mv.select.from_[1]
    if mv.dim == mv.base:
        # self-join: each occurrence is referenced by its own alias (or
        # by the bare table name for the at-most-one occurrence NOT
        # aliased away; both unaliased would be ambiguous — engine
        # rejects). Mirrors the analyze-time extrema-side resolution so
        # FROM t AS a JOIN t ON a.k = t.k classifies t.k as dim-side.
        f_ref = (src.alias or mv.base).lower()
        d_ref = (d.alias or mv.base).lower()
        fact_refs = {f_ref} if f_ref != d_ref else set()
        dim_refs = {d_ref} if f_ref != d_ref else set()
    else:
        fact_refs = {mv.base, (src.alias or "").lower()} - {""}
        dim_refs = {mv.dim, (d.alias or "").lower()} - {""}

    def _side(n):
        if not isinstance(n, IdentityNode) or getattr(n, "is_star", False):
            return None
        parts = [p.lower() for p in n.parts]
        col = parts[-1]
        if len(parts) > 1:
            if parts[0] in fact_refs and col in fact_cols:
                return ("f", n.parts[-1])
            if parts[0] in dim_refs and col in dim_cols:
                return ("d", n.parts[-1])
            return None
        if col in fact_cols and col not in dim_cols:
            return ("f", n.parts[-1])
        if col in dim_cols and col not in fact_cols:
            return ("d", n.parts[-1])
        return None

    def _expr_side(node):
        """'f' / 'd' when every identifier in ``node`` resolves to ONE
        side, else "x" when every identifier RESOLVES but they span both
        sides (a two-sided conjunct — translatable by the per-row
        recount terms), else None (an unresolvable/ambiguous name).
        NULL semantics carry over: the residual joins as a conjunct, so
        only TRUE means match-able."""
        side = None
        for n in node.walk():
            if isinstance(n, IdentityNode):
                s = _side(n)
                if s is None:
                    return None
                if side is not None and s[0] != side:
                    side = "x"
                elif side != "x":
                    side = s[0]
        return side

    def _conj(node):
        if isinstance(node, BinaryNode) and node.op == "AND":
            return _conj(node.left) + _conj(node.right)
        if isinstance(node, BooleanNode) and node.op == "AND" and not node.negated:
            out = []
            for a in node.args:
                out.extend(_conj(a))
            return out
        return [node]

    pairs = []
    fact_preds: list = []
    dim_preds: list = []
    cross_preds: list = []
    for eq in _conj(d.join_expr):
        if (
            isinstance(eq, BinaryNode)
            and eq.op in ("=", "==")
            and not getattr(eq, "negated", False)
        ):
            lhs, rhs = _side(eq.left), _side(eq.right)
            if lhs and rhs and lhs[0] != rhs[0]:
                pairs.append((lhs[1], rhs[1]) if lhs[0] == "f" else (rhs[1], lhs[1]))
                continue
        # not a clean cross-side equality: acceptable as a row-local
        # single-side residual, or (allow_cross) a two-sided conjunct
        if not _row_local(eq):
            return None
        side = _expr_side(eq)
        if side == "f":
            fact_preds.append(eq)
        elif side == "d":
            dim_preds.append(eq)
        elif side == "x" and allow_cross:
            cross_preds.append(eq)
        else:
            return None
    if not pairs and not (allow_pairless and cross_preds):
        # r16: ``allow_pairless`` accepts a PAIRLESS ON (no equality
        # conjunct, ≥1 two-sided non-equi) — the outer-join flip terms
        # then prune the affected slice with an ON-semi-join against the
        # delta's images instead of a key lookup (engine._refresh_one)
        return None
    if allow_cross:
        return pairs, fact_preds, dim_preds, cross_preds
    return pairs, fact_preds, dim_preds


def equi_join_pairs(mv: MatView, fact_cols: set, dim_cols: set):
    """The equality pairs of :func:`join_on_parts` (None when the ON
    doesn't decompose). Single-side residual conjuncts are tolerated —
    every caller either enforces them through the real join (the
    maintenance terms re-run the view's ON verbatim) or only uses the
    pairs as a conservative prune."""
    parts = join_on_parts(mv, fact_cols, dim_cols)
    return parts[0] if parts is not None else None


def equi_join_prune_cols(mv: MatView, fact_cols: set, dim_cols: set):
    """``(fact_col, dim_col)`` when the view's join ON has a SINGLE
    equality pair — the shape whose prune can push down as an IN-list.
    See :func:`join_on_parts` for the compound generalization."""
    pairs = equi_join_pairs(mv, fact_cols, dim_cols)
    return pairs[0] if pairs is not None and len(pairs) == 1 else None


