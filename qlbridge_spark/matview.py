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
    #: ORDER BY key of a pair-substate ordered collect (ORDER BY a
    #: DIFFERENT key than the argument): the substate grains by
    #: (keys, order-key, value) so the per-row pairing is retained
    okey: Node | None = None
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
    #: the WHERE minus the IN conjunct (row-local; None when empty) —
    #: what the state selects actually evaluate; membership is applied
    #: to their INPUT frames instead
    where_rest: Node | None = None

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
        # ordered-set collect: maintainable when there is ONE ORDER key.
        # Key == argument: the multiset's sorted support with repeats IS
        # the collected sequence (kinds *_sorted). Key ≠ argument: the
        # substate grains by (keys, order-key, value) so the pairing is
        # retained — state is O(distinct (okey, value) pairs per group),
        # the inherent cost (kinds *_pair); ties sort by value, exactly
        # the engine's struct comparator. Unordered forms are
        # NONDETERMINISTIC (engine contract) — never maintained.
        # FILTER stays out: the guard would desync key and argument.
        if not e.agg_order or len(e.agg_order) != 1 or e.filter_where is not None:
            return None
        okey, odir = e.agg_order[0]
        arg = e.args[0]
        if (
            _contains_distinct(arg)
            or not _row_local(arg)
            or _contains_distinct(okey)
            or not _row_local(okey)
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
        base += "_sorted" if okey == arg else "_pair"
        desc = str(odir).upper().startswith("DESC")
        kind = base + ("_desc" if desc else "")
        if okey == arg:
            return (kind, arg, None, sep)
        return (kind, arg, None, sep, okey)
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
    scalar_subs: list = []
    in_sub: tuple | None = None  # (key expr, subquery select, table)
    where_rest = select.where
    if select.where is not None and not _row_local(select.where):
        # set-context decomposition first: ONE top-level conjunct
        # ``<row-local> IN (SELECT v FROM s ...)`` over a single-table
        # view — the IN-list maintains as a 1-column dim with match-
        # count flip terms (engine._refresh_one). NOT IN stays full
        # (ANSI NULL semantics: one NULL in the list empties the view —
        # not a per-key flip).
        conjs = _conjuncts(select.where)
        in_idx = None
        for i, cj in enumerate(conjs):
            if (
                isinstance(cj, BinaryNode)
                and cj.op == "IN"
                and not getattr(cj, "negated", False)
                and isinstance(cj.right, SubqueryNode)
            ):
                in_idx = None if in_idx is not None else i
                if in_idx is None:
                    break  # two IN-subqueries: stay full
        if (
            in_idx is not None
            and len(select.from_) == 1
            and _row_local(conjs[in_idx].left)
        ):
            rest = [c for i, c in enumerate(conjs) if i != in_idx]
            sub_tbl = _analyze_in_sub(engine, conjs[in_idx].right.select)
            if sub_tbl is not None and all(_row_local(c) for c in rest):
                in_sub = (conjs[in_idx].left, conjs[in_idx].right.select, sub_tbl)
                where_rest = _and_tree(rest)
    if select.where is not None and not _row_local(select.where) and in_sub is None:
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
        # compound) tuple and count over residual-filtered snapshots.
        # (DISTINCT is fine: substates are pure signed counting and fold
        # through the same six terms; extrema ride the probe or the
        # multiset, deduced above.)
        probe = MatView(name="", select=select, base=nm, dim=dim_name)
        if (
            equi_join_pairs(
                probe,
                _snapshot_cols(engine, sink),
                _snapshot_cols(engine, engine.sinks[dim_name]),
            )
            is None
        ):
            return None

    if in_sub is not None and any(a.kind in _EXTREMUM_AGGS for a in aggs):
        # membership flips act as inserts/deletes of base rows, and the
        # extrema repair probe would re-run the state select WITHOUT the
        # IN conjunct — so probe-backed extrema ride the substate
        # MULTISET instead (fold-only, no repair; same cost note as
        # FULL joins)
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
        in_key=in_sub[0] if in_sub else None,
        in_select=in_sub[1] if in_sub else None,
        in_table=in_sub[2] if in_sub else None,
        where_rest=where_rest if in_sub else None,
    )


_W = IdentityNode(("__w",))


def effective_where(mv: MatView):
    """The view's WHERE as the state selects evaluate it: the frozen
    scalar-subquery substitution (``MatView.scalar_subs``), or the WHERE
    minus the IN-subquery conjunct (``MatView.in_table`` — membership is
    applied to the state selects' INPUT frames), or the original."""
    if mv.in_table is not None:
        return mv.where_rest
    return mv.where_subst if mv.scalar_subs else mv.select.where


def in_membership_filter(engine, mv: MatView, df: DataFrame) -> DataFrame:
    """Semi-join ``df`` (a base snapshot or signed delta) to the
    IN-subquery's value set, evaluated at whatever version of the
    subquery's table is CURRENTLY REGISTERED (refresh pins it via an
    ``engine.tables`` override, exactly like the dim machinery). NULL
    keys never match — SQL IN semantics. At 100 TB this is the
    broadcast/shuffle semi-join you'd write by hand; AQE picks the
    strategy from the runtime size of the value set."""
    from .translate import Scope, to_column

    sub_df = engine._select_any(mv.in_select)
    vals = (
        sub_df.select(F.col(sub_df.columns[0]).alias("__mv_inv"))
        .filter(F.col("__mv_inv").isNotNull())
        .distinct()
    )
    src = mv.select.from_[0]
    key = to_column(
        mv.in_key, Scope({src.alias or src.name: df}, includes=engine.includes)
    )
    return df.join(vals, key == F.col("__mv_inv"), "left_semi")


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


def _state_select(
    mv: MatView,
    tmp_table: str,
    src_ref: str | None,
    weight: Node = _W,
    join_override: str | None = None,
) -> SqlSelect:
    """The state-form SELECT over ``tmp_table`` (which must carry the base
    columns plus a signed ``__w`` weight). Reuses the original parsed
    subtrees; aliased back to the original source ref so qualified
    identifiers in keys/args/WHERE keep resolving. ``weight`` is the
    effective per-joined-row weight expression — ``__w`` normally,
    ``__w * __dw`` when the DIM side of a join view carries its own
    signed weight (the F ⋈ ΔD term of higher-order join maintenance),
    or bare ``__dw`` for dim-side-only terms (RIGHT/FULL null
    extensions, where the fact side is empty). ``join_override``
    replaces the view's join type for this one select — the matched-part
    terms of an outer-join view evaluate under INNER semantics."""

    def nn_count(arg: Node) -> Node:
        # CASE WHEN arg IS NULL THEN 0 ELSE <weight> END
        return CaseNode(
            operand=None,
            whens=[(BinaryNode(op="IS", left=arg, right=NullNode()), NumberNode("0"))],
            default=weight,
        )

    def pos_only(arg: Node) -> Node:
        # CASE WHEN <weight> > 0 THEN arg END — extrema fold over the
        # INSERT-side rows only; delete-side rows set the group's repair
        # flag instead (a removed row can't lower a min by folding)
        return CaseNode(
            operand=None,
            whens=[(BinaryNode(op=">", left=weight, right=NumberNode("0")), arg)],
            default=None,
        )

    cols = [
        Column(expr=k, alias=name) for k, name in zip(mv.key_nodes, mv.key_cols)
    ]
    cols.append(Column(expr=FuncNode(name="sum", args=[weight]), alias="__mv_n"))
    for a in mv.aggs:
        if a.s_col and not a.z_col:
            cols.append(
                Column(
                    expr=FuncNode(name="sum", args=[BinaryNode(op="*", left=weight, right=a.arg)]),
                    alias=a.s_col,
                )
            )
        # variance/covar families (z_col set): s/q are NOT computed here
        # — raw power sums cancel catastrophically at large magnitudes.
        # The centered (s, q, z) columns are grafted on by the second
        # row-level pass in state_frame (see _variance_overlay).
        if a.c_col:
            if a.arg2 is not None:
                # pairwise count (ANSI two-arg moments: a NULL in either
                # argument drops the pair)
                probe = CaseNode(
                    operand=None,
                    whens=[
                        (BinaryNode(op="IS", left=a.arg, right=NullNode()), NullNode()),
                        (BinaryNode(op="IS", left=a.arg2, right=NullNode()), NullNode()),
                    ],
                    default=NumberNode("1"),
                )
            else:
                probe = a.arg
            cols.append(Column(expr=FuncNode(name="sum", args=[nn_count(probe)]), alias=a.c_col))
        if a.m_col:
            cols.append(
                Column(expr=FuncNode(name=a.kind, args=[pos_only(a.arg)]), alias=a.m_col)
            )
    if mv.has_extrema:
        # per-group delete marker: max(CASE WHEN <weight> < 0 THEN 1 ELSE 0 END)
        cols.append(
            Column(
                expr=FuncNode(
                    name="max",
                    args=[
                        CaseNode(
                            operand=None,
                            whens=[
                                (
                                    BinaryNode(op="<", left=weight, right=NumberNode("0")),
                                    NumberNode("1"),
                                )
                            ],
                            default=NumberNode("0"),
                        )
                    ],
                ),
                alias=NEG_FLAG,
            )
        )
    import dataclasses

    from_list = [FromSource(name=tmp_table, alias=src_ref)]
    if len(mv.select.from_) > 1:
        # incremental JOIN view: the dim FromSource (name, join type, ON
        # expr) is reused VERBATIM — the fact's temp frame is aliased
        # back to the original ref so the ON keeps resolving. A
        # join_override swaps the join type for this one select.
        d = mv.select.from_[1]
        if join_override is not None and d.join_type != join_override:
            d = dataclasses.replace(d, join_type=join_override)
        from_list.append(d)
    return SqlSelect(
        columns=cols,
        from_=from_list,
        where=effective_where(mv),
        group_by=list(mv.key_nodes),
    )


_UNSET = object()


def join_on_parts(mv: MatView, fact_cols: set, dim_cols: set, allow_cross: bool = False):
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
    if not pairs:
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


def _weight_node(dim_weighted: bool, weight_mode: str | None) -> Node:
    mode = weight_mode or ("product" if dim_weighted else None)
    if mode == "product":
        return BinaryNode(op="*", left=_W, right=IdentityNode(("__dw",)))
    if mode == "dim":
        return IdentityNode(("__dw",))
    if mode == "one":
        # full-side evaluation (initial build / full rebuild / extrema
        # repair): every OUTPUT row weighs 1 — a fact-side __w column
        # would be NULL on a dim-preserved join's null-extended rows
        return NumberNode("1")
    return _W


def _variance_row_select(
    mv: MatView,
    tmp_table: str,
    src_ref: str | None,
    weight: Node,
    join_override: str | None,
) -> SqlSelect:
    """Row-level (no GROUP BY) companion to :func:`_state_select` for
    the variance family: projects the group keys, the effective weight,
    and each variance agg's argument through the SAME FROM/WHERE/join,
    so the centered second pass sees exactly the rows the aggregated
    pass aggregates."""
    import dataclasses

    cols = [
        Column(expr=k, alias=name) for k, name in zip(mv.key_nodes, mv.key_cols)
    ]
    cols.append(Column(expr=weight, alias="__mv_vw"))
    for a in mv.aggs:
        if a.z_col and a.arg2 is not None:
            # two-arg moments: PAIRWISE-guarded projections (a NULL in
            # either argument drops the pair from every sum)
            xp = CaseNode(
                operand=None,
                whens=[(BinaryNode(op="IS", left=a.arg2, right=NullNode()), NullNode())],
                default=a.arg,
            )
            yp = CaseNode(
                operand=None,
                whens=[(BinaryNode(op="IS", left=a.arg, right=NullNode()), NullNode())],
                default=a.arg2,
            )
            cols.append(Column(expr=xp, alias=f"__mv_vx_{a.z_col}"))
            cols.append(Column(expr=yp, alias=f"__mv_vy_{a.z_col}"))
        elif a.z_col:
            cols.append(Column(expr=a.arg, alias=f"__mv_vx_{a.z_col}"))
    from_list = [FromSource(name=tmp_table, alias=src_ref)]
    if len(mv.select.from_) > 1:
        d = mv.select.from_[1]
        if join_override is not None and d.join_type != join_override:
            d = dataclasses.replace(d, join_type=join_override)
        from_list.append(d)
    return SqlSelect(columns=cols, from_=from_list, where=effective_where(mv))


def _apply_variance_overlay(engine, mv: MatView, out: DataFrame, rowsel: SqlSelect) -> DataFrame:
    """Graft centered variance state (s = Σw(x−z), q = Σw(x−z)², z =
    the group's min x) onto the aggregated state frame ``out``. The
    shift is subtracted BEFORE squaring — the whole point: x² at
    epoch-millis magnitude has ulp ≈ 3e8, so raw power sums cannot be
    repaired after the fact. One window + one hash agg over the same
    keys (Catalyst reuses the partitioning), only paid by variance
    views, only over the delta."""
    from functools import reduce

    from pyspark.sql.window import Window

    rows = engine._select_any(rowsel)
    vaggs = [a for a in mv.aggs if a.z_col]
    keys = [F.col(k) for k in mv.key_cols]
    win = Window.partitionBy(*keys) if mv.key_cols else Window.partitionBy(F.lit(1))
    aggexprs = []
    for a in vaggs:
        x = F.col(f"__mv_vx_{a.z_col}")
        z = F.min(x).over(win)
        d = (x - z).cast("double")
        w_ = F.col("__mv_vw").cast("double")
        rows = rows.withColumn(f"__mv_ts_{a.z_col}", w_ * d)
        if a.arg2 is not None:
            # bivariate centered sums: both args already pairwise-guarded
            # in the row select, so every term is NULL (excluded from
            # the sums) unless BOTH are present
            y = F.col(f"__mv_vy_{a.z_col}")
            zy = F.min(y).over(win)
            dy = (y - zy).cast("double")
            rows = rows.withColumn(f"__mv_ts2_{a.z_col}", w_ * dy).withColumn(
                f"__mv_tqc_{a.z_col}", w_ * d * dy
            )
            aggexprs += [
                F.sum(f"__mv_ts_{a.z_col}").alias(a.s_col),
                F.sum(f"__mv_ts2_{a.z_col}").alias(a.s2_col),
                F.sum(f"__mv_tqc_{a.z_col}").alias(a.qc_col),
                F.min(x).cast("double").alias(a.z_col),
                F.min(y).cast("double").alias(a.z2_col),
            ]
            if a.q_col:  # corr: per-side second moments too
                rows = rows.withColumn(f"__mv_tq_{a.z_col}", w_ * d * d).withColumn(
                    f"__mv_tq2_{a.z_col}", w_ * dy * dy
                )
                aggexprs += [
                    F.sum(f"__mv_tq_{a.z_col}").alias(a.q_col),
                    F.sum(f"__mv_tq2_{a.z_col}").alias(a.q2_col),
                ]
            continue
        rows = rows.withColumn(f"__mv_tq_{a.z_col}", w_ * d * d)
        aggexprs += [
            F.sum(f"__mv_ts_{a.z_col}").alias(a.s_col),
            F.sum(f"__mv_tq_{a.z_col}").alias(a.q_col),
            F.min(x).cast("double").alias(a.z_col),
        ]
    vf = rows.groupBy(*keys).agg(*aggexprs) if mv.key_cols else rows.groupBy().agg(*aggexprs)
    if not mv.key_cols:
        return out.crossJoin(vf)
    renamed = vf.select(
        *[F.col(k).alias(f"__mvv_{k}") for k in mv.key_cols],
        *[
            F.col(c)
            for a in vaggs
            for c in (a.s_col, a.q_col, a.z_col, a.s2_col, a.q2_col, a.qc_col, a.z2_col)
            if c
        ],
    )
    cond = reduce(
        lambda acc, k: acc & F.col(k).eqNullSafe(F.col(f"__mvv_{k}")),
        mv.key_cols[1:],
        F.col(mv.key_cols[0]).eqNullSafe(F.col(f"__mvv_{mv.key_cols[0]}")),
    )
    return out.join(renamed, cond, "left").drop(*[f"__mvv_{k}" for k in mv.key_cols])


def state_frame(
    engine,
    mv: MatView,
    base_df: DataFrame,
    weight,
    dim_df: DataFrame | None = None,
    dim_weighted: bool = False,
    weight_mode: str | None = None,
    join_override: str | None = None,
) -> DataFrame:
    """Run the state select over ``base_df`` (+ a ``__w`` column). The
    frame registers under a reserved temp name for the duration of the
    engine select — same pipeline, same semantics as the original query.

    Join views: ``dim_df`` temporarily overrides what the dim table name
    resolves to (``engine.tables`` wins over sinks) — used to PIN the dim
    snapshot during a refresh, and to substitute the dim DELTA for the
    F ⋈ ΔD term of higher-order maintenance. With ``dim_weighted`` (or
    ``weight_mode='product'``) the dim frame must carry a signed
    ``__dw`` column and the effective row weight becomes ``__w * __dw``
    (a dim delete joined to a +1 fact row nets −1, exactly the
    signed-multiset algebra); ``weight_mode='dim'`` uses bare ``__dw``
    for dim-side-only terms where the fact side is empty (RIGHT/FULL
    null extensions). ``join_override`` evaluates this one select under
    a different join type (the matched-part terms of outer-join views
    run INNER)."""
    src = mv.select.from_[0]
    tmp = f"__mv_src_{id(mv) & 0xFFFFFF:x}"
    w_node = _weight_node(dim_weighted, weight_mode)
    stmt = _state_select(
        mv, tmp, src.alias or src.name, weight=w_node, join_override=join_override
    )
    engine.tables[tmp] = base_df.withColumn("__w", weight)
    saved = _UNSET
    if dim_df is not None:
        saved = engine.tables.get(mv.dim, _UNSET)
        engine.tables[mv.dim] = dim_df
    try:
        out = engine._select_any(stmt)
        if any(a.z_col for a in (mv.aggs or [])):
            out = _apply_variance_overlay(
                engine,
                mv,
                out,
                _variance_row_select(
                    mv, tmp, src.alias or src.name, w_node, join_override
                ),
            )
        return out
    finally:
        engine.tables.pop(tmp, None)
        if dim_df is not None:
            if saved is _UNSET:
                engine.tables.pop(mv.dim, None)
            else:
                engine.tables[mv.dim] = saved


def _sub_select(
    mv: MatView,
    a: AggSpec,
    tmp_table: str,
    src_ref: str | None,
    weight: Node = _W,
    join_override: str | None = None,
) -> SqlSelect:
    """The substate SELECT for one DISTINCT agg: (group keys, value) →
    signed occurrence count. Shares the view's FROM/WHERE (and join)
    verbatim, so it runs through the same pipeline as the main state."""
    import dataclasses

    cols = [
        Column(expr=k, alias=name) for k, name in zip(mv.key_nodes, mv.key_cols)
    ]
    # the value may BE a group key (min_set(d.dname) grouped by d.dname;
    # count(DISTINCT g) grouped by g): grouping by the keys alone is
    # then equivalent, and projecting the same expr under two aliases
    # would collide (the engine names both after the key) — skip the
    # value column here; sub_state_frames re-adds __mv_dv as a copy of
    # the exposed key column.
    if a.arg not in mv.key_nodes:
        cols.append(Column(expr=a.arg, alias="__mv_dv"))
    if a.okey is not None and a.okey not in mv.key_nodes and a.okey != a.arg:
        # pair substate: the ORDER key is part of the grain
        cols.append(Column(expr=a.okey, alias="__mv_do"))
    cols.append(Column(expr=FuncNode(name="sum", args=[weight]), alias="__mv_dn"))
    from_list = [FromSource(name=tmp_table, alias=src_ref)]
    if len(mv.select.from_) > 1:
        d = mv.select.from_[1]
        if join_override is not None and d.join_type != join_override:
            d = dataclasses.replace(d, join_type=join_override)
        from_list.append(d)
    group_by = list(mv.key_nodes)
    if a.arg not in group_by:
        group_by.append(a.arg)
    if a.okey is not None and a.okey not in group_by:
        group_by.append(a.okey)
    return SqlSelect(
        columns=cols,
        from_=from_list,
        where=effective_where(mv),
        group_by=group_by,
    )


def sub_state_frames(
    engine,
    mv: MatView,
    base_df: DataFrame,
    weight,
    dim_df: DataFrame | None = None,
    dim_weighted: bool = False,
    weight_mode: str | None = None,
    join_override: str | None = None,
) -> list[DataFrame]:
    """One substate frame per DISTINCT agg over ``base_df`` (+ ``__w``),
    in ``AggSpec.d_idx`` order. Same source/dim/weight/join plumbing as
    :func:`state_frame`."""
    src = mv.select.from_[0]
    tmp = f"__mv_src_{id(mv) & 0xFFFFFF:x}"
    w_node = _weight_node(dim_weighted, weight_mode)
    engine.tables[tmp] = base_df.withColumn("__w", weight)
    saved = _UNSET
    if dim_df is not None:
        saved = engine.tables.get(mv.dim, _UNSET)
        engine.tables[mv.dim] = dim_df
    try:
        out = []
        for a in mv.aggs:
            if a.kind not in _SUBSTATE_AGGS:
                continue
            f = engine._select_any(
                _sub_select(
                    mv, a, tmp, src.alias or src.name,
                    weight=w_node, join_override=join_override,
                )
            )
            if a.arg in mv.key_nodes:
                # value == group key: _sub_select skipped the duplicate
                # projection; re-add __mv_dv as a copy of the key column
                f = f.withColumn(
                    "__mv_dv", F.col(mv.key_cols[mv.key_nodes.index(a.arg)])
                )
            if a.okey is not None and "__mv_do" not in f.columns:
                # order key == a group key (constant per group) or == the
                # value: re-add the grain column as a copy
                f = f.withColumn(
                    "__mv_do",
                    F.col(mv.key_cols[mv.key_nodes.index(a.okey)])
                    if a.okey in mv.key_nodes
                    else F.col("__mv_dv"),
                )
            out.append(f)
        return out
    finally:
        engine.tables.pop(tmp, None)
        if dim_df is not None:
            if saved is _UNSET:
                engine.tables.pop(mv.dim, None)
            else:
                engine.tables[mv.dim] = saved


def merge_substates(
    mv: MatView, substates: list[DataFrame], deltas: list[DataFrame]
) -> list[DataFrame]:
    """Fold signed substate deltas: one union + hash agg per DISTINCT
    agg, grained by (keys, value); values whose occurrence count reaches
    zero drop out — O(|substate| + |delta|), never the base."""
    out = []
    subs = [a for a in mv.aggs if a.d_idx is not None]
    for a, old, delta in zip(subs, substates, deltas):
        grain = list(mv.key_cols)
        if a.kind in _PAIR_AGGS:
            grain.append("__mv_do")  # pair substate keeps the pairing
        grain.append("__mv_dv")
        merged = (
            old.unionByName(delta)
            .groupBy(*grain)
            .agg(F.sum("__mv_dn").alias("__mv_dn"))
            .filter(F.col("__mv_dn") > 0)
        )
        out.append(merged)
    return out


_STATE_COLS = lambda mv: ["__mv_n"] + [  # noqa: E731
    c
    for a in mv.aggs
    for c in (a.s_col, a.q_col, a.c_col, a.s2_col, a.q2_col, a.qc_col)
    if c
]


def merge_state(mv: MatView, internal: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a signed delta into the stored state: union + ONE hash
    aggregation on the keys. Vanished groups (row count 0) drop out —
    unless the view is a global aggregate, whose single row is kept
    (ANSI: a global agg over an empty relation still returns one row).
    Sum-shaped state folds with sum; extremum state folds with min/max
    over the insert-side candidates, carrying the delta's per-group
    delete flag forward so repair_extrema can re-aggregate exactly the
    groups whose stored extremum may have been removed."""
    states = _STATE_COLS(mv)
    folds = [F.sum(c).alias(c) for c in states]
    for a in mv.aggs:
        if a.m_col:
            folds.append((F.min if a.kind == "min" else F.max)(a.m_col).alias(a.m_col))
    if mv.has_extrema:
        internal = internal.withColumn(NEG_FLAG, F.lit(0))
        folds.append(F.max(NEG_FLAG).alias(NEG_FLAG))
    vaggs = [a for a in mv.aggs if a.z_col]
    for a in vaggs:
        # a state persisted before the centered encoding lacks z — a
        # NULL shift reads as raw sums (shift 0), which is exact
        if a.z_col not in internal.columns:
            internal = internal.withColumn(a.z_col, F.lit(None).cast("double"))
        if a.z_col not in delta.columns:
            delta = delta.withColumn(a.z_col, F.lit(None).cast("double"))
        folds.append(F.min(a.z_col).alias(a.z_col))
        if a.z2_col:
            folds.append(F.min(a.z2_col).alias(a.z2_col))
    u = internal.unionByName(delta)
    if vaggs:
        # re-center every contribution to the group's common shift
        # Z = min over contributing shifts BEFORE the additive fold:
        # Σw(x−Z) = s + (z−Z)·c, Σw(x−Z)² = q + 2(z−Z)·s + (z−Z)²·c —
        # exact algebra (c is the signed non-null count, so net-zero
        # groups re-center correctly too). Window + groupBy share the
        # key partitioning: one shuffle. A row "has data" iff s is
        # non-null (all-NULL-arg groups contribute nothing).
        from pyspark.sql.window import Window

        win = (
            Window.partitionBy(*[F.col(k) for k in mv.key_cols])
            if mv.key_cols
            else Window.partitionBy(F.lit(1))
        )
        for a in vaggs:
            data = F.col(a.s_col).isNotNull()
            zeff = F.coalesce(F.col(a.z_col), F.lit(0.0))
            big_z = F.min(F.when(data, zeff)).over(win)
            d = zeff - big_z
            c_ = F.coalesce(F.col(a.c_col), F.lit(0)).cast("double")
            s_ = F.col(a.s_col)
            if a.arg2 is not None:
                # bivariate re-centering to the common shifts (Zx, Zy):
                # Σw(x−Zx)(y−Zy) = qxy + dx·sy + dy·sx + dx·dy·c, with
                # the per-side second moments re-centering exactly like
                # the univariate case — all formulas use the ORIGINAL
                # sx/sy, staged via temp columns before the overwrite
                zeff2 = F.coalesce(F.col(a.z2_col), F.lit(0.0))
                big_z2 = F.min(F.when(data, zeff2)).over(win)
                d2 = zeff2 - big_z2
                s2_ = F.col(a.s2_col)
                u = u.withColumn(
                    "__mv_tqc",
                    F.col(a.qc_col) + d * s2_ + d2 * s_ + d * d2 * c_,
                ).withColumn("__mv_ts", s_ + d * c_).withColumn(
                    "__mv_ts2", s2_ + d2 * c_
                )
                if a.q_col:
                    u = u.withColumn(
                        "__mv_tq", F.col(a.q_col) + 2.0 * d * s_ + d * d * c_
                    ).withColumn(
                        "__mv_tq2", F.col(a.q2_col) + 2.0 * d2 * s2_ + d2 * d2 * c_
                    ).withColumn(
                        a.q_col, F.when(data, F.col("__mv_tq"))
                    ).withColumn(a.q2_col, F.when(data, F.col("__mv_tq2")))
                u = (
                    u.withColumn(a.qc_col, F.when(data, F.col("__mv_tqc")))
                    .withColumn(a.s_col, F.when(data, F.col("__mv_ts")))
                    .withColumn(a.s2_col, F.when(data, F.col("__mv_ts2")))
                    .withColumn(a.z_col, F.when(data, big_z))
                    .withColumn(a.z2_col, F.when(data, big_z2))
                    .drop("__mv_ts", "__mv_ts2", "__mv_tq", "__mv_tq2", "__mv_tqc")
                )
                continue
            q_ = F.col(a.q_col)
            u = (
                u.withColumn("__mv_tq", q_ + 2.0 * d * s_ + d * d * c_)
                .withColumn("__mv_ts", s_ + d * c_)
                .withColumn(a.s_col, F.when(data, F.col("__mv_ts")))
                .withColumn(a.q_col, F.when(data, F.col("__mv_tq")))
                .withColumn(a.z_col, F.when(data, big_z))
                .drop("__mv_ts", "__mv_tq")
            )
    merged = u.groupBy(*[F.col(k) for k in mv.key_cols]).agg(*folds)
    if mv.key_cols:
        merged = merged.filter(F.col("__mv_n") > 0)
    else:
        # global agg: sum over zero input rows is NULL; re-zero the count
        merged = merged.withColumn("__mv_n", F.coalesce(F.col("__mv_n"), F.lit(0)))
    return merged


def _semi_by_keys(engine, frame: DataFrame, ref: str, mv: MatView, stale_keys):
    """Rows of ``frame`` (aliased ``ref``) whose group-key exprs match a
    stale key (null-safe — a NULL key IS a group)."""
    from functools import reduce

    from .translate import Scope, to_column

    scope = Scope({ref: frame}, includes=engine.includes)
    probe = frame
    conds = []
    for k, name in zip(mv.key_nodes, mv.key_cols):
        probe = probe.withColumn(f"__mv_k_{name}", to_column(k, scope))
        conds.append(F.col(f"__mv_k_{name}").eqNullSafe(F.col(f"__sk.{name}")))
    return probe.join(
        F.broadcast(stale_keys.alias("__sk")),
        on=reduce(lambda a, b: a & b, conds),
        how="left_semi",
    ).drop(*[f"__mv_k_{n}" for n in mv.key_cols])


def repair_extrema(
    engine,
    mv: MatView,
    merged: DataFrame,
    base_version: int,
    dim_version: int | None = None,
) -> DataFrame:
    """Re-aggregate the groups a delete touched (their stored min/max is
    non-foldable: the reigning extremum may be the removed row) from the
    base snapshot, and graft the fresh state over the folded one. The
    change feed names EXACTLY which groups — the base read is a
    key-semi-joined scan, O(affected groups' rows), never O(base) unless
    the view is a global aggregate (one group = the whole table; that
    recompute cost is inherent, and only paid when a delete occurred).

    ``extrema_side`` picks the probe relation: ``'fact'`` (default)
    semi-joins stale group keys against the fact snapshot and re-runs
    the view's join over the pruned facts; ``'dim'`` (INNER/RIGHT views
    whose group keys live on the dim side) prunes the DIM rows instead
    and re-runs the join with the dim SUBSTITUTED — correct because on
    a dim-preserved or inner join, the pruned dim's output is exactly
    the stale groups' rows. With a plain equi key the fact scan is
    additionally semi-pruned to the stale dim rows' join keys."""
    clean = merged.filter(F.col(NEG_FLAG) == 0).drop(NEG_FLAG)
    stale_keys = merged.filter(F.col(NEG_FLAG) > 0).select(*mv.key_cols)
    if not stale_keys.limit(1).count():
        return clean  # no delete touched any surviving group
    base = engine.sinks[mv.base].scan(engine.spark, version=base_version)
    dim_df = None
    if mv.key_cols and mv.extrema_side == "dim":
        dsink = engine.sinks[mv.dim]
        dim_frame = dsink.scan(
            engine.spark,
            version=dim_version if dim_version is not None else max(dsink.versions()),
        )
        d = mv.select.from_[1]
        dim_df = _semi_by_keys(engine, dim_frame, d.alias or d.name, mv, stale_keys)
        pj = equi_join_prune_cols(
            mv,
            {c.lower() for c in base.columns},
            {c.lower() for c in dim_frame.columns},
        )
        if pj is not None:
            fact_col, dim_col = pj
            jk = dim_df.select(F.col(dim_col).alias("__mv_jk")).distinct()
            base = base.join(
                F.broadcast(jk), base[fact_col] == jk["__mv_jk"], "left_semi"
            )
    elif mv.key_cols:
        src = mv.select.from_[0]
        base = _semi_by_keys(engine, base, src.alias or src.name, mv, stale_keys)
    fresh = state_frame(
        engine, mv, base, F.lit(1), dim_df=dim_df, weight_mode="one"
    ).drop(NEG_FLAG)
    if not mv.key_cols:
        return fresh  # global aggregate: the one group IS the recompute
    return clean.unionByName(fresh)


def exposed_frame(mv: MatView) -> DataFrame:
    """Project the internal state to the view's declared columns, cast to
    the exact dtypes of the original query."""
    if not mv.incremental:
        return mv.internal
    if mv.expand:
        # multiset state → rows: each distinct projected tuple repeats
        # its signed-count times (O(|view|) generate, no shuffle)
        n = F.greatest(F.col("__mv_n"), F.lit(0)).cast("int")
        df = (
            mv.internal.select(
                F.explode(
                    F.array_repeat(F.struct(*[F.col(k) for k in mv.key_cols]), n)
                ).alias("__mv_r")
            ).select("__mv_r.*")
        )
        if mv.exposed_types:
            df = df.select(
                *[
                    F.col(c).cast(mv.exposed_types[c]).alias(c)
                    if c in mv.exposed_types
                    else F.col(c)
                    for c in df.columns
                ]
            )
        return df
    out = []
    for k in mv.key_cols:
        out.append(F.col(k).alias(k))
    distinct_aggs = []
    for a in mv.aggs:
        if a.kind == "count_star":
            c = F.coalesce(F.col("__mv_n"), F.lit(0))
        elif a.kind == "count":
            c = F.coalesce(F.col(a.c_col), F.lit(0))
        elif a.kind == "sum":
            c = F.when(F.col(a.c_col) > 0, F.col(a.s_col))
        elif a.kind in _EXTREMUM_AGGS:
            c = F.col(a.m_col)
        elif a.kind in _SUBSTATE_AGGS:
            distinct_aggs.append(a)
            continue  # joined in from the substate below
        elif a.kind in _VARIANCE_AGGS:
            # algebraic over CENTERED moments (shift-invariant):
            # m2 = Σ(x−z)² − (Σ(x−z))²/n, clamped ≥ 0 against ulp
            # drift; sample variants need n ≥ 2, population n ≥ 1
            n_ = F.col(a.c_col).cast("double")
            s_ = F.col(a.s_col).cast("double")
            q_ = F.col(a.q_col).cast("double")
            m2 = F.greatest(q_ - (s_ * s_) / n_, F.lit(0.0))
            if a.kind in ("var_pop", "stddev_pop"):
                c = F.when(n_ > 0, m2 / n_)
            else:
                c = F.when(n_ > 1, m2 / (n_ - 1))
            if a.kind.startswith("stddev"):
                c = F.sqrt(c)
        elif a.kind in _COVAR_AGGS:
            # bivariate centered moments: m_xy = qxy − sx·sy/n over the
            # pairwise-non-null count; corr = m_xy / sqrt(m_xx·m_yy),
            # NULL when either variance is zero — the engine's corr()
            # convention (try_divide), so exposure == recompute exactly
            n_ = F.col(a.c_col).cast("double")
            sx = F.col(a.s_col).cast("double")
            sy = F.col(a.s2_col).cast("double")
            mxy = F.col(a.qc_col).cast("double") - (sx * sy) / n_
            if a.kind == "covar_samp":
                c = F.when(n_ > 1, mxy / (n_ - 1))
            elif a.kind == "covar_pop":
                c = F.when(n_ > 0, mxy / n_)
            else:  # corr
                mxx = F.greatest(
                    F.col(a.q_col).cast("double") - (sx * sx) / n_, F.lit(0.0)
                )
                myy = F.greatest(
                    F.col(a.q2_col).cast("double") - (sy * sy) / n_, F.lit(0.0)
                )
                c = F.when(
                    (n_ > 0) & (mxx > 0) & (myy > 0), mxy / F.sqrt(mxx * myy)
                )
        else:  # avg
            c = F.when(F.col(a.c_col) > 0, F.col(a.s_col) / F.col(a.c_col))
        out.append(c.alias(a.out))
    df = mv.internal.select(*out)
    for a in distinct_aggs:
        # re-aggregate the O(|distinct values|) substate and graft the
        # column in: per-group |view|-sized join, never a base read.
        # NULL values don't count/sum (ANSI DISTINCT-agg semantics);
        # NULL group keys join null-safely (a NULL key IS a group).
        sub = mv.substates[a.d_idx].filter(F.col("__mv_dv").isNotNull())
        if a.kind in _ORDERED_AGGS:
            # ordered-set collect: the multiset's sorted support with
            # per-value repeats IS the collected sequence. NULL values
            # are kept (array_agg collects them; string_agg's
            # array_join drops them — both exactly the engine's
            # behavior) and the sort uses the SAME sort_array
            # comparator as the engine's ordered collect.
            desc = a.kind.endswith("_desc")
            fields = [F.col("__mv_dv").alias("v"), F.col("__mv_dn").alias("n")]
            if a.kind in _PAIR_AGGS:
                # pair substate: the ORDER key leads the comparator; ties
                # fall through to the value — exactly the engine's
                # struct(key…, value) sort_array comparator
                fields.insert(0, F.col("__mv_do").alias("o"))
            structs = F.sort_array(F.collect_list(F.struct(*fields)), asc=not desc)
            arr = F.flatten(
                F.transform(
                    structs, lambda s_: F.array_repeat(s_["v"], s_["n"].cast("int"))
                )
            )
            if a.kind.startswith("string_agg"):
                sep = a.arg2.value if a.arg2 is not None else ","
                agg_c = F.array_join(
                    F.transform(arr, lambda v: v.cast("string")), sep
                )
            else:
                agg_c = arr
            cf = (
                mv.substates[a.d_idx]
                .groupBy(*[F.col(k) for k in mv.key_cols])
                .agg(agg_c.alias(a.out))
            )
            if mv.key_cols:
                cfa = cf.select(
                    *[F.col(k).alias(f"__mvd_{k}") for k in mv.key_cols], F.col(a.out)
                )
                cond = None
                for k in mv.key_cols:
                    c = df[k].eqNullSafe(cfa[f"__mvd_{k}"])
                    cond = c if cond is None else (cond & c)
                df = df.join(cfa, cond, "left").drop(*[f"__mvd_{k}" for k in mv.key_cols])
            else:
                df = df.crossJoin(cf) if cf.columns else df
            # collect_list/array_join are never NULL, but the graft join
            # made the column nullable — coalesce with a typed empty
            # default so the exposed schema matches the recompute
            # exactly (the default never fires: every live group has
            # substate rows)
            et = (mv.exposed_types or {}).get(a.out)
            if et is not None:
                default = (
                    F.lit("")
                    if a.kind.startswith("string_agg")
                    else F.array().cast(et)
                )
                df = df.withColumn(a.out, F.coalesce(F.col(a.out), default))
            continue
        if a.kind in _SORT_AGGS or a.kind in _SORT_DISTINCT:
            # exact weighted percentile over the (value, count) multiset
            # with Spark/DuckDB linear interpolation: target index
            # t = (N−1)·p over the sorted occurrences; value v_i with
            # count c_i covers indices [cum_{i−1}, cum_i); the answer
            # interpolates between the values covering ⌊t⌋ and ⌈t⌉.
            # One window + one hash agg on the same keys (one shuffle).
            # DISTINCT variants count each distinct value ONCE (the
            # occurrence weight collapses to 1).
            from pyspark.sql.window import Window

            keys = [F.col(k) for k in mv.key_cols]
            w_part = Window.partitionBy(*keys) if mv.key_cols else Window.partitionBy(F.lit(1))
            w_ord = w_part.orderBy(F.col("__mv_dv")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            p = a.p if a.p is not None else 0.5
            occ = F.lit(1) if a.kind in _SORT_DISTINCT else F.col("__mv_dn")
            s2 = sub.withColumn("__mv_cum", F.sum(occ).over(w_ord)).withColumn(
                "__mv_t",
                (F.sum(occ).over(w_part) - F.lit(1)).cast("double") * F.lit(p),
            )
            grouped = s2.groupBy(*keys) if mv.key_cols else s2.groupBy()
            cf = grouped.agg(
                F.min(
                    F.when(
                        F.col("__mv_cum").cast("double") > F.floor(F.col("__mv_t")),
                        F.col("__mv_dv").cast("double"),
                    )
                ).alias("__mv_vlo"),
                F.min(
                    F.when(
                        F.col("__mv_cum").cast("double") > F.ceil(F.col("__mv_t")),
                        F.col("__mv_dv").cast("double"),
                    )
                ).alias("__mv_vhi"),
                F.first("__mv_t").alias("__mv_t"),
            )
            frac = F.col("__mv_t") - F.floor(F.col("__mv_t"))
            cf = cf.select(
                *[F.col(k) for k in mv.key_cols],
                (
                    F.col("__mv_vlo")
                    + (F.coalesce(F.col("__mv_vhi"), F.col("__mv_vlo")) - F.col("__mv_vlo")) * frac
                ).alias(a.out),
            )
        else:
            if a.kind == "count_distinct":
                agg_c = F.count(F.lit(1))
            elif a.kind == "sum_distinct":
                agg_c = F.sum("__mv_dv")
            elif a.kind in _SET_EXTREMA:
                # multiset-backed extrema (FULL/self-join shapes): the
                # exposed value is just the multiset's edge — deletes
                # already folded out of the substate, no repair probe
                agg_c = (F.min if a.kind == "min_set" else F.max)("__mv_dv")
            elif a.kind == "mode":
                # argmax of the occurrence counts, ties to the SMALLEST
                # value — exactly Spark's deterministic mode (which the
                # engine's mode() maps to): min over (−count, value)
                agg_c = F.min_by(
                    "__mv_dv",
                    F.struct(
                        (-F.col("__mv_dn")).alias("nc"), F.col("__mv_dv").alias("v")
                    ),
                )
            elif a.kind in _VARIANCE_DISTINCT:
                # plain variance over the substate's VALUES (the
                # distinct non-null support; occurrence counts ignored)
                base = a.kind[: -len("_distinct")]
                agg_c = {
                    "variance": F.var_samp,
                    "var_samp": F.var_samp,
                    "var_pop": F.var_pop,
                    "stddev": F.stddev_samp,
                    "stddev_samp": F.stddev_samp,
                    "stddev_pop": F.stddev_pop,
                }[base](F.col("__mv_dv").cast("double"))
            else:  # avg_distinct
                agg_c = F.avg("__mv_dv")
            cf = sub.groupBy(*[F.col(k) for k in mv.key_cols]).agg(agg_c.alias(a.out))
        if mv.key_cols:
            cfa = cf.select(
                *[F.col(k).alias(f"__mvd_{k}") for k in mv.key_cols], F.col(a.out)
            )
            cond = None
            for k in mv.key_cols:
                c = df[k].eqNullSafe(cfa[f"__mvd_{k}"])
                cond = c if cond is None else (cond & c)
            df = df.join(cfa, cond, "left").drop(*[f"__mvd_{k}" for k in mv.key_cols])
        else:
            # global aggregate: both sides are single-row
            df = df.crossJoin(cf) if cf.columns else df
        if a.kind == "count_distinct":
            df = df.withColumn(a.out, F.coalesce(F.col(a.out), F.lit(0)))
    if mv.having is not None or mv.order_exprs or mv.win_cols or mv.qualify is not None:
        from .translate import Scope, to_column

        having_n, win_n, qualify_n = mv.having, mv.win_cols, mv.qualify
        if mv.expose_subs:
            # substitute the frozen expose-time scalar-subquery values as
            # typed literals (placeholders ``__mv_es<i>`` were planted at
            # analyze time); values refresh per REFRESH — re-expose only,
            # never a state rebuild
            from .nodes import SparkColNode

            es_pairs = [
                (
                    IdentityNode((f"__mv_es{i}",)),
                    SparkColNode(col=F.lit(v).cast(dt), dtype=dt, text="(SELECT ...)"),
                )
                for i, (v, dt) in enumerate(mv.expose_vals or [])
            ]
            if having_n is not None:
                having_n = _subst(having_n, es_pairs)
            win_n = [(n, _subst(e, es_pairs)) for n, e in win_n]
            if qualify_n is not None:
                qualify_n = _subst(qualify_n, es_pairs)
        scope = Scope({"__mv_view": df})
        if having_n is not None:
            # post-aggregation filter over exposed + hidden agg columns
            df = df.filter(to_column(having_n, scope))
            scope = Scope({"__mv_view": df})
        for wname, wnode in win_n:
            # ANSI order: projection windows run AFTER HAVING, over the
            # surviving groups; in SELECT order so a later window can
            # reference an earlier one's alias
            df = df.withColumn(wname, to_column(wnode, scope))
            scope = Scope({"__mv_view": df})
        if qualify_n is not None:
            # QUALIFY filters after the windows; window exprs can't sit
            # in a Filter directly — project the predicate, then filter
            df = (
                df.withColumn("__mv_qual", to_column(qualify_n, scope).cast("boolean"))
                .filter(F.col("__mv_qual"))
                .drop("__mv_qual")
            )
            scope = Scope({"__mv_view": df})
        if mv.order_exprs:
            # top-k exposure: sort (and LIMIT/OFFSET) over the FULL
            # state — groups enter/leave the k without extra maintenance.
            # Ties resolve arbitrarily, exactly like running the query.
            from .engine import Engine

            df = df.orderBy(
                *[
                    d
                    for e, direction in mv.order_exprs
                    for d in Engine._directional(to_column(e, scope), direction)
                ]
            )
            if mv.offset:
                df = df.offset(int(mv.offset))
            if mv.limit is not None:
                df = df.limit(int(mv.limit))
    if mv.out_order and set(mv.out_order) <= set(df.columns):
        # original SELECT column order; also drops HIDDEN (HAVING-only)
        # agg columns from the exposed projection
        df = df.select(*mv.out_order)
    if mv.exposed_types:
        df = df.select(
            *[
                F.col(c).cast(mv.exposed_types[c]).alias(c) if c in mv.exposed_types else F.col(c)
                for c in df.columns
            ]
        )
    return df


def persist_state(mv: MatView, state: DataFrame) -> DataFrame:
    """Durably store the new state and return the frame to read it back
    from: the state sink when configured (a new committed version per
    refresh — the view itself is time-travelable), else a
    localCheckpoint (cuts lineage so chained refreshes stay O(1) deep)."""
    if mv.state_sink is not None:
        if getattr(mv.state_sink, "_version", lambda: -1)() < 0:
            mv.state_sink.ensure(state)
        else:
            mv.state_sink.overwrite(state)
        return mv.state_sink.scan(mv.state_sink.spark)
    return state.localCheckpoint(eager=True)


def persist_substates(mv: MatView, frames: list[DataFrame]) -> list[DataFrame]:
    """Durably store the DISTINCT-agg substates (sibling sinks when the
    view was created WITH {"path"}, else localCheckpoints) and return
    the frames to read them back from — mirror of :func:`persist_state`
    for the two-level state."""
    if not mv.sub_sinks:
        return [f.localCheckpoint(eager=True) for f in frames]
    out = []
    for sink, f in zip(mv.sub_sinks, frames):
        if getattr(sink, "_version", lambda: -1)() < 0:
            sink.ensure(f)
        else:
            sink.overwrite(f)
        out.append(sink.scan(sink.spark))
    return out
