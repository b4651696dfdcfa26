"""Source-owned pushdown: sources can claim their own sub-select planning.

Reference parity: ``plan.SourcePlanner`` (/root/reference/plan/plan.go:116-123)
lets a source "do its own planning for sub-select statements (ie mysql can do
its own select/projection, mongo/es as well)", and ``exec.ExecutorSource``
(/root/reference/exec/executor.go:194-198) lets it take over execution. The
reference planner rewrites the statement per-source first
(rel.SqlSource rewriting in /root/reference/rel/sql_rewrite.go) so each
source only sees its own columns and predicates.

Spark-first translation: a *source* here produces a DataFrame, so "claiming
execution" means returning a DataFrame that already embodies (some of) the
sub-select — fewer rows/columns shipped out of the store. Two differences
from the reference, both deliberate:

- **The engine re-applies the full WHERE on top of whatever the source
  returns.** Filters are idempotent, so a source may push any *subset* of
  the conjuncts it was offered (or none) without a correctness obligation —
  pushdown is purely scan reduction, correctness stays engine-side. The
  reference instead trusts the source completely (exec/executor.go:195
  hands the whole plan over); trusting is faster by one filter but makes
  every connector author responsible for exact dialect semantics. At 100 TB
  the double-filter is a no-op (Catalyst collapses adjacent filters on the
  returned plan when the source is itself a Spark scan).
- **LIMIT is only offered when every WHERE conjunct was offered**, and a
  source must only apply it if it applied *all* of them (otherwise rows
  could be cut before filtering).

Built-in implementations: ``sources.SqliteSource`` (compiles the sub-select
to a SQLite SQL string — the reference runs its golden suite against sqlite,
datasource/sqlite/source.go:20-49) and ``planner.EsDataFrameSource`` (compiles
the predicate to the ES bool-query DSL via generators/esgen — the reference's
elasticsearch generator, generators/elasticsearch/esgen/esgenerator.go:31-60).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame

from .nodes import (
    BinaryNode,
    BooleanNode,
    IdentityNode,
    IncludeNode,
    Node,
    TriNode,
    UnaryNode,
)
from .rel import Column, FromSource, SqlSelect, SubqueryNode


class SourcePlanner:
    """Interface for sources that plan their own sub-selects
    (≈ plan.SourcePlanner, /root/reference/plan/plan.go:116-123).

    Implement any subset; the engine probes with ``getattr``.
    """

    def scan(self, spark) -> DataFrame:  # pragma: no cover - interface
        """Unplanned full scan of the source (fallback path)."""
        raise NotImplementedError

    def walk_source_select(self, engine, sel: SqlSelect) -> DataFrame | None:
        """Offered the per-source rewritten sub-select. Return a DataFrame
        embodying as much of it as the source can push (the engine re-applies
        the WHERE regardless), or None to decline (engine falls back to
        ``scan``). ≈ SourcePlanner.WalkSourceSelect."""
        return None

    def walk_source_filter(self, engine, stmt) -> DataFrame | None:
        """Same hook for FilterQL statements (the reference's FilterGenerator
        path, generators/elasticsearch/esgen/esgenerator.go:45-55)."""
        return None


# ---------------------------------------------------------------------------
# per-source sub-select rewrite (≈ rel/sql_rewrite.go RewriteSqlSource)
# ---------------------------------------------------------------------------


def _walk_identities(node: Node | None, out: list[IdentityNode]) -> None:
    if node is None:
        return
    if isinstance(node, IdentityNode):
        out.append(node)
        return
    if isinstance(node, SubqueryNode):
        return  # subquery identities resolve against the inner statement
    for child in node.children() if hasattr(node, "children") else []:
        _walk_identities(child, out)


def _conjuncts(node: Node) -> list[Node]:
    if isinstance(node, BinaryNode) and node.op == "AND" and not node.negated:
        return _conjuncts(node.left) + _conjuncts(node.right)
    if isinstance(node, BooleanNode) and node.op == "AND" and not node.negated:
        out: list[Node] = []
        for a in node.args:
            out.extend(_conjuncts(a))
        return out
    return [node]


def _and_join(conjs: list[Node]) -> Node | None:
    if not conjs:
        return None
    node = conjs[0]
    for c in conjs[1:]:
        node = BinaryNode("AND", node, c)
    return node


def _contains_subquery(node: Node) -> bool:
    if isinstance(node, (SubqueryNode, IncludeNode)):
        return True
    return any(_contains_subquery(c) for c in (node.children() if hasattr(node, "children") else []))


def _strip_qualifier(node: Node, ref: str) -> Node:
    """Rewrite ``ref.col`` → ``col`` so the source sees its own column names
    (the reference's rewrite does the same, rel/sql_rewrite.go)."""
    if isinstance(node, IdentityNode):
        if len(node.parts) > 1 and node.parts[0] == ref:
            return IdentityNode(node.parts[1:])
        return node
    if isinstance(node, BinaryNode):
        return BinaryNode(node.op, _strip_qualifier(node.left, ref), _strip_qualifier(node.right, ref), node.negated)
    if isinstance(node, UnaryNode):
        return UnaryNode(node.op, _strip_qualifier(node.child, ref))
    if isinstance(node, BooleanNode):
        return BooleanNode(node.op, [_strip_qualifier(a, ref) for a in node.args], node.negated)
    if isinstance(node, TriNode):
        return TriNode(node.op, [_strip_qualifier(a, ref) for a in node.args], node.negated)
    if hasattr(node, "children") and hasattr(node, "args"):
        try:
            return replace(node, args=[_strip_qualifier(a, ref) for a in node.args])
        except TypeError:
            return node
    return node


@dataclass
class SourceRewrite:
    """What the engine offers a plannable source for one FROM entry."""

    select: SqlSelect
    all_where_offered: bool = True  # True → LIMIT in select may be applied
    consumed: list[Node] = field(default_factory=list)


def rewrite_source_select(sel: SqlSelect, src: FromSource) -> SourceRewrite:
    """Build the per-source sub-select: pruned columns + the WHERE conjuncts
    that reference only this source. ≈ the reference's per-source statement
    rewrite feeding SourcePlanner.WalkSourceSelect.

    Column attribution: ``ref.col`` belongs to the source aliased ``ref``;
    unqualified names belong to every source (a source intersects with its
    actual schema — it knows its columns, the engine may not).
    """
    refs = {s.ref for s in sel.from_}
    single = len(sel.from_) == 1

    def owned(ident: IdentityNode) -> bool:
        if ident.is_star:
            return True
        if len(ident.parts) > 1 and ident.parts[0] in refs:
            return ident.parts[0] == src.ref
        return True  # unqualified → offer to every source

    # referenced columns across the whole statement
    idents: list[IdentityNode] = []
    star = False
    for c in sel.columns:
        if c.is_star:
            star = True
        else:
            _walk_identities(c.expr, idents)
            _walk_identities(c.guard, idents)
    _walk_identities(sel.where, idents)
    _walk_identities(sel.having, idents)
    for g in sel.group_by:
        _walk_identities(g, idents)
    for e, _ in sel.order_by:
        _walk_identities(e, idents)
    for s in sel.from_:
        _walk_identities(s.join_expr, idents)

    needed: list[str] = []
    for ident in idents:
        if ident.is_star:
            star = True
            continue
        if not owned(ident):
            continue
        name = ident.parts[-1] if (len(ident.parts) > 1 and ident.parts[0] in refs) else ident.name
        if name not in needed:
            needed.append(name)

    if star or not needed:
        cols = [Column(IdentityNode(("*",)))]
    else:
        cols = [Column(IdentityNode((n,))) for n in needed]

    # pushable WHERE conjuncts: only this source's identities, no subqueries
    pushable: list[Node] = []
    all_offered = True
    if sel.where is not None:
        for conj in _conjuncts(sel.where):
            cids: list[IdentityNode] = []
            _walk_identities(conj, cids)
            if not _contains_subquery(conj) and all(owned(i) for i in cids) and (single or all(len(i.parts) > 1 and i.parts[0] == src.ref for i in cids)):
                pushable.append(_strip_qualifier(conj, src.ref))
            else:
                all_offered = False

    sub = SqlSelect(
        columns=cols,
        from_=[FromSource(name=src.name, alias=src.alias)],
        where=_and_join(pushable),
    )
    # LIMIT is only safe if the source applies the entire WHERE; only offer
    # it when everything was offered and no post-ops reorder/regroup rows
    if all_offered and single and not sel.group_by and not sel.order_by and not sel.distinct and sel.limit is not None:
        sub.limit = sel.limit if not sel.offset else sel.limit + sel.offset
    return SourceRewrite(select=sub, all_where_offered=all_offered, consumed=pushable)


# ---------------------------------------------------------------------------
# ES-backed source through the pushdown hook
# ---------------------------------------------------------------------------


class EsDataFrameSource(SourcePlanner):
    """An "Elasticsearch index" source: predicates compile to the ES
    bool-query DSL (generators/esgen) exactly as the reference's es
    generator does; the store-side execution is simulated over a backing
    DataFrame (no ES in the container — same situation as the reference's
    generator unit tests, which assert the DSL JSON only).

    On a real cluster the generated body goes into the es-hadoop /
    opensearch connector's ``es.query`` option so only matching documents
    ship out of the store.
    """

    def __init__(self, df: DataFrame):
        self.df = df
        self.last_query: dict | None = None  # last generated DSL body

    def scan(self, spark) -> DataFrame:
        return self.df

    def walk_source_select(self, engine, sel: SqlSelect) -> DataFrame | None:
        from .generators.esgen import EsGenError, to_es_query

        body: dict = {}
        if sel.where is not None:
            try:
                body["query"] = to_es_query(sel.where, engine.includes)
            except EsGenError:
                self.last_query = None
                return None  # not expressible → engine filters after full scan
        else:
            body["query"] = {"match_all": {}}
        if sel.limit is not None:
            body["size"] = sel.limit
        cols = [c.expr.name for c in sel.columns if not c.is_star and isinstance(c.expr, IdentityNode)]
        if cols:
            body["_source"] = cols
        self.last_query = body

        # store-side execution (simulated): filter + prune on the backing df
        out = self.df
        if sel.where is not None:
            from .translate import Scope, to_column

            out = out.filter(to_column(sel.where, Scope({"_": out}, includes=engine.includes, strict=False)))
        if cols:
            keep = [c for c in out.columns if c in cols]
            if keep:
                out = out.select(*keep)
        if sel.limit is not None:
            out = out.limit(sel.limit)
        return out

    def walk_source_filter(self, engine, stmt) -> DataFrame | None:
        from .generators.esgen import EsGenError, to_es_query

        try:
            body: dict = {"query": to_es_query(stmt.filter, engine.includes)}
        except EsGenError:
            self.last_query = None
            return None
        if stmt.limit:
            body["size"] = stmt.limit
        self.last_query = body
        from .translate import Scope, to_column

        out = self.df.filter(to_column(stmt.filter, Scope({"_": self.df}, includes=engine.includes, strict=False)))
        if stmt.limit:
            out = out.limit(stmt.limit)
        return out
