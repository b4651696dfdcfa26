"""FilterQL / expression → Elasticsearch bool-query DSL compiler.

Parity with the reference's source-owned pushdown generator
(/root/reference/generators/elasticsearch/esgen/esgenerator.go:31-60,
estypes.go, bridgeutil.go): instead of pulling rows and filtering in the
engine, the predicate is compiled to a native ES query the store executes.

Shape conventions (mirroring estypes.go / bridgeutil.go):
- AND(...)          → {"bool": {"filter": [...]}}
- OR(...)           → {"bool": {"should": [...], "minimum_should_match": 1}}
- NOT x             → {"bool": {"must_not": [x]}}
- x == v            → {"term": {"x": v}}
- x != v            → must_not term
- x >/>=/</<= v     → {"range": {"x": {"gt"/"gte"/"lt"/"lte": v}}}
- x BETWEEN a AND b → range gt/lt (the dialect's EXCLUSIVE between)
- x IN (...)        → {"terms": {"x": [...]}}
- EXISTS x          → {"exists": {"field": "x"}}
- x LIKE "ab%"      → {"wildcard": {"x": "ab*"}} (bridgeutil.go:193-213)
- x CONTAINS "s"    → {"wildcard": {"x": "*s*"}}
- `*` / match_all   → {"match_all": {}} (esgenerator.go:79-85)
- datemath strings ("now-3d") pass through — ES evaluates them natively
- INCLUDE name      → resolved from the includes registry and inlined

In a Spark pipeline this powers an ES-backed source: the engine pushes the
FilterQL predicate into the es-hadoop/opensearch connector's query option
so the cluster-side scan only ships matching documents.
"""

from __future__ import annotations

import json

from ..exprparse import parse_expression
from ..nodes import (
    ArrayNode,
    BinaryNode,
    BoolNode,
    BooleanNode,
    FuncNode,
    IdentityNode,
    IncludeNode,
    MatchAllNode,
    Node,
    NullNode,
    NumberNode,
    StringNode,
    TriNode,
    UnaryNode,
)
from ..rel import parse_filterql
from ..translate import _DATEMATH_RE


class EsGenError(ValueError):
    pass


def _field(node: Node) -> str:
    if isinstance(node, IdentityNode):
        return node.name
    if isinstance(node, FuncNode) and node.name in ("exists", "tolower") and node.args:
        return _field(node.args[0])
    raise EsGenError(f"expected a field identity, got {node.sql()}")


def _value(node: Node):
    if isinstance(node, NumberNode):
        return node.value
    if isinstance(node, StringNode):
        return node.value  # datemath like "now-3d" passes through to ES
    if isinstance(node, BoolNode):
        return node.value
    if isinstance(node, NullNode):
        return None
    if isinstance(node, UnaryNode) and node.op == "-" and isinstance(node.child, NumberNode):
        return -node.child.value
    if isinstance(node, ArrayNode):
        return [_value(i) for i in node.items]
    raise EsGenError(f"expected a literal, got {node.sql()}")


def _not(q: dict) -> dict:
    return {"bool": {"must_not": [q]}}


_RANGE_OPS = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}


def _glob_to_wildcard(pattern: str) -> str:
    return pattern.replace("%", "*")


def to_es_query(node: Node | str, includes: dict[str, Node] | None = None) -> dict:
    """Compile an expression AST (or expression text) to an ES query dict."""
    if isinstance(node, str):
        node = parse_expression(node)
    inc = includes or {}

    if isinstance(node, MatchAllNode):
        return {"match_all": {}}
    if isinstance(node, BoolNode):
        # `FILTER true` → match_all (esgenerator.go:82-85)
        if node.value:
            return {"match_all": {}}
        return _not({"match_all": {}})
    if isinstance(node, IncludeNode):
        inner = inc.get(node.name.lower())
        if inner is None:
            raise EsGenError(f"INCLUDE {node.name!r} not registered")
        q = to_es_query(inner, inc)
        return _not(q) if node.negated else q
    if isinstance(node, BooleanNode):
        parts = [to_es_query(a, inc) for a in node.args]
        q = {"bool": {"filter": parts}} if node.op == "AND" else {"bool": {"should": parts, "minimum_should_match": 1}}
        return _not(q) if node.negated else q
    if isinstance(node, UnaryNode):
        if node.op == "NOT":
            return _not(to_es_query(node.child, inc))
        if node.op == "EXISTS":
            return {"exists": {"field": _field(node.child)}}
        raise EsGenError(f"cannot compile unary {node.op}")
    if isinstance(node, TriNode):  # BETWEEN — exclusive (vm/vm.go:868)
        f = _field(node.args[0])
        q = {"range": {f: {"gt": _value(node.args[1]), "lt": _value(node.args[2])}}}
        return _not(q) if node.negated else q
    if isinstance(node, BinaryNode):
        return _binary(node, inc)
    raise EsGenError(f"cannot compile {node.sql()}")


def _binary(node: BinaryNode, inc: dict) -> dict:
    op = node.op
    if op in ("AND", "OR"):
        parts = [to_es_query(node.left, inc), to_es_query(node.right, inc)]
        # flatten nested same-op bools for compact DSL
        flat: list[dict] = []
        key = "filter" if op == "AND" else "should"
        for p in parts:
            if set(p) == {"bool"} and set(p["bool"]) <= {key, "minimum_should_match"} and key in p["bool"]:
                flat.extend(p["bool"][key])
            else:
                flat.append(p)
        if op == "AND":
            return {"bool": {"filter": flat}}
        return {"bool": {"should": flat, "minimum_should_match": 1}}

    if op in _RANGE_OPS:
        return {"range": {_field(node.left): {_RANGE_OPS[op]: _value(node.right)}}}

    if op in ("=",):
        if isinstance(node.right, NullNode):
            return _not({"exists": {"field": _field(node.left)}})
        return {"term": {_field(node.left): _value(node.right)}}

    if op == "!=":
        if isinstance(node.right, NullNode):
            return {"exists": {"field": _field(node.left)}}
        return _not({"term": {_field(node.left): _value(node.right)}})

    if op == "IS":  # IS [NOT] NULL
        q = _not({"exists": {"field": _field(node.left)}})
        return _not(q) if node.negated else q

    if op == "IN" or op == "INTERSECTS":
        q = {"terms": {_field(node.left): _value(node.right)}}
        return _not(q) if node.negated else q

    if op == "LIKE":
        q = {"wildcard": {_field(node.left): _glob_to_wildcard(str(_value(node.right)))}}
        return _not(q) if node.negated else q

    if op == "CONTAINS":
        q = {"wildcard": {_field(node.left): f"*{_value(node.right)}*"}}
        return _not(q) if node.negated else q

    raise EsGenError(f"cannot compile binary {op}")


def filterql_to_es(filterql_text: str, includes: dict[str, Node] | None = None) -> str:
    """Compile a full FilterQL statement to an ES request body (JSON text):
    {"query": ..., "size": limit?} — the reference's FilterGenerator.Walk
    equivalent (esgenerator.go:45-55)."""
    stmt = parse_filterql(filterql_text)
    body: dict = {"query": to_es_query(stmt.filter, includes)}
    if stmt.limit:
        body["size"] = stmt.limit
    return json.dumps(body, sort_keys=True)


def is_datemath(s: str) -> bool:
    return bool(_DATEMATH_RE.match(s))
