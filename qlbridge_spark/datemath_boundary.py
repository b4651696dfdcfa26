"""DateConverter — datemath boundary analysis.

Re-implements /root/reference/vm/datemath.go:21-115: inspect a boolean
expression for datemath strings ("now-3d"); given a record context, compute
the earliest FUTURE time at which the expression's truth value could flip,
so a continuous evaluator knows when to re-check the filter instead of
polling. This is what powers continuous filter evaluation in the
reference's ecosystem (dataux/lytics) and pairs here with the
CONTINUOUSVIEW trigger logic.

Semantics (mirroring addValue, datemath.go:56-108):
- only `> >= < <=` comparisons contribute boundaries (= / != never do)
- Ct = comparison (field) time, At = anchor ("now"), Rt = datemath result
- boundary Bt = At + (Ct − Rt) when the moving Rt will cross Ct
- the earliest such boundary wins; None if no boundary exists
"""

from __future__ import annotations

from datetime import datetime, timedelta

from .exprparse import parse_expression
from .nodes import ArrayNode, BinaryNode, BooleanNode, FuncNode, IdentityNode, IncludeNode, Node, StringNode, TriNode, UnaryNode
from .translate import _DATEMATH_RE, parse_datemath, parse_permissive_date


class DateConverter:
    """``DateConverter(ctx, node_or_text)`` — ctx maps field names to
    datetime (or parseable string) values. ``includes`` maps INCLUDE names
    to filter nodes/texts so referenced filters contribute boundaries too
    (reference findDateMath recurses IncludeNode, vm/datemath.go:117+)."""

    def __init__(self, ctx: dict, node: Node | str, now: datetime | None = None, includes: dict | None = None):
        if isinstance(node, str):
            node = parse_expression(node)
        self.node = node
        self.ctx = ctx
        self.at = now or datetime.utcnow()
        self.includes = {k.lower(): (parse_expression(v) if isinstance(v, str) else v) for k, v in (includes or {}).items()}
        self._seen_includes: set[str] = set()
        self.time_strings: list[str] = []
        self._bt: datetime | None = None
        self._walk(node)

    @property
    def has_date_math(self) -> bool:
        return bool(self.time_strings)

    def boundary(self) -> datetime | None:
        """Earliest future time the expression could flip; None if none."""
        return self._bt

    # -- internals -----------------------------------------------------
    def _ctx_time(self, n: Node) -> datetime | None:
        if isinstance(n, IdentityNode):
            v = self.ctx.get(n.name)
            if v is None and len(n.parts) > 1:
                v = self.ctx.get(n.parts[-1])
            if isinstance(v, datetime):
                return v
            if isinstance(v, str):
                return parse_permissive_date(v)
            return None
        if isinstance(n, StringNode):
            return parse_permissive_date(n.value)
        return None

    def _add_boundary(self, bt: datetime) -> None:
        if self._bt is None or bt < self._bt:
            self._bt = bt

    def _add_value(self, ct: datetime | None, op: str, val: str) -> None:
        self.time_strings.append(val)
        if ct is None:
            return
        rt = parse_datemath(val, self.at)
        if rt is None:
            return
        if op in ("=", "!="):
            return  # unsupported for boundaries (datemath.go:76-78)
        if op in (">", ">="):
            if rt < ct:  # currently true; flips when Rt reaches Ct
                self._add_boundary(self.at + (ct - rt))
        elif op in ("<", "<="):
            if not ct < rt:  # currently false; flips when Rt passes Ct
                self._add_boundary(self.at + (ct - rt))

    def _walk(self, n: Node) -> None:
        if isinstance(n, BinaryNode):
            if isinstance(n.right, StringNode) and _DATEMATH_RE.match(n.right.value.strip()):
                self._add_value(self._ctx_time(n.left), n.op, n.right.value)
            elif isinstance(n.left, StringNode) and _DATEMATH_RE.match(n.left.value.strip()):
                flip = {">": "<", ">=": "<=", "<": ">", "<=": ">="}.get(n.op, n.op)
                self._add_value(self._ctx_time(n.right), flip, n.left.value)
            else:
                self._walk(n.left)
                self._walk(n.right)
        elif isinstance(n, TriNode):
            for i, a in enumerate(n.args[1:], 1):
                if isinstance(a, StringNode) and _DATEMATH_RE.match(a.value.strip()):
                    op = ">" if i == 1 else "<"
                    self._add_value(self._ctx_time(n.args[0]), op, a.value)
        elif isinstance(n, (UnaryNode,)):
            self._walk(n.child)
        elif isinstance(n, BooleanNode):
            for a in n.args:
                self._walk(a)
        elif isinstance(n, (FuncNode, ArrayNode)):
            # datemath may hide inside function wrappers / array literals
            # (reference findDateMath walks FuncNode/ArrayNode args)
            for a in n.children():
                if isinstance(a, StringNode) and _DATEMATH_RE.match(a.value.strip()):
                    self.time_strings.append(a.value)
                else:
                    self._walk(a)
        elif isinstance(n, IncludeNode):
            inner = self.includes.get(n.name.lower())
            if inner is not None and n.name.lower() not in self._seen_includes:
                self._seen_includes.add(n.name.lower())  # cycle guard
                self._walk(inner)


def boundary_time(ctx: dict, expression: str, now: datetime | None = None) -> datetime | None:
    """Convenience wrapper: next possible truth-flip time for a datemath
    expression over a record, or None."""
    return DateConverter(ctx, expression, now).boundary()
