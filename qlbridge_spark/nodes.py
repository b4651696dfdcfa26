"""Expression AST node types.

Mirrors the *shape* of the reference AST (/root/reference/expr/node.go:202-311:
FuncNode, IdentityNode, StringNode, NumberNode, ValueNode, BinaryNode,
BooleanNode, TriNode, UnaryNode, IncludeNode, ArrayNode, NullNode) but is a
brand-new Python implementation. Nodes are immutable-ish dataclasses; the
translator (translate.py) lowers them to pyspark Columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    def walk(self):
        yield self
        for c in self.children():
            yield from c.walk()

    def children(self) -> list["Node"]:
        return []

    def __str__(self) -> str:  # pragma: no cover
        return self.sql()

    def sql(self) -> str:
        raise NotImplementedError


@dataclass
class NumberNode(Node):
    """Numeric literal; reference keeps int64 vs float64 split (expr/node.go NumberNode)."""

    text: str

    @property
    def is_int(self) -> bool:
        return not any(c in self.text for c in ".eE")

    @property
    def value(self):
        return int(self.text) if self.is_int else float(self.text)

    def sql(self) -> str:
        return self.text


@dataclass
class StringNode(Node):
    value: str

    def sql(self) -> str:
        return "'" + self.value.replace("'", "''") + "'"


@dataclass
class BoolNode(Node):
    value: bool

    def sql(self) -> str:
        return "true" if self.value else "false"


@dataclass
class NullNode(Node):
    def sql(self) -> str:
        return "NULL"


@dataclass
class IdentityNode(Node):
    """Column reference. ``parts`` holds the dotted path: ``users.user_id``
    → ("users", "user_id"). Star is IdentityNode(("*",)).

    Reference: expr/node.go IdentityNode, left/right resolution at
    vm/vm.go:777-789 (table.column vs map-field traversal).
    """

    parts: tuple[str, ...]

    @property
    def name(self) -> str:
        return ".".join(self.parts)

    @property
    def is_star(self) -> bool:
        return self.parts[-1] == "*"

    def sql(self) -> str:
        # @var / ?N parameter identities render bare: backticks inside a
        # derived column alias break Spark's attribute-name parsing
        return ".".join(
            p if p == "*" or p.isidentifier() or p[:1] in "@?" else f"`{p}`" for p in self.parts
        )


@dataclass
class FuncNode(Node):
    name: str  # lower-cased, may contain dots: "string.lowercase"
    args: list[Node]
    # ANSI aggregate filter: agg(x) FILTER (WHERE pred) — only valid on
    # aggregate functions; rows failing pred are excluded from the agg
    filter_where: "Node | None" = None
    # ANSI null treatment: func(x) IGNORE NULLS — honored by the window
    # value functions (first_value/last_value/nth_value); RESPECT NULLS
    # is the parse-only default
    ignore_nulls: bool = False
    # ordered-set aggregates: agg(x ORDER BY k [DESC], ...) — honored by
    # string_agg/listagg/array_agg; [(expr, "ASC"|"DESC"), ...]
    agg_order: list = field(default_factory=list)

    def children(self):
        return self.args + ([self.filter_where] if self.filter_where is not None else [])

    def sql(self) -> str:
        base = f"{self.name}({', '.join(a.sql() for a in self.args)})"
        if self.filter_where is not None:
            base += f" FILTER (WHERE {self.filter_where.sql()})"
        return base


@dataclass
class BinaryNode(Node):
    """Binary op. op is canonical-upper: one of
    + - * / % = != > >= < <= LIKE IN CONTAINS INTERSECTS AND OR IS ISNOT
    """

    op: str
    left: Node
    right: Node
    negated: bool = False  # NOT IN / NOT LIKE / NOT CONTAINS (expr/node.go:103-128)

    def children(self):
        return [self.left, self.right]

    def sql(self) -> str:
        neg = "NOT " if self.negated else ""
        return f"({self.left.sql()} {neg}{self.op} {self.right.sql()})"


@dataclass
class TriNode(Node):
    """BETWEEN: args = (expr, low, high). Reference semantics are EXCLUSIVE
    bounds (vm/vm.go:868,884,901) — translator honors that."""

    op: str  # "BETWEEN"
    args: list[Node]
    negated: bool = False

    def children(self):
        return self.args

    def sql(self) -> str:
        neg = "NOT " if self.negated else ""
        return f"({self.args[0].sql()} {neg}BETWEEN {self.args[1].sql()} AND {self.args[2].sql()})"


@dataclass
class UnaryNode(Node):
    op: str  # "NOT", "-", "EXISTS"
    child: Node

    def children(self):
        return [self.child]

    def sql(self) -> str:
        # fully parenthesized: an unparenthesized `NOT x` as the left
        # operand of a comparison re-parses with NOT binding looser,
        # silently changing the tree (caught by the round-trip fuzz test)
        return f"({self.op} ({self.child.sql()}))"


@dataclass
class BooleanNode(Node):
    """N-ary AND/OR — FilterQL's ``AND (a, b, c)`` form (rel/filter.go)."""

    op: str  # "AND" | "OR"
    args: list[Node] = field(default_factory=list)
    negated: bool = False

    def children(self):
        return self.args

    def sql(self) -> str:
        inner = f" {self.op} ".join(a.sql() for a in self.args)
        return f"NOT ({inner})" if self.negated else f"({inner})"


@dataclass
class WindowNode(Node):
    """``func(...) OVER (PARTITION BY ... ORDER BY ... [ROWS BETWEEN ...])``
    — superset: the reference has no window functions (SURVEY §2.4 "not
    present"); translated to ``pyspark.sql.Window``.

    ``frame`` is ``("ROWS", lo, hi)`` with bounds in Spark's rowsBetween
    convention (negative = preceding, 0 = current row, None = unbounded in
    that direction), or None for the SQL default frame.
    """

    func: "FuncNode"
    partition_by: list[Node] = field(default_factory=list)
    order_by: list[tuple[Node, str]] = field(default_factory=list)  # (expr, ASC|DESC)
    frame: tuple[str, int | None, int | None] | None = None
    # ``OVER w`` — reference to a statement-level ``WINDOW w AS (...)``
    # spec; the engine resolves it into the fields above before translate
    ref: str | None = None

    def children(self):
        return [self.func, *self.partition_by, *[e for e, _ in self.order_by]]

    def _frame_sql(self) -> str:
        kind, lo, hi = self.frame

        def bound(v, side):
            if v is None:
                return f"UNBOUNDED {side}"
            if v == 0:
                return "CURRENT ROW"
            return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"

        return f"{kind} BETWEEN {bound(lo, 'PRECEDING')} AND {bound(hi, 'FOLLOWING')}"

    def sql(self) -> str:
        if self.ref is not None:
            if self.frame is not None:  # OVER (w ROWS BETWEEN ...) extension
                return f"{self.func.sql()} OVER ({self.ref} {self._frame_sql()})"
            return f"{self.func.sql()} OVER {self.ref}"
        parts = []
        if self.partition_by:
            parts.append("PARTITION BY " + ", ".join(e.sql() for e in self.partition_by))
        if self.order_by:
            parts.append("ORDER BY " + ", ".join(f"{e.sql()} {d}" for e, d in self.order_by))
        if self.frame is not None:
            parts.append(self._frame_sql())
        return f"{self.func.sql()} OVER ({' '.join(parts)})"


@dataclass
class ArrayNode(Node):
    items: list[Node]

    def children(self):
        return self.items

    def sql(self) -> str:
        return "(" + ", ".join(i.sql() for i in self.items) + ")"


@dataclass
class CaseNode(Node):
    """ANSI CASE — searched (``CASE WHEN p THEN r``) and simple
    (``CASE x WHEN v THEN r``) forms; superset (reference has only
    ``if()``/``oneof()`` builtins). Lowers to an F.when chain."""

    operand: "Node | None"
    whens: list  # [(cond-or-match-value Node, result Node), ...]
    default: "Node | None" = None

    def children(self):
        out = [] if self.operand is None else [self.operand]
        for c, r in self.whens:
            out.extend((c, r))
        if self.default is not None:
            out.append(self.default)
        return out

    def sql(self) -> str:
        parts = ["CASE"]
        if self.operand is not None:
            parts.append(self.operand.sql())
        for c, r in self.whens:
            parts.append(f"WHEN {c.sql()} THEN {r.sql()}")
        if self.default is not None:
            parts.append(f"ELSE {self.default.sql()}")
        parts.append("END")
        return " ".join(parts)


@dataclass
class IncludeNode(Node):
    """INCLUDE <name> — named filter reference resolved via an Includer
    registry (expr/node.go:293-303, expr/include.go:23-25)."""

    name: str
    negated: bool = False

    def sql(self) -> str:
        return ("NOT INCLUDE " if self.negated else "INCLUDE ") + self.name


@dataclass
class MatchAllNode(Node):
    """FilterQL ``*`` — match everything."""

    def sql(self) -> str:
        return "*"


@dataclass(eq=False)
class SparkColNode(Node):
    """A pre-lowered Spark Column injected by the engine — e.g. the
    materialized value of an uncorrelated scalar subquery. eq=False: a
    Column's ``==`` builds an expression, so dataclass equality would
    misbehave; identity comparison is correct for injected nodes."""

    col: object  # pyspark Column
    dtype: object = None  # Spark DataType, when known
    text: str = "(scalar subquery)"

    def sql(self) -> str:
        return self.text


def transform(node: Node, fn) -> Node:
    """Bottom-up rewrite: rebuild ``node`` with transformed children, then
    apply ``fn`` (return a replacement node or the node unchanged). Used by
    QUALIFY alias substitution and HAVING-style agg extraction."""
    import dataclasses

    if isinstance(node, FuncNode):
        node = dataclasses.replace(node, args=[transform(a, fn) for a in node.args])
    elif isinstance(node, BinaryNode):
        node = dataclasses.replace(node, left=transform(node.left, fn), right=transform(node.right, fn))
    elif isinstance(node, (TriNode, BooleanNode)):
        node = dataclasses.replace(node, args=[transform(a, fn) for a in node.args])
    elif isinstance(node, UnaryNode):
        node = dataclasses.replace(node, child=transform(node.child, fn))
    elif isinstance(node, WindowNode):
        node = dataclasses.replace(
            node,
            func=transform(node.func, fn),
            partition_by=[transform(e, fn) for e in node.partition_by],
            order_by=[(transform(e, fn), d) for e, d in node.order_by],
        )
    elif isinstance(node, ArrayNode):
        node = dataclasses.replace(node, items=[transform(i, fn) for i in node.items])
    return fn(node)


@dataclass
class LambdaNode(Node):
    """``x -> expr`` / ``(acc, x) -> expr`` — lambda argument of a
    higher-order array function (transform/list_filter/aggregate/
    zip_with). Superset; DuckDB-compatible syntax. Only valid as a
    direct function argument — translate rejects it anywhere else."""

    params: list  # [str, ...] (1 or 2)
    body: "Node"

    def children(self):
        return [self.body]

    def sql(self) -> str:
        ps = self.params[0] if len(self.params) == 1 else "(" + ", ".join(self.params) + ")"
        return f"{ps} -> {self.body.sql()}"
