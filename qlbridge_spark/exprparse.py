"""Pratt parser: token stream → expression AST.

Covers the reference expression grammar (expr/parse.go): arithmetic,
comparisons, boolean logic, LIKE / IN / CONTAINS / INTERSECTS / BETWEEN /
EXISTS, NOT-negation wrappers, array literals ``(a,b,c)`` / ``[a,b,c]``,
dotted + backticked identities, function calls (dotted names), INCLUDE.
"""

from __future__ import annotations

from .lexer import (
    COMMA,
    EOF,
    IDENT,
    LBRACKET,
    LPAREN,
    NUMBER,
    OP,
    QIDENT,
    RBRACKET,
    RPAREN,
    STRING,
    Token,
    tokenize,
)
from .nodes import (
    ArrayNode,
    BinaryNode,
    BoolNode,
    FuncNode,
    IdentityNode,
    IncludeNode,
    Node,
    NullNode,
    NumberNode,
    StringNode,
    TriNode,
    UnaryNode,
    WindowNode,
)


class ParseError(ValueError):
    pass


_CMP_OPS = {"=", "==", "!=", "<>", "<", "<=", ">", ">="}
_CANON = {"==": "=", "<>": "!="}

# precedence table (higher binds tighter); mirrors expr/parse.go precedence
_PREC_OR = 1
_PREC_AND = 2
_PREC_NOT = 3
_PREC_CMP = 4
_PREC_ADD = 5
_PREC_MUL = 6
_PREC_UNARY = 7

_KEYWORD_CMP = {"LIKE", "ILIKE", "IN", "CONTAINS", "INTERSECTS", "IS", "BETWEEN"}


class ExprParser:
    def __init__(self, toks: list[Token], pos: int = 0):
        self.toks = toks
        self.i = pos

    # -- token helpers -------------------------------------------------
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, n: int = 1) -> Token:
        j = min(self.i + n, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.toks[self.i]
        if t.kind != EOF:
            self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None) -> Token:
        t = self.cur()
        if t.kind != kind or (val is not None and t.upper != val.upper()):
            raise ParseError(f"expected {val or kind}, got {t!r} at {t.pos}")
        return self.advance()

    def at_kw(self, *kws: str) -> bool:
        t = self.cur()
        return t.kind == IDENT and t.upper in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    # -- grammar -------------------------------------------------------
    def parse(self) -> Node:
        node = self.parse_expr()
        return node

    def parse_expr(self, prec: int = 0) -> Node:
        left = self.parse_unary(prec)
        return self.parse_infix(left, prec)

    def parse_infix(self, left: Node, prec: int) -> Node:
        while True:
            t = self.cur()
            if t.kind == OP and t.val in ("&&",):
                if _PREC_AND <= prec:
                    return left
                self.advance()
                right = self.parse_expr(_PREC_AND)
                left = BinaryNode("AND", left, right)
            elif t.kind == OP and t.val == "||":
                if _PREC_OR <= prec:
                    return left
                self.advance()
                right = self.parse_expr(_PREC_OR)
                left = BinaryNode("OR", left, right)
            elif t.kind == IDENT and t.upper == "AND":
                if _PREC_AND <= prec:
                    return left
                self.advance()
                right = self.parse_expr(_PREC_AND)
                left = BinaryNode("AND", left, right)
            elif t.kind == IDENT and t.upper == "OR":
                if _PREC_OR <= prec:
                    return left
                self.advance()
                right = self.parse_expr(_PREC_OR)
                left = BinaryNode("OR", left, right)
            elif t.kind == OP and t.val in _CMP_OPS:
                if _PREC_CMP <= prec:
                    return left
                self.advance()
                q = self.cur()
                if (
                    q.kind == IDENT
                    and q.upper in ("ANY", "SOME", "ALL")
                    and self.peek().kind == LPAREN
                    and self.peek(2).kind == IDENT
                    and self.peek(2).upper == "SELECT"
                ):
                    # quantified subquery comparison: x > ALL (SELECT …) —
                    # ANSI superset (the reference's any()/all() builtins,
                    # builtins/logic.go:288, take plain args, never a
                    # subquery, so `ANY (SELECT` is unambiguous). SOME ≡ ANY.
                    quant = "ANY" if q.upper in ("ANY", "SOME") else "ALL"
                    self.advance()
                    sub = self.parse_unary(_PREC_CMP)  # (SELECT …) → SubqueryNode
                    left = BinaryNode(f"{_CANON.get(t.val, t.val)} {quant}", left, sub)
                else:
                    right = self.parse_expr(_PREC_CMP)
                    left = BinaryNode(_CANON.get(t.val, t.val), left, right)
            elif t.kind == OP and t.val in ("=~", "!~"):
                # regex-match operator → rlike (the reference lexes regex
                # literals, lex/lexer.go:1106 LexRegex, but parses neither;
                # this is our parse+translate extension). ``/pat/i`` regex
                # literals are written as strings: x =~ "/^stats\\./i"
                if _PREC_CMP <= prec:
                    return left
                self.advance()
                right = self.parse_expr(_PREC_CMP)
                left = BinaryNode("=~", left, right, negated=(t.val == "!~"))
            elif t.kind == IDENT and (t.upper in _KEYWORD_CMP or t.upper == "NOT"):
                if _PREC_CMP <= prec:
                    return left
                left = self.parse_keyword_cmp(left)
            elif t.kind == OP and t.val in ("+", "-"):
                if _PREC_ADD <= prec:
                    return left
                self.advance()
                right = self.parse_expr(_PREC_ADD)
                left = BinaryNode(t.val, left, right)
            elif t.kind == OP and t.val in ("*", "/", "%"):
                if _PREC_MUL <= prec:
                    return left
                self.advance()
                right = self.parse_expr(_PREC_MUL)
                left = BinaryNode(t.val, left, right)
            else:
                return left

    def parse_keyword_cmp(self, left: Node) -> Node:
        negated = False
        if self.eat_kw("NOT"):
            negated = True
        t = self.cur()
        if t.kind != IDENT or t.upper not in _KEYWORD_CMP:
            raise ParseError(f"expected LIKE/IN/CONTAINS/INTERSECTS/BETWEEN after NOT, got {t!r}")
        kw = t.upper
        self.advance()
        if kw == "BETWEEN":
            low = self.parse_expr(_PREC_CMP)
            self.expect(IDENT, "AND")
            high = self.parse_expr(_PREC_CMP)
            return TriNode("BETWEEN", [left, low, high], negated=negated)
        if kw == "IS":
            # IS [NOT] NULL | IS [NOT] DISTINCT FROM (null-safe compare)
            isnot = self.eat_kw("NOT")
            if self.at_kw("DISTINCT"):
                self.advance()
                self.expect(IDENT, "FROM")
                right = self.parse_expr(_PREC_CMP)
                return BinaryNode("IS DISTINCT FROM", left, right, negated=isnot)
            self.expect(IDENT, "NULL")
            return BinaryNode("IS", left, NullNode(), negated=isnot)
        right = self.parse_expr(_PREC_CMP)
        return BinaryNode(kw, left, right, negated=negated)

    def parse_unary(self, prec: int) -> Node:
        t = self.cur()
        if t.kind == OP and t.val == "-":
            self.advance()
            return UnaryNode("-", self.parse_unary(prec))
        if t.kind == OP and t.val == "!":
            self.advance()
            return UnaryNode("NOT", self.parse_unary(prec))
        if t.kind == IDENT and t.upper == "NOT":
            self.advance()
            return UnaryNode("NOT", self.parse_expr(_PREC_NOT))
        if t.kind == IDENT and t.upper == "EXISTS":
            self.advance()
            return UnaryNode("EXISTS", self.parse_unary(prec))
        if t.kind == IDENT and t.upper == "INCLUDE":
            self.advance()
            name = self.advance()
            return IncludeNode(name.val)
        return self._postfix(self.parse_primary())

    def _postfix(self, node: Node) -> Node:
        """Postfix bracket indexing ``arr[i]`` / ``m['key']`` — 1-based for
        arrays (negative = from the end), key lookup for maps; DuckDB
        semantics via element_at (superset; the reference's 0-based form
        is the ``array.index()`` builtin)."""
        while self.cur().kind == LBRACKET:
            self.advance()
            idx = self.parse_expr()
            self.expect(RBRACKET)
            node = FuncNode("__bracket_index", [node, idx])
        return node

    def parse_primary(self) -> Node:
        t = self.cur()
        if t.kind == NUMBER:
            self.advance()
            return NumberNode(t.val)
        if t.kind == STRING:
            self.advance()
            return StringNode(t.val)
        if t.kind == LBRACKET:
            self.advance()
            items = []
            while self.cur().kind != RBRACKET:
                items.append(self.parse_expr())
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RBRACKET)
            return ArrayNode(items)
        if t.kind == LPAREN:
            self.advance()
            first = self.parse_expr()
            if self.cur().kind == COMMA:
                items = [first]
                while self.cur().kind == COMMA:
                    self.advance()
                    items.append(self.parse_expr())
                self.expect(RPAREN)
                return ArrayNode(items)
            self.expect(RPAREN)
            return first
        if t.kind == QIDENT:
            return self.parse_identity()
        if t.kind == IDENT:
            up = t.upper
            if up == "CASE":
                return self.parse_case()
            if up == "INTERVAL" and (
                self.peek().kind == NUMBER or self.peek().kind == STRING
            ):
                # INTERVAL 3 DAY | INTERVAL '3 days' — ANSI interval
                # literal (superset; the reference's datemath strings
                # "now-3d" remain the native form)
                self.advance()
                q = self.advance()
                if q.kind == NUMBER:
                    num = q.val
                    unit_tok = self.advance()
                    if unit_tok.kind != IDENT:
                        raise ParseError(f"expected interval unit, got {unit_tok!r}")
                    unit = unit_tok.val
                else:
                    parts = q.val.split()
                    if len(parts) != 2:
                        raise ParseError(f"bad interval literal {q.val!r} (want '<n> <unit>')")
                    num, unit = parts
                return FuncNode("__interval_lit", [NumberNode(num), StringNode(unit)])
            if up == "NULL":
                self.advance()
                return NullNode()
            if up == "TRUE":
                self.advance()
                return BoolNode(True)
            if up == "FALSE":
                self.advance()
                return BoolNode(False)
            # function call?
            if self.peek().kind == LPAREN:
                return self.parse_func()
            return self.parse_identity()
        raise ParseError(f"unexpected token {t!r}")

    def parse_func(self) -> Node:
        name = self.advance().val.lower()
        self.expect(LPAREN)
        args: list[Node] = []
        # CAST(x AS type) special grammar (expr/builtins/cast.go:42);
        # TRY_CAST is the NULL-on-failure ANSI variant (superset)
        if name in ("cast", "try_cast"):
            args.append(self.parse_expr())
            self.expect(IDENT, "AS")
            ty = self.advance()
            args.append(StringNode(ty.val))
            self.expect(RPAREN)
            return FuncNode(name, args)
        if (
            name == "extract"
            and self.cur().kind == IDENT
            and self.peek().kind == IDENT
            and self.peek().upper == "FROM"
        ):
            # ANSI EXTRACT(part FROM expr) — distinct from the reference's
            # strftime-style extract(ts, "%format") which keeps its comma form
            part = self.advance().val
            self.advance()  # FROM
            arg = self.parse_expr()
            self.expect(RPAREN)
            return FuncNode("__extract_ansi", [StringNode(part), arg])
        if name == "count" and self.cur().kind == OP and self.cur().val == "*":
            self.advance()
            self.expect(RPAREN)
            fn = FuncNode("count", [IdentityNode(("*",))])
            self._maybe_agg_filter(fn)
            return self.parse_over(fn) if self.at_kw("OVER") else fn
        agg_order: list = []
        while self.cur().kind != RPAREN:
            if (self.cur().kind == IDENT and self.peek().kind == OP and self.peek().val == "->") or (
                self.cur().kind == LPAREN
                and self.peek().kind == IDENT
                and self.peek(2).kind == COMMA
                and self.peek(3).kind == IDENT
                and self.peek(4).kind == RPAREN
                and self.peek(5).kind == OP
                and self.peek(5).val == "->"
            ):
                # lambda argument of a higher-order function:
                # x -> expr  |  (acc, x) -> expr
                args.append(self.parse_lambda())
                if self.cur().kind == COMMA:
                    self.advance()
                continue
            if self.at_kw("DISTINCT"):
                # COUNT(DISTINCT x) → distinct-flagged func
                self.advance()
                inner = self.parse_expr()
                args.append(FuncNode("distinct", [inner]))
            else:
                args.append(self.parse_expr())
            if self.at_kw("ORDER"):
                # ordered-set aggregate: agg(x[, sep] ORDER BY k [DESC], ...)
                self.advance()
                self.expect(IDENT, "BY")
                while True:
                    e = self.parse_expr()
                    d = "ASC"
                    if self.at_kw("ASC", "DESC"):
                        d = self.advance().upper
                    agg_order.append((e, d))
                    if self.cur().kind == COMMA:
                        self.advance()
                        continue
                    break
                break
            if self.cur().kind == COMMA:
                self.advance()
            else:
                break
        self.expect(RPAREN)
        fn = FuncNode(name, args)
        fn.agg_order = agg_order
        self._maybe_agg_filter(fn)
        if self.at_kw("OVER"):
            return self.parse_over(fn)
        return fn

    def parse_lambda(self):
        from .nodes import LambdaNode

        params: list[str] = []
        if self.cur().kind == LPAREN:
            self.advance()
            while self.cur().kind != RPAREN:
                params.append(self.advance().val)
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RPAREN)
        else:
            params.append(self.advance().val)
        arrow = self.advance()
        if arrow.kind != OP or arrow.val != "->":
            raise ParseError(f"expected -> in lambda, got {arrow!r}")
        return LambdaNode(params=params, body=self.parse_expr())

    def parse_case(self) -> "CaseNode":
        """ANSI ``CASE [operand] WHEN … THEN … [ELSE …] END`` — searched
        and simple forms (superset; the reference dialect has only its
        ``if()``/``oneof()`` builtins)."""
        from .nodes import CaseNode

        self.advance()  # CASE
        operand = None
        if not self.at_kw("WHEN"):
            operand = self.parse_expr()
        whens: list[tuple[Node, Node]] = []
        while self.at_kw("WHEN"):
            self.advance()
            cond = self.parse_expr()
            self.expect(IDENT, "THEN")
            whens.append((cond, self.parse_expr()))
        if not whens:
            raise ParseError("CASE needs at least one WHEN ... THEN ...")
        default = None
        if self.at_kw("ELSE"):
            self.advance()
            default = self.parse_expr()
        self.expect(IDENT, "END")
        return CaseNode(operand=operand, whens=whens, default=default)

    def _maybe_agg_filter(self, fn: FuncNode) -> None:
        """``agg(x) FILTER (WHERE pred)`` — ANSI aggregate filter. Only
        triggers on ``FILTER (`` so the engine dialect's ``FROM t FILTER
        <expr>`` clause (FilterSelect) stays unambiguous. Also eats the
        ANSI ``IGNORE NULLS`` / ``RESPECT NULLS`` null-treatment clause
        (honored by window value functions)."""
        if (
            self.at_kw("IGNORE", "RESPECT")
            and self.peek().kind == IDENT
            and self.peek().upper == "NULLS"
        ):
            fn.ignore_nulls = self.advance().upper == "IGNORE"
            self.advance()  # NULLS
        if self.at_kw("FILTER") and self.peek().kind == LPAREN:
            self.advance()
            self.expect(LPAREN)
            self.expect(IDENT, "WHERE")
            fn.filter_where = self.parse_expr()
            self.expect(RPAREN)

    def parse_over(self, fn: FuncNode) -> WindowNode:
        """``OVER (PARTITION BY ... ORDER BY ... [ROWS BETWEEN ...])`` or
        ``OVER w`` (named-window reference, resolved against the select's
        ``WINDOW w AS (...)`` clause) — window-function superset (the
        reference has none, SURVEY §2.4)."""
        self.expect(IDENT, "OVER")
        if self.cur().kind == IDENT:
            return WindowNode(func=fn, ref=self.advance().val)
        self.expect(LPAREN)
        win = self.parse_window_spec(fn)
        self.expect(RPAREN)
        return win

    def parse_window_spec(self, fn: FuncNode) -> WindowNode:
        """The interior of an OVER( ... ) / WINDOW w AS ( ... ) spec —
        cursor positioned after the opening paren; does not consume it.
        ``OVER (w [frame])`` — a leading bare identifier references a named
        window, optionally extending it with a frame."""
        t = self.cur()
        if t.kind == IDENT and t.upper not in ("PARTITION", "ORDER", "ROWS", "RANGE"):
            win = WindowNode(func=fn, ref=self.advance().val)
            if self.at_kw("ROWS", "RANGE"):
                kind = self.advance().upper
                self.expect(IDENT, "BETWEEN")
                lo = self._frame_bound()
                self.expect(IDENT, "AND")
                hi = self._frame_bound()
                win.frame = (kind, lo, hi)
            return win
        win = WindowNode(func=fn)
        if self.at_kw("PARTITION"):
            self.advance()
            self.expect(IDENT, "BY")
            win.partition_by.append(self.parse_expr())
            while self.cur().kind == COMMA:
                self.advance()
                win.partition_by.append(self.parse_expr())
        if self.at_kw("ORDER"):
            self.advance()
            self.expect(IDENT, "BY")
            while True:
                e = self.parse_expr()
                direction = "ASC"
                if self.at_kw("ASC", "DESC"):
                    direction = self.advance().upper
                win.order_by.append((e, direction))
                if self.cur().kind == COMMA:
                    self.advance()
                else:
                    break
        if self.at_kw("ROWS", "RANGE"):
            kind = self.advance().upper
            self.expect(IDENT, "BETWEEN")
            lo = self._frame_bound()
            self.expect(IDENT, "AND")
            hi = self._frame_bound()
            win.frame = (kind, lo, hi)
        return win

    def _frame_bound(self) -> int | None:
        """One frame bound → Spark rowsBetween value (negative=preceding,
        0=current, None=unbounded)."""
        if self.eat_kw("UNBOUNDED"):
            if not (self.eat_kw("PRECEDING") or self.eat_kw("FOLLOWING")):
                raise ParseError(f"expected PRECEDING/FOLLOWING, got {self.cur()!r}")
            return None
        if self.eat_kw("CURRENT"):
            self.expect(IDENT, "ROW")
            return 0
        n = int(self.expect(NUMBER).val)
        if self.eat_kw("PRECEDING"):
            return -n
        if self.eat_kw("FOLLOWING"):
            return n
        raise ParseError(f"expected PRECEDING/FOLLOWING, got {self.cur()!r}")

    def parse_identity(self) -> IdentityNode:
        """Identity: bare dotted (one IDENT token), backticked parts joined
        by ``.`` op tokens (``` `users`.`user_id` ```), or a mix."""
        parts: list[str] = []
        t = self.cur()
        if t.kind == QIDENT:
            self.advance()
            parts.append(t.val)
        elif t.kind == IDENT:
            self.advance()
            parts.extend(t.val.split("."))
        else:
            raise ParseError(f"expected identity, got {t!r}")
        while self.cur().kind == OP and self.cur().val == ".":
            self.advance()
            nxt = self.advance()
            if nxt.kind == QIDENT:
                parts.append(nxt.val)
            elif nxt.kind == IDENT:
                parts.extend(nxt.val.split("."))
            elif nxt.kind == OP and nxt.val == "*":
                parts.append("*")
            else:
                raise ParseError(f"bad identity part {nxt!r}")
        return IdentityNode(tuple(parts))


def parse_expression(text: str) -> Node:
    """Parse a standalone expression — API parity with
    ``expr.ParseExpression`` (expr/parse.go:174)."""
    p = ExprParser(tokenize(text))
    node = p.parse()
    if p.cur().kind != EOF:
        raise ParseError(f"trailing tokens at {p.cur()!r}")
    return node
