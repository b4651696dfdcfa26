"""Expression AST → pyspark.sql.Column translator.

This module replaces the reference's per-row tree-walk VM
(/root/reference/vm/vm.go:129-176) with a *translation* to Catalyst Column
expressions, so execution stays JVM-side inside whole-stage codegen.

Encoded semantic shims (divergences the reference VM implements, SURVEY §2.8):
- exclusive BETWEEN bounds            (vm/vm.go:868,884,901)
- glob-style LIKE (`%` and `*` both wildcards, vm/vm.go:1112-1126)
- ``x != NULL`` / EXISTS treat empty string as missing (value/value.go:510)
- datemath string literals ``"now-3d"``  (vm/datemath.go:56-108)
- permissive date parsing of literals (lytics/dateparse usage)
- IN over scalars/arrays/map-keys     (vm/vm.go:370-383,535-546,628-650)
- CONTAINS over strings and arrays    (vm/vm.go:1050-1054,595-616)
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .nodes import (
    ArrayNode,
    BinaryNode,
    BoolNode,
    BooleanNode,
    CaseNode,
    FuncNode,
    IdentityNode,
    IncludeNode,
    MatchAllNode,
    Node,
    NullNode,
    NumberNode,
    SparkColNode,
    StringNode,
    TriNode,
    UnaryNode,
    WindowNode,
)


class TranslateError(ValueError):
    pass


# --------------------------------------------------------------------------
# datemath — ``now-3d``, ``now+2w``, ``now/d`` (vm/datemath.go:56-108)
# --------------------------------------------------------------------------
# "now" is case-insensitive (reference findDateMath lowercases before
# matching) but units stay case-sensitive: M=month vs m=minute
_DATEMATH_RE = re.compile(r"^(?i:now)(?:(?P<sign>[+-])(?P<n>\d+)(?P<unit>[smhdwMy]))?(?:/(?P<trunc>[smhdwMy]))?$")

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 7 * 86400}


def _add_date(t: datetime, years: int, months: int) -> datetime:
    """Go ``time.AddDate`` semantics: month/year offsets normalize overflow
    (Jan 31 + 1M → Mar 2/3) rather than clamping — the reference's
    lytics/datemath EvalAnchor (vm/datemath.go:65) calls AddDate, so
    ``now-1M`` must agree day-for-day."""
    y = t.year + years
    m = t.month - 1 + months
    y += m // 12
    m = m % 12 + 1
    return t.replace(year=y, month=m, day=1) + timedelta(days=t.day - 1)


def parse_datemath(s: str, now: datetime | None = None) -> datetime | None:
    """Parse a datemath string; returns None if ``s`` is not datemath."""
    m = _DATEMATH_RE.match(s.strip())
    if not m:
        return None
    t = now or datetime.utcnow()
    if m.group("sign"):
        n = int(m.group("n")) if m.group("sign") == "+" else -int(m.group("n"))
        unit = m.group("unit")
        if unit in _UNIT_SECONDS:
            t = t + timedelta(seconds=n * _UNIT_SECONDS[unit])
        elif unit == "M":
            t = _add_date(t, 0, n)
        else:  # y
            t = _add_date(t, n, 0)
    trunc = m.group("trunc")
    if trunc:
        if trunc == "s":
            t = t.replace(microsecond=0)
        elif trunc == "m":
            t = t.replace(second=0, microsecond=0)
        elif trunc == "h":
            t = t.replace(minute=0, second=0, microsecond=0)
        elif trunc == "d":
            t = t.replace(hour=0, minute=0, second=0, microsecond=0)
        elif trunc == "w":
            t = t.replace(hour=0, minute=0, second=0, microsecond=0)
            t -= timedelta(days=t.weekday())
        elif trunc == "M":
            t = t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        elif trunc == "y":
            t = t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    return t


_INTERVAL_UNIT = {"s": "second", "m": "minute", "h": "hour", "d": "day", "w": "week", "M": "month", "y": "year"}


def datemath_runtime_column(s: str):
    """Datemath as a RUNTIME Column (current_timestamp() ± INTERVAL, plus
    date_trunc) instead of a driver-side literal. Used when the scope holds
    a STREAMING frame: a literal would freeze 'now' at plan-translation
    time, while the reference VM re-evaluates datemath per evaluation.
    Note: Spark INTERVAL month/year arithmetic clamps (add_months), while
    the batch literal path follows Go AddDate normalization — a documented
    sub-day divergence only for M/y offsets landing past month-end.
    Returns None if ``s`` is not datemath."""
    m = _DATEMATH_RE.match(s.strip())
    if m is None:
        return None
    c = F.current_timestamp()
    if m.group("sign"):
        iv = F.expr(f"INTERVAL {int(m.group('n'))} {_INTERVAL_UNIT[m.group('unit')]}")
        c = (c + iv) if m.group("sign") == "+" else (c - iv)
    if m.group("trunc"):
        c = F.date_trunc(_INTERVAL_UNIT[m.group("trunc")], c)
    return c


def parse_permissive_date(s: str) -> datetime | None:
    """Permissive literal date parse ≈ araddon/dateparse used throughout the
    reference (e.g. vm/vm.go:554-559). Pandas' parser is similarly lenient."""
    dm = parse_datemath(s)
    if dm is not None:
        return dm
    try:
        import pandas as pd

        ts = pd.to_datetime(s)
        if ts is pd.NaT:
            return None
        return ts.to_pydatetime()
    except Exception:
        return None


# --------------------------------------------------------------------------
# glob LIKE (vm/vm.go:1112-1126): both `%` and `*` are multi-char wildcards
# --------------------------------------------------------------------------
def regex_literal(pattern: str) -> str:
    """Normalize a regex operand for ``=~``: plain strings pass through;
    ``/pat/mods`` (the reference's TokenRegex shape, lex/lexer.go:1106)
    is unwrapped, with the ``i`` modifier lowered to an inline ``(?i)``."""
    if len(pattern) >= 2 and pattern.startswith("/") and "/" in pattern[1:]:
        body, _, mods = pattern[1:].rpartition("/")
        if re.fullmatch(r"[a-zA-Z]*", mods):
            return ("(?i)" if "i" in mods else "") + body
    return pattern


def glob_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch in ("%", "*"):
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


# --------------------------------------------------------------------------
# Scope — identity resolution against one or more aliased DataFrames
# --------------------------------------------------------------------------
class Scope:
    """Resolves IdentityNodes to Columns + dtypes.

    ``frames`` maps alias → DataFrame (every frame must already be
    ``.alias(name)``-ed when multi-frame). ``includes`` maps name →
    filter Node (expr/include.go:23-25). ``functions`` is the builtin
    registry (functions.py).
    """

    def __init__(
        self,
        frames: dict[str, DataFrame] | None = None,
        includes: dict[str, Node] | None = None,
        params: dict[str, object] | None = None,
        strict: bool = True,
        physical: dict[str, str] | None = None,
    ):
        """``strict=False`` resolves unknown identities to NULL instead of
        erroring — the reference's VM/FilterQL behavior over schemaless
        records (missing field ⇒ predicate not-true, vm/vm.go:252-274),
        vs its plan-time error for unknown SELECT columns
        (testutil/testsuite.go:138). SQL projection uses strict scopes;
        FilterQL/vm entry points use lenient ones."""
        self.frames = frames or {}
        self.includes = includes or {}
        self.params = params or {}
        self.strict = strict
        # lateral sources (UNNEST) materialize as UNQUALIFIED generator
        # output columns on the joined frame; ``physical`` maps
        # "alias.field" (lower) → the actual column name to reference
        self.physical = physical or {}
        self._fields: dict[str, tuple[str, T.StructField]] = {}
        self._ambiguous: set[str] = set()
        multi = len(self.frames) > 1
        for alias, df in self.frames.items():
            for f in df.schema.fields:
                key = f.name.lower()
                if key not in self._fields:
                    self._fields[key] = (alias, f)
                elif self._fields[key][0] != alias:
                    # two frames define the same bare name — unqualified
                    # lookups must error instead of silently binding to
                    # whichever frame registered first
                    self._ambiguous.add(key)
                self._fields[f"{alias.lower()}.{key}"] = (alias, f)
        self.multi = multi
        self.has_streaming_frame = any(df.isStreaming for df in self.frames.values())

    # -- lookup --------------------------------------------------------
    def columns(self) -> list[str]:
        seen, out = set(), []
        for df in self.frames.values():
            for c in df.columns:
                if c.lower() not in seen:
                    seen.add(c.lower())
                    out.append(c)
        return out

    def _resolve(self, ident: IdentityNode) -> tuple[Column, T.DataType | None, tuple[str, ...]]:
        """Return (column, dtype, remaining_path). Dotted tails beyond a
        resolved column become map/struct traversal (vm/vm.go:777-789)."""
        parts = ident.parts
        if parts[0].startswith("@") or parts[0].startswith("?"):
            name = parts[0]
            if name in self.params:
                return F.lit(self.params[name]), None, ()
            raise TranslateError(f"unbound parameter {name}")
        for take in (2, 1):
            if len(parts) >= take:
                key = ".".join(parts[:take]).lower()
                hit = self._fields.get(key)
                if hit is not None:
                    if take == 1 and key in self._ambiguous:
                        raise TranslateError(f"ambiguous column {parts[0]!r} (defined by multiple tables); qualify with an alias")
                    alias, fld = hit
                    phys = self.physical.get(f"{alias.lower()}.{fld.name.lower()}")
                    if phys is not None:
                        colref = phys
                    else:
                        colref = f"{alias}.{fld.name}" if self.multi else fld.name
                    return F.col(colref), fld.dataType, parts[take:]
        if not self.strict:
            return F.lit(None), T.NullType(), ()
        # unresolved → error like the reference (testutil/testsuite.go:138)
        raise TranslateError(f"unknown column {ident.name!r}; known: {sorted(self._fields)[:20]}")

    def col(self, ident: IdentityNode) -> Column:
        c, dt, rest = self._resolve(ident)
        for p in rest:
            c = c[p]
        return c

    def physical_name(self, ident: IdentityNode) -> str | None:
        """The physical column this identity routes to when a lateral
        (UNNEST) rename applies; None for ordinary columns."""
        if not self.physical:
            return None
        parts = ident.parts
        for take in (2, 1):
            if len(parts) >= take:
                hit = self._fields.get(".".join(parts[:take]).lower())
                if hit is not None:
                    alias, fld = hit
                    return self.physical.get(f"{alias.lower()}.{fld.name.lower()}")
        return None

    def dtype(self, ident: IdentityNode) -> T.DataType | None:
        c, dt, rest = self._resolve(ident)
        for p in rest:
            if isinstance(dt, T.MapType):
                dt = dt.valueType
            elif isinstance(dt, T.StructType):
                try:
                    dt = dt[p].dataType
                except KeyError:
                    dt = None
            else:
                dt = None
        return dt


# --------------------------------------------------------------------------
# dtype inference for arbitrary nodes (best-effort, drives coercion shims)
# --------------------------------------------------------------------------
def infer_dtype(node: Node, scope: Scope) -> T.DataType | None:
    if isinstance(node, SparkColNode):
        return node.dtype
    if isinstance(node, NumberNode):
        return T.LongType() if node.is_int else T.DoubleType()
    if isinstance(node, StringNode):
        return T.StringType()
    if isinstance(node, BoolNode):
        return T.BooleanType()
    if isinstance(node, IdentityNode):
        try:
            return scope.dtype(node)
        except TranslateError:
            return None
    if isinstance(node, BinaryNode) and node.op in ("+", "-", "*", "/", "%"):
        lt = infer_dtype(node.left, scope)
        rt = infer_dtype(node.right, scope)
        if isinstance(lt, T.DoubleType) or isinstance(rt, T.DoubleType):
            return T.DoubleType()
        if lt is not None and rt is not None:
            return T.LongType()
        return None
    if isinstance(node, CaseNode):
        for _, r in node.whens:
            dt = infer_dtype(r, scope)
            if dt is not None:
                return dt
        return infer_dtype(node.default, scope) if node.default is not None else None
    if isinstance(node, FuncNode):
        from .functions import registry

        fn = registry.get(node.name)
        if fn is None:
            return None
        rt = fn.return_type
        # callable return_type: type depends on argument types (e.g.
        # array.slice returns its input's array type, mapkeys the map's
        # key type) — called with (node, scope), may return None
        return rt(node, scope) if callable(rt) and not isinstance(rt, T.DataType) else rt
    if isinstance(node, WindowNode):
        name = node.func.name
        if name in ("row_number", "rank", "dense_rank", "ntile"):
            return T.IntegerType()
        if name in ("percent_rank", "cume_dist"):
            return T.DoubleType()
        if name in ("lag", "lead"):
            return infer_dtype(node.func.args[0], scope) if node.func.args else None
        return infer_dtype(node.func, scope)
    return None


def _is_stringy(dt: T.DataType | None) -> bool:
    return isinstance(dt, T.StringType)


def _is_timey(dt: T.DataType | None) -> bool:
    return isinstance(dt, (T.TimestampType, T.DateType, T.TimestampNTZType))


def _is_numbery(dt: T.DataType | None) -> bool:
    return isinstance(dt, T.NumericType)


# --------------------------------------------------------------------------
# main translator
# --------------------------------------------------------------------------
_CMP = {
    "=": lambda l, r: l == r,
    "!=": lambda l, r: l != r,
    ">": lambda l, r: l > r,
    ">=": lambda l, r: l >= r,
    "<": lambda l, r: l < r,
    "<=": lambda l, r: l <= r,
}

_ARITH = {
    "+": lambda l, r: l + r,
    "-": lambda l, r: l - r,
    "*": lambda l, r: l * r,
    "/": lambda l, r: l / r,
    "%": lambda l, r: l % r,
}


def to_column(node: Node, scope: Scope) -> Column:
    """Lower an expression AST to a Column."""
    if isinstance(node, SparkColNode):
        return node.col
    if isinstance(node, NumberNode):
        return F.lit(node.value)
    if isinstance(node, StringNode):
        return F.lit(node.value)
    if isinstance(node, BoolNode):
        return F.lit(node.value)
    if isinstance(node, NullNode):
        return F.lit(None)
    if isinstance(node, IdentityNode):
        return scope.col(node)
    if isinstance(node, ArrayNode):
        return F.array(*[to_column(i, scope) for i in node.items])
    if isinstance(node, CaseNode):
        # ANSI CASE → F.when chain; simple form compares the operand with
        # the engine's own `=` coercion shims. No ELSE → NULL (ANSI).
        col = None
        for cond, res in node.whens:
            cnode = cond if node.operand is None else BinaryNode("=", node.operand, cond)
            c = to_column(cnode, scope).cast("boolean")
            r = to_column(res, scope)
            col = F.when(c, r) if col is None else col.when(c, r)
        if node.default is not None:
            col = col.otherwise(to_column(node.default, scope))
        return col
    if isinstance(node, FuncNode):
        from .functions import build_function

        return build_function(node, scope)
    if isinstance(node, UnaryNode):
        if node.op == "-":
            return -to_column(node.child, scope)
        if node.op == "NOT":
            return ~to_column(node.child, scope)
        if node.op == "EXISTS":
            return exists_column(node.child, scope)
        raise TranslateError(f"unknown unary op {node.op}")
    if isinstance(node, BooleanNode):
        cols = [to_column(a, scope) for a in node.args]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if node.op == "AND" else (out | c)
        return ~out if node.negated else out
    if isinstance(node, TriNode):
        return _between(node, scope)
    if isinstance(node, WindowNode):
        return _window(node, scope)
    if isinstance(node, IncludeNode):
        inner = scope.includes.get(node.name)
        if inner is None:
            raise TranslateError(f"INCLUDE {node.name!r} not registered")
        # cycle guard (reference's ResolveIncludes errors on cycles too)
        stack = getattr(scope, "_include_stack", None)
        if stack is None:
            stack = scope._include_stack = []
        if node.name in stack:
            raise TranslateError(f"INCLUDE cycle: {' -> '.join([*stack, node.name])}")
        stack.append(node.name)
        try:
            c = to_column(inner, scope)
        finally:
            stack.pop()
        return ~c if node.negated else c
    if isinstance(node, MatchAllNode):
        return F.lit(True)
    if isinstance(node, BinaryNode):
        return _binary(node, scope)
    from .nodes import LambdaNode as _Lam

    if isinstance(node, _Lam):
        raise TranslateError(
            "a lambda (x -> expr) is only valid as a higher-order function argument "
            "(transform/list_filter/aggregate/zip_with/forall/array_exists)"
        )
    raise TranslateError(f"cannot translate {node!r}")


def exists_column(node: Node, scope: Scope) -> Column:
    """EXISTS field — present AND non-nil; empty string counts as nil
    (vm/vm.go:820-828, value/value.go:510)."""
    c = to_column(node, scope)
    dt = infer_dtype(node, scope)
    if _is_stringy(dt):
        return c.isNotNull() & (c != F.lit(""))
    return c.isNotNull()


# ranking window functions (zero-arg) → pyspark builders
_RANKING_FNS = ("row_number", "rank", "dense_rank", "percent_rank", "cume_dist")


def _window(node: WindowNode, scope: Scope) -> Column:
    """Lower ``func OVER (...)`` to ``Column.over(pyspark.sql.Window)``.

    Superset of the reference (no window functions there, SURVEY §2.4);
    semantics follow standard SQL: with an ORDER BY and no explicit frame,
    aggregate functions use the default RANGE UNBOUNDED PRECEDING..CURRENT
    ROW frame (Spark and DuckDB agree)."""
    from pyspark.sql import Window

    from .functions import build_function

    if node.ref is not None:
        # `OVER w` resolved by the engine against the select's WINDOW
        # clause; reaching translate unresolved means there wasn't one
        raise TranslateError(f"OVER {node.ref} requires a WINDOW {node.ref} AS (...) clause")
    name = node.func.name
    w = Window.partitionBy(*[to_column(e, scope) for e in node.partition_by])
    if node.order_by:
        order = []
        for e, d in node.order_by:
            c = to_column(e, scope)
            order.append(c.desc() if d == "DESC" else c.asc())
        w = w.orderBy(*order)
    elif name in _RANKING_FNS or name in ("ntile", "lag", "lead"):
        raise TranslateError(f"window function {name}() requires ORDER BY in OVER()")

    if name in _RANKING_FNS:
        col = getattr(F, name)()
    elif name == "ntile":
        if len(node.func.args) != 1 or not isinstance(node.func.args[0], NumberNode):
            raise TranslateError("ntile(n) takes one integer literal")
        col = F.ntile(int(node.func.args[0].value))
    elif name in ("first_value", "last_value", "nth_value"):
        # ANSI window value functions with IGNORE NULLS support (superset;
        # DuckDB-compatible). Default SQL frame applies: last_value over
        # an ORDER BY without an explicit frame sees up to the CURRENT row.
        args = node.func.args
        ign = getattr(node.func, "ignore_nulls", False)
        if not args:
            raise TranslateError(f"{name}(expr) needs an argument")
        target = to_column(args[0], scope)
        if name == "nth_value":
            if len(args) != 2 or not isinstance(args[1], NumberNode) or not args[1].is_int:
                raise TranslateError("nth_value(expr, n) takes an integer literal offset")
            col = F.nth_value(target, int(args[1].value), ignoreNulls=ign)
        elif name == "first_value":
            col = F.first(target, ignorenulls=ign)
        else:
            col = F.last(target, ignorenulls=ign)
    elif name in ("lag", "lead"):
        args = node.func.args
        if not args or len(args) > 3:
            raise TranslateError(f"{name}(expr[, offset[, default]]) takes 1-3 arguments")
        target = to_column(args[0], scope)
        off = 1
        if len(args) > 1:
            if not isinstance(args[1], NumberNode) or not args[1].is_int:
                raise TranslateError(f"{name}: offset must be an integer literal, got {args[1].sql()}")
            off = int(args[1].value)
        if len(args) > 2 and not isinstance(args[2], (NumberNode, StringNode, BoolNode)):
            raise TranslateError(f"{name}: default must be a literal, got {args[2].sql()}")
        if getattr(node.func, "ignore_nulls", False):
            # ANSI lag/lead IGNORE NULLS (no PySpark builder) — rewritten
            # to a value function over an explicit frame, DuckDB-parity:
            #   lag(x, k)  → k-th last non-null in ROWS [unbounded, -1]
            #   lead(x, k) → k-th non-null in ROWS [+1, unbounded]
            # k=1 lowers to last/first(ignorenulls) — O(1) running state;
            # k>1 collects the frame's non-null values (bounded by the
            # partition) and indexes from the appropriate end.
            if off < 1:
                raise TranslateError(f"{name}: IGNORE NULLS requires offset >= 1, got {off}")
            if name == "lag":
                fw = w.rowsBetween(Window.unboundedPreceding, -1)
            else:
                fw = w.rowsBetween(1, Window.unboundedFollowing)
            if off == 1:
                out = (F.last if name == "lag" else F.first)(target, ignorenulls=True).over(fw)
            else:
                vals = F.collect_list(target).over(fw)
                # try_element_at: out-of-range (fewer than k non-null
                # values in the frame) yields NULL, ANSI-mode-safe
                out = F.try_element_at(vals, F.lit(-off if name == "lag" else off))
            if len(args) > 2:
                out = F.coalesce(out, F.lit(args[2].value))
            return out
        if len(args) > 2:
            col = (F.lag if name == "lag" else F.lead)(target, off, args[2].value)
        else:
            col = (F.lag if name == "lag" else F.lead)(target, off)
    else:
        col = build_function(node.func, scope)

    if node.frame is not None and name not in _RANKING_FNS and name not in ("ntile", "lag", "lead"):
        # ranking/offset functions have a fixed implicit frame; an explicit
        # one (e.g. inherited from a named WINDOW spec) is ignored, as in
        # DuckDB/PostgreSQL
        kind, flo, fhi = node.frame
        lo = Window.unboundedPreceding if flo is None else flo
        hi = Window.unboundedFollowing if fhi is None else fhi
        if kind == "RANGE":
            # value-based frame: Spark requires exactly ONE order key when a
            # bound is a numeric offset (RANGE n PRECEDING/FOLLOWING)
            if any(b not in (None, 0) for b in (flo, fhi)) and len(node.order_by) != 1:
                raise TranslateError("RANGE with a numeric offset requires exactly one ORDER BY expression")
            w = w.rangeBetween(lo, hi)
        else:
            w = w.rowsBetween(lo, hi)
    return col.over(w)


def _between(node: TriNode, scope: Scope) -> Column:
    subject = to_column(node.args[0], scope)
    low = _coerced_operand(node.args[1], node.args[0], scope)
    high = _coerced_operand(node.args[2], node.args[0], scope)
    # string subject vs numeric bounds: same try_cast shim as _comparison
    # (VM ParseInt/ParseFloat coercion, per-row not-ok on failure)
    sdt = infer_dtype(node.args[0], scope)
    bdts = [infer_dtype(node.args[i], scope) for i in (1, 2)]
    if _is_stringy(sdt) and any(_is_numbery(b) for b in bdts):
        subject = subject.try_cast("double")
    out = (subject > low) & (subject < high)  # EXCLUSIVE (vm/vm.go:868)
    return ~out if node.negated else out


def _coerced_operand(node: Node, other: Node, scope: Scope) -> Column:
    """Translate ``node``, coercing string literals toward ``other``'s dtype
    — the VM's cross-type coercion (vm/vm.go:350-366,554-559)."""
    other_dt = infer_dtype(other, scope)
    if isinstance(node, StringNode):
        if _is_timey(other_dt):
            if scope.has_streaming_frame:
                rt = datemath_runtime_column(node.value)
                if rt is not None:
                    return rt
            t = parse_permissive_date(node.value)
            if t is not None:
                return F.lit(t)
        if _is_numbery(other_dt):
            try:
                v = node.value
                return F.lit(int(v)) if re.fullmatch(r"-?\d+", v) else F.lit(float(v))
            except ValueError:
                pass
    return to_column(node, scope)


def _binary(node: BinaryNode, scope: Scope) -> Column:
    op = node.op
    if op in ("AND", "OR"):
        l = to_column(node.left, scope)
        r = to_column(node.right, scope)
        return (l & r) if op == "AND" else (l | r)

    if op in _ARITH:
        l = to_column(node.left, scope)
        r = to_column(node.right, scope)
        if op == "/":
            # ANSI Spark errors the whole query on ANY divide-by-zero;
            # the reference errors per-ROW (int, vm/vm.go:1144) or yields
            # Inf (float). try_divide's NULL ≈ the per-row not-ok.
            ldt, rdt = infer_dtype(node.left, scope), infer_dtype(node.right, scope)
            out = F.try_divide(l, r)
            if isinstance(ldt, T.IntegralType) and isinstance(rdt, T.IntegralType):
                # int/int TRUNCATES (integer division)
                out = out.cast("long")
            return out
        return _ARITH[op](l, r)

    if op == "IS":  # IS [NOT] NULL
        c = to_column(node.left, scope)
        return c.isNotNull() if node.negated else c.isNull()

    if op == "IS DISTINCT FROM":
        # ANSI null-safe inequality: never UNKNOWN (superset)
        l = to_column(node.left, scope)
        r = to_column(node.right, scope)
        eq = l.eqNullSafe(r)
        return eq if node.negated else ~eq

    if op in _CMP:
        return _comparison(node, scope)

    if op in ("LIKE", "ILIKE"):
        # ILIKE: case-insensitive glob (Postgres/DuckDB superset) — both
        # sides lowered; pattern may be a literal or a column
        l = to_column(node.left, scope)
        if op == "ILIKE":
            l = F.lower(l)
        if isinstance(node.right, StringNode):
            pat = node.right.value.lower() if op == "ILIKE" else node.right.value
            c = l.rlike(glob_to_regex(pat))
        else:
            r = to_column(node.right, scope)
            if op == "ILIKE":
                r = F.lower(r)
            # F.regexp_like, not Column.rlike — rlike takes only a str
            # pattern (column patterns raised NOT_ITERABLE)
            c = F.regexp_like(l, F.concat(F.lit("^"), F.regexp_replace(F.regexp_replace(r, r"([.\[\]^$\\(){}+?|])", r"\\$1"), r"[%*]", ".*"), F.lit("$")))
        return ~c if node.negated else c

    if op == "=~":
        # regex match → rlike (Java find(): unanchored, like Go MatchString)
        l = to_column(node.left, scope)
        if isinstance(node.right, StringNode):
            c = l.rlike(regex_literal(node.right.value))
        else:
            c = l.rlike(to_column(node.right, scope))
        return ~c if node.negated else c

    if op == "IN":
        c = _in(node, scope)
        return ~c if node.negated else c

    if op == "INTERSECTS":
        l = to_column(node.left, scope)
        r = to_column(node.right, scope)
        c = F.arrays_overlap(l, r)
        return ~c if node.negated else c

    if op == "CONTAINS":
        c = _contains(node, scope)
        return ~c if node.negated else c

    raise TranslateError(f"unknown binary op {op}")


def _comparison(node: BinaryNode, scope: Scope) -> Column:
    ldt = infer_dtype(node.left, scope)
    rdt = infer_dtype(node.right, scope)
    left: Column
    right: Column

    # ``x != NULL`` / ``x == NULL`` — reference's existence test
    # (FIXTURES.md §5; empty string counts as nil: value/value.go:510)
    if isinstance(node.right, NullNode) or isinstance(node.left, NullNode):
        subject_node = node.left if isinstance(node.right, NullNode) else node.right
        present = exists_column(subject_node, scope)
        return present if node.op == "!=" else ~present

    # numeric vs UNCOERCIBLE string literal: the VM's coercion fails →
    # not-ok → row excluded under = AND != alike (vm/vm.go:350-366).
    # NULL boolean reproduces that in filters.
    for lit_node, other_dt in ((node.right, ldt), (node.left, rdt)):
        if isinstance(lit_node, StringNode) and _is_numbery(other_dt):
            v = lit_node.value.strip()
            if not re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", v):
                return F.lit(None).cast("boolean")

    left = _coerced_operand(node.left, node.right, scope)
    right = _coerced_operand(node.right, node.left, scope)

    # string COLUMN/expr vs numeric side: the VM coerces the string with
    # ParseInt-then-ParseFloat and treats failure as not-ok (row excluded)
    # — vm/vm.go:350-366. Spark's ANSI implicit cast would instead ERROR
    # the whole query on a value like '42.0'; try_cast gives the per-row
    # NULL≈not-ok semantics. Against an INTEGRAL side the ParseInt branch
    # compares exactly as long (a blanket double cast would collapse
    # values above 2^53); only the ParseFloat fallback goes via double.
    # (String literals were already folded numeric — or rejected — above.)
    if _is_stringy(ldt) and _is_numbery(rdt) and not isinstance(node.left, StringNode):
        return _string_numeric_cmp(node.op, left, right, rdt, string_on_left=True)
    if _is_numbery(ldt) and _is_stringy(rdt) and not isinstance(node.right, StringNode):
        return _string_numeric_cmp(node.op, right, left, ldt, string_on_left=False)

    # string column vs time → cast string side to timestamp (vm/vm.go:554-559)
    if _is_stringy(ldt) and _is_timey(rdt):
        left = F.to_timestamp(left)
    elif _is_timey(ldt) and _is_stringy(rdt) and not isinstance(node.right, StringNode):
        right = F.to_timestamp(right)

    # time vs time compared at SECOND granularity (vm/vm.go:1070-1110)
    if _is_timey(ldt) and _is_timey(rdt) and node.op in ("=", "!="):
        left = F.unix_timestamp(left)
        right = F.unix_timestamp(right)

    return _CMP[node.op](left, right)


def _string_numeric_cmp(op: str, s: Column, num: Column, num_dt, string_on_left: bool) -> Column:
    """Compare a string expr against a numeric expr with the VM's
    ParseInt-then-ParseFloat coercion (vm/vm.go:350-366): when the numeric
    side is integral and the string parses as a long, compare EXACTLY as
    longs (double would lose precision above 2^53); otherwise fall back to
    double. Uncoercible strings yield NULL → not-ok → row excluded."""
    dbl = _CMP[op](s.try_cast("double"), num.cast("double")) if string_on_left else _CMP[op](num.cast("double"), s.try_cast("double"))
    if not isinstance(num_dt, T.IntegralType):
        return dbl
    s_long = s.try_cast("long")
    exact = _CMP[op](s_long, num) if string_on_left else _CMP[op](num, s_long)
    return F.when(s_long.isNotNull(), exact).otherwise(dbl)


def _in(node: BinaryNode, scope: Scope) -> Column:
    """IN: scalar-in-array-literal, scalar-in-array-column,
    string-in-map-keys, array-overlap (vm/vm.go:370-383,488-546,628-650)."""
    l = to_column(node.left, scope)
    ldt = infer_dtype(node.left, scope)
    if isinstance(node.right, ArrayNode):
        vals = [_coerced_operand(i, node.left, scope) for i in node.right.items]
        return l.isin(*vals)
    if isinstance(node.right, (StringNode, NumberNode, BoolNode)):
        # single-element list: `x IN ("a")` parses as a parenthesized scalar
        return l.isin(_coerced_operand(node.right, node.left, scope))
    rdt = infer_dtype(node.right, scope)
    r = to_column(node.right, scope)
    if isinstance(rdt, T.MapType):
        return F.map_contains_key(r, l)
    if isinstance(ldt, T.ArrayType) and isinstance(rdt, T.ArrayType):
        return F.arrays_overlap(l, r)
    if isinstance(rdt, T.ArrayType):
        return F.array_contains(r, l)
    # unknown collection type — try array_contains
    return F.array_contains(r, l)


def _contains(node: BinaryNode, scope: Scope) -> Column:
    l = to_column(node.left, scope)
    r = to_column(node.right, scope)
    ldt = infer_dtype(node.left, scope)
    if isinstance(ldt, T.ArrayType):
        # any element contains the substring (vm/vm.go:595-616)
        return F.exists(l, lambda x: x.contains(r))
    if isinstance(ldt, T.MapType):
        return F.map_contains_key(l, r)
    return l.contains(r)
