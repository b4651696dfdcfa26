"""Pure-Python single-record expression evaluator.

The reference evaluates one record in ~800ns through its tree-walk VM
(/root/reference/vm/vm.go:129-176). Our engine's batch path translates the
same AST to Catalyst Columns — but spinning a Spark job per record costs
~100ms, so the single-record entry points (vm.eval_expression / matches /
eval_sql) route here first: a direct interpreter over the SAME AST with the
SAME semantics as translate.py (golden-parity-tested against the Spark
translation in tests/test_pyeval_parity.py).

Semantics mirrored from translate.py / the reference VM:
- Kleene three-valued logic (NULL-aware AND/OR/NOT) — matches Spark
- exclusive BETWEEN (vm/vm.go:868)
- glob LIKE where both % and * are wildcards (vm/vm.go:1112-1126)
- ``x != NULL`` / EXISTS: empty string counts as missing (value/value.go:510)
- string-literal coercion toward the other operand's type
- int/int division truncates; divide-by-zero yields NULL (try_divide)
- time equality at second granularity (vm/vm.go:1070-1110)

Functions not implemented here raise :class:`PyEvalUnsupported`; callers
fall back to the Spark path (still correct, just slower).
"""

from __future__ import annotations

import base64
import hashlib
import json as _json
import math
import re
from datetime import datetime, timedelta, timezone

from .nodes import (
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
from .translate import TranslateError, glob_to_regex, parse_permissive_date


class PyEvalUnsupported(Exception):
    """Raised when an expression needs the Spark path (unsupported builtin)."""


def _epoch(t: datetime) -> int:
    """Epoch seconds; naive datetimes are UTC (the engine pins the Spark
    session timezone to UTC, so both paths agree)."""
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    return int(t.timestamp())


class PyScope:
    """Record context for the interpreter: a dict, case-insensitive keys."""

    def __init__(self, ctx: dict, includes: dict | None = None, params: dict | None = None, strict: bool = False, now: datetime | None = None):
        self.ctx = ctx
        self._lower = {str(k).lower(): k for k in ctx}
        self.includes = includes or {}
        self.params = params or {}
        self.strict = strict
        self.now = now or datetime.utcnow()
        self._include_stack: list[str] = []

    def columns(self) -> list[str]:
        return list(self.ctx.keys())

    def resolve(self, ident: IdentityNode):
        parts = ident.parts
        if parts[0].startswith("@") or parts[0].startswith("?"):
            if parts[0] in self.params:
                return self.params[parts[0]]
            raise TranslateError(f"unbound parameter {parts[0]}")
        # same resolution order as Scope._resolve: dotted pair first (a
        # literal "a.b" key), then head + map/struct traversal
        for take in (2, 1):
            if len(parts) >= take:
                key = ".".join(parts[:take]).lower()
                if key in self._lower:
                    v = self.ctx[self._lower[key]]
                    for p in parts[take:]:
                        if isinstance(v, dict):
                            v = v.get(p)
                        else:
                            v = None
                    return v
        if not self.strict:
            return None
        raise TranslateError(f"unknown column {ident.name!r}; known: {sorted(self._lower)[:20]}")


# ---------------------------------------------------------------------------
# Kleene logic (Spark's NULL-aware booleans)
# ---------------------------------------------------------------------------
def k_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return bool(a) and bool(b)


def k_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return bool(a) or bool(b)


def k_not(a):
    return None if a is None else not a


# ---------------------------------------------------------------------------
# value helpers
# ---------------------------------------------------------------------------
_NUM_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
_INT_RE = re.compile(r"-?\d+")


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _num_from_str(s: str):
    s = s.strip()
    if not _NUM_RE.fullmatch(s):
        return None
    return int(s) if _INT_RE.fullmatch(s) else float(s)


def _as_time(v):
    """Best-effort value → datetime (mirrors the to_timestamp cast chain)."""
    if isinstance(v, datetime):
        return v
    if isinstance(v, str):
        return parse_permissive_date(v)
    if _is_num(v):
        return datetime.utcfromtimestamp(v / 1000.0)  # millis, like _time_arg
    return None


def _exists_val(v) -> bool:
    """Present and non-nil; empty string counts as nil (value/value.go:510)."""
    return v is not None and v != ""


def _coerced_value(node: Node, other_val, sc: PyScope):
    """Mirror translate._coerced_operand: string LITERALS coerce toward the
    other operand's runtime type."""
    if isinstance(node, StringNode):
        if isinstance(other_val, datetime):
            t = parse_permissive_date(node.value)
            if t is not None:
                return t
        if _is_num(other_val):
            n = _num_from_str(node.value)
            if n is not None:
                return n
    return py_eval(node, sc)


# ---------------------------------------------------------------------------
# xxhash64 — parity with Spark's XxHash64 (seed 42) for string/long inputs
# ---------------------------------------------------------------------------
_M = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    if n >= 32:
        v1, v2, v3, v4 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M, seed, (seed - _P1) & _M
        i = 0
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (v + lane * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _xxhash64_value(v) -> int:
    if isinstance(v, str):
        return _to_signed64(_xxh64(v.encode("utf-8")))
    if isinstance(v, bool):
        return _to_signed64(_xxh64((1 if v else 0).to_bytes(4, "little")))
    if isinstance(v, int):
        return _to_signed64(_xxh64(v.to_bytes(8, "little", signed=True)))
    if isinstance(v, bytes):
        return _to_signed64(_xxh64(v))
    raise PyEvalUnsupported(f"hash over {type(v).__name__}")


# ---------------------------------------------------------------------------
# interpreter
# ---------------------------------------------------------------------------
def py_eval(node: Node, sc: PyScope):
    if isinstance(node, NumberNode):
        return node.value
    if isinstance(node, StringNode):
        return node.value
    if isinstance(node, BoolNode):
        return node.value
    if isinstance(node, NullNode):
        return None
    if isinstance(node, IdentityNode):
        return sc.resolve(node)
    if isinstance(node, ArrayNode):
        return [py_eval(i, sc) for i in node.items]
    if isinstance(node, FuncNode):
        fn = PY_FUNCS.get(node.name)
        if fn is None:
            raise PyEvalUnsupported(f"no python impl for function {node.name!r}")
        return fn(node, sc)
    if isinstance(node, UnaryNode):
        if node.op == "-":
            v = py_eval(node.child, sc)
            return None if v is None else -v
        if node.op == "NOT":
            return k_not(py_eval(node.child, sc))
        if node.op == "EXISTS":
            return _exists_val(py_eval(node.child, sc))
        raise TranslateError(f"unknown unary op {node.op}")
    if isinstance(node, BooleanNode):
        vals = [py_eval(a, sc) for a in node.args]
        out = vals[0]
        for v in vals[1:]:
            out = k_and(out, v) if node.op == "AND" else k_or(out, v)
        return k_not(out) if node.negated else out
    if isinstance(node, TriNode):
        subject = py_eval(node.args[0], sc)
        low = _coerced_value(node.args[1], subject, sc)
        high = _coerced_value(node.args[2], subject, sc)
        out = k_and(_cmp_vals(">", subject, low), _cmp_vals("<", subject, high))
        return k_not(out) if node.negated else out
    if isinstance(node, IncludeNode):
        inner = sc.includes.get(node.name)
        if inner is None:
            raise TranslateError(f"INCLUDE {node.name!r} not registered")
        if node.name in sc._include_stack:
            raise TranslateError(f"INCLUDE cycle: {' -> '.join([*sc._include_stack, node.name])}")
        sc._include_stack.append(node.name)
        try:
            v = py_eval(inner, sc)
        finally:
            sc._include_stack.pop()
        return k_not(v) if node.negated else v
    if isinstance(node, MatchAllNode):
        return True
    if isinstance(node, BinaryNode):
        return _binary(node, sc)
    raise TranslateError(f"cannot evaluate {node!r}")


def _binary(node: BinaryNode, sc: PyScope):
    op = node.op
    if op in ("AND", "OR"):
        l, r = py_eval(node.left, sc), py_eval(node.right, sc)
        return k_and(l, r) if op == "AND" else k_or(l, r)

    if op in ("+", "-", "*", "/", "%"):
        l, r = py_eval(node.left, sc), py_eval(node.right, sc)
        return _arith(op, l, r)

    if op == "IS":
        v = py_eval(node.left, sc)
        return (v is not None) if node.negated else (v is None)

    if op in ("=", "!=", ">", ">=", "<", "<="):
        return _comparison(node, sc)

    if op == "LIKE":
        l = py_eval(node.left, sc)
        if isinstance(node.right, StringNode):
            pat = glob_to_regex(node.right.value)
        else:
            r = py_eval(node.right, sc)
            if r is None or l is None:
                return None
            pat = glob_to_regex(str(r))
        if l is None:
            return None
        c = re.search(pat, str(l)) is not None
        return (not c) if node.negated else c

    if op == "=~":
        from .translate import regex_literal

        l = py_eval(node.left, sc)
        if l is None:
            return None
        if isinstance(node.right, StringNode):
            pat = regex_literal(node.right.value)
        else:
            r = py_eval(node.right, sc)
            if r is None:
                return None
            pat = str(r)
        c = re.search(pat, str(l)) is not None
        return (not c) if node.negated else c

    if op == "IN":
        c = _in(node, sc)
        return k_not(c) if node.negated else c

    if op == "INTERSECTS":
        l, r = py_eval(node.left, sc), py_eval(node.right, sc)
        if l is None or r is None:
            return None
        c = any(x in r for x in l)
        return (not c) if node.negated else c

    if op == "CONTAINS":
        l, r = py_eval(node.left, sc), py_eval(node.right, sc)
        if l is None or r is None:
            return None
        if isinstance(l, (list, tuple)):
            c = any(x is not None and str(r) in str(x) for x in l)
        elif isinstance(l, dict):
            c = r in l
        else:
            c = str(r) in str(l)
        return (not c) if node.negated else c

    raise TranslateError(f"unknown binary op {op}")


def _arith(op, l, r):
    if l is None or r is None:
        return None
    if isinstance(l, str) or isinstance(r, str):
        # ANSI Spark implicitly casts string operands to numbers
        if isinstance(l, str):
            l = _num_from_str(l)
        if isinstance(r, str):
            r = _num_from_str(r)
        if l is None or r is None:
            raise ValueError("cannot coerce string operand to number")
    both_int = isinstance(l, int) and isinstance(r, int) and not isinstance(l, bool) and not isinstance(r, bool)
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        if r == 0:
            return None  # try_divide
        out = l / r
        return int(out) if both_int else out  # int/int truncates toward zero
    if op == "%":
        if r == 0:
            return None
        out = math.fmod(l, r)  # sign follows dividend, like Spark/Java
        return int(out) if both_int else out
    raise TranslateError(op)


def _cmp_vals(op, l, r):
    if l is None or r is None:
        return None
    # string vs number → numeric coercion of the string side (value-driven)
    if isinstance(l, str) and _is_num(r):
        l = _num_from_str(l)
        if l is None:
            return None
    elif isinstance(r, str) and _is_num(l):
        r = _num_from_str(r)
        if r is None:
            return None
    # string vs time → parse the string side
    if isinstance(l, str) and isinstance(r, datetime):
        l = _as_time(l)
        if l is None:
            return None
    elif isinstance(r, str) and isinstance(l, datetime):
        r = _as_time(r)
        if r is None:
            return None
    # time = / != at second granularity (vm/vm.go:1070-1110)
    if isinstance(l, datetime) and isinstance(r, datetime) and op in ("=", "!="):
        l, r = _epoch(l), _epoch(r)
    try:
        if op == "=":
            return l == r
        if op == "!=":
            return l != r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
    except TypeError:
        return None
    raise TranslateError(op)


def _comparison(node: BinaryNode, sc: PyScope):
    # x != NULL / x = NULL — existence test, empty string counts as missing
    if isinstance(node.right, NullNode) or isinstance(node.left, NullNode):
        subject = node.left if isinstance(node.right, NullNode) else node.right
        present = _exists_val(py_eval(subject, sc))
        return present if node.op == "!=" else not present

    lval = py_eval(node.left, sc)
    rval = py_eval(node.right, sc)

    # numeric vs UNCOERCIBLE string literal → not-ok under = and != alike
    for lit_node, other_val in ((node.right, lval), (node.left, rval)):
        if isinstance(lit_node, StringNode) and _is_num(other_val):
            if not _NUM_RE.fullmatch(lit_node.value.strip()):
                return None

    left = _coerced_value(node.left, rval, sc) if isinstance(node.left, StringNode) else lval
    right = _coerced_value(node.right, lval, sc) if isinstance(node.right, StringNode) else rval
    return _cmp_vals(node.op, left, right)


def _in(node: BinaryNode, sc: PyScope):
    l = py_eval(node.left, sc)
    if isinstance(node.right, ArrayNode):
        if l is None:
            return None
        vals = [_coerced_value(i, l, sc) for i in node.right.items]
        return any(_cmp_vals("=", l, v) is True for v in vals)
    if isinstance(node.right, (StringNode, NumberNode, BoolNode)):
        if l is None:
            return None
        return _cmp_vals("=", l, _coerced_value(node.right, l, sc)) is True
    r = py_eval(node.right, sc)
    if l is None or r is None:
        return None
    if isinstance(r, dict):
        return l in r
    if isinstance(l, (list, tuple)) and isinstance(r, (list, tuple)):
        return any(x in r for x in l)
    if isinstance(r, (list, tuple)):
        return l in r
    return None


# ===========================================================================
# builtin functions — python twins of functions/__init__.py builders
# ===========================================================================
PY_FUNCS: dict = {}


def py_func_add(name, fn):
    """Register a python single-record implementation (pairs with
    functions.func_add for the batch side)."""
    PY_FUNCS[name.lower()] = fn


def _pyreg(name):
    def deco(fn):
        py_func_add(name, fn)
        return fn

    return deco


def _a(n, sc, i=0):
    return py_eval(n.args[i], sc)


def _lit_str(n, i):
    from .functions import _lit_str as f

    return f(n, i)


def _time_a(n: FuncNode, sc: PyScope, i: int = 0):
    if len(n.args) <= i:
        return sc.now
    v = _a(n, sc, i)
    return _as_time(v) if not isinstance(v, datetime) else v


def _s(v):
    """Value → string, Spark cast-to-string rendering."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v) if v != int(v) or math.isinf(v) or math.isnan(v) else f"{int(v)}.0"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0").rstrip(".") if v.microsecond else v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


@_pyreg("sqrt")
def _py_sqrt(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    v = float(v)
    return math.sqrt(v) if v >= 0 else float("nan")


@_pyreg("pow")
def _py_pow(n, sc):
    a, b = _a(n, sc), _a(n, sc, 1)
    if a is None or b is None:
        return None
    return float(a) ** float(b)


@_pyreg("abs")
def _py_abs(n, sc):
    v = _a(n, sc)
    return None if v is None else abs(v)


@_pyreg("round")
def _py_round(n, sc):
    from decimal import ROUND_HALF_UP, Decimal

    v = _a(n, sc)
    if v is None:
        return None
    digits = int(_lit_str(n, 1)) if len(n.args) > 1 else 0
    q = Decimal(1).scaleb(-digits)
    out = Decimal(str(v)).quantize(q, rounding=ROUND_HALF_UP)
    return float(out) if isinstance(v, float) else int(out)


@_pyreg("not")
def _py_not(n, sc):
    return k_not(_a(n, sc))


@_pyreg("exists")
def _py_exists(n, sc):
    return _exists_val(_a(n, sc))


@_pyreg("any")
def _py_any(n, sc):
    out = _exists_val(_a(n, sc))
    for i in range(1, len(n.args)):
        out = k_or(out, _exists_val(_a(n, sc, i)))
    return out


@_pyreg("all")
def _py_all(n, sc):
    out = True
    for i, a in enumerate(n.args):
        v = _a(n, sc, i)
        cond = _exists_val(v)
        if isinstance(v, bool):
            cond = cond and v
        out = k_and(out, cond)
    return out


for _name, _op in (("gt", ">"), ("ge", ">="), ("lt", "<"), ("le", "<=")):
    def _mk(op):
        def f(n, sc):
            a, b = _a(n, sc), _a(n, sc, 1)
            if a is None or b is None:
                return None
            return _cmp_vals(op, float(a), float(b))

        return f

    py_func_add(_name, _mk(_op))

py_func_add("eq", lambda n, sc: _cmp_vals("=", _a(n, sc), _a(n, sc, 1)))
py_func_add("ne", lambda n, sc: _cmp_vals("!=", _a(n, sc), _a(n, sc, 1)))


@_pyreg("oneof")
def _py_oneof(n, sc):
    for i in range(len(n.args)):
        v = _a(n, sc, i)
        if v is not None and v != "":
            return v
    return None


@_pyreg("coalesce")
def _py_coalesce(n, sc):
    for i in range(len(n.args)):
        v = _a(n, sc, i)
        if v is not None:
            return v
    return None


@_pyreg("if")
def _py_if(n, sc):
    return _a(n, sc, 1) if _a(n, sc) is True else _a(n, sc, 2)


@_pyreg("len")
def _py_len(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    if isinstance(v, (list, tuple, dict)):
        return len(v)
    return len(_s(v))


py_func_add("char_length", PY_FUNCS["len"])
py_func_add("length", PY_FUNCS["len"])


@_pyreg("map")
def _py_map(n, sc):
    return {_a(n, sc): _a(n, sc, 1)}


@_pyreg("mapkeys")
def _py_mapkeys(n, sc):
    v = _a(n, sc)
    return None if v is None else list(v.keys())


@_pyreg("mapvalues")
def _py_mapvalues(n, sc):
    v = _a(n, sc)
    return None if v is None else list(v.values())


@_pyreg("mapinvert")
def _py_mapinvert(n, sc):
    v = _a(n, sc)
    return None if v is None else {_s(val): _s(k) for k, val in v.items()}


@_pyreg("maptime")
def _py_maptime(n, sc):
    k = _a(n, sc)
    v = _time_a(n, sc, 1) if len(n.args) > 1 else sc.now
    return {k: v}


@_pyreg("match")
def _py_match(n, sc):
    prefixes = [_lit_str(n, i) for i in range(len(n.args))]
    out = {}
    for colname in sc.columns():
        for p in prefixes:
            if colname.startswith(p):
                out[colname[len(p):]] = _s(sc.ctx[colname])
    return out or None


@_pyreg("filter")
def _py_filter(n, sc):
    v = _a(n, sc)
    if isinstance(v, dict) and len(n.args) > 1:
        pat = re.compile("^" + _lit_str(n, 1).replace("*", ".*") + "$")
        return {k: val for k, val in v.items() if not pat.match(str(k))}
    return v


@_pyreg("filtermatch")
def _py_filtermatch(n, sc):
    v = _a(n, sc)
    if isinstance(v, dict) and len(n.args) > 1:
        pat = re.compile("^" + _lit_str(n, 1).replace("*", ".*") + "$")
        return {k: val for k, val in v.items() if pat.match(str(k))}
    return v


@_pyreg("array.index")
def _py_array_index(n, sc):
    arr, idx = _a(n, sc), _a(n, sc, 1)
    if arr is None or idx is None:
        return None
    idx = int(idx)
    return arr[idx] if 0 <= idx < len(arr) else None


@_pyreg("array.slice")
def _py_array_slice(n, sc):
    arr, start = _a(n, sc), int(_a(n, sc, 1))
    if arr is None:
        return None
    if len(n.args) > 2:
        return arr[start : int(_a(n, sc, 2))]
    return arr[start:]


# -- time -------------------------------------------------------------------
@_pyreg("now")
def _py_now(n, sc):
    return sc.now


@_pyreg("yy")
def _py_yy(n, sc):
    t = _time_a(n, sc)
    return None if t is None else t.year % 100


@_pyreg("mm")
def _py_mm(n, sc):
    t = _time_a(n, sc)
    return None if t is None else t.month


py_func_add("monthofyear", PY_FUNCS["mm"])


@_pyreg("yymm")
def _py_yymm(n, sc):
    t = _time_a(n, sc)
    return None if t is None else t.strftime("%y%m")


@_pyreg("dayofweek")
def _py_dayofweek(n, sc):
    t = _time_a(n, sc)
    return None if t is None else (t.weekday() + 1) % 7  # Go: 0=Sunday


@_pyreg("hourofday")
def _py_hourofday(n, sc):
    t = _time_a(n, sc)
    return None if t is None else t.hour


@_pyreg("hourofweek")
def _py_hourofweek(n, sc):
    t = _time_a(n, sc)
    return None if t is None else ((t.weekday() + 1) % 7) * 24 + t.hour


@_pyreg("todate")
def _py_todate(n, sc):
    if len(n.args) == 2:
        from .functions import _go_layout_to_spark

        layout = _go_layout_to_spark(_lit_str(n, 0))
        v = _a(n, sc, 1)
        if v is None:
            return None
        # spark patterns → strptime for the common tokens
        fmt = layout
        for k, sub in (("yyyy", "%Y"), ("yy", "%y"), ("MMMM", "%B"), ("MMM", "%b"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"), ("hh", "%I"), ("mm", "%M"), ("ss", "%S"), ("EEEE", "%A"), ("EEE", "%a")):
            fmt = fmt.replace(k, sub)
        try:
            return datetime.strptime(str(v), fmt)
        except ValueError:
            return None
    return _time_a(n, sc)


py_func_add("totime", PY_FUNCS["todate"])


@_pyreg("todatein")
def _py_todatein(n, sc):
    from zoneinfo import ZoneInfo

    tz = _lit_str(n, 1)
    t = _time_a(n, sc)
    if t is None:
        return None
    # to_utc_timestamp: interpret naive t as tz-local, render in UTC
    return t.replace(tzinfo=ZoneInfo(tz)).astimezone(ZoneInfo("UTC")).replace(tzinfo=None)


@_pyreg("totimestamp")
def _py_totimestamp(n, sc):
    t = _time_a(n, sc)
    return None if t is None else _epoch(t)


@_pyreg("seconds")
def _py_seconds(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    if _is_num(v):
        return float(v)
    parts = str(v).split(":")
    try:
        nums = [float(p) for p in parts]
    except ValueError:
        return None
    if len(nums) == 1:
        return nums[0]
    if len(nums) == 2:
        return nums[0] * 60 + nums[1]
    return nums[0] * 3600 + nums[1] * 60 + nums[2]


@_pyreg("unixtrunc")
def _py_unixtrunc(n, sc):
    from .functions import _TRUNC_UNIT

    t = _time_a(n, sc)
    if t is None:
        return None
    if len(n.args) > 1:
        unit = _TRUNC_UNIT.get(_lit_str(n, 1), "second")
        if unit == "second":
            t = t.replace(microsecond=0)
        elif unit == "minute":
            t = t.replace(second=0, microsecond=0)
        elif unit == "hour":
            t = t.replace(minute=0, second=0, microsecond=0)
        elif unit == "day":
            t = t.replace(hour=0, minute=0, second=0, microsecond=0)
        elif unit == "week":
            t = t.replace(hour=0, minute=0, second=0, microsecond=0) - timedelta(days=t.weekday())
        elif unit == "month":
            t = t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        elif unit == "year":
            t = t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    return _epoch(t)


@_pyreg("extract")
def _py_extract(n, sc):
    t = _time_a(n, sc)
    return None if t is None else t.strftime(_lit_str(n, 1))


py_func_add("strftime", PY_FUNCS["extract"])


# -- casting ----------------------------------------------------------------
@_pyreg("tostring")
def _py_tostring(n, sc):
    return _s(_a(n, sc))


@_pyreg("tobool")
def _py_tobool(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    s = _s(v).strip().lower()
    if s in ("true", "t", "yes", "y", "1"):
        return True
    if s in ("false", "f", "no", "n", "0"):
        return False
    return None


@_pyreg("toint")
def _py_toint(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    if isinstance(v, datetime):
        return _epoch(v) * 1000  # epoch millis (value/value.go:932)
    if isinstance(v, bool):
        return None
    if _is_num(v):
        return int(v)
    cleaned = re.sub(r"[^0-9eE.+-]", "", str(v))
    try:
        return int(float(cleaned))
    except (ValueError, OverflowError):
        return None


@_pyreg("tonumber")
def _py_tonumber(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    if _is_num(v):
        return float(v)
    cleaned = re.sub(r"[^0-9eE.+-]", "", str(v))
    try:
        return float(cleaned)
    except ValueError:
        return None


@_pyreg("unsign")
def _py_unsign(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    try:
        return abs(int(_s(v)))
    except ValueError:
        return None


@_pyreg("cast")
def _py_cast(n, sc):
    from .functions import _CAST_TYPES

    ty = _CAST_TYPES.get(_lit_str(n, 1).lower())
    if ty is None:
        raise TranslateError(f"cast: unknown type {_lit_str(n, 1)!r}")
    v = _a(n, sc)
    if v is None:
        return None
    if ty == "string":
        return _s(v)
    if ty == "long":
        return int(v)
    if ty == "double":
        return float(v)
    if ty == "boolean":
        return PY_FUNCS["tobool"](n, sc)
    if ty in ("timestamp", "date"):
        t = _as_time(v)
        return t.date() if ty == "date" and t else t
    raise PyEvalUnsupported(f"cast to {ty}")


# -- strings ----------------------------------------------------------------
@_pyreg("contains")
def _py_contains(n, sc):
    a, b = _a(n, sc), _a(n, sc, 1)
    if a is None or b is None:
        return None
    return _s(b) in _s(a)


@_pyreg("tolower")
def _py_tolower(n, sc):
    v = _a(n, sc)
    return None if v is None else _s(v).lower()


py_func_add("string.lowercase", PY_FUNCS["tolower"])


@_pyreg("toupper")
def _py_toupper(n, sc):
    v = _a(n, sc)
    return None if v is None else _s(v).upper()


py_func_add("string.uppercase", PY_FUNCS["toupper"])


@_pyreg("string.titlecase")
def _py_titlecase(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    return " ".join(w[:1].upper() + w[1:].lower() if w else w for w in _s(v).split(" "))


@_pyreg("split")
def _py_split(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    sep = _lit_str(n, 1) if len(n.args) > 1 else ","
    return [p for p in _s(v).split(sep) if p != ""]


@_pyreg("string.index")
def _py_string_index(n, sc):
    v = _a(n, sc)
    return None if v is None else _s(v).find(_lit_str(n, 1))


@_pyreg("string.substr")
def _py_string_substr(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    s = _s(v)
    start = int(_a(n, sc, 1))
    if len(n.args) > 2:
        return s[start : int(_a(n, sc, 2))]
    return s[start:]


@_pyreg("strip")
def _py_strip(n, sc):
    v = _a(n, sc)
    return None if v is None else _s(v).strip()


py_func_add("string.split", PY_FUNCS["split"])
py_func_add("string.strip", PY_FUNCS["strip"])


@_pyreg("replace")
def _py_replace(n, sc):
    v, old = _a(n, sc), _a(n, sc, 1)
    if v is None or old is None:
        return None
    new = _a(n, sc, 2) if len(n.args) > 2 else ""
    return _s(v).replace(_s(old), _s(new) if new is not None else "")


@_pyreg("join")
def _py_join(n, sc):
    # join(a, b, ..., sep): skip nil AND empty args (string.go:296-321)
    sep = _lit_str(n, len(n.args) - 1)
    if len(n.args) == 2:
        v = _a(n, sc)
        if isinstance(v, (list, tuple)):
            return sep.join(_s(x) for x in v if x is not None and x != "")
    parts = [_s(_a(n, sc, i)) for i in range(len(n.args) - 1)]
    return sep.join(p for p in parts if p not in (None, ""))


@_pyreg("hasprefix")
def _py_hasprefix(n, sc):
    a, b = _a(n, sc), _a(n, sc, 1)
    if a is None or b is None:
        return None
    return _s(a).startswith(_s(b))


@_pyreg("hassuffix")
def _py_hassuffix(n, sc):
    a, b = _a(n, sc), _a(n, sc, 1)
    if a is None or b is None:
        return None
    return _s(a).endswith(_s(b))


@_pyreg("concat")
def _py_concat(n, sc):
    parts = [_a(n, sc, i) for i in range(len(n.args))]
    if any(p is None for p in parts):
        return None
    return "".join(_s(p) for p in parts)


# -- email / url ------------------------------------------------------------
_EMAIL_RE_PY = re.compile(r"^[^@\s]+@[^@\s]+\.[^@\s]+$")


@_pyreg("email")
def _py_email(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    c = _s(v).strip().lower()
    return c if _EMAIL_RE_PY.match(c) else None


@_pyreg("emailname")
def _py_emailname(n, sc):
    c = _py_email(n, sc)
    return c.split("@", 1)[0] if c else None


@_pyreg("emaildomain")
def _py_emaildomain(n, sc):
    c = _py_email(n, sc)
    return c.rsplit("@", 1)[1] if c else None


def _py_host_of(v: str):
    from urllib.parse import urlparse

    if not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", v):
        v = "http://" + v
    h = urlparse(v).hostname
    if h is None:
        return None
    return re.sub(r"^www\.", "", h.lower())


@_pyreg("host")
def _py_host(n, sc):
    v = _a(n, sc)
    return None if v is None else _py_host_of(_s(v))


@_pyreg("domain")
def _py_domain(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    if isinstance(v, (list, tuple)):
        v = v[0] if v else None
        if v is None:
            return None
    h = _py_host_of(_s(v))
    if h is None:
        return None
    labels = h.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else h


@_pyreg("path")
def _py_path(n, sc):
    from urllib.parse import urlparse

    v = _a(n, sc)
    if v is None:
        return None
    s = _s(v)
    if not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", s):
        s = "http://" + s
    return urlparse(s).path or None


def _py_qs(n, sc):
    from urllib.parse import parse_qs, urlparse

    v = _a(n, sc)
    if v is None:
        return None
    s = _s(v)
    if not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", s):
        s = "http://" + s
    vals = parse_qs(urlparse(s).query, keep_blank_values=True).get(_lit_str(n, 1))
    return vals[0] if vals else None


py_func_add("qs", _py_qs)
py_func_add("qs2", _py_qs)
py_func_add("qsl", lambda n, sc: ([_py_qs(n, sc)] if _py_qs(n, sc) is not None else None))
py_func_add("url.matchqs", lambda n, sc: _py_qs(n, sc) is not None)


@_pyreg("urldecode")
def _py_urldecode(n, sc):
    from urllib.parse import unquote_plus

    v = _a(n, sc)
    return None if v is None else unquote_plus(_s(v))


@_pyreg("urlmain")
def _py_urlmain(n, sc):
    from urllib.parse import urlparse

    v = _a(n, sc)
    if v is None:
        return None
    s = _s(v)
    if not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", s):
        s = "http://" + s
    u = urlparse(s)
    return (u.hostname or "") + (u.path or "")


@_pyreg("urlminusqs")
def _py_urlminusqs(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    key = _lit_str(n, 1)
    out = re.sub(rf"([?&]){re.escape(key)}=[^&]*&?", r"\1", _s(v))
    return re.sub(r"[?&]$", "", out)


from .functions import uaparse as _uaparse  # noqa: E402  (tables shared with batch side)


@_pyreg("useragent")
def _py_useragent(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    part = _lit_str(n, 1) if len(n.args) > 1 else "ua_family"
    return _uaparse.parse_part(_s(v), part)


@_pyreg("useragent.map")
def _py_useragent_map(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    s = _s(v)
    return {k: _uaparse.parse_part(s, k) for k in _uaparse.PARTS}


# -- hashing / encoding -----------------------------------------------------
@_pyreg("hash")
def _py_hash(n, sc):
    # exact SipHash-2-4 key (0,1) — parity with the Spark builtin AND the
    # reference (hash_and_encode.go:25); empty → not-ok like the reference
    from .functions.sip import siphash24_i64

    v = _a(n, sc)
    if v is None:
        return None
    if isinstance(v, (list, tuple)):
        if not v:
            return None
        v = v[0]
    b = _s(v).encode("utf-8")
    return siphash24_i64(0, 1, b) if b else None


py_func_add("hash.sip", PY_FUNCS["hash"])


@_pyreg("hash.xx64")
def _py_hash_xx64(n, sc):
    v = _a(n, sc)
    return None if v is None else _xxhash64_value(v)


def _mk_digest(alg):
    def f(n, sc):
        v = _a(n, sc)
        return None if v is None else hashlib.new(alg, _s(v).encode("utf-8")).hexdigest()

    return f


py_func_add("hash.md5", _mk_digest("md5"))
py_func_add("hash.sha1", _mk_digest("sha1"))
py_func_add("hash.sha256", _mk_digest("sha256"))
py_func_add("hash.sha512", _mk_digest("sha512"))


@_pyreg("encoding.b64encode")
def _py_b64encode(n, sc):
    v = _a(n, sc)
    return None if v is None else base64.b64encode(_s(v).encode("utf-8")).decode("ascii")


@_pyreg("encoding.b64decode")
def _py_b64decode(n, sc):
    v = _a(n, sc)
    if v is None:
        return None
    try:
        return base64.b64decode(_s(v)).decode("utf-8")
    except Exception:
        return None


@_pyreg("json.jmespath")
def _py_jmespath(n, sc):
    path = _lit_str(n, 1)
    v = _a(n, sc)
    if v is None:
        return None
    try:
        doc = _json.loads(v) if isinstance(v, str) else v
    except Exception:
        return None
    if not any(ch in path for ch in "[?*|@(`") and not path.startswith("$"):
        out = doc
        for p in path.split("."):
            if not isinstance(out, dict) or p not in out:
                return None
            out = out[p]
    else:
        try:
            import jmespath
        except ImportError:
            raise PyEvalUnsupported("jmespath lib not installed")
        out = jmespath.compile(path).search(doc)
    if out is None:
        return None
    return out if isinstance(out, str) else _json.dumps(out)


@_pyreg("uuid")
def _py_uuid(n, sc):
    import uuid

    return str(uuid.uuid4())


# -- single-record aggregates (vm.Eval over one record: agg of one value) ---
def _single_agg(fn):
    def f(n, sc):
        from .nodes import IdentityNode as _Id

        a = n.args[0]
        if isinstance(a, _Id) and a.is_star:
            return 1
        v = py_eval(a, sc)
        return fn(v)

    return f


py_func_add("count", _single_agg(lambda v: 0 if v is None else 1))
py_func_add("sum", _single_agg(lambda v: v))
py_func_add("avg", _single_agg(lambda v: None if v is None else float(v)))
py_func_add("min", _single_agg(lambda v: v))
py_func_add("max", _single_agg(lambda v: v))
