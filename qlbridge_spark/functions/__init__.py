"""Built-in scalar/aggregate function registry.

Re-implements the reference's ~70 builtins (/root/reference/expr/builtins/,
load list builtins.go:21-141) as *Column builders* over native
pyspark.sql.functions — JVM-side, codegen-friendly; no Python UDFs on any
hot path. Runtime-extensible like ``expr.FuncAdd`` (expr/funcs.go:84) via
:func:`func_add`.

Each builder takes ``(FuncNode, Scope)`` and returns a Column, so builders
may inspect raw argument AST (e.g. literal formats, tz names) before
translating.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..nodes import FuncNode, IdentityNode, Node, NumberNode, StringNode
from ..translate import (
    Scope,
    TranslateError,
    exists_column,
    infer_dtype,
    parse_permissive_date,
    to_column,
)
from ..tzutil import is_ntz, utc_epoch_us


@dataclass
class FunctionDef:
    name: str
    builder: Callable[[FuncNode, Scope], Column]
    is_agg: bool = False
    # static DataType, or (node, scope) -> DataType|None when the result
    # type depends on argument types (array.slice, mapkeys, ...)
    return_type: T.DataType | Callable[[FuncNode, "Scope"], T.DataType | None] | None = None


registry: dict[str, FunctionDef] = {}


def func_add(name: str, builder, is_agg: bool = False, return_type=None) -> None:
    """Register a function at runtime — parity with expr.FuncAdd
    (expr/funcs.go:84, README.md:105-123)."""
    registry[name.lower()] = FunctionDef(name.lower(), builder, is_agg, return_type)


def agg_add(name: str, pandas_fn, return_type="double") -> None:
    """Register a custom AGGREGATE function (UDAF) usable from the SQL
    dialect — superset of the reference, whose exec-side agg registry is
    hardcoded to avg/count/sum (exec/groupby.go:457-470) so custom aggs
    parse but fail. Backed by an Arrow-batched grouped-agg pandas UDF
    (``pandas_fn``: pd.Series → scalar, type-hinted)."""
    udf = F.pandas_udf(pandas_fn, return_type)
    func_add(name, lambda n, s: udf(*[to_column(a, s) for a in n.args]), is_agg=True)


def _reg(name: str, is_agg: bool = False, return_type=None):
    def deco(fn):
        func_add(name, fn, is_agg, return_type)
        return fn

    return deco


def build_function(node: FuncNode, scope: Scope) -> Column:
    fd = registry.get(node.name)
    if fd is None:
        raise TranslateError(f"unknown function {node.name!r}")
    if getattr(node, "ignore_nulls", False):
        raise TranslateError(
            f"IGNORE NULLS is only supported on window value functions "
            f"(first_value/last_value/nth_value OVER …), not {node.name}()"
        )
    if getattr(node, "agg_order", None) and node.name not in ("string_agg", "listagg", "array_agg"):
        raise TranslateError(
            f"ORDER BY inside a call is only supported for ordered-set aggregates "
            f"(string_agg/listagg/array_agg), not {node.name}()"
        )
    if node.filter_where is not None:
        if not fd.is_agg:
            raise TranslateError(f"FILTER (WHERE ...) is only valid on an aggregate, not {node.name}()")
        node = _apply_agg_filter(node, scope)
    return fd.builder(node, scope)


def _apply_agg_filter(node: FuncNode, scope: Scope) -> FuncNode:
    """``agg(x) FILTER (WHERE p)`` → rewrite the DATA argument to
    ``when(p, x)`` (NULLs are excluded from every aggregate), leaving
    parameter arguments (percentile fraction, accuracy, ...) alone.
    ``count(*)`` counts matching rows; ``count(distinct x)`` wraps the
    inner arguments."""
    import dataclasses

    from ..nodes import SparkColNode

    cond = to_column(node.filter_where, scope)

    def wrap(a: Node) -> Node:
        if isinstance(a, IdentityNode) and a.is_star:  # count(*)
            return SparkColNode(col=F.when(cond, F.lit(1)), dtype=T.IntegerType(), text="1")
        return SparkColNode(col=F.when(cond, to_column(a, scope)), dtype=infer_dtype(a, scope), text=a.sql())

    args = list(node.args)
    if args:
        if isinstance(args[0], FuncNode) and args[0].name == "distinct":
            args[0] = dataclasses.replace(args[0], args=[wrap(x) for x in args[0].args])
        else:
            args[0] = wrap(args[0])
    return dataclasses.replace(node, args=args, filter_where=None)


def is_agg_func(name: str) -> bool:
    fd = registry.get(name.lower())
    return fd is not None and fd.is_agg


def is_agg_tree(node: Node) -> bool:
    """True if any function in the tree is an aggregate (rel/sql.go:102).

    Window expressions are NOT group aggregates: ``sum(x) OVER (...)``
    computes per-row, so the walk does not descend into WindowNode."""
    from ..nodes import WindowNode

    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, WindowNode):
            continue
        if isinstance(n, FuncNode) and is_agg_func(n.name):
            return True
        stack.extend(n.children())
    return False


# -- helpers ----------------------------------------------------------------
def _cols(node: FuncNode, scope: Scope) -> list[Column]:
    return [to_column(a, scope) for a in node.args]


def _c(node: FuncNode, scope: Scope, i: int = 0) -> Column:
    return to_column(node.args[i], scope)


def _lit_str(node: FuncNode, i: int) -> str:
    a = node.args[i]
    if isinstance(a, StringNode):
        return a.value
    if isinstance(a, NumberNode):
        return a.text
    if isinstance(a, IdentityNode):
        return a.name
    raise TranslateError(f"{node.name}: arg {i} must be a literal")


def _time_arg(node: FuncNode, scope: Scope, i: int = 0) -> Column:
    """Arg as timestamp; no-arg time funcs default to now() (builtins/time.go)."""
    if len(node.args) <= i:
        return F.current_timestamp()
    c = _c(node, scope, i)
    dt = infer_dtype(node.args[i], scope)
    if isinstance(dt, T.StringType) or dt is None:
        return _permissive_to_timestamp(c, node.args[i], scope)
    if isinstance(dt, T.NumericType):
        return F.timestamp_millis(c.cast("long"))
    if isinstance(dt, T.TimestampNTZType):
        # Spark 4 reads parquet timestamp[us] as TIMESTAMP_NTZ, which
        # unix_timestamp/unix_micros and arithmetic casts reject — interpret
        # in the session tz (UTC in tests/bench, matching DuckDB's naive
        # timestamps) so every time builtin stays NTZ-safe
        return c.cast("timestamp_ltz")
    return c


_DATE_FORMATS = [
    None,  # Spark default parser (ISO-8601 etc.)
    "MM/dd/yyyy",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yy",
    "yyyy/MM/dd",
    "dd MMM yyyy",
    "MMM dd, yyyy",
    "yyyyMMdd",
]


def _permissive_to_timestamp(c: Column, raw: Node | None = None, scope: Scope | None = None) -> Column:
    """Permissive string→timestamp ≈ araddon/dateparse. Literals are parsed
    driver-side (incl. datemath); columns get a try_to_timestamp coalesce
    chain over common formats — all JVM-side. Against a STREAMING scope,
    datemath literals lower to runtime expressions (current_timestamp ±
    INTERVAL) so 'now' is not frozen at plan time."""
    if isinstance(raw, StringNode):
        if scope is not None and scope.has_streaming_frame:
            from ..translate import datemath_runtime_column

            rt = datemath_runtime_column(raw.value)
            if rt is not None:
                return rt
        t = parse_permissive_date(raw.value)
        if t is None:
            raise TranslateError(f"unparseable date literal {raw.value!r}")
        return F.lit(t)
    attempts = [F.try_to_timestamp(c)] + [F.try_to_timestamp(c, F.lit(fmt)) for fmt in _DATE_FORMATS if fmt]
    return F.coalesce(*attempts)


# ===========================================================================
# math (expr/builtins/math.go)
# ===========================================================================
@_reg("sqrt", return_type=T.DoubleType())
def _sqrt(n, s):
    return F.sqrt(_c(n, s).cast("double"))


@_reg("pow", return_type=T.DoubleType())
def _pow(n, s):
    return F.pow(_c(n, s).cast("double"), _c(n, s, 1).cast("double"))


# ===========================================================================
# aggregates (expr/builtins/aggregations.go, exec/groupby.go:350-435)
# ===========================================================================
@_reg("count", is_agg=True, return_type=T.LongType())
def _count(n, s):
    a = n.args[0]
    if isinstance(a, IdentityNode) and a.is_star:
        return F.count(F.lit(1))
    if isinstance(a, FuncNode) and a.name == "distinct":
        return F.count_distinct(*[to_column(x, s) for x in a.args])
    # reference count() counts non-null (exec/groupby.go:416-435)
    return F.count(to_column(a, s))


def _distinct_arg(n: FuncNode):
    """The inner arg when the aggregate is ``agg(DISTINCT x)`` (parsed as
    ``agg(distinct(x))``), else None."""
    a = n.args[0] if n.args else None
    if isinstance(a, FuncNode) and a.name == "distinct" and len(a.args) == 1:
        return a.args[0]
    return None


@_reg("avg", is_agg=True, return_type=T.DoubleType())
def _avg(n, s):
    d = _distinct_arg(n)
    if d is not None:
        # ANSI avg(DISTINCT x): mean over the distinct non-null values
        # (Spark has no avg_distinct builtin; sum/count distinct compose)
        c = to_column(d, s).cast("double")
        return F.sum_distinct(c) / F.count_distinct(c)
    return F.avg(_c(n, s).cast("double"))


@_reg("sum", is_agg=True, return_type=T.DoubleType())
def _sum(n, s):
    d = _distinct_arg(n)
    if d is not None:
        return F.sum_distinct(to_column(d, s))
    return F.sum(_c(n, s))


# supersets the reference (exec/groupby.go:461-469 errors on these)
@_reg("min", is_agg=True)
def _min(n, s):
    d = _distinct_arg(n)  # min(DISTINCT x) ≡ min(x)
    return F.min(to_column(d, s) if d is not None else _c(n, s))


@_reg("max", is_agg=True)
def _max(n, s):
    d = _distinct_arg(n)
    return F.max(to_column(d, s) if d is not None else _c(n, s))


def _distinct_variance(d, s, samp: bool, std: bool):
    """``variance-family(DISTINCT x)`` — Spark's Column API has no
    isDistinct flag, so compute over ``collect_set`` (the distinct
    non-null values) with CENTERED sums: shift by the set's min before
    squaring, the same conditioning argument as the matview variance
    state (raw power sums cancel catastrophically at epoch-millis
    magnitudes). State is O(distinct values per group) in one row — the
    inherent cost of the DISTINCT qualifier on a non-distributive agg.
    Distinctness is computed at the SOURCE type (collect_set the raw
    column, cast to double only inside the fold) so bigints distinct
    beyond 2^53 don't collapse — matching count(DISTINCT) semantics and
    the matview substate exposure. (Documented edge divergence: DuckDB
    casts the argument to double BEFORE its DISTINCT for the variance
    family, so beyond 2^53 its n differs; within 2^53 both agree.)"""
    arr = F.collect_set(to_column(d, s))
    nn = F.size(arr).cast("double")
    z = F.array_min(arr).cast("double")
    s_ = F.aggregate(arr, F.lit(0.0), lambda a, x: a + (x.cast("double") - z))
    q_ = F.aggregate(
        arr,
        F.lit(0.0),
        lambda a, x: a + (x.cast("double") - z) * (x.cast("double") - z),
    )
    m2 = F.greatest(q_ - s_ * s_ / nn, F.lit(0.0))
    out = F.when(nn > 1, m2 / (nn - 1)) if samp else F.when(nn > 0, m2 / nn)
    return F.sqrt(out) if std else out


@_reg("stddev", is_agg=True, return_type=T.DoubleType())
def _stddev(n, s):
    d = _distinct_arg(n)
    if d is not None:
        return _distinct_variance(d, s, samp=True, std=True)
    return F.stddev(_c(n, s))


@_reg("stddev_samp", is_agg=True, return_type=T.DoubleType())
def _stddev_samp(n, s):
    return F.stddev_samp(_c(n, s))


@_reg("stddev_pop", is_agg=True, return_type=T.DoubleType())
def _stddev_pop(n, s):
    return F.stddev_pop(_c(n, s))


@_reg("variance", is_agg=True, return_type=T.DoubleType())
def _variance(n, s):
    return F.var_samp(_c(n, s))


@_reg("var_samp", is_agg=True, return_type=T.DoubleType())
def _var_samp(n, s):
    return F.var_samp(_c(n, s))


@_reg("var_pop", is_agg=True, return_type=T.DoubleType())
def _var_pop(n, s):
    return F.var_pop(_c(n, s))


def _distinct_percentile(d, s, p: float):
    """``median/percentile_cont(DISTINCT x)`` — exact interpolated
    percentile over the DISTINCT non-null values. Spark's Column API has
    no isDistinct flag, so sort the collect_set (dedup at the SOURCE
    type, matching the matview substate) and interpolate positionally:
    target index t = (n−1)·p, answer = v⌊t⌋ + (v⌈t⌉ − v⌊t⌋)·frac(t)."""
    arr = F.array_sort(F.collect_set(to_column(d, s)))
    n_ = F.size(arr)
    idx = (n_ - 1).cast("double") * F.lit(float(p))
    lo = F.floor(idx).cast("int")
    vlo = F.element_at(arr, lo + 1).cast("double")
    vhi = F.element_at(arr, F.ceil(idx).cast("int") + 1).cast("double")
    return F.when(n_ > 0, vlo + (vhi - vlo) * (idx - lo.cast("double")))


@_reg("median", is_agg=True, return_type=T.DoubleType())
def _median(n, s):
    # EXACT median (Spark's Median expression — sort-based, not the
    # approx_percentile sketch); linear interpolation between the middle
    # two like ANSI percentile_cont(0.5)
    d = _distinct_arg(n)
    if d is not None:
        return _distinct_percentile(d, s, 0.5)
    return F.median(_c(n, s).cast("double"))


@_reg("grouping", is_agg=True, return_type=T.ByteType())
def _grouping(n, s):
    # 1 when the column is aggregated away in this ROLLUP/CUBE/GROUPING
    # SETS output row, else 0 (ANSI GROUPING)
    return F.grouping(_c(n, s))


@_reg("grouping_id", is_agg=True, return_type=T.LongType())
def _grouping_id(n, s):
    return F.grouping_id(*[to_column(a, s) for a in n.args])


@_reg("approx_count_distinct", is_agg=True, return_type=T.LongType())
def _approx_count_distinct(n, s):
    # HyperLogLog++ sketch — the 100 TB path for COUNT(DISTINCT): one
    # pass, fixed memory, no pre-shuffle expansion (datapipe/sketches.py
    # exposes the same machinery as an operator)
    if len(n.args) > 1:
        if not isinstance(n.args[1], NumberNode):
            raise TranslateError("approx_count_distinct(expr[, rsd]): rsd must be a numeric literal")
        return F.approx_count_distinct(_c(n, s), float(n.args[1].value))
    return F.approx_count_distinct(_c(n, s))


@_reg("approx_percentile", is_agg=True, return_type=T.DoubleType())
def _approx_percentile(n, s):
    # t-digest-style sketch percentile (percentile_approx) — fixed-memory
    # counterpart of percentile_cont for scale paths
    if len(n.args) < 2 or not isinstance(n.args[1], NumberNode):
        raise TranslateError("approx_percentile(expr, p[, accuracy]) takes a numeric literal fraction")
    p = float(n.args[1].value)
    if not 0.0 <= p <= 1.0:
        raise TranslateError("approx_percentile: p must be in [0, 1]")
    acc = 10000
    if len(n.args) > 2:
        if not isinstance(n.args[2], NumberNode):
            raise TranslateError("approx_percentile: accuracy must be an integer literal")
        acc = int(n.args[2].value)
    return F.percentile_approx(_c(n, s).cast("double"), F.lit(p), F.lit(acc))


@_reg("percentile_cont", is_agg=True, return_type=T.DoubleType())
def _percentile_cont(n, s):
    # percentile_cont(expr, p) — EXACT continuous percentile with linear
    # interpolation (matches DuckDB quantile_cont). Spark's F.percentile
    # is the exact sort-based implementation, not a sketch.
    if len(n.args) != 2 or not isinstance(n.args[1], NumberNode):
        raise TranslateError("percentile_cont(expr, p) takes a numeric literal fraction")
    p = float(n.args[1].value)
    if not 0.0 <= p <= 1.0:
        raise TranslateError("percentile_cont: p must be in [0, 1]")
    d = _distinct_arg(n)
    if d is not None:
        return _distinct_percentile(d, s, p)
    return F.percentile(_c(n, s).cast("double"), F.lit(p))


@_reg("distinct", is_agg=True)
def _distinct_agg(n, s):
    # only meaningful inside count(distinct(x)) — standalone: collect_set
    return F.count_distinct(_c(n, s))


# ===========================================================================
# logical (expr/builtins/logic.go) — args coerced to numbers like the VM
# ===========================================================================
def _cmp_builder(op):
    def b(n, s):
        l = _c(n, s).cast("double")
        r = _c(n, s, 1).cast("double")
        return op(l, r)

    return b


func_add("gt", _cmp_builder(lambda l, r: l > r), return_type=T.BooleanType())
func_add("ge", _cmp_builder(lambda l, r: l >= r), return_type=T.BooleanType())
func_add("lt", _cmp_builder(lambda l, r: l < r), return_type=T.BooleanType())
func_add("le", _cmp_builder(lambda l, r: l <= r), return_type=T.BooleanType())
func_add("eq", lambda n, s: _c(n, s) == _c(n, s, 1), return_type=T.BooleanType())
func_add("ne", lambda n, s: _c(n, s) != _c(n, s, 1), return_type=T.BooleanType())


@_reg("not", return_type=T.BooleanType())
def _not(n, s):
    return ~_c(n, s)


@_reg("exists", return_type=T.BooleanType())
def _exists(n, s):
    return exists_column(n.args[0], s)


@_reg("any", return_type=T.BooleanType())
def _any(n, s):
    out = exists_column(n.args[0], s)
    for a in n.args[1:]:
        out = out | exists_column(a, s)
    return out


@_reg("all", return_type=T.BooleanType())
def _all(n, s):
    """true if all args exist, non-nil, non-false (builtins/logic.go:288)."""
    conds = []
    for a in n.args:
        c = to_column(a, s)
        dt = infer_dtype(a, s)
        cond = exists_column(a, s)
        if isinstance(dt, T.BooleanType):
            cond = cond & c
        conds.append(cond)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


# ===========================================================================
# map/array constructors + accessors (expr/builtins/list_map.go)
# ===========================================================================
@_reg("map")
def _map(n, s):
    return F.create_map(_c(n, s), _c(n, s, 1))


@_reg("len", return_type=T.LongType())
def _len(n, s):
    c = _c(n, s)
    dt = infer_dtype(n.args[0], s)
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return F.size(c).cast("long")
    return F.char_length(c.cast("string")).cast("long")


func_add("char_length", registry["len"].builder, return_type=T.LongType())
func_add("length", registry["len"].builder, return_type=T.LongType())


@_reg("array.index")
def _array_index(n, s):
    # reference is 0-based (list_map.go:73); element_at is 1-based
    idx = _c(n, s, 1).cast("int")
    return F.element_at(_c(n, s), idx + F.lit(1))


def _same_as_arg0(n, s):
    return infer_dtype(n.args[0], s)


def _map_key_array(n, s):
    dt = infer_dtype(n.args[0], s)
    return T.ArrayType(dt.keyType) if isinstance(dt, T.MapType) else None


def _map_value_array(n, s):
    dt = infer_dtype(n.args[0], s)
    return T.ArrayType(dt.valueType) if isinstance(dt, T.MapType) else None


@_reg("array.slice", return_type=_same_as_arg0)
def _array_slice(n, s):
    arr = _c(n, s)
    start = _c(n, s, 1).cast("int")
    if len(n.args) > 2:
        end = _c(n, s, 2).cast("int")
        return F.slice(arr, start + 1, end - start)
    return F.slice(arr, start + 1, F.size(arr) - start)


@_reg("mapkeys", return_type=_map_key_array)
def _mapkeys(n, s):
    return F.map_keys(_c(n, s))


@_reg("mapvalues", return_type=_map_value_array)
def _mapvalues(n, s):
    return F.map_values(_c(n, s))


@_reg("mapinvert")
def _mapinvert(n, s):
    c = _c(n, s)
    return F.map_from_arrays(F.map_values(c).cast("array<string>"), F.map_keys(c).cast("array<string>"))


@_reg("maptime")
def _maptime(n, s):
    k = _c(n, s)
    v = _time_arg(n, s, 1) if len(n.args) > 1 else F.current_timestamp()
    return F.create_map(k, v)


@_reg("match")
def _match(n, s):
    """Select fields by key prefix into a map with prefix stripped
    (list_map.go:292). Translation-time: scan scope columns."""
    prefixes = [_lit_str(n, i) for i in range(len(n.args))]
    pairs = []
    for colname in s.columns():
        for p in prefixes:
            if colname.startswith(p):
                pairs.append((colname[len(p) :], colname))
    if not pairs:
        return F.lit(None).cast(T.MapType(T.StringType(), T.StringType()))
    args = []
    for stripped, full in pairs:
        args.append(F.lit(stripped))
        args.append(F.col(full).cast("string"))
    return F.create_map(*args)


@_reg("filter")
def _filter(n, s):
    """Remove fields matching name/pattern from a map (filter.go:78).
    On a map column: map_filter; with identity list: rebuild map."""
    c = _c(n, s)
    dt = infer_dtype(n.args[0], s)
    if isinstance(dt, T.MapType) and len(n.args) > 1:
        pat = _lit_str(n, 1).replace("*", ".*")
        return F.map_filter(c, lambda k, v: ~k.rlike(f"^{pat}$"))
    return c


@_reg("filtermatch")
def _filtermatch(n, s):
    c = _c(n, s)
    dt = infer_dtype(n.args[0], s)
    if isinstance(dt, T.MapType) and len(n.args) > 1:
        pat = _lit_str(n, 1).replace("*", ".*")
        return F.map_filter(c, lambda k, v: k.rlike(f"^{pat}$"))
    return c


@_reg("oneof")
def _oneof(n, s):
    """First non-nil arg; empty string counts as nil (filter.go:17)."""
    cols = []
    for a in n.args:
        c = to_column(a, s)
        dt = infer_dtype(a, s)
        if isinstance(dt, T.StringType):
            c = F.nullif(c, F.lit(""))
        cols.append(c)
    return F.coalesce(*cols)


# ===========================================================================
# date/time (expr/builtins/time.go)
# ===========================================================================
@_reg("now", return_type=T.TimestampType())
def _now(n, s):
    return F.current_timestamp()


@_reg("yy", return_type=T.LongType())
def _yy(n, s):
    """2-digit year (time.go:46): yy(reg_date) on 2012 → 12."""
    return (F.year(_time_arg(n, s)) % 100).cast("long")


@_reg("mm", return_type=T.LongType())
def _mm(n, s):
    return F.month(_time_arg(n, s)).cast("long")


func_add("monthofyear", registry["mm"].builder, return_type=T.LongType())


@_reg("yymm", return_type=T.StringType())
def _yymm(n, s):
    return F.date_format(_time_arg(n, s), "yyMM")


@_reg("dayofweek", return_type=T.LongType())
def _dayofweek(n, s):
    # Go time.Weekday(): 0=Sunday (time.go:165); Spark dayofweek: 1=Sunday
    return (F.dayofweek(_time_arg(n, s)) - 1).cast("long")


@_reg("hourofday", return_type=T.LongType())
def _hourofday(n, s):
    return F.hour(_time_arg(n, s)).cast("long")


@_reg("hourofweek", return_type=T.LongType())
def _hourofweek(n, s):
    t = _time_arg(n, s)
    return ((F.dayofweek(t) - 1) * 24 + F.hour(t)).cast("long")


@_reg("todate", return_type=T.TimestampType())
def _todate(n, s):
    if len(n.args) == 2:
        # todate("01/02/2006", col) — Go layout first (time.go:307)
        fmt = _go_layout_to_spark(_lit_str(n, 0))
        return F.try_to_timestamp(_c(n, s, 1), F.lit(fmt))
    return _time_arg(n, s)


func_add("totime", registry["todate"].builder, return_type=T.TimestampType())


@_reg("todatein", return_type=T.TimestampType())
def _todatein(n, s):
    tz = _lit_str(n, 1)
    c = _time_arg(n, s)
    return F.to_utc_timestamp(c, tz)


@_reg("totimestamp", return_type=T.LongType())
def _totimestamp(n, s):
    """Unix epoch seconds (time.go:275). NTZ → UTC-stable (tzutil)."""
    if n.args and is_ntz(infer_dtype(n.args[0], s)):
        return F.floor(utc_epoch_us(_c(n, s), infer_dtype(n.args[0], s)) / F.lit(1_000_000)).cast("long")
    return F.unix_timestamp(_time_arg(n, s)).cast("long")


@_reg("seconds", return_type=T.DoubleType())
def _seconds(n, s):
    """Parse duration-ish value to seconds (time.go:423): numbers pass
    through; "mm:ss" / "hh:mm:ss" strings are split."""
    a = n.args[0]
    dt = infer_dtype(a, s)
    c = to_column(a, s)
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    parts = F.split(c.cast("string"), ":")
    n_parts = F.size(parts)
    return (
        F.when(n_parts == 1, F.element_at(parts, 1).try_cast("double"))
        .when(n_parts == 2, F.element_at(parts, 1).try_cast("double") * 60 + F.element_at(parts, 2).try_cast("double"))
        .otherwise(
            F.element_at(parts, 1).try_cast("double") * 3600
            + F.element_at(parts, 2).try_cast("double") * 60
            + F.element_at(parts, 3).try_cast("double")
        )
    )


_TRUNC_UNIT = {"s": "second", "m": "minute", "h": "hour", "d": "day", "w": "week", "M": "month", "y": "year", "second": "second", "minute": "minute", "hour": "hour", "day": "day", "week": "week", "month": "month", "year": "year"}


@_reg("unixtrunc", return_type=T.LongType())
def _unixtrunc(n, s):
    unit = _TRUNC_UNIT.get(_lit_str(n, 1), "second") if len(n.args) > 1 else None
    if n.args and is_ntz(infer_dtype(n.args[0], s)):
        # UTC-stable NTZ path: date_trunc round-trips through the session
        # tz, so truncate on the UTC epoch directly (fixed-size units) or
        # on the wall DATE (calendar units — NTZ→DATE is wall-based)
        c = _c(n, s)
        us = utc_epoch_us(c, infer_dtype(n.args[0], s))
        sec = F.floor(us / F.lit(1_000_000))
        if unit in (None, "second"):
            return sec.cast("long")
        size = {"minute": 60, "hour": 3600, "day": 86400}.get(unit)
        if size is not None:
            return (F.floor(sec / F.lit(size)) * size).cast("long")
        day = F.floor(sec / F.lit(86400))
        if unit == "week":
            # epoch day 0 = Thursday; Spark's week truncation starts Monday
            return ((day - F.pmod(day + 3, F.lit(7))) * 86400).cast("long")
        d = F.trunc(c.cast("date"), {"month": "month", "year": "year"}[unit])
        return (F.datediff(d, F.lit("1970-01-01").cast("date")).cast("long") * 86400).cast("long")
    t = _time_arg(n, s)
    if unit is not None:
        t = F.date_trunc(unit, t)
    return F.unix_timestamp(t).cast("long")


_STRFTIME_MAP = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH", "%I": "hh",
    "%M": "mm", "%S": "ss", "%B": "MMMM", "%b": "MMM", "%A": "EEEE", "%a": "EEE",
    "%j": "DDD", "%p": "a", "%z": "Z", "%f": "SSSSSS",
}


def _strftime_to_spark(fmt: str) -> str:
    out = fmt
    for k, v in _STRFTIME_MAP.items():
        out = out.replace(k, v)
    return out


@_reg("extract", return_type=T.StringType())
def _extract(n, s):
    t = _time_arg(n, s)
    fmt = _strftime_to_spark(_lit_str(n, 1))
    return F.date_format(t, fmt)


func_add("strftime", registry["extract"].builder, return_type=T.StringType())


_GO_LAYOUT = {"2006": "yyyy", "06": "yy", "01": "MM", "02": "dd", "15": "HH", "03": "hh", "04": "mm", "05": "ss", "Jan": "MMM", "January": "MMMM", "Mon": "EEE", "Monday": "EEEE"}


def _go_layout_to_spark(layout: str) -> str:
    out = layout
    for k in sorted(_GO_LAYOUT, key=len, reverse=True):
        out = out.replace(k, _GO_LAYOUT[k])
    return out


# ===========================================================================
# casting (expr/builtins/cast.go)
# ===========================================================================
@_reg("tostring", return_type=T.StringType())
def _tostring(n, s):
    return _c(n, s).cast("string")


_CAST_TYPES = {
    "char": "string", "varchar": "string", "string": "string", "text": "string",
    "int": "long", "integer": "long", "bigint": "long", "smallint": "long", "long": "long",
    "float": "double", "double": "double", "number": "double", "decimal": "double",
    "bool": "boolean", "boolean": "boolean",
    "timestamp": "timestamp", "datetime": "timestamp", "date": "date", "binary": "binary",
}


@_reg("cast")
def _cast(n, s):
    ty = _CAST_TYPES.get(_lit_str(n, 1).lower())
    if ty is None:
        raise TranslateError(f"cast: unknown type {_lit_str(n, 1)!r}")
    return _c(n, s).cast(ty)


@_reg("try_cast")
def _try_cast(n, s):
    """TRY_CAST(x AS type) — NULL instead of error on bad input (ANSI
    superset; DuckDB-compatible)."""
    ty = _CAST_TYPES.get(_lit_str(n, 1).lower())
    if ty is None:
        raise TranslateError(f"try_cast: unknown type {_lit_str(n, 1)!r}")
    return _c(n, s).try_cast(ty)


@_reg("tobool", return_type=T.BooleanType())
def _tobool(n, s):
    return _c(n, s).cast("string").try_cast("boolean")


@_reg("toint", return_type=T.LongType())
def _toint(n, s):
    c = _c(n, s)
    dt = infer_dtype(n.args[0], s)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # time → epoch MILLIS (value/value.go:932-933); whole-second
        # precision like Go's .Unix()*1000, UTC-stable for NTZ (tzutil)
        return (F.floor(utc_epoch_us(c, dt) / F.lit(1_000_000)) * 1000).cast("long")
    if isinstance(dt, T.NumericType):
        return c.cast("long")
    cleaned = F.regexp_replace(c.cast("string"), r"[^0-9eE.+-]", "")
    return cleaned.try_cast("double").try_cast("long")


@_reg("tonumber", return_type=T.DoubleType())
def _tonumber(n, s):
    c = _c(n, s)
    dt = infer_dtype(n.args[0], s)
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    cleaned = F.regexp_replace(c.cast("string"), r"[^0-9eE.+-]", "")
    return cleaned.try_cast("double")


@_reg("unsign", return_type=T.LongType())
def _unsign(n, s):
    return F.abs(_c(n, s).cast("string").try_cast("long"))


# ===========================================================================
# strings (expr/builtins/string.go)
# ===========================================================================
@_reg("contains", return_type=T.BooleanType())
def _contains_fn(n, s):
    return _c(n, s).cast("string").contains(_c(n, s, 1).cast("string"))


@_reg("tolower", return_type=T.StringType())
def _tolower(n, s):
    return F.lower(_c(n, s).cast("string"))


func_add("string.lowercase", registry["tolower"].builder, return_type=T.StringType())


@_reg("toupper", return_type=T.StringType())
def _toupper(n, s):
    return F.upper(_c(n, s).cast("string"))


func_add("string.uppercase", registry["toupper"].builder, return_type=T.StringType())


@_reg("string.titlecase", return_type=T.StringType())
def _titlecase(n, s):
    return F.initcap(_c(n, s).cast("string"))


@_reg("split", return_type=T.ArrayType(T.StringType()))
def _split(n, s):
    sep = re.escape(_lit_str(n, 1)) if len(n.args) > 1 else ","
    # drop empties like the reference's SplitOnSpace-ish behavior
    return F.filter(F.split(_c(n, s).cast("string"), sep), lambda x: x != F.lit(""))


func_add("string.split", registry["split"].builder, return_type=T.ArrayType(T.StringType()))
func_add("string.strip", lambda n, s: F.trim(to_column(n.args[0], s).cast("string")), return_type=T.StringType())


@_reg("string.index", return_type=T.LongType())
def _string_index(n, s):
    # 0-based; -1 when absent (string.go:149); instr is 1-based
    return (F.instr(_c(n, s).cast("string"), _lit_str(n, 1)) - 1).cast("long")


@_reg("string.substr", return_type=T.StringType())
def _string_substr(n, s):
    c = _c(n, s).cast("string")
    start = _c(n, s, 1).cast("int")
    if len(n.args) > 2:
        end = _c(n, s, 2).cast("int")
        return c.substr(start + 1, end - start)
    return c.substr(start + 1, F.char_length(c) - start)


@_reg("strip", return_type=T.StringType())
def _strip(n, s):
    return F.trim(_c(n, s).cast("string"))


@_reg("replace", return_type=T.StringType())
def _replace(n, s):
    old = _c(n, s, 1).cast("string")
    new = _c(n, s, 2).cast("string") if len(n.args) > 2 else F.lit("")
    return F.replace(_c(n, s).cast("string"), old, new)


@_reg("join", return_type=T.StringType())
def _join(n, s):
    # join(a, b, ..., sep) — last arg is separator; nil AND empty-string
    # args are skipped (string.go:296-321), hence the nullif wrap
    # (concat_ws only skips NULLs on its own)
    sep = _lit_str(n, len(n.args) - 1)
    cols = [F.nullif(to_column(a, s).cast("string"), F.lit("")) for a in n.args[:-1]]
    if len(cols) == 1:
        dt = infer_dtype(n.args[0], s)
        if isinstance(dt, T.ArrayType):
            return F.array_join(F.filter(to_column(n.args[0], s), lambda x: x.isNotNull() & (x.cast("string") != F.lit(""))), sep)
    return F.concat_ws(sep, *cols)


@_reg("hasprefix", return_type=T.BooleanType())
def _hasprefix(n, s):
    return _c(n, s).cast("string").startswith(_c(n, s, 1).cast("string"))


@_reg("hassuffix", return_type=T.BooleanType())
def _hassuffix(n, s):
    return _c(n, s).cast("string").endswith(_c(n, s, 1).cast("string"))


# ===========================================================================
# email / url (expr/builtins/url_email.go)
# ===========================================================================
_EMAIL_RE = r"^[^@\s]+@[^@\s]+\.[^@\s]+$"


@_reg("email", return_type=T.StringType())
def _email(n, s):
    c = F.lower(F.trim(_c(n, s).cast("string")))
    return F.when(c.rlike(_EMAIL_RE), c)


@_reg("emailname", return_type=T.StringType())
def _emailname(n, s):
    c = F.lower(F.trim(_c(n, s).cast("string")))
    return F.when(c.rlike(_EMAIL_RE), F.substring_index(c, "@", 1))


@_reg("emaildomain", return_type=T.StringType())
def _emaildomain(n, s):
    c = F.lower(F.trim(_c(n, s).cast("string")))
    return F.when(c.rlike(_EMAIL_RE), F.substring_index(c, "@", -1))


def _host_of(c: Column) -> Column:
    """Host of a URL; tolerates scheme-less urls (url_email.go NewUrl)."""
    with_scheme = F.when(c.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), c).otherwise(F.concat(F.lit("http://"), c))
    h = F.parse_url(with_scheme, F.lit("HOST"))
    return F.lower(F.regexp_replace(h, r"^www\.", ""))


@_reg("host", return_type=T.StringType())
def _host(n, s):
    return _host_of(_c(n, s).cast("string"))


@_reg("hosts", return_type=T.ArrayType(T.StringType()))
def _hosts(n, s):
    cols = [_host_of(to_column(a, s).cast("string")) for a in n.args]
    if len(cols) == 1 and isinstance(infer_dtype(n.args[0], s), T.ArrayType):
        return F.array_distinct(F.transform(to_column(n.args[0], s), _host_of))
    return F.array_distinct(F.array(*cols))


def _domain_of(c: Column) -> Column:
    h = _host_of(c)
    labels = F.split(h, r"\.")
    return F.when(F.size(labels) >= 2, F.array_join(F.slice(labels, -2, 2), ".")).otherwise(h)


@_reg("domain", return_type=T.StringType())
def _domain(n, s):
    a = n.args[0]
    dt = infer_dtype(a, s)
    c = to_column(a, s)
    if isinstance(dt, T.ArrayType):
        return F.element_at(F.array_distinct(F.transform(c, _domain_of)), 1)
    return _domain_of(c.cast("string"))


@_reg("domains", return_type=T.ArrayType(T.StringType()))
def _domains(n, s):
    outs = []
    for a in n.args:
        dt = infer_dtype(a, s)
        c = to_column(a, s)
        if isinstance(dt, T.ArrayType):
            outs.append(F.transform(c, _domain_of))
        else:
            outs.append(F.array(_domain_of(c.cast("string"))))
    merged = outs[0]
    for o in outs[1:]:
        merged = F.concat(merged, o)
    return F.array_distinct(merged)


@_reg("urldecode", return_type=T.StringType())
def _urldecode(n, s):
    return F.try_url_decode(_c(n, s).cast("string"))


@_reg("path", return_type=T.StringType())
def _path(n, s):
    c = _c(n, s).cast("string")
    with_scheme = F.when(c.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), c).otherwise(F.concat(F.lit("http://"), c))
    return F.parse_url(with_scheme, F.lit("PATH"))


def _qs_builder(n, s):
    c = _c(n, s).cast("string")
    key = _lit_str(n, 1)
    with_scheme = F.when(c.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), c).otherwise(F.concat(F.lit("http://"), c))
    return F.parse_url(with_scheme, F.lit("QUERY"), F.lit(key))


func_add("qs", _qs_builder, return_type=T.StringType())
func_add("qs2", _qs_builder, return_type=T.StringType())


@_reg("qsl")
def _qsl(n, s):
    v = _qs_builder(n, s)
    return F.when(v.isNotNull(), F.array(v))


@_reg("urlmain", return_type=T.StringType())
def _urlmain(n, s):
    """host+path, no query (url_email.go:513)."""
    c = _c(n, s).cast("string")
    with_scheme = F.when(c.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), c).otherwise(F.concat(F.lit("http://"), c))
    return F.concat(F.coalesce(F.parse_url(with_scheme, F.lit("HOST")), F.lit("")), F.coalesce(F.parse_url(with_scheme, F.lit("PATH")), F.lit("")))


@_reg("urlminusqs", return_type=T.StringType())
def _urlminusqs(n, s):
    """url with one query param removed (url_email.go:550)."""
    url = _c(n, s).cast("string")
    key = _lit_str(n, 1)
    stripped = F.regexp_replace(url, rf"([?&]){re.escape(key)}=[^&]*&?", r"$1")
    return F.regexp_replace(stripped, r"[?&]$", "")


@_reg("url.matchqs", return_type=T.BooleanType())
def _url_matchqs(n, s):
    v = _qs_builder(n, s)
    return v.isNotNull()


# useragent: reference wraps the mssola/user_agent Go lib
# (url_email.go:694-856, parts bot/mobile/mozilla/platform/os/engine/
# engine_version/browser/browser_version). Ours evaluates a vendored
# uap-core regex subset (functions/uaparse.py) as pure when/rlike Column
# chains — whole-stage codegen, no UDF. "os" matches the Go lib's raw
# token (marketing-name Windows, dot-normalized Apple versions — r16
# parity); the uap-core OS FAMILY stays available as "os_family".


@_reg("useragent", return_type=T.StringType())
def _useragent(n, s):
    from . import uaparse

    c = _c(n, s).cast("string")
    part = _lit_str(n, 1) if len(n.args) > 1 else "ua_family"
    return uaparse.part_col(c, part)


@_reg("useragent.map")
def _useragent_map(n, s):
    from . import uaparse

    c = _c(n, s).cast("string")
    # the reference's 9 keys (url_email.go:845-855) + the engine's
    # historical ua_family/os_family aliases
    entries = []
    for k in uaparse.PARTS:
        entries.extend([F.lit(k), uaparse.part_col(c, k)])
    return F.create_map(*entries)


# ===========================================================================
# hashing / encoding (expr/builtins/hash_and_encode.go)
# ===========================================================================
_SIP_UDF = None


def _sip_udf():
    """Arrow-batched SipHash-2-4 UDF, created lazily (a module-level
    pandas_udf with a DDL-string return type breaks worker-side
    deserialization — no active session there to parse it)."""
    global _SIP_UDF
    if _SIP_UDF is None:

        @F.pandas_udf(T.LongType())
        def sip(col):
            import pandas as pd

            from .sip import siphash24_i64

            def one(v):
                if v is None:
                    return None
                b = str(v).encode("utf-8")
                if not b:
                    return None  # reference: empty → not-ok (hash_and_encode.go:49)
                return siphash24_i64(0, 1, b)

            return pd.Series([one(v) for v in col], dtype="Int64")

        _SIP_UDF = sip
    return _SIP_UDF


@_reg("hash", return_type=T.LongType())
def _hash(n, s):
    # EXACT SipHash-2-4 with key (0,1) — bit-for-bit the reference's
    # hash/hash.sip (hash_and_encode.go:25). Arrow-batched pandas UDF:
    # correct-but-slow path; use hash.xx64 for JVM-native scale hashing.
    c = _c(n, s)
    if isinstance(infer_dtype(n.args[0], s), T.ArrayType):
        # reference hashes the FIRST element of a slice input; try_ variant:
        # ANSI element_at would fail the whole query on an empty array where
        # the reference (and pyeval) return not-ok/None per row
        c = F.try_element_at(c, F.lit(1))
    return _sip_udf()(c.cast("string"))


func_add("hash.sip", registry["hash"].builder, is_agg=False, return_type=T.LongType())


@_reg("hash.xx64", return_type=T.LongType())
def _hash_xx64(n, s):
    # superset: stable 64-bit hash that stays in whole-stage codegen —
    # the scale-path alternative to the exact-but-Python hash.sip
    return F.xxhash64(_c(n, s))


@_reg("hash.md5", return_type=T.StringType())
def _md5(n, s):
    return F.md5(_c(n, s).cast("string"))


@_reg("hash.sha1", return_type=T.StringType())
def _sha1(n, s):
    return F.sha1(_c(n, s).cast("string"))


@_reg("hash.sha256", return_type=T.StringType())
def _sha256(n, s):
    return F.sha2(_c(n, s).cast("string"), 256)


@_reg("hash.sha512", return_type=T.StringType())
def _sha512(n, s):
    return F.sha2(_c(n, s).cast("string"), 512)


@_reg("encoding.b64encode", return_type=T.StringType())
def _b64encode(n, s):
    return F.base64(_c(n, s).cast("binary"))


@_reg("encoding.b64decode", return_type=T.StringType())
def _b64decode(n, s):
    return F.unbase64(_c(n, s).cast("string")).cast("string")


# ===========================================================================
# json (expr/builtins/json.go) — jmespath subset via get_json_object
# ===========================================================================
@_reg("json.jmespath", return_type=T.StringType())
def _jmespath(n, s):
    path = _lit_str(n, 1)
    # simple dotted paths stay JVM-side (get_json_object); genuinely
    # jmespath-y expressions (filters, projections, pipes, functions) fall
    # back to the real jmespath library via an Arrow-batched pandas UDF —
    # the documented slow path for exact parity (builtins/json.go:22)
    if not any(ch in path for ch in "[?*|@(“`") and not path.startswith("$"):
        return F.get_json_object(_c(n, s).cast("string"), "$." + path)
    if path.startswith("$"):
        return F.get_json_object(_c(n, s).cast("string"), path)
    return _jmespath_udf(path)(_c(n, s).cast("string"))


_JMESPATH_UDFS: dict[str, object] = {}


def _jmespath_udf(path: str):
    """One compiled Arrow UDF per distinct jmespath expression."""
    if path in _JMESPATH_UDFS:
        return _JMESPATH_UDFS[path]
    import json as _json

    import pandas as pd

    try:
        import jmespath

        compiled = jmespath.compile(path)
    except Exception as e:  # pragma: no cover - lib missing or bad path
        raise TranslateError(f"json.jmespath: cannot compile {path!r}: {e}")

    def run(col):
        def one(v):
            if v is None:
                return None
            try:
                out = compiled.search(_json.loads(v))
            except Exception:
                return None
            if out is None:
                return None
            return out if isinstance(out, str) else _json.dumps(out)

        return col.map(one)

    run.__annotations__ = {"col": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(run, T.StringType())
    _JMESPATH_UDFS[path] = udf
    return udf


# ===========================================================================
# misc
# ===========================================================================
@_reg("uuid", return_type=T.StringType())
def _uuid(n, s):
    return F.uuid()


@_reg("coalesce")
def _coalesce(n, s):
    return F.coalesce(*_cols(n, s))


@_reg("if")
def _if(n, s):
    return F.when(_c(n, s), _c(n, s, 1)).otherwise(_c(n, s, 2))


@_reg("concat", return_type=T.StringType())
def _concat(n, s):
    return F.concat(*[to_column(a, s).cast("string") for a in n.args])


@_reg("round")
def _round(n, s):
    digits = int(_lit_str(n, 1)) if len(n.args) > 1 else 0
    return F.round(_c(n, s), digits)


@_reg("abs")
def _abs(n, s):
    return F.abs(_c(n, s))


@_reg("floor", return_type=T.LongType())
def _floor(n, s):
    # superset convenience (no reference counterpart); long like Spark SQL
    return F.floor(_c(n, s))


@_reg("ceil", return_type=T.LongType())
def _ceil(n, s):
    return F.ceil(_c(n, s))


@_reg("epoch_us", return_type=T.LongType())
def _epoch_us(n, s):
    # epoch MICROSECONDS as bigint — superset for window/time-series
    # queries; named after DuckDB's epoch_us so oracles read identically.
    # NTZ inputs interpret as UTC wall times independent of the session tz
    # (tzutil.utc_epoch_us) — plain cast("timestamp_ltz") would shift the
    # instant under a non-UTC session
    return utc_epoch_us(_c(n, s), infer_dtype(n.args[0], s))


# ===========================================================================
# training-data pipeline builtins — SQL bridges to qlbridge_spark.datapipe
# (superset: no reference counterpart; lets the SQL surface run the same
# curation ops the Python API exposes)
# ===========================================================================
@_reg("tokencount", return_type=T.LongType())
def _tokencount(n, s):
    """tokencount(text[, mode]) — whitespace (default) or 'bpe'."""
    from ..datapipe.text import token_count as _tc

    mode = "whitespace"
    if len(n.args) > 1:
        mode = _require_str_literal(n.args[1], "tokencount mode")
    return _tc(_c(n, s), mode).cast("long")


@_reg("qualityscore", return_type=T.DoubleType())
def _qualityscore(n, s):
    from ..datapipe.text import quality_score as _qs

    return _qs(_c(n, s))


@_reg("langid", return_type=T.StringType())
def _langid(n, s):
    from ..datapipe.text import lang_id as _li

    return _li(_c(n, s))


@_reg("scrub", return_type=T.StringType())
def _scrub(n, s):
    """scrub(text[, kind, ...]) — redact email/url/ipv4 (default) or the
    named kinds (email, url, ipv4, phone)."""
    from ..datapipe.text import scrub_text as _st

    kinds = tuple(_require_str_literal(a, "scrub kind") for a in n.args[1:]) or ("email", "url", "ipv4")
    try:
        return _st(_c(n, s), kinds)
    except ValueError as exc:
        raise TranslateError(str(exc)) from None


def _require_str_literal(node, what: str) -> str:
    from ..nodes import StringNode

    if not isinstance(node, StringNode):
        raise TranslateError(f"{what} must be a string literal")
    return node.value


# ===========================================================================
# ANSI / portability batch — standard SQL names a user migrating from any
# other engine expects. Superset: none exist in the reference builtin set
# (expr/builtins/builtins.go registry). All are thin JVM-native
# pyspark.sql.functions passthroughs — zero Python in the row path.
# ===========================================================================
def _nary(fname, return_type=None, min_args=1, max_args=None):
    """Register a positional passthrough to pyspark.sql.functions.<fname>."""

    def builder(n, s, _f=getattr(F, fname), _lo=min_args, _hi=max_args, _nm=fname):
        if len(n.args) < _lo or (_hi is not None and len(n.args) > _hi):
            raise TranslateError(f"{_nm}() takes {_lo}{'+' if _hi is None else f'-{_hi}'} arguments")
        return _f(*[to_column(a, s) for a in n.args])

    func_add(fname, builder, return_type=return_type)


for _name, _rt, _lo, _hi in [
    ("nullif", None, 2, 2),
    ("greatest", None, 2, None),
    ("least", None, 2, None),
    ("trim", T.StringType(), 1, 2),
    ("ltrim", T.StringType(), 1, 2),
    ("rtrim", T.StringType(), 1, 2),
    ("lpad", T.StringType(), 2, 3),
    ("rpad", T.StringType(), 2, 3),
    ("repeat", T.StringType(), 2, 2),
    ("reverse", None, 1, 1),
    ("left", T.StringType(), 2, 2),
    ("right", T.StringType(), 2, 2),
    ("instr", T.LongType(), 2, 2),
    ("initcap", T.StringType(), 1, 1),
    ("ascii", T.LongType(), 1, 1),
    ("exp", T.DoubleType(), 1, 1),
    ("log10", T.DoubleType(), 1, 1),
    ("log2", T.DoubleType(), 1, 1),
    ("sin", T.DoubleType(), 1, 1),
    ("cos", T.DoubleType(), 1, 1),
    ("tan", T.DoubleType(), 1, 1),
    ("asin", T.DoubleType(), 1, 1),
    ("acos", T.DoubleType(), 1, 1),
    ("atan", T.DoubleType(), 1, 1),
    ("atan2", T.DoubleType(), 2, 2),
    ("degrees", T.DoubleType(), 1, 1),
    ("radians", T.DoubleType(), 1, 1),
    ("try_divide", None, 2, 2),
]:
    _nary(_name, _rt, _lo, _hi)


@_reg("substring", return_type=T.StringType())
def _substring(n, s):
    """ANSI substring(str, start[, len]) — 1-based, like Spark/DuckDB."""
    if len(n.args) not in (2, 3):
        raise TranslateError("substring(str, start[, len]) takes 2-3 arguments")
    c = to_column(n.args[0], s)
    start = to_column(n.args[1], s)
    length = to_column(n.args[2], s) if len(n.args) == 3 else F.lit(2147483647)
    return F.substring(c, start, length)


func_add("substr", registry["substring"].builder, return_type=T.StringType())
func_add("ifnull", registry["coalesce"].builder)
func_add("nvl", registry["coalesce"].builder)


@_reg("concat_ws", return_type=T.StringType())
def _concat_ws(n, s):
    if len(n.args) < 2:
        raise TranslateError("concat_ws(sep, x, ...) needs a separator and at least one value")
    sep = _require_str_literal(n.args[0], "concat_ws separator")
    return F.concat_ws(sep, *[to_column(a, s) for a in n.args[1:]])


@_reg("ln", return_type=T.DoubleType())
def _ln(n, s):
    return F.log(to_column(n.args[0], s))


@_reg("log", return_type=T.DoubleType())
def _log(n, s):
    """log(x) = natural log; log(base, x) = log in base (ANSI/DuckDB).
    F.log takes the base as a PYTHON float — a Column base is rejected,
    so require a numeric literal."""
    if len(n.args) == 1:
        return F.log(to_column(n.args[0], s))
    from ..nodes import NumberNode as _N

    if not isinstance(n.args[0], _N):
        raise TranslateError("log(base, x): base must be a numeric literal")
    return F.log(float(n.args[0].value), to_column(n.args[1], s))


@_reg("sign", return_type=T.LongType())
def _sign(n, s):
    # integer-valued like the reference convention (expr/builtins/math.go)
    # and DuckDB's sign(); Spark's signum() alone returns DOUBLE -1.0/0.0/1.0
    return F.signum(to_column(n.args[0], s)).cast("long")


@_reg("mod", return_type=None)
def _mod(n, s):
    if len(n.args) != 2:
        raise TranslateError("mod(a, b) takes two arguments")
    return to_column(n.args[0], s) % to_column(n.args[1], s)


@_reg("pi", return_type=T.DoubleType())
def _pi(n, s):
    return F.pi()


@_reg("chr", return_type=T.StringType())
def _chr(n, s):
    return F.char(to_column(n.args[0], s))


@_reg("trunc", return_type=T.DoubleType())
def _trunc(n, s):
    """Numeric truncation toward zero (Spark's trunc() is date-only)."""
    c = to_column(n.args[0], s).cast("double")
    if len(n.args) == 2:
        from ..nodes import NumberNode as _N

        if not isinstance(n.args[1], _N) or not n.args[1].is_int:
            raise TranslateError("trunc(x, d): d must be an integer literal")
        f = 10 ** int(n.args[1].value)
        scaled = c * F.lit(f)
        return F.when(scaled < 0, F.ceil(scaled)).otherwise(F.floor(scaled)) / F.lit(f)
    return (F.when(c < 0, F.ceil(c)).otherwise(F.floor(c))).cast("double")


# ---- ANSI aggregate batch (all JVM-native) --------------------------------
for _aname in [
    "covar_pop", "covar_samp",
    "bool_and", "bool_or", "any_value",
]:

    def _abuilder(n, s, _f=getattr(F, _aname), _nm=_aname):
        return _f(*[to_column(a, s) for a in n.args])

    func_add(_aname, _abuilder, is_agg=True)


for _vname, _vsamp, _vstd in [
    ("var_pop", False, False), ("var_samp", True, False),
    ("stddev_pop", False, True), ("stddev_samp", True, True),
]:

    def _vbuilder(n, s, _f=getattr(F, _vname), _samp=_vsamp, _std=_vstd):
        d = _distinct_arg(n)
        if d is not None:
            return _distinct_variance(d, s, samp=_samp, std=_std)
        return _f(to_column(n.args[0], s))

    func_add(_vname, _vbuilder, is_agg=True)


def _corr(n, s):
    """corr(x, y) — Pearson correlation, NULL when either side has zero
    variance (the DuckDB/Postgres convention; Spark's native corr
    divides 0/0 and THROWS under ANSI mode). All moments run over the
    PAIRWISE-complete rows (a NULL in either argument drops the pair —
    ANSI, and what Spark's native corr does), so both sides are guarded
    before the marginal stddevs. covar_samp/(sx*sy) equals the
    population-moment formulation on every defined input — the (n−1)
    factors cancel."""
    if len(n.args) != 2:
        raise TranslateError("corr(x, y) takes exactly two arguments")
    x, y = (to_column(a, s) for a in n.args)
    both = x.isNotNull() & y.isNotNull()
    xg, yg = F.when(both, x), F.when(both, y)
    return F.try_divide(F.covar_samp(xg, yg), F.stddev_samp(xg) * F.stddev_samp(yg))


func_add("corr", _corr, is_agg=True)


def _mode(n, s):
    """mode(x) — most frequent value, ties broken to the SMALLEST value
    (Spark's deterministic mode): stable across retries and
    partitionings, and the contract the materialized-view substate
    exposure reproduces (matview.exposed_frame)."""
    if len(n.args) != 1:
        raise TranslateError("mode(x) takes exactly one argument")
    d = _distinct_arg(n)
    if d is not None:
        # mode(DISTINCT x): every distinct value occurs once, so the
        # deterministic tie-to-smallest argmax IS the minimum
        return F.min(to_column(d, s))
    return F.mode(to_column(n.args[0], s), True)


func_add("mode", _mode, is_agg=True)

func_add("variance", registry["var_samp"].builder, is_agg=True)
func_add("every", registry["bool_and"].builder, is_agg=True)


def _ordered_collect(n, s):
    """collect_list honoring ``agg_order`` — JVM-native ordered-set
    aggregation: collect (key…, value) structs, sort_array, extract.
    All keys must share one direction (sort_array is single-direction).
    Without ORDER BY, plain collect_list (nondeterministic order, same
    as DuckDB/Postgres without WITHIN GROUP)."""
    val = to_column(n.args[0], s)
    order = getattr(n, "agg_order", None)
    if not order:
        return F.collect_list(val)
    dirs = {d for _, d in order}
    if len(dirs) > 1:
        raise TranslateError("ordered-set aggregate: all ORDER BY keys must share one direction")
    keys = [to_column(e, s) for e, _ in order]
    arr = F.sort_array(
        F.collect_list(F.struct(*[k.alias(f"k{i}") for i, k in enumerate(keys)], val.alias("v"))),
        asc=dirs == {"ASC"},
    )
    return F.transform(arr, lambda x: x["v"])


@_reg("array_agg", is_agg=True)
def _array_agg(n, s):
    return _ordered_collect(n, s)


@_reg("string_agg", is_agg=True, return_type=T.StringType())
def _string_agg(n, s):
    """string_agg(x[, sep] [ORDER BY k]) — ordered-set form is exact and
    deterministic; without ORDER BY the concatenation order is
    NONDETERMINISTIC in a distributed engine (same as DuckDB/Postgres
    without WITHIN GROUP)."""
    sep = _require_str_literal(n.args[1], "string_agg separator") if len(n.args) > 1 else ","
    if getattr(n, "agg_order", None):
        return F.array_join(_ordered_collect(n, s), sep)
    return F.string_agg(to_column(n.args[0], s), F.lit(sep))


func_add("listagg", registry["string_agg"].builder, is_agg=True, return_type=T.StringType())


@_reg("__extract_ansi", return_type=T.LongType())
def _extract_ansi(n, s):
    """ANSI ``EXTRACT(part FROM ts)`` (parser-lowered). Part numbering
    follows DuckDB/PostgreSQL: dow Sunday=0, isodow Monday=1, week = ISO
    week. BIGINT result for cross-engine hash parity."""
    part = _lit_str(n, 0).lower()
    c = _time_arg(n, s, 1)
    builders = {
        "year": F.year,
        "quarter": F.quarter,
        "month": F.month,
        "week": F.weekofyear,
        "day": F.dayofmonth,
        "dayofmonth": F.dayofmonth,
        "doy": F.dayofyear,
        "dayofyear": F.dayofyear,
        "hour": F.hour,
        "minute": F.minute,
        "second": F.second,
    }
    if part in builders:
        return builders[part](c).cast("long")
    if part == "dow":
        return (F.dayofweek(c) - 1).cast("long")
    if part == "isodow":
        return (F.weekday(c) + 1).cast("long")
    if part == "epoch":
        dt1 = infer_dtype(n.args[1], s)
        if is_ntz(dt1):
            return F.floor(utc_epoch_us(_c(n, s, 1), dt1) / F.lit(1_000_000)).cast("long")
        return F.unix_timestamp(c).cast("long")
    if part == "millisecond":
        return (F.second(c) * 1000 + (F.unix_micros(c) % 1_000_000) / 1000).cast("long")
    if part == "microsecond":
        return (F.second(c) * 1_000_000 + F.unix_micros(c) % 1_000_000).cast("long")
    raise TranslateError(f"EXTRACT: unsupported part {part!r}")


@_reg("__interval_lit")
def _interval_lit(n, s):
    """ANSI ``INTERVAL n unit`` literal (parser-lowered) → make_interval.
    Composes with +/- on timestamps/dates; fractional seconds via the
    millisecond/microsecond units."""
    qty = float(n.args[0].value)
    unit = _lit_str(n, 1).lower().rstrip("s")
    slot = {
        "year": "years", "month": "months", "week": "weeks", "day": "days",
        "hour": "hours", "minute": "mins", "min": "mins",
        "second": "secs", "sec": "secs",
    }.get(unit)
    if slot is None:
        if unit == "millisecond":
            slot, qty = "secs", qty / 1_000
        elif unit == "microsecond":
            slot, qty = "secs", qty / 1_000_000
        else:
            raise TranslateError(f"INTERVAL: unsupported unit {unit!r}")
    if slot != "secs" and qty != int(qty):
        raise TranslateError(f"INTERVAL: {unit} quantity must be an integer")
    kw = {slot: F.lit(qty if slot == "secs" else int(qty))}
    return F.make_interval(**kw)


@_reg("__bracket_index")
def _bracket_index(n, s):
    """Postfix ``base[idx]`` (parser-lowered): element_at — 1-based array
    index (negative counts from the end) or map-key lookup, out-of-range
    → NULL. DuckDB-compatible; 0-based access stays array.index()."""
    base = _c(n, s)
    idx = to_column(n.args[1], s)
    dt = infer_dtype(n.args[0], s)
    if isinstance(dt, T.ArrayType):
        idx = idx.cast("int")
    return F.try_element_at(base, idx)


# ---- ANSI date/time portability batch -------------------------------------
@_reg("current_date", return_type=T.DateType())
def _current_date(n, s):
    return F.current_date()


@_reg("current_timestamp", return_type=T.TimestampType())
def _current_timestamp(n, s):
    return F.current_timestamp()


func_add("today", registry["current_date"].builder, return_type=T.DateType())


@_reg("date_trunc", return_type=T.TimestampType())
def _date_trunc(n, s):
    """date_trunc('month', ts) — ANSI argument order (part first, like
    Spark SQL/DuckDB); NTZ-safe through _time_arg."""
    part = _lit_str(n, 0)
    return F.date_trunc(part, _time_arg(n, s, 1))


@_reg("date_add", return_type=T.DateType())
def _date_add(n, s):
    return F.date_add(_time_arg(n, s, 0).cast("date"), to_column(n.args[1], s).cast("int"))


@_reg("date_sub", return_type=T.DateType())
def _date_sub(n, s):
    return F.date_sub(_time_arg(n, s, 0).cast("date"), to_column(n.args[1], s).cast("int"))


@_reg("datediff", return_type=T.LongType())
def _datediff(n, s):
    """datediff(end, start) — whole days, Spark/MySQL argument order."""
    return F.datediff(_time_arg(n, s, 0).cast("date"), _time_arg(n, s, 1).cast("date")).cast("long")


@_reg("last_day", return_type=T.DateType())
def _last_day(n, s):
    return F.last_day(_time_arg(n, s, 0))


@_reg("add_months", return_type=T.DateType())
def _add_months(n, s):
    return F.add_months(_time_arg(n, s, 0).cast("date"), to_column(n.args[1], s).cast("int"))


@_reg("months_between", return_type=T.DoubleType())
def _months_between(n, s):
    return F.months_between(_time_arg(n, s, 0), _time_arg(n, s, 1))


@_reg("make_date", return_type=T.DateType())
def _make_date(n, s):
    return F.make_date(*[to_column(a, s).cast("int") for a in n.args[:3]])


@_reg("to_date", return_type=T.DateType())
def _to_date(n, s):
    if len(n.args) > 1:
        return F.to_date(_c(n, s), _lit_str(n, 1))
    return _time_arg(n, s, 0).cast("date")


func_add("date_part", registry["__extract_ansi"].builder, return_type=T.LongType())


# ---- ANSI/DuckDB array + regex + json name batch --------------------------
for _name, _rt, _lo, _hi in [
    ("array_contains", T.BooleanType(), 2, 2),
    ("array_distinct", None, 1, 1),
    ("array_sort", None, 1, 1),
    ("array_position", T.LongType(), 2, 2),  # 1-based, 0 = absent (Spark/DuckDB)
    ("array_remove", None, 2, 2),
    ("array_union", None, 2, 2),
    ("array_intersect", None, 2, 2),
    ("array_except", None, 2, 2),
    ("arrays_zip", None, 2, None),
    ("flatten", None, 1, 1),
    ("array_max", None, 1, 1),
    ("array_min", None, 1, 1),
    ("slice", None, 3, 3),  # slice(arr, start, len) — 1-based
]:
    _nary(_name, _rt, _lo, _hi)


@_reg("array_length", return_type=T.LongType())
def _array_length(n, s):
    return F.size(_c(n, s)).cast("long")


@_reg("regexp_matches", return_type=T.BooleanType())
def _regexp_matches(n, s):
    return _c(n, s).rlike(_lit_str(n, 1))


@_reg("regexp_replace", return_type=T.StringType())
def _regexp_replace_fn(n, s):
    """DuckDB/Postgres semantics (round-7 directive — the divergence is
    now CLOSED, not documented): replaces only the FIRST match unless the
    optional 4th ``flags`` argument contains ``g``; ``i``/``s``/``m``/
    ``x`` lower to inline Java regex flags. First-only runs JVM-side by
    wrapping the pattern as ``(prefix)(pat)(suffix)`` with lazy prefix
    and renumbering ``$N`` replacement refs (+2). Limitations (same
    plan-time literal contract as the rest of the regex builtins):
    backreferences INSIDE the pattern and ``(`` inside char classes defeat
    the group renumbering — pass 'g' for Spark-native semantics there."""
    import re as _re

    pat, rep = _lit_str(n, 1), _lit_str(n, 2)
    flags = _lit_str(n, 3) if len(n.args) > 3 else ""
    inline = "".join(ch for ch in "imsx" if ch in flags)
    if inline:
        pat = f"(?{inline}){pat}"
    if "g" in flags:
        return F.regexp_replace(_c(n, s), pat, rep)
    try:
        ngroups = _re.compile(pat).groups
    except _re.error:  # Java-only constructs — count plain '(' groups
        ngroups = len(_re.findall(r"(?<!\\)\((?!\?)", pat))
    def _shift(m):  # $0 (whole match) → the wrapped pattern group $2
        i = int(m.group(1))
        return f"${i + 2}" if i > 0 else "$2"

    shifted = _re.sub(r"\$(\d+)", _shift, rep)
    # [\s\S] instead of (?s)+dot so the user pattern's own '.' semantics
    # stay default; the suffix consumes to end-of-string, so the engine
    # performs at most one replacement
    wrapped = f"([\\s\\S]*?)({pat})([\\s\\S]*)"
    return F.regexp_replace(_c(n, s), wrapped, f"$1{shifted}${ngroups + 3}")


@_reg("regexp_extract", return_type=T.StringType())
def _regexp_extract_fn(n, s):
    grp = int(n.args[2].value) if len(n.args) > 2 else 1
    return F.regexp_extract(_c(n, s), _lit_str(n, 1), grp)


@_reg("starts_with", return_type=T.BooleanType())
def _starts_with(n, s):
    return _c(n, s).startswith(_c(n, s, 1))


@_reg("ends_with", return_type=T.BooleanType())
def _ends_with(n, s):
    return _c(n, s).endswith(_c(n, s, 1))


@_reg("array_join", return_type=T.StringType())
def _array_join(n, s):
    return F.array_join(_c(n, s), _lit_str(n, 1))


func_add("array_to_string", registry["array_join"].builder, return_type=T.StringType())
func_add("strpos", registry["instr"].builder, return_type=T.LongType())
func_add("upper", registry["toupper"].builder, return_type=T.StringType())
func_add("lower", registry["tolower"].builder, return_type=T.StringType())


@_reg("printf", return_type=T.StringType())
def _printf(n, s):
    return F.format_string(_lit_str(n, 0), *[to_column(a, s) for a in n.args[1:]])


func_add("format_string", registry["printf"].builder, return_type=T.StringType())


@_reg("json_extract", return_type=T.StringType())
def _json_extract(n, s):
    """json_extract(doc, '$.path') → get_json_object (JVM-side; the
    reference's jmespath form stays json.jmespath)."""
    return F.get_json_object(_c(n, s), _lit_str(n, 1))


func_add("json_extract_string", registry["json_extract"].builder, return_type=T.StringType())
func_add("md5", registry["hash.md5"].builder, return_type=T.StringType())
func_add("sha256", registry["hash.sha256"].builder, return_type=T.StringType())


# ---- higher-order array functions (lambda arguments) ----------------------
def _lambda_fn(lam, s):
    """Lower a LambdaNode to a Python callable over Columns: occurrences
    of the lambda params in the body substitute the runtime Columns, the
    rest of the body translates against the enclosing scope — the result
    is a Catalyst LambdaFunction, fully JVM-side."""
    from ..nodes import IdentityNode as _I
    from ..nodes import LambdaNode, SparkColNode
    from ..nodes import transform as _node_transform

    if not isinstance(lam, LambdaNode):
        raise TranslateError("expected a lambda argument: x -> expr or (acc, x) -> expr")

    def apply(cols):
        binds = {p.lower(): c for p, c in zip(lam.params, cols)}

        def sub(nd):
            if isinstance(nd, _I) and nd.parts[0].lower() in binds:
                c = binds[nd.parts[0].lower()]
                for part in nd.parts[1:]:  # struct-field access on the var
                    c = c[part]
                return SparkColNode(col=c, dtype=None, text=nd.name)
            return nd

        return to_column(_node_transform(lam.body, sub), s)

    # PySpark inspects the callable's signature — exact positional arity
    # required (no *args)
    if len(lam.params) == 1:
        return lambda x: apply([x])
    if len(lam.params) == 2:
        return lambda x, y: apply([x, y])
    raise TranslateError("lambdas take 1 or 2 parameters")


@_reg("transform")
def _hof_transform(n, s):
    return F.transform(_c(n, s), _lambda_fn(n.args[1], s))


@_reg("list_filter")
def _hof_filter(n, s):
    return F.filter(_c(n, s), _lambda_fn(n.args[1], s))


@_reg("aggregate")
def _hof_aggregate(n, s):
    """aggregate(arr, init, (acc, x) -> merge [, acc -> finish])."""
    merge = _lambda_fn(n.args[2], s)
    if len(n.args) > 3:
        return F.aggregate(_c(n, s), _c(n, s, 1), merge, _lambda_fn(n.args[3], s))
    return F.aggregate(_c(n, s), _c(n, s, 1), merge)


@_reg("zip_with")
def _hof_zip_with(n, s):
    return F.zip_with(_c(n, s), _c(n, s, 1), _lambda_fn(n.args[2], s))


@_reg("forall", return_type=T.BooleanType())
def _hof_forall(n, s):
    return F.forall(_c(n, s), _lambda_fn(n.args[1], s))


@_reg("array_exists", return_type=T.BooleanType())
def _hof_exists(n, s):
    return F.exists(_c(n, s), _lambda_fn(n.args[1], s))


func_add("list_transform", registry["transform"].builder)
func_add("array_filter", registry["list_filter"].builder)
func_add("list_reduce_init", registry["aggregate"].builder)
func_add("reduce", registry["aggregate"].builder)


# ---- struct construction + JSON export ------------------------------------
@_reg("struct")
def _struct(n, s):
    """struct(a, b, t.c) — fields named after the argument identities
    (last path part) or col0..colN for computed expressions."""
    cols = []
    for i, a in enumerate(n.args):
        name = a.parts[-1] if isinstance(a, IdentityNode) else f"col{i}"
        cols.append(to_column(a, s).alias(name))
    return F.struct(*cols)


@_reg("named_struct")
def _named_struct(n, s):
    """named_struct('k1', v1, 'k2', v2, ...) — ANSI/Spark form."""
    if len(n.args) % 2 != 0:
        raise TranslateError("named_struct takes name/value pairs")
    cols = []
    for i in range(0, len(n.args), 2):
        cols.append(to_column(n.args[i + 1], s).alias(_require_str_literal(n.args[i], "field name")))
    return F.struct(*cols)


@_reg("to_json", return_type=T.StringType())
def _to_json(n, s):
    """to_json(struct/map/array) — the parquet→JSONL export op:
    SELECT to_json(named_struct('id', id, 'text', text)) FROM docs."""
    return F.to_json(_c(n, s))
