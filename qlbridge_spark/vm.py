"""Single-record expression evaluation — API parity with the reference VM
entry points (vm.Eval /root/reference/vm/vm.go:42, vm.Matches
vm/filterqlvm.go:81, vm.EvalSql vm/sqlvm.go:17).

Fast path: a pure-Python interpreter over the same AST (pyeval.py) — no
Spark job, microseconds per record, like the reference's tree-walk VM.
Fallback: expressions using builtins without a Python twin run through the
Spark translator on a 1-row DataFrame (identical semantics by construction;
~100ms of job overhead). The two paths are golden-parity-tested against
each other in tests/test_pyeval_parity.py, so the fast path can't drift.

Batch pipelines should never loop over these — use the engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .exprparse import parse_expression
from .pyeval import PyEvalUnsupported, PyScope, py_eval
from .rel import parse_filterql, parse_sql
from .translate import Scope, to_column


def _ctx_df(spark: SparkSession, context: dict):
    return spark.createDataFrame([context])


def eval_expression(spark: SparkSession | None, text: str, context: dict):
    """vm.Eval parity: evaluate one expression against a dict context.
    Returns the value (None ≈ the reference's not-ok/nil result).

    ``spark`` may be None — only needed for the fallback path."""
    node = parse_expression(text)
    try:
        return py_eval(node, PyScope(context))
    except PyEvalUnsupported:
        if spark is None:
            raise
    df = _ctx_df(spark, context)
    return df.select(to_column(node, Scope({"_": df})).alias("v")).collect()[0][0]


def eval_many(spark: SparkSession | None, exprs: list[str], context: dict) -> list:
    """N expressions over one record; pure-Python unless any needs Spark
    (then ONE Spark job evaluates them all)."""
    nodes = [parse_expression(e) for e in exprs]
    try:
        sc = PyScope(context)
        return [py_eval(n, sc) for n in nodes]
    except PyEvalUnsupported:
        if spark is None:
            raise
    df = _ctx_df(spark, context)
    scope = Scope({"_": df})
    cols = [to_column(n, scope).alias(f"c{i}") for i, n in enumerate(nodes)]
    return list(df.select(*cols).collect()[0])


def matches(spark: SparkSession | None, context: dict, filterql_text: str, includes: dict | None = None) -> bool:
    """vm.Matches parity: does the record match the FilterQL statement?"""
    stmt = parse_filterql(filterql_text)
    inc = {}
    if includes:
        inc = {k.lower(): parse_expression(v) for k, v in includes.items()}
    try:
        return py_eval(stmt.filter, PyScope(context, includes=inc)) is True
    except PyEvalUnsupported:
        if spark is None:
            raise
    df = _ctx_df(spark, context)
    return df.filter(to_column(stmt.filter, Scope({"_": df}, includes=inc, strict=False))).count() > 0


def eval_sql(spark: SparkSession | None, sql_text: str, context: dict):
    """vm.EvalSql parity: run a single-row SELECT (projection+where) over a
    dict context; returns dict or None if the WHERE excludes the row."""
    stmt = parse_sql(sql_text)
    try:
        sc = PyScope(context)
        if stmt.where is not None and py_eval(stmt.where, sc) is not True:
            return None
        out = {}
        for c in stmt.columns:
            if not c.is_star:
                out[c.output_name] = py_eval(c.expr, sc)
        if not out:  # bare star / empty projection → all fields
            out = dict(context)
        return out
    except PyEvalUnsupported:
        if spark is None:
            raise
    df = _ctx_df(spark, context)
    scope = Scope({"_": df})
    if stmt.where is not None:
        df = df.filter(to_column(stmt.where, scope))
    cols = [to_column(c.expr, scope).alias(c.output_name) for c in stmt.columns if not c.is_star]
    if not cols:
        cols = [df[c] for c in df.columns]
    out = df.select(*cols).collect()
    return out[0].asDict() if out else None
