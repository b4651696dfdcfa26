"""Single-record expression evaluation — API parity with the reference VM
entry points (vm.Eval /root/reference/vm/vm.go:42, vm.Matches
vm/filterqlvm.go:81, vm.EvalSql vm/sqlvm.go:17).

These are convenience/compat APIs: they run a 1-row DataFrame through the
same translator the engine uses, so single-record semantics are identical
to at-scale semantics by construction. Batch pipelines should never loop
over these (that would be a driver-side row loop) — use the engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .exprparse import parse_expression
from .rel import parse_filterql, parse_sql
from .translate import Scope, to_column


def _ctx_df(spark: SparkSession, context: dict):
    return spark.createDataFrame([context])


def eval_expression(spark: SparkSession, text: str, context: dict):
    """vm.Eval parity: evaluate one expression against a dict context.
    Returns the value (None ≈ the reference's not-ok/nil result)."""
    node = parse_expression(text)
    df = _ctx_df(spark, context)
    return df.select(to_column(node, Scope({"_": df})).alias("v")).collect()[0][0]


def eval_many(spark: SparkSession, exprs: list[str], context: dict) -> list:
    """Batch variant: N expressions, one Spark job."""
    df = _ctx_df(spark, context)
    scope = Scope({"_": df})
    cols = [to_column(parse_expression(e), scope).alias(f"c{i}") for i, e in enumerate(exprs)]
    return list(df.select(*cols).collect()[0])


def matches(spark: SparkSession, context: dict, filterql_text: str, includes: dict | None = None) -> bool:
    """vm.Matches parity: does the record match the FilterQL statement?"""
    stmt = parse_filterql(filterql_text)
    df = _ctx_df(spark, context)
    inc = {}
    if includes:
        inc = {k.lower(): parse_expression(v) for k, v in includes.items()}
    return df.filter(to_column(stmt.filter, Scope({"_": df}, includes=inc, strict=False))).count() > 0


def eval_sql(spark: SparkSession, sql_text: str, context: dict):
    """vm.EvalSql parity: run a single-row SELECT (projection+where) over a
    dict context; returns dict or None if the WHERE excludes the row."""
    stmt = parse_sql(sql_text)
    df = _ctx_df(spark, context)
    scope = Scope({"_": df})
    if stmt.where is not None:
        df = df.filter(to_column(stmt.where, scope))
    cols = [to_column(c.expr, scope).alias(c.output_name) for c in stmt.columns if not c.is_star]
    if not cols:
        cols = [df[c] for c in df.columns]
    out = df.select(*cols).collect()
    return out[0].asDict() if out else None
