"""Materialized-view EXPOSURE plane: project the internal state to the
view's declared columns — substate re-aggregation (DISTINCT / sort /
mode / set-extrema / ordered collects), expose-time scalar-subquery
substitution, HAVING → windows → QUALIFY → ORDER/LIMIT in ANSI order,
and the exact-dtype cast back to the original query's schema.

Split from matview.py in round 14; matview.py re-exports everything.
See matview.py for the architecture overview."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .nodes import (
    BinaryNode,
    BooleanNode,
    CaseNode,
    FuncNode,
    IdentityNode,
    Node,
    NullNode,
    NumberNode,
    StringNode,
    UnaryNode,
    WindowNode,
)
from .rel import Column, FromSource, SqlSelect, SubqueryNode


from .matview_core import (
    _COVAR_AGGS,
    _EXTREMUM_AGGS,
    _ORDERED_AGGS,
    _PAIR_AGGS,
    _SET_EXTREMA,
    _SORT_AGGS,
    _SORT_DISTINCT,
    _SUBSTATE_AGGS,
    _VARIANCE_AGGS,
    _VARIANCE_DISTINCT,
    MatView,
    _subst,
)

def exposed_frame(mv: MatView) -> DataFrame:
    """Project the internal state to the view's declared columns, cast to
    the exact dtypes of the original query."""
    if not mv.incremental:
        return mv.internal
    if mv.expand:
        # multiset state → rows: each distinct projected tuple repeats
        # its signed-count times (O(|view|) generate, no shuffle)
        n = F.greatest(F.col("__mv_n"), F.lit(0)).cast("int")
        df = (
            mv.internal.select(
                F.explode(
                    F.array_repeat(F.struct(*[F.col(k) for k in mv.key_cols]), n)
                ).alias("__mv_r")
            ).select("__mv_r.*")
        )
        if mv.exposed_types:
            df = df.select(
                *[
                    F.col(c).cast(mv.exposed_types[c]).alias(c)
                    if c in mv.exposed_types
                    else F.col(c)
                    for c in df.columns
                ]
            )
        return df
    out = []
    for k in mv.key_cols:
        out.append(F.col(k).alias(k))
    distinct_aggs = []
    for a in mv.aggs:
        if a.kind == "count_star":
            c = F.coalesce(F.col("__mv_n"), F.lit(0))
        elif a.kind == "count":
            c = F.coalesce(F.col(a.c_col), F.lit(0))
        elif a.kind == "sum":
            c = F.when(F.col(a.c_col) > 0, F.col(a.s_col))
        elif a.kind in _EXTREMUM_AGGS:
            c = F.col(a.m_col)
        elif a.kind in _SUBSTATE_AGGS:
            distinct_aggs.append(a)
            continue  # joined in from the substate below
        elif a.kind in _VARIANCE_AGGS:
            # algebraic over CENTERED moments (shift-invariant):
            # m2 = Σ(x−z)² − (Σ(x−z))²/n, clamped ≥ 0 against ulp
            # drift; sample variants need n ≥ 2, population n ≥ 1
            n_ = F.col(a.c_col).cast("double")
            s_ = F.col(a.s_col).cast("double")
            q_ = F.col(a.q_col).cast("double")
            m2 = F.greatest(q_ - (s_ * s_) / n_, F.lit(0.0))
            if a.kind in ("var_pop", "stddev_pop"):
                c = F.when(n_ > 0, m2 / n_)
            else:
                c = F.when(n_ > 1, m2 / (n_ - 1))
            if a.kind.startswith("stddev"):
                c = F.sqrt(c)
        elif a.kind in _COVAR_AGGS:
            # bivariate centered moments: m_xy = qxy − sx·sy/n over the
            # pairwise-non-null count; corr = m_xy / sqrt(m_xx·m_yy),
            # NULL when either variance is zero — the engine's corr()
            # convention (try_divide), so exposure == recompute exactly
            n_ = F.col(a.c_col).cast("double")
            sx = F.col(a.s_col).cast("double")
            sy = F.col(a.s2_col).cast("double")
            mxy = F.col(a.qc_col).cast("double") - (sx * sy) / n_
            if a.kind == "covar_samp":
                c = F.when(n_ > 1, mxy / (n_ - 1))
            elif a.kind == "covar_pop":
                c = F.when(n_ > 0, mxy / n_)
            else:  # corr
                mxx = F.greatest(
                    F.col(a.q_col).cast("double") - (sx * sx) / n_, F.lit(0.0)
                )
                myy = F.greatest(
                    F.col(a.q2_col).cast("double") - (sy * sy) / n_, F.lit(0.0)
                )
                c = F.when(
                    (n_ > 0) & (mxx > 0) & (myy > 0), mxy / F.sqrt(mxx * myy)
                )
        else:  # avg
            c = F.when(F.col(a.c_col) > 0, F.col(a.s_col) / F.col(a.c_col))
        out.append(c.alias(a.out))
    df = mv.internal.select(*out)
    for a in distinct_aggs:
        # re-aggregate the O(|distinct values|) substate and graft the
        # column in: per-group |view|-sized join, never a base read.
        # NULL values don't count/sum (ANSI DISTINCT-agg semantics);
        # NULL group keys join null-safely (a NULL key IS a group).
        sub = mv.substates[a.d_idx].filter(F.col("__mv_dv").isNotNull())
        if a.kind in _ORDERED_AGGS:
            # ordered-set collect: the multiset's sorted support with
            # per-value repeats IS the collected sequence. NULL values
            # are kept (array_agg collects them; string_agg's
            # array_join drops them — both exactly the engine's
            # behavior) and the sort uses the SAME sort_array
            # comparator as the engine's ordered collect.
            desc = a.kind.endswith("_desc")
            fields = [F.col("__mv_dv").alias("v"), F.col("__mv_dn").alias("n")]
            if a.kind in _PAIR_AGGS:
                # pair substate: the ORDER keys lead the comparator in
                # order; ties fall through key by key to the value —
                # exactly the engine's struct(key…, value) sort_array
                # comparator
                for i in reversed(range(len(a.okey or ()))):
                    fields.insert(0, F.col(f"__mv_do{i}").alias(f"o{i}"))
            structs = F.sort_array(F.collect_list(F.struct(*fields)), asc=not desc)
            arr = F.flatten(
                F.transform(
                    structs, lambda s_: F.array_repeat(s_["v"], s_["n"].cast("int"))
                )
            )
            if a.kind.startswith("string_agg"):
                sep = a.arg2.value if a.arg2 is not None else ","
                agg_c = F.array_join(
                    F.transform(arr, lambda v: v.cast("string")), sep
                )
            else:
                agg_c = arr
            cf = (
                mv.substates[a.d_idx]
                .groupBy(*[F.col(k) for k in mv.key_cols])
                .agg(agg_c.alias(a.out))
            )
            if mv.key_cols:
                cfa = cf.select(
                    *[F.col(k).alias(f"__mvd_{k}") for k in mv.key_cols], F.col(a.out)
                )
                cond = None
                for k in mv.key_cols:
                    c = df[k].eqNullSafe(cfa[f"__mvd_{k}"])
                    cond = c if cond is None else (cond & c)
                df = df.join(cfa, cond, "left").drop(*[f"__mvd_{k}" for k in mv.key_cols])
            else:
                df = df.crossJoin(cf) if cf.columns else df
            # collect_list/array_join are never NULL, but the graft join
            # made the column nullable — coalesce with a typed empty
            # default so the exposed schema matches the recompute
            # exactly (the default never fires: every live group has
            # substate rows)
            et = (mv.exposed_types or {}).get(a.out)
            if et is not None:
                default = (
                    F.lit("")
                    if a.kind.startswith("string_agg")
                    else F.array().cast(et)
                )
                df = df.withColumn(a.out, F.coalesce(F.col(a.out), default))
            continue
        if a.kind in _SORT_AGGS or a.kind in _SORT_DISTINCT:
            # exact weighted percentile over the (value, count) multiset
            # with Spark/DuckDB linear interpolation: target index
            # t = (N−1)·p over the sorted occurrences; value v_i with
            # count c_i covers indices [cum_{i−1}, cum_i); the answer
            # interpolates between the values covering ⌊t⌋ and ⌈t⌉.
            # One window + one hash agg on the same keys (one shuffle).
            # DISTINCT variants count each distinct value ONCE (the
            # occurrence weight collapses to 1).
            from pyspark.sql.window import Window

            keys = [F.col(k) for k in mv.key_cols]
            w_part = Window.partitionBy(*keys) if mv.key_cols else Window.partitionBy(F.lit(1))
            w_ord = w_part.orderBy(F.col("__mv_dv")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            p = a.p if a.p is not None else 0.5
            occ = F.lit(1) if a.kind in _SORT_DISTINCT else F.col("__mv_dn")
            s2 = sub.withColumn("__mv_cum", F.sum(occ).over(w_ord)).withColumn(
                "__mv_t",
                (F.sum(occ).over(w_part) - F.lit(1)).cast("double") * F.lit(p),
            )
            grouped = s2.groupBy(*keys) if mv.key_cols else s2.groupBy()
            cf = grouped.agg(
                F.min(
                    F.when(
                        F.col("__mv_cum").cast("double") > F.floor(F.col("__mv_t")),
                        F.col("__mv_dv").cast("double"),
                    )
                ).alias("__mv_vlo"),
                F.min(
                    F.when(
                        F.col("__mv_cum").cast("double") > F.ceil(F.col("__mv_t")),
                        F.col("__mv_dv").cast("double"),
                    )
                ).alias("__mv_vhi"),
                F.first("__mv_t").alias("__mv_t"),
            )
            frac = F.col("__mv_t") - F.floor(F.col("__mv_t"))
            cf = cf.select(
                *[F.col(k) for k in mv.key_cols],
                (
                    F.col("__mv_vlo")
                    + (F.coalesce(F.col("__mv_vhi"), F.col("__mv_vlo")) - F.col("__mv_vlo")) * frac
                ).alias(a.out),
            )
        else:
            if a.kind == "count_distinct":
                agg_c = F.count(F.lit(1))
            elif a.kind == "sum_distinct":
                agg_c = F.sum("__mv_dv")
            elif a.kind in _SET_EXTREMA:
                # multiset-backed extrema (FULL/self-join shapes): the
                # exposed value is just the multiset's edge — deletes
                # already folded out of the substate, no repair probe
                agg_c = (F.min if a.kind == "min_set" else F.max)("__mv_dv")
            elif a.kind == "mode":
                # argmax of the occurrence counts, ties to the SMALLEST
                # value — exactly Spark's deterministic mode (which the
                # engine's mode() maps to): min over (−count, value)
                agg_c = F.min_by(
                    "__mv_dv",
                    F.struct(
                        (-F.col("__mv_dn")).alias("nc"), F.col("__mv_dv").alias("v")
                    ),
                )
            elif a.kind in _VARIANCE_DISTINCT:
                # plain variance over the substate's VALUES (the
                # distinct non-null support; occurrence counts ignored)
                base = a.kind[: -len("_distinct")]
                agg_c = {
                    "variance": F.var_samp,
                    "var_samp": F.var_samp,
                    "var_pop": F.var_pop,
                    "stddev": F.stddev_samp,
                    "stddev_samp": F.stddev_samp,
                    "stddev_pop": F.stddev_pop,
                }[base](F.col("__mv_dv").cast("double"))
            else:  # avg_distinct
                agg_c = F.avg("__mv_dv")
            cf = sub.groupBy(*[F.col(k) for k in mv.key_cols]).agg(agg_c.alias(a.out))
        if mv.key_cols:
            cfa = cf.select(
                *[F.col(k).alias(f"__mvd_{k}") for k in mv.key_cols], F.col(a.out)
            )
            cond = None
            for k in mv.key_cols:
                c = df[k].eqNullSafe(cfa[f"__mvd_{k}"])
                cond = c if cond is None else (cond & c)
            df = df.join(cfa, cond, "left").drop(*[f"__mvd_{k}" for k in mv.key_cols])
        else:
            # global aggregate: both sides are single-row
            df = df.crossJoin(cf) if cf.columns else df
        if a.kind == "count_distinct":
            df = df.withColumn(a.out, F.coalesce(F.col(a.out), F.lit(0)))
    if mv.having is not None or mv.order_exprs or mv.win_cols or mv.qualify is not None:
        from .translate import Scope, to_column

        having_n, win_n, qualify_n = mv.having, mv.win_cols, mv.qualify
        if mv.expose_subs:
            # substitute the frozen expose-time scalar-subquery values as
            # typed literals (placeholders ``__mv_es<i>`` were planted at
            # analyze time); values refresh per REFRESH — re-expose only,
            # never a state rebuild
            from .nodes import SparkColNode

            es_pairs = [
                (
                    IdentityNode((f"__mv_es{i}",)),
                    SparkColNode(col=F.lit(v).cast(dt), dtype=dt, text="(SELECT ...)"),
                )
                for i, (v, dt) in enumerate(mv.expose_vals or [])
            ]
            if having_n is not None:
                having_n = _subst(having_n, es_pairs)
            win_n = [(n, _subst(e, es_pairs)) for n, e in win_n]
            if qualify_n is not None:
                qualify_n = _subst(qualify_n, es_pairs)
        scope = Scope({"__mv_view": df})
        if having_n is not None:
            # post-aggregation filter over exposed + hidden agg columns
            df = df.filter(to_column(having_n, scope))
            scope = Scope({"__mv_view": df})
        for wname, wnode in win_n:
            # ANSI order: projection windows run AFTER HAVING, over the
            # surviving groups; in SELECT order so a later window can
            # reference an earlier one's alias
            df = df.withColumn(wname, to_column(wnode, scope))
            scope = Scope({"__mv_view": df})
        if qualify_n is not None:
            # QUALIFY filters after the windows; window exprs can't sit
            # in a Filter directly — project the predicate, then filter
            df = (
                df.withColumn("__mv_qual", to_column(qualify_n, scope).cast("boolean"))
                .filter(F.col("__mv_qual"))
                .drop("__mv_qual")
            )
            scope = Scope({"__mv_view": df})
        if mv.order_exprs:
            # top-k exposure: sort (and LIMIT/OFFSET) over the FULL
            # state — groups enter/leave the k without extra maintenance.
            # Ties resolve arbitrarily, exactly like running the query.
            from .engine import Engine

            df = df.orderBy(
                *[
                    d
                    for e, direction in mv.order_exprs
                    for d in Engine._directional(to_column(e, scope), direction)
                ]
            )
            if mv.offset:
                df = df.offset(int(mv.offset))
            if mv.limit is not None:
                df = df.limit(int(mv.limit))
    if mv.out_order and set(mv.out_order) <= set(df.columns):
        # original SELECT column order; also drops HIDDEN (HAVING-only)
        # agg columns from the exposed projection
        df = df.select(*mv.out_order)
    if mv.exposed_types:
        df = df.select(
            *[
                F.col(c).cast(mv.exposed_types[c]).alias(c) if c in mv.exposed_types else F.col(c)
                for c in df.columns
            ]
        )
    return df

