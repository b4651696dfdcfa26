"""Materialized-view STATE plane: the state-form select (signed-weight
rewrite of the view's own AST), the delta/state frames, substate
frames, merge algebra (incl. centered variance re-centering), extrema
repair, and state persistence.

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
    _DISTINCT_AGGS,
    _EXTREMUM_AGGS,
    _INCREMENTAL_AGGS,
    _ORDERED_AGGS,
    _PAIR_AGGS,
    _SET_EXTREMA,
    _SORT_AGGS,
    _SORT_DISTINCT,
    _SUBSTATE_AGGS,
    _UNSET,
    _VARIANCE_AGGS,
    _VARIANCE_DISTINCT,
    _W,
    AggSpec,
    MatView,
    NEG_FLAG,
    effective_where,
    equi_join_prune_cols,
)

def _state_select(
    mv: MatView,
    tmp_table: str,
    src_ref: str | None,
    weight: Node = _W,
    join_override: str | None = None,
) -> SqlSelect:
    """The state-form SELECT over ``tmp_table`` (which must carry the base
    columns plus a signed ``__w`` weight). Reuses the original parsed
    subtrees; aliased back to the original source ref so qualified
    identifiers in keys/args/WHERE keep resolving. ``weight`` is the
    effective per-joined-row weight expression — ``__w`` normally,
    ``__w * __dw`` when the DIM side of a join view carries its own
    signed weight (the F ⋈ ΔD term of higher-order join maintenance),
    or bare ``__dw`` for dim-side-only terms (RIGHT/FULL null
    extensions, where the fact side is empty). ``join_override``
    replaces the view's join type for this one select — the matched-part
    terms of an outer-join view evaluate under INNER semantics."""

    def nn_count(arg: Node) -> Node:
        # CASE WHEN arg IS NULL THEN 0 ELSE <weight> END
        return CaseNode(
            operand=None,
            whens=[(BinaryNode(op="IS", left=arg, right=NullNode()), NumberNode("0"))],
            default=weight,
        )

    def pos_only(arg: Node) -> Node:
        # CASE WHEN <weight> > 0 THEN arg END — extrema fold over the
        # INSERT-side rows only; delete-side rows set the group's repair
        # flag instead (a removed row can't lower a min by folding)
        return CaseNode(
            operand=None,
            whens=[(BinaryNode(op=">", left=weight, right=NumberNode("0")), arg)],
            default=None,
        )

    cols = [
        Column(expr=k, alias=name) for k, name in zip(mv.key_nodes, mv.key_cols)
    ]
    cols.append(Column(expr=FuncNode(name="sum", args=[weight]), alias="__mv_n"))
    for a in mv.aggs:
        if a.s_col and not a.z_col:
            cols.append(
                Column(
                    expr=FuncNode(name="sum", args=[BinaryNode(op="*", left=weight, right=a.arg)]),
                    alias=a.s_col,
                )
            )
        # variance/covar families (z_col set): s/q are NOT computed here
        # — raw power sums cancel catastrophically at large magnitudes.
        # The centered (s, q, z) columns are grafted on by the second
        # row-level pass in state_frame (see _variance_overlay).
        if a.c_col:
            if a.arg2 is not None:
                # pairwise count (ANSI two-arg moments: a NULL in either
                # argument drops the pair)
                probe = CaseNode(
                    operand=None,
                    whens=[
                        (BinaryNode(op="IS", left=a.arg, right=NullNode()), NullNode()),
                        (BinaryNode(op="IS", left=a.arg2, right=NullNode()), NullNode()),
                    ],
                    default=NumberNode("1"),
                )
            else:
                probe = a.arg
            cols.append(Column(expr=FuncNode(name="sum", args=[nn_count(probe)]), alias=a.c_col))
        if a.m_col:
            cols.append(
                Column(expr=FuncNode(name=a.kind, args=[pos_only(a.arg)]), alias=a.m_col)
            )
    if mv.has_extrema:
        # per-group delete marker: max(CASE WHEN <weight> < 0 THEN 1 ELSE 0 END)
        cols.append(
            Column(
                expr=FuncNode(
                    name="max",
                    args=[
                        CaseNode(
                            operand=None,
                            whens=[
                                (
                                    BinaryNode(op="<", left=weight, right=NumberNode("0")),
                                    NumberNode("1"),
                                )
                            ],
                            default=NumberNode("0"),
                        )
                    ],
                ),
                alias=NEG_FLAG,
            )
        )
    import dataclasses

    from_list = [FromSource(name=tmp_table, alias=src_ref)]
    if len(mv.select.from_) > 1:
        # incremental JOIN view: the dim FromSource (name, join type, ON
        # expr) is reused VERBATIM — the fact's temp frame is aliased
        # back to the original ref so the ON keeps resolving. A
        # join_override swaps the join type for this one select.
        d = mv.select.from_[1]
        if join_override is not None and d.join_type != join_override:
            d = dataclasses.replace(d, join_type=join_override)
        from_list.append(d)
    return SqlSelect(
        columns=cols,
        from_=from_list,
        where=effective_where(mv),
        group_by=list(mv.key_nodes),
    )


def _weight_node(dim_weighted: bool, weight_mode: str | None) -> Node:
    mode = weight_mode or ("product" if dim_weighted else None)
    if mode == "product":
        return BinaryNode(op="*", left=_W, right=IdentityNode(("__dw",)))
    if mode == "dim":
        return IdentityNode(("__dw",))
    if mode == "one":
        # full-side evaluation (initial build / full rebuild / extrema
        # repair): every OUTPUT row weighs 1 — a fact-side __w column
        # would be NULL on a dim-preserved join's null-extended rows
        return NumberNode("1")
    return _W


def _variance_row_select(
    mv: MatView,
    tmp_table: str,
    src_ref: str | None,
    weight: Node,
    join_override: str | None,
) -> SqlSelect:
    """Row-level (no GROUP BY) companion to :func:`_state_select` for
    the variance family: projects the group keys, the effective weight,
    and each variance agg's argument through the SAME FROM/WHERE/join,
    so the centered second pass sees exactly the rows the aggregated
    pass aggregates."""
    import dataclasses

    cols = [
        Column(expr=k, alias=name) for k, name in zip(mv.key_nodes, mv.key_cols)
    ]
    cols.append(Column(expr=weight, alias="__mv_vw"))
    for a in mv.aggs:
        if a.z_col and a.arg2 is not None:
            # two-arg moments: PAIRWISE-guarded projections (a NULL in
            # either argument drops the pair from every sum)
            xp = CaseNode(
                operand=None,
                whens=[(BinaryNode(op="IS", left=a.arg2, right=NullNode()), NullNode())],
                default=a.arg,
            )
            yp = CaseNode(
                operand=None,
                whens=[(BinaryNode(op="IS", left=a.arg, right=NullNode()), NullNode())],
                default=a.arg2,
            )
            cols.append(Column(expr=xp, alias=f"__mv_vx_{a.z_col}"))
            cols.append(Column(expr=yp, alias=f"__mv_vy_{a.z_col}"))
        elif a.z_col:
            cols.append(Column(expr=a.arg, alias=f"__mv_vx_{a.z_col}"))
    from_list = [FromSource(name=tmp_table, alias=src_ref)]
    if len(mv.select.from_) > 1:
        d = mv.select.from_[1]
        if join_override is not None and d.join_type != join_override:
            d = dataclasses.replace(d, join_type=join_override)
        from_list.append(d)
    return SqlSelect(columns=cols, from_=from_list, where=effective_where(mv))


def _apply_variance_overlay(engine, mv: MatView, out: DataFrame, rowsel: SqlSelect) -> DataFrame:
    """Graft centered variance state (s = Σw(x−z), q = Σw(x−z)², z =
    the group's min x) onto the aggregated state frame ``out``. The
    shift is subtracted BEFORE squaring — the whole point: x² at
    epoch-millis magnitude has ulp ≈ 3e8, so raw power sums cannot be
    repaired after the fact. One window + one hash agg over the same
    keys (Catalyst reuses the partitioning), only paid by variance
    views, only over the delta."""
    from functools import reduce

    from pyspark.sql.window import Window

    rows = engine._select_any(rowsel)
    vaggs = [a for a in mv.aggs if a.z_col]
    keys = [F.col(k) for k in mv.key_cols]
    win = Window.partitionBy(*keys) if mv.key_cols else Window.partitionBy(F.lit(1))
    aggexprs = []
    for a in vaggs:
        x = F.col(f"__mv_vx_{a.z_col}")
        z = F.min(x).over(win)
        d = (x - z).cast("double")
        w_ = F.col("__mv_vw").cast("double")
        rows = rows.withColumn(f"__mv_ts_{a.z_col}", w_ * d)
        if a.arg2 is not None:
            # bivariate centered sums: both args already pairwise-guarded
            # in the row select, so every term is NULL (excluded from
            # the sums) unless BOTH are present
            y = F.col(f"__mv_vy_{a.z_col}")
            zy = F.min(y).over(win)
            dy = (y - zy).cast("double")
            rows = rows.withColumn(f"__mv_ts2_{a.z_col}", w_ * dy).withColumn(
                f"__mv_tqc_{a.z_col}", w_ * d * dy
            )
            aggexprs += [
                F.sum(f"__mv_ts_{a.z_col}").alias(a.s_col),
                F.sum(f"__mv_ts2_{a.z_col}").alias(a.s2_col),
                F.sum(f"__mv_tqc_{a.z_col}").alias(a.qc_col),
                F.min(x).cast("double").alias(a.z_col),
                F.min(y).cast("double").alias(a.z2_col),
            ]
            if a.q_col:  # corr: per-side second moments too
                rows = rows.withColumn(f"__mv_tq_{a.z_col}", w_ * d * d).withColumn(
                    f"__mv_tq2_{a.z_col}", w_ * dy * dy
                )
                aggexprs += [
                    F.sum(f"__mv_tq_{a.z_col}").alias(a.q_col),
                    F.sum(f"__mv_tq2_{a.z_col}").alias(a.q2_col),
                ]
            continue
        rows = rows.withColumn(f"__mv_tq_{a.z_col}", w_ * d * d)
        aggexprs += [
            F.sum(f"__mv_ts_{a.z_col}").alias(a.s_col),
            F.sum(f"__mv_tq_{a.z_col}").alias(a.q_col),
            F.min(x).cast("double").alias(a.z_col),
        ]
    vf = rows.groupBy(*keys).agg(*aggexprs) if mv.key_cols else rows.groupBy().agg(*aggexprs)
    if not mv.key_cols:
        return out.crossJoin(vf)
    renamed = vf.select(
        *[F.col(k).alias(f"__mvv_{k}") for k in mv.key_cols],
        *[
            F.col(c)
            for a in vaggs
            for c in (a.s_col, a.q_col, a.z_col, a.s2_col, a.q2_col, a.qc_col, a.z2_col)
            if c
        ],
    )
    cond = reduce(
        lambda acc, k: acc & F.col(k).eqNullSafe(F.col(f"__mvv_{k}")),
        mv.key_cols[1:],
        F.col(mv.key_cols[0]).eqNullSafe(F.col(f"__mvv_{mv.key_cols[0]}")),
    )
    return out.join(renamed, cond, "left").drop(*[f"__mvv_{k}" for k in mv.key_cols])


def state_frame(
    engine,
    mv: MatView,
    base_df: DataFrame,
    weight,
    dim_df: DataFrame | None = None,
    dim_weighted: bool = False,
    weight_mode: str | None = None,
    join_override: str | None = None,
) -> DataFrame:
    """Run the state select over ``base_df`` (+ a ``__w`` column). The
    frame registers under a reserved temp name for the duration of the
    engine select — same pipeline, same semantics as the original query.

    Join views: ``dim_df`` temporarily overrides what the dim table name
    resolves to (``engine.tables`` wins over sinks) — used to PIN the dim
    snapshot during a refresh, and to substitute the dim DELTA for the
    F ⋈ ΔD term of higher-order maintenance. With ``dim_weighted`` (or
    ``weight_mode='product'``) the dim frame must carry a signed
    ``__dw`` column and the effective row weight becomes ``__w * __dw``
    (a dim delete joined to a +1 fact row nets −1, exactly the
    signed-multiset algebra); ``weight_mode='dim'`` uses bare ``__dw``
    for dim-side-only terms where the fact side is empty (RIGHT/FULL
    null extensions). ``join_override`` evaluates this one select under
    a different join type (the matched-part terms of outer-join views
    run INNER)."""
    src = mv.select.from_[0]
    tmp = f"__mv_src_{id(mv) & 0xFFFFFF:x}"
    w_node = _weight_node(dim_weighted, weight_mode)
    stmt = _state_select(
        mv, tmp, src.alias or src.name, weight=w_node, join_override=join_override
    )
    engine.tables[tmp] = base_df.withColumn("__w", weight)
    saved = _UNSET
    if dim_df is not None:
        saved = engine.tables.get(mv.dim, _UNSET)
        engine.tables[mv.dim] = dim_df
    try:
        out = engine._select_any(stmt)
        if any(a.z_col for a in (mv.aggs or [])):
            out = _apply_variance_overlay(
                engine,
                mv,
                out,
                _variance_row_select(
                    mv, tmp, src.alias or src.name, w_node, join_override
                ),
            )
        return out
    finally:
        engine.tables.pop(tmp, None)
        if dim_df is not None:
            if saved is _UNSET:
                engine.tables.pop(mv.dim, None)
            else:
                engine.tables[mv.dim] = saved


def _sub_select(
    mv: MatView,
    a: AggSpec,
    tmp_table: str,
    src_ref: str | None,
    weight: Node = _W,
    join_override: str | None = None,
) -> SqlSelect:
    """The substate SELECT for one DISTINCT agg: (group keys, value) →
    signed occurrence count. Shares the view's FROM/WHERE (and join)
    verbatim, so it runs through the same pipeline as the main state."""
    import dataclasses

    cols = [
        Column(expr=k, alias=name) for k, name in zip(mv.key_nodes, mv.key_cols)
    ]
    # the value may BE a group key (min_set(d.dname) grouped by d.dname;
    # count(DISTINCT g) grouped by g): grouping by the keys alone is
    # then equivalent, and projecting the same expr under two aliases
    # would collide (the engine names both after the key) — skip the
    # value column here; sub_state_frames re-adds __mv_dv as a copy of
    # the exposed key column.
    if a.arg not in mv.key_nodes:
        cols.append(Column(expr=a.arg, alias="__mv_dv"))
    for i, ok in enumerate(a.okey or ()):
        # pair substate: every ORDER key is part of the grain
        if ok not in mv.key_nodes and ok != a.arg:
            cols.append(Column(expr=ok, alias=f"__mv_do{i}"))
    cols.append(Column(expr=FuncNode(name="sum", args=[weight]), alias="__mv_dn"))
    from_list = [FromSource(name=tmp_table, alias=src_ref)]
    if len(mv.select.from_) > 1:
        d = mv.select.from_[1]
        if join_override is not None and d.join_type != join_override:
            d = dataclasses.replace(d, join_type=join_override)
        from_list.append(d)
    group_by = list(mv.key_nodes)
    if a.arg not in group_by:
        group_by.append(a.arg)
    for ok in a.okey or ():
        if ok not in group_by:
            group_by.append(ok)
    return SqlSelect(
        columns=cols,
        from_=from_list,
        where=effective_where(mv),
        group_by=group_by,
    )


def sub_state_frames(
    engine,
    mv: MatView,
    base_df: DataFrame,
    weight,
    dim_df: DataFrame | None = None,
    dim_weighted: bool = False,
    weight_mode: str | None = None,
    join_override: str | None = None,
) -> list[DataFrame]:
    """One substate frame per DISTINCT agg over ``base_df`` (+ ``__w``),
    in ``AggSpec.d_idx`` order. Same source/dim/weight/join plumbing as
    :func:`state_frame`."""
    src = mv.select.from_[0]
    tmp = f"__mv_src_{id(mv) & 0xFFFFFF:x}"
    w_node = _weight_node(dim_weighted, weight_mode)
    engine.tables[tmp] = base_df.withColumn("__w", weight)
    saved = _UNSET
    if dim_df is not None:
        saved = engine.tables.get(mv.dim, _UNSET)
        engine.tables[mv.dim] = dim_df
    try:
        out = []
        for a in mv.aggs:
            if a.kind not in _SUBSTATE_AGGS:
                continue
            f = engine._select_any(
                _sub_select(
                    mv, a, tmp, src.alias or src.name,
                    weight=w_node, join_override=join_override,
                )
            )
            if a.arg in mv.key_nodes:
                # value == group key: _sub_select skipped the duplicate
                # projection; re-add __mv_dv as a copy of the key column
                f = f.withColumn(
                    "__mv_dv", F.col(mv.key_cols[mv.key_nodes.index(a.arg)])
                )
            for i, ok in enumerate(a.okey or ()):
                if f"__mv_do{i}" not in f.columns:
                    # order key == a group key (constant per group) or
                    # == the value: re-add the grain column as a copy
                    f = f.withColumn(
                        f"__mv_do{i}",
                        F.col(mv.key_cols[mv.key_nodes.index(ok)])
                        if ok in mv.key_nodes
                        else F.col("__mv_dv"),
                    )
            out.append(f)
        return out
    finally:
        engine.tables.pop(tmp, None)
        if dim_df is not None:
            if saved is _UNSET:
                engine.tables.pop(mv.dim, None)
            else:
                engine.tables[mv.dim] = saved


def merge_substates(
    mv: MatView, substates: list[DataFrame], deltas: list[DataFrame]
) -> list[DataFrame]:
    """Fold signed substate deltas: one union + hash agg per DISTINCT
    agg, grained by (keys, value); values whose occurrence count reaches
    zero drop out — O(|substate| + |delta|), never the base."""
    out = []
    subs = [a for a in mv.aggs if a.d_idx is not None]
    for a, old, delta in zip(subs, substates, deltas):
        grain = list(mv.key_cols)
        if a.kind in _PAIR_AGGS:
            # pair substate keeps the (order-keys…, value) pairing
            grain.extend(f"__mv_do{i}" for i in range(len(a.okey or ())))
        grain.append("__mv_dv")
        merged = (
            old.unionByName(delta)
            .groupBy(*grain)
            .agg(F.sum("__mv_dn").alias("__mv_dn"))
            .filter(F.col("__mv_dn") > 0)
        )
        out.append(merged)
    return out


_STATE_COLS = lambda mv: ["__mv_n"] + [  # noqa: E731
    c
    for a in mv.aggs
    for c in (a.s_col, a.q_col, a.c_col, a.s2_col, a.q2_col, a.qc_col)
    if c
]


def merge_state(mv: MatView, internal: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a signed delta into the stored state: union + ONE hash
    aggregation on the keys. Vanished groups (row count 0) drop out —
    unless the view is a global aggregate, whose single row is kept
    (ANSI: a global agg over an empty relation still returns one row).
    Sum-shaped state folds with sum; extremum state folds with min/max
    over the insert-side candidates, carrying the delta's per-group
    delete flag forward so repair_extrema can re-aggregate exactly the
    groups whose stored extremum may have been removed."""
    states = _STATE_COLS(mv)
    folds = [F.sum(c).alias(c) for c in states]
    for a in mv.aggs:
        if a.m_col:
            folds.append((F.min if a.kind == "min" else F.max)(a.m_col).alias(a.m_col))
    if mv.has_extrema:
        internal = internal.withColumn(NEG_FLAG, F.lit(0))
        folds.append(F.max(NEG_FLAG).alias(NEG_FLAG))
    vaggs = [a for a in mv.aggs if a.z_col]
    for a in vaggs:
        # a state persisted before the centered encoding lacks z — a
        # NULL shift reads as raw sums (shift 0), which is exact
        if a.z_col not in internal.columns:
            internal = internal.withColumn(a.z_col, F.lit(None).cast("double"))
        if a.z_col not in delta.columns:
            delta = delta.withColumn(a.z_col, F.lit(None).cast("double"))
        folds.append(F.min(a.z_col).alias(a.z_col))
        if a.z2_col:
            folds.append(F.min(a.z2_col).alias(a.z2_col))
    u = internal.unionByName(delta)
    if vaggs:
        # re-center every contribution to the group's common shift
        # Z = min over contributing shifts BEFORE the additive fold:
        # Σw(x−Z) = s + (z−Z)·c, Σw(x−Z)² = q + 2(z−Z)·s + (z−Z)²·c —
        # exact algebra (c is the signed non-null count, so net-zero
        # groups re-center correctly too). Window + groupBy share the
        # key partitioning: one shuffle. A row "has data" iff s is
        # non-null (all-NULL-arg groups contribute nothing).
        from pyspark.sql.window import Window

        win = (
            Window.partitionBy(*[F.col(k) for k in mv.key_cols])
            if mv.key_cols
            else Window.partitionBy(F.lit(1))
        )
        for a in vaggs:
            data = F.col(a.s_col).isNotNull()
            zeff = F.coalesce(F.col(a.z_col), F.lit(0.0))
            big_z = F.min(F.when(data, zeff)).over(win)
            d = zeff - big_z
            c_ = F.coalesce(F.col(a.c_col), F.lit(0)).cast("double")
            s_ = F.col(a.s_col)
            if a.arg2 is not None:
                # bivariate re-centering to the common shifts (Zx, Zy):
                # Σw(x−Zx)(y−Zy) = qxy + dx·sy + dy·sx + dx·dy·c, with
                # the per-side second moments re-centering exactly like
                # the univariate case — all formulas use the ORIGINAL
                # sx/sy, staged via temp columns before the overwrite
                zeff2 = F.coalesce(F.col(a.z2_col), F.lit(0.0))
                big_z2 = F.min(F.when(data, zeff2)).over(win)
                d2 = zeff2 - big_z2
                s2_ = F.col(a.s2_col)
                u = u.withColumn(
                    "__mv_tqc",
                    F.col(a.qc_col) + d * s2_ + d2 * s_ + d * d2 * c_,
                ).withColumn("__mv_ts", s_ + d * c_).withColumn(
                    "__mv_ts2", s2_ + d2 * c_
                )
                if a.q_col:
                    u = u.withColumn(
                        "__mv_tq", F.col(a.q_col) + 2.0 * d * s_ + d * d * c_
                    ).withColumn(
                        "__mv_tq2", F.col(a.q2_col) + 2.0 * d2 * s2_ + d2 * d2 * c_
                    ).withColumn(
                        a.q_col, F.when(data, F.col("__mv_tq"))
                    ).withColumn(a.q2_col, F.when(data, F.col("__mv_tq2")))
                u = (
                    u.withColumn(a.qc_col, F.when(data, F.col("__mv_tqc")))
                    .withColumn(a.s_col, F.when(data, F.col("__mv_ts")))
                    .withColumn(a.s2_col, F.when(data, F.col("__mv_ts2")))
                    .withColumn(a.z_col, F.when(data, big_z))
                    .withColumn(a.z2_col, F.when(data, big_z2))
                    .drop("__mv_ts", "__mv_ts2", "__mv_tq", "__mv_tq2", "__mv_tqc")
                )
                continue
            q_ = F.col(a.q_col)
            u = (
                u.withColumn("__mv_tq", q_ + 2.0 * d * s_ + d * d * c_)
                .withColumn("__mv_ts", s_ + d * c_)
                .withColumn(a.s_col, F.when(data, F.col("__mv_ts")))
                .withColumn(a.q_col, F.when(data, F.col("__mv_tq")))
                .withColumn(a.z_col, F.when(data, big_z))
                .drop("__mv_ts", "__mv_tq")
            )
    merged = u.groupBy(*[F.col(k) for k in mv.key_cols]).agg(*folds)
    if mv.key_cols:
        merged = merged.filter(F.col("__mv_n") > 0)
    else:
        # global agg: sum over zero input rows is NULL; re-zero the count
        merged = merged.withColumn("__mv_n", F.coalesce(F.col("__mv_n"), F.lit(0)))
    return merged


def _semi_by_keys(engine, frame: DataFrame, ref: str, mv: MatView, stale_keys):
    """Rows of ``frame`` (aliased ``ref``) whose group-key exprs match a
    stale key (null-safe — a NULL key IS a group)."""
    from functools import reduce

    from .translate import Scope, to_column

    scope = Scope({ref: frame}, includes=engine.includes)
    probe = frame
    conds = []
    for k, name in zip(mv.key_nodes, mv.key_cols):
        probe = probe.withColumn(f"__mv_k_{name}", to_column(k, scope))
        conds.append(F.col(f"__mv_k_{name}").eqNullSafe(F.col(f"__sk.{name}")))
    return probe.join(
        F.broadcast(stale_keys.alias("__sk")),
        on=reduce(lambda a, b: a & b, conds),
        how="left_semi",
    ).drop(*[f"__mv_k_{n}" for n in mv.key_cols])


def repair_extrema(
    engine,
    mv: MatView,
    merged: DataFrame,
    base_version: int,
    dim_version: int | None = None,
) -> DataFrame:
    """Re-aggregate the groups a delete touched (their stored min/max is
    non-foldable: the reigning extremum may be the removed row) from the
    base snapshot, and graft the fresh state over the folded one. The
    change feed names EXACTLY which groups — the base read is a
    key-semi-joined scan, O(affected groups' rows), never O(base) unless
    the view is a global aggregate (one group = the whole table; that
    recompute cost is inherent, and only paid when a delete occurred).

    ``extrema_side`` picks the probe relation: ``'fact'`` (default)
    semi-joins stale group keys against the fact snapshot and re-runs
    the view's join over the pruned facts; ``'dim'`` (INNER/RIGHT views
    whose group keys live on the dim side) prunes the DIM rows instead
    and re-runs the join with the dim SUBSTITUTED — correct because on
    a dim-preserved or inner join, the pruned dim's output is exactly
    the stale groups' rows. With a plain equi key the fact scan is
    additionally semi-pruned to the stale dim rows' join keys."""
    clean = merged.filter(F.col(NEG_FLAG) == 0).drop(NEG_FLAG)
    stale_keys = merged.filter(F.col(NEG_FLAG) > 0).select(*mv.key_cols)
    if not stale_keys.limit(1).count():
        return clean  # no delete touched any surviving group
    base = engine.sinks[mv.base].scan(engine.spark, version=base_version)
    dim_df = None
    if mv.key_cols and mv.extrema_side == "dim":
        dsink = engine.sinks[mv.dim]
        dim_frame = dsink.scan(
            engine.spark,
            version=dim_version if dim_version is not None else max(dsink.versions()),
        )
        d = mv.select.from_[1]
        dim_df = _semi_by_keys(engine, dim_frame, d.alias or d.name, mv, stale_keys)
        pj = equi_join_prune_cols(
            mv,
            {c.lower() for c in base.columns},
            {c.lower() for c in dim_frame.columns},
        )
        if pj is not None:
            fact_col, dim_col = pj
            jk = dim_df.select(F.col(dim_col).alias("__mv_jk")).distinct()
            base = base.join(
                F.broadcast(jk), base[fact_col] == jk["__mv_jk"], "left_semi"
            )
    elif mv.key_cols:
        src = mv.select.from_[0]
        base = _semi_by_keys(engine, base, src.alias or src.name, mv, stale_keys)
    fresh = state_frame(
        engine, mv, base, F.lit(1), dim_df=dim_df, weight_mode="one"
    ).drop(NEG_FLAG)
    if not mv.key_cols:
        return fresh  # global aggregate: the one group IS the recompute
    return clean.unionByName(fresh)




def persist_state(mv: MatView, state: DataFrame) -> DataFrame:
    """Durably store the new state and return the frame to read it back
    from: the state sink when configured (a new committed version per
    refresh — the view itself is time-travelable), else a
    localCheckpoint (cuts lineage so chained refreshes stay O(1) deep)."""
    if mv.state_sink is not None:
        if getattr(mv.state_sink, "_version", lambda: -1)() < 0:
            mv.state_sink.ensure(state)
        else:
            mv.state_sink.overwrite(state)
        return mv.state_sink.scan(mv.state_sink.spark)
    return state.localCheckpoint(eager=True)


def persist_substates(mv: MatView, frames: list[DataFrame]) -> list[DataFrame]:
    """Durably store the DISTINCT-agg substates (sibling sinks when the
    view was created WITH {"path"}, else localCheckpoints) and return
    the frames to read them back from — mirror of :func:`persist_state`
    for the two-level state."""
    if not mv.sub_sinks:
        return [f.localCheckpoint(eager=True) for f in frames]
    out = []
    for sink, f in zip(mv.sub_sinks, frames):
        if getattr(sink, "_version", lambda: -1)() < 0:
            sink.ensure(f)
        else:
            sink.overwrite(f)
        out.append(sink.scan(sink.spark))
    return out
