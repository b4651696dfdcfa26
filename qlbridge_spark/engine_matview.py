"""Materialized-view statements (split verbatim from engine.py).

CREATE MATERIALIZED VIEW, REFRESH [ALL], the shared multi-view feed
cache, and the ON-COMMIT auto-refresh hook; the incremental algebra
itself lives in matview.py. Mixed into Engine; see engine.py for the
statement pipeline."""

from __future__ import annotations

from pyspark.sql import Column as SparkColumn
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import functions as funcs
from .errors import ExecError
from .nodes import (
    BinaryNode,
    BooleanNode,
    BoolNode,
    FuncNode,
    IdentityNode,
    Node,
    NumberNode,
    StringNode,
    UnaryNode,
    WindowNode,
    transform,
)
from .rel import (
    Column,
    FromSource,
    SqlCreate,
    SqlDelete,
    SqlInsert,
    SqlMerge,
    SqlOptimize,
    SqlRefresh,
    SqlRestore,
    SqlSelect,
    SqlSetOp,
    SqlUpdate,
    SqlVacuum,
    SqlCopy,
    SubqueryNode,
    parse_sql,
)
from .translate import Scope, TranslateError, to_column


def _scalar_vals_eq(fresh, old):
    """NaN-aware list equality for frozen scalar-subquery values: a
    NaN-valued scalar (e.g. avg over all-NaN data) compares equal to
    itself so an unchanged value never forces a full state rebuild."""
    if len(fresh) != len(old):
        return False
    for a, b in zip(fresh, old):
        if a is None and b is None:
            continue
        if isinstance(a, float) and isinstance(b, float) and a != a and b != b:
            continue  # NaN == NaN for freeze-and-verify purposes
        if a != b:
            return False
    return True


class MatViewMixin:
    def _create_matview(self, c: SqlCreate):
        """CREATE MATERIALIZED VIEW — materialize the query and, when it
        fits the signed-delta algebra over a versioned-sink base
        (matview.analyze), store it in incremental STATE form so REFRESH
        consumes only the change feed. ``WITH {"path": "..."}`` persists
        the state in a ParquetMergeSink (durable + versioned) instead of
        a localCheckpoint."""
        from .matview import MatView, analyze, exposed_frame, persist_state, state_frame

        if c.select is None:
            raise ExecError("CREATE MATERIALIZED VIEW requires AS SELECT")
        lname = c.ident.lower()
        if c.if_not_exists and lname in self.mat_views:
            return None
        mv = analyze(self, c.select) if isinstance(c.select, SqlSelect) else None
        if mv is not None and mv.scalar_subs:
            # freeze-and-verify: pin the uncorrelated scalar-subquery
            # values now; every refresh re-evaluates (bounded single-row
            # jobs) and folds incrementally only while they hold.
            # Evaluation raising = correlated or non-scalar → full MV.
            from .matview import apply_scalar_subs, eval_scalar_subs

            try:
                apply_scalar_subs(mv, eval_scalar_subs(self, mv))
            except (ExecError, TranslateError):
                mv = None
        if mv is not None and mv.expose_subs:
            # expose-time scalars (SELECT-list / HAVING / QUALIFY): pin
            # the values; a later refresh that finds them moved only
            # RE-EXPOSES (O(|view|)) — never a state rebuild.
            from .matview import eval_scalar_subs

            try:
                mv.expose_vals = eval_scalar_subs(self, mv, mv.expose_subs)
            except (ExecError, TranslateError):
                mv = None
        if mv is not None and mv.in_table:
            # correlation probe (analysis only, no job): a subquery
            # referencing the OUTER table's columns raises here and the
            # view falls back to the engine's correlated-IN execution
            # as a full-recompute MV. The correlated-scalar shape probes
            # its DECORRELATED grouped query (the correlation was split
            # out at analysis, so a clean probe means the rewrite bound
            # every identifier).
            try:
                self._select_any(mv.in_select or mv.csc_select).schema
                if mv.in2_select is not None:
                    self._select_any(mv.in2_select).schema
                if mv.csc_empty is not None:
                    self._select_any(mv.csc_empty).schema
            except (ExecError, TranslateError):
                mv = None
        if mv is None:
            mv = MatView(name=lname, select=c.select)
        mv.name = lname
        # the trailing WITH {...} config map parses onto the SELECT itself
        # (reference grammar); accept it from either position
        with_cfg = dict(getattr(c.select, "with_", None) or {})
        with_cfg.update(c.with_ or {})
        path = with_cfg.get("path")
        if path:
            from .sinks import ParquetMergeSink

            mv.state_sink = ParquetMergeSink(
                self.spark, str(path), key=mv.key_cols[0] if mv.key_cols else "__mv_n"
            )
            if mv.incremental and mv.has_distinct:
                # durable substates: one sibling sink per DISTINCT agg
                mv.sub_sinks = [
                    ParquetMergeSink(
                        self.spark, f"{path}__d{a.d_idx}", key="__mv_dv"
                    )
                    for a in mv.aggs
                    if a.d_idx is not None
                ]
        if mv.incremental:
            from .matview import persist_substates, sub_state_frames

            sink = self.sinks[mv.base]
            mv.base_version = max(sink.versions())
            if mv.dim:
                mv.dim_version = max(self.sinks[mv.dim].versions())
            if mv.in_table:
                mv.in_version = max(self.sinks[mv.in_table].versions())
            if mv.in2_table:
                mv.in2_version = max(self.sinks[mv.in2_table].versions())
            # exposed dtypes from the ORIGINAL query's analyzed schema
            # (analysis only — no job): incremental refreshes cast back to
            # these, so the view stays schema-identical to a recompute
            mv.exposed_types = {
                f.name: f.dataType for f in self._select_any(c.select).schema.fields
            }
            base_df = sink.scan(self.spark, version=mv.base_version)
            if mv.in_table:
                from .matview import csc_filter, in_membership_filter

                if mv.csc_pred is not None:
                    base_df = csc_filter(self, mv, base_df)
                else:
                    base_df = in_membership_filter(self, mv, base_df)
                    if mv.in2_table:
                        base_df = in_membership_filter(self, mv, base_df, ctx=2)
            # the delete-repair flag is delta-only state; never persisted
            mv.internal = persist_state(
                mv, state_frame(self, mv, base_df, F.lit(1), weight_mode="one").drop("__mv_neg")
            )
            if mv.has_distinct:
                mv.substates = persist_substates(
                    mv, sub_state_frames(self, mv, base_df, F.lit(1), weight_mode="one")
                )
        else:
            mv.internal = persist_state(mv, self._select_any(c.select))
        self.mat_views[lname] = mv
        self.register_df(lname, exposed_frame(mv))
        return None

    _REFRESH_REPORT_SCHEMA = "view string, mode string, from_version long, to_version long"

    def _refresh(self, r: SqlRefresh) -> DataFrame:
        """REFRESH [ALL] MATERIALIZED VIEW[S] — incremental when possible;
        one report row per refreshed view naming the mode that ran. ALL
        refreshes every registered view through a shared feed cache, so N
        views over one base plan (and read) that base's backlog ONCE."""
        if r.all_views:
            rows = self._refresh_views(list(self.mat_views), full=r.full)
            return self.spark.createDataFrame(rows, self._REFRESH_REPORT_SCHEMA)
        return self.spark.createDataFrame(
            [self._refresh_one(r.view, r.full, None)], self._REFRESH_REPORT_SCHEMA
        )

    def _refresh_views(self, names: list, full: bool = False) -> list:
        """Refresh ``names`` in order, planning each base/dim table's
        change backlog ONCE: the feed cache keys on (table, checkpoint
        version), and a feed that more than one view will fold is
        materialized (localCheckpoint) so the second consumer reads the
        captured delta instead of re-reading the recordings. Returns the
        report rows."""
        from collections import Counter

        shared: Counter = Counter()
        for n in names:
            mv = self.mat_views.get(n)
            if mv is not None and mv.incremental and not full:
                shared[(mv.base, mv.base_version)] += 1
                if mv.dim:
                    shared[(mv.dim, mv.dim_version)] += 1
        cache = {"shared": {k for k, c in shared.items() if c > 1}, "feeds": {}}
        return [self._refresh_one(n, full, cache) for n in names]

    def _changes_since_cached(self, cache, table: str, after: int):
        """changes_since through the shared multi-view feed cache (None →
        direct). Cached per (table, checkpoint); feeds expected by more
        than one view are materialized once, caught-up (empty) feeds are
        not worth a checkpoint job."""
        if cache is None:
            return self.changes_since(table, after)
        key = (table, after)
        hit = cache["feeds"].get(key)
        if hit is None:
            changes, cur = self.changes_since(table, after)
            if key in cache["shared"] and cur != after:
                changes = changes.localCheckpoint(eager=True)
            hit = cache["feeds"][key] = (changes, cur)
        return hit

    def _maybe_auto_refresh(self, table: str) -> None:
        """ON-COMMIT materialized-view maintenance: after a DML commit on
        a versioned sink, when ``SET matview.auto_refresh = true``, fold
        the commit's delta into every registered view whose base OR dim
        is that table — the per-commit delta is tiny (O(changes)), so the
        views stay query-consistent with no explicit REFRESH. Views
        sharing the table plan the backlog once (shared feed cache). The
        refresh reads a pinned version window, so a concurrent writer
        committing mid-refresh just leaves a later delta for the next
        hook invocation."""
        flag = self.session_vars.get("matview.auto_refresh")
        if isinstance(flag, str):
            flag = flag.strip().lower() in ("true", "1", "on", "yes")
        if not flag or getattr(self, "_auto_refreshing", False):
            return
        t = table.lower()
        names = [
            n
            for n, mv in self.mat_views.items()
            if t in (mv.base, mv.dim, mv.in_table, mv.in2_table)
        ]
        if not names:
            return
        self._auto_refreshing = True
        try:
            self._refresh_views(names)
        finally:
            self._auto_refreshing = False

    def _in_sub_terms(self, mv, changes, w, in_changes, i_cur) -> list:
        """Signed delta inputs for an IN-subquery view (``k IN (SELECT v
        FROM s ...)``), with the subquery's table PINNED at ``i_cur``:

          T_a = ΔF ⋉ M_new            (fact delta, membership-filtered)
          T_b = F_old ⋉ flip_in  (+1) (keys whose match count rose 0→>0)
          T_c = F_old ⋉ flip_out (−1) (keys whose match count fell >0→0)

        Identity: state = Σ_{f∈F}[k(f) ∈ M(s)], so
        Δstate = Σ_{ΔF}[k ∈ M_new] + Σ_{F_old}([k ∈ M_new] − [k ∈ M_old]).
        The flip set is computed from s's change feed alone: Δm per value
        from the signed feed, m_new by scanning s's NEW snapshot
        restricted to the Δ-affected values (semi-join), m_old = m_new −
        Δm — O(|s changes| + |affected slice|), never a full s diff. The
        F_old scan is IN-list-pruned to the flip values (≤1000: literal
        pushdown → file/row-group skipping at 100 TB; larger: broadcast
        join on the tiny flip frame). Returns (frame, weight) specs for
        state_frame/sub_state_frames."""
        from .matview import in_membership_filter

        s_new = self.sinks[mv.in_table].scan(self.spark, version=i_cur)
        specs = [(in_membership_filter(self, mv, changes, s_df=s_new), w)]
        if in_changes is None:
            return specs
        specs.append(
            (self._flip_rows(mv, 1, in_changes, s_new), F.col("__mv_fw"))
        )
        return specs

    def _flip_rows(self, mv, ctx, in_changes, s_new) -> DataFrame:
        """F_old rows whose context-``ctx`` membership flipped across the
        subquery table's delta, weighted ``__mv_fw`` ∈ {−1, +1}: Δm per
        value from the signed feed, m_new from s's NEW snapshot
        restricted to the Δ-affected values (semi-join), m_old = m_new −
        Δm — O(|s changes| + |affected slice|), never a full s diff.
        The F_old scan is IN-list-pruned to the flip values (≤1000:
        literal pushdown → file/row-group skipping at 100 TB; larger:
        broadcast join on the tiny flip frame)."""
        from .translate import Scope, to_column

        sub, keyn, neg = (
            (mv.in_select, mv.in_key, mv.in_negated)
            if ctx == 1
            else (mv.in2_select, mv.in2_key, mv.in2_negated)
        )
        sref = sub.from_[0].alias or sub.from_[0].name

        def _sub_vals(df, *extra):
            scope = Scope({sref: df}, includes=self.includes)
            out = df
            if sub.where is not None:
                out = out.filter(
                    to_column(sub.where, scope).cast("boolean")
                )
            v = to_column(sub.columns[0].expr, scope)
            return out.select(v.alias("__mv_inv"), *extra).filter(
                F.col("__mv_inv").isNotNull()
            )

        dw = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        delta_m = (
            _sub_vals(in_changes.withColumn("__mv_dw", dw), F.col("__mv_dw"))
            .groupBy("__mv_inv")
            .agg(F.sum("__mv_dw").alias("__mv_dm"))
            .filter(F.col("__mv_dm") != 0)
        )
        m_new = (
            _sub_vals(s_new)
            .join(F.broadcast(delta_m.select("__mv_inv")), "__mv_inv", "left_semi")
            .groupBy("__mv_inv")
            .agg(F.count(F.lit(1)).alias("__mv_mn"))
        )
        # membership gained → rows enter (+1) for IN/EXISTS; for
        # NOT EXISTS the signs invert (gaining a match EVICTS rows)
        sign = -1 if neg else 1
        flips = (
            delta_m.join(m_new, "__mv_inv", "left")
            .select(
                "__mv_inv",
                F.coalesce("__mv_mn", F.lit(0)).alias("__mv_mn"),
                F.col("__mv_dm"),
            )
            .filter(
                (F.col("__mv_mn") == 0)
                != ((F.col("__mv_mn") - F.col("__mv_dm")) == 0)
            )
            .withColumn(
                "__mv_fw",
                F.when(F.col("__mv_mn") > 0, F.lit(sign)).otherwise(F.lit(-sign)),
            )
            .select("__mv_inv", "__mv_fw")
        )
        f_old = self.sinks[mv.base].scan(self.spark, version=mv.base_version)
        src = mv.select.from_[0]
        fref = src.alias or mv.base

        def _key(df):
            return to_column(keyn, Scope({fref: df}, includes=self.includes))

        fvals = [r[0] for r in flips.limit(1001).collect()]
        if len(fvals) <= 1000:
            # bounded plan-time collect → literal IN pushdown on the
            # fact scan (stats/row-group skipping); empty → no rows
            f_old = f_old.filter(
                _key(f_old).isin(fvals) if fvals else F.lit(False)
            )
        return f_old.join(
            F.broadcast(flips), _key(f_old) == F.col("__mv_inv"), "inner"
        ).drop("__mv_inv")

    def _in_sub_terms2(
        self, mv, changes, w, in_changes, i_cur, in2_changes, i2_cur
    ) -> list:
        """Signed delta inputs for a TWO-membership view (``k1 IN
        (SELECT … FROM s1) AND k2 IN (SELECT … FROM s2)`` over a
        single-table base, s1 ≠ s2 ≠ base), each table PINNED:

          T_a  = ΔF ⋉ M1_new ⋉ M2_new
          T_f1 = (F_old · flip1) ⋉ M2_new   (weight ±1)
          T_f2 = (F_old · flip2) ⋉ M1_old   (weight ±1)

        Identity: [M1n][M2n] − [M1o][M2o] = ([M1n]−[M1o])·[M2n] +
        [M1o]·([M2n]−[M2o]) — exact telescoping, so distinct-table
        contexts never need a cross term. T_f2's [M1_old] filter scans
        s1's OLD snapshot (vacuum-guarded by the caller); negated
        contexts anti-join and invert flip signs exactly as the
        single-context machinery."""
        from .matview import in_membership_filter

        s1_new = self.sinks[mv.in_table].scan(self.spark, version=i_cur)
        s2_new = self.sinks[mv.in2_table].scan(self.spark, version=i2_cur)
        t_a = in_membership_filter(self, mv, changes, s_df=s1_new)
        t_a = in_membership_filter(self, mv, t_a, s_df=s2_new, ctx=2)
        specs = [(t_a, w)]
        if in_changes is not None:
            f1 = self._flip_rows(mv, 1, in_changes, s1_new)
            f1 = in_membership_filter(self, mv, f1, s_df=s2_new, ctx=2)
            specs.append((f1, F.col("__mv_fw")))
        if in2_changes is not None:
            s1_old = self.sinks[mv.in_table].scan(
                self.spark, version=mv.in_version
            )
            f2 = self._flip_rows(mv, 2, in2_changes, s2_new)
            f2 = in_membership_filter(self, mv, f2, s_df=s1_old, ctx=1)
            specs.append((f2, F.col("__mv_fw")))
        return specs

    def _csc_terms(self, mv, changes, w, in_changes, i_cur) -> list:
        """Signed delta inputs for a correlated-scalar view (``... WHERE
        P(f, (SELECT agg FROM s WHERE s.k = f.ck))``), with s PINNED at
        ``i_cur``:

          T_a = ΔF rows passing P under the NEW scalars
          T_f = F_old rows whose predicate truth CHANGED, weighted
                [P(f, v_new(k))] − [P(f, v_old(k))] ∈ {−1, +1}

        Identity: state = Σ_{f∈F}[P(f, v(k(f)))], so
        Δstate = Σ_{ΔF}[P_new] + Σ_{F_old}([P_new] − [P_old]).
        The scalar dim is recomputed only for the Δ-AFFECTED keys (every
        key in s's change feed, pre- and postimages — a conservative
        superset), from the new snapshot and the OLD snapshot each
        restricted to that slice: O(|s changes| + 2·affected slice).
        Keys whose scalar did not move are dropped BEFORE touching the
        fact (null-safe compare), and the F_old scan is pruned to the
        moved keys (≤1000 → literal IN pushdown → file/row-group
        skipping at 100 TB; larger → broadcast join on the tiny changed
        frame). Unlike the IN machinery's per-KEY flips, the flip here
        is per fact ROW — the predicate couples the row's own columns
        with the scalar — so the changed frame carries BOTH values and
        one join evaluates both truths."""
        from .matview import csc_default, csc_filter, csc_pred_col, csc_scalars
        from .translate import Scope, to_column

        isink = self.sinks[mv.in_table]
        s_new = isink.scan(self.spark, version=i_cur)
        specs = [(csc_filter(self, mv, changes, s_new), w)]
        if in_changes is None:
            return specs
        sub_src = mv.csc_select.from_[0]
        sref = sub_src.alias or sub_src.name
        skey_node = mv.csc_select.group_by[0]
        k = to_column(skey_node, Scope({sref: in_changes}, includes=self.includes))
        kframe = (
            in_changes.select(k.alias("__mv_cfk"))
            .filter(F.col("__mv_cfk").isNotNull())
            .distinct()
        )
        v_new = csc_scalars(self, mv, s_new, kframe).withColumnRenamed("__mv_csc", "__mv_vn")
        s_old = isink.scan(self.spark, version=mv.in_version)
        v_old = csc_scalars(self, mv, s_old, kframe).withColumnRenamed("__mv_csc", "__mv_vo")
        v0, dt = csc_default(self, mv)
        changed = (
            v_new.join(v_old, "__mv_cck", "full")
            .select(
                "__mv_cck",
                F.coalesce("__mv_vn", F.lit(v0).cast(dt)).alias("__mv_vn"),
                F.coalesce("__mv_vo", F.lit(v0).cast(dt)).alias("__mv_vo"),
            )
            .filter(~F.col("__mv_vn").eqNullSafe(F.col("__mv_vo")))
        )
        f_old = self.sinks[mv.base].scan(self.spark, version=mv.base_version)
        src = mv.select.from_[0]
        fref = src.alias or mv.base

        def _fkey(df):
            return to_column(mv.in_key, Scope({fref: df}, includes=self.includes))

        fvals = [r[0] for r in changed.select("__mv_cck").limit(1001).collect()]
        if len(fvals) <= 1000:
            # bounded plan-time collect → literal IN pushdown on the
            # fact scan (stats/row-group skipping); empty → no rows
            f_old = f_old.filter(_fkey(f_old).isin(fvals) if fvals else F.lit(False))
        j = f_old.join(F.broadcast(changed), _fkey(f_old) == F.col("__mv_cck"), "inner")
        p_new = csc_pred_col(self, mv, j, F.col("__mv_vn"), dt)
        p_old = csc_pred_col(self, mv, j, F.col("__mv_vo"), dt)
        fw = F.coalesce(p_new.cast("int"), F.lit(0)) - F.coalesce(p_old.cast("int"), F.lit(0))
        j = (
            j.withColumn("__mv_fw", fw)
            .filter(F.col("__mv_fw") != 0)
            .drop("__mv_cck", "__mv_vn", "__mv_vo")
        )
        specs.append((j, F.col("__mv_fw")))
        return specs

    def _refresh_one(self, view: str, full: bool, cache) -> tuple:
        """One view's refresh — incremental when possible: fold the
        base sink's commits since the last refresh (changes_since CDF)
        into the stored aggregation state; O(|changes| + |view|), never a
        base rescan. Falls back to full recompute when FULL is forced,
        the view isn't incrementally maintainable, or the change feed has
        a vacuumed gap. Returns the report row naming the mode that
        actually ran."""
        from .matview import (
            exposed_frame,
            merge_state,
            merge_substates,
            persist_state,
            persist_substates,
            repair_extrema,
            state_frame,
            sub_state_frames,
        )

        def _fold_substates(mv, deltas):
            mv.substates = persist_substates(
                mv, merge_substates(mv, mv.substates, deltas)
            )

        lname = view.lower()
        mv = self.mat_views.get(lname)
        if mv is None:
            raise ExecError(f"REFRESH MATERIALIZED VIEW: unknown materialized view {view!r}")
        mode = "full"
        v_from = mv.base_version
        in_moved = False
        isink = None
        if mv.in_table:
            isink = self.sinks.get(mv.in_table)
            if isink is None:
                raise ExecError(
                    f"materialized view {view!r}: IN-subquery table {mv.in_table!r} is no longer a registered sink"
                )
            in_moved = max(isink.versions()) != mv.in_version
        in2_moved = False
        i2sink = None
        if mv.in2_table:
            i2sink = self.sinks.get(mv.in2_table)
            if i2sink is None:
                raise ExecError(
                    f"materialized view {view!r}: IN-subquery table {mv.in2_table!r} is no longer a registered sink"
                )
            in2_moved = max(i2sink.versions()) != mv.in2_version
        dim_moved = False
        dsink = None
        if mv.dim:
            dsink = self.sinks.get(mv.dim)
            if dsink is None:
                raise ExecError(
                    f"materialized view {view!r}: dim {mv.dim!r} is no longer a registered sink"
                )
            dim_moved = max(dsink.versions()) != mv.dim_version
        # a dim commit maintains incrementally for INNER joins (bilinear
        # higher-order identity) and for LEFT joins whose ON decomposes
        # into equality pairs + row-local single-side residuals (the
        # NULL-extension term isn't bilinear, but the flip set is
        # computable: a fact row's null-extended row flips exactly when
        # its key's dim match count crosses 0↔1, counted over
        # residual-filtered snapshots — see the null-flip term below).
        # LEFT joins whose ON doesn't decompose (two-sided non-equi
        # conjuncts, OR trees) fall back to full recompute inside the
        # branch once the ON shape is known.
        jt = mv.select.from_[1].join_type if len(mv.select.from_) > 1 else None
        # dim-preserved outer joins need the match-count terms on EVERY
        # refresh (a fact-only delta can flip a dim row's null extension)
        right_like = jt in ("RIGHT", "RIGHT OUTER", "FULL", "FULL OUTER")
        dim_incrementable = not dim_moved or jt in (
            "INNER",
            "LEFT",
            "LEFT OUTER",
            "RIGHT",
            "RIGHT OUTER",
            "FULL",
            "FULL OUTER",
        )
        fresh_sv = None
        subs_moved = False
        if mv.incremental and mv.scalar_subs:
            # freeze-and-verify: re-evaluate the frozen scalar
            # subqueries (bounded single-row jobs); unchanged values →
            # the folded WHERE still holds and deltas fold; a moved
            # value forces a full state rebuild under the new values
            from .matview import eval_scalar_subs

            fresh_sv = eval_scalar_subs(self, mv)
            subs_moved = not _scalar_vals_eq(
                [v for v, _ in fresh_sv],
                [v for v, _ in (mv.scalar_vals or [])],
            )
        es_moved = False
        if mv.incremental and mv.expose_subs:
            # expose-time scalars: re-evaluate (bounded single-row jobs);
            # a moved value only forces a RE-EXPOSE below — the state
            # algebra is untouched, so incremental folding proceeds
            from .matview import eval_scalar_subs as _ess

            es_fresh = _ess(self, mv, mv.expose_subs)
            es_moved = not _scalar_vals_eq(
                [v for v, _ in es_fresh],
                [v for v, _ in (mv.expose_vals or [])],
            )
            mv.expose_vals = es_fresh
        if mv.incremental and not full and dim_incrementable and not subs_moved:
            if self.sinks.get(mv.base) is None:
                raise ExecError(
                    f"materialized view {view!r}: base {mv.base!r} is no longer a registered sink"
                )
            try:
                changes, cur = self._changes_since_cached(cache, mv.base, mv.base_version)
                in_changes = i_cur = None
                if mv.in_table:
                    i_cur = mv.in_version
                    if in_moved:
                        in_changes, i_cur = self._changes_since_cached(
                            cache, mv.in_table, mv.in_version
                        )
                        if mv.base_version not in self.sinks[mv.base].versions():
                            # the F_old × flip terms need the fact's OLD
                            # snapshot; vacuumed → full recompute
                            changes = None
                        elif (
                            mv.csc_pred is not None
                            and mv.in_version not in isink.versions()
                        ):
                            # the correlated-scalar flip terms also scan
                            # s's OLD snapshot (v_old over the affected
                            # slice); vacuumed → full recompute
                            changes = None
                in2_changes = i2_cur = None
                if mv.in2_table:
                    i2_cur = mv.in2_version
                    if in2_moved:
                        in2_changes, i2_cur = self._changes_since_cached(
                            cache, mv.in2_table, mv.in2_version
                        )
                        if mv.base_version not in self.sinks[mv.base].versions():
                            # the F_old × flip2 term needs the fact's OLD
                            # snapshot; vacuumed → full recompute
                            changes = None
                        elif mv.in_version not in isink.versions():
                            # T_f2's [M1_old] filter scans s1's OLD
                            # snapshot; vacuumed → full recompute
                            changes = None
                if mv.in_table and mv.dim and dim_moved and jt != "INNER":
                    # LEFT-join set-context views under a dim commit (r16):
                    # the T4 null-extension flips COMPOSE with membership
                    # over the trilinear midpoint G_mid = F_old ⋉ M_new —
                    # maintained below when the ON decomposes with at
                    # least one equality pair (the ΔD-affected-slice
                    # prune keys on it). A pairless ON has no prune (a
                    # delta would force an O(|F_old|) recount) → one
                    # full recompute, re-pinned.
                    from .matview import join_on_parts

                    _p = None
                    if jt in ("LEFT", "LEFT OUTER"):
                        _p = join_on_parts(
                            mv,
                            {
                                c.lower()
                                for c in self.sinks[mv.base]
                                .scan(self.spark, version=mv.base_version)
                                .columns
                            },
                            {c.lower() for c in dsink.scan(self.spark).columns},
                            allow_cross=True,
                        )
                    if _p is None:
                        changes = None
                dim_changes = d_cur = None
                if dim_moved or (right_like and cur != mv.base_version):
                    dim_changes, d_cur = self._changes_since_cached(cache, mv.dim, mv.dim_version)
                    if mv.base_version not in self.sinks[mv.base].versions():
                        # the F_old ⋈ ΔD / match-count terms need the
                        # fact's OLD snapshot; vacuumed → full recompute
                        changes = None
                    elif dsink is not None and mv.dim_version not in dsink.versions():
                        # the null-flip / match-count terms (T4/T5) scan the
                        # dim's OLD snapshot; recordings can outlive a
                        # vacuumed version, so guard symmetrically
                        changes = None
            except ExecError:
                changes = None  # vacuumed gap / stale checkpoint → full recompute
            if changes is not None:
                if (
                    cur == mv.base_version
                    and not dim_moved
                    and not in_moved
                    and not in2_moved
                ):
                    # a moved expose-time scalar still needs a re-expose
                    # (and reports incremental — the view DID update)
                    mode = "incremental" if es_moved else "noop"
                else:
                    mode = "incremental"
                    w = F.when(
                        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
                    ).otherwise(F.lit(-1))
                    if mv.in_table:
                        # semi-join delta algebra for the IN-subquery:
                        #   Δstate = ΔF ⋉ M_new + F_old ⋉ flip_in − F_old ⋉ flip_out
                        # (correlated scalars: the per-row twin, _csc_terms)
                        if mv.csc_pred is not None:
                            specs = self._csc_terms(mv, changes, w, in_changes, i_cur)
                        elif mv.in2_table:
                            specs = self._in_sub_terms2(
                                mv, changes, w, in_changes, i_cur,
                                in2_changes, i2_cur,
                            )
                        else:
                            specs = self._in_sub_terms(mv, changes, w, in_changes, i_cur)
                        # INNER-join views (fact-side key): trilinear
                        # identity — the fact-delta term folds against
                        # D_NEW, the flip term against D_OLD, and a moved
                        # dim adds T2' = (F_old ⋉ M_new) ⋈ ΔD. specs order
                        # is [T_a, flip?] (the _*_terms contract).
                        spec4 = [(df, wt, None, None, None) for df, wt in specs]
                        d_cur2 = None
                        if mv.dim:
                            d_cur2 = d_cur if d_cur is not None else mv.dim_version
                            d_new_df = dsink.scan(self.spark, version=d_cur2)
                            d_old_df = dsink.scan(self.spark, version=mv.dim_version)
                            spec4 = [
                                (df, wt, dd, None, None)
                                for (df, wt), dd in zip(specs, [d_new_df, d_old_df])
                            ]
                            if dim_changes is not None:
                                dw2 = F.when(
                                    F.col("_change_type").isin(
                                        "insert", "update_postimage"
                                    ),
                                    F.lit(1),
                                ).otherwise(F.lit(-1))
                                keep = [
                                    c
                                    for c in dim_changes.columns
                                    if c in set(d_new_df.columns)
                                ]
                                d_delta = dim_changes.select(*keep, dw2.alias("__dw"))
                                f_old_all = self.sinks[mv.base].scan(
                                    self.spark, version=mv.base_version
                                )
                                from .matview import (
                                    _UNSET,
                                    csc_filter,
                                    in_membership_filter,
                                )

                                s_cur_df = self.sinks[mv.in_table].scan(
                                    self.spark, version=i_cur
                                )
                                if mv.csc_pred is not None:
                                    f_old_m = csc_filter(self, mv, f_old_all, s_cur_df)
                                else:
                                    saved_s = self.tables.get(mv.in_table, _UNSET)
                                    self.tables[mv.in_table] = s_cur_df
                                    try:
                                        f_old_m = in_membership_filter(
                                            self, mv, f_old_all
                                        )
                                    finally:
                                        if saved_s is _UNSET:
                                            self.tables.pop(mv.in_table, None)
                                        else:
                                            self.tables[mv.in_table] = saved_s
                                spec4.append(
                                    (f_old_m, F.lit(1), d_delta, "product", "INNER")
                                )
                                if jt in ("LEFT", "LEFT OUTER"):
                                    # T4 (r16) — fact-side null-extension
                                    # flips composed with membership: a
                                    # G_mid = F_old⋉M_new row's
                                    # null-extended image appears (+1)
                                    # when its dim match count fell to 0
                                    # across ΔD, retracts (−1) when it
                                    # rose from 0. Only the ΔD-affected
                                    # slice (equality-pair keys) is
                                    # touched; two-sided non-equi ONs use
                                    # the per-ROW T4' variant (semi/anti
                                    # joins through the real ON against
                                    # both dim snapshots).
                                    from functools import reduce

                                    from .matview import join_on_parts

                                    pj, fact_preds, dim_preds, cross_preds = join_on_parts(
                                        mv,
                                        {c.lower() for c in f_old_all.columns},
                                        {c.lower() for c in d_new_df.columns},
                                        allow_cross=True,
                                    )
                                    _f_ref = mv.select.from_[0].alias or mv.base
                                    _d_ref = mv.select.from_[1].alias or mv.dim

                                    def _pred4(df, preds, ref):
                                        scope = Scope(
                                            {ref: df}, includes=self.includes
                                        )
                                        return reduce(
                                            lambda a, b: a & b,
                                            [
                                                to_column(p, scope).cast("boolean")
                                                for p in preds
                                            ],
                                        )

                                    fcols4 = [f for f, _ in pj]
                                    dcols4 = [d_ for _, d_ in pj]

                                    def _key4(df, cols):
                                        if len(cols) == 1:
                                            return df[cols[0]]
                                        return F.struct(
                                            *[
                                                df[c].alias(f"k{i}")
                                                for i, c in enumerate(cols)
                                            ]
                                        )

                                    def _nn4(df, cols):
                                        return reduce(
                                            lambda a, b: a & b,
                                            [df[c].isNotNull() for c in cols],
                                        )

                                    # residual-failing ΔD rows can't change
                                    # any key's match count — excluded
                                    dflt4 = _nn4(d_delta, dcols4)
                                    if dim_preds:
                                        dflt4 = dflt4 & _pred4(
                                            d_delta, dim_preds, _d_ref
                                        )
                                    dkeys4 = (
                                        d_delta.filter(dflt4)
                                        .select(
                                            _key4(d_delta, dcols4).alias("__mv_dk")
                                        )
                                        .distinct()
                                    )
                                    f_mid = f_old_m
                                    if len(pj) == 1:
                                        dvals4 = [
                                            r[0]
                                            for r in dkeys4.limit(1001).collect()
                                        ]
                                        if len(dvals4) <= 1000:
                                            # bounded plan-time collect →
                                            # literal IN pushdown through
                                            # the membership join to the
                                            # fact scan (row-group
                                            # skipping at 100 TB)
                                            f_mid = f_mid.filter(
                                                F.col(fcols4[0]).isin(dvals4)
                                                if dvals4
                                                else F.lit(False)
                                            )
                                    if cross_preds:
                                        on_node4 = mv.select.from_[1].join_expr

                                        def _on4(fdf, ddf, how):
                                            fa = fdf.alias(_f_ref)
                                            da = ddf.alias(_d_ref)
                                            cond = to_column(
                                                on_node4,
                                                Scope(
                                                    {_f_ref: fa, _d_ref: da},
                                                    includes=self.includes,
                                                ),
                                            ).cast("boolean")
                                            return fa.join(da, cond, how)

                                        f_aff4 = f_mid.join(
                                            F.broadcast(dkeys4),
                                            _key4(f_mid, fcols4)
                                            == dkeys4["__mv_dk"],
                                            "left_semi",
                                        )
                                        f_app4 = _on4(
                                            _on4(f_aff4, d_old_df, "left_semi"),
                                            d_new_df, "left_anti",
                                        )
                                        f_ret4 = _on4(
                                            _on4(f_aff4, d_old_df, "left_anti"),
                                            d_new_df, "left_semi",
                                        )
                                        spec4.append(
                                            (f_app4, F.lit(1),
                                             d_new_df.limit(0), None, None)
                                        )
                                        spec4.append(
                                            (f_ret4, F.lit(-1),
                                             d_new_df.limit(0), None, None)
                                        )
                                    else:

                                        def _dkc4(ddf, out):
                                            if dim_preds:
                                                ddf = ddf.filter(
                                                    _pred4(ddf, dim_preds, _d_ref)
                                                )
                                            return (
                                                ddf.join(
                                                    F.broadcast(dkeys4),
                                                    _key4(ddf, dcols4)
                                                    == dkeys4["__mv_dk"],
                                                    "left_semi",
                                                )
                                                .groupBy(
                                                    _key4(ddf, dcols4).alias(
                                                        "__mv_dk"
                                                    )
                                                )
                                                .agg(
                                                    F.count(F.lit(1)).alias(out)
                                                )
                                            )

                                        flips4 = (
                                            dkeys4.join(
                                                _dkc4(d_old_df, "__mv_mo"),
                                                "__mv_dk", "left",
                                            )
                                            .join(
                                                _dkc4(d_new_df, "__mv_mn"),
                                                "__mv_dk", "left",
                                            )
                                            .select(
                                                "__mv_dk",
                                                F.coalesce(
                                                    "__mv_mo", F.lit(0)
                                                ).alias("__mv_mo"),
                                                F.coalesce(
                                                    "__mv_mn", F.lit(0)
                                                ).alias("__mv_mn"),
                                            )
                                            .filter(
                                                (F.col("__mv_mo") == 0)
                                                != (F.col("__mv_mn") == 0)
                                            )
                                            # key gained matches → the
                                            # null-extended rows RETRACT
                                            # (−1); lost all → appear (+1)
                                            .withColumn(
                                                "__mv_fw",
                                                F.when(
                                                    F.col("__mv_mn") == 0,
                                                    F.lit(1),
                                                ).otherwise(F.lit(-1)),
                                            )
                                            .select("__mv_dk", "__mv_fw")
                                        )
                                        # only match-ABLE rows flip; a
                                        # residual-failing fact row stays
                                        # permanently null-extended
                                        if fact_preds:
                                            f_mid = f_mid.filter(
                                                _pred4(f_mid, fact_preds, _f_ref)
                                            )
                                        f_flip4 = f_mid.join(
                                            F.broadcast(flips4),
                                            _key4(f_mid, fcols4)
                                            == flips4["__mv_dk"],
                                            "inner",
                                        ).drop("__mv_dk")
                                        spec4.append(
                                            (f_flip4, F.col("__mv_fw"),
                                             d_new_df.limit(0), None, None)
                                        )
                        terms = [
                            state_frame(
                                self, mv, df, wt, dim_df=dd,
                                weight_mode=wm, join_override=jo,
                            )
                            for df, wt, dd, wm, jo in spec4
                        ]
                        delta = terms[0]
                        for t in terms[1:]:
                            delta = delta.unionByName(t)
                        mv.internal = persist_state(
                            mv, merge_state(mv, mv.internal, delta)
                        )
                        if mv.has_distinct:
                            sub_terms = [
                                sub_state_frames(
                                    self, mv, df, wt, dim_df=dd,
                                    weight_mode=wm, join_override=jo,
                                )
                                for df, wt, dd, wm, jo in spec4
                            ]
                            deltas = []
                            for i in range(len(sub_terms[0])):
                                u = sub_terms[0][i]
                                for t in sub_terms[1:]:
                                    u = u.unionByName(t[i])
                                deltas.append(u)
                            _fold_substates(mv, deltas)
                        mv.in_version = i_cur
                        if mv.in2_table:
                            mv.in2_version = i2_cur
                        if mv.dim and d_cur2 is not None:
                            mv.dim_version = d_cur2
                    elif not dim_moved and not right_like:
                        delta = state_frame(self, mv, changes, w)
                        merged = merge_state(mv, mv.internal, delta)
                        if mv.has_extrema:
                            # min/max don't fold under deletes; re-aggregate
                            # exactly the delete-touched groups from the base
                            merged = repair_extrema(self, mv, merged, cur, dim_version=mv.dim_version)
                        mv.internal = persist_state(mv, merged)
                        if mv.has_distinct:
                            _fold_substates(
                                mv, sub_state_frames(self, mv, changes, w)
                            )
                    else:
                        # higher-order join maintenance. Matched part
                        # (bilinearity of INNER join over signed multiset
                        # union: F_new⋈D_new − F_old⋈D_old
                        #   = ΔF⋈(D_old+ΔD) + F_old⋈ΔD):
                        #   T1 = ΔF ⋈ D_new   (dim PINNED at its new version)
                        #   T2 = F_old ⋈ ΔD   (signed dim delta substituted
                        #        for the dim relation; INNER semantics)
                        # Null-extension parts (plain equi key required —
                        # a side's null-extended row flips exactly when
                        # its key's match count on the OTHER side crosses
                        # 0↔1, computable per key from two snapshots
                        # restricted to the delta's keys):
                        #   LEFT/FULL:  T3 = ΔF rows unmatched in D_new
                        #               T4 = F_old rows whose key's dim
                        #                    match count crossed (ΔD)
                        #   RIGHT/FULL: T5 = ΔD rows unmatched in F_old
                        #               T6 = D_new rows whose key's fact
                        #                    match count crossed (ΔF)
                        # (for LEFT, T1 runs the view's own LEFT join, so
                        # T3 is folded into it; RIGHT/FULL T1 must run
                        # INNER — a dim-preserved join of a fact DELTA
                        # would drag in every unmatched dim row.)
                        from functools import reduce

                        from .matview import _UNSET, join_on_parts

                        left_like = jt in ("LEFT", "LEFT OUTER", "FULL", "FULL OUTER")
                        full_join = jt in ("FULL", "FULL OUTER")
                        d_cur = d_cur if d_cur is not None else mv.dim_version
                        d_new = dsink.scan(self.spark, version=d_cur)
                        dw = F.when(
                            F.col("_change_type").isin("insert", "update_postimage"),
                            F.lit(1),
                        ).otherwise(F.lit(-1))
                        if dim_changes is not None:
                            keep = [
                                c
                                for c in dim_changes.columns
                                if c in set(d_new.columns)
                            ]
                            d_delta = dim_changes.select(*keep, dw.alias("__dw"))
                        else:
                            d_delta = None
                        f_old_full = self.sinks[mv.base].scan(
                            self.spark, version=mv.base_version
                        )
                        f_old = f_old_full
                        parts = join_on_parts(
                            mv,
                            {c.lower() for c in f_old.columns},
                            {c.lower() for c in d_new.columns},
                            allow_cross=True,
                            allow_pairless=True,
                        )
                        pj = parts[0] if parts is not None and parts[0] else None
                        cross_preds = parts[3] if parts is not None else []
                        # single-side row-local residual conjuncts of the
                        # ON (f.k = d.k AND d.x > 5): a row failing its
                        # OWN side's residual never matches, so the
                        # match-count/flip terms count over
                        # residual-FILTERED snapshots and treat failing
                        # rows as unconditionally unmatched. The
                        # matched-part terms (T1/T2) re-run the view's
                        # real ON, residuals included.
                        fact_preds = parts[1] if parts is not None else []
                        dim_preds = parts[2] if parts is not None else []
                        _f_ref = mv.select.from_[0].alias or mv.base
                        _d_ref = mv.select.from_[1].alias or mv.dim

                        def _pred(df, preds, ref):
                            scope = Scope({ref: df}, includes=self.includes)
                            return reduce(
                                lambda a, b: a & b,
                                [to_column(p, scope).cast("boolean") for p in preds],
                            )

                        fpred = (
                            (lambda df: _pred(df, fact_preds, _f_ref))
                            if fact_preds
                            else None
                        )
                        dpred = (
                            (lambda df: _pred(df, dim_preds, _d_ref))
                            if dim_preds
                            else None
                        )
                        # snapshots restricted to match-ABLE rows — the
                        # only rows whose key bookkeeping matters
                        f_old_m = f_old_full.filter(fpred(f_old_full)) if fpred else f_old_full
                        d_new_m = d_new.filter(dpred(d_new)) if dpred else d_new
                        if (left_like or right_like) and pj is None and not cross_preds:
                            # neither keyed nor per-row recountable
                            # (unclassifiable ON): flips unknowable
                            mode = "full"
                        else:
                            # (possibly compound) join-key accessors: the
                            # flip/match-count terms key on the FULL tuple.
                            # Struct fields alias positionally so fact- and
                            # dim-side tuples compare despite different
                            # column names; SQL equality semantics carry
                            # over (a NULL field poisons the comparison,
                            # exactly like the per-conjunct ON).
                            fact_key = dim_key = fact_nn = dim_nn = None
                            dkeys_df = None
                            if pj is not None:
                                fcols = [f for f, _ in pj]
                                dcols = [d_ for _, d_ in pj]

                                def _key(df, cols):
                                    if len(cols) == 1:
                                        return df[cols[0]]
                                    return F.struct(
                                        *[df[c].alias(f"k{i}") for i, c in enumerate(cols)]
                                    )

                                def _nn(df, cols):
                                    from functools import reduce

                                    return reduce(
                                        lambda a, b: a & b,
                                        [df[c].isNotNull() for c in cols],
                                    )

                                fact_key = lambda df: _key(df, fcols)  # noqa: E731
                                dim_key = lambda df: _key(df, dcols)  # noqa: E731
                                fact_nn = lambda df: _nn(df, fcols)  # noqa: E731
                                dim_nn = lambda df: _nn(df, dcols)  # noqa: E731
                            if pj is not None and d_delta is not None:
                                # the dim delta's distinct join keys: the
                                # affected-fact filter; IN-list pushdown
                                # (file/row-group skipping) for a single
                                # key, broadcast semi-join for compound.
                                # Residual-failing delta rows can't change
                                # any key's match count — their own image
                                # never matches — so they're excluded.
                                dflt = dim_nn(d_delta)
                                if dpred is not None:
                                    dflt = dflt & dpred(d_delta)
                                dkeys_df = (
                                    d_delta.filter(dflt)
                                    .select(dim_key(d_delta).alias("__mv_dk"))
                                    .distinct()
                                )
                                if len(pj) == 1:
                                    dkeys = [
                                        row[0]
                                        for row in dkeys_df.limit(1001).collect()
                                    ]
                                    if len(dkeys) <= 1000:
                                        # matched-part rows require a non-null
                                        # key in this set; empty set → no rows
                                        f_old = f_old.filter(
                                            F.col(pj[0][0]).isin(dkeys)
                                            if dkeys
                                            else F.lit(False)
                                        )
                                else:
                                    f_old = f_old.join(
                                        F.broadcast(dkeys_df),
                                        fact_key(f_old) == F.col("__mv_dk"),
                                        "left_semi",
                                    )
                            saved = self.tables.get(mv.dim, _UNSET)
                            self.tables[mv.dim] = d_new
                            try:
                                terms = []
                                sub_specs = []  # (df, weight, dim_df, mode, override)

                                def _add(df, wt, dd=None, wmode=None, jo=None):
                                    terms.append(
                                        state_frame(
                                            self, mv, df, wt, dim_df=dd,
                                            weight_mode=wmode, join_override=jo,
                                        )
                                    )
                                    sub_specs.append((df, wt, dd, wmode, jo))

                                # semi/anti joins through the view's REAL
                                # ON (all conjuncts — equality pairs,
                                # single-side residuals, AND two-sided
                                # non-equi): the cross-pred null-extension
                                # terms below detect per-ROW match state
                                # with these, so residual-failing rows
                                # come out unmatched with no special-casing
                                on_node = mv.select.from_[1].join_expr

                                def _on_join_f(fdf, ddf, how):
                                    fa = fdf.alias(_f_ref)
                                    da = ddf.alias(_d_ref)
                                    cond = to_column(
                                        on_node,
                                        Scope(
                                            {_f_ref: fa, _d_ref: da},
                                            includes=self.includes,
                                        ),
                                    ).cast("boolean")
                                    return fa.join(da, cond, how)

                                def _on_join_d(ddf, fdf, how):
                                    da = ddf.alias(_d_ref)
                                    fa = fdf.alias(_f_ref)
                                    cond = to_column(
                                        on_node,
                                        Scope(
                                            {_f_ref: fa, _d_ref: da},
                                            includes=self.includes,
                                        ),
                                    ).cast("boolean")
                                    return da.join(fa, cond, how)

                                # T1 (+ T3 folded in for LEFT; explicit for FULL)
                                _add(changes, w, jo="INNER" if right_like else None)
                                if full_join and cross_preds:
                                    # T3' — per-row: a ΔF row is
                                    # null-extended iff NOTHING in D_new
                                    # matches it through the real ON
                                    f3 = _on_join_f(changes, d_new, "left_anti")
                                    _add(f3, w, dd=d_new.limit(0))
                                elif full_join:
                                    fkeys1 = (
                                        changes.filter(fact_nn(changes))
                                        .select(fact_key(changes).alias("__mv_fk"))
                                        .distinct()
                                    )
                                    c3 = (
                                        d_new_m.join(
                                            F.broadcast(fkeys1),
                                            dim_key(d_new_m) == fkeys1["__mv_fk"],
                                            "left_semi",
                                        )
                                        .groupBy(dim_key(d_new_m).alias("__mv_fk"))
                                        .agg(F.count(F.lit(1)).alias("__mv_c3"))
                                    )
                                    ch3 = changes
                                    unmatched3 = F.col("__mv_c3").isNull()
                                    if fpred is not None:
                                        # a ΔF row failing its own residual
                                        # is unmatched no matter the keys
                                        ch3 = ch3.withColumn("__mv_fpx", fpred(ch3))
                                        unmatched3 = unmatched3 | ~F.coalesce(
                                            F.col("__mv_fpx"), F.lit(False)
                                        )
                                    f3 = (
                                        ch3.join(
                                            F.broadcast(c3),
                                            fact_key(ch3) == c3["__mv_fk"],
                                            "left",
                                        )
                                        .filter(unmatched3)
                                        .drop("__mv_fk", "__mv_c3", "__mv_fpx")
                                    )
                                    _add(f3, w, dd=d_new.limit(0))
                                # T2 — matched part of the dim delta
                                if d_delta is not None:
                                    _add(
                                        f_old, F.lit(1), dd=d_delta,
                                        wmode="product", jo="INNER",
                                    )
                                # T4 — fact-side null-extension flips (ΔD)
                                if left_like and d_delta is not None and cross_preds:
                                    # T4' (two-sided non-equi conjuncts):
                                    # match state is per FACT ROW, not per
                                    # key — test the ΔD-affected fact
                                    # slice against BOTH dim snapshots
                                    # with semi/anti joins through the
                                    # real ON (residuals + cross
                                    # conjuncts included, so a
                                    # residual-failing row is unmatched
                                    # in both → never flips). Row
                                    # multiplicity is preserved by the
                                    # joins — no grouping needed. Cost:
                                    # O(affected slice × matched dims).
                                    d_old_snap = dsink.scan(
                                        self.spark, version=mv.dim_version
                                    )
                                    if dkeys_df is not None:
                                        f_aff = f_old_full.join(
                                            F.broadcast(dkeys_df),
                                            fact_key(f_old_full)
                                            == dkeys_df["__mv_dk"],
                                            "left_semi",
                                        )
                                    else:
                                        # PAIRLESS ON (r16): the affected
                                        # slice is every fact row matching
                                        # ANY ΔD image through the real ON
                                        # — a broadcast semi-join against
                                        # the tiny delta replaces the key
                                        # lookup; rows matching no image
                                        # have identical match sets in
                                        # both snapshots, so they never
                                        # flip
                                        f_aff = _on_join_f(
                                            f_old_full, d_delta, "left_semi"
                                        )
                                    # lost ALL matches → null-extended row APPEARS (+1)
                                    f_app = _on_join_f(
                                        _on_join_f(f_aff, d_old_snap, "left_semi"),
                                        d_new, "left_anti",
                                    )
                                    # gained matches → it RETRACTS (−1)
                                    f_ret = _on_join_f(
                                        _on_join_f(f_aff, d_old_snap, "left_anti"),
                                        d_new, "left_semi",
                                    )
                                    _add(f_app, F.lit(1), dd=d_new.limit(0))
                                    _add(f_ret, F.lit(-1), dd=d_new.limit(0))
                                elif left_like and dkeys_df is not None:
                                    d_old_snap = dsink.scan(
                                        self.spark, version=mv.dim_version
                                    )

                                    def _dkc(ddf, out):
                                        if dpred is not None:
                                            # only residual-passing dim
                                            # rows count as matches
                                            ddf = ddf.filter(dpred(ddf))
                                        return (
                                            ddf.join(
                                                F.broadcast(dkeys_df),
                                                dim_key(ddf) == dkeys_df["__mv_dk"],
                                                "left_semi",
                                            )
                                            .groupBy(dim_key(ddf).alias("__mv_dk"))
                                            .agg(F.count(F.lit(1)).alias(out))
                                        )

                                    flips = (
                                        dkeys_df.join(
                                            _dkc(d_old_snap, "__mv_mo"), "__mv_dk", "left"
                                        )
                                        .join(_dkc(d_new, "__mv_mn"), "__mv_dk", "left")
                                        .select(
                                            "__mv_dk",
                                            F.coalesce("__mv_mo", F.lit(0)).alias("__mv_mo"),
                                            F.coalesce("__mv_mn", F.lit(0)).alias("__mv_mn"),
                                        )
                                        .filter(
                                            (F.col("__mv_mo") == 0)
                                            != (F.col("__mv_mn") == 0)
                                        )
                                        # key gained matches → null-extended
                                        # rows RETRACT (−1); lost all → +1
                                        .withColumn(
                                            "__mv_fw",
                                            F.when(
                                                F.col("__mv_mn") == 0, F.lit(1)
                                            ).otherwise(F.lit(-1)),
                                        )
                                        .select("__mv_dk", "__mv_fw")
                                    )
                                    # only match-ABLE fact rows flip; a
                                    # residual-failing fact row is
                                    # permanently null-extended
                                    f_flip = f_old_m.join(
                                        F.broadcast(flips),
                                        fact_key(f_old_m) == flips["__mv_dk"],
                                        "inner",
                                    ).drop("__mv_dk")
                                    _add(
                                        f_flip, F.col("__mv_fw"),
                                        dd=d_new.limit(0),
                                    )
                                # T5 — dim-side null extensions of ΔD at F_old
                                if right_like and d_delta is not None and cross_preds:
                                    # T5' — per-row: a ΔD row is
                                    # null-extended iff NOTHING in F_old
                                    # matches it through the real ON
                                    d5 = _on_join_d(d_delta, f_old_full, "left_anti")
                                    _add(
                                        f_old_full.limit(0), F.lit(1),
                                        dd=d5, wmode="dim",
                                    )
                                elif right_like and d_delta is not None:
                                    mo5 = (
                                        f_old_m.join(
                                            F.broadcast(dkeys_df),
                                            fact_key(f_old_m) == dkeys_df["__mv_dk"],
                                            "left_semi",
                                        )
                                        .groupBy(fact_key(f_old_m).alias("__mv_dk"))
                                        .agg(F.count(F.lit(1)).alias("__mv_m5"))
                                    )
                                    dd5 = d_delta
                                    unmatched5 = F.col("__mv_m5").isNull()
                                    if dpred is not None:
                                        # a ΔD row failing its own residual
                                        # is unmatched no matter the keys
                                        dd5 = dd5.withColumn("__mv_dpx", dpred(dd5))
                                        unmatched5 = unmatched5 | ~F.coalesce(
                                            F.col("__mv_dpx"), F.lit(False)
                                        )
                                    d5 = (
                                        dd5.join(
                                            F.broadcast(mo5),
                                            dim_key(dd5) == mo5["__mv_dk"],
                                            "left",
                                        )
                                        .filter(unmatched5)
                                        .drop("__mv_dk", "__mv_m5", "__mv_dpx")
                                    )
                                    _add(
                                        f_old_full.limit(0), F.lit(1),
                                        dd=d5, wmode="dim",
                                    )
                                # T6 — dim rows whose fact match count
                                # crossed 0↔1 via ΔF
                                if right_like and cur != mv.base_version and cross_preds:
                                    # T6' — per-DIM-row: test the
                                    # ΔF-affected dim slice against BOTH
                                    # fact snapshots through the real ON
                                    # (the symmetric twin of T4')
                                    f_new_full = self.sinks[mv.base].scan(
                                        self.spark, version=cur
                                    )
                                    if pj is not None:
                                        fkeys6 = (
                                            changes.filter(fact_nn(changes))
                                            .select(
                                                fact_key(changes).alias("__mv_fk")
                                            )
                                            .distinct()
                                        )
                                        d_aff = d_new.join(
                                            F.broadcast(fkeys6),
                                            dim_key(d_new) == fkeys6["__mv_fk"],
                                            "left_semi",
                                        )
                                    else:
                                        # PAIRLESS ON (r16): dim rows
                                        # matching ANY ΔF image through
                                        # the real ON — the only rows
                                        # whose match count can cross
                                        d_aff = _on_join_d(
                                            d_new, changes, "left_semi"
                                        )
                                    # lost ALL fact matches → its
                                    # null-extended row APPEARS (+1)
                                    d_app = _on_join_d(
                                        _on_join_d(d_aff, f_old_full, "left_semi"),
                                        f_new_full, "left_anti",
                                    ).withColumn("__dw", F.lit(1))
                                    # gained matches → it RETRACTS (−1)
                                    d_ret = _on_join_d(
                                        _on_join_d(d_aff, f_old_full, "left_anti"),
                                        f_new_full, "left_semi",
                                    ).withColumn("__dw", F.lit(-1))
                                    _add(
                                        f_old_full.limit(0), F.lit(1),
                                        dd=d_app, wmode="dim",
                                    )
                                    _add(
                                        f_old_full.limit(0), F.lit(1),
                                        dd=d_ret, wmode="dim",
                                    )
                                elif right_like and cur != mv.base_version:
                                    fkeys6 = (
                                        changes.filter(fact_nn(changes))
                                        .select(fact_key(changes).alias("__mv_fk"))
                                        .distinct()
                                    )
                                    f_new_full = self.sinks[mv.base].scan(
                                        self.spark, version=cur
                                    )

                                    def _fkc(fdf, out):
                                        if fpred is not None:
                                            # only residual-passing fact
                                            # rows count as matches
                                            fdf = fdf.filter(fpred(fdf))
                                        return (
                                            fdf.join(
                                                F.broadcast(fkeys6),
                                                fact_key(fdf) == fkeys6["__mv_fk"],
                                                "left_semi",
                                            )
                                            .groupBy(fact_key(fdf).alias("__mv_fk"))
                                            .agg(F.count(F.lit(1)).alias(out))
                                        )

                                    fflips = (
                                        fkeys6.join(
                                            _fkc(f_old_full, "__mv_mo"), "__mv_fk", "left"
                                        )
                                        .join(_fkc(f_new_full, "__mv_mn"), "__mv_fk", "left")
                                        .select(
                                            "__mv_fk",
                                            F.coalesce("__mv_mo", F.lit(0)).alias("__mv_mo"),
                                            F.coalesce("__mv_mn", F.lit(0)).alias("__mv_mn"),
                                        )
                                        .filter(
                                            (F.col("__mv_mo") == 0)
                                            != (F.col("__mv_mn") == 0)
                                        )
                                        .withColumn(
                                            "__dw",
                                            F.when(
                                                F.col("__mv_mn") == 0, F.lit(1)
                                            ).otherwise(F.lit(-1)),
                                        )
                                        .select("__mv_fk", "__dw")
                                    )
                                    # only match-ABLE dim rows flip; a
                                    # residual-failing dim row is
                                    # permanently null-extended
                                    d6 = d_new_m.join(
                                        F.broadcast(fflips),
                                        dim_key(d_new_m) == fflips["__mv_fk"],
                                        "inner",
                                    ).drop("__mv_fk")
                                    _add(
                                        f_old_full.limit(0), F.lit(1),
                                        dd=d6, wmode="dim",
                                    )

                                delta = terms[0]
                                for t in terms[1:]:
                                    delta = delta.unionByName(t)
                                merged = merge_state(mv, mv.internal, delta)
                                if mv.has_extrema:
                                    merged = repair_extrema(self, mv, merged, cur, dim_version=d_cur)
                                mv.internal = persist_state(mv, merged)
                                if mv.has_distinct:
                                    sub_terms = [
                                        sub_state_frames(
                                            self, mv, df, wt, dim_df=dd,
                                            weight_mode=wmode,
                                            join_override=jo,
                                        )
                                        for df, wt, dd, wmode, jo in sub_specs
                                    ]
                                    deltas = []
                                    for i in range(len(sub_terms[0])):
                                        u = sub_terms[0][i]
                                        for t in sub_terms[1:]:
                                            u = u.unionByName(t[i])
                                        deltas.append(u)
                                    _fold_substates(mv, deltas)
                            finally:
                                if saved is _UNSET:
                                    self.tables.pop(mv.dim, None)
                                else:
                                    self.tables[mv.dim] = saved
                            mv.dim_version = d_cur
                    if mode == "incremental":
                        mv.base_version = cur
        if mode == "full":
            if mv.incremental:
                if fresh_sv is not None:
                    # rebuild under the CURRENT scalar-subquery values
                    from .matview import apply_scalar_subs

                    apply_scalar_subs(mv, fresh_sv)
                sink = self.sinks[mv.base]
                mv.base_version = max(sink.versions())
                if mv.dim:
                    # a dim commit forced this full recompute; re-pin it
                    mv.dim_version = max(self.sinks[mv.dim].versions())
                base_df = sink.scan(self.spark, version=mv.base_version)
                if mv.in_table:
                    # re-pin the IN-subquery table and membership-filter
                    # the rebuild input (state selects carry where_rest)
                    from .matview import csc_filter, in_membership_filter

                    mv.in_version = max(self.sinks[mv.in_table].versions())
                    if mv.csc_pred is not None:
                        base_df = csc_filter(self, mv, base_df)
                    else:
                        base_df = in_membership_filter(self, mv, base_df)
                        if mv.in2_table:
                            mv.in2_version = max(
                                self.sinks[mv.in2_table].versions()
                            )
                            base_df = in_membership_filter(
                                self, mv, base_df, ctx=2
                            )
                mv.internal = persist_state(
                    mv, state_frame(self, mv, base_df, F.lit(1), weight_mode="one").drop("__mv_neg")
                )
                if mv.has_distinct:
                    mv.substates = persist_substates(
                        mv, sub_state_frames(self, mv, base_df, F.lit(1), weight_mode="one")
                    )
            else:
                mv.internal = persist_state(mv, self._select_any(mv.select))
        if mode != "noop":
            self.register_df(lname, exposed_frame(mv))
        return (view, mode, v_from, mv.base_version)
