"""Matview shape fuzzer over the FULL supported vocabulary × random
mutation interleavings — the single test that sweeps the cross products
the per-feature differentials can't enumerate (DISTINCT × HAVING ×
top-k × join type × key side × extrema side × durable state × WHERE ×
dim churn).

Every seed walks a stratified worklist that guarantees each ELIGIBILITY
CLASS appears at least once (asserted against a census, printed per
seed), while the concrete aggs/extras/mutations stay seed-random:

- key side: fact (`f.dk`), dim (`d.dname`), compound (both)
- join: none / INNER / LEFT / RIGHT / FULL OUTER / INNER self-join
- extrema probe sides: fact (INNER/LEFT/self + fact keys), dim
  (INNER/RIGHT + dim keys); probe-less extrema shapes (FULL joins,
  LEFT+dim-key, RIGHT+fact-key, mixed compound keys) maintain via the
  MULTISET substate since r13 — asserted to analyze as min_set/max_set
  AND fold correctly under churn incl. extremum deletes
- expected-FULL fallbacks, asserted to (a) analyze as non-incremental
  AND (b) still compute correctly: ordered-set collects whose ORDER
  key differs from the argument — eligibility regressions in EITHER
  direction are the failure mode
- extras rotated across slots per seed: HAVING, top-k, durable
  `WITH {"path"}` state, alternate WHERE predicates, DISTINCT aggs,
  variance aggs, FILTER, windows, QUALIFY, median, mode, corr/covar
- RIGHT/FULL slots get forced dim churn (the six-term matrix);
  every joined slot sees at least one dim mutation

Seeded and deterministic."""

import random

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.sinks import ParquetMergeSink


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


def _approx_eq(got, want):
    if len(got) != len(want):
        return False
    for gr, wr in zip(got, want):
        for gv, wv in zip(gr, wr):
            if isinstance(gv, float) and isinstance(wv, float):
                if abs(gv - wv) > 1e-9 * max(1.0, abs(wv)):
                    return False
            elif gv != wv:
                return False
    return True


#: one entry per eligibility class the census must cover (per seed)
REQUIRED = {
    "key_fact", "key_dim", "key_compound",
    "join_none", "join_inner", "join_left", "join_right", "join_full",
    "join_self",
    "agg_distinct", "agg_variance", "agg_extrema",
    "extrema_fact_probe", "extrema_dim_probe", "extrema_self_probe",
    "set_extrema_full", "set_extrema_left_dimkey",
    "set_extrema_right_factkey", "set_extrema_compoundkey",
    "fallback_ordered_agg", "pair_ordered_agg", "pair_ordered_multi",
    "having", "topk", "durable_state", "where_alt",
    "agg_filter", "window_col", "qualify", "agg_median", "agg_mode",
    "agg_covar", "residual_on", "scalar_sub",
    "in_sub", "in_sub_not", "exists_sub", "exists_sub_not", "expose_sub",
    "corr_scalar", "in_sub_not_nn", "quant_any", "quant_all",
    "quant_eq_all", "quant_ne_any", "exists_cmp",
    "in_sub_join", "corr_scalar_join",
    "in_sub_left_join", "corr_scalar_left_join", "in_sub_two",
    "cross_on_left", "cross_on_inner", "cross_on_right", "cross_on_full",
    "pairless_on_left", "pairless_on_right", "pairless_on_full",
    "dim_churn", "dim_churn_right_full",
}

#: (join, key, extrema?, eligible?) — the stratified slots every seed
#: walks; `extras` rotate over them per seed. `rounds` trims the
#: expected-FULL fallbacks to one mutate+refresh window (they only pin
#: eligibility + correctness, not fold algebra). The probe-less extrema
#: shapes (r12's fallbacks) are ELIGIBLE since r13 — multiset substate.
SLOTS = [
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2),
    dict(join="INNER", key="compound", extrema=False, eligible=True, rounds=2),
    dict(join="LEFT", key="fact", extrema=True, eligible=True, rounds=2),
    dict(join="RIGHT", key="dim", extrema=True, eligible=True, rounds=2),
    dict(join="FULL OUTER", key=None, extrema=False, eligible=True, rounds=2),
    dict(join="SELF", key="fact", extrema=False, eligible=True, rounds=2),
    dict(join="FULL OUTER", key="fact", extrema=True, eligible=True, rounds=2),
    dict(join="LEFT", key="dim", extrema=True, eligible=True, rounds=2),
    dict(join="RIGHT", key="fact", extrema=True, eligible=True, rounds=2),
    dict(join="INNER", key="compound", extrema=True, eligible=True, rounds=2),
    dict(join="SELF", key="fact", extrema=True, eligible=True, rounds=2),
    dict(join="INNER", key="fact", extrema=False, agg="ordered", eligible=True, rounds=2),
    dict(join=None, key="fact", extrema=False, agg="ordered_multi", eligible=True, rounds=2),
    dict(join=None, key="fact", extrema=False, agg="ordered_filter", eligible=False, rounds=1),
    # residual ON conjunct (f.k = d.k AND <single-side residual>):
    # match counting over residual-filtered snapshots (r13)
    dict(join="RIGHT", key="dim", extrema=False, eligible=True, rounds=2, on_residual=True),
    # r14: `k IN (SELECT ...)` WHERE — the IN-list maintains as a
    # 1-column dim (semi-join delta algebra; d churn drives flips)
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub=True),
    # UNPROVABLE NOT IN stays full (ANSI NULL semantics aren't per-key
    # flips) — pinned in BOTH directions like every fallback
    dict(join=None, key="fact", extrema=False, eligible=False, rounds=1, in_sub="not"),
    # r15: NOT IN with both NULL traps statically closed (null-rejecting
    # conjuncts on the outer key and inner value) → anti-membership;
    # `= ANY` is membership; `<> ALL` is the provable NOT IN twin
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub="not_nn"),
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub="quant_any"),
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub="quant_all"),
    # r16: equality-quantified twins rewrite to extremum PAIRS
    # (= ALL ⟺ empty OR (= min AND = max); != ANY is the negation twin)
    # and ride the frozen-scalar machinery — d churn may legitimately
    # move the frozen values (mode assertion tolerates "full")
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub="quant_eq_all"),
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub="quant_ne_any"),
    # r16: non-equi-correlated EXISTS rewrites to an uncorrelated
    # extremum scalar (frozen — d churn may move it, "full" tolerated)
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub="exists_cmp"),
    # r14: correlated [NOT] EXISTS — the anti-membership twin of IN
    # (NOT EXISTS has no NULL trap, so BOTH directions maintain)
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, exists_sub=True),
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, exists_sub="not"),
    # r15: correlated SCALAR subquery WHERE — the per-key scalar is a
    # 1-column dim; s churn flips base rows per ROW (predicate couples
    # row columns with the scalar)
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, csc=True),
    # r15: set contexts on INNER-JOIN views (fact-side key): trilinear
    # identity — T_a vs D_new, flips vs D_old, T2' = (F_old⋉M_new) ⋈ ΔD.
    # The subquery table is the FACT table itself (self-membership) so
    # the fuzzer's two-table setup exercises all three feeds.
    dict(join="INNER", key="fact", extrema=False, eligible=True, rounds=2, in_sub="join"),
    dict(join="INNER", key="compound", extrema=False, eligible=True, rounds=2, csc="join"),
    # r16: set contexts on LEFT-JOIN views — dim commits fold via the T4
    # null-extension flips composed with membership over the trilinear
    # midpoint G_mid = F_old ⋉ M_new (self-membership again, so fact
    # commits drive membership flips AND null-extension bookkeeping)
    dict(join="LEFT", key="fact", extrema=False, eligible=True, rounds=2, in_sub="join"),
    dict(join="LEFT", key="fact", extrema=False, eligible=True, rounds=2, csc="join"),
    # r16: TWO independent membership conjuncts over distinct tables
    # (d and e) — the membership product telescopes, no cross term
    dict(join=None, key="fact", extrema=False, eligible=True, rounds=2, in_sub="two"),
    # r14: two-sided non-equi ON conjuncts — EVERY join shape maintains
    # (INNER via the bilinear terms; outer shapes via the per-row
    # match-state semi/anti terms T4'/T5'/T6')
    dict(join="LEFT", key="fact", extrema=False, eligible=True, rounds=2, on_cross=True),
    dict(join="INNER", key="fact", extrema=False, eligible=True, rounds=2, on_cross=True),
    dict(join="RIGHT", key="dim", extrema=False, eligible=True, rounds=2, on_cross=True),
    dict(join="FULL OUTER", key="fact", extrema=False, eligible=True, rounds=2, on_cross=True),
    # r16: PAIRLESS ONs (no equality conjunct at all) — the per-row
    # match-state terms prune the affected slice with an ON-semi-join
    # against the delta's images instead of a key lookup
    dict(join="LEFT", key="fact", extrema=False, eligible=True, rounds=2, on_pairless=True),
    dict(join="RIGHT", key="dim", extrema=False, eligible=True, rounds=2, on_pairless=True),
    dict(join="FULL OUTER", key="fact", extrema=False, eligible=True, rounds=2, on_pairless=True),
]

EXTRAS = [
    "having", "topk", "durable", "where_alt", "distinct", "variance",
    "filter_agg", "window", "qualify", "median", "mode", "covar",
    "scalar_sub", "es_having",
]


def _mk_sql(rng, slot, extra, state_path):
    join, key = slot["join"], slot["key"]
    if key is None:
        key = rng.choice(["fact", "dim", "compound"])
    self_join = join == "SELF"
    keys = {
        "fact": [("f.dk", "k")],
        "dim": [("d.dname", "g")],
        "compound": [("f.dk", "k"), ("d.dname", "g")],
    }[key]
    classes = {f"key_{key}"}
    classes.add(
        "join_none" if join is None
        else "join_self" if self_join
        else f"join_{join.split()[0].lower()}"
    )

    aggs = ["count(*) AS n"]
    plain = ["sum(f.x) AS s", "avg(f.x) AS a", "count(f.x) AS cx"]
    if self_join:
        plain.append("sum(g.x) AS gs")
    elif join is not None:
        plain.append("count(d.dname) AS cd")
    aggs += rng.sample(plain, rng.randint(1, 2))
    if slot["extrema"]:
        classes.add("agg_extrema")
        pool = ["min(f.x) AS lo", "max(f.x) AS hi"]
        if join is not None and not self_join and rng.random() < 0.5:
            pool.append("min(d.dname) AS dlo")
        aggs.append(rng.choice(pool))
    if slot.get("agg") == "ordered":
        # ORDER BY a DIFFERENT key: the PAIR substate retains the
        # (order-key, value) pairing — eligible since r14
        classes.add("pair_ordered_agg")
        aggs.append("array_agg(f.x ORDER BY f.id) AS aa")
    elif slot.get("agg") == "ordered_multi":
        # MULTIPLE ORDER keys: the pair substate grains by every key
        classes.add("pair_ordered_multi")
        aggs.append("array_agg(f.x ORDER BY f.dk, f.id) AS aa")
    elif slot.get("agg") == "ordered_filter":
        # FILTER on an ordered collect: the guard would desync keys
        # from the argument — stays full
        classes.add("fallback_ordered_agg")
        aggs.append("array_agg(f.x ORDER BY f.x) FILTER (WHERE f.id > 3) AS aa")
    if extra == "distinct":
        classes.add("agg_distinct")
        aggs.append(
            "count(DISTINCT g.x) AS dx" if self_join
            else rng.choice(["count(DISTINCT f.x) AS dx", "sum(DISTINCT f.x) AS sx"])
        )
    elif extra == "variance":
        classes.add("agg_variance")
        aggs.append(rng.choice(["stddev(f.x) AS sd", "var_pop(f.x) AS vp"]))
    elif extra == "median":
        classes.add("agg_median")
        aggs.append("median(g.x) AS md" if self_join else "median(f.x) AS md")
    elif extra == "mode":
        classes.add("agg_mode")
        aggs.append("mode(g.x) AS mo" if self_join else "mode(f.x) AS mo")
    elif extra == "covar":
        classes.add("agg_covar")
        aggs.append(
            "corr(f.id, g.x) AS cv" if self_join
            else rng.choice(
                ["corr(f.id, f.x) AS cv", "covar_samp(f.id, f.x) AS cv",
                 "covar_pop(f.id, f.x) AS cv"]
            )
        )
    elif extra == "filter_agg":
        classes.add("agg_filter")
        aggs.append(
            rng.choice(
                [
                    "sum(f.x) FILTER (WHERE f.x > 3) AS sf",
                    "count(*) FILTER (WHERE f.x > 3) AS nf",
                    "count(DISTINCT f.x) FILTER (WHERE f.dk < 4) AS dff",
                ]
            )
        )
    elif extra == "window":
        # deterministic: ties broken by the (unique) group key alias
        classes.add("window_col")
        aggs.append(f"rank() OVER (ORDER BY n DESC, {keys[0][1]}) AS rw")

    where = "f.id > 1"
    if extra == "where_alt":
        classes.add("where_alt")
        where = rng.choice(["f.x IS NOT NULL", "f.id > 1 AND f.dk < 6"])
    elif extra == "scalar_sub":
        # frozen uncorrelated scalar subquery (freeze-and-verify): dim
        # churn may move the value, forcing a legitimate full rebuild —
        # the refresh-mode assertion tolerates "full" for this extra
        classes.add("scalar_sub")
        where = "f.x > (SELECT min(d2.dk) FROM d d2)"

    if slot.get("in_sub"):
        # placed AFTER the extras' WHERE choice so row-local rests
        # compose; the swap in the test loop keeps WHERE-rewriting
        # extras (where_alt/scalar_sub) off these slots
        kind = slot["in_sub"]
        if kind == "not_nn":
            classes.add("in_sub_not_nn")
            where = (
                "f.dk IS NOT NULL AND f.dk NOT IN "
                f"(SELECT d2.dk FROM d d2 WHERE d2.dk < 5) AND {where}"
            )
        elif kind == "quant_any":
            classes.add("quant_any")
            where = f"f.dk = ANY (SELECT d2.dk FROM d d2 WHERE d2.dk < 5) AND {where}"
        elif kind == "quant_all":
            classes.add("quant_all")
            where = (
                "f.dk IS NOT NULL AND f.dk <> ALL "
                f"(SELECT d2.dk FROM d d2 WHERE d2.dk < 5) AND {where}"
            )
        elif kind == "quant_eq_all":
            classes.add("quant_eq_all")
            where = f"f.dk = ALL (SELECT d2.dk FROM d d2 WHERE d2.dk = 3) AND {where}"
        elif kind == "quant_ne_any":
            classes.add("quant_ne_any")
            where = f"f.dk != ANY (SELECT d2.dk FROM d d2 WHERE d2.dk = 1) AND {where}"
        elif kind == "exists_cmp":
            classes.add("exists_cmp")
            neg = rng.choice(["", "NOT "])
            where = (
                f"{neg}EXISTS (SELECT 1 FROM d d6 WHERE d6.dk > f.x AND d6.dk < 90)"
                f" AND {where}"
            )
        elif kind == "join":
            # IN on an INNER/LEFT-join view, fact-side key; the subquery
            # is SELF-membership (over the fact) so every feed interacts
            classes.add("in_sub_left_join" if join == "LEFT" else "in_sub_join")
            where = f"f.dk IN (SELECT f2.dk FROM f f2 WHERE f2.x > 3) AND {where}"
        elif kind == "two":
            # two memberships over DISTINCT tables (d and e): flips
            # compose through the other membership, both feeds churn
            classes.add("in_sub_two")
            where = (
                "f.dk IN (SELECT d2.dk FROM d d2 WHERE d2.dk < 5) AND "
                f"f.dk IN (SELECT e1.v FROM e e1 WHERE e1.y < 6) AND {where}"
            )
        else:
            neg = "NOT " if kind == "not" else ""
            classes.add("in_sub_not" if neg else "in_sub")
            where = f"f.dk {neg}IN (SELECT d2.dk FROM d d2 WHERE d2.dk < 5) AND {where}"
    elif slot.get("exists_sub"):
        neg = "NOT " if slot["exists_sub"] == "not" else ""
        classes.add("exists_sub_not" if neg else "exists_sub")
        where = (
            f"{neg}EXISTS (SELECT 1 FROM d d3 WHERE d3.dk = f.dk AND d3.dk < 6)"
            f" AND {where}"
        )
    elif slot.get("csc") == "join":
        # correlated scalar on an INNER/LEFT-join view: the scalar dim is
        # the THIRD table e (csc excludes the base and the view's dim)
        classes.add("corr_scalar_left_join" if join == "LEFT" else "corr_scalar_join")
        where = f"f.x > (SELECT avg(e1.y) FROM e e1 WHERE e1.v = f.dk) AND {where}"
    elif slot.get("csc"):
        # the s-local rest (dname >= 'n') makes forced dname updates
        # ('forced…', 'r…') move scalars in BOTH directions
        classes.add("corr_scalar")
        where = (
            "f.x > (SELECT avg(d4.dk) FROM d d4 WHERE d4.dk = f.dk "
            f"AND d4.dname >= 'n') AND {where}"
        )

    on = "f.dk = d.dk"
    if slot.get("on_residual"):
        classes.add("residual_on")
        on += rng.choice([" AND f.x > 2", " AND d.dk < 90"])
    elif slot.get("on_cross"):
        classes.add(f"cross_on_{(join or 'x').split()[0].lower()}")
        on += rng.choice([" AND f.x > d.dk", " AND f.x + d.dk < 9"])
    elif slot.get("on_pairless"):
        # incl. OR trees: the whole OR is one two-sided conjunct, so it
        # rides the same per-row recount terms
        classes.add(f"pairless_on_{(join or 'x').split()[0].lower()}")
        on = rng.choice([
            "f.x > d.dk", "f.x + d.dk < 7", "f.x > d.dk AND d.dk < 90",
            "f.dk = d.dk OR f.x > d.dk",
        ])
    sel = f"SELECT {', '.join(f'{e} AS {a}' for e, a in keys)}, {', '.join(aggs)} FROM f"
    if self_join:
        sel += " JOIN f g ON f.dk = g.dk"
    elif join == "INNER":
        sel += f" JOIN d ON {on}"
    elif join is not None:
        sel += f" {join} JOIN d ON {on}"
    sel += f" WHERE {where} GROUP BY {', '.join(e for e, _ in keys)}"
    if extra == "having":
        classes.add("having")
        sel += " HAVING n > 1"
    elif extra == "es_having":
        # expose-time scalar subquery in HAVING (r14): a moved value
        # re-exposes — mode stays incremental, never full
        classes.add("expose_sub")
        sel += " HAVING n > (SELECT min(d9.dk) FROM d d9) + 1"
    elif extra == "topk":
        classes.add("topk")
        sel += f" ORDER BY n DESC, {keys[0][1]} NULLS LAST LIMIT 4"
    elif extra == "qualify":
        classes.add("qualify")
        sel += f" QUALIFY rank() OVER (ORDER BY n DESC, {keys[0][1]}) <= 3"
    if extra == "durable":
        classes.add("durable_state")
        sel += f' WITH {{"path": "{state_path}"}}'

    # classify extrema shapes: probe-able sides vs multiset-backed
    # (set_extrema_*) — the slot-level eligibility pin holds either way
    if slot["extrema"]:
        if self_join:
            classes.add("extrema_self_probe")  # fact keys → left occurrence
        elif join == "FULL OUTER":
            classes.add("set_extrema_full")
        elif join == "LEFT" and key == "dim":
            classes.add("set_extrema_left_dimkey")
        elif join == "RIGHT" and key == "fact":
            classes.add("set_extrema_right_factkey")
        elif join == "INNER" and key == "compound":
            classes.add("set_extrema_compoundkey")
        elif join in (None, "INNER", "LEFT") and key == "fact":
            classes.add("extrema_fact_probe")
        elif join in ("INNER", "RIGHT") and key == "dim":
            classes.add("extrema_dim_probe")
    return sel, join, classes


@pytest.mark.parametrize("seed", [20260824, 20260825, 20260826, 20260827])
def test_matview_shape_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    eng = Engine(spark, f"mvfz-{seed}")
    fact = ParquetMergeSink(spark, str(tmp_path / "fz_f"), key="id")
    fact.ensure(
        spark.createDataFrame(
            [(i, i % 5, float(i % 9) if i % 11 else None) for i in range(60)],
            "id long, dk int, x double",
        )
    )
    dim = ParquetMergeSink(spark, str(tmp_path / "fz_d"), key="dk")
    dim.ensure(
        spark.createDataFrame([(k, f"n{k}") for k in range(4)], "dk int, dname string")
    )
    eng.register_sink("f", fact)
    eng.register_sink("d", dim)
    # third table for the corr_scalar_join slot (csc excludes the base
    # and the view's own dim as the scalar's source)
    esink = ParquetMergeSink(spark, str(tmp_path / "fz_e"), key="eid")
    esink.ensure(
        spark.createDataFrame(
            [(i, i % 6, float(i % 9)) for i in range(24)],
            "eid long, v int, y double",
        )
    )
    eng.register_sink("e", esink)

    extras = EXTRAS + [None] * (len(SLOTS) - len(EXTRAS))
    rng.shuffle(extras)
    slots = list(SLOTS)
    rng.shuffle(slots)
    pairs = list(zip(slots, extras))
    # in_sub slots can't carry WHERE-REWRITING extras (the IN conjunct
    # composes with row-local rests only); swap those onto a safe slot
    for i, (sl, ex) in enumerate(pairs):
        if (
            sl.get("in_sub") or sl.get("exists_sub") or sl.get("csc")
        ) and ex in ("where_alt", "scalar_sub"):
            for j, (sl2, ex2) in enumerate(pairs):
                if (
                    not sl2.get("in_sub")
                    and not sl2.get("exists_sub")
                    and not sl2.get("csc")
                    and ex2 not in ("where_alt", "scalar_sub")
                ):
                    pairs[i], pairs[j] = (sl, ex2), (sl2, ex)
                    break

    census = {}
    next_id, next_dk = 60, 6
    for slot_i, (slot, extra) in enumerate(pairs):
        q, join, classes = _mk_sql(rng, slot, extra, tmp_path / f"state{slot_i}")
        eng.execute(f"CREATE OR REPLACE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        # eligibility must match the slot's expectation IN BOTH
        # DIRECTIONS: silently falling to full recompute hides a lost
        # capability; silently becoming "incremental" on an unsupported
        # shape would corrupt results
        assert mv.incremental == slot["eligible"], q
        if slot["extrema"] and mv.incremental:
            # probe-able shapes must keep O(1) scalar extremum state;
            # probe-less shapes must ride the multiset — a silent swap
            # in either direction is a regression (state-size or repair
            # machinery respectively)
            kinds = {a.kind for a in mv.aggs}
            if any(c.startswith("set_extrema") for c in classes):
                assert kinds & {"min_set", "max_set"}, (q, kinds)
            else:
                assert kinds & {"min", "max"}, (q, kinds)
        assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, q)), q

        dim_churned = False
        for round_ in range(slot["rounds"]):
            ops = ["ins", "upd", "del"]
            if (
                (join is not None and join != "SELF")
                or slot.get("in_sub")
                or slot.get("exists_sub")
                or slot.get("csc")
            ):
                ops += ["dins", "dupd", "ddel"]
            if slot.get("csc") == "join" or slot.get("in_sub") == "two":
                ops += ["eupd", "edel"]
            for _ in range(rng.randint(1, 2)):
                op = rng.choice(ops)
                if op == "ins":
                    x = rng.choice([str(float(rng.randint(0, 9))), "NULL"])
                    eng.execute(
                        f"INSERT INTO f (id, dk, x) VALUES "
                        f"({next_id}, {rng.randint(0, next_dk)}, {x})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE f SET x = {float(rng.randint(0, 9))} "
                        f"WHERE id % {rng.randint(2, 7)} = 0"
                    )
                elif op == "del":
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 11)} = 1")
                elif op == "dins":
                    eng.execute(
                        f"INSERT INTO d (dk, dname) VALUES ({next_dk}, 'n{next_dk}')"
                    )
                    next_dk += 1
                    dim_churned = True
                elif op == "dupd":
                    eng.execute(
                        f"UPDATE d SET dname = 'r{rng.randint(0, 99)}' "
                        f"WHERE dk = {rng.randint(0, next_dk)}"
                    )
                    dim_churned = True
                elif op == "ddel":
                    eng.execute(f"DELETE FROM d WHERE dk = {rng.randint(0, next_dk)}")
                    dim_churned = True
                elif op == "eupd":
                    eng.execute(
                        f"UPDATE e SET y = {float(rng.randint(0, 9))} "
                        f"WHERE eid % {rng.randint(2, 5)} = 0"
                    )
                elif op == "edel":
                    eng.execute(f"DELETE FROM e WHERE eid % {rng.randint(6, 11)} = 3")
            if (
                join is not None
                and join != "SELF"
                and not dim_churned
                and round_ == slot["rounds"] - 1
            ):
                # every joined slot must see dim churn at least once
                eng.execute(
                    f"UPDATE d SET dname = 'forced{slot_i}' WHERE dk = {rng.randint(0, 3)}"
                )
                dim_churned = True
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            if slot["eligible"]:
                ok_modes = ("incremental", "noop")
                if extra == "scalar_sub" or slot.get("in_sub") in (
                    "quant_eq_all", "quant_ne_any", "exists_cmp"
                ):
                    # a moved frozen value forces one legitimate rebuild
                    ok_modes = ("incremental", "noop", "full")
                assert rep["mode"] in ok_modes, (q, round_, rep["mode"])
            else:
                assert rep["mode"] == "full", (q, round_, rep["mode"])
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, q)
            assert _approx_eq(got, want), (q, round_, got, want)
        if dim_churned:
            classes.add("dim_churn")
            if join in ("RIGHT", "FULL OUTER"):
                classes.add("dim_churn_right_full")
        for c in classes:
            census[c] = census.get(c, 0) + 1
        eng.execute("DROP MATERIALIZED VIEW mv")

    print(f"census[{seed}]:", dict(sorted(census.items())))
    missing = REQUIRED - set(census)
    assert not missing, f"eligibility classes never exercised: {sorted(missing)}"
