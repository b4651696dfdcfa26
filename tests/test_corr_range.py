"""Range-correlated scalar subqueries, composite count expressions,
correlated IN membership columns, and LIMIT 1 lookup variants (round 7).

Reference parity note: the reference refuses EVERY WHERE-position subquery
(/root/reference/plan/planner_select.go:94-98) — this whole file is
superset surface. Semantics are pinned against DuckDB-computed expected
values (the same frames run through duckdb in scripts/check_oracle.py
shapes; literals here were cross-checked by tests/conftest-independent
runs)."""

from __future__ import annotations

import pytest

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError


@pytest.fixture(scope="module")
def reng(spark):
    ev = spark.createDataFrame(
        [
            (1, "a", 10, 100.0),
            (2, "a", 20, 200.0),
            (3, "b", 30, 300.0),
            (4, "b", 5, 50.0),
            (5, "c", 7, None),
            (6, None, 9, 90.0),
        ],
        "id int, k string, ts int, v double",
    )
    ref = spark.createDataFrame(
        [
            (1, "a", 5, 1.0),
            (2, "a", 15, 2.0),
            (3, "a", 25, 3.0),
            (4, "b", 30, 4.0),
            (5, "d", 1, 9.0),
            (6, "b", None, 7.0),
        ],
        "rid int, k string, ts int, v double",
    )
    eng = Engine(spark, "corr_range")
    eng.register_df("ev", ev)
    eng.register_df("ref", ref)
    return eng


def rows_of(eng, q):
    return {r[0]: tuple(r)[1:] for r in eng.sql(q).collect()}


class TestRangeCorrelatedScalar:
    def test_max_at_or_before(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT max(r.v) FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AS p FROM ev",
        )
        # a@10→{5}→1.0; a@20→{5,15}→2.0; b@30→{30}→4.0 (NULL inner ts drops);
        # b@5→empty→NULL; c→no key→NULL; NULL outer key→NULL
        assert got == {1: (1.0,), 2: (2.0,), 3: (4.0,), 4: (None,), 5: (None,), 6: (None,)}

    def test_strict_before_count_bug(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT count(*) FROM ref r WHERE r.k = ev.k AND r.ts < ev.ts) AS n FROM ev",
        )
        # count over the empty range set is 0, not NULL (count-bug through
        # the PROBE path); b@30: ts<30 matches nothing (30 not <, NULL drops)
        assert got == {1: (1,), 2: (2,), 3: (0,), 4: (0,), 5: (0,), 6: (0,)}

    def test_range_only_no_equality(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT count(*) FROM ref r WHERE r.ts > ev.ts) AS n FROM ev",
        )
        # inner ts values {5,15,25,30,1,NULL}; per outer ts count strictly greater
        assert got == {1: (3,), 2: (2,), 3: (0,), 4: (3,), 5: (3,), 6: (3,)}

    def test_sum_with_ties_included(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT sum(r.v) FROM ref r WHERE r.k = ev.k AND r.ts >= ev.ts) AS s FROM ev",
        )
        # b@30: ts>=30 → exactly the tie row (4.0); a@10 → {15,25} → 5.0
        assert got[3] == (4.0,)
        assert got[1] == (5.0,)
        assert got[4] == (4.0,)  # b@5 → {30} only (NULL ts never matches)


class TestCompositeCountExpr:
    def test_count_plus_one_empty_set(self, reng):
        got = rows_of(reng, "SELECT id, (SELECT count(*) + 1 FROM ref r WHERE r.k = ev.k) AS c FROM ev")
        # empty correlated set → count(*)+1 = 1 (NOT NULL): ids 5 (k=c) and 6 (k NULL)
        assert got == {1: (4,), 2: (4,), 3: (3,), 4: (3,), 5: (1,), 6: (1,)}

    def test_scaled_count(self, reng):
        got = rows_of(reng, "SELECT id, (SELECT 2 * count(r.ts) FROM ref r WHERE r.k = ev.k) AS c FROM ev")
        # count(col) skips the NULL ts row for k=b → 2*1=2; empty sets → 0
        assert got == {1: (6,), 2: (6,), 3: (2,), 4: (2,), 5: (0,), 6: (0,)}


class TestCorrelatedMembershipColumn:
    def test_select_list_three_valued(self, reng):
        got = rows_of(reng, "SELECT id, ev.ts IN (SELECT r.ts FROM ref r WHERE r.k = ev.k) AS m FROM ev")
        # a@10/a@20: no match, no NULL in {5,15,25} → False; b@30 → True;
        # b@5: no match but inner set {30,NULL} has NULL → UNKNOWN;
        # empty sets (c, NULL key) → False
        assert got == {1: (False,), 2: (False,), 3: (True,), 4: (None,), 5: (False,), 6: (False,)}

    def test_not_in_three_valued(self, reng):
        got = rows_of(reng, "SELECT id, ev.ts NOT IN (SELECT r.ts FROM ref r WHERE r.k = ev.k) AS m FROM ev")
        assert got == {1: (True,), 2: (True,), 3: (False,), 4: (None,), 5: (True,), 6: (True,)}

    def test_disjunctive_where(self, reng):
        got = rows_of(
            reng,
            "SELECT id, ev.v FROM ev WHERE ev.ts IN (SELECT r.ts FROM ref r WHERE r.k = ev.k) OR ev.v > 250",
        )
        assert set(got) == {3}


class TestLimitOneLookups:
    def test_multikey_order_by_limit1(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT r.v FROM ref r WHERE r.k = ev.k ORDER BY r.ts DESC, r.v ASC LIMIT 1) AS x FROM ev",
        )
        # k=a → max ts 25 → 3.0; k=b → NULLS LAST puts ts=30 first → 4.0
        assert got == {1: (3.0,), 2: (3.0,), 3: (4.0,), 4: (4.0,), 5: (None,), 6: (None,)}

    def test_limit1_no_order_by_no_error(self, reng):
        # LIMIT 1 without ORDER BY: any row is valid — restrict to a
        # single-row key so the assertion is deterministic
        got = rows_of(
            reng,
            "SELECT id, (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.rid = 4 LIMIT 1) AS x FROM ev",
        )
        assert got[3] == (4.0,) and got[1] == (None,)

    def test_multirow_without_limit_still_errors(self, reng):
        import py4j.protocol

        with pytest.raises(Exception, match="more than one row"):
            reng.sql("SELECT id, (SELECT r.v FROM ref r WHERE r.k = ev.k) AS x FROM ev").collect()


class TestRangeCorrelatedIn:
    """Membership columns with RANGE correlation (select list /
    disjunctions) — probe-tuple decorrelation with the match marker
    folded into the stats aggregate. Expected values cross-checked
    against DuckDB on the same frames."""

    def test_range_only_membership_always_false(self, reng):
        # x IN {r.ts : r.ts > x} can never contain x itself
        got = rows_of(reng, "SELECT id, ev.ts IN (SELECT r.ts FROM ref r WHERE r.ts > ev.ts) AS m FROM ev")
        assert got == {i: (False,) for i in range(1, 7)}

    def test_null_x_against_nonempty_set_is_unknown(self, reng):
        # id 5 has v NULL and a NON-empty correlated set → UNKNOWN, while
        # empty sets (id 6 via NULL-key … none here) stay FALSE
        got = rows_of(reng, "SELECT id, ev.v IN (SELECT r.v FROM ref r WHERE r.ts < ev.ts) AS m FROM ev")
        assert got == {1: (False,), 2: (False,), 3: (False,), 4: (False,), 5: (None,), 6: (False,)}

    def test_null_in_set_poisons_unmatched(self, reng):
        # k=b matches ref rows (ts=30) and (ts=NULL): id 3 finds 30 →
        # TRUE; id 4 is unmatched against a set containing NULL → UNKNOWN;
        # empty sets (c / NULL key) → FALSE
        got = rows_of(
            reng,
            "SELECT id, ev.ts IN (SELECT r.ts FROM ref r WHERE r.k = ev.k AND r.v <= ev.v) AS m FROM ev",
        )
        assert got == {1: (False,), 2: (False,), 3: (True,), 4: (None,), 5: (False,), 6: (False,)}

    def test_not_in_three_valued(self, reng):
        got = rows_of(
            reng,
            "SELECT id, ev.ts NOT IN (SELECT r.ts FROM ref r WHERE r.k = ev.k AND r.v <= ev.v) AS m FROM ev",
        )
        assert got == {1: (True,), 2: (True,), 3: (False,), 4: (None,), 5: (True,), 6: (True,)}

    def test_disjunctive_where_position(self, reng):
        got = rows_of(
            reng,
            "SELECT id, ev.ts FROM ev WHERE ev.ts IN (SELECT r.ts FROM ref r WHERE r.k = ev.k AND r.v <= ev.v) OR ev.ts = 7",
        )
        assert set(got) == {3, 5}


class TestCorrelatedExistsColumn:
    def test_select_list_exists(self, reng):
        got = rows_of(reng, "SELECT id, EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k) AS e FROM ev")
        assert got == {1: (True,), 2: (True,), 3: (True,), 4: (True,), 5: (False,), 6: (False,)}

    def test_select_star_inner(self, reng):
        # EXISTS ignores the inner select list (normalized to SELECT 1)
        got = rows_of(reng, "SELECT id, EXISTS (SELECT * FROM ref r WHERE r.k = ev.k AND r.v > 3) AS e FROM ev")
        assert got == {1: (False,), 2: (False,), 3: (True,), 4: (True,), 5: (False,), 6: (False,)}

    def test_disjunctive_exists(self, reng):
        got = rows_of(
            reng,
            "SELECT id, ev.v FROM ev WHERE EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k AND r.v > 3) OR ev.v > 250",
        )
        assert set(got) == {3, 4}

    def test_disjunctive_not_exists(self, reng):
        got = rows_of(
            reng,
            "SELECT id, ev.v FROM ev WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k) OR ev.ts = 30",
        )
        # no-match keys (c, NULL) pass via NOT EXISTS; id 3 via ts
        assert set(got) == {3, 5, 6}

    def test_top_level_conjunct_keeps_semi_join(self, reng, spark):
        df = reng.sql("SELECT id FROM ev WHERE EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k)")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan  # mark-column lowering must NOT claim conjuncts


class TestRangeWindowFastPath:
    """Single-range whitelisted aggregates lower through the union +
    running-window plan (no range join, one fewer shuffle); everything
    else keeps the probe-join fallback. Values themselves are pinned by
    TestRangeCorrelatedScalar, which now runs through this path."""

    Q_WIN = "SELECT id, (SELECT max(r.v) FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AS p FROM ev"
    # stddev is not window-whitelisted → probe path
    Q_PROBE = "SELECT id, (SELECT stddev(r.v) FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AS p FROM ev"

    @staticmethod
    def _plan(eng, q):
        # fresh build: a plan-cached DataFrame another test already
        # COLLECTED shows its finalized adaptive plan (more Exchange
        # nodes rendered), not the statement's initial plan
        eng.clear_plan_cache()
        return eng.sql(q)._jdf.queryExecution().executedPlan().toString()

    def test_window_plan_no_range_join(self, reng):
        plan = self._plan(reng, self.Q_WIN)
        assert "Window" in plan
        # every remaining join is an EQUI-join on the probe tuple (the
        # final left join back); the quadratic range-condition join that
        # the probe path needs must be gone
        assert plan.count("Join") <= self._plan(reng, self.Q_PROBE).count("Join")

    def test_probe_fallback_keeps_join(self, reng):
        plan = self._plan(reng, self.Q_PROBE)
        assert "Window" not in plan

    def test_window_beats_probe_on_exchanges(self, reng):
        win = self._plan(reng, self.Q_WIN).count("Exchange")
        probe = self._plan(reng, self.Q_PROBE).count("Exchange")
        assert win < probe

    def test_strict_tie_rows_excluded(self, reng):
        # ref has (k=b, ts=30); ev id=3 is (k=b, ts=30): strict < must
        # exclude the tied row even though both sort at the same ts
        got = rows_of(
            reng,
            "SELECT id, (SELECT count(*) FROM ref r WHERE r.k = ev.k AND r.ts < ev.ts) AS n FROM ev",
        )
        assert got[3] == (0,)

    def test_inclusive_tie_rows_included(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT count(*) FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AS n FROM ev",
        )
        assert got[3] == (1,)

    def test_count_column_skips_inner_nulls(self, reng):
        # count(r.v): rid=5 (k=d) never matches; v NULL rows not counted
        got = rows_of(
            reng,
            "SELECT id, (SELECT count(r.v) FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AS n FROM ev",
        )
        assert got == {1: (1,), 2: (2,), 3: (1,), 4: (0,), 5: (0,), 6: (0,)}


class TestRangeCorrelatedQuantified:
    """Quantified comparisons with RANGE correlation — per-probe-tuple
    (count, non-null, min, max) statistics. DuckDB-cross-checked."""

    def test_all_with_range(self, reng):
        # ev.v > ALL {r.v : r.k=ev.k, r.ts<=ev.ts}; empty sets → TRUE
        got = rows_of(
            reng,
            "SELECT id, ev.v > ALL (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AS m FROM ev",
        )
        # id 5 (k=c) has an EMPTY correlated set: ALL over the empty set
        # is TRUE even though ev.v is NULL there (ANSI vacuous truth)
        assert got == {1: (True,), 2: (True,), 3: (True,), 4: (True,), 5: (True,), 6: (True,)}

    def test_any_with_strict_range(self, reng):
        # ev.v < ANY {r.v : r.k=ev.k, r.ts<ev.ts}; empty sets → FALSE
        got = rows_of(
            reng,
            "SELECT id, ev.v < ANY (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.ts < ev.ts) AS m FROM ev",
        )
        assert got == {1: (False,), 2: (False,), 3: (False,), 4: (False,), 5: (False,), 6: (False,)}

    def test_range_only_some(self, reng):
        got = rows_of(reng, "SELECT id, ev.ts >= SOME (SELECT r.ts FROM ref r WHERE r.ts > ev.ts) AS m FROM ev")
        # x >= y with y strictly greater than x is always FALSE; empty → FALSE
        assert got == {i: (False,) for i in range(1, 7)}

    def test_conjunct_where_position(self, reng):
        got = rows_of(
            reng,
            "SELECT id, ev.v FROM ev WHERE ev.v > ALL (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AND ev.ts < 25",
        )
        # TRUE rows with ts<25: ids 1,2,4,6 plus id 5 (empty set → vacuous
        # TRUE despite NULL v); id 3 excluded by ts=30
        assert set(got) == {1, 2, 4, 5, 6}


class TestAsOfTop1WindowPath:
    """`(SELECT v … AND t.ts <= o.ts ORDER BY t.ts DESC LIMIT 1)` — the
    as-of lookup — lowers through the running-window path (last/first
    non-null value over the equality-key frame) when the ORDER BY key IS
    the range operand; other ORDER BY keys keep the probe path. DuckDB
    cross-checked."""

    def test_latest_at_or_before(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts ORDER BY r.ts DESC LIMIT 1) AS p FROM ev",
        )
        # a@10→ts5→1.0; a@20→ts15→2.0; b@30→ts30→4.0; b@5→empty→NULL
        assert got == {1: (1.0,), 2: (2.0,), 3: (4.0,), 4: (None,), 5: (None,), 6: (None,)}

    def test_earliest_at_or_after(self, reng):
        got = rows_of(
            reng,
            "SELECT id, (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.ts >= ev.ts ORDER BY r.ts ASC LIMIT 1) AS p FROM ev",
        )
        # a@10→ts15→2.0; a@20→ts25→3.0; b@30→ts30→4.0; b@5→ts30→4.0
        assert got == {1: (2.0,), 2: (3.0,), 3: (4.0,), 4: (4.0,), 5: (None,), 6: (None,)}

    def test_window_plan_engaged(self, reng):
        plan = reng.sql(
            "SELECT id, (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts ORDER BY r.ts DESC LIMIT 1) AS p FROM ev"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan

    def test_other_order_key_falls_back(self, reng):
        # ORDER BY a non-operand column: probe path, still correct
        got = rows_of(
            reng,
            "SELECT id, (SELECT r.v FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts ORDER BY r.rid DESC LIMIT 1) AS p FROM ev",
        )
        assert got == {1: (1.0,), 2: (2.0,), 3: (4.0,), 4: (None,), 5: (None,), 6: (None,)}


class TestGroupedCorrelatedScalar:
    """Correlated scalar over a GROUPED derived table — two-level
    decorrelation (derived table re-aggregates by correlation keys + its
    GROUP BY; outer aggregate collapses per key). DuckDB-cross-checked."""

    @pytest.fixture(scope="class")
    def geng(self, spark):
        eng = Engine(spark, "grouped_corr")
        eng.register_df(
            "gev",
            spark.createDataFrame([(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id int, k string"),
        )
        eng.register_df(
            "gref",
            spark.createDataFrame(
                [(1, "a", "x", 10.0), (2, "a", "x", 20.0), (3, "a", "y", 5.0), (4, "b", "x", 7.0)],
                "rid int, k string, g string, v double",
            ),
        )
        return eng

    def test_max_of_group_sums(self, geng):
        got = rows_of(
            geng,
            "SELECT id, (SELECT max(s) FROM (SELECT sum(r.v) AS s FROM gref r WHERE r.k = gev.k GROUP BY r.g) t) AS m FROM gev",
        )
        # k=a: sums {x:30, y:5} → 30; k=b: {x:7} → 7; k=c: empty → NULL
        assert got == {1: (30.0,), 2: (30.0,), 3: (7.0,), 4: (None,)}

    def test_count_of_groups_composite(self, geng):
        got = rows_of(
            geng,
            "SELECT id, (SELECT count(*) + 1 FROM (SELECT r.g AS g, count(*) AS n FROM gref r WHERE r.k = gev.k GROUP BY r.g) t) AS c FROM gev",
        )
        # a → 2 groups + 1 = 3; b → 2; c → empty derived table → 0+1 = 1
        assert got == {1: (3,), 2: (3,), 3: (2,), 4: (1,)}

    def test_outer_filter_on_derived_column(self, geng):
        got = rows_of(
            geng,
            "SELECT id, (SELECT avg(s) FROM (SELECT r.g AS g, sum(r.v) AS s FROM gref r WHERE r.k = gev.k GROUP BY r.g) t WHERE s > 6) AS a FROM gev",
        )
        # a: sums {30, 5} → only 30 passes → 30.0; b: {7} → 7.0; c: NULL
        assert got == {1: (30.0,), 2: (30.0,), 3: (7.0,), 4: (None,)}

    def test_non_aggregate_outer_errors(self, geng):
        with pytest.raises(ExecError, match="must aggregate"):
            geng.sql(
                "SELECT id, (SELECT s FROM (SELECT sum(r.v) AS s FROM gref r WHERE r.k = gev.k GROUP BY r.g) t) AS m FROM gev"
            ).collect()


class TestSubqueryCoalescing:
    """Select-list scalar aggregates sharing (FROM, WHERE) merge into one
    per-key aggregate + one join (subquery coalescing)."""

    Q3 = (
        "SELECT id,"
        " (SELECT max(r.v) FROM ref r WHERE r.k = ev.k) AS mx,"
        " (SELECT count(*) FROM ref r WHERE r.k = ev.k) AS n,"
        " (SELECT count(*) + 1 FROM ref r WHERE r.k = ev.k) AS n1"
        " FROM ev"
    )

    def test_one_join_for_three_subqueries(self, reng):
        plan = reng.sql(self.Q3)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Join") == 1, plan

    def test_values_and_count_shapes_survive(self, reng):
        got = rows_of(reng, self.Q3)
        # k=a → max 3.0, 3 rows; k=b → 7.0, 2; empty keys → NULL / 0 / 1
        assert got[1] == (3.0, 3, 4)
        assert got[3] == (7.0, 2, 3)
        assert got[5] == (None, 0, 1)
        assert got[6] == (None, 0, 1)

    def test_different_where_not_merged_still_correct(self, reng):
        got = rows_of(
            reng,
            "SELECT id,"
            " (SELECT count(*) FROM ref r WHERE r.k = ev.k) AS all_n,"
            " (SELECT count(*) FROM ref r WHERE r.k = ev.k AND r.v > 3) AS big_n"
            " FROM ev",
        )
        assert got[1] == (3, 0) and got[3] == (2, 2)


class TestExistsRangeExtremum:
    """Single-range correlated EXISTS reduces to a per-key min/max
    semi/anti join (no range join over the full inner relation)."""

    def test_exists_at_or_before(self, reng):
        got = set(r[0] for r in reng.sql(
            "SELECT id FROM ev WHERE EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts)"
        ).collect())
        # a@10 (min a-ts 5), a@20, b@30 (min valid b-ts 30); b@5 no, c/d no
        assert got == {1, 2, 3}

    def test_not_exists_is_complement(self, reng):
        got = set(r[0] for r in reng.sql(
            "SELECT id FROM ev WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts)"
        ).collect())
        assert got == {4, 5, 6}

    def test_plan_is_aggregate_semi_join(self, reng):
        plan = reng.sql(
            "SELECT id FROM ev WHERE EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts)"
        )._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan and "LeftSemi" in plan

    def test_multi_range_falls_back_correct(self, reng):
        # two range conjuncts → generic combined-scope join, still right
        got = set(r[0] for r in reng.sql(
            "SELECT id FROM ev WHERE EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts AND r.rid > ev.id - 100)"
        ).collect())
        assert got == {1, 2, 3}


class TestExistsMarkRange:
    """EXISTS mark columns (select list / disjunctions) with one range
    conjunct — per-key extremum left join, coalesced to FALSE."""

    def test_select_list_range_exists(self, reng):
        got = rows_of(
            reng,
            "SELECT id, EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k AND r.ts <= ev.ts) AS e FROM ev",
        )
        assert got == {1: (True,), 2: (True,), 3: (True,), 4: (False,), 5: (False,), 6: (False,)}

    def test_not_exists_mark(self, reng):
        got = rows_of(
            reng,
            "SELECT id, NOT EXISTS (SELECT 1 FROM ref r WHERE r.k = ev.k AND r.ts > ev.ts) AS e FROM ev",
        )
        # a@10: ref a has ts 15,25 > 10 → exists → False; a@20: 25 → False;
        # b@30/b@5: b valid ts {30}: >30 no →True@3, >5 yes→False@4; others True
        assert got == {1: (False,), 2: (False,), 3: (True,), 4: (False,), 5: (True,), 6: (True,)}


def test_multi_source_correlated_scalar(reng):
    # JOIN inside the correlated subquery: correlation splits off the
    # WHERE while the ON condition builds the inner frame
    got = rows_of(
        reng,
        "SELECT id, (SELECT max(r.v) FROM ref r JOIN ref r2 ON r2.rid = r.rid "
        "WHERE r.k = ev.k) AS m FROM ev",
    )
    assert got[1] == (3.0,) and got[3] == (7.0,) and got[5] == (None,)


class TestGroupedCorrelatedScalar:
    """Direct GROUP BY inside a correlated scalar — legal when the group
    keys are a subset of the correlation equality keys. ANSI subtlety
    pinned here: the EMPTY correlated set yields NO group row → NULL,
    unlike the ungrouped count(*) form's count-bug 0 (DuckDB agrees)."""

    @pytest.fixture(scope="class")
    def geng(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("gout", spark.createDataFrame([(1,), (2,), (3,)], "ok int"))
        e.register_df("ginn", spark.createDataFrame([(1, 5), (1, 7), (2, 9)], "lk int, q int"))
        return e

    def test_count_null_on_empty_group(self, geng):
        rows = geng.execute(
            "SELECT ok, (SELECT count(*) FROM ginn WHERE lk = ok GROUP BY lk) AS n,"
            " (SELECT count(*) FROM ginn WHERE lk = ok) AS n0 FROM gout ORDER BY ok"
        ).collect()
        assert [(r.ok, r.n, r.n0) for r in rows] == [(1, 2, 2), (2, 1, 1), (3, None, 0)]

    def test_sum_grouped(self, geng):
        rows = geng.execute(
            "SELECT ok, (SELECT sum(q) FROM ginn WHERE lk = ok GROUP BY lk) AS s"
            " FROM gout ORDER BY ok"
        ).collect()
        assert [(r.ok, r.s) for r in rows] == [(1, 12), (2, 9), (3, None)]

    def test_non_key_group_errors(self, geng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError, match="correlation equality keys"):
            geng.execute(
                "SELECT ok, (SELECT count(*) FROM ginn WHERE lk = ok GROUP BY q) AS n FROM gout"
            ).collect()

    def test_non_agg_grouped_errors(self, geng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError, match="must select an aggregate"):
            geng.execute(
                "SELECT ok, (SELECT q FROM ginn WHERE lk = ok GROUP BY lk) AS n FROM gout"
            ).collect()

    def test_having_filters_group_to_null(self, geng):
        # HAVING rejects the group → joins nothing → NULL (DuckDB-matched)
        rows = geng.execute(
            "SELECT ok, (SELECT sum(q) FROM ginn WHERE lk = ok GROUP BY lk"
            " HAVING count(*) > 1) AS s FROM gout ORDER BY ok"
        ).collect()
        assert [(r.ok, r.s) for r in rows] == [(1, 12), (2, None), (3, None)]

    def test_non_agg_having_errors(self, geng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError, match="HAVING must be an aggregate"):
            geng.execute(
                "SELECT ok, (SELECT sum(q) FROM ginn WHERE lk = ok GROUP BY lk"
                " HAVING q > 1) AS s FROM gout"
            ).collect()


class TestNullSafeCorrelation:
    """Round-10: ``inner IS NOT DISTINCT FROM outer`` correlation — the
    null-safe equality pair. Decorrelates exactly like ``=`` except the
    join matches NULL keys (eqNullSafe), so a NULL outer key sees the
    inner NULL group instead of the ANSI empty set. Every case below is
    DuckDB-differential on data where both sides carry NULLs."""

    @pytest.fixture(scope="class")
    def nseng(self, spark):
        import duckdb

        t = [(1, None, 10), (2, 5, 20), (3, 7, 30), (4, None, 40), (5, 5, 50)]
        u = [(1, None, 1), (2, None, 2), (3, 5, 3), (4, 7, 4), (5, 7, 5), (6, 8, 6)]
        eng = Engine(spark, "nullsafe-corr")
        eng.register_df("nt", spark.createDataFrame(t, "id int, k int, v int"))
        eng.register_df("nu", spark.createDataFrame(u, "uid int, k int, w int"))
        con = duckdb.connect()
        con.execute("CREATE TABLE nt (id int, k int, v int)")
        con.executemany("INSERT INTO nt VALUES (?, ?, ?)", t)
        con.execute("CREATE TABLE nu (uid int, k int, w int)")
        con.executemany("INSERT INTO nu VALUES (?, ?, ?)", u)
        return eng, con

    def _both(self, nseng, q):
        eng, con = nseng
        sp = sorted((tuple(r) for r in eng.sql(q).collect()), key=repr)
        du = sorted((tuple(r) for r in con.execute(q).fetchall()), key=repr)
        assert sp == du, f"{q}\n spark={sp}\n duck={du}"
        return sp

    def test_scalar_subquery(self, nseng):
        rows = self._both(
            nseng,
            "SELECT t.id, (SELECT sum(u.w) FROM nu u WHERE u.k IS NOT DISTINCT FROM t.k) AS s "
            "FROM nt t ORDER BY t.id",
        )
        # NULL outer keys (ids 1, 4) see the inner NULL group (w 1+2)
        assert rows[0] == (1, 3) and rows[3] == (4, 3)

    def test_correlated_exists(self, nseng):
        rows = self._both(
            nseng,
            "SELECT t.id FROM nt t WHERE EXISTS "
            "(SELECT 1 FROM nu u WHERE u.k IS NOT DISTINCT FROM t.k AND u.w > 1) ORDER BY t.id",
        )
        assert (4,) in rows  # NULL key matches the inner NULL group's w=2

    def test_correlated_in(self, nseng):
        self._both(
            nseng,
            "SELECT t.id FROM nt t WHERE t.v IN "
            "(SELECT u.w * 10 FROM nu u WHERE u.k IS NOT DISTINCT FROM t.k) ORDER BY t.id",
        )

    def test_lateral_count(self, nseng):
        # count: DuckDB keeps empty-group rows for count laterals, so this
        # is differential-safe even where a group is empty
        self._both(
            nseng,
            "SELECT t.id, l.c FROM nt t, LATERAL "
            "(SELECT count(*) AS c FROM nu u WHERE u.k IS NOT DISTINCT FROM t.k) l ORDER BY t.id",
        )

    def test_lateral_agg_ansi_empty_group_divergence(self, nseng):
        """DOCUMENTED ORACLE DIVERGENCE (engine is ANSI/Postgres-correct):
        a correlated lateral GLOBAL aggregate always yields one row, even
        for an empty correlated set — DuckDB 1.0 DROPS that row for
        non-count aggregates (while keeping it for count() and for the
        equivalent scalar subquery — internally inconsistent, a known
        decorrelation quirk). Pin OUR semantics; the fuzzer's v4 grammar
        avoids the divergent shape (see _gen_query_v4)."""
        eng, con = nseng
        q = (
            "SELECT t.id, l.m FROM nt t, LATERAL "
            "(SELECT max(u.w) AS m FROM nu u WHERE u.k IS NOT DISTINCT FROM t.k AND u.w > 100) l "
            "ORDER BY t.id"
        )
        sp = [tuple(r) for r in eng.sql(q).collect()]
        assert sp == [(1, None), (2, None), (3, None), (4, None), (5, None)]
        du = con.execute(q).fetchall()
        assert du == []  # DuckDB 1.0 drops all five — the quirk this test documents

    def test_mixed_nullsafe_and_range(self, nseng):
        # null-safe pair + a range conjunct exercises the probe path
        self._both(
            nseng,
            "SELECT t.id, (SELECT sum(u.w) FROM nu u "
            "WHERE u.k IS NOT DISTINCT FROM t.k AND u.uid < t.v) AS s FROM nt t ORDER BY t.id",
        )
