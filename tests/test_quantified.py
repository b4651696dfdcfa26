"""Quantified subquery comparisons (x <op> ANY/ALL (SELECT …)) — ANSI
superset (the reference's any()/all() builtins take plain args only,
builtins/logic.go:288). Three-valued semantics are pinned against DuckDB
over a matrix of inner sets: empty, no-NULL, with-NULL, all-NULL."""

from __future__ import annotations

import duckdb
import pytest

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError

VALS = [1, 5, None]
SETS = {
    "s_empty": [],
    "s_nonull": [2, 4],
    "s_null": [2, 4, None],
    "s_allnull": [None],
}


@pytest.fixture(scope="module")
def qeng(spark):
    eng = Engine(spark)
    eng.register_df("vals", spark.createDataFrame([(v,) for v in VALS], "x int"))
    for name, vs in SETS.items():
        df = spark.createDataFrame([(v,) for v in vs], "v int")
        eng.register_df(name, df)
    return eng


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE vals(x int)")
    con.executemany("INSERT INTO vals VALUES (?)", [(v,) for v in VALS])
    for name, vs in SETS.items():
        con.execute(f"CREATE TABLE {name}(v int)")
        if vs:
            con.executemany(f"INSERT INTO {name} VALUES (?)", [(v,) for v in vs])
    return con


class TestQuantifiedMatrix:
    @pytest.mark.parametrize("base", ["=", "!=", "<", "<=", ">", ">="])
    @pytest.mark.parametrize("quant", ["ANY", "ALL"])
    @pytest.mark.parametrize("sname", sorted(SETS))
    def test_where_matches_duckdb(self, qeng, duck, base, quant, sname):
        q = f"SELECT x FROM vals WHERE x {base} {quant} (SELECT v FROM {sname})"
        # DuckDB spells != as <>
        dq = q.replace("!=", "<>")
        key = lambda v: (v is None, v)  # noqa: E731 — NULL x rows pass vacuous ALL(empty)
        want = sorted((r[0] for r in duck.execute(dq).fetchall()), key=key)
        got = sorted((r[0] for r in qeng.sql(q).collect()), key=key)
        assert got == want, f"{q}: got {got}, duckdb {want}"

    def test_ne_all_is_ansi_not_in(self, qeng):
        # != ALL ≡ NOT IN with FULL ANSI semantics (round 7): an inner
        # NULL poisons every unmatched row and a NULL x never passes, so
        # a null-bearing set filters everything
        got = [r[0] for r in qeng.sql("SELECT x FROM vals WHERE x != ALL (SELECT v FROM s_null)").collect()]
        assert got == []

    def test_not_in_empty_set_passes_all(self, qeng):
        got = sorted(
            (r[0] for r in qeng.sql("SELECT x FROM vals WHERE x NOT IN (SELECT v FROM s_empty)").collect()),
            key=lambda v: (v is None, v),
        )
        # even NULL x passes: NOT IN over the empty set is NOT(FALSE)
        assert got == [1, 5, None]

    def test_some_is_any(self, qeng):
        a = sorted(r[0] for r in qeng.sql("SELECT x FROM vals WHERE x > SOME (SELECT v FROM s_nonull)").collect())
        b = sorted(r[0] for r in qeng.sql("SELECT x FROM vals WHERE x > ANY (SELECT v FROM s_nonull)").collect())
        assert a == b == [5]


class TestQuantifiedCorrelated:
    def test_correlated_gt_all(self, engine, duck_unused=None):
        # users whose referral_count beats ALL their order item_counts;
        # users with no orders pass vacuously (empty-set ALL = TRUE)
        rows = engine.sql(
            "SELECT user_id FROM users WHERE referral_count > ALL "
            "(SELECT item_count FROM orders WHERE orders.user_id = users.user_id) ORDER BY user_id"
        ).collect()
        # aaron: 82 > all([82, 82]) = False; bob/notbob: no orders → True
        assert [r[0] for r in rows] == ["hT2impsOPUREcVPc", "hT2impsabc345c"]

    def test_correlated_le_any(self, engine):
        # aaron: 82 <= any([82, 82]) → True; others: empty → False
        rows = engine.sql(
            "SELECT user_id FROM users WHERE referral_count <= ANY "
            "(SELECT item_count FROM orders WHERE orders.user_id = users.user_id)"
        ).collect()
        assert [r[0] for r in rows] == ["9Ip1aKbeZe2njCDM"]

    def test_eq_any_delegates_to_semi_join(self, engine):
        rows = engine.sql(
            "SELECT user_id FROM users WHERE user_id = ANY (SELECT user_id FROM orders) ORDER BY user_id"
        ).collect()
        assert [r[0] for r in rows] == ["9Ip1aKbeZe2njCDM"]

    def test_ne_all_delegates_to_anti_join(self, engine):
        rows = engine.sql(
            "SELECT user_id FROM users WHERE user_id != ALL (SELECT user_id FROM orders) ORDER BY user_id"
        ).collect()
        assert [r[0] for r in rows] == ["hT2impsOPUREcVPc", "hT2impsabc345c"]

    def test_quantified_in_select_list(self, qeng):
        rows = qeng.sql(
            "SELECT x, x > ALL (SELECT v FROM s_nonull) AS beats_all FROM vals"
        ).collect()
        got = {r["x"]: r["beats_all"] for r in rows}
        assert got == {1: False, 5: True, None: None}

    def test_quantified_in_having(self, qeng, duck):
        # HAVING subqueries lower against the aggregated frame (group-key
        # correlation would decorrelate the same way)
        q = "SELECT x, count(*) AS n FROM vals GROUP BY x HAVING count(*) > ALL (SELECT v - v FROM s_nonull)"
        want = sorted((tuple(r) for r in duck.execute(q).fetchall()), key=str)
        got = sorted((tuple(r) for r in qeng.sql(q).collect()), key=str)
        assert got == want

    def test_builtin_any_not_hijacked(self, engine):
        # any(ident) is the reference's existence builtin — must still
        # parse as a function call, not a quantifier
        assert engine.sql("SELECT count(*) AS n FROM users WHERE any(email)").collect()[0]["n"] == 3


class TestInMembershipColumn:
    """IN (SELECT …) outside the top-level WHERE conjunct position —
    lowered to a membership-marker LEFT JOIN with ANSI three-valued
    folding (conjunct INs keep the strictly-better semi/anti-join)."""

    def test_in_select_list(self, qeng, duck):
        q = "SELECT x, x IN (SELECT v FROM s_nonull) AS m FROM vals"
        want = sorted((tuple(r) for r in duck.execute(q).fetchall()), key=str)
        got = sorted((tuple(r) for r in qeng.sql(q).collect()), key=str)
        assert got == want

    @pytest.mark.parametrize("sname", sorted(SETS))
    def test_in_select_list_null_matrix(self, qeng, duck, sname):
        q = f"SELECT x, x IN (SELECT v FROM {sname}) AS m FROM vals"
        want = sorted((tuple(r) for r in duck.execute(q).fetchall()), key=str)
        got = sorted((tuple(r) for r in qeng.sql(q).collect()), key=str)
        assert got == want

    def test_not_in_select_list(self, qeng, duck):
        q = "SELECT x, x NOT IN (SELECT v FROM s_null) AS m FROM vals"
        want = sorted((tuple(r) for r in duck.execute(q).fetchall()), key=str)
        got = sorted((tuple(r) for r in qeng.sql(q).collect()), key=str)
        assert got == want

    def test_disjunctive_in_where(self, qeng, duck):
        q = "SELECT x FROM vals WHERE x = 5 OR x IN (SELECT v FROM s_nonull)"
        want = sorted(r[0] for r in duck.execute(q).fetchall())
        got = sorted(r[0] for r in qeng.sql(q).collect())
        assert got == want == [5]

    def test_conjunct_in_still_semi_join(self, qeng):
        df = qeng.sql("SELECT x FROM vals WHERE x IN (SELECT v FROM s_nonull)")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan

    def test_correlated_disjunctive_in(self, engine):
        # round 7: decorrelated membership column (was a clear error) —
        # per-key stats + (key, value) match join, ANSI three-valued
        rows = engine.sql(
            "SELECT order_id FROM orders WHERE order_id = 3 OR item_count IN "
            "(SELECT referral_count FROM users WHERE users.user_id = orders.user_id)"
        ).collect()
        # orders 1,2 → user aaron (referral_count 82 = item_count); order 3 by the OR
        assert sorted(r["order_id"] for r in rows) == [1, 2, 3]

    def test_correlated_in_select_list(self, engine):
        rows = engine.sql(
            "SELECT order_id, item_count IN "
            "(SELECT referral_count FROM users WHERE users.user_id = orders.user_id) AS m "
            "FROM orders"
        ).collect()
        got = {r["order_id"]: r["m"] for r in rows}
        # order 3's user is unknown → empty correlated set → FALSE (not NULL)
        assert got == {1: True, 2: True, 3: False}
