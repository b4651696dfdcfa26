"""Additional parity coverage: upsert, expression join keys, qualified
star, cross join, datemath filters on tables, ALTER parity error."""

import pytest

from qlbridge_spark import Engine, ExecError


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestMoreEngine:
    def test_upsert_replaces_by_key(self, engine):
        engine.register_df("u2", engine.table("users"))
        n = engine.execute('UPSERT INTO u2 (user_id, email, referral_count) VALUES ("9Ip1aKbeZe2njCDM", "newaaron@email.com", 1)')
        assert n == 1
        df = engine.sql('SELECT email FROM u2 WHERE user_id = "9Ip1aKbeZe2njCDM"')
        assert rows(df) == [("newaaron@email.com",)]
        assert engine.table("u2").count() == 3  # replaced, not appended
        engine.execute("DROP TABLE u2")

    def test_function_keyed_join(self, engine):
        # ON expressions beyond bare equality (rel/sql_rewrite.go:222
        # supports function-wrapped keys)
        df = engine.sql(
            "SELECT users.user_id, order_id FROM users JOIN orders ON tolower(users.user_id) = tolower(orders.user_id) ORDER BY order_id"
        )
        assert [r[1] for r in rows(df)] == [1, 2]

    def test_join_on_compound_condition(self, engine):
        df = engine.sql(
            "SELECT order_id FROM users JOIN orders ON users.user_id = orders.user_id AND orders.price > 30 ORDER BY order_id"
        )
        assert rows(df) == [(2,)]

    def test_qualified_star(self, engine):
        df = engine.sql("SELECT orders.*, users.email FROM users JOIN orders ON users.user_id = orders.user_id ORDER BY order_id")
        assert df.columns == ["order_id", "user_id", "item_id", "price", "order_date", "item_count", "email"]
        assert df.count() == 2

    def test_cross_join_comma(self, engine):
        df = engine.sql("SELECT users.user_id, order_id FROM users, orders LIMIT 100")
        assert df.count() == 9

    def test_datemath_on_table(self, engine):
        df = engine.sql('SELECT user_id FROM users WHERE reg_date < "now-1y"')
        assert df.count() == 3

    def test_not_in_subquery_anti_join(self, engine):
        df = engine.sql("SELECT order_id FROM orders WHERE user_id NOT IN (SELECT user_id FROM users)")
        assert rows(df) == [(3,)]

    def test_scalar_subquery_in_where(self, engine):
        # uncorrelated scalar subquery materialized to a literal at plan time
        df = engine.sql("SELECT order_id FROM orders WHERE price >= (SELECT max(price) FROM orders)")
        assert rows(df) == [(2,)]

    def test_scalar_subquery_in_select_and_arith(self, engine):
        df = engine.sql("SELECT order_id, price - (SELECT avg(price) FROM orders) AS delta FROM orders ORDER BY order_id")
        got = {r[0]: round(r[1], 2) for r in rows(df)}
        # prices 22.50/37.50/22.50 → avg 27.50
        assert got == {1: -5.0, 2: 10.0, 3: -5.0}

    def test_scalar_subquery_multi_row_errors(self, engine):
        # WHERE position folds eagerly (pushdown-preserving) → plan-time error
        with pytest.raises(ExecError, match="more than one row"):
            engine.sql("SELECT order_id FROM orders WHERE price > (SELECT price FROM orders)").collect()

    def test_scalar_subquery_multi_row_errors_lazily_in_select(self, engine):
        # select-list position lowers lazily → the ANSI violation
        # surfaces at RUNTIME via raise_error
        with pytest.raises(Exception, match="more than one row"):
            engine.sql("SELECT order_id, (SELECT price FROM orders) AS p FROM orders").collect()

    def test_scalar_subquery_multi_col_errors(self, engine):
        with pytest.raises(ExecError, match="one column"):
            engine.sql("SELECT order_id FROM orders WHERE price > (SELECT price, order_id FROM orders)").collect()

    def test_scalar_subquery_empty_is_null(self, engine):
        # empty scalar subquery → NULL → comparison not-true for all rows
        df = engine.sql('SELECT order_id FROM orders WHERE price > (SELECT price FROM orders WHERE order_id = 999)')
        assert df.count() == 0

    def test_correlated_exists_semi_join(self, engine):
        # users with at least one order → semi-join decorrelation
        df = engine.sql(
            "SELECT users.user_id FROM users WHERE EXISTS "
            "(SELECT 1 FROM orders WHERE orders.user_id = users.user_id) ORDER BY users.user_id"
        )
        assert [r[0] for r in rows(df)] == ["9Ip1aKbeZe2njCDM"]

    def test_correlated_not_exists_anti_join(self, engine):
        df = engine.sql(
            "SELECT users.user_id FROM users WHERE NOT EXISTS "
            "(SELECT 1 FROM orders WHERE orders.user_id = users.user_id) ORDER BY users.user_id"
        )
        assert [r[0] for r in rows(df)] == ["hT2impsOPUREcVPc", "hT2impsabc345c"]

    def test_correlated_exists_with_inner_filter(self, engine):
        # inner-only predicate stays a pushed filter on the inner scan
        df = engine.sql(
            "SELECT users.user_id FROM users WHERE EXISTS "
            "(SELECT 1 FROM orders WHERE orders.user_id = users.user_id AND orders.price > 30)"
        )
        assert [r[0] for r in rows(df)] == ["9Ip1aKbeZe2njCDM"]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan

    def test_correlated_exists_non_equi(self, engine):
        # non-equality correlation also decorrelates (goes into the join)
        df = engine.sql(
            "SELECT users.user_id FROM users WHERE EXISTS "
            "(SELECT 1 FROM orders WHERE orders.user_id = users.user_id AND orders.order_date > users.reg_date)"
        )
        assert [r[0] for r in rows(df)] == ["9Ip1aKbeZe2njCDM"]

    def test_exists_same_alias_shadows_and_is_uncorrelated(self, engine):
        # inner `orders` fully shadows the outer one (innermost scoping):
        # bare `price` binds the INNER column, so the predicate is a
        # self-comparison — an uncorrelated, constant-false EXISTS
        df = engine.sql(
            "SELECT order_id FROM orders WHERE EXISTS (SELECT 1 FROM orders WHERE orders.price > price)"
        )
        assert df.count() == 0

    def test_correlated_exists_alias_collision_errors(self, engine):
        # correlated via users, but inner alias `orders` collides with the
        # outer orders frame → clear error asking to alias
        with pytest.raises(ExecError, match="alias"):
            engine.sql(
                "SELECT users.user_id FROM users JOIN orders ON users.user_id = orders.user_id "
                "WHERE EXISTS (SELECT 1 FROM orders WHERE orders.user_id = users.user_id)"
            ).collect()

    def test_correlated_scalar_subquery_in_where(self, engine):
        # decorrelated count: users without orders see 0 (count-bug
        # coalesce), not NULL — so 12 > 0 keeps bob and notbob too
        df = engine.sql(
            "SELECT users.user_id FROM users WHERE referral_count > "
            "(SELECT count(*) FROM orders WHERE orders.user_id = users.user_id) ORDER BY user_id"
        )
        assert [r[0] for r in rows(df)] == ["9Ip1aKbeZe2njCDM", "hT2impsOPUREcVPc", "hT2impsabc345c"]

    def test_correlated_scalar_subquery_in_select_list(self, engine):
        df = engine.sql(
            "SELECT users.user_id, (SELECT max(price) FROM orders WHERE orders.user_id = users.user_id) AS top_price "
            "FROM users ORDER BY user_id"
        )
        got = [(r[0], r[1]) for r in rows(df)]
        assert got == [("9Ip1aKbeZe2njCDM", 37.50), ("hT2impsOPUREcVPc", None), ("hT2impsabc345c", None)]

    def test_correlated_scalar_subquery_plan_is_join(self, engine):
        # decorrelation must produce one aggregate + one join, not per-row
        # re-execution: the physical plan has a join and no Python UDF
        df = engine.sql(
            "SELECT users.user_id, (SELECT count(*) FROM orders WHERE orders.user_id = users.user_id) AS n "
            "FROM users"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan or "BroadcastHashJoin" in plan

    def test_correlated_scalar_non_aggregate_lookup(self, engine):
        # lookup-join pattern: non-aggregate inner with ≤1 row per key
        # (orders keyed by order_id) decorrelates with a runtime one-row
        # guard instead of erroring at plan time
        rows = engine.sql(
            "SELECT order_id, (SELECT users.email FROM users WHERE users.user_id = orders.user_id) AS email "
            "FROM orders ORDER BY order_id"
        ).collect()
        assert [(r["order_id"], r["email"]) for r in rows] == [
            (1, "aaron@email.com"),
            (2, "aaron@email.com"),
            (3, None),
        ]

    def test_correlated_scalar_non_aggregate_multi_row_errors_at_runtime(self, engine):
        # aaron matches 2 order rows → ANSI runtime error (distributed
        # raise_error, not a plan-time refusal)
        with pytest.raises(Exception, match="more than one row"):
            engine.sql(
                "SELECT users.user_id FROM users WHERE referral_count > "
                "(SELECT price FROM orders WHERE orders.user_id = users.user_id)"
            ).collect()

    def test_correlated_in_subquery(self, engine):
        # bare outer lhs gets qualified before the EXISTS rewrite, so it
        # does not re-bind to the inner orders.user_id
        df = engine.sql(
            "SELECT user_id FROM users WHERE user_id IN "
            "(SELECT orders.user_id FROM orders WHERE orders.order_date > users.reg_date)"
        )
        assert [r[0] for r in rows(df)] == ["9Ip1aKbeZe2njCDM"]

    def test_correlated_not_in_subquery(self, engine):
        df = engine.sql(
            "SELECT user_id FROM users WHERE user_id NOT IN "
            "(SELECT orders.user_id FROM orders WHERE orders.order_date > users.reg_date) ORDER BY user_id"
        )
        assert [r[0] for r in rows(df)] == ["hT2impsOPUREcVPc", "hT2impsabc345c"]

    def test_correlated_in_plan_is_semi_join(self, engine):
        df = engine.sql(
            "SELECT user_id FROM users WHERE user_id IN "
            "(SELECT orders.user_id FROM orders WHERE orders.order_date > users.reg_date)"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan and "BatchEvalPython" not in plan

    def test_exists_subquery(self, engine):
        df = engine.sql('SELECT order_id FROM orders WHERE EXISTS (SELECT 1 FROM users WHERE user_id = "9Ip1aKbeZe2njCDM")')
        assert df.count() == 3
        df2 = engine.sql('SELECT order_id FROM orders WHERE EXISTS (SELECT 1 FROM users WHERE user_id = "nope")')
        assert df2.count() == 0

    def test_order_by_unselected_expression(self, engine):
        df = engine.sql("SELECT user_id FROM users ORDER BY referral_count DESC, user_id ASC")
        assert [r[0] for r in rows(df)] == ["9Ip1aKbeZe2njCDM", "hT2impsOPUREcVPc", "hT2impsabc345c"]

    def test_group_by_expression_alias(self, engine):
        df = engine.sql("SELECT yy(reg_date) AS y, count(*) AS n FROM users GROUP BY yy(reg_date) ORDER BY y")
        assert rows(df) == [(9, 2), (12, 1)]

    def test_having_on_unselected_agg(self, engine):
        df = engine.sql("SELECT user_id FROM orders GROUP BY user_id HAVING sum(price) > 50")
        assert rows(df) == [("9Ip1aKbeZe2njCDM",)]

    def test_where_on_function_result(self, engine):
        df = engine.sql('SELECT user_id FROM users WHERE emaildomain(email) = "email.com" ORDER BY user_id')
        assert df.count() == 2

    def test_limit_zero(self, engine):
        assert engine.sql("SELECT user_id FROM users LIMIT 0").count() == 0

    def test_show_create_table(self, engine):
        df = engine.execute("SHOW CREATE TABLE users")
        r = rows(df)[0]
        assert "CREATE TABLE `users`" in r[1] or "CREATE TABLE `users`" in r[0]

    def test_show_full_tables(self, engine):
        # SHOW FULL TABLES → name + table_type (plan/sql_rewrite.go:66)
        df = engine.execute("SHOW FULL TABLES")
        assert df.columns == ["Table", "Table_type"]
        r = {t: ty for t, ty in rows(df)}
        assert r.get("users") == "BASE TABLE"

    def test_show_index(self, engine):
        # 12-column MySQL shape (schema.ShowIndexCols, schema/schema.go:37)
        df = engine.execute("SHOW INDEX FROM users")
        assert df.columns[:4] == ["Table", "Non_unique", "Key_name", "Seq_in_index"]
        assert len(df.columns) == 12 and df.count() == 0
        df = engine.execute("SHOW KEYS FROM users")  # alias form
        assert len(df.columns) == 12
        import pytest as _pytest

        from qlbridge_spark import ExecError

        with _pytest.raises(ExecError):
            engine.execute("SHOW INDEX FROM nosuchtable")

    def test_show_status_and_scoped_variables(self, engine):
        df = engine.execute("SHOW STATUS")
        assert df.columns == ["Variable_name", "Value"] and df.count() == 0
        # GLOBAL/SESSION scope prefixes accepted (plan/sql_rewrite.go:136)
        engine.execute("SET @@g1 = 7")
        assert engine.execute("SHOW GLOBAL VARIABLES").count() >= 1
        assert engine.execute("SHOW SESSION STATUS").count() == 0


class TestGroupingExtensions:
    def test_group_by_positional(self, engine):
        df = engine.sql("SELECT yy(reg_date) AS y, count(*) AS n FROM users GROUP BY 1 ORDER BY y")
        assert [tuple(r) for r in df.collect()] == [(9, 2), (12, 1)]

    def test_rollup(self, engine):
        df = engine.sql(
            "SELECT user_id, count(*) AS n FROM orders GROUP BY ROLLUP(user_id) ORDER BY user_id"
        )
        r = [tuple(x) for x in df.collect()]
        assert (None, 3) in r  # grand total row
        assert ("9Ip1aKbeZe2njCDM", 2) in r

    def test_cube(self, engine):
        df = engine.sql("SELECT user_id, item_id, count(*) AS n FROM orders GROUP BY CUBE(user_id, item_id)")
        # cube of 2 cols → groupings: (a,b),(a),(b),() — 4+3+2+1? rows:
        # distinct combos: 3 pairs + 2 users + 2 items + 1 total = 8
        assert df.count() == 8

    def test_having_references_select_alias(self, engine):
        df = engine.sql("SELECT user_id, count(*) AS n FROM orders GROUP BY user_id HAVING n > 1")
        assert [tuple(r) for r in df.collect()] == [("9Ip1aKbeZe2njCDM", 2)]


class TestSessionVarsInQueries:
    def test_session_var_reference(self, engine):
        engine.execute("SET @min_refs = 50")
        df = engine.sql("SELECT user_id FROM users WHERE referral_count > @min_refs")
        assert df.count() == 1
        engine.execute('SET @min_refs = 5')
        df2 = engine.sql("SELECT user_id FROM users WHERE referral_count > @min_refs")
        assert df2.count() == 3


class TestExecTestParity:
    """Pinned behaviors from /root/reference/exec/exec_test.go."""

    def test_mixed_expression_columns(self, engine):
        # TestExecSelectWhere: expr, literal, and boolean-expr columns
        df = engine.sql(
            "select user_id, email, referral_count * 2, 5, yy(reg_date) > 10 FROM users WHERE yy(reg_date) > 10"
        )
        rows = [tuple(r) for r in df.collect()]
        assert len(rows) == 1 and len(rows[0]) == 5
        assert rows[0][0] == "9Ip1aKbeZe2njCDM"
        assert rows[0][2] == 164
        assert rows[0][3] == 5
        assert rows[0][4] is True

    def test_group_by_counts_and_avg(self, engine):
        # TestExecGroupBy: count(user_id), avg(price) per user
        df = engine.sql("select user_id, count(user_id) AS ct, avg(price) AS ap FROM orders GROUP BY user_id")
        got = {r[0]: (r[1], r[2]) for r in df.collect()}
        assert got["9Ip1aKbeZe2njCDM"] == (2, 30.0)
        assert got["abcabcabc"] == (1, 22.5)

    def test_having_on_alias_order_ct(self, engine):
        # TestExecHaving
        df = engine.sql(
            "select user_id, count(user_id) AS order_ct FROM orders GROUP BY user_id HAVING order_ct > 1"
        )
        assert [tuple(r) for r in df.collect()] == [("9Ip1aKbeZe2njCDM", 2)]

    def test_insert_with_function_values(self, engine, spark):
        # TestExecDelete: INSERT VALUES with uuid()/now()
        import pyspark.sql.types as T

        schema = T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("event", T.StringType()),
            T.StructField("date", T.TimestampType()),
        ])
        engine.register_df("user_event2", spark.createDataFrame([], schema))
        n = engine.execute(
            'INSERT into user_event2 (id, user_id, event, date) VALUES '
            '(uuid(), "9Ip1aKbeZe2njCDM", "logon", now()), (uuid(), "abcd", "click", now())'
        )
        assert n == 2
        rows = engine.table("user_event2").collect()
        assert len(rows) == 2
        assert len({r["id"] for r in rows}) == 2  # distinct uuids
        assert all(r["date"] is not None for r in rows)
        engine.execute("DROP TABLE user_event2")

    def test_insert_without_column_list_is_positional(self, engine, spark):
        # ANSI: INSERT INTO t VALUES (...) with no column list maps the
        # values positionally onto the table's columns. Regression: this
        # used to zip against the EMPTY parsed column list and append
        # all-NULL rows (verify-session find, r12).
        from qlbridge_spark.engine import ExecError

        engine.register_df(
            "poslist", spark.createDataFrame([(1, "a")], "k long, s string")
        )
        n = engine.execute("INSERT INTO poslist VALUES (2, 'b'), (3, 'c')")
        assert n == 2
        rows = sorted((r["k"], r["s"]) for r in engine.table("poslist").collect())
        assert rows == [(1, "a"), (2, "b"), (3, "c")]
        # INSERT ... SELECT with no column list is positional too (the
        # SELECT's own aliases must not leak into the target)
        engine.execute("INSERT INTO poslist SELECT k + 10 AS x, upper(s) AS y FROM poslist")
        assert engine.table("poslist").count() == 6
        assert set(engine.table("poslist").columns) == {"k", "s"}
        # arity mismatches raise instead of silently truncating
        with pytest.raises(ExecError, match="3 values, expected 2"):
            engine.execute("INSERT INTO poslist VALUES (9, 'z', 0)")
        with pytest.raises(ExecError, match="expects 2"):
            engine.execute("INSERT INTO poslist SELECT k, s, k FROM poslist")
        engine.execute("DROP TABLE poslist")

    def test_upsert_changes_date(self, engine, spark):
        # TestExecUpsert: same key re-upserted with a new todate()
        import pyspark.sql.types as T

        schema = T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("event", T.StringType()),
            T.StructField("date", T.TimestampType()),
        ])
        engine.register_df("user_event3", spark.createDataFrame([], schema))
        engine.execute('UPSERT into user_event3 (id, event, date) VALUES ("1234abcd", "logon", todate("2012/07/07"))')
        engine.execute('UPSERT into user_event3 (id, event, date) VALUES ("1234abcd", "logon", todate("2013/07/07"))')
        rows = engine.table("user_event3").collect()
        assert len(rows) == 1
        assert rows[0]["date"].year == 2013
        engine.execute("DROP TABLE user_event3")


class TestDbApi:
    """PEP 249 driver parity (reference: qlbdriver/driver.go +
    exec/sqldriver.go register a Go database/sql driver)."""

    def test_cursor_roundtrip(self, spark):
        from qlbridge_spark.dbapi import connect

        conn = connect(spark, name="dbapi-test")
        conn.engine.register_rows(
            "users",
            [
                {"user_id": "u1", "name": "Aaron", "balance": 100.5},
                {"user_id": "u2", "name": "Bob", "balance": 50.0},
            ],
        )
        cur = conn.cursor()
        cur.execute("SELECT name, balance FROM users ORDER BY name")
        assert [d[0] for d in cur.description] == ["name", "balance"]
        assert cur.fetchone() == ("Aaron", 100.5)
        assert cur.fetchall() == [("Bob", 50.0)]
        assert cur.fetchone() is None

    def test_qmark_params_and_errors(self, spark):
        import pytest as _pytest

        from qlbridge_spark.dbapi import ProgrammingError, connect

        conn = connect(spark, name="dbapi-test2")
        conn.engine.register_rows("t", [{"a": 1, "s": "x?y"}, {"a": 2, "s": "z"}])
        cur = conn.cursor()
        # placeholder substituted; '?' INSIDE string literals untouched
        rows = cur.execute('SELECT a FROM t WHERE a = ? AND s != "?"', [1]).fetchall()
        assert rows == [(1,)]
        with _pytest.raises(ProgrammingError):
            cur.execute("SELECT a FROM t WHERE a = ?", [])
        with _pytest.raises(ProgrammingError):
            cur.execute("SELECT a FROM t", [1])
        with _pytest.raises(ProgrammingError):
            cur.execute("SELEKT nonsense")
        # DML reports rowcount, no result set
        cur.execute('INSERT INTO t (a, s) VALUES (3, "w")')
        assert cur.rowcount == 1
        with _pytest.raises(ProgrammingError):
            cur.fetchall()

    def test_connection_lifecycle(self, spark):
        import pytest as _pytest

        from qlbridge_spark.dbapi import InterfaceError, connect

        with connect(spark, name="dbapi-test3") as conn:
            conn.commit()
            conn.rollback()
        with _pytest.raises(InterfaceError):
            conn.cursor()


class TestDbApiEscapes:
    def test_escaped_quote_inside_literal(self, spark):
        from qlbridge_spark.dbapi import connect

        conn = connect(spark, name="dbapi-esc")
        conn.engine.register_rows("t", [{"a": 1, "s": 'it"s?'}, {"a": 2, "s": "plain"}])
        cur = conn.cursor()
        # the escaped quote must NOT end the literal; the inner ? is text,
        # the outer ? is the real placeholder
        rows = cur.execute('SELECT a FROM t WHERE s = "it\\"s?" AND a = ?', [1]).fetchall()
        assert rows == [(1,)]

    def test_question_mark_in_backtick_identifier(self, spark):
        from qlbridge_spark.dbapi import connect

        conn = connect(spark, name="dbapi-bq")
        conn.engine.register_rows("t", [{"a?": 1, "b": 10}, {"a?": 2, "b": 20}])
        cur = conn.cursor()
        # '?' inside a backtick-quoted identifier is part of the name, not
        # a qmark placeholder — exactly one parameter must be consumed
        rows = cur.execute("SELECT b FROM t WHERE `a?` = ?", [2]).fetchall()
        assert rows == [(20,)]


class TestCte:
    """Leading WITH … AS (…) CTEs — ANSI superset; the reference's WITH is
    the trailing config map only (lex/dialect_sql.go), so the two forms
    never collide."""

    def test_basic_cte(self, engine):
        rows = engine.sql(
            "WITH pricey AS (SELECT order_id, price FROM orders WHERE price > 25) "
            "SELECT count(*) AS n FROM pricey"
        ).collect()
        assert rows[0]["n"] == 1

    def test_chained_ctes_later_sees_earlier(self, engine):
        rows = engine.sql(
            "WITH a AS (SELECT user_id, price FROM orders), "
            "b AS (SELECT user_id, sum(price) AS total FROM a GROUP BY user_id) "
            "SELECT user_id, total FROM b ORDER BY total DESC"
        ).collect()
        assert rows[0]["user_id"] == "9Ip1aKbeZe2njCDM" and rows[0]["total"] == 60.0

    def test_cte_shadows_and_restores_table(self, engine):
        n_before = engine.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
        shadowed = engine.sql(
            "WITH orders AS (SELECT order_id FROM orders LIMIT 1) SELECT count(*) AS n FROM orders"
        ).collect()[0]["n"]
        assert shadowed == 1
        assert engine.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"] == n_before
        assert "pricey" not in engine.tables and "a" not in engine.tables

    def test_cte_with_setop_chain_and_join(self, engine):
        rows = engine.sql(
            "WITH ids AS (SELECT user_id FROM orders UNION SELECT user_id FROM users) "
            "SELECT count(*) AS n FROM ids"
        ).collect()
        assert rows[0]["n"] == 4  # 3 users + 1 order-only id, deduped

    def test_recursive_keyword_without_self_reference_is_plain_cte(self, engine):
        # RECURSIVE is a permission, not a requirement (ANSI)
        df = engine.sql("WITH RECURSIVE r AS (SELECT 1 AS n) SELECT * FROM r")
        assert [r[0] for r in df.collect()] == [1]

    def test_missing_select_after_with(self, engine):
        from qlbridge_spark.rel import ParseError

        with pytest.raises(ParseError, match="expected SELECT"):
            engine.sql("WITH a AS (SELECT 1)")

    def test_view_over_cte(self, engine):
        engine.execute(
            "CREATE VIEW v_cte AS WITH big AS (SELECT user_id, price FROM orders WHERE price > 25) "
            "SELECT user_id FROM big"
        )
        assert engine.sql("SELECT count(*) AS n FROM v_cte").collect()[0]["n"] == 1
        engine.execute("DROP VIEW v_cte")

    def test_explain_cte(self, engine):
        out = engine.execute("EXPLAIN WITH x AS (SELECT order_id FROM orders) SELECT count(*) AS n FROM x")
        text = "\n".join(r[0] for r in out.collect())
        assert "Physical Plan" in text


class TestHavingSubqueries:
    """HAVING-position subqueries lower against the AGGREGATED frame —
    uncorrelated materialize, correlated (group-key) decorrelate, INs
    become membership columns (superset: the reference refuses all
    subqueries, plan/planner_select.go:94-98)."""

    def test_uncorrelated_having_scalar(self, engine):
        rows = engine.sql(
            "SELECT user_id, count(*) AS n FROM orders GROUP BY user_id "
            "HAVING count(*) > (SELECT count(*) FROM users WHERE referral_count > 50)"
        ).collect()
        assert [(r["user_id"], r["n"]) for r in rows] == [("9Ip1aKbeZe2njCDM", 2)]

    def test_correlated_having_scalar(self, engine):
        # group-key correlation via the ORIGINAL qualified name
        # (orders.user_id) — aaron: sum 60.0 > max referral 82 is false;
        # abcabcabc has no matching user → NULL → excluded
        rows = engine.sql(
            "SELECT user_id, round(sum(price), 2) AS total FROM orders GROUP BY user_id "
            "HAVING sum(price) > (SELECT max(referral_count) FROM users WHERE users.user_id = orders.user_id) "
            "ORDER BY user_id"
        ).collect()
        assert rows == []

    def test_correlated_having_scalar_passing(self, engine):
        rows = engine.sql(
            "SELECT user_id, round(sum(price), 2) AS total FROM orders GROUP BY user_id "
            "HAVING sum(price) > (SELECT min(referral_count) / 10.0 FROM users WHERE users.user_id = orders.user_id) "
            "ORDER BY user_id"
        ).collect()
        # aaron: 60.0 > 8.2 → passes; others: empty inner set → NULL → excluded
        assert [r["user_id"] for r in rows] == ["9Ip1aKbeZe2njCDM"]

    def test_having_in_subquery(self, engine):
        rows = engine.sql(
            "SELECT user_id, count(*) AS n FROM orders GROUP BY user_id "
            "HAVING user_id IN (SELECT user_id FROM users) ORDER BY user_id"
        ).collect()
        assert [r["user_id"] for r in rows] == ["9Ip1aKbeZe2njCDM"]

    def test_having_not_in_subquery(self, engine):
        rows = engine.sql(
            "SELECT user_id, count(*) AS n FROM orders GROUP BY user_id "
            "HAVING user_id NOT IN (SELECT user_id FROM users) ORDER BY user_id"
        ).collect()
        assert [r["user_id"] for r in rows] == ["abcabcabc"]

    def test_correlated_scalar_top1_lookup(self, engine):
        # ORDER BY ... LIMIT 1 inner → max_by/min_by per key, no runtime
        # guard needed (exactly one row per key by construction)
        rows = engine.sql(
            "SELECT users.user_id, (SELECT price FROM orders WHERE orders.user_id = users.user_id "
            "ORDER BY order_id DESC LIMIT 1) AS last_price FROM users ORDER BY user_id"
        ).collect()
        assert [(r["user_id"], r["last_price"]) for r in rows] == [
            ("9Ip1aKbeZe2njCDM", 37.50),
            ("hT2impsOPUREcVPc", None),
            ("hT2impsabc345c", None),
        ]

    def test_correlated_scalar_top1_asc(self, engine):
        rows = engine.sql(
            "SELECT users.user_id, (SELECT price FROM orders WHERE orders.user_id = users.user_id "
            "ORDER BY order_id ASC LIMIT 1) AS first_price FROM users WHERE user_id = \"9Ip1aKbeZe2njCDM\""
        ).collect()
        assert rows[0]["first_price"] == 22.50


class TestRecursiveCte:
    """WITH RECURSIVE — iterative union fixpoint (semi-naive delta
    evaluation, localCheckpoint-truncated lineage). Superset: the
    reference has no recursion; expected values DuckDB-cross-checked."""

    def test_counter_union_all(self, engine):
        df = engine.sql(
            "WITH RECURSIVE nums AS (SELECT 1 AS n UNION ALL SELECT n + 1 FROM nums WHERE n < 10) "
            "SELECT sum(n) AS s, count(*) AS c FROM nums"
        )
        assert [tuple(r) for r in df.collect()] == [(55, 10)]

    def test_transitive_closure_union_dedup(self, engine, spark):
        eng = Engine(spark, "rec_tc")
        eng.register_df("edges", spark.createDataFrame([(1, 2), (2, 3), (3, 4), (2, 7), (10, 11)], "src int, dst int"))
        df = eng.sql(
            "WITH RECURSIVE reach AS (SELECT src, dst FROM edges WHERE src = 1 "
            "UNION SELECT e.src, e.dst FROM edges e JOIN reach r ON e.src = r.dst) "
            "SELECT count(*) AS c, max(dst) AS m FROM reach"
        )
        assert [tuple(r) for r in df.collect()] == [(4, 7)]

    def test_cycle_terminates_under_union(self, engine, spark):
        eng = Engine(spark, "rec_cyc")
        eng.register_df("cyc", spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int"))
        df = eng.sql(
            "WITH RECURSIVE reach AS (SELECT dst FROM cyc WHERE src = 1 "
            "UNION SELECT c.dst FROM cyc c JOIN reach r ON c.src = r.dst) "
            "SELECT count(*) AS c FROM reach"
        )
        assert df.collect()[0][0] == 3

    def test_depth_limit_errors_and_is_settable(self, engine):
        with pytest.raises(ExecError, match="max_recursion_depth"):
            engine.sql(
                "WITH RECURSIVE nums AS (SELECT 1 AS n UNION ALL SELECT n + 1 FROM nums) SELECT count(*) FROM nums"
            )

    def test_self_reference_on_left_errors(self, engine):
        with pytest.raises(ExecError, match="right UNION operand"):
            engine.sql(
                "WITH RECURSIVE r AS (SELECT n FROM r UNION ALL SELECT 1 AS n) SELECT * FROM r"
            )

    def test_self_reference_without_recursive_keyword_errors(self, engine):
        # plain WITH: the CTE name is not visible inside its own body
        with pytest.raises(Exception):
            engine.sql("WITH r AS (SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 3) SELECT * FROM r").collect()


class TestDistinctOn:
    """DISTINCT ON (k) — Postgres/DuckDB one-row-per-key shorthand,
    lowered to a row_number window (one shuffle on the keys)."""

    @pytest.fixture(scope="class")
    def deng(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "don",
            spark.createDataFrame(
                [(10, 1, 100.0), (11, 1, 50.0), (12, 1, 75.0), (13, 2, 200.0)],
                "ok int, ock int, amt double",
            ),
        )
        return e

    def test_picks_first_by_order(self, deng):
        rows = deng.execute(
            "SELECT DISTINCT ON (ock) ock, ok, amt FROM don ORDER BY ock, amt DESC"
        ).collect()
        assert [(r.ock, r.ok) for r in rows] == [(1, 10), (2, 13)]

    def test_where_composes(self, deng):
        # amt<100 drops ok=10 (100.0) and ok=13 (200.0) — per-key best of
        # the remainder is ok=12 (75.0) for ock=1, nothing for ock=2
        rows = deng.execute(
            "SELECT DISTINCT ON (ock) ock, ok FROM don WHERE amt < 100 ORDER BY ock, amt DESC"
        ).collect()
        assert [(r.ock, r.ok) for r in rows] == [(1, 12)]

    def test_with_agg_errors(self, deng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError, match="DISTINCT ON"):
            deng.execute("SELECT DISTINCT ON (ock) ock, count(*) FROM don").collect()

    def test_positional_order_key(self, deng):
        # ORDER BY 3 = the amt column of the projection (ADVICE r7: was a
        # folded constant → arbitrary survivor)
        rows = deng.execute(
            "SELECT DISTINCT ON (ock) ock, ok, amt FROM don ORDER BY 1, 3 DESC"
        ).collect()
        assert [(r.ock, r.ok) for r in rows] == [(1, 10), (2, 13)]

    def test_alias_order_key(self, deng):
        # a select-list ALIAS as the DISTINCT ON order key (was: raise)
        rows = deng.execute(
            "SELECT DISTINCT ON (ock) ock, ok, amt * 2 AS dbl FROM don ORDER BY ock, dbl DESC"
        ).collect()
        assert [(r.ock, r.ok, r.dbl) for r in rows] == [(1, 10, 200.0), (2, 13, 400.0)]

    def test_out_of_range_position_errors(self, deng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError, match="position"):
            deng.execute("SELECT DISTINCT ON (ock) ock FROM don ORDER BY 9").collect()


class TestAllColumnNotShorthand:
    """A real column NAMED `all` must not trigger the GROUP BY ALL /
    ORDER BY ALL shorthand when used inside a key list (ADVICE r7)."""

    @pytest.fixture(scope="class")
    def aeng(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "allt",
            spark.createDataFrame([(1, "x", 5.0), (1, "y", 7.0), (2, "x", 9.0)], "all int, cat string, v double"),
        )
        return e

    def test_group_by_all_column_in_list(self, aeng):
        rows = aeng.sql(
            "SELECT `all`, cat, sum(v) AS s FROM allt GROUP BY all, cat ORDER BY all, cat"
        ).collect()
        assert [(r["all"], r.cat, r.s) for r in rows] == [(1, "x", 5.0), (1, "y", 7.0), (2, "x", 9.0)]

    def test_order_by_all_column_in_list(self, aeng):
        rows = aeng.sql("SELECT all, v FROM allt ORDER BY all DESC, v").collect()
        # ORDER BY all DESC is the DuckDB sole-expr shorthand (all columns
        # desc) — a LIST (`all DESC, v`) stays a column reference
        assert [r["all"] for r in rows] == [2, 1, 1]

    def test_sole_all_is_still_shorthand(self, aeng):
        rows = aeng.sql("SELECT cat, sum(v) AS s FROM allt GROUP BY ALL ORDER BY ALL").collect()
        assert [(r.cat, r.s) for r in rows] == [("x", 14.0), ("y", 7.0)]
