"""Additional parity coverage: upsert, expression join keys, qualified
star, cross join, datemath filters on tables, ALTER parity error."""

import pytest

from qlbridge_spark import ExecError


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
