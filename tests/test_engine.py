"""End-to-end golden query suite — the reference's testutil pattern
(testutil/testsuite.go:65-152, FIXTURES.md §5) against the mock
users/orders tables, plus engine features (DML/DDL/SHOW/FilterQL)."""

import pytest

from qlbridge_spark import ExecError, TranslateError


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestGoldenSuite:
    """Pinned expectations from testutil/testsuite.go (FIXTURES.md §5)."""

    def test_literal_one(self, engine):
        assert rows(engine.sql("select 1;")) == [(1,)]

    def test_literal_pair(self, engine):
        assert rows(engine.sql('select 1, "hello";')) == [(1, "hello")]

    def test_where_yy(self, engine):
        df = engine.sql("select user_id, email FROM users WHERE yy(reg_date) > 10;")
        assert rows(df) == [("9Ip1aKbeZe2njCDM", "aaron@email.com")]

    def test_neq_null_all_rows(self, engine):
        df = engine.sql("SELECT user_id FROM users WHERE (`users.user_id` != NULL)")
        assert df.count() == 3

    def test_neq_null_empty_string_is_nil(self, engine):
        # interests="" row excluded (value/value.go:510)
        df = engine.sql("SELECT email FROM users WHERE interests != NULL")
        assert sorted(r[0] for r in df.collect()) == ["aaron@email.com", "bob@email.com"]

    def test_like_glob(self, engine):
        df = engine.sql('SELECT email FROM users WHERE (`users`.`email` like "%aaron%");')
        assert rows(df) == [("aaron@email.com",)]

    def test_star_plus_extra_columns(self, engine):
        # testutil/testsuite.go:102-105
        df = engine.sql('SELECT *, emaildomain(email), contains(email,"aaron"), 5 FROM users WHERE email = "aaron@email.com"')
        r = rows(df)
        assert len(r) == 1 and len(r[0]) == 9
        assert r[0][0] == "9Ip1aKbeZe2njCDM"
        assert r[0][6] == "email.com" and r[0][7] is True and r[0][8] == 5

    def test_count_star(self, engine):
        df = engine.sql("SELECT COUNT(*) AS count FROM users WHERE (user_id != NULL)")
        assert rows(df) == [(3,)]

    def test_group_by_single(self, engine):
        df = engine.sql('select `users`.`user_id` AS userids FROM users WHERE email="aaron@email.com" GROUP BY `users`.`user_id`;')
        assert rows(df) == [("9Ip1aKbeZe2njCDM",)]

    def test_avg_char_length(self, engine):
        # testutil expectation: [[14.0]] — but 3 emails are 15/13/14 chars
        df = engine.sql("SELECT AVG(CHAR_LENGTH(CAST(`email` AS CHAR))) AS `len` FROM `users`")
        assert rows(df) == [(14.0,)]

    def test_order_by_asc_desc(self, engine):
        asc = [r[0] for r in engine.sql("SELECT email FROM users ORDER BY email ASC").collect()]
        desc = [r[0] for r in engine.sql("SELECT email FROM users ORDER BY email DESC").collect()]
        assert asc == sorted(asc) and desc == sorted(desc, reverse=True)
        assert len(asc) == 3

    def test_nonexistent_field_errors(self, engine):
        # testutil/testsuite.go:138 — must error
        with pytest.raises((TranslateError, ExecError, ValueError)):
            engine.sql("SELECT email, non_existent_field FROM users")

    def test_inner_join_drops_unmatched(self, engine):
        # exec/sqldriver_test.go:78+ — order row 3 has no matching user
        df = engine.sql(
            "SELECT users.user_id, orders.order_id, orders.price FROM users INNER JOIN orders ON users.user_id = orders.user_id ORDER BY order_id"
        )
        r = rows(df)
        assert len(r) == 2
        assert [x[1] for x in r] == [1, 2]

    def test_count_distinct_correct(self, engine):
        # reference bug returns 0 (testutil/testsuite.go:125-127); correct = 3
        df = engine.sql("SELECT COUNT(DISTINCT(email)) AS emails FROM users")
        assert rows(df) == [(3,)]

    def test_column_if_guard(self, engine):
        # `col IF guard` → NULL when guard fails (SURVEY §7.4 divergence)
        df = engine.sql("SELECT user_id, email IF referral_count > 50 AS maybe_email FROM users ORDER BY user_id")
        r = rows(df)
        assert r[0][1] == "aaron@email.com"
        assert all(x[1] is None for x in r[1:])


class TestEngineFeatures:
    def test_dml_roundtrip(self, engine, spark):
        engine.register_df("tmp_users", engine.table("users"))
        n = engine.execute('INSERT INTO tmp_users (user_id, email, referral_count) VALUES ("x1", "x@x.com", 7)')
        assert n == 1 and engine.table("tmp_users").count() == 4
        n = engine.execute('UPDATE tmp_users SET referral_count = 100 WHERE user_id = "x1"')
        assert n == 1
        assert engine.sql('SELECT referral_count FROM tmp_users WHERE user_id = "x1"').collect()[0][0] == 100
        n = engine.execute("DELETE FROM tmp_users WHERE referral_count = 100")
        assert n == 1 and engine.table("tmp_users").count() == 3
        engine.execute("DROP TABLE tmp_users")
        with pytest.raises(ExecError):
            engine.table("tmp_users")

    def test_create_source_csv(self, engine, tmp_path):
        p = tmp_path / "pets.csv"
        p.write_text("name,age\nrex,3\nfido,5\n")
        engine.execute(f'CREATE SOURCE pets WITH {{"type": "csv", "path": "{p}"}}')
        assert rows(engine.sql("SELECT name FROM pets WHERE age > 4")) == [("fido",)]
        engine.execute("DROP SOURCE pets")

    def test_create_view(self, engine):
        engine.execute("CREATE VIEW heavy_users AS SELECT user_id FROM users WHERE referral_count > 50")
        assert engine.sql("SELECT * FROM heavy_users").count() == 1
        engine.execute("DROP VIEW heavy_users")

    def test_ctas_and_insert_select(self, engine):
        engine.execute("CREATE TABLE emails_t AS SELECT email FROM users")
        assert engine.table("emails_t").count() == 3
        engine.execute("DROP TABLE emails_t")

    def test_show_and_describe(self, engine):
        tables = [r[0] for r in engine.execute("SHOW TABLES").collect()]
        assert "users" in tables and "orders" in tables
        cols = [r[0] for r in engine.execute("DESCRIBE users").collect()]
        assert cols[:2] == ["user_id", "email"]
        like = [r[0] for r in engine.execute('SHOW TABLES LIKE "user%"').collect()]
        assert like == ["users"]

    def test_set_use_variables(self, engine):
        engine.execute("SET @myvar = 42")
        engine.execute("USE mydb")
        assert engine.name == "mydb"
        v = rows(engine.execute("SHOW VARIABLES"))
        assert ("@myvar", "42") in v

    def test_filterql_from_table(self, engine):
        df = engine.execute("FILTER AND(referral_count > 50, EXISTS email) FROM users")
        assert df.count() == 1

    def test_filterql_include(self, engine):
        engine.register_include("heavy", "referral_count > 50")
        df = engine.execute("FILTER AND(INCLUDE heavy, EXISTS interests) FROM users")
        assert df.count() == 1
        df2 = engine.execute("FILTER NOT INCLUDE heavy FROM users")
        assert df2.count() == 2

    def test_filter_arbitrary_df(self, engine, spark):
        df = spark.range(10).withColumnRenamed("id", "n")
        out = engine.filter(df, "FILTER n BETWEEN 2 AND 5")
        assert sorted(r[0] for r in out.collect()) == [3, 4]  # exclusive!

    def test_union_intersect_superset(self, engine):
        a = engine.sql("SELECT user_id FROM users WHERE referral_count > 50")
        b = engine.sql("SELECT user_id FROM users WHERE referral_count <= 50")
        assert a.unionAll(b).count() == 3

    def test_explain(self, engine):
        df = engine.execute("EXPLAIN SELECT email FROM users WHERE referral_count > 50")
        text = "\n".join(r[0] for r in df.collect())
        assert "email" in text

    def test_into_registers_table(self, engine):
        engine.sql("SELECT user_id INTO snapshot FROM users")
        assert engine.table("snapshot").count() == 3
        engine.execute("DROP TABLE snapshot")

    def test_query_iterator_api(self, engine):
        it = engine.query("SELECT user_id FROM users ORDER BY user_id LIMIT 1")
        assert next(iter(it))[0] == "9Ip1aKbeZe2njCDM"

    def test_matches_single_record(self, engine):
        assert engine.matches({"x": 5, "y": "a"}, "FILTER AND(x > 4, y = \"a\")")
        assert not engine.matches({"x": 3, "y": "a"}, "FILTER AND(x > 4, y = \"a\")")
