"""Source-owned pushdown (SourcePlanner parity).

Reference: plan.SourcePlanner (/root/reference/plan/plan.go:116-123) and
exec.ExecutorSource (/root/reference/exec/executor.go:194-198): a registered
source is offered its rewritten sub-select and may take over its planning.
Here: the engine offers each plannable FROM source a pruned/pushed
SqlSelect; the source returns a DataFrame embodying any subset of it and
the engine re-applies the WHERE (idempotent safety contract, planner.py).
"""

from __future__ import annotations

import sqlite3

import pytest

from qlbridge_spark import Engine, EsDataFrameSource, parse_sql, rewrite_source_select
from qlbridge_spark.nodes import IdentityNode


class RecordingSource:
    """Custom source that records the sub-select the engine hands it."""

    def __init__(self, df):
        self.df = df
        self.seen = []

    def scan(self, spark):
        return self.df

    def walk_source_select(self, engine, sel):
        self.seen.append(sel)
        return self.df  # declines to push anything; engine filters on top


class TestRewrite:
    def test_single_source_prune_and_push(self):
        sel = parse_sql("SELECT name, balance FROM users WHERE deleted = 0 AND balance > 10 LIMIT 5")
        rw = rewrite_source_select(sel, sel.from_[0])
        assert [c.expr.name for c in rw.select.columns] == ["name", "balance", "deleted"]
        assert rw.select.where is not None and "deleted" in rw.select.where.sql() and "balance" in rw.select.where.sql()
        assert rw.all_where_offered is True
        assert rw.select.limit == 5

    def test_join_splits_conjuncts_per_source(self):
        sel = parse_sql(
            "SELECT u.name, o.price FROM users AS u "
            "INNER JOIN orders AS o ON u.user_id = o.user_id "
            "WHERE u.deleted = 0 AND o.price > 10"
        )
        rw_u = rewrite_source_select(sel, sel.from_[0])
        rw_o = rewrite_source_select(sel, sel.from_[1])
        assert "deleted" in rw_u.select.where.sql() and "price" not in rw_u.select.where.sql()
        assert "price" in rw_o.select.where.sql() and "deleted" not in rw_o.select.where.sql()
        # neither source was offered the complete WHERE → LIMIT never offered
        assert rw_u.all_where_offered is False and rw_o.all_where_offered is False
        # qualified columns are attributed and stripped of the alias
        u_cols = [c.expr.name for c in rw_u.select.columns]
        assert "name" in u_cols and "user_id" in u_cols and "price" not in u_cols

    def test_subquery_conjunct_stays_engine_side(self):
        sel = parse_sql("SELECT name FROM users WHERE user_id IN (SELECT user_id FROM orders) AND deleted = 0")
        rw = rewrite_source_select(sel, sel.from_[0])
        assert "deleted" in (rw.select.where.sql() if rw.select.where else "")
        assert "SELECT" not in (rw.select.where.sql() if rw.select.where else "")
        assert rw.all_where_offered is False

    def test_star_select_keeps_star(self):
        sel = parse_sql("SELECT * FROM users WHERE deleted = 0")
        rw = rewrite_source_select(sel, sel.from_[0])
        assert len(rw.select.columns) == 1 and rw.select.columns[0].is_star


class TestCustomSourceHook:
    def test_source_receives_rewritten_subselect(self, spark):
        eng = Engine(spark, "planner-test")
        src = RecordingSource(spark.createDataFrame([("a", 1, 0), ("b", 2, 1)], "name string, balance long, deleted long"))
        eng.register_source("mystore", src)

        rows = eng.sql("SELECT name FROM mystore WHERE deleted = 0 AND balance >= 1").collect()
        assert [r["name"] for r in rows] == ["a"]
        assert len(src.seen) == 1
        sub = src.seen[0]
        assert {c.expr.name for c in sub.columns} == {"name", "deleted", "balance"}
        assert sub.where is not None and "deleted" in sub.where.sql()

    def test_declining_source_falls_back_to_scan(self, spark):
        class Declining(RecordingSource):
            def walk_source_select(self, engine, sel):
                self.seen.append(sel)
                return None

        eng = Engine(spark, "planner-test2")
        src = Declining(spark.createDataFrame([("a", 0)], "name string, deleted long"))
        eng.register_source("s2", src)
        rows = eng.sql("SELECT name FROM s2 WHERE deleted = 0").collect()
        assert [r["name"] for r in rows] == ["a"]
        assert len(src.seen) == 1

    def test_partial_pushdown_is_still_correct(self, spark):
        class HalfPush(RecordingSource):
            def walk_source_select(self, engine, sel):
                # source pushes NOTHING of the where but prunes columns —
                # engine's re-applied filter must still give exact rows
                self.seen.append(sel)
                names = [c.expr.name for c in sel.columns if not c.is_star]
                return self.df.select(*[c for c in self.df.columns if c in names]) if names else self.df

        eng = Engine(spark, "planner-test3")
        src = HalfPush(spark.createDataFrame([("a", 1, 0), ("b", 2, 1), ("c", 3, 0)], "name string, balance long, deleted long"))
        eng.register_source("s3", src)
        rows = eng.sql("SELECT name FROM s3 WHERE deleted = 0 AND balance > 1 ORDER BY name").collect()
        assert [r["name"] for r in rows] == ["c"]


class TestSqlitePushdown:
    @pytest.fixture()
    def db_file(self, tmp_path):
        p = str(tmp_path / "push.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE users (user_id TEXT, name TEXT, deleted INTEGER, reg_yy INTEGER, balance REAL)")
        con.executemany(
            "INSERT INTO users VALUES (?,?,?,?,?)",
            [("u1", "Aaron", 0, 12, 100.5), ("u2", "Bob", 1, 13, 50.0), ("u3", "Carol", 0, 12, 75.25)],
        )
        con.commit()
        con.close()
        return p

    def test_predicates_compile_to_sqlite_sql(self, spark, db_file):
        eng = Engine(spark, "sqlite-push")
        eng.execute(f'CREATE SOURCE sq WITH {{"type": "sqlite", "file": "{db_file}", "dbtable": "users"}}')
        src = eng.planner_sources["sq"]

        rows = eng.sql("SELECT name FROM sq WHERE deleted = 0 AND balance > 60 ORDER BY name").collect()
        assert [r["name"] for r in rows] == ["Aaron", "Carol"]
        sql = src.last_pushdown
        assert sql is not None and "WHERE" in sql and "deleted" in sql and "balance" in sql
        # projection pruned to referenced columns, not SELECT *
        assert '"name"' in sql.split("FROM")[0]

    def test_between_like_in_push(self, spark, db_file):
        eng = Engine(spark, "sqlite-push2")
        eng.execute(f'CREATE SOURCE sq WITH {{"type": "sqlite", "file": "{db_file}", "dbtable": "users"}}')
        src = eng.planner_sources["sq"]

        # dialect BETWEEN is exclusive (vm/vm.go:868): 50.0 must be excluded
        rows = eng.sql("SELECT name FROM sq WHERE balance BETWEEN 50.0 AND 101 ORDER BY name").collect()
        assert [r["name"] for r in rows] == ["Aaron", "Carol"]
        assert ">" in src.last_pushdown and "<" in src.last_pushdown

        rows = eng.sql('SELECT name FROM sq WHERE name LIKE "Ca*"').collect()
        assert [r["name"] for r in rows] == ["Carol"]
        assert "LIKE 'Ca%'" in src.last_pushdown

        rows = eng.sql('SELECT name FROM sq WHERE user_id IN ("u1", "u2") ORDER BY name').collect()
        assert [r["name"] for r in rows] == ["Aaron", "Bob"]
        assert "IN ('u1', 'u2')" in src.last_pushdown

    def test_uncompilable_conjunct_dropped_from_push(self, spark, db_file):
        eng = Engine(spark, "sqlite-push3")
        eng.execute(f'CREATE SOURCE sq WITH {{"type": "sqlite", "file": "{db_file}", "dbtable": "users"}}')
        src = eng.planner_sources["sq"]
        # tolower() isn't compiled → engine-side; deleted = 0 still pushes
        rows = eng.sql('SELECT name FROM sq WHERE deleted = 0 AND tolower(name) = "carol"').collect()
        assert [r["name"] for r in rows] == ["Carol"]
        assert "deleted" in src.last_pushdown and "tolower" not in src.last_pushdown
        # limit must NOT appear when part of the WHERE stayed engine-side
        assert "LIMIT" not in src.last_pushdown

    def test_limit_pushed_only_with_full_where(self, spark, db_file):
        eng = Engine(spark, "sqlite-push4")
        eng.execute(f'CREATE SOURCE sq WITH {{"type": "sqlite", "file": "{db_file}", "dbtable": "users"}}')
        src = eng.planner_sources["sq"]
        rows = eng.sql("SELECT name FROM sq WHERE deleted = 0 LIMIT 1").collect()
        assert len(rows) == 1
        assert "LIMIT 1" in src.last_pushdown

    def test_drop_and_show_tables(self, spark, db_file):
        eng = Engine(spark, "sqlite-push5")
        eng.execute(f'CREATE SOURCE sq WITH {{"type": "sqlite", "file": "{db_file}", "dbtable": "users"}}')
        tables = [r["Table"] for r in eng.sql("SHOW TABLES").collect()]
        assert "sq" in tables
        eng.execute("DROP SOURCE sq")
        assert "sq" not in [r["Table"] for r in eng.sql("SHOW TABLES").collect()]


class TestEsSourceHook:
    def test_filterql_generates_dsl_and_rows(self, spark):
        eng = Engine(spark, "es-test")
        df = spark.createDataFrame(
            [("u1", "aaron@email.com", 82), ("u2", "bob@email.com", 12), ("u3", "x", 0)],
            "user_id string, email string, referral_count long",
        )
        es = EsDataFrameSource(df)
        eng.register_source("esusers", es)

        rows = eng.sql('FILTER AND (referral_count > 10, email LIKE "%email.com") FROM esusers ALIAS good').collect()
        assert sorted(r["user_id"] for r in rows) == ["u1", "u2"]
        q = es.last_query
        assert q is not None and "query" in q
        body = q["query"]
        assert body["bool"]["filter"][0] == {"range": {"referral_count": {"gt": 10}}}
        assert body["bool"]["filter"][1] == {"wildcard": {"email": "*email.com"}}
        # ALIAS registered as include for later reuse
        assert "good" in eng.includes

    def test_sql_where_pushes_to_es_query(self, spark):
        eng = Engine(spark, "es-test2")
        df = spark.createDataFrame([("u1", 82), ("u2", 5)], "user_id string, referral_count long")
        es = EsDataFrameSource(df)
        eng.register_source("esusers", es)
        rows = eng.sql("SELECT user_id FROM esusers WHERE referral_count >= 10").collect()
        assert [r["user_id"] for r in rows] == ["u1"]
        assert es.last_query["query"] == {"range": {"referral_count": {"gte": 10}}}
        assert es.last_query.get("_source") == ["user_id", "referral_count"]

    def test_unexpressible_predicate_falls_back(self, spark):
        eng = Engine(spark, "es-test3")
        df = spark.createDataFrame([("Aaron",), ("bob",)], "name string")
        es = EsDataFrameSource(df)
        eng.register_source("esusers", es)
        rows = eng.sql("SELECT name FROM esusers WHERE len(name) >= 5").collect()
        assert [r["name"] for r in rows] == ["Aaron"]
        assert es.last_query is None  # generator declined; engine filtered


class TestRewriteHelpers:
    def test_identity_strip(self):
        sel = parse_sql("SELECT u.name FROM users AS u WHERE u.deleted = 0")
        rw = rewrite_source_select(sel, sel.from_[0])
        # qualifier stripped so the source sees bare column names
        assert isinstance(rw.select.where.left, IdentityNode)
        assert rw.select.where.left.parts == ("deleted",)


class TestPushdownSemanticsSafety:
    """Regression pins for review findings: pushed SQL must never NARROW
    beyond dialect semantics (the engine can only re-filter, not recover
    dropped rows)."""

    @pytest.fixture()
    def db_file(self, tmp_path):
        p = str(tmp_path / "sem.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (id INTEGER, name TEXT, tag TEXT)")
        con.executemany(
            "INSERT INTO t VALUES (?,?,?)",
            [(1, "Carol", "x"), (2, "carol", "y"), (3, "Caxol", ""), (4, None, "z")],
        )
        con.commit()
        con.close()
        return p

    def _engine(self, spark, db_file, name):
        eng = Engine(spark, name)
        eng.execute(f'CREATE SOURCE sq WITH {{"type": "sqlite", "file": "{db_file}", "dbtable": "t"}}')
        return eng, eng.planner_sources["sq"]

    def test_negated_like_not_pushed(self, spark, db_file):
        # sqlite LIKE is case-insensitive: pushing NOT LIKE 'Ca%' would
        # drop 'carol' which the (case-sensitive) dialect keeps
        eng, src = self._engine(spark, db_file, "sem1")
        rows = sorted(r["id"] for r in eng.sql('SELECT id FROM sq WHERE name NOT LIKE "Ca*"').collect())
        assert rows == [2]  # only lowercase 'carol' escapes the dialect glob
        assert "LIKE" not in (src.last_pushdown or "")

    def test_question_wildcard_not_pushed(self, spark, db_file):
        # dialect '?' = single char; literal in sqlite → would under-match
        eng, src = self._engine(spark, db_file, "sem2")
        rows = sorted(r["id"] for r in eng.sql('SELECT id FROM sq WHERE name LIKE "Ca?ol"').collect())
        assert rows == [1, 3]  # Carol + Caxol (case-sensitive ? wildcard)
        assert "LIKE" not in (src.last_pushdown or "")

    def test_null_semantics_count_empty_string(self, spark, db_file):
        # dialect `x != NULL` == exists(x): NULL and '' both missing
        eng, src = self._engine(spark, db_file, "sem3")
        rows = sorted(r["id"] for r in eng.sql("SELECT id FROM sq WHERE tag != NULL").collect())
        assert rows == [1, 2, 4]  # row 3 has '' → missing
        assert "!= ''" in src.last_pushdown
        rows = sorted(r["id"] for r in eng.sql("SELECT id FROM sq WHERE tag = NULL").collect())
        assert rows == [3]

    def test_numeric_literal_on_text_column_not_pushed(self, spark, tmp_path):
        # TEXT-affinity column vs numeric literal: sqlite compares
        # lexicographically ('10' < 5 is false, '42.0' = 42 is false) while
        # the dialect coerces to numeric — pushing would NARROW. The
        # affinity gate must keep the comparison engine-side.
        p = str(tmp_path / "aff.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (id INTEGER, sval TEXT)")
        con.executemany("INSERT INTO t VALUES (?,?)", [(1, "10"), (2, "42.0"), (3, "3")])
        con.commit()
        con.close()
        eng, src = self._engine(spark, p, "sem-aff")
        rows = sorted(r["id"] for r in eng.sql("SELECT id FROM sq WHERE sval > 5").collect())
        assert rows == [1, 2]  # numeric coercion: 10 and 42.0 exceed 5
        assert "sval" not in (src.last_pushdown or "").split("FROM")[-1]
        rows = sorted(r["id"] for r in eng.sql("SELECT id FROM sq WHERE sval = 42").collect())
        assert rows == [2]
        # matching affinity still pushes (id INTEGER vs numeric literal)
        rows = sorted(r["id"] for r in eng.sql("SELECT id FROM sq WHERE id > 1").collect())
        assert rows == [2, 3]
        assert '"id" > 1' in src.last_pushdown

    def test_string_literal_on_numeric_column_not_pushed(self, spark, db_file):
        # INTEGER column vs string literal: sqlite applies INTEGER affinity
        # to the literal only when it's a well-formed number; keep the
        # engine's permissive coercion authoritative instead.
        eng, src = self._engine(spark, db_file, "sem-aff2")
        rows = sorted(r["id"] for r in eng.sql('SELECT id FROM sq WHERE id > "2"').collect())
        assert rows == [3, 4]
        assert "WHERE" not in (src.last_pushdown or "")

    def test_filterql_refiltered_after_source(self, spark):
        # a source may legally return a SUPERSET from walk_source_filter —
        # the engine must re-apply the filter (same contract as SELECT)
        class Superset(RecordingSource):
            def walk_source_filter(self, engine, stmt):
                self.seen.append(stmt)
                return self.df  # applied nothing

        eng = Engine(spark, "sem4")
        src = Superset(spark.createDataFrame([("a", 5), ("b", 50)], "name string, score long"))
        eng.register_source("s", src)
        rows = eng.sql("FILTER score > 10 FROM s").collect()
        assert [r["name"] for r in rows] == ["b"]
        assert len(src.seen) == 1
