"""Statement-level plan cache + PREPARE API (round-7 directive #7).

- Engine.execute caches read-only statements (text → analyzed DataFrame
  incl. folded subquery literals), invalidated by any registry/DDL/DML/
  SET mutation and by TTL.
- Engine.prepare parses once; ``?`` qmark params bind at translate time.
  Re-executing with new params must skip re-parse AND re-fold: the
  parameter-free uncorrelated-subquery fold job runs exactly once —
  asserted via Spark job counts (statusTracker job groups).

Reference parity: qlbridge parses PREPARE but returns ErrNotImplemented
on execution (exec/executor.go:144-146) — this API is a documented
superset.
"""

from __future__ import annotations

import pytest

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError


@pytest.fixture()
def eng(spark):
    e = Engine(spark, "cache-test")
    e.register_rows(
        "items",
        [
            {"id": 1, "qty": 10, "price": 5.0},
            {"id": 2, "qty": 20, "price": 15.0},
            {"id": 3, "qty": 30, "price": 25.0},
            {"id": 4, "qty": 40, "price": 35.0},
        ],
    )
    return e


def _jobs_in_group(spark, group: str, body):
    """Run ``body()`` under a job group; return the number of Spark jobs
    it launched (public statusTracker API)."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        body()
    finally:
        sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup(group)
    return len(ids)


class TestPlanCache:
    def test_identical_text_returns_cached_plan(self, eng):
        q = "SELECT id, qty * 2 AS q2 FROM items WHERE qty > 15"
        d1 = eng.sql(q)
        d2 = eng.sql(q)
        assert d1 is d2
        assert eng.plan_cache_stats["hits"] == 1
        assert [r["id"] for r in d2.orderBy("id").collect()] == [2, 3, 4]

    def test_register_df_invalidates(self, eng, spark):
        q = "SELECT count(*) AS n FROM items"
        d1 = eng.sql(q)
        eng.register_rows("items", [{"id": 9, "qty": 1, "price": 1.0}])
        d2 = eng.sql(q)
        assert d1 is not d2
        assert d2.collect()[0]["n"] == 1

    def test_dml_invalidates(self, eng):
        q = "SELECT count(*) AS n FROM items"
        d1 = eng.sql(q)
        assert d1.collect()[0]["n"] == 4
        eng.execute("DELETE FROM items WHERE qty > 25")
        d2 = eng.sql(q)
        assert d1 is not d2
        assert d2.collect()[0]["n"] == 2

    def test_set_command_invalidates(self, eng):
        q = "SELECT id FROM items WHERE qty > 15"
        d1 = eng.sql(q)
        eng.execute("SET max_recursion_depth = 50")
        assert eng.sql(q) is not d1

    def test_ttl_expiry(self, eng):
        eng.plan_cache_ttl_s = 0.0
        q = "SELECT id FROM items"
        d1 = eng.sql(q)
        assert eng.sql(q) is not d1

    def test_select_into_never_cached(self, eng):
        eng.execute("SELECT id INTO copy1 FROM items WHERE qty > 15")
        # INTO mutates the registry: the same text must re-execute, and
        # the target table must exist
        assert eng.sql("SELECT count(*) AS n FROM copy1").collect()[0]["n"] == 3

    def test_sink_commit_forces_cache_miss(self, eng, spark, tmp_path):
        """Cached plans are keyed on sink VERSIONS: a direct sink commit
        (invisible to the engine) changes the key, so the next sql()
        rebuilds the scan and sees the new data."""
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "s"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        eng.register_sink("st", sink)
        q = "SELECT count(*) AS n FROM st"
        d1 = eng.sql(q)
        # direct sink mutation, invisible to the engine — the next sql()
        # must rebuild the scan and see the new version
        sink.merge_upsert(spark.createDataFrame([(2, "b")], "id long, v string"))
        d2 = eng.sql(q)
        assert d1 is not d2
        assert d2.collect()[0]["n"] == 2

    def test_versioned_sink_does_not_disable_cache(self, eng, spark, tmp_path):
        """One registered (versioned) merge sink no longer turns off
        statement caching — neither for pure registry tables nor for the
        sink table itself while its version is unchanged."""
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "s2"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        eng.register_sink("st", sink)
        h0 = eng.plan_cache_stats["hits"]
        d1 = eng.sql("SELECT id FROM items WHERE qty > 15")
        d2 = eng.sql("SELECT id FROM items WHERE qty > 15")
        assert d2 is d1 and eng.plan_cache_stats["hits"] == h0 + 1
        s1 = eng.sql("SELECT count(*) AS n FROM st")
        s2 = eng.sql("SELECT count(*) AS n FROM st")
        assert s2 is s1  # same sink version -> cache hit

    def test_unversioned_sink_disables_cache(self, eng, spark):
        class Unversioned:
            key = "id"

            def __init__(self, df):
                self.df = df

            def scan(self, spark):
                return self.df

        eng.register_sink("uv", Unversioned(spark.range(3)))
        d1 = eng.sql("SELECT id FROM items WHERE qty > 15")
        d2 = eng.sql("SELECT id FROM items WHERE qty > 15")
        assert d1 is not d2  # cannot fingerprint the sink -> no caching

    def test_planner_source_disables_cache(self, eng, spark, tmp_path):
        """SQLite & co. materialize rows at PLAN time — a cached plan
        would freeze external data (mirrors the _fold_key guard)."""
        import sqlite3

        dbf = str(tmp_path / "pc.db")
        con = sqlite3.connect(dbf)
        con.execute("CREATE TABLE t (id INTEGER)")
        con.execute("INSERT INTO t VALUES (1)")
        con.commit()
        eng.execute(
            'CREATE SOURCE sq WITH {"type": "sqlite", "file": "%s", "table": "t"}' % dbf
        )
        d1 = eng.sql("SELECT id FROM items WHERE qty > 15")
        d2 = eng.sql("SELECT id FROM items WHERE qty > 15")
        assert d1 is not d2
        # and the external table reflects mutations between statements
        assert eng.sql("SELECT count(*) AS n FROM sq").collect()[0]["n"] == 1
        con.execute("INSERT INTO t VALUES (2)")
        con.commit()
        assert eng.sql("SELECT count(*) AS n FROM sq").collect()[0]["n"] == 2
        con.close()

    def test_nondeterministic_not_cached(self, eng):
        """rand()/uuid() seeds freeze in an analyzed plan — repeated
        execution within the TTL must still produce fresh values."""
        q = "SELECT uuid() AS u FROM items WHERE id = 1"
        u1 = eng.sql(q).collect()[0]["u"]
        u2 = eng.sql(q).collect()[0]["u"]
        assert u1 != u2
        assert not eng._cacheable("SELECT rand() AS r FROM items", "SELECT")
        assert not eng._cacheable("SELECT id FROM items TABLESAMPLE (50 PERCENT)", "SELECT")
        assert eng._cacheable(
            "SELECT id FROM items TABLESAMPLE (50 PERCENT) REPEATABLE (7)", "SELECT"
        )


class TestPreparedStatement:
    def test_positional_binds(self, eng):
        ps = eng.prepare("SELECT ? AS a, ? AS b, id FROM items WHERE qty >= ?")
        rows = ps.sql(1, "x", 30).orderBy("id").collect()
        assert [(r["a"], r["b"], r["id"]) for r in rows] == [(1, "x", 3), (1, "x", 4)]
        rows = ps.sql(2, "y", 40).collect()
        assert [(r["a"], r["b"], r["id"]) for r in rows] == [(2, "y", 4)]

    def test_wrong_arity_raises(self, eng):
        ps = eng.prepare("SELECT id FROM items WHERE qty > ?")
        with pytest.raises(ExecError, match="1 parameter"):
            ps.sql(1, 2)

    def test_matches_direct_sql(self, eng):
        ps = eng.prepare("SELECT sum(qty) AS s FROM items WHERE price < ?")
        assert ps.sql(30.0).collect()[0]["s"] == eng.sql("SELECT sum(qty) AS s FROM items WHERE price < 30.0").collect()[0]["s"]

    def test_refold_skipped_across_executions(self, eng, spark):
        """THE r7 gate: a parameterized query with a parameter-free
        uncorrelated scalar subquery folds its plan-time job exactly once;
        the second execution builds its plan with ZERO Spark jobs."""
        ps = eng.prepare(
            "SELECT count(*) AS n FROM items WHERE qty < ? AND price < (SELECT avg(price) FROM items)"
        )
        n1 = _jobs_in_group(spark, "prep-fold-1", lambda: ps.sql(35))
        assert n1 >= 1  # the fold job ran (plan build only — no collect)
        n2 = _jobs_in_group(spark, "prep-fold-2", lambda: ps.sql(25))
        assert n2 == 0, f"second execution launched {n2} plan-time job(s)"
        assert eng.plan_cache_stats["fold_hits"] >= 1
        # results still correct per bind
        assert ps.sql(35).collect()[0]["n"] == 2
        assert ps.sql(100).collect()[0]["n"] == 2  # avg(price)=20 → id 1,2

    def test_param_inside_subquery_refolds(self, eng, spark):
        """A subquery that REFERENCES the param must re-fold per bind."""
        ps = eng.prepare(
            "SELECT count(*) AS n FROM items WHERE price < (SELECT avg(price) + ? FROM items)"
        )
        assert ps.sql(0).collect()[0]["n"] == 2
        assert ps.sql(10).collect()[0]["n"] == 3

    def test_quantified_fold_cached(self, eng, spark):
        ps = eng.prepare("SELECT count(*) AS n FROM items WHERE qty + ? > ALL (SELECT qty FROM items WHERE id < 3)")
        a = ps.sql(0).collect()[0]["n"]
        n2 = _jobs_in_group(spark, "prep-quant-2", lambda: ps.sql(5))
        assert n2 == 0
        assert a == 2  # qty>20: ids 3,4


class TestDbapiStillWorks:
    def test_qmark_through_dbapi(self, eng):
        """dbapi splices params as literals BEFORE the engine lexes — the
        new lexer numbering must not disturb that path."""
        from qlbridge_spark.dbapi import connect

        con = connect(engine=eng)
        cur = con.cursor()
        cur.execute("SELECT id FROM items WHERE qty > ? ORDER BY id", [15])
        assert [r[0] for r in cur.fetchall()] == [2, 3, 4]
        # repeated execute reuses the cached PreparedStatement handle
        cur.execute("SELECT id FROM items WHERE qty > ? ORDER BY id", [25])
        assert [r[0] for r in cur.fetchall()] == [3, 4]
        ps = con._prepared["SELECT id FROM items WHERE qty > ? ORDER BY id"]
        assert ps is not False and ps.n_params == 1

    def test_executemany_insert_binds(self, eng):
        """executemany INSERT runs through ONE cached PreparedStatement —
        parse once, typed binds per row."""
        from qlbridge_spark.dbapi import connect

        con = connect(engine=eng)
        cur = con.cursor()
        op = "INSERT INTO items (id, qty, price) VALUES (?, ?, ?)"
        cur.executemany(op, [(7, 70, 7.5), (8, 80, 8.5)])
        ps = con._prepared[op]
        assert ps is not False and ps.n_params == 3
        cur.execute("SELECT sum(qty) AS s FROM items WHERE id >= 7")
        assert cur.fetchone()[0] == 150

    def test_string_param_binds_typed(self, eng):
        """Prepared binds carry python values — a string containing a
        quote must not break (no literal splicing on this path)."""
        from qlbridge_spark.dbapi import connect

        eng.register_rows("names", [{"n": 'o"quote'}, {"n": "plain"}])
        con = connect(engine=eng)
        cur = con.cursor()
        cur.execute("SELECT count(*) AS c FROM names WHERE n = ?", ['o"quote'])
        assert cur.fetchone()[0] == 1


class TestDbApiFallbackScope:
    def test_runtime_error_propagates_without_demotion(self, eng):
        """A runtime ExecError from a successfully-translated prepared
        execution must PROPAGATE (not trigger a silent literal-splicing
        re-execution, which would double-apply DML effects) and must not
        permanently demote the operation from typed binds."""
        from qlbridge_spark.dbapi import ProgrammingError, connect

        con = connect(engine=eng)
        cur = con.cursor()
        op = "SELECT id FROM items WHERE qty > ? ORDER BY id"
        cur.execute(op, [15])
        assert [r[0] for r in cur.fetchall()] == [2, 3, 4]
        ps = con._prepared[op]
        assert ps is not False

        # force a RUNTIME failure inside the prepared execution: if the
        # old catch-all fallback were still in place, execute() would run
        # the statement twice (calls == 2) and demote the handle
        calls = {"n": 0}
        real = ps.execute

        def boom(*args):
            calls["n"] += 1
            raise ExecError("runtime failure after translate")

        ps.execute = boom
        try:
            with pytest.raises(ProgrammingError, match="runtime failure"):
                cur.execute(op, [15])
        finally:
            ps.execute = real
        assert calls["n"] == 1  # no second (spliced) execution
        assert con._prepared[op] is ps  # still the typed-bind handle

    def test_translate_failure_still_demotes_to_splicing(self, eng):
        """The legitimate fallback (statement shapes that cannot take
        translate-time binds) keeps working: a TranslateError from the
        prepared path demotes to literal splicing and succeeds."""
        from qlbridge_spark.dbapi import connect
        from qlbridge_spark.translate import TranslateError

        con = connect(engine=eng)
        cur = con.cursor()
        op = "SELECT id FROM items WHERE qty > ? ORDER BY id"
        cur.execute(op, [15])
        ps = con._prepared[op]

        def cannot_bind(*args):
            raise TranslateError("this shape cannot take typed binds")

        ps.execute = cannot_bind
        cur.execute(op, [25])  # falls back to splicing, succeeds
        assert [r[0] for r in cur.fetchall()] == [3, 4]
        assert con._prepared[op] is False  # demotion remembered


class TestFoldCacheWithSinks:
    def test_fold_reuse_keyed_on_sink_version(self, eng, spark, tmp_path):
        """Round 9: a registered VERSIONED sink no longer disables fold
        caching — folds reuse while the sink version is unchanged and
        refold after a direct sink commit."""
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "fs"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        eng.register_sink("st", sink)
        ps = eng.prepare(
            "SELECT id FROM items WHERE qty >= ? AND price < (SELECT max(price) FROM items)"
        )
        ps.sql(10)
        m0, h0 = eng.plan_cache_stats["fold_misses"], eng.plan_cache_stats["fold_hits"]
        assert m0 >= 1
        ps.sql(20)
        assert eng.plan_cache_stats["fold_hits"] == h0 + 1  # reused despite the sink
        # direct sink commit -> version changes -> refold
        sink.insert_append(spark.createDataFrame([(2, "b")], "id long, v string"))
        ps.sql(30)
        assert eng.plan_cache_stats["fold_misses"] == m0 + 1


class TestSeedFingerprintHygiene:
    def test_prepared_refolds_after_sink_commit_despite_cache_hit(self, eng, spark, tmp_path):
        """A plan-cache HIT must not leave a stale sink fingerprint behind
        for the next DIRECT execute_stmt (prepared statements): after a
        sink commit, the prepared statement's subquery fold over the sink
        table must re-run, not serve the pre-commit value."""
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "sf"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        eng.register_sink("st", sink)
        # WHERE-position subquery: folded at plan time (select-position
        # scalar subqueries are lazy and would mask the staleness)
        ps = eng.prepare("SELECT id FROM items WHERE id <= (SELECT count(*) FROM st) AND qty >= ?")
        assert [r["id"] for r in ps.sql(0).orderBy("id").collect()] == [1]  # fold: count=1
        # a cache MISS then HIT on an unrelated statement (the hit path
        # previously left the pre-commit fingerprint seeded)
        q = "SELECT id FROM items WHERE qty > 15"
        d1 = eng.sql(q)
        assert eng.sql(q) is d1  # hit
        sink.insert_append(spark.createDataFrame([(2, "b")], "id long, v string"))
        # must REFOLD under the new sink version: count=2 -> ids [1, 2]
        assert [r["id"] for r in ps.sql(0).orderBy("id").collect()] == [1, 2]
