"""Round-14 materialized-view additions.

1. median/percentile_cont(DISTINCT x) ride the substate multiset:
   exposure interpolates over the support counting each distinct value
   ONCE; mode(DISTINCT x) ≡ min(x) rides the plain extremum machinery.
"""

import random

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.sinks import ParquetMergeSink


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


def _mk(spark, tmp_path, name, rows=None):
    eng = Engine(spark, f"mvr14-{name}")
    t = ParquetMergeSink(spark, str(tmp_path / f"{name}_t"), key="id")
    t.ensure(
        spark.createDataFrame(
            rows
            or [(i, "g" + str(i % 3), float(i % 7)) for i in range(40)],
            "id long, g string, x double",
        )
    )
    eng.register_sink("t", t)
    return eng


class TestDistinctSortAggMatViews:
    Q = (
        "SELECT g, median(DISTINCT x) AS md, percentile_cont(DISTINCT x, 0.25) AS p25, "
        "mode(DISTINCT x) AS mo, count(*) AS n FROM t GROUP BY g"
    )

    def test_lifecycle_differential(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "dsa")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        kinds = {a.kind for a in mv.aggs}
        assert "median_distinct" in kinds and "percentile_cont_distinct" in kinds
        # mode(DISTINCT) lowered to the extremum machinery
        assert "min" in kinds
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        for stmt in (
            "INSERT INTO t (id, g, x) VALUES (100, 'g1', 9.5), (101, 'g0', 0.5)",
            "DELETE FROM t WHERE id % 5 = 2",
            "UPDATE t SET x = 4.25 WHERE id % 7 = 0",
            # delete the reigning minimum of a group (mode(DISTINCT) repair)
            "DELETE FROM t WHERE x <= 0.5",
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q), stmt

    def test_randomized_differential(self, spark, tmp_path):
        rng = random.Random(1414)
        eng = _mk(spark, tmp_path, "dsr")
        q = (
            "SELECT g, median(DISTINCT x) AS md, percentile_cont(DISTINCT x, 0.8) AS p80 "
            "FROM t WHERE x <> 2.0 GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        nid = [1000]
        for round_ in range(6):
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                if op < 0.4:
                    nid[0] += 1
                    eng.execute(
                        f"INSERT INTO t (id, g, x) VALUES ({nid[0]}, 'g{rng.randint(0, 3)}', {rng.uniform(-3, 10):.2f})"
                    )
                elif op < 0.7:
                    eng.execute(f"DELETE FROM t WHERE id % 11 = {rng.randint(0, 10)}")
                else:
                    eng.execute(
                        f"UPDATE t SET x = {rng.uniform(-3, 10):.2f} WHERE id % 9 = {rng.randint(0, 8)}"
                    )
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (round_, rep)
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), round_

    def test_distinct_vs_plain_median_differ(self, spark, tmp_path):
        # duplicates pull the plain median but not the DISTINCT one —
        # pin that the two kinds stay distinct end-to-end
        eng = _mk(
            spark,
            tmp_path,
            "dvp",
            rows=[(1, "a", 1.0), (2, "a", 1.0), (3, "a", 1.0), (4, "a", 5.0), (5, "a", 9.0)],
        )
        q = "SELECT g, median(x) AS m, median(DISTINCT x) AS md FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        r = eng.sql("SELECT * FROM mv").collect()[0]
        assert r["m"] == 1.0 and r["md"] == 5.0
        eng.execute("INSERT INTO t (id, g, x) VALUES (6, 'a', 9.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_global_and_filter_clause(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "gfc")
        q = (
            "SELECT median(DISTINCT x) AS md, "
            "median(DISTINCT x) FILTER (WHERE g = 'g1') AS mdf FROM t"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO t (id, g, x) VALUES (200, 'g1', 8.25)")
        eng.execute("DELETE FROM t WHERE id % 6 = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)


class TestExposeTimeScalarSubqueries:
    """Scalar subqueries in SELECT-list / HAVING / QUALIFY matviews:
    values freeze at CREATE, re-evaluate per REFRESH, and a MOVED value
    only re-exposes (mode stays incremental) — contrast with the WHERE
    freeze-and-verify pin, where a moved value forces one full rebuild."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"mvr14es-{name}")
        t = ParquetMergeSink(spark, str(tmp_path / f"{name}_t"), key="id")
        t.ensure(
            spark.createDataFrame(
                [(i, "g" + str(i % 3), float(i % 7)) for i in range(30)],
                "id long, g string, x double",
            )
        )
        r = ParquetMergeSink(spark, str(tmp_path / f"{name}_r"), key="k")
        r.ensure(spark.createDataFrame([(1, 3.0), (2, 8.0)], "k long, thr double"))
        eng.register_sink("t", t)
        eng.register_sink("r", r)
        return eng

    def test_select_list_scalar(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "sel")
        q = "SELECT g, count(*) AS n, (SELECT min(thr) FROM r) AS t0 FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and len(mv.expose_subs) == 1
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # base churn: folds, value unchanged
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 'g1', 6.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # value moves with NO base change: re-expose, NEVER full
        eng.execute("UPDATE r SET thr = 1.5 WHERE k = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_having_scalar_moved_no_rebuild(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "hav")
        q = (
            "SELECT g, sum(x) AS s FROM t GROUP BY g "
            "HAVING sum(x) > (SELECT min(thr) FROM r) * 9"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and len(mv.expose_subs) == 1
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # the threshold moves so far that group membership flips —
        # still no state rebuild, just a re-expose over the kept state
        eng.execute("UPDATE r SET thr = 0.1 WHERE k = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("UPDATE r SET thr = 99.0 WHERE k = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").count() == 0  # all filtered

    def test_qualify_scalar(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "qua")
        q = (
            "SELECT g, sum(x) AS s, rank() OVER (ORDER BY sum(x)) AS rk "
            "FROM t GROUP BY g QUALIFY rk <= (SELECT min(k) + 1 FROM r)"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("UPDATE r SET k = 0 WHERE k = 1")  # top-2 -> top-1
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").count() == 1

    def test_where_vs_expose_contrast(self, spark, tmp_path):
        # the SAME subquery in WHERE (state context) forces a full
        # rebuild when it moves; in HAVING it does not — pin both so the
        # distinction can't silently erode
        eng = self._mk(spark, tmp_path, "con")
        qw = "SELECT g, count(*) AS n FROM t WHERE x > (SELECT min(thr) FROM r) GROUP BY g"
        qh = "SELECT g, count(*) AS n FROM t GROUP BY g HAVING count(*) > (SELECT min(thr) FROM r)"
        eng.execute(f"CREATE MATERIALIZED VIEW mvw AS {qw}")
        eng.execute(f"CREATE MATERIALIZED VIEW mvh AS {qh}")
        assert eng.mat_views["mvw"].scalar_subs and not eng.mat_views["mvw"].expose_subs
        assert eng.mat_views["mvh"].expose_subs and not eng.mat_views["mvh"].scalar_subs
        eng.execute("UPDATE r SET thr = 5.0 WHERE k = 1")
        assert eng.sql("REFRESH MATERIALIZED VIEW mvw").collect()[0]["mode"] == "full"
        assert eng.sql("REFRESH MATERIALIZED VIEW mvh").collect()[0]["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mvw") == _rows(eng, qw)
        assert _rows(eng, "SELECT * FROM mvh") == _rows(eng, qh)

    def test_both_contexts_in_one_view(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "bot")
        q = (
            "SELECT g, count(*) AS n, (SELECT max(k) FROM r) AS mk FROM t "
            "WHERE x > (SELECT min(thr) FROM r) GROUP BY g "
            "HAVING count(*) >= (SELECT min(k) FROM r)"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and len(mv.scalar_subs) == 1 and len(mv.expose_subs) == 2
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # base churn folds while every value holds
        eng.execute("DELETE FROM t WHERE id % 9 = 4")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # only the EXPOSE values move (k): no rebuild
        eng.execute("UPDATE r SET k = k + 10 WHERE k = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # the WHERE value moves: one full rebuild, and both expose
        # values stay current through it
        eng.execute("UPDATE r SET thr = 4.5 WHERE k = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_set_context_in_having_stays_full(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "set")
        q = (
            "SELECT g, count(*) AS n FROM t GROUP BY g "
            "HAVING count(*) IN (SELECT k FROM r)"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng.mat_views["mv"].incremental  # pinned: set context
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
