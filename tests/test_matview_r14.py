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
