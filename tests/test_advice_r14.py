"""Round-14 ADVICE regression pins (all three r13 advisor items were
severity 'low').

1. ``variance-family(DISTINCT x)`` computes distinctness at the SOURCE
   type (collect_set the raw column, cast to double inside the fold),
   so bigints distinct beyond 2^53 don't collapse into one double —
   matching the matview substate exposure and the DuckDB oracle
   (functions/__init__.py).
2. ``join_on_parts`` resolves the bare table name of a self-join to the
   occurrence NOT aliased away (mirroring analyze's extrema-side
   logic): ``FROM t AS a JOIN t ON a.k = t.k`` classifies ``t.k`` as
   dim-side, yielding equality pairs so dim-delta refresh stays
   incremental instead of silently degrading to full recompute
   (matview.py).
3. Freeze-and-verify scalar-subquery comparison is NaN-aware: a
   NaN-valued frozen scalar (e.g. avg over all-NaN data) compares equal
   to its unchanged re-evaluation, so refresh folds incrementally
   instead of forcing a full state rebuild every time
   (engine_matview.py).
"""

import math

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.sinks import ParquetMergeSink


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


class TestDistinctVarianceSourceTypeDedup:
    """Distinctness of variance-family(DISTINCT) at the source type."""

    # 2^53 and 2^53+1 are distinct bigints but the SAME double
    P53 = 9_007_199_254_740_992

    def test_adjacent_bigints_beyond_2_53_stay_distinct(self, spark):
        e = Engine(spark)
        e.register_df(
            "vb",
            spark.createDataFrame(
                [(1, self.P53), (2, self.P53 + 1)], "id int, x long"
            ),
        )
        r = e.execute(
            "SELECT var_samp(DISTINCT x) AS vs, var_pop(DISTINCT x) AS vp FROM vb"
        ).collect()[0]
        # source-type dedup keeps BOTH values (n=2); they cast to the
        # same double so the variance itself is 0.0 — the old
        # double-first dedup collapsed to n=1 and returned NULL vs
        assert r.vs == 0.0 and r.vp == 0.0

    def test_source_type_cardinality_beyond_2_53(self, spark):
        # {2^53, 2^53+1, 2^53+4} dedups to n=3 at the source type; the
        # values then cast to doubles {P, P, P+4}. NOTE a documented
        # divergence: DuckDB casts the argument to DOUBLE BEFORE the
        # DISTINCT for the variance family (var_samp here = 8.0 over
        # the post-cast pair {P, P+4}) even though its count(DISTINCT)
        # is 3 — we follow count(DISTINCT)/the matview substate, which
        # dedups at the source type; within 2^53 both agree.
        e = Engine(spark)
        vals = [self.P53, self.P53 + 1, self.P53 + 4]
        e.register_df(
            "vb3",
            spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, x long"),
        )
        r = e.execute(
            "SELECT var_samp(DISTINCT x) AS vs, var_pop(DISTINCT x) AS vp FROM vb3"
        ).collect()[0]
        # doubles {0, 0, 4} shifted: mean 4/3, m2 = 32/3
        assert r.vs == pytest.approx(16 / 3, rel=1e-12)
        assert r.vp == pytest.approx(32 / 9, rel=1e-12)

    def test_within_2_53_matches_duckdb_oracle(self, spark):
        import duckdb

        e = Engine(spark)
        vals = [7, 7, 9, 12, 12, 40]
        e.register_df(
            "vb4",
            spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, x long"),
        )
        r = e.execute(
            "SELECT var_samp(DISTINCT x) AS vs, var_pop(DISTINCT x) AS vp,"
            " stddev(DISTINCT x) AS sd FROM vb4"
        ).collect()[0]
        con = duckdb.connect()
        ref = con.execute(
            "SELECT var_samp(DISTINCT x), var_pop(DISTINCT x), stddev(DISTINCT x)"
            " FROM (SELECT unnest(?::BIGINT[]) AS x)",
            [vals],
        ).fetchone()
        con.close()
        assert r.vs == pytest.approx(ref[0], rel=1e-12)
        assert r.vp == pytest.approx(ref[1], rel=1e-12)
        assert r.sd == pytest.approx(ref[2], rel=1e-12)

    def test_double_columns_unchanged(self, spark):
        e = Engine(spark)
        e.register_df(
            "vd",
            spark.createDataFrame(
                [(1, 1.0), (2, 1.0), (3, 2.0), (4, 5.0), (5, None)],
                "id int, x double",
            ),
        )
        r = e.execute("SELECT var_samp(DISTINCT x) AS vs FROM vd").collect()[0]
        # distinct {1, 2, 5}: mean 8/3, m2 = 26/3, var_samp = 13/3
        assert r.vs == pytest.approx(26 / 3 / 2, rel=1e-12)


class TestSelfJoinBareDimOccurrence:
    """FROM t AS a JOIN t ON a.k = t.k — the DIM occurrence carries the
    bare table name; join_on_parts must classify t.k dim-side (like the
    analyze extrema logic) so the dim-delta terms keep equality pairs
    and refresh stays incremental."""

    def _mk(self, spark, tmp_path):
        eng = Engine(spark, "advr14-sj")
        t = ParquetMergeSink(spark, str(tmp_path / "t"), key="id")
        t.ensure(
            spark.createDataFrame(
                [(i, i % 4, float(i % 9)) for i in range(40)],
                "id long, dk int, x double",
            )
        )
        eng.register_sink("t", t)
        return eng

    def test_fact_aliased_dim_bare_maintains(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path)
        q = (
            "SELECT a.dk AS k, count(*) AS pairs, sum(t.x) AS sx "
            "FROM t AS a JOIN t ON a.dk = t.dk GROUP BY a.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        for stmt in (
            "INSERT INTO t (id, dk, x) VALUES (700, 1, 3.0), (701, 2, 4.0)",
            "DELETE FROM t WHERE id % 6 = 2",
            "UPDATE t SET x = 50.0 WHERE id % 7 = 0",
            "UPDATE t SET dk = 0 WHERE id = 9",  # row MOVES between groups
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), stmt

    def test_spellings_agree(self, spark, tmp_path):
        # both half-aliased spellings and the fully-aliased one expose
        # identical results after churn
        eng = self._mk(spark, tmp_path)
        qs = {
            "mva": "SELECT a.dk AS k, count(*) AS n FROM t AS a JOIN t ON a.dk = t.dk GROUP BY a.dk",
            "mvb": "SELECT t.dk AS k, count(*) AS n FROM t JOIN t AS b ON t.dk = b.dk GROUP BY t.dk",
            "mvc": "SELECT a.dk AS k, count(*) AS n FROM t AS a JOIN t AS b ON a.dk = b.dk GROUP BY a.dk",
        }
        for name, q in qs.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {name} AS {q}")
            assert eng.mat_views[name].incremental, name
        eng.execute("INSERT INTO t (id, dk, x) VALUES (800, 3, 1.5)")
        eng.execute("DELETE FROM t WHERE id % 5 = 1")
        for name, q in qs.items():
            rep = eng.sql(f"REFRESH MATERIALIZED VIEW {name}").collect()[0]
            assert rep["mode"] == "incremental", name
            assert _rows(eng, f"SELECT * FROM {name}") == _rows(eng, q), name


class TestNaNFrozenScalarSubquery:
    """An all-NaN frozen scalar must not force a full rebuild on every
    refresh: NaN == NaN for freeze-and-verify purposes."""

    def _mk(self, spark, tmp_path):
        eng = Engine(spark, "advr14-nan")
        t = ParquetMergeSink(spark, str(tmp_path / "t"), key="id")
        t.ensure(
            spark.createDataFrame(
                [(i, "g" + str(i % 3), float(i % 7)) for i in range(30)],
                "id long, g string, x double",
            )
        )
        ref = ParquetMergeSink(spark, str(tmp_path / "r"), key="k")
        ref.ensure(
            spark.createDataFrame(
                [(1, float("nan")), (2, float("nan"))], "k long, thr double"
            )
        )
        eng.register_sink("t", t)
        eng.register_sink("ref", ref)
        return eng

    def test_nan_scalar_stays_incremental(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path)
        # avg over all-NaN data is NaN; Spark orders NaN above every
        # double so x < NaN keeps all rows — semantics agree between
        # the direct query and the matview either way
        q = (
            "SELECT g, count(*) AS n, sum(x) AS s FROM t "
            "WHERE x < (SELECT avg(thr) FROM ref) GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and len(mv.scalar_subs) == 1
        assert math.isnan(mv.scalar_vals[0][0])
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # base churn; the frozen NaN re-evaluates to NaN → UNCHANGED
        for stmt in (
            "INSERT INTO t (id, g, x) VALUES (100, 'g1', 9.0)",
            "DELETE FROM t WHERE id % 7 = 2",
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), stmt
        # the value genuinely moves (NaN → finite) → one full rebuild
        eng.execute("UPDATE ref SET thr = 4.0 WHERE k IN (1, 2)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # and folds incrementally under the new finite value
        eng.execute("INSERT INTO t (id, g, x) VALUES (101, 'g0', 1.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)


class TestOrderByAggregates:
    """ANSI ORDER BY over aggregate expressions in grouped selects
    (r14): agg subtrees rewrite to hidden agg columns carried through
    the projection and dropped after the sort — incl. aggregates NOT in
    the select list and composites mixing scalar subqueries."""

    def _eng(self, spark):
        e = Engine(spark)
        e.register_df(
            "t",
            spark.createDataFrame(
                [(i, "g" + str(i % 3), float(i % 7)) for i in range(30)],
                "id int, g string, x double",
            ),
        )
        e.register_df("r", spark.createDataFrame([(1, 3.0)], "k int, thr double"))
        return e

    def test_order_by_agg_shapes(self, spark):
        e = self._eng(spark)
        # agg not in the select list: hidden column drives the sort
        r = e.sql("SELECT g FROM t GROUP BY g ORDER BY sum(x) DESC").collect()
        assert [x.g for x in r] == ["g0", "g2", "g1"]
        assert list(r[0].__fields__) == ["g"]
        df = e.sql("SELECT g FROM t GROUP BY g ORDER BY sum(x) DESC")
        assert df.columns == ["g"]  # hidden sort column dropped
        # composite agg expr + LIMIT
        r2 = e.sql(
            "SELECT g, count(*) AS n FROM t GROUP BY g "
            "ORDER BY count(*) * -1, g LIMIT 2"
        ).collect()
        assert [x.g for x in r2] == ["g0", "g1"]
        # agg + scalar subquery in ONE order key
        r3 = e.sql(
            "SELECT g, count(*) AS n FROM t GROUP BY g "
            "ORDER BY count(*) + (SELECT min(thr) FROM r) DESC, g"
        ).collect()
        assert [x.g for x in r3] == ["g0", "g1", "g2"]
        # HAVING + ORDER BY agg together (both hidden-column paths)
        r4 = e.sql(
            "SELECT g FROM t GROUP BY g HAVING sum(x) > 27 ORDER BY sum(x)"
        ).collect()
        assert [x.g for x in r4] == ["g2", "g0"]

    def test_matches_duckdb(self, spark):
        import duckdb

        e = self._eng(spark)
        got = [tuple(r) for r in e.sql(
            "SELECT g, sum(x) AS s FROM t GROUP BY g ORDER BY sum(x) DESC, g"
        ).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE t (id int, g varchar, x double)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                        [(i, "g%d" % (i % 3), float(i % 7)) for i in range(30)])
        want = con.execute(
            "SELECT g, sum(x) AS s FROM t GROUP BY g ORDER BY sum(x) DESC, g"
        ).fetchall()
        con.close()
        assert got == want
