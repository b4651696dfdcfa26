"""Round-16 directives (VERDICT r15): LEFT-join set-context matviews
fold under DIM commits — the T4 null-extension flips composed with
membership over the trilinear midpoint G_mid = F_old ⋉ M_new
(engine_matview._refresh_one). Covers IN / NOT EXISTS / correlated
scalar contexts, residual and two-sided non-equi ONs (the per-row T4'
variant), all three feeds moving in one refresh window, and the
pairless-ON pin (dim commit → one full recompute, correct)."""

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.sinks import ParquetMergeSink


@pytest.fixture()
def eng4(spark, tmp_path):
    """Engine with fact f (two membership keys) + subquery tables s1, s2."""
    eng = Engine(spark, f"r16b-{tmp_path.name}")
    fact = ParquetMergeSink(spark, str(tmp_path / "f"), key="id")
    fact.ensure(
        spark.createDataFrame(
            [
                (i, i % 5, i % 4, float(i % 9) if i % 11 else None)
                for i in range(60)
            ],
            "id long, dk int, ek int, x double",
        )
    )
    s1 = ParquetMergeSink(spark, str(tmp_path / "s1"), key="sid")
    s1.ensure(
        spark.createDataFrame(
            [(i, i % 7, float(i)) for i in range(20)], "sid long, v int, y double"
        )
    )
    s2 = ParquetMergeSink(spark, str(tmp_path / "s2"), key="tid")
    s2.ensure(
        spark.createDataFrame(
            [(i, i % 5, i * 3) for i in range(15)], "tid long, u int, z int"
        )
    )
    eng.register_sink("f", fact)
    eng.register_sink("s1", s1)
    eng.register_sink("s2", s2)
    return eng


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t),
    )


@pytest.fixture()
def eng3(spark, tmp_path):
    """Engine with fact f, dim d, subquery table s (all versioned sinks)."""
    eng = Engine(spark, f"r16-{tmp_path.name}")
    fact = ParquetMergeSink(spark, str(tmp_path / "f"), key="id")
    fact.ensure(
        spark.createDataFrame(
            [(i, i % 5, float(i % 9) if i % 11 else None) for i in range(60)],
            "id long, dk int, x double",
        )
    )
    dim = ParquetMergeSink(spark, str(tmp_path / "d"), key="dk")
    dim.ensure(
        spark.createDataFrame(
            [(k, f"n{k}", k * 2) for k in range(4)], "dk int, dname string, dv int"
        )
    )
    ssink = ParquetMergeSink(spark, str(tmp_path / "s"), key="sid")
    ssink.ensure(
        spark.createDataFrame(
            [(i, i % 7, float(i)) for i in range(20)], "sid long, v int, y double"
        )
    )
    eng.register_sink("f", fact)
    eng.register_sink("d", dim)
    eng.register_sink("s", ssink)
    return eng


def _drive(eng, q, muts, modes=None):
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
    assert eng.mat_views["mv"].incremental, q
    assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
    for i, m in enumerate(muts):
        eng.execute(m)
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        want = (modes or ["incremental"] * len(muts))[i]
        assert rep["mode"] == want, (q, i, m, rep["mode"], want)
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), (q, i, m)


class TestTwoSetContexts:
    """Two independent membership conjuncts over DISTINCT subquery
    tables compose (engine._in_sub_terms2): the product of memberships
    telescopes — Δ([M1][M2]) = flip1·[M2_new] + [M1_old]·flip2 — so
    each context's flip rows filter through the other membership and no
    cross term exists. Same-table pairs and joined views stay full."""

    def _drive2(self, eng, q, muts, modes=None):
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.in2_table is not None, q
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for i, m in enumerate(muts):
            eng.execute(m)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            want = (modes or ["incremental"] * len(muts))[i]
            assert rep["mode"] == want, (q, i, m, rep["mode"], want)
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), (q, i, m)

    def test_two_positive_in(self, eng4):
        self._drive2(
            eng4,
            "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS sx FROM f "
            "WHERE f.dk IN (SELECT s1.v FROM s1 WHERE s1.y < 12) "
            "AND f.ek IN (SELECT s2.u FROM s2 WHERE s2.z < 30) "
            "AND f.id > 1 GROUP BY f.dk",
            [
                "INSERT INTO f (id, dk, ek, x) VALUES (100, 2, 1, 5.0)",
                "UPDATE s1 SET y = 99.0 WHERE v = 3",
                "DELETE FROM s2 WHERE u = 1",
                "INSERT INTO s1 (sid, v, y) VALUES (50, 3, 1.0)",
                "DELETE FROM f WHERE id % 9 = 4",
            ],
        )

    def test_both_subquery_tables_one_window(self, eng4):
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.dk IN (SELECT s1.v FROM s1 WHERE s1.y < 12) "
            "AND f.ek IN (SELECT s2.u FROM s2 WHERE s2.z < 30) GROUP BY f.dk"
        )
        eng4.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng4.mat_views["mv"].incremental
        eng4.execute("INSERT INTO f (id, dk, ek, x) VALUES (200, 1, 2, 3.0)")
        eng4.execute("UPDATE s1 SET y = 50.0 WHERE v = 1")
        eng4.execute("DELETE FROM s2 WHERE u = 2")
        rep = eng4.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng4, "SELECT * FROM mv") == _rows(eng4, q)

    def test_in_plus_not_exists(self, eng4):
        self._drive2(
            eng4,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.dk IN (SELECT s1.v FROM s1 WHERE s1.y < 12) "
            "AND NOT EXISTS (SELECT 1 FROM s2 WHERE s2.u = f.ek AND s2.z > 20) "
            "GROUP BY f.dk",
            [
                "UPDATE s2 SET z = 40 WHERE u = 0",
                "UPDATE s1 SET y = 99.0 WHERE v = 2",
                "UPDATE s2 SET z = 1 WHERE u = 0",
                "INSERT INTO f (id, dk, ek, x) VALUES (101, 3, 0, 2.0)",
            ],
        )

    def test_provable_not_in_plus_in(self, eng4):
        self._drive2(
            eng4,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.dk IS NOT NULL AND f.dk NOT IN "
            "(SELECT s1.v FROM s1 WHERE s1.v = 2 AND s1.y < 12) "
            "AND f.ek IN (SELECT s2.u FROM s2 WHERE s2.z < 30) "
            "GROUP BY f.dk",
            [
                "UPDATE s1 SET y = 99.0 WHERE v = 2",
                "DELETE FROM s2 WHERE u = 3",
                "INSERT INTO s1 (sid, v, y) VALUES (60, 2, 2.0)",
            ],
        )

    def test_same_table_pair_pinned_full(self, eng4):
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.dk IN (SELECT s1.v FROM s1 WHERE s1.y < 10) "
            "AND f.ek IN (SELECT s1.v FROM s1 WHERE s1.y > 3) GROUP BY f.dk"
        )
        eng4.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng4.mat_views["mv"].incremental
        eng4.execute("UPDATE s1 SET y = 5.0 WHERE v = 1")
        rep = eng4.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng4, "SELECT * FROM mv") == _rows(eng4, q)

    def test_joined_view_two_contexts_pinned_full(self, eng4, spark, tmp_path):
        d = ParquetMergeSink(spark, str(tmp_path / "d2"), key="dk")
        d.ensure(
            spark.createDataFrame(
                [(k, f"n{k}") for k in range(4)], "dk int, dname string"
            )
        )
        eng4.register_sink("d", d)
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f JOIN d ON f.dk = d.dk "
            "WHERE f.dk IN (SELECT s1.v FROM s1 WHERE s1.y < 12) "
            "AND f.ek IN (SELECT s2.u FROM s2 WHERE s2.z < 30) GROUP BY f.dk"
        )
        eng4.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng4.mat_views["mv"].incremental
        eng4.execute("DELETE FROM s2 WHERE u = 0")
        eng4.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng4, "SELECT * FROM mv") == _rows(eng4, q)


class TestExistsRewrite:
    """Uncorrelated and non-equi-correlated [NOT] EXISTS conjuncts
    rewrite to uncorrelated scalar subqueries pre-analysis (r16) and
    ride the frozen-scalar machinery: EXISTS(s-local) ⟺ count(*)>0
    (exact); EXISTS(s_expr > X) ⟺ X < max(s_expr) (WHERE-sound — NULL
    outer / all-NULL witnesses land on not-TRUE); NOT EXISTS adds the
    explicit NULL-outer and empty-witness guards over count(s_expr).
    Equality-correlated EXISTS stays on the membership machinery."""

    FACT = [(i, i % 5, float(i % 9) if i % 11 else None) for i in range(40)]
    SROWS = [(i, i % 7, float(i) if i % 6 else None) for i in range(20)]

    @pytest.fixture()
    def engx(self, spark, tmp_path):
        eng = Engine(spark, f"r16x-{tmp_path.name}")
        fact = ParquetMergeSink(spark, str(tmp_path / "f"), key="id")
        fact.ensure(spark.createDataFrame(self.FACT, "id long, dk int, x double"))
        s = ParquetMergeSink(spark, str(tmp_path / "s"), key="sid")
        s.ensure(spark.createDataFrame(self.SROWS, "sid long, v int, y double"))
        eng.register_sink("f", fact)
        eng.register_sink("s", s)
        return eng

    @pytest.fixture()
    def duck(self):
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE f (id BIGINT, dk INT, x DOUBLE)")
        con.executemany("INSERT INTO f VALUES (?,?,?)", self.FACT)
        con.execute("CREATE TABLE s (sid BIGINT, v INT, y DOUBLE)")
        con.executemany("INSERT INTO s VALUES (?,?,?)", self.SROWS)
        return con

    def _drive(self, eng, con, q):
        def drows(sql):
            return sorted(
                (tuple(r) for r in con.execute(sql).fetchall()),
                key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t),
            )

        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental, q
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q) == drows(q)
        for m in [
            "INSERT INTO f (id, dk, x) VALUES (100, 2, 5.5)",
            "UPDATE s SET y = 2.0 WHERE v = 3",
            "DELETE FROM s WHERE v < 2",
            "DELETE FROM f WHERE id % 9 = 5",
        ]:
            eng.execute(m)
            con.execute(m.replace("(id, dk, x) ", ""))
            eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q) == drows(q), (q, m)

    def test_uncorrelated_exists_count_guard(self, engx, duck):
        self._drive(
            engx, duck,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE EXISTS (SELECT 1 FROM s WHERE s.y > 15) GROUP BY f.dk",
        )

    def test_not_exists_uncorrelated(self, engx, duck):
        self._drive(
            engx, duck,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.y > 100) GROUP BY f.dk",
        )

    def test_comparison_correlated_exists(self, engx, duck):
        # witness column y carries real NULLs; outer x carries real NULLs
        self._drive(
            engx, duck,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE EXISTS (SELECT 1 FROM s WHERE s.y > f.x AND s.v < 5) GROUP BY f.dk",
        )

    def test_comparison_flipped_orientation(self, engx, duck):
        self._drive(
            engx, duck,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE EXISTS (SELECT 1 FROM s WHERE f.x <= s.y AND s.v != 2) GROUP BY f.dk",
        )

    def test_not_exists_comparison_with_guards(self, engx, duck):
        self._drive(
            engx, duck,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.y <= f.x) GROUP BY f.dk",
        )

    def test_not_exists_empty_witness_set(self, engx, duck):
        self._drive(
            engx, duck,
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.y > f.x AND s.v > 99) GROUP BY f.dk",
        )

    def test_equality_exists_stays_on_membership(self, engx):
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE EXISTS (SELECT 1 FROM s WHERE s.v = f.dk AND s.y > 3) GROUP BY f.dk"
        )
        engx.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = engx.mat_views["mv"]
        assert mv.incremental and mv.in_table == "s"
        engx.execute("UPDATE s SET y = 1.0 WHERE v = 2")
        rep = engx.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        # membership flips fold — no frozen-scalar full rebuild
        assert rep["mode"] == "incremental"
        assert _rows(engx, "SELECT * FROM mv") == _rows(engx, q)


class TestPairlessOn:
    """Pairless (pure non-equi) ONs maintain on every join shape (r16):
    INNER stays bilinear (T1/T2 need no key); the outer shapes' per-row
    match-state terms (T4'/T5'/T6') prune the affected slice with an
    ON-semi-join against the delta's images — a row matching no ΔD (ΔF)
    image has identical match sets in both snapshots, so it never
    flips. An ON with neither pairs nor two-sided conjuncts stays
    unrecountable (dim commits → full)."""

    MUTS = [
        "UPDATE d SET dv = 1 WHERE dk = 3",
        "INSERT INTO f (id, dk, x) VALUES (100, 2, 7.0)",
        "DELETE FROM d WHERE dk = 1",
        "UPDATE f SET x = 0.5 WHERE id % 6 = 0",
        "INSERT INTO d (dk, dname, dv) VALUES (9, 'n9', 3)",
        "DELETE FROM f WHERE id % 7 = 3",
    ]

    @pytest.fixture()
    def engp(self, spark, tmp_path):
        eng = Engine(spark, f"r16p-{tmp_path.name}")
        fact = ParquetMergeSink(spark, str(tmp_path / "f"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 5, float(i % 9) if i % 11 else None) for i in range(40)],
                "id long, dk int, x double",
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / "d"), key="dk")
        dim.ensure(
            spark.createDataFrame(
                [(k, f"n{k}", k * 2) for k in range(6)],
                "dk int, dname string, dv int",
            )
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        return eng

    def _drive(self, eng, q, muts=None, modes=None):
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental, q
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for i, m in enumerate(muts or self.MUTS):
            eng.execute(m)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            if modes:
                assert rep["mode"] == modes[i], (q, i, m, rep["mode"])
            else:
                assert rep["mode"] in ("incremental", "noop"), (q, i, m, rep["mode"])
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), (q, i, m)

    def test_inner(self, engp):
        self._drive(
            engp,
            "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS sx "
            "FROM f JOIN d ON f.x > d.dv WHERE f.id > 1 GROUP BY f.dk",
        )

    def test_left(self, engp):
        self._drive(
            engp,
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS cd "
            "FROM f LEFT JOIN d ON f.x > d.dv GROUP BY f.dk",
        )

    def test_right(self, engp):
        self._drive(
            engp,
            "SELECT d.dname AS g, count(f.id) AS n "
            "FROM f RIGHT JOIN d ON f.x > d.dv GROUP BY d.dname",
        )

    def test_full(self, engp):
        self._drive(
            engp,
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS cd "
            "FROM f FULL OUTER JOIN d ON f.x + d.dv < 9 GROUP BY f.dk",
        )

    def test_residual_beside_cross(self, engp):
        self._drive(
            engp,
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS cd "
            "FROM f LEFT JOIN d ON f.x > d.dv AND d.dv < 8 GROUP BY f.dk",
        )

    def test_or_tree_on_all_shapes(self, engp, spark, tmp_path):
        # OR-tree ONs ride the same machinery: the whole OR is ONE
        # row-local two-sided conjunct (join_on_parts classifies it as a
        # cross pred, extracting no pairs from inside the OR), so the
        # bilinear terms run the real ON and the outer shapes recount
        # per row over the ON-semi-pruned slice
        for q in [
            "SELECT f.dk AS k, count(*) AS n FROM f JOIN d "
            "ON f.dk = d.dk OR f.x > d.dv GROUP BY f.dk",
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS cd "
            "FROM f LEFT JOIN d ON f.dk = d.dk OR f.x > d.dv GROUP BY f.dk",
            "SELECT d.dname AS g, count(f.id) AS n FROM f RIGHT JOIN d "
            "ON f.dk = d.dk OR f.x > d.dv GROUP BY d.dname",
            "SELECT f.dk AS k, count(*) AS n FROM f FULL OUTER JOIN d "
            "ON f.dk = d.dk OR f.x + d.dv < 6 GROUP BY f.dk",
        ]:
            eng = Engine(spark, f"r16or-{abs(hash(q)) % 10**8}")
            eng.register_sink("f", engp.sinks["f"])
            eng.register_sink("d", engp.sinks["d"])
            eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
            assert eng.mat_views["mv"].incremental, q
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
            for m in self.MUTS[:4]:
                eng.execute(m)
                rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
                assert rep["mode"] in ("incremental", "noop"), (q, m, rep["mode"])
                assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), (q, m)

    def test_single_side_only_on_dim_commit_full(self, engp):
        # no pairs AND no two-sided conjunct: a dim commit has no
        # recountable slice — one full recompute, correct
        self._drive(
            engp,
            "SELECT f.dk AS k, count(*) AS n "
            "FROM f LEFT JOIN d ON d.dv < 4 GROUP BY f.dk",
            muts=["UPDATE d SET dv = 9 WHERE dk = 0"],
            modes=["full"],
        )


class TestLeftSetContextDimCommit:
    def test_in_sub_left_dim_commits(self, eng3):
        _drive(
            eng3,
            "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS sx, count(d.dname) AS cd "
            "FROM f LEFT JOIN d ON f.dk = d.dk "
            "WHERE f.dk IN (SELECT s.v FROM s WHERE s.y < 12) AND f.id > 1 "
            "GROUP BY f.dk",
            [
                "DELETE FROM d WHERE dk = 2",  # null extension appears
                "INSERT INTO d (dk, dname, dv) VALUES (2, 'b2', 4)",  # retracts
                "UPDATE d SET dname = 'zz' WHERE dk = 1",
                "UPDATE s SET y = 99.0 WHERE v = 3",  # membership flips out
                "INSERT INTO f (id, dk, x) VALUES (100, 2, 5.0)",
            ],
        )

    def test_not_exists_left_dim_commits(self, eng3):
        _drive(
            eng3,
            "SELECT f.dk AS k, count(*) AS n, min(f.x) AS lo "
            "FROM f LEFT JOIN d ON f.dk = d.dk "
            "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.v = f.dk AND s.y > 15)"
            " AND f.id > 0 GROUP BY f.dk",
            [
                "DELETE FROM d WHERE dk = 0",
                "INSERT INTO d (dk, dname, dv) VALUES (0, 'r0', 9)",
                "UPDATE s SET y = 20.0 WHERE v = 2",
                "DELETE FROM f WHERE id % 7 = 2",
            ],
        )

    def test_corr_scalar_left_dim_commits(self, eng3):
        _drive(
            eng3,
            "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS sx "
            "FROM f LEFT JOIN d ON f.dk = d.dk "
            "WHERE f.x > (SELECT avg(s.y) FROM s WHERE s.v = f.dk) "
            "GROUP BY f.dk",
            [
                "DELETE FROM d WHERE dk = 1",
                "UPDATE d SET dv = 99 WHERE dk = 3",
                "UPDATE s SET y = 0.5 WHERE sid % 3 = 0",
                "INSERT INTO f (id, dk, x) VALUES (101, 1, 8.0)",
            ],
        )

    def test_residual_on_dim_side(self, eng3):
        # dim-side residual in the ON: the flip terms count over
        # residual-FILTERED dim snapshots, so a residual flip on an
        # existing dim row behaves like delete/insert of its matches
        _drive(
            eng3,
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS cd "
            "FROM f LEFT JOIN d ON f.dk = d.dk AND d.dv < 6 "
            "WHERE f.dk IN (SELECT s.v FROM s WHERE s.y < 12) "
            "GROUP BY f.dk",
            [
                "UPDATE d SET dv = 9 WHERE dk = 1",  # residual fails → null-ext
                "UPDATE d SET dv = 1 WHERE dk = 1",  # flips back
                "DELETE FROM d WHERE dk = 2",
                "UPDATE s SET y = 99.0 WHERE v = 0",
            ],
        )

    def test_cross_on_per_row_t4prime(self, eng3):
        # two-sided non-equi ON conjunct: match state is per fact ROW —
        # the T4' variant tests the affected slice against both dim
        # snapshots through the real ON
        _drive(
            eng3,
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS cd "
            "FROM f LEFT JOIN d ON f.dk = d.dk AND f.x > d.dv "
            "WHERE f.dk IN (SELECT s.v FROM s WHERE s.y < 12) "
            "GROUP BY f.dk",
            [
                "UPDATE d SET dv = 0 WHERE dk = 3",
                "UPDATE d SET dv = 50 WHERE dk = 2",  # all matches lost per row
                "DELETE FROM d WHERE dk = 0",
                "UPDATE s SET y = 99.0 WHERE v = 3",
                "INSERT INTO f (id, dk, x) VALUES (102, 2, 7.5)",
            ],
        )

    def test_all_three_feeds_one_window(self, eng3):
        q = (
            "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS sx, count(d.dname) AS cd "
            "FROM f LEFT JOIN d ON f.dk = d.dk "
            "WHERE f.dk IN (SELECT s.v FROM s WHERE s.y < 12) GROUP BY f.dk"
        )
        eng3.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng3.mat_views["mv"].incremental
        eng3.execute("INSERT INTO f (id, dk, x) VALUES (200, 3, 4.0)")
        eng3.execute("DELETE FROM d WHERE dk = 3")
        eng3.execute("UPDATE s SET y = 99.0 WHERE v = 2")
        eng3.execute("INSERT INTO d (dk, dname, dv) VALUES (9, 'n9', 1)")
        rep = eng3.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q)

    def test_eq_all_rewrites_to_extremum_pair(self, eng3):
        # x = ALL(S) ⟺ count(S)=0 OR (x = min(S) AND x = max(S)) — rides
        # the frozen-scalar machinery (inner value provably non-NULL via
        # the null-rejecting s.v = 3 conjunct)
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.dk = ALL (SELECT s.v FROM s WHERE s.v = 3) GROUP BY f.dk"
        )
        eng3.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng3.mat_views["mv"].incremental
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q)
        eng3.execute("INSERT INTO f (id, dk, x) VALUES (100, 3, 1.0)")
        rep = eng3.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q)
        # the set empties → ALL-over-empty is TRUE for every row; the
        # frozen values moved → one legitimate rebuild
        eng3.execute("DELETE FROM s WHERE v = 3")
        rep = eng3.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q)

    def test_ne_any_rewrites_unconditionally(self, eng3):
        # x != ANY(S) ⟺ count(S)>0 AND (x != min(S) OR x != max(S)) —
        # sound in WHERE context even with inner NULLs (here: g.x holds
        # real NULLs), so no non-NULL gate
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.x != ANY (SELECT g.x FROM f g WHERE g.dk = 2 AND g.id < 30) "
            "GROUP BY f.dk"
        )
        eng3.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng3.mat_views["mv"].incremental
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q)
        eng3.execute("DELETE FROM f WHERE id = 7")
        eng3.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q)

    def test_ne_any_empty_set_is_false(self, eng3):
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.dk != ANY (SELECT s.v FROM s WHERE s.v = 1) GROUP BY f.dk"
        )
        eng3.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng3.mat_views["mv"].incremental
        eng3.execute("DELETE FROM s WHERE v = 1")
        eng3.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q) == []

    def test_eq_all_nullable_inner_pinned_full(self, eng3):
        # min/max silently drop inner NULLs that block = ALL's TRUE —
        # without a provably non-NULL inner the rewrite must refuse
        q = (
            "SELECT f.dk AS k, count(*) AS n FROM f "
            "WHERE f.x = ALL (SELECT s.y FROM s WHERE s.v = 3) GROUP BY f.dk"
        )
        eng3.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng3.mat_views["mv"].incremental
        eng3.execute("UPDATE s SET y = 4.0 WHERE v = 3")
        rep = eng3.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng3, "SELECT * FROM mv") == _rows(eng3, q)

    def test_pairless_on_dim_commit_pinned_full(self, eng3):
        # an ON with NO equality pair has no affected-slice prune: the
        # dim commit takes ONE full recompute (and re-pins); base/s
        # deltas keep folding incrementally between dim commits
        _drive(
            eng3,
            "SELECT f.dk AS k, count(*) AS n "
            "FROM f LEFT JOIN d ON f.x > d.dv "
            "WHERE f.dk IN (SELECT s.v FROM s WHERE s.y < 12) "
            "GROUP BY f.dk",
            [
                "UPDATE d SET dv = 3 WHERE dk = 1",  # dim commit → full
                "INSERT INTO f (id, dk, x) VALUES (103, 1, 6.0)",  # folds
                "UPDATE s SET y = 99.0 WHERE v = 1",  # folds
            ],
            modes=["full", "incremental", "incremental"],
        )
