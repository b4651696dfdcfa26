"""Round-15 additions.

Correlated SCALAR subqueries in matview WHEREs maintain incrementally
(r14 verdict directive #5): the per-key scalar is a 1-column dim keyed
by the correlation key with the aggregate as payload; s-side commits
flip base rows whose predicate truth changed under (old scalar → new
scalar), per FACT ROW (the predicate couples row columns with the
scalar). Both directions differential-tested; ineligible shapes pinned
full in BOTH directions; vacuum-gap fallback + re-pin.
"""

import random

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.sinks import ParquetMergeSink


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t),
    )


def _approx_eq(got, want):
    if len(got) != len(want):
        return False
    for gr, wr in zip(got, want):
        for gv, wv in zip(gr, wr):
            if isinstance(gv, float) and isinstance(wv, float):
                if abs(gv - wv) > 1e-9 * max(1.0, abs(wv)):
                    return False
            elif gv != wv:
                return False
    return True


def _mk(spark, tmp_path, name):
    eng = Engine(spark, f"csc15-{name}")
    f = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
    f.ensure(
        spark.createDataFrame(
            # k = None rows: the correlation key is NULL — matches no s
            # row, so the scalar is the empty-agg default for them
            [
                (i, "g%d" % (i % 3), float(i % 7), (i % 5) if i % 13 else None)
                for i in range(40)
            ],
            "id long, g string, x double, k long",
        )
    )
    eng.register_sink("f", f)
    s = ParquetMergeSink(spark, str(tmp_path / f"{name}_s"), key="sid")
    s.ensure(
        spark.createDataFrame(
            [(i, i % 5, float(i % 11)) for i in range(30)],
            "sid long, sk long, y double",
        )
    )
    eng.register_sink("s", s)
    return eng


class TestCorrScalarMatViews:
    Q = (
        "SELECT g, sum(x) AS sx, count(*) AS n FROM f "
        "WHERE x > (SELECT avg(s.y) FROM s WHERE s.sk = f.k) GROUP BY g"
    )

    def test_lifecycle_differential_both_directions(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "life")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.csc_pred is not None and mv.in_table == "s"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        for stmt in (
            # base-only deltas (scalar dim untouched)
            "INSERT INTO f (id, g, x, k) VALUES (100, 'g1', 6.5, 2), (101, 'g0', 0.5, 3)",
            "DELETE FROM f WHERE id % 5 = 1",
            # s-only deltas (scalars move → per-row flips)
            "UPDATE s SET y = y + 3 WHERE sk = 2",
            "INSERT INTO s (sid, sk, y) VALUES (200, 0, 50.0)",
            # both in one refresh window
            "UPDATE f SET x = x + 1 WHERE id % 4 = 0",
            # a key loses ALL s rows → scalar becomes the empty default
            "DELETE FROM s WHERE sk = 3",
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _approx_eq(
                _rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q)
            ), stmt

    def test_count_default_and_composed_predicates(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "cnt")
        # count(*) has a NON-NULL empty default (0) — keys with no s
        # rows compare against 0, not NULL; NOT/OR composition around
        # the scalar maintains (the flip re-evaluates the conjunct)
        q = (
            "SELECT g, count(*) AS n FROM f WHERE "
            "NOT (x <= (SELECT count(*) FROM s WHERE s.sk = f.k AND s.y > 1)) "
            "OR x > 5.5 GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.csc_pred is not None
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for stmt in (
            "INSERT INTO s (sid, sk, y) VALUES (201, 1, 2.0), (202, 1, 3.0), (203, 0, 0.5)",
            "DELETE FROM s WHERE sk = 4",
            "UPDATE s SET y = 0.0 WHERE sk = 1",
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), stmt

    def test_distinct_payload_where_rest_and_filter_only(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "dst")
        # DISTINCT inside the payload agg: the scalar dim re-executes
        # through the ENGINE, so no agg-specific algebra is assumed;
        # where_rest composes; filter-only (no GROUP BY) multiset views
        # ride the same specs
        q = (
            "SELECT id, g FROM f WHERE "
            "x >= (SELECT avg(DISTINCT s.y) FROM s WHERE s.sk = f.k) AND id > 2"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.csc_pred is not None and mv.expand
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for stmt in (
            "INSERT INTO s (sid, sk, y) VALUES (210, 2, 9.0)",
            "DELETE FROM f WHERE id % 7 = 3",
            "UPDATE s SET y = 1.5 WHERE sid % 3 = 0",
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), stmt

    def test_extrema_ride_multiset_under_flips(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "ext")
        q = (
            "SELECT g, min(x) AS lo, max(x) AS hi FROM f "
            "WHERE x < (SELECT max(s.y) FROM s WHERE s.sk = f.k) GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        # predicate flips delete rows — probe-backed extrema would
        # repair against the WRONG select (no csc conjunct); they must
        # ride the multiset substate
        assert {a.kind for a in mv.aggs} == {"min_set", "max_set"}
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for stmt in (
            # evict the reigning max via a scalar move
            "UPDATE s SET y = 0.5 WHERE y > 8",
            "DELETE FROM f WHERE x = 6.0",
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), stmt

    def test_ineligible_shapes_pinned_full_both_directions(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "full")
        eng.register_rows(
            "s2", [{"sid": i, "sk": i % 5, "y": float(i % 11)} for i in range(20)]
        )
        full_shapes = {
            # non-aggregate correlated scalar: >1-row runtime errors
            # aren't statically provable — stays full
            "f1": (
                "SELECT g, count(*) AS n FROM f WHERE "
                "x > (SELECT s.y FROM s WHERE s.sk = f.k AND s.sid = 0) GROUP BY g"
            ),
            # two correlation equalities: not the 1-column-dim shape
            "f2": (
                "SELECT g, count(*) AS n FROM f WHERE x > "
                "(SELECT avg(s.y) FROM s WHERE s.sk = f.k AND s.sid = f.id) GROUP BY g"
            ),
            # subquery over a NON-VERSIONED table: no change feed to
            # derive flips from — stays full
            "f3": (
                "SELECT g, count(*) AS n FROM f WHERE x > "
                "(SELECT avg(s2.y) FROM s2 WHERE s2.sk = f.k) GROUP BY g"
            ),
            # subquery over the BASE itself: correlation ambiguity
            "f4": (
                "SELECT g, count(*) AS n FROM f WHERE x > "
                "(SELECT avg(f2.x) FROM f f2 WHERE f2.k = f.k) GROUP BY g"
            ),
            # TWO scalar-carrying conjuncts: stays full
            "f5": (
                "SELECT g, count(*) AS n FROM f WHERE "
                "x > (SELECT avg(s.y) FROM s WHERE s.sk = f.k) AND "
                "x < (SELECT max(s.y) FROM s WHERE s.sk = f.k) GROUP BY g"
            ),
        }
        for vn, q in full_shapes.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert not eng.mat_views[vn].incremental, vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        # correctness holds for the fallbacks after churn too
        eng.execute("UPDATE s SET y = y + 1 WHERE sk = 1")
        eng.execute("INSERT INTO f (id, g, x, k) VALUES (300, 'g2', 3.5, 1)")
        for vn, q in full_shapes.items():
            rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
            assert rep["mode"] == "full", vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn

    def test_vacuum_gap_falls_back_and_repins(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "vac")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        ssink = eng.sinks["s"]
        eng.execute("INSERT INTO s (sid, sk, y) VALUES (220, 3, 7.0)")
        eng.execute("DELETE FROM s WHERE sk = 0")
        ssink.vacuum(keep=1)  # drops the OLD snapshot the flip terms scan
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q))
        # re-pinned: the next churn folds incrementally again
        eng.execute("INSERT INTO s (sid, sk, y) VALUES (221, 2, 1.0)")
        eng.execute("DELETE FROM f WHERE id = 30")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q))

    def test_randomized_differential_unchanged_scalar_noop(self, spark, tmp_path):
        # an s commit that does NOT move any scalar (insert outside
        # every fact key's slice) must produce zero flip rows — the
        # null-safe changed-frame filter, exercised explicitly
        eng = _mk(spark, tmp_path, "noflip")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        eng.execute("INSERT INTO s (sid, sk, y) VALUES (230, 99, 5.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q))

    def test_randomized_differential(self, spark, tmp_path):
        rng = random.Random(1515)
        eng = _mk(spark, tmp_path, "rnd")
        q = (
            "SELECT g, count(*) AS n, sum(x) AS sx, median(x) AS mx FROM f "
            "WHERE x > (SELECT avg(s.y) FROM s WHERE s.sk = f.k AND s.y < 10) "
            "GROUP BY g HAVING count(*) >= 1"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        nid, nsid = 1000, 1000
        for round_ in range(8):
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                if op < 0.2:
                    nid += 1
                    k = rng.choice(["NULL", str(rng.randint(0, 5))])
                    eng.execute(
                        f"INSERT INTO f (id, g, x, k) VALUES "
                        f"({nid}, 'g{rng.randint(0, 2)}', {float(rng.randint(0, 8))}, {k})"
                    )
                elif op < 0.4:
                    eng.execute(
                        f"UPDATE f SET x = {float(rng.randint(0, 9))} "
                        f"WHERE id % {rng.randint(2, 7)} = 0"
                    )
                elif op < 0.55:
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 11)} = 1")
                elif op < 0.75:
                    nsid += 1
                    eng.execute(
                        f"INSERT INTO s (sid, sk, y) VALUES "
                        f"({nsid}, {rng.randint(0, 5)}, {float(rng.randint(0, 12))})"
                    )
                elif op < 0.9:
                    eng.execute(
                        f"UPDATE s SET y = {float(rng.randint(0, 12))} "
                        f"WHERE sid % {rng.randint(2, 5)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM s WHERE sid % {rng.randint(6, 11)} = 2")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, q)
            assert _approx_eq(got, want), (round_, got, want)


class TestNotInQuantifiedMatViews:
    """NOT IN / = ANY / <> ALL matview WHEREs (r14 verdict directive
    #7): `= ANY` IS membership and rides the IN machinery directly;
    NOT IN and `<> ALL` ride the anti-membership (NOT EXISTS) machinery
    ONLY when both ANSI NULL traps are statically closed — the inner
    value and the outer key each proven non-NULL by a null-rejecting
    sibling conjunct or analyzed non-nullability. Unprovable forms stay
    pinned full in both directions."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"nin15-{name}")
        f = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        f.ensure(
            spark.createDataFrame(
                [
                    (i, "g%d" % (i % 3), float(i % 7), (i % 5) if i % 13 else None)
                    for i in range(40)
                ],
                "id long, g string, x double, k long",
            )
        )
        eng.register_sink("f", f)
        s = ParquetMergeSink(spark, str(tmp_path / f"{name}_s"), key="sid")
        s.ensure(
            spark.createDataFrame(
                [(i, i % 7, float(i)) for i in range(10)], "sid long, v long, y double"
            )
        )
        eng.register_sink("s", s)
        return eng

    ELIGIBLE = {
        # outer proof: IS NOT NULL conjunct; inner proof: v < 5 comparison
        "nin": (
            "SELECT g, count(*) AS n, sum(x) AS sx FROM f WHERE k IS NOT NULL "
            "AND k NOT IN (SELECT v FROM s WHERE v < 5) GROUP BY g"
        ),
        # <> ALL is NOT IN; outer proof via comparison (k > -1)
        "nall": (
            "SELECT g, count(*) AS n FROM f WHERE k > -1 "
            "AND k <> ALL (SELECT v FROM s WHERE v < 5) GROUP BY g"
        ),
        # = ANY is plain membership — no proof needed
        "anyq": (
            "SELECT g, count(*) AS n FROM f WHERE "
            "k = ANY (SELECT v FROM s WHERE v < 5) GROUP BY g"
        ),
    }
    FULL = {
        # outer key nullable with no rejecting conjunct
        "nin_f1": (
            "SELECT g, count(*) AS n FROM f WHERE "
            "k NOT IN (SELECT v FROM s WHERE v < 5) GROUP BY g"
        ),
        # inner value nullable and unfiltered
        "nin_f2": (
            "SELECT g, count(*) AS n FROM f WHERE k IS NOT NULL "
            "AND k NOT IN (SELECT v FROM s) GROUP BY g"
        ),
    }

    def test_eligibility_and_differentials(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "el")
        for vn, q in {**self.ELIGIBLE, **self.FULL}.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert eng.mat_views[vn].incremental == (vn in self.ELIGIBLE), vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        for stmt in (
            "INSERT INTO f (id, g, x, k) VALUES (100, 'g0', 1.0, 6), (101, 'g1', 2.0, NULL)",
            # membership flips: 3 enters the <5 set again; 9 is outside it
            "INSERT INTO s (sid, v, y) VALUES (20, 3, 1.0), (21, 9, 2.0)",
            "DELETE FROM s WHERE v = 4",
            "UPDATE s SET v = 2 WHERE sid = 6",
            "DELETE FROM f WHERE id % 9 = 2",
        ):
            eng.execute(stmt)
            for vn, q in {**self.ELIGIBLE, **self.FULL}.items():
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                want = ("incremental", "noop") if vn in self.ELIGIBLE else ("full",)
                assert rep["mode"] in want, (vn, stmt, rep["mode"])
                assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), (vn, stmt)

    def test_not_in_empty_set_with_null_keys(self, spark, tmp_path):
        # the precise trap the proofs close: when the inner set is EMPTY
        # NOT IN keeps even NULL keys, but the eligible rewrite filters
        # them via where_rest — identical results BECAUSE the proof
        # conjunct (IS NOT NULL) is part of the view
        eng = self._mk(spark, tmp_path, "emp")
        q = (
            "SELECT g, count(*) AS n FROM f WHERE k IS NOT NULL "
            "AND k NOT IN (SELECT v FROM s WHERE v < 0) GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO s (sid, v, y) VALUES (30, -3, 0.0)")  # set non-empty
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)


class TestCaseAggSubqueryComposition:
    """Aggregates and scalar subqueries hiding inside CASE arms compose
    in HAVING / QUALIFY / ORDER BY (r15: both expression walkers —
    _rewrite_having's agg extraction and _walk_subqueries' lowering —
    now recurse into CaseNode)."""

    @pytest.fixture()
    def eng(self, spark):
        e = Engine(spark, "case15")
        e.register_rows(
            "t",
            [
                {"g": "a", "x": 1.0},
                {"g": "a", "x": 2.0},
                {"g": "b", "x": 9.0},
                {"g": "c", "x": 4.0},
            ],
        )
        e.register_rows("u", [{"v": 2.0}, {"v": 5.0}])
        return e

    def test_case_agg_in_having_order_qualify(self, eng):
        r = eng.sql(
            "SELECT g FROM t GROUP BY g "
            "HAVING CASE WHEN sum(x) > 3 THEN 1 ELSE 0 END = 1 ORDER BY g"
        ).collect()
        assert [x.g for x in r] == ["b", "c"]
        r = eng.sql(
            "SELECT g FROM t GROUP BY g "
            "ORDER BY CASE WHEN sum(x) > 3 THEN sum(x) ELSE 0 END DESC, g"
        ).collect()
        assert [x.g for x in r] == ["b", "c", "a"]
        r = eng.sql(
            "SELECT g FROM t GROUP BY g QUALIFY "
            "rank() OVER (ORDER BY CASE WHEN sum(x) > 3 THEN 1 ELSE 0 END DESC, g) <= 2 "
            "ORDER BY g"
        ).collect()
        assert [x.g for x in r] == ["b", "c"]

    def test_case_subquery_folds_everywhere(self, eng):
        # WHERE / select list / HAVING / ORDER BY, incl. MIXED with aggs
        r = eng.sql(
            "SELECT g, CASE WHEN x > (SELECT avg(v) FROM u) THEN 'hi' ELSE 'lo' END AS c "
            "FROM t ORDER BY g, x"
        ).collect()
        assert [(x.g, x.c) for x in r] == [
            ("a", "lo"), ("a", "lo"), ("b", "hi"), ("c", "hi")
        ]
        r = eng.sql(
            "SELECT g FROM t WHERE CASE WHEN x > (SELECT avg(v) FROM u) "
            "THEN 1 ELSE 0 END = 1 ORDER BY g"
        ).collect()
        assert [x.g for x in r] == ["b", "c"]
        r = eng.sql(
            "SELECT g FROM t GROUP BY g HAVING CASE WHEN sum(x) > "
            "(SELECT min(v) FROM u) THEN 1 ELSE 0 END = 1 ORDER BY g"
        ).collect()
        # sum(a)=3 > min(v)=2 — all three groups qualify (DuckDB-matched)
        assert [x.g for x in r] == ["a", "b", "c"]
        r = eng.sql(
            "SELECT g FROM t GROUP BY g ORDER BY CASE WHEN sum(x) > "
            "(SELECT max(v) FROM u) THEN 1 ELSE 0 END DESC, g"
        ).collect()
        assert [x.g for x in r] == ["b", "a", "c"]


class TestJoinSetContextMatViews:
    """Set contexts (IN / EXISTS / correlated scalar) on INNER-JOIN views
    with a FACT-side key (r15): trilinear identity — the fact-delta term
    folds against D_new, the flip term against D_old, and a moved dim
    adds T2' = (F_old ⋉ M_new) ⋈ ΔD. Dim-side keys, outer joins, and a
    subquery over the dim itself stay pinned full."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"js15-{name}")
        f = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        f.ensure(
            spark.createDataFrame(
                [(i, i % 6, float(i % 7), i % 4) for i in range(48)],
                "id long, dk long, x double, k long",
            )
        )
        eng.register_sink("f", f)
        d = ParquetMergeSink(spark, str(tmp_path / f"{name}_d"), key="dk")
        d.ensure(
            spark.createDataFrame(
                [(k, "n%d" % k, k * 10) for k in range(6)],
                "dk long, dname string, dv long",
            )
        )
        eng.register_sink("d", d)
        s = ParquetMergeSink(spark, str(tmp_path / f"{name}_s"), key="sid")
        s.ensure(
            spark.createDataFrame(
                [(i, i % 5, float(i)) for i in range(10)],
                "sid long, v long, y double",
            )
        )
        eng.register_sink("s", s)
        return eng

    ELIGIBLE = {
        "jin": (
            "SELECT dname, count(*) AS n, sum(x) AS sx FROM f JOIN d ON f.dk = d.dk "
            "WHERE f.k IN (SELECT v FROM s WHERE v < 4) GROUP BY dname"
        ),
        "jex": (
            "SELECT dname, count(*) AS n FROM f JOIN d ON f.dk = d.dk "
            "WHERE EXISTS (SELECT 1 FROM s WHERE s.v = f.k AND s.y < 8) GROUP BY dname"
        ),
        "jcs": (
            "SELECT dname, count(*) AS n FROM f JOIN d ON f.dk = d.dk "
            "WHERE f.x > (SELECT avg(s.y) FROM s WHERE s.v = f.k) GROUP BY dname"
        ),
        "jdst": (
            "SELECT dname, count(DISTINCT f.x) AS dx FROM f JOIN d ON f.dk = d.dk "
            "WHERE f.k IN (SELECT v FROM s WHERE v < 4) GROUP BY dname"
        ),
    }
    FULL = {
        # DIM-side key: the membership filter can't apply to fact frames
        "jdim": (
            "SELECT dname, count(*) AS n FROM f JOIN d ON f.dk = d.dk "
            "WHERE d.dv IN (SELECT v FROM s) GROUP BY dname"
        ),
        # LEFT joins are ELIGIBLE as of later in r15 (fact-side-only
        # null extension) — covered by TestLeftJoinSetContextMatViews;
        # RIGHT joins stay full (dim-preserved side needs fact match
        # counts every refresh, which membership perturbs)
        "jright": (
            "SELECT dname, count(*) AS n FROM f RIGHT JOIN d ON f.dk = d.dk "
            "WHERE f.k IN (SELECT v FROM s) GROUP BY dname"
        ),
        # subquery over the DIM itself: shared feed → cross-terms
        "jself": (
            "SELECT dname, count(*) AS n FROM f JOIN d ON f.dk = d.dk "
            "WHERE f.k IN (SELECT dk - 2 FROM d) GROUP BY dname"
        ),
    }

    def test_eligibility_and_three_source_differentials(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "tri")
        for vn, q in {**self.ELIGIBLE, **self.FULL}.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert eng.mat_views[vn].incremental == (vn in self.ELIGIBLE), vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        steps = [
            "INSERT INTO f (id, dk, x, k) VALUES (100, 2, 3.5, 1), (101, 5, 6.5, 0)",
            "INSERT INTO s (sid, v, y) VALUES (20, 3, 9.0), (21, 1, 0.5)",
            "DELETE FROM s WHERE v = 2",
            "INSERT INTO d (dk, dname, dv) VALUES (6, 'n6', 60)",
            "UPDATE d SET dname = 'renamed' WHERE dk = 1",
            "DELETE FROM d WHERE dk = 0",
            "UPDATE f SET x = x + 2 WHERE id % 5 = 0",
        ]
        for i, stmt in enumerate(steps):
            eng.execute(stmt)
            if i == len(steps) - 1:
                # all THREE tables move in one refresh window
                eng.execute("UPDATE s SET y = y + 4 WHERE v = 3")
                eng.execute("INSERT INTO d (dk, dname, dv) VALUES (7, 'n7', 70)")
            for vn, q in {**self.ELIGIBLE, **self.FULL}.items():
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                want = (
                    ("incremental", "noop")
                    if vn in self.ELIGIBLE
                    else ("full",)
                )
                assert rep["mode"] in want, (vn, stmt, rep["mode"])
                assert _approx_eq(
                    _rows(eng, f"SELECT * FROM {vn}"), _rows(eng, q)
                ), (vn, stmt)

    def test_randomized_three_source(self, spark, tmp_path):
        rng = random.Random(7215)
        eng = self._mk(spark, tmp_path, "rnd")
        q = (
            "SELECT dname, count(*) AS n, sum(x) AS sx, median(x) AS mx "
            "FROM f JOIN d ON f.dk = d.dk "
            "WHERE f.k IN (SELECT v FROM s WHERE y < 9) GROUP BY dname"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        nid, nsid, ndk = 1000, 1000, 10
        for round_ in range(8):
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                if op < 0.2:
                    nid += 1
                    eng.execute(
                        f"INSERT INTO f (id, dk, x, k) VALUES ({nid}, "
                        f"{rng.randint(0, ndk)}, {float(rng.randint(0, 8))}, {rng.randint(0, 5)})"
                    )
                elif op < 0.35:
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 11)} = 1")
                elif op < 0.5:
                    nsid += 1
                    eng.execute(
                        f"INSERT INTO s (sid, v, y) VALUES ({nsid}, "
                        f"{rng.randint(0, 5)}, {float(rng.randint(0, 12))})"
                    )
                elif op < 0.62:
                    eng.execute(f"DELETE FROM s WHERE sid % {rng.randint(4, 9)} = 2")
                elif op < 0.74:
                    eng.execute(
                        f"UPDATE s SET y = {float(rng.randint(0, 12))} "
                        f"WHERE sid % {rng.randint(2, 5)} = 0"
                    )
                elif op < 0.86:
                    ndk += 1
                    eng.execute(
                        f"INSERT INTO d (dk, dname, dv) VALUES ({ndk}, 'n{ndk}', {ndk * 10})"
                    )
                else:
                    eng.execute(f"DELETE FROM d WHERE dk = {rng.randint(0, ndk)}")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, q)
            assert _approx_eq(got, want), (round_, got, want)


class TestRangeQuantifiedMatViews:
    """Range-quantified WHERE conjuncts rewrite to scalar extrema before
    matview analysis (r15): x > ANY(S) ⟺ x > min(S) etc. ANY is
    unconditionally sound (empty set / inner NULLs land on the same
    not-TRUE); ALL needs a provably non-NULL inner value and an OR'd
    empty-set guard (ALL over empty is TRUE, the extremum NULL is not).
    Uncorrelated forms ride the frozen-scalar machinery; CORRELATED
    > ANY becomes a correlated scalar and maintains with csc flips."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"qr15-{name}")
        f = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        f.ensure(
            spark.createDataFrame(
                [(i, "g%d" % (i % 3), float(i % 7), i % 5) for i in range(40)],
                "id long, g string, x double, k long",
            )
        )
        eng.register_sink("f", f)
        s = ParquetMergeSink(spark, str(tmp_path / f"{name}_s"), key="sid")
        s.ensure(
            spark.createDataFrame(
                [(i, i % 5, float(i % 9)) for i in range(12)],
                "sid long, v long, y double",
            )
        )
        eng.register_sink("s", s)
        return eng

    def test_eligibility_and_differentials(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "el")
        cases = {
            # (query, eligible, csc-backed)
            "uany": (
                "SELECT g, count(*) AS n FROM f WHERE "
                "x > ANY (SELECT y FROM s WHERE v < 3) GROUP BY g",
                True, False,
            ),
            "uall": (
                "SELECT g, count(*) AS n FROM f WHERE "
                "x < ALL (SELECT y FROM s WHERE y > 3) GROUP BY g",
                True, False,
            ),
            "cany": (
                "SELECT g, count(*) AS n FROM f WHERE "
                "x > ANY (SELECT s.y FROM s WHERE s.v = f.k) GROUP BY g",
                True, True,
            ),
            # unprovable ALL inner (nullable, unfiltered) → pinned full
            "uall_f": (
                "SELECT g, count(*) AS n FROM f WHERE "
                "x > ALL (SELECT y FROM s) GROUP BY g",
                False, False,
            ),
        }
        for vn, (q, inc, is_csc) in cases.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            mv = eng.mat_views[vn]
            assert mv.incremental == inc, vn
            assert (mv.csc_pred is not None) == is_csc, vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        for stmt in (
            "INSERT INTO f (id, g, x, k) VALUES (100, 'g0', 5.5, 2)",
            "UPDATE s SET y = y + 2 WHERE v = 2",
            "DELETE FROM s WHERE y > 3 AND v = 1",
            # empties uall's inner set entirely: ALL-over-empty must
            # expose TRUE for every row (the OR'd count()=0 guard)
            "DELETE FROM s WHERE y > 3",
        ):
            eng.execute(stmt)
            for vn, (q, inc, is_csc) in cases.items():
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                if is_csc:
                    assert rep["mode"] in ("incremental", "noop"), (vn, stmt)
                elif inc:
                    # frozen scalar: a moved value legitimately rebuilds
                    assert rep["mode"] in ("incremental", "noop", "full"), (vn, stmt)
                else:
                    assert rep["mode"] == "full", (vn, stmt)
                assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), (vn, stmt)

    def test_all_with_inner_nulls_stays_ansi(self, spark, tmp_path):
        # a NULL in the inner set makes op ALL never-TRUE; the rewrite
        # must therefore REFUSE unprovable inners — differential over an
        # actual NULL-bearing set, executed as a full-recompute MV
        eng = self._mk(spark, tmp_path, "nul")
        eng.execute("INSERT INTO s (sid, v, y) VALUES (100, 0, NULL)")
        q = (
            "SELECT g, count(*) AS n FROM f WHERE "
            "x > ALL (SELECT y FROM s WHERE v = 0) GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng.mat_views["mv"].incremental  # unprovable → full
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert _rows(eng, "SELECT * FROM mv") == []  # NULL poisons ALL


class TestLeftJoinSetContextMatViews:
    """Set contexts on LEFT-join views with fact-side keys (r15): LEFT
    only null-extends the FACT side and membership is a fact-side
    filter, so base and s deltas fold with the same T_a/flip terms (each
    row carries its own LEFT image). Since r16 a DIM commit folds too —
    the T4 null-extension flips compose with membership over the
    trilinear midpoint G_mid = F_old ⋉ M_new (tests/test_advice_r16.py)
    — so the dim-churn step below asserts "incremental" now (it pinned
    "full" when written). RIGHT/FULL stay pinned full always (the
    dim-preserved side needs fact match counts on every refresh, which
    membership perturbs)."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"ls15-{name}")
        f = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        f.ensure(
            spark.createDataFrame(
                # dk reaches 7 while the dim holds 0..5 → real null
                # extensions flow through every term
                [(i, i % 8, float(i % 7), i % 4) for i in range(48)],
                "id long, dk long, x double, k long",
            )
        )
        eng.register_sink("f", f)
        d = ParquetMergeSink(spark, str(tmp_path / f"{name}_d"), key="dk")
        d.ensure(
            spark.createDataFrame(
                [(k, "n%d" % k) for k in range(6)], "dk long, dname string"
            )
        )
        eng.register_sink("d", d)
        s = ParquetMergeSink(spark, str(tmp_path / f"{name}_s"), key="sid")
        s.ensure(
            spark.createDataFrame(
                [(i, i % 5, float(i)) for i in range(10)],
                "sid long, v long, y double",
            )
        )
        eng.register_sink("s", s)
        return eng

    CASES = {
        "lin": (
            "SELECT dname, count(*) AS n, sum(x) AS sx FROM f LEFT JOIN d ON f.dk = d.dk "
            "WHERE f.k IN (SELECT v FROM s WHERE v < 4) GROUP BY dname",
            True,
        ),
        "lcs": (
            "SELECT dname, count(*) AS n FROM f LEFT JOIN d ON f.dk = d.dk "
            "WHERE f.x > (SELECT avg(s.y) FROM s WHERE s.v = f.k) GROUP BY dname",
            True,
        ),
        "rin": (
            "SELECT dname, count(*) AS n FROM f RIGHT JOIN d ON f.dk = d.dk "
            "WHERE f.k IN (SELECT v FROM s) GROUP BY dname",
            False,
        ),
    }

    def test_lifecycle(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "lc")
        for vn, (q, want) in self.CASES.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert eng.mat_views[vn].incremental == want, vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        # base/s churn: incremental, incl. rows that null-extend
        for stmt in (
            "INSERT INTO f (id, dk, x, k) VALUES (100, 7, 3.5, 1), (101, 2, 6.5, 0)",
            "INSERT INTO s (sid, v, y) VALUES (20, 3, 9.0)",
            "DELETE FROM s WHERE v = 2",
            "DELETE FROM f WHERE id % 9 = 4",
        ):
            eng.execute(stmt)
            for vn, (q, want) in self.CASES.items():
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                wm = ("incremental", "noop") if want else ("full",)
                assert rep["mode"] in wm, (vn, stmt, rep["mode"])
                assert _approx_eq(
                    _rows(eng, f"SELECT * FROM {vn}"), _rows(eng, q)
                ), (vn, stmt)
        # dim churn: LEFT set-context views FOLD since r16 (T4 composed
        # with membership — note lin/lcs group by the DIM-side dname, so
        # the null-extension flips land in the NULL-dname group)
        eng.execute("DELETE FROM d WHERE dk = 1")
        for vn, (q, want) in self.CASES.items():
            rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
            if vn in ("lin", "lcs"):
                assert rep["mode"] == "incremental", (vn, rep["mode"])
            assert _approx_eq(_rows(eng, f"SELECT * FROM {vn}"), _rows(eng, q)), vn
        # …and base/s deltas keep folding incrementally
        eng.execute("INSERT INTO f (id, dk, x, k) VALUES (102, 1, 2.0, 3)")
        eng.execute("UPDATE s SET y = y + 1 WHERE v = 0")
        for vn in ("lin", "lcs"):
            rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
            assert rep["mode"] == "incremental", (vn, rep["mode"])
            assert _approx_eq(
                _rows(eng, f"SELECT * FROM {vn}"), _rows(eng, self.CASES[vn][0])
            ), vn
