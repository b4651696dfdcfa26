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


def _approx_eq(got, want):
    """Row-set equality tolerating float ulp drift from fold order."""
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
            assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, q)), round_

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


class TestInSubqueryMatViews:
    """``WHERE k IN (SELECT v FROM s ...)`` matviews: the IN-list is a
    1-column dim. Base deltas fold membership-filtered (ΔF ⋉ M_new);
    an s commit computes per-value match counts from its change feed and
    flips the base rows whose key crossed 0↔1 in/out of the state
    (F_old ⋉ flip, weight ±1) — O(|changes| + affected slice), never a
    base or s rescan."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"mvr14in-{name}")
        t = ParquetMergeSink(spark, str(tmp_path / f"{name}_t"), key="id")
        t.ensure(
            spark.createDataFrame(
                [(i, i % 10, "g" + str(i % 3), float(i % 7)) for i in range(60)],
                "id long, k long, g string, x double",
            )
        )
        s = ParquetMergeSink(spark, str(tmp_path / f"{name}_s"), key="sid")
        s.ensure(
            spark.createDataFrame(
                [(i, i % 12, i % 2 == 0) for i in range(24)],
                "sid long, v long, ok boolean",
            )
        )
        eng.register_sink("t", t)
        eng.register_sink("s", s)
        return eng

    Q = (
        "SELECT g, count(*) AS n, sum(x) AS sx, count(DISTINCT k) AS dk FROM t "
        "WHERE k IN (SELECT v FROM s WHERE ok) AND x < 6.5 GROUP BY g"
    )

    def test_lifecycle_differential(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "lc")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.in_table == "s"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        for batch in (
            # base-only churn (membership-filtered fold)
            ["INSERT INTO t (id, k, g, x) VALUES (100, 2, 'g1', 3.0), (101, 11, 'g0', 1.0)",
             "DELETE FROM t WHERE id % 7 = 3"],
            # flip_in: value 3 gains its first qualifying s row
            ["INSERT INTO s (sid, v, ok) VALUES (100, 3, true)"],
            # flip_out via UPDATE of the subquery's own WHERE column
            ["UPDATE s SET ok = false WHERE v = 2"],
            # both sides move in ONE refresh
            ["INSERT INTO t (id, k, g, x) VALUES (102, 4, 'g2', 2.0)",
             "DELETE FROM s WHERE v = 4 AND ok"],
            # a t UPDATE moves a row's key across the membership line
            ["UPDATE t SET k = 11 WHERE id = 10"],
        ):
            for st in batch:
                eng.execute(st)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", batch
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q), batch
        # nothing moved → noop
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "noop"

    def test_multiplicity_no_flip(self, spark, tmp_path):
        # a value backed by TWO s rows loses one → match count 2→1, no
        # flip; loses both → 1→0, flips out
        eng = self._mk(spark, tmp_path, "mul")
        q = "SELECT count(*) AS n FROM t WHERE k IN (SELECT v FROM s)"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("DELETE FROM s WHERE sid = 0")  # v=0 still at sid=12
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("DELETE FROM s WHERE sid = 12")  # now 1→0: flips out
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_extrema_ride_multiset_and_expr_key(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "ext")
        q = (
            "SELECT g, min(x) AS lo, max(x) AS hi FROM t "
            "WHERE k % 5 IN (SELECT v % 5 FROM s WHERE ok) GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        assert {a.kind for a in mv.aggs} == {"min_set", "max_set"}
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for st in (
            "DELETE FROM t WHERE x >= 6.0",  # delete reigning maxima
            "UPDATE s SET ok = false WHERE v % 5 = 0",
            "INSERT INTO t (id, k, g, x) VALUES (200, 6, 'g0', -4.0)",
        ):
            eng.execute(st)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", st
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), st

    def test_distinct_subquery_and_self_membership(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "dsm")
        qd = "SELECT g, count(*) AS n FROM t WHERE k IN (SELECT DISTINCT v FROM s) GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mvd AS {qd}")
        assert eng.mat_views["mvd"].incremental
        # self-membership: the subquery reads the BASE itself
        qs = "SELECT g, count(*) AS n FROM t WHERE k IN (SELECT id % 13 FROM t WHERE x > 5.0) GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mvs AS {qs}")
        assert eng.mat_views["mvs"].incremental
        for st in (
            "DELETE FROM s WHERE v = 1",
            "INSERT INTO t (id, k, g, x) VALUES (300, 12, 'g1', 6.0)",
            "DELETE FROM t WHERE id % 9 = 2",
        ):
            eng.execute(st)
            for vn, q in (("mvd", qd), ("mvs", qs)):
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                # mvs doesn't depend on s: s-only churn is a noop for it
                assert rep["mode"] in ("incremental", "noop"), (vn, st)
                assert rep["mode"] != "full", (vn, st)
                assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), (vn, st)

    def test_filter_only_multiset_view(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "fo")
        q = "SELECT g, k FROM t WHERE k IN (SELECT v FROM s WHERE ok)"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.expand
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("UPDATE s SET ok = NOT ok WHERE v IN (0, 3)")
        eng.execute("INSERT INTO t (id, k, g, x) VALUES (400, 8, 'g0', 1.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_ineligible_shapes_stay_full(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "inel")
        full_shapes = {
            # NOT IN: ANSI NULL semantics aren't per-key flips
            "f1": "SELECT g, count(*) AS n FROM t WHERE k NOT IN (SELECT v FROM s) GROUP BY g",
            # two IN-subqueries
            "f2": ("SELECT g, count(*) AS n FROM t WHERE k IN (SELECT v FROM s) "
                   "AND id IN (SELECT sid FROM s) GROUP BY g"),
            # aggregated subquery
            "f3": "SELECT g, count(*) AS n FROM t WHERE k IN (SELECT max(v) FROM s) GROUP BY g",
            # correlated subquery (references the outer table)
            "f4": ("SELECT g, count(*) AS n FROM t WHERE k IN "
                   "(SELECT v FROM s WHERE sid = t.id) GROUP BY g"),
            # OR context: the conjunct decomposition can't isolate it
            "f5": ("SELECT g, count(*) AS n FROM t WHERE k IN (SELECT v FROM s) "
                   "OR x > 100 GROUP BY g"),
        }
        for vn, q in full_shapes.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert not eng.mat_views[vn].incremental, vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn

    def test_vacuum_gap_falls_back_and_repins(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "vac")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        ssink = eng.sinks["s"]
        eng.execute("INSERT INTO s (sid, v, ok) VALUES (200, 3, true)")
        eng.execute("DELETE FROM s WHERE v = 0 AND ok")
        ssink.vacuum(keep=1)
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        # re-pinned: next churn folds incrementally again
        eng.execute("INSERT INTO s (sid, v, ok) VALUES (201, 5, true)")
        eng.execute("DELETE FROM t WHERE id = 30")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)

    def test_randomized_differential(self, spark, tmp_path):
        rng = random.Random(2024)
        eng = self._mk(spark, tmp_path, "rnd")
        q = (
            "SELECT g, count(*) AS n, sum(x) AS sx, median(k) AS mk FROM t "
            "WHERE k IN (SELECT v FROM s WHERE ok) GROUP BY g HAVING count(*) > 1"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        nid, nsid = [1000], [1000]
        for round_ in range(8):
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                if op < 0.25:
                    nid[0] += 1
                    eng.execute(
                        f"INSERT INTO t (id, k, g, x) VALUES ({nid[0]}, {rng.randint(0, 14)}, 'g{rng.randint(0, 3)}', {rng.uniform(0, 9):.2f})"
                    )
                elif op < 0.45:
                    eng.execute(f"DELETE FROM t WHERE id % 13 = {rng.randint(0, 12)}")
                elif op < 0.6:
                    eng.execute(
                        f"UPDATE t SET k = {rng.randint(0, 14)} WHERE id % 11 = {rng.randint(0, 10)}"
                    )
                elif op < 0.75:
                    nsid[0] += 1
                    eng.execute(
                        f"INSERT INTO s (sid, v, ok) VALUES ({nsid[0]}, {rng.randint(0, 14)}, {str(rng.random() < 0.7).lower()})"
                    )
                elif op < 0.9:
                    eng.execute(f"UPDATE s SET ok = NOT ok WHERE v = {rng.randint(0, 14)}")
                else:
                    eng.execute(f"DELETE FROM s WHERE sid % 7 = {rng.randint(0, 6)}")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (round_, rep)
            assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, q)), round_


class TestPairOrderedCollectMatViews:
    """array_agg/string_agg(x ORDER BY k), k ≠ x: the PAIR substate
    grains by (keys, order-key, value) with a signed count — pairing is
    retained, state is O(distinct (k, x) pairs per group). Exposure
    sorts struct(o, v) with the engine's own comparator (ties fall
    through to the value)."""

    BASE = [(i, "g" + str(i % 3), float(i % 5) if i % 7 else None) for i in range(30)]

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"mvr14po-{name}")
        t = ParquetMergeSink(spark, str(tmp_path / f"{name}_t"), key="id")
        t.ensure(spark.createDataFrame(self.BASE, "id long, g string, x double"))
        eng.register_sink("t", t)
        return eng

    def test_lifecycle_differential(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "lc")
        qs = {
            "mva": "SELECT g, array_agg(x ORDER BY id) AS aa, count(*) AS n FROM t GROUP BY g",
            "mvb": "SELECT g, string_agg(tostring(x), '|' ORDER BY id DESC) AS sa FROM t GROUP BY g",
            # value and order key swapped: ids ordered by their x
            "mvc": "SELECT g, array_agg(id ORDER BY x) AS ai FROM t GROUP BY g",
        }
        for vn, q in qs.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            mv = eng.mat_views[vn]
            assert mv.incremental, q
            assert any(a.kind.endswith("_pair") or "_pair_" in a.kind for a in mv.aggs), q
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), q
        for st in (
            # NULL values collect too (struct(o, v) with NULL v is kept)
            "INSERT INTO t (id, g, x) VALUES (100, 'g1', 2.0), (101, 'g0', NULL)",
            "UPDATE t SET x = 4.0 WHERE id % 4 = 1",
            "DELETE FROM t WHERE id % 8 = 2",
        ):
            eng.execute(st)
            for vn, q in qs.items():
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                assert rep["mode"] == "incremental", (vn, st)
                assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), (vn, st)
                assert eng.sql(f"SELECT * FROM {vn}").schema == eng.sql(q).schema, vn

    def test_order_key_is_group_key_and_duplicate_pairs(self, spark, tmp_path):
        # okey == a group key (constant per group — ordering degenerate
        # but well-defined: ties sort by value) and duplicated (o, v)
        # pairs folding their counts
        eng = self._mk(spark, tmp_path, "gk")
        q = "SELECT g, array_agg(x ORDER BY g) AS aa FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO t (id, g, x) VALUES (200, 'g0', 1.0), (201, 'g0', 1.0)")
        eng.execute("DELETE FROM t WHERE id = 200")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_multi_key_maintains(self, spark, tmp_path):
        # N order keys grain the substate by (keys, o0, o1, …, value);
        # ties fall through key by key to the value
        eng = self._mk(spark, tmp_path, "mk")
        q = "SELECT g, array_agg(x ORDER BY id % 4, id) AS aa FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for st in (
            "INSERT INTO t (id, g, x) VALUES (300, 'g1', 2.5), (301, 'g0', NULL)",
            "DELETE FROM t WHERE id % 6 = 1",
            "UPDATE t SET x = 1.25 WHERE id % 5 = 0",
        ):
            eng.execute(st)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", st
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), st

    def test_mixed_direction_not_executable(self, spark, tmp_path):
        # mixed ASC/DESC keys: outside both the engine's sort_array
        # contract and the pair substate — CREATE raises cleanly
        eng = self._mk(spark, tmp_path, "mx")
        import pytest as _pt

        from qlbridge_spark.translate import TranslateError

        with _pt.raises(TranslateError):
            eng.execute(
                "CREATE MATERIALIZED VIEW mv AS "
                "SELECT g, array_agg(x ORDER BY id ASC, x DESC) AS aa FROM t GROUP BY g"
            )


class TestTwoSidedNonEquiOnMatViews:
    """Two-sided non-equi ON conjuncts (f.x > d.w): INNER maintains
    through the bilinear terms (the state selects re-run the REAL ON);
    the outer shapes maintain via per-ROW match-state terms — semi/anti
    joins of the affected slice against BOTH snapshots through the full
    ON (T4' fact-side for LEFT/FULL, T5'/T6' dim-side for RIGHT/FULL;
    residual-failing rows are unmatched in both snapshots, so they never
    flip, with no special-casing)."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"mvr14ne-{name}")
        f = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        f.ensure(
            spark.createDataFrame(
                [(i, i % 4, float(i % 9)) for i in range(40)],
                "id long, dk int, x double",
            )
        )
        d = ParquetMergeSink(spark, str(tmp_path / f"{name}_d"), key="dk")
        d.ensure(
            spark.createDataFrame(
                [(k, f"n{k}", float(k * 2)) for k in range(4)],
                "dk int, dname string, w double",
            )
        )
        eng.register_sink("f", f)
        eng.register_sink("d", d)
        return eng

    def test_left_join_lifecycle(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "lf")
        q = (
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd, sum(f.x) AS s "
            "FROM f LEFT JOIN d ON f.dk = d.dk AND f.x > d.w GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        for st in (
            "INSERT INTO f (id, dk, x) VALUES (100, 1, 8.0)",
            "UPDATE d SET w = 5.0 WHERE dk = 1",  # per-row flips within one key
            "INSERT INTO d (dk, dname, w) VALUES (9, 'n9', 0.0)",
            "DELETE FROM d WHERE dk = 2",
            "UPDATE d SET w = 100.0 WHERE dk = 0",  # every dk=0 row flips out
            "UPDATE d SET w = -1.0 WHERE dk = 0",  # ... and back in
        ):
            eng.execute(st)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", st
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), st

    def test_inner_join_still_maintains(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "in")
        q = (
            "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS s "
            "FROM f JOIN d ON f.dk = d.dk AND f.x > d.w GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("UPDATE d SET w = 3.0 WHERE dk = 1")
        eng.execute("DELETE FROM f WHERE id % 6 = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_right_full_lifecycle(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "rf")
        qs = {
            "mvr": "SELECT d.dname AS g, count(*) AS n, count(f.x) AS nf FROM f RIGHT JOIN d ON f.dk = d.dk AND f.x > d.w GROUP BY d.dname",
            "mvf": "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS s FROM f FULL OUTER JOIN d ON f.dk = d.dk AND f.x > d.w GROUP BY f.dk",
        }
        for vn, q in qs.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert eng.mat_views[vn].incremental, vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        for st in (
            "INSERT INTO f (id, dk, x) VALUES (100, 1, 8.0)",  # dim rows gain a first match
            "DELETE FROM f WHERE dk = 1 AND x > 2.0",  # ... and lose them all
            "UPDATE d SET w = 5.0 WHERE dk = 1",  # a dim UPDATE flips its own match set
            "INSERT INTO d (dk, dname, w) VALUES (9, 'n9', 0.0)",  # unmatched new dim row
            "DELETE FROM d WHERE dk = 2",
            "UPDATE d SET w = 100.0 WHERE dk = 0",  # every dk=0 match vanishes
            "UPDATE f SET x = 3.0 WHERE id % 10 = 3",
        ):
            eng.execute(st)
            for vn, q in qs.items():
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                assert rep["mode"] == "incremental", (vn, st)
                assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), (vn, st)

    def test_pure_nonequi_on_dim_delta_folds(self, spark, tmp_path):
        # NO equality pair at all: fact deltas fold (T1 runs the real
        # LEFT join), and since r16 dim deltas fold too — the outer-join
        # flip terms prune the affected slice with an ON-semi-join
        # against the delta's images instead of a key lookup
        # (COVERAGE.md §5 item 10)
        eng = self._mk(spark, tmp_path, "pne")
        q = "SELECT f.dk AS k, count(*) AS n FROM f LEFT JOIN d ON f.x > d.w GROUP BY f.dk"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO f (id, dk, x) VALUES (300, 2, 4.5)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("UPDATE d SET w = 3.0 WHERE dk = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    @pytest.mark.parametrize(
        "jt",
        ["LEFT", "RIGHT", "FULL OUTER"],
    )
    def test_randomized_outer_differential(self, spark, tmp_path, jt):
        rng = random.Random(777)
        eng = self._mk(spark, tmp_path, f"rz{jt.split()[0].lower()}")
        q = (
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd, "
            "sum(f.x) AS s, count(DISTINCT f.x) AS dx "
            f"FROM f {jt} JOIN d ON f.dk = d.dk AND f.x > d.w AND d.w >= 0 "
            "GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        nid, ndk = [1000], [10]
        for round_ in range(8):
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                if op < 0.25:
                    nid[0] += 1
                    eng.execute(
                        f"INSERT INTO f (id, dk, x) VALUES ({nid[0]}, {rng.randint(0, 5)}, {rng.uniform(0, 9):.2f})"
                    )
                elif op < 0.4:
                    eng.execute(f"DELETE FROM f WHERE id % 9 = {rng.randint(0, 8)}")
                elif op < 0.55:
                    eng.execute(
                        f"UPDATE f SET x = {rng.uniform(0, 9):.2f} WHERE id % 7 = {rng.randint(0, 6)}"
                    )
                elif op < 0.75:
                    eng.execute(
                        f"UPDATE d SET w = {rng.uniform(-2, 9):.2f} WHERE dk = {rng.randint(0, 5)}"
                    )
                elif op < 0.9:
                    ndk[0] += 1
                    eng.execute(
                        f"INSERT INTO d (dk, dname, w) VALUES ({ndk[0] % 7}, 'x{ndk[0]}', {rng.uniform(-2, 9):.2f})"
                    )
                else:
                    eng.execute(f"DELETE FROM d WHERE dk = {rng.randint(0, 6)}")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (round_, rep)
            assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, q)), round_


class TestExistsSubqueryMatViews:
    """Correlated [NOT] EXISTS matviews: the subquery rewrites to the
    same 1-column-dim shape as IN (SELECT ...) — membership on the
    correlation key. NOT EXISTS is the anti-membership twin (anti-join
    filter, inverted flip signs) and — unlike NOT IN — has NO NULL trap:
    a NULL outer key never matches, so it always qualifies."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"mvr14ex-{name}")
        t = ParquetMergeSink(spark, str(tmp_path / f"{name}_t"), key="id")
        t.ensure(
            spark.createDataFrame(
                [(i, i % 10 if i % 13 else None, "g" + str(i % 3), float(i % 7)) for i in range(60)],
                "id long, k long, g string, x double",
            )
        )
        s = ParquetMergeSink(spark, str(tmp_path / f"{name}_s"), key="sid")
        s.ensure(
            spark.createDataFrame(
                [(i, i % 12, i % 2 == 0) for i in range(24)],
                "sid long, v long, ok boolean",
            )
        )
        eng.register_sink("t", t)
        eng.register_sink("s", s)
        return eng

    def test_lifecycle_both_directions(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "lc")
        qs = {
            "mve": ("SELECT g, count(*) AS n, sum(x) AS sx FROM t "
                    "WHERE EXISTS (SELECT 1 FROM s WHERE s.v = t.k AND s.ok) AND x < 6.5 GROUP BY g"),
            "mvn": ("SELECT g, count(*) AS n FROM t "
                    "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.v = t.k AND s.ok) GROUP BY g"),
        }
        for vn, q in qs.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            mv = eng.mat_views[vn]
            assert mv.incremental and mv.in_table == "s", vn
            assert mv.in_negated == (vn == "mvn")
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        for st in (
            # NULL-key inserts qualify for NOT EXISTS, never for EXISTS
            "INSERT INTO t (id, k, g, x) VALUES (100, 2, 'g1', 3.0), (101, NULL, 'g0', 1.0)",
            "INSERT INTO s (sid, v, ok) VALUES (100, 3, true)",  # flip in/out
            "UPDATE s SET ok = false WHERE v = 2",
            "DELETE FROM t WHERE id % 7 = 3",
            "UPDATE t SET k = 11 WHERE id = 10",  # row crosses membership
            "DELETE FROM s WHERE v = 4 AND ok",
        ):
            eng.execute(st)
            for vn, q in qs.items():
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                assert rep["mode"] == "incremental", (vn, st)
                assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), (vn, st)

    def test_expression_correlation_key(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path, "expr")
        q = ("SELECT g, count(*) AS n FROM t "
             "WHERE EXISTS (SELECT 1 FROM s WHERE s.v % 5 = t.k % 5 AND s.sid < 20) GROUP BY g")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("DELETE FROM s WHERE sid >= 10")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_ineligible_exists_shapes_stay_full(self, spark, tmp_path):
        # (uncorrelated and non-equi-correlated EXISTS rewrite to frozen
        # scalars since r16 — pinned ELIGIBLE in
        # test_rewritten_exists_shapes_maintain below and
        # test_advice_r16.py::TestExistsRewrite)
        eng = self._mk(spark, tmp_path, "inel")
        full_shapes = {
            # two correlation equalities
            "f2": ("SELECT g, count(*) AS n FROM t WHERE EXISTS "
                   "(SELECT 1 FROM s WHERE s.v = t.k AND s.sid = t.id) GROUP BY g"),
            # EXISTS + IN together: two set contexts on the SAME table
            "f4": ("SELECT g, count(*) AS n FROM t WHERE EXISTS "
                   "(SELECT 1 FROM s WHERE s.v = t.k) AND k IN (SELECT sid FROM s) GROUP BY g"),
        }
        for vn, q in full_shapes.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert not eng.mat_views[vn].incremental, vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn

    def test_rewritten_exists_shapes_maintain(self, spark, tmp_path):
        # r16: uncorrelated EXISTS → exact count guard; non-equi-
        # correlated EXISTS → uncorrelated extremum scalar. Both ride the
        # frozen-scalar machinery: base churn folds; an s commit that
        # moves the frozen value forces one full rebuild, still correct.
        eng = self._mk(spark, tmp_path, "rwex")
        shapes = {
            "r1": "SELECT g, count(*) AS n FROM t WHERE EXISTS (SELECT 1 FROM s WHERE ok) GROUP BY g",
            "r3": ("SELECT g, count(*) AS n FROM t WHERE EXISTS "
                   "(SELECT 1 FROM s WHERE s.v > t.k) GROUP BY g"),
        }
        for vn, q in shapes.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {vn} AS {q}")
            assert eng.mat_views[vn].incremental, vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        eng.execute("INSERT INTO t (id, k, g, x) VALUES (200, 3, 'g1', 2.0), (201, NULL, 'g0', 1.0)")
        for vn, q in shapes.items():
            rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn
        eng.execute("DELETE FROM s WHERE v > 8")  # moves max(v) / may flip EXISTS
        for vn, q in shapes.items():
            rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
            assert rep["mode"] in ("incremental", "noop", "full"), vn
            assert _rows(eng, f"SELECT * FROM {vn}") == _rows(eng, q), vn

    def test_randomized_differential(self, spark, tmp_path):
        rng = random.Random(888)
        eng = self._mk(spark, tmp_path, "rnd")
        qe = ("SELECT g, count(*) AS n, sum(x) AS sx FROM t "
              "WHERE EXISTS (SELECT 1 FROM s WHERE s.v = t.k AND s.ok) GROUP BY g")
        qn = ("SELECT g, count(*) AS n FROM t "
              "WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.v = t.k AND s.ok) GROUP BY g")
        eng.execute(f"CREATE MATERIALIZED VIEW mve AS {qe}")
        eng.execute(f"CREATE MATERIALIZED VIEW mvn AS {qn}")
        nid, nsid = [1000], [1000]
        for round_ in range(8):
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                if op < 0.25:
                    nid[0] += 1
                    k = rng.choice(["NULL", str(rng.randint(0, 14))])
                    eng.execute(
                        f"INSERT INTO t (id, k, g, x) VALUES ({nid[0]}, {k}, 'g{rng.randint(0, 3)}', {rng.uniform(0, 9):.2f})"
                    )
                elif op < 0.45:
                    eng.execute(f"DELETE FROM t WHERE id % 13 = {rng.randint(0, 12)}")
                elif op < 0.6:
                    eng.execute(
                        f"UPDATE t SET k = {rng.randint(0, 14)} WHERE id % 11 = {rng.randint(0, 10)}"
                    )
                elif op < 0.75:
                    nsid[0] += 1
                    eng.execute(
                        f"INSERT INTO s (sid, v, ok) VALUES ({nsid[0]}, {rng.randint(0, 14)}, {str(rng.random() < 0.7).lower()})"
                    )
                elif op < 0.9:
                    eng.execute(f"UPDATE s SET ok = NOT ok WHERE v = {rng.randint(0, 14)}")
                else:
                    eng.execute(f"DELETE FROM s WHERE sid % 7 = {rng.randint(0, 6)}")
            for vn, q in (("mve", qe), ("mvn", qn)):
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {vn}").collect()[0]
                assert rep["mode"] in ("incremental", "noop"), (round_, vn, rep)
                assert _approx_eq(_rows(eng, f"SELECT * FROM {vn}"), _rows(eng, q)), (round_, vn)
