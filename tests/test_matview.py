"""Materialized views with incremental maintenance (matview.py).

The load-bearing property: after ANY sequence of base-table mutations,
an incrementally refreshed view is row-for-row AND schema-identical to
recomputing its query from scratch. Everything else (mode reporting,
durable state, fallback paths, eligibility analysis) hangs off that.
"""

import random

import pytest
from pyspark.sql import functions as F

from qlbridge_spark.engine import Engine, ExecError


def _mk(spark, tmp_path, name, rows, schema="id long, g string, x double"):
    from qlbridge_spark.sinks import ParquetMergeSink

    eng = Engine(spark, f"mv-{name}")
    sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
    sink.ensure(spark.createDataFrame(rows, schema))
    eng.register_sink("t", sink)
    return eng, sink


BASE = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", None), (4, "b", 5.0), (5, "c", 7.0)]
MV_SQL = (
    "SELECT g, count(*) AS n, sum(x) AS s, avg(x) AS a, count(x) AS cx "
    "FROM t WHERE id > 1 GROUP BY g"
)


def _rows(eng, sql):
    # None-safe sort (FULL-join views expose NULL group keys)
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


class TestIncrementalRefresh:
    def test_insert_update_delete_parity(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "p1", BASE)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_SQL}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, MV_SQL)

        eng.execute("INSERT INTO t (id, g, x) VALUES (6, 'c', 3.0), (7, 'd', 1.0)")
        eng.execute("UPDATE t SET x = 100.0 WHERE id = 2")
        eng.execute("DELETE FROM t WHERE g = 'b'")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, MV_SQL)
        # schema identical to a recompute (dtype casts applied)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(MV_SQL).schema

    def test_filter_boundary_crossing_update(self, spark, tmp_path):
        """An UPDATE that moves rows across the WHERE boundary must net
        out (preimage −1 inside the filter, postimage filtered away)."""
        eng, _ = _mk(spark, tmp_path, "p2", BASE)
        eng.execute(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT g, sum(x) AS s, count(*) AS n FROM t WHERE x < 15 GROUP BY g"
        )
        eng.execute("UPDATE t SET x = 1000.0 WHERE id = 1")  # leaves the filter
        eng.execute("UPDATE t SET x = 2.0 WHERE id = 2")  # enters the filter
        assert eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(
            eng, "SELECT g, sum(x) AS s, count(*) AS n FROM t WHERE x < 15 GROUP BY g"
        )

    def test_group_vanishes_and_reappears(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "p3", BASE)
        eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT g, count(*) AS n FROM t GROUP BY g")
        eng.execute("DELETE FROM t WHERE g = 'c'")
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        assert {r["g"] for r in eng.sql("SELECT * FROM mv").collect()} == {"a", "b"}
        eng.execute("INSERT INTO t (id, g, x) VALUES (9, 'c', 1.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, "SELECT g, count(*) AS n FROM t GROUP BY g")

    def test_all_null_group_exposes_null_sum(self, spark, tmp_path):
        """Deleting a group's only non-NULL x must flip sum/avg back to
        NULL (the hidden non-null-count state, not the raw sum)."""
        eng, _ = _mk(spark, tmp_path, "p4", BASE)
        eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT g, sum(x) AS s, avg(x) AS a FROM t GROUP BY g")
        eng.execute("DELETE FROM t WHERE id = 4")  # b keeps only the NULL-x row
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        b = [r for r in eng.sql("SELECT * FROM mv").collect() if r["g"] == "b"]
        assert b and b[0]["s"] is None and b[0]["a"] is None
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, "SELECT g, sum(x) AS s, avg(x) AS a FROM t GROUP BY g")

    def test_global_aggregate_view(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "p5", BASE)
        eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT count(*) AS n, sum(x) AS s FROM t")
        assert eng.mat_views["mv"].incremental
        eng.execute("DELETE FROM t WHERE id > 0")  # empty the base
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        rows = eng.sql("SELECT * FROM mv").collect()
        assert len(rows) == 1  # ANSI: global agg keeps its single row
        assert rows[0]["n"] == 0 and rows[0]["s"] is None
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, "SELECT count(*) AS n, sum(x) AS s FROM t")

    def test_noop_when_caught_up(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "p6", BASE)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_SQL}")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "noop"
        assert rep["from_version"] == rep["to_version"]

    def test_refresh_full_forces_recompute(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "p7", BASE)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_SQL}")
        eng.execute("INSERT INTO t (id, g, x) VALUES (8, 'z', 4.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv FULL").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, MV_SQL)

    def test_vacuumed_gap_falls_back_to_full(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "p8", BASE)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_SQL}")
        eng.execute("INSERT INTO t (id, g, x) VALUES (8, 'z', 4.0)")
        eng.execute("DELETE FROM t WHERE id = 8")
        sink.vacuum(keep=1)  # drops the versions the delta needs
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, MV_SQL)

    def test_randomized_mutation_parity(self, spark, tmp_path):
        """Property: across randomized mutation batches with interleaved
        refreshes, the view always equals a from-scratch recompute."""
        rng = random.Random(20260814)
        rows = [(i, rng.choice("abcde"), float(rng.randint(0, 50))) for i in range(60)]
        eng, _ = _mk(spark, tmp_path, "prand", rows)
        q = (
            "SELECT g, count(*) AS n, sum(x) AS s, avg(x) AS a, count(x) AS cx "
            "FROM t WHERE x > 5 GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        next_id = 60
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    vals = ", ".join(
                        f"({next_id + k}, '{rng.choice('abcde')}', {float(rng.randint(0, 50))})"
                        for k in range(rng.randint(1, 4))
                    )
                    next_id += 4
                    eng.execute(f"INSERT INTO t (id, g, x) VALUES {vals}")
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {float(rng.randint(0, 50))} "
                        f"WHERE id % {rng.randint(2, 7)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(5, 11)} = 1")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, q)
            # doubles: compare with tolerance (incremental FP accumulation)
            assert len(got) == len(want), round_
            for gr, wr in zip(got, want):
                assert gr[0] == wr[0] and gr[1] == wr[1] and gr[4] == wr[4], round_
                for i in (2, 3):
                    if wr[i] is None:
                        assert gr[i] is None, round_
                    else:
                        assert abs(gr[i] - wr[i]) < 1e-6, (round_, gr, wr)


class TestDurableState:
    def test_with_path_persists_versions(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "d1", BASE)
        state = tmp_path / "mv_state"
        eng.execute(
            f'CREATE MATERIALIZED VIEW mv AS {MV_SQL} WITH {{"path": "{state}"}}'
        )
        mv = eng.mat_views["mv"]
        assert mv.state_sink is not None and mv.state_sink._version() == 0
        eng.execute("INSERT INTO t (id, g, x) VALUES (6, 'c', 3.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        assert mv.state_sink._version() == 1  # each refresh commits a version
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, MV_SQL)


class TestEligibility:
    @pytest.mark.parametrize(
        "q",
        [
            # an UNORDERED collect: nondeterministic order (engine
            # contract) — ordered forms maintain since r13/r14 (sorted /
            # pair substates, any single-direction key list)
            "SELECT g, array_agg(x) AS m FROM t GROUP BY g",
            # FILTER (WHERE …) is incremental since r13 (guarded-arg
            # fold) — but not on an agg outside the vocabulary
            "SELECT g, bool_and(x > 0) FILTER (WHERE id > 2) AS d FROM t GROUP BY g",
            # HAVING is incremental since r12 — unless it references an
            # agg the algebra can't maintain
            "SELECT g, count(*) AS n FROM t GROUP BY g HAVING bool_and(x IS NULL OR x > 0)",
            # INNER self-joins are incremental since r12; OUTER self-joins not
            "SELECT t.g, count(*) AS n FROM t LEFT JOIN t u ON t.id = u.id GROUP BY t.g",
            "SELECT upper(g) AS u, count(*) AS n FROM t GROUP BY g",  # key not exposed
            # ORDER BY [+LIMIT] is incremental since r12 (top-k views);
            # LIMIT without a total order is nondeterministic content
            "SELECT g, count(*) AS n FROM t GROUP BY g LIMIT 2",
            "SELECT DISTINCT g FROM t",  # no aggregate
        ],
    )
    def test_non_incremental_shapes_still_work(self, spark, tmp_path, q):
        eng, _ = _mk(spark, tmp_path, f"e{abs(hash(q)) % 99999}", BASE)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("DELETE FROM t WHERE id = 5")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_registry_base_is_full_mode(self, spark, tmp_path):
        eng = Engine(spark, "mv-reg")
        eng.register_df("r", spark.createDataFrame([(1, "a")], "id long, g string"))
        eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT g, count(*) AS n FROM r GROUP BY g")
        assert not eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == [("a", 1)]

    def test_view_is_stable_until_refresh(self, spark, tmp_path):
        """A materialized view must NOT see base changes until refreshed —
        that is what distinguishes it from a plain view."""
        eng, _ = _mk(spark, tmp_path, "e-stale", BASE)
        eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT count(*) AS n FROM t")
        eng.execute("DELETE FROM t WHERE id > 0")
        assert eng.sql("SELECT * FROM mv").collect()[0]["n"] == 5  # still the snapshot
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        assert eng.sql("SELECT * FROM mv").collect()[0]["n"] == 0


class TestLifecycleAndErrors:
    def test_drop_materialized_view(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "l1", BASE)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_SQL}")
        eng.execute("DROP MATERIALIZED VIEW mv")
        assert "mv" not in eng.mat_views
        with pytest.raises(ExecError):
            eng.sql("SELECT * FROM mv")
        with pytest.raises(ExecError):
            eng.execute("DROP MATERIALIZED VIEW mv")
        eng.execute("DROP MATERIALIZED VIEW IF EXISTS mv")  # no error

    def test_refresh_unknown_view_errors(self, spark):
        eng = Engine(spark, "l2")
        with pytest.raises(ExecError, match="unknown materialized view"):
            eng.execute("REFRESH MATERIALIZED VIEW nope")

    def test_create_requires_select(self, spark):
        eng = Engine(spark, "l3")
        with pytest.raises(ExecError, match="requires AS SELECT"):
            eng.execute("CREATE MATERIALIZED VIEW mv")

    def test_if_not_exists_and_replace(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "l4", BASE)
        eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT count(*) AS n FROM t")
        eng.execute(
            "CREATE MATERIALIZED VIEW IF NOT EXISTS mv AS SELECT count(*) AS zzz FROM t"
        )
        assert eng.sql("SELECT * FROM mv").columns == ["n"]  # kept the original
        eng.execute("CREATE OR REPLACE MATERIALIZED VIEW mv AS SELECT count(*) AS m FROM t")
        assert eng.sql("SELECT * FROM mv").columns == ["m"]

    def test_plan_cache_invalidated_by_refresh(self, spark, tmp_path):
        """A cached SELECT over the view must not serve stale results
        after REFRESH (register_df bumps the cache epoch)."""
        eng, _ = _mk(spark, tmp_path, "l5", BASE)
        eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT count(*) AS n FROM t")
        q = "SELECT n FROM mv"
        assert eng.sql(q).collect()[0]["n"] == 5
        eng.execute("INSERT INTO t (id, g, x) VALUES (6, 'c', 3.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv")
        assert eng.sql(q).collect()[0]["n"] == 6


class TestExtremaAndFilterOnly:
    """Round-11 widening: min/max views maintain incrementally —
    insert-side extrema FOLD (min of mins); groups a delete touched are
    re-aggregated from the base via a key-semi-join (repair_extrema,
    O(affected groups' rows)) — and filter-only projections maintain as
    a signed multiset re-expanded on read."""

    def test_minmax_insert_only_folds_without_base_read(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "mm1", BASE)
        q = "SELECT g, min(x) AS lo, max(x) AS hi FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].has_extrema
        eng.execute("INSERT INTO t (id, g, x) VALUES (50, 'a', -9.0), (51, 'b', 99.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_minmax_delete_repairs_only_touched_groups(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "mm2", BASE)
        q = "SELECT g, min(x) AS lo, max(x) AS hi, count(*) AS n FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        # delete the reigning max of one group; other groups must fold
        hi = eng.sql("SELECT max(x) AS m FROM t WHERE g = 'a'").collect()[0]["m"]
        eng.execute(f"DELETE FROM t WHERE g = 'a' AND x = {hi}")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_filter_only_multiset_with_duplicates(self, spark, tmp_path):
        rows = [(1, "a", 1.0), (2, "a", 1.0), (3, "b", 2.0), (4, "a", 3.0)]
        eng, sink = _mk(spark, tmp_path, "fo1", rows)
        q = "SELECT g, x FROM t WHERE x < 3"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].expand
        # duplicates preserved (ids 1 and 2 project identically)
        assert _rows(eng, "SELECT * FROM mv") == [("a", 1.0), ("a", 1.0), ("b", 2.0)]
        eng.execute("DELETE FROM t WHERE id = 2")  # remove ONE duplicate
        eng.execute("UPDATE t SET x = 2.5 WHERE id = 4")  # enters the filter
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_randomized_mutation_parity_extrema_and_filter_only(self, spark, tmp_path):
        """The r10 randomized mutation/refresh differential, extended to
        the round-11 shapes (min/max + filter-only), per the verdict's
        done-criterion."""
        import random

        rng = random.Random(20260815)
        rows = [(i, rng.choice("abcd"), float(rng.randint(0, 40))) for i in range(50)]
        eng, _ = _mk(spark, tmp_path, "prand2", rows)
        q1 = "SELECT g, min(x) AS lo, max(x) AS hi, sum(x) AS s FROM t WHERE x > 3 GROUP BY g"
        q2 = "SELECT id, g FROM t WHERE x >= 10"
        eng.execute(f"CREATE MATERIALIZED VIEW mva AS {q1}")
        eng.execute(f"CREATE MATERIALIZED VIEW mvb AS {q2}")
        assert eng.mat_views["mva"].has_extrema and eng.mat_views["mvb"].expand
        next_id = 50
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    vals = ", ".join(
                        f"({next_id + k}, '{rng.choice('abcd')}', {float(rng.randint(0, 40))})"
                        for k in range(rng.randint(1, 4))
                    )
                    next_id += 4
                    eng.execute(f"INSERT INTO t (id, g, x) VALUES {vals}")
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {float(rng.randint(0, 40))} "
                        f"WHERE id % {rng.randint(2, 7)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(5, 11)} = 1")
            for name, q in (("mva", q1), ("mvb", q2)):
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {name}").collect()[0]
                assert rep["mode"] in ("incremental", "noop"), (round_, name)
                got, want = _rows(eng, f"SELECT * FROM {name}"), _rows(eng, q)
                assert len(got) == len(want), (round_, name)
                for gr, wr in zip(got, want):
                    for gv, wv in zip(gr, wr):
                        if isinstance(wv, float):
                            assert abs(gv - wv) < 1e-6, (round_, name, gr, wr)
                        else:
                            assert gv == wv, (round_, name, gr, wr)


class TestVarianceMatViews:
    """The variance family is algebraic — (Σx, Σx², n) folds under
    signed deltas; exposure computes m2 = Σx² − (Σx)²/n. Values can
    differ from Spark's central-moments accumulation in the last ulps,
    so comparisons are approximate."""

    Q = (
        "SELECT g, stddev(x) AS sd, var_pop(x) AS vp, variance(x) AS vs, "
        "count(*) AS n FROM t GROUP BY g"
    )

    @staticmethod
    def _approx(got, want):
        assert len(got) == len(want), (got, want)
        for gr, wr in zip(got, want):
            for gv, wv in zip(gr, wr):
                if isinstance(gv, float) and isinstance(wv, float):
                    assert abs(gv - wv) <= 1e-9 * max(1.0, abs(wv)), (gr, wr)
                else:
                    assert gv == wv, (gr, wr)

    def test_variance_family_parity(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "vq1",
            [(i, "g" + str(i % 3), float(i % 13)) for i in range(40)]
            + [(100, "g0", None)],
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q))
        eng.execute("INSERT INTO t (id, g, x) VALUES (101, 'g1', 5.0), (102, 'g3', 2.0)")
        eng.execute("UPDATE t SET x = 9.0 WHERE id % 4 = 1")
        eng.execute("DELETE FROM t WHERE id % 7 = 3")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q))
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(self.Q).schema

    def test_single_row_and_vanishing_groups(self, spark, tmp_path):
        # n=1: sample variants NULL, population 0.0; a group shrinking to
        # one row must flip its sample stddev back to NULL
        eng, _ = _mk(spark, tmp_path, "vq2", [(1, "a", 3.0), (2, "a", 7.0), (3, "b", 1.0)])
        q = "SELECT g, stddev(x) AS sd, stddev_pop(x) AS sp FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute("DELETE FROM t WHERE id = 2")  # 'a' shrinks to one row
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))
        got = dict((r[0], (r[1], r[2])) for r in _rows(eng, "SELECT * FROM mv"))
        assert got["a"] == (None, 0.0)

    def test_variance_in_having_and_randomized(self, spark, tmp_path):
        rng = random.Random(20260821)
        eng, _ = _mk(
            spark, tmp_path, "vqr",
            [(i, "g" + str(i % 4), float(i % 9)) for i in range(50)],
        )
        q = (
            "SELECT g, sum(x) AS s, count(*) AS n FROM t "
            "GROUP BY g HAVING var_pop(x) > 1.0"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id = 200
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    eng.execute(
                        f"INSERT INTO t (id, g, x) VALUES "
                        f"({next_id}, 'g{rng.randint(0, 4)}', {float(rng.randint(0, 20))})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {float(rng.randint(0, 20))} "
                        f"WHERE id % {rng.randint(2, 6)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(4, 9)} = 1")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))

    def test_distinct_variance_rides_the_substate(self):
        # stddev(DISTINCT x) maintains since r13 — the substate's values
        # ARE the distinct support; median/mode(DISTINCT) maintain since
        # r14 (distinct-weighted sort exposure / min lowering;
        # differentials in tests/test_matview_r14.py)
        from qlbridge_spark.matview import _parse_agg
        from qlbridge_spark.rel import parse_sql

        sel = parse_sql("SELECT stddev(DISTINCT x) AS sd FROM t")
        assert _parse_agg(sel.columns[0].expr)[0] == "stddev_distinct"
        sel2 = parse_sql("SELECT median(DISTINCT x) AS md FROM t")
        assert _parse_agg(sel2.columns[0].expr)[0] == "median_distinct"
        sel3 = parse_sql("SELECT mode(DISTINCT x) AS mo FROM t")
        assert _parse_agg(sel3.columns[0].expr)[0] == "min"


class TestHavingMatViews:
    """HAVING applies at EXPOSE time over the aggregated state: groups
    stay in state while filtered out, so a later delta can bring them
    back; aggs referenced only by HAVING are maintained as hidden state
    columns and never exposed."""

    def test_having_on_alias_and_raw_agg(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "hv1", BASE)
        q = "SELECT g, count(*) AS n, sum(x) AS s FROM t GROUP BY g HAVING n > 1"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # raw agg spelling too
        q2 = "SELECT g, sum(x) AS s FROM t GROUP BY g HAVING count(*) > 1 AND sum(x) > 10"
        eng.execute(f"CREATE OR REPLACE MATERIALIZED VIEW mv2 AS {q2}")
        mv2 = eng.mat_views["mv2"]
        assert mv2.incremental
        # count(*) is HAVING-only → hidden; sum(x) reuses the exposed spec
        assert [a.out for a in mv2.aggs] == ["s", "__mv_h0"]
        assert eng.sql("SELECT * FROM mv2").columns == ["g", "s"]
        assert _rows(eng, "SELECT * FROM mv2") == _rows(eng, q2)

    def test_group_crosses_having_boundary_both_ways(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "hv2", BASE)
        q = "SELECT g, count(*) AS n FROM t GROUP BY g HAVING n >= 2"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert _rows(eng, "SELECT * FROM mv") == [("a", 2), ("b", 2)]
        # 'c' (1 row) joins the view when a second row lands
        eng.execute("INSERT INTO t (id, g, x) VALUES (6, 'c', 1.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert ("c", 2) in _rows(eng, "SELECT * FROM mv")
        # and drops back out when it shrinks below the bar
        eng.execute("DELETE FROM t WHERE id = 6")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert all(g != "c" or n >= 2 for g, n in _rows(eng, "SELECT * FROM mv"))

    def test_having_with_distinct_and_extrema(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "hv3", BASE)
        q = (
            "SELECT g, count(DISTINCT x) AS dx, min(x) AS lo "
            "FROM t GROUP BY g HAVING max(x) > 5"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.has_distinct and mv.has_extrema
        eng.execute("DELETE FROM t WHERE id = 2")  # removes a's max (20)
        eng.execute("INSERT INTO t (id, g, x) VALUES (7, 'b', 100.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_having_randomized_parity(self, spark, tmp_path):
        rng = random.Random(20260820)
        eng, _ = _mk(
            spark, tmp_path, "hvr",
            [(i, "g" + str(i % 5), float(i % 11)) for i in range(50)],
        )
        q = (
            "SELECT g, sum(x) AS s, count(*) AS n FROM t WHERE id > 1 "
            "GROUP BY g HAVING count(*) > 3 AND s < 400"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id = 50
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    eng.execute(
                        f"INSERT INTO t (id, g, x) VALUES "
                        f"({next_id}, 'g{rng.randint(0, 6)}', {float(rng.randint(0, 30))})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {float(rng.randint(0, 30))} "
                        f"WHERE id % {rng.randint(2, 6)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(4, 9)} = 1")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), round_


class TestTopKMatViews:
    """ORDER BY [+ LIMIT/OFFSET] views maintain incrementally: the state
    always holds EVERY group; the sort and cut apply at expose time, so
    a group entering or leaving the top k needs no special handling."""

    def test_order_by_only_is_presentation(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "tk1", BASE)
        q = "SELECT g, sum(x) AS s FROM t GROUP BY g ORDER BY g DESC"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x) VALUES (6, 'd', 4.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        got = [tuple(r) for r in eng.sql("SELECT * FROM mv").collect()]
        want = [tuple(r) for r in eng.sql(q).collect()]
        assert got == want  # ORDER PRESERVED, not just same multiset

    def test_topk_groups_enter_and_leave(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "tk2", BASE)
        # unique sums (no ties): a=30, b=5(null+5), c=7 → top2 = a, c
        q = "SELECT g, sum(x) AS s FROM t GROUP BY g ORDER BY s DESC NULLS LAST, g LIMIT 2"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.limit == 2
        assert [tuple(r) for r in eng.sql("SELECT * FROM mv").collect()] == [
            ("a", 30.0),
            ("c", 7.0),
        ]
        # 'b' surges into the top 2, evicting 'c' — no special handling
        eng.execute("INSERT INTO t (id, g, x) VALUES (6, 'b', 100.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert [tuple(r) for r in eng.sql("SELECT * FROM mv").collect()] == [
            ("b", 105.0),
            ("a", 30.0),
        ]
        # and drops back out when its rows delete — the evicted group
        # re-appears from state (a LIMIT-k cache could never do this)
        eng.execute("DELETE FROM t WHERE id = 6")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        got = [tuple(r) for r in eng.sql("SELECT * FROM mv").collect()]
        assert got == [tuple(r) for r in eng.sql(q).collect()] == [
            ("a", 30.0),
            ("c", 7.0),
        ]

    def test_order_by_raw_agg_with_offset_and_having(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "tk3",
            [(i, "g" + str(i % 6), float(i)) for i in range(36)],
        )
        # NOTE: ORDER BY over a raw (non-projected) aggregate is not
        # supported by the engine's own SELECT pipeline either; the
        # post-agg sort keys resolve against the aggregated output, so
        # we order on the exposed alias and keep the raw agg in HAVING
        q = (
            "SELECT g, count(*) AS n FROM t GROUP BY g "
            "HAVING sum(x) > 50 ORDER BY n DESC, g LIMIT 3 OFFSET 1"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        # sum(x) is referenced only post-agg → ONE hidden spec shared by
        # HAVING and ORDER BY
        assert [a.out for a in mv.aggs] == ["n", "__mv_h0"]
        assert eng.sql("SELECT * FROM mv").columns == ["g", "n"]
        for stmt in (
            "DELETE FROM t WHERE id % 7 = 2",
            "INSERT INTO t (id, g, x) VALUES (100, 'g1', 500.0)",
            "UPDATE t SET x = 0.0 WHERE g = 'g3'",
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental"
            got = [tuple(r) for r in eng.sql("SELECT * FROM mv").collect()]
            want = [tuple(r) for r in eng.sql(q).collect()]
            assert got == want, stmt


class TestDistinctAggMatViews:
    """count/sum/avg(DISTINCT x) maintain through a TWO-LEVEL state: a
    (group keys, value) → signed-occurrence-count substate folds deltas
    exactly like the main state; the exposed value re-aggregates the
    O(|distinct values|) substate — never the base. min/max(DISTINCT x)
    is just min/max(x)."""

    Q = (
        "SELECT g, count(DISTINCT x) AS dx, sum(DISTINCT x) AS sx, "
        "count(*) AS n FROM t GROUP BY g"
    )

    def test_insert_update_delete_parity(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "dq1", BASE)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.has_distinct
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        # duplicate value lands (count distinct must NOT grow), a value
        # vanishes (its last occurrence deleted), a null arrives
        eng.execute(
            "INSERT INTO t (id, g, x) VALUES (6, 'a', 10.0), (7, 'a', 99.0), (8, 'c', NULL)"
        )
        eng.execute("UPDATE t SET x = 20.0 WHERE id = 1")  # a: 10 now unique to id=6
        eng.execute("DELETE FROM t WHERE id = 5")  # c loses x=7 entirely
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(self.Q).schema

    def test_distinct_value_refcounting(self, spark, tmp_path):
        # two rows share x=5.0 in group 'b'; deleting ONE keeps the
        # distinct count, deleting BOTH drops it
        eng, _ = _mk(
            spark, tmp_path, "dq2",
            [(1, "b", 5.0), (2, "b", 5.0), (3, "b", 8.0)],
        )
        q = "SELECT g, count(DISTINCT x) AS dx FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute("DELETE FROM t WHERE id = 1")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng, "SELECT * FROM mv") == [("b", 2)]
        eng.execute("DELETE FROM t WHERE id = 2")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng, "SELECT * FROM mv") == [("b", 1)]

    def test_global_distinct_and_avg(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "dq3", BASE)
        q = "SELECT count(DISTINCT g) AS dg, avg(DISTINCT x) AS ax FROM t"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("DELETE FROM t WHERE g = 'c'")  # a whole group label vanishes
        eng.execute("INSERT INTO t (id, g, x) VALUES (9, 'zz', 10.0)")  # dup value 10.0
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_min_distinct_is_plain_extremum(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "dq4", BASE)
        q = "SELECT g, min(DISTINCT x) AS lo FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.has_extrema and not mv.has_distinct
        eng.execute("DELETE FROM t WHERE id = 4")  # removes b's minimum
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_agg_before_key_column_order(self, spark, tmp_path):
        # exposed column ORDER follows the original SELECT, not
        # keys-first (regression: out_order)
        eng, _ = _mk(spark, tmp_path, "dq5", BASE)
        q = "SELECT sum(x) AS s, g, count(DISTINCT x) AS dx FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.sql("SELECT * FROM mv").columns == ["s", "g", "dx"]
        eng.execute("INSERT INTO t (id, g, x) VALUES (10, 'a', 1.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert eng.sql("SELECT * FROM mv").columns == ["s", "g", "dx"]
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_join_view_with_distinct_and_dim_mutation(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "mv-dj")
        fact = ParquetMergeSink(spark, str(tmp_path / "djf"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 4, float(i % 7)) for i in range(40)],
                "id long, dk int, x double",
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / "djd"), key="dk")
        dim.ensure(
            spark.createDataFrame([(k, f"n{k}") for k in range(4)], "dk int, dname string")
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        q = (
            "SELECT d.dname AS g, count(DISTINCT f.x) AS dx, count(*) AS n "
            "FROM f JOIN d ON f.dk = d.dk GROUP BY d.dname"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("UPDATE d SET dname = 'renamed' WHERE dk = 1")  # dim moved
        eng.execute("INSERT INTO f (id, dk, x) VALUES (100, 1, 3.0), (101, 2, 50.0)")
        eng.execute("DELETE FROM f WHERE id = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_durable_path_persists_substates(self, spark, tmp_path):
        import os

        eng, _ = _mk(spark, tmp_path, "dq6", BASE)
        q = "SELECT g, count(DISTINCT x) AS dx, sum(x) AS s FROM t GROUP BY g"
        state = tmp_path / "dq6_state"
        eng.execute(f'CREATE MATERIALIZED VIEW mv AS {q} WITH {{"path": "{state}"}}')
        mv = eng.mat_views["mv"]
        assert mv.incremental and len(mv.sub_sinks) == 1
        assert os.path.isdir(f"{state}__d0")  # durable substate sibling
        eng.execute("INSERT INTO t (id, g, x) VALUES (11, 'a', 1.0), (12, 'a', 10.0)")
        eng.execute("DELETE FROM t WHERE id = 5")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # each refresh commits a new substate version (time-travelable
        # like the main state)
        assert mv.sub_sinks[0]._version() >= 1

    def test_randomized_mutations_with_distinct(self, spark, tmp_path):
        rng = random.Random(20260819)
        eng, _ = _mk(
            spark, tmp_path, "dqr",
            [(i, "g" + str(i % 4), float(i % 9)) for i in range(60)],
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        next_id = 60
        for round_ in range(5):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    g = "g" + str(rng.randint(0, 5))
                    x = rng.choice([f"{float(rng.randint(0, 8))}", "NULL"])
                    eng.execute(
                        f"INSERT INTO t (id, g, x) VALUES ({next_id}, '{g}', {x})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {float(rng.randint(0, 8))} "
                        f"WHERE id % {rng.randint(2, 6)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(5, 11)} = 1")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q)
            assert got == want, (round_, got, want)


class TestJoinMatViews:
    """Incremental JOIN views. While the dim is unchanged:
    Δ(F ⋈ D) = ΔF ⋈ D for INNER/LEFT joins — fact deltas fold through
    the join. When the dim ALSO moved (detected by its pinned sink
    version), INNER joins maintain via the bilinear higher-order
    identity Δ(F ⋈ D) = ΔF ⋈ D_new ∪ F_old ⋈ ΔD; LEFT joins fall back
    to full recompute there (NULL-extension isn't bilinear). Self-joins,
    non-sink dims, RIGHT/FULL joins, and extrema whose group keys touch
    dim columns stay full-recompute; extrema with fact-side keys repair
    incrementally."""

    def _mk(self, spark, tmp_path, name):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, f"mvj-{name}")
        fact = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 5, float(i)) for i in range(60)], "id long, dk int, x double"
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / f"{name}_d"), key="dk")
        dim.ensure(
            spark.createDataFrame([(k, f"n{k}") for k in range(4)], "dk int, dname string")
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        return eng, fact, dim

    Q = (
        "SELECT d.dname AS g, sum(f.x) AS s, count(*) AS n "
        "FROM f JOIN d ON f.dk = d.dk WHERE f.x > 2 GROUP BY d.dname"
    )

    def test_fact_deltas_fold_through_the_join(self, spark, tmp_path):
        eng, fact, dim = self._mk(spark, tmp_path, "a")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.dim == "d"
        eng.execute("INSERT INTO f (id, dk, x) VALUES (100, 1, 50.0), (101, 0, 1.0)")
        eng.execute("UPDATE f SET x = 99.0 WHERE id = 7")
        eng.execute("DELETE FROM f WHERE id = 3")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)

    def test_left_join_unmatched_facts(self, spark, tmp_path):
        eng, fact, dim = self._mk(spark, tmp_path, "b")
        q = "SELECT f.dk AS k, count(*) AS n, sum(f.x) AS s FROM f LEFT JOIN d ON f.dk = d.dk GROUP BY f.dk"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO f (id, dk, x) VALUES (200, 4, 7.0)")  # dk=4 has no dim row
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_dim_commit_maintains_inner_join_incrementally(self, spark, tmp_path):
        # higher-order maintenance: a dim-only commit folds via the
        # F_old ⋈ ΔD term (group renamed → old group retracted, new
        # group inserted), and the dim version re-pins
        eng, fact, dim = self._mk(spark, tmp_path, "c")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        eng.execute("UPDATE d SET dname = 'renamed' WHERE dk = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        assert eng.mat_views["mv"].dim_version == max(dim.versions())
        eng.execute("DELETE FROM f WHERE id = 10")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)

    def test_both_sides_mutating_in_one_window(self, spark, tmp_path):
        # ΔF ⋈ D_new ∪ F_old ⋈ ΔD with BOTH terms non-empty, including
        # the cross case (new fact rows joining new dim rows — covered
        # by ΔF ⋈ D_new) and a dim DELETE dropping a whole group
        eng, fact, dim = self._mk(spark, tmp_path, "hb")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        eng.execute("INSERT INTO d (dk, dname) VALUES (4, 'n4')")  # dim insert
        eng.execute("UPDATE d SET dname = 'zz' WHERE dk = 0")  # dim update
        eng.execute("DELETE FROM d WHERE dk = 2")  # dim delete: group vanishes
        eng.execute("INSERT INTO f (id, dk, x) VALUES (300, 4, 9.0), (301, 2, 8.0)")
        eng.execute("UPDATE f SET x = 77.0 WHERE id = 6")
        eng.execute("DELETE FROM f WHERE id = 11")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(self.Q).schema

    def test_dim_commit_on_left_join_maintains_via_null_flips(self, spark, tmp_path):
        # LEFT join + dim mutation: the null-extension term flips exactly
        # when a key's dim match count crosses 0↔1 — a dim DELETE turns
        # dk=3's facts into null-extended rows, a dim INSERT re-matches
        # them; count(*) is invariant here but count(d.dname) is not
        eng, fact, dim = self._mk(spark, tmp_path, "lj")
        q = (
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd, sum(f.x) AS s "
            "FROM f LEFT JOIN d ON f.dk = d.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute("DELETE FROM d WHERE dk = 3")  # dk=3 facts flip to null-ext
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO d (dk, dname) VALUES (3, 'back'), (4, 'new')")
        eng.execute("DELETE FROM f WHERE id = 10")  # fact delta in same window
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_left_join_multi_match_dim_counts(self, spark, tmp_path):
        # dim with DUPLICATE join keys (surrogate-keyed sink): m 2→1
        # keeps the fact matched (no flip), m 1→0 flips to null-extended,
        # m 0→1 flips back — only the 0-crossings touch the null term
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "mvj-mm")
        fact = ParquetMergeSink(spark, str(tmp_path / "mmf"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 3, float(i)) for i in range(12)], "id long, dk int, x double"
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / "mmd"), key="rid")
        dim.ensure(
            spark.createDataFrame(
                [(0, 0, "a0"), (1, 0, "a1"), (2, 1, "b0")],  # dk=0 matches TWICE
                "rid long, dk int, dname string",
            )
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        q = (
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd "
            "FROM f LEFT JOIN d ON f.dk = d.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        for stmt in (
            "DELETE FROM d WHERE rid = 1",  # dk=0: m 2→1, no flip
            "DELETE FROM d WHERE rid = 0",  # dk=0: m 1→0, facts flip to null-ext
            "INSERT INTO d (rid, dk, dname) VALUES (5, 2, 'c0'), (6, 2, 'c1')",  # dk=2: m 0→2
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), stmt

    def test_left_join_extrema_with_dim_deltas(self, spark, tmp_path):
        # extrema + LEFT join + dim mutation: flip-term retractions set
        # the repair flag; the repair re-aggregates the touched groups
        # through the view's own LEFT join (null-extended rows included)
        eng, fact, dim = self._mk(spark, tmp_path, "lx")
        q = (
            "SELECT f.dk AS k, min(f.x) AS lo, max(f.x) AS hi, count(*) AS n "
            "FROM f LEFT JOIN d ON f.dk = d.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.has_extrema
        eng.execute("DELETE FROM d WHERE dk = 1")  # dk=1 facts flip to null-ext
        eng.execute("DELETE FROM f WHERE id = 6")  # and lose an extremum candidate
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO d (dk, dname) VALUES (4, 'late')")  # dk=4 re-matches
        eng.execute("INSERT INTO f (id, dk, x) VALUES (800, 4, -3.0)")  # new min
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_dim_commit_on_left_join_nonequi_on_maintains(self, spark, tmp_path):
        # a TWO-SIDED non-equi conjunct under ΔD maintains since r14 via
        # the T4' per-row match recount (tests/test_matview_r14.py has
        # the full lifecycle); RIGHT/FULL with such conjuncts stay full.
        eng, fact, dim = self._mk(spark, tmp_path, "ljc")
        q = (
            "SELECT f.dk AS k, count(*) AS n "
            "FROM f LEFT JOIN d ON f.dk = d.dk AND f.x > d.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("DELETE FROM d WHERE dk = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("DELETE FROM f WHERE id = 10")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_extrema_with_fact_side_keys_repairs_incrementally(self, spark, tmp_path):
        # directive: min/max with a join maintains when the GROUP keys
        # are fact-side-evaluable (the repair probe runs on the fact
        # frame alone; the re-agg re-runs the join over pruned rows).
        # The extremum arg may live on either side.
        eng, fact, dim = self._mk(spark, tmp_path, "xk")
        q = (
            "SELECT f.dk AS k, min(f.x) AS lo, max(f.x) AS hi, count(*) AS n "
            "FROM f JOIN d ON f.dk = d.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO f (id, dk, x) VALUES (400, 1, -5.0)")  # new min
        eng.execute("DELETE FROM f WHERE id = 4")  # removes a reigning extremum candidate
        eng.execute("UPDATE f SET x = 200.0 WHERE id = 9")  # new max
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # and under a concurrent dim mutation (higher-order + repair)
        eng.execute("DELETE FROM d WHERE dk = 0")  # group vanishes via the dim
        eng.execute("INSERT INTO f (id, dk, x) VALUES (401, 2, -9.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_right_join_fact_deltas_flip_dim_null_extensions(self, spark, tmp_path):
        # RIGHT join preserves DIM rows: a fact-only delta can flip a dim
        # row between matched and null-extended — every refresh runs the
        # match-count terms (T6), not just dim-moved ones
        eng, fact, dim = self._mk(spark, tmp_path, "rj")
        q = (
            "SELECT d.dname AS g, count(*) AS n, count(f.x) AS nf, sum(f.x) AS s "
            "FROM f RIGHT JOIN d ON f.dk = d.dk GROUP BY d.dname"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        # dk=1's facts all vanish → dim row n1 becomes null-extended
        eng.execute("DELETE FROM f WHERE dk = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert ("n1", 1, 0, None) in _rows(eng, "SELECT * FROM mv")
        # and re-matches when a fact returns
        eng.execute("INSERT INTO f (id, dk, x) VALUES (500, 1, 9.0), (501, 1, 2.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_right_join_dim_deltas(self, spark, tmp_path):
        eng, fact, dim = self._mk(spark, tmp_path, "rjd")
        q = (
            "SELECT d.dk AS k, count(*) AS n, sum(f.x) AS s "
            "FROM f RIGHT JOIN d ON f.dk = d.dk GROUP BY d.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        # unmatched dim insert (dk=9: no facts → null-extended group),
        # matched dim delete, plus fact churn in the same window
        eng.execute("INSERT INTO d (dk, dname) VALUES (9, 'lonely')")
        eng.execute("DELETE FROM d WHERE dk = 0")
        eng.execute("UPDATE f SET x = -1.0 WHERE id % 4 = 2")
        eng.execute("DELETE FROM f WHERE dk = 3")  # dim 3 flips to null-ext
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert (9, 1, None) in _rows(eng, "SELECT * FROM mv")

    def test_full_join_both_null_sides(self, spark, tmp_path):
        eng, fact, dim = self._mk(spark, tmp_path, "fj")
        q = (
            "SELECT coalesce(f.dk, d.dk) AS k, count(*) AS n, "
            "count(f.x) AS nf, count(d.dname) AS nd "
            "FROM f FULL OUTER JOIN d ON f.dk = d.dk GROUP BY coalesce(f.dk, d.dk)"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        # fact side: dk=4 facts are null-extended from the start; insert
        # a dim row for them (they re-match), delete dim dk=2 (its facts
        # flip to null-extended), insert an unmatched dim (dim null-ext),
        # plus fact churn — every null term fires in one window
        eng.execute("INSERT INTO d (dk, dname) VALUES (4, 'now-matched'), (11, 'lonely')")
        eng.execute("DELETE FROM d WHERE dk = 2")
        eng.execute("INSERT INTO f (id, dk, x) VALUES (600, 11, 1.0), (601, 77, 2.0)")
        eng.execute("DELETE FROM f WHERE id % 5 = 3")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_inner_self_join_maintains_incrementally(self, spark, tmp_path):
        # Δ(F⋈F) = ΔF⋈F_new ∪ F_old⋈ΔF — same bilinear identity with
        # F = D. Many-to-many on dk (per-key SQUARED counts) is the
        # adversarial case: one inserted row changes the group's pair
        # count by 2m+1
        eng, fact, dim = self._mk(spark, tmp_path, "sj")
        q = (
            "SELECT f.dk AS k, count(*) AS pairs, sum(g.x) AS sx "
            "FROM f JOIN f g ON f.dk = g.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.dim == "f"
        for stmt in (
            "INSERT INTO f (id, dk, x) VALUES (700, 1, 3.0), (701, 1, 4.0)",
            "DELETE FROM f WHERE id % 6 = 2",
            "UPDATE f SET x = 50.0 WHERE id % 7 = 0",
            "UPDATE f SET dk = 0 WHERE id = 9",  # row MOVES between groups
        ):
            eng.execute(stmt)
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] == "incremental", stmt
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), stmt

    def test_extrema_with_dim_side_keys(self, spark, tmp_path):
        # the repair probe runs on the DIM side when the group keys live
        # there: INNER prunes dim rows and re-joins; RIGHT additionally
        # carries the null-extended dim rows (min over an empty match
        # set = NULL) — fact deletes that remove a reigning extremum
        # repair through the dim probe in both shapes
        eng, fact, dim = self._mk(spark, tmp_path, "xd")
        qi = (
            "SELECT d.dname AS g, min(f.x) AS lo, max(f.x) AS hi, count(*) AS n "
            "FROM f JOIN d ON f.dk = d.dk GROUP BY d.dname"
        )
        qr = qi.replace("JOIN d", "RIGHT JOIN d", 1).replace("RIGHT RIGHT", "RIGHT")
        eng.execute(f"CREATE MATERIALIZED VIEW mvi AS {qi}")
        eng.execute(f"CREATE MATERIALIZED VIEW mvr AS {qr}")
        assert eng.mat_views["mvi"].incremental
        assert eng.mat_views["mvi"].extrema_side == "dim"
        assert eng.mat_views["mvr"].incremental
        assert eng.mat_views["mvr"].extrema_side == "dim"
        for stmt in (
            "DELETE FROM f WHERE id = 56",  # removes a max candidate
            "INSERT INTO f (id, dk, x) VALUES (950, 2, -8.0)",  # new min
            "DELETE FROM f WHERE dk = 1",  # RIGHT: group flips to null-ext
            "UPDATE d SET dname = 'renamed' WHERE dk = 3",  # dim moves too
            "INSERT INTO d (dk, dname) VALUES (12, 'lonely')",
        ):
            eng.execute(stmt)
            for v, q in (("mvi", qi), ("mvr", qr)):
                rep = eng.sql(f"REFRESH MATERIALIZED VIEW {v}").collect()[0]
                assert rep["mode"] == "incremental", (v, stmt)
                assert _rows(eng, f"SELECT * FROM {v}") == _rows(eng, q), (v, stmt)

    def test_distinct_on_dim_preserved_and_self_joins(self, spark, tmp_path):
        # DISTINCT substates are pure signed counting — they fold through
        # the same terms as the main state on RIGHT joins and self-joins
        eng, fact, dim = self._mk(spark, tmp_path, "dsj")
        qr = (
            "SELECT d.dname AS g, count(DISTINCT f.x) AS dx, count(*) AS n "
            "FROM f RIGHT JOIN d ON f.dk = d.dk GROUP BY d.dname"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mvr AS {qr}")
        assert eng.mat_views["mvr"].incremental
        eng.execute("DELETE FROM f WHERE dk = 1")  # dim 1 flips to null-ext
        eng.execute("INSERT INTO d (dk, dname) VALUES (9, 'lonely')")
        eng.execute("UPDATE f SET x = 3.0 WHERE id % 5 = 0")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mvr").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mvr") == _rows(eng, qr)

        qs = (
            "SELECT f.dk AS k, count(DISTINCT g.x) AS dx "
            "FROM f JOIN f g ON f.dk = g.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mvs AS {qs}")
        assert eng.mat_views["mvs"].incremental
        eng.execute("INSERT INTO f (id, dk, x) VALUES (900, 2, 3.0), (901, 2, 3.0)")
        eng.execute("DELETE FROM f WHERE id % 9 = 4")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mvs").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mvs") == _rows(eng, qs)

    def test_ineligible_join_shapes_stay_full(self, spark, tmp_path):
        eng, fact, dim = self._mk(spark, tmp_path, "e")
        for q in (
            # OUTER self-joins: the null terms entangle both sides
            "SELECT f.dk AS k, count(*) AS n FROM f LEFT JOIN f g ON f.id = g.id GROUP BY f.dk",
            # (RIGHT with a two-sided non-equi conjunct maintains since
            # r14 — the per-row match-state terms; see
            # tests/test_matview_r14.py::TestTwoSidedNonEquiOnMatViews)
        ):
            eng.execute(f"CREATE OR REPLACE MATERIALIZED VIEW mvx AS {q}")
            assert not eng.mat_views["mvx"].incremental, q
            assert _rows(eng, "SELECT * FROM mvx") == _rows(eng, q)

    def test_or_tree_on_maintains(self, spark, tmp_path):
        # OR-tree ON under a dim-preserved join maintains since r16: the
        # whole OR is one row-local two-sided conjunct, absorbed by the
        # per-row match-state recount terms (COVERAGE.md §5 item 10;
        # differential class in tests/test_matview_fuzz.py)
        eng, fact, dim = self._mk(spark, tmp_path, "ot")
        q = (
            "SELECT d.dname AS g, count(*) AS n FROM f RIGHT JOIN d "
            "ON f.dk = d.dk OR f.dk = d.dk GROUP BY d.dname"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mvot AS {q}")
        assert eng.mat_views["mvot"].incremental
        assert _rows(eng, "SELECT * FROM mvot") == _rows(eng, q)
        eng.execute("INSERT INTO f (id, dk, x) VALUES (700, 2, 3.0), (701, 9, 1.0)")
        eng.execute("DELETE FROM f WHERE id % 6 = 1")
        eng.execute("UPDATE d SET dname = 'zz' WHERE dk = 0")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mvot").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mvot") == _rows(eng, q)

    def test_randomized_fact_mutations(self, spark, tmp_path):
        import random

        rng = random.Random(20260816)
        eng, fact, dim = self._mk(spark, tmp_path, "r")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        next_id = 60
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    vals = ", ".join(
                        f"({next_id + k}, {rng.randint(0, 5)}, {float(rng.randint(0, 40))})"
                        for k in range(rng.randint(1, 3))
                    )
                    next_id += 3
                    eng.execute(f"INSERT INTO f (id, dk, x) VALUES {vals}")
                elif op == "upd":
                    eng.execute(
                        f"UPDATE f SET x = {float(rng.randint(0, 40))} "
                        f"WHERE id % {rng.randint(2, 7)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 11)} = 1")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, self.Q)
            assert len(got) == len(want), round_
            for gr, wr in zip(got, want):
                assert gr[0] == wr[0] and gr[2] == wr[2], (round_, gr, wr)
                assert abs(gr[1] - wr[1]) < 1e-6, (round_, gr, wr)

    def test_equi_join_prune_cols_extraction(self, spark, tmp_path):
        # the F_old ⋈ ΔD term pre-filters the fact scan by the dim
        # delta's join keys when the ON decomposes into ONE equality
        # pair (+ optional single-side residuals, since r13); qualified,
        # unqualified-unambiguous, reversed, and residual spellings all
        # extract; two-sided non-equi conjuncts do not
        from qlbridge_spark.matview import equi_join_prune_cols

        eng, fact, dim = self._mk(spark, tmp_path, "pj")
        fcols, dcols = {"id", "dk", "x"}, {"dk", "dname"}
        for q, want in [
            (self.Q, ("dk", "dk")),
            ("SELECT f.dk AS k, sum(x) AS s FROM f JOIN d ON d.dk = f.dk GROUP BY f.dk", ("dk", "dk")),
            ("SELECT f.dk AS k, sum(x) AS s FROM f JOIN d ON f.dk = d.dk AND f.x > 0 GROUP BY f.dk", ("dk", "dk")),
            ("SELECT f.dk AS k, sum(x) AS s FROM f JOIN d ON f.dk = d.dk AND f.x > d.dk GROUP BY f.dk", None),
        ]:
            eng.execute(f"CREATE OR REPLACE MATERIALIZED VIEW mvp AS {q}")
            mv = eng.mat_views["mvp"]
            if mv.dim is None:
                assert want is None  # compound ON may not even be row-analyzable
                continue
            assert equi_join_prune_cols(mv, fcols, dcols) == want, q

    @pytest.mark.parametrize(
        "qname,q",
        [
            (
                "sums",
                "SELECT d.dname AS g, sum(f.x) AS s, count(*) AS n "
                "FROM f JOIN d ON f.dk = d.dk WHERE f.x > 2 GROUP BY d.dname",
            ),
            (
                "extrema",
                "SELECT f.dk AS k, min(f.x) AS lo, max(f.x) AS hi, "
                "count(*) AS n FROM f JOIN d ON f.dk = d.dk GROUP BY f.dk",
            ),
            (
                "left",
                "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd, "
                "sum(f.x) AS s FROM f LEFT JOIN d ON f.dk = d.dk GROUP BY f.dk",
            ),
            (
                "right",
                "SELECT d.dname AS g, count(*) AS n, count(f.x) AS nf, "
                "sum(f.x) AS s FROM f RIGHT JOIN d ON f.dk = d.dk GROUP BY d.dname",
            ),
            (
                "full",
                "SELECT coalesce(f.dk, d.dk) AS k, count(*) AS n, "
                "count(f.x) AS nf, count(d.dname) AS nd "
                "FROM f FULL OUTER JOIN d ON f.dk = d.dk "
                "GROUP BY coalesce(f.dk, d.dk)",
            ),
        ],
    )
    def test_randomized_concurrent_fact_and_dim_mutations(
        self, spark, tmp_path, qname, q
    ):
        """Higher-order differential: BOTH sides mutate between refreshes
        (random interleavings of fact ins/upd/del with dim ins/upd/del),
        every refresh must report `incremental` and equal a recompute —
        for the sum/count shape AND the extrema-repair shape."""
        import random

        rng = random.Random(hash(qname) & 0xFFFF | 20260817)
        eng, fact, dim = self._mk(spark, tmp_path, f"rc-{qname}")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id, next_dk = 60, 6
        for round_ in range(5):
            for _ in range(rng.randint(1, 4)):
                op = rng.choice(
                    ["ins", "upd", "del", "dim_ins", "dim_upd", "dim_del"]
                )
                if op == "ins":
                    vals = ", ".join(
                        f"({next_id + k}, {rng.randint(0, next_dk)}, "
                        f"{float(rng.randint(-10, 40))})"
                        for k in range(rng.randint(1, 3))
                    )
                    next_id += 3
                    eng.execute(f"INSERT INTO f (id, dk, x) VALUES {vals}")
                elif op == "upd":
                    eng.execute(
                        f"UPDATE f SET x = {float(rng.randint(-10, 40))} "
                        f"WHERE id % {rng.randint(2, 7)} = 0"
                    )
                elif op == "del":
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 11)} = 1")
                elif op == "dim_ins":
                    eng.execute(
                        f"INSERT INTO d (dk, dname) VALUES ({next_dk}, 'n{next_dk}')"
                    )
                    next_dk += 1
                elif op == "dim_upd":
                    eng.execute(
                        f"UPDATE d SET dname = 'r{round_}-{rng.randint(0, 99)}' "
                        f"WHERE dk = {rng.randint(0, next_dk)}"
                    )
                else:
                    eng.execute(f"DELETE FROM d WHERE dk = {rng.randint(0, next_dk)}")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (qname, round_)
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, q)
            assert len(got) == len(want), (qname, round_, got, want)
            for gr, wr in zip(got, want):
                for gv, wv in zip(gr, wr):
                    if isinstance(gv, float):
                        assert abs(gv - wv) < 1e-6, (qname, round_, gr, wr)
                    else:
                        assert gv == wv, (qname, round_, gr, wr)
            # the dim checkpoint tracked every dim commit
            assert eng.mat_views["mv"].dim_version == max(dim.versions())


class TestCompoundOnJoinMatViews:
    """Compound equality ONs (f.a = d.a AND f.b = d.b) maintain under
    dim deltas since r13: the null-flip / match-count terms key on the
    full join-key TUPLE (positionally-aliased structs, so fact- and
    dim-side tuples compare despite different column names), and the
    F_old prune becomes a broadcast semi-join on the delta's distinct
    tuples. Row-local SINGLE-SIDE residual conjuncts (f.x > 5) also
    maintain since r13 — match counting runs over residual-filtered
    snapshots; two-sided non-equi conjuncts (f.x > d.a) still force
    full recompute under dim deltas."""

    def _mk(self, spark, tmp_path, name):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, f"mvco-{name}")
        fact = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 4, i % 3, float(i)) for i in range(60)],
                "id long, a int, b int, x double",
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / f"{name}_d"), key="did")
        dim.ensure(
            spark.createDataFrame(
                [(10 * a + b, a, b, f"n{a}{b}") for a in range(3) for b in range(3)],
                "did long, a int, b int, dname string",
            )
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        return eng, fact, dim

    Q_INNER = (
        "SELECT d.dname AS g, count(*) AS n, sum(f.x) AS s "
        "FROM f JOIN d ON f.a = d.a AND f.b = d.b GROUP BY d.dname"
    )
    Q_LEFT = (
        "SELECT f.a AS k, count(*) AS n, count(d.dname) AS nd, sum(f.x) AS s "
        "FROM f LEFT JOIN d ON f.a = d.a AND f.b = d.b GROUP BY f.a"
    )
    Q_FULL = (
        "SELECT f.a AS k, count(*) AS n, count(d.dname) AS nd "
        "FROM f FULL OUTER JOIN d ON f.a = d.a AND f.b = d.b GROUP BY f.a"
    )

    def _churn(self, eng, rng_seed=0):
        # dim deletes/inserts/updates that flip tuple match counts, plus
        # fact deltas in the same refresh window
        eng.execute("DELETE FROM d WHERE a = 1 AND b = 2")  # tuple loses all matches
        eng.execute("INSERT INTO d (did, a, b, dname) VALUES (33, 3, 0, 'new30')")
        eng.execute("UPDATE d SET dname = 'renamed' WHERE a = 0 AND b = 0")
        eng.execute("INSERT INTO f (id, a, b, x) VALUES (100, 3, 0, 9.0), (101, 1, 2, 4.0)")
        eng.execute("DELETE FROM f WHERE id % 11 = 3")

    @pytest.mark.parametrize("q", [Q_INNER, Q_LEFT, Q_FULL])
    def test_compound_on_dim_churn_maintains(self, spark, tmp_path, q):
        eng, fact, dim = self._mk(spark, tmp_path, f"c{abs(hash(q)) % 9999}")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        self._churn(eng)
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental", q
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), q
        # second window: dim-only churn (pure flip terms)
        eng.execute("DELETE FROM d WHERE a = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental", q
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), q

    def test_compound_on_with_null_key_rows(self, spark, tmp_path):
        # a fact row with a NULL key part never matches (SQL equality) —
        # the tuple machinery must not count or flip it
        eng, fact, dim = self._mk(spark, tmp_path, "nul")
        eng.execute("INSERT INTO f (id, a, b, x) VALUES (200, NULL, 1, 7.0), (201, 2, NULL, 8.0)")
        q = self.Q_LEFT
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        self._churn(eng)
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_one_sided_conjunct_maintains(self, spark, tmp_path):
        # f.x > 5 is a fact-local residual: rows failing it never match,
        # so the null-flip terms count over the residual-filtered fact
        eng, fact, dim = self._mk(spark, tmp_path, "osc")
        q = (
            "SELECT f.a AS k, count(*) AS n, count(d.dname) AS nd "
            "FROM f LEFT JOIN d ON f.a = d.a AND f.x > 5 GROUP BY f.a"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute("DELETE FROM d WHERE a = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_two_sided_nonequi_conjunct_maintains(self, spark, tmp_path):
        # f.x > d.a mixes sides in one conjunct beside the compound
        # equality: maintains under ΔD since r14 via the T4' per-row
        # recount (the equality pairs still drive the affected-key prune)
        eng, fact, dim = self._mk(spark, tmp_path, "nec")
        q = (
            "SELECT f.a AS k, count(*) AS n "
            "FROM f LEFT JOIN d ON f.a = d.a AND f.x > d.a GROUP BY f.a"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute("DELETE FROM d WHERE a = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_compound_on_randomized_parity(self, spark, tmp_path):
        import random as _r

        rng = _r.Random(20260831)
        eng, fact, dim = self._mk(spark, tmp_path, "rand")
        q = self.Q_LEFT
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        next_id, next_did = 300, 50
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "del", "dins", "ddel", "dupd"])
                if op == "ins":
                    eng.execute(
                        f"INSERT INTO f (id, a, b, x) VALUES "
                        f"({next_id}, {rng.randint(0, 4)}, {rng.randint(0, 3)}, {float(rng.randint(0, 9))})"
                    )
                    next_id += 1
                elif op == "del":
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 9)} = 1")
                elif op == "dins":
                    eng.execute(
                        f"INSERT INTO d (did, a, b, dname) VALUES "
                        f"({next_did}, {rng.randint(0, 4)}, {rng.randint(0, 3)}, 'r{next_did}')"
                    )
                    next_did += 1
                elif op == "ddel":
                    eng.execute(f"DELETE FROM d WHERE did % {rng.randint(3, 7)} = 1")
                else:
                    eng.execute(
                        f"UPDATE d SET dname = 'u{rng.randint(0, 99)}' "
                        f"WHERE a = {rng.randint(0, 4)}"
                    )
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), round_


class TestMedianMatViews:
    """Sort-based aggregates (median) maintain through the SAME two-level
    substate as DISTINCT aggs — the (keys, value) → signed-occurrence
    multiset IS the sorted input, folding in O(|delta|); exposure runs an
    exact weighted percentile with Spark/DuckDB linear interpolation
    (index (N−1)/2 over the sorted occurrences). State is O(distinct
    values per group) — the inherent cost of an exact holistic agg."""

    def test_median_insert_update_delete_parity(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "md1",
            [(i, "g" + str(i % 3), float(i % 7) if i % 5 else None) for i in range(40)],
        )
        q = "SELECT g, median(x) AS md, count(*) AS n FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 'g1', 3.5), (101, 'g9', 2.0), (102, 'g0', NULL)")
        eng.execute("UPDATE t SET x = 6.0 WHERE id % 4 = 2")
        eng.execute("DELETE FROM t WHERE id % 9 = 3")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_median_even_odd_interpolation(self, spark, tmp_path):
        # exact hand-computable: {1,2,3,4} → 2.5; delete 4 → {1,2,3} → 2
        eng, _ = _mk(
            spark, tmp_path, "md2",
            [(i, "a", float(i)) for i in (1, 2, 3, 4)],
        )
        q = "SELECT g, median(x) AS md FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.sql("SELECT * FROM mv").collect()[0]["md"] == 2.5
        eng.execute("DELETE FROM t WHERE id = 4")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert eng.sql("SELECT * FROM mv").collect()[0]["md"] == 2.0
        # duplicates weight the multiset: add two more 1s → {1,1,1,2,3} → 1
        eng.execute("INSERT INTO t (id, g, x) VALUES (10, 'a', 1.0), (11, 'a', 1.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert eng.sql("SELECT * FROM mv").collect()[0]["md"] == 1.0

    def test_median_with_filter_join_and_having(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng, _ = _mk(
            spark, tmp_path, "md3",
            [(i, "g" + str(i % 3), float(i % 11)) for i in range(50)],
        )
        q = (
            "SELECT g, median(x) FILTER (WHERE id % 2 = 0) AS mf, sum(x) AS s "
            "FROM t GROUP BY g HAVING median(x) > 1"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x) VALUES (200, 'g0', 0.5), (201, 'g1', 9.0)")
        eng.execute("DELETE FROM t WHERE id % 7 = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_median_on_join_view_with_dim_churn(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "mv-mdj")
        fact = ParquetMergeSink(spark, str(tmp_path / "mdj_f"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 4, float(i % 9)) for i in range(60)], "id long, dk int, x double"
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / "mdj_d"), key="dk")
        dim.ensure(
            spark.createDataFrame([(k, f"n{k}") for k in range(4)], "dk int, dname string")
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        q = (
            "SELECT d.dname AS g, median(f.x) AS md, count(*) AS n "
            "FROM f JOIN d ON f.dk = d.dk GROUP BY d.dname"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("UPDATE d SET dname = 'renamed' WHERE dk = 1")
        eng.execute("INSERT INTO f (id, dk, x) VALUES (300, 2, 4.5)")
        eng.execute("DELETE FROM f WHERE id % 8 = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_median_distinct_maintains(self):
        # eligible since r14 — the substate exposure counts each
        # distinct value ONCE (differentials in tests/test_matview_r14.py)
        from qlbridge_spark.matview import _parse_agg
        from qlbridge_spark.rel import parse_sql

        sel = parse_sql("SELECT median(DISTINCT x) AS m FROM t")
        assert _parse_agg(sel.columns[0].expr)[0] == "median_distinct"

    def test_median_randomized_parity(self, spark, tmp_path):
        rng = random.Random(20260901)
        eng, _ = _mk(
            spark, tmp_path, "mdr",
            [(i, "g" + str(i % 4), float(i % 13)) for i in range(60)],
        )
        q = "SELECT g, median(x) AS md, count(x) AS cx FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        next_id = 300
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    x = rng.choice([str(float(rng.randint(0, 20))), "NULL"])
                    eng.execute(
                        f"INSERT INTO t (id, g, x) VALUES ({next_id}, 'g{rng.randint(0, 5)}', {x})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {float(rng.randint(0, 20))} "
                        f"WHERE id % {rng.randint(2, 6)} = 0"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(4, 9)} = 1")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), round_
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), round_


class TestPercentileContMatViews:
    """percentile_cont(x, p) with a LITERAL fraction rides the same
    substate multiset as median (≡ percentile_cont(x, 0.5)); the
    exposure interpolates at index (N−1)·p. A non-literal p is outside
    the vocabulary."""

    def test_quartiles_parity_under_mutations(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "pc1",
            [(i, "g" + str(i % 3), float(i % 11) if i % 6 else None) for i in range(50)],
        )
        q = (
            "SELECT g, percentile_cont(x, 0.25) AS p25, "
            "percentile_cont(x, 0.75) AS p75, median(x) AS md FROM t GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 'g0', 7.5), (101, 'g4', 1.0)")
        eng.execute("UPDATE t SET x = 9.0 WHERE id % 4 = 1")
        eng.execute("DELETE FROM t WHERE id % 8 = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_exact_interpolation(self, spark, tmp_path):
        # {10, 20, 30, 40}: p25 target (4−1)·0.25 = 0.75 → 10 + 0.75·10
        eng, _ = _mk(spark, tmp_path, "pc2", [(i, "a", float(10 * i)) for i in (1, 2, 3, 4)])
        q = "SELECT g, percentile_cont(x, 0.25) AS p25, percentile_cont(x, 1.0) AS p100 FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        r = eng.sql("SELECT * FROM mv").collect()[0]
        assert r["p25"] == 17.5 and r["p100"] == 40.0
        eng.execute("DELETE FROM t WHERE id = 4")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        r = eng.sql("SELECT * FROM mv").collect()[0]
        # {10,20,30}: target 0.5 → 15.0
        assert r["p25"] == 15.0 and r["p100"] == 30.0

    def test_distinct_fractions_are_distinct_aggs(self, spark, tmp_path):
        # HAVING percentile_cont(x, 0.9) must NOT dedup against the
        # exposed percentile_cont(x, 0.25) — p is part of the identity
        eng, _ = _mk(
            spark, tmp_path, "pc3",
            [(i, "g" + str(i % 3), float(i % 9)) for i in range(40)],
        )
        q = (
            "SELECT g, percentile_cont(x, 0.25) AS p25 FROM t GROUP BY g "
            "HAVING percentile_cont(x, 0.9) > 2"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x) VALUES (200, 'g1', 8.0)")
        eng.execute("DELETE FROM t WHERE id % 5 = 3")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_non_literal_fraction_stays_full(self, spark, tmp_path):
        from qlbridge_spark.matview import _parse_agg
        from qlbridge_spark.rel import parse_sql

        sel = parse_sql("SELECT percentile_cont(x, y) AS p FROM t")
        assert _parse_agg(sel.columns[0].expr) is None
        sel2 = parse_sql("SELECT percentile_cont(x, 1.5) AS p FROM t")
        assert _parse_agg(sel2.columns[0].expr) is None


class TestModeMatViews:
    """mode() rides the same multiset substate as median/DISTINCT: the
    exposed value is the argmax of the signed occurrence counts, ties
    broken to the SMALLEST value — exactly the engine's mode(), which
    maps to Spark's deterministic mode."""

    def test_mode_insert_update_delete_parity(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "mo1",
            [(i, "g" + str(i % 3), float(i % 5) if i % 7 else None) for i in range(40)],
        )
        q = "SELECT g, mode(x) AS m, count(*) AS n FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 'g1', 2.0), (101, 'g9', 1.0), (102, 'g0', NULL)")
        eng.execute("UPDATE t SET x = 4.0 WHERE id % 4 = 2")
        eng.execute("DELETE FROM t WHERE id % 9 = 3")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_mode_tie_breaks_to_smallest_and_tracks_deletes(self, spark, tmp_path):
        # {3,3,1,1,2}: tie 3 vs 1 → 1 (deterministic smallest); delete
        # one 1 → 3 wins outright; delete both 3s → {1,2} tie → 1
        eng, _ = _mk(
            spark, tmp_path, "mo2",
            [(1, "a", 3.0), (2, "a", 3.0), (3, "a", 1.0), (4, "a", 1.0), (5, "a", 2.0)],
        )
        q = "SELECT g, mode(x) AS m FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.sql("SELECT * FROM mv").collect()[0]["m"] == 1.0
        eng.execute("DELETE FROM t WHERE id = 3")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert eng.sql("SELECT * FROM mv").collect()[0]["m"] == 3.0
        eng.execute("DELETE FROM t WHERE id IN (1, 2)")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert eng.sql("SELECT * FROM mv").collect()[0]["m"] == 1.0
        # parity with the engine's own mode() throughout
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_mode_with_filter_having_and_global(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "mo3",
            [(i, "g" + str(i % 3), float(i % 4)) for i in range(30)],
        )
        q = (
            "SELECT g, mode(x) FILTER (WHERE id % 2 = 0) AS mf, sum(x) AS s "
            "FROM t GROUP BY g HAVING mode(x) >= 0"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x) VALUES (200, 'g0', 0.5), (201, 'g1', 3.0)")
        eng.execute("DELETE FROM t WHERE id % 7 = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # global aggregate (no GROUP BY): one row survives an emptying base
        qg = "SELECT mode(x) AS m, count(*) AS n FROM t"
        eng.execute(f"CREATE MATERIALIZED VIEW mvg AS {qg}")
        eng.execute("DELETE FROM t WHERE TRUE")
        eng.sql("REFRESH MATERIALIZED VIEW mvg").collect()
        assert _rows(eng, "SELECT * FROM mvg") == _rows(eng, qg) == [(None, 0)]


class TestSetExtremaMatViews:
    """Extrema shapes with no single-side repair probe (FULL joins,
    self-joins with mixed-side group keys) maintain through the multiset
    substate instead: min/max over a signed (keys, value) multiset fold
    under deletes with NO repair — the exposed value is the multiset's
    edge. State is O(distinct values per group); probe-able shapes keep
    the O(1) scalar state + repair."""

    def _mk_join(self, spark, tmp_path, name):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, f"mvse-{name}")
        fact = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 5, float(i % 13)) for i in range(60)],
                "id long, dk int, x double",
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / f"{name}_d"), key="dk")
        dim.ensure(
            spark.createDataFrame(
                [(k, f"n{k}", float(k * 10)) for k in range(4)],
                "dk int, dname string, w double",
            )
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        return eng, fact, dim

    FULL_Q = (
        "SELECT d.dname AS g, min(f.x) AS mn, max(f.x) AS mx, count(*) AS n "
        "FROM f FULL JOIN d ON f.dk = d.dk GROUP BY d.dname"
    )

    def test_full_join_extrema_maintain_via_multiset(self, spark, tmp_path):
        eng, fact, dim = self._mk_join(spark, tmp_path, "fu")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.FULL_Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        assert {a.kind for a in mv.aggs} == {"min_set", "max_set", "count_star"}
        assert not mv.has_extrema  # no scalar extremum state → no repair
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.FULL_Q)
        # delete the reigning max of a group, flip null extensions on
        # both sides, churn the dim — all in one window
        eng.execute("DELETE FROM f WHERE x = 12.0")
        eng.execute("INSERT INTO f (id, dk, x) VALUES (300, 9, 50.0), (301, 2, -1.0)")
        eng.execute("UPDATE f SET x = 0.25 WHERE id = 7")
        eng.execute("INSERT INTO d (dk, dname, w) VALUES (9, 'n9', 90.0)")
        eng.execute("DELETE FROM d WHERE dk = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.FULL_Q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(self.FULL_Q).schema

    def test_full_join_extrema_randomized_differential(self, spark, tmp_path):
        rng = random.Random(53)
        eng, fact, dim = self._mk_join(spark, tmp_path, "fz")
        q = (
            "SELECT d.dname AS g, max(f.x) AS mx, min(d.w) AS mw, count(*) AS n "
            "FROM f FULL JOIN d ON f.dk = d.dk GROUP BY d.dname"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id = 1000
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["fi", "fu", "fd", "di", "du", "dd"])
                if op == "fi":
                    eng.execute(
                        f"INSERT INTO f (id, dk, x) VALUES ({next_id}, {rng.randint(0, 6)}, {rng.uniform(-5, 20):.2f})"
                    )
                    next_id += 1
                elif op == "fu":
                    eng.execute(
                        f"UPDATE f SET x = {rng.uniform(-5, 20):.2f} WHERE id % {rng.randint(3, 9)} = 1"
                    )
                elif op == "fd":
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(4, 11)} = 2")
                elif op == "di":
                    k = rng.randint(5, 9)
                    eng.execute(
                        f"INSERT INTO d (dk, dname, w) VALUES ({k}, 'n{k}', {k * 10.0})"
                    )
                elif op == "du":
                    eng.execute(
                        f"UPDATE d SET dname = 'r{round_}' WHERE dk = {rng.randint(0, 5)}"
                    )
                else:
                    eng.execute(f"DELETE FROM d WHERE dk = {rng.randint(0, 9)}")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (round_, rep)
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), round_

    def test_mixed_side_keys_self_join_uses_multiset(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "sjm",
            [(i, "g" + str(i % 3), float(i % 7)) for i in range(30)],
        )
        q = (
            "SELECT a.g AS ga, b.g AS gb, min(a.x) AS mn, count(*) AS n "
            "FROM t a JOIN t b ON a.id = b.id GROUP BY a.g, b.g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        assert any(a.kind == "min_set" for a in mv.aggs)
        eng.execute("DELETE FROM t WHERE x = 6.0")  # reigning extremum out
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 'g1', -3.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_set_extrema_durable_state(self, spark, tmp_path):
        eng, fact, dim = self._mk_join(spark, tmp_path, "du")
        state = tmp_path / "se_state"
        eng.execute(
            f'CREATE MATERIALIZED VIEW mv AS {self.FULL_Q} WITH {{"path": "{state}"}}'
        )
        mv = eng.mat_views["mv"]
        assert mv.sub_sinks  # multiset substates persist as sibling sinks
        eng.execute("DELETE FROM f WHERE x = 12.0")
        eng.execute("INSERT INTO f (id, dk, x) VALUES (400, 1, 99.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.FULL_Q)


class TestSelfJoinExtrema:
    """INNER self-join extrema maintain via the single-side repair probe
    when every group key is alias-qualified to ONE occurrence: the probe
    prunes that occurrence by the stale group keys and re-runs the join
    against the other occurrence's full current snapshot."""

    BASE_SJ = [(i, "g" + str(i % 3), float(i % 11), i % 4) for i in range(40)]

    def _mk(self, spark, tmp_path, name):
        return _mk(
            spark, tmp_path, name, self.BASE_SJ,
            schema="id long, g string, x double, k long",
        )

    def test_fact_side_keys_probe_left_occurrence(self, spark, tmp_path):
        eng, _ = self._mk(spark, tmp_path, "sjf")
        q = (
            "SELECT a.g AS g, min(b.x) AS mn, max(a.x) AS mx, count(*) AS n "
            "FROM t a JOIN t b ON a.k = b.k GROUP BY a.g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.extrema_side == "fact"
        assert {a.kind for a in mv.aggs} == {"min", "max", "count_star"}
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("DELETE FROM t WHERE x = 10.0")  # reigning max out
        eng.execute("INSERT INTO t (id, g, x, k) VALUES (100, 'g0', -2.0, 1)")
        eng.execute("UPDATE t SET x = 55.0 WHERE id = 6")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_dim_side_keys_probe_right_occurrence(self, spark, tmp_path):
        eng, _ = self._mk(spark, tmp_path, "sjd")
        q = (
            "SELECT b.g AS g, min(a.x) AS mn, count(*) AS n "
            "FROM t a JOIN t b ON a.k = b.k GROUP BY b.g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and mv.extrema_side == "dim"
        eng.execute("DELETE FROM t WHERE x = 0.0")
        eng.execute("INSERT INTO t (id, g, x, k) VALUES (200, 'g2', 33.0, 2)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_mixed_expr_key_falls_to_multiset(self, spark, tmp_path):
        # a group-key EXPRESSION referencing both occurrences has no
        # probe side — the extrema ride the multiset
        eng, _ = self._mk(spark, tmp_path, "sju")
        q = (
            "SELECT concat(a.g, b.g) AS gg, min(a.x) AS mn, count(*) AS n "
            "FROM t a JOIN t b ON a.id = b.id GROUP BY concat(a.g, b.g)"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        assert any(a.kind == "min_set" for a in mv.aggs)
        eng.execute("DELETE FROM t WHERE id % 5 = 0")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_randomized_self_join_extrema_differential(self, spark, tmp_path):
        rng = random.Random(17)
        eng, _ = self._mk(spark, tmp_path, "sjz")
        q = (
            "SELECT a.g AS g, max(b.x) AS mx, min(a.x) AS mn, sum(a.x) AS s, count(*) AS n "
            "FROM t a JOIN t b ON a.k = b.k WHERE a.id % 2 = 0 GROUP BY a.g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id = 500
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    eng.execute(
                        f"INSERT INTO t (id, g, x, k) VALUES ({next_id}, 'g{rng.randint(0, 4)}', {rng.uniform(-9, 30):.2f}, {rng.randint(0, 5)})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {rng.uniform(-9, 30):.2f} WHERE id % {rng.randint(3, 8)} = 1"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(4, 10)} = 3")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (round_, rep)
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), round_


class TestResidualOnJoinMatViews:
    """Row-local SINGLE-SIDE residual conjuncts in the join ON
    (f.k = d.k AND d.w > 1) maintain under dim deltas since r13: a row
    failing its own side's residual can never match, so the
    match-count/flip terms count over residual-filtered snapshots and
    residual-failing rows are unconditionally unmatched. Exercises the
    residual-boundary crossings (an UPDATE moving a row across the
    residual) that make this the hard case."""

    def _mk(self, spark, tmp_path, name):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, f"mvro-{name}")
        fact = ParquetMergeSink(spark, str(tmp_path / f"{name}_f"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 5, float(i % 9)) for i in range(50)],
                "id long, dk int, x double",
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / f"{name}_d"), key="dk")
        dim.ensure(
            spark.createDataFrame(
                [(k, f"n{k}", float(k)) for k in range(5)],
                "dk int, dname string, w double",
            )
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        return eng, fact, dim

    QS = [
        # dim-local residual on LEFT: fact rows flip when the matching
        # dim rows cross d.w > 1 (not just when they appear/vanish)
        "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd, sum(f.x) AS s "
        "FROM f LEFT JOIN d ON f.dk = d.dk AND d.w > 1 GROUP BY f.dk",
        # fact-local residual on RIGHT: dim rows flip when their facts
        # cross f.x > 2
        "SELECT d.dname AS g, count(*) AS n, count(f.id) AS nf, sum(f.x) AS s "
        "FROM f RIGHT JOIN d ON f.dk = d.dk AND f.x > 2 GROUP BY d.dname",
        # residuals on BOTH sides of a FULL join + substate agg
        "SELECT d.dname AS g, count(*) AS n, count(f.id) AS nf, "
        "count(DISTINCT f.x) AS dx "
        "FROM f FULL JOIN d ON f.dk = d.dk AND f.x > 2 AND d.w > 0 "
        "GROUP BY d.dname",
    ]

    @pytest.mark.parametrize("qi", [0, 1, 2])
    def test_residual_on_boundary_crossings(self, spark, tmp_path, qi):
        eng, fact, dim = self._mk(spark, tmp_path, f"b{qi}")
        q = self.QS[qi]
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # crossings in BOTH directions on both sides + plain churn
        eng.execute("UPDATE f SET x = 0.5 WHERE id % 9 = 3")  # x>2 downward
        eng.execute("UPDATE f SET x = 7.0 WHERE id % 9 = 4")  # x>2 upward
        eng.execute("UPDATE d SET w = 0.0 WHERE dk = 2")  # w>1/w>0 downward
        eng.execute("UPDATE d SET w = 9.0 WHERE dk = 0")  # upward
        eng.execute("INSERT INTO f (id, dk, x) VALUES (200, 1, 1.0), (201, 9, 5.0)")
        eng.execute("INSERT INTO d (dk, dname, w) VALUES (9, 'n9', 0.5)")
        eng.execute("DELETE FROM d WHERE dk = 3")
        eng.execute("DELETE FROM f WHERE id % 13 = 5")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental", rep
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_residual_on_randomized_parity(self, spark, tmp_path):
        rng = random.Random(29)
        eng, fact, dim = self._mk(spark, tmp_path, "rz")
        q = (
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd, "
            "sum(f.x) AS s FROM f LEFT JOIN d "
            "ON f.dk = d.dk AND d.w > 1 AND f.x > 1 GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id = 500
        for round_ in range(5):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["fi", "fu", "fd", "di", "du", "dd"])
                if op == "fi":
                    eng.execute(
                        f"INSERT INTO f (id, dk, x) VALUES ({next_id}, {rng.randint(0, 7)}, {rng.uniform(0, 9):.2f})"
                    )
                    next_id += 1
                elif op == "fu":
                    eng.execute(
                        f"UPDATE f SET x = {rng.uniform(0, 9):.2f} WHERE id % {rng.randint(3, 8)} = 1"
                    )
                elif op == "fd":
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 11)} = 2")
                elif op == "di":
                    k = rng.randint(5, 8)
                    eng.execute(
                        f"INSERT INTO d (dk, dname, w) VALUES ({k}, 'n{k}', {rng.uniform(0, 3):.2f})"
                    )
                elif op == "du":
                    eng.execute(
                        f"UPDATE d SET w = {rng.uniform(0, 3):.2f} WHERE dk = {rng.randint(0, 6)}"
                    )
                else:
                    eng.execute(f"DELETE FROM d WHERE dk = {rng.randint(0, 8)}")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (round_, rep)
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q), round_


class TestScalarSubqueryMatViews:
    """Uncorrelated scalar subqueries in the WHERE maintain by
    FREEZE-AND-VERIFY: the values pin at CREATE (folded into the WHERE
    as literals), every refresh re-evaluates them (bounded single-row
    jobs), deltas fold incrementally while they hold, and a moved value
    forces one full rebuild under the new values. Correlated scalars and
    set contexts (IN/EXISTS/ANY/ALL) stay full-recompute MVs."""

    def _mk(self, spark, tmp_path, name):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, f"mvss-{name}")
        t = ParquetMergeSink(spark, str(tmp_path / f"{name}_t"), key="id")
        t.ensure(
            spark.createDataFrame(
                [(i, "g" + str(i % 3), float(i % 7)) for i in range(30)],
                "id long, g string, x double",
            )
        )
        ref = ParquetMergeSink(spark, str(tmp_path / f"{name}_r"), key="k")
        ref.ensure(spark.createDataFrame([(1, 3.0), (2, 8.0)], "k long, thr double"))
        eng.register_sink("t", t)
        eng.register_sink("ref", ref)
        return eng, t, ref

    Q = (
        "SELECT g, count(*) AS n, sum(x) AS s FROM t "
        "WHERE x > (SELECT min(thr) FROM ref) GROUP BY g"
    )

    def test_freeze_and_verify_lifecycle(self, spark, tmp_path):
        eng, t, ref = self._mk(spark, tmp_path, "fv")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and len(mv.scalar_subs) == 1
        assert [v for v, _ in mv.scalar_vals] == [3.0]
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        # base churn with the subquery value UNCHANGED → incremental
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 'g1', 9.0), (101, 'g0', 1.0)")
        eng.execute("DELETE FROM t WHERE id % 7 = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        # the value MOVES → one full rebuild under the new value
        eng.execute("UPDATE ref SET thr = 5.0 WHERE k = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert [v for v, _ in eng.mat_views["mv"].scalar_vals] == [5.0]
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)
        # further base churn folds under the NEW frozen value
        eng.execute("INSERT INTO t (id, g, x) VALUES (102, 'g2', 6.5)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q)

    def test_self_referential_subquery(self, spark, tmp_path):
        # the subquery reads the BASE itself: every base commit moves the
        # value (usually) → full rebuild, still row-correct; an
        # unchanged-value commit folds incrementally
        eng, t, ref = self._mk(spark, tmp_path, "sr")
        q = (
            "SELECT g, count(*) AS n FROM t "
            "WHERE x >= (SELECT max(x) FROM t) - 1 GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x) VALUES (200, 'g0', 50.0)")  # max moves
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("DELETE FROM t WHERE id = 5")  # max(x)=50 unchanged
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_composes_with_join_distinct_and_having(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng, t, ref = self._mk(spark, tmp_path, "cj")
        d = ParquetMergeSink(spark, str(tmp_path / "cj_d"), key="g")
        d.ensure(
            spark.createDataFrame(
                [("g0", "a"), ("g1", "b"), ("g2", "c")], "g string, dn string"
            )
        )
        eng.register_sink("d", d)
        q = (
            "SELECT d.dn AS dn, count(*) AS n, count(DISTINCT t.x) AS dx "
            "FROM t JOIN d ON t.g = d.g "
            "WHERE t.x > (SELECT min(thr) FROM ref) "
            "GROUP BY d.dn HAVING count(*) > 1"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x) VALUES (300, 'g1', 6.0)")
        eng.execute("UPDATE d SET dn = 'z' WHERE g = 'g0'")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("UPDATE ref SET thr = 0.5 WHERE k = 1")  # value moves
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    @pytest.mark.parametrize(
        "q",
        [
            # correlated scalar: evaluation raises at CREATE → full MV
            "SELECT g, count(*) AS n FROM t "
            "WHERE x > (SELECT avg(x) FROM t u WHERE u.g = t.g) GROUP BY g",
            # set contexts a literal substitution can't express and the
            # r14 semi-join delta algebra doesn't cover: NOT IN (ANSI
            # NULL semantics aren't per-key flips). Plain
            # `IN (SELECT ...)` maintains since r14 —
            # tests/test_matview_r14.py::TestInSubqueryMatViews pins it
            # in the ELIGIBLE direction; uncorrelated EXISTS rewrites to
            # a count guard since r16 (test_uncorrelated_exists_freezes
            # below + test_advice_r16.py::TestExistsRewrite).
            "SELECT g, count(*) AS n FROM t WHERE id NOT IN (SELECT k FROM ref) GROUP BY g",
        ],
    )
    def test_non_freezable_shapes_stay_full(self, spark, tmp_path, q):
        eng, t, ref = self._mk(spark, tmp_path, f"nf{abs(hash(q)) % 9999}")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("DELETE FROM t WHERE id = 4")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_uncorrelated_exists_freezes(self, spark, tmp_path):
        # uncorrelated EXISTS rewrites to an exact count(*) > 0 guard
        # (r16, COVERAGE.md §5 item 11) and rides the frozen-scalar
        # machinery: base churn folds; a ref commit that flips the
        # predicate forces one full rebuild under the new value
        eng, t, ref = self._mk(spark, tmp_path, "ue")
        q = (
            "SELECT g, count(*) AS n FROM t "
            "WHERE EXISTS (SELECT 1 FROM ref WHERE thr > 100) GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO t (id, g, x) VALUES (400, 'g1', 2.0)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] in ("incremental", "noop")
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("UPDATE ref SET thr = 500.0 WHERE k = 1")  # flips EXISTS
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_randomized_freeze_verify_parity(self, spark, tmp_path):
        rng = random.Random(41)
        eng, t, ref = self._mk(spark, tmp_path, "rz")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {self.Q}")
        next_id = 500
        for round_ in range(5):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del", "thr"])
                if op == "ins":
                    eng.execute(
                        f"INSERT INTO t (id, g, x) VALUES ({next_id}, 'g{rng.randint(0, 4)}', {rng.uniform(0, 9):.2f})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE t SET x = {rng.uniform(0, 9):.2f} WHERE id % {rng.randint(3, 8)} = 1"
                    )
                elif op == "del":
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(5, 11)} = 2")
                else:
                    eng.execute(f"UPDATE ref SET thr = {rng.uniform(0, 6):.2f} WHERE k = 1")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop", "full"), round_
            assert _rows(eng, "SELECT * FROM mv") == _rows(eng, self.Q), round_


class TestSubstateValueIsGroupKey:
    """The substate VALUE expression may literally be a group key
    (count(DISTINCT g) grouped by g; min/max riding the multiset with a
    key-side arg). Projecting the same expr under two aliases collides
    in the engine's aggregate — the substate select skips the duplicate
    and re-adds __mv_dv as a key copy (found by the r13 shape fuzzer)."""

    def test_count_distinct_of_key(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "vk1", BASE)
        q = "SELECT g, count(DISTINCT g) AS dg, count(*) AS n FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO t (id, g, x) VALUES (10, 'z', 1.0)")
        eng.execute("DELETE FROM t WHERE g = 'b'")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_set_extremum_of_key_on_full_join(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng, _ = _mk(spark, tmp_path, "vk2", BASE)
        d = ParquetMergeSink(spark, str(tmp_path / "vk2_d"), key="g")
        d.ensure(spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, w double"))
        eng.register_sink("d", d)
        q = (
            "SELECT d.g AS g, min(d.g) AS mg, count(*) AS n "
            "FROM t FULL JOIN d ON t.g = d.g GROUP BY d.g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and any(a.kind == "min_set" for a in mv.aggs)
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute("INSERT INTO d (g, w) VALUES ('c', 3.0)")
        eng.execute("DELETE FROM t WHERE id IN (1, 2)")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)


class TestCovarCorrMatViews:
    """The two-argument moment family (corr / covar_samp / covar_pop)
    maintains algebraically over CENTERED co-moments — the bivariate
    generalization of the variance state: per group the pairwise count,
    Σw(x−zx), Σw(y−zy), Σw(x−zx)(y−zy) (and per-side second moments for
    corr), shifts re-centered to the common minima at merge. A NULL in
    either argument drops the pair from every sum (ANSI)."""

    ROWS = [
        (i, "g" + str(i % 3), float(i % 7) if i % 5 else None,
         float((i * 3) % 11) if i % 4 else None)
        for i in range(40)
    ]

    def _mk(self, spark, tmp_path, name):
        return _mk(
            spark, tmp_path, name, self.ROWS,
            schema="id long, g string, x double, y double",
        )

    def _approx(self, a, b, rtol=1e-9):
        assert len(a) == len(b), (a, b)
        for ra, rb in zip(a, b):
            for va, vb in zip(ra, rb):
                if isinstance(va, float) and isinstance(vb, float):
                    assert abs(va - vb) <= rtol * max(1.0, abs(vb)), (a, b)
                else:
                    assert va == vb, (a, b)

    def test_insert_update_delete_parity(self, spark, tmp_path):
        eng, _ = self._mk(spark, tmp_path, "cv1")
        q = (
            "SELECT g, corr(x, y) AS cr, covar_samp(x, y) AS cs, "
            "covar_pop(x, y) AS cp, count(*) AS n FROM t GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental and {a.kind for a in mv.aggs} == {
            "corr", "covar_samp", "covar_pop", "count_star"
        }
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))
        # pairwise-null churn: NULL in one side drops the pair
        eng.execute(
            "INSERT INTO t (id, g, x, y) VALUES (100, 'g1', 3.0, 9.0), "
            "(101, 'g0', NULL, 2.0), (102, 'g9', 1.0, 1.0)"
        )
        eng.execute("UPDATE t SET y = 5.5 WHERE id % 4 = 1")
        eng.execute("DELETE FROM t WHERE id % 9 = 3")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_zero_variance_and_single_pair_expose_null(self, spark, tmp_path):
        eng, _ = self._mk(spark, tmp_path, "cv2")
        q = "SELECT g, corr(x, y) AS cr, covar_samp(x, y) AS cs FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        # zz: constant x → corr NULL (engine convention); single pair →
        # covar_samp NULL too
        eng.execute(
            "INSERT INTO t (id, g, x, y) VALUES (200, 'zz', 4.0, 1.0), "
            "(201, 'zz', 4.0, 2.0), (202, 'one', 1.0, 2.0)"
        )
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        got = {r[0]: (r[1], r[2]) for r in eng.sql("SELECT * FROM mv").collect()}
        want = {r[0]: (r[1], r[2]) for r in eng.sql(q).collect()}
        assert got["zz"][0] is None and want["zz"][0] is None
        assert got["one"] == want["one"] == (None, None)

    def test_epoch_magnitude_centering_beats_single_pass(self, spark, tmp_path):
        # at epoch-millis magnitude the exposure's CENTERED state is
        # exact-by-construction; the engine's single-pass recompute
        # carries ~1e-4 relative accumulation error there, so the
        # differential is approximate BY THE RECOMPUTE's error, and the
        # exposure must match the exact hand value tightly
        import math

        eng, _ = self._mk(spark, tmp_path, "cv3")
        T0 = 1.755e12
        q = f"SELECT g, corr(x + {T0}, y + {T0}) AS cr FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute("INSERT INTO t (id, g, x, y) VALUES (300, 'g0', 6.0, 10.0)")
        eng.execute("DELETE FROM t WHERE id = 7")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        # exact hand value per group over the pairwise-complete rows
        # (x+T0 quantizes to doubles first — replicate that exactly)
        cur = [
            (r["g"], float(r["x"] + T0), float(r["y"] + T0))
            for r in eng.sql("SELECT * FROM t").collect()
            if r["x"] is not None and r["y"] is not None
        ]
        import collections

        groups = collections.defaultdict(list)
        for g, x, y in cur:
            groups[g].append((x, y))
        exposed = {r["g"]: r["cr"] for r in eng.sql("SELECT * FROM mv").collect()}
        for g, ps in groups.items():
            n = len(ps)
            if n < 2:
                continue
            mx = math.fsum(x for x, _ in ps) / n
            my = math.fsum(y for _, y in ps) / n
            num = math.fsum((x - mx) * (y - my) for x, y in ps)
            den = math.sqrt(
                math.fsum((x - mx) ** 2 for x, _ in ps)
                * math.fsum((y - my) ** 2 for _, y in ps)
            )
            if den == 0:
                continue
            # 1e-6: the merge's re-centering is a different summation
            # order (~1e-9 drift observed) — still 3+ orders tighter
            # than the single-pass recompute's ~1e-4 error
            assert abs(exposed[g] - num / den) < 1e-6, (g, exposed[g], num / den)
        # and the engine recompute agrees within ITS accumulation error
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q), rtol=5e-3)

    def test_composes_with_join_filter_and_having(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng, _ = self._mk(spark, tmp_path, "cv4")
        d = ParquetMergeSink(spark, str(tmp_path / "cv4_d"), key="g")
        d.ensure(
            spark.createDataFrame(
                [("g0", "a"), ("g1", "b"), ("g2", "c")], "g string, dn string"
            )
        )
        eng.register_sink("d", d)
        q = (
            "SELECT d.dn AS dn, covar_pop(t.x, t.y) FILTER (WHERE t.id % 2 = 0) AS cf, "
            "count(*) AS n FROM t JOIN d ON t.g = d.g "
            "GROUP BY d.dn HAVING corr(t.x, t.y) IS NOT NULL"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x, y) VALUES (400, 'g1', 6.0, 2.0)")
        eng.execute("UPDATE d SET dn = 'z' WHERE g = 'g0'")
        eng.execute("DELETE FROM t WHERE id % 11 = 4")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))

    def test_global_and_durable(self, spark, tmp_path):
        eng, _ = self._mk(spark, tmp_path, "cv5")
        state = tmp_path / "cv5_state"
        q = "SELECT corr(x, y) AS cr, covar_samp(x, y) AS cs, count(*) AS n FROM t"
        eng.execute(f'CREATE MATERIALIZED VIEW mv AS {q} WITH {{"path": "{state}"}}')
        assert eng.mat_views["mv"].incremental
        eng.execute("INSERT INTO t (id, g, x, y) VALUES (500, 'g0', 2.0, 8.0)")
        eng.execute("DELETE FROM t WHERE id % 6 = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))
        # emptying the base keeps the global row (all NULL, n = 0)
        eng.execute("DELETE FROM t WHERE id >= 0")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q) == [(None, None, 0)]

    def test_randomized_covar_parity(self, spark, tmp_path):
        rng = random.Random(67)
        eng, _ = self._mk(spark, tmp_path, "cvz")
        q = (
            "SELECT g, corr(x, y) AS cr, covar_samp(x, y) AS cs, sum(x) AS s, "
            "count(*) AS n FROM t WHERE id % 2 = 0 GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id = 600
        for round_ in range(5):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "updx", "updy", "del"])
                if op == "ins":
                    x = rng.choice([f"{rng.uniform(0, 9):.2f}", "NULL"])
                    y = rng.choice([f"{rng.uniform(0, 9):.2f}", "NULL"])
                    eng.execute(
                        f"INSERT INTO t (id, g, x, y) VALUES ({next_id}, 'g{rng.randint(0, 4)}', {x}, {y})"
                    )
                    next_id += 1
                elif op == "updx":
                    eng.execute(
                        f"UPDATE t SET x = {rng.uniform(0, 9):.2f} WHERE id % {rng.randint(3, 8)} = 1"
                    )
                elif op == "updy":
                    eng.execute(
                        f"UPDATE t SET y = {rng.uniform(0, 9):.2f} WHERE id % {rng.randint(3, 8)} = 2"
                    )
                else:
                    eng.execute(f"DELETE FROM t WHERE id % {rng.randint(5, 11)} = 3")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (round_, rep)
            self._approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))


class TestVarianceDistinctMatViews:
    """variance-family(DISTINCT x) rides the substate: the distinct
    non-null values are the multiset's support, so exposure is the
    plain variance over the substate's VALUES (counts collapse to 1).
    The engine side computes it over collect_set with centered sums
    (Spark's Column API has no isDistinct flag)."""

    def test_insert_update_delete_parity(self, spark, tmp_path):
        eng, _ = _mk(
            spark, tmp_path, "vd1",
            [(i, "g" + str(i % 3), float(i % 6) if i % 5 else None) for i in range(30)],
        )
        q = (
            "SELECT g, variance(DISTINCT x) AS vd, stddev_pop(DISTINCT x) AS spd, "
            "var_pop(DISTINCT x) AS vpd, count(*) AS n FROM t GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        assert {a.kind for a in mv.aggs} == {
            "variance_distinct", "stddev_pop_distinct", "var_pop_distinct", "count_star"
        }

        def approx(a, b):
            assert len(a) == len(b), (a, b)
            for ra, rb in zip(a, b):
                for va, vb in zip(ra, rb):
                    if isinstance(va, float) and isinstance(vb, float):
                        assert abs(va - vb) <= 1e-9 * max(1.0, abs(vb)), (a, b)
                    else:
                        assert va == vb, (a, b)

        approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 'g1', 17.0), (101, 'g0', NULL)")
        eng.execute("UPDATE t SET x = 2.0 WHERE id % 4 = 1")
        eng.execute("DELETE FROM t WHERE id % 7 = 2")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        approx(_rows(eng, "SELECT * FROM mv"), _rows(eng, q))
        assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema

    def test_single_distinct_value_semantics(self, spark, tmp_path):
        # one distinct value → var_samp NULL (n−1 = 0), var_pop 0.0;
        # duplicates of it don't change the DISTINCT set
        eng, _ = _mk(
            spark, tmp_path, "vd2",
            [(1, "a", 4.0), (2, "a", 4.0), (3, "a", 4.0)],
        )
        q = "SELECT g, var_samp(DISTINCT x) AS vs, var_pop(DISTINCT x) AS vp FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q) == [("a", None, 0.0)]
        eng.execute("INSERT INTO t (id, g, x) VALUES (10, 'a', 6.0)")
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        r = eng.sql("SELECT * FROM mv").collect()[0]
        assert r["vs"] == 2.0 and r["vp"] == 1.0  # {4, 6}
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)


class TestOrderedAggMatViews:
    """array_agg / string_agg(x ORDER BY x) ride the multiset: the
    sorted support with per-value repeats IS the collected sequence,
    exposed through the SAME sort_array comparator the engine's
    ordered collect uses (identical NULL placement). ORDER BY a
    different key maintains since r14 via the PAIR substate
    (tests/test_matview_r14.py); multiple ORDER keys stay full."""

    BASE_OA = [
        (i, "g" + str(i % 3), float(i % 5) if i % 7 else None) for i in range(30)
    ]

    def test_ordered_collects_maintain(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "oa1", self.BASE_OA)
        qs = [
            "SELECT g, array_agg(x ORDER BY x) AS aa, count(*) AS n FROM t GROUP BY g",
            "SELECT g, string_agg(tostring(x), '|' ORDER BY tostring(x)) AS sa FROM t GROUP BY g",
            "SELECT g, array_agg(x ORDER BY x DESC) AS ad FROM t GROUP BY g",
        ]
        for i, q in enumerate(qs):
            eng.execute(f"CREATE MATERIALIZED VIEW mv{i} AS {q}")
            assert eng.mat_views[f"mv{i}"].incremental, q
            assert _rows(eng, f"SELECT * FROM mv{i}") == _rows(eng, q), q
        # churn incl. NULL values and duplicate values
        eng.execute(
            "INSERT INTO t (id, g, x) VALUES (100, 'g1', 2.0), (101, 'g0', NULL), (102, 'g9', 0.5)"
        )
        eng.execute("UPDATE t SET x = 4.0 WHERE id % 4 = 1")
        eng.execute("DELETE FROM t WHERE id % 8 = 2")
        reps = {r["view"]: r["mode"] for r in eng.sql("REFRESH ALL MATERIALIZED VIEWS").collect()}
        assert all(m == "incremental" for m in reps.values()), reps
        for i, q in enumerate(qs):
            assert _rows(eng, f"SELECT * FROM mv{i}") == _rows(eng, q), q
            assert eng.sql(f"SELECT * FROM mv{i}").schema == eng.sql(q).schema, q

    def test_duplicate_values_repeat_in_sequence(self, spark, tmp_path):
        # the multiset's counts materialize as repeats: {1,1,3} → [1,1,3]
        eng, _ = _mk(
            spark, tmp_path, "oa2", [(1, "a", 1.0), (2, "a", 1.0), (3, "a", 3.0)]
        )
        q = "SELECT g, string_agg(tostring(x), ',' ORDER BY tostring(x)) AS sa FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.sql("SELECT * FROM mv").collect()[0]["sa"] == "1.0,1.0,3.0"
        eng.execute("DELETE FROM t WHERE id = 1")  # one of the dups
        eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
        assert eng.sql("SELECT * FROM mv").collect()[0]["sa"] == "1.0,3.0"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    @pytest.mark.parametrize(
        "q",
        [
            # FILTER would desync the keys from the argument
            "SELECT g, array_agg(x ORDER BY x) FILTER (WHERE id > 3) AS aa FROM t GROUP BY g",
            # unordered collect: NONDETERMINISTIC order (engine contract)
            "SELECT g, array_agg(x) AS aa FROM t GROUP BY g",
        ],
    )
    def test_unmaintainable_collect_shapes_stay_full(self, spark, tmp_path, q):
        eng, _ = _mk(spark, tmp_path, f"oa3{abs(hash(q)) % 999}", self.BASE_OA)
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert not eng.mat_views["mv"].incremental
