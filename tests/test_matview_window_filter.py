"""Matview FILTER (WHERE …) aggregates + projection windows + QUALIFY.

FILTER folds into the state algebra (guarded argument: every agg in the
vocabulary ignores NULL inputs, so CASE WHEN p THEN x END computes the
filtered aggregate exactly under signed deltas). Projection window
functions and QUALIFY evaluate at EXPOSE time over the aggregated state
— ANSI order HAVING → windows → QUALIFY → ORDER/LIMIT — so the state
keeps every group and windows always see the current group set.

Also pins the ENGINE-side fix these shapes ride on: window functions in
the projection of a GROUP BY query evaluate after aggregation
(rank() OVER (ORDER BY sum(x)) ranks the groups; previously Spark's
"window inside aggregate" error)."""

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
    # variance columns drift in the last ulps vs Spark's central-moments
    # accumulation (documented re-aggregation drift); floats compare approx
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


def _mk(spark, tmp_path, name, n=40):
    eng = Engine(spark, f"mvwf-{name}")
    sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
    sink.ensure(
        spark.createDataFrame(
            [(i, i % 4, float(i) if i % 7 else None) for i in range(n)],
            "id long, g int, x double",
        )
    )
    eng.register_sink("t", sink)
    return eng


MUTS = [
    "INSERT INTO t (id, g, x) VALUES (100, 1, 99.0), (101, 5, 3.0), (102, 2, NULL)",
    "UPDATE t SET x = 0.5 WHERE id % 6 = 2",
    "DELETE FROM t WHERE id % 9 = 4",
]


def _differential(spark, tmp_path, name, q, modes=("incremental", "noop")):
    eng = _mk(spark, tmp_path, name)
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
    assert eng.mat_views["mv"].incremental, q
    assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, q)), q
    for stmt in MUTS:
        eng.execute(stmt)
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] in modes, (q, stmt, rep["mode"])
        assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, q)), (q, stmt)
    assert eng.sql("SELECT * FROM mv").schema == eng.sql(q).schema, q
    return eng


class TestFilterClauseMatViews:
    def test_filtered_sum_count_avg(self, spark, tmp_path):
        _differential(
            spark, tmp_path, "f1",
            "SELECT g, count(*) FILTER (WHERE x > 10) AS nf, "
            "sum(x) FILTER (WHERE x > 10) AS sf, "
            "avg(x) FILTER (WHERE id % 2 = 0) AS af, count(*) AS n "
            "FROM t GROUP BY g",
        )

    def test_filtered_extrema_and_variance(self, spark, tmp_path):
        _differential(
            spark, tmp_path, "f2",
            "SELECT g, min(x) FILTER (WHERE x > 5) AS lo, "
            "max(x) FILTER (WHERE id < 90) AS hi, "
            "var_pop(x) FILTER (WHERE x > 2) AS vp FROM t GROUP BY g",
        )

    def test_filtered_distinct_substate(self, spark, tmp_path):
        # non-qualifying rows land on the NULL substate value and drop at
        # expose — the signed refcounting is otherwise unchanged
        _differential(
            spark, tmp_path, "f3",
            "SELECT g, count(DISTINCT x) FILTER (WHERE x > 3) AS dx, "
            "sum(DISTINCT x) FILTER (WHERE id % 3 = 0) AS sx FROM t GROUP BY g",
        )

    def test_filter_predicate_must_be_row_local(self):
        # a FILTER predicate that needs more than the row (subquery) is
        # outside the vocabulary — the agg parser must reject it (the
        # engine itself has no execution path for it either)
        from qlbridge_spark.matview import _parse_agg
        from qlbridge_spark.rel import parse_sql

        sel = parse_sql(
            "SELECT count(*) FILTER (WHERE x > (SELECT avg(x) FROM t)) AS nf FROM t"
        )
        assert _parse_agg(sel.columns[0].expr) is None
        # while a row-local FILTER parses into a guarded argument
        sel2 = parse_sql("SELECT count(*) FILTER (WHERE x > 1) AS nf FROM t")
        kind, arg, _p, _arg2 = _parse_agg(sel2.columns[0].expr)
        assert kind == "count" and arg is not None


class TestWindowAndQualifyMatViews:
    def test_projection_rank_over_group_aggs(self, spark, tmp_path):
        _differential(
            spark, tmp_path, "w1",
            "SELECT g, sum(x) AS s, rank() OVER (ORDER BY sum(x) DESC, g) AS r "
            "FROM t GROUP BY g",
        )

    def test_qualify_topk_groups_enter_and_leave(self, spark, tmp_path):
        _differential(
            spark, tmp_path, "w2",
            "SELECT g, sum(x) AS s FROM t GROUP BY g "
            "QUALIFY rank() OVER (ORDER BY sum(x) DESC, g) <= 2",
        )

    def test_qualify_referencing_window_alias(self, spark, tmp_path):
        _differential(
            spark, tmp_path, "w3",
            "SELECT g, count(*) AS n, "
            "row_number() OVER (ORDER BY count(*) DESC, g) AS rn "
            "FROM t GROUP BY g QUALIFY rn <= 3",
        )

    def test_window_over_hidden_agg_with_having(self, spark, tmp_path):
        # sum(sum(x)) OVER () windows the groups' sums; HAVING runs first
        _differential(
            spark, tmp_path, "w4",
            "SELECT g, sum(x) AS s, sum(sum(x)) OVER () AS tot "
            "FROM t GROUP BY g HAVING count(*) > 2",
        )

    def test_window_composed_with_filter_and_join(self, spark, tmp_path):
        eng = _mk(spark, tmp_path, "w5")
        dim = ParquetMergeSink(spark, str(tmp_path / "w5_d"), key="g")
        dim.ensure(
            eng.spark.createDataFrame(
                [(k, f"n{k}") for k in range(4)], "g int, dname string"
            )
        )
        eng.register_sink("d", dim)
        q = (
            "SELECT d.dname AS k, sum(t.x) FILTER (WHERE t.x > 4) AS sf, "
            "rank() OVER (ORDER BY count(*) DESC, d.dname) AS r "
            "FROM t JOIN d ON t.g = d.g GROUP BY d.dname "
            "QUALIFY r <= 3"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        eng.execute(MUTS[0])
        eng.execute("UPDATE d SET dname = 'renamed' WHERE g = 1")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_named_window_spec_maintains(self, spark, tmp_path):
        # WINDOW w AS (...) resolves to an inline OVER (...) at analyze
        # time (same rewrite the engine applies), so named-window views
        # maintain exactly like inline-window views since r13
        eng = _mk(spark, tmp_path, "w6")
        q = (
            "SELECT g, sum(x) AS s, rank() OVER w AS r FROM t GROUP BY g "
            "WINDOW w AS (ORDER BY sum(x) DESC, g)"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        for mut in MUTS:
            eng.execute(mut)
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_chained_named_window_with_qualify(self, spark, tmp_path):
        # WINDOW w2 AS (w ...) chains resolve transitively; QUALIFY can
        # reference an OVER w column through its alias
        eng = _mk(spark, tmp_path, "w6c")
        q = (
            "SELECT g, count(*) AS n, rank() OVER w2 AS r FROM t GROUP BY g "
            "QUALIFY r <= 3 WINDOW w AS (ORDER BY count(*) DESC, g), w2 AS (w)"
        )
        try:
            eng.sql(q).collect()
        except Exception:
            pytest.skip("engine grammar: multiple named windows unsupported")
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        eng.execute(MUTS[0])
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)

    def test_randomized_window_filter_parity(self, spark, tmp_path):
        rng = random.Random(20260830)
        eng = _mk(spark, tmp_path, "w7", n=60)
        q = (
            "SELECT g, count(*) AS n, sum(x) FILTER (WHERE x > 3) AS sf, "
            "rank() OVER (ORDER BY count(*) DESC, g) AS r "
            "FROM t GROUP BY g QUALIFY r <= 3"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        next_id = 200
        for round_ in range(4):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    x = rng.choice([str(float(rng.randint(0, 20))), "NULL"])
                    eng.execute(
                        f"INSERT INTO t (id, g, x) VALUES ({next_id}, {rng.randint(0, 5)}, {x})"
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


class TestEngineGroupedProjectionWindows:
    """The engine-side capability the matview shapes ride on."""

    def test_rank_over_group_sum(self, spark):
        eng = Engine(spark, "gw1")
        eng.register_rows("t", [{"id": i, "g": i % 3, "x": float(i)} for i in range(20)])
        got = _rows(
            eng,
            "SELECT g, sum(x) AS s, rank() OVER (ORDER BY sum(x) DESC) AS r "
            "FROM t GROUP BY g",
        )
        # g=2: 57, g=1: 70, g=0: 63 → ranks 3, 1, 2
        assert got == [(0, 63.0, 2), (1, 70.0, 1), (2, 57.0, 3)]

    def test_qualify_on_projection_window_alias(self, spark):
        eng = Engine(spark, "gw2")
        eng.register_rows("t", [{"id": i, "g": i % 3, "x": float(i)} for i in range(20)])
        got = _rows(
            eng,
            "SELECT g, sum(x) AS s, rank() OVER (ORDER BY sum(x) DESC) AS r "
            "FROM t GROUP BY g QUALIFY r <= 2",
        )
        assert got == [(0, 63.0, 2), (1, 70.0, 1)]

    def test_windowed_total_after_having(self, spark):
        eng = Engine(spark, "gw3")
        eng.register_rows("t", [{"id": i, "g": i % 4, "x": 1.0} for i in range(10)])
        got = _rows(
            eng,
            "SELECT g, count(*) AS n, sum(count(*)) OVER () AS tot "
            "FROM t GROUP BY g HAVING count(*) > 2",
        )
        # groups 0,1 have 3 rows; tot windows the POST-HAVING groups
        assert got == [(0, 3, 6), (1, 3, 6)]
