"""LATERAL (SELECT …) derived tables — ANSI lateral joins, decorrelated
into single joins (never per-outer-row re-execution). Superset: the
reference refuses every subquery position
(/root/reference/plan/planner_select.go:94-98). All result shapes in
this module were cross-checked against DuckDB's LATERAL."""

import pytest

from qlbridge_spark.engine import ExecError


@pytest.fixture(scope="module")
def leng(spark):
    from qlbridge_spark import Engine

    e = Engine(spark)
    e.register_df("lc", spark.createDataFrame([(1, "ann"), (2, "bob"), (3, "cat")], "ck int, nm string"))
    e.register_df(
        "lo",
        spark.createDataFrame(
            [
                (10, 1, 100.0, "2024-01-01"),
                (11, 1, 50.0, "2024-01-02"),
                (12, 1, 75.0, "2024-01-03"),
                (13, 2, 200.0, "2024-01-01"),
            ],
            "ok int, ock int, amt double, d string",
        ),
    )
    return e


class TestLateral:
    def test_plain_correlated(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.ok FROM lc, LATERAL (SELECT ok FROM lo WHERE ock = ck) l ORDER BY nm, ok"
        ).collect()
        assert [(r.nm, r.ok) for r in rows] == [("ann", 10), ("ann", 11), ("ann", 12), ("bob", 13)]

    def test_top_n_per_key(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.ok, l.amt FROM lc,"
            " LATERAL (SELECT ok, amt FROM lo WHERE ock = ck ORDER BY amt DESC LIMIT 2) l"
            " ORDER BY nm, amt DESC"
        ).collect()
        assert [(r.nm, r.ok) for r in rows] == [("ann", 10), ("ann", 12), ("bob", 13)]

    def test_left_lateral_keeps_unmatched(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.ok FROM lc LEFT JOIN LATERAL (SELECT ok FROM lo WHERE ock = ck) l ON true"
            " ORDER BY nm, ok"
        ).collect()
        assert ("cat", None) in [(r.nm, r.ok) for r in rows]

    def test_global_agg_always_one_row(self, leng):
        # ANSI: a global aggregate yields a row even for the empty set —
        # count coalesces to 0, sum stays NULL (DuckDB-matched)
        rows = leng.execute(
            "SELECT lc.nm, l.n, l.tot FROM lc,"
            " LATERAL (SELECT count(*) AS n, sum(amt) AS tot FROM lo WHERE ock = ck) l ORDER BY nm"
        ).collect()
        assert [(r.nm, r.n, r.tot) for r in rows] == [("ann", 3, 225.0), ("bob", 1, 200.0), ("cat", 0, None)]

    def test_grouped_lateral(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.d, l.n FROM lc,"
            " LATERAL (SELECT d, count(*) AS n FROM lo WHERE ock = ck GROUP BY d) l ORDER BY nm, d"
        ).collect()
        assert len(rows) == 4 and rows[0].d == "2024-01-01"

    def test_range_correlation_as_join_residual(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.ok FROM lc,"
            " LATERAL (SELECT ok FROM lo WHERE ock = ck AND amt > ck * 60) l ORDER BY nm, ok"
        ).collect()
        assert [(r.nm, r.ok) for r in rows] == [("ann", 10), ("ann", 12), ("bob", 13)]

    def test_uncorrelated_lateral(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.mx FROM lc, LATERAL (SELECT max(amt) AS mx FROM lo) l ORDER BY nm"
        ).collect()
        assert all(r.mx == 200.0 for r in rows) and len(rows) == 3

    def test_offset_composes_with_limit(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.ok FROM lc,"
            " LATERAL (SELECT ok FROM lo WHERE ock = ck ORDER BY amt DESC LIMIT 2 OFFSET 1) l"
            " ORDER BY nm, ok"
        ).collect()
        # ann's amts desc: 100(ok10), 75(ok12), 50(ok11) → offset 1 limit 2
        # → ok12, ok11; bob's single row is consumed by the offset
        # (DuckDB-matched)
        assert [(r.nm, r.ok) for r in rows] == [("ann", 11), ("ann", 12)]

    def test_single_join_plan_no_reexecution(self, leng):
        plan = leng.execute(
            "SELECT lc.nm, l.ok FROM lc, LATERAL (SELECT ok FROM lo WHERE ock = ck) l"
        )._jdf.queryExecution().executedPlan().toString()
        # decorrelated: exactly one join of the two scans
        assert plan.count("Join") == 1

    def test_agg_with_range_errors(self, leng):
        with pytest.raises(ExecError, match="equality correlation only"):
            leng.execute(
                "SELECT lc.nm, l.n FROM lc,"
                " LATERAL (SELECT count(*) AS n FROM lo WHERE ock = ck AND amt > ck * 60) l"
            ).collect()

    def test_on_condition_must_be_true(self, leng):
        with pytest.raises(ExecError, match="ON true"):
            leng.execute(
                "SELECT lc.nm FROM lc LEFT JOIN LATERAL (SELECT ok FROM lo WHERE ock = ck) l ON ck = 1"
            ).collect()

    def test_lateral_then_regular_join(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.ok, c2.ck FROM lc,"
            " LATERAL (SELECT ok, ock FROM lo WHERE ock = ck) l"
            " JOIN lc c2 ON c2.ck = l.ock ORDER BY nm, l.ok"
        ).collect()
        assert [(r.nm, r.ok, r.ck) for r in rows] == [
            ("ann", 10, 1), ("ann", 11, 1), ("ann", 12, 1), ("bob", 13, 2)
        ]

    def test_having_filters_agg_lateral(self, leng):
        # HAVING rejects bob's single-row group; CROSS drops, ann survives
        rows = leng.execute(
            "SELECT lc.nm, l.n FROM lc,"
            " LATERAL (SELECT count(*) AS n FROM lo WHERE ock = ck HAVING count(*) > 1) l ORDER BY nm"
        ).collect()
        assert [(r.nm, r.n) for r in rows] == [("ann", 3)]

    def test_having_true_on_empty_keeps_zero_row(self, leng):
        # HAVING holds over the empty relation → cat keeps its count-0 row
        # (DuckDB-matched ANSI subtlety)
        rows = leng.execute(
            "SELECT lc.nm, l.n FROM lc,"
            " LATERAL (SELECT count(*) AS n FROM lo WHERE ock = ck HAVING count(*) < 5) l ORDER BY nm"
        ).collect()
        assert [(r.nm, r.n) for r in rows] == [("ann", 3), ("bob", 1), ("cat", 0)]

    def test_left_lateral_having_nulls(self, leng):
        rows = leng.execute(
            "SELECT lc.nm, l.n FROM lc LEFT JOIN"
            " LATERAL (SELECT count(*) AS n FROM lo WHERE ock = ck HAVING count(*) > 1) l ON true ORDER BY nm"
        ).collect()
        assert [(r.nm, r.n) for r in rows] == [("ann", 3), ("bob", None), ("cat", None)]
