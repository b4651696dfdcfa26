"""Window functions + set operations in the engine's own SQL dialect.

Both are supersets: the reference has neither window functions
(SURVEY §2.4 "not present") nor UNION/INTERSECT/EXCEPT
(lex/dialect_sql.go:30-50 statement list, SURVEY §2.6). These tests pin
the OVER() grammar, the pyspark.sql.Window lowering, and set-op
semantics (dedup vs ALL, positional column resolution).
"""

from __future__ import annotations

import pytest

from qlbridge_spark import Engine
from qlbridge_spark.exprparse import ParseError, parse_expression
from qlbridge_spark.nodes import WindowNode
from qlbridge_spark.translate import TranslateError


@pytest.fixture()
def eng(spark):
    e = Engine(spark, "winset")
    e.register_rows(
        "sales",
        [
            {"region": "e", "rep": "a", "amt": 10},
            {"region": "e", "rep": "b", "amt": 30},
            {"region": "e", "rep": "c", "amt": 20},
            {"region": "w", "rep": "d", "amt": 5},
            {"region": "w", "rep": "e", "amt": 50},
        ],
    )
    return e


class TestWindowParse:
    def test_over_roundtrip(self):
        n = parse_expression(
            "sum(x) OVER (PARTITION BY a, b ORDER BY c DESC, d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        )
        assert isinstance(n, WindowNode)
        assert [e.sql() for e in n.partition_by] == ["a", "b"]
        assert [(e.sql(), d) for e, d in n.order_by] == [("c", "DESC"), ("d", "ASC")]
        assert n.frame == ("ROWS", -2, 0)
        # sql() → re-parse → identical structure
        n2 = parse_expression(n.sql())
        assert n2 == n

    def test_unbounded_frame(self):
        n = parse_expression("count(*) OVER (ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)")
        assert n.frame == ("ROWS", None, None)

    def test_bad_frame_bound(self):
        with pytest.raises(ParseError):
            parse_expression("sum(x) OVER (ORDER BY a ROWS BETWEEN 2 AND 3)")


class TestWindowExec:
    def test_row_number_rank(self, eng):
        rows = eng.sql(
            """SELECT region, rep, rnk FROM (
                 SELECT region, rep,
                        row_number() OVER (PARTITION BY region ORDER BY amt DESC, rep) AS rnk
                 FROM sales) AS t
               WHERE rnk <= 2 ORDER BY region, rnk"""
        ).collect()
        assert [(r["region"], r["rep"], r["rnk"]) for r in rows] == [
            ("e", "b", 1), ("e", "c", 2), ("w", "e", 1), ("w", "d", 2),
        ]

    def test_lag_and_moving_sum(self, eng):
        rows = eng.sql(
            """SELECT rep,
                      lag(amt) OVER (PARTITION BY region ORDER BY rep) AS prev,
                      sum(amt) OVER (PARTITION BY region ORDER BY rep
                          ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mov2
               FROM sales ORDER BY rep"""
        ).collect()
        by_rep = {r["rep"]: (r["prev"], r["mov2"]) for r in rows}
        assert by_rep["a"] == (None, 10)
        assert by_rep["b"] == (10, 40)
        assert by_rep["c"] == (30, 50)
        assert by_rep["e"] == (5, 55)

    def test_default_frame_running_sum(self, eng):
        # ORDER BY without frame → SQL default running aggregate
        rows = eng.sql(
            "SELECT rep, sum(amt) OVER (PARTITION BY region ORDER BY rep) AS run FROM sales ORDER BY rep"
        ).collect()
        assert [r["run"] for r in rows if r["rep"] in "abc"] == [10, 40, 60]

    def test_ntile_percent_rank(self, eng):
        rows = eng.sql(
            """SELECT rep, cast(ntile(2) OVER (PARTITION BY region ORDER BY amt) AS long) AS half,
                      floor(percent_rank() OVER (PARTITION BY region ORDER BY amt) * 100) AS pr
               FROM sales ORDER BY rep"""
        ).collect()
        e_rows = [(r["half"], r["pr"]) for r in rows if r["rep"] in "abc"]
        assert e_rows == [(1, 0), (2, 100), (1, 50)]

    def test_window_is_not_group_aggregate(self, eng):
        # a windowed sum must NOT trigger the groupBy path (per-row output)
        assert eng.sql("SELECT rep, sum(amt) OVER (PARTITION BY region ORDER BY rep) AS s FROM sales").count() == 5

    def test_window_mixed_with_group_agg_still_aggregates(self, eng):
        rows = eng.sql("SELECT region, sum(amt) AS total FROM sales GROUP BY region ORDER BY region").collect()
        assert [(r["region"], r["total"]) for r in rows] == [("e", 60), ("w", 55)]

    def test_ranking_requires_order_by(self, eng):
        with pytest.raises(TranslateError):
            eng.sql("SELECT row_number() OVER (PARTITION BY region) AS r FROM sales").collect()


class TestSetOps:
    def test_union_all_vs_union(self, eng):
        ua = eng.sql("SELECT region FROM sales UNION ALL SELECT region FROM sales")
        assert ua.count() == 10
        u = eng.sql("SELECT region FROM sales UNION SELECT region FROM sales")
        assert sorted(r["region"] for r in u.collect()) == ["e", "w"]

    def test_intersect_except(self, eng):
        eng.register_rows("other", [{"region": "e"}, {"region": "n"}])
        i = eng.sql("SELECT region FROM sales INTERSECT SELECT region FROM other")
        assert [r["region"] for r in i.collect()] == ["e"]
        x = eng.sql("SELECT region FROM sales EXCEPT SELECT region FROM other")
        assert [r["region"] for r in x.collect()] == ["w"]

    def test_setop_in_from_subquery(self, eng):
        eng.register_rows("other", [{"region": "e"}, {"region": "n"}])
        n = eng.sql(
            "SELECT count(*) AS n FROM (SELECT region FROM sales UNION SELECT region FROM other) AS t"
        ).collect()
        assert n[0]["n"] == 3

    def test_chain_left_associative(self, eng):
        # (sales ∪ sales) \ {w} — EXCEPT applies to the whole union chain
        rows = eng.sql(
            'SELECT region FROM sales UNION SELECT region FROM sales EXCEPT SELECT "w" AS region'
        ).collect()
        assert [r["region"] for r in rows] == ["e"]

    def test_column_count_mismatch_raises(self, eng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError):
            eng.sql("SELECT region, rep FROM sales UNION SELECT region FROM sales")

    def test_setop_chain_inside_in_subquery(self, eng):
        # the IN-subquery semi-join path accepts a full set-op chain
        eng.register_rows("other", [{"region": "e"}, {"region": "n"}])
        rows = eng.sql(
            "SELECT DISTINCT region FROM sales WHERE region IN "
            "(SELECT region FROM other UNION SELECT rep AS region FROM sales)"
        ).collect()
        assert sorted(r["region"] for r in rows) == ["e"]

    def test_setop_chain_inside_not_in_subquery(self, eng):
        eng.register_rows("other", [{"region": "e"}, {"region": "n"}])
        rows = eng.sql(
            "SELECT DISTINCT region FROM sales WHERE region NOT IN "
            "(SELECT region FROM other UNION ALL SELECT region FROM other)"
        ).collect()
        assert sorted(r["region"] for r in rows) == ["w"]

    def test_setop_chain_as_scalar_subquery(self, eng):
        got = eng.sql(
            "SELECT (SELECT max(amt) FROM sales INTERSECT SELECT max(amt) FROM sales) AS m FROM sales LIMIT 1"
        ).collect()
        assert got[0]["m"] == 50

    def test_view_over_setop(self, eng):
        eng.execute("CREATE VIEW vx AS SELECT region FROM sales UNION SELECT rep AS region FROM sales")
        # regions {e,w} ∪ reps {a,b,c,d,e} dedups the shared 'e' → 6
        assert eng.sql("SELECT count(*) AS n FROM vx").collect()[0]["n"] == 6


class TestSetOpChainClauses:
    """ANSI binding: trailing ORDER BY/LIMIT/OFFSET after the last
    unparenthesized operand apply to the WHOLE chain; a parenthesized
    operand keeps its clauses local. INTERSECT binds tighter than
    UNION/EXCEPT."""

    def test_trailing_order_limit_applies_to_chain(self, eng):
        rows = eng.sql(
            "SELECT amt FROM sales UNION ALL SELECT amt FROM sales ORDER BY amt DESC LIMIT 3"
        ).collect()
        # ordered over the combined 10-row bag, not just the right operand
        assert [r["amt"] for r in rows] == [50, 50, 30]

    def test_trailing_offset(self, eng):
        rows = eng.sql(
            "SELECT amt FROM sales UNION SELECT amt FROM sales ORDER BY amt LIMIT 2 OFFSET 1"
        ).collect()
        assert [r["amt"] for r in rows] == [10, 20]

    def test_positional_order_by(self, eng):
        rows = eng.sql(
            "SELECT rep, amt FROM sales UNION ALL SELECT rep, amt FROM sales ORDER BY 2 DESC, 1 LIMIT 2"
        ).collect()
        assert [(r["rep"], r["amt"]) for r in rows] == [("e", 50), ("e", 50)]

    def test_parenthesized_right_keeps_clauses_local(self, eng):
        # inner LIMIT 1 (ordered) restricts only the right operand
        rows = eng.sql(
            "SELECT amt FROM sales WHERE amt = 10 UNION ALL "
            "(SELECT amt FROM sales ORDER BY amt DESC LIMIT 1)"
        ).collect()
        assert sorted(r["amt"] for r in rows) == [10, 50]

    def test_intersect_binds_tighter_than_union(self, eng):
        eng.register_rows("o1", [{"amt": 10}, {"amt": 99}])
        # A UNION B INTERSECT C == A UNION (B INTERSECT C); left-assoc
        # reading would give ({10..50} ∩ {10,99}) = {10} only
        rows = eng.sql(
            'SELECT amt FROM sales WHERE amt = 30 UNION SELECT amt FROM sales INTERSECT SELECT amt FROM o1'
        ).collect()
        assert sorted(r["amt"] for r in rows) == [10, 30]

    def test_setop_chain_in_subquery_and_in_clause(self, eng):
        n = eng.sql(
            "SELECT count(*) AS n FROM (SELECT region FROM sales UNION ALL "
            "SELECT region FROM sales ORDER BY region LIMIT 3) AS t"
        ).collect()
        assert n[0]["n"] == 3
        rows = eng.sql(
            'SELECT rep FROM sales WHERE region IN '
            '(SELECT region FROM sales WHERE amt > 40 UNION SELECT "n" AS region) ORDER BY rep'
        ).collect()
        assert [r["rep"] for r in rows] == ["d", "e"]

    def test_insert_select_chain(self, eng):
        eng.register_rows("tgt", [{"region": "zz"}])
        eng.execute("INSERT INTO tgt (region) SELECT region FROM sales UNION SELECT rep AS region FROM sales")
        assert eng.sql("SELECT count(*) AS n FROM tgt").collect()[0]["n"] == 7

    def test_continuousview_rejects_setop(self, eng):
        with pytest.raises(Exception, match="set operations"):
            eng.execute(
                "CREATE CONTINUOUSVIEW cv AS SELECT region FROM sales UNION SELECT rep AS region FROM sales"
            )


class TestQualify:
    def test_qualify_inline_window(self, eng):
        rows = eng.sql(
            """SELECT region, rep FROM sales
               QUALIFY row_number() OVER (PARTITION BY region ORDER BY amt DESC, rep) <= 2
               ORDER BY region, rep"""
        ).collect()
        assert [(r["region"], r["rep"]) for r in rows] == [("e", "b"), ("e", "c"), ("w", "d"), ("w", "e")]

    def test_qualify_alias_reference(self, eng):
        # alias in QUALIFY; projected rn keeps its PRE-filter value
        rows = eng.sql(
            """SELECT rep, row_number() OVER (PARTITION BY region ORDER BY amt DESC, rep) AS rn
               FROM sales QUALIFY rn = 2 ORDER BY rep"""
        ).collect()
        assert [(r["rep"], r["rn"]) for r in rows] == [("c", 2), ("d", 2)]

    def test_qualify_references_nonprojected_column(self, eng):
        # window partitions on region, which is NOT in the select list
        rows = eng.sql(
            "SELECT rep FROM sales QUALIFY rank() OVER (PARTITION BY region ORDER BY amt DESC) = 1 ORDER BY rep"
        ).collect()
        assert [r["rep"] for r in rows] == ["b", "e"]

    def test_qualify_with_group_by(self, eng):
        eng.register_rows(
            "sales2",
            [
                {"region": "e", "rep": "a", "amt": 10}, {"region": "e", "rep": "a", "amt": 5},
                {"region": "e", "rep": "b", "amt": 30}, {"region": "w", "rep": "d", "amt": 5},
                {"region": "w", "rep": "e", "amt": 50},
            ],
        )
        # top rep per region by summed amount — agg subtree inside OVER
        rows = eng.sql(
            """SELECT region, rep, sum(amt) AS total FROM sales2 GROUP BY region, rep
               QUALIFY row_number() OVER (PARTITION BY region ORDER BY sum(amt) DESC) = 1
               ORDER BY region"""
        ).collect()
        assert [(r["region"], r["rep"], r["total"]) for r in rows] == [("e", "b", 30.0), ("w", "e", 50.0)]

    def test_qualify_agg_alias_in_over(self, eng):
        rows = eng.sql(
            """SELECT region, sum(amt) AS total FROM sales GROUP BY region
               QUALIFY rank() OVER (ORDER BY total DESC) = 1"""
        ).collect()
        assert [(r["region"], r["total"]) for r in rows] == [("e", 60.0)]

    def test_qualify_with_distinct_and_order(self, eng):
        rows = eng.sql(
            """SELECT DISTINCT region FROM sales
               QUALIFY count(*) OVER (PARTITION BY region) >= 3 ORDER BY region"""
        ).collect()
        assert [r["region"] for r in rows] == ["e"]


class TestRangeFrames:
    def test_range_parse_roundtrip(self):
        n = parse_expression("sum(x) OVER (ORDER BY a RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)")
        assert n.frame == ("RANGE", -10, 0)
        assert parse_expression(n.sql()) == n

    def test_range_value_window(self, eng):
        # value-based frame: rows within amt-10 .. amt (not row-count!)
        rows = eng.sql(
            """SELECT rep, sum(amt) OVER (ORDER BY amt RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS s
               FROM sales ORDER BY rep"""
        ).collect()
        by_rep = {r["rep"]: r["s"] for r in rows}
        # amts: a=10,b=30,c=20,d=5,e=50 → s(a)=5+10, s(c)=10+20, s(b)=20+30, s(e)=50
        assert by_rep == {"a": 15, "b": 50, "c": 30, "d": 5, "e": 50}

    def test_range_unbounded(self, eng):
        rows = eng.sql(
            """SELECT rep, sum(amt) OVER (PARTITION BY region ORDER BY amt
                   RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS t
               FROM sales ORDER BY rep"""
        ).collect()
        assert {r["rep"]: r["t"] for r in rows} == {"a": 60, "b": 60, "c": 60, "d": 55, "e": 55}

    def test_range_offset_needs_single_order_key(self, eng):
        with pytest.raises(TranslateError, match="exactly one ORDER BY"):
            eng.sql(
                """SELECT sum(amt) OVER (ORDER BY amt, rep RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS s
                   FROM sales"""
            ).collect()


class TestNamedWindows:
    def test_named_window_shared_by_two_funcs(self, eng):
        rows = eng.sql(
            """SELECT rep, row_number() OVER w AS rn, sum(amt) OVER w AS run
               FROM sales WINDOW w AS (PARTITION BY region ORDER BY amt) ORDER BY rep"""
        ).collect()
        by_rep = {r["rep"]: (r["rn"], r["run"]) for r in rows}
        assert by_rep["a"] == (1, 10) and by_rep["b"] == (3, 60) and by_rep["e"] == (2, 55)

    def test_named_window_with_frame_and_qualify(self, eng):
        rows = eng.sql(
            """SELECT rep, sum(amt) OVER w AS t FROM sales
               WINDOW w AS (PARTITION BY region ORDER BY amt
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               QUALIFY row_number() OVER w = 1 ORDER BY rep"""
        ).collect()
        assert [(r["rep"], r["t"]) for r in rows] == [("a", 60), ("d", 55)]

    def test_two_named_windows(self, eng):
        rows = eng.sql(
            """SELECT rep, rank() OVER byamt AS r1, rank() OVER byrep AS r2 FROM sales
               WINDOW byamt AS (ORDER BY amt DESC), byrep AS (ORDER BY rep) ORDER BY rep"""
        ).collect()
        assert rows[0]["rep"] == "a" and rows[0]["r1"] == 4 and rows[0]["r2"] == 1

    def test_unknown_window_name(self, eng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError, match="unknown window name"):
            eng.sql("SELECT rank() OVER nope AS r FROM sales WINDOW w AS (ORDER BY amt)").collect()

    def test_over_ref_without_window_clause(self, eng):
        with pytest.raises(TranslateError, match="requires a WINDOW"):
            eng.sql("SELECT rank() OVER w AS r FROM sales").collect()

    def test_over_extends_named_window_with_frame(self, eng):
        # OVER (w ROWS BETWEEN ...) inherits partition/order, overrides frame
        rows = eng.sql(
            """SELECT rep,
                      sum(amt) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS mov2,
                      sum(amt) OVER w AS run
               FROM sales WINDOW w AS (PARTITION BY region ORDER BY rep) ORDER BY rep"""
        ).collect()
        by_rep = {r["rep"]: (r["mov2"], r["run"]) for r in rows}
        assert by_rep["c"] == (50, 60) and by_rep["b"] == (40, 40)

    def test_chained_window_definitions(self, eng):
        # WINDOW w2 AS (w ROWS ...) — named spec extending another
        rows = eng.sql(
            """SELECT rep, sum(amt) OVER w2 AS mov2 FROM sales
               WINDOW w AS (PARTITION BY region ORDER BY rep),
                      w2 AS (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
               ORDER BY rep"""
        ).collect()
        assert {r["rep"]: r["mov2"] for r in rows}["c"] == 50

    def test_window_definition_cycle_errors(self, eng):
        from qlbridge_spark.engine import ExecError

        with pytest.raises(ExecError, match="cycle"):
            eng.sql(
                "SELECT sum(amt) OVER a AS s FROM sales WINDOW a AS (b), b AS (a)"
            ).collect()

    def test_over_extension_roundtrip(self):
        n = parse_expression("sum(x) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")
        assert n.ref == "w" and n.frame == ("ROWS", -2, 0)
        assert parse_expression(n.sql()) == n

    def test_view_over_named_window(self, eng):
        # the parsed select is stored in the view; resolution must not
        # mutate it (copy-on-resolve) so the view keeps working
        eng.execute(
            "CREATE VIEW topsales AS SELECT rep FROM sales "
            "WINDOW w AS (PARTITION BY region ORDER BY amt DESC) QUALIFY row_number() OVER w = 1"
        )
        assert sorted(r["rep"] for r in eng.sql("SELECT rep FROM topsales").collect()) == ["b", "e"]
        assert sorted(r["rep"] for r in eng.sql("SELECT rep FROM topsales").collect()) == ["b", "e"]


class TestGroupingSets:
    def test_grouping_sets_with_markers(self, eng):
        rows = eng.sql(
            """SELECT region, rep, sum(amt) AS t,
                      cast(grouping(region) AS long) AS g_region,
                      cast(grouping(rep) AS long) AS g_rep
               FROM sales GROUP BY GROUPING SETS ((region, rep), (region), ())
               ORDER BY region, rep"""
        ).collect()
        # 5 (region,rep) rows + 2 region rows + 1 grand total
        assert len(rows) == 8
        grand = [r for r in rows if r["g_region"] == 1]
        assert len(grand) == 1 and grand[0]["t"] == 115.0 and grand[0]["g_rep"] == 1
        reg = {r["region"]: r["t"] for r in rows if r["g_region"] == 0 and r["g_rep"] == 1}
        assert reg == {"e": 60.0, "w": 55.0}

    def test_grouping_sets_disjoint(self, eng):
        # sets over different columns — not expressible as ROLLUP/CUBE
        rows = eng.sql(
            "SELECT region, rep, count(*) AS n FROM sales "
            "GROUP BY GROUPING SETS ((region), (rep)) ORDER BY region, rep"
        ).collect()
        assert len(rows) == 7  # 2 regions + 5 reps
        assert sum(1 for r in rows if r["region"] is None) == 5

    def test_grouping_set_not_in_union_errors(self, eng):
        # an expression can only appear in a set if GROUP BY's union has it
        # (parser derives the union from the sets, so craft via engine API)
        from qlbridge_spark.engine import ExecError
        from qlbridge_spark.rel import parse_sql

        sel = parse_sql("SELECT region, count(*) AS n FROM sales GROUP BY GROUPING SETS ((region))")
        from qlbridge_spark.nodes import IdentityNode

        sel.grouping_sets.append([IdentityNode(("rep",))])
        with pytest.raises(ExecError, match="not in GROUP BY union"):
            eng._select(sel)

    def test_grouping_sets_plan_is_single_expand(self, eng):
        df = eng.sql(
            "SELECT region, rep, count(*) AS n FROM sales GROUP BY GROUPING SETS ((region), (rep))"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Expand") == 1  # one Expand+Aggregate, no union of scans


class TestMedianPercentile:
    def test_median_and_percentile_cont(self, eng):
        rows = eng.sql(
            "SELECT region, median(amt) AS med, percentile_cont(amt, 0.5) AS p50 "
            "FROM sales GROUP BY region ORDER BY region"
        ).collect()
        assert [(r["region"], r["med"], r["p50"]) for r in rows] == [("e", 20.0, 20.0), ("w", 27.5, 27.5)]

    def test_percentile_cont_interpolates(self, eng):
        rows = eng.sql("SELECT percentile_cont(amt, 0.25) AS q FROM sales").collect()
        # sorted amts 5,10,20,30,50 → p25 = 10
        assert rows[0]["q"] == 10.0

    def test_percentile_cont_validates(self, eng):
        with pytest.raises(TranslateError):
            eng.sql("SELECT percentile_cont(amt, 1.5) AS q FROM sales").collect()
        with pytest.raises(TranslateError):
            eng.sql("SELECT percentile_cont(amt, amt) AS q FROM sales").collect()

    def test_approx_sketch_aggs(self, eng):
        row = eng.sql(
            "SELECT approx_count_distinct(rep) AS reps, approx_count_distinct(region, 0.01) AS regs, "
            "approx_percentile(amt, 0.5) AS p50, approx_percentile(amt, 0.5, 100) AS p50b FROM sales"
        ).collect()[0]
        # exact at this tiny cardinality; sketches only diverge at scale
        assert (row["reps"], row["regs"]) == (5, 2)
        assert row["p50"] == 20.0 and row["p50b"] == 20.0

    def test_approx_percentile_validates(self, eng):
        with pytest.raises(TranslateError):
            eng.sql("SELECT approx_percentile(amt) AS q FROM sales").collect()


class TestAggregateFilterWhere:
    def test_filter_where_basic(self, eng):
        rows = eng.sql(
            """SELECT region,
                      count(*) FILTER (WHERE amt > 15) AS big,
                      sum(amt) FILTER (WHERE amt > 15) AS big_amt,
                      count(*) AS total
               FROM sales GROUP BY region ORDER BY region"""
        ).collect()
        assert [(r["region"], r["big"], r["big_amt"], r["total"]) for r in rows] == [
            ("e", 2, 50.0, 3), ("w", 1, 50.0, 2),
        ]

    def test_filter_where_count_distinct(self, eng):
        row = eng.sql(
            'SELECT count(DISTINCT region) FILTER (WHERE amt < 15) AS r FROM sales'
        ).collect()[0]
        assert row["r"] == 2  # e (amt 10) and w (amt 5)

    def test_filter_where_no_match_is_null_sum(self, eng):
        row = eng.sql(
            "SELECT sum(amt) FILTER (WHERE amt > 999) AS s, count(*) FILTER (WHERE amt > 999) AS n FROM sales"
        ).collect()[0]
        assert row["s"] is None and row["n"] == 0

    def test_filter_where_on_scalar_function_errors(self, eng):
        with pytest.raises(TranslateError, match="only valid on an aggregate"):
            eng.sql("SELECT tolower(rep) FILTER (WHERE amt > 1) AS x FROM sales").collect()

    def test_filter_where_roundtrip_sql(self):
        n = parse_expression("sum(x) FILTER (WHERE (y > 2))")
        assert "FILTER (WHERE" in n.sql()
        assert parse_expression(n.sql()) == n

    def test_filter_where_with_over(self, eng):
        # agg FILTER ... OVER w: windowed conditional count
        rows = eng.sql(
            """SELECT rep, count(*) FILTER (WHERE amt >= 20) OVER (PARTITION BY region) AS big
               FROM sales ORDER BY rep"""
        ).collect()
        assert {r["rep"]: r["big"] for r in rows} == {"a": 2, "b": 2, "c": 2, "d": 1, "e": 1}


class TestLagLeadDefault:
    def test_lag_default_literal(self, eng):
        rows = eng.sql(
            "SELECT rep, lag(amt, 1, 0) OVER (PARTITION BY region ORDER BY rep) AS prev "
            "FROM sales ORDER BY rep"
        ).collect()
        by_rep = {r["rep"]: r["prev"] for r in rows}
        assert by_rep["a"] == 0 and by_rep["b"] == 10 and by_rep["d"] == 0

    def test_lead_default_string(self, eng):
        rows = eng.sql(
            'SELECT rep, lead(rep, 1, "END") OVER (PARTITION BY region ORDER BY rep) AS nxt '
            "FROM sales ORDER BY rep"
        ).collect()
        by_rep = {r["rep"]: r["nxt"] for r in rows}
        assert by_rep["c"] == "END" and by_rep["a"] == "b"

    def test_lag_non_literal_offset_raises(self, eng):
        with pytest.raises(TranslateError, match="offset must be an integer literal"):
            eng.sql("SELECT lag(amt, amt) OVER (PARTITION BY region ORDER BY rep) AS p FROM sales").collect()

    def test_lag_non_literal_default_raises(self, eng):
        with pytest.raises(TranslateError, match="default must be a literal"):
            eng.sql("SELECT lag(amt, 1, amt) OVER (PARTITION BY region ORDER BY rep) AS p FROM sales").collect()


class TestQualifySubqueries:
    """Subqueries in QUALIFY (round 7): non-aggregated predicates lower
    with the select-list machinery (joined columns ride to the
    post-window filter); aggregated predicates lower like HAVING's,
    against the aggregated frame with correlation on group keys.
    DuckDB-cross-checked expected values."""

    @pytest.fixture(scope="class")
    def qeng(self, spark):
        from qlbridge_spark import Engine

        eng = Engine(spark, "qualify_subq")
        eng.register_df(
            "qev",
            spark.createDataFrame(
                [(1, "a", 10, 100.0), (2, "a", 20, 2.0), (3, "b", 30, 4.0), (4, "b", 5, 50.0), (5, "c", 7, 8.0), (6, "c", 9, 90.0)],
                "id int, k string, ts int, v double",
            ),
        )
        eng.register_df(
            "qref",
            spark.createDataFrame(
                [(1, "a", 5, 1.0), (2, "a", 15, 2.0), (3, "b", 25, 3.0), (4, "b", 30, 4.0), (5, "c", 1, 9.0)],
                "rid int, k string, ts int, v double",
            ),
        )
        return eng

    def test_nonagg_qualify_correlated_scalar(self, qeng):
        df = qeng.sql(
            "SELECT id, k, row_number() OVER (PARTITION BY k ORDER BY ts) AS rn FROM qev "
            "QUALIFY rn = 1 AND (SELECT count(*) FROM qref r WHERE r.k = qev.k) > 1 ORDER BY id"
        )
        assert [tuple(r) for r in df.collect()] == [(1, "a", 1), (4, "b", 1)]

    def test_nonagg_qualify_uncorrelated_scalar(self, qeng):
        df = qeng.sql(
            "SELECT id, row_number() OVER (ORDER BY ts) AS rn FROM qev "
            "QUALIFY rn <= (SELECT count(*) FROM qref) - 3 ORDER BY id"
        )
        assert [tuple(r) for r in df.collect()] == [(4, 1), (5, 2)]

    def test_agg_qualify_correlated_scalar_on_group_key(self, qeng):
        df = qeng.sql(
            "SELECT k, sum(v) AS sv FROM qev GROUP BY k "
            "QUALIFY rank() OVER (ORDER BY sum(v) DESC) <= 2 AND (SELECT count(*) FROM qref r WHERE r.k = qev.k) > 1 ORDER BY k"
        )
        # sums: a=102 (rank 1), c=98 (rank 2), b=54 (rank 3); c's
        # correlated count is 1, failing > 1 → only a survives
        assert [tuple(r) for r in df.collect()] == [("a", 102.0)]

    def test_agg_qualify_correlated_exists(self, qeng):
        df = qeng.sql(
            "SELECT k, count(*) AS n FROM qev GROUP BY k "
            "QUALIFY row_number() OVER (ORDER BY k) >= 1 AND EXISTS (SELECT 1 FROM qref r WHERE r.k = qev.k AND r.v > 3) ORDER BY k"
        )
        assert [tuple(r) for r in df.collect()] == [("b", 2), ("c", 2)]


class TestCaseAndNullTreatment:
    @pytest.fixture(scope="class")
    def ceng(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("ct", spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (6, "d")], "n int, s string"))
        e.register_df(
            "nt",
            spark.createDataFrame(
                [(1, 1, None), (1, 2, "a"), (1, 3, None), (1, 4, "b"), (2, 1, None)],
                "g int, i int, v string",
            ),
        )
        return e

    def test_searched_case(self, ceng):
        rows = ceng.execute(
            "SELECT n, CASE WHEN n < 2 THEN 'small' WHEN n < 5 THEN 'mid' ELSE 'big' END AS sz"
            " FROM ct ORDER BY n"
        ).collect()
        assert [r.sz for r in rows] == ["small", "mid", "mid", "big"]

    def test_simple_case_no_else_is_null(self, ceng):
        rows = ceng.execute(
            "SELECT s, CASE s WHEN 'a' THEN 1 WHEN 'b' THEN 2 END AS code FROM ct ORDER BY s"
        ).collect()
        assert [r.code for r in rows] == [1, 2, None, None]

    def test_case_as_group_key(self, ceng):
        rows = ceng.execute(
            "SELECT CASE WHEN n % 2 = 0 THEN 'even' ELSE 'odd' END AS par, count(*) AS c"
            " FROM ct GROUP BY par ORDER BY par"
        ).collect()
        assert [(r.par, r.c) for r in rows] == [("even", 2), ("odd", 2)]

    def test_case_inside_aggregate(self, ceng):
        assert ceng.execute(
            "SELECT sum(CASE WHEN n > 2 THEN n ELSE 0 END) AS s FROM ct"
        ).collect()[0].s == 9

    def test_case_without_when_errors(self, ceng):
        from qlbridge_spark.exprparse import ParseError

        with pytest.raises(ParseError):
            ceng.execute("SELECT CASE ELSE 1 END FROM ct")

    def test_last_value_ignore_nulls_running(self, ceng):
        # the gap-fill idiom: running latest non-null (DuckDB-matched)
        rows = ceng.execute(
            "SELECT g, i, last_value(v) IGNORE NULLS OVER (PARTITION BY g ORDER BY i) AS lv"
            " FROM nt ORDER BY g, i"
        ).collect()
        assert [r.lv for r in rows] == [None, "a", "a", "b", None]

    def test_first_value_ignore_nulls_full_frame(self, ceng):
        rows = ceng.execute(
            "SELECT g, i, first_value(v) IGNORE NULLS OVER (PARTITION BY g ORDER BY i"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv FROM nt ORDER BY g, i"
        ).collect()
        assert [r.fv for r in rows] == ["a", "a", "a", "a", None]

    def test_nth_value(self, ceng):
        rows = ceng.execute(
            "SELECT g, i, nth_value(v, 2) OVER (PARTITION BY g ORDER BY i"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n2 FROM nt ORDER BY g, i"
        ).collect()
        assert [r.n2 for r in rows] == ["a", "a", "a", "a", None]

    def test_lag_lead_ignore_nulls_duckdb_differential(self, ceng):
        """lag/lead IGNORE NULLS (rewritten to value functions over an
        explicit frame) — every shape cross-checked against DuckDB on the
        same rows: k=1 (last/first running state), k>1 (frame collect),
        and the 3-arg default form."""
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE nt AS SELECT * FROM (VALUES "
            "(1, 1, NULL), (1, 2, 'a'), (1, 3, NULL), (1, 4, 'b'), (2, 1, NULL)"
            ") t(g, i, v)"
        )
        shapes = [
            "lag(v) IGNORE NULLS",
            "lag(v, 2) IGNORE NULLS",
            "lead(v) IGNORE NULLS",
            "lead(v, 2) IGNORE NULLS",
            "lag(v, 1, 'dflt') IGNORE NULLS",
            "lead(v, 1, 'dflt') IGNORE NULLS",
        ]
        for shape in shapes:
            q = f"SELECT g, i, {shape} OVER (PARTITION BY g ORDER BY i) AS o FROM nt ORDER BY g, i"
            got = [r.o for r in ceng.execute(q).collect()]
            # DuckDB puts the null-treatment clause inside the parens
            dq = q.replace(") IGNORE NULLS", " IGNORE NULLS)")
            want = [r[2] for r in con.execute(dq).fetchall()]
            assert got == want, f"{shape}: spark={got} duckdb={want}"

    def test_lag_ignore_nulls_bad_offset(self, ceng):
        from qlbridge_spark.translate import TranslateError

        with pytest.raises((TranslateError, Exception), match="offset"):
            ceng.execute(
                "SELECT lag(v, 0) IGNORE NULLS OVER (PARTITION BY g ORDER BY i) FROM nt"
            ).collect()

    def test_ignore_nulls_outside_window_errors(self, ceng):
        from qlbridge_spark.translate import TranslateError

        with pytest.raises((TranslateError, Exception), match="IGNORE NULLS"):
            ceng.execute("SELECT count(v) IGNORE NULLS FROM nt").collect()

    def test_grouping_sets_positional_order(self, spark):
        # TODO-NEXT round-6 note: GROUPING SETS × positional ORDER BY
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("gs", spark.createDataFrame([("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "g string, h string, v int"))
        rows = e.execute(
            "SELECT g, h, sum(v) AS s FROM gs GROUP BY GROUPING SETS ((g, h), (g), ()) ORDER BY 1, 2, 3"
        ).collect()
        assert [(r.g, r.h, r.s) for r in rows] == [
            (None, None, 6), ("a", None, 3), ("a", "x", 1), ("a", "y", 2), ("b", None, 3), ("b", "x", 3)
        ]
