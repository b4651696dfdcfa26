"""Lateral UNNEST, (VALUES ...) table constructors, and ANSI
NULLS FIRST/LAST ordering — all supersets (the reference grammar has
none of them: lex/dialect_sql.go statement list; VALUES exists only in
INSERT, rel/sql.go).

Plan shape: UNNEST lowers to a Generate (narrow, no shuffle); VALUES
lowers to a union of 1-row projections (never data-sized)."""

import pytest

from qlbridge_spark.engine import ExecError
from qlbridge_spark.rel import parse_sql
from qlbridge_spark.translate import TranslateError


@pytest.fixture(scope="module")
def eng(spark):
    from qlbridge_spark import Engine

    e = Engine(spark)
    e.register_df(
        "docs",
        spark.createDataFrame(
            [(1, ["a", "b"], "x"), (2, [], "y"), (3, ["c"], "z"), (4, None, "w")],
            "id int, toks array<string>, lab string",
        ),
    )
    e.register_df(
        "nv",
        spark.createDataFrame([(1, None), (2, 5), (3, 1), (4, None)], "id int, v int"),
    )
    return e


class TestValues:
    def test_basic(self, eng):
        rows = eng.execute(
            "SELECT t.a, t.b FROM (VALUES (1, 'one'), (2, 'two')) AS t(a, b) ORDER BY a"
        ).collect()
        assert [(r.a, r.b) for r in rows] == [(1, "one"), (2, "two")]

    def test_default_column_names(self, eng):
        df = eng.execute("SELECT * FROM (VALUES (10, 20)) AS t")
        assert df.columns == ["col0", "col1"]
        assert df.collect()[0][0] == 10

    def test_expressions_in_rows(self, eng):
        rows = eng.execute(
            "SELECT x FROM (VALUES (1 + 1), (10 * 2)) AS t(x) ORDER BY x"
        ).collect()
        assert [r.x for r in rows] == [2, 20]

    def test_join_against_table(self, eng):
        rows = eng.execute(
            "SELECT d.id, v.nm FROM docs d JOIN (VALUES (1, 'uno'), (3, 'tres')) AS v(k, nm)"
            " ON d.id = v.k ORDER BY d.id"
        ).collect()
        assert [(r.id, r.nm) for r in rows] == [(1, "uno"), (3, "tres")]

    def test_arity_mismatch_errors(self, eng):
        from qlbridge_spark.rel import ParseError

        with pytest.raises(ParseError):
            parse_sql("SELECT * FROM (VALUES (1, 2), (3)) AS t(a, b)")
        with pytest.raises(ExecError):
            eng.execute("SELECT * FROM (VALUES (1, 2)) AS t(a, b, c)")

    def test_type_coercion_across_rows(self, eng):
        rows = eng.execute(
            "SELECT x FROM (VALUES (1), (2.5)) AS t(x) ORDER BY x"
        ).collect()
        assert [r.x for r in rows] == [1.0, 2.5]


class TestUnnest:
    def test_cross_drops_empty_and_null(self, eng):
        rows = eng.execute(
            "SELECT d.id, u.tok FROM docs d, UNNEST(d.toks) AS u(tok) ORDER BY d.id, u.tok"
        ).collect()
        assert [(r.id, r.tok) for r in rows] == [(1, "a"), (1, "b"), (3, "c")]

    def test_left_keeps_empty_rows(self, eng):
        rows = eng.execute(
            "SELECT d.id, u.tok FROM docs d LEFT JOIN UNNEST(d.toks) AS u(tok) ON true"
            " ORDER BY d.id, u.tok"
        ).collect()
        ids = [(r.id, r.tok) for r in rows]
        assert (2, None) in ids and (4, None) in ids and (1, "a") in ids

    def test_with_ordinality(self, eng):
        rows = eng.execute(
            "SELECT d.id, u.tok, u.pos FROM docs d, UNNEST(d.toks) WITH ORDINALITY"
            " AS u(tok, pos) ORDER BY d.id, u.pos"
        ).collect()
        assert [(r.id, r.tok, r.pos) for r in rows] == [(1, "a", 1), (1, "b", 2), (3, "c", 1)]

    def test_ordinality_default_name(self, eng):
        df = eng.execute(
            "SELECT * FROM docs d, UNNEST(d.toks) WITH ORDINALITY AS u(tok)"
        )
        assert "ordinality" in df.columns

    def test_group_by_unnested(self, eng):
        rows = eng.execute(
            "SELECT u.tok, sum(d.id) AS s FROM docs d, UNNEST(d.toks) AS u(tok)"
            " GROUP BY u.tok ORDER BY u.tok"
        ).collect()
        assert [(r.tok, r.s) for r in rows] == [("a", 1), ("b", 1), ("c", 3)]

    def test_where_on_unnested(self, eng):
        rows = eng.execute(
            "SELECT tok FROM docs d, UNNEST(toks) AS u(tok) WHERE tok != 'b' ORDER BY tok"
        ).collect()
        assert [r.tok for r in rows] == ["a", "c"]

    def test_star_and_table_star(self, eng):
        df = eng.execute("SELECT * FROM docs d, UNNEST(toks) AS u(tok)")
        assert df.columns == ["id", "toks", "lab", "tok"]
        df2 = eng.execute("SELECT u.* FROM docs d, UNNEST(toks) AS u(tok)")
        assert df2.columns == ["tok"]

    def test_join_after_unnest(self, eng):
        rows = eng.execute(
            "SELECT d.id, u.tok, d2.lab FROM docs d, UNNEST(d.toks) AS u(tok), docs d2"
            " WHERE d.id = d2.id ORDER BY d.id, u.tok"
        ).collect()
        assert [(r.id, r.tok, r.lab) for r in rows] == [(1, "a", "x"), (1, "b", "x"), (3, "c", "z")]

    def test_alias_without_column_list(self, eng):
        rows = eng.execute(
            "SELECT d.id, u FROM docs d, UNNEST(d.toks) AS u ORDER BY d.id, u"
        ).collect()
        assert [r.u for r in rows] == ["a", "b", "c"]

    def test_expression_argument(self, eng):
        rows = eng.execute(
            "SELECT w FROM docs d, UNNEST(split(d.lab, ',')) AS t(w) WHERE d.id = 1"
        ).collect()
        assert [r.w for r in rows] == ["x"]

    def test_no_shuffle_plan(self, eng):
        plan = eng.execute(
            "SELECT d.id, u.tok FROM docs d, UNNEST(d.toks) AS u(tok)"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # Generate is narrow — lateral costs no shuffle
        assert "Generate" in plan

    def test_unnest_first_source_errors(self, eng):
        with pytest.raises(ExecError):
            eng.execute("SELECT * FROM UNNEST(array(1, 2)) AS t(x)")

    def test_on_condition_must_be_true(self, eng):
        with pytest.raises(ExecError):
            eng.execute(
                "SELECT * FROM docs d LEFT JOIN UNNEST(d.toks) AS u(tok) ON d.id = 1"
            )


class TestNullsOrdering:
    def test_desc_nulls_first(self, eng):
        rows = eng.execute("SELECT id FROM nv ORDER BY v DESC NULLS FIRST, id").collect()
        assert [r.id for r in rows] == [1, 4, 2, 3]

    def test_asc_nulls_last(self, eng):
        rows = eng.execute("SELECT id FROM nv ORDER BY v ASC NULLS LAST, id").collect()
        assert [r.id for r in rows] == [3, 2, 1, 4]

    def test_default_unchanged(self, eng):
        # Spark defaults: ASC→NULLS FIRST, DESC→NULLS LAST
        rows = eng.execute("SELECT id FROM nv ORDER BY v, id").collect()
        assert [r.id for r in rows] == [1, 4, 3, 2]

    def test_post_agg_qualified_order_key(self, eng):
        rows = eng.execute(
            "SELECT d.lab, count(*) AS n FROM docs d GROUP BY d.lab ORDER BY d.lab DESC"
        ).collect()
        assert [r.lab for r in rows] == ["z", "y", "x", "w"]

    def test_bad_nulls_keyword(self, eng):
        from qlbridge_spark.rel import ParseError

        with pytest.raises(ParseError):
            parse_sql("SELECT 1 FROM nv ORDER BY v NULLS MIDDLE")


class TestPivotUnpivot:
    @pytest.fixture(scope="class")
    def peng(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "sales",
            spark.createDataFrame(
                [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", "x", 4)],
                "grp string, cat string, amt int",
            ),
        )
        e.register_df(
            "wide",
            spark.createDataFrame(
                [("a", 1, 2), ("b", 3, 4), ("c", None, 5)], "k string, x int, y int"
            ),
        )
        return e

    def test_pivot_basic(self, peng):
        rows = peng.execute(
            "SELECT * FROM sales PIVOT (sum(amt) FOR cat IN ('x', 'y')) ORDER BY grp"
        ).collect()
        assert [(r.grp, r.x, r.y) for r in rows] == [("a", 1, 2), ("b", 7, None)]

    def test_pivot_value_aliases(self, peng):
        df = peng.execute(
            "SELECT * FROM sales PIVOT (sum(amt) FOR cat IN ('x' AS xx, 'y' AS yy)) p ORDER BY grp"
        )
        assert df.columns == ["grp", "xx", "yy"]

    def test_pivot_after_subquery_alias(self, peng):
        # implicit group keys = all columns not consumed by the agg or the
        # FOR column — project the inner select down to exactly those
        rows = peng.execute(
            "SELECT grp, x FROM (SELECT grp, cat FROM sales) s"
            " PIVOT (count(*) FOR cat IN ('x')) p ORDER BY grp"
        ).collect()
        assert [(r.grp, r.x) for r in rows] == [("a", 1), ("b", 2)]

    def test_pivot_plan_shape(self, peng):
        plan = peng.execute(
            "SELECT * FROM sales PIVOT (sum(amt) FOR cat IN ('x', 'y'))"
        )._jdf.queryExecution().executedPlan().toString()
        # explicit IN list → no distinct-values driver job; Spark lowers to
        # two agg levels ((grp,cat) then pivotfirst on grp), each with a
        # map-side partial — 2 exchanges over strictly shrinking data
        assert plan.count("Exchange") == 2
        assert "partial_sum" in plan and "partial_pivotfirst" in plan

    def test_pivot_non_agg_errors(self, peng):
        with pytest.raises(ExecError):
            peng.execute("SELECT * FROM sales PIVOT (abs(amt) FOR cat IN ('x'))")

    def test_unpivot_excludes_nulls_by_default(self, peng):
        rows = peng.execute(
            "SELECT * FROM wide UNPIVOT (val FOR name IN (x, y)) ORDER BY k, name"
        ).collect()
        assert [(r.k, r.name, r.val) for r in rows] == [
            ("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", "y", 4), ("c", "y", 5)
        ]

    def test_unpivot_include_nulls(self, peng):
        rows = peng.execute(
            "SELECT * FROM wide UNPIVOT INCLUDE NULLS (val FOR name IN (x, y)) WHERE k = 'c'"
        ).collect()
        assert sorted((r.name, r.val) for r in rows) == [("x", None), ("y", 5)]

    def test_unpivot_labels(self, peng):
        rows = peng.execute(
            "SELECT * FROM wide UNPIVOT (val FOR name IN (x AS 'ex', y AS 'why')) ORDER BY k, name"
        ).collect()
        assert {r.name for r in rows} == {"ex", "why"}

    def test_unpivot_unknown_column_errors(self, peng):
        with pytest.raises(ExecError):
            peng.execute("SELECT * FROM wide UNPIVOT (val FOR name IN (zz))")

    def test_pivot_then_join(self, peng):
        rows = peng.execute(
            "SELECT p.grp, p.x, w.y FROM sales PIVOT (sum(amt) FOR cat IN ('x','y')) p"
            " JOIN wide w ON p.grp = w.k ORDER BY p.grp"
        ).collect()
        assert [(r.grp, r.x, r.y) for r in rows] == [("a", 1, 2), ("b", 7, 4)]


class TestStarModifiersByAll:
    @pytest.fixture(scope="class")
    def seng(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "sales2",
            spark.createDataFrame(
                [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", "x", 4)],
                "grp string, cat string, amt int",
            ),
        )
        return e

    def test_group_by_all(self, seng):
        rows = seng.execute(
            "SELECT grp, cat, sum(amt) AS s FROM sales2 GROUP BY ALL ORDER BY grp, cat"
        ).collect()
        assert [(r.grp, r.cat, r.s) for r in rows] == [("a", "x", 1), ("a", "y", 2), ("b", "x", 7)]

    def test_group_by_all_expression_key(self, seng):
        rows = seng.execute(
            "SELECT toupper(grp) AS g, count(*) AS n FROM sales2 GROUP BY ALL ORDER BY g"
        ).collect()
        assert [(r.g, r.n) for r in rows] == [("A", 2), ("B", 2)]

    def test_order_by_all(self, seng):
        rows = seng.execute("SELECT grp, cat, amt FROM sales2 ORDER BY ALL").collect()
        assert [tuple(r) for r in rows] == [
            ("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", "x", 4)
        ]

    def test_order_by_all_desc_post_agg(self, seng):
        rows = seng.execute(
            "SELECT grp, sum(amt) AS s FROM sales2 GROUP BY ALL ORDER BY ALL DESC"
        ).collect()
        assert [(r.grp, r.s) for r in rows] == [("b", 7), ("a", 3)]

    def test_exclude(self, seng):
        assert seng.execute("SELECT * EXCLUDE (amt) FROM sales2").columns == ["grp", "cat"]

    def test_replace_keeps_position(self, seng):
        df = seng.execute("SELECT * REPLACE (amt * 10 AS amt) FROM sales2 ORDER BY ALL")
        assert df.columns == ["grp", "cat", "amt"]
        assert [r.amt for r in df.collect()] == [10, 20, 30, 40]

    def test_table_star_exclude(self, seng):
        assert seng.execute("SELECT s.* EXCLUDE (cat, amt) FROM sales2 s").columns == ["grp"]

    def test_exclude_and_replace_combined(self, seng):
        rows = seng.execute(
            "SELECT * EXCLUDE (cat) REPLACE (amt + 1 AS amt) FROM sales2 ORDER BY ALL LIMIT 2"
        ).collect()
        assert [tuple(r) for r in rows] == [("a", 2), ("a", 3)]

    def test_column_named_all_still_orders(self, seng, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("allt", spark.createDataFrame([(2,), (1,)], "all int"))
        # ALL here binds the keyword (== every output column) — same result
        assert [r[0] for r in e.execute("SELECT all FROM allt ORDER BY all").collect()] == [1, 2]


class TestSelectListUnnest:
    @pytest.fixture(scope="class")
    def ueng(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "zdocs",
            spark.createDataFrame(
                [(1, ["a", "b"], [10, 20, 30]), (2, [], []), (3, ["c"], [7])],
                "id int, toks array<string>, nums array<int>",
            ),
        )
        return e

    def test_single(self, ueng):
        rows = ueng.execute("SELECT id, unnest(toks) AS tok FROM zdocs ORDER BY id, tok").collect()
        assert [(r.id, r.tok) for r in rows] == [(1, "a"), (1, "b"), (3, "c")]

    def test_default_output_name(self, ueng):
        assert ueng.execute("SELECT id, unnest(toks) FROM zdocs").columns == ["id", "unnest"]

    def test_two_unnests_zip_with_null_padding(self, ueng):
        # DuckDB same-level semantics: zip element-wise, shorter side NULL
        rows = ueng.execute(
            "SELECT id, unnest(toks) AS t, unnest(nums) AS n FROM zdocs ORDER BY id, n NULLS LAST"
        ).collect()
        assert [(r.id, r.t, r.n) for r in rows] == [
            (1, "a", 10), (1, "b", 20), (1, None, 30), (3, "c", 7)
        ]

    def test_outer_filter_applies(self, ueng):
        rows = ueng.execute(
            "SELECT id, unnest(nums) AS n FROM zdocs WHERE id < 3 ORDER BY n"
        ).collect()
        assert [r.n for r in rows] == [10, 20, 30]

    def test_narrow_plan(self, ueng):
        plan = ueng.execute(
            "SELECT id, unnest(toks) AS t, unnest(nums) AS n FROM zdocs"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" in plan


class TestTablesample:
    def test_percent_repeatable_is_deterministic(self, eng, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("big", spark.range(1000).toDF("n"))
        a = [r.n for r in e.execute("SELECT n FROM big TABLESAMPLE (10 PERCENT) REPEATABLE (42) ORDER BY n").collect()]
        b = [r.n for r in e.execute("SELECT n FROM big TABLESAMPLE (10 PERCENT) REPEATABLE (42) ORDER BY n").collect()]
        assert a == b and 40 < len(a) < 200

    def test_rows_is_limit(self, eng, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("big2", spark.range(100).toDF("n"))
        assert e.execute("SELECT n FROM big2 TABLESAMPLE (7 ROWS)").count() == 7

    def test_sample_composes_with_where(self, eng, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("big3", spark.range(1000).toDF("n"))
        rows = e.execute(
            "SELECT n FROM big3 TABLESAMPLE (50 PERCENT) REPEATABLE (7) WHERE n < 100"
        ).collect()
        assert all(r.n < 100 for r in rows) and 20 < len(rows) < 80

    def test_bad_percent_errors(self, eng, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("big4", spark.range(10).toDF("n"))
        with pytest.raises(ExecError):
            e.execute("SELECT n FROM big4 TABLESAMPLE (150 PERCENT)")


class TestSelectUnnestComposition:
    def test_unnest_alias_as_group_key(self, eng, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("gu", spark.createDataFrame([(1, ["a", "b"]), (2, ["a"])], "id int, toks array<string>"))
        rows = e.execute(
            "SELECT unnest(toks) AS t, count(*) AS n FROM gu GROUP BY t ORDER BY t"
        ).collect()
        assert [(r.t, r.n) for r in rows] == [("a", 2), ("b", 1)]

    def test_distinct_on_with_star(self, eng, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("ds", spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k int, v string"))
        rows = e.execute("SELECT DISTINCT ON (k) * FROM ds ORDER BY k, v").collect()
        assert [(r.k, r.v) for r in rows] == [(1, "x"), (2, "z")]
