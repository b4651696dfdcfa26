"""Shim tests: integer division, uncoercible comparisons, jmespath
complex-path fallback."""


class TestIntDivision:
    def test_int_div_truncates(self, evals):
        # vm/vm.go:1144 — int/int is integer division
        got = evals(["int5 / 2", "int5 / 2.0", "7 / 2", "7.0 / 2"])
        assert got[0] == 2
        assert got[1] == 2.5
        assert got[2] == 3
        assert got[3] == 3.5

    def test_div_by_zero_is_null(self, evals):
        # reference errors per-row → not-ok; we produce NULL (excluded in
        # filters). Divergence note: Go float /0 gives +Inf; ANSI Spark
        # would error the whole query — NULL is the closest row-level
        # behavior for both.
        got = evals(["int5 / 0", "int5 / 0.0"])
        assert got[0] is None
        assert got[1] is None

    def test_modulus(self, evals):
        assert evals(["int5 % 2", "int5 % 3"]) == [1, 2]


class TestUncoercibleComparison:
    def test_numeric_vs_garbage_string_excluded(self, engine):
        # 'abc' can't coerce to number → not-true for BOTH = and !=
        # (vm/vm.go:350-366 not-ok propagation)
        df = engine.sql('SELECT user_id FROM users WHERE referral_count = "abc"')
        assert df.count() == 0
        df2 = engine.sql('SELECT user_id FROM users WHERE referral_count != "abc"')
        assert df2.count() == 0

    def test_numeric_vs_numeric_string_works(self, engine):
        df = engine.sql('SELECT user_id FROM users WHERE referral_count = "82"')
        assert df.count() == 1

    def test_string_vs_long_exact_above_2_53(self, spark):
        # ParseInt branch (vm/vm.go:350-366) compares exactly as int64;
        # a blanket double cast would collapse 2^53 and 2^53+1
        from qlbridge_spark import Engine

        eng = Engine(spark, "exactcmp")
        big = (1 << 53) + 1
        eng.register_rows(
            "t",
            [
                {"id": 1, "s": str(big), "n": big},
                {"id": 2, "s": str(1 << 53), "n": big},
                {"id": 3, "s": "9.5", "n": 9},  # ParseFloat fallback path
            ],
        )
        assert [r["id"] for r in eng.sql("SELECT id FROM t WHERE s = n").collect()] == [1]
        assert [r["id"] for r in eng.sql("SELECT id FROM t WHERE s < n").collect()] == [2]
        assert [r["id"] for r in eng.sql("SELECT id FROM t WHERE s > 9").collect()] == [1, 2, 3]


class TestJmespathComplex:
    def test_complex_jmespath_expression(self, spark):
        from qlbridge_spark import Engine

        eng = Engine(spark)
        eng.register_rows(
            "j",
            [
                {"id": 1, "data": '{"users": [{"name": "a", "age": 30}, {"name": "b", "age": 10}]}'},
                {"id": 2, "data": '{"users": []}'},
            ],
        )
        df = eng.sql("SELECT id, json.jmespath(data, \"users[?age > `20`].name | [0]\") AS adult FROM j ORDER BY id")
        got = [tuple(r) for r in df.collect()]
        assert got == [(1, "a"), (2, None)]
        eng.execute("DROP TABLE j")

    def test_simple_path_stays_native(self, evals):
        assert evals(['json.jmespath(json_data, "name")']) == ["aaron"]


class TestLenientFilterScopes:
    def test_missing_field_in_filterql_not_matched(self, engine):
        # reference VM: missing field => predicate not-true, no error
        # (vm/vm.go:252-274); SQL SELECT of unknown columns still errors
        df = engine.execute("FILTER nonexistent_field > 5 FROM users")
        assert df.count() == 0

    def test_missing_field_exists_false(self, spark):
        from qlbridge_spark.vm import matches

        assert not matches(spark, {"x": 1}, "FILTER EXISTS some_missing_field")
        assert matches(spark, {"x": 1}, "FILTER OR(EXISTS missing, x > 0)")

    def test_sql_select_unknown_column_still_errors(self, engine):
        import pytest

        from qlbridge_spark import TranslateError

        with pytest.raises((TranslateError, ValueError)):
            engine.sql("SELECT nonexistent_field FROM users")


class TestAdviceFixes:
    """Round-2 advisor items: calendar datemath, streaming runtime datemath,
    ambiguous bare columns, join() empty-skip, DateConverter recursion."""

    def test_datemath_calendar_months(self):
        from datetime import datetime

        from qlbridge_spark.translate import parse_datemath

        # Go AddDate normalization: Mar 31 - 1M = Feb 31 → Mar 2/3
        assert parse_datemath("now-1M", datetime(2024, 3, 31, 12, 0)) == datetime(2024, 3, 2, 12, 0)
        assert parse_datemath("now-1M", datetime(2024, 3, 15)) == datetime(2024, 2, 15)
        assert parse_datemath("now+1y", datetime(2024, 2, 29)) == datetime(2025, 3, 1)  # leap → normalized
        assert parse_datemath("now-2y", datetime(2024, 6, 1)) == datetime(2022, 6, 1)
        # case-insensitive "now", units stay case-sensitive (M=month, m=minute)
        assert parse_datemath("NOW-3d", datetime(2024, 6, 10)) == datetime(2024, 6, 7)
        assert parse_datemath("now-1m", datetime(2024, 6, 10, 0, 1)) == datetime(2024, 6, 10, 0, 0)

    def test_streaming_datemath_is_runtime_expr(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from qlbridge_spark.exprparse import parse_expression
        from qlbridge_spark.translate import Scope, to_column

        batch = spark.createDataFrame([], "ts timestamp, v long")
        batch.write.mode("overwrite").parquet(str(tmp_path / "s"))
        stream = spark.readStream.schema(batch.schema).parquet(str(tmp_path / "s"))
        col = to_column(parse_expression('ts > "now-1h"'), Scope({"_": stream}))
        expr = str(col)
        assert "current_timestamp" in expr and "INTERVAL" in expr.upper(), expr
        # batch scope still resolves to a literal (no runtime re-eval cost)
        col_b = str(to_column(parse_expression('ts > "now-1h"'), Scope({"_": batch})))
        assert "current_timestamp" not in col_b

    def test_ambiguous_bare_column_errors(self, spark):
        import pytest as _pytest

        from qlbridge_spark.exprparse import parse_expression
        from qlbridge_spark.translate import Scope, TranslateError, to_column

        a = spark.createDataFrame([(1, "x")], "id long, v string").alias("a")
        b = spark.createDataFrame([(2, "y")], "id long, w string").alias("b")
        scope = Scope({"a": a, "b": b})
        with _pytest.raises(TranslateError, match="ambiguous"):
            to_column(parse_expression("id > 1"), scope)
        # qualified stays fine; unique bare names stay fine
        to_column(parse_expression("a.id > 1"), scope)
        to_column(parse_expression("v = 'x'"), scope)

    def test_join_skips_empty_strings(self, spark):
        from qlbridge_spark.exprparse import parse_expression
        from qlbridge_spark.translate import Scope, to_column

        df = spark.createDataFrame([("a", "", "b")], "x string, y string, z string")
        out = df.select(to_column(parse_expression('join(x, y, z, "-")'), Scope({"_": df})).alias("j")).collect()[0][0]
        assert out == "a-b"  # reference joinEval drops empties (string.go:296-321)

    def test_dateconverter_recurses_funcs_and_includes(self):
        from datetime import datetime, timedelta

        from qlbridge_spark.datemath_boundary import DateConverter

        now = datetime(2024, 6, 10, 12, 0)
        ctx = {"last_event": now - timedelta(days=2)}
        # datemath inside a function wrapper
        dc = DateConverter(ctx, 'oneof(last_event, "now-3d") > "now-3d"', now=now)
        assert dc.has_date_math
        # datemath reached through INCLUDE
        dc2 = DateConverter(ctx, "INCLUDE recent", now=now, includes={"recent": 'last_event > "now-3d"'})
        assert dc2.has_date_math
        assert dc2.boundary() == now + timedelta(days=1)
        # uppercase NOW detected
        dc3 = DateConverter(ctx, 'last_event > "NOW-3d"', now=now)
        assert dc3.has_date_math
