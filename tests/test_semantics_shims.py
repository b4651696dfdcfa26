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
