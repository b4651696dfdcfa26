"""Session/layout helpers, custom UDAF registration, ALTER parity, and
property-based parser robustness (hypothesis)."""

import pandas as pd
import pytest

from qlbridge_spark import ExecError


class TestSessionHelpers:
    def test_configure_sets_aqe(self, spark):
        from qlbridge_spark.session import configure

        configure(spark, shuffle_partitions=4)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"

    def test_write_table_partitioned(self, spark, tmp_path):
        from qlbridge_spark.session import write_table

        df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id long, grp string")
        out = str(tmp_path / "t1")
        write_table(df, out, partition_by=["grp"])
        back = spark.read.parquet(out)
        assert back.count() == 3
        # partition pruning: filter on grp reads one directory
        import os

        assert sorted(d for d in os.listdir(out) if d.startswith("grp=")) == ["grp=a", "grp=b"]


class TestUdaf:
    def test_agg_add_median(self, engine):
        # deliberately OVERRIDES the builtin median — runtime agg_add wins
        # over the registry (expr.FuncAdd semantics); restored after, the
        # registry is process-global
        from qlbridge_spark.functions import agg_add, registry

        def median(v: pd.Series) -> float:
            return float(v.median())

        saved = registry.get("median")
        agg_add("median", median, "double")
        try:
            df = engine.sql("SELECT user_id, median(price) AS med FROM orders GROUP BY user_id ORDER BY user_id")
            got = {r[0]: r[1] for r in df.collect()}
            assert got["9Ip1aKbeZe2njCDM"] == 30.0
            assert got["abcabcabc"] == 22.5
        finally:
            registry["median"] = saved


class TestAlterParity:
    def test_alter_parses_but_errors(self, engine):
        with pytest.raises(ExecError, match="ALTER"):
            engine.execute("ALTER TABLE users ADD COLUMN x int")


class TestParserProperties:
    def test_parser_never_crashes_unexpectedly(self):
        """Property: arbitrary text either parses or raises ParseError/
        LexError — never an unhandled exception type."""
        hypothesis = pytest.importorskip("hypothesis")
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from qlbridge_spark.exprparse import ParseError, parse_expression
        from qlbridge_spark.lexer import LexError

        @settings(max_examples=300, deadline=None)
        @given(st.text(max_size=60))
        def run(text):
            try:
                parse_expression(text)
            except (ParseError, LexError):
                pass

        run()

    def test_expression_sql_roundtrip_property(self):
        """Property: parse(x).sql() re-parses to the same sql()."""
        hypothesis = pytest.importorskip("hypothesis")
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from qlbridge_spark.exprparse import parse_expression

        idents = st.sampled_from(["a", "b1", "user_id", "t.col"])
        nums = st.integers(min_value=0, max_value=10**6).map(str)
        strs = st.sampled_from(['"x"', "'hello'", '"a b"'])
        atoms = st.one_of(idents, nums, strs)
        ops = st.sampled_from(["+", "-", "*", ">", ">=", "=", "!=", "AND", "OR", "LIKE", "IN"])

        @st.composite
        def exprs(draw, depth=0):
            if depth > 2 or draw(st.booleans()):
                return draw(atoms)
            op = draw(ops)
            l = draw(exprs(depth=depth + 1))
            r = draw(exprs(depth=depth + 1))
            if op == "IN":
                return f"{l} IN ({r}, {draw(atoms)})"
            return f"{l} {op} {r}"

        @settings(max_examples=200, deadline=None)
        @given(exprs())
        def run(text):
            n1 = parse_expression(text)
            n2 = parse_expression(n1.sql())
            assert n1.sql() == n2.sql()

        run()
