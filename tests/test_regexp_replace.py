"""regexp_replace semantics pin (round-7 directive #5).

The engine follows DuckDB/Postgres: FIRST match only unless the optional
4th ``flags`` arg contains ``g``; ``i`` etc. are inline-flag lowered.
Every case here is cross-checked against DuckDB live (ref syntax is
translated: engine/Spark use ``$N``, DuckDB/RE2 use ``\\N``)."""

from __future__ import annotations

import duckdb
import pytest

from qlbridge_spark import Engine


@pytest.fixture()
def eng(spark):
    e = Engine(spark, "re-test")
    e.register_rows(
        "t",
        [
            {"id": 1, "s": "banana"},
            {"id": 2, "s": "alpha beta"},
            {"id": 3, "s": "no-match-here!"},
            {"id": 4, "s": "a\nmultiline a"},
            {"id": 5, "s": None},
            {"id": 6, "s": "AAaa"},
        ],
    )
    return e


CASES = [
    # (pattern, replacement $-syntax, flags, duckdb replacement \-syntax)
    ("an", "X", "", "X"),
    ("an", "X", "g", "X"),
    ("a", "[$0]", "", r"[\0]"),
    ("(b)(a)", "$2$1", "", r"\2\1"),
    ("(b)(a)", "$2$1", "g", r"\2\1"),
    ("a+", "<>", "", "<>"),
    ("a+", "<>", "g", "<>"),
    ("A", "x", "i", "x"),
    ("A", "x", "ig", "x"),
    ("^a", "A", "", "A"),
    ("a$", "A", "", "A"),
    ("zzz", "nope", "", "nope"),
]


class TestRegexpReplaceDuckdbParity:
    def test_cases_match_duckdb(self, eng):
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE t AS SELECT * FROM (VALUES (1,'banana'), (2,'alpha beta'), "
            "(3,'no-match-here!'), (4, 'a' || chr(10) || 'multiline a'), (5, NULL), (6,'AAaa')) v(id, s)"
        )
        for pat, rep, flags, drep in CASES:
            fl = f", '{flags}'" if flags else ""
            got = {
                r["id"]: r["v"]
                for r in eng.sql(f"SELECT id, regexp_replace(s, '{pat}', '{rep}'{fl}) AS v FROM t").collect()
            }
            # DuckDB always takes 4 args; '' flags = first-only (its default)
            want = dict(
                con.sql(
                    f"SELECT id, regexp_replace(s, '{pat}', '{drep}', '{flags}') FROM t"
                ).fetchall()
            )
            assert got == want, (pat, rep, flags, got, want)

    def test_first_only_is_default(self, eng):
        rows = {r["id"]: r["v"] for r in eng.sql("SELECT id, regexp_replace(s, 'a', 'X') AS v FROM t").collect()}
        assert rows[1] == "bXnana"
        assert rows[5] is None

    def test_global_flag(self, eng):
        rows = {r["id"]: r["v"] for r in eng.sql("SELECT id, regexp_replace(s, 'a', 'X', 'g') AS v FROM t").collect()}
        assert rows[1] == "bXnXnX"

    def test_plan_stays_jvm(self, eng):
        plan = (
            eng.sql("SELECT regexp_replace(s, '(b)(a)', '$2$1') AS v FROM t")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
