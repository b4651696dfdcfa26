"""Pluggable dialect registration.

Reproduces the reference's worked example
(/root/reference/dialects/example/main.go:15-40): a user-defined PUBSUB
dialect with a new "SUBSCRIBETO" keyword, a custom identity charset
allowing dashes (lex.IDENTITY_CHARS override, main.go:36), token-stream
verification (verifyLexerTokens, main.go:44-52), and — beyond the
reference example — end-to-end execution through Engine.register_dialect.
"""

from __future__ import annotations

import pytest

from qlbridge_spark import Engine
from qlbridge_spark.dialect import (
    Clause,
    CustomStatement,
    Dialect,
    DialectError,
    get_dialect,
    lex_dialect,
    parse_dialect_statement,
    register_dialect,
    unregister_dialect,
)

PUBSUB = Dialect(
    name="Subscribe To",
    statements=[
        [
            Clause("SUBSCRIBETO", parser="columns"),
            Clause("FROM", parser="identity"),
            Clause("WHERE", parser="expr", optional=True),
        ]
    ],
    identity_chars="-",
)

EXAMPLE = """
SUBSCRIBETO
    count(x), Name
FROM ourstream
WHERE
    k = REPLACE(LOWER(Name),"cde","xxx");"""


class TestLexing:
    def test_token_stream_matches_reference_example(self):
        # ≈ verifyLexerTokens(main.go:88-117): keyword token then the
        # column/func/identity/value stream
        toks = lex_dialect(EXAMPLE, PUBSUB)
        got = [(t.kind, t.val) for t in toks[:18]]
        assert got[0] == ("SUBSCRIBETO", "SUBSCRIBETO")
        assert got[1] == ("IDENT", "count")
        assert got[2] == ("LPAREN", "(")
        assert got[3] == ("IDENT", "x")
        assert got[4] == ("RPAREN", ")")
        assert got[5] == ("COMMA", ",")
        assert got[6] == ("IDENT", "Name")
        assert got[7] == ("FROM", "FROM")
        assert got[8] == ("IDENT", "ourstream")
        assert got[9] == ("WHERE", "WHERE")
        assert got[10] == ("IDENT", "k")
        assert got[11] == ("OP", "=")
        assert got[12] == ("IDENT", "REPLACE")
        assert got[13] == ("LPAREN", "(")
        assert got[14] == ("IDENT", "LOWER")
        assert got[15] == ("LPAREN", "(")
        assert got[16] == ("IDENT", "Name")
        assert got[17] == ("RPAREN", ")")

    def test_identity_chars_override_allows_dash(self):
        # main.go:36: lex.IDENTITY_CHARS = "_./-"
        toks = lex_dialect("SUBSCRIBETO Name FROM our-stream", PUBSUB)
        assert ("IDENT", "our-stream") in [(t.kind, t.val) for t in toks]

    def test_keywords_case_insensitive(self):
        toks = lex_dialect("subscribeto Name from s", PUBSUB)
        kinds = [t.kind for t in toks]
        assert "SUBSCRIBETO" in kinds and "FROM" in kinds


class TestParsing:
    def test_clause_payloads(self):
        stmt = parse_dialect_statement(EXAMPLE, PUBSUB)
        assert isinstance(stmt, CustomStatement)
        assert stmt.keyword == "SUBSCRIBETO"
        cols = stmt.get("subscribeto")
        assert [c.output_name for c in cols] == ["count(x)", "Name"]
        assert stmt.get("from") == "ourstream"
        assert stmt.get("where").sql() == "(k = replace(lower(Name), 'cde', 'xxx'))"

    def test_optional_clause_omitted(self):
        stmt = parse_dialect_statement("SUBSCRIBETO Name FROM s", PUBSUB)
        assert stmt.get("where") is None
        assert stmt.get("from") == "s"

    def test_missing_required_clause_raises(self):
        with pytest.raises(DialectError, match="FROM"):
            parse_dialect_statement("SUBSCRIBETO Name WHERE x = 1", PUBSUB)

    def test_unknown_leading_keyword_raises(self):
        with pytest.raises(DialectError, match="no statement"):
            parse_dialect_statement("PUBLISHTO x FROM s", PUBSUB)


class TestRegistry:
    def test_global_registry_roundtrip(self):
        register_dialect(PUBSUB)
        assert get_dialect("subscribe to") is PUBSUB
        unregister_dialect("Subscribe To")
        assert get_dialect("subscribe to") is None


class TestEngineDispatch:
    def test_custom_statement_end_to_end(self, spark):
        """The part the reference example stops short of: the registered
        dialect drives real execution — SUBSCRIBETO lowers to a
        filter+project over the named source."""
        eng = Engine(spark, "dialect-test")
        eng.register_df(
            "ourstream",
            spark.createDataFrame(
                [("a", 5, "cde1"), ("b", 2, "xxx1"), ("c", 9, "cde1")],
                "Name string, x long, k string",
            ),
        )

        def handle_subscribeto(engine, stmt):
            df = engine.table(stmt.get("from"))
            if stmt.get("where") is not None:
                from qlbridge_spark import Scope, to_column

                df = df.filter(to_column(stmt.get("where"), Scope({"_": df}, strict=False)))
            from qlbridge_spark import Scope, to_column

            scope = Scope({"_": df}, strict=False)
            from qlbridge_spark.functions import is_agg_tree

            if any(is_agg_tree(c.expr) for c in stmt.get("subscribeto")):
                aggs = [to_column(c.expr, scope).alias(c.output_name) for c in stmt.get("subscribeto") if is_agg_tree(c.expr)]
                keys = [to_column(c.expr, scope).alias(c.output_name) for c in stmt.get("subscribeto") if not is_agg_tree(c.expr)]
                return df.groupBy(*keys).agg(*aggs).select(*[c.output_name for c in stmt.get("subscribeto")])
            return df.select(*[to_column(c.expr, scope).alias(c.output_name) for c in stmt.get("subscribeto")])

        eng.register_dialect(PUBSUB, handle_subscribeto)

        out = eng.execute('SUBSCRIBETO count(x) AS n, Name FROM ourstream WHERE k LIKE "cde%"')
        rows = {(r["Name"], r["n"]) for r in out.collect()}
        assert rows == {("a", 1), ("c", 1)}

        # plain SQL still routes through the normal parser
        assert eng.sql("SELECT count(*) AS c FROM ourstream").collect()[0]["c"] == 3

    def test_dialect_composes_with_filterql(self, spark):
        """Second grammar: ALERT <name> FROM <src> WHEN <filterql> — shows a
        custom statement embedding the engine's own FilterQL sub-language
        (Clause(parser='filter')), like the reference dialects reuse
        lex.LexColumns/LexExpression sub-lexers."""
        alert = Dialect(
            name="alerts",
            statements=[
                [
                    Clause("ALERT", parser="identity"),
                    Clause("FROM", parser="identity"),
                    Clause("WHEN", parser="filter"),
                ]
            ],
        )
        eng = Engine(spark, "alert-test")
        eng.register_df(
            "metrics",
            spark.createDataFrame(
                [("m1", 95.0, "prod"), ("m2", 20.0, "prod"), ("m3", 99.0, "dev")],
                "name string, cpu double, env string",
            ),
        )
        fired = {}

        def handle_alert(engine, stmt):
            from qlbridge_spark import Scope, to_column

            df = engine.table(stmt.get("from"))
            hits = df.filter(to_column(stmt.get("when"), Scope({"_": df}, strict=False)))
            fired[stmt.get("alert")] = [r["name"] for r in hits.collect()]
            return hits

        eng.register_dialect(alert, handle_alert)
        out = eng.execute('ALERT high_cpu FROM metrics WHEN AND (cpu > 90, env = "prod")')
        assert fired == {"high_cpu": ["m1"]}
        assert out.count() == 1
