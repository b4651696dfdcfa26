"""Lexer + parser tests (pure Python, no Spark) — modeled on the
reference's table-driven lexer tests (lex/*_test.go) and parse→String()
round-trips (rel/parse_sql_test.go)."""

import pytest

from qlbridge_spark.exprparse import ParseError, parse_expression
from qlbridge_spark.lexer import tokenize
from qlbridge_spark.nodes import (
    ArrayNode,
    BinaryNode,
    FuncNode,
    IdentityNode,
    NumberNode,
    TriNode,
    UnaryNode,
)
from qlbridge_spark.rel import (
    FilterStatement,
    SqlCreate,
    SqlDelete,
    SqlInsert,
    SqlSelect,
    SqlShow,
    SqlUpdate,
    parse_filterql,
    parse_sql,
    parse_sql_statements,
)


class TestLexer:
    def test_tokens(self):
        toks = tokenize('SELECT a, `b c`, "str", 1.5e3, x.y FROM t;')
        kinds = [t.kind for t in toks]
        assert kinds == ["IDENT", "IDENT", "COMMA", "QIDENT", "COMMA", "STRING", "COMMA", "NUMBER", "COMMA", "IDENT", "IDENT", "IDENT", "SEMI", "EOF"]

    def test_comments_skipped(self):
        toks = tokenize("a -- comment\n + /* block */ b # hash")
        assert [t.val for t in toks[:-1]] == ["a", "+", "b"]

    def test_string_escapes(self):
        toks = tokenize(r'"a\"b" ' + r"'c\'d'")
        assert toks[0].val == 'a"b'
        assert toks[1].val == "c'd"


class TestExprParse:
    def test_precedence(self):
        n = parse_expression("a + 5 * 2 > b AND c OR d")
        assert isinstance(n, BinaryNode) and n.op == "OR"
        assert n.left.op == "AND"
        assert n.left.left.op == ">"
        assert n.left.left.left.op == "+"
        assert n.left.left.left.right.op == "*"

    def test_between_exclusive_shape(self):
        n = parse_expression("x BETWEEN 3 AND 10")
        assert isinstance(n, TriNode) and n.op == "BETWEEN" and not n.negated

    def test_not_between(self):
        n = parse_expression("x NOT BETWEEN 3 AND 10")
        assert isinstance(n, TriNode) and n.negated

    def test_negated_in(self):
        n = parse_expression("x NOT IN (1, 2, 3)")
        assert isinstance(n, BinaryNode) and n.op == "IN" and n.negated
        assert isinstance(n.right, ArrayNode) and len(n.right.items) == 3

    def test_array_literals(self):
        n = parse_expression("[1, 2, 3]")
        assert isinstance(n, ArrayNode)
        n2 = parse_expression('("a", "b")')
        assert isinstance(n2, ArrayNode)

    def test_dotted_function_name(self):
        n = parse_expression('string.lowercase("ABC")')
        assert isinstance(n, FuncNode) and n.name == "string.lowercase"

    def test_backtick_identity(self):
        n = parse_expression("`users`.`user_id` != NULL")
        assert isinstance(n.left, IdentityNode) and n.left.parts == ("users", "user_id")

    def test_map_dotted_identity(self):
        n = parse_expression("hits.`google.com` > 2")
        assert n.left.parts == ("hits", "google.com")

    def test_count_star_and_distinct(self):
        n = parse_expression("count(*)")
        assert isinstance(n.args[0], IdentityNode) and n.args[0].is_star
        n2 = parse_expression("count(DISTINCT email)")
        assert n2.args[0].name == "distinct"

    def test_cast_as(self):
        n = parse_expression("cast(email AS char)")
        assert n.name == "cast" and n.args[1].value == "char"

    def test_unary(self):
        n = parse_expression("NOT EXISTS email")
        assert isinstance(n, UnaryNode) and n.op == "NOT"
        assert isinstance(n.child, UnaryNode) and n.child.op == "EXISTS"

    def test_trailing_garbage_errors(self):
        with pytest.raises(ParseError):
            parse_expression("a + 5 banana oops(")

    def test_roundtrip_sql(self):
        for e in ["((a + 5) > tolower(b))", "(x IN (1, 2, 3))", "(email LIKE '%aaron%')"]:
            assert parse_expression(e).sql() == e


class TestSqlParse:
    def test_select_full_clause_set(self):
        s = parse_sql(
            """SELECT DISTINCT a, sum(b) AS total, c IF d > 1 FROM t1
               JOIN t2 ON t1.id = t2.id WHERE x > 5 GROUP BY a
               HAVING sum(b) > 10 ORDER BY total DESC, a LIMIT 10 OFFSET 2"""
        )
        assert isinstance(s, SqlSelect) and s.distinct
        assert len(s.columns) == 3 and s.columns[1].alias == "total"
        assert s.columns[2].guard is not None
        assert len(s.from_) == 2 and s.from_[1].join_type == "INNER"
        assert s.group_by and s.having is not None
        assert s.order_by[0][1] == "DESC" and s.limit == 10 and s.offset == 2

    def test_join_variants(self):
        s = parse_sql("SELECT * FROM a LEFT OUTER JOIN b ON a.x = b.x RIGHT JOIN c ON b.y = c.y")
        assert s.from_[1].join_type == "LEFT OUTER"
        assert s.from_[2].join_type == "RIGHT"

    def test_subquery_from(self):
        s = parse_sql("SELECT z FROM (SELECT a AS z FROM t) AS sub")
        assert s.from_[0].subquery is not None and s.from_[0].alias == "sub"

    def test_in_select_subquery(self):
        s = parse_sql("SELECT a FROM t WHERE a IN (SELECT b FROM u)")
        from qlbridge_spark.rel import SubqueryNode

        assert isinstance(s.where.right, SubqueryNode)

    def test_literal_select_no_from(self):
        s = parse_sql('SELECT 1, "hello";')
        assert not s.from_ and len(s.columns) == 2

    def test_insert_values(self):
        s = parse_sql('INSERT INTO users (user_id, email) VALUES ("a", "a@x.com"), ("b", "b@x.com")')
        assert isinstance(s, SqlInsert) and len(s.rows) == 2 and s.columns == ["user_id", "email"]

    def test_update(self):
        s = parse_sql('UPDATE users SET email = "z@x.com", n = 5 WHERE user_id = "a"')
        assert isinstance(s, SqlUpdate) and set(s.values) == {"email", "n"} and s.where is not None

    def test_delete(self):
        s = parse_sql("DELETE FROM users WHERE n < 5")
        assert isinstance(s, SqlDelete)

    def test_create_source_with_json(self):
        s = parse_sql('CREATE SOURCE csv_files WITH {"type": "csv", "path": "/tmp/x.csv", "options": {"sep": "|"}}')
        assert isinstance(s, SqlCreate) and s.tok == "SOURCE"
        assert s.with_["options"]["sep"] == "|"

    def test_create_view_as_select(self):
        s = parse_sql("CREATE VIEW v AS SELECT a FROM t")
        assert s.tok == "VIEW" and s.select is not None

    def test_show_describe(self):
        assert isinstance(parse_sql("SHOW TABLES"), SqlShow)
        assert parse_sql("SHOW FULL COLUMNS FROM users").ident == "users"
        assert parse_sql('SHOW TABLES LIKE "us%"').like == "us%"

    def test_multi_statements(self):
        stmts = parse_sql_statements("SELECT 1; SELECT 2; SHOW TABLES")
        assert len(stmts) == 3

    def test_prepare_not_implemented(self):
        with pytest.raises(ParseError):
            parse_sql("PREPARE stmt FROM SELECT 1")


class TestFilterQL:
    def test_nary_and(self):
        f = parse_filterql('FILTER AND(x > 5, y != "a", INCLUDE other) FROM t LIMIT 10 ALIAS myfilter')
        assert isinstance(f, FilterStatement)
        assert f.from_ == "t" and f.limit == 10 and f.alias == "myfilter"
        assert len(f.filter.args) == 3

    def test_nested_or_not(self):
        f = parse_filterql("FILTER OR(AND(a > 1, b < 2), NOT INCLUDE f2)")
        assert f.filter.op == "OR"
        assert f.filter.args[1].negated

    def test_match_all(self):
        from qlbridge_spark.nodes import MatchAllNode

        f = parse_filterql("FILTER * FROM t")
        assert isinstance(f.filter, MatchAllNode)

    def test_with_payload(self):
        f = parse_filterql('FILTER x > 1 FROM t WITH {"backfill": true}')
        assert f.with_["backfill"] is True


class TestParseRoundTrip:
    def test_sql_rendering_is_stable_fixpoint(self):
        """node.sql() must itself re-parse to an AST whose .sql() is
        identical (render→parse→render is a fixpoint) — guards against
        precedence/parenthesization drift across the whole grammar."""
        import random

        from qlbridge_spark.exprparse import parse_expression

        rnd = random.Random(424242)
        fields_num = ["age", "score", "zero"]
        fields_str = ["name", "email"]

        def gen(depth):
            kind = rnd.random()
            if depth <= 0 or kind < 0.25:
                return rnd.choice(fields_num + fields_str + ["7", "3.25", '"lit"', "true", "NULL"])
            if kind < 0.45:
                return f"({gen(depth-1)} {rnd.choice(['+', '-', '*', '/', '%'])} {gen(depth-1)})"
            if kind < 0.65:
                return f"({gen(depth-1)} {rnd.choice(['>', '<', '>=', '<=', '=', '!='])} {gen(depth-1)})"
            if kind < 0.8:
                return f"({gen(depth-1)} {rnd.choice(['AND', 'OR'])} {gen(depth-1)})"
            if kind < 0.9:
                return f"NOT ({gen(depth-1)})"
            return rnd.choice([
                f"tolower({gen(depth-1)})",
                f"coalesce({gen(depth-1)}, {gen(depth-1)})",
                f"({rnd.choice(fields_num)} BETWEEN 1 AND 9)",
                f'({rnd.choice(fields_str)} LIKE "a%")',
                f"EXISTS {rnd.choice(fields_str)}",
            ])

        for _ in range(300):
            text = gen(3)
            first = parse_expression(text).sql()
            second = parse_expression(first).sql()
            assert first == second, f"not a fixpoint: {text!r} → {first!r} → {second!r}"
