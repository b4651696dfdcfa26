"""Pluggable dialect registration: third parties define new statement
grammars at runtime.

Reference parity: ``lex.Dialect`` / ``lex.Clause``
(/root/reference/lex/dialect.go) and the worked example
(/root/reference/dialects/example/main.go:15-40), where a user registers a
"SUBSCRIBETO <columns> FROM <source> WHERE <expr>" PUBSUB dialect, injects
a new keyword token, and overrides the identity charset to allow dashes.

Python-idiomatic shape: a Dialect is a list of statement grammars, each an
ordered chain of Clauses (keyword + how to parse its span + optional flag).
``lex_dialect`` reproduces the reference's token-stream contract (custom
keywords become their own token kind); ``parse_dialect_statement`` produces
a CustomStatement whose clause payloads are parsed with the engine's own
machinery (select-columns / expressions / identities), so a custom
statement plugs directly into translation. ``Engine.register_dialect``
dispatches matching statements to a user handler — the runtime extension
point the reference exposes via dialect registration + a custom job
builder (exec.JobExecutor embedding, exec/executor.go:21-44).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .lexer import EOF, IDENT, Token, tokenize


class DialectError(ValueError):
    pass


@dataclass
class Clause:
    """One clause in a statement grammar (≈ lex.Clause, lex/dialect.go).

    ``parser`` picks how the clause's token span is parsed:
      - "columns":  select-column list (aliases, funcs) → list[rel.Column]
      - "expr":     one expression → expression AST Node
      - "filter":   a FilterQL expression (AND(...)/OR(...)/INCLUDE forms)
                    → expression AST Node
      - "identity": a (possibly dotted/dashed) source name → str
      - "raw":      unparsed text span → str
    """

    keyword: str
    parser: str = "raw"
    optional: bool = False
    name: str | None = None  # payload key; defaults to keyword.lower()

    @property
    def key(self) -> str:
        return self.name or self.keyword.lower()


@dataclass
class Dialect:
    """A named set of statement grammars (≈ lex.Dialect, lex/dialect.go)."""

    name: str
    statements: list[list[Clause]] = field(default_factory=list)
    # extra identity characters, ≈ lex.IDENTITY_CHARS override
    # (dialects/example/main.go:36)
    identity_chars: str = ""

    def leading_keywords(self) -> set[str]:
        return {chain[0].keyword.upper() for chain in self.statements if chain}


@dataclass
class CustomStatement:
    """Parse result of a custom-dialect statement."""

    dialect: str
    keyword: str  # leading keyword of the matched grammar
    clauses: dict[str, object] = field(default_factory=dict)
    raw: str = ""

    def get(self, key: str, default=None):
        return self.clauses.get(key, default)


def lex_dialect(text: str, dialect: Dialect) -> list[Token]:
    """Tokenize under a custom dialect: clause keywords become their own
    token kind (upper-cased keyword) — the token-injection contract of the
    reference example (main.go:33-37 TokenNameMap entry)."""
    keywords = {c.keyword.upper() for chain in dialect.statements for c in chain}
    out = []
    for t in tokenize(text, identity_chars=dialect.identity_chars):
        if t.kind == IDENT and t.upper in keywords:
            out.append(Token(t.upper, t.val, t.pos))
        else:
            out.append(t)
    return out


def _find_chain(dialect: Dialect, head: str) -> list[Clause]:
    for chain in dialect.statements:
        if chain and chain[0].keyword.upper() == head.upper():
            return chain
    raise DialectError(f"dialect {dialect.name!r} has no statement starting with {head!r}")


def _parse_span(parser: str, span: str):
    span = span.strip().rstrip(";").strip()
    if parser == "raw":
        return span
    if parser == "identity":
        return span
    if parser == "expr":
        from .exprparse import parse_expression

        return parse_expression(span)
    if parser == "filter":
        from .rel import parse_filterql

        return parse_filterql("FILTER " + span).filter
    if parser == "columns":
        from .rel import parse_sql

        return parse_sql(f"SELECT {span}").columns
    raise DialectError(f"unknown clause parser {parser!r}")


def parse_dialect_statement(text: str, dialect: Dialect) -> CustomStatement:
    """Parse ``text`` against the dialect's grammars: split the token stream
    on clause keywords in declared order, parse each span per its Clause."""
    toks = lex_dialect(text, dialect)
    if toks[0].kind == EOF:
        raise DialectError("empty statement")
    chain = _find_chain(dialect, toks[0].val)

    # positions of each clause keyword in the token stream, in chain order
    spans: dict[str, tuple[int, int]] = {}  # key -> (text_start, text_end)
    expected = list(chain)
    # locate keyword token indexes
    kw_positions: list[tuple[Clause, Token]] = []
    ti = 0
    for clause in expected:
        found = None
        for tj in range(ti, len(toks)):
            if toks[tj].kind == clause.keyword.upper():
                found = tj
                break
        if found is None:
            if clause.optional:
                continue
            raise DialectError(f"expected clause {clause.keyword!r} in {dialect.name!r} statement")
        kw_positions.append((clause, toks[found]))
        ti = found + 1

    for i, (clause, tok) in enumerate(kw_positions):
        start = tok.pos + len(tok.val)
        end = kw_positions[i + 1][1].pos if i + 1 < len(kw_positions) else len(text)
        spans[clause.key] = (start, end)

    stmt = CustomStatement(dialect=dialect.name, keyword=chain[0].keyword.upper(), raw=text)
    for clause, _ in kw_positions:
        s, e = spans[clause.key]
        stmt.clauses[clause.key] = _parse_span(clause.parser, text[s:e])
    return stmt


# ---------------------------------------------------------------------------
# global registry (module-level, ≈ the reference's package-level TokenNameMap
# injection; engines can also register locally via Engine.register_dialect)
# ---------------------------------------------------------------------------

_DIALECTS: dict[str, Dialect] = {}


def register_dialect(dialect: Dialect) -> None:
    _DIALECTS[dialect.name.lower()] = dialect


def unregister_dialect(name: str) -> None:
    _DIALECTS.pop(name.lower(), None)


def get_dialect(name: str) -> Dialect | None:
    return _DIALECTS.get(name.lower())
