"""Tokenizer for the qlbridge dialects (SQL / FilterQL / expressions).

Reference behavior: /root/reference/lex/lexer.go (table-driven state
machine) and lex/dialect_sql.go. We use a single regex-based tokenizer
for all three dialects — the dialect differences live in the parsers.

Token conventions (matching the reference's lexer):
- backtick-quoted identifiers (``` `users`.`user_id` ```), lex/lexer.go IdentityQuoting
- single- OR double-quoted string literals
- dotted bare identifiers (``users.user_id``) lex to one IDENT
- ``--``, ``#`` and ``/* */`` comments are skipped
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# token kinds
NUMBER = "NUMBER"
STRING = "STRING"
IDENT = "IDENT"  # bare identifier, may contain dots
QIDENT = "QIDENT"  # backtick-quoted identifier part (no dots split)
OP = "OP"
LPAREN, RPAREN = "LPAREN", "RPAREN"
LBRACKET, RBRACKET = "LBRACKET", "RBRACKET"
LBRACE = "LBRACE"
COMMA, SEMI = "COMMA", "SEMI"
EOF = "EOF"


@dataclass
class Token:
    kind: str
    val: str
    pos: int

    @property
    def upper(self) -> str:
        return self.val.upper()

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.kind}:{self.val!r}>"


def _build_token_re(identity_chars: str = "") -> re.Pattern:
    """Build the tokenizer regex. ``identity_chars`` adds extra characters
    to bare identifiers — the reference's ``lex.IDENTITY_CHARS`` override
    used by custom dialects (/root/reference/dialects/example/main.go:36
    sets ``lex.IDENTITY_CHARS = "_./-"`` to allow dashes in identities)."""
    extra = re.escape("".join(c for c in identity_chars if c not in "_.*"))
    return re.compile(
        r"""
  (?P<ws>\s+)
| (?P<comment>--[^\n]*|\#[^\n]*|//[^\n]*|/\*.*?\*/)
| (?P<number>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
| (?P<bq>`(?:[^`]|``)*`)
| (?P<dq>"(?:[^"\\]|\\.)*")
| (?P<sq>'(?:[^'\\]|\\.)*')
| (?P<op>->|<=|>=|!=|<>|==|=~|!~|=|<|>|\|\||&&|[-+*/%!.:])
| (?P<punct>[(),;\[\]{}])
| (?P<ident>[A-Za-z_][A-Za-z0-9_IDENTEXTRA]*(?:\.[A-Za-z_*][A-Za-z0-9_*IDENTEXTRA]*)*)
| (?P<param>[@?][@A-Za-z0-9_.]*)
""".replace("IDENTEXTRA", extra),
        re.X | re.S,
    )


_TOKEN_RE = _build_token_re()
_RE_CACHE: dict[str, re.Pattern] = {"": _TOKEN_RE}

_PUNCT_KIND = {
    "(": LPAREN,
    ")": RPAREN,
    "[": LBRACKET,
    "]": RBRACKET,
    "{": LBRACE,
    "}": "RBRACE",
    ",": COMMA,
    ";": SEMI,
}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(_ESCAPES.get(s[i + 1], "\\" + s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class LexError(ValueError):
    pass


def tokenize(text: str, identity_chars: str = "") -> list[Token]:
    """Lex ``text`` into a token list terminated by an EOF token.

    ``identity_chars``: extra characters allowed inside bare identifiers
    (custom-dialect hook, ≈ lex.IDENTITY_CHARS)."""
    token_re = _RE_CACHE.get(identity_chars)
    if token_re is None:
        token_re = _RE_CACHE[identity_chars] = _build_token_re(identity_chars)
    toks: list[Token] = []
    pos = 0
    n = len(text)
    qmark = 0  # positional ?-parameters number left-to-right: ?0, ?1, ...
    while pos < n:
        m = token_re.match(text, pos)
        if m is None:
            raise LexError(f"unexpected character {text[pos]!r} at {pos}: {text[max(0,pos-20):pos+20]!r}")
        kind = m.lastgroup
        val = m.group()
        if kind in ("ws", "comment"):
            pos = m.end()
            continue
        if kind == "number":
            toks.append(Token(NUMBER, val, pos))
        elif kind == "bq":
            toks.append(Token(QIDENT, val[1:-1].replace("``", "`"), pos))
        elif kind in ("dq", "sq"):
            toks.append(Token(STRING, _unescape(val[1:-1]), pos))
        elif kind == "op":
            toks.append(Token(OP, val, pos))
        elif kind == "punct":
            toks.append(Token(_PUNCT_KIND[val], val, pos))
        elif kind == "ident":
            toks.append(Token(IDENT, val, pos))
        elif kind == "param":
            if val == "?":  # bare qmark (PEP 249 paramstyle) → positional
                val = f"?{qmark}"
                qmark += 1
            toks.append(Token(IDENT, val, pos))
        pos = m.end()
    toks.append(Token(EOF, "", n))
    return toks


def extract_json_blob(text: str, start: int) -> tuple[str, int]:
    """Extract a balanced ``{...}`` JSON blob starting at/after ``start``.

    Used for ``CREATE SOURCE x WITH { json }`` / ``FILTER ... WITH {...}``
    payloads (reference: lex/dialect_json.go drives a JSON sub-lexer).
    Returns (blob_text, end_pos).
    """
    i = text.index("{", start)
    depth = 0
    in_str: str | None = None
    j = i
    while j < len(text):
        c = text[j]
        if in_str:
            if c == "\\":
                j += 2
                continue
            if c == in_str:
                in_str = None
        elif c in "\"'":
            in_str = c
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[i : j + 1], j + 1
        j += 1
    raise LexError("unbalanced JSON blob")
