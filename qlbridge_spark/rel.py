"""Statement ASTs + SQL / FilterQL parsers.

Covers the reference's statement surface (/root/reference/rel/parse_sql.go,
rel/parse_filterql.go, lex/dialect_sql.go:30-50): SELECT (joins, group by,
having, order by, limit/offset, distinct, star, column IF-guards, aliases,
subquery FROM, IN (SELECT..)), INSERT/UPDATE/UPSERT/DELETE, CREATE
SOURCE/SCHEMA/VIEW/CONTINUOUSVIEW/TABLE, DROP, SHOW, DESCRIBE, SET, USE,
and FilterQL FILTER statements.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .exprparse import ExprParser, ParseError
from .lexer import (
    COMMA,
    EOF,
    IDENT,
    LPAREN,
    NUMBER,
    OP,
    QIDENT,
    RPAREN,
    SEMI,
    STRING,
    Token,
    extract_json_blob,
    tokenize,
)
from .nodes import (
    BooleanNode,
    FuncNode,
    IdentityNode,
    IncludeNode,
    MatchAllNode,
    Node,
    StringNode,
    UnaryNode,
)


# --------------------------------------------------------------------------
# statement ASTs (≈ rel/sql.go, rel/filter.go)
# --------------------------------------------------------------------------
@dataclass
class Column:
    """One select column (rel/sql.go Column): expr [IF guard] [AS alias]."""

    expr: Node
    alias: str | None = None
    guard: Node | None = None  # non-standard `col IF expr` (exec/projection.go:158-175)
    exclude: list[str] = field(default_factory=list)  # * EXCLUDE (a, b) — DuckDB superset
    replace: dict = field(default_factory=dict)  # * REPLACE (expr AS a) — name → Node

    @property
    def is_star(self) -> bool:
        return isinstance(self.expr, IdentityNode) and self.expr.is_star

    @property
    def output_name(self) -> str:
        if self.alias:
            return self.alias
        if isinstance(self.expr, IdentityNode):
            return self.expr.parts[-1]
        return self.expr.sql()


@dataclass
class FromSource:
    """FROM clause element (rel/sql.go:126-133). Supersets: ``UNNEST(expr)
    [WITH ORDINALITY]`` lateral table functions and ``(VALUES …)`` row
    constructors — neither exists in the reference grammar
    (lex/dialect_sql.go statement list)."""

    name: str | None = None
    alias: str | None = None
    subquery: "SqlSelect | None" = None
    join_type: str = ""  # "", INNER, LEFT, RIGHT, OUTER, CROSS, FULL
    join_expr: Node | None = None
    unnest: Node | None = None  # UNNEST(<array expr>) lateral source
    unnest_zip: list | None = None  # >1 select-list unnests zip element-wise
    ordinality: bool = False  # UNNEST(...) WITH ORDINALITY
    out_cols: list[str] = field(default_factory=list)  # AS t(c1, c2, ...)
    values_rows: list | None = None  # (VALUES (...), (...)) rows of Nodes
    # PIVOT (agg(expr) FOR col IN (v [AS name], ...)):
    #   {"agg": FuncNode, "for": str, "in": [(literal Node, alias|None), ...]}
    pivot: dict | None = None
    # UNPIVOT [INCLUDE NULLS] (val FOR name IN (c1 [AS 'label'], ...)):
    #   {"value": str, "name": str, "cols": [(colname, label|None)], "include_nulls": bool}
    unpivot: dict | None = None
    # TABLESAMPLE (p PERCENT | n ROWS) [REPEATABLE (seed)]:
    #   {"kind": "percent"|"rows", "value": float|int, "seed": int|None}
    sample: dict | None = None
    #: time travel (`FROM t VERSION AS OF n`) — resolved against a
    #: versioned sink's snapshot
    version: int | None = None
    #: `FROM t TIMESTAMP AS OF '<ts>'` — latest snapshot committed at or
    #: before the wall time (resolved via sink commit times)
    as_of_ts: str | None = None
    lateral: bool = False  # LATERAL (SELECT …) — subquery may see prior FROM items
    #: TABLE_CHANGES('t', v_from[, v_to]) — CDF rows between two committed
    #: versions of a versioned sink: (name, v_from, v_to|None)
    table_changes: tuple | None = None

    @property
    def ref(self) -> str:
        return self.alias or self.name or "_sub"


@dataclass
class SqlSelect:
    columns: list[Column] = field(default_factory=list)
    from_: list[FromSource] = field(default_factory=list)
    where: Node | None = None
    group_by: list[Node] = field(default_factory=list)
    group_mode: str = ""  # "" | ROLLUP | CUBE | GROUPING SETS (superset: SURVEY §2.4 "not present")
    grouping_sets: list[list[Node]] = field(default_factory=list)  # when group_mode == GROUPING SETS
    having: Node | None = None
    qualify: Node | None = None  # post-window filter (superset; Snowflake/DuckDB QUALIFY)
    windows: dict = field(default_factory=dict)  # WINDOW w AS (...) named specs
    order_by: list[tuple[Node, str]] = field(default_factory=list)
    distinct_on: list[Node] = field(default_factory=list)  # DISTINCT ON (k, ...) keys
    group_all: bool = False  # GROUP BY ALL (DuckDB/Snowflake superset)
    order_all: str | None = None  # ORDER BY ALL [ASC|DESC ...] direction
    limit: int | None = None
    offset: int | None = None
    distinct: bool = False
    into: str | None = None
    with_: dict = field(default_factory=dict)
    alias: str | None = None


@dataclass
class CteQuery:
    """Leading ``WITH name AS (SELECT …) [, name2 AS (…)]* SELECT …`` —
    ANSI CTEs, a superset (the reference's WITH is the trailing key-value
    config map, lex/dialect_sql.go `WITH {…}`; the two never collide: CTE
    WITH leads the statement, config WITH trails the select). Later CTEs
    may reference earlier ones; RECURSIVE is rejected at parse."""

    ctes: list = field(default_factory=list)  # [(name, SqlSelect | SqlSetOp), …]
    query: object = None  # SqlSelect | SqlSetOp
    recursive: bool = False  # WITH RECURSIVE — self-referencing CTEs allowed


@dataclass
class SqlSetOp:
    """UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] between selects —
    superset: the reference dialect has NO set operations
    (lex/dialect_sql.go:30-50 statement list, SURVEY §2.6).

    ANSI semantics: INTERSECT binds tighter than UNION/EXCEPT, which
    associate left; a trailing ORDER BY/LIMIT/OFFSET after the last
    (unparenthesized) operand binds to the WHOLE chain. A parenthesized
    operand keeps its clauses local."""

    op: str  # UNION | UNION ALL | INTERSECT | INTERSECT ALL | EXCEPT | EXCEPT ALL
    left: "SqlSelect | SqlSetOp"
    right: "SqlSelect | SqlSetOp"
    order_by: list[tuple[Node, str]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None


@dataclass
class SubqueryNode(Node):
    """``WHERE x IN (SELECT ...)`` right-hand side (rel/sql.go:137-149).
    The reference parses but never executes this (plan/planner_select.go:94-98);
    we execute it as a semi-join — flagged superset."""

    select: SqlSelect

    def sql(self) -> str:
        return "(SELECT ...)"


@dataclass
class SqlInsert:
    table: str
    columns: list[str]
    rows: list[list[Node]] = field(default_factory=list)
    select: SqlSelect | None = None
    upsert: bool = False


@dataclass
class SqlUpdate:
    table: str
    values: dict[str, Node] = field(default_factory=dict)
    where: Node | None = None


@dataclass
class SqlDelete:
    table: str
    where: Node | None = None


@dataclass
class SqlCreate:
    tok: str  # SOURCE | SCHEMA | VIEW | CONTINUOUSVIEW | TABLE
    ident: str
    with_: dict = field(default_factory=dict)
    select: SqlSelect | None = None
    or_replace: bool = False
    if_not_exists: bool = False
    cols: list[tuple[str, str]] = field(default_factory=list)  # CREATE TABLE ddl


@dataclass
class SqlAlter:
    """ALTER — parse+plan only in the reference too (exec/ddl.go:136-152
    → ErrNotImplemented); we keep statement-level parity."""

    tok: str  # TABLE | SCHEMA
    ident: str
    body: str = ""


@dataclass
class SqlDrop:
    tok: str  # SOURCE | TABLE | SCHEMA | VIEW
    ident: str
    if_exists: bool = False


@dataclass
class SqlShow:
    show: str  # TABLES | DATABASES | COLUMNS | VARIABLES | CREATE
    ident: str | None = None
    full: bool = False
    like: str | None = None
    where: Node | None = None


@dataclass
class MergeClause:
    """One WHEN [NOT] MATCHED [AND cond] THEN <action> arm."""

    matched: bool = True
    cond: Node | None = None
    action: str = "update"  # update | delete | insert
    #: UPDATE SET assignments (col → expr) or "*" for set-all-by-name
    set_values: object = None
    insert_cols: list[str] | None = None
    #: INSERT VALUES exprs or "*" for insert-all-by-name
    insert_values: object = None


@dataclass
class SqlMerge:
    """ANSI MERGE INTO (SQL:2003 F312 family — superset; the reference
    has no MERGE statement, only sink-level upsert)."""

    target: str = ""
    target_alias: str | None = None
    source: str | None = None
    source_query: object | None = None
    source_alias: str | None = None
    on: Node | None = None
    clauses: list[MergeClause] = field(default_factory=list)


@dataclass
class SqlCopy:
    """COPY bulk I/O (DuckDB-style superset)."""

    table: str | None = None
    query: object | None = None  # SqlSelect | SqlSetOp | CteQuery
    direction: str = "TO"
    path: str = ""
    options: dict = field(default_factory=dict)


@dataclass
class SqlDescribe:
    ident: str | None = None
    stmt: object | None = None  # DESCRIBE/EXPLAIN <statement>
    analyze: bool = False  # EXPLAIN ANALYZE — execute + runtime metrics


@dataclass
class SqlCommand:
    kw: str  # SET | USE | ROLLBACK | COMMIT
    ident: str | None = None
    value: Node | None = None


@dataclass
class SqlRestore:
    """``RESTORE [TABLE] <sink table> TO VERSION AS OF n | TO TIMESTAMP
    AS OF '<ts>'`` — roll a versioned MERGE sink back to a past snapshot
    by committing it as the NEW current version (history is preserved;
    Delta-parity RESTORE TABLE)."""

    table: str = ""
    version: int | None = None
    timestamp: str | None = None


@dataclass
class SqlVacuum:
    """``VACUUM <sink table> [RETAIN <n> VERSIONS | RETAIN <h> HOURS]`` —
    drop old committed snapshots of a versioned MERGE sink, by version
    count (ParquetMergeSink) or by time-based retention (Delta's native
    model; ParquetMergeSink resolves it through the commit-timestamp
    sidecar). Delta-parity lifecycle statement; pairs with VERSION AS OF
    / DESCRIBE HISTORY."""

    table: str = ""
    retain: int | None = None
    retain_hours: float | None = None
    dry_run: bool = False  # DRY RUN: report victims, delete nothing


@dataclass
class SqlRefresh:
    """``REFRESH MATERIALIZED VIEW <name> [FULL]`` — bring a materialized
    view up to date. Incremental (change-feed fold) when the view's
    query supports it and FULL was not forced; the returned report row
    records which mode actually ran (matview.py).

    ``REFRESH ALL MATERIALIZED VIEWS [FULL]`` refreshes every registered
    view, planning each base/dim table's change backlog ONCE and folding
    all views of that table from the shared delta frame — one report row
    per view."""

    view: str = ""
    full: bool = False
    all_views: bool = False


@dataclass
class SqlOptimize:
    """``OPTIMIZE <sink table> [WHERE <pred>] [ZORDER BY (c1, c2, ...)]``
    — compact a versioned sink's small files into ~target-size files and
    optionally Z-order-cluster them on the listed columns for
    multi-column data-skipping (Delta-parity layout maintenance).
    ``WHERE`` scopes the rewrite to the files whose statistics could
    match (partition predicates map exactly to partition dirs) — at
    100 TB this is what lets yesterday's partition compact or cluster
    without touching three years of data."""

    table: str = ""
    zorder: list[str] = field(default_factory=list)
    where: object = None  # Node | None — pushable scope predicate


@dataclass
class FilterStatement:
    """FilterQL (rel/filter.go:35-46): FILTER <expr> [FROM t] [LIMIT n]
    [WITH {}] [ALIAS name]; FILTER SELECT cols FROM t WHERE ..."""

    filter: Node
    from_: str | None = None
    limit: int | None = None
    with_: dict = field(default_factory=dict)
    alias: str | None = None
    columns: list[Column] | None = None  # FilterSelect form


# --------------------------------------------------------------------------
# SQL parser
# --------------------------------------------------------------------------
_JOIN_WORDS = {"JOIN", "INNER", "OUTER", "LEFT", "RIGHT", "FULL", "CROSS"}
_CLAUSE_END = {"FROM", "WHERE", "FILTER", "GROUP", "HAVING", "QUALIFY", "WINDOW", "ORDER", "LIMIT", "OFFSET", "INTO", "WITH", "ALIAS", "AS", "IF", "ON", "UNION", "INTERSECT", "EXCEPT"}


class SqlParser(ExprParser):
    """Statement parser built on the expression Pratt parser."""

    def __init__(self, text: str):
        super().__init__(tokenize(text))
        self.text = text

    def _order_all_shorthand_ahead(self) -> bool:
        """cur is ALL inside ORDER BY: shorthand iff the clause consists
        solely of ``ALL [ASC|DESC] [NULLS FIRST|LAST]`` — anything else
        (a comma list, an operator) means a real column named ``all``."""
        i = 1
        if self.peek(i).upper in ("ASC", "DESC"):
            i += 1
        if self.peek(i).upper == "NULLS" and self.peek(i + 1).upper in ("FIRST", "LAST"):
            i += 2
        t = self.peek(i)
        return t.upper in _CLAUSE_END or t.kind in (EOF, SEMI, RPAREN)

    # -- expression hook: subquery in parens ---------------------------
    def parse_primary(self) -> Node:
        t = self.cur()
        if t.kind == LPAREN and self.peek().kind == IDENT and self.peek().upper == "SELECT":
            self.advance()
            sel = self.parse_select_chain()
            self.expect(RPAREN)
            return SubqueryNode(sel)
        return super().parse_primary()

    # -- statements -----------------------------------------------------
    @staticmethod
    def _int_literal(text: str, where: str) -> int:
        try:
            return int(text)
        except ValueError:
            raise ParseError(f"{where} requires an integer, got {text!r}") from None

    def parse_statement(self):
        t = self.cur()
        if t.kind != IDENT:
            raise ParseError(f"expected statement keyword, got {t!r}")
        kw = t.upper
        if kw == "SELECT":
            self.advance()
            return self.parse_select_chain()
        if kw == "WITH":
            return self.parse_cte_query()
        if kw == "FILTER":
            return self.parse_filterql()
        if kw in ("INSERT", "UPSERT"):
            return self.parse_insert(upsert=kw == "UPSERT")
        if kw == "UPDATE":
            return self.parse_update()
        if kw == "DELETE":
            return self.parse_delete()
        if kw == "CREATE":
            return self.parse_create()
        if kw == "ALTER":
            self.advance()
            tok = self.advance().upper
            ident = self.advance().val
            rest = []
            while self.cur().kind not in (SEMI, EOF):
                rest.append(self.advance().val)
            return SqlAlter(tok=tok, ident=ident, body=" ".join(rest))
        if kw == "DROP":
            return self.parse_drop()
        if kw == "SHOW":
            return self.parse_show()
        if kw in ("DESCRIBE", "DESC", "EXPLAIN"):
            return self.parse_describe()
        if kw in ("SET", "USE", "ROLLBACK", "COMMIT"):
            return self.parse_command()
        if kw == "PREPARE":
            raise ParseError("PREPARE not implemented")  # parity: exec/executor.go:144-146
        if kw == "COPY":
            return self.parse_copy()
        if kw == "MERGE":
            return self.parse_merge()
        if kw == "OPTIMIZE":
            self.advance()
            o = SqlOptimize(table=self.expect(IDENT).val)
            if self.eat_kw("WHERE"):
                o.where = self.parse_expr()
            if self.eat_kw("ZORDER"):
                self.expect(IDENT, "BY")
                parens = self.cur().kind == LPAREN
                if parens:
                    self.advance()
                o.zorder.append(self.expect(IDENT).val)
                while self.cur().kind == COMMA:
                    self.advance()
                    o.zorder.append(self.expect(IDENT).val)
                if parens:
                    self.expect(RPAREN)
            return o
        if kw == "REFRESH":
            self.advance()
            if self.eat_kw("ALL"):
                self.expect(IDENT, "MATERIALIZED")
                self.expect(IDENT, "VIEWS")
                r = SqlRefresh(all_views=True)
            else:
                self.expect(IDENT, "MATERIALIZED")
                self.expect(IDENT, "VIEW")
                r = SqlRefresh(view=self.expect(IDENT).val)
            if self.eat_kw("FULL"):
                r.full = True
            return r
        if kw == "VACUUM":
            self.advance()
            table = self.expect(IDENT).val
            v = SqlVacuum(table=table)
            if self.eat_kw("RETAIN"):
                num = self.expect(NUMBER).val
                unit = self.advance().upper
                if unit == "VERSIONS":
                    v.retain = self._int_literal(num, "VACUUM RETAIN ... VERSIONS")
                elif unit == "HOURS":
                    v.retain_hours = float(num)
                else:
                    raise ParseError(f"VACUUM RETAIN takes VERSIONS or HOURS, got {unit!r}")
            if self.eat_kw("DRY"):
                self.expect(IDENT, "RUN")
                v.dry_run = True
            return v
        if kw == "RESTORE":
            self.advance()
            self.eat_kw("TABLE")
            table = self.expect(IDENT).val
            self.expect(IDENT, "TO")
            if self.eat_kw("VERSION"):
                self.expect(IDENT, "AS")
                self.expect(IDENT, "OF")
                return SqlRestore(
                    table=table,
                    version=self._int_literal(self.expect(NUMBER).val, "RESTORE ... VERSION AS OF"),
                )
            if self.eat_kw("TIMESTAMP"):
                self.expect(IDENT, "AS")
                self.expect(IDENT, "OF")
                return SqlRestore(table=table, timestamp=self.expect(STRING).val)
            raise ParseError("RESTORE requires TO VERSION AS OF n or TO TIMESTAMP AS OF '<ts>'")
        raise ParseError(f"unsupported statement {kw}")

    def parse_merge(self) -> "SqlMerge":
        """``MERGE INTO t [AS a] USING <s | (SELECT …)> [AS b] ON cond
        { WHEN [NOT] MATCHED [AND cond] THEN
            UPDATE SET c = e[, …] | UPDATE SET * | DELETE |
            INSERT [(c, …)] VALUES (e, …) | INSERT * }+``"""
        self.advance()  # MERGE
        self.expect(IDENT, "INTO")
        m = SqlMerge(target=self.advance().val)
        if self.eat_kw("AS"):
            m.target_alias = self.advance().val
        elif self.cur().kind in (IDENT, QIDENT) and self.cur().upper != "USING":
            m.target_alias = self.advance().val
        self.expect(IDENT, "USING")
        if self.cur().kind == LPAREN:
            self.advance()
            if self.cur().upper == "SELECT":
                self.advance()
                m.source_query = self.parse_select_chain()
            elif self.cur().upper == "WITH":
                m.source_query = self.parse_cte_query()
            else:
                raise ParseError(f"expected SELECT/WITH in MERGE source, got {self.cur()!r}")
            self.expect(RPAREN)
        else:
            m.source = self.advance().val
        if self.eat_kw("AS"):
            m.source_alias = self.advance().val
        elif self.cur().kind in (IDENT, QIDENT) and self.cur().upper != "ON":
            m.source_alias = self.advance().val
        self.expect(IDENT, "ON")
        m.on = self.parse_expr()
        while self.at_kw("WHEN"):
            self.advance()
            cl = MergeClause(matched=not self.eat_kw("NOT"))
            self.expect(IDENT, "MATCHED")
            if self.eat_kw("AND"):
                cl.cond = self.parse_expr()
            self.expect(IDENT, "THEN")
            act = self.advance().upper
            if act == "UPDATE":
                if not cl.matched:
                    raise ParseError("WHEN NOT MATCHED cannot UPDATE")
                self.expect(IDENT, "SET")
                cl.action = "update"
                if self.cur().kind == OP and self.cur().val == "*":
                    self.advance()
                    cl.set_values = "*"
                else:
                    vals: dict[str, Node] = {}
                    while True:
                        name = self.advance().val
                        if self.cur().kind == OP and self.cur().val in ("=", "=="):
                            self.advance()
                        vals[name] = self.parse_expr()
                        if self.cur().kind == COMMA:
                            self.advance()
                        else:
                            break
                    cl.set_values = vals
            elif act == "DELETE":
                if not cl.matched:
                    raise ParseError("WHEN NOT MATCHED cannot DELETE")
                cl.action = "delete"
            elif act == "INSERT":
                if cl.matched:
                    raise ParseError("WHEN MATCHED cannot INSERT")
                cl.action = "insert"
                if self.cur().kind == OP and self.cur().val == "*":
                    self.advance()
                    cl.insert_values = "*"
                else:
                    if self.cur().kind == LPAREN:
                        self.advance()
                        cols = []
                        while self.cur().kind != RPAREN:
                            cols.append(self.advance().val)
                            if self.cur().kind == COMMA:
                                self.advance()
                        self.expect(RPAREN)
                        cl.insert_cols = cols
                    self.expect(IDENT, "VALUES")
                    self.expect(LPAREN)
                    vals_l: list[Node] = []
                    while self.cur().kind != RPAREN:
                        vals_l.append(self.parse_expr())
                        if self.cur().kind == COMMA:
                            self.advance()
                    self.expect(RPAREN)
                    cl.insert_values = vals_l
            else:
                raise ParseError(f"expected UPDATE/DELETE/INSERT after THEN, got {act!r}")
            m.clauses.append(cl)
        if not m.clauses:
            raise ParseError("MERGE requires at least one WHEN clause")
        return m

    def parse_copy(self) -> "SqlCopy":
        """``COPY <table | (SELECT ...)> TO '<path>' [(opt[, ...])]`` and
        ``COPY <table> FROM '<path>' [(opt[, ...])]`` — DuckDB-style bulk
        I/O (superset; no reference counterpart). Options: FORMAT
        parquet|csv|json|orc|text, HEADER [true|false], OVERWRITE,
        DELIMITER '<c>', COMPRESSION <codec>, PARTITION_BY (col, ...)."""
        self.advance()  # COPY
        c = SqlCopy()
        if self.cur().kind == LPAREN:
            self.advance()
            if self.cur().upper == "SELECT":
                self.advance()
                c.query = self.parse_select_chain()
            elif self.cur().upper == "WITH":
                c.query = self.parse_cte_query()
            else:
                raise ParseError(f"expected SELECT/WITH in COPY source, got {self.cur()!r}")
            self.expect(RPAREN)
        else:
            c.table = self.advance().val
        direction = self.advance()
        if direction.upper not in ("TO", "FROM"):
            raise ParseError(f"expected TO or FROM in COPY, got {direction!r}")
        c.direction = direction.upper
        if c.direction == "FROM" and c.table is None:
            raise ParseError("COPY FROM requires a target table name")
        path = self.advance()
        if path.kind != STRING:
            raise ParseError(f"COPY expects a quoted path, got {path!r}")
        c.path = path.val
        if self.cur().kind == LPAREN:
            self.advance()
            while self.cur().kind != RPAREN:
                key = self.advance().upper
                if key == "PARTITION_BY":
                    cols = []
                    self.expect(LPAREN)
                    while self.cur().kind != RPAREN:
                        cols.append(self.advance().val)
                        if self.cur().kind == COMMA:
                            self.advance()
                    self.expect(RPAREN)
                    c.options["partition_by"] = cols
                elif self.cur().kind in (IDENT, STRING, NUMBER) and self.cur().upper != "PARTITION_BY":
                    c.options[key.lower()] = self.advance().val
                else:
                    c.options[key.lower()] = True
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RPAREN)
        return c

    def parse_select_chain(self) -> "SqlSelect | SqlSetOp":
        """SELECT ... [UNION [ALL] | INTERSECT [ALL] | EXCEPT [ALL] ...]*
        — set-op chain (superset, SURVEY §2.6) with ANSI precedence:
        INTERSECT binds tighter than UNION/EXCEPT; trailing ORDER BY/
        LIMIT/OFFSET after the final unparenthesized operand apply to the
        whole chain."""
        left: SqlSelect | SqlSetOp = self.parse_select()
        while self.at_kw("UNION", "INTERSECT", "EXCEPT"):
            op = self.advance().upper
            if self.eat_kw("ALL"):
                op += " ALL"
            right, paren = self._setop_operand(op)
            if not op.startswith("INTERSECT"):
                # ANSI precedence: fold any following INTERSECT run into
                # the right term before combining with UNION/EXCEPT
                while self.at_kw("INTERSECT"):
                    iop = self.advance().upper
                    if self.eat_kw("ALL"):
                        iop += " ALL"
                    r2, p2 = self._setop_operand(iop)
                    right = self._combine_setop(right, iop, r2, p2)
                    paren = False
            left = self._combine_setop(left, op, right, paren)
        return left

    def _setop_operand(self, op: str):
        """One set-op operand: SELECT ... or a parenthesized chain.
        Returns (node, was_parenthesized)."""
        t = self.cur()
        if t.kind == LPAREN:
            self.advance()
            inner = self.parse_select_chain()
            self.expect(RPAREN)
            return inner, True
        if self.at_kw("SELECT"):
            return self.parse_select(), False
        raise ParseError(f"expected SELECT after {op}, got {t!r}")

    @staticmethod
    def _combine_setop(left, op: str, right, right_parenthesized: bool) -> SqlSetOp:
        node = SqlSetOp(op=op, left=left, right=right)
        if not right_parenthesized:
            # trailing ORDER BY/LIMIT/OFFSET lexically attach to the last
            # operand — hoist them to the chain (ANSI binding); hoisting
            # cascades outward through nested combines
            node.order_by, right.order_by = right.order_by, []
            node.limit, right.limit = right.limit, None
            node.offset, right.offset = right.offset, None
        return node

    def parse_cte_query(self) -> CteQuery:
        """WITH name AS (select-chain) [, …]* SELECT … (ANSI CTEs)."""
        self.advance()  # WITH
        recursive = self.eat_kw("RECURSIVE")
        ctes: list = []
        while True:
            t = self.cur()
            if t.kind not in (IDENT, QIDENT):
                raise ParseError(f"expected CTE name after WITH, got {t!r}")
            name = self.advance().val
            self.expect(IDENT, "AS")
            self.expect(LPAREN)
            inner = self.parse_select_chain()
            self.expect(RPAREN)
            ctes.append((name, inner))
            if self.cur().kind == COMMA:
                self.advance()
                continue
            break
        if not self.at_kw("SELECT"):
            raise ParseError(f"expected SELECT after WITH clause, got {self.cur()!r}")
        self.advance()
        return CteQuery(ctes=ctes, query=self.parse_select_chain(), recursive=recursive)

    def parse_select(self) -> SqlSelect:
        # 'SELECT' already consumed by caller (or consume if present)
        if self.at_kw("SELECT"):
            self.advance()
        sel = SqlSelect()
        if self.eat_kw("DISTINCT"):
            if self.at_kw("ON") and self.peek().kind == LPAREN:
                # DISTINCT ON (k, ...) — Postgres/DuckDB: one row per key
                # tuple, picked by the ORDER BY after the keys
                self.advance()
                self.expect(LPAREN)
                sel.distinct_on = self.parse_expr_list()
                self.expect(RPAREN)
            else:
                sel.distinct = True
        sel.columns = self.parse_columns()
        if self.eat_kw("INTO"):
            sel.into = self.advance().val
        if self.eat_kw("FROM"):
            sel.from_ = self.parse_from()
        if self.eat_kw("WHERE"):
            sel.where = self.parse_expr()
        elif self.eat_kw("FILTER"):
            # FilterSelect form: SELECT cols FROM t FILTER <filterql-expr>
            # (rel/parse_filterql.go:134-146)
            sel.where = self.parse_filter_expr()
        if self.at_kw("GROUP"):
            self.advance()
            self.expect(IDENT, "BY")
            if self.at_kw("ROLLUP", "CUBE") and self.peek().kind == LPAREN:
                sel.group_mode = self.advance().upper
                self.expect(LPAREN)
                sel.group_by = self.parse_expr_list()
                self.expect(RPAREN)
            elif self.at_kw("GROUPING"):
                # GROUP BY GROUPING SETS ((a, b), (a), ())
                self.advance()
                self.expect(IDENT, "SETS")
                self.expect(LPAREN)
                sel.group_mode = "GROUPING SETS"
                seen: dict[str, Node] = {}
                while True:
                    self.expect(LPAREN)
                    one: list[Node] = []
                    if self.cur().kind != RPAREN:
                        one = self.parse_expr_list()
                    self.expect(RPAREN)
                    sel.grouping_sets.append(one)
                    for e in one:
                        seen.setdefault(e.sql(), e)
                    if self.cur().kind == COMMA:
                        self.advance()
                        continue
                    break
                self.expect(RPAREN)
                # group_by = the distinct union of all sets' expressions
                sel.group_by = list(seen.values())
            elif self.at_kw("ALL") and (
                self.peek().upper in _CLAUSE_END or self.peek().kind in (EOF, SEMI, RPAREN)
            ):
                # GROUP BY ALL — every non-aggregate select expression
                # becomes a group key (DuckDB/Snowflake superset). ALL is
                # the shorthand only as the SOLE token of the clause: a
                # real column named `all` in a list (`GROUP BY all, x`)
                # parses as an ordinary expression (ADVICE r7)
                self.advance()
                sel.group_all = True
            else:
                sel.group_by = self.parse_expr_list()
        if self.eat_kw("HAVING"):
            sel.having = self.parse_expr()
        # QUALIFY and WINDOW in either order (DuckDB puts WINDOW before
        # QUALIFY, Snowflake has no WINDOW clause — accept both)
        while self.at_kw("QUALIFY", "WINDOW"):
            if self.eat_kw("QUALIFY"):
                sel.qualify = self.parse_expr()
                continue
            self.advance()  # WINDOW
            # WINDOW w AS (PARTITION BY ... ORDER BY ... [frame])[, ...] —
            # named specs referenced by `func() OVER w`
            while True:
                wname = self.expect(IDENT).val
                self.expect(IDENT, "AS")
                self.expect(LPAREN)
                sel.windows[wname] = self.parse_window_spec(FuncNode("__window_spec__", []))
                self.expect(RPAREN)
                if self.cur().kind == COMMA:
                    self.advance()
                    continue
                break
        if self.at_kw("ORDER"):
            self.advance()
            self.expect(IDENT, "BY")
            if self.at_kw("ALL") and self._order_all_shorthand_ahead():
                # ORDER BY ALL [ASC|DESC] [NULLS ...] — every output
                # column, left to right (DuckDB superset). ALL is the
                # shorthand only when it is the SOLE sort expression; a
                # real column named `all` in a list (`ORDER BY all, x`)
                # parses as an ordinary reference (ADVICE r7)
                self.advance()
                direction = "ASC"
                if self.at_kw("ASC", "DESC"):
                    direction = self.advance().upper
                if self.at_kw("NULLS"):
                    self.advance()
                    pos = self.advance()
                    if pos.kind != IDENT or pos.upper not in ("FIRST", "LAST"):
                        raise ParseError(f"expected FIRST or LAST after NULLS, got {pos!r}")
                    direction += f" NULLS {pos.upper}"
                sel.order_all = direction
                return self._finish_select(sel)
            while True:
                e = self.parse_expr()
                direction = "ASC"
                if self.at_kw("ASC", "DESC"):
                    direction = self.advance().upper
                if self.at_kw("NULLS"):
                    # ANSI NULLS FIRST | NULLS LAST (superset; Spark's
                    # defaults are ASC→NULLS FIRST, DESC→NULLS LAST)
                    self.advance()
                    pos = self.advance()
                    if pos.kind != IDENT or pos.upper not in ("FIRST", "LAST"):
                        raise ParseError(f"expected FIRST or LAST after NULLS, got {pos!r}")
                    direction += f" NULLS {pos.upper}"
                sel.order_by.append((e, direction))
                if self.cur().kind == COMMA:
                    self.advance()
                else:
                    break
        return self._finish_select(sel)

    def _finish_select(self, sel: SqlSelect) -> SqlSelect:
        """Post-ORDER-BY tail: LIMIT/OFFSET/WITH/ALIAS/semicolon."""
        if self.eat_kw("LIMIT"):
            sel.limit = int(self.expect(NUMBER).val)
        if self.eat_kw("OFFSET"):
            sel.offset = int(self.expect(NUMBER).val)
        if self.at_kw("WITH"):
            sel.with_ = self.parse_with()
        if self.eat_kw("ALIAS"):
            sel.alias = self.advance().val
        if self.cur().kind == SEMI:
            self.advance()
        return sel

    def parse_columns(self) -> list[Column]:
        cols: list[Column] = []
        while True:
            t = self.cur()
            if t.kind == OP and t.val == "*":
                self.advance()
                star = Column(IdentityNode(("*",)))
                # DuckDB/Snowflake star modifiers (superset):
                #   * EXCLUDE (a, b)   drop columns from the expansion
                #   * REPLACE (expr AS a)   swap a column's expression in place
                while (
                    self.cur().kind == IDENT
                    and self.cur().upper in ("EXCLUDE", "REPLACE")
                    and self.peek().kind == LPAREN
                ):
                    mod = self.advance().upper
                    self.expect(LPAREN)
                    if mod == "EXCLUDE":
                        while self.cur().kind != RPAREN:
                            star.exclude.append(self.advance().val)
                            if self.cur().kind == COMMA:
                                self.advance()
                    else:
                        while self.cur().kind != RPAREN:
                            e = self.parse_expr()
                            self.expect(IDENT, "AS")
                            star.replace[self.advance().val.lower()] = e
                            if self.cur().kind == COMMA:
                                self.advance()
                    self.expect(RPAREN)
                cols.append(star)
            else:
                e = self.parse_expr()
                col = Column(e)
                if isinstance(e, IdentityNode) and e.is_star:
                    # t.* accepts the same EXCLUDE/REPLACE modifiers
                    while (
                        self.cur().kind == IDENT
                        and self.cur().upper in ("EXCLUDE", "REPLACE")
                        and self.peek().kind == LPAREN
                    ):
                        mod = self.advance().upper
                        self.expect(LPAREN)
                        if mod == "EXCLUDE":
                            while self.cur().kind != RPAREN:
                                col.exclude.append(self.advance().val)
                                if self.cur().kind == COMMA:
                                    self.advance()
                        else:
                            while self.cur().kind != RPAREN:
                                ex = self.parse_expr()
                                self.expect(IDENT, "AS")
                                col.replace[self.advance().val.lower()] = ex
                                if self.cur().kind == COMMA:
                                    self.advance()
                        self.expect(RPAREN)
                # col IF guard (exec/projection.go:158-175)
                if self.at_kw("IF"):
                    self.advance()
                    col.guard = self.parse_expr()
                if self.eat_kw("AS"):
                    a = self.advance()
                    col.alias = a.val
                elif self.cur().kind in (IDENT, QIDENT) and self.cur().upper not in _CLAUSE_END and not self.at_kw(*_JOIN_WORDS):
                    # implicit alias `SELECT x y` — NOT in reference grammar; skip
                    pass
                cols.append(col)
            if self.cur().kind == COMMA:
                self.advance()
            else:
                break
        return cols

    def parse_expr_list(self) -> list[Node]:
        out = [self.parse_expr()]
        while self.cur().kind == COMMA:
            self.advance()
            out.append(self.parse_expr())
        return out

    def parse_from(self) -> list[FromSource]:
        sources = [self.parse_one_source()]
        while True:
            t = self.cur()
            if t.kind == COMMA:  # comma cross join
                self.advance()
                src = self.parse_one_source()
                src.join_type = "CROSS"
                sources.append(src)
                continue
            if t.kind == IDENT and t.upper in _JOIN_WORDS:
                jt = []
                while self.cur().kind == IDENT and self.cur().upper in _JOIN_WORDS:
                    w = self.advance().upper
                    if w != "JOIN":
                        jt.append(w)
                src = self.parse_one_source()
                src.join_type = " ".join(jt) if jt else "INNER"
                if self.eat_kw("ON"):
                    src.join_expr = self.parse_expr()
                sources.append(src)
                continue
            break
        return sources

    def parse_one_source(self) -> FromSource:
        t = self.cur()
        if t.kind == IDENT and t.upper == "LATERAL" and self.peek().kind == LPAREN:
            # LATERAL (SELECT …) — ANSI lateral derived table (superset);
            # the subquery may reference columns of preceding FROM items
            self.advance()
            self.expect(LPAREN)
            sub = self.parse_select_chain()
            self.expect(RPAREN)
            src = FromSource(subquery=sub, lateral=True)
            if self.eat_kw("AS"):
                src.alias = self.advance().val
            elif self.cur().kind in (IDENT, QIDENT) and self.cur().upper not in _CLAUSE_END and self.cur().upper not in _JOIN_WORDS and self.cur().upper != "ON":
                src.alias = self.advance().val
            return src
        if t.kind == LPAREN and self.peek().kind == IDENT and self.peek().upper == "VALUES":
            # (VALUES (1, 'a'), (2, 'b')) AS t(x, y) — ANSI table value
            # constructor (superset; reference VALUES exists only in INSERT)
            self.advance()
            self.advance()  # VALUES
            rows: list[list[Node]] = []
            while self.cur().kind == LPAREN:
                self.advance()
                row: list[Node] = []
                while self.cur().kind != RPAREN:
                    row.append(self.parse_expr())
                    if self.cur().kind == COMMA:
                        self.advance()
                self.expect(RPAREN)
                rows.append(row)
                if self.cur().kind == COMMA:
                    self.advance()
                else:
                    break
            if not rows:
                raise ParseError("VALUES needs at least one row")
            if any(len(r) != len(rows[0]) for r in rows):
                raise ParseError("VALUES rows differ in arity")
            self.expect(RPAREN)
            src = FromSource(values_rows=rows)
        elif t.kind == LPAREN:
            self.advance()
            sub = self.parse_select_chain()
            self.expect(RPAREN)
            src = FromSource(subquery=sub)
        elif t.kind == IDENT and t.upper == "TABLE_CHANGES" and self.peek().kind == LPAREN:
            # TABLE_CHANGES('t', v_from[, v_to]) — Delta-style change data
            # feed over a versioned sink (superset; pairs with VERSION AS OF).
            # Bounds may be version NUMBERS or quoted TIMESTAMP strings
            # (Delta startingTimestamp/endingTimestamp parity): a string
            # start resolves to the first commit AT OR AFTER it, a string
            # end to the last commit AT OR BEFORE it.
            self.advance()
            self.advance()  # (
            tname = self.advance()
            if tname.kind != STRING:
                raise ParseError(f"TABLE_CHANGES expects a quoted table name, got {tname!r}")
            self.expect(COMMA)

            def bound(which: str):
                tok = self.advance()
                if tok.kind == NUMBER:
                    return self._int_literal(tok.val, f"TABLE_CHANGES {which}")
                if tok.kind == STRING:
                    return tok.val  # ISO timestamp, resolved at exec time
                raise ParseError(
                    f"TABLE_CHANGES {which} must be a version number or a "
                    f"quoted timestamp, got {tok!r}"
                )

            v_from = bound("start bound")
            v_to = None
            if self.cur().kind == COMMA:
                self.advance()
                v_to = bound("end bound")
            self.expect(RPAREN)
            src = FromSource(table_changes=(tname.val, v_from, v_to), alias="table_changes")
        elif t.kind == IDENT and t.upper == "UNNEST" and self.peek().kind == LPAREN:
            # UNNEST(<array expr>) [WITH ORDINALITY] AS t(v[, ord]) —
            # lateral explode over the frame built so far (ANSI superset)
            self.advance()
            self.advance()  # (
            expr = self.parse_expr()
            self.expect(RPAREN)
            src = FromSource(unnest=expr)
            if (
                self.at_kw("WITH")
                and self.peek().kind == IDENT
                and self.peek().upper == "ORDINALITY"
            ):
                self.advance()
                self.advance()
                src.ordinality = True
        else:
            name = self.advance()
            if name.kind not in (IDENT, QIDENT):
                raise ParseError(f"expected table name, got {name!r}")
            src = FromSource(name=name.val)
            # Delta-style time travel over versioned sinks. Only the full
            # VERSION AS OF / TIMESTAMP AS OF sequence triggers — a table
            # alias named `version` or `timestamp` keeps parsing as an
            # alias.
            if (
                self.cur().upper in ("VERSION", "TIMESTAMP")
                and self.peek().upper == "AS"
                and self.peek(2).upper == "OF"
            ):
                kind = self.advance().upper
                self.advance()
                self.advance()
                if kind == "VERSION":
                    src.version = int(self.expect(NUMBER).val)
                else:
                    t = self.advance()
                    if t.kind != STRING:
                        raise ParseError(f"TIMESTAMP AS OF expects a string literal, got {t!r}")
                    src.as_of_ts = t.val
        # Snowflake/DuckDB bracketed PIVOT/UNPIVOT wrap the source — they
        # may appear before OR after the source alias:
        # FROM t PIVOT (sum(x) FOR c IN ('a', 'b')) p
        # FROM (SELECT …) s PIVOT (…) p
        self._parse_pivot_clauses(src)
        self._parse_tablesample(src)
        if self.eat_kw("AS"):
            src.alias = self.advance().val
        elif self.cur().kind in (IDENT, QIDENT) and self.cur().upper not in _CLAUSE_END and self.cur().upper not in _JOIN_WORDS and self.cur().upper != "ON":
            src.alias = self.advance().val
            if self._parse_pivot_clauses(src):
                # what we took as an alias was the SOURCE alias and a pivot
                # clause follows — allow a fresh alias for the pivoted frame
                if self.eat_kw("AS"):
                    src.alias = self.advance().val
                elif self.cur().kind in (IDENT, QIDENT) and self.cur().upper not in _CLAUSE_END and self.cur().upper not in _JOIN_WORDS and self.cur().upper != "ON":
                    src.alias = self.advance().val
            self._parse_tablesample(src)
        if src.alias is not None and self.cur().kind == LPAREN and (src.values_rows is not None or src.unnest is not None or src.subquery is not None):
            # derived-column-list: AS t(c1, c2, ...)
            self.advance()
            while self.cur().kind != RPAREN:
                src.out_cols.append(self.advance().val)
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RPAREN)
        return src

    def _parse_tablesample(self, src: FromSource) -> None:
        """``TABLESAMPLE (10 PERCENT) [REPEATABLE (42)]`` — Spark SQL's
        sampling clause (superset; not in the reference grammar).
        ``n ROWS`` takes the first n rows (Spark's TABLESAMPLE ROWS is a
        limit, not a random draw)."""
        if not (
            self.cur().kind == IDENT
            and self.cur().upper == "TABLESAMPLE"
            and self.peek().kind == LPAREN
        ):
            return
        self.advance()
        self.expect(LPAREN)
        num = self.expect(NUMBER).val
        unit = self.advance()
        if unit.kind != IDENT or unit.upper not in ("PERCENT", "ROWS"):
            raise ParseError(f"expected PERCENT or ROWS in TABLESAMPLE, got {unit!r}")
        self.expect(RPAREN)
        spec = {
            "kind": "percent" if unit.upper == "PERCENT" else "rows",
            "value": float(num) if unit.upper == "PERCENT" else int(num),
            "seed": None,
        }
        if self.at_kw("REPEATABLE"):
            self.advance()
            self.expect(LPAREN)
            spec["seed"] = int(self.expect(NUMBER).val)
            self.expect(RPAREN)
        src.sample = spec

    def _parse_pivot_clauses(self, src: FromSource) -> bool:
        saw = False
        while (
            self.cur().kind == IDENT
            and self.cur().upper in ("PIVOT", "UNPIVOT")
            and (
                self.peek().kind == LPAREN
                or (self.peek().kind == IDENT and self.peek().upper == "INCLUDE")
            )
        ):
            saw = True
            kw = self.advance().upper
            include_nulls = False
            if kw == "UNPIVOT" and self.eat_kw("INCLUDE"):
                self.expect(IDENT, "NULLS")
                include_nulls = True
            self.expect(LPAREN)
            if kw == "PIVOT":
                agg = self.parse_expr()
                if not isinstance(agg, FuncNode):
                    raise ParseError("PIVOT needs an aggregate call: PIVOT (agg(expr) FOR ...)")
                self.expect(IDENT, "FOR")
                for_tok = self.advance()
                if for_tok.kind not in (IDENT, QIDENT):
                    raise ParseError(f"expected pivot column after FOR, got {for_tok!r}")
                self.expect(IDENT, "IN")
                self.expect(LPAREN)
                vals: list[tuple[Node, str | None]] = []
                while self.cur().kind != RPAREN:
                    v = self.parse_expr()
                    a = self.advance().val if self.eat_kw("AS") else None
                    vals.append((v, a))
                    if self.cur().kind == COMMA:
                        self.advance()
                self.expect(RPAREN)
                self.expect(RPAREN)
                if not vals:
                    raise ParseError("PIVOT IN list is empty")
                src.pivot = {"agg": agg, "for": for_tok.val, "in": vals}
            else:
                val_name = self.advance().val
                self.expect(IDENT, "FOR")
                name_name = self.advance().val
                self.expect(IDENT, "IN")
                self.expect(LPAREN)
                cols: list[tuple[str, str | None]] = []
                while self.cur().kind != RPAREN:
                    c = self.advance().val
                    a = None
                    if self.eat_kw("AS"):
                        a = self.advance().val.strip("'")
                    cols.append((c, a))
                    if self.cur().kind == COMMA:
                        self.advance()
                self.expect(RPAREN)
                self.expect(RPAREN)
                if not cols:
                    raise ParseError("UNPIVOT IN list is empty")
                src.unpivot = {
                    "value": val_name,
                    "name": name_name,
                    "cols": cols,
                    "include_nulls": include_nulls,
                }
        return saw

    def parse_with(self) -> dict:
        """WITH payload: either a JSON blob ``WITH {...}`` or key=value
        pairs ``WITH backfill=true, track_deltas = true`` (both appear in
        the reference grammar — rel/parse_filterql_test.go:237)."""
        self.expect(IDENT, "WITH")
        from .lexer import LBRACE

        if self.cur().kind == LBRACE:
            blob, end = extract_json_blob(self.text, self.cur().pos)
            # re-lex the remainder after the blob
            rest = tokenize(self.text[end:])
            for tok in rest:
                tok.pos += end
            self.toks = self.toks[: self.i]  # drop stale tokens
            self.toks.extend(rest)
            try:
                return json.loads(blob)
            except json.JSONDecodeError as e:
                raise ParseError(f"bad WITH json: {e}") from e
        out: dict = {}
        while self.cur().kind in (IDENT, QIDENT):
            name = self.advance().val
            t = self.cur()
            if t.kind == OP and t.val in ("=", "=="):
                self.advance()
                out[name] = _node_literal(self.parse_expr())
            else:
                out[name] = True
            if self.cur().kind == COMMA:
                self.advance()
            else:
                break
        return out

    # -- DML ------------------------------------------------------------
    def parse_insert(self, upsert: bool) -> SqlInsert:
        self.advance()  # INSERT/UPSERT
        self.eat_kw("INTO")
        table = self.advance().val
        cols: list[str] = []
        if self.cur().kind == LPAREN:
            self.advance()
            while self.cur().kind != RPAREN:
                cols.append(self.advance().val)
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RPAREN)
        ins = SqlInsert(table=table, columns=cols, upsert=upsert)
        if self.at_kw("SELECT"):
            self.advance()
            ins.select = self.parse_select_chain()
            return ins
        self.expect(IDENT, "VALUES")
        while self.cur().kind == LPAREN:
            self.advance()
            row: list[Node] = []
            while self.cur().kind != RPAREN:
                row.append(self.parse_expr())
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RPAREN)
            ins.rows.append(row)
            if self.cur().kind == COMMA:
                self.advance()
            else:
                break
        return ins

    def parse_update(self) -> SqlUpdate:
        self.advance()
        table = self.advance().val
        self.expect(IDENT, "SET")
        upd = SqlUpdate(table=table)
        while True:
            name = self.advance().val
            t = self.cur()
            if t.kind == OP and t.val in ("=", "=="):
                self.advance()
            upd.values[name] = self.parse_expr()
            if self.cur().kind == COMMA:
                self.advance()
            else:
                break
        if self.eat_kw("WHERE"):
            upd.where = self.parse_expr()
        return upd

    def parse_delete(self) -> SqlDelete:
        self.advance()
        self.expect(IDENT, "FROM")
        table = self.advance().val
        d = SqlDelete(table=table)
        if self.eat_kw("WHERE"):
            d.where = self.parse_expr()
        return d

    # -- DDL / meta -------------------------------------------------------
    def parse_create(self) -> SqlCreate:
        self.advance()
        or_replace = False
        if self.at_kw("OR"):
            self.advance()
            self.expect(IDENT, "REPLACE")
            or_replace = True
        tok = self.advance().upper
        if tok == "MATERIALIZED":
            self.expect(IDENT, "VIEW")
            tok = "MATERIALIZED VIEW"
        if tok not in ("SOURCE", "SCHEMA", "VIEW", "MATERIALIZED VIEW", "CONTINUOUSVIEW", "TABLE", "DATABASE", "INDEX"):
            raise ParseError(f"CREATE {tok} not supported")
        if_not_exists = False
        if self.at_kw("IF"):
            self.advance()
            self.expect(IDENT, "NOT")
            self.expect(IDENT, "EXISTS")
            if_not_exists = True
        ident = self.advance().val
        c = SqlCreate(tok=tok, ident=ident, or_replace=or_replace, if_not_exists=if_not_exists)
        if tok == "TABLE" and self.cur().kind == LPAREN:
            self.advance()
            while self.cur().kind != RPAREN:
                name = self.advance().val
                ty = self.advance().val
                c.cols.append((name, ty))
                while self.cur().kind not in (COMMA, RPAREN, EOF):
                    self.advance()  # skip column attributes
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RPAREN)
        if self.eat_kw("AS"):
            if self.at_kw("WITH"):
                c.select = self.parse_cte_query()
            else:
                self.expect(IDENT, "SELECT")
                c.select = self.parse_select_chain()
        if self.at_kw("WITH"):
            c.with_ = self.parse_with()
        return c

    def parse_drop(self) -> SqlDrop:
        self.advance()
        tok = self.advance().upper
        if tok == "MATERIALIZED":
            self.expect(IDENT, "VIEW")
            tok = "MATERIALIZED VIEW"
        if_exists = False
        if self.at_kw("IF"):
            self.advance()
            self.expect(IDENT, "EXISTS")
            if_exists = True
        ident = self.advance().val
        return SqlDrop(tok=tok, ident=ident, if_exists=if_exists)

    def parse_show(self) -> SqlShow:
        self.advance()
        full = self.eat_kw("FULL")
        # SHOW [GLOBAL | SESSION] VARIABLES/STATUS (lex/dialect_sql.go:262,
        # plan/sql_rewrite.go:136,157) — scope prefix accepted, single store
        if self.at_kw("GLOBAL", "SESSION", "SLAVE"):
            self.advance()
        what = self.advance().upper
        if what in ("INDEXES", "KEYS"):
            what = "INDEX"
        s = SqlShow(show=what, full=full)
        if what == "CREATE":
            self.expect(IDENT, "TABLE")
            s.ident = self.advance().val
            return s
        if what in ("COLUMNS", "FIELDS", "INDEX"):
            self.expect(IDENT, "FROM")
            s.ident = self.advance().val
        if self.eat_kw("FROM"):
            s.ident = self.advance().val
        if self.eat_kw("LIKE"):
            s.like = self.advance().val
        if self.eat_kw("WHERE"):
            s.where = self.parse_expr()
        return s

    def parse_describe(self) -> SqlDescribe:
        kw = self.advance().upper
        t = self.cur()
        if kw == "EXPLAIN" and t.kind == IDENT and t.upper == "ANALYZE":
            # EXPLAIN ANALYZE <select>: execute and report runtime
            # per-operator metrics (DuckDB/Postgres-style superset)
            self.advance()
            return SqlDescribe(stmt=self.parse_statement(), analyze=True)
        if (
            t.kind == IDENT
            and t.upper in ("SELECT", "FILTER", "WITH")
            and kw == "EXPLAIN"
            or (kw in ("DESCRIBE", "DESC") and t.kind == IDENT and t.upper in ("SELECT", "WITH"))
        ):
            return SqlDescribe(stmt=self.parse_statement())
        if kw in ("DESCRIBE", "DESC") and t.kind == IDENT and t.upper in ("HISTORY", "DETAIL"):
            word = self.advance().upper.lower()
            return SqlDescribe(ident=f"{word} {self.advance().val}")
        return SqlDescribe(ident=self.advance().val)

    def parse_command(self) -> SqlCommand:
        kw = self.advance().upper
        cmd = SqlCommand(kw=kw)
        if kw == "USE":
            cmd.ident = self.advance().val
        elif kw == "SET":
            if self.at_kw("GLOBAL", "SESSION"):
                self.advance()
            cmd.ident = self.advance().val
            t = self.cur()
            if t.kind == OP and t.val in ("=", "=="):
                self.advance()
            cmd.value = self.parse_expr()
        return cmd

    # -- FilterQL ---------------------------------------------------------
    def parse_filterql(self) -> FilterStatement:
        self.expect(IDENT, "FILTER")
        cols = None
        if self.at_kw("SELECT"):  # FILTER SELECT? No — FilterSelect is "SELECT .. FROM x FILTER .."
            pass
        node = self.parse_filter_expr()
        stmt = FilterStatement(filter=node)
        if self.eat_kw("FROM"):
            stmt.from_ = self.advance().val
        if self.eat_kw("LIMIT"):
            stmt.limit = int(self.expect(NUMBER).val)
        if self.at_kw("WITH"):
            stmt.with_ = self.parse_with()
        if self.eat_kw("ALIAS"):
            stmt.alias = self.advance().val
        stmt.columns = cols
        if self.cur().kind == SEMI:
            self.advance()
        return stmt

    def parse_filter_expr(self) -> Node:
        """FilterQL expression: n-ary AND(...)/OR(...)/NOT(...), `*`,
        INCLUDE name, or ordinary boolean expression
        (rel/parse_filterql.go grammar)."""
        t = self.cur()
        if t.kind == OP and t.val == "*":
            self.advance()
            return MatchAllNode()
        if t.kind == IDENT and t.upper in ("AND", "OR") and self.peek().kind == LPAREN:
            op = self.advance().upper
            self.expect(LPAREN)
            args = []
            while self.cur().kind != RPAREN:
                args.append(self.parse_filter_expr())
                if self.cur().kind == COMMA:
                    self.advance()
            self.expect(RPAREN)
            return BooleanNode(op, args)
        if t.kind == IDENT and t.upper == "NOT":
            nxt = self.peek()
            if nxt.kind == IDENT and nxt.upper in ("AND", "OR") and self.peek(2).kind == LPAREN:
                self.advance()
                inner = self.parse_filter_expr()
                inner.negated = True  # BooleanNode
                return inner
            if nxt.kind == IDENT and nxt.upper == "INCLUDE":
                self.advance()
                self.advance()
                name = self.advance().val
                return IncludeNode(name, negated=True)
            self.advance()
            return UnaryNode("NOT", self.parse_filter_expr())
        if t.kind == IDENT and t.upper == "INCLUDE":
            self.advance()
            name = self.advance().val
            return IncludeNode(name)
        return self.parse_expr()


def _node_literal(node: Node):
    from .nodes import BoolNode as _B
    from .nodes import NullNode as _N
    from .nodes import NumberNode as _Num
    from .nodes import StringNode as _S

    if isinstance(node, _Num):
        return node.value
    if isinstance(node, _S):
        return node.value
    if isinstance(node, _B):
        return node.value
    if isinstance(node, _N):
        return None
    if isinstance(node, IdentityNode):
        return node.name
    raise ParseError(f"WITH value must be a literal, got {node.sql()}")


def parse_filter_select(text: str):
    """Parity with rel.ParseFilterSelect (rel/parse_filterql.go:138):
    ``SELECT cols FROM t (FILTER|WHERE) <expr> [WITH ...]``."""
    stmt = parse_sql(text)
    if not isinstance(stmt, SqlSelect):
        raise ParseError("expected a SELECT ... FILTER statement")
    return stmt


def parse_sql(text: str):
    """Parse one SQL statement — parity with rel.ParseSql
    (rel/parse_sql.go:29)."""
    p = SqlParser(text)
    stmt = p.parse_statement()
    if p.cur().kind == SEMI:
        p.advance()
    if p.cur().kind != EOF:
        raise ParseError(f"trailing tokens: {p.cur()!r}")
    return stmt


def parse_sql_statements(text: str) -> list:
    """Parse `;`-separated statements (rel/parse_sql.go:69)."""
    p = SqlParser(text)
    out = []
    while p.cur().kind != EOF:
        out.append(p.parse_statement())
        while p.cur().kind == SEMI:
            p.advance()
    return out


def parse_filterql(text: str) -> FilterStatement:
    """Parity with rel.ParseFilterQL (rel/parse_filterql.go:126)."""
    p = SqlParser(text)
    stmt = p.parse_filterql()
    if p.cur().kind != EOF:
        raise ParseError(f"trailing tokens: {p.cur()!r}")
    return stmt
