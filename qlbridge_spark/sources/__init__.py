"""Source registry: CREATE SOURCE ... WITH {json} → DataFrames.

Reference connectors (/root/reference/datasource/: csv.go, json.go,
files/filesource.go, membtree, memdb, sqlite) collapse onto Spark readers:
Spark natively handles header/gzip/partitioned-listing/pushdown, so each
"connector" here is just reader configuration.

Config shape (≈ the reference's WITH payload, exec/ddl.go:54-97):
    {"type": "csv"|"json"|"jsonl"|"parquet"|"jdbc"|"memory",
     "path": "/data/x.csv" | "gs://bucket/prefix/*.csv",
     "tables": {"name": "path", ...},      # multi-table file source
     "options": {...spark reader options},
     "url"/"dbtable": ...                  # jdbc (sqlite parity)
     "rows": [...], "schema": "a int, b string"}  # memory source
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class SourceError(ValueError):
    pass


# custom format readers: type name → fn(spark, path, cfg) -> DataFrame
# (≈ files.RegisterFileHandler, datasource/files/filehandler.go:65-66 —
# third parties plug new file formats into the source layer at runtime)
_READERS: dict[str, object] = {}


def register_reader(type_name: str, reader) -> None:
    """Register a custom source type for CREATE SOURCE WITH
    {"type": <type_name>}. ``reader(spark, path, cfg) -> DataFrame``."""
    _READERS[type_name.lower()] = reader


def unregister_reader(type_name: str) -> None:
    _READERS.pop(type_name.lower(), None)


def _read_one(spark: SparkSession, typ: str, path: str, cfg: dict) -> DataFrame:
    custom = _READERS.get(typ)
    if custom is not None:
        return custom(spark, path, cfg)
    opts = dict(cfg.get("options", {}))
    if typ == "csv":
        # reference CSV: header row, introspected types (datasource/csv.go:32,
        # introspect.go:16-21 samples rows) ≈ header+inferSchema; gzip native
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "true")
        return spark.read.options(**opts).csv(path)
    if typ in ("json", "jsonl", "ndjson"):
        # newline-delimited json (datasource/json.go:34) — Spark default
        return spark.read.options(**opts).json(path)
    if typ == "parquet":
        return spark.read.options(**opts).parquet(path)
    if typ == "orc":
        # columnar alternative — native reader, same pushdown/pruning as
        # parquet (superset: the reference has no ORC source)
        return spark.read.options(**opts).orc(path)
    if typ in ("text", "textfile"):
        # one row per line, single `value` string column — the raw-corpus
        # ingestion shape for the datapipe operators
        return spark.read.options(**opts).text(path)
    if typ == "sqlite":
        return _read_sqlite(spark, cfg.get("file") or path, cfg.get("dbtable") or cfg.get("table", "t"), cfg.get("query"))
    if typ == "jdbc":
        # sqlite-parity connector (datasource/sqlite/source.go) — predicate
        # pushdown is native to the JDBC source
        reader = spark.read.format("jdbc").option("url", cfg["url"])
        if "dbtable" in cfg:
            reader = reader.option("dbtable", cfg["dbtable"])
        if "query" in cfg:
            reader = reader.option("query", cfg["query"])
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()
    raise SourceError(f"unknown source type {typ!r}")


def _read_sqlite(spark: SparkSession, db_file: str, table: str, query: str | None = None) -> DataFrame:
    """SQLite source via the stdlib ``sqlite3`` driver (the container ships
    no sqlite JDBC jar). Parity target: /root/reference/datasource/sqlite/
    source.go:20-49, which runs the full golden suite against a .db file.

    The whole table (or query result) is fetched driver-side and
    parallelized — correct for the reference's use case (sqlite files are
    single-host small tables / dimension data). On a real cluster, large
    JDBC-able databases should use type="jdbc" instead, which keeps the
    scan distributed and pushes predicates down.
    """
    import sqlite3

    con = sqlite3.connect(db_file)
    con.row_factory = sqlite3.Row
    try:
        cur = con.execute(query or f'SELECT * FROM "{table}"')
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()

    data = [tuple(r[c] for c in cols) for r in rows]
    if not data:
        # empty table: infer schema from sqlite's declared column types
        con = sqlite3.connect(db_file)
        try:
            info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        finally:
            con.close()
        decl = {"INTEGER": "long", "REAL": "double", "TEXT": "string", "BLOB": "binary"}
        schema = ", ".join(f"{r[1]} {decl.get((r[2] or 'TEXT').upper(), 'string')}" for r in info)
        return spark.createDataFrame([], schema=schema)
    return spark.createDataFrame(data, schema=cols)


class SqliteSource:
    """Plannable SQLite source: the engine's per-source sub-select rewrite
    (planner.rewrite_source_select) is compiled to a native SQLite SQL
    string, so projection + predicates + limit run inside sqlite and only
    matching rows are parallelized into Spark.

    Parity: /root/reference/datasource/sqlite/source.go:20-49 runs the
    reference's golden suite with sqlite executing pushed-down statements;
    this class is the SourcePlanner-style equivalent (plan/plan.go:116-123).
    The engine re-applies the WHERE afterwards (see planner.py contract), so
    a partially-compilable predicate still returns correct rows.
    """

    def __init__(self, db_file: str, table: str):
        self.db_file = db_file
        self.dbtable = table
        self.last_pushdown: str | None = None
        import sqlite3

        con = sqlite3.connect(db_file)
        try:
            # name → affinity: comparison pushdown is affinity-gated (a
            # numeric literal against a TEXT-affinity column compares
            # LEXICOGRAPHICALLY inside sqlite while the engine coerces to
            # numeric — pushing it would NARROW the row set, which the
            # engine's re-applied WHERE cannot recover)
            self._columns = {
                r[1]: _sqlite_affinity(r[2]) for r in con.execute(f'PRAGMA table_info("{table}")').fetchall()
            }
        finally:
            con.close()

    def scan(self, spark: SparkSession) -> DataFrame:
        return _read_sqlite(spark, self.db_file, self.dbtable)

    def walk_source_select(self, engine, sel) -> DataFrame | None:
        cols = "*"
        names = [c.expr.name for c in sel.columns if not c.is_star]
        if names and all(n in self._columns for n in names):
            cols = ", ".join(f'"{n}"' for n in names)

        conj_sql: list[str] = []
        compiled_all = True
        if sel.where is not None:
            from ..planner import _conjuncts

            for conj in _conjuncts(sel.where):
                s = _sqlite_expr(conj, self._columns)
                if s is None:
                    compiled_all = False
                else:
                    conj_sql.append(s)

        sql = f'SELECT {cols} FROM "{self.dbtable}"'
        if conj_sql:
            sql += " WHERE " + " AND ".join(conj_sql)
        # contract: LIMIT only if the entire offered WHERE was applied
        if sel.limit is not None and compiled_all:
            sql += f" LIMIT {int(sel.limit)}"
        self.last_pushdown = sql
        return _read_sqlite(engine.spark, self.db_file, self.dbtable, sql)


def _sqlite_affinity(decl: str | None) -> str:
    """SQLite column affinity from the declared type (sqlite docs §3.1
    'Determination Of Column Affinity' — same rule order)."""
    d = (decl or "").upper()
    if "INT" in d:
        return "INTEGER"
    if "CHAR" in d or "CLOB" in d or "TEXT" in d:
        return "TEXT"
    if not d or "BLOB" in d:
        return "BLOB"
    if "REAL" in d or "FLOA" in d or "DOUB" in d:
        return "REAL"
    return "NUMERIC"


_NUMERIC_AFFINITIES = ("INTEGER", "REAL", "NUMERIC")


def _sqlite_expr(node, columns: dict) -> str | None:
    """Compile one predicate conjunct to SQLite SQL; None = keep engine-side.
    ``columns`` maps name → affinity; literal-vs-column comparisons are
    only pushed when the literal's type matches the column affinity
    (numeric lit ↔ INTEGER/REAL/NUMERIC, string lit ↔ TEXT) — a mismatch
    makes sqlite compare by storage-class order / lexicographically where
    the engine coerces numerically, and a pushed WHERE must never narrow.
    Dialect shims preserved: BETWEEN is EXCLUSIVE (vm/vm.go:868), LIKE
    accepts ``*`` as a glob star (expr/builtins converts), EXISTS col →
    col IS NOT NULL."""
    from ..nodes import (
        ArrayNode,
        BinaryNode,
        BoolNode,
        BooleanNode,
        IdentityNode,
        NullNode,
        NumberNode,
        StringNode,
        TriNode,
        UnaryNode,
    )

    def lit(n) -> str | None:
        if isinstance(n, NumberNode):
            return n.text
        if isinstance(n, StringNode):
            return "'" + n.value.replace("'", "''") + "'"
        if isinstance(n, BoolNode):
            return "1" if n.value else "0"
        if isinstance(n, NullNode):
            return "NULL"
        if isinstance(n, UnaryNode) and n.op == "-":
            inner = lit(n.child)
            return None if inner is None else f"-{inner}"
        return None

    def ident(n) -> str | None:
        if isinstance(n, IdentityNode) and not n.is_star and n.name in columns:
            return f'"{n.name}"'
        return None

    def lit_ok(col_node, lit_node) -> bool:
        """Literal type matches the column affinity — pushing is exact."""
        aff = columns.get(getattr(col_node, "name", None))
        if isinstance(lit_node, NullNode):
            return True
        if isinstance(lit_node, StringNode):
            return aff == "TEXT"
        if isinstance(lit_node, (NumberNode, BoolNode)):
            return aff in _NUMERIC_AFFINITIES
        if isinstance(lit_node, UnaryNode) and lit_node.op == "-":
            return lit_ok(col_node, lit_node.child)
        return False

    if isinstance(node, BinaryNode):
        if node.op in ("AND", "OR"):
            lhs, rhs = _sqlite_expr(node.left, columns), _sqlite_expr(node.right, columns)
            if lhs is None or rhs is None:
                return None
            return f"({lhs} {node.op} {rhs})"
        lhs = ident(node.left)
        if lhs is None:
            return None
        if node.op in ("=", "!=", "<", "<=", ">", ">="):
            rhs = lit(node.right)
            if rhs is None or not lit_ok(node.left, node.right):
                return None
            if isinstance(node.right, NullNode):
                # dialect missing-ness counts empty string as NULL
                # (value/value.go:510 parity, translate.exists_column)
                if node.op == "=":
                    return f"({lhs} IS NULL OR {lhs} = '')"
                return f"({lhs} IS NOT NULL AND {lhs} != '')"
            op = "==" if node.op == "=" else node.op
            return f"{lhs} {op} {rhs}"
        if node.op == "LIKE" and isinstance(node.right, StringNode):
            # SQLite LIKE is case-insensitive and `_` is a wildcard — for a
            # POSITIVE pattern both differences only widen the match set,
            # which is safe (the engine re-applies the exact predicate).
            # A NEGATED pattern inverts a widened set → rows lost: never
            # push. `?` is a dialect single-char wildcard but literal in
            # SQLite (narrows) → never push patterns containing it.
            if node.negated or "?" in node.right.value:
                return None
            if columns.get(node.left.name) != "TEXT":
                # sqlite LIKE on a numeric column matches against sqlite's
                # text rendering, which need not equal the engine's
                return None
            pat = node.right.value.replace("*", "%")
            return f"{lhs} LIKE '" + pat.replace("'", "''") + "'"
        if node.op == "IN" and isinstance(node.right, ArrayNode):
            vals = [lit(i) for i in node.right.items]
            if any(v is None for v in vals) or not all(lit_ok(node.left, i) for i in node.right.items):
                return None
            neg = "NOT " if node.negated else ""
            return f"{lhs} {neg}IN ({', '.join(vals)})"
        if node.op == "IS":
            if isinstance(node.right, NullNode):
                if node.negated:
                    return f"({lhs} IS NOT NULL AND {lhs} != '')"
                return f"({lhs} IS NULL OR {lhs} = '')"
            return None
        return None
    if isinstance(node, BooleanNode):
        parts = [_sqlite_expr(a, columns) for a in node.args]
        if any(p is None for p in parts):
            return None
        joined = f" {node.op} ".join(parts)
        return f"NOT ({joined})" if node.negated else f"({joined})"
    if isinstance(node, UnaryNode):
        if node.op == "NOT":
            inner = _sqlite_expr(node.child, columns)
            return None if inner is None else f"NOT ({inner})"
        if node.op == "EXISTS":
            # existence counts empty string as missing (value/value.go:510)
            col = ident(node.child)
            return None if col is None else f"({col} IS NOT NULL AND {col} != '')"
        return None
    if isinstance(node, TriNode) and node.op == "BETWEEN":
        col = ident(node.args[0])
        lo, hi = lit(node.args[1]), lit(node.args[2])
        if col is None or lo is None or hi is None:
            return None
        if not (lit_ok(node.args[0], node.args[1]) and lit_ok(node.args[0], node.args[2])):
            return None
        # dialect BETWEEN is exclusive (vm/vm.go:868)
        body = f"({col} > {lo} AND {col} < {hi})"
        return f"NOT {body}" if node.negated else body
    if isinstance(node, BoolNode):
        return "1" if node.value else "0"
    return None


def load_source(spark: SparkSession, cfg: dict) -> dict[str, DataFrame]:
    """Load a source config → {table_name: DataFrame}."""
    typ = (cfg.get("type") or cfg.get("format") or "csv").lower()
    if typ == "memory":
        df = spark.createDataFrame(cfg.get("rows", []), schema=cfg.get("schema"))
        return {cfg.get("table", "t"): df}
    if "tables" in cfg:
        # cloud-files-style multi-table source (datasource/files/filesource.go:31):
        # file listing → tables; Spark's reader handles partitioned layouts
        return {name: _read_one(spark, typ, path, cfg) for name, path in cfg["tables"].items()}
    if typ == "sqlite" and "file" in cfg and "path" not in cfg:
        cfg = {**cfg, "path": cfg["file"]}
    if typ == "jdbc" and "url" in cfg and "path" not in cfg:
        cfg = {**cfg, "path": cfg["url"]}
    if "path" not in cfg:
        raise SourceError("source config requires 'path' or 'tables'")
    return {cfg.get("table", "t"): _read_one(spark, typ, cfg["path"], cfg)}
