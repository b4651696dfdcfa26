"""PEP 249 (DB-API 2.0) interface over the engine.

Reference parity: the reference registers a Go ``database/sql`` driver
named "qlbridge" (/root/reference/qlbdriver/driver.go,
exec/sqldriver.go:50) so any Go program can ``sql.Open("qlbridge", ...)``
and use standard rows/cursors. PEP 249 is Python's equivalent contract —
``connect() → Connection → cursor() → execute/fetchone/fetchmany/
fetchall`` with ``description`` metadata — so qlbridge_spark drops into
any DB-API-consuming code (pandas.read_sql, ORMs with a thin dialect,
REPL tools).

Usage::

    from qlbridge_spark.dbapi import connect
    conn = connect(spark)                       # or connect(spark, engine=...)
    conn.engine.load_parquet_dir("/data/sf1")
    cur = conn.cursor()
    cur.execute("SELECT n_name, count(*) AS n FROM nation GROUP BY n_name")
    print(cur.description)                      # [(name, type, ...), ...]
    rows = cur.fetchall()                       # list of tuples

Row fetching uses ``toLocalIterator`` so the driver never materializes
more than ``arraysize`` partitions' worth of rows at once.
"""

from __future__ import annotations

from typing import Any

apilevel = "2.0"
threadsafety = 1  # threads may share the module, not connections
paramstyle = "qmark"  # execute("... WHERE x = ?", [5])


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class ProgrammingError(Error):
    pass


def connect(spark=None, engine=None, name: str = "default"):
    """Open a DB-API connection over a new or existing Engine."""
    if engine is None:
        if spark is None:
            raise InterfaceError("connect() requires a SparkSession or an Engine")
        from .engine import Engine

        engine = Engine(spark, name)
    return Connection(engine)


class Connection:
    def __init__(self, engine):
        self.engine = engine
        self._closed = False
        # operation text → PreparedStatement (or False = unpreparable,
        # use literal splicing); see Cursor.execute
        self._prepared: dict[str, object] = {}

    def cursor(self) -> "Cursor":
        self._check()
        return Cursor(self)

    def close(self) -> None:
        self._closed = True

    def commit(self) -> None:
        # parity: COMMIT/ROLLBACK are parse-only no-ops in the dialect
        # (lex/dialect_sql.go:203-210)
        self._check()

    def rollback(self) -> None:
        self._check()

    def _check(self):
        if self._closed:
            raise InterfaceError("connection is closed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _substitute_params(sql: str, params) -> str:
    """qmark substitution with literal quoting (the engine's parser takes
    statement text; Spark-side binding isn't part of the dialect)."""
    if not params:
        return sql
    out = []
    it = iter(params)
    in_str: str | None = None
    escaped = False
    for ch in sql:
        if in_str:
            out.append(ch)
            if escaped:
                escaped = False
            elif ch == "\\" and in_str != "`":
                escaped = True  # lexer supports backslash escapes in strings
            elif ch == in_str:
                # backtick identifiers have no escapes; `` doubling simply
                # closes and reopens the span, which scans identically
                in_str = None
            continue
        if ch in "\"'`":
            in_str = ch
            out.append(ch)
            continue
        if ch == "?":
            try:
                v = next(it)
            except StopIteration:
                raise ProgrammingError("not enough parameters for statement") from None
            out.append(_quote(v))
            continue
        out.append(ch)
    try:
        next(it)
        raise ProgrammingError("too many parameters for statement")
    except StopIteration:
        pass
    return "".join(out)


def _quote(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'


class Cursor:
    arraysize = 100

    def __init__(self, conn: Connection):
        self._conn = conn
        self._iter = None
        self._schema = None
        self.rowcount = -1
        self.lastrowid = None

    # -- DB-API metadata ------------------------------------------------
    @property
    def description(self):
        if self._schema is None:
            return None
        return [(f.name, f.dataType.simpleString(), None, None, None, None, f.nullable) for f in self._schema.fields]

    # -- execution ------------------------------------------------------
    def execute(self, operation: str, parameters=None) -> "Cursor":
        self._conn._check()
        from pyspark.sql import DataFrame

        try:
            if parameters:
                # real prepared-statement binds (typed, injection-safe) —
                # the handle is cached per operation text so executemany /
                # repeated execute skip re-parsing and reuse param-free
                # subquery folds (engine.prepare). Statements that cannot
                # take translate-time binds (custom dialects, DML VALUES
                # literal slots) fall back to literal splicing, and the
                # fallback is remembered per operation.
                params = tuple(parameters)
                ps = self._conn._prepared.get(operation)
                if ps is None:
                    try:
                        ps = self._conn.engine.prepare(operation)
                    except Exception:
                        ps = False
                    self._conn._prepared[operation] = ps
                _miss = object()
                out = _miss
                if ps is not False and ps.n_params == len(params):
                    from .exprparse import ParseError
                    from .translate import TranslateError

                    try:
                        out = ps.execute(*params)
                    except (ParseError, TranslateError):
                        # prepare/translate-time failure only: this
                        # statement shape cannot take typed binds — demote
                        # to literal splicing. Runtime ExecErrors from a
                        # successfully-translated execution PROPAGATE: a
                        # DML that failed after partially applying effects
                        # must not silently run twice, and the typed-bind
                        # path must not be permanently lost to a transient
                        # runtime failure.
                        self._conn._prepared[operation] = False
                        out = _miss
                if out is _miss:
                    out = self._conn.engine.execute(_substitute_params(operation, params))
            else:
                out = self._conn.engine.execute(operation)
        except Error:
            raise
        except Exception as e:  # ParseError/TranslateError/ExecError → DB-API
            raise ProgrammingError(str(e)) from e
        if isinstance(out, DataFrame):
            self._schema = out.schema
            self._iter = out.toLocalIterator()
            self.rowcount = -1
        else:
            self._schema = None
            self._iter = None
            self.rowcount = out if isinstance(out, int) else -1
        return self

    def executemany(self, operation: str, seq_of_parameters) -> "Cursor":
        for p in seq_of_parameters:
            self.execute(operation, p)
        return self

    # -- fetching -------------------------------------------------------
    def fetchone(self):
        self._check_result()
        try:
            return tuple(next(self._iter))
        except StopIteration:
            return None

    def fetchmany(self, size: int | None = None):
        self._check_result()
        n = size or self.arraysize
        rows = []
        for _ in range(n):
            r = self.fetchone()
            if r is None:
                break
            rows.append(r)
        return rows

    def fetchall(self):
        self._check_result()
        return [tuple(r) for r in self._iter]

    def __iter__(self):
        self._check_result()
        return (tuple(r) for r in self._iter)

    def _check_result(self):
        if self._iter is None:
            raise ProgrammingError("no result set (statement was not a query)")

    def close(self) -> None:
        self._iter = None

    def setinputsizes(self, sizes) -> None:  # pragma: no cover - no-op per spec
        pass

    def setoutputsize(self, size, column=None) -> None:  # pragma: no cover
        pass
