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


def _read_one(spark: SparkSession, typ: str, path: str, cfg: dict) -> DataFrame:
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
