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
    if "path" not in cfg:
        raise SourceError("source config requires 'path' or 'tables'")
    return {cfg.get("table", "t"): _read_one(spark, typ, cfg["path"], cfg)}
