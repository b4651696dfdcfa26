"""Writable table sinks — the cluster-scale DML write path.

The engine's default DML is registry-swap on in-memory DataFrames (correct
semantics, right for the reference's membtree/memdb-style sources). At
100 TB the write path must target a transactional table format instead:
this module maps the reference's connection capability interfaces
(/root/reference/schema/datasource.go:96-161 — ConnUpsert.PutMulti,
ConnPatchWhere.PatchWhere, ConnDeletion.DeleteExpression) onto Delta
Lake's MERGE INTO / UPDATE / DELETE.

Delta is an OPTIONAL dependency (no jar in this container): the sink
detects availability at import-probe time, constructs only when present,
and the test suite skips cleanly otherwise. Engine integration:

    eng.register_sink("users", DeltaMergeSink(spark, path, key="user_id"))
    eng.execute('UPSERT INTO users (user_id, name) VALUES ("u1", "Aa")')
    eng.execute('UPDATE users SET name = "Bb" WHERE user_id = "u1"')
    eng.execute('DELETE FROM users WHERE user_id = "u1"')

INSERT appends; UPSERT compiles to ``MERGE INTO ... whenMatchedUpdateAll
whenNotMatchedInsertAll``; UPDATE/DELETE push the translated predicate
into Delta (file-skipping + transactional rewrite — no full-table swap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def delta_available() -> bool:
    """True when the delta-spark package (and its jar) is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class DeltaMergeSink:
    """Delta-backed writable table (ConnUpsert/ConnPatchWhere/ConnDeletion
    parity, schema/datasource.go:96-161)."""

    def __init__(self, spark: SparkSession, path: str, key: str):
        if not delta_available():
            raise ImportError(
                "DeltaMergeSink requires the optional 'delta-spark' package "
                "(pip install delta-spark, with spark.sql.extensions="
                "io.delta.sql.DeltaSparkSessionExtension); the engine's "
                "default in-memory DML path needs no extra dependency"
            )
        self.spark = spark
        self.path = path
        self.key = key

    # -- reads ----------------------------------------------------------
    def scan(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("delta").load(self.path)

    # -- writes ---------------------------------------------------------
    def ensure(self, df: DataFrame) -> None:
        """Create the table from ``df`` if it does not exist yet."""
        import os

        if not os.path.exists(self.path):
            df.write.format("delta").mode("overwrite").save(self.path)

    def _table(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def insert_append(self, new: DataFrame) -> None:
        new.write.format("delta").mode("append").save(self.path)

    def merge_upsert(self, new: DataFrame, key: str | None = None) -> None:
        k = key or self.key
        (
            self._table()
            .alias("t")
            .merge(new.alias("s"), f"t.`{k}` = s.`{k}`")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def update_where(self, cond: Column, assignments: dict[str, Column]) -> None:
        self._table().update(cond, assignments)

    def delete_where(self, cond: Column | None) -> None:
        if cond is None:
            self._table().delete()
        else:
            self._table().delete(cond)
