"""ANSI MERGE INTO (superset — the reference exposes only sink-level
whole-row upsert). One-pass full-outer-join lowering with
first-match-wins clause selection; Delta-style cardinality enforcement.
Semantics cross-checked against DuckDB's MERGE-equivalent rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError


@pytest.fixture()
def eng(spark):
    e = Engine(spark, "merge-test")
    e.register_rows(
        "tgt",
        [
            {"id": 1, "v": 10, "tag": "old"},
            {"id": 2, "v": 20, "tag": "old"},
            {"id": 3, "v": 30, "tag": "old"},
        ],
    )
    e.register_rows(
        "src",
        [
            {"id": 2, "v": 200, "tag": "new"},
            {"id": 3, "v": -1, "tag": "new"},
            {"id": 4, "v": 400, "tag": "new"},
        ],
    )
    return e


def _state(eng, table="tgt"):
    return {r["id"]: (r["v"], r["tag"]) for r in eng.sql(f"SELECT * FROM {table}").collect()}


class TestMergeInto:
    def test_update_insert(self, eng):
        n = eng.execute(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag "
            "WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'ins')"
        )
        assert n == 3  # 2 updates + 1 insert
        assert _state(eng) == {1: (10, "old"), 2: (200, "new"), 3: (-1, "new"), 4: (400, "ins")}

    def test_clause_order_and_conditions(self, eng):
        # first matching clause wins: negative source v deletes, others update
        n = eng.execute(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED AND s.v < 0 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET v = t.v + s.v "
            "WHEN NOT MATCHED AND s.v > 100 THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'big')"
        )
        assert n == 3
        assert _state(eng) == {1: (10, "old"), 2: (220, "old"), 4: (400, "big")}

    def test_set_star_and_insert_star(self, eng):
        eng.execute(
            "MERGE INTO tgt USING src ON tgt.id = src.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        assert _state(eng) == {1: (10, "old"), 2: (200, "new"), 3: (-1, "new"), 4: (400, "new")}

    def test_subquery_source(self, eng):
        eng.execute(
            "MERGE INTO tgt t USING (SELECT id, v * 2 AS v2 FROM src WHERE v > 0) s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v2"
        )
        assert _state(eng)[2] == (400, "old")

    def test_cardinality_violation_raises(self, eng, spark):
        eng.register_rows("dup", [{"id": 2, "v": 1}, {"id": 2, "v": 2}])
        with pytest.raises(ExecError, match="cardinality"):
            eng.execute(
                "MERGE INTO tgt t USING dup d ON t.id = d.id "
                "WHEN MATCHED THEN UPDATE SET v = d.v"
            )

    def test_duplicate_sources_ok_for_insert_only(self, eng, spark):
        # without a MATCHED clause the Delta cardinality rule does not apply
        eng.register_rows("dup2", [{"id": 9, "v": 1, "tag": "x"}, {"id": 9, "v": 2, "tag": "x"}])
        eng.execute(
            "MERGE INTO tgt USING dup2 ON tgt.id = dup2.id WHEN NOT MATCHED THEN INSERT *"
        )
        assert eng.sql("SELECT count(*) AS n FROM tgt WHERE id = 9").collect()[0]["n"] == 2

    def test_merge_into_parquet_sink_versions(self, eng, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "m"), key="id")
        sink.ensure(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"))
        eng.register_sink("st", sink)
        n = eng.execute(
            "MERGE INTO st USING (SELECT 2 AS id, 99 AS v UNION ALL SELECT 5 AS id, 50 AS v) s "
            "ON st.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        assert n == 2
        assert {tuple(r) for r in eng.sql("SELECT * FROM st").collect()} == {(1, 10), (2, 99), (5, 50)}
        # the pre-merge snapshot is still time-travelable
        assert {tuple(r) for r in eng.sql("SELECT * FROM st VERSION AS OF 0").collect()} == {(1, 10), (2, 20)}

    def test_matches_duckdb_rewrite(self, eng, spark):
        """Cross-check the update+delete+insert composition against
        DuckDB computing the same final state with plain SQL."""
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE tgt AS SELECT * FROM (VALUES (1,10,'old'),(2,20,'old'),(3,30,'old')) v(id,v,tag)")
        con.execute("CREATE TABLE src AS SELECT * FROM (VALUES (2,200,'new'),(3,-1,'new'),(4,400,'new')) v(id,v,tag)")
        want = {
            (r[0], r[1], r[2])
            for r in con.execute(
                "SELECT t.id, CASE WHEN s.id IS NOT NULL THEN s.v ELSE t.v END, "
                "CASE WHEN s.id IS NOT NULL THEN s.tag ELSE t.tag END "
                "FROM tgt t LEFT JOIN src s ON t.id = s.id WHERE NOT (s.id IS NOT NULL AND s.v < 0) "
                "UNION ALL SELECT s.id, s.v, s.tag FROM src s ANTI JOIN tgt t ON t.id = s.id"
            ).fetchall()
        }
        eng.execute(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED AND s.v < 0 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        got = {tuple(r) for r in eng.sql("SELECT id, v, tag FROM tgt").collect()}
        assert got == want


class TestMergeSetNormalization:
    """UPDATE SET key resolution: alias/target-qualified and case-folded
    keys must resolve to target columns (the lexer folds ``t.v`` into one
    IDENT); unknown keys must error instead of silently dropping the
    assignment while still counting the row as affected."""

    def test_alias_qualified_set(self, eng):
        n = eng.execute(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET t.v = s.v"
        )
        assert n == 2
        assert _state(eng) == {1: (10, "old"), 2: (200, "old"), 3: (-1, "old")}

    def test_target_name_qualified_and_case_folded_set(self, eng):
        eng.execute(
            "MERGE INTO tgt USING src ON tgt.id = src.id "
            "WHEN MATCHED THEN UPDATE SET tgt.V = src.v"
        )
        assert _state(eng)[2] == (200, "old")

    def test_unknown_set_key_raises(self, eng):
        with pytest.raises(ExecError, match="unknown target column"):
            eng.execute(
                "MERGE INTO tgt t USING src s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET nope = s.v"
            )

    def test_source_alias_qualified_set_key_raises(self, eng):
        # SET targets are target columns; a source-qualified key is invalid
        with pytest.raises(ExecError, match="unknown target column"):
            eng.execute(
                "MERGE INTO tgt t USING src s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET s.v = t.v"
            )


class TestMergeSingleExecution:
    def test_join_executes_once(self, spark):
        """The full-outer join is persisted and the whole statement
        (cardinality check, affected count, output build) reads ONE
        materialization — pinned by an accumulator that counts scans of
        the target side (previously up to 4 executions per MERGE)."""
        acc = spark.sparkContext.accumulator(0)
        base = spark.createDataFrame(
            [(1, 10, "old"), (2, 20, "old")], "id long, v long, tag string"
        )

        def bump(it):
            acc.add(1)
            return it

        counted = spark.createDataFrame(base.rdd.coalesce(1).mapPartitions(bump), base.schema)
        e = Engine(spark, "merge-scan-count")
        e.register_df("t2", counted)
        e.register_rows("s2", [{"id": 2, "v": 200, "tag": "new"}, {"id": 9, "v": 900, "tag": "new"}])
        n = e.execute(
            "MERGE INTO t2 t USING s2 s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        assert n == 2
        assert acc.value == 1, f"target scanned {acc.value}x during MERGE (join must execute once)"
        got = {r["id"]: (r["v"], r["tag"]) for r in e.sql("SELECT * FROM t2").collect()}
        assert got == {1: (10, "old"), 2: (200, "old"), 9: (900, "new")}
        # the registered result is materialized: reading it again does not
        # re-execute the (unpersisted) join
        e.sql("SELECT * FROM t2").collect()
        assert acc.value == 1


class TestConditionAwareCardinality:
    """ANSI 14.12 / Delta rule: a multi-match is an error only when more
    than one source row's first-matching arm would update/delete the
    target row — conditions that disambiguate the acting row are legal
    (the old raw-match check errored on these), and the acting row's
    effect must win over the non-acting duplicates."""

    def test_disambiguated_update_applies(self, eng):
        eng.register_rows(
            "dsrc", [{"id": 2, "v": 100, "pick": 1}, {"id": 2, "v": 999, "pick": 0}]
        )
        n = eng.execute(
            "MERGE INTO tgt t USING dsrc s ON t.id = s.id "
            "WHEN MATCHED AND s.pick = 1 THEN UPDATE SET v = s.v"
        )
        assert n == 1
        assert _state(eng)[2] == (100, "old")  # picked row's value, not 999/arbitrary

    def test_disambiguated_delete_removes_row(self, eng):
        eng.register_rows(
            "dsrc2", [{"id": 3, "v": 1, "pick": 1}, {"id": 3, "v": 2, "pick": 0}]
        )
        n = eng.execute(
            "MERGE INTO tgt t USING dsrc2 s ON t.id = s.id "
            "WHEN MATCHED AND s.pick = 1 THEN DELETE"
        )
        assert n == 1
        # the non-acting duplicate must not resurrect the deleted row
        assert 3 not in _state(eng)

    def test_two_acting_rows_still_error(self, eng):
        eng.register_rows(
            "dsrc3", [{"id": 2, "v": 100, "pick": 1}, {"id": 2, "v": 999, "pick": 1}]
        )
        with pytest.raises(ExecError, match="cardinality"):
            eng.execute(
                "MERGE INTO tgt t USING dsrc3 s ON t.id = s.id "
                "WHEN MATCHED AND s.pick = 1 THEN UPDATE SET v = s.v"
            )

    def test_acting_row_chosen_across_different_arms(self, eng):
        # one source row routes to DELETE, the other to no arm: delete wins
        eng.register_rows(
            "dsrc4", [{"id": 1, "v": -5, "pick": 0}, {"id": 1, "v": 7, "pick": 0}]
        )
        n = eng.execute(
            "MERGE INTO tgt t USING dsrc4 s ON t.id = s.id "
            "WHEN MATCHED AND s.v < 0 THEN DELETE "
            "WHEN MATCHED AND s.pick = 1 THEN UPDATE SET v = s.v"
        )
        assert n == 1
        assert 1 not in _state(eng)
