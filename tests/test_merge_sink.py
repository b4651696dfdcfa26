"""MERGE-capable writable sinks (cluster DML write path).

The engine routes INSERT/UPSERT/UPDATE/DELETE to a registered sink
(ConnUpsert/ConnPatchWhere/ConnDeletion parity — reference
schema/datasource.go:96-161) instead of the in-memory registry swap.
Routing is tested with an in-memory fake implementing the sink protocol;
the Delta-backed implementation runs only when delta-spark is installed
(not in this container) and skips cleanly otherwise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine
from qlbridge_spark.sinks import DeltaMergeSink, delta_available


class FakeMergeSink:
    """In-memory sink implementing the DeltaMergeSink protocol — pins the
    engine-side routing and predicate/assignment translation."""

    def __init__(self, df, key):
        self.df = df
        self.key = key
        self.calls: list[str] = []

    def scan(self, spark):
        return self.df

    def insert_append(self, new):
        self.calls.append("insert_append")
        self.df = self.df.unionByName(new, allowMissingColumns=True)

    def merge_upsert(self, new, key=None):
        self.calls.append("merge_upsert")
        k = key or self.key
        old_only = self.df.join(new.select(k), on=k, how="left_anti")
        self.df = old_only.unionByName(new, allowMissingColumns=True)

    def update_where(self, cond, assignments):
        self.calls.append("update_where")
        df = self.df
        for cname, newv in assignments.items():
            df = df.withColumn(cname, F.when(cond, newv).otherwise(F.col(cname)))
        self.df = df

    def delete_where(self, cond):
        self.calls.append("delete_where")
        self.df = self.df.limit(0) if cond is None else self.df.filter(~cond | cond.isNull())


@pytest.fixture()
def eng(spark):
    e = Engine(spark, "sink-test")
    df = spark.createDataFrame(
        [("u1", "Aaron", 10), ("u2", "Bob", 20)], "user_id string, name string, score long"
    )
    e.register_sink("users", FakeMergeSink(df, key="user_id"))
    return e


class TestSinkRouting:
    def test_insert_appends(self, eng):
        n = eng.execute('INSERT INTO users (user_id, name, score) VALUES ("u3", "Cara", 30)')
        assert n == 1
        sink = eng.sinks["users"]
        assert sink.calls == ["insert_append"]
        assert eng.sql("SELECT count(*) AS n FROM users").collect()[0]["n"] == 3

    def test_upsert_merges_on_declared_key(self, eng):
        n = eng.execute('UPSERT INTO users (user_id, name, score) VALUES ("u2", "Bobby", 25), ("u4", "Dee", 5)')
        assert n == 2
        sink = eng.sinks["users"]
        assert sink.calls == ["merge_upsert"]
        rows = {r["user_id"]: (r["name"], r["score"]) for r in eng.sql("SELECT * FROM users").collect()}
        assert rows["u2"] == ("Bobby", 25)  # matched → updated
        assert rows["u4"] == ("Dee", 5)  # not matched → inserted
        assert len(rows) == 3

    def test_update_where_pushes_predicate(self, eng):
        n = eng.execute('UPDATE users SET score = score + 1 WHERE user_id = "u1"')
        assert n == 1
        assert eng.sinks["users"].calls == ["update_where"]
        rows = {r["user_id"]: r["score"] for r in eng.sql("SELECT * FROM users").collect()}
        assert rows == {"u1": 11, "u2": 20}

    def test_delete_where_pushes_predicate(self, eng):
        n = eng.execute("DELETE FROM users WHERE score > 15")
        assert n == 1
        assert eng.sinks["users"].calls == ["delete_where"]
        assert [r["user_id"] for r in eng.sql("SELECT * FROM users").collect()] == ["u1"]

    def test_select_reads_sink_state(self, eng):
        eng.execute('INSERT INTO users (user_id, name, score) VALUES ("u9", "Zed", 99)')
        rows = eng.sql("SELECT name FROM users WHERE score > 50").collect()
        assert [r["name"] for r in rows] == ["Zed"]


class TestDeltaSink:
    def test_register_sink_evicts_stale_table(self, spark):
        # a pre-existing in-memory table of the same name must not shadow
        # the sink's live state after registration
        e = Engine(spark, "sink-evict")
        e.register_rows("users", [{"user_id": "stale", "name": "x", "score": 0}])
        df = spark.createDataFrame([("u1", "Aaron", 10)], "user_id string, name string, score long")
        e.register_sink("users", FakeMergeSink(df, key="user_id"))
        rows = e.sql("SELECT user_id FROM users").collect()
        assert [r["user_id"] for r in rows] == ["u1"]

    def test_missing_delta_raises_helpfully(self, spark, tmp_path):
        if delta_available():
            pytest.skip("delta-spark installed — constructor must succeed instead")
        with pytest.raises(ImportError, match="delta-spark"):
            DeltaMergeSink(spark, str(tmp_path / "d"), key="user_id")

    @pytest.mark.skipif(not delta_available(), reason="delta-spark not installed in this environment")
    def test_delta_merge_roundtrip(self, spark, tmp_path):
        eng = Engine(spark, "delta-test")
        path = str(tmp_path / "users_delta")
        sink = DeltaMergeSink(spark, path, key="user_id")
        sink.ensure(spark.createDataFrame([("u1", "Aaron")], "user_id string, name string"))
        eng.register_sink("users", sink)
        eng.execute('UPSERT INTO users (user_id, name) VALUES ("u1", "Aa"), ("u2", "Bb")')
        rows = {r["user_id"]: r["name"] for r in eng.sql("SELECT * FROM users").collect()}
        assert rows == {"u1": "Aa", "u2": "Bb"}
        eng.execute('UPDATE users SET name = "Cc" WHERE user_id = "u2"')
        eng.execute('DELETE FROM users WHERE user_id = "u1"')
        rows = {r["user_id"]: r["name"] for r in eng.sql("SELECT * FROM users").collect()}
        assert rows == {"u2": "Cc"}


class TestParquetMergeSink:
    """Durable no-dependency MERGE sink: the same DML round-trip the Delta
    case runs (which skips in this container), e2e on disk — staging dir +
    atomic _VERSION pointer swap."""

    def test_full_dml_roundtrip_on_disk(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "pq-sink-test")
        path = str(tmp_path / "users_pq")
        sink = ParquetMergeSink(spark, path, key="user_id")
        sink.ensure(spark.createDataFrame([("u1", "Aaron", 10)], "user_id string, name string, score long"))
        eng.register_sink("users", sink)

        eng.execute('UPSERT INTO users (user_id, name, score) VALUES ("u1", "Aa", 11), ("u2", "Bb", 22)')
        rows = {r["user_id"]: (r["name"], r["score"]) for r in eng.sql("SELECT * FROM users").collect()}
        assert rows == {"u1": ("Aa", 11), "u2": ("Bb", 22)}

        eng.execute('UPDATE users SET score = score + 1 WHERE user_id = "u2"')
        eng.execute('DELETE FROM users WHERE user_id = "u1"')
        rows = {r["user_id"]: r["score"] for r in eng.sql("SELECT * FROM users").collect()}
        assert rows == {"u2": 23}

        eng.execute('INSERT INTO users (user_id, name, score) VALUES ("u3", "Cc", 3)')
        assert eng.sql("SELECT count(*) AS n FROM users").collect()[0]["n"] == 2

    def test_snapshot_isolation_and_vacuum(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        path = str(tmp_path / "snap_pq")
        sink = ParquetMergeSink(spark, path, key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        # a reader holding the OLD snapshot keeps reading it after a commit
        old = sink.scan(spark)
        sink.merge_upsert(spark.createDataFrame([(1, "a2"), (2, "b")], "id long, v string"))
        assert {tuple(r) for r in old.collect()} == {(1, "a")}
        assert {tuple(r) for r in sink.scan(spark).collect()} == {(1, "a2"), (2, "b")}
        # vacuum retains only the newest version; current scan still works
        removed = sink.vacuum(keep=1)
        assert removed == 1
        assert sink.scan(spark).count() == 2

    def test_version_as_of_time_travel(self, spark, tmp_path):
        """FROM t VERSION AS OF n reads the pinned snapshot — the
        reproducible-read primitive a training run needs (same data on
        re-run regardless of later MERGEs)."""
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "tt-test")
        sink = ParquetMergeSink(spark, str(tmp_path / "tt"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))  # v0
        eng.register_sink("t", sink)
        eng.execute('UPSERT INTO t (id, v) VALUES (1, "a2"), (2, "b")')  # v1
        eng.execute("DELETE FROM t WHERE id = 1")  # v2
        assert {tuple(r) for r in eng.sql("SELECT * FROM t VERSION AS OF 0").collect()} == {(1, "a")}
        assert {tuple(r) for r in eng.sql("SELECT * FROM t VERSION AS OF 1").collect()} == {(1, "a2"), (2, "b")}
        assert {tuple(r) for r in eng.sql("SELECT * FROM t").collect()} == {(2, "b")}
        # aliased + joined time travel composes
        rows = eng.sql(
            "SELECT cur.id, old.v AS was FROM t cur JOIN t VERSION AS OF 1 AS old ON cur.id = old.id"
        ).collect()
        assert [(r["id"], r["was"]) for r in rows] == [(2, "b")]

    def test_version_as_of_errors(self, spark, tmp_path):
        from qlbridge_spark.engine import ExecError
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "tt-err")
        sink = ParquetMergeSink(spark, str(tmp_path / "tte"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        sink.merge_upsert(spark.createDataFrame([(2, "b")], "id long, v string"))
        eng.register_sink("t", sink)
        eng.register_rows("plain", [{"id": 1}])
        with pytest.raises(Exception, match="not available"):
            eng.sql("SELECT * FROM t VERSION AS OF 9").collect()
        with pytest.raises(ExecError, match="versioned sink"):
            eng.sql("SELECT * FROM plain VERSION AS OF 0").collect()
        # vacuum drops v0; time travel to it must raise, current still works
        sink.vacuum(keep=1)
        with pytest.raises(Exception, match="not available"):
            eng.sql("SELECT * FROM t VERSION AS OF 0").collect()
        assert eng.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 2
        # a table alias literally named `version` still parses as an alias
        assert eng.sql("SELECT version.id FROM plain version").collect()[0]["id"] == 1

    def test_timestamp_as_of(self, spark, tmp_path):
        """TIMESTAMP AS OF resolves the latest snapshot committed at or
        before the given wall time (commit times = version dir mtimes)."""
        import datetime
        import time

        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "ts-tt")
        sink = ParquetMergeSink(spark, str(tmp_path / "ts"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))  # v0
        time.sleep(1.1)
        mid = datetime.datetime.now(datetime.timezone.utc).isoformat()
        time.sleep(1.1)
        sink.merge_upsert(spark.createDataFrame([(2, "b")], "id long, v string"))  # v1
        eng.register_sink("t", sink)
        got = {tuple(r) for r in eng.sql(f"SELECT * FROM t TIMESTAMP AS OF '{mid}'").collect()}
        assert got == {(1, "a")}
        now = datetime.datetime.now(datetime.timezone.utc).isoformat()
        got = {tuple(r) for r in eng.sql(f"SELECT * FROM t TIMESTAMP AS OF '{now}'").collect()}
        assert got == {(1, "a"), (2, "b")}
        with pytest.raises(Exception, match="at or before"):
            eng.sql("SELECT * FROM t TIMESTAMP AS OF '1999-01-01T00:00:00+00:00'").collect()
        # a table alias literally named `timestamp` still parses as alias
        eng.register_rows("plain", [{"id": 5}])
        assert eng.sql("SELECT timestamp.id FROM plain timestamp").collect()[0]["id"] == 5

    def test_describe_history(self, spark, tmp_path):
        from qlbridge_spark.engine import ExecError
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "hist-test")
        sink = ParquetMergeSink(spark, str(tmp_path / "h"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        sink.merge_upsert(spark.createDataFrame([(2, "b")], "id long, v string"))
        eng.register_sink("t", sink)
        rows = eng.sql("DESCRIBE HISTORY t").orderBy("version").collect()
        assert [(r["version"], r["is_current"]) for r in rows] == [(0, False), (1, True)]
        eng.register_rows("plain", [{"id": 1}])
        with pytest.raises(ExecError, match="versioned sink"):
            eng.sql("DESCRIBE HISTORY plain").collect()

    def test_uninitialized_scan_raises(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "empty_pq"), key="id")
        with pytest.raises(FileNotFoundError, match="no committed version"):
            sink.scan(spark)

    @staticmethod
    def _drain_until(q, eng, table: str, expected: set, deadline_s: float = 90.0) -> set:
        """Re-drive the stream until the sink state equals ``expected``.

        processAllAvailable() only guarantees data visible AT CALL TIME is
        processed — under full-suite load the file-source listing can lag
        a just-finished append, so a single pass (or a short fixed retry
        count) is a race. Poll with a generous wall-clock deadline; the
        happy path exits on the first iteration. Raises the stream's own
        exception immediately if the query died (no silent timeout)."""
        import time

        end = time.time() + deadline_s
        got = None
        while True:
            q.processAllAvailable()  # raises if the stream terminated with an error
            got = {tuple(r) for r in eng.sql(f"SELECT * FROM {table}").collect()}
            if got == expected or time.time() >= end:
                return got
            time.sleep(0.3)

    def test_streaming_upsert_routes_to_parquet_sink(self, spark, tmp_path):
        """The streaming upsert sink prefers a registered merge sink — the
        durable path now runs e2e without Delta: micro-batches MERGE into
        the versioned parquet table, latest-wins by the order_by column."""
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "pq-stream-test")
        stream_dir = str(tmp_path / "pq_stream")
        v1 = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "id long, k string, seq long")
        v1.write.parquet(stream_dir)
        eng.register_df("src", v1)
        sink = ParquetMergeSink(spark, str(tmp_path / "pq_state"), key="id")
        sink.ensure(v1.limit(0))
        eng.register_sink("state_pq", sink)

        # query name must be UNIQUE across the whole suite: the Spark
        # session is session-scoped and test_streaming_vm.py also runs a
        # query named "up" — a not-yet-deregistered duplicate makes
        # start() fail only in full-suite runs
        q = eng.execute(
            "CREATE CONTINUOUSVIEW pq_sink_upsert AS SELECT id, k, seq FROM src "
            f'WITH {{"path": "{stream_dir}", "format": "upsert", "target": "state_pq", '
            f'"key": "id", "order_by": "seq"}}'
        )
        try:
            expected1 = {(1, "a", 10), (2, "b", 20)}
            got = self._drain_until(q, eng, "state_pq", expected1)
            assert got == expected1
            # duplicate keys within one batch: the HIGHEST seq wins (real
            # recency, not arbitrary) — id=2 gets seq 22, id=3 inserted
            spark.createDataFrame(
                [(2, "b-old", 21), (2, "b-new", 22), (3, "c", 30)], "id long, k string, seq long"
            ).write.mode("append").parquet(stream_dir)
            expected2 = {(1, "a", 10), (2, "b-new", 22), (3, "c", 30)}
            got = self._drain_until(q, eng, "state_pq", expected2)
            assert got == expected2
        finally:
            q.stop()


class NativeFakeMergeSink(FakeMergeSink):
    """Protocol fake for the NATIVE merge path (DeltaMergeSink.merge_when):
    interprets the lowered when-chains over a full-outer join with
    F.expr, i.e. what Delta's merge builder does — independently of the
    engine's translate.py lowering."""

    def overwrite(self, df):
        self.calls.append("overwrite")
        self.df = df.localCheckpoint(eager=True)

    def merge_when(self, source, on_sql, clauses, t_alias="t", s_alias="s"):
        self.calls.append("merge_when")
        self.last_lowering = (on_sql, clauses, t_alias, s_alias)
        TID, SM = "__tid", "__sm"
        t = self.df.withColumn(TID, F.monotonically_increasing_id()).alias(t_alias)
        s = source.withColumn(SM, F.lit(1)).alias(s_alias)
        j = t.join(s, on=F.expr(on_sql), how="full_outer").persist()
        matched = F.col(TID).isNotNull() & F.col(SM).isNotNull()
        act = None
        for i, cl in enumerate(clauses):
            base = matched if cl["matched"] else F.col(TID).isNull()
            if cl.get("cond"):
                base = base & F.expr(cl["cond"])
            act = F.when(base, F.lit(i)) if act is None else act.when(base, F.lit(i))
        act = F.coalesce(act, F.lit(-1))
        # Delta cardinality rule (condition-aware): error when >1 source
        # row's first-matching arm would modify the same target row
        mids = [i for i, cl in enumerate(clauses) if cl["matched"]]
        if mids:
            dups = (
                j.filter(F.col(TID).isNotNull() & act.isin(mids))
                .groupBy(TID).count().filter(F.col("count") > 1).limit(1).count()
            )
            if dups:
                j.unpersist()
                raise Exception(
                    "DELTA_MERGE cardinality violation: multiple source rows "
                    "attempted to modify the same target row"
                )
        tcols = self.df.columns
        scols = set(source.columns)
        exprs = []
        for c in tcols:
            dtype = self.df.schema[c].dataType
            e = F.col(f"{t_alias}.{c}")
            for i, cl in enumerate(clauses):
                sub = None
                if cl["action"] == "update":
                    if cl["set"] == "*":
                        sub = F.col(f"{s_alias}.{c}") if c in scols else None
                    elif c in cl["set"]:
                        sub = F.expr(cl["set"][c])
                elif cl["action"] == "insert":
                    vals = cl["values"]
                    if vals == "*":
                        sub = F.col(f"{s_alias}.{c}") if c in scols else F.lit(None)
                    else:
                        sub = F.expr(vals[c]) if c in vals else F.lit(None)
                if sub is not None:
                    e = F.when(act == i, sub.cast(dtype)).otherwise(e)
            exprs.append(e.alias(c))
        del_ids = [i for i, cl in enumerate(clauses) if cl["action"] == "delete"] or [-99]
        ins_ids = [i for i, cl in enumerate(clauses) if cl["action"] == "insert"] or [-99]
        from pyspark.sql import Window as _W

        keep_t = (
            j.filter(F.col(TID).isNotNull())
            .select(F.col(TID), act.alias("__a"), *exprs)
            .withColumn("__rn", F.row_number().over(
                _W.partitionBy(TID).orderBy((F.col("__a") != -1).desc())))
            .filter((F.col("__rn") == 1) & ~F.col("__a").isin(del_ids))
            .drop(TID, "__a", "__rn")
        )
        ins = j.filter(F.col(TID).isNull() & act.isin(ins_ids)).select(*exprs)
        n = j.filter(act != -1).count()
        self.df = keep_t.unionByName(ins).localCheckpoint(eager=True)
        j.unpersist()
        return int(n)


@pytest.fixture()
def neng(spark):
    e = Engine(spark, "native-merge-test")
    df = spark.createDataFrame(
        [(1, 10, "old"), (2, 20, "old"), (3, 30, "old")], "id long, v long, tag string"
    )
    sink = NativeFakeMergeSink(df, key="id")
    e.register_sink("tgt", sink)
    e.register_rows(
        "src",
        [
            {"id": 2, "v": 200, "tag": "new"},
            {"id": 3, "v": -1, "tag": "new"},
            {"id": 4, "v": 400, "tag": "new"},
        ],
    )
    return e, sink


class TestNativeMergeLowering:
    """MERGE INTO against a merge_when-capable sink lowers the when-chains
    to the sink's native builder (Delta: file-pruned incremental merge)
    instead of the generic full-outer-join + full-table overwrite()."""

    def _state(self, eng):
        return {r["id"]: (r["v"], r["tag"]) for r in eng.sql("SELECT * FROM tgt").collect()}

    def test_routes_to_native_builder(self, neng):
        eng, sink = neng
        n = eng.execute(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET t.v = s.v "
            "WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'ins')"
        )
        assert sink.calls == ["merge_when"]  # no overwrite: incremental path
        assert n == 3
        assert self._state(eng) == {
            1: (10, "old"), 2: (200, "old"), 3: (-1, "old"), 4: (400, "ins"),
        }

    def test_clause_order_and_conditions_native(self, neng):
        eng, sink = neng
        n = eng.execute(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED AND s.v < 0 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET v = t.v + s.v "
            "WHEN NOT MATCHED AND s.v > 100 THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'big')"
        )
        assert sink.calls == ["merge_when"]
        assert n == 3
        assert self._state(eng) == {1: (10, "old"), 2: (220, "old"), 4: (400, "big")}

    def test_set_star_insert_star_native(self, neng):
        eng, sink = neng
        eng.execute(
            "MERGE INTO tgt USING src ON tgt.id = src.id "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        assert sink.calls == ["merge_when"]
        assert self._state(eng) == {
            1: (10, "old"), 2: (200, "new"), 3: (-1, "new"), 4: (400, "new"),
        }

    def test_falls_back_on_divergent_expression(self, neng):
        """qlbridge BETWEEN is EXCLUSIVE — lowering it verbatim to Spark
        SQL (inclusive) would silently change results, so the engine must
        refuse the native path and run the translated generic plan."""
        eng, sink = neng
        eng.execute(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED AND s.v BETWEEN 100 AND 300 THEN UPDATE SET v = s.v"
        )
        assert sink.calls == ["overwrite"]  # generic path committed via overwrite
        # exclusive bounds: only v=200 qualifies (and 100/300 would not)
        assert self._state(eng) == {1: (10, "old"), 2: (200, "old"), 3: (30, "old")}

    def test_native_matches_generic_path(self, spark):
        """Same MERGE through the native lowering and the generic engine
        path must produce identical state and affected counts."""
        stmt = (
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED AND s.v < 0 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET v = s.v + 1, tag = s.tag "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        rows = [(1, 10, "old"), (2, 20, "old"), (3, 30, "old")]
        srows = [
            {"id": 2, "v": 200, "tag": "new"},
            {"id": 3, "v": -1, "tag": "new"},
            {"id": 4, "v": 400, "tag": "new"},
        ]
        schema = "id long, v long, tag string"

        e1 = Engine(spark, "nm-a")
        s1 = NativeFakeMergeSink(spark.createDataFrame(rows, schema), key="id")
        e1.register_sink("tgt", s1)
        e1.register_rows("src", srows)
        n1 = e1.execute(stmt)
        assert s1.calls == ["merge_when"]

        e2 = Engine(spark, "nm-b")
        e2.register_df("tgt", spark.createDataFrame(rows, schema))
        e2.register_rows("src", srows)
        n2 = e2.execute(stmt)

        assert n1 == n2
        got1 = {tuple(r) for r in e1.sql("SELECT id, v, tag FROM tgt").collect()}
        got2 = {tuple(r) for r in e2.sql("SELECT id, v, tag FROM tgt").collect()}
        assert got1 == got2


class TestDurableCommitTimestamps:
    """TIMESTAMP AS OF / DESCRIBE HISTORY resolve from the ``_commits``
    sidecar written at commit time — a copied/rsync'd warehouse (mtimes
    rewritten) must keep full history fidelity; mtimes are only a legacy
    fallback."""

    def _build(self, spark, path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, path, key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(2, "b")], "id long, v string"))
        return sink

    def test_copied_warehouse_resolves_timestamps(self, spark, tmp_path):
        import os
        import shutil

        src = str(tmp_path / "orig")
        sink = self._build(spark, src)
        t0 = sink.commit_time(0)
        t1 = sink.commit_time(1)
        assert t0 <= t1

        # copy WITHOUT preserving metadata, then scribble bogus mtimes on
        # every version dir (what rsync without -t / a fresh download does)
        dst = str(tmp_path / "copy")
        shutil.copytree(src, dst, copy_function=shutil.copy)
        bogus = 1_000_000_000  # 2001 — far before any real commit
        for name in os.listdir(dst):
            os.utime(os.path.join(dst, name), (bogus, bogus))

        from qlbridge_spark.sinks import ParquetMergeSink

        copied = ParquetMergeSink(spark, dst, key="id")
        assert copied.commit_time(0) == t0
        assert copied.commit_time(1) == t1
        assert copied.version_at(t1.isoformat()) == 1
        # a timestamp between the two commits resolves to v0 (mtime-based
        # resolution on the scribbled copy would have failed this)
        mid = t0 + (t1 - t0) / 2
        assert copied.version_at(mid.isoformat()) in (0, 1 if t0 == t1 else 0)

    def test_describe_history_uses_sidecar(self, spark, tmp_path):
        import os

        src = str(tmp_path / "hist")
        sink = self._build(spark, src)
        bogus = 1_000_000_000
        for name in os.listdir(src):
            os.utime(os.path.join(src, name), (bogus, bogus))
        e = Engine(spark, "hist-test")
        e.register_sink("ht", sink)
        rows = {r["version"]: r for r in e.sql("DESCRIBE HISTORY ht").collect()}
        assert set(rows) == {0, 1}
        for v in (0, 1):
            got = rows[v]["committed_at"]
            want = sink.commit_time(v).replace(tzinfo=None)
            assert abs((got - want).total_seconds()) < 1
        assert rows[1]["is_current"] and not rows[0]["is_current"]

    def test_legacy_warehouse_falls_back_to_mtime(self, spark, tmp_path):
        import os

        src = str(tmp_path / "legacy")
        sink = self._build(spark, src)
        os.remove(sink._commits_file())  # pre-sidecar warehouse
        # resolution still works, from mtimes
        t1 = sink.commit_time(1)
        assert sink.version_at(t1.isoformat()) == 1

    def test_vacuum_prunes_sidecar(self, spark, tmp_path):
        src = str(tmp_path / "vac")
        sink = self._build(spark, src)
        sink.insert_append(spark.createDataFrame([(3, "c")], "id long, v string"))
        assert sink.vacuum(keep=1) == 2
        assert set(sink._load_commits()) == {2}


class TestVacuumStatement:
    """``VACUUM t [RETAIN n VERSIONS]`` — SQL lifecycle surface over the
    versioned sinks (pairs with VERSION AS OF / DESCRIBE HISTORY)."""

    def _sink(self, spark, path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, path, key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(2, "b")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(3, "c")], "id long, v string"))
        return sink

    def test_vacuum_retain(self, spark, tmp_path):
        sink = self._sink(spark, str(tmp_path / "w"))
        e = Engine(spark, "vac-test")
        e.register_sink("wh", sink)
        assert e.execute("VACUUM wh RETAIN 2 VERSIONS") == 1
        assert sink.versions() == [1, 2]
        # default retains only the current version
        assert e.execute("VACUUM wh") == 1
        assert sink.versions() == [2]
        assert {r["v"] for r in e.sql("SELECT v FROM wh").collect()} == {"a", "b", "c"}

    def test_vacuum_invalidates_cached_snapshot_reads(self, spark, tmp_path):
        """A cached `VERSION AS OF` plan pins old version dirs — VACUUM is
        a mutating statement, so the cache epoch bumps and the stale read
        errors cleanly instead of failing mid-scan."""
        sink = self._sink(spark, str(tmp_path / "w2"))
        e = Engine(spark, "vac-test2")
        e.register_sink("wh", sink)
        assert e.sql("SELECT count(*) AS n FROM wh VERSION AS OF 0").collect()[0]["n"] == 1
        e.execute("VACUUM wh")
        with pytest.raises(Exception, match="not available|version"):
            e.sql("SELECT count(*) AS n FROM wh VERSION AS OF 0").collect()

    def test_vacuum_non_sink_errors(self, spark):
        from qlbridge_spark.engine import ExecError

        e = Engine(spark, "vac-test3")
        e.register_df("plain", spark.range(3))
        with pytest.raises(ExecError, match="versioned sink"):
            e.execute("VACUUM plain")

    def test_vacuum_retain_zero_errors(self, spark, tmp_path):
        from qlbridge_spark.engine import ExecError

        sink = self._sink(spark, str(tmp_path / "w3"))
        e = Engine(spark, "vac-test4")
        e.register_sink("wh", sink)
        with pytest.raises(ExecError, match="at least 1"):
            e.execute("VACUUM wh RETAIN 0 VERSIONS")


class TestRestoreStatement:
    """``RESTORE [TABLE] t TO VERSION|TIMESTAMP AS OF …`` — rollback as a
    NEW commit (history preserved), completing the reproducible-runs
    lifecycle with VERSION AS OF / DESCRIBE HISTORY / VACUUM."""

    def _sink(self, spark, path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, path, key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(2, "b")], "id long, v string"))
        sink.merge_upsert(spark.createDataFrame([(1, "A2")], "id long, v string"))
        return sink

    def test_restore_to_version(self, spark, tmp_path):
        sink = self._sink(spark, str(tmp_path / "r"))
        e = Engine(spark, "restore-test")
        e.register_sink("wh", sink)
        assert {tuple(r) for r in e.sql("SELECT id, v FROM wh").collect()} == {(1, "A2"), (2, "b")}
        new_v = e.execute("RESTORE TABLE wh TO VERSION AS OF 0")
        assert new_v == 3  # rollback is a new commit, not history rewrite
        assert {tuple(r) for r in e.sql("SELECT id, v FROM wh").collect()} == {(1, "a")}
        # pre-restore state is still reachable through time travel
        assert {tuple(r) for r in e.sql("SELECT id, v FROM wh VERSION AS OF 2").collect()} == {
            (1, "A2"), (2, "b"),
        }
        assert [r["version"] for r in e.sql("DESCRIBE HISTORY wh").collect()] == [0, 1, 2, 3]

    def test_restore_to_timestamp(self, spark, tmp_path):
        sink = self._sink(spark, str(tmp_path / "rt"))
        e = Engine(spark, "restore-test-ts")
        e.register_sink("wh", sink)
        t1 = sink.commit_time(1).isoformat()
        e.execute(f"RESTORE wh TO TIMESTAMP AS OF '{t1}'")
        assert {tuple(r) for r in e.sql("SELECT id, v FROM wh").collect()} == {(1, "a"), (2, "b")}

    def test_restore_invalidates_cached_plans(self, spark, tmp_path):
        sink = self._sink(spark, str(tmp_path / "rc"))
        e = Engine(spark, "restore-test-c")
        e.register_sink("wh", sink)
        assert e.sql("SELECT count(*) AS n FROM wh").collect()[0]["n"] == 2
        e.execute("RESTORE wh TO VERSION AS OF 0")
        assert e.sql("SELECT count(*) AS n FROM wh").collect()[0]["n"] == 1

    def test_restore_non_sink_errors(self, spark):
        from qlbridge_spark.engine import ExecError

        e = Engine(spark, "restore-test-e")
        e.register_df("plain", spark.range(2))
        with pytest.raises(ExecError, match="versioned sink"):
            e.execute("RESTORE plain TO VERSION AS OF 0")

    def test_restore_parse_errors(self, spark):
        from qlbridge_spark.rel import parse_sql
        from qlbridge_spark.exprparse import ParseError

        with pytest.raises(ParseError, match="VERSION AS OF"):
            parse_sql("RESTORE TABLE wh TO YESTERDAY")

    def test_vacuum_restore_require_table_name(self, spark):
        """ADVICE low: a missing/non-identifier table name must be a
        ParseError, not an empty-named SqlVacuum that later fails with a
        confusing 'not a versioned sink'."""
        from qlbridge_spark.rel import parse_sql
        from qlbridge_spark.exprparse import ParseError

        with pytest.raises(ParseError):
            parse_sql("VACUUM")
        with pytest.raises(ParseError):
            parse_sql("VACUUM 42")
        with pytest.raises(ParseError):
            parse_sql("RESTORE TABLE 42 TO VERSION AS OF 1")


class TestStreamingMerge:
    """format:'merge' — a full MERGE INTO statement per micro-batch (the
    canonical foreachBatch CDC recipe): tombstone DELETEs, conditional
    updates, filtered inserts, against a durable versioned sink."""

    @staticmethod
    def _drain_until(q, eng, table: str, expected: set, deadline_s: float = 90.0) -> set:
        import time

        end = time.time() + deadline_s
        while True:
            q.processAllAvailable()
            got = {tuple(r) for r in eng.sql(f"SELECT * FROM {table}").collect()}
            if got == expected or time.time() >= end:
                return got
            time.sleep(0.3)

    def test_cdc_merge_stream_into_parquet_sink(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "cdc-stream-test")
        stream_dir = str(tmp_path / "cdc_stream")
        b1 = spark.createDataFrame(
            [(1, "a", "U", 1), (2, "b", "U", 2)], "id long, v string, op string, seq long"
        )
        b1.write.parquet(stream_dir)
        eng.register_df("cdc_src", b1)
        sink = ParquetMergeSink(spark, str(tmp_path / "cdc_state"), key="id")
        sink.ensure(spark.createDataFrame([], "id long, v string"))
        eng.register_sink("cdc_state", sink)

        merge_sql = (
            "MERGE INTO cdc_state t USING batch s ON t.id = s.id "
            "WHEN MATCHED AND s.op = 'D' THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED AND s.op != 'D' THEN INSERT (id, v) VALUES (s.id, s.v)"
        )
        q = eng.execute(
            "CREATE CONTINUOUSVIEW cdc_merge_q AS SELECT id, v, op, seq FROM cdc_src "
            f'WITH {{"path": "{stream_dir}", "format": "merge", '
            f'"merge": "{merge_sql}"}}'
        )
        try:
            got = self._drain_until(q, eng, "cdc_state", {(1, "a"), (2, "b")})
            assert got == {(1, "a"), (2, "b")}
            # batch 2: update id=1, DELETE id=2 (tombstone), insert id=3;
            # a tombstone for a missing key (id=9) must be a no-op
            spark.createDataFrame(
                [(1, "a2", "U", 3), (2, None, "D", 4), (3, "c", "U", 5), (9, None, "D", 6)],
                "id long, v string, op string, seq long",
            ).write.mode("append").parquet(stream_dir)
            got = self._drain_until(q, eng, "cdc_state", {(1, "a2"), (3, "c")})
            assert got == {(1, "a2"), (3, "c")}
        finally:
            q.stop()
        # durable history: every micro-batch MERGE is a commit
        assert len(sink.versions()) >= 3

    def test_merge_stream_validates_statement_at_start(self, spark, tmp_path):
        eng = Engine(spark, "cdc-validate-test")
        stream_dir = str(tmp_path / "cdc_v")
        spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(stream_dir)
        eng.register_df("vsrc", spark.read.parquet(stream_dir))
        with pytest.raises(Exception, match="MERGE INTO statement"):
            eng.execute(
                "CREATE CONTINUOUSVIEW cdc_bad1 AS SELECT id, v FROM vsrc "
                f'WITH {{"path": "{stream_dir}", "format": "merge", "merge": "SELECT 1"}}'
            )
        with pytest.raises(Exception, match="USING"):
            eng.execute(
                "CREATE CONTINUOUSVIEW cdc_bad2 AS SELECT id, v FROM vsrc "
                f'WITH {{"path": "{stream_dir}", "format": "merge", '
                f'"merge": "MERGE INTO t USING other s ON t.id = s.id WHEN MATCHED THEN DELETE"}}'
            )

    def test_cdc_merge_with_watermark_drops_late_events(self, spark, tmp_path):
        """Round-10: format:'merge' composed with an event-time watermark +
        tumbling-window aggregation. Append mode only emits FINALIZED
        windows, so a late CDC event behind the watermark is dropped by
        the agg before the per-batch MERGE ever sees it — and the window
        state store stays bounded (closed windows evicted), the contract
        that keeps a 100 TB/day CDC stream from accumulating state."""
        import datetime
        import json

        from qlbridge_spark.sinks import ParquetMergeSink

        eng = Engine(spark, "cdc-wm-test")
        stream_dir = str(tmp_path / "wm_stream")
        sink = ParquetMergeSink(spark, str(tmp_path / "wm_state"), key="id")
        sink.ensure(spark.createDataFrame([], "id long, v long"))
        eng.register_sink("wm_state", sink)

        def write(rows):
            spark.createDataFrame(
                rows, "id long, v long, ts timestamp"
            ).write.mode("append").parquet(stream_dir)

        t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)
        write([(1, 10, t(10, 0)), (2, 20, t(10, 1))])
        eng.register_df("cdc_wm_src", spark.read.parquet(stream_dir))

        merge_sql = (
            "MERGE INTO wm_state t USING batch s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"
        )
        cfg = {
            "path": stream_dir,
            "checkpoint": str(tmp_path / "wm_ckpt"),
            "output_mode": "append",
            "watermark": {"column": "ts", "delay": "1 minute"},
            "window": {"column": "ts", "duration": "5 minutes"},
            "format": "merge",
            "merge": merge_sql,
        }
        q = eng.execute(
            "CREATE CONTINUOUSVIEW cdc_wm AS SELECT id, max(v) AS v FROM cdc_wm_src "
            f"GROUP BY id WITH {json.dumps(cfg)}"
        )
        try:
            q.processAllAvailable()
            # watermark still inside the 10:00 window → nothing finalized
            assert self._drain_until(q, eng, "wm_state", set(), 5.0) == set()
            # far-future row closes the [10:00,10:05) window
            write([(9, 90, t(11, 0))])
            got = self._drain_until(q, eng, "wm_state", {(1, 10), (2, 20)})
            assert got == {(1, 10), (2, 20)}
            # LATE update for id=1 (ts behind the 10:59 watermark) must be
            # DROPPED; the 12:00 row closes the 11:00 window → id=9 lands
            write([(1, 999, t(10, 2)), (8, 80, t(12, 0))])
            got = self._drain_until(q, eng, "wm_state", {(1, 10), (2, 20), (9, 90)})
            assert got == {(1, 10), (2, 20), (9, 90)}, "late event leaked through the watermark"
            # bounded state: closed windows are evicted — only the open
            # [12:00,12:05) window's single group may remain
            prog = q.lastProgress
            state_rows = sum(op["numRowsTotal"] for op in prog["stateOperators"])
            assert state_rows <= 2, f"state not bounded: {state_rows} rows retained"
        finally:
            q.stop()

    def test_merge_stream_rejects_source_name_collision(self, spark, tmp_path):
        """ADVICE low: the micro-batch registers engine-wide under
        source_name — shadowing an existing table would let concurrent
        queries read micro-batch data under that name. Reject at start."""
        eng = Engine(spark, "cdc-collide-test")
        stream_dir = str(tmp_path / "cdc_c")
        spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(stream_dir)
        eng.register_df("vsrc", spark.read.parquet(stream_dir))
        eng.register_df("batch", spark.createDataFrame([(9, "x")], "id long, v string"))
        with pytest.raises(Exception, match="collides"):
            eng.execute(
                "CREATE CONTINUOUSVIEW cdc_bad3 AS SELECT id, v FROM vsrc "
                f'WITH {{"path": "{stream_dir}", "format": "merge", '
                f'"merge": "MERGE INTO tgt t USING batch s ON t.id = s.id WHEN MATCHED THEN DELETE"}}'
            )


class TestVacuumRetention:
    """Round-9 review fixes: time-based retention, capability mismatch
    errors, and vacuum-aware cache invalidation."""

    def _sink(self, spark, path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, path, key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(2, "b")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(3, "c")], "id long, v string"))
        return sink

    def test_retain_hours_drops_old_versions(self, spark, tmp_path):
        import datetime

        sink = self._sink(spark, str(tmp_path / "h"))
        # age versions 0 and 1 by 10 days in the sidecar (commit times are
        # the durable source of truth)
        commits = sink._load_commits()
        old = (datetime.datetime.now(datetime.timezone.utc) - datetime.timedelta(days=10)).isoformat()
        commits[0] = old
        commits[1] = old
        sink._save_commits(commits)
        e = Engine(spark, "vac-hours")
        e.register_sink("wh", sink)
        assert e.execute("VACUUM wh RETAIN 48 HOURS") == 2
        assert sink.versions() == [2]
        # current version is NEVER dropped even if old
        commits = sink._load_commits()
        commits[2] = old
        sink._save_commits(commits)
        assert e.execute("VACUUM wh RETAIN 48 HOURS") == 0
        assert sink.versions() == [2]

    def test_version_count_retain_on_time_based_sink_errors(self, spark):
        from qlbridge_spark.engine import ExecError

        class TimeBasedOnly:
            key = "id"

            def scan(self, spark_):
                return spark.range(1)

            def vacuum(self, keep=None, retention_hours=None):
                from qlbridge_spark.sinks import SinkCapabilityError

                if keep is not None:
                    raise SinkCapabilityError("retention is time-based: use RETAIN HOURS")
                return 0

        e = Engine(spark, "vac-delta-like")
        e.register_sink("d", TimeBasedOnly())
        with pytest.raises(ExecError, match="time-based"):
            e.execute("VACUUM d RETAIN 1 VERSIONS")
        assert e.execute("VACUUM d RETAIN 24 HOURS") == 0

    def test_direct_vacuum_invalidates_cached_snapshot_plan(self, spark, tmp_path):
        """cache_token covers DIRECT sink.vacuum() calls (which preserve
        _version): the cached VERSION AS OF plan must miss and rebuild to
        the sink's clean 'not available' error, not fail mid-scan."""
        sink = self._sink(spark, str(tmp_path / "cv"))
        e = Engine(spark, "vac-direct")
        e.register_sink("wh", sink)
        assert e.sql("SELECT count(*) AS n FROM wh VERSION AS OF 0").collect()[0]["n"] == 1
        sink.vacuum(keep=1)  # DIRECT call — engine epoch does not move
        with pytest.raises(Exception, match="not available"):
            e.sql("SELECT count(*) AS n FROM wh VERSION AS OF 0").collect()


class TestVacuumCacheEdgeCases:
    def test_middle_version_vacuum_invalidates_cache(self, spark, tmp_path):
        """cache_token fingerprints EVERY retained version: a time-based
        vacuum that drops a MIDDLE version (older survivor protected by a
        legacy mtime fallback) must still change the token, so the cached
        VERSION AS OF plan for the dropped version misses."""
        import datetime

        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "mid"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(2, "b")], "id long, v string"))
        sink.insert_append(spark.createDataFrame([(3, "c")], "id long, v string"))
        commits = sink._load_commits()
        old = (datetime.datetime.now(datetime.timezone.utc) - datetime.timedelta(days=10)).isoformat()
        commits[1] = old
        del commits[0]  # v0 becomes a legacy dir: fresh mtime protects it
        sink._save_commits(commits)
        e = Engine(spark, "vac-mid")
        e.register_sink("wh", sink)
        assert e.sql("SELECT count(*) AS n FROM wh VERSION AS OF 1").collect()[0]["n"] == 2
        assert sink.vacuum(retention_hours=48) == 1  # drops ONLY v1
        assert sink.versions() == [0, 2]
        with pytest.raises(Exception, match="not available"):
            e.sql("SELECT count(*) AS n FROM wh VERSION AS OF 1").collect()

    def test_vacuum_keep_and_hours_mutually_exclusive(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "mx"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        with pytest.raises(ValueError, match="not both"):
            sink.vacuum(keep=5, retention_hours=1)


class TestHistoryOperations:
    """DESCRIBE HISTORY shows WHAT each version was (Delta history
    parity: operation + commit mode), stamped into the snapshot dir at
    commit time (`_commit_info`). Legacy versions render NULL."""

    def test_operations_recorded_per_statement(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        e = Engine(spark, "hist-ops")
        sink = ParquetMergeSink(spark, str(tmp_path / "ho"), key="id")
        sink.ensure(
            spark.createDataFrame([(i, 0) for i in range(100)], "id long, v long")
            .repartitionByRange(4, "id")
        )
        e.register_sink("t", sink)
        e.execute("INSERT INTO t (id, v) VALUES (200, 1)")
        e.execute("UPDATE t SET v = 2 WHERE id < 3")
        e.execute("DELETE FROM t WHERE id = 5")
        e.register_df("src", spark.createDataFrame([(1, 9)], "id long, v long"))
        e.execute(
            "MERGE INTO t USING src ON t.id = src.id "
            "WHEN MATCHED THEN UPDATE SET v = src.v"
        )
        e.execute("OPTIMIZE t ZORDER BY (id)")
        e.execute("RESTORE TABLE t TO VERSION AS OF 2")
        hist = {r["version"]: r for r in e.sql("DESCRIBE HISTORY t").collect()}
        assert hist[0]["operation"] == "CREATE TABLE"
        assert hist[1]["operation"] == "WRITE" and hist[1]["mode"] == "cow"
        assert hist[2]["operation"] == "UPDATE"
        assert hist[3]["operation"] == "DELETE"
        assert hist[4]["operation"] == "MERGE"
        assert hist[5]["operation"] == "OPTIMIZE ZORDER BY (id)"
        assert hist[6]["operation"].startswith("RESTORE")
        # legacy version without a stamp renders NULL, everything intact
        import os

        os.remove(os.path.join(sink._data_dir(2), "_commit_info"))
        hist2 = {r["version"]: r for r in e.sql("DESCRIBE HISTORY t").collect()}
        assert hist2[2]["operation"] is None and hist2[4]["operation"] == "MERGE"


class TestVacuumDryRun:
    """``VACUUM t [RETAIN ...] DRY RUN`` — report would-be victims
    (version / file count / bytes), delete NOTHING (Delta parity: the
    audit step before an irreversible prune)."""

    def test_dry_run_reports_without_deleting(self, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        e = Engine(spark, "vac-dry")
        sink = ParquetMergeSink(spark, str(tmp_path / "vd"), key="id")
        sink.ensure(spark.createDataFrame([(1, 0)], "id long, v long"))
        e.register_sink("t", sink)
        e.execute("UPDATE t SET v = 1 WHERE id = 1")  # v1
        e.execute("UPDATE t SET v = 2 WHERE id = 1")  # v2
        rows = e.sql("VACUUM t RETAIN 1 VERSIONS DRY RUN").collect()
        assert [r["version"] for r in rows] == [0, 1]
        assert all(r["files"] >= 1 and r["bytes"] > 0 for r in rows)
        # nothing was deleted
        assert sink.versions() == [0, 1, 2]
        # the real vacuum then removes exactly what the dry run named
        assert e.execute("VACUUM t RETAIN 1 VERSIONS") == 2
        assert sink.versions() == [2]
        # caught-up dry run reports empty with the schema intact
        out = e.sql("VACUUM t DRY RUN")
        assert out.count() == 0 and out.columns == ["version", "files", "bytes"]
