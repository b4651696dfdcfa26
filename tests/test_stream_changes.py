"""Streaming change-data-feed source (``Engine.stream_changes`` /
``qlb_table_changes`` Python Data Source) — the streaming tail of batch
``FROM TABLE_CHANGES(...)``. Reference: qlbridge has no CDF at all; this
is the Delta ``readChangeFeed``-stream parity surface over the versioned
parquet sink (streaming/cdf_source.py)."""

import os

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine, ExecError
from qlbridge_spark.sinks import ParquetMergeSink


def _mk(spark, tmp_path, name="t", n=10):
    eng = Engine(spark, f"cdf-{name}")
    sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
    sink.ensure(spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v")))
    eng.register_sink(name, sink)
    return eng, sink


def _drain(df, qname, mode="append"):
    q = df.writeStream.format("memory").queryName(qname).outputMode(mode).start()
    q.processAllAvailable()
    return q


class TestStreamChanges:
    def test_batch_parity_full_history(self, spark, tmp_path):
        """Streaming from version 0 emits exactly the batch CDF rows
        (same columns, same values) for an insert/update/delete battery."""
        eng, sink = _mk(spark, tmp_path)
        eng.execute("UPDATE t SET v = 99 WHERE id = 3")
        eng.execute("DELETE FROM t WHERE id = 7")
        eng.execute("INSERT INTO t (id, v) VALUES (50, 1), (51, 2)")
        q = _drain(eng.stream_changes("t"), "cdf_parity")
        try:
            got = sorted(
                (r.id, r.v, r._change_type, r._commit_version)
                for r in spark.sql("SELECT * FROM cdf_parity").collect()
            )
            want = sorted(
                (r.id, r.v, r._change_type, r._commit_version)
                for r in eng.sql("SELECT * FROM TABLE_CHANGES('t', 0)").collect()
            )
            assert got == want and len(got) == 10 + 2 + 1 + 2
            # commit timestamps are real (non-NULL) and monotone per version
            ts = {
                r._commit_version: r._commit_timestamp
                for r in spark.sql("SELECT * FROM cdf_parity").collect()
            }
            assert all(t is not None for t in ts.values())
            assert ts[0] <= ts[1] <= ts[2] <= ts[3]
        finally:
            q.stop()

    def test_incremental_no_duplicates(self, spark, tmp_path):
        """New commits arrive on the live stream; processed versions are
        never re-emitted (offset = version watermark)."""
        eng, sink = _mk(spark, tmp_path, name="t2")
        q = _drain(eng.stream_changes("t2"), "cdf_inc")
        try:
            assert spark.sql("SELECT count(*) c FROM cdf_inc").collect()[0].c == 10
            eng.execute("UPDATE t2 SET v = -1 WHERE id < 2")  # 2 pre + 2 post
            q.processAllAvailable()
            assert spark.sql("SELECT count(*) c FROM cdf_inc").collect()[0].c == 14
            q.processAllAvailable()  # caught up: empty batch, no dupes
            assert spark.sql("SELECT count(*) c FROM cdf_inc").collect()[0].c == 14
        finally:
            q.stop()

    def test_starting_version_latest_tails_only(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, name="t3")
        eng.execute("UPDATE t3 SET v = 1 WHERE id = 1")  # pre-stream commit
        q = _drain(eng.stream_changes("t3", starting_version="latest"), "cdf_tail")
        try:
            assert spark.sql("SELECT count(*) c FROM cdf_tail").collect()[0].c == 0
            eng.execute("DELETE FROM t3 WHERE id = 2")
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM cdf_tail").collect()
            assert [(r.id, r._change_type) for r in rows] == [(2, "delete")]
        finally:
            q.stop()

    def test_starting_version_number(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, name="t3b")
        eng.execute("UPDATE t3b SET v = 1 WHERE id = 1")  # commit 1
        eng.execute("DELETE FROM t3b WHERE id = 2")  # commit 2
        q = _drain(eng.stream_changes("t3b", starting_version=2), "cdf_from2")
        try:
            rows = spark.sql("SELECT * FROM cdf_from2").collect()
            assert [(r.id, r._change_type, r._commit_version) for r in rows] == [
                (2, "delete", 2)
            ]
        finally:
            q.stop()

    def test_optimize_commit_emits_nothing(self, spark, tmp_path):
        """Layout-only commits (_NO_CHANGES marker) advance the offset
        without emitting rows — an OPTIMIZE never replays the table."""
        eng, sink = _mk(spark, tmp_path, name="t4")
        q = _drain(eng.stream_changes("t4", starting_version="latest"), "cdf_opt")
        try:
            eng.execute("OPTIMIZE t4")
            q.processAllAvailable()
            assert spark.sql("SELECT count(*) c FROM cdf_opt").collect()[0].c == 0
            # and the stream is still healthy afterwards
            eng.execute("INSERT INTO t4 (id, v) VALUES (77, 7)")
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM cdf_opt").collect()
            assert [(r.id, r._change_type) for r in rows] == [(77, "insert")]
        finally:
            q.stop()

    def test_legacy_commit0_without_recording(self, spark, tmp_path):
        """A pre-recording warehouse's commit 0 still streams as the
        initial bulk insert (batch-CDF parity)."""
        import shutil

        eng, sink = _mk(spark, tmp_path, name="t5", n=4)
        shutil.rmtree(os.path.join(sink.path, "c0"), ignore_errors=True)
        q = _drain(eng.stream_changes("t5"), "cdf_legacy")
        try:
            rows = spark.sql("SELECT * FROM cdf_legacy").collect()
            assert sorted((r.id, r._change_type) for r in rows) == [
                (i, "insert") for i in range(4)
            ]
        finally:
            q.stop()

    def test_upsert_commit_streams_its_change_rows(self, spark, tmp_path):
        """merge_upsert commits record change rows at commit time (like
        every commit class), so the stream consumes them incrementally —
        changed rows as update pre/post, new keys as inserts."""
        eng, sink = _mk(spark, tmp_path, name="t6")
        q = _drain(eng.stream_changes("t6", starting_version="latest"), "cdf_ups")
        try:
            sink.merge_upsert(
                spark.createDataFrame([(1, 123), (999, 9)], "id long, v long"), "id"
            )
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM cdf_ups").collect()
            got = sorted((r.id, r.v, r._change_type) for r in rows)
            assert got == [
                (1, 2, "update_preimage"),  # ensure() seeded v = id * 2
                (1, 123, "update_postimage"),
                (999, 9, "insert"),
            ]
        finally:
            q.stop()

    def test_unrecorded_commit_fails_loudly(self, spark, tmp_path):
        """A commit whose recording is missing (torn recording, manual
        deletion) must error the stream — never silently skip or fall
        back to an O(table) diff inside a micro-batch."""
        import shutil

        eng, sink = _mk(spark, tmp_path, name="t6b")
        q = _drain(eng.stream_changes("t6b", starting_version="latest"), "cdf_unrec")
        try:
            eng.execute("UPDATE t6b SET v = 5 WHERE id = 1")
            shutil.rmtree(os.path.join(sink.path, f"c{sink._version()}"))
            with pytest.raises(Exception, match="no change recording"):
                q.processAllAvailable()
        finally:
            q.stop()

    def test_vacuumed_recording_fails_loudly(self, spark, tmp_path):
        """Checkpoint lag past the vacuum retention is a hard error —
        never silent data loss (same contract as batch changes_since)."""
        eng, sink = _mk(spark, tmp_path, name="t7")
        s = eng.stream_changes("t7")  # wants history from v0
        eng.execute("UPDATE t7 SET v = 1 WHERE id = 1")
        sink.vacuum(keep=1)  # drops v0/c0 and v1/c1
        q = s.writeStream.format("memory").queryName("cdf_vac").outputMode("append").start()
        try:
            with pytest.raises(Exception, match="no change recording"):
                q.processAllAvailable()
        finally:
            q.stop()

    def test_downstream_aggregation(self, spark, tmp_path):
        """The feed composes with normal streaming ops — counts by change
        type in complete mode."""
        eng, sink = _mk(spark, tmp_path, name="t8")
        eng.execute("UPDATE t8 SET v = 5 WHERE id IN (1, 2)")
        eng.execute("DELETE FROM t8 WHERE id = 3")
        agg = (
            eng.stream_changes("t8")
            .groupBy("_change_type")
            .agg(F.count("*").alias("n"))
        )
        q = _drain(agg, "cdf_agg", mode="complete")
        try:
            out = {r._change_type: r.n for r in spark.sql("SELECT * FROM cdf_agg").collect()}
            assert out == {
                "insert": 10,
                "update_preimage": 2,
                "update_postimage": 2,
                "delete": 1,
            }
        finally:
            q.stop()

    def test_exactly_once_across_restart(self, spark, tmp_path):
        """Stop the query, commit more DML, restart from the SAME
        checkpoint: the new query picks up exactly the unprocessed
        versions (offsets are durable sink versions)."""
        eng, sink = _mk(spark, tmp_path, name="t9", n=3)
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")

        def start():
            return (
                eng.stream_changes("t9")
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )

        q = start()
        q.processAllAvailable()
        q.stop()
        eng.execute("UPDATE t9 SET v = 9 WHERE id = 0")  # while the stream is DOWN
        q = start()
        q.processAllAvailable()
        q.stop()
        rows = spark.read.parquet(out_dir).collect()
        got = sorted((r.id, r.v, r._change_type, r._commit_version) for r in rows)
        assert got == sorted(
            [(0, 0, "insert", 0), (1, 2, "insert", 0), (2, 4, "insert", 0),
             (0, 0, "update_preimage", 1), (0, 9, "update_postimage", 1)]
        )

    def test_requires_versioned_sink(self, spark):
        eng = Engine(spark, "cdf-err")
        eng.register_df("plain", spark.range(3))
        with pytest.raises(ExecError, match="versioned sink"):
            eng.stream_changes("plain")

    def test_merge_commit_streams_its_changes(self, spark, tmp_path):
        """Engine MERGE INTO records its changes; the stream reads them
        without touching the base snapshots."""
        eng, sink = _mk(spark, tmp_path, name="t10", n=5)
        q = _drain(eng.stream_changes("t10", starting_version="latest"), "cdf_merge")
        try:
            eng.register_df(
                "src10", spark.createDataFrame([(2, 100), (99, 1)], "id long, v long")
            )
            eng.execute(
                "MERGE INTO t10 USING src10 ON t10.id = src10.id "
                "WHEN MATCHED THEN UPDATE SET v = src10.v "
                "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src10.id, src10.v)"
            )
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM cdf_merge").collect()
            assert sorted((r.id, r.v, r._change_type) for r in rows) == [
                (2, 4, "update_preimage"),
                (2, 100, "update_postimage"),
                (99, 1, "insert"),
            ]
        finally:
            q.stop()


class TestReplicate:
    def test_replicate_sink_to_sink(self, spark, tmp_path):
        """CDC replication loop: DML battery on the source, replica sink
        converges — including a multi-commit micro-batch (latest-per-key
        ranking inside the batch apply)."""
        eng, src = _mk(spark, tmp_path, name="rsrc", n=6)
        tgt = ParquetMergeSink(spark, str(tmp_path / "rtgt"), key="id")
        tgt.ensure(spark.createDataFrame([], "id long, v long"))
        eng.register_sink("rtgt", tgt)
        q = eng.replicate_changes("rsrc", "rtgt")
        try:
            q.processAllAvailable()
            assert sorted(tuple(r) for r in tgt.scan(spark).collect()) == sorted(
                tuple(r) for r in src.scan(spark).collect()
            )
            # multi-commit batch: update, delete, re-insert SAME key, plus
            # a fresh insert — all applied in one micro-batch
            eng.execute("UPDATE rsrc SET v = 100 WHERE id = 1")
            eng.execute("DELETE FROM rsrc WHERE id = 1")
            eng.execute("INSERT INTO rsrc (id, v) VALUES (1, 777), (50, 5)")
            eng.execute("DELETE FROM rsrc WHERE id = 2")
            q.processAllAvailable()
            assert sorted(tuple(r) for r in tgt.scan(spark).collect()) == sorted(
                tuple(r) for r in src.scan(spark).collect()
            )
        finally:
            q.stop()

    def test_replicate_to_registry_table(self, spark, tmp_path):
        eng, src = _mk(spark, tmp_path, name="rs2", n=3)
        eng.register_df("mem_tgt", spark.createDataFrame([], "id long, v long"))
        q = eng.replicate_changes("rs2", "mem_tgt")
        try:
            eng.execute("UPDATE rs2 SET v = 9 WHERE id = 0")
            q.processAllAvailable()
            assert sorted(tuple(r) for r in eng.table("mem_tgt").collect()) == sorted(
                tuple(r) for r in src.scan(spark).collect()
            )
        finally:
            q.stop()

    def test_replicate_requires_existing_target(self, spark, tmp_path):
        eng, src = _mk(spark, tmp_path, name="rs3", n=2)
        with pytest.raises(ExecError, match="does not exist"):
            eng.replicate_changes("rs3", "nope")

    def test_continuousview_over_changes(self, spark, tmp_path):
        """SQL surface: CONTINUOUSVIEW reading WITH {'changes': true}
        projects/filters the feed like any stream."""
        eng, src = _mk(spark, tmp_path, name="cv1", n=4)
        q = eng.execute(
            "CREATE CONTINUOUSVIEW cv1_deletes AS SELECT id, _commit_version "
            "FROM cv1 WHERE _change_type = \"delete\" "
            'WITH {"changes": true}'
        )
        try:
            eng.execute("DELETE FROM cv1 WHERE id IN (1, 3)")
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM cv1_deletes").collect()
            assert sorted((r.id, r._commit_version) for r in rows) == [(1, 1), (3, 1)]
        finally:
            q.stop()

    def test_continuousview_replicate_sql_surface(self, spark, tmp_path):
        """Full CDC replication declared in SQL: changes source + replicate
        sink in one CONTINUOUSVIEW statement."""
        eng, src = _mk(spark, tmp_path, name="cv2", n=4)
        tgt = ParquetMergeSink(spark, str(tmp_path / "cv2_tgt"), key="id")
        tgt.ensure(spark.createDataFrame([], "id long, v long"))
        eng.register_sink("cv2_tgt", tgt)
        q = eng.execute(
            "CREATE CONTINUOUSVIEW cv2_rep AS SELECT * FROM cv2 "
            'WITH {"changes": true, "format": "replicate", "target": "cv2_tgt", "key": "id"}'
        )
        try:
            eng.execute("UPDATE cv2 SET v = 55 WHERE id = 2")
            eng.execute("DELETE FROM cv2 WHERE id = 0")
            q.processAllAvailable()
            assert sorted(tuple(r) for r in tgt.scan(spark).collect()) == sorted(
                tuple(r) for r in src.scan(spark).collect()
            )
        finally:
            q.stop()
