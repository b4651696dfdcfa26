"""Round-11 ADVICE regression pins.

1. (high) engine MERGE non-COW commit is BASE-PINNED: a concurrent
   commit landing anywhere in the scan→commit window raises
   ConcurrentWriteError instead of being silently clobbered
   (engine.py _merge + sinks.py overwrite(base=)).
2. (high) streaming CDF supports hive-partitioned sinks: _ALL_INSERT /
   commit-0 snapshot files are found recursively and partition-column
   values are injected from the col=value path components
   (streaming/cdf_source.py).
3. (medium) insert_append's COW path requires exact dtype equality —
   a type-widening batch takes the full rewrite so the snapshot never
   mixes parquet types across linked and fresh files (sinks.py).
4. (low) a sink exposing overwrite_cow but a LEGACY overwrite(df)
   signature never gets a COW-split MERGE committed as the full table
   (engine.py).
5. (low) a failed change recording removes its own staging dir, never
   the final c<N> dir; vacuum sweeps aged stray staging dirs
   (sinks.py _record_changes / _sweep_stale_staging).
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine
from qlbridge_spark.sinks import ConcurrentWriteError, ParquetMergeSink


def _mk(spark, tmp_path, name="t", n=100, files=4, **kw):
    df = (
        spark.range(n)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(files, "id")
    )
    sink = ParquetMergeSink(spark, str(tmp_path / name), key="id", **kw)
    sink.ensure(df)
    return sink


class TestMergeBasePinned:
    def test_non_cow_merge_scan_to_commit_window_raises(self, spark, tmp_path):
        """A rival commit BETWEEN the merge's snapshot read and its
        commit loses the CAS loudly (pre-fix: overwrite read the pointer
        at commit time and silently clobbered the rival's append)."""
        sink = _mk(spark, tmp_path)
        eng = Engine(spark, "occ-merge-window")
        eng.register_sink("t", sink)
        rival = ParquetMergeSink(spark, sink.path, key="id")
        orig = sink._commit
        state = {"fired": False}

        def commit_late_rival(df, *args, **kwargs):
            if not state["fired"]:
                state["fired"] = True
                rival.insert_append(
                    spark.createDataFrame([(7000, 0)], "id long, v long")
                )
            return orig(df, *args, **kwargs)

        sink._commit = commit_late_rival
        # source keys span every range file so the stats split keeps all
        # files → cow is None → the plain overwrite(changes=...) path
        eng.register_df(
            "src",
            spark.createDataFrame([(1, -1), (30, -1), (60, -1), (90, -1)], "id long, v long"),
        )
        with pytest.raises(Exception) as ei:
            eng.execute(
                "MERGE INTO t USING src ON t.id = src.id "
                "WHEN MATCHED THEN UPDATE SET v = src.v"
            )
        assert "another writer" in str(ei.value)
        cur = sink.scan(spark)
        assert cur.filter(F.col("id") == 7000).count() == 1  # rival survived
        assert cur.filter(F.col("v") == -1).count() == 0  # merge wrote nothing


class TestPartitionedStreamingCdf:
    def test_all_insert_and_commit0_emit_partitioned_rows(self, spark, tmp_path):
        """_ALL_INSERT commits of a hive-partitioned sink stream their
        rows with partition-column values restored from the paths
        (pre-fix: the non-recursive listing found no files and the
        commit's rows were silently dropped)."""
        df = spark.createDataFrame(
            [(i, i % 3, i * 2) for i in range(12)], "id long, p int, v long"
        )
        sink = ParquetMergeSink(
            spark, str(tmp_path / "pt"), key="id", partition_by=["p"]
        )
        sink.ensure(df)
        eng = Engine(spark, "cdf-part")
        eng.register_sink("pt", sink)
        eng.execute("UPDATE pt SET v = -1 WHERE id = 5")  # recorded commit
        q = (
            eng.stream_changes("pt")
            .writeStream.format("memory")
            .queryName("cdf_part")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = sorted(
                (r.id, r.p, r.v, r._change_type, r._commit_version)
                for r in spark.sql("SELECT * FROM cdf_part").collect()
            )
            want = sorted(
                (r.id, r.p, r.v, r._change_type, r._commit_version)
                for r in eng.sql("SELECT * FROM TABLE_CHANGES('pt', 0)").collect()
            )
            assert got == want
            assert len(got) == 12 + 2  # initial load + update pre/post
            # partition column is typed (int), not a path string
            assert all(isinstance(r[1], int) for r in got)
        finally:
            q.stop()


class TestAppendTypeGate:
    def test_widening_append_takes_full_rewrite(self, spark, tmp_path):
        """An append whose column type widens the snapshot's must NOT
        hardlink the old narrow-typed files (mixed-type snapshots fail
        later parquet scans); it rewrites everything at the merged
        type."""
        sink = ParquetMergeSink(spark, str(tmp_path / "tw"), key="id")
        sink.ensure(spark.createDataFrame([(1, 1)], "id long, v int"))
        sink.insert_append(
            spark.createDataFrame([(2, 2**40)], "id long, v long")
        )
        assert sink.last_commit["mode"] == "full"
        rows = {r.id: r.v for r in sink.scan(spark).collect()}
        assert rows == {1: 1, 2: 2**40}
        assert dict(sink.scan(spark).dtypes)["v"] == "bigint"

    def test_same_type_append_keeps_cow(self, spark, tmp_path):
        sink = ParquetMergeSink(spark, str(tmp_path / "tc"), key="id")
        sink.ensure(spark.createDataFrame([(1, 1)], "id long, v long"))
        sink.insert_append(spark.createDataFrame([(2, 2)], "id long, v long"))
        assert sink.last_commit["mode"] == "cow"
        assert sink.last_commit["files_rewritten"] == 0


class TestLegacyOverwriteSink:
    def test_cow_split_never_feeds_a_legacy_overwrite(self, spark, tmp_path):
        """A duck-typed sink with overwrite_cow but a legacy
        overwrite(df) signature must receive the FULL final frame —
        committing only the rewritten region would drop every linked
        file's rows."""

        class LegacyOverwriteSink(ParquetMergeSink):
            def overwrite(self, df):  # legacy: no changes=/base= params
                ParquetMergeSink.overwrite(self, df)

        df = (
            spark.range(100)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
            .repartitionByRange(4, "id")
        )
        sink = LegacyOverwriteSink(spark, str(tmp_path / "lg"), key="id")
        sink.ensure(df)
        eng = Engine(spark, "legacy-ow")
        eng.register_sink("t", sink)
        # single-key source: the COW split WOULD prune 3 of 4 files
        eng.register_df("src", spark.createDataFrame([(1, 99)], "id long, v long"))
        n = eng.execute(
            "MERGE INTO t USING src ON t.id = src.id "
            "WHEN MATCHED THEN UPDATE SET v = src.v"
        )
        assert n == 1
        cur = sink.scan(spark)
        assert cur.count() == 100  # no linked-region data loss
        assert cur.filter((F.col("id") == 1) & (F.col("v") == 99)).count() == 1


class TestRecordChangesCleanup:
    def test_failed_recording_keeps_existing_dir_and_no_staging_litter(
        self, spark, tmp_path
    ):
        sink = _mk(spark, tmp_path, name="rc")
        # occupy the NEXT commit's changes slot: the recording's rename
        # will fail (ENOTEMPTY); pre-fix the handler deleted this dir
        d = os.path.join(sink.path, "c1")
        os.makedirs(d)
        open(os.path.join(d, "sentinel"), "w").close()
        sink.update_where(F.col("id") < 5, {"v": F.lit(-1)})
        assert sink._version() == 1  # the commit itself stands
        assert os.path.exists(os.path.join(d, "sentinel"))
        assert not [
            x for x in os.listdir(sink.path) if x.startswith(".cstaging")
        ]
        # feed degrades to the snapshot-diff fallback, not to wrong rows
        eng = Engine(spark, "rc-feed")
        eng.register_sink("rc", sink)
        rows = eng.sql("SELECT * FROM TABLE_CHANGES('rc', 1, 1)").collect()
        assert sorted(r._change_type for r in rows) == (
            ["update_postimage"] * 5 + ["update_preimage"] * 5
        )

    def test_vacuum_sweeps_aged_staging_dirs_only(self, spark, tmp_path):
        sink = _mk(spark, tmp_path, name="sw")
        sink.insert_append(spark.createDataFrame([(500, 0)], "id long, v long"))
        old = os.path.join(sink.path, ".cstaging-dead")
        os.makedirs(old)
        t = time.time() - sink._STAGING_TTL_SECONDS - 60
        os.utime(old, (t, t))
        fresh = os.path.join(sink.path, ".staging-live")
        os.makedirs(fresh)
        sink.vacuum(keep=1)
        assert not os.path.exists(old)  # abandoned → swept
        assert os.path.exists(fresh)  # possibly a live writer → kept
