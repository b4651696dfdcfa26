"""Optimistic concurrency control for versioned parquet sinks
(sinks.py ``_promote`` / ``_advance_pointer``): the rename into the next
version slot is the commit CAS, so of N concurrent writers exactly one
wins a slot. Blind appends/upserts REBASE and retry (content independent
of base — serializable); read-dependent mutations (UPDATE/DELETE/
OPTIMIZE/RESTORE, engine MERGE commits) raise ConcurrentWriteError
instead of silently clobbering the intervening commit — Delta's
Serializable-isolation contract (ConcurrentModificationException family).
The reference's mutable sources are in-process single-writer
(/root/reference/datasource/membtree.go); this is a strict superset."""

import os
import threading

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine
from qlbridge_spark.sinks import ConcurrentWriteError, ParquetMergeSink


def _mk(spark, tmp_path, name="t", n=100, files=4):
    df = (
        spark.range(n)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(files, "id")
    )
    sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
    sink.ensure(df)
    return sink


def _interpose(sink, other_commit, methods=("_promote",)):
    """Arrange for ``other_commit()`` to run right BEFORE this sink's
    next promote — a deterministic lost race (the competing commit takes
    the slot first)."""
    orig = sink._promote
    state = {"fired": False}

    def wrapper(nxt, staging, changes):
        if not state["fired"]:
            state["fired"] = True
            other_commit()
        return orig(nxt, staging, changes)

    sink._promote = wrapper
    return state


class TestConflictDetection:
    def test_update_loses_race_raises_and_writes_nothing(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        rival = ParquetMergeSink(spark, sink.path, key="id")
        _interpose(sink, lambda: rival.insert_append(
            spark.createDataFrame([(1000, 0)], "id long, v long")))
        with pytest.raises(ConcurrentWriteError, match="re-run"):
            sink.update_where(F.col("id") < 10, {"v": F.lit(-1)})
        # the rival append IS committed; the update is not
        cur = sink.scan(spark)
        assert cur.count() == 101
        assert cur.filter(F.col("v") == -1).count() == 0
        # loser left no staging litter
        assert not [d for d in os.listdir(sink.path) if d.startswith(".staging")]

    def test_delete_loses_race_raises(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        rival = ParquetMergeSink(spark, sink.path, key="id")
        _interpose(sink, lambda: rival.insert_append(
            spark.createDataFrame([(2000, 0)], "id long, v long")))
        with pytest.raises(ConcurrentWriteError):
            sink.delete_where(F.col("id") >= 0)
        assert sink.scan(spark).count() == 101

    def test_optimize_loses_race_raises(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        rival = ParquetMergeSink(spark, sink.path, key="id")
        _interpose(sink, lambda: rival.insert_append(
            spark.createDataFrame([(3000, 0)], "id long, v long")))
        with pytest.raises(ConcurrentWriteError):
            sink.optimize()
        assert sink.scan(spark).filter(F.col("id") == 3000).count() == 1

    def test_restore_loses_race_raises(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        sink.insert_append(spark.createDataFrame([(500, 1)], "id long, v long"))
        rival = ParquetMergeSink(spark, sink.path, key="id")
        _interpose(sink, lambda: rival.insert_append(
            spark.createDataFrame([(4000, 0)], "id long, v long")))
        with pytest.raises(ConcurrentWriteError):
            sink.restore(version=0)
        assert sink.scan(spark).filter(F.col("id") == 4000).count() == 1

    def test_engine_merge_commit_loses_race_raises(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        eng = Engine(spark, "occ-merge")
        eng.register_sink("t", sink)
        rival = ParquetMergeSink(spark, sink.path, key="id")
        _interpose(sink, lambda: rival.insert_append(
            spark.createDataFrame([(5000, 0)], "id long, v long")))
        eng.register_df("src", spark.createDataFrame([(1, 99)], "id long, v long"))
        with pytest.raises(Exception) as ei:
            eng.execute(
                "MERGE INTO t USING src ON t.id = src.id "
                "WHEN MATCHED THEN UPDATE SET v = src.v"
            )
        assert "another writer" in str(ei.value)
        cur = sink.scan(spark)
        assert cur.filter((F.col("id") == 1) & (F.col("v") == 99)).count() == 0
        assert cur.filter(F.col("id") == 5000).count() == 1


class TestAppendRebase:
    def test_append_rebases_over_concurrent_append(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        rival = ParquetMergeSink(spark, sink.path, key="id")
        _interpose(sink, lambda: rival.insert_append(
            spark.createDataFrame([(1000, 0)], "id long, v long")))
        sink.insert_append(spark.createDataFrame([(1001, 1)], "id long, v long"))
        cur = sink.scan(spark)
        assert cur.count() == 102  # both appends landed
        assert cur.filter(F.col("id").isin(1000, 1001)).count() == 2

    def test_upsert_rebases_over_concurrent_append(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        rival = ParquetMergeSink(spark, sink.path, key="id")
        _interpose(sink, lambda: rival.insert_append(
            spark.createDataFrame([(1000, 0)], "id long, v long")))
        sink.merge_upsert(spark.createDataFrame([(1000, 7), (5, -5)], "id long, v long"))
        cur = sink.scan(spark)
        # the upsert re-ran against the post-append snapshot: the rival's
        # id=1000 row was REPLACED, not duplicated (serializable order:
        # append then upsert)
        assert cur.filter(F.col("id") == 1000).count() == 1
        assert cur.filter((F.col("id") == 1000) & (F.col("v") == 7)).count() == 1
        assert cur.filter((F.col("id") == 5) & (F.col("v") == -5)).count() == 1
        assert cur.count() == 101

    def test_ensure_losing_create_race_is_silent(self, spark, tmp_path):
        path = str(tmp_path / "race_create")
        a = ParquetMergeSink(spark, path, key="id")
        b = ParquetMergeSink(spark, path, key="id")
        _interpose(a, lambda: b.ensure(
            spark.createDataFrame([(1, 1)], "id long, v long")))
        a.ensure(spark.createDataFrame([(2, 2)], "id long, v long"))
        # b won the creation; ensure's create-if-absent contract is met
        assert a._version() == 0
        assert a.scan(spark).collect()[0]["id"] == 1


class TestThreadedAppends:
    def test_concurrent_appends_all_land(self, spark, tmp_path):
        """8 threads x 1 append each, no coordination: every row lands
        exactly once, every commit gets its own version, and each
        version's recorded change feed holds exactly that append's rows."""
        sink = _mk(spark, tmp_path, n=10, files=1)
        errs = []

        def append(i):
            try:
                # each thread its own sink handle (no shared Python state)
                s = ParquetMergeSink(spark, sink.path, key="id")
                s.insert_append(
                    spark.createDataFrame([(100 + i, i)], "id long, v long")
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=append, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == []
        cur = sink.scan(spark)
        assert cur.count() == 18
        assert cur.filter(F.col("id") >= 100).count() == 8
        assert sink._version() == 8  # one version per commit, none lost
        # change-feed integrity: the union of per-version recorded inserts
        # is exactly the 8 appended rows, one each
        ids = []
        for v in range(1, 9):
            rec = sink.recorded_changes(spark, v)
            assert rec is not None
            rows = rec.collect()
            assert len(rows) == 1 and rows[0]["_change_type"] == "insert"
            ids.append(rows[0]["id"])
        assert sorted(ids) == [100 + i for i in range(8)]
        # history is complete: every version has a commit timestamp
        for v in sink.versions():
            assert sink.commit_time(v) is not None

    def test_concurrent_updates_one_wins(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        results = []

        def upd(val):
            try:
                s = ParquetMergeSink(spark, sink.path, key="id")
                s.update_where(F.col("id") < 50, {"v": F.lit(val)})
                results.append(("ok", val))
            except ConcurrentWriteError:
                results.append(("conflict", val))

        ts = [threading.Thread(target=upd, args=(v,)) for v in (-1, -2, -3, -4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        winners = [v for s, v in results if s == "ok"]
        # at least one succeeds; table reflects exactly the LAST winner
        assert winners
        vals = {r["v"] for r in sink.scan(spark).filter(F.col("id") < 50).collect()}
        assert len(vals) == 1 and vals.pop() in winners
        assert not [d for d in os.listdir(sink.path) if d.startswith(".staging")]


class TestTornCommitRecovery:
    def test_orphan_slot_is_adopted(self, spark, tmp_path):
        """A writer that died after the rename but before the pointer
        write leaves a complete orphan snapshot; the next writer adopts
        it (rolls the pointer forward) and rebases onto it — the table
        never wedges and the orphan's commit survives."""
        sink = _mk(spark, tmp_path)
        # simulate the torn commit: stage a snapshot and rename it into
        # v1 WITHOUT advancing the pointer
        staging = os.path.join(sink.path, ".staging-torn")
        sink.scan(spark).unionByName(
            spark.createDataFrame([(999, 9)], "id long, v long")
        ).write.mode("overwrite").parquet(staging)
        with open(os.path.join(staging, "_commit_ts"), "w") as f:
            f.write("2026-01-01T00:00:00+00:00")
        os.rename(staging, os.path.join(sink.path, "v1"))
        assert sink._version() == 0  # pointer still behind
        sink.insert_append(spark.createDataFrame([(1000, 10)], "id long, v long"))
        cur = sink.scan(spark)
        assert sink._version() == 2
        assert cur.filter(F.col("id") == 999).count() == 1  # orphan adopted
        assert cur.filter(F.col("id") == 1000).count() == 1  # append rebased
        # adopted commit has its pre-stamped timestamp in history
        assert sink.commit_time(1).isoformat().startswith("2026-01-01")

    def test_pointer_never_regresses(self, spark, tmp_path):
        sink = _mk(spark, tmp_path)
        sink.insert_append(spark.createDataFrame([(500, 1)], "id long, v long"))
        assert sink._version() == 1
        sink._advance_pointer(0)  # a slow writer finishing an older slot
        assert sink._version() == 1
