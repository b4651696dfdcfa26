"""Round-10 layout-maintenance + change-data-feed surface:

- ``OPTIMIZE t [ZORDER BY (...)]`` — small-file compaction and Morton-
  curve clustering over versioned sinks (Delta-parity statement; at
  100 TB this is what keeps parquet min/max row-group stats usable for
  multi-column data skipping after many MERGE commits).
- ``FROM TABLE_CHANGES('t', v_from[, v_to])`` — Delta-style CDF rows
  reconstructed from snapshot diffs (incremental downstream consumption
  of a MERGE-maintained table).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError
from qlbridge_spark.sinks import ParquetMergeSink


@pytest.fixture()
def wh(spark, tmp_path):
    e = Engine(spark, "layout-test")
    sink = ParquetMergeSink(spark, str(tmp_path / "wh"), key="id")
    # commit a deliberately fragmented snapshot: 16 partitions → 16 files
    # (the md5 pad is incompressible, so the snapshot is big enough that a
    # 1 MB file-size target yields a genuinely multi-file layout)
    df = spark.range(0, 200000).selectExpr(
        "id",
        "id % 97 AS a",
        "cast(id * 7919 % 1009 AS double) AS b",
        "concat('u', id % 50) AS s",
        "md5(cast(id AS string)) AS pad",
    ).repartition(16)
    sink.ensure(df)
    e.register_sink("wh", sink)
    return e, sink


def _data_files(sink, version):
    n, _ = sink._snapshot_stats(version)
    return n


class TestOptimize:
    def test_compaction_reduces_files_and_preserves_rows(self, wh, spark):
        e, sink = wh
        v0 = sink._version()
        before = _data_files(sink, v0)
        assert before >= 16
        out = e.sql("OPTIMIZE wh").collect()[0]
        assert out["files_before"] == before
        assert out["files_after"] < before
        assert out["version"] == v0 + 1
        assert out["zorder_by"] == ""
        # contents identical, pre-optimize snapshot still time-travelable
        assert e.sql("SELECT count(*) AS n FROM wh").collect()[0]["n"] == 200000
        tt = e.sql(f"SELECT count(*) AS n FROM wh VERSION AS OF {v0}").collect()[0]["n"]
        assert tt == 200000

    def test_zorder_clusters_both_columns(self, wh, spark):
        e, sink = wh
        e.execute("SET optimize.target_file_mb = 1")  # force multiple output files
        out = e.sql("OPTIMIZE wh ZORDER BY (a, b)").collect()[0]
        assert out["zorder_by"] == "a,b"
        # every file should cover a narrow hyper-rectangle of (a, b):
        # per-FILE ranges of BOTH columns must be well under the global
        # range (a plain sort would only narrow one of them)
        cur = sink.scan(spark).withColumn("f", F.input_file_name())
        stats = (
            cur.groupBy("f")
            .agg((F.max("a") - F.min("a")).alias("ar"), (F.max("b") - F.min("b")).alias("br"))
            .collect()
        )
        assert len(stats) >= 2, "expected a multi-file layout"
        mean_ar = sum(r["ar"] for r in stats) / len(stats)
        mean_br = sum(r["br"] for r in stats) / len(stats)
        assert mean_ar < 96 * 0.8, f"a not clustered: {mean_ar}"
        assert mean_br < 1008 * 0.8, f"b not clustered: {mean_br}"
        # row multiset unchanged
        assert e.sql("SELECT sum(a) AS sa, sum(b) AS sb, count(*) AS n FROM wh").collect()[0] == \
            e.sql(f"SELECT sum(a) AS sa, sum(b) AS sb, count(*) AS n FROM wh VERSION AS OF 0").collect()[0]

    def test_zorder_unknown_column_errors(self, wh):
        e, _ = wh
        with pytest.raises(ExecError, match="unknown columns"):
            e.execute("OPTIMIZE wh ZORDER BY (nope)")

    def test_optimize_non_sink_errors(self, wh, spark):
        e, _ = wh
        e.register_df("plain", spark.range(3))
        with pytest.raises(ExecError, match="versioned sink"):
            e.execute("OPTIMIZE plain")

    def test_describe_detail(self, wh):
        e, sink = wh
        row = e.sql("DESCRIBE DETAIL wh").collect()[0]
        assert row["name"] == "wh"
        assert row["format"] == "ParquetMergeSink"
        assert row["key"] == "id"
        assert row["version"] == 0
        assert row["num_files"] >= 16
        assert row["size_bytes"] > 0
        assert row["committed_at"] is not None
        before = row["num_files"]
        e.execute("OPTIMIZE wh")
        row2 = e.sql("DESCRIBE DETAIL wh").collect()[0]
        assert row2["version"] == 1 and row2["num_files"] < before
        assert row2["retained_versions"] == 2

    def test_describe_detail_non_sink_errors(self, wh, spark):
        e, _ = wh
        e.register_df("plain2", spark.range(3))
        with pytest.raises(ExecError, match="versioned sink"):
            e.sql("DESCRIBE DETAIL plain2")

    def test_optimize_invalidates_plan_cache(self, wh):
        e, sink = wh
        n1 = e.sql("SELECT count(*) AS n FROM wh").collect()[0]["n"]
        e.execute("OPTIMIZE wh")
        # a post-OPTIMIZE DML must not be served a stale cached plan
        e.execute("DELETE FROM wh WHERE id < 10000")
        assert e.sql("SELECT count(*) AS n FROM wh").collect()[0]["n"] == n1 - 10000


class TestZorderKey:
    def test_errors(self, spark):
        from qlbridge_spark.datapipe.zorder import zorder_key

        df = spark.range(5).selectExpr("id", "id AS a")
        with pytest.raises(ValueError, match="at least one"):
            zorder_key(df, [])
        with pytest.raises(ValueError, match="not in frame"):
            zorder_key(df, ["zz"])
        with pytest.raises(ValueError, match="overflows"):
            zorder_key(df, ["id", "a"], bits_per_col=32)

    def test_nulls_and_constants(self, spark):
        from qlbridge_spark.datapipe.zorder import zorder_key

        df = spark.range(100).selectExpr(
            "id",
            "CASE WHEN id % 7 = 0 THEN NULL ELSE id % 13 END AS a",
            "'const' AS c",
        )
        keyed, k = zorder_key(df, ["a", "c"])
        assert keyed.filter(F.col(k).isNull()).count() == 0
        assert keyed.count() == 100
        assert keyed.columns == df.columns + [k]

    def test_deterministic(self, spark):
        from qlbridge_spark.datapipe.zorder import zorder_key

        df = spark.range(1000).selectExpr("id", "id % 31 AS a", "concat('s', id % 11) AS s")
        k1, _ = zorder_key(df, ["a", "s"])
        k2, _ = zorder_key(df, ["a", "s"])
        assert k1.orderBy("id").collect() == k2.orderBy("id").collect()


class TestHilbertCurve:
    """Hilbert clustering (datapipe/zorder.py hilbert_key): the curve
    itself is characterized by two properties — its indices over the
    bucket grid are a permutation, and consecutive indices are adjacent
    grid cells (the locality Morton lacks at quadrant boundaries)."""

    @pytest.mark.parametrize("ncols,bits", [(2, 3), (2, 4), (3, 3), (4, 2)])
    def test_curve_is_a_space_filling_permutation(self, ncols, bits):
        import itertools

        from qlbridge_spark.datapipe.zorder import hilbert_index

        side = 1 << bits
        cells = list(itertools.product(range(side), repeat=ncols))
        idx = [hilbert_index(c, bits) for c in cells]
        assert sorted(idx) == list(range(side**ncols))  # bijection
        by_d = [c for _, c in sorted(zip(idx, cells))]
        for a, b in zip(by_d, by_d[1:]):
            assert sum(abs(x - y) for x, y in zip(a, b)) == 1, (a, b)

    def test_hilbert_key_matches_driver_side_index(self, spark):
        """The broadcast-lookup join must assign exactly hilbert_index of
        the bucket ids — verified on data engineered so bucket id == the
        raw value (uniform 0..2^bits-1)."""
        from qlbridge_spark.datapipe.zorder import hilbert_key

        df = spark.range(256).selectExpr("id % 16 AS a", "cast(id / 16 AS long) AS b")
        keyed, k = hilbert_key(df, ["a", "b"], bits_per_col=4)
        assert keyed.filter(F.col(k).isNull()).count() == 0
        assert keyed.count() == 256
        # the key is a FUNCTION of the cell (one key per (a, b) value —
        # the lookup join neither duplicates nor forks rows), and the
        # curve spreads cells widely (approx quantile buckets may merge
        # a few, so exact bijection is not guaranteed)
        per_cell = keyed.groupBy("a", "b").agg(F.countDistinct(k).alias("nk")).collect()
        assert all(r["nk"] == 1 for r in per_cell)
        assert keyed.select(k).distinct().count() > 150

    def test_hilbert_key_plan_is_jvm_only(self, spark):
        from qlbridge_spark.datapipe.zorder import hilbert_key

        df = spark.range(5000).selectExpr("id % 50 AS a", "id % 77 AS b")
        keyed, k = hilbert_key(df, ["a", "b"])
        plan = keyed._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan  # no Python UDFs
        assert "BroadcastHashJoin" in plan  # lookup join broadcasts

    def test_optimize_with_hilbert_curve_clusters_both(self, wh, spark):
        e, sink = wh
        e.execute("SET optimize.target_file_mb = 1")
        e.execute("SET optimize.curve = 'hilbert'")
        out = e.sql("OPTIMIZE wh ZORDER BY (a, b)").collect()[0]
        assert out["zorder_by"] == "a,b"
        cur = sink.scan(spark).withColumn("f", F.input_file_name())
        stats = (
            cur.groupBy("f")
            .agg((F.max("a") - F.min("a")).alias("ar"), (F.max("b") - F.min("b")).alias("br"))
            .collect()
        )
        assert len(stats) >= 2
        mean_ar = sum(r["ar"] for r in stats) / len(stats)
        mean_br = sum(r["br"] for r in stats) / len(stats)
        assert mean_ar < 96 * 0.8, f"a not clustered: {mean_ar}"
        assert mean_br < 1008 * 0.8, f"b not clustered: {mean_br}"
        assert e.sql("SELECT sum(a) AS sa, sum(b) AS sb, count(*) AS n FROM wh").collect()[0] == \
            e.sql("SELECT sum(a) AS sa, sum(b) AS sb, count(*) AS n FROM wh VERSION AS OF 0").collect()[0]

    def test_bad_curve_value_errors(self, wh):
        e, _ = wh
        e.execute("SET optimize.curve = 'peano'")
        with pytest.raises(ExecError, match="morton.*hilbert|hilbert.*morton"):
            e.execute("OPTIMIZE wh ZORDER BY (a, b)")


class TestTableChanges:
    @pytest.fixture()
    def cdc(self, spark, tmp_path):
        e = Engine(spark, "cdf-test")
        sink = ParquetMergeSink(spark, str(tmp_path / "cdfwh"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))  # v0
        e.register_sink("cdfwh", sink)
        e.register_df("src", spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"))
        e.execute(
            "MERGE INTO cdfwh t USING src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"
        )  # v1
        e.execute("DELETE FROM cdfwh WHERE id = 1")  # v2
        return e, sink

    def test_change_rows(self, cdc):
        e, _ = cdc
        rows = e.sql(
            "SELECT id, v, _change_type, _commit_version FROM TABLE_CHANGES('cdfwh', 1)"
        ).collect()
        got = sorted((r["id"], r["v"], r["_change_type"], r["_commit_version"]) for r in rows)
        assert got == sorted(
            [
                (2, "b", "update_preimage", 1),
                (2, "B", "update_postimage", 1),
                (3, "c", "insert", 1),
                (1, "a", "delete", 2),
            ]
        )
        # commit timestamps come from the durable sidecar
        assert all(r["_commit_version"] >= 1 for r in rows)

    def test_commit_zero_is_initial_inserts(self, cdc):
        e, _ = cdc
        rows = e.sql("SELECT id, _change_type FROM TABLE_CHANGES('cdfwh', 0, 0)").collect()
        assert sorted((r["id"], r["_change_type"]) for r in rows) == [
            (1, "insert"),
            (2, "insert"),
        ]

    def test_composes_with_where_and_alias(self, cdc):
        e, _ = cdc
        n = e.sql(
            "SELECT count(*) AS n FROM TABLE_CHANGES('cdfwh', 0) c "
            "WHERE c._change_type = 'insert'"
        ).collect()[0]["n"]
        assert n == 3

    def test_upsert_commit_records_changes(self, cdc, spark):
        # merge_upsert (the engine's UPSERT path) records change rows at
        # commit time like every other commit class: changed keys emit
        # update pre/post, an x = x upsert emits NOTHING, new keys emit
        # insert — and the preimage scope is the overlapping files only
        e, sink = cdc  # table is {2: 'B', 3: 'c'} after the fixture
        src = spark.createDataFrame(
            [(2, "B"), (3, "C"), (4, "d")], "id long, v string"
        )
        sink.merge_upsert(src)  # 2 unchanged, 3 updated, 4 inserted
        v = sink._version()
        assert sink.recording_kind(v) == "files"
        rows = e.sql(
            f"SELECT id, v, _change_type FROM TABLE_CHANGES('cdfwh', {v}, {v})"
        ).collect()
        got = sorted((r["id"], r["v"], r["_change_type"]) for r in rows)
        assert got == [
            (3, "C", "update_postimage"),
            (3, "c", "update_preimage"),
            (4, "d", "insert"),
        ]

    def test_overwrite_commit_is_delete_all_insert_all(self, cdc, spark):
        # Delta CDF parity: a replace commit emits delete-all of the
        # previous snapshot + insert-all of the new one, even when the
        # contents are identical (it's recorded as an O(1) marker, never
        # diffed). Replay still converges to the table. Before the
        # 'overwrite' recording this surfaced as 0 rows via the snapshot
        # diff — that fallback no longer fires for overwrite commits.
        e, sink = cdc
        sink.overwrite(sink.scan(spark))  # v3: identical contents
        assert sink.recording_kind(3) == "overwrite"
        rows = e.sql("SELECT * FROM TABLE_CHANGES('cdfwh', 3, 3)").collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r["_change_type"], []).append(r["id"])
        assert sorted(by_type) == ["delete", "insert"]
        assert sorted(by_type["delete"]) == sorted(by_type["insert"])

    def test_errors(self, cdc, spark):
        e, _ = cdc
        e.register_df("plain", spark.range(2))
        with pytest.raises(ExecError, match="versioned sink"):
            e.sql("SELECT * FROM TABLE_CHANGES('plain', 0)")
        with pytest.raises(ExecError, match="after end"):
            e.sql("SELECT * FROM TABLE_CHANGES('cdfwh', 5, 1)")
        with pytest.raises(ExecError, match="not on disk"):
            e.sql("SELECT * FROM TABLE_CHANGES('cdfwh', 0, 99)")

    def test_recorded_step_has_no_join_diff_step_exactly_one(self, cdc):
        """Scale pins, both feed paths: a RECORDED step (v2, the DELETE —
        commit-time c<N> recording) plans with ZERO joins; with the
        recording removed, the snapshot-diff fallback is ONE full-outer
        join feeding an array+explode (a 4-branch filter/union
        formulation would show 4 Join nodes and re-execute the join 4x
        per step — the exact anti-pattern the round-8 review flagged on
        MERGE)."""
        import re
        import shutil

        e, sink = cdc
        df = e.sql("SELECT * FROM TABLE_CHANGES('cdfwh', 2, 2)")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert len(re.findall(r"\bJoin\b", plan)) == 0, plan
        shutil.rmtree(sink._changes_dir(2))
        e.clear_plan_cache()
        df = e.sql("SELECT * FROM TABLE_CHANGES('cdfwh', 2, 2)")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert len(re.findall(r"\bJoin\b", plan)) == 1, plan

    def test_vacuumed_version_errors(self, cdc):
        e, sink = cdc
        # drop v2's recording so the step NEEDS both diff endpoints; then
        # vacuum v0/v1 away → unsatisfiable either way
        import shutil

        shutil.rmtree(sink._changes_dir(2))
        sink.vacuum(keep=1)
        with pytest.raises(ExecError, match="neither a change recording nor both"):
            e.sql("SELECT * FROM TABLE_CHANGES('cdfwh', 2)").collect()


class TestChangeRecording:
    """Commit-time change recording (ParquetMergeSink c<N> dirs, the
    Delta _change_data design): the feed reads O(|changes|) instead of
    diffing O(|base|) snapshots. The binding contract: recorded output
    is IDENTICAL to the snapshot-diff output for every DML shape."""

    def _battery(self, spark, tmp_path, name):
        e = Engine(spark, f"cdcrec-{name}")
        sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
        sink.ensure(
            spark.createDataFrame(
                [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, g string, x double"
            )
        )
        e.register_sink("t", sink)
        e.execute("INSERT INTO t (id, g, x) VALUES (4, 'd', 40.0)")
        e.execute("UPDATE t SET x = x + 1 WHERE id <= 2")
        e.execute("UPDATE t SET g = g WHERE id = 3")  # no-op: must emit nothing
        e.execute("DELETE FROM t WHERE id = 1")
        e.register_df(
            "src", spark.createDataFrame([(2, "B", 99.0), (5, "e", 50.0)], "id long, g string, x double")
        )
        e.execute(
            "MERGE INTO t USING src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET x = s.x "
            "WHEN NOT MATCHED THEN INSERT (id, g, x) VALUES (s.id, s.g, s.x)"
        )
        e.execute("SET optimize.target_file_mb = 64")
        e.execute("OPTIMIZE t")
        return e, sink

    def test_recorded_equals_snapshot_diff(self, spark, tmp_path):
        import glob
        import shutil

        e, sink = self._battery(spark, tmp_path, "par")
        q = "SELECT id, g, x, _change_type, _commit_version FROM TABLE_CHANGES('t', 0)"
        rec = sorted(tuple(r) for r in e.sql(q).collect())
        # every commit of the battery except merge_upsert-style ones is
        # recorded: ensure, insert, 2 updates, delete, MERGE, OPTIMIZE
        cdirs = sorted(glob.glob(str(tmp_path / "par" / "c*")))
        assert len(cdirs) == 7
        for p in cdirs:
            shutil.rmtree(p)
        e.clear_plan_cache()  # out-of-band fs mutation: drop pinned plans
        diff = sorted(tuple(r) for r in e.sql(q).collect())
        assert rec == diff
        # the no-op update commit contributes zero rows either way
        assert not [r for r in rec if r[4] == 3]

    def test_noop_and_layout_commits_record_empty(self, spark, tmp_path):
        e, sink = self._battery(spark, tmp_path, "noop")
        v_opt = sink._version()  # the OPTIMIZE commit
        assert (
            e.sql(f"SELECT * FROM TABLE_CHANGES('t', {v_opt}, {v_opt})").count() == 0
        )

    def test_flanking_vacuum_gap_consumable_via_recordings(self, spark, tmp_path):
        """With recordings, the change feed stays consumable even when
        the OLDEST retained step's diff endpoint (v-1) was vacuumed —
        previously a hard error, now only unrecorded commits need both
        snapshots on disk."""
        e = Engine(spark, "cdcrec-vac")
        sink = ParquetMergeSink(spark, str(tmp_path / "vac"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))  # v0
        e.register_sink("t", sink)
        e.execute("INSERT INTO t (id, v) VALUES (2, 'b')")  # v1
        e.execute("UPDATE t SET v = 'a2' WHERE id = 1")  # v2
        e.execute("DELETE FROM t WHERE id = 2")  # v3
        assert sink.vacuum(keep=2) == 2  # drops v0, v1 (and c0, c1)
        df, cur = e.changes_since("t", 1)  # steps 2, 3: v1 is GONE
        assert cur == 3
        got = sorted((r["id"], r["_change_type"], r["_commit_version"]) for r in df.collect())
        assert got == [
            (1, "update_postimage", 2),
            (1, "update_preimage", 2),
            (2, "delete", 3),
        ]
        # an UNRECORDED step (torn/stripped recording) with a vacuumed
        # endpoint still errors
        import shutil

        sink.merge_upsert(spark.createDataFrame([(9, "z")], "id long, v string"))  # v4
        shutil.rmtree(str(tmp_path / "vac" / "c4"))  # strip its recording
        sink.vacuum(keep=1)  # only v4 retained; step 4 diff needs v3
        e.clear_plan_cache()
        with pytest.raises(ExecError, match="neither a change recording nor both"):
            e.changes_since("t", 3)

    def test_merge_upsert_commit_records_changes(self, spark, tmp_path):
        # upsert commits record at commit time (keyed contract makes the
        # pre/post pairing well-defined); with the recording STRIPPED the
        # feed falls back to the snapshot diff and agrees exactly
        e = Engine(spark, "cdcrec-ups")
        sink = ParquetMergeSink(spark, str(tmp_path / "ups"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        e.register_sink("t", sink)
        sink.merge_upsert(spark.createDataFrame([(1, "A"), (2, "b")], "id long, v string"))
        assert sink.recording_kind(1) == "files"
        want = [(1, "update_postimage"), (1, "update_preimage"), (2, "insert")]
        got = sorted(
            (r["id"], r["_change_type"])
            for r in e.sql("SELECT * FROM TABLE_CHANGES('t', 1, 1)").collect()
        )
        assert got == want
        import shutil

        shutil.rmtree(str(tmp_path / "ups" / "c1"))
        e.clear_plan_cache()
        got = sorted(
            (r["id"], r["_change_type"])
            for r in e.sql("SELECT * FROM TABLE_CHANGES('t', 1, 1)").collect()
        )
        assert got == want  # diff fallback agrees with the recording

    def test_incremental_mv_refresh_over_recorded_changes(self, spark, tmp_path):
        """The consumer this was built for: MV refresh folds the recorded
        delta — correct end-to-end over recorded commits."""
        e = Engine(spark, "cdcrec-mv")
        sink = ParquetMergeSink(spark, str(tmp_path / "mvr"), key="id")
        sink.ensure(
            spark.createDataFrame([(i, "g" + str(i % 3), float(i)) for i in range(30)],
                                  "id long, g string, x double")
        )
        e.register_sink("t", sink)
        e.execute("CREATE MATERIALIZED VIEW mv AS SELECT g, sum(x) AS s, count(*) AS n FROM t GROUP BY g")
        e.execute("DELETE FROM t WHERE id % 5 = 0")
        e.execute("UPDATE t SET x = x * 2 WHERE id % 3 = 1")
        rep = e.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        got = sorted(tuple(r) for r in e.sql("SELECT * FROM mv").collect())
        want = sorted(
            tuple(r)
            for r in e.sql("SELECT g, sum(x) AS s, count(*) AS n FROM t GROUP BY g").collect()
        )
        assert got == want


class TestChangesSince:
    """Incremental CDC consumption loop: a downstream replica applies
    `changes_since` deltas checkpoint-to-checkpoint and must equal the
    source table — never rescanning it."""

    def test_consumer_loop_converges(self, spark, tmp_path):
        e = Engine(spark, "cdc-consumer")
        sink = ParquetMergeSink(spark, str(tmp_path / "cwh"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
        e.register_sink("cwh", sink)

        replica: dict = {}
        ckpt = -1

        def consume():
            nonlocal ckpt
            df, v = e.changes_since("cwh", ckpt)
            for r in df.orderBy("_commit_version").collect():
                if r["_change_type"] in ("insert", "update_postimage"):
                    replica[r["id"]] = r["v"]
                elif r["_change_type"] == "delete":
                    replica.pop(r["id"], None)
            ckpt = v

        consume()  # catches up to v0 (initial inserts)
        assert replica == {1: "a", 2: "b"} and ckpt == 0

        e.register_df("src", spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"))
        e.execute(
            "MERGE INTO cwh t USING src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"
        )
        e.execute("DELETE FROM cwh WHERE id = 1")
        consume()
        assert replica == {2: "B", 3: "c"} and ckpt == 2

        # caught up: empty frame, full CDF schema, version unchanged
        df, v = e.changes_since("cwh", ckpt)
        assert v == 2 and df.count() == 0
        assert {"_change_type", "_commit_version", "_commit_timestamp"} <= set(df.columns)
        # replica equals the table
        assert replica == {r["id"]: r["v"] for r in e.sql("SELECT * FROM cwh").collect()}

    def test_stale_ahead_checkpoint_errors(self, spark, tmp_path):
        e = Engine(spark, "cdc-consumer-2")
        sink = ParquetMergeSink(spark, str(tmp_path / "cwh2"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        e.register_sink("cwh2", sink)
        with pytest.raises(ExecError, match="ahead"):
            e.changes_since("cwh2", 7)


class TestIncrementalOptimize:
    """Plain OPTIMIZE is O(small files), Delta-parity: only under-target
    files rewrite; right-sized files HARDLINK into the new snapshot
    (sinks.py optimize → _commit_cow). At 100 TB, compacting 2 GB of
    small CDC files must never cost an O(table) snapshot rewrite."""

    TARGET_MB = 0.05  # 51,200 bytes — test files straddle this

    def _frag(self, spark, tmp_path, name="iw"):
        sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
        # 10 large files (~150 KB each: incompressible md5 pad), then two
        # 1-row COW appends → snapshot = 10 large + 2 tiny files
        big = spark.range(40000).selectExpr(
            "id", "md5(cast(id AS string)) AS pad"
        ).repartition(10)
        sink.ensure(big)
        sink.insert_append(
            spark.createDataFrame([(100001, "x")], "id long, pad string")
        )
        sink.insert_append(
            spark.createDataFrame([(100002, "y")], "id long, pad string")
        )
        return sink

    def _inodes(self, sink, version):
        vdir = sink._data_dir(version)
        return {r: os.stat(os.path.join(vdir, r)).st_ino for r in sink._data_rels(version)}

    def test_rewrites_only_small_files_links_rest_by_inode(self, spark, tmp_path):
        sink = self._frag(spark, tmp_path)
        v0 = sink._version()
        thresh = int(self.TARGET_MB * (1 << 20))
        vdir = sink._data_dir(v0)
        sizes = {r: os.path.getsize(os.path.join(vdir, r)) for r in sink._data_rels(v0)}
        large = {r for r, s in sizes.items() if s >= thresh}
        small = {r for r, s in sizes.items() if s < thresh}
        assert len(large) == 10 and len(small) >= 2, sizes
        before = self._inodes(sink, v0)

        res = sink.optimize(target_file_mb=self.TARGET_MB)
        assert sink.last_commit == {
            "mode": "cow",
            "files_linked": 10,
            "files_rewritten": len(small),
        }
        assert res["files_before"] == 10 + len(small)
        assert res["files_after"] == 11
        after = self._inodes(sink, res["version"])
        # every large file is the SAME inode (hardlinked, zero data I/O)
        assert {r: i for r, i in after.items() if r in large} == {
            r: i for r, i in before.items() if r in large
        }
        # the two tiny files are gone, replaced by one fresh compacted file
        fresh = set(after) - large
        assert len(fresh) == 1 and not (fresh & small)
        # contents identical; the layout commit records a logical no-op
        cur = sink.scan(spark)
        assert cur.count() == 40002
        assert cur.filter(F.col("id").isin(100001, 100002)).count() == 2
        rec = sink.recorded_changes(spark, res["version"])
        assert rec is not None and rec.count() == 0  # _NO_CHANGES marker

    def test_nothing_to_compact_is_a_no_op(self, spark, tmp_path):
        sink = self._frag(spark, tmp_path, name="iw2")
        sink.optimize(target_file_mb=self.TARGET_MB)
        v = sink._version()
        # 10 large + 1 compacted file: fewer than two small files left
        res = sink.optimize(target_file_mb=self.TARGET_MB)
        assert sink.last_commit["mode"] == "noop"
        assert res["version"] == v and sink._version() == v
        assert res["files_before"] == res["files_after"] == 11

    def test_partitioned_compaction_preserves_layout(self, spark, tmp_path):
        sink = ParquetMergeSink(
            spark, str(tmp_path / "iwp"), key="id", partition_by=["p"]
        )
        sink.ensure(
            spark.createDataFrame(
                [(i, i % 2, f"v{i}") for i in range(8)], "id long, p int, v string"
            )
        )
        for i in range(3):  # tiny COW appends fragment both partitions
            sink.insert_append(
                spark.createDataFrame(
                    [(100 + 2 * i, 0, "a"), (101 + 2 * i, 1, "b")],
                    "id long, p int, v string",
                )
            )
        v0 = sink._version()
        n_before, _ = sink._snapshot_stats(v0)
        want = sorted(tuple(r) for r in sink.scan(spark, v0).collect())
        res = sink.optimize(target_file_mb=1)
        n_after, _ = sink._snapshot_stats(res["version"])
        assert n_after < n_before
        got = sorted(tuple(r) for r in sink.scan(spark).collect())
        assert got == want
        # hive layout intact: data files still live under p=… dirs
        assert all(r.startswith("p=") for r in sink._data_rels(res["version"]))

    def test_cdf_stream_sees_nothing_from_incremental_optimize(self, spark, tmp_path):
        sink = self._frag(spark, tmp_path, name="iw3")
        e = Engine(spark, "inc-opt-cdf")
        e.register_sink("iw3", sink)
        q = (
            e.stream_changes("iw3", starting_version="latest")
            .writeStream.format("memory")
            .queryName("inc_opt_cdf")
            .outputMode("append")
            .start()
        )
        try:
            sink.optimize(target_file_mb=self.TARGET_MB)
            q.processAllAvailable()
            assert spark.sql("SELECT count(*) c FROM inc_opt_cdf").collect()[0].c == 0
        finally:
            q.stop()


class TestScopedOptimize:
    """``OPTIMIZE t WHERE <pred> [ZORDER BY ...]`` — Delta-parity scoped
    layout maintenance: the WHERE selects which FILES rewrite (via the
    stats sidecar; partition predicates map exactly to partition dirs);
    rows are never filtered, so the table stays byte-identical. With a
    scope, ZORDER is incremental: cluster one partition, hardlink the
    rest — at 100 TB that's yesterday's data, not three years'."""

    def _psink(self, spark, tmp_path, name):
        sink = ParquetMergeSink(
            spark, str(tmp_path / name), key="id", partition_by=["p"]
        )
        df = spark.createDataFrame(
            [(i, i % 3, i % 17, float(i % 11)) for i in range(3000)],
            "id long, p int, a int, b double",
        ).repartition(4)
        sink.ensure(df)
        eng = Engine(spark, f"scoped-{name}")
        eng.register_sink("t", sink)
        return eng, sink

    def _inodes(self, sink, v):
        import os as _os

        vdir = sink._data_dir(v)
        return {
            r: _os.stat(_os.path.join(vdir, r)).st_ino for r in sink._data_rels(v)
        }

    def test_scoped_zorder_rewrites_one_partition(self, spark, tmp_path):
        eng, sink = self._psink(spark, tmp_path, "sz")
        v0 = sink._version()
        before = self._inodes(sink, v0)
        want = sorted(tuple(r) for r in sink.scan(spark, v0).collect())
        eng.execute("SET optimize.target_file_mb = 1")
        out = eng.sql("OPTIMIZE t WHERE p = 1 ZORDER BY (a, b)").collect()[0]
        assert out["zorder_by"] == "a,b"
        lc = sink.last_commit
        assert lc["mode"] == "cow" and lc["files_rewritten"] > 0
        after = self._inodes(sink, out["version"])
        # every p=0 / p=2 file is the SAME inode (hardlinked)
        untouched_before = {r: i for r, i in before.items() if "p=1" not in r}
        untouched_after = {r: i for r, i in after.items() if "p=1" not in r}
        assert untouched_before == untouched_after
        # p=1 files are fresh (clustered rewrite)
        assert not (
            {i for r, i in after.items() if "p=1" in r}
            & {i for r, i in before.items() if "p=1" in r}
        )
        # content identical; layout-only commit emits no change rows
        got = sorted(tuple(r) for r in sink.scan(spark).collect())
        assert got == want
        assert eng.sql(
            f"SELECT * FROM TABLE_CHANGES('t', {out['version']}, {out['version']})"
        ).count() == 0

    def test_scoped_compaction_only_in_scope(self, spark, tmp_path):
        eng, sink = self._psink(spark, tmp_path, "sc")
        # fragment BOTH partitions 0 and 2 with tiny appends
        for i in range(3):
            sink.insert_append(
                spark.createDataFrame(
                    [(9000 + 2 * i, 0, 1, 1.0), (9001 + 2 * i, 2, 1, 1.0)],
                    "id long, p int, a int, b double",
                )
            )
        v0 = sink._version()
        small_before = {
            r for r, i in self._inodes(sink, v0).items()
        }
        eng.execute("SET optimize.target_file_mb = 1")
        out = eng.sql("OPTIMIZE t WHERE p = 0").collect()[0]
        lc = sink.last_commit
        assert lc["mode"] == "cow"
        after = self._inodes(sink, out["version"])
        # p=2's tiny files survive untouched (out of scope)...
        assert {r for r in after if "p=2" in r} == {r for r in small_before if "p=2" in r}
        # ...while p=0's compacted (fewer files than before)
        assert len({r for r in after if "p=0" in r}) < len(
            {r for r in small_before if "p=0" in r}
        )
        assert sink.scan(spark).count() == 3000 + 6

    def test_unpushable_scope_errors(self, spark, tmp_path):
        eng, sink = self._psink(spark, tmp_path, "se")
        with pytest.raises(ExecError, match="pushable"):
            eng.execute("OPTIMIZE t WHERE upper(cast(p AS string)) = '1'")

    def test_scope_matching_nothing_is_noop(self, spark, tmp_path):
        eng, sink = self._psink(spark, tmp_path, "sn")
        v0 = sink._version()
        out = eng.sql("OPTIMIZE t WHERE p = 999 ZORDER BY (a)").collect()[0]
        assert out["version"] == v0 and sink.last_commit["mode"] == "noop"


class TestBatchedFeedPlanning:
    """Feed planning is O(1) Spark jobs in the backlog length: every
    recorded-files commit reads in ONE batched parquet read (version
    derived from the c<N> path component), and recording KINDS come from
    driver-side stat calls — not one schema-inference job per version."""

    def test_backlog_feed_job_count_is_constant(self, spark, tmp_path):
        eng = Engine(spark, "tc-jobs")
        sink = ParquetMergeSink(spark, str(tmp_path / "tj"), key="id")
        sink.ensure(
            spark.createDataFrame([(i, 0) for i in range(500)], "id long, v long")
            .repartitionByRange(4, "id")
        )
        eng.register_sink("t", sink)
        for k in range(12):
            eng.execute(f"UPDATE t SET v = {k + 1} WHERE id % 40 = {k}")
        sc = spark.sparkContext
        sc.setJobGroup("tc-jobs-g", "tc-jobs-g")
        try:
            rows = eng.sql("SELECT * FROM TABLE_CHANGES('t', 1)").collect()
        finally:
            sc.setJobGroup(None, None)
        jobs = len(sc.statusTracker().getJobIdsForGroup("tc-jobs-g"))
        # one schema job for the batched read + the collect (+1 slack);
        # the pre-batching path paid ~1 job PER commit
        assert jobs <= 4, jobs
        byv = {}
        for r in rows:
            byv.setdefault(r._commit_version, 0)
            byv[r._commit_version] += 1
        assert set(byv) == set(range(1, 13))
        assert all(n > 0 and n % 2 == 0 for n in byv.values())  # pre+post pairs
        assert all(r._commit_timestamp is not None for r in rows)

    def test_layout_only_range_returns_empty_with_schema(self, spark, tmp_path):
        eng = Engine(spark, "tc-noop")
        sink = ParquetMergeSink(spark, str(tmp_path / "tn"), key="id")
        sink.ensure(spark.createDataFrame([(1, 0)], "id long, v long"))
        eng.register_sink("t", sink)
        eng.execute("OPTIMIZE t")  # may be a metadata no-op (1 file)
        sink.optimize(zorder_by=["id"])  # forces a layout commit
        v = sink._version()
        assert v >= 1
        out = eng.sql(f"SELECT * FROM TABLE_CHANGES('t', {v}, {v})")
        assert out.count() == 0
        assert {"_change_type", "_commit_version", "_commit_timestamp"} <= set(out.columns)


class TestAutoCompact:
    """``SET optimize.auto_compact = true`` — Delta autoCompact parity:
    after a DML commit, when the snapshot accumulates at least
    ``optimize.auto_compact_min_files`` under-target files, the engine
    runs the INCREMENTAL compaction as a follow-up layout-only commit.
    A streaming CDC table stays at a bounded file count without anyone
    remembering to OPTIMIZE."""

    def _mk(self, spark, tmp_path, name):
        eng = Engine(spark, f"ac-{name}")
        sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
        sink.ensure(
            spark.createDataFrame([(i, 0) for i in range(50)], "id long, v long")
        )
        eng.register_sink("t", sink)
        return eng, sink

    def test_file_count_stays_bounded(self, spark, tmp_path):
        eng, sink = self._mk(spark, tmp_path, "b")
        eng.execute("SET optimize.auto_compact = true")
        eng.execute("SET optimize.auto_compact_min_files = 6")
        for i in range(10):  # tiny appends fragment the table
            eng.execute(f"INSERT INTO t (id, v) VALUES ({100 + i}, {i})")
        n_files, _ = sink._snapshot_stats(sink._version())
        assert n_files <= 6, n_files  # compaction kept the count bounded
        # all rows survive every compaction
        assert sink.scan(spark).count() == 60
        # compaction commits are layout-only: the change feed replays to
        # exactly the logical mutations
        rows = eng.sql(f"SELECT * FROM TABLE_CHANGES('t', 0, {sink._version()})").collect()
        state = {}
        for r in sorted(rows, key=lambda r: r._commit_version):
            if r._change_type in ("insert", "update_postimage"):
                state[r.id] = r.v
            elif r._change_type == "delete":
                state.pop(r.id, None)
        assert state == {r.id: r.v for r in sink.scan(spark).collect()}

    def test_partition_scoped_never_rewrites_cold_partition(self, spark, tmp_path):
        """On a hive-partitioned sink, auto-compaction scopes to the
        partitions the triggering DML touched: steady CDC into partition
        p=0 must NEVER rewrite (or even consider) p=1's small-file
        survivors — inode-pinned."""
        import os as _os

        eng = Engine(spark, "ac-scope")
        sink = ParquetMergeSink(
            spark, str(tmp_path / "acs"), key="id", partition_by=["p"]
        )
        sink.ensure(
            spark.createDataFrame(
                [(i, i % 2, 0) for i in range(40)], "id long, p int, v long"
            )
        )
        eng.register_sink("t", sink)
        # fragment BOTH partitions while auto-compact is off
        for i in range(4):
            eng.execute(f"INSERT INTO t (id, p, v) VALUES ({100 + i}, 0, {i})")
            eng.execute(f"INSERT INTO t (id, p, v) VALUES ({200 + i}, 1, {i})")

        def _inodes(dirname):
            v = sink._data_dir(sink._version())
            return {
                r: _os.stat(_os.path.join(v, r)).st_ino
                for r in sink._data_rels(sink._version())
                if _os.path.dirname(r) == dirname
            }

        cold_before = _inodes("p=1")
        assert len(cold_before) >= 5  # genuinely fragmented
        eng.execute("SET optimize.auto_compact = true")
        eng.execute("SET optimize.auto_compact_min_files = 4")
        # hot DML in p=0 only → compaction fires, scoped to p=0
        eng.execute("INSERT INTO t (id, p, v) VALUES (300, 0, 9)")
        hot_files = [
            r
            for r in sink._data_rels(sink._version())
            if _os.path.dirname(r) == "p=0"
        ]
        assert len(hot_files) <= 4  # the hot partition DID compact
        cold_after = _inodes("p=1")
        # every cold file survived as the SAME inode (hardlinked through
        # both the DML commit and the auto-compact commit)
        assert cold_after == cold_before
        # content intact across the scoped compaction
        assert sink.scan(spark).count() == 49
        assert sink.scan(spark).filter("p = 1").count() == 24

    def test_off_by_default_accumulates(self, spark, tmp_path):
        eng, sink = self._mk(spark, tmp_path, "off")
        for i in range(8):
            eng.execute(f"INSERT INTO t (id, v) VALUES ({100 + i}, {i})")
        n_files, _ = sink._snapshot_stats(sink._version())
        assert n_files >= 8  # no surprise commits without opt-in
        assert sink._version() == 8  # exactly one commit per INSERT


class TestFeedVersionAnchoring:
    def test_warehouse_path_containing_cN_segment(self, spark, tmp_path):
        """The batched feed derives versions from the file path — the
        regex must anchor to the file's immediate parent dir, or a
        warehouse rooted under .../c5/... would mis-tag every commit."""
        import os as _os

        d = tmp_path / "c5" / "wh"
        d.mkdir(parents=True)
        eng = Engine(spark, "tc-anchor")
        sink = ParquetMergeSink(spark, str(d / "t"), key="id")
        sink.ensure(spark.createDataFrame([(i, 0) for i in range(20)], "id long, v long"))
        eng.register_sink("t", sink)
        eng.execute("UPDATE t SET v = 1 WHERE id < 3")
        eng.execute("DELETE FROM t WHERE id = 9")
        rows = eng.sql("SELECT * FROM TABLE_CHANGES('t', 1)").collect()
        assert sorted({r._commit_version for r in rows}) == [1, 2]


class TestTimestampBounds:
    """Delta startingTimestamp/endingTimestamp parity: TABLE_CHANGES
    bounds (and stream_changes startingVersion) accept ISO timestamps —
    a string start resolves to the first commit AT OR AFTER it, a string
    end to the last commit AT OR BEFORE it, against the durable commit
    sidecar; out-of-history bounds fail loudly."""

    def _mk(self, spark, tmp_path):
        import time as _time

        eng = Engine(spark, "tc-tsb")
        sink = ParquetMergeSink(spark, str(tmp_path / "tsb"), key="id")
        sink.ensure(spark.createDataFrame([(i, 0) for i in range(20)], "id long, v long"))
        eng.register_sink("t", sink)
        eng.execute("UPDATE t SET v = 1 WHERE id = 1")  # v1
        _time.sleep(1.1)
        import datetime

        mid = datetime.datetime.now(datetime.timezone.utc).isoformat()
        _time.sleep(1.1)
        eng.execute("UPDATE t SET v = 2 WHERE id = 2")  # v2
        eng.execute("DELETE FROM t WHERE id = 3")  # v3
        return eng, sink, mid

    def test_start_and_end_timestamp_bounds(self, spark, tmp_path):
        eng, sink, mid = self._mk(spark, tmp_path)
        rows = eng.sql(f"SELECT * FROM TABLE_CHANGES('t', '{mid}')").collect()
        assert sorted({r._commit_version for r in rows}) == [2, 3]
        rows = eng.sql(f"SELECT * FROM TABLE_CHANGES('t', 1, '{mid}')").collect()
        assert sorted({r._commit_version for r in rows}) == [1]

    def test_out_of_history_bounds_error(self, spark, tmp_path):
        eng, sink, mid = self._mk(spark, tmp_path)
        with pytest.raises(ExecError, match="at or after"):
            eng.sql("SELECT * FROM TABLE_CHANGES('t', '2099-01-01')").collect()
        with pytest.raises(ExecError, match="at or before"):
            eng.sql("SELECT * FROM TABLE_CHANGES('t', 0, '1999-01-01')").collect()
        with pytest.raises(ExecError, match="neither"):
            eng.sql("SELECT * FROM TABLE_CHANGES('t', 'not-a-time')").collect()

    def test_stream_starting_timestamp(self, spark, tmp_path):
        eng, sink, mid = self._mk(spark, tmp_path)
        q = (
            eng.stream_changes("t", starting_version=mid)
            .writeStream.format("memory")
            .queryName("tc_tsb_stream")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            vs = sorted(
                {r._commit_version for r in spark.sql("SELECT * FROM tc_tsb_stream").collect()}
            )
            assert vs == [2, 3]
        finally:
            q.stop()


class TestClusterBy:
    """Declared clustering (``WITH {"cluster_by": [...]}`` — liquid-
    clustering parity): plain OPTIMIZE and auto-compaction lay the
    REWRITTEN (small/new) files on the table's clustering curve while
    right-sized files hardlink through — new CDC data gets incrementally
    clustered without anyone naming ZORDER columns."""

    def test_declared_clustering_applied_on_compaction(self, spark, tmp_path):
        eng = Engine(spark, "cb1")
        path = tmp_path / "cb1"
        eng.execute(
            f"CREATE TABLE ct (id BIGINT, a BIGINT, b DOUBLE) "
            f'WITH {{"path": "{path}", "key": "id", "cluster_by": ["a", "b"]}}'
        )
        sink = eng.sinks["ct"]
        assert sink.cluster_by == ["a", "b"]
        # fragment with unclustered inserts
        df = spark.range(40000).selectExpr(
            "id", "id % 97 AS a", "cast(id * 7919 % 1009 AS double) AS b"
        ).repartition(6)
        sink.insert_append(df)
        eng.execute("SET optimize.target_file_mb = 0.05")  # multi-file output
        out = eng.sql("OPTIMIZE ct").collect()[0]
        assert out["zorder_by"] == ""  # plain OPTIMIZE — clustering is implicit
        hist = {r["version"]: r["operation"] for r in eng.sql("DESCRIBE HISTORY ct").collect()}
        assert hist[out["version"]] == "OPTIMIZE (clustered)"
        # per-file ranges of BOTH clustering columns are narrow
        cur = sink.scan(spark).withColumn("f", F.input_file_name())
        stats = (
            cur.groupBy("f")
            .agg((F.max("a") - F.min("a")).alias("ar"), (F.max("b") - F.min("b")).alias("br"))
            .collect()
        )
        assert len(stats) >= 2
        assert sum(r["ar"] for r in stats) / len(stats) < 96 * 0.8
        assert sum(r["br"] for r in stats) / len(stats) < 1008 * 0.8
        # rows preserved
        assert sink.scan(spark).count() == 40000
        # DESCRIBE DETAIL reports the declared clustering
        det = eng.sql("DESCRIBE DETAIL ct").collect()[0]
        assert det["cluster_by"] == "a,b"

    def test_reopen_with_conflicting_clustering_errors(self, spark, tmp_path):
        p = str(tmp_path / "cb2")
        s1 = ParquetMergeSink(spark, p, key="id", cluster_by=["a"])
        s1.ensure(spark.createDataFrame([(1, 2)], "id long, a long"))
        s2 = ParquetMergeSink(spark, p, key="id")  # inherit silently
        assert s2.cluster_by == ["a"]
        with pytest.raises(ValueError, match="clustered by"):
            ParquetMergeSink(spark, p, key="id", cluster_by=["id"])

    def test_unknown_cluster_column_rejected(self, spark, tmp_path):
        eng = Engine(spark, "cb3")
        with pytest.raises(ExecError, match="cluster_by columns"):
            eng.execute(
                f"CREATE TABLE bad (id BIGINT) "
                f'WITH {{"path": "{tmp_path / "cb3"}", "cluster_by": ["nope"]}}'
            )
