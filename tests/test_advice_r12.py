"""Round-12 ADVICE regression pins (all four r11 advisor items were
severity 'low').

1. `SET optimize.auto_compact = 'false'` (string, or 'off'/'0') really
   DISABLES auto-compaction — raw truthiness would have treated any
   non-empty string as enabled (engine.py _maybe_auto_compact).
2. TABLE_CHANGES timestamp bounds that resolve to an inverted range
   (start after end) raise ExecError, matching Delta, instead of
   returning an empty feed that could mask swapped arguments
   (engine.py _table_changes_df).
3. recording_kind / recorded_changes ignore hidden/underscore
   '*.parquet' artifacts: a changes dir holding ONLY those plans as
   'none' (snapshot-diff fallback), never as an empty 'files'
   recording (sinks.py).
4. Incremental OPTIMIZE survives a file vanishing between the listing
   and the size probe (concurrent VACUUM): no raw OSError out of
   os.path.getsize (sinks.py optimize).
"""

import os

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError
from qlbridge_spark.sinks import ParquetMergeSink


def _mk(spark, tmp_path, name="t", n=50):
    eng = Engine(spark, f"advr12-{name}")
    sink = ParquetMergeSink(spark, str(tmp_path / name), key="id")
    sink.ensure(
        spark.createDataFrame([(i, 0) for i in range(n)], "id long, v long")
    )
    eng.register_sink("t", sink)
    return eng, sink


class TestAutoCompactFlagNormalization:
    @pytest.mark.parametrize("off", ["false", "FALSE", "off", "0", "no"])
    def test_string_false_disables(self, spark, tmp_path, off):
        eng, sink = _mk(spark, tmp_path, f"off-{off.lower()}")
        eng.execute(f"SET optimize.auto_compact = '{off}'")
        eng.execute("SET optimize.auto_compact_min_files = 2")
        for i in range(6):
            eng.execute(f"INSERT INTO t (id, v) VALUES ({100 + i}, {i})")
        n_files, _ = sink._snapshot_stats(sink._version())
        # every tiny append kept its own file: compaction never fired
        assert n_files >= 6, n_files

    @pytest.mark.parametrize("on", ["true", "ON", "1"])
    def test_string_true_enables(self, spark, tmp_path, on):
        eng, sink = _mk(spark, tmp_path, f"on-{on.lower()}")
        eng.execute(f"SET optimize.auto_compact = '{on}'")
        eng.execute("SET optimize.auto_compact_min_files = 4")
        for i in range(8):
            eng.execute(f"INSERT INTO t (id, v) VALUES ({100 + i}, {i})")
        n_files, _ = sink._snapshot_stats(sink._version())
        assert n_files <= 4, n_files
        assert sink.scan(spark).count() == 58


class TestInvertedTimestampBounds:
    def test_in_history_inverted_raises(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "inv")
        eng.execute("UPDATE t SET v = 9 WHERE id = 1")
        t0 = sink.commit_time(0).isoformat()
        t1 = sink.commit_time(1).isoformat()
        with pytest.raises(ExecError, match="after end version"):
            eng.sql(f"SELECT * FROM TABLE_CHANGES('t', '{t1}', '{t0}')").collect()

    def test_out_of_history_bounds_raise(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "oob")
        with pytest.raises(ExecError, match="at or after"):
            eng.sql("SELECT * FROM TABLE_CHANGES('t', '2099-01-01', '2000-01-01')").collect()


class TestHiddenParquetRecording:
    def test_hidden_only_dir_plans_as_none(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "hid")
        eng.execute("UPDATE t SET v = 7 WHERE id = 2")
        v = sink._version()
        assert sink.recording_kind(v) == "files"
        d = sink._changes_dir(v)
        # simulate a torn recording: only hidden/underscore artifacts
        for n in os.listdir(d):
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                os.rename(os.path.join(d, n), os.path.join(d, "_" + n))
        assert sink.recording_kind(v) == "none"
        assert sink.recorded_changes(spark, v) is None
        # the feed still answers correctly via the snapshot-diff fallback
        rows = eng.sql(f"SELECT * FROM TABLE_CHANGES('t', {v}, {v})").collect()
        post = [r for r in rows if r._change_type == "update_postimage"]
        assert [(r.id, r.v) for r in post] == [(2, 7)]


class TestOptimizeSizeProbeResilience:
    def test_getsize_oserror_is_contained(self, spark, tmp_path, monkeypatch):
        eng, sink = _mk(spark, tmp_path, "osz")
        for i in range(4):
            eng.execute(f"INSERT INTO t (id, v) VALUES ({100 + i}, {i})")
        vdir = sink._data_dir(sink._version())
        real = os.path.getsize

        def flaky(p, _real=real, _vdir=vdir):
            if os.path.dirname(p) == _vdir and p.endswith(".parquet"):
                raise OSError(f"stat vanished: {p}")
            return _real(p)

        monkeypatch.setattr(os.path, "getsize", flaky)
        # no raw OSError escapes the size probe; the compaction either
        # no-ops or commits (files are actually still on disk here)
        sink.optimize()
        monkeypatch.undo()
        assert sink.scan(spark).count() == 54
