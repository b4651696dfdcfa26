"""Shared-feed multi-view refresh + ON-COMMIT auto-refresh.

`REFRESH ALL MATERIALIZED VIEWS` refreshes every registered view while
planning each base/dim table's change backlog ONCE (feed cache keyed on
(table, checkpoint version); feeds folded by >1 view are materialized
with one localCheckpoint). `SET matview.auto_refresh = true` rides the
post-DML commit hook: every INSERT/UPDATE/DELETE/MERGE on a versioned
sink folds its delta into the views based on (or dimmed on) that table,
keeping them query-consistent with no explicit REFRESH. OPTIMIZE /
RESTORE / VACUUM don't trigger the hook — their recorded changes are
folded by the next DML or an explicit REFRESH."""

import random

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.sinks import ParquetMergeSink


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


def _mk(spark, tmp_path, name):
    eng = Engine(spark, f"mvsr-{name}")
    sink = ParquetMergeSink(spark, str(tmp_path / f"{name}_t"), key="id")
    sink.ensure(
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(40)], "id long, g int, x double"
        )
    )
    eng.register_sink("t", sink)
    return eng, sink


QS = {
    "mv1": "SELECT g AS k, count(*) AS n FROM t GROUP BY g",
    "mv2": "SELECT g AS k, sum(x) AS s, avg(x) AS a FROM t GROUP BY g",
    "mv3": "SELECT count(*) AS n, min(x) AS lo FROM t",
}


class TestRefreshAllSharedFeed:
    def test_three_views_one_feed_read(self, spark, tmp_path, monkeypatch):
        eng, _ = _mk(spark, tmp_path, "share")
        for name, q in QS.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {name} AS {q}")
        eng.execute("INSERT INTO t (id, g, x) VALUES (100, 1, 9.0), (101, 5, 2.0)")
        eng.execute("DELETE FROM t WHERE id % 9 = 2")

        calls = []
        orig = Engine._table_changes_df
        monkeypatch.setattr(
            Engine,
            "_table_changes_df",
            lambda self, *a, **kw: calls.append(a) or orig(self, *a, **kw),
        )
        rep = eng.sql("REFRESH ALL MATERIALIZED VIEWS").collect()
        # the whole point: 3 views over one base plan the backlog ONCE
        assert len(calls) == 1, calls
        assert sorted(r["view"] for r in rep) == ["mv1", "mv2", "mv3"]
        assert all(r["mode"] == "incremental" for r in rep), rep
        for name, q in QS.items():
            assert _rows(eng, f"SELECT * FROM {name}") == _rows(eng, q), name

    def test_mixed_bases_read_once_each(self, spark, tmp_path, monkeypatch):
        eng, _ = _mk(spark, tmp_path, "mixed")
        dim = ParquetMergeSink(spark, str(tmp_path / "mixed_d"), key="g")
        dim.ensure(
            spark.createDataFrame([(k, f"n{k}") for k in range(4)], "g int, dname string")
        )
        eng.register_sink("d", dim)
        eng.execute("CREATE MATERIALIZED VIEW a1 AS SELECT g AS k, count(*) AS n FROM t GROUP BY g")
        eng.execute(
            "CREATE MATERIALIZED VIEW a2 AS "
            "SELECT d.dname AS k, sum(t.x) AS s FROM t JOIN d ON t.g = d.g GROUP BY d.dname"
        )
        eng.execute("INSERT INTO t (id, g, x) VALUES (200, 2, 4.0)")
        eng.execute("UPDATE d SET dname = 'zz' WHERE g = 1")

        calls = []
        orig = Engine._table_changes_df
        monkeypatch.setattr(
            Engine,
            "_table_changes_df",
            lambda self, *a, **kw: calls.append(a[0]) or orig(self, *a, **kw),
        )
        rep = eng.sql("REFRESH ALL MATERIALIZED VIEWS").collect()
        # t's feed is shared by a1+a2 (one read); d's feed is read once
        assert sorted(calls) == ["d", "t"], calls
        assert all(r["mode"] == "incremental" for r in rep), rep
        assert _rows(eng, "SELECT * FROM a1") == _rows(
            eng, "SELECT g AS k, count(*) AS n FROM t GROUP BY g"
        )
        assert _rows(eng, "SELECT * FROM a2") == _rows(
            eng,
            "SELECT d.dname AS k, sum(t.x) AS s FROM t JOIN d ON t.g = d.g GROUP BY d.dname",
        )

    def test_refresh_all_full_forces_recompute(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "full")
        eng.execute(f"CREATE MATERIALIZED VIEW mv1 AS {QS['mv1']}")
        eng.execute("INSERT INTO t (id, g, x) VALUES (300, 0, 1.0)")
        rep = eng.sql("REFRESH ALL MATERIALIZED VIEWS FULL").collect()
        assert [r["mode"] for r in rep] == ["full"]
        assert _rows(eng, "SELECT * FROM mv1") == _rows(eng, QS["mv1"])

    def test_refresh_all_caught_up_is_noop(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "noop")
        eng.execute(f"CREATE MATERIALIZED VIEW mv1 AS {QS['mv1']}")
        eng.execute(f"CREATE MATERIALIZED VIEW mv2 AS {QS['mv2']}")
        rep = eng.sql("REFRESH ALL MATERIALIZED VIEWS").collect()
        assert all(r["mode"] == "noop" for r in rep), rep


class TestAutoRefreshOnCommit:
    def test_dml_keeps_views_consistent_without_refresh(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "auto")
        for name, q in QS.items():
            eng.execute(f"CREATE MATERIALIZED VIEW {name} AS {q}")
        eng.execute("SET matview.auto_refresh = true")
        for stmt in (
            "INSERT INTO t (id, g, x) VALUES (400, 1, 3.0), (401, 6, 8.0)",
            "UPDATE t SET x = 42.0 WHERE id % 5 = 0",
            "DELETE FROM t WHERE id % 7 = 3",
        ):
            eng.execute(stmt)
            # consistent IMMEDIATELY after the commit — no REFRESH ran
            for name, q in QS.items():
                assert _rows(eng, f"SELECT * FROM {name}") == _rows(eng, q), (stmt, name)
            assert eng.mat_views["mv1"].base_version == max(sink.versions())

    def test_dim_commit_triggers_dependent_join_view(self, spark, tmp_path):
        eng, _ = _mk(spark, tmp_path, "autod")
        dim = ParquetMergeSink(spark, str(tmp_path / "autod_d"), key="g")
        dim.ensure(
            spark.createDataFrame([(k, f"n{k}") for k in range(4)], "g int, dname string")
        )
        eng.register_sink("d", dim)
        q = "SELECT d.dname AS k, count(*) AS n FROM t JOIN d ON t.g = d.g GROUP BY d.dname"
        eng.execute(f"CREATE MATERIALIZED VIEW jv AS {q}")
        eng.execute("SET matview.auto_refresh = true")
        eng.execute("UPDATE d SET dname = 'renamed' WHERE g = 2")
        assert _rows(eng, "SELECT * FROM jv") == _rows(eng, q)
        assert eng.mat_views["jv"].dim_version == max(dim.versions())

    def test_off_by_default_and_disableable(self, spark, tmp_path):
        eng, sink = _mk(spark, tmp_path, "off")
        eng.execute(f"CREATE MATERIALIZED VIEW mv1 AS {QS['mv1']}")
        v0 = eng.mat_views["mv1"].base_version
        eng.execute("INSERT INTO t (id, g, x) VALUES (500, 0, 1.0)")
        assert eng.mat_views["mv1"].base_version == v0  # stale: no hook
        eng.execute("SET matview.auto_refresh = 'off'")
        eng.execute("INSERT INTO t (id, g, x) VALUES (501, 0, 1.0)")
        assert eng.mat_views["mv1"].base_version == v0

    def test_auto_refresh_races_concurrent_writer(self, spark, tmp_path):
        """Chaos composition: a second PROCESS issues retrying MERGEs
        into the same warehouse while the main loop runs auto-refreshing
        DML. After every main-loop commit the view must equal the base
        AT THE VIEW'S PINNED VERSION (the writer may already have
        committed past it); at the end, one REFRESH ALL catches up and
        the view equals a live recompute."""
        import json
        import os
        import subprocess
        import sys

        from qlbridge_spark.sinks import ConcurrentWriteError

        rng = random.Random(20260829)
        path = str(tmp_path / "auto_mp")
        sink = ParquetMergeSink(spark, path, key="id")
        sink.ensure(
            spark.createDataFrame(
                [(i, i % 3, float(i)) for i in range(150)], "id long, p int, v double"
            )
        )
        eng = Engine(spark, "auto-mp")
        eng.register_sink("t", sink)
        q = "SELECT p AS k, count(*) AS n, sum(v) AS s FROM t GROUP BY p"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute("SET matview.auto_refresh = true")

        script = tmp_path / "merge_worker.py"
        script.write_text(_MERGE_WORKER)
        go = str(tmp_path / "GO")
        env = dict(os.environ, PYTHONPATH=os.getcwd())
        proc = subprocess.Popen(
            [sys.executable, str(script), path, "6", go],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
        )
        assert proc.stdout.readline().strip() == "READY"
        open(go, "w").close()

        next_id = 2000
        try:
            for step in range(6):
                op = rng.choice(["ins", "upd", "del"])
                if op == "ins":
                    stmt = f"INSERT INTO t (id, p, v) VALUES ({next_id}, {next_id % 3}, 7.0)"
                    next_id += 1
                elif op == "upd":
                    stmt = f"UPDATE t SET v = {float(step)} WHERE id % {rng.randint(3, 7)} = 0"
                else:
                    stmt = f"DELETE FROM t WHERE id % {rng.randint(8, 13)} = 3"
                while True:
                    try:
                        eng.execute(stmt)
                        break
                    except ConcurrentWriteError:
                        pass
                mv = eng.mat_views["mv"]
                pinned = sink.scan(spark, version=mv.base_version)
                from pyspark.sql import functions as F

                want = sorted(
                    tuple(r)
                    for r in pinned.groupBy(F.col("p").alias("k"))
                    .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
                    .collect()
                )
                got = sorted(tuple(r) for r in eng.sql("SELECT * FROM mv").collect())
                assert got == want, (step, stmt)
        finally:
            out, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, out
        json.loads(out.strip().splitlines()[-1])  # worker completed all merges

        rep = eng.sql("REFRESH ALL MATERIALIZED VIEWS").collect()
        assert rep[0]["mode"] in ("incremental", "noop"), rep
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)


_MERGE_WORKER = r"""
import json, os, sys, time
path, n_commits, go_file = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName("auto-merge-worker").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from qlbridge_spark import Engine
from qlbridge_spark.sinks import ConcurrentWriteError, ParquetMergeSink
eng = Engine(spark, "auto-w")
sink = ParquetMergeSink(spark, path, key="id")
eng.register_sink("t", sink)
print("READY", flush=True)
while not os.path.exists(go_file):
    time.sleep(0.02)
retries = 0
for i in range(n_commits):
    lo = (i * 37) % 150
    src = spark.createDataFrame(
        [(k, k % 3, float(-100 - i)) for k in range(lo, lo + 20)],
        "id long, p int, v double",
    )
    eng.register_df("src", src)
    stmt = ("MERGE INTO t USING src ON t.id = src.id "
            "WHEN MATCHED THEN UPDATE SET v = src.v "
            "WHEN NOT MATCHED THEN INSERT *")
    while True:
        try:
            eng.execute(stmt)
            break
        except ConcurrentWriteError:
            retries += 1
print(json.dumps({"retries": retries}), flush=True)
spark.stop()
"""
