"""Storage-layer chaos differential.

Randomized interleaving of every mutation class the versioned sink
supports — INSERT / UPDATE / DELETE / MERGE / OPTIMIZE (plain, scoped,
ZORDER) / RESTORE / bare OVERWRITE, with auto-compaction enabled half
the time — against a driver-side Python model. After EVERY step:

1. the table equals the model (content correctness under any commit
   interleaving, COW or full);
2. replaying the change feed from version 0 reproduces the table
   (recording/diff parity — layout commits must contribute nothing,
   logical commits exactly their rows);
3. a randomly chosen EARLIER version still reads its frozen content
   (time travel is immutable under later COW commits that hardlink its
   files into new snapshots).

This is the single test that would have caught a whole class of
storage bugs at once: a COW commit dropping linked rows, a layout
commit leaking change rows, a restore clobbering history, a stale
sidecar pruning a live file.
"""

import random

import pytest
from pyspark.sql import functions as F

from qlbridge_spark import Engine
from qlbridge_spark.sinks import ParquetMergeSink


def _table_state(df):
    return {r.id: (r.p, r.v) for r in df.collect()}


def _replay(eng, upto):
    rows = eng.sql(f"SELECT * FROM TABLE_CHANGES('t', 0, {upto})").collect()
    state = {}
    for r in sorted(rows, key=lambda r: r._commit_version):
        if r._change_type in ("insert", "update_postimage"):
            state[r.id] = (r.p, r.v)
        elif r._change_type == "delete":
            state.pop(r.id, None)
    return state


@pytest.mark.parametrize(
    "partitioned,auto_compact,clustered",
    [(False, False, False), (True, True, False), (False, True, True)],
)
def test_randomized_storage_chaos(spark, tmp_path, partitioned, auto_compact, clustered):
    rng = random.Random(20260815 + int(partitioned) + 2 * int(clustered))
    name = f"chaos_{int(partitioned)}_{int(auto_compact)}_{int(clustered)}"
    sink = ParquetMergeSink(
        spark,
        str(tmp_path / name),
        key="id",
        partition_by=["p"] if partitioned else None,
        cluster_by=["id", "v"] if clustered else None,
    )
    rows = [(i, i % 3, float(i)) for i in range(200)]
    sink.ensure(
        spark.createDataFrame(rows, "id long, p int, v double").repartitionByRange(4, "id")
    )
    eng = Engine(spark, f"chaos-{name}")
    eng.register_sink("t", sink)
    if auto_compact:
        eng.execute("SET optimize.auto_compact = true")
        eng.execute("SET optimize.auto_compact_min_files = 8")

    model = {i: (i % 3, float(i)) for i in range(200)}
    # model snapshot per committed version (for time travel + restore)
    history = {0: dict(model)}

    def snap_all_versions():
        # fill history for versions created since last step (auto-compact
        # and OPTIMIZE commits are layout-only: same model)
        cur = sink._version()
        for v in range(max(history) + 1, cur + 1):
            history[v] = dict(model)

    next_id = 1000
    for step in range(14):
        op = rng.choice(
            ["ins", "upd", "del", "merge", "ups", "opt", "opt_scoped", "restore", "ow"]
        )
        if op == "ins":
            k = rng.randint(1, 4)
            vals = ", ".join(
                f"({next_id + j}, {(next_id + j) % 3}, {float(j)})" for j in range(k)
            )
            eng.execute(f"INSERT INTO t (id, p, v) VALUES {vals}")
            for j in range(k):
                model[next_id + j] = ((next_id + j) % 3, float(j))
            next_id += k
        elif op == "upd":
            m, val = rng.randint(2, 7), float(rng.randint(0, 99))
            n = eng.execute(f"UPDATE t SET v = {val} WHERE id % {m} = 1")
            want = [i for i in model if i % m == 1]
            assert n == len(want), (step, n, len(want))
            for i in want:
                model[i] = (model[i][0], val)
        elif op == "del":
            m = rng.randint(5, 11)
            n = eng.execute(f"DELETE FROM t WHERE id % {m} = 2")
            want = [i for i in list(model) if i % m == 2]
            assert n == len(want), (step, n, len(want))
            for i in want:
                del model[i]
        elif op == "merge":
            ids = rng.sample(sorted(model), k=min(3, len(model))) + [next_id]
            src = spark.createDataFrame(
                [(i, i % 3, -1.0) for i in ids], "id long, p int, v double"
            )
            eng.register_df("src", src)
            eng.execute(
                "MERGE INTO t USING src ON t.id = src.id "
                "WHEN MATCHED THEN UPDATE SET v = src.v "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            for i in ids:
                model[i] = (i % 3, -1.0)
            next_id += 1
        elif op == "ups":
            # UPSERT statement → sink.merge_upsert (whole-row replace /
            # insert; x = x upserts must emit NO change rows)
            existing = rng.sample(sorted(model), k=min(2, len(model)))
            same = existing[0] if existing else None  # re-upsert unchanged
            writes = {}
            for i in existing:
                pp = model[i][0]
                vv = model[i][1] if i == same else float(step + 50)
                writes[i] = (pp, vv)
            writes[next_id] = (next_id % 3, float(step + 50))
            vals = ", ".join(f"({i}, {pp}, {vv})" for i, (pp, vv) in writes.items())
            eng.execute(f"UPSERT INTO t (id, p, v) VALUES {vals}")
            model.update(writes)
            next_id += 1
        elif op == "opt":
            eng.execute("SET optimize.target_file_mb = 1")
            if rng.random() < 0.5:
                eng.execute("OPTIMIZE t ZORDER BY (id, v)")
            else:
                eng.execute("OPTIMIZE t")
        elif op == "opt_scoped":
            eng.execute("SET optimize.target_file_mb = 1")
            eng.execute("OPTIMIZE t WHERE p = 1 ZORDER BY (id)")
        elif op == "restore":
            cur = sink._version()
            target = rng.randint(0, cur)
            eng.execute(f"RESTORE TABLE t TO VERSION AS OF {target}")
            model = dict(history[target])
        else:  # ow: bare overwrite (CREATE OR REPLACE path) — keeps a
            # random half of the current rows, perturbs their values
            keep = {
                i: (pp, vv + 1000.0)
                for i, (pp, vv) in model.items()
                if rng.random() < 0.5
            } or {0: (0, 0.0)}
            sink.overwrite(
                spark.createDataFrame(
                    [(i, pp, vv) for i, (pp, vv) in keep.items()],
                    "id long, p int, v double",
                )
            )
            model = dict(keep)
        snap_all_versions()

        # 1. table equals the model
        got = _table_state(sink.scan(spark))
        assert got == model, (step, op)
        # 2. change-feed replay reproduces the table
        assert _replay(eng, sink._version()) == model, (step, op)
        # 3. a random earlier version still reads its frozen content
        v = rng.randint(0, sink._version())
        assert _table_state(sink.scan(spark, version=v)) == history[v], (step, op, v)

    # 4. the feed is universally O(changes): EVERY commit in this run —
    # DML, MERGE, OPTIMIZE, auto-compact, overwrite, restore — left a
    # change recording; the O(|base|) snapshot-diff fallback never fires
    kinds = {v: sink.recording_kind(v) for v in range(0, sink._version() + 1)}
    assert all(k != "none" for k in kinds.values()), kinds


_MERGE_WORKER = r"""
import json, os, sys, time
path, n_commits, go_file = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName("chaos-merge-worker").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from qlbridge_spark import Engine
from qlbridge_spark.sinks import ConcurrentWriteError, ParquetMergeSink
eng = Engine(spark, "chaos-w")
sink = ParquetMergeSink(spark, path, key="id")
eng.register_sink("t", sink)
print("READY", flush=True)
while not os.path.exists(go_file):
    time.sleep(0.02)
retries = 0
for i in range(n_commits):
    lo = (i * 37) % 150  # overlaps the chaos loop's id range
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


def test_concurrent_writer_storage_chaos(spark, tmp_path):
    """Directive: compose the chaos loop with a SECOND PROCESS issuing
    MERGEs against the same warehouse. No driver-side model is possible
    (the interleaving is nondeterministic), so the assertions are the
    serializability invariants themselves:

    1. every commit is base-pinned, so folding the change feed up to ANY
       retained version reproduces that version's snapshot exactly — the
       history equals a serial order at every prefix;
    2. every commit left a change recording (the loud-CDF contract held
       under cross-process contention, including RESTORE's inverted-
       window recording racing foreign commits);
    3. both processes complete every statement exactly once (version
       arithmetic: each committed statement bumps by exactly 1)."""
    import json
    import os
    import subprocess
    import sys

    from qlbridge_spark.sinks import ConcurrentWriteError

    rng = random.Random(20260818)
    path = str(tmp_path / "chaos_mp")
    sink = ParquetMergeSink(spark, path, key="id")
    sink.ensure(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(150)], "id long, p int, v double"
        ).repartitionByRange(4, "id")
    )
    eng = Engine(spark, "chaos-mp")
    eng.register_sink("t", sink)

    n_worker = 8
    script = tmp_path / "merge_worker.py"
    script.write_text(_MERGE_WORKER)
    go = str(tmp_path / "GO")
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    proc = subprocess.Popen(
        [sys.executable, str(script), path, str(n_worker), go],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    assert proc.stdout.readline().strip() == "READY"
    open(go, "w").close()

    next_id, main_commits, main_retries = 2000, 0, 0
    for step in range(10):
        op = rng.choice(["ins", "upd", "del", "opt", "restore"])
        if op == "ins":
            stmt = f"INSERT INTO t (id, p, v) VALUES ({next_id}, {next_id % 3}, 7.0)"
            next_id += 1
        elif op == "upd":
            stmt = f"UPDATE t SET v = {float(step)} WHERE id % {rng.randint(3, 7)} = 0"
        elif op == "del":
            stmt = f"DELETE FROM t WHERE id % {rng.randint(8, 13)} = 3"
        elif op == "opt":
            eng.execute("SET optimize.target_file_mb = 1")
            stmt = "OPTIMIZE t" if rng.random() < 0.5 else "OPTIMIZE t ZORDER BY (id)"
        else:
            stmt = f"RESTORE TABLE t TO VERSION AS OF {rng.randint(0, sink._version())}"
        while True:
            try:
                eng.execute(stmt)
                break
            except ConcurrentWriteError:
                main_retries += 1
        if op != "opt" or sink.last_commit.get("mode") != "noop":
            main_commits += 1

    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out
    worker = json.loads(out.strip().splitlines()[-1])

    # 3. exactly-once: every committed statement bumped by exactly 1.
    # (an OPTIMIZE losing a race retries into a later base — it may then
    # find nothing to compact and no-op, so allow that slack)
    assert sink._version() <= main_commits + n_worker
    assert sink._version() >= n_worker

    # 2. every commit recorded its changes — the feed never needs the
    # O(base) snapshot-diff fallback, even for restores under contention
    kinds = {v: sink.recording_kind(v) for v in range(0, sink._version() + 1)}
    assert all(k != "none" for k in kinds.values()), kinds

    # 1. serial-order equality at EVERY retained prefix: fold the feed
    # up to v and compare against the snapshot at v
    final_v = sink._version()
    rows = eng.sql(f"SELECT * FROM TABLE_CHANGES('t', 0, {final_v})").collect()
    state: dict = {}
    by_version: dict[int, list] = {}
    for r in rows:
        by_version.setdefault(r._commit_version, []).append(r)
    for v in range(0, final_v + 1):
        for r in by_version.get(v, []):
            if r._change_type in ("insert", "update_postimage"):
                state[r.id] = (r.p, r.v)
            elif r._change_type == "delete":
                state.pop(r.id, None)
        if v in (0, final_v) or v % 3 == 0:  # spot prefixes + endpoints
            assert state == _table_state(sink.scan(spark, version=v)), v
