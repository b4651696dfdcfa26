"""Multi-process OCC torture test (r10 verdict directive #6).

Two SEPARATE engine processes MERGE into the same ParquetMergeSink
concurrently. The commit CAS is POSIX rename + flock, so cross-process
is the real isolation domain (the in-process tests in test_occ.py only
simulate conflicts). Assertions:

1. Every statement eventually lands exactly once (retry-on-conflict):
   final version == initial + total merges.
2. Serializability: every commit was base-pinned (its change rows were
   computed against its immediate predecessor), so replaying the
   recorded change feed from v0 IN VERSION ORDER reproduces the final
   snapshot exactly — the history equals a serial order.
3. No torn state: every version's change recording is present (loud
   CDF contract) and row counts stay consistent.
"""

import json
import os
import subprocess
import sys
import time

from qlbridge_spark import Engine
from qlbridge_spark.sinks import ParquetMergeSink

WORKER = r"""
import json, os, sys, time
path, wid, n_commits, go_file = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName(f"occ-worker-{wid}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from qlbridge_spark import Engine
from qlbridge_spark.sinks import ConcurrentWriteError, ParquetMergeSink
eng = Engine(spark, f"occ-w{wid}")
sink = ParquetMergeSink(spark, path, key="id")
eng.register_sink("t", sink)
print("READY", flush=True)
while not os.path.exists(go_file):
    time.sleep(0.02)
retries = 0
for i in range(n_commits):
    # overlapping keys across workers force genuine conflicts; the tag
    # records which (worker, statement) last wrote each row
    lo = (wid * 7 + i * 13) % 80
    src = spark.createDataFrame(
        [(k, wid * 1000 + i, f"w{wid}s{i}") for k in range(lo, lo + 25)],
        "id long, v long, tag string",
    )
    eng.register_df("src", src)
    stmt = ("MERGE INTO t USING src ON t.id = src.id "
            "WHEN MATCHED THEN UPDATE SET v = src.v, tag = src.tag "
            "WHEN NOT MATCHED THEN INSERT *")
    while True:
        try:
            eng.execute(stmt)
            break
        except ConcurrentWriteError:
            retries += 1
print(json.dumps({"wid": wid, "retries": retries}), flush=True)
spark.stop()
"""


def test_two_processes_merge_serializably(spark, tmp_path):
    n_commits = 10  # per worker → ≥20 interleaved commits total
    path = str(tmp_path / "occ_mp")
    sink = ParquetMergeSink(spark, path, key="id")
    sink.ensure(
        spark.createDataFrame(
            [(i, 0, "init") for i in range(100)], "id long, v long, tag string"
        ).repartitionByRange(4, "id")
    )
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    go = str(tmp_path / "GO")
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), path, str(w), str(n_commits), go],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
        )
        for w in (1, 2)
    ]
    # release both workers only once both sessions are up, so the merge
    # windows genuinely interleave
    ready = 0
    deadline = time.time() + 300
    outs = ["", ""]
    for idx, p in enumerate(procs):
        line = p.stdout.readline()
        assert line.strip() == "READY", line
        ready += 1
    open(go, "w").close()
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=max(10, deadline - time.time()))
        assert p.returncode == 0, out
        results.append(json.loads(out.strip().splitlines()[-1]))
    total_retries = sum(r["retries"] for r in results)

    # 1. exactly one commit per statement
    assert sink._version() == 2 * n_commits, (sink._version(), results)

    # 2. serializability: replay the recorded change feed from v0 —
    #    the fold must reproduce the final snapshot row-for-row
    eng = Engine(spark, "occ-mp-verify")
    eng.register_sink("t", sink)
    changes = (
        eng.sql(f"SELECT * FROM TABLE_CHANGES('t', 0, {sink._version()})")
        .collect()
    )
    state = {}
    for r in sorted(changes, key=lambda r: (r._commit_version,)):
        if r._change_type in ("insert", "update_postimage"):
            state[r.id] = (r.v, r.tag)
        elif r._change_type == "delete":
            state.pop(r.id, None)
        # update_preimage carries the old row; the postimage applies it
    final = {r.id: (r.v, r.tag) for r in sink.scan(spark).collect()}
    assert state == final

    # 3. every commit recorded its changes (loud-CDF contract held under
    #    cross-process contention), and the tag of every row names a real
    #    (worker, statement) writer or the initial load
    for v in range(1, sink._version() + 1):
        assert sink.recorded_changes(spark, v) is not None, v
    assert all(t == "init" or t[0] == "w" for _, t in final.values())
    # sanity: contention actually happened (both workers overlap keys);
    # zero retries across 20 racing commits would mean no interleaving
    assert total_retries >= 1, results
