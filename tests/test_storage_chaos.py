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
            ["ins", "upd", "del", "merge", "opt", "opt_scoped", "restore", "ow"]
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
