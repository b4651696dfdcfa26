"""Reproducible dataset reads + amortized parameter sweeps (round-8 APIs).

The operational loop of a training-data pipeline:

1. Curate into a VERSIONED table (ParquetMergeSink — MERGE semantics,
   snapshot-and-swap, no extra dependency; swap in DeltaMergeSink on a
   real lakehouse).
2. Keep the BEST representative per near-dup cluster (dedup_keep_best),
   not an arbitrary one.
3. Pin the exact snapshot a training job reads (`VERSION AS OF` /
   `TIMESTAMP AS OF`) so a re-run sees identical data no matter what
   merged since; `DESCRIBE HISTORY` shows what can be pinned.
4. Sweep a parameterized quality threshold with `Engine.prepare` — parse
   once, bind per execution; the uncorrelated aggregate subquery folds
   ONCE (plan-time job) and is reused across all binds.

Run:  python examples/reproducible_runs.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from qlbridge_spark import Engine
    from qlbridge_spark.datapipe import dedup_keep_best, lsh_jaccard_pairs
    from qlbridge_spark.sinks import ParquetMergeSink

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("reproducible_runs")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)
    eng.load_parquet_dir(sf_dir)

    # 1+2: curate — near-dup clusters keep their longest member
    docs = eng.table("documents").select("doc_id", "text").withColumn(
        "qlen", F.length("text").cast("long")
    )
    pairs = lsh_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, num_hashes=32, bands=16)
    curated = dedup_keep_best(docs, "doc_id", pairs, "qlen")

    table_dir = os.path.join(tempfile.mkdtemp(), "corpus")
    sink = ParquetMergeSink(spark, table_dir, key="doc_id")
    sink.ensure(curated)
    eng.register_sink("corpus", sink)
    v0 = eng.sql("SELECT count(*) AS n FROM corpus").collect()[0]["n"]
    print(f"curated corpus v0: {v0} docs (of {docs.count()})")

    # a later ingestion merges more docs — v1
    eng.execute('UPSERT INTO corpus (doc_id, text, qlen) VALUES (999901, "new doc about spark", 19)')
    print("history:", [(r.version, r.is_current) for r in eng.sql("DESCRIBE HISTORY corpus").collect()])

    # 3: the training job pinned v0 — identical read after the merge
    pinned = eng.sql("SELECT count(*) AS n FROM corpus VERSION AS OF 0").collect()[0]["n"]
    cur = eng.sql("SELECT count(*) AS n FROM corpus").collect()[0]["n"]
    print(f"pinned v0 read: {pinned} rows (current: {cur})")
    assert pinned == v0 and cur == v0 + 1

    # 4: parameterized sweep — the avg-length subquery folds once and is
    # reused across binds. Round 9: this works on the SAME engine that
    # holds the versioned sink — fold/plan caches key on sink VERSIONS
    # (a commit to `corpus` would invalidate them), they are no longer
    # disabled outright by a sink's presence.
    ps = eng.prepare(
        "SELECT count(*) AS n FROM documents "
        "WHERE length(text) >= ? AND length(text) < (SELECT 2 * avg(length(text)) FROM documents)"
    )
    for floor in (0, 50, 200, 500):
        print(f"  docs with {floor} <= len < 2*avg:", ps.sql(floor).collect()[0]["n"])
    st = eng.plan_cache_stats
    print(f"fold jobs: {st['fold_misses']} (reused {st['fold_hits']}x)")
    assert st["fold_misses"] == 1 and st["fold_hits"] == 3

    # 5 (round 9): operational rollback + retention — RESTORE commits the
    # old snapshot as a NEW version (history preserved), VACUUM bounds
    # disk growth once old pins are no longer needed.
    restored_v = eng.execute("RESTORE TABLE corpus TO VERSION AS OF 0")
    assert eng.sql("SELECT count(*) AS n FROM corpus").collect()[0]["n"] == v0
    print(f"restored to v0 as new version v{restored_v};",
          "history:", [r.version for r in eng.sql("DESCRIBE HISTORY corpus").collect()])
    dropped = eng.execute("VACUUM corpus RETAIN 1 VERSIONS")
    print(f"vacuum dropped {dropped} old version(s)")

    spark.stop()


if __name__ == "__main__":
    main()
