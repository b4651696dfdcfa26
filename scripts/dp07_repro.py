"""dp07 in-session rep-degradation reproduction harness (round 14).

Runs dp07_minhash_pairs N reps at a target SF dir with NO System.gc
between reps, recording per rep: wall seconds, JVM heap used, cumulative
GC time, block-manager local dir size/file count, and storage-memory
used. Prints one JSON line per rep plus a summary.

Usage: python scripts/dp07_repro.py [sf_dir] [reps] [--fix]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".testdata_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(4 << 20))
        .config("spark.sql.files.openCostInBytes", str(1 << 20))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .appName("dp07_repro")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    from qlbridge_spark.datapipe import release_caches

    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()

    def gc_time_ms() -> int:
        total = 0
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            total += beans.get(i).getCollectionTime()
        return total

    def blockmgr_stats() -> tuple[int, int]:
        # local dirs hold shuffle + spill + disk-store blocks
        base = None
        for root in ("/tmp",):
            try:
                names = [n for n in os.listdir(root) if n.startswith("blockmgr-")]
            except OSError:
                continue
            if names:
                base = [os.path.join(root, n) for n in names]
        if not base:
            return (0, 0)
        files = 0
        size = 0
        for b in base:
            for dirpath, _dirnames, filenames in os.walk(b):
                files += len(filenames)
                for fn in filenames:
                    try:
                        size += os.path.getsize(os.path.join(dirpath, fn))
                    except OSError:
                        pass
        return (files, size)

    qs = entrymod.queries()
    if os.environ.get("DP07_PRELOAD"):
        # replicate the mid-bench session state the r13 degradation was
        # observed in: run the whole headline list first (2 reps each, no
        # gc), so dp07 starts with an accumulated session
        preload = [
            "q01_pricing_summary", "q03_join_revenue", "q05_multi_join_revenue",
            "q06_range_agg", "q09_having", "q14_like_in", "q17_events_json",
            "q18_hourly_buckets", "dp02_fingerprint", "dp04_quality",
            "dp06_ann_topk",
        ]
        t0 = time.time()
        for name in preload:
            for _ in range(2):
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                release_caches()
        print(json.dumps({"preload_sec": round(time.time() - t0, 1)}), flush=True)

    q = qs["dp07_minhash_pairs"]
    # one untimed warmup (plan/codegen), same as bench.py
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_caches()

    runs = []
    for rep in range(reps):
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        release_caches()
        heap_used = int(rt.totalMemory() - rt.freeMemory())
        files, size = blockmgr_stats()
        rec = {
            "rep": rep,
            "sec": wall,
            "heap_used_mb": heap_used >> 20,
            "gc_ms_cum": gc_time_ms(),
            "blockmgr_files": files,
            "blockmgr_mb": size >> 20,
        }
        runs.append(rec)
        print(json.dumps(rec), flush=True)
    secs = [r["sec"] for r in runs]
    print(
        json.dumps(
            {
                "summary": "dp07_repro",
                "sf_dir": sf_dir,
                "reps": reps,
                "min": min(secs),
                "max": max(secs),
                "drift": round(max(secs) / min(secs), 2),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
