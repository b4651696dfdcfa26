"""Focused A/B timer for the dedup/similarity bench entries.

Usage: python scripts/ab_dedup.py <repo_root> [entry ...]
Times each entry with the bench methodology (noop sink, one untimed
warmup, min-of-N reps, release_caches between reps) against
$SPARK_GRAFT_SF_DIR. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.abspath(sys.argv[1])
ENTRIES = sys.argv[2:] or ["dp07_minhash_pairs", "dp06_ann_topk", "dp04_quality", "dp20_dedup_keep_best"]
REPS = int(os.environ.get("AB_REPS", "7"))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(4 << 20))
        .config("spark.sql.files.openCostInBytes", str(1 << 20))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("ab_dedup")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entrymod

    from qlbridge_spark.datapipe import release_caches

    qs = entrymod.queries()
    out = {"root": ROOT, "reps": REPS, "load1": round(os.getloadavg()[0], 2)}
    for name in ENTRIES:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        release_caches()
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            release_caches()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        out[name] = {"min": min(runs), "runs": runs}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
