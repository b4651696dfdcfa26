"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query executes to completion via the no-op writer (full scan +
compute + shuffle, no driver collect cost). AQE on; shuffle partitions
sized for local mode.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # local-bench scan sizing: the SF inputs are single small files; a
        # lower split size gives #scan-tasks ≈ cores. (At real scale the
        # 128MB default is right — files are many and large.)
        .config("spark.sql.files.maxPartitionBytes", str(4 << 20))
        .config("spark.sql.files.openCostInBytes", str(1 << 20))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .appName("qlbridge_spark_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    bench_names = [
        # core SQL engine (scan/filter/join/agg/sort shapes)
        "q01_pricing_summary",
        "q03_join_revenue",
        "q05_multi_join_revenue",
        "q06_range_agg",
        "q09_having",
        "q14_like_in",
        "q17_events_json",
        "q18_hourly_buckets",
        # datapipe extensions
        "dp02_fingerprint",
        "dp04_quality",
        "dp06_ann_topk",
        "dp07_minhash_pairs",
    ]

    # Warm-up: run every benched query once at the smallest SF so Catalyst
    # analysis + whole-stage codegen compile outside the timed region —
    # matching the reference's go-test-bench steady-state methodology
    # (BASELINE.md numbers are post-warmup ns/op). Generated code is cached
    # by shape, so the target-SF run reuses it.
    qs["q20_literal"](spark, sf_dir).collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in bench_names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warm-up is best-effort

    times: dict[str, float] = {}
    for name in bench_names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
