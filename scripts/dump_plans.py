"""Dump .explain('formatted') for every benched query (plus any extras
named on the command line) into plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<tag>.txt
(default r17).

Usage: python scripts/dump_plans.py <tag> [name ...]
(plan-only: no jobs run except engine registration + plan-time folds)
"""

from __future__ import annotations

import os
import sys

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2:]

BENCH = [
    "q01_pricing_summary",
    "q03_join_revenue",
    "q05_multi_join_revenue",
    "q06_range_agg",
    "q09_having",
    "q14_like_in",
    "q17_events_json",
    "q18_hourly_buckets",
    "dp02_fingerprint",
    "dp04_quality",
    "dp06_ann_topk",
    "dp07_minhash_pairs",
]


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
        .config("spark.ui.enabled", "false")
        .appName("plan_dump")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = ONLY or BENCH
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(plan)
        ex = plan.count("Exchange")
        py = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
        print(f"{name}: exchanges={ex} python={py} -> {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
