"""A/B the q03/q05 fact-join build side at $SPARK_GRAFT_SF_DIR.

Variants:
  A: engine as-is (static auto-broadcast: Spark picks the build side from
     column-pruned size estimates — currently broadcasts LINEITEM on q05)
  B: static autoBroadcastJoinThreshold=-1 with explicit dim hints + AQE
     runtime broadcast (adaptive threshold pinned to 10m): the fact is
     never statically broadcast-built; AQE may broadcast the runtime-small
     side after seeing real sizes

Each timed with the noop sink, min of N reps after one untimed warmup.
"""

from __future__ import annotations

import os
import sys
import time

REPS = int(os.environ.get("AB_REPS", "5"))


def bench(df, label, reps=REPS):
    df.write.format("noop").mode("overwrite").save()  # warm
    runs = []
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    print(f"{label}: min={min(runs)} runs={runs}", flush=True)
    return min(runs)


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
        .appName("ab_q05")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("q03_join_revenue", "q05_multi_join_revenue"):
        df = qs[name](spark, sf_dir)
        bench(df, f"A-static-bcast {name}")

    # variant B: same statements through a fresh engine with the static
    # threshold off; dims keep their explicit broadcast hints
    from qlbridge_spark import Engine

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", str(10 << 20))
    eng = Engine(spark, "ab_b")
    eng.load_parquet_dir(sf_dir)
    for name in ("q03_join_revenue", "q05_multi_join_revenue"):
        df = eng.sql(entrymod._Q[name])
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        print(f"B {name}: static plan joins:",
              "BHJ" if "BroadcastHashJoin" in plan else "",
              "SMJ" if "SortMergeJoin" in plan else "",
              "SHJ" if "ShuffledHashJoin" in plan else "", flush=True)
        bench(df, f"B-adaptive {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
