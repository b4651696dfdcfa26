"""Interleaved same-JVM A/B for the q03/q05 fact-join build side.

A: static autoBroadcastJoinThreshold=10m (engine as-is; Spark statically
   broadcast-builds whichever side's scan estimate fits — on q05 that is
   the pruned LINEITEM fact).
B: static threshold -1 + AQE runtime broadcast (adaptive threshold 10m):
   dims still broadcast via their explicit hints; fact-fact joins plan as
   shuffle joins and AQE broadcast-converts the runtime-small side.

The static threshold is session conf read at PLAN time, so each rep sets
the conf, rebuilds the DataFrame through the engine, and times the noop
write — strict A/B/A/B alternation in one JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

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
        .appName("ab_q05_interleaved")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    MODES = {
        "A": {"spark.sql.autoBroadcastJoinThreshold": str(10 << 20),
              "spark.sql.adaptive.autoBroadcastJoinThreshold": str(10 << 20)},
        "B": {"spark.sql.autoBroadcastJoinThreshold": "-1",
              "spark.sql.adaptive.autoBroadcastJoinThreshold": str(10 << 20)},
    }

    def set_mode(m):
        for k, v in MODES[m].items():
            spark.conf.set(k, v)

    out = {}
    for name in ("q03_join_revenue", "q05_multi_join_revenue"):
        for m in ("A", "B"):  # warm both modes untimed
            set_mode(m)
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = {"A": [], "B": []}
        for _ in range(REPS):
            for m in ("A", "B"):
                set_mode(m)
                df = qs[name](spark, sf_dir)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                runs[m].append(round(time.time() - t0, 3))
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
        out[name] = {
            m: {"min": min(v), "median": sorted(v)[len(v) // 2], "runs": v}
            for m, v in runs.items()
        }
    out["load1"] = round(os.getloadavg()[0], 2)
    set_mode("A")
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
