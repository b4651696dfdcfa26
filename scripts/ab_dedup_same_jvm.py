"""Same-JVM alternating A/B of lsh_jaccard_pairs: HEAD's dedup module vs
a second dedup.py loaded from another tree (default /tmp/pre_dedup).

Alternating reps inside ONE Spark session cancel fresh-JVM variance
(JIT, heap sizing, page cache) that swamps a 20% effect across
processes. Prints one JSON line with per-variant runs.

Usage: python scripts/ab_dedup_same_jvm.py [other_tree] [pairs_per_variant]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

OTHERS = (sys.argv[1] if len(sys.argv) > 1 else "/tmp/pre_dedup").split(",")
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(4 << 20))
        .config("spark.sql.files.openCostInBytes", str(1 << 20))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("ab_dedup_same_jvm")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mods = {"a": load_module(os.path.join(root, "qlbridge_spark", "datapipe", "dedup.py"), "dedup_a")}
    for i, other in enumerate(OTHERS):
        key = chr(ord("b") + i)
        mods[key] = load_module(os.path.join(other, "qlbridge_spark", "datapipe", "dedup.py"), f"dedup_{key}")

    def run(mod):
        out = mod.lsh_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, num_hashes=32, bands=16
        ).select(
            "id_a", "id_b", F.floor(F.col("jaccard") * 10000).cast("long").alias("j_x1e4")
        )
        out.write.format("noop").mode("overwrite").save()
        mod.release_caches()

    # warm every variant (codegen compile, page cache) untimed
    for mod in mods.values():
        run(mod)

    runs = {k: [] for k in mods}
    for _ in range(N):
        for key, mod in mods.items():
            t0 = time.time()
            run(mod)
            runs[key].append(round(time.time() - t0, 3))
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    stat = {
        k: {"min": min(v), "median": sorted(v)[len(v) // 2], "runs": v} for k, v in runs.items()
    }
    stat["load1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(stat), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
