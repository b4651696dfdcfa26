"""dp07 band/row retuning study (r14 verdict directive #6).

Question: dp07's 10x-data wall ratio is ~5x — is that a plan defect a
band retune can fix, or is it lower-bounded by the candidate-pair count
(which grows ~quadratically in the sf1 corpus because make_sf1's salted
copies form cross-copy near-cliques)?

Method: at each SF, run the full two-phase pipeline (grams -> sigs ->
LSH candidates -> exact-Jaccard verify) for several (num_hashes, bands)
configs, recording wall (min of REPS), candidate count, verified-pair
count, and recall vs the recall-lossless reference (bands=num_hashes=32,
r=1 — miss prob <= 2^-32 per true pair at j>=0.5).

Per-config miss probability for a true pair at similarity j with r rows
per band and b bands: (1 - j^r)^b. At the corpus's weakest observed
true-pair similarity j~=0.89:
  r=2 b=16: ~1e-11   r=3 b=10: ~5e-6   r=4 b=8: ~3.7e-4
At sf1's ~250k true pairs r=4 expects ~90 misses (out of budget), r=3
~1.3 (borderline), r=2 effectively 0 (the shipped config).

Usage: python scripts/dp07_band_study.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 .testdata_sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3
CONFIGS = [
    {"num_hashes": 32, "bands": 32},  # r=1: lossless reference
    {"num_hashes": 32, "bands": 16},  # r=2: shipped
    {"num_hashes": 30, "bands": 10},  # r=3
    {"num_hashes": 32, "bands": 8},   # r=4
]
# At sf1 the r=1 reference's candidate set explodes (the salted-copy
# corpus makes every 10-doc copy family one giant bucket per band ×32
# bands → heap death on a 32-thread local box); r=2's sf1 output is
# already adjudicated exact-minus-2-boundary-misses by the oracle
# sweep (BENCH_SF1_r14.md), so it serves as the recall reference there.
BIG_CONFIGS = CONFIGS[1:]


def main() -> int:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(4 << 20))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("dp07_band_study")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from qlbridge_spark.datapipe import lsh_jaccard_pairs, lsh_jaccard_stats, release_caches

    import __spark_entry__ as entry

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".testdata_sf1"]
    out: dict = {}
    for sf_dir in dirs:
        docs = entry._docs(spark, sf_dir)
        ref_pairs = None
        recs = []
        cfgs = BIG_CONFIGS if "sf1" in sf_dir else CONFIGS
        for cfg in cfgs:
            release_caches()
            # counts first (also warms codegen for this config's shape)
            stats = lsh_jaccard_stats(
                docs, "doc_id", "text", threshold=0.5,
                shingle_size=3, bucket_cap=None, **cfg,
            )
            release_caches()
            runs = []
            for _ in range(REPS):
                t0 = time.time()
                lsh_jaccard_pairs(
                    docs, "doc_id", "text", threshold=0.5,
                    shingle_size=3, bucket_cap=None, **cfg,
                ).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
                release_caches()
            rec = dict(cfg, wall_min=min(runs), wall_runs=runs, **stats)
            if ref_pairs is None:
                ref_pairs = stats["pairs"]
            rec["missed_vs_lossless"] = ref_pairs - stats["pairs"]
            recs.append(rec)
            print(json.dumps({"sf_dir": sf_dir, **rec}), flush=True)
        out[sf_dir] = recs
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
