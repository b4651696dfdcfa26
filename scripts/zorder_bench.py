"""Measured Z-order data-skipping study (round 10) — does the OPTIMIZE
ZORDER BY layout actually prune scans, and by how much, vs a natural
layout and vs a single-column sort?

Method: write the sf-dir lineitem three ways —
  natural   : as loaded (hash-partitioned, no clustering)
  sorted    : repartitionByRange + sort on l_orderkey only (the classic
              single-column layout: perfect on the sort key, useless on
              everything else)
  zordered  : datapipe.zorder.cluster_frame on (l_orderkey, l_partkey)
— each into the same number of files, then run selective equality/range
filters on BOTH columns against each layout and record (a) files whose
min/max stats could contain the predicate (static footer pruning), and
(b) wall time of the filtered scan, min-of-3.

Run:  python scripts/zorder_bench.py [sf_dir]  (default /root/testdata/sf0.1)
Writes a markdown-ish report to stdout; paste into ZORDER_r10.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_FILES = 16
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(N_FILES))
    .config("spark.ui.enabled", "false")
    .appName("zorder_bench")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from qlbridge_spark.datapipe.zorder import cluster_frame  # noqa: E402
from qlbridge_spark.engine import read_parquet  # noqa: E402

li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
base = "/tmp/zorder_bench"
layouts = {
    "natural": lambda df: df.repartition(N_FILES),
    "sorted_okey": lambda df: df.repartitionByRange(N_FILES, "l_orderkey").sortWithinPartitions("l_orderkey"),
    "zorder_okey_pkey": lambda df: cluster_frame(df, ["l_orderkey", "l_partkey"], N_FILES),
    "hilbert_okey_pkey": lambda df: cluster_frame(
        df, ["l_orderkey", "l_partkey"], N_FILES, curve="hilbert"
    ),
}
for name, fn in layouts.items():
    path = f"{base}/{name}"
    if not os.path.exists(path):
        fn(li).write.mode("overwrite").parquet(path)

okey_mid = li.approxQuantile("l_orderkey", [0.5], 0.01)[0]
pkey_mid = li.approxQuantile("l_partkey", [0.5], 0.01)[0]
preds = {
    "okey_point": F.col("l_orderkey") == int(okey_mid),
    "okey_range_1pct": F.col("l_orderkey").between(int(okey_mid), int(okey_mid * 1.02)),
    "pkey_point": F.col("l_partkey") == int(pkey_mid),
    "pkey_range_1pct": F.col("l_partkey").between(int(pkey_mid), int(pkey_mid * 1.02)),
}


def files_matching(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files) from
    parquet footers — the static stats a scan can skip with."""
    import pyarrow.parquet as pq

    hit = total = 0
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit, total


def timed_count(path: str, pred) -> tuple[float, int]:
    best, n = float("inf"), -1
    for _ in range(3):
        t0 = time.time()
        n = spark.read.parquet(path).filter(pred).select(F.sum("l_quantity")).collect()[0][0]
        best = min(best, time.time() - t0)
    return best, n


bounds = {
    "okey_point": ("l_orderkey", int(okey_mid), int(okey_mid)),
    "okey_range_1pct": ("l_orderkey", int(okey_mid), int(okey_mid * 1.02)),
    "pkey_point": ("l_partkey", int(pkey_mid), int(pkey_mid)),
    "pkey_range_1pct": ("l_partkey", int(pkey_mid), int(pkey_mid * 1.02)),
}

report = {}
print(f"## Z-order data-skipping study — {sf_dir}, {N_FILES} files/layout\n")
print("| predicate | layout | files hit | sec (min-of-3) | result |")
print("|---|---|---|---|---|")
for pname, pred in preds.items():
    col, lo, hi = bounds[pname]
    for lname in layouts:
        path = f"{base}/{lname}"
        hit, total = files_matching(path, col, lo, hi)
        sec, val = timed_count(path, pred)
        report[f"{pname}/{lname}"] = {"files_hit": hit, "files_total": total, "sec": round(sec, 4)}
        print(f"| {pname} | {lname} | {hit}/{total} | {sec:.4f} | {val} |")
print()
print(json.dumps(report))
