"""Generate a ~10× scale dataset (sf≈1.0, ~6M lineitem rows) from the
driver's sf0.1 parquet, for LOCAL scale-proof benching only.

The driver provides sf∈{0.001, 0.01, 0.1}; the round-3/6 verdicts asked
for evidence that the headline plans scale sub-linearly to 10× the bench
size. This derives sf1.0 deterministically by unioning 10 KEY-SHIFTED
copies of sf0.1:

- fact/dim keys shift by copy_index × (max_key+1) so referential joins
  (lineitem→orders→customer, lineitem→part/supplier) stay intact and key
  cardinality scales 10× (same per-key row counts → no artificial skew);
- nation/region stay as-is (true dims — at 100 TB these would still be
  broadcast);
- documents get a per-copy salt token appended to ``text`` so MinHash
  near-dup structure REPLICATES (≈10× pairs) instead of exploding into
  10-cliques of identical copies;
- events/embeddings shift ids only (value distributions are what the
  operators see).

Output: ``<repo>/.testdata_sf1/*.parquet`` (gitignored — derived data).
Usage: python scripts/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import time

COPIES = 10
SRC = "/root/testdata/sf0.1"


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".testdata_sf1"
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("make_sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from qlbridge_spark.engine import read_parquet

    t0 = time.time()
    src = {t: read_parquet(spark, f"{SRC}/{t}.parquet") for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    )}
    # key strides: max+1 per keyed table (collect of 1-row aggs — tiny)
    stride = {}
    for t, k in (("orders", "o_orderkey"), ("customer", "c_custkey"), ("part", "p_partkey"),
                 ("supplier", "s_suppkey"), ("events", "event_id"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")):
        stride[t] = src[t].agg(F.max(k)).collect()[0][0] + 1

    def shifted(df, shifts: dict[str, str], i: int, extra=None):
        out = df
        for col, table in shifts.items():
            out = out.withColumn(col, (F.col(col) + F.lit(i * stride[table])).cast("long"))
        if extra is not None:
            out = extra(out, i)
        return out

    plans = {
        "region": (src["region"], {}),
        "nation": (src["nation"], {}),
        "customer": (src["customer"], {"c_custkey": "customer"}),
        "supplier": (src["supplier"], {"s_suppkey": "supplier"}),
        "part": (src["part"], {"p_partkey": "part"}),
        "orders": (src["orders"], {"o_orderkey": "orders", "o_custkey": "customer"}),
        "lineitem": (src["lineitem"], {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"}),
        "events": (src["events"], {"event_id": "events"}),
        "embeddings": (src["embeddings"], {"vec_id": "embeddings"}),
        "documents": (src["documents"], {"doc_id": "documents"}),
    }

    def doc_salt(df, i):
        if i == 0:
            return df
        # distinct shingle tail per copy → cross-copy pairs vanish,
        # within-copy near-dup structure preserved
        return df.withColumn("text", F.concat(F.col("text"), F.lit(f" sfcopysalt{i} tokenpad{i}")))

    os.makedirs(out_dir, exist_ok=True)
    for name, (df, shifts) in plans.items():
        if not shifts:  # true dims: single copy
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            continue
        parts = [shifted(df, shifts, i, doc_salt if name == "documents" else None) for i in range(COPIES)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: written", flush=True)
    n = read_parquet(spark, f"{out_dir}/lineitem.parquet").count()
    print(f"done in {time.time()-t0:.0f}s; lineitem rows = {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
