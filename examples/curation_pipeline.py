"""End-to-end training-data curation pipeline over the datapipe operators.

The shape of a production corpus-prep job, at any scale:

    raw docs → language ID → quality floor → exact dedup → near-dup dedup
             → deterministic stratified sample → keyword report

Every stage is declarative DataFrame ops (JVM-side, no row-Python), so the
same script runs on local testdata or a 1000-executor cluster — only the
input path changes.

Run:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from qlbridge_spark.datapipe import (
        dedup_exact,
        hash_sample,
        lang_id,
        minhash_dedup,
        quality_score,
        tfidf_top_terms,
        token_count,
    )
    from qlbridge_spark.engine import read_parquet
    from qlbridge_spark.session import configure

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # the near-dup stage's signature/band frames need more than the
        # 1g JVM default on the driver in local mode
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g"))
        .appName("curation_pipeline")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. derive row features (one scan, pure Column expressions)
    featured = docs.select(
        "doc_id",
        "text",
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
        token_count(F.col("text")).alias("tokens"),
    )

    # 2. quality floor
    kept = featured.filter((F.col("quality") >= 0.3) & (F.col("tokens") >= 5))
    n1 = kept.count()

    # 3. exact dedup on normalized text
    kept = dedup_exact(kept, ["text"], keep="doc_id")
    n2 = kept.count()

    # 4. near-dup dedup (MinHash + LSH + connected components)
    kept = minhash_dedup(kept, "doc_id", "text", threshold=0.7, num_hashes=32, bands=8)
    n3 = kept.count()

    # 5. deterministic stratified sample: downsample the dominant language
    sampled = hash_sample(kept, "doc_id", {"en": 0.8}, strata_col="lang", salt="curation-v1")
    n4 = sampled.count()

    print(f"\ncorpus funnel: raw={n0} → quality={n1} → exact-dedup={n2} → near-dup={n3} → sampled={n4}\n")

    print("per-language yield:")
    sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("tokens").alias("tokens")
    ).orderBy("lang").show()

    print("sample keywords (tf-idf top terms of 3 docs):")
    tfidf_top_terms(sampled.limit(200), "doc_id", "text", k=3).filter(F.col("doc_id") < 3).orderBy(
        "doc_id", "rank"
    ).show(9, truncate=False)


if __name__ == "__main__":
    main()
