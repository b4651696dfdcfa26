"""Sketch/approximation operators for exploratory analytics at scale.

Spark-first: these wrap the engine's native mergeable sketches
(HyperLogLog++ for distinct counts, Greenwald-Khanna/KLL for quantiles)
rather than reimplementing them — at 100 TB the value is that the sketch
state merges across partitions map-side, so the exact-answer shuffle never
happens. The reference has no sketch operators (extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: list[str], group_by: list[str] | None = None, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct counts per group (mergeable, one pass)."""
    aggs = [F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_distinct") for c in cols]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    group_by: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate quantiles (percentile_approx sketch) per group."""
    agg = F.percentile_approx(col, list(probabilities), accuracy).alias(f"{col}_quantiles")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def freq_topk(df: DataFrame, col: str, k: int = 10, group_by: list[str] | None = None) -> DataFrame:
    """Heavy hitters: top-k values by frequency. Exact but cheap — the
    count aggregation partial-combines map-side, so the shuffle carries
    one row per distinct value per mapper, not per input row."""
    from pyspark.sql import Window

    counts = df.groupBy(*(group_by or []), col).agg(F.count(F.lit(1)).alias("freq"))
    if group_by:
        w = Window.partitionBy(*group_by).orderBy(F.col("freq").desc(), F.col(col))
        return counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return counts.orderBy(F.col("freq").desc(), F.col(col)).limit(k)


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass profiling sketch for a table: per column null fraction,
    approx distinct, min/max. The whole profile is a single aggregation —
    one scan regardless of column count."""
    cols = cols or df.columns
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        {
            "column": c,
            "null_fraction": (row[f"{c}__nulls"] / row["__n"]) if row["__n"] else 0.0,
            "approx_distinct": row[f"{c}__distinct"],
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
        }
        for c in cols
    ]
    return spark.createDataFrame(out, "column string, null_fraction double, approx_distinct long, min string, max string")
