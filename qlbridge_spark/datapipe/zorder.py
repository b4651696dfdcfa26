"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

At 100 TB, parquet row-group min/max stats only prune scans when the data
is physically clustered on the filtered columns. A plain sort clusters
ONE column perfectly and the rest not at all; interleaving the bits of
per-column RANKS (the Morton / Z-order curve) keeps every listed column
partially clustered, so selective filters on ANY of them skip most
row-groups. This is the layout strategy behind Delta's OPTIMIZE ZORDER
BY; the engine's ``OPTIMIZE t ZORDER BY (...)`` statement routes here
for snapshot sinks.

Design (all JVM-side — zero Python UDFs):

1. Per column, build a numeric ordering proxy (numerics/dates/timestamps
   cast to double; strings/binaries hash with xxhash64 — hash order is
   not semantic order, but identical values still co-locate, which is
   what equality-filter skipping needs).
2. Rank each proxy into ``2**bits_per_col`` quantile buckets computed by
   ``approxQuantile`` (rank-based, so skew cannot collapse the curve the
   way min-max scaling would) and assigned by ``pyspark.ml.feature
   .Bucketizer`` — a JVM Transformer, one pass, no shuffle.
3. Interleave the bucket bits into one long with shift/OR column
   arithmetic, then ``repartitionByRange`` + ``sortWithinPartitions`` on
   the key: one range shuffle total, and every output file covers a
   compact hyper-rectangle of the listed columns.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _ordering_proxy(df: DataFrame, col: str) -> Column:
    """A double-typed column whose ordering drives the column's rank.

    Hash proxies (string/binary/other) preserve equality co-location but
    not range order — right for equality/IN skipping, which is the
    common filter on high-cardinality string keys."""
    dt = df.schema[col].dataType
    if isinstance(dt, _NUMERIC):
        return F.col(col).cast("double")
    if isinstance(dt, T.BooleanType):
        return F.col(col).cast("int").cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_timestamp(F.col(col)).cast("double")
    return F.xxhash64(F.col(col)).cast("double")


def zorder_key(df: DataFrame, cols: list[str], bits_per_col: int = 8,
               relative_error: float = 0.01) -> tuple[DataFrame, str]:
    """Return ``(df + key column, key column name)`` where the key is the
    Morton interleave of each column's quantile-bucket rank.

    One ``approxQuantile`` job computes all columns' bucket boundaries at
    once (driver gets ``cols × 2**bits_per_col`` doubles — tiny); bucket
    assignment and bit interleaving are pure Column expressions."""
    from pyspark.ml.feature import Bucketizer

    if not cols:
        raise ValueError("zorder_key needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"zorder columns not in frame: {missing}")
    if bits_per_col * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} columns x {bits_per_col} bits overflows a long; "
            "lower bits_per_col or list fewer columns"
        )
    proxies = [f"__zp{i}" for i in range(len(cols))]
    work = df.select("*", *[_ordering_proxy(df, c).alias(p) for c, p in zip(cols, proxies)])
    n_buckets = 2 ** bits_per_col
    probs = [j / n_buckets for j in range(1, n_buckets)]
    quantiles = work.approxQuantile(proxies, probs, relative_error)
    bucket_cols: list[tuple[str, int]] = []  # (col, effective bucket count)
    for i, (p, qs) in enumerate(zip(proxies, quantiles)):
        splits = [float("-inf")]
        for q in qs:
            if q > splits[-1]:
                splits.append(float(q))
        splits.append(float("inf"))
        b = f"__zb{i}"
        bucket_cols.append((b, len(splits) - 1))
        if len(splits) == 2:  # constant (or all-NULL) column → single bucket
            work = work.withColumn(b, F.lit(0.0))
        else:
            work = Bucketizer(
                splits=splits, inputCol=p, outputCol=b, handleInvalid="keep"
            ).transform(work)
    key = F.lit(0).cast("long")
    top = n_buckets - 1
    ncols = len(bucket_cols)
    for j, (b, eff) in enumerate(bucket_cols):
        v = F.least(F.coalesce(F.col(b).cast("long"), F.lit(top)), F.lit(top))
        # a low-cardinality column's quantile splits dedupe to eff < 2^bits
        # buckets; UNSCALED its ids never set the HIGH bits, so the Morton
        # curve's most significant positions are dead for it — stretch the
        # effective ids across the full bit range (0 → 0, eff-1 → top)
        if eff > 1 and eff - 1 < top:
            v = F.floor(v * top / F.lit(eff - 1)).cast("long")
        for i in range(bits_per_col):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * ncols + j)
            )
    out = work.withColumn("__zorder", key).drop(*proxies, *[b for b, _ in bucket_cols])
    return out, "__zorder"


def cluster_frame(df: DataFrame, zorder_by: list[str] | None,
                  num_files: int, bits_per_col: int = 8) -> DataFrame:
    """Re-layout ``df`` into ``num_files`` partitions — Z-order clustered
    when ``zorder_by`` is given (one range shuffle), plain coalesce
    otherwise (no shuffle at all: pure small-file compaction)."""
    num_files = max(1, int(num_files))
    if not zorder_by:
        return df.coalesce(num_files)
    keyed, key = zorder_key(df, zorder_by, bits_per_col=bits_per_col)
    return (
        keyed.repartitionByRange(num_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
    )


def estimate_num_files(total_bytes: int, target_file_mb: int = 128) -> int:
    """File count for a compacted rewrite: ceil(bytes / target).

    Parquet compression makes on-disk bytes the honest sizing input —
    the caller passes the CURRENT snapshot's byte size, so the rewrite
    lands near the target file size regardless of row width."""
    target = max(1, int(target_file_mb)) * 1024 * 1024
    return max(1, math.ceil(max(0, int(total_bytes)) / target))
