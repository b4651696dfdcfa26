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


def _bucket_ids(df: DataFrame, cols: list[str], bits_per_col: int,
                relative_error: float) -> tuple[DataFrame, list[str], list[str]]:
    """Shared rank stage for both curves: per column, a scaled long
    bucket id in ``[0, 2**bits_per_col - 1]``. Returns ``(frame, id
    column names, scratch column names to drop)``.

    One ``approxQuantile`` job computes all columns' bucket boundaries at
    once (driver gets ``cols × 2**bits_per_col`` doubles — tiny); bucket
    assignment is ``pyspark.ml.feature.Bucketizer`` (a JVM Transformer,
    one pass, no shuffle)."""
    from pyspark.ml.feature import Bucketizer

    if not cols:
        raise ValueError("clustering needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"clustering columns not in frame: {missing}")
    proxies = [f"__zp{i}" for i in range(len(cols))]
    work = df.select("*", *[_ordering_proxy(df, c).alias(p) for c, p in zip(cols, proxies)])
    n_buckets = 2 ** bits_per_col
    probs = [j / n_buckets for j in range(1, n_buckets)]
    quantiles = work.approxQuantile(proxies, probs, relative_error)
    top = n_buckets - 1
    id_cols: list[str] = []
    scratch: list[str] = list(proxies)
    ids: dict[str, Column] = {}
    for i, (p, qs) in enumerate(zip(proxies, quantiles)):
        splits = [float("-inf")]
        for q in qs:
            if q > splits[-1]:
                splits.append(float(q))
        splits.append(float("inf"))
        b = f"__zb{i}"
        eff = len(splits) - 1
        if eff == 1:  # constant (or all-NULL) column → single bucket
            work = work.withColumn(b, F.lit(0.0))
        else:
            work = Bucketizer(
                splits=splits, inputCol=p, outputCol=b, handleInvalid="keep"
            ).transform(work)
        scratch.append(b)
        v = F.least(F.coalesce(F.col(b).cast("long"), F.lit(top)), F.lit(top))
        # a low-cardinality column's quantile splits dedupe to eff < 2^bits
        # buckets; UNSCALED its ids never set the HIGH bits, so the curve's
        # most significant positions are dead for it — stretch the
        # effective ids across the full bit range (0 → 0, eff-1 → top)
        if eff > 1 and eff - 1 < top:
            v = F.floor(v * top / F.lit(eff - 1)).cast("long")
        ids[f"__zid{i}"] = v
        id_cols.append(f"__zid{i}")
    work = work.withColumns(ids)
    scratch.extend(id_cols)
    return work, id_cols, scratch


def zorder_key(df: DataFrame, cols: list[str], bits_per_col: int = 8,
               relative_error: float = 0.01) -> tuple[DataFrame, str]:
    """Return ``(df + key column, key column name)`` where the key is the
    Morton interleave of each column's quantile-bucket rank — pure Column
    bit arithmetic over the shared rank stage."""
    if bits_per_col * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} columns x {bits_per_col} bits overflows a long; "
            "lower bits_per_col or list fewer columns"
        )
    work, id_cols, scratch = _bucket_ids(df, cols, bits_per_col, relative_error)
    key = F.lit(0).cast("long")
    ncols = len(id_cols)
    for j, b in enumerate(id_cols):
        v = F.col(b)
        for i in range(bits_per_col):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * ncols + j)
            )
    out = work.withColumn("__zorder", key).drop(*scratch)
    return out, "__zorder"


# ---------------------------------------------------------------------------
# Hilbert curve — better locality than Morton (no quadrant jumps), so
# per-file min/max ranges come out tighter and pruning improves.
# ---------------------------------------------------------------------------


def _axes_to_transpose(X: list[int], bits: int) -> list[int]:
    """Skilling's axes→transposed-Hilbert transform (J. Skilling,
    "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
    standard public-domain N-dimensional algorithm). ``X`` is mutated
    and returned: per-axis words whose interleaved bits form the Hilbert
    index."""
    n = len(X)
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:  # inverse undo excess work
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):  # Gray encode
        X[i] ^= X[i - 1]
    t = 0
    Q = M
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    return X


def hilbert_index(axes: tuple, bits: int) -> int:
    """Scalar Hilbert index of a grid cell: transpose then interleave
    MSB-first. Inverse locality property (tested): walking indices
    0,1,2,... visits grid cells that are always exactly one step apart."""
    X = _axes_to_transpose(list(axes), bits)
    n = len(X)
    d = 0
    for k in range(bits - 1, -1, -1):
        for i in range(n):
            d = (d << 1) | ((X[i] >> k) & 1)
    return d


def hilbert_key(df: DataFrame, cols: list[str], bits_per_col: int = 8,
                relative_error: float = 0.01) -> tuple[DataFrame, str]:
    """Return ``(df + key column, key column name)`` where the key is the
    HILBERT index of each column's quantile-bucket rank.

    An iterative per-row Hilbert computation in Column arithmetic would
    nest data-dependent rotations ``bits`` deep and blow the expression
    tree up exponentially (x' and y' each reference both x and y). But
    the curve only ever sees BUCKET ids — a bounded grid — so the whole
    mapping is precomputed driver-side into a ``(2**bits)**ncols``-row
    lookup table and applied with ONE broadcast hash join: all JVM, zero
    UDFs, no deep expressions. To keep the table small, ``bits_per_col``
    is capped so the grid has at most 2^16 cells (2 cols → 8 bits, the
    default; 3 → 5; 4 → 4) — the same bit budget a 63-bit Morton long
    would force anyway at higher dimensions."""
    import itertools

    ncols = len(cols)
    if ncols < 1:
        raise ValueError("clustering needs at least one column")
    bits = max(1, min(int(bits_per_col), 16 // ncols))
    work, id_cols, scratch = _bucket_ids(df, cols, bits, relative_error)
    side = 1 << bits
    rows = [
        axes + (hilbert_index(axes, bits),)
        for axes in itertools.product(range(side), repeat=ncols)
    ]
    spark = df.sparkSession
    schema = ", ".join(f"__hx{i} long" for i in range(ncols)) + ", __zorder long"
    lookup = spark.createDataFrame(rows, schema)
    cond = None
    for i, b in enumerate(id_cols):
        c = work[b] == lookup[f"__hx{i}"]
        cond = c if cond is None else (cond & c)
    out = work.join(F.broadcast(lookup), cond, "left").drop(
        *scratch, *[f"__hx{i}" for i in range(ncols)]
    )
    return out, "__zorder"


def cluster_frame(df: DataFrame, zorder_by: list[str] | None,
                  num_files: int, bits_per_col: int = 8,
                  curve: str = "morton") -> DataFrame:
    """Re-layout ``df`` into ``num_files`` partitions — space-filling-
    curve clustered when ``zorder_by`` is given (one range shuffle),
    plain coalesce otherwise (no shuffle at all: pure small-file
    compaction). ``curve``: 'morton' (bit interleave, default) or
    'hilbert' (broadcast-lookup Hilbert index — tighter per-file ranges,
    see hilbert_key)."""
    num_files = max(1, int(num_files))
    if not zorder_by:
        return df.coalesce(num_files)
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"unknown clustering curve {curve!r}: use 'morton' or 'hilbert'")
    keyfn = hilbert_key if curve == "hilbert" else zorder_key
    keyed, key = keyfn(df, zorder_by, bits_per_col=bits_per_col)
    return (
        keyed.repartitionByRange(num_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
    )


def estimate_num_files(total_bytes: int, target_file_mb: float = 128) -> int:
    """File count for a compacted rewrite: ceil(bytes / target).

    Parquet compression makes on-disk bytes the honest sizing input —
    the caller passes the CURRENT snapshot's byte size, so the rewrite
    lands near the target file size regardless of row width.
    Fractional ``target_file_mb`` is honored (tests use sub-MB targets)."""
    target = max(1, int(target_file_mb * 1024 * 1024))
    return max(1, math.ceil(max(0, int(total_bytes)) / target))
