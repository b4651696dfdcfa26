"""Similarity search over embedding columns (array<float>).

Two paths:
- :func:`cosine_topk` — exact brute force. Corpus is scanned once; the
  (small) query set is broadcast; per-query top-k via window. Baseline and
  oracle-comparable.
- :func:`ivf_build` / :func:`ivf_topk` — IVF-style approximate search: the
  corpus is partitioned into cells around centroids; queries probe only
  the ``nprobe`` nearest cells. At 100 TB this turns a full scan per query
  batch into a ~(nprobe/ncells) fraction scan, and the cell assignment is
  a one-off build cost. Centroid selection is a deterministic hash-sample
  (no kmeans iterations — "IVF-flat with random centroids", the standard
  cheap variant).

All vector math is Column expressions (zip_with/aggregate) — JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors for every query vector (brute force).

    Returns (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor_id for determinism. The query side is broadcast — the corpus
    never shuffles; the only exchange is the per-query top-k window over
    |corpus|×|queries| scored rows, which AQE coalesces.
    """
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    # norms are precomputed ONCE per vector (same expression, identical
    # floats) instead of inside the scored cross product, where each
    # corpus norm would be re-evaluated per query and each query norm per
    # corpus row — the interpreted higher-order-function passes are the
    # dominant per-row cost, and this drops two of the three.
    q = queries.select(F.col(qid).alias("query_id"), F.col(qvec).cast("array<double>").alias("__qv"))
    q = q.withColumn("__qn", _norm(F.col("__qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("__cv"))
    c = c.withColumn("__cn", _norm(F.col("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("cosine"), "rank")
    )


def ivf_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    method: str = "hash",
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: pick ``n_cells`` deterministic centroid rows
    (``method='hash'``: smallest xxhash64(id) — a uniform pseudo-random
    sample; ``method='min_id'``: smallest ids — fully portable, used by the
    DuckDB oracle), assign every vector to its nearest centroid. Returns
    (assigned_corpus, centroids). The centroid's own id is its cell_id.

    ``refine_iters`` runs that many k-means (Lloyd) iterations: assign →
    per-cell component mean → reassign. Each iteration is one broadcast
    assignment scan + one small aggregation (explode components → avg →
    rebuild array); cells that lose all members keep their previous
    centroid. Mean-based centroids cut probe misses on clustered data;
    note distributed float summation makes refined centroids
    partitioning-dependent in the last ulps, so the oracle-gated entry
    stays on refine_iters=0.

    Scale: centroid selection is orderBy+limit, which Spark lowers to
    TakeOrderedAndProject — each partition keeps its local top-n_cells and
    only those n_cells-per-partition rows reach the driver-side merge; no
    global sort, no single-partition window. Centroids are tiny →
    broadcast; assignment is one corpus scan; the assigned table is the
    "index" (re-partition/bucket by cell_id on write so probes read only
    matching files).
    """
    c = corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col).cast("array<double>").alias("__cv"))
    key = F.xxhash64(F.col("__cid").cast("string")) if method == "hash" else F.col("__cid")
    cents = (
        c.orderBy(key)
        .limit(n_cells)
        .select(F.col("__cid").alias("cell_id"), F.col("__cv").alias("centroid"))
    )

    def assign(cents_df: DataFrame) -> DataFrame:
        # norms once per vector / per centroid (identical float order:
        # dot / (norm_row * norm_centroid)), not per (row × cell) pair
        cn = cents_df.withColumn("__kn", _norm(F.col("centroid")))
        return (
            c.withColumn("__cn", _norm(F.col("__cv")))
            .crossJoin(F.broadcast(cn))
            .withColumn("__sim", _dot(F.col("__cv"), F.col("centroid")) / (F.col("__cn") * F.col("__kn")))
            .withColumn("__rk", F.row_number().over(Window.partitionBy("__cid").orderBy(F.col("__sim").desc(), F.col("cell_id"))))
            .filter(F.col("__rk") == 1)
            .select(F.col("__cid").alias(id_col), F.col("__cv").alias(vec_col), "cell_id")
        )

    for _ in range(refine_iters):
        a = assign(cents)
        # per-cell component means: posexplode → avg per (cell, pos) →
        # rebuild sorted array. Two small aggregations, no collect.
        means = (
            a.select("cell_id", F.posexplode(F.col(vec_col)).alias("__pos", "__x"))
            .groupBy("cell_id", "__pos")
            .agg(F.avg("__x").alias("__m"))
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__m"))), lambda s: s["__m"]
                ).alias("centroid")
            )
        )
        # empty cells keep their previous centroid
        cents = (
            cents.select("cell_id", F.col("centroid").alias("__prev"))
            .join(means, "cell_id", "left")
            .select("cell_id", F.coalesce("centroid", "__prev").alias("centroid"))
        )

    return assign(cents), cents


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: each query probes its ``nprobe`` nearest cells
    and scores only vectors assigned there.

    Returns (query_id, neighbor_id, cosine, rank).
    """
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(qvec).cast("array<double>").alias("__qv"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__sim", cosine(F.col("__qv"), F.col("centroid")))
        .withColumn("__rk", F.row_number().over(Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("cell_id"))))
        .filter(F.col("__rk") <= nprobe)
        .select("query_id", "__qv", "cell_id")
    )
    # corpus norms once per assigned row, query norms once per probe row
    # (identical float order: dot / (norm_corpus * norm_query)) — not per
    # scored (row × probe) pair
    probes = probes.withColumn("__qn", _norm(F.col("__qv")))
    scored = (
        assigned.withColumn("__cv2", F.col(vec_col).cast("array<double>"))
        .withColumn("__cn", _norm(F.col("__cv2")))
        .join(F.broadcast(probes), "cell_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("__cv2"), F.col("__qv")) / (F.col("__cn") * F.col("__qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )
