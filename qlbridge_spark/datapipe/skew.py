"""Skew-mitigation operators: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (null ids, default values, celebrity
users) can put 100 GB into ONE shuffle partition while the other 999
executors idle. AQE's skew-join splitting (enabled by session.configure)
handles many cases at runtime; these operators are the explicit,
plannable fallback for when you KNOW the skew — the classic salting
patterns:

- :func:`salted_join` — big⋈medium equi-join where the big side has hot
  keys but the other side is too large to broadcast: the big side gets a
  deterministic per-row salt appended to its key (hot key spread over
  ``salts`` partitions); the other side is replicated ``salts``× so every
  (key, salt) bucket finds its match. Cost: other-side shuffle volume ×
  salts — choose salts ≈ hot-key-partition-size / target-partition-size.
- :func:`two_phase_agg` — groupBy with hot group keys: partial aggregate
  on (key, salt) first (spreads the hot key), then final aggregate on
  key. Works for algebraic aggregates (sum/count/min/max and anything
  with a merge step).

Both are output-identical to their naive counterparts — tests assert it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join with the big side salted and ``other`` replicated
    ``salts``×. Output equals ``big.join(other, on, how)`` for
    how in ("inner", "left").

    The salt is ``xxhash64(whole big row) pmod salts`` — deterministic,
    uniform, and independent of the join key, so each hot key's rows
    spread across ``salts`` buckets.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")

    salt_expr: Column = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts)).cast("int")
    b = big.withColumn("__salt", salt_expr)
    o = other.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))).withColumn(
        "__salt", F.col("__salt").cast("int")
    )
    joined = b.join(o, on=keys + ["__salt"], how=how)
    return joined.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    group_cols: str | list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column] | None = None,
    salts: int = 16,
    salt_on: str | list[str] | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys.

    ``partial_aggs``: {out_name: agg Column over the raw rows} applied per
    (group, salt). ``final_aggs``: {out_name: agg Column over the partial
    rows} merging the salted partials; defaults to ``sum`` of each partial
    column (correct for sum/count). For min/max pass
    ``final_aggs={"m": F.min("m")}`` etc.

    ``salt_on``: columns the salt is derived from (default: the whole
    row). For DISTINCT-style partials the salt MUST be a function of the
    distinct column so equal values land in the same salt bucket and the
    per-salt distinct counts sum exactly:
    ``two_phase_agg(df, "k", {"nd": F.count_distinct("v")},
    {"nd": F.sum("nd")}, salt_on="v")``.

    When do you actually need this in Spark? MEASURED (SKEW_r08.md, 30 %
    hot key at sf1): NOT for built-in algebraic aggs or count_distinct —
    Spark's map-side partial aggregation and the distinct rewrite already
    collapse the hot key (max/med task ratio 1.0 plain; salting only
    added overhead). It earns its keep where partial aggregation is
    unavailable: custom UDAFs without a merge step, or non-adaptive
    engines. For HOLISTIC aggregates (exact percentile — 13× straggler
    measured) salting cannot help either; switch to a mergeable sketch
    (approx_percentile) instead.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    salt_cols = (
        [salt_on] if isinstance(salt_on, str) else list(salt_on) if salt_on is not None else list(df.columns)
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salts)).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    if final_aggs is None:
        final_aggs = {n: F.sum(n) for n in partial_aggs}
    return partial.groupBy(*keys).agg(*[c.alias(n) for n, c in final_aggs.items()])


def skew_stats(df: DataFrame, key_cols: str | list[str], top: int = 10) -> DataFrame:
    """Per-key row counts for the heaviest keys — the diagnostic you run
    BEFORE choosing a salt factor. One aggregation, TakeOrdered top-N."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )
