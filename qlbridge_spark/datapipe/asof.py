"""As-of (temporal) join — a custom operator Spark's DataFrame API lacks.

For each left row, find the single most recent right row with
``right.ts <= left.ts`` (direction="backward"; "forward" is the mirror),
optionally within a key partition (``by``) and a max-staleness
``tolerance``.

Scale design — the union/last-value formulation, NOT a range join:
tag both inputs, union, then one window pass per key partition ordered by
time carrying the last-seen right-side payload forward. Cost = ONE shuffle
on the key (plus the window sort), independent of time-range density. A
naive ``l.ts >= r.ts`` range join explodes to O(|L|·|R|) pairs per key
before aggregation — unusable at 100 TB; this stays linear.

Semantics notes:
- a right row at exactly left.ts matches (<=, ASOF convention)
- if several right rows share one (key, ts), the one with the greatest
  tiebreak column (or arbitrary-but-deterministic payload max) wins
- left rows with no prior right row emit NULL right columns (left join)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_on: str | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on time column ``on`` (right side
    may use a differently-named ``right_on``), partitioned by ``by``.

    Returns every left row plus the matched right row's columns (renamed
    with ``suffix`` on collisions; the right time column always appears as
    ``{on}{suffix}``). ``tolerance_seconds`` drops matches older than the
    given staleness. ``tiebreak`` names a right column that deterministically
    picks ONE row when several share the same (key, ts) — the greatest wins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    r_on = right_on or on

    # normalize right side: time column aligned to `on`, payload renamed
    r = right.withColumnRenamed(r_on, on) if r_on != on else right
    payload = [c for c in r.columns if c != on and c not in by_cols]
    renames = {c: (c + suffix if c in left.columns else c) for c in payload}
    for old, new in renames.items():
        if old != new:
            r = r.withColumnRenamed(old, new)
    tb = renames.get(tiebreak, tiebreak) if tiebreak else None
    payload = [renames[c] for c in payload]

    l_cols = list(left.columns)
    # right rows carry only key/time/payload; left-only columns become NULL
    r_struct = F.struct(F.col(on).alias("__rts"), *[F.col(c) for c in payload])
    tagged_r = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in by_cols and c != on],
        *[F.col(c) for c in by_cols],
        F.col(on),
        F.lit(0).alias("__is_l"),
        r_struct.alias("__rpay"),
    )
    tagged_l = left.select(
        *l_cols, F.lit(1).alias("__is_l"), F.lit(None).cast(tagged_r.schema["__rpay"].dataType).alias("__rpay")
    )
    unioned = tagged_l.unionByName(tagged_r.select(*tagged_l.columns))

    # backward: right rows sort BEFORE left rows at equal ts so an
    # exact-ts right row is visible to the left row; forward mirrors.
    # The tiebreak column (asc) makes the carried `last` the max-tiebreak
    # right row among equal timestamps.
    tie = [F.col(f"__rpay.{tb}").asc_nulls_first()] if tb else []
    if direction == "backward":
        order = [F.col(on).asc(), F.col("__is_l").asc(), *tie]
    else:
        order = [F.col(on).desc(), F.col("__is_l").asc(), *tie]
    w = Window.partitionBy(*by_cols).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = F.last("__rpay", ignorenulls=True).over(w)

    out = unioned.withColumn("__match", carried).filter(F.col("__is_l") == 1)
    if tolerance_seconds is not None:
        from pyspark.sql import types as T

        dt_on = unioned.schema[on].dataType
        if isinstance(dt_on, (T.TimestampType, T.TimestampNTZType)):
            # timestampdiff is NTZ-native AND DST-free (no session-tz
            # round trip — a cast("timestamp_ltz") diff would be off by
            # the DST step for walls straddling a transition)
            from ..tzutil import ts_diff_us

            age = F.abs(ts_diff_us(F.col(on), F.col("__match.__rts"), dt_on)) / 1e6
        else:
            # date/string keys: legacy cast path (no-op for TIMESTAMP)
            age = (
                F.abs(
                    F.unix_micros(F.col(on).cast("timestamp_ltz"))
                    - F.unix_micros(F.col("__match.__rts").cast("timestamp_ltz"))
                )
                / 1e6
            )
        out = out.withColumn("__match", F.when(age <= tolerance_seconds, F.col("__match")))
    sel = [F.col(c) for c in l_cols]
    sel.append(F.col("__match.__rts").alias(on + suffix))
    sel.extend(F.col(f"__match.{c}").alias(c) for c in payload)
    return out.select(*sel)
