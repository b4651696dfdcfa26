"""Sessionization: split per-user event streams into sessions by
inactivity gap — batch (window functions) and streaming (stateful
applyInPandasWithState) variants.

The reference carries event-time on rows (TimeMessage,
/root/reference/schema/message.go:31-33) but has no session operator —
this is an extension in the training-data-pipeline family (user behavior
rollups, conversation threading).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    session_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-user session sequence number: a new session starts when
    the gap to the previous event exceeds ``gap_minutes``.

    Single shuffle on ``user_col`` (the window partition); the running sum
    stays within the same partition — no extra exchange.
    """
    from pyspark.sql import types as T

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # fractional-second gap (microsecond precision; unix_timestamp would
    # floor and mis-place boundaries near the gap). timestampdiff is
    # NTZ-native (Spark 4 reads parquet timestamp[us] as TIMESTAMP_NTZ)
    # and tz/DST-free — no session-tz round trip (tzutil)
    dt = df.schema[ts_col].dataType if ts_col in df.columns else None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        from ..tzutil import ts_diff_us

        gap_s = ts_diff_us(F.col(ts_col), prev_ts, dt) / F.lit(1e6)
    else:
        gap_s = F.col(ts_col).cast("timestamp_ltz").cast("double") - prev_ts.cast("timestamp_ltz").cast("double")
    new_session = F.when(prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0))
    # sum over an ORDER BY window defaults to a RANGE frame: tied
    # timestamps are peers and share one session regardless of their
    # arbitrary order within the tie — deterministic under duplicate ts
    # (a ROWS frame would split tie groups when the flagged row sorts late)
    return df.withColumn(session_col, F.sum(new_session).over(w))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup: (user, session_seq, n_events, t_start, t_end,
    duration_s). One shuffle for the window + map-side-combined agg."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
        )
        .withColumn(
            "duration_s",
            # floored-second epochs differenced (matches the DuckDB
            # oracle's epoch() semantics), UTC-stable for NTZ via tzutil
            _floor_epoch_s("t_end", s.schema[ts_col].dataType)
            - _floor_epoch_s("t_start", s.schema[ts_col].dataType),
        )
    )


def _floor_epoch_s(col: str, dt):
    from ..tzutil import utc_epoch_us

    return F.floor(utc_epoch_us(F.col(col), dt) / F.lit(1_000_000)).cast("long")


def sessionize_stream(
    stream_df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    state_timeout: bool = True,
):
    """Streaming sessionization via ``applyInPandasWithState`` — the custom
    stateful operator path (SURVEY §2.12 extension).

    Per-user state carries (session_seq, last_ts, n_events); a batch's
    events extend or roll sessions exactly like the batch operator. Emits
    one row per (user, session) touched in the batch (update semantics).

    ``state_timeout=True`` bounds state via ProcessingTimeTimeout (stale
    users evicted after the gap) — required at scale; note it keeps the
    stream ticking with cleanup micro-batches, so tests that wait for
    quiescence (processAllAvailable) should pass False.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{user_col} long, session_seq int, n_events long, t_start timestamp, t_end timestamp"
    state_schema = "session_seq int, last_ts double, n_events long, start_ts double"
    gap_s = gap_minutes * 60

    def update(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            state.remove()
            return
        seq, last_ts, n_events, start_ts = state.get if state.exists else (0, None, 0, None)
        rows = []
        events = pd.concat(list(pdfs)).sort_values(ts_col)
        for ts in events[ts_col]:
            t = ts.timestamp()
            if last_ts is None or t - last_ts > gap_s:
                if last_ts is not None:
                    rows.append((user, seq, n_events, start_ts, last_ts))
                seq += 1
                n_events = 0
                start_ts = t
            n_events += 1
            last_ts = t
        rows.append((user, seq, n_events, start_ts, last_ts))
        state.update((seq, last_ts, n_events, start_ts))
        if state_timeout:
            state.setTimeoutDuration(int(gap_s * 1000))
        out = pd.DataFrame(rows, columns=[user_col, "session_seq", "n_events", "t_start", "t_end"])
        out["t_start"] = pd.to_datetime(out["t_start"], unit="s")
        out["t_end"] = pd.to_datetime(out["t_end"], unit="s")
        yield out

    timeout_conf = GroupStateTimeout.ProcessingTimeTimeout if state_timeout else GroupStateTimeout.NoTimeout
    return stream_df.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout_conf
    )


def session_stats_native(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup via Spark's NATIVE ``session_window`` — the
    all-JVM path (SessionWindowStateStore aggregation; zero Python).
    Output schema matches :func:`session_stats` minus the per-user
    ``session_seq`` ordinal (the native operator identifies sessions by
    their time range, not a sequence number): (user, t_start, t_end,
    n_events, duration_s).

    Why both exist: ``session_stats`` (lag+running-sum) gives the ordinal
    and pins the exact tie semantics the DuckDB oracle replays;
    ``session_stats_native`` is what a 100 TB batch or a streaming
    aggregation should run — one shuffle, whole-stage-codegen'd merge of
    overlapping windows, and the SAME operator works on a watermarked
    stream (append mode) without applyInPandasWithState.
    """
    gap = f"{int(gap_minutes * 60)} seconds"
    ts = F.col(ts_col).cast("timestamp_ltz")
    return (
        df.withColumn("__ts", ts)
        .groupBy(F.session_window(F.col("__ts"), gap).alias("__sw"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # true last-event time, NOT __sw.end (which extends past the
            # last event by the gap) — matches session_stats semantics
            F.max("__ts").alias("t_end"),
        )
        .select(
            user_col,
            F.col("__sw.start").alias("t_start"),
            "t_end",
            "n_events",
            (F.unix_timestamp("t_end") - F.unix_timestamp(F.col("__sw.start"))).alias("duration_s"),
        )
    )
