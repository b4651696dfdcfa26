"""Streaming extension: CREATE CONTINUOUSVIEW on Structured Streaming.

The reference lexes/parses CONTINUOUSVIEW but never executes it
(/root/reference/lex/dialect_sql.go:437-441, exec/ddl.go:54-97 →
ErrNotImplemented) — this module is a strict superset (SURVEY §2.12).

A continuous view is a SELECT whose FROM is a streaming source; we lower
the same AST through the same translator, but against ``readStream``
frames, add event-time watermarking from WITH config, and materialize via
``writeStream`` to an in-memory sink (queryable as a table) or a path.

WITH config keys:
    {"stream": true, "watermark": {"column": "ts", "delay": "10 minutes"},
     "window": {"column": "ts", "duration": "5 minutes", "slide": "..."},
     "session": {"column": "ts", "gap": "5 minutes"},   # session windows
     "output_mode": "append"|"update"|"complete",
     "checkpoint": "/tmp/ckpt", "format": "memory"|"parquet", "path": ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import is_agg_tree as funcs_is_agg_tree


def create_continuous_view(engine, create_stmt):
    """Execute CREATE CONTINUOUSVIEW name AS SELECT ... WITH {...}."""
    from ..rel import SqlSetOp

    sel = create_stmt.select
    if isinstance(sel, SqlSetOp):
        raise ValueError(
            "set operations are not supported in CONTINUOUSVIEW (a streaming "
            "union would need per-branch watermarks); create one view per "
            "branch and union the sinks"
        )
    # the trailing WITH {...} lexically attaches to the inner SELECT
    cfg = create_stmt.with_ or (sel.with_ if sel else None) or {}
    if sel is None:
        raise ValueError("CONTINUOUSVIEW requires AS SELECT")

    src = sel.from_[0]
    base = engine.table(src.name)
    # re-read the same source as a stream when it is file-backed; for
    # registered DataFrames we re-use the batch frame wrapped as a
    # rate-limited stream only in tests — here: readStream on the schema
    stream_df = _as_stream(engine, src.name, base, cfg)

    wm = cfg.get("watermark")
    if wm:
        stream_df = stream_df.withWatermark(wm["column"], wm.get("delay", "10 minutes"))

    # JOINed sources: batch frames by default (stream-static join — Spark
    # re-scans the static side per micro-batch, no state). A source listed
    # in WITH {'streams': {name: {path, watermark}}} streams too →
    # stream-stream join; Spark requires BOTH sides watermarked so join
    # state is evictable (unbounded buffers otherwise — the 100 TB killer)
    streams_cfg = {str(k).lower(): v for k, v in (cfg.get("streams") or {}).items()}
    extra_streams: list[str] = []
    for src2 in sel.from_[1:]:
        scfg = streams_cfg.get((src2.name or "").lower())
        if scfg is None:
            continue
        b2 = engine.table(src2.name)
        s2 = _as_stream(engine, src2.name, b2, scfg)
        wm2 = scfg.get("watermark")
        if wm2:
            s2 = s2.withWatermark(wm2["column"], wm2.get("delay", "10 minutes"))
        elif wm:
            raise ValueError(
                f"stream-stream join: source {src2.name!r} needs WITH "
                "{'streams': {..., 'watermark': {...}}} so join state can be evicted"
            )
        engine.register_df(f"__stream_{src2.name}", s2)
        extra_streams.append(src2.name)

    win = cfg.get("window")
    sess = cfg.get("session")
    if win and sess:
        raise ValueError("WITH may specify 'window' or 'session', not both")
    if win or sess:
        # event-time window (tumbling/sliding) or session window (gap-
        # merged): the window STRUCT joins the GROUP BY keys (grouping on
        # the struct keeps Spark's event-time marker, so watermark-based
        # state eviction works in append mode); start/end are flattened
        # after aggregation
        if not sel.group_by and not any(
            not c.is_star and funcs_is_agg_tree(c.expr) for c in sel.columns
        ):
            raise ValueError("WITH {'window'/'session': ...} requires an aggregating SELECT (GROUP BY / aggregates)")
        if win:
            wcol = F.window(F.col(win["column"]), win["duration"], win.get("slide"))
        else:
            # sessions close after `gap` of event-time silence per group
            # key — Spark merges overlapping per-row windows in the agg
            wcol = F.session_window(F.col(sess["column"]), sess.get("gap", "5 minutes"))
        stream_df = stream_df.withColumn("__win", wcol)

    # run the same SELECT translation against the streaming frame
    engine.register_df(f"__stream_{src.name}", stream_df)
    try:
        sel2 = _clone_with_from(sel, f"__stream_{src.name}", src, renames={n: f"__stream_{n}" for n in extra_streams})
        if win or sess:
            from ..nodes import IdentityNode
            from ..rel import Column as SelColumn

            sel2.group_by = list(sel2.group_by) + [IdentityNode(("__win",))]
            sel2.columns = list(sel2.columns) + [SelColumn(expr=IdentityNode(("__win",)), alias="__win")]
        out = engine._select(sel2)
        if win or sess:
            out = (
                out.withColumn("window_start", F.col("__win.start"))
                .withColumn("window_end", F.col("__win.end"))
                .drop("__win")
            )
    finally:
        engine.tables.pop(f"__stream_{src.name}", None)
        for n in extra_streams:
            engine.tables.pop(f"__stream_{n}", None)

    query = _start(out, create_stmt.ident, cfg, engine=engine)
    engine.streams[create_stmt.ident.lower()] = query
    return query


def windowed_agg(df: DataFrame, ts_col: str, duration: str, slide: str | None, group_cols: list[str], aggs: list) -> DataFrame:
    """Tumbling/sliding window aggregation helper — the streaming GroupBy.
    At scale: watermark bounds state; window+keys shuffle once."""
    w = F.window(F.col(ts_col), duration, slide) if slide else F.window(F.col(ts_col), duration)
    return df.groupBy(w, *[F.col(c) for c in group_cols]).agg(*aggs)


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    delay: str = "10 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication — the streaming face of
    datapipe.dedup_exact.

    With ``ts_col``: watermarks the stream and uses
    ``dropDuplicatesWithinWatermark`` so state for a key is dropped once
    the watermark passes it — bounded state, the only formulation that
    survives an unbounded 100 TB/day stream. Without ``ts_col`` (or
    ``within_watermark=False``): plain ``dropDuplicates`` — state grows
    forever; only for bounded/test streams.
    """
    if ts_col is not None:
        out = stream_df.withWatermark(ts_col, delay)
        if within_watermark:
            return out.dropDuplicatesWithinWatermark(key_cols)
        return out.dropDuplicates(key_cols)
    return stream_df.dropDuplicates(key_cols)


def near_dup_pairs_stream(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    bucket_cap: int = 256,
    shingle_size: int = 3,
    state_timeout_ms: int | None = None,
    ts_col: str | None = None,
    watermark_delay: str = "10 minutes",
    state_ttl_ms: int = 600_000,
):
    """STREAMING near-duplicate pair detection — the stateful counterpart
    of datapipe.minhash_pairs, built as a custom operator on
    ``applyInPandasWithState``.

    Pipeline:
    1. stateless: per-record MinHash signature (``minhash_sig_col`` Column
       expression — no aggregation, so it runs on an append stream) and
       LSH band keys via posexplode;
    2. stateful: group by (band, bucket); each bucket's state holds the
       ids + signatures seen so far (capped at ``bucket_cap`` — the skew
       guard); an arriving record is compared against the stored
       signatures (estimated Jaccard = fraction of agreeing positions)
       and emits (id_a, id_b, est_jaccard) for matches ≥ threshold.

    A pair colliding in several bands emits once per band — distinct()
    downstream (per micro-batch via foreachBatch, or sink-side).

    State lifetime (three modes):
    - ``ts_col`` set → EVENT-TIME expiry: the stream is watermarked
      (``withWatermark(ts_col, watermark_delay)``), each bucket's state
      expires ``state_ttl_ms`` after its newest document's event time,
      and documents arriving later than the watermark are DROPPED (both
      by Spark's stateful-operator late filter and by an explicit guard
      in the operator). This is the production mode: state is bounded by
      event-time progress, not by wall-clock luck.
    - ``state_timeout_ms`` set (no ts_col) → processing-time expiry.
    - neither → state kept forever (tests / bounded streams only).

    Scale: state per bucket ≤ bucket_cap signatures; the band explode
    multiplies rows ×bands but each row is (band, bucket, id, sig).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..datapipe.dedup import minhash_sig_col

    id_type = dict(stream_df.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        # the long cast below would turn non-numeric ids into NULLs and the
        # operator would silently emit nothing — fail loudly instead
        raise ValueError(
            f"near_dup_pairs_stream requires an integral id column; {id_col!r} is {id_type!r} "
            "(hash string ids to long first, e.g. xxhash64(id))"
        )
    use_event_time = ts_col is not None
    if use_event_time:
        stream_df = stream_df.withWatermark(ts_col, watermark_delay)
    sig = minhash_sig_col(F.col(text_col), num_hashes, shingle_size)
    rows_per_band = num_hashes // bands
    ts_cols = [F.col(ts_col).alias("__ts")] if use_event_time else []
    banded = stream_df.select(
        F.col(id_col).cast("long").alias("__id"),
        sig.alias("__sig"),
        *ts_cols,
    ).select(
        "__id",
        "__sig",
        *(["__ts"] if use_event_time else []),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band), b),
            )
        ).alias("__band", "__bucket"),
    )

    out_schema = "id_a long, id_b long, est_jaccard double"
    # state: parallel arrays — ids + flattened signatures (stride num_hashes)
    state_schema = "ids array<long>, sigs array<long>"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ids, flat = state.get if state.exists else ([], [])
        ids, flat = list(ids), list(flat)
        out_rows = []
        wm_ms = state.getCurrentWatermarkMs() if use_event_time else 0
        max_ts_ms = 0
        for pdf in pdfs:
            for row_i, (_id, s) in enumerate(zip(pdf["__id"], pdf["__sig"])):
                if use_event_time:
                    ev_ms = int(pd.Timestamp(pdf["__ts"].iloc[row_i]).value // 1_000_000)
                    if wm_ms > 0 and ev_ms < wm_ms:
                        continue  # late document — drop, don't match or store
                    max_ts_ms = max(max_ts_ms, ev_ms)
                s = list(s)
                for j, prev_id in enumerate(ids):
                    if prev_id == _id:
                        continue
                    prev = flat[j * num_hashes : (j + 1) * num_hashes]
                    est = sum(1 for x, y in zip(prev, s) if x == y) / num_hashes
                    if est >= threshold:
                        a, b = (prev_id, _id) if prev_id < _id else (_id, prev_id)
                        out_rows.append((a, b, est))
                if len(ids) < bucket_cap:
                    ids.append(int(_id))
                    flat.extend(int(x) for x in s)
        state.update((ids, flat))
        if use_event_time:
            # expire state state_ttl_ms after the bucket's newest event
            # (must be beyond the current watermark — Spark rejects
            # timeouts at/behind it)
            base = max(max_ts_ms, wm_ms + 1)
            state.setTimeoutTimestamp(base + state_ttl_ms)
        elif state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(out_rows, columns=["id_a", "id_b", "est_jaccard"])

    if use_event_time:
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    elif state_timeout_ms is not None:
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout_conf = GroupStateTimeout.NoTimeout
    return banded.groupBy("__band", "__bucket").applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout_conf
    )


def _as_stream(engine, name: str, base: DataFrame, cfg: dict) -> DataFrame:
    if cfg.get("changes"):
        # the table's change-data feed as the stream source (versioned
        # sinks only): each micro-batch is O(|new commits' changes|) —
        # the CDC consumption loop in pure SQL surface. Meta columns
        # (_change_type/_commit_version/_commit_timestamp) are selectable.
        return engine.stream_changes(name, cfg.get("starting_version", 0))
    path = cfg.get("path")
    fmt = cfg.get("source_format", "parquet")
    if path:
        return engine.spark.readStream.schema(base.schema).format(fmt).load(path)
    raise ValueError("CONTINUOUSVIEW requires WITH {'path': <stream source dir>} or {'changes': true}")


def _clone_with_from(sel, new_table: str, old_src, renames: dict[str, str] | None = None):
    """Clone ``sel`` with the first FROM source renamed to ``new_table``
    and any other sources renamed per ``renames`` (stream-stream joins).
    Aliases are preserved so join/where references keep resolving."""
    import copy

    sel2 = copy.copy(sel)
    sel2.from_ = list(sel.from_)
    src2 = copy.copy(old_src)
    src2.name = new_table
    src2.alias = old_src.alias or old_src.name
    sel2.from_[0] = src2
    for i, s in enumerate(sel2.from_[1:], start=1):
        new = (renames or {}).get(s.name)
        if new:
            sr = copy.copy(s)
            sr.alias = s.alias or s.name
            sr.name = new
            sel2.from_[i] = sr
    sel2.with_ = {}
    return sel2


def _start(out: DataFrame, name: str, cfg: dict, engine=None):
    mode = cfg.get("output_mode", "append")
    fmt = cfg.get("format", "memory")
    writer = out.writeStream.outputMode(mode).queryName(name)
    if cfg.get("checkpoint"):
        writer = writer.option("checkpointLocation", cfg["checkpoint"])
    if fmt == "upsert":
        # streaming upsert: each micro-batch MERGEs into the target by key
        # (the standard foreachBatch + MERGE production pattern). Target
        # resolution: a registered sink with merge_upsert (e.g.
        # DeltaMergeSink — transactional MERGE INTO at scale) wins; else
        # the engine's in-memory registry gets anti-join + union semantics
        # (exactly the engine's batch UPSERT).
        target = cfg.get("target", name)
        key = cfg.get("key")
        if engine is None or key is None:
            raise ValueError("WITH {'format': 'upsert'} requires a key and an engine-backed target")

        # within-batch dedup ordering: a real recency column (WITH
        # {'order_by': 'event_ts'}) gives latest-wins; without one the
        # kept row per key is ARBITRARY (same as LIMIT 1 without ORDER BY)
        order_col = cfg.get("order_by")

        def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
            from pyspark.sql import Window

            ranked = batch_df.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(key).orderBy(
                        F.col(order_col).desc_nulls_last() if order_col else F.lit(1)
                    )
                ),
            )
            newest = ranked.filter(F.col("__rn") == 1).drop("__rn")
            sink = engine.sinks.get(target.lower())
            if sink is not None and hasattr(sink, "merge_upsert"):
                sink.merge_upsert(newest, key)
                return
            cur = engine.tables.get(target.lower())
            if cur is None:
                merged = newest
            else:
                merged = cur.join(newest.select(key), on=key, how="left_anti").unionByName(newest)
            # materialize EXECUTOR-side: the lazy plan over the stream
            # batch would be unreadable after the micro-batch ends, but a
            # driver collect() round-trip grows with TABLE size per batch —
            # localCheckpoint writes the merged snapshot to block storage
            # and truncates lineage instead (driver-safe at any table size)
            engine.register_df(target, merged.localCheckpoint(eager=True))

        return writer.foreachBatch(merge_batch).start()
    if fmt == "replicate":
        # turnkey CDC replication: apply the change feed (a stream_changes /
        # WITH {'changes': true} frame) to a target table so it converges to
        # the source. Per micro-batch: keep each key's LATEST non-preimage
        # row (rank by _commit_version — a batch may span several commits),
        # then ONE 3-arm MERGE (delete tombstones / update matches / insert
        # novelties) through the engine — sinks take their native/persist-
        # once MERGE path, so the apply is O(|batch|) + one target commit.
        target = cfg.get("target")
        key = cfg.get("key")
        if engine is None or not target or not key:
            raise ValueError(
                "WITH {'format': 'replicate'} requires an engine, a 'target' table and "
                "the replication 'key'"
            )
        src_name = f"__cdf_apply_{name}".lower()
        if src_name in engine.tables or src_name in engine.sinks:
            raise ValueError(
                f"WITH {{'format': 'replicate'}}: internal source name {src_name!r} is "
                "taken; one replicate stream per view name per engine"
            )
        meta = {"_change_type", "_commit_version", "_commit_timestamp"}
        missing = meta - set(out.columns)
        if missing or key not in out.columns:
            raise ValueError(
                f"WITH {{'format': 'replicate'}}: the stream must carry {sorted(meta)} and "
                f"the key {key!r} (read the source WITH {{'changes': true}}); missing: "
                f"{sorted(missing) or [key]}"
            )
        data_cols = [c for c in out.columns if c not in meta]
        sets = ", ".join(f"{c} = {src_name}.{c}" for c in data_cols if c != key)
        ins_cols = ", ".join(data_cols)
        ins_vals = ", ".join(f"{src_name}.{c}" for c in data_cols)
        stmt_text = (
            f"MERGE INTO {target} USING {src_name} ON {target}.{key} = {src_name}.{key} "
            f"WHEN MATCHED AND {src_name}._change_type = 'delete' THEN DELETE "
            + (f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else "")
            + f"WHEN NOT MATCHED AND {src_name}._change_type <> 'delete' "
            f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )
        from ..rel import parse_sql

        parse_sql(stmt_text)  # validate ONCE at stream start

        def apply_cdf_batch(batch_df: DataFrame, batch_id: int) -> None:
            from pyspark.sql import Window

            latest = (
                batch_df.filter(F.col("_change_type") != "update_preimage")
                .withColumn(
                    "__rn",
                    F.row_number().over(
                        Window.partitionBy(key).orderBy(F.col("_commit_version").desc())
                    ),
                )
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            prev = engine.tables.get(src_name)
            engine.register_df(src_name, latest)
            try:
                engine.execute_stmt(parse_sql(stmt_text))
            finally:
                if prev is not None:
                    engine.register_df(src_name, prev)
                else:
                    engine.tables.pop(src_name, None)
                    engine.clear_plan_cache()

        return writer.foreachBatch(apply_cdf_batch).start()
    if fmt == "merge":
        # streaming MERGE: each micro-batch is registered under a source
        # name and an arbitrary MERGE INTO statement runs against it —
        # the canonical CDC ingestion recipe (foreachBatch + MERGE:
        # conditional UPDATE arms, DELETE on tombstone rows, filtered
        # INSERT). Strictly more expressive than 'upsert' (whole-row
        # latest-wins); targets registered merge sinks get the engine's
        # native/persist-once MERGE path per batch.
        stmt_text = cfg.get("merge")
        if engine is None or not stmt_text:
            raise ValueError(
                "WITH {'format': 'merge'} requires an engine and a 'merge' "
                "statement text (MERGE INTO <target> USING <source_name> ...)"
            )
        src_name = str(cfg.get("source_name", "batch")).lower()
        from ..rel import SqlMerge, parse_sql

        # the micro-batch is registered engine-wide under src_name for the
        # duration of each batch (foreachBatch runs on a streaming thread);
        # a name that shadows an existing table would let concurrent engine
        # queries in the same process read micro-batch data under that name
        # or race the restore — reject the collision at stream START.
        # Single-writer assumption: one stream per source_name per engine.
        if src_name in engine.tables or src_name in engine.sinks:
            raise ValueError(
                f"WITH {{'format': 'merge'}}: source_name {src_name!r} collides with an "
                "already-registered table/sink; pick an unused name (the micro-batch is "
                "registered under it engine-wide for each batch)"
            )
        parsed = parse_sql(stmt_text)  # validate ONCE at stream start
        if not isinstance(parsed, SqlMerge):
            raise ValueError("WITH {'format': 'merge'}: 'merge' must be a MERGE INTO statement")
        if (parsed.source or "").lower() != src_name or parsed.source_query is not None:
            raise ValueError(
                f"WITH {{'format': 'merge'}}: the MERGE must read USING {src_name!r} "
                "(the per-micro-batch source registration)"
            )

        def run_merge_batch(batch_df: DataFrame, batch_id: int) -> None:
            prev = engine.tables.get(src_name)
            engine.register_df(src_name, batch_df)
            try:
                # re-parse per batch: the engine's MERGE normalizes clause
                # SET keys in place, and a fresh tree keeps batches
                # independent
                engine.execute_stmt(parse_sql(stmt_text))
            finally:
                if prev is not None:
                    engine.register_df(src_name, prev)
                else:
                    engine.tables.pop(src_name, None)
                    engine.clear_plan_cache()

        return writer.foreachBatch(run_merge_batch).start()
    if fmt == "memory":
        return writer.format("memory").start()
    return writer.format(fmt).option("path", cfg["sink_path"]).start()
