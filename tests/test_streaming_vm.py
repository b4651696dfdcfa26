"""Streaming extension (CREATE CONTINUOUSVIEW → Structured Streaming) and
vm.Eval-parity API tests."""

import datetime

import pytest
from pyspark.sql import functions as F


class TestContinuousView:
    def test_continuous_view_end_to_end(self, spark, tmp_path):
        """CONTINUOUSVIEW is lex/parse-only in the reference
        (exec/ddl.go:54-97 → ErrNotImplemented); here it runs on
        Structured Streaming — strict superset (SURVEY §2.12)."""
        from qlbridge_spark import Engine

        eng = Engine(spark)
        rows = [
            (1, "click", 2.0, datetime.datetime(2024, 1, 1, 10, 0)),
            (2, "click", 3.0, datetime.datetime(2024, 1, 1, 10, 1)),
            (3, "view", 5.0, datetime.datetime(2024, 1, 1, 10, 2)),
        ]
        batch = spark.createDataFrame(rows, "event_id long, event_type string, value double, ts timestamp")
        stream_dir = str(tmp_path / "events_stream")
        batch.write.parquet(stream_dir)
        eng.register_df("ev", batch)  # schema source

        q = eng.execute(
            'CREATE CONTINUOUSVIEW ev_counts AS SELECT event_type, count(*) AS n, sum(value) AS total '
            f'FROM ev GROUP BY event_type WITH {{"path": "{stream_dir}", "output_mode": "complete"}}'
        )
        try:
            q.processAllAvailable()
            out = {r["event_type"]: (r["n"], r["total"]) for r in spark.sql("SELECT * FROM ev_counts").collect()}
            assert out == {"click": (2, 5.0), "view": (1, 5.0)}

            # stream is live: append a new file, re-process
            more = spark.createDataFrame(
                [(4, "view", 7.0, datetime.datetime(2024, 1, 1, 10, 3))],
                "event_id long, event_type string, value double, ts timestamp",
            )
            more.write.mode("append").parquet(stream_dir)
            q.processAllAvailable()
            out2 = {r["event_type"]: (r["n"], r["total"]) for r in spark.sql("SELECT * FROM ev_counts").collect()}
            assert out2["view"] == (2, 12.0)
        finally:
            q.stop()

    def test_continuous_view_stream_static_join(self, spark, tmp_path):
        """JOINed sources stay batch by default → stream-static join:
        Spark re-scans the static dimension per micro-batch, no join
        state. The standard streaming-enrichment shape."""
        from qlbridge_spark import Engine

        eng = Engine(spark)
        ev = spark.createDataFrame(
            [(1, 10, 2.0), (2, 20, 3.0), (3, 10, 5.0)],
            "event_id long, user_id long, value double",
        )
        stream_dir = str(tmp_path / "ev_stream")
        ev.write.parquet(stream_dir)
        eng.register_df("ev", ev)
        eng.register_df("users_dim", spark.createDataFrame([(10, "alice"), (20, "bob")], "user_id long, name string"))

        q = eng.execute(
            "CREATE CONTINUOUSVIEW ev_enriched AS "
            "SELECT ev.event_id, users_dim.name, ev.value FROM ev "
            "JOIN users_dim ON ev.user_id = users_dim.user_id "
            f'WITH {{"path": "{stream_dir}"}}'
        )
        try:
            q.processAllAvailable()
            out = {r["event_id"]: r["name"] for r in spark.sql("SELECT * FROM ev_enriched").collect()}
            assert out == {1: "alice", 2: "bob", 3: "alice"}
        finally:
            q.stop()

    def test_continuous_view_stream_stream_join(self, spark, tmp_path):
        """Both sides streamed (WITH {'streams': ...}) → stream-stream
        join; both sides carry watermarks so Spark can evict join state
        (the unbounded-buffer killer at scale)."""
        from qlbridge_spark import Engine

        eng = Engine(spark)
        t0 = datetime.datetime(2024, 1, 1, 10, 0)
        imps = spark.createDataFrame(
            [(1, t0, "ad_a"), (2, t0 + datetime.timedelta(minutes=1), "ad_b")],
            "imp_id long, imp_ts timestamp, ad string",
        )
        clicks = spark.createDataFrame(
            [(1, t0 + datetime.timedelta(seconds=30)), (2, t0 + datetime.timedelta(minutes=2))],
            "imp_id long, click_ts timestamp",
        )
        imp_dir, click_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")
        imps.write.parquet(imp_dir)
        clicks.write.parquet(click_dir)
        eng.register_df("imps", imps)
        eng.register_df("clicks", clicks)

        q = eng.execute(
            "CREATE CONTINUOUSVIEW attributed AS "
            "SELECT imps.imp_id, imps.ad, clicks.click_ts FROM imps "
            "JOIN clicks ON imps.imp_id = clicks.imp_id "
            f'WITH {{"path": "{imp_dir}", '
            f'"watermark": {{"column": "imp_ts", "delay": "10 minutes"}}, '
            f'"streams": {{"clicks": {{"path": "{click_dir}", '
            f'"watermark": {{"column": "click_ts", "delay": "10 minutes"}}}}}}}}'
        )
        try:
            q.processAllAvailable()
            out = {r["imp_id"]: r["ad"] for r in spark.sql("SELECT * FROM attributed").collect()}
            assert out == {1: "ad_a", 2: "ad_b"}
        finally:
            q.stop()

    def test_stream_stream_join_requires_watermark(self, spark, tmp_path):
        from qlbridge_spark import Engine

        eng = Engine(spark)
        ev = spark.createDataFrame([(1, datetime.datetime(2024, 1, 1))], "id long, ts timestamp")
        d = str(tmp_path / "s1")
        ev.write.parquet(d)
        eng.register_df("s1", ev)
        eng.register_df("s2", ev)
        with pytest.raises(ValueError, match="watermark"):
            eng.execute(
                "CREATE CONTINUOUSVIEW x AS SELECT s1.id FROM s1 JOIN s2 ON s1.id = s2.id "
                f'WITH {{"path": "{d}", "watermark": {{"column": "ts"}}, '
                f'"streams": {{"s2": {{"path": "{d}"}}}}}}'
            )

    def test_continuous_view_upsert_sink(self, spark, tmp_path):
        """WITH {'format': 'upsert'}: each micro-batch MERGEs into the
        engine target by key (foreachBatch + MERGE, the production
        streaming-upsert shape; a registered merge sink — e.g. Delta —
        takes priority, in-memory registry upsert otherwise)."""
        from qlbridge_spark import Engine

        eng = Engine(spark)
        v1 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "id long, k string, v double")
        stream_dir = str(tmp_path / "up_stream")
        v1.write.parquet(stream_dir)
        eng.register_df("src", v1)

        q = eng.execute(
            "CREATE CONTINUOUSVIEW up AS SELECT id, k, v FROM src "
            f'WITH {{"path": "{stream_dir}", "format": "upsert", "target": "state_tbl", "key": "id"}}'
        )
        try:
            q.processAllAvailable()
            assert {tuple(r) for r in eng.table("state_tbl").collect()} == {(1, "a", 1.0), (2, "b", 2.0)}

            # second file: update id=2, add id=3 → MERGE semantics
            spark.createDataFrame([(2, "b2", 20.0), (3, "c", 3.0)], "id long, k string, v double").write.mode(
                "append"
            ).parquet(stream_dir)
            q.processAllAvailable()
            assert {tuple(r) for r in eng.table("state_tbl").collect()} == {
                (1, "a", 1.0),
                (2, "b2", 20.0),
                (3, "c", 3.0),
            }
        finally:
            q.stop()

    def test_continuous_view_upsert_sink_protocol(self, spark, tmp_path):
        """A registered sink exposing merge_upsert receives each batch —
        the DeltaMergeSink protocol, testable without the delta jar."""
        from qlbridge_spark import Engine

        eng = Engine(spark)
        v1 = spark.createDataFrame([(1, "a")], "id long, k string")
        stream_dir = str(tmp_path / "sink_stream")
        v1.write.parquet(stream_dir)
        eng.register_df("src2", v1)

        calls = []

        class FakeSink:
            def merge_upsert(self, df, key):
                calls.append((sorted(tuple(r) for r in df.collect()), key))

            def scan(self, spark):  # engine.table() contract
                raise NotImplementedError

        eng.register_sink("state_sink", FakeSink())
        q = eng.execute(
            "CREATE CONTINUOUSVIEW up2 AS SELECT id, k FROM src2 "
            f'WITH {{"path": "{stream_dir}", "format": "upsert", "target": "state_sink", "key": "id"}}'
        )
        try:
            q.processAllAvailable()
            assert calls == [([(1, "a")], "id")]
        finally:
            q.stop()

    def test_upsert_sink_requires_key(self, spark, tmp_path):
        from qlbridge_spark import Engine

        eng = Engine(spark)
        v1 = spark.createDataFrame([(1, "a")], "id long, k string")
        d = str(tmp_path / "nokey")
        v1.write.parquet(d)
        eng.register_df("src3", v1)
        with pytest.raises(ValueError, match="key"):
            eng.execute(
                "CREATE CONTINUOUSVIEW up3 AS SELECT id FROM src3 "
                f'WITH {{"path": "{d}", "format": "upsert"}}'
            )

    def test_continuous_view_windowed_agg(self, spark, tmp_path):
        """WITH {'window': ...}: tumbling event-time window joins the GROUP
        BY keys; watermark bounds state; append mode emits only finalized
        windows (the state-eviction contract a 100 TB/day stream needs)."""
        import json

        from qlbridge_spark import Engine

        eng = Engine(spark)
        rows = [
            (1, "click", 1.0, datetime.datetime(2024, 1, 1, 10, 0, 30)),
            (2, "click", 2.0, datetime.datetime(2024, 1, 1, 10, 4, 0)),
            (3, "click", 4.0, datetime.datetime(2024, 1, 1, 10, 6, 0)),
            (4, "view", 8.0, datetime.datetime(2024, 1, 1, 10, 7, 0)),
            # far-future row pushes the watermark past the earlier windows
            (5, "view", 0.5, datetime.datetime(2024, 1, 1, 11, 0, 0)),
        ]
        batch = spark.createDataFrame(rows, "event_id long, event_type string, value double, ts timestamp")
        stream_dir = str(tmp_path / "win_stream")
        ckpt = str(tmp_path / "ckpt")
        batch.write.parquet(stream_dir)
        eng.register_df("ev", batch)

        cfg = {
            "path": stream_dir,
            "checkpoint": ckpt,
            "output_mode": "append",
            "watermark": {"column": "ts", "delay": "1 minute"},
            "window": {"column": "ts", "duration": "5 minutes"},
        }
        q = eng.execute(
            "CREATE CONTINUOUSVIEW ev_win AS SELECT event_type, count(*) AS n, sum(value) AS total "
            f"FROM ev GROUP BY event_type WITH {json.dumps(cfg)}"
        )
        try:
            q.processAllAvailable()
            out = spark.sql("SELECT * FROM ev_win").collect()
            got = {(r["event_type"], r["window_start"].minute): (r["n"], r["total"]) for r in out}
            # windows [10:00,10:05) and [10:05,10:10) finalized by the 11:00
            # row + 1 min delay; the 11:00 window itself is still open
            assert got == {("click", 0): (2, 3.0), ("click", 5): (1, 4.0), ("view", 5): (1, 8.0)}
            assert all({"window_start", "window_end"} <= set(r.asDict()) for r in out)
        finally:
            q.stop()

    def test_continuous_view_session_window(self, spark, tmp_path):
        """WITH {'session': ...}: gap-merged session windows per group key
        (session_window keeps the event-time marker, so append mode emits
        sessions once the watermark closes them)."""
        import json

        from qlbridge_spark import Engine

        eng = Engine(spark)
        rows = [
            # user u1: two bursts separated by > 2m gap → two sessions
            (1, "u1", datetime.datetime(2024, 1, 1, 10, 0, 0)),
            (2, "u1", datetime.datetime(2024, 1, 1, 10, 1, 0)),
            (3, "u1", datetime.datetime(2024, 1, 1, 10, 10, 0)),
            # u2: one session
            (4, "u2", datetime.datetime(2024, 1, 1, 10, 2, 0)),
            # far-future row closes all earlier sessions
            (5, "u3", datetime.datetime(2024, 1, 1, 12, 0, 0)),
        ]
        batch = spark.createDataFrame(rows, "event_id long, user string, ts timestamp")
        stream_dir = str(tmp_path / "sess_stream")
        batch.write.parquet(stream_dir)
        eng.register_df("evs", batch)
        cfg = {
            "path": stream_dir,
            "checkpoint": str(tmp_path / "sess_ckpt"),
            "output_mode": "append",
            "watermark": {"column": "ts", "delay": "1 minute"},
            "session": {"column": "ts", "gap": "2 minutes"},
        }
        q = eng.execute(
            "CREATE CONTINUOUSVIEW sess AS SELECT user, count(*) AS n FROM evs "
            f"GROUP BY user WITH {json.dumps(cfg)}"
        )
        try:
            q.processAllAvailable()
            out = spark.sql("SELECT * FROM sess").collect()
            got = sorted((r["user"], r["n"], r["window_start"].minute) for r in out)
            # u1: session [10:00,10:03) n=2 and [10:10,10:12) n=1; u2: n=1
            assert got == [("u1", 1, 10), ("u1", 2, 0), ("u2", 1, 2)]
        finally:
            q.stop()

    def test_continuous_view_window_and_session_conflict(self, spark, tmp_path):
        import json

        from qlbridge_spark import Engine

        eng = Engine(spark)
        batch = spark.createDataFrame([(1, datetime.datetime(2024, 1, 1))], "event_id long, ts timestamp")
        d = str(tmp_path / "conf_stream")
        batch.write.parquet(d)
        eng.register_df("ev3", batch)
        cfg = {"path": d, "window": {"column": "ts", "duration": "5 minutes"}, "session": {"column": "ts", "gap": "1 minute"}}
        with pytest.raises(ValueError, match="not both"):
            eng.execute(f"CREATE CONTINUOUSVIEW bad2 AS SELECT count(*) AS n FROM ev3 WITH {json.dumps(cfg)}")

    def test_continuous_view_window_requires_agg(self, spark, tmp_path):
        import json

        from qlbridge_spark import Engine

        eng = Engine(spark)
        batch = spark.createDataFrame([(1, datetime.datetime(2024, 1, 1))], "event_id long, ts timestamp")
        stream_dir = str(tmp_path / "nowin_stream")
        batch.write.parquet(stream_dir)
        eng.register_df("ev2", batch)
        cfg = {"path": stream_dir, "window": {"column": "ts", "duration": "5 minutes"}}
        with pytest.raises(ValueError, match="aggregating SELECT"):
            eng.execute(f"CREATE CONTINUOUSVIEW bad AS SELECT event_id FROM ev2 WITH {json.dumps(cfg)}")

    def test_windowed_agg_helper(self, spark, tmp_path):
        from qlbridge_spark.streaming import windowed_agg

        rows = [
            ("click", 1.0, datetime.datetime(2024, 1, 1, 10, 0, 30)),
            ("click", 2.0, datetime.datetime(2024, 1, 1, 10, 4, 0)),
            ("click", 4.0, datetime.datetime(2024, 1, 1, 10, 6, 0)),
        ]
        df = spark.createDataFrame(rows, "event_type string, value double, ts timestamp")
        out = windowed_agg(df, "ts", "5 minutes", None, ["event_type"], [F.sum("value").alias("total")]).collect()
        totals = sorted(r["total"] for r in out)
        assert totals == [3.0, 4.0]


class TestStreamingDedup:
    def test_dedup_stream_within_watermark(self, spark, tmp_path):
        """Streaming exact dedup with bounded state
        (dropDuplicatesWithinWatermark) — duplicate keys arriving within
        the watermark window emit once."""
        from qlbridge_spark.streaming import dedup_stream

        rows = [
            ("k1", 1.0, datetime.datetime(2024, 1, 1, 10, 0)),
            ("k1", 2.0, datetime.datetime(2024, 1, 1, 10, 1)),  # dup key
            ("k2", 3.0, datetime.datetime(2024, 1, 1, 10, 2)),
        ]
        batch = spark.createDataFrame(rows, "key string, value double, ts timestamp")
        stream_dir = str(tmp_path / "dedup_stream")
        batch.write.parquet(stream_dir)

        src = spark.readStream.schema(batch.schema).parquet(stream_dir)
        out = dedup_stream(src, ["key"], ts_col="ts", delay="10 minutes")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = sorted(r["key"] for r in spark.sql("SELECT * FROM dedup_out").collect())
            assert got == ["k1", "k2"]
        finally:
            q.stop()

    def test_dedup_stream_batch_fallback(self, spark):
        from qlbridge_spark.streaming import dedup_stream

        df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v long")
        assert dedup_stream(df, ["k"]).count() == 2


class TestVmParity:
    def test_eval_expression(self, spark):
        from qlbridge_spark.vm import eval_expression

        assert eval_expression(spark, "x * 2 + 1", {"x": 5}) == 11

    def test_eval_many(self, spark):
        from qlbridge_spark.vm import eval_many

        got = eval_many(spark, ["a + b", 'tolower(name)', "a > b"], {"a": 2, "b": 3, "name": "Bob"})
        assert got == [5, "bob", False]

    def test_matches_with_includes(self, spark):
        from qlbridge_spark.vm import matches

        ctx = {"score": 80, "lang": "en"}
        assert matches(spark, ctx, 'FILTER AND(INCLUDE good_score, lang = "en")', includes={"good_score": "score > 50"})
        assert not matches(spark, ctx, "FILTER NOT INCLUDE good_score", includes={"good_score": "score > 50"})

    def test_eval_sql(self, spark):
        from qlbridge_spark.vm import eval_sql

        out = eval_sql(spark, "SELECT a * 2 AS dbl, toupper(s) AS up FROM ctx WHERE a > 1", {"a": 3, "s": "x"})
        assert out == {"dbl": 6, "up": "X"}
        assert eval_sql(spark, "SELECT a FROM ctx WHERE a > 99", {"a": 3, "s": "x"}) is None


class TestStreamingNearDup:
    def test_near_dup_pairs_stream(self, spark, tmp_path):
        """Stateful LSH near-dup over a file stream: exact and near
        duplicates surface as pairs; unrelated docs don't. Second batch
        matches against FIRST batch's state (cross-batch memory)."""
        from qlbridge_spark.streaming import near_dup_pairs_stream

        base = "the quick brown fox jumps over the lazy dog and runs away fast"
        # one APPENDED token: 11 of 12 shingles shared (j = 0.917). With
        # the unbiased minhash family collisions are genuinely
        # probabilistic, so the test pins a high-j pair at bands=16/r=2:
        # miss prob (1 - j²)¹⁶ ≈ 3e-13 — deterministic in practice.
        # (The old word-substitution pair sat at j = 0.57, a coin flip.)
        near = base + " indeed"
        other = "completely different content about databases and query engines here"
        b1 = spark.createDataFrame([(1, base), (4, other)], "doc_id long, text string")
        b2 = spark.createDataFrame([(2, base), (3, near)], "doc_id long, text string")

        stream_dir = str(tmp_path / "nd_stream")
        b1.write.parquet(stream_dir)

        src = spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(stream_dir)
        pairs = near_dup_pairs_stream(src, "doc_id", "text", threshold=0.5, bands=16)
        q = (
            pairs.writeStream.outputMode("append")
            .format("memory")
            .queryName("nd_out")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            # second micro-batch: docs 2 (exact dup of 1) and 3 (near dup)
            b2.write.mode("append").parquet(stream_dir)
            q.processAllAvailable()
            got = spark.sql("SELECT DISTINCT id_a, id_b, est_jaccard FROM nd_out").collect()
            found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in got}
            assert found.get((1, 2)) == 1.0  # exact dup across batches
            assert (1, 3) in found and found[(1, 3)] >= 0.5  # near dup
            assert not any(4 in p for p in found)  # unrelated never pairs
        finally:
            q.stop()

    def test_near_dup_stream_event_time_watermark(self, spark, tmp_path):
        """Event-time mode: late documents are dropped at the watermark and
        bucket state expires state_ttl_ms after its newest event — bounded
        state driven by event-time progress, not processing time."""
        import datetime as dt

        from qlbridge_spark.streaming import near_dup_pairs_stream

        base = "the quick brown fox jumps over the lazy dog and runs away fast"
        o1 = "completely different content about databases and query engines here"
        o2 = "yet another unrelated string counting words about storage formats"
        o3 = "final filler document content mentioning compilers and type systems"

        def t(hhmm):
            h, m = divmod(hhmm, 100)
            return dt.datetime(2024, 5, 1, h, m)

        schema = "doc_id long, text string, ts timestamp"
        stream_dir = str(tmp_path / "ndw_stream")
        spark.createDataFrame([(1, base, t(1000)), (4, o1, t(1000))], schema).write.parquet(stream_dir)

        src = spark.readStream.schema("doc_id long, text string, ts timestamp").option("maxFilesPerTrigger", 1).parquet(stream_dir)
        pairs = near_dup_pairs_stream(
            src, "doc_id", "text", threshold=0.5, bands=8,
            ts_col="ts", watermark_delay="2 minutes", state_ttl_ms=60_000,
        )
        q = (
            pairs.writeStream.outputMode("append")
            .format("memory")
            .queryName("ndw_out")
            .option("checkpointLocation", str(tmp_path / "ndw_ck"))
            .start()
        )
        try:
            q.processAllAvailable()  # b1: seeds state, watermark → 09:58
            # b2: doc 2 pairs with 1; doc 9 is LATE (09:00 < watermark) → dropped
            spark.createDataFrame([(2, base, t(1005)), (9, base, t(900))], schema).write.mode("append").parquet(stream_dir)
            q.processAllAvailable()  # watermark → 10:03
            # b3+b4: unrelated docs push the watermark past the base
            # bucket's timeout (10:05 + 60s = 10:06) → its state expires
            spark.createDataFrame([(5, o2, t(1100))], schema).write.mode("append").parquet(stream_dir)
            q.processAllAvailable()  # watermark → 10:58; timeout armed keys fire next batch
            spark.createDataFrame([(7, o3, t(1101))], schema).write.mode("append").parquet(stream_dir)
            q.processAllAvailable()  # base bucket has no data + watermark past 10:06 → removed
            # b5: a fresh base duplicate — state was expired, so NO pair
            spark.createDataFrame([(6, base, t(1105))], schema).write.mode("append").parquet(stream_dir)
            q.processAllAvailable()
            found = {(r["id_a"], r["id_b"]) for r in spark.sql("SELECT DISTINCT id_a, id_b FROM ndw_out").collect()}
            assert (1, 2) in found  # in-watermark dup pairs
            assert not any(9 in p for p in found), "late doc must be dropped"
            assert not any(6 in p for p in found), "state must have expired by event time"
        finally:
            q.stop()


class TestStreamingPipelineOps:
    """The round-7 curation ops compose with Structured Streaming:
    chunk_documents is a stateless projection (works on any stream);
    decontaminate is a stream-static LEFT ANTI join."""

    def test_chunk_documents_on_stream(self, spark, tmp_path):
        from qlbridge_spark.datapipe import chunk_documents

        src_dir = str(tmp_path / "chunk_src")
        b = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string")
        b.write.parquet(src_dir)
        stream = spark.readStream.schema(b.schema).parquet(src_dir)
        chunks = chunk_documents(stream, "doc_id", "text", chunk_tokens=4, overlap=1)
        assert chunks.isStreaming
        q = (
            chunks.writeStream.outputMode("append").format("memory")
            .queryName("chunk_out").option("checkpointLocation", str(tmp_path / "ck1")).start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM chunk_out ORDER BY chunk_idx").collect()
            assert [r["chunk_text"] for r in rows] == ["t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
        finally:
            q.stop()

    def test_decontaminate_stream_static(self, spark, tmp_path):
        from qlbridge_spark.datapipe import decontaminate

        src_dir = str(tmp_path / "dec_src")
        b = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "one two three four")], "doc_id long, text string"
        )
        b.write.parquet(src_dir)
        stream = spark.readStream.schema(b.schema).parquet(src_dir)
        bench = spark.createDataFrame([(9, "zz one two three qq")], "doc_id long, text string")
        clean = decontaminate(stream, bench, "doc_id", "text", n=3)
        assert clean.isStreaming
        q = (
            clean.writeStream.outputMode("append").format("memory")
            .queryName("dec_out").option("checkpointLocation", str(tmp_path / "ck2")).start()
        )
        try:
            q.processAllAvailable()
            kept = [r["doc_id"] for r in spark.sql("SELECT doc_id FROM dec_out").collect()]
            assert kept == [1]
        finally:
            q.stop()
