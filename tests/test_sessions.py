"""Sessionization operator tests: batch window variant and streaming
applyInPandasWithState variant."""

import datetime

from pyspark.sql import functions as F


def _ev(uid, minute):
    return (uid, datetime.datetime(2024, 1, 1, 10, minute))


class TestBatchSessionize:
    def test_gap_splits_sessions(self, spark):
        from qlbridge_spark.datapipe import session_stats, sessionize

        rows = [_ev(1, 0), _ev(1, 5), _ev(1, 50), _ev(1, 55), _ev(2, 0)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        s = sessionize(df, "user_id", "ts", gap_minutes=30)
        got = {(r["user_id"], r["ts"].minute): r["session_seq"] for r in s.collect()}
        assert got[(1, 0)] == 1 and got[(1, 5)] == 1
        assert got[(1, 50)] == 2 and got[(1, 55)] == 2
        assert got[(2, 0)] == 1

        stats = session_stats(df, "user_id", "ts", gap_minutes=30).collect()
        by_key = {(r["user_id"], r["session_seq"]): r for r in stats}
        assert by_key[(1, 1)]["n_events"] == 2
        assert by_key[(1, 2)]["duration_s"] == 300

    def test_single_shuffle_plan(self, spark):
        from qlbridge_spark.datapipe import sessionize

        df = spark.createDataFrame([_ev(1, 0)], "user_id long, ts timestamp")
        plan = sessionize(df, "user_id", "ts")._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        # one exchange for the window partition, none extra
        assert plan.count("Exchange") == 1


class TestStreamingSessionize:
    def test_stateful_stream(self, spark, tmp_path):
        from qlbridge_spark.datapipe import sessionize_stream

        rows = [_ev(1, 0), _ev(1, 5), _ev(1, 50), _ev(2, 0)]
        batch = spark.createDataFrame(rows, "user_id long, ts timestamp")
        stream_dir = str(tmp_path / "sess_stream")
        batch.write.parquet(stream_dir)

        stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
        # state_timeout=False so processAllAvailable() can quiesce in-test
        out = sessionize_stream(stream, "user_id", "ts", gap_minutes=30, state_timeout=False)
        q = out.writeStream.format("memory").queryName("sess_out").outputMode("update").start()
        try:
            q.processAllAvailable()
            res = spark.sql("SELECT * FROM sess_out").collect()
            by_key = {(r["user_id"], r["session_seq"]): r["n_events"] for r in res}
            assert by_key[(1, 1)] == 2  # events at :00 and :05
            assert by_key[(1, 2)] == 1  # event at :50 rolls a new session
            assert by_key[(2, 1)] == 1
        finally:
            q.stop()


class TestNativeSessionWindow:
    def test_native_matches_window_fn_sessionization(self, spark):
        import datetime
        import random

        from qlbridge_spark.datapipe.sessions import session_stats, session_stats_native

        rng = random.Random(7)
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for u in range(20):
            t = base
            for _ in range(rng.randint(1, 30)):
                t = t + datetime.timedelta(minutes=rng.choice([1, 5, 20, 45, 90]))
                rows.append((u, t))
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        via_window = {
            (r.user_id, r.t_start, r.t_end, r.n_events, r.duration_s)
            for r in session_stats(df, "user_id", "ts", 30.0).collect()
        }
        via_native = {
            (r.user_id, r.t_start, r.t_end, r.n_events, r.duration_s)
            for r in session_stats_native(df, "user_id", "ts", 30.0).collect()
        }
        assert via_native == via_window

    def test_native_plan_is_jvm_only_one_exchange(self, spark):
        import datetime

        from qlbridge_spark.datapipe.sessions import session_stats_native

        df = spark.createDataFrame([(1, datetime.datetime(2024, 1, 1))], "user_id long, ts timestamp")
        plan = session_stats_native(df, "user_id", "ts")._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and plan.count("Exchange") == 1
