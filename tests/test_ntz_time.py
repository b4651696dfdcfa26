"""TIMESTAMP_NTZ safety: Spark 4 reads parquet timestamp[us] columns as
TIMESTAMP_NTZ, which rejects `cast(double)`, `unix_timestamp`, and
`unix_micros` directly. Every time builtin and datapipe time operator must
work over an NTZ-typed frame (cast through timestamp_ltz; session tz is
UTC in tests, matching DuckDB's naive-timestamp semantics)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qlbridge_spark import Engine


@pytest.fixture(scope="module")
def ntz_engine(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime.datetime(2024, 1, 1, 0, 10, 0)),
        (3, datetime.datetime(2024, 1, 1, 2, 0, 0, 500000)),
        (4, datetime.datetime(2024, 6, 15, 12, 30, 45)),
    ]
    eng = Engine(spark)
    eng.register_df("tntz", spark.createDataFrame(rows, schema))
    return eng


class TestNtzTimeBuiltins:
    def test_frame_is_ntz(self, ntz_engine):
        assert dict(ntz_engine.table("tntz").dtypes)["ts"] == "timestamp_ntz"

    def test_epoch_us(self, ntz_engine):
        got = ntz_engine.sql("SELECT id, epoch_us(ts) AS us FROM tntz ORDER BY id").collect()
        assert got[0]["us"] == 1704067200_000000
        assert got[2]["us"] == 1704067200_000000 + 7200_500000

    def test_totimestamp_epoch_seconds(self, ntz_engine):
        got = ntz_engine.sql("SELECT totimestamp(ts) AS s FROM tntz ORDER BY id").collect()
        assert got[0]["s"] == 1704067200

    def test_unixtrunc_day(self, ntz_engine):
        got = ntz_engine.sql("SELECT unixtrunc(ts, 'd') AS d FROM tntz ORDER BY id").collect()
        assert got[0]["d"] == got[1]["d"] == got[2]["d"] == 1704067200

    def test_calendar_parts(self, ntz_engine):
        got = ntz_engine.sql(
            "SELECT yy(ts) AS y, mm(ts) AS m, hourofday(ts) AS h, dayofweek(ts) AS dow FROM tntz ORDER BY id"
        ).collect()
        assert (got[0]["y"], got[0]["m"], got[0]["h"]) == (24, 1, 0)
        assert got[3]["h"] == 12


class TestNtzDatapipe:
    def test_sessionize_gap_boundaries(self, ntz_engine):
        from qlbridge_spark.datapipe.sessions import sessionize

        df = ntz_engine.table("tntz").withColumn("user", F.lit("u"))
        out = {r["id"]: r["session_seq"] for r in sessionize(df, "user", "ts", gap_minutes=30.0).collect()}
        # 0:00→0:10 same session; 0:10→2:00.5 new; →June new
        assert (out[1], out[2], out[3], out[4]) == (1, 1, 2, 3)

    def test_session_stats_duration(self, ntz_engine):
        from qlbridge_spark.datapipe.sessions import session_stats

        df = ntz_engine.table("tntz").withColumn("user", F.lit("u"))
        rows = {r["session_seq"]: r for r in session_stats(df, "user", "ts").collect()}
        assert rows[1]["duration_s"] == 600

    def test_asof_join_with_tolerance(self, ntz_engine, spark):
        from qlbridge_spark.datapipe.asof import asof_join

        left = ntz_engine.table("tntz").select("id", F.col("ts"))
        right = ntz_engine.table("tntz").select(
            (F.col("id") + 100).alias("rid"), F.col("ts")
        )
        out = asof_join(left, right, on="ts", tolerance_seconds=1.0)
        got = {r["id"]: r["rid"] for r in out.collect()}
        assert got == {1: 101, 2: 102, 3: 103, 4: 104}


class TestNtzTimezoneContract:
    def test_non_utc_session_warns_once(self, spark):
        """NTZ wall-times are interpreted in the session tz — a non-UTC
        session gets a one-time RuntimeWarning naming the contract
        (functions/__init__.py _time_arg interprets via timestamp_ltz)."""
        import warnings

        from qlbridge_spark import Engine

        prev = spark.conf.get("spark.sql.session.timeZone")
        Engine._tz_warned = False
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            with pytest.warns(RuntimeWarning, match="TIMESTAMP_NTZ"):
                Engine(spark, "tz-probe")
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                Engine(spark, "tz-probe-2")  # second construction: silent
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
            Engine._tz_warned = False

    def test_utc_session_silent(self, spark):
        import warnings

        from qlbridge_spark import Engine

        Engine._tz_warned = False
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            Engine(spark, "tz-utc-probe")
