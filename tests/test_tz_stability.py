"""Session-timezone stability (round-7 verdict, "What's missing" #2).

Contract: TIMESTAMP_NTZ wall times mean UTC. Epoch-extracting paths
(epoch_us / totimestamp / unixtrunc / toint / EXTRACT(epoch), asof
tolerance, session gaps) must return the SAME values under any
``spark.sql.session.timeZone`` — they route through tzutil's NTZ-native
``timestampdiff`` instead of a session-tz ``cast("timestamp_ltz")``
round trip. Wall functions (hour/date_trunc rendering) keep their
wall-preserving behavior, which is session-stable by construction.

Every test here runs its workload twice — under UTC and under
Europe/Berlin (a DST timezone, including walls inside the 2024-03-31
spring-forward gap where session-tz interpretation is not even
well-defined) — and asserts identical results.
"""

from __future__ import annotations

import contextlib
import datetime

from pyspark.sql import functions as F

from qlbridge_spark import Engine

BERLIN = "Europe/Berlin"


@contextlib.contextmanager
def session_tz(spark, tz: str):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def _ntz_df(spark, walls: list[str], extra: str = ""):
    """Single-column TIMESTAMP_NTZ frame from wall-time strings
    (to_timestamp_ntz parses the wall directly — no session tz)."""
    df = spark.createDataFrame([(w,) for w in walls], "w string")
    return df.select(F.to_timestamp_ntz("w").alias("ts"), *([F.col("w")] if extra else []))


WALLS = [
    "2024-06-01 12:00:00",  # Berlin DST (+02:00)
    "2024-01-15 00:30:00",  # Berlin standard (+01:00)
    "2024-03-31 02:30:00",  # inside Berlin's spring-forward gap
    "2024-10-27 02:30:00",  # inside Berlin's fall-back overlap
    "1999-12-31 23:59:59",
]


def _utc_epoch_us(wall: str) -> int:
    dt = datetime.datetime.fromisoformat(wall).replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * 1_000_000)


class TestEpochFunctions:
    def _engine_vals(self, spark, sql: str) -> list:
        eng = Engine(spark, "tz-test")
        eng.register_df("t", _ntz_df(spark, WALLS))
        return [r["v"] for r in eng.sql(sql).orderBy("v").collect()]

    def test_epoch_us_is_utc_and_tz_independent(self, spark):
        sql = "SELECT epoch_us(ts) AS v FROM t"
        with session_tz(spark, "UTC"):
            utc = self._engine_vals(spark, sql)
        with session_tz(spark, BERLIN):
            ber = self._engine_vals(spark, sql)
        assert utc == ber == sorted(_utc_epoch_us(w) for w in WALLS)

    def test_epoch_seconds_family_tz_independent(self, spark):
        for sql in (
            "SELECT totimestamp(ts) AS v FROM t",
            "SELECT toint(ts) AS v FROM t",
            "SELECT EXTRACT(epoch FROM ts) AS v FROM t",
        ):
            with session_tz(spark, "UTC"):
                utc = self._engine_vals(spark, sql)
            with session_tz(spark, BERLIN):
                ber = self._engine_vals(spark, sql)
            assert utc == ber, sql
        with session_tz(spark, "UTC"):
            assert self._engine_vals(spark, "SELECT totimestamp(ts) AS v FROM t") == sorted(
                _utc_epoch_us(w) // 1_000_000 for w in WALLS
            )

    def test_unixtrunc_units_tz_independent(self, spark):
        for unit in ("s", "m", "h", "d", "w", "M", "y"):
            sql = f'SELECT unixtrunc(ts, "{unit}") AS v FROM t'
            with session_tz(spark, "UTC"):
                utc = self._engine_vals(spark, sql)
            with session_tz(spark, BERLIN):
                ber = self._engine_vals(spark, sql)
            assert utc == ber, unit
            # truncation in UTC walls, cross-checked in python
            want = sorted(
                int(
                    datetime.datetime.fromisoformat(w)
                    .replace(tzinfo=datetime.timezone.utc)
                    .timestamp()
                )
                for w in WALLS
            )
            if unit == "s":
                assert utc == want

    def test_unixtrunc_calendar_units_match_utc_walls(self, spark):
        import calendar

        def trunc(w: str, unit: str) -> int:
            d = datetime.datetime.fromisoformat(w)
            if unit == "h":
                d = d.replace(minute=0, second=0)
            elif unit == "d":
                d = d.replace(hour=0, minute=0, second=0)
            elif unit == "w":
                d = (d - datetime.timedelta(days=d.weekday())).replace(hour=0, minute=0, second=0)
            elif unit == "M":
                d = d.replace(day=1, hour=0, minute=0, second=0)
            elif unit == "y":
                d = d.replace(month=1, day=1, hour=0, minute=0, second=0)
            return calendar.timegm(d.timetuple())

        for unit in ("h", "d", "w", "M", "y"):
            with session_tz(spark, BERLIN):
                got = self._engine_vals(spark, f'SELECT unixtrunc(ts, "{unit}") AS v FROM t')
            assert got == sorted(trunc(w, unit) for w in WALLS), unit


class TestAsofAndSessionsUnderBerlin:
    def _asof(self, spark):
        from qlbridge_spark.datapipe.asof import asof_join

        left = _ntz_df(spark, ["2024-03-31 02:45:00", "2024-06-01 12:00:30", "2024-06-01 13:00:00"])
        right = _ntz_df(spark, ["2024-03-31 02:00:00", "2024-06-01 12:00:00"]).withColumn(
            "px", F.hour("ts").cast("long")
        )
        out = asof_join(left, right, on="ts", tolerance_seconds=3600)
        # collect NTZ walls (tz-independent render) + matched payload
        return sorted((str(r["ts"]), r["px"]) for r in out.collect())

    def test_asof_tolerance_tz_independent(self, spark):
        with session_tz(spark, "UTC"):
            utc = self._asof(spark)
        with session_tz(spark, BERLIN):
            ber = self._asof(spark)
        assert utc == ber
        # the 02:45 row is 45min from 02:00 → within 1h tolerance
        assert utc[0][1] is not None

    def test_session_gaps_tz_independent(self, spark):
        from qlbridge_spark.datapipe.sessions import session_stats

        walls = [
            "2024-03-31 01:50:00",
            "2024-03-31 02:10:00",  # 20min gap (inside Berlin's skipped hour)
            "2024-03-31 03:30:00",  # 80min gap → new session
            "2024-06-01 12:00:00",
        ]
        df = _ntz_df(spark, walls).withColumn("user_id", F.lit(1))

        def run():
            return sorted(
                (r["session_seq"], str(r["t_start"]), str(r["t_end"]), r["n_events"], r["duration_s"])
                for r in session_stats(df, "user_id", "ts", 30.0).collect()
            )

        with session_tz(spark, "UTC"):
            utc = run()
        with session_tz(spark, BERLIN):
            ber = run()
        assert utc == ber
        assert [r[0] for r in utc] == [1, 2, 3]
        assert utc[0][3] == 2 and utc[0][4] == 20 * 60


class TestEngineOracleUnderBerlin:
    def test_epoch_us_matches_duckdb_on_events_parquet(self, spark):
        """The actual oracle pin: engine epoch_us over the driver's NTZ
        parquet equals DuckDB's epoch_us — with the SESSION TZ set to
        Europe/Berlin (DuckDB timestamps are naive → UTC-interpreted)."""
        import duckdb

        path = "/root/testdata/sf0.001/events.parquet"
        want = sorted(
            v for (v,) in duckdb.sql(f"SELECT epoch_us(ts) FROM '{path}' LIMIT 500").fetchall()
        )
        with session_tz(spark, BERLIN):
            eng = Engine(spark, "tz-oracle")
            eng.register_df("events", spark.read.parquet(path).limit(500))
            got = sorted(r["v"] for r in eng.sql("SELECT epoch_us(ts) AS v FROM events").collect())
        assert got == want
