"""Round-13 ADVICE regression pins (all four r12 advisor items were
severity 'low').

1. The T4 null-flip term of LEFT-join matview maintenance scans the
   dim's OLD snapshot; when that version was VACUUMED while its change
   recordings survive, REFRESH degrades to full recompute (mirroring
   the fact-side guard) instead of raising (engine.py).
2. Variance-family matview state is CENTERED: s = Σw(x−z),
   q = Σw(x−z)² around a per-group shift z (the group's min). Raw power
   sums cancel catastrophically for large-magnitude low-variance
   columns (epoch-millis: x² ≈ 3e24 has ulp ≈ 3e8, so q − s²/n loses
   every digit and the ≥0 clamp silently reports 0). Centered moments
   stay exact across builds, deltas, AND merges that re-center to a
   common shift (matview.py).
3. merge_upsert rejects source batches with duplicate non-null keys
   (ANSI MERGE cardinality rule) — previously the change-recording
   inner join emitted cross-product pre/post pairs and the table itself
   gained duplicate key rows (sinks.py).
4. (comment-only) the INNER self-join eligibility comment no longer
   claims DISTINCT substates are excluded — only extrema are.
"""

import math

import pytest
from pyspark.sql import functions as F

from qlbridge_spark.engine import Engine, ExecError
from qlbridge_spark.sinks import ParquetMergeSink, SinkCapabilityError


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


class TestDimVacuumGuardOnNullFlipTerm:
    def test_left_join_dim_vacuumed_falls_back_to_full(self, spark, tmp_path):
        eng = Engine(spark, "advr13-t4")
        fact = ParquetMergeSink(spark, str(tmp_path / "f"), key="id")
        fact.ensure(
            spark.createDataFrame(
                [(i, i % 4, float(i)) for i in range(30)], "id long, dk int, x double"
            )
        )
        dim = ParquetMergeSink(spark, str(tmp_path / "d"), key="dk")
        dim.ensure(
            spark.createDataFrame([(k, f"n{k}") for k in range(3)], "dk int, dname string")
        )
        eng.register_sink("f", fact)
        eng.register_sink("d", dim)
        q = (
            "SELECT f.dk AS k, count(*) AS n, count(d.dname) AS nd, sum(f.x) AS s "
            "FROM f LEFT JOIN d ON f.dk = d.dk GROUP BY f.dk"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        assert eng.mat_views["mv"].incremental
        # dim mutations that would drive the null-flip term (T4 needs
        # the dim snapshot at mv.dim_version) ...
        eng.execute("DELETE FROM d WHERE dk = 1")
        eng.execute("INSERT INTO d (dk, dname) VALUES (3, 'late')")
        # ... but that snapshot is vacuumed away; recordings survive
        dim.vacuum(keep=1)
        assert eng.mat_views["mv"].dim_version not in dim.versions()
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "full"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)
        # re-pinned: the NEXT dim mutation maintains incrementally again
        eng.execute("UPDATE d SET dname = 'zz' WHERE dk = 0")
        rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
        assert rep["mode"] == "incremental"
        assert _rows(eng, "SELECT * FROM mv") == _rows(eng, q)


class TestCenteredVarianceState:
    #: epoch-millis magnitude with seconds-scale spread: raw power sums
    #: (x² ≈ 3.1e24, ulp ≈ 3e8) would zero the variance entirely
    T0 = 1_755_000_000_000

    def _mk(self, spark, tmp_path, rows):
        eng = Engine(spark, "advr13-var")
        sink = ParquetMergeSink(spark, str(tmp_path / "t"), key="id")
        sink.ensure(spark.createDataFrame(rows, "id long, g string, x double"))
        eng.register_sink("t", sink)
        return eng

    def test_epoch_millis_variance_survives_incremental_folds(self, spark, tmp_path):
        rows = [
            (i, "g" + str(i % 2), float(self.T0 + (i * 37) % 1000)) for i in range(40)
        ]
        eng = self._mk(spark, tmp_path, rows)
        q = (
            "SELECT g, var_pop(x) AS vp, stddev(x) AS sd, count(*) AS n "
            "FROM t GROUP BY g"
        )
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        assert mv.incremental
        # several refresh windows so state folds THROUGH merge_state
        # (build → delta → merge re-centering), not just the build
        eng.execute(
            "INSERT INTO t (id, g, x) VALUES "
            f"(100, 'g0', {float(self.T0 + 1234)}), (101, 'g1', {float(self.T0 + 77)})"
        )
        assert eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["mode"] == "incremental"
        eng.execute(f"UPDATE t SET x = {float(self.T0 + 500)} WHERE id % 5 = 2")
        eng.execute("DELETE FROM t WHERE id % 7 = 3")
        assert eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["mode"] == "incremental"
        got = {r[0]: r for r in eng.sql("SELECT * FROM mv").collect()}
        want = {r[0]: r for r in eng.sql(q).collect()}
        assert set(got) == set(want)
        for g in want:
            # the true variance is O(1e4–1e5); the old raw-power-sum state
            # reported EXACTLY 0.0 here (clamped total cancellation)
            assert want[g]["vp"] > 1.0, want[g]
            assert got[g]["vp"] == pytest.approx(want[g]["vp"], rel=1e-6), (got[g], want[g])
            assert got[g]["sd"] == pytest.approx(want[g]["sd"], rel=1e-6), (got[g], want[g])

    def test_exact_known_variance_at_large_magnitude(self, spark, tmp_path):
        # hand-computable: {T0, T0+2, T0+4} → var_pop = 8/3, sample = 4
        vals = [float(self.T0), float(self.T0 + 2), float(self.T0 + 4)]
        eng = self._mk(
            spark, tmp_path, [(i, "a", v) for i, v in enumerate(vals)]
        )
        q = "SELECT g, var_pop(x) AS vp, variance(x) AS vs FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        # fold a delta through merge_state too: add T0+6 → values
        # {T0, T0+2, T0+4, T0+6}: var_pop = 5, sample = 20/3
        eng.execute(f"INSERT INTO t (id, g, x) VALUES (9, 'a', {float(self.T0 + 6)})")
        assert eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["mode"] == "incremental"
        r = eng.sql("SELECT * FROM mv").collect()[0]
        assert r["vp"] == pytest.approx(5.0, abs=1e-6)
        assert r["vs"] == pytest.approx(20.0 / 3.0, abs=1e-6)

    def test_group_net_zero_count_recentering(self, spark, tmp_path):
        # a delta whose signed non-null count nets to 0 (one insert, one
        # delete) still re-centers exactly: Σw[x non-null] = c = 0 makes
        # the (z−Z)·c correction vanish while s itself is non-zero
        eng = self._mk(
            spark, tmp_path,
            [(1, "a", float(self.T0 + 10)), (2, "a", float(self.T0 + 20)),
             (3, "a", float(self.T0 + 30))],
        )
        q = "SELECT g, var_pop(x) AS vp FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute(f"INSERT INTO t (id, g, x) VALUES (4, 'a', {float(self.T0 + 40)})")
        eng.execute("DELETE FROM t WHERE id = 1")
        assert eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["mode"] == "incremental"
        # remaining {T0+20, T0+30, T0+40}: var_pop = 200/3
        r = eng.sql("SELECT * FROM mv").collect()[0]
        assert r["vp"] == pytest.approx(200.0 / 3.0, abs=1e-6)

    def test_mixed_magnitude_groups_each_center_independently(self, spark, tmp_path):
        # per-GROUP shifts (not per-view): one group at epoch magnitude,
        # one near zero — both must come out right after a fold
        eng = self._mk(
            spark, tmp_path,
            [(1, "big", float(self.T0 + 1)), (2, "big", float(self.T0 + 3)),
             (3, "small", 1.0), (4, "small", 3.0)],
        )
        q = "SELECT g, var_pop(x) AS vp FROM t GROUP BY g"
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {q}")
        eng.execute(
            f"INSERT INTO t (id, g, x) VALUES (5, 'big', {float(self.T0 + 5)}), (6, 'small', 5.0)"
        )
        assert eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["mode"] == "incremental"
        got = {r["g"]: r["vp"] for r in eng.sql("SELECT * FROM mv").collect()}
        assert got["big"] == pytest.approx(8.0 / 3.0, abs=1e-6)
        assert got["small"] == pytest.approx(8.0 / 3.0, abs=1e-6)


class TestMergeUpsertDuplicateKeys:
    def test_duplicate_key_batch_rejected(self, spark, tmp_path):
        sink = ParquetMergeSink(spark, str(tmp_path / "t"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
        dup = spark.createDataFrame([(1, "x"), (1, "y"), (3, "z")], "id long, v string")
        with pytest.raises(SinkCapabilityError, match="duplicate"):
            sink.merge_upsert(dup)
        # table unchanged, no phantom version
        assert sink._version() == 0
        assert sink.scan(spark).count() == 2

    def test_duplicate_null_keys_stay_allowed(self, spark, tmp_path):
        # NULL keys never match a merge join — multiple null-key rows are
        # plain inserts, not a cardinality violation
        sink = ParquetMergeSink(spark, str(tmp_path / "t2"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, v string"))
        batch = spark.createDataFrame(
            [(None, "n1"), (None, "n2"), (2, "b")], "id long, v string"
        )
        sink.merge_upsert(batch)
        assert sink.scan(spark).count() == 4

    def test_unique_key_batch_still_merges(self, spark, tmp_path):
        sink = ParquetMergeSink(spark, str(tmp_path / "t3"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
        sink.merge_upsert(
            spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
        )
        got = {r["id"]: r["v"] for r in sink.scan(spark).collect()}
        assert got == {1: "a", 2: "B", 3: "c"}
