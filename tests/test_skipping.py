"""File-level data skipping over versioned parquet sinks (skipping.py).

The contract under test, in order of importance:
1. NEVER false-drop — every pruned query returns exactly what the
   unpruned scan + full WHERE returns, including NULL rows, type-coerced
   comparisons, and all-pruned edge cases.
2. Actually prune — on a range-clustered layout, selective predicates
   read strictly fewer files (``sink.last_scan`` + input_file_name()).
3. Compose with OPTIMIZE ZORDER BY — after clustering on (a, b), point
   predicates on EITHER column prune.
"""

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.rel import parse_sql
from qlbridge_spark.skipping import (
    InConjunct,
    NullConjunct,
    RangeConjunct,
    extract_conjuncts,
)


def _where(sql: str):
    return parse_sql(sql).where


def _conj(sql: str, refs={"t"}, allow_bare=True):
    return extract_conjuncts(_where(sql), refs, allow_bare)


class TestConjunctExtraction:
    def test_simple_shapes(self):
        assert _conj("SELECT * FROM t WHERE a = 5") == [InConjunct("a", (5,))]
        assert _conj("SELECT * FROM t WHERE a > 5") == [RangeConjunct("a", lo=5, lo_inc=False)]
        assert _conj("SELECT * FROM t WHERE 5 >= a") == [RangeConjunct("a", hi=5, hi_inc=True)]
        assert _conj("SELECT * FROM t WHERE a IN (1, 2, 3)") == [InConjunct("a", (1, 2, 3))]
        assert _conj("SELECT * FROM t WHERE a IS NULL") == [NullConjunct("a", True)]
        assert _conj("SELECT * FROM t WHERE a IS NOT NULL") == [NullConjunct("a", False)]

    def test_between_is_exclusive(self):
        (c,) = _conj("SELECT * FROM t WHERE a BETWEEN 1 AND 9")
        assert c == RangeConjunct("a", lo=1, lo_inc=False, hi=9, hi_inc=False)

    def test_and_tree_and_qualified(self):
        got = _conj('SELECT * FROM t WHERE t.a = 1 AND b < "x" AND (c > 2 AND d = 3)')
        assert set(got) == {
            InConjunct("a", (1,)),
            RangeConjunct("b", hi="x", hi_inc=False),
            RangeConjunct("c", lo=2, lo_inc=False),
            InConjunct("d", (3,)),
        }

    def test_unusable_shapes_ignored(self):
        # disjunction, negation, col-vs-col, functions, subqueries: no prune
        assert _conj("SELECT * FROM t WHERE a = 1 OR b = 2") == []
        assert _conj("SELECT * FROM t WHERE NOT (a = 1)") == []
        assert _conj("SELECT * FROM t WHERE a != 5") == []
        assert _conj("SELECT * FROM t WHERE a NOT IN (1, 2)") == []
        assert _conj("SELECT * FROM t WHERE a = b") == []
        assert _conj("SELECT * FROM t WHERE lower(a) = 'x'") == []
        # the usable half of a mixed AND still extracts
        assert _conj("SELECT * FROM t WHERE a = 1 AND (b = 2 OR c = 3)") == [
            InConjunct("a", (1,))
        ]

    def test_bare_columns_gated_on_single_source(self):
        assert _conj("SELECT * FROM t WHERE a = 1", allow_bare=False) == []
        assert _conj("SELECT * FROM t WHERE t.a = 1", allow_bare=False) == [
            InConjunct("a", (1,))
        ]
        # qualified with a DIFFERENT ref: belongs to another table
        assert _conj("SELECT * FROM t WHERE o.a = 1", refs={"t"}) == []
        # 3-part paths are map traversals, never pruned
        assert _conj("SELECT * FROM t WHERE t.a.b = 1") == []


@pytest.fixture()
def sinked(spark, tmp_path):
    """Engine + sink over 1000 rows laid out in 8 id-clustered files, with
    a string category, some NULLs, and a float score."""
    from pyspark.sql import functions as F

    from qlbridge_spark.sinks import ParquetMergeSink

    df = (
        spark.range(1000)
        .select(
            F.col("id"),
            F.concat(F.lit("cat_"), (F.col("id") % 7).cast("string")).alias("cat"),
            F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 1.5).alias("score"),
        )
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
    )
    sink = ParquetMergeSink(spark, str(tmp_path / "skip_t"), key="id")
    sink.ensure(df)
    eng = Engine(spark, "skip-test")
    eng.register_sink("t", sink)
    return eng, sink


def _files_read(df) -> int:
    from pyspark.sql import functions as F

    return df.select(F.input_file_name()).distinct().count()


class TestSinkPruning:
    def test_point_query_prunes_and_matches(self, sinked):
        eng, sink = sinked
        rows = eng.sql("SELECT id, cat FROM t WHERE id = 437").collect()
        assert [(r["id"], r["cat"]) for r in rows] == [(437, "cat_3")]
        assert sink.last_scan is not None
        assert sink.last_scan["files_total"] == 8
        assert sink.last_scan["files_read"] == 1

    def test_range_query_prunes_and_matches(self, sinked):
        eng, sink = sinked
        got = {r["id"] for r in eng.sql("SELECT id FROM t WHERE id >= 900").collect()}
        assert got == set(range(900, 1000))
        assert sink.last_scan["files_read"] < sink.last_scan["files_total"]

    def test_between_exclusive_boundary_correct(self, sinked):
        eng, sink = sinked
        got = sorted(r["id"] for r in eng.sql("SELECT id FROM t WHERE id BETWEEN 248 AND 252").collect())
        assert got == [249, 250, 251]  # engine BETWEEN is exclusive

    def test_all_pruned_returns_empty_with_schema(self, sinked):
        eng, sink = sinked
        df = eng.sql("SELECT id, score FROM t WHERE id = 99999")
        assert df.columns == ["id", "score"]
        assert df.count() == 0
        assert sink.last_scan["files_read"] == 1  # schema-pinning file only

    def test_in_set_prunes(self, sinked):
        eng, sink = sinked
        got = {r["id"] for r in eng.sql("SELECT id FROM t WHERE id IN (3, 5, 996)").collect()}
        assert got == {3, 5, 996}
        # 3 and 5 share the first file; 996 is in the last
        assert sink.last_scan["files_read"] == 2

    def test_null_rows_and_residual_filter_survive(self, sinked):
        eng, sink = sinked
        # score has NULLs (every 10th id); pruning on id must not lose the
        # NULL-score rows, and the non-pushable conjunct still applies
        rows = eng.sql(
            "SELECT id, score FROM t WHERE id >= 990 AND score IS NULL"
        ).collect()
        assert [(r["id"], r["score"]) for r in rows] == [(990, None)]

    def test_string_column_unpruned_but_correct(self, sinked):
        eng, sink = sinked
        # cat is uncorrelated with the id layout → stats can't prune it,
        # every file intersects; correctness is what matters
        n = eng.sql('SELECT count(*) AS n FROM t WHERE cat = "cat_3"').collect()[0]["n"]
        assert n == 143  # ids ≡ 3 (mod 7) in [0, 1000)

    def test_join_uses_qualified_conjuncts_only(self, sinked):
        eng, sink = sinked
        eng.register_df(
            "dims",
            eng.spark.createDataFrame([(437, "x"), (3, "y")], "id long, tag string"),
        )
        rows = eng.sql(
            "SELECT t.id, d.tag FROM t JOIN dims d ON t.id = d.id WHERE t.id > 400"
        ).collect()
        assert [(r["id"], r["tag"]) for r in rows] == [(437, "x")]
        assert sink.last_scan["files_read"] < sink.last_scan["files_total"]

    def test_time_travel_scan_prunes_old_version(self, sinked):
        eng, sink = sinked
        eng.execute("DELETE FROM t WHERE id < 500")  # v1
        assert eng.sql("SELECT count(*) AS n FROM t WHERE id = 42").collect()[0]["n"] == 0
        got = eng.sql("SELECT id FROM t VERSION AS OF 0 WHERE id = 42").collect()
        assert [r["id"] for r in got] == [42]
        assert sink.last_scan == {"files_total": 8, "files_read": 1, "version": 0}

    def test_equivalence_sweep_vs_unpruned(self, sinked):
        """Pruned results == full-scan results for a predicate batch that
        walks the tricky shapes (boundaries, NULLs, mixed conjuncts)."""
        eng, sink = sinked
        # registry tables never route through scan_pruned → same engine
        # semantics, no pruning: the perfect differential oracle
        eng.register_df("t_full", sink.scan(eng.spark))
        for pred in [
            "id = 0",
            "id = 999",
            "id <= 0",
            "id > 998",
            "id BETWEEN 124 AND 126",
            "id IN (1, 500, 999)",
            "score IS NULL AND id < 50",
            "score IS NOT NULL AND id >= 950",
            "id > 100 AND id < 110 AND cat = 'cat_5'",
            "score > 1490.0",
        ]:
            got = sorted(
                tuple(r) for r in eng.sql(f"SELECT id, cat, score FROM t WHERE {pred}").collect()
            )
            want = sorted(
                tuple(r)
                for r in eng.sql(f"SELECT id, cat, score FROM t_full WHERE {pred}").collect()
            )
            assert got == want, pred


class TestPruningFuzz:
    def test_randomized_predicates_never_false_drop(self, sinked):
        """Property: for randomized conjunctive predicates over int/
        float/string columns (boundary-biased literals, IN sets, null
        checks, BETWEEN), the pruned sink scan equals the unpruned
        registry scan under the same engine semantics."""
        import random

        eng, sink = sinked
        eng.register_df("t_fuzz", sink.scan(eng.spark))
        rng = random.Random(0xC0FFEE)
        int_lits = [0, 1, 124, 125, 126, 437, 500, 998, 999, 1000, -5, 99999]
        str_lits = ["cat_0", "cat_3", "cat_6", "cat_7", "aaa", "zzz", ""]
        flt_lits = [0.0, 1.5, 748.5, 1498.5, 1500.0, -1.0]

        def atom():
            kind = rng.choice(["int_cmp", "str_cmp", "flt_cmp", "in", "null", "between"])
            if kind == "int_cmp":
                return f"id {rng.choice(['=', '<', '<=', '>', '>='])} {rng.choice(int_lits)}"
            if kind == "str_cmp":
                return f"cat {rng.choice(['=', '<', '<=', '>', '>='])} '{rng.choice(str_lits)}'"
            if kind == "flt_cmp":
                return f"score {rng.choice(['=', '<', '<=', '>', '>='])} {rng.choice(flt_lits)}"
            if kind == "in":
                col, lits = rng.choice([("id", int_lits), ("cat", [f"'{s}'" for s in str_lits])])
                vals = ", ".join(str(v) for v in rng.sample(lits, rng.randint(1, 3)))
                return f"{col} IN ({vals})"
            if kind == "null":
                return f"score IS {rng.choice(['NULL', 'NOT NULL'])}"
            lo, hi = sorted(rng.sample(int_lits, 2))
            return f"id BETWEEN {lo} AND {hi}"

        for i in range(40):
            pred = " AND ".join(atom() for _ in range(rng.randint(1, 3)))
            got = sorted(
                tuple(r)
                for r in eng.sql(f"SELECT id, cat, score FROM t WHERE {pred}").collect()
            )
            want = sorted(
                tuple(r)
                for r in eng.sql(f"SELECT id, cat, score FROM t_fuzz WHERE {pred}").collect()
            )
            assert got == want, (i, pred)


class TestZorderComposition:
    def test_zorder_prunes_both_columns_e2e(self, spark, tmp_path):
        """OPTIMIZE ZORDER BY (a, b) then point-query each dimension
        through the engine: both predicates must skip files now (the
        ZORDER_r10.md intersect counts, acted on end-to-end)."""
        from pyspark.sql import functions as F

        from qlbridge_spark.sinks import ParquetMergeSink

        df = spark.range(4096).select(
            F.col("id").alias("a"),
            ((F.col("id") * 2654435761) % 4096).alias("b"),
            F.lit("x").alias("pad"),
        )
        sink = ParquetMergeSink(spark, str(tmp_path / "z_t"), key="a")
        sink.ensure(df.repartition(16))
        eng = Engine(spark, "z-test")
        eng.register_sink("zt", sink)
        eng.session_vars["optimize.target_file_mb"] = 1  # keep multiple files
        res = eng.execute("OPTIMIZE zt ZORDER BY (a, b)")
        assert res  # committed a new version

        # force ≥4 files in the clustered snapshot for a meaningful test
        files = sink._snapshot_stats(sink._version())[0]
        if files < 4:
            from qlbridge_spark.datapipe.zorder import cluster_frame

            sink._commit(cluster_frame(sink.scan(spark), ["a", "b"], 8))
            files = sink._snapshot_stats(sink._version())[0]
        assert files >= 4

        a_rows = eng.sql("SELECT a, b FROM zt WHERE a = 1000").collect()
        assert len(a_rows) == 1
        a_read = sink.last_scan["files_read"]
        b_val = a_rows[0]["b"]
        b_rows = eng.sql(f"SELECT a FROM zt WHERE b = {b_val}").collect()
        assert any(r["a"] == 1000 for r in b_rows)
        b_read = sink.last_scan["files_read"]
        assert a_read < files
        assert b_read < files

    def test_input_file_count_matches_last_scan(self, sinked):
        eng, sink = sinked
        df = eng.sql("SELECT id FROM t WHERE id < 130")
        n_files = _files_read(df)
        assert n_files == sink.last_scan["files_read"]
        assert n_files < 8


class TestObservability:
    def test_explain_analyze_reports_data_skipping(self, sinked):
        eng, sink = sinked
        report = eng.explain_analyze("SELECT id FROM t WHERE id = 437")
        assert "DataSkipping: t: read 1/8 files of v0" in report
        # a statement not touching the sink reports nothing, even though
        # last_scan still holds the previous record
        eng.register_df("plain", eng.spark.range(5))
        report2 = eng.explain_analyze("SELECT * FROM plain")
        assert "DataSkipping" not in report2


class TestStatsSidecar:
    def test_sidecar_written_at_commit(self, sinked):
        import json
        import os

        _, sink = sinked
        p = os.path.join(sink._data_dir(0), "_stats.json")
        assert os.path.exists(p)
        stats = json.load(open(p))
        assert len(stats["files"]) == 8
        some = next(iter(stats["files"].values()))
        assert some["columns"]["id"]["t"] == "int"
        assert "schema" in stats

    def test_legacy_snapshot_without_sidecar_full_scans(self, sinked):
        import os

        eng, sink = sinked
        os.remove(os.path.join(sink._data_dir(0), "_stats.json"))
        rows = eng.sql("SELECT id FROM t WHERE id = 7").collect()
        assert [r["id"] for r in rows] == [7]
        assert sink.last_scan is None  # fell back to the plain scan
