"""COPY TO / COPY FROM — DuckDB-style bulk I/O (superset; the reference
has no COPY). Writes are executor-parallel DataFrame writers; formats
parquet/csv/json(jsonl)/orc/text; PARTITION_BY produces a partitioned
layout (the 100 TB write shape)."""

from __future__ import annotations

import os

import pytest

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError


@pytest.fixture()
def eng(spark):
    e = Engine(spark, "copy-test")
    e.register_rows(
        "t",
        [
            {"id": 1, "grp": "a", "v": 1.5},
            {"id": 2, "grp": "b", "v": 2.5},
            {"id": 3, "grp": "a", "v": 3.5},
        ],
    )
    return e


class TestCopyTo:
    def test_table_to_parquet_roundtrip(self, eng, spark, tmp_path):
        p = str(tmp_path / "out_pq")
        n = eng.execute(f"COPY t TO '{p}'")
        assert n == 3
        back = spark.read.parquet(p)
        assert {tuple(r) for r in back.select("id", "grp").collect()} == {(1, "a"), (2, "b"), (3, "a")}

    def test_query_to_csv_with_options(self, eng, spark, tmp_path):
        p = str(tmp_path / "out_csv")
        n = eng.execute(f"COPY (SELECT id, v FROM t WHERE v > 2) TO '{p}' (FORMAT csv, HEADER, DELIMITER ';')")
        assert n == 2
        txt = "".join(
            open(os.path.join(p, f)).read() for f in os.listdir(p) if f.endswith(".csv")
        )
        assert "id;v" in txt and "2;2.5" in txt

    def test_partition_by_layout(self, eng, spark, tmp_path):
        p = str(tmp_path / "out_part")
        eng.execute(f"COPY t TO '{p}' (FORMAT parquet, PARTITION_BY (grp))")
        assert sorted(d for d in os.listdir(p) if d.startswith("grp=")) == ["grp=a", "grp=b"]

    def test_overwrite_flag(self, eng, tmp_path):
        p = str(tmp_path / "out_ow")
        eng.execute(f"COPY t TO '{p}'")
        with pytest.raises(Exception):  # default errorifexists
            eng.execute(f"COPY t TO '{p}'")
        assert eng.execute(f"COPY t TO '{p}' (OVERWRITE)") == 3

    def test_jsonl(self, eng, tmp_path):
        p = str(tmp_path / "out_jl")
        assert eng.execute(f"COPY t TO '{p}' (FORMAT jsonl)") == 3
        lines = [
            line
            for f in os.listdir(p)
            if f.endswith(".json")
            for line in open(os.path.join(p, f)).read().splitlines()
        ]
        assert len(lines) == 3 and all(line.startswith("{") for line in lines)

    def test_bad_format_errors(self, eng, tmp_path):
        with pytest.raises(ExecError, match="format"):
            eng.execute(f"COPY t TO '{tmp_path}/x' (FORMAT xlsx)")


class TestCopyFrom:
    def test_append_into_table(self, eng, spark, tmp_path):
        p = str(tmp_path / "in_pq")
        spark.createDataFrame([(9, "z", 9.5)], "id long, grp string, v double").write.parquet(p)
        n = eng.execute(f"COPY t FROM '{p}'")
        assert n == 1
        assert eng.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 4

    def test_append_into_sink(self, eng, spark, tmp_path):
        from qlbridge_spark.sinks import ParquetMergeSink

        sink = ParquetMergeSink(spark, str(tmp_path / "snk"), key="id")
        sink.ensure(spark.createDataFrame([(1, "a")], "id long, s string"))
        eng.register_sink("st", sink)
        src = str(tmp_path / "in2")
        spark.createDataFrame([(2, "b"), (3, "c")], "id long, s string").write.parquet(src)
        assert eng.execute(f"COPY st FROM '{src}'") == 2
        assert eng.sql("SELECT count(*) AS n FROM st").collect()[0]["n"] == 3

    def test_from_requires_table(self, eng, tmp_path):
        from qlbridge_spark.exprparse import ParseError

        with pytest.raises(ParseError, match="target table"):
            eng.execute(f"COPY (SELECT 1) FROM '{tmp_path}/x'")


class TestCopyToCountNoRescan:
    def test_header_false_custom_delimiter_count(self, eng, spark, tmp_path):
        """The returned count comes from the write job itself (Observation)
        — previously a csv re-read hardcoded header=true, consuming the
        first data row of every part file under HEADER false."""
        p = str(tmp_path / "out_csv_nh")
        n = eng.execute(f"COPY t TO '{p}' (FORMAT csv, HEADER false, DELIMITER '|')")
        assert n == 3
        back = spark.read.option("header", "false").option("sep", "|").csv(p)
        assert back.count() == 3

    def test_count_without_output_rescan(self, eng, spark, tmp_path):
        """COPY TO must not launch a second job re-reading what it just
        wrote: the whole statement is ONE Spark job (the write, with the
        count observed on it)."""
        sc = spark.sparkContext
        p = str(tmp_path / "out_onejob")
        sc.setJobGroup("copy-onejob", "copy-onejob")
        try:
            n = eng.execute(f"COPY t TO '{p}' (FORMAT csv, HEADER false)")
        finally:
            sc.setJobGroup(None, None)
        assert n == 3
        jobs = sc.statusTracker().getJobIdsForGroup("copy-onejob")
        assert len(jobs) == 1, f"COPY TO launched {len(jobs)} jobs (want 1: the write)"

    def test_empty_result_count(self, eng, tmp_path):
        p = str(tmp_path / "out_empty")
        n = eng.execute(f"COPY (SELECT id FROM t WHERE id > 99) TO '{p}' (FORMAT json)")
        assert n == 0
