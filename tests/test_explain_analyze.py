"""EXPLAIN ANALYZE — runtime per-operator metrics (superset; the
reference's EXPLAIN is schema/plan-only). Executes through the noop sink
(executor-parallel, no collect) and reads Spark's SQLMetric registry."""

from __future__ import annotations

import pytest

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError


@pytest.fixture()
def eng(spark):
    e = Engine(spark, "ea-test")
    e.register_df(
        "t", spark.range(0, 5000).selectExpr("id", "id % 7 AS k", "cast(id * 1.5 AS double) AS v")
    )
    return e


def test_api_reports_runtime_metrics(eng):
    rep = eng.explain_analyze("SELECT k, count(*) AS n, sum(v) AS s FROM t GROUP BY k")
    assert "HashAggregate" in rep
    assert "numOutputRows" in rep or "number of output rows" in rep
    # the scan really ran: 5000 input rows appear somewhere in the metrics
    assert "5,000" in rep
    # aggregate output cardinality (7 groups) is annotated
    assert "=7" in rep.replace(" ", "")


def test_sql_surface(eng):
    rows = eng.sql("EXPLAIN ANALYZE SELECT count(*) AS n FROM t WHERE k = 3").collect()
    text = "\n".join(r["plan"] for r in rows)
    assert "HashAggregate" in text and "Exchange" not in text.split("\n")[0]


def test_join_metrics(eng, spark):
    eng.register_df("d", spark.range(0, 7).selectExpr("id AS k", "concat('g', id) AS label"))
    rep = eng.explain_analyze(
        "SELECT label, count(*) AS n FROM t JOIN d ON t.k = d.k GROUP BY label"
    )
    assert "BroadcastHashJoin" in rep or "SortMergeJoin" in rep
    assert "BroadcastExchange" in rep or "Exchange" in rep


def test_non_query_errors(eng):
    with pytest.raises(ExecError, match="row-producing"):
        eng.explain_analyze("SET x = 1")


def test_cache_stats_footer(eng):
    """Round-10 observability: the report footer carries THIS statement's
    plan/fold cache activity plus session totals."""
    # statement with an uncorrelated scalar subquery → a fold on first run
    q = "SELECT k, count(*) AS n FROM t WHERE v < (SELECT max(v) FROM t) GROUP BY k"
    rep1 = eng.explain_analyze(q)
    assert "PlanCache:" in rep1 and "session:" in rep1
    assert "fold_misses=1" in rep1, rep1.split("PlanCache:")[1]
    # second run: the fold is served from cache
    rep2 = eng.explain_analyze(q)
    assert "fold_hits=1" in rep2.split("PlanCache:")[1].split("[session")[0]
    # SQL surface carries the footer too
    rows = eng.sql("EXPLAIN ANALYZE SELECT count(*) AS n FROM t").collect()
    text = "\n".join(r["plan"] for r in rows)
    assert "PlanCache:" in text
