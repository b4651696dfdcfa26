"""Star-schema inner-join reorder (engine._reorder_inner_joins).

Catalyst does not reorder DataFrame inner joins without CBO stats, so a
fact-first FROM pays its big shuffles before any selective dim filter
trims the stream. The engine hoists broadcast-small relations (on-disk
bytes ≤ spark.sql.autoBroadcastJoinThreshold) ahead of the fact joins
when their ON keys are available — results identical (inner equi-joins
commute), plans trim-first. Everything non-INNER / star-projected /
ambiguous keeps the written order, and `SET planner.join_reorder =
false` turns it off entirely."""

import io
from contextlib import redirect_stdout

import pytest

from qlbridge_spark.engine import Engine, read_parquet

SF = "/root/testdata/sf0.001"
Q5 = """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = "ASIA"
    GROUP BY n_name
    ORDER BY revenue DESC"""


@pytest.fixture()
def small_threshold(spark):
    """sf0.001 files are ALL under Spark's 10MB broadcast threshold, so
    the reorderer (correctly) leaves tiny-everything queries alone; a
    20KB threshold restores the real size relationships (nation/region/
    customer small; orders/lineitem facts) at test scale."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "20000")
    yield
    spark.conf.set(key, old)


def _mk(spark, flag=None):
    eng = Engine(spark, f"jr-{flag}")
    for t in ["region", "nation", "customer", "orders", "lineitem"]:
        eng.register_df(t, read_parquet(spark, f"{SF}/{t}.parquet"))
    if flag is not None:
        eng.execute(f"SET planner.join_reorder = {flag}")
    return eng


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestJoinReorder:
    def test_results_identical_and_dim_chain_hoisted(self, spark, small_threshold):
        from qlbridge_spark.rel import parse_sql

        on = _mk(spark)
        off = _mk(spark, "false")
        got = sorted(tuple(r) for r in on.sql(Q5).collect())
        want = sorted(tuple(r) for r in off.sql(Q5).collect())
        assert got == want and got
        # trim-first: the reorderer hoists the nation→region dim chain
        # ahead of the orders/lineitem fact joins, so the selective
        # r_name filter (pushed to the region scan) trims the customer
        # stream BEFORE the big shuffles
        sel = parse_sql(Q5)
        order = on._reorder_inner_joins(
            sel.from_[0], list(sel.from_[1:]), sel, {}
        )
        assert [s.name for s in order] == ["nation", "region", "orders", "lineitem"]
        # the off-switch keeps the written order
        order_off = off._reorder_inner_joins(
            sel.from_[0], list(sel.from_[1:]), sel, {}
        )
        assert [s.name for s in order_off] == ["orders", "lineitem", "nation", "region"]

    def test_outer_join_chain_keeps_written_order(self, spark):
        eng = _mk(spark)
        from qlbridge_spark.rel import parse_sql

        q = """
            SELECT c_custkey, n_name FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey
              JOIN nation ON c_nationkey = n_nationkey
            ORDER BY c_custkey LIMIT 5"""
        # any non-INNER join in the chain disables the reorder wholesale
        sel = parse_sql(q)
        order = eng._reorder_inner_joins(sel.from_[0], list(sel.from_[1:]), sel, {})
        assert [s.name for s in order] == ["orders", "nation"]
        assert [tuple(r) for r in eng.sql(q).collect()]

    def test_star_select_keeps_written_order(self, spark):
        eng = _mk(spark)
        q = """
            SELECT * FROM nation
              JOIN region ON n_regionkey = r_regionkey
              JOIN customer ON c_nationkey = n_nationkey
            ORDER BY c_custkey LIMIT 3"""
        df = eng.sql(q)
        # SELECT * column order follows the written join order
        cols = df.columns
        assert cols.index("r_name") < cols.index("c_custkey")
        assert df.count() == 3

    def test_ambiguous_bare_on_name_keeps_written_order(self, spark):
        # self-join: every bare column name exists on both sides — the
        # reorderer must not touch it (qualified resolution is the
        # engine's job, reordering could re-bind)
        eng = _mk(spark)
        q = """
            SELECT a.n_name AS x, count(*) AS n FROM nation a
              JOIN nation b ON a.n_regionkey = b.n_regionkey
              JOIN region ON a.n_regionkey = r_regionkey
            GROUP BY a.n_name ORDER BY x"""
        got = sorted(tuple(r) for r in eng.sql(q).collect())
        off = _mk(spark, "false")
        assert got == sorted(tuple(r) for r in off.sql(q).collect())

    def test_chained_key_dependency_respected(self, spark, small_threshold):
        # region's ON needs nation's key: the hoist order must keep
        # nation before region even though both are tiny
        eng = _mk(spark)
        from qlbridge_spark.rel import parse_sql

        q = """
            SELECT r_name, count(*) AS n FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""
        sel = parse_sql(q)
        order = eng._reorder_inner_joins(sel.from_[0], list(sel.from_[1:]), sel, {})
        assert [s.name for s in order] == ["nation", "region", "orders"]
        got = sorted(tuple(r) for r in eng.sql(q).collect())
        off = _mk(spark, "false")
        assert got == sorted(tuple(r) for r in off.sql(q).collect())


class TestChainBroadcastHint:
    """r17 hardening of the chain-broadcast hint (engine._build_from):
    suffix-aware threshold parsing, no hint once the chain is over the
    threshold (the scale-adaptivity contract), and no hint downstream of
    a row-multiplying step (cross join / unnest / lateral), whose output
    size the summed on-disk bytes no longer bound."""

    def _hints(self, df) -> int:
        return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")

    def test_threshold_suffix_parsing(self, spark):
        key = "spark.sql.autoBroadcastJoinThreshold"
        old = spark.conf.get(key)
        eng = _mk(spark)
        try:
            for raw, want in (("512k", 512 << 10), ("10m", 10 << 20), ("100MB", 100 << 20), ("-1", -1), ("10485760", 10 << 20)):
                spark.conf.set(key, raw)
                assert eng._broadcast_threshold_bytes() == want, raw
        finally:
            spark.conf.set(key, old)

    def test_hint_fires_on_small_chain_vs_fact(self, spark, small_threshold):
        # customer (6.9k) ≤ 20k chain joins orders (36k > 20k): pin the
        # build side the scale-safe way round
        eng = _mk(spark)
        df = eng.sql(
            "SELECT count(*) AS n FROM customer JOIN orders ON o_custkey = c_custkey"
        )
        assert self._hints(df) >= 1
        off = _mk(spark, None)
        off.execute("SET planner.chain_broadcast = false")
        dfo = off.sql("SELECT count(*) AS n FROM customer JOIN orders ON o_custkey = c_custkey")
        assert self._hints(dfo) == 0
        assert [tuple(r) for r in df.collect()] == [tuple(r) for r in dfo.collect()]

    def test_hint_silent_when_chain_over_threshold(self, spark):
        # threshold below every source ('1k', exercising the suffix path
        # end-to-end): the chain never qualifies, the hint must not fire —
        # the same condition a 10x-data run hits with the default 10MB
        key = "spark.sql.autoBroadcastJoinThreshold"
        old = spark.conf.get(key)
        spark.conf.set(key, "1k")
        try:
            eng = _mk(spark)
            df = eng.sql(
                "SELECT count(*) AS n FROM customer JOIN orders ON o_custkey = c_custkey"
            )
            assert self._hints(df) == 0
        finally:
            spark.conf.set(key, old)

    def test_cross_join_stops_byte_tracking(self, spark, small_threshold):
        # region × nation cross-multiplies rows; the later inner join with
        # over-threshold orders must NOT be hinted off pre-explosion bytes
        eng = _mk(spark)
        q = """
            SELECT count(*) AS n FROM region
              CROSS JOIN nation
              JOIN customer ON c_nationkey = n_nationkey
              JOIN orders ON o_custkey = c_custkey"""
        df = eng.sql(q)
        assert self._hints(df) == 0
        off = _mk(spark, None)
        off.execute("SET planner.chain_broadcast = false")
        assert [tuple(r) for r in df.collect()] == [tuple(r) for r in off.sql(q).collect()]
