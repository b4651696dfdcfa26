"""Sketch operators + plan-hygiene assertions (no row-at-a-time Python in
any hot path)."""

from pyspark.sql import functions as F


class TestSketches:
    def test_approx_distinct(self, engine):
        from qlbridge_spark.datapipe.sketches import approx_distinct

        df = approx_distinct(engine.table("orders"), ["user_id", "item_id"])
        r = df.collect()[0]
        assert r["user_id_distinct"] == 2 and r["item_id_distinct"] == 2

    def test_approx_quantiles(self, engine):
        from qlbridge_spark.datapipe.sketches import approx_quantiles

        r = approx_quantiles(engine.table("orders"), "price", [0.5]).collect()[0]
        assert r["price_quantiles"] == [22.5]

    def test_freq_topk(self, engine):
        from qlbridge_spark.datapipe.sketches import freq_topk

        top = freq_topk(engine.table("orders"), "user_id", k=1).collect()
        assert top[0]["user_id"] == "9Ip1aKbeZe2njCDM" and top[0]["freq"] == 2

    def test_column_profile(self, engine):
        from qlbridge_spark.datapipe.sketches import column_profile

        prof = {r["column"]: r for r in column_profile(engine.table("users")).collect()}
        assert prof["user_id"]["approx_distinct"] == 3
        assert prof["user_id"]["null_fraction"] == 0.0


class TestEngineHelpers:
    def test_execute_script(self, engine):
        out = engine.execute_script(
            'CREATE TABLE s1 AS SELECT user_id FROM users; '
            "SELECT count(*) AS n FROM s1; DROP TABLE s1"
        )
        assert out[1].collect()[0][0] == 3

    def test_explain_helper(self, engine):
        plan = engine.explain("SELECT email FROM users WHERE referral_count > 50", mode="simple")
        assert "Filter" in plan or "filter" in plan


class TestPlanHygiene:
    def test_no_python_row_loop_in_engine_queries(self, engine, spark):
        """The engine's SQL surface must never plan row-at-a-time Python
        (BatchEvalPython); Arrow (ArrowEvalPython/MapInPandas) is allowed
        only on the declared slow paths (jmespath-complex, multimodal)."""
        for q in [
            'SELECT tolower(c) AS x, hash.md5(c) AS h FROM (SELECT email AS c FROM users) AS t',
            "SELECT user_id, count(*) AS n FROM orders GROUP BY user_id HAVING count(*) > 1",
            'SELECT users.user_id FROM users JOIN orders ON users.user_id = orders.user_id',
        ]:
            plan = engine.explain(q, mode="simple")
            assert "BatchEvalPython" not in plan, q

    def test_datapipe_signatures_jvm_side(self, spark):
        from qlbridge_spark.datapipe import minhash_signature, simhash
        from qlbridge_spark.datapipe.text import fingerprint, quality_score

        df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
        targets = [
            minhash_signature(df, "text", id_col="doc_id"),
            simhash(df, "text"),
            df.select(fingerprint(F.col("text"))),
            df.select(quality_score(F.col("text"))),
        ]
        for t in targets:
            plan = t._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            )
            assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestNewFeaturePlans:
    """Physical-plan shape for round-3 features: the point is not that the
    queries run, but that they plan the way a 100 TB run needs."""

    @staticmethod
    def _plan(engine, q):
        return engine.explain(q, mode="simple")

    @staticmethod
    def _count_op(plan, op):
        import re

        return sum(1 for l in plan.splitlines() if re.match(rf"^[\s+:*()-]*{op}\s", l))

    def test_qualify_single_window_and_exchange(self, engine):
        # alias substitution duplicates the window expr in the predicate;
        # Catalyst must CSE it — ONE Window operator, ONE Exchange
        plan = self._plan(
            engine,
            "SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY price) AS rn "
            "FROM orders QUALIFY rn = 1",
        )
        assert self._count_op(plan, "Window") == 1, plan
        assert plan.count("Exchange") == 1, plan

    def test_named_window_shared_spec_one_window_op(self, engine):
        plan = self._plan(
            engine,
            "SELECT rank() OVER w AS r1, sum(price) OVER w AS s FROM orders "
            "WINDOW w AS (PARTITION BY user_id ORDER BY price)",
        )
        assert self._count_op(plan, "Window") == 1, plan

    def test_setop_chain_order_limit_is_topk(self, engine):
        # chain-level ORDER BY + LIMIT must plan TakeOrderedAndProject
        # (top-k, no global sort) over the union
        plan = self._plan(
            engine,
            "SELECT price FROM orders UNION ALL SELECT price FROM orders ORDER BY price DESC LIMIT 2",
        )
        assert "TakeOrderedAndProject" in plan, plan

    def test_scalar_subquery_is_literal_no_join(self, engine):
        # WHERE position: materialized at plan time so the predicate
        # stays a pushable literal filter — no join, no subquery node
        plan = self._plan(
            engine, "SELECT order_id FROM orders WHERE price >= (SELECT max(price) FROM orders)"
        )
        assert "Join" not in plan and "Subquery" not in plan, plan

    def test_select_list_scalar_subquery_is_lazy_join(self, engine):
        # select-list position: LAZY 1-row broadcast cross join — no
        # plan-time job, the statement is a single Spark job
        plan = self._plan(
            engine, "SELECT order_id, (SELECT max(price) FROM orders) AS m FROM orders"
        )
        assert "BroadcastNestedLoopJoin" in plan, plan

    def test_approx_sketch_aggs_partial_final(self, engine):
        # sketch aggs keep the partial/final HashAggregate split (map-side
        # sketch merge — fixed memory per partition at any scale)
        plan = self._plan(
            engine,
            "SELECT user_id, approx_count_distinct(item_id) AS d FROM orders GROUP BY user_id",
        )
        assert plan.count("HashAggregate") == 2, plan
