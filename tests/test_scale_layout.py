"""Scale-layout proofs: bucketed joins skip the shuffle; parse latency is
negligible next to job scheduling (BASELINE.md soft target <5ms/stmt)."""

import time


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        from qlbridge_spark.session import write_table

        from pyspark.sql import functions as F

        a = spark.range(1000).withColumnRenamed("id", "k").withColumn("v", F.lit(1))
        b = spark.range(1000).withColumnRenamed("id", "k").withColumn("w", F.lit(2))
        write_table(a, str(tmp_path / "ta"), bucket_by=(4, ["k"]), table_name="bt_a")
        write_table(b, str(tmp_path / "tb"), bucket_by=(4, ["k"]), table_name="bt_b")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force the shuffle-join path (tiny test tables would broadcast,
            # which is itself the right plan — here we prove the bucketed
            # fallback for two FACT-sized sides)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
            plan = joined._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            )
            # both sides pre-bucketed on k → SortMergeJoin with ZERO Exchange
            assert "Exchange" not in plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS bt_a")
            spark.sql("DROP TABLE IF EXISTS bt_b")


class TestBucketedStar:
    def test_fact_fact_join_exchange_free(self, spark, tmp_path):
        """The bench's 100 TB layout: lineitem+orders bucketed on orderkey →
        the engine's q03-shape (join + groupBy on the bucket key) runs with
        ZERO Exchange; facts may not broadcast at scale so the broadcast
        path is disabled for the proof."""
        import shutil

        from qlbridge_spark import Engine
        from qlbridge_spark.session import ensure_bucketed_star

        sf_dir = str(tmp_path / "sfx")
        import os

        os.makedirs(sf_dir)
        from pyspark.sql import functions as F

        spark.range(2000).select(
            (F.col("id") % 500).alias("l_orderkey"),
            (F.rand(7) * 100).alias("l_extendedprice"),
            F.lit(0.05).alias("l_discount"),
        ).write.parquet(f"{sf_dir}/lineitem.parquet")
        spark.range(500).select(
            F.col("id").alias("o_orderkey"), F.lit("O").alias("o_orderstatus")
        ).write.parquet(f"{sf_dir}/orders.parquet")

        names = ensure_bucketed_star(spark, sf_dir, str(tmp_path / "layout"), buckets=4)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            eng = Engine(spark, "bstar-test")
            eng.register_df("lineitem", spark.table(names["lineitem"]))
            eng.register_df("orders", spark.table(names["orders"]))
            df = eng.sql(
                "SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
                "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
                "GROUP BY o_orderkey ORDER BY revenue DESC LIMIT 5"
            )
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            )
            assert "Exchange" not in plan, plan
            assert df.count() == 5
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            for t in names.values():
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(sf_dir, ignore_errors=True)


class TestParseLatency:
    def test_statement_parse_under_5ms(self):
        # BASELINE.md: translation cost must vanish next to Spark's ~100ms
        # job overhead; reference parses the bench statement in ~35µs (Go)
        from qlbridge_spark.rel import parse_sql

        stmt = (
            'SELECT a, b, tolower(c) AS lc, count(*) AS n FROM t1 '
            'JOIN t2 ON t1.id = t2.id WHERE x > 5 AND y LIKE "%z%" '
            "GROUP BY a, b, tolower(c) HAVING count(*) > 2 ORDER BY n DESC LIMIT 10"
        )
        parse_sql(stmt)  # warm
        n = 200
        t0 = time.perf_counter()
        for _ in range(n):
            parse_sql(stmt)
        per = (time.perf_counter() - t0) / n
        assert per < 0.005, f"parse took {per*1000:.2f}ms"


class TestSubqueryPlanShapes:
    """Plan-shape pins for the round-6 subquery lowerings: every one must
    be a JOIN-based distributed plan with zero Python UDFs — a regression
    to per-row re-execution or BatchEvalPython is the 100 TB killer."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_correlated_scalar_is_agg_plus_join(self, engine):
        df = engine.sql(
            "SELECT users.user_id, (SELECT max(price) FROM orders WHERE orders.user_id = users.user_id) AS p "
            "FROM users"
        )
        plan = self._plan(df)
        assert "Join" in plan and "Aggregate" in plan
        assert "BatchEvalPython" not in plan

    def test_quantified_correlated_single_join(self, engine):
        df = engine.sql(
            "SELECT users.user_id FROM users WHERE referral_count > ALL "
            "(SELECT item_count FROM orders WHERE orders.user_id = users.user_id)"
        )
        plan = self._plan(df)
        # one decorrelating join, not one per comparison operand
        assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin") == 1
        assert "BatchEvalPython" not in plan

    def test_in_membership_join_no_udf(self, engine):
        df = engine.sql(
            "SELECT user_id, user_id IN (SELECT user_id FROM orders) AS has_order FROM users"
        )
        plan = self._plan(df)
        assert "Join" in plan and "BatchEvalPython" not in plan

    def test_cte_filter_pushes_to_scan(self, spark, tmp_path, engine):
        # the CTE is a lazy frame: Catalyst inlines it, so a filter on the
        # OUTER query reaches the parquet scan inside the CTE
        p = str(tmp_path / "cte_push")
        spark.range(1000).selectExpr("id", "id * 2 AS v").write.parquet(p)
        engine.execute(f'CREATE SOURCE cte_t WITH {{"type": "parquet", "path": "{p}"}}')
        df = engine.sql("WITH c AS (SELECT id, v FROM cte_t) SELECT v FROM c WHERE id > 900")
        ex = df._jdf.queryExecution().toString()
        assert "GreaterThan(id,900)" in ex  # PushedFilters through the CTE
        engine.execute("DROP SOURCE cte_t")
