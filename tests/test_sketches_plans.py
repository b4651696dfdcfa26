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
