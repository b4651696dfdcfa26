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
