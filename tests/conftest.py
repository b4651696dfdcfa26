"""Shared fixtures: one SparkSession per test session; the reference's
mock users/orders tables (FIXTURES.md / datasource/mockcsvtestdata) and a
1-row expression-evaluation context (README.md:39-54 style)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import types as T


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("qlbridge_spark_tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


USERS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("interests", T.StringType()),
        T.StructField("reg_date", T.TimestampType()),
        T.StructField("referral_count", T.LongType()),
        T.StructField("json_data", T.StringType()),
    ]
)

# exact rows from datasource/mockcsvtestdata/testdata.go:40-44 (FIXTURES.md §1)
USERS_ROWS = [
    ("9Ip1aKbeZe2njCDM", "aaron@email.com", "fishing", _ts("2012-10-17T17:29:39.738"), 82, '{"name":"aaron"}'),
    ("hT2impsOPUREcVPc", "bob@email.com", "swimming", _ts("2009-12-11T19:53:31.547"), 12, '{"name":"bob"}'),
    ("hT2impsabc345c", "not_an_email_2", "", _ts("2009-12-11T19:53:31.547"), 12, '{"name":"notbob"}'),
]

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("item_id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("order_date", T.TimestampType()),
        T.StructField("item_count", T.LongType()),
    ]
)

# datasource/mockcsvtestdata/testdata.go:45-49 (FIXTURES.md §2)
ORDERS_ROWS = [
    (1, "9Ip1aKbeZe2njCDM", 1, 22.50, _ts("2012-12-24T17:29:39.738"), 82),
    (2, "9Ip1aKbeZe2njCDM", 2, 37.50, _ts("2013-10-24T17:29:39.738"), 82),
    (3, "abcabcabc", 1, 22.50, _ts("2013-10-24T17:29:39.738"), 82),
]


@pytest.fixture(scope="session")
def engine(spark):
    from qlbridge_spark import Engine

    eng = Engine(spark)
    eng.register_df("users", spark.createDataFrame(USERS_ROWS, USERS_SCHEMA))
    eng.register_df("orders", spark.createDataFrame(ORDERS_ROWS, ORDERS_SCHEMA))
    return eng


# expression-eval context ≈ README.md:39-54 / vm/vm_test.go (FIXTURES.md §4)
CTX_SCHEMA = T.StructType(
    [
        T.StructField("int5", T.LongType()),
        T.StructField("str5", T.StringType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("bvalt", T.BooleanType()),
        T.StructField("bvalf", T.BooleanType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("urls", T.ArrayType(T.StringType())),
        T.StructField("hits", T.MapType(T.StringType(), T.LongType())),
        T.StructField("email", T.StringType()),
        T.StructField("emailbad", T.StringType()),
        T.StructField("interests", T.StringType()),
        T.StructField("mt", T.MapType(T.StringType(), T.TimestampType())),
        T.StructField("item_count", T.StringType()),
        T.StructField("json_data", T.StringType()),
    ]
)

CTX_ROW = (
    5,
    "5",
    _ts("2015-12-18T00:00:00"),
    True,
    False,
    "abc",
    ["http://www.google.com/search?q=golang", "http://www.nytimes.com/politics"],
    {"google.com": 5, "bing.com": 1},
    "bob@bob.com",
    "bob",
    "",
    {"event0": _ts("2019-01-01T10:00:00"), "event1": _ts("2019-06-01T12:30:00")},
    "5",
    '{"name":"aaron","score":42}',
)


@pytest.fixture(scope="session")
def evals(spark):
    """Batch expression evaluator: evals([...exprs]) → list of values,
    ONE Spark job for the whole table of expressions."""
    from qlbridge_spark import Scope, parse_expression, to_column

    ctx = spark.createDataFrame([CTX_ROW], CTX_SCHEMA)

    def run(exprs: list[str]) -> list:
        scope = Scope({"_": ctx})
        cols = [to_column(parse_expression(e), scope).alias(f"c{i}") for i, e in enumerate(exprs)]
        row = ctx.select(*cols).collect()[0]
        return list(row)

    return run
