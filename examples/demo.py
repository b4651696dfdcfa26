"""The reference README's demo app, on Spark (README.md:100-137 of
/root/reference): register a custom function, read a CSV, run a
qlbridge-dialect query with it.

Run: python examples/demo.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from qlbridge_spark import Engine, func_add, to_column


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("qlbridge_spark_demo")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1. custom function at runtime — ≈ expr.FuncAdd (README.md:105-123)
    func_add(
        "email_is_valid",
        lambda n, s: F.lower(to_column(n.args[0], s)).rlike(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    )

    # 2. a CSV source (the reference pipes users.csv over stdin)
    csv = os.path.join(tempfile.mkdtemp(), "users.csv")
    with open(csv, "w") as f:
        f.write(
            "user_id,email,interests,reg_date,referral_count\n"
            '9Ip1aKbeZe2njCDM,aaron@email.com,fishing,2012-10-17T17:29:39.738Z,82\n'
            'hT2impsOPUREcVPc,bob@email.com,swimming,2009-12-11T19:53:31.547Z,12\n'
            'hT2impsabc345c,not_an_email,,2009-12-11T19:53:31.547Z,12\n'
        )

    eng = Engine(spark)
    eng.execute(f'CREATE SOURCE users WITH {{"type": "csv", "path": "{csv}"}}')

    # 3. the README demo query (README.md:134-136)
    df = eng.sql(
        "SELECT user_id, email, referral_count * 2 AS ref2, yy(reg_date) AS yy "
        "FROM users WHERE email_is_valid(email)"
    )
    df.show()

    # 4. FilterQL + ES pushdown compilation for the same predicate
    print(eng.execute("FILTER AND(referral_count > 50, EXISTS interests) FROM users").count(), "filterql rows")
    from qlbridge_spark.generators import filterql_to_es

    print(filterql_to_es("FILTER AND(referral_count > 50, EXISTS interests) FROM users"))


if __name__ == "__main__":
    main()
