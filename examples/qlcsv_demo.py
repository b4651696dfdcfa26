"""The reference's headline example, re-expressed on Spark.

Parity target: /root/reference/examples/qlcsv/main.go — read a CSV with
the qlbridge dialect through the registered sql driver, with a user-added
custom function (`email_is_valid`) available inside the SQL.

Run:
    python examples/qlcsv_demo.py \
        --sql 'select user_id AS theuserid, email, item_count * 2 AS double_items, yy(reg_date) AS reg_yy from stdio where email_is_valid(email)'

(the default --sql mirrors the reference README's example statement)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USERS_CSV = """user_id,email,interests,reg_date,item_count,deleted
9Ip1aKbeZe2njCDM,"aaron@email.com","fishing","2012-10-17T17:29:39.738Z",82,false
hT2impsOPUREcVPc,"bob@gmail.com","swimming","2009-12-11T19:53:31.547Z",12,true
hT2impsabc345c,"not_an_email","","2009-12-11T19:53:31.547Z",12,false
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sql",
        default=(
            "select user_id AS theuserid, email, item_count * 2 AS double_items, "
            "yy(reg_date) AS reg_yy from stdio where email_is_valid(email)"
        ),
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("qlcsv_demo")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # custom function, like expr.FuncAdd("email_is_valid", ...) in main.go:
    # the builder receives (FuncNode, Scope) and returns a Column
    from qlbridge_spark import func_add, to_column

    func_add(
        "email_is_valid",
        lambda n, s: to_column(n.args[0], s).rlike(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    )

    # "stdin csv source" → CSV file registered as table `stdio`
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "users.csv")
        with open(path, "w") as f:
            f.write(USERS_CSV)

        from qlbridge_spark.dbapi import connect

        conn = connect(spark, name="example_csv")
        conn.engine.execute(f'CREATE SOURCE stdio WITH {{"type": "csv", "path": "{path}", "table": "stdio"}}')

        cur = conn.cursor()
        cur.execute(args.sql)
        cols = [d_[0] for d_ in cur.description]
        print(f"\nScanning through CSV: ({','.join(cols)})\n")
        for row in cur:
            print(", ".join(str(v) for v in row))
        print()


if __name__ == "__main__":
    main()
