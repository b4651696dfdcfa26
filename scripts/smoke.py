"""Fast pre-commit smoke: one Spark session, one tiny in-memory table,
one query through EVERY major execution path of the engine. ~30 s total.

Exists because round 14's snapshot commit added a NameError to the
non-aggregate _select tail that pytest would have caught in seconds —
but nothing was executed before committing. This script is wired into
.git/hooks/pre-commit (installed by scripts/install_hooks.sh); bypass
with SKIP_SMOKE=1 only for doc/comment-only commits.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("smoke")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from qlbridge_spark import Engine

    eng = Engine(spark)
    eng.register_rows(
        "t",
        [
            {"k": 1, "g": "a", "x": 10.0, "s": "hello"},
            {"k": 2, "g": "a", "x": 20.0, "s": "world"},
            {"k": 3, "g": "b", "x": 30.0, "s": "spark"},
        ],
    )
    eng.register_rows("d", [{"k": 1, "name": "one"}, {"k": 3, "name": "three"}])

    # (label, sql, expected_row_count) — one per execution path
    cases = [
        ("non-agg select", "SELECT k, x FROM t WHERE x > 15 ORDER BY k LIMIT 5", 2),
        ("distinct", "SELECT DISTINCT g FROM t ORDER BY g", 2),
        ("aggregate", "SELECT g, sum(x) AS sx FROM t GROUP BY g HAVING sum(x) > 5 ORDER BY sx DESC", 2),
        ("agg-order-hidden", "SELECT g FROM t GROUP BY g ORDER BY sum(x) DESC", 2),
        ("global agg", "SELECT count(*) AS n, avg(x) AS a FROM t", 1),
        ("join", "SELECT t.k, d.name FROM t JOIN d ON t.k = d.k ORDER BY t.k", 2),
        ("left join", "SELECT t.k, d.name FROM t LEFT JOIN d ON t.k = d.k", 3),
        ("in-subquery", "SELECT k FROM t WHERE k IN (SELECT k FROM d)", 2),
        ("scalar-subquery", "SELECT k FROM t WHERE x > (SELECT avg(x) FROM t)", 1),
        ("exists", "SELECT k FROM t WHERE EXISTS (SELECT 1 FROM d WHERE d.k = t.k)", 2),
        ("from-subquery", "SELECT g, n FROM (SELECT g, count(*) AS n FROM t GROUP BY g) sub", 2),
        ("window", "SELECT k, row_number() OVER (PARTITION BY g ORDER BY x) AS rn FROM t", 3),
        ("set-op", "SELECT k FROM t UNION SELECT k FROM d", 3),
        ("cte", "WITH c AS (SELECT k, x FROM t WHERE x >= 20) SELECT count(*) AS n FROM c", 1),
        ("literal", "SELECT 1 AS one, 'x' AS s", 1),
        ("funcs", "SELECT upper(s) AS u, length(s) AS l, k % 2 AS m FROM t", 3),
        ("case", "SELECT k, CASE WHEN x > 15 THEN 'big' ELSE 'small' END AS sz FROM t", 3),
    ]
    bad = 0
    for label, sql, want in cases:
        try:
            got = eng.sql(sql).count()
            if got != want:
                print(f"SMOKE FAIL [{label}]: {got} rows, wanted {want}")
                bad += 1
        except Exception as e:  # noqa: BLE001 — report every path, then fail
            print(f"SMOKE CRASH [{label}]: {type(e).__name__}: {e}")
            bad += 1
    if bad:
        print(f"SMOKE: {bad}/{len(cases)} paths red")
        return 1
    print(f"SMOKE: all {len(cases)} paths green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
