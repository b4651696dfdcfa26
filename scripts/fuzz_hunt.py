"""Extended differential fuzz hunt — reproducible harness for the
per-round hunts recorded in TODO-NEXT.md.

Runs the four generator waves from tests/test_differential.py (v1:
expression/aggregate/predicate shapes; v2: subqueries, set ops, windows,
DISTINCT ON, HAVING, ordered-set aggs; v3: (VALUES ...) constructors and
lateral UNNEST; v4: randomized LATERAL derived tables, PIVOT/UNPIVOT,
CTE + set-op chains) through BOTH the engine and DuckDB on identical
data and requires row-for-row agreement.

Usage:
    python scripts/fuzz_hunt.py [seed ...]        # default seeds 2000-2039
    python scripts/fuzz_hunt.py $(seq 5000 5079)  # bigger hunt

Each seed contributes 20 queries per wave (80/seed; the default 40
seeds = 3,200 queries). Failures print the exact query and both result
prefixes, and the process exits non-zero.
"""
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("fuzz_hunt")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb

import test_differential as td
from qlbridge_spark import Engine

e = Engine(spark)
e.register_df("fz", spark.createDataFrame(td.ROWS, "id int, a int, b int, s string"))
e.register_df("fzv", spark.createDataFrame(td.VROWS, "id int, arr array<int>, s string"))
con = duckdb.connect()
con.execute("CREATE TABLE fz (id int, a int, b int, s varchar)")
con.executemany("INSERT INTO fz VALUES (?, ?, ?, ?)", td.ROWS)
con.execute("CREATE TABLE fzv (id int, arr int[], s varchar)")
con.executemany("INSERT INTO fzv VALUES (?, ?, ?)", td.VROWS)

seeds = [int(x) for x in sys.argv[1:]] or list(range(2000, 2040))
n = fails = 0
t0 = time.time()
for seed in seeds:
    # v1 compares ordered rows (generators emit deterministic ORDER BY);
    # v2/v3 compare sorted multisets
    rng = random.Random(seed)
    for _ in range(20):
        q = td._gen_query(rng)
        n += 1
        sp = [tuple(r) for r in e.execute(q).collect()]
        du = con.execute(q).fetchall()
        if sp != du:
            fails += 1
            print(f"MISMATCH v1 seed={seed}: {q}\n  spark={sp[:4]}\n  duck={du[:4]}")
    for tag, gen in (("v2", td._gen_query_v2), ("v3", td._gen_query_v3), ("v4", td._gen_query_v4)):
        rng_w = random.Random(seed * 7 + {"v2": 1, "v3": 2, "v4": 3}[tag])
        for _ in range(20):
            q = gen(rng_w)
            n += 1
            sp = sorted((tuple(r) for r in e.execute(q).collect()), key=repr)
            du = sorted((tuple(r) for r in con.execute(q).fetchall()), key=repr)
            if sp != du:
                fails += 1
                print(f"MISMATCH {tag} seed={seed}: {q}\n  spark={sp[:4]}\n  duck={du[:4]}")
    print(f"seed {seed} done ({n} queries, {fails} fails, {time.time() - t0:.0f}s)", flush=True)
print(f"TOTAL {n} queries, {fails} mismatches")
sys.exit(1 if fails else 0)
