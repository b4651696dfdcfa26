"""Local replica of the driver's correctness gate: run every queries()
entry via Spark AND its oracle_sql() via DuckDB at sf0.01; compare row
count, column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


# LSH entries are PROBABILISTIC at the decision boundary: a true pair at
# jaccard j survives banding with prob 1-(1-j^r)^b, so at large corpus
# sizes a few boundary-j misses are the DESIGNED behavior, not a bug
# (round-7 sf1 sweep: dp07 missed 2 of 250,600 pairs at j=0.615 — the
# count theory predicts). This registry automates that budget (round-7
# directive #6): a hash mismatch for these entries is re-judged as PASS
# when (a) the engine reports NO pair the oracle lacks, and (b) the
# missing pairs number within 3× the theoretical expectation
# Σ_pairs (1-j^r)^b AND each one was individually missable (p > 1e-6).
LSH_BUDGET = {
    # dp07 entry config: num_hashes=32, bands=16 → r=2 rows per band
    "dp07_minhash_pairs": {"r": 2, "bands": 16, "j_col": "j_x1e4", "j_scale": 1e4},
}


def lsh_boundary_verdict(name, spark_rows, spark_cols, duck_rows, duck_cols):
    """Return (ok, detail) applying the boundary-miss budget; ok=None when
    the mismatch is NOT explainable as boundary misses (caller keeps the
    original FAIL)."""
    import math

    cfg = LSH_BUDGET[name]
    lc = [c.lower() for c in spark_cols]
    try:
        ia, ib, ij = lc.index("id_a"), lc.index("id_b"), lc.index(cfg["j_col"])
    except ValueError:
        return None, "id/jaccard columns not found"
    dlc = [c.lower() for c in duck_cols]
    da, db, dj = dlc.index("id_a"), dlc.index("id_b"), dlc.index(cfg["j_col"])
    got = {(r[ia], r[ib]): r[ij] for r in spark_rows}
    want = {(r[da], r[db]): r[dj] for r in duck_rows}
    extra = set(got) - set(want)
    if extra:
        return None, f"{len(extra)} pairs not in oracle (not a boundary miss)"
    common_diff = [k for k in got if got[k] != want[k]]
    if common_diff:
        return None, f"{len(common_diff)} pairs with differing jaccard values"
    missing = {k: want[k] for k in set(want) - set(got)}
    r, b, scale = cfg["r"], cfg["bands"], cfg["j_scale"]
    expected = sum(math.pow(1.0 - math.pow(j / scale, r), b) for j in want.values())
    budget = max(1.0, 3.0 * expected)
    if len(missing) > budget:
        return None, f"{len(missing)} misses exceed budget {budget:.2f} (expected {expected:.3f})"
    for k, j in missing.items():
        p = math.pow(1.0 - math.pow(j / scale, r), b)
        if p <= 1e-6:
            return None, f"pair {k} at j={j/scale:.3f} has miss prob {p:.2e} — theory says it cannot miss"
    return True, (
        f"boundary-budget: {len(missing)} miss(es) of {len(want)} pairs, "
        f"expected {expected:.3f}, all individually missable"
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from pyspark.sql import SparkSession

    import os

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        # default 1g falls over at the sf1 scale-proof sweep
        .config("spark.driver.memory", os.environ.get("CHECK_ORACLE_MEM", "12g"))
        .appName("check_oracle")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        import os

        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table directory (e.g. sf1)
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"weak {name}: rows-only, {len(spark_rows)} rows  ({el:.1f}s)")
            n_weak += 1
            continue
        try:
            res = con.sql(oracles[name])
            duck_cols = [c for c in res.columns]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if not problems:
            h1 = value_hash(spark_rows, [c.lower() for c in spark_cols])
            h2 = value_hash(duck_rows, [c.lower() for c in duck_cols])
            if h1 != h2:
                problems.append("value-hash mismatch")
                # show first differing row for debugging
                order1 = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
                order2 = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
                s1 = sorted("|".join(norm_cell(r[i]) for i in order1) for r in spark_rows)
                s2 = sorted("|".join(norm_cell(r[i]) for i in order2) for r in duck_rows)
                for a, b in zip(s1, s2):
                    if a != b:
                        problems.append(f"  spark: {a[:150]}")
                        problems.append(f"  duck : {b[:150]}")
                        break
        if problems and name in LSH_BUDGET:
            ok, detail = lsh_boundary_verdict(name, spark_rows, spark_cols, duck_rows, duck_cols)
            if ok:
                print(f"PASS {name}  ({len(spark_rows)} rows, {el:.1f}s) [{detail}]")
                n_pass += 1
                continue
            problems.append(f"boundary-budget rejected: {detail}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]) + "".join("\n" + p for p in problems[1:]))
            n_fail += 1
        else:
            print(f"PASS {name}  ({len(spark_rows)} rows, {el:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
