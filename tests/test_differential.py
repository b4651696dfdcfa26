"""Differential fuzzing: a deterministic corpus of randomly generated
queries runs through the qlbridge_spark engine AND DuckDB on identical
data; results must match row-for-row.

The grammar stays inside the dialect intersection (single-quoted
strings, % modulo, CASE, coalesce/nullif/greatest/least, IS [NOT]
NULL / IS DISTINCT FROM, IN lists, LIKE, sum/min/max/count, GROUP BY,
ORDER BY ... NULLS FIRST) and avoids the documented divergences
(exclusive BETWEEN, int division). Integers and strings only — no
float comparison fuzz. Seeded: failures reproduce exactly; each query
is printed on failure."""

import random

import duckdb
import pytest

ROWS = []
_rng = random.Random(20240814)
for i in range(300):
    a = None if _rng.random() < 0.12 else _rng.randint(-20, 20)
    b = None if _rng.random() < 0.12 else _rng.randint(-20, 20)
    s = None if _rng.random() < 0.1 else _rng.choice(["alpha", "beta", "gamma", "delta", "axe"])
    ROWS.append((i, a, b, s))


@pytest.fixture(scope="module")
def feng(spark):
    from qlbridge_spark import Engine

    e = Engine(spark)
    e.register_df("fz", spark.createDataFrame(ROWS, "id int, a int, b int, s string"))
    con = duckdb.connect()
    con.execute("CREATE TABLE fz (id int, a int, b int, s varchar)")
    con.executemany("INSERT INTO fz VALUES (?, ?, ?, ?)", ROWS)
    return e, con


def _gen_scalar(rng):
    choices = [
        "a",
        "b",
        "id % 7",
        "a + b",
        "a * 2",
        "abs(a)",
        "coalesce(a, b, 0)",
        "nullif(a, b)",
        "greatest(a, b)",
        "least(a, b)",
        "CASE WHEN a > b THEN a ELSE b END",
        "CASE s WHEN 'alpha' THEN 1 WHEN 'beta' THEN 2 ELSE 0 END",
        "CASE WHEN a IS NULL THEN -99 WHEN a > 0 THEN 1 ELSE -1 END",
        "sign(a)",
        "mod(abs(a) + 1, 5)",
        "substring(s, 2, 3)",
        "upper(s)",
        "reverse(s)",
        "instr(s, 'a')",
        "concat_ws('-', s, 'z')",
        "lpad(s, 8, '.')",
        "left(s, 3)",
        "length(s)",
        "starts_with(s, 'a')",
        "regexp_replace(s, 'a', 'A')",  # first-only (DuckDB parity, r8)
        "regexp_replace(s, 'a', 'A', 'g')",  # explicit global flag
        # group refs excluded here: semantics now MATCH but the ref syntax
        # differs ($1 Java vs \1 RE2) — pinned in test_regexp_replace.py
        "try_cast(s AS int)",
        "if(a > 0, 'pos', 'neg')",
    ]
    return rng.choice(choices)


def _gen_pred(rng):
    choices = [
        "a > b",
        "a >= 0",
        "a IS NULL",
        "b IS NOT NULL",
        "a IS DISTINCT FROM b",
        "a IS NOT DISTINCT FROM b",
        "a IN (1, 2, 3, 5, 8)",
        "s LIKE '%a%'",
        "s IN ('alpha', 'beta')",
        "a % 2 = 0",
        "(a > 0 AND b > 0)",
        "(a < 0 OR b < 0)",
        "NOT (a = b)",
    ]
    return rng.choice(choices)


def _gen_query(rng):
    if rng.random() < 0.4:
        # aggregate shape
        key = rng.choice(["s", "id % 3", "CASE WHEN a > 0 THEN 'p' ELSE 'n' END"])
        aggs = rng.sample(
            [
                "count(*) AS c",
                "sum(a) AS sa",
                "min(b) AS mb",
                "max(a) AS ma",
                "count(b) AS cb",
                "sum(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS pos",
            ],
            k=rng.randint(1, 3),
        )
        where = f" WHERE {_gen_pred(rng)}" if rng.random() < 0.6 else ""
        return (
            f"SELECT {key} AS k, {', '.join(aggs)} FROM fz{where} "
            f"GROUP BY k ORDER BY k NULLS FIRST"
        )
    cols = [f"{_gen_scalar(rng)} AS c{i}" for i in range(rng.randint(1, 3))]
    where = f" WHERE {_gen_pred(rng)}" if rng.random() < 0.7 else ""
    return f"SELECT id, {', '.join(cols)} FROM fz{where} ORDER BY id NULLS FIRST"


def _gen_query_v2(rng):
    """Second-wave shapes: subqueries, set ops, window functions,
    DISTINCT ON, HAVING, ordered-set aggregates."""
    shape = rng.randint(0, 5)
    if shape == 0:
        # scalar subquery + IN subquery
        return (
            "SELECT id, a, (SELECT max(b) FROM fz) AS mb FROM fz"
            " WHERE a IN (SELECT b FROM fz WHERE b > 5) ORDER BY id NULLS FIRST"
        )
    if shape == 1:
        op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        return (
            f"SELECT a FROM fz WHERE a > 0 {op} SELECT b FROM fz WHERE b > 0"
            " ORDER BY a NULLS FIRST"
        )
    if shape == 2:
        fn = rng.choice(
            ["row_number()", "rank()", "dense_rank()", "sum(a)", "count(*)"]
        )
        return (
            f"SELECT id, {fn} OVER (PARTITION BY s ORDER BY id) AS w FROM fz"
            " WHERE s IS NOT NULL ORDER BY id NULLS FIRST"
        )
    if shape == 3:
        return (
            "SELECT DISTINCT ON (s) s, id, a FROM fz WHERE s IS NOT NULL"
            " ORDER BY s, id"
        )
    if shape == 4:
        having = rng.choice(["count(*) > 5", "sum(a) IS NOT NULL", "min(b) < 0"])
        return (
            f"SELECT s, count(*) AS c FROM fz GROUP BY s HAVING {having}"
            " ORDER BY s NULLS FIRST"
        )
    return (
        "SELECT s, string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS ids"
        " FROM fz WHERE s IS NOT NULL AND id < 40 GROUP BY s ORDER BY s"
    )


def test_differential_corpus(feng):
    e, con = feng
    rng = random.Random(99)
    failures = []
    for qi in range(60):
        q = _gen_query(rng)
        spark_rows = [tuple(r) for r in e.execute(q).collect()]
        duck_rows = con.execute(q).fetchall()
        if spark_rows != duck_rows:
            failures.append((q, spark_rows[:5], duck_rows[:5]))
    assert not failures, f"{len(failures)} mismatching queries: {failures[:3]}"


def test_differential_corpus_v2(feng):
    e, con = feng
    rng = random.Random(7)
    failures = []
    for qi in range(24):
        q = _gen_query_v2(rng)
        spark_rows = sorted((tuple(r) for r in e.execute(q).collect()), key=repr)
        duck_rows = sorted((tuple(r) for r in con.execute(q).fetchall()), key=repr)
        if spark_rows != duck_rows:
            failures.append((q, spark_rows[:4], duck_rows[:4]))
    assert not failures, f"{len(failures)} mismatching queries: {failures[:3]}"


def test_differential_table_shapes(feng):
    """v3: lateral/unnest/pivot/values table expressions vs DuckDB."""
    e, con = feng
    queries = [
        # single-column unnest of a constructed array (explode semantics)
        "SELECT id, unnest([a, b]) AS v FROM fz WHERE id < 50 ORDER BY id NULLS FIRST, v NULLS FIRST",
        # correlated LATERAL aggregate over an expression key
        "SELECT f.id, l.m FROM fz f, LATERAL (SELECT max(a) AS m FROM fz i"
        " WHERE i.id % 10 = f.id % 10) l WHERE f.id < 30 ORDER BY f.id",
        # LATERAL top-1 per key
        "SELECT f.id, l.b FROM fz f, LATERAL (SELECT b FROM fz i WHERE i.id % 7 = f.id % 7"
        " AND i.b IS NOT NULL ORDER BY i.b DESC, i.id LIMIT 1) l WHERE f.id < 20 ORDER BY f.id",
        # bracketed PIVOT with an explicit IN list
        "SELECT * FROM (SELECT s, a FROM fz WHERE s IS NOT NULL AND a IS NOT NULL) p"
        " PIVOT (count(a) FOR s IN ('alpha', 'beta', 'axe')) ORDER BY 1 NULLS FIRST, 2, 3",
        # VALUES join
        "SELECT f.id, v.tag FROM fz f JOIN (VALUES (0, 'zero'), (1, 'one')) v(r, tag)"
        " ON f.id % 2 = v.r WHERE f.id < 10 ORDER BY f.id",
        # DISTINCT ON over an expression key with ORDER tie-break
        "SELECT DISTINCT ON (id % 5) id % 5 AS k, id FROM fz WHERE id < 40 ORDER BY id % 5, id",
    ]
    failures = []
    for q in queries:
        spark_rows = sorted((tuple(r) for r in e.execute(q).collect()), key=repr)
        duck_rows = sorted((tuple(r) for r in con.execute(q).fetchall()), key=repr)
        if spark_rows != duck_rows:
            failures.append((q, spark_rows[:4], duck_rows[:4]))
    assert not failures, f"{len(failures)} mismatching: {failures}"


# ---------------------------------------------------------------------------
# third-wave shapes (round 9): table constructors + lateral UNNEST —
# (VALUES ...) AS t(...), comma-lateral and LEFT JOIN UNNEST, unnest
# aggregation. Array rows include empty and NULL arrays (the rows a
# lateral comma join must DROP and a LEFT JOIN must keep).
# ---------------------------------------------------------------------------
VROWS = []
_vrng = random.Random(77)
for i in range(60):
    arr = None if _vrng.random() < 0.12 else [
        _vrng.randint(-5, 9) for _ in range(_vrng.randint(0, 4))
    ]
    s = _vrng.choice(["alpha", "beta", "gamma", None])
    VROWS.append((i, arr, s))


@pytest.fixture(scope="module")
def veng(spark):
    from qlbridge_spark import Engine

    e = Engine(spark)
    e.register_df("fzv", spark.createDataFrame(VROWS, "id int, arr array<int>, s string"))
    con = duckdb.connect()
    con.execute("CREATE TABLE fzv (id int, arr int[], s varchar)")
    con.executemany("INSERT INTO fzv VALUES (?, ?, ?)", VROWS)
    return e, con


def _gen_query_v3(rng):
    shape = rng.randint(0, 4)
    if shape == 0:
        # literal table constructor with computed projection
        rows = ", ".join(
            f"({rng.randint(-9, 9)}, '{rng.choice(['x', 'y', 'z'])}')" for _ in range(rng.randint(2, 4))
        )
        return (
            f"SELECT t.a + 1 AS a1, t.b FROM (VALUES {rows}) AS t(a, b)"
            " ORDER BY a1, b"
        )
    if shape == 1:
        c = rng.randint(-5, 9)
        return (
            f"SELECT f.id, u.x FROM fzv f, UNNEST(f.arr) AS u(x) WHERE u.x > {c}"
            " ORDER BY f.id, u.x"
        )
    if shape == 2:
        return (
            "SELECT u.x, count(*) AS c, min(f.id) AS mn FROM fzv f, UNNEST(f.arr) AS u(x)"
            " GROUP BY u.x ORDER BY u.x"
        )
    if shape == 3:
        # LEFT JOIN UNNEST keeps empty/NULL-array rows
        return (
            "SELECT f.id, u.x FROM fzv f LEFT JOIN UNNEST(f.arr) AS u(x) ON true"
            " WHERE f.s IS NOT NULL ORDER BY f.id, u.x NULLS FIRST"
        )
    # VALUES joined to a base table
    k = rng.randint(2, 5)
    rows = ", ".join(f"({i}, 'n{i}')" for i in range(k))
    return (
        f"SELECT f.id, v.nm FROM fzv f JOIN (VALUES {rows}) AS v(k, nm)"
        f" ON f.id % {k} = v.k WHERE f.id < 20 ORDER BY f.id, v.nm"
    )


# ---------------------------------------------------------------------------
# fourth-wave shapes (round 10): RANDOMIZED lateral derived tables (the
# r7 decorrelation machinery: aggregates, top-n LIMIT, GROUP BY inside),
# PIVOT/UNPIVOT with random agg + IN lists, and CTE + set-op chains —
# previously covered only by the fixed 6-query list above.
# ---------------------------------------------------------------------------
def _gen_query_v4(rng):
    shape = rng.randint(0, 6)
    if shape == 6:
        # grouping-sets family: ROLLUP / CUBE / explicit GROUPING SETS
        # with grouping() markers (one Expand+Aggregate plan both sides)
        aggs = rng.sample(["count(*) AS c", "sum(a) AS sa", "min(b) AS mb"], k=rng.randint(1, 2))
        form = rng.choice([
            "ROLLUP (s, g)",
            "CUBE (s, g)",
            "GROUPING SETS ((s, g), (s), ())",
            "GROUPING SETS ((s, g), (g))",
        ])
        return (
            f"SELECT s, id % 3 AS g, grouping(s) AS gs, {', '.join(aggs)} FROM fz"
            f" WHERE a IS NOT NULL GROUP BY {form}"
            " ORDER BY s NULLS FIRST, g NULLS FIRST, gs"
        )
    if shape == 0:
        # comma LATERAL single aggregate over a modulo key.
        # DuckDB 1.0 DROPS the always-one-row result of a correlated
        # lateral GLOBAL aggregate when the group is empty — for non-count
        # aggregates only (count and scalar subqueries keep it; pinned in
        # test_corr_range.TestNullSafeCorrelation). The engine follows
        # ANSI/Postgres (row kept, NULL value). So: shapes whose groups
        # can be EMPTIED (inner preds, null-safe correlation) draw only
        # count-family aggregates; bare modulo groups (always non-empty
        # over 300 rows) may draw any aggregate.
        k = rng.randint(3, 10)
        corr = f"i.id % {k} = f.id % {k}"
        roll = rng.random()
        if roll < 0.35:
            pred = rng.choice(
                ["i.a > 5", "i.b IS NOT NULL", "i.a IS NOT DISTINCT FROM i.b", "i.s LIKE '%a%'"]
            )
            agg = rng.choice(["count(*)", "count(i.b)"])
            where = f" AND {pred}"
        elif roll < 0.55:
            # null-safe correlation (round-10: IS NOT DISTINCT FROM pairs)
            corr = "i.b IS NOT DISTINCT FROM f.b"
            agg = rng.choice(["count(*)", "count(i.a)"])
            where = ""
        else:
            agg = rng.choice(["sum(i.a)", "min(i.b)", "max(i.a)", "count(*)", "count(i.b)"])
            where = ""
        return (
            f"SELECT f.id, l.m FROM fz f, LATERAL (SELECT {agg} AS m FROM fz i"
            f" WHERE {corr}{where}) l WHERE f.id < 30 ORDER BY f.id"
        )
    if shape == 1:
        # LATERAL top-n per key (deterministic: unique id tie-break)
        n = rng.randint(1, 3)
        k = rng.randint(4, 9)
        dir_ = rng.choice(["DESC", "ASC"])
        return (
            f"SELECT f.id, l.b FROM fz f, LATERAL (SELECT i.b FROM fz i"
            f" WHERE i.id % {k} = f.id % {k} AND i.b IS NOT NULL"
            f" ORDER BY i.b {dir_}, i.id LIMIT {n}) l WHERE f.id < 20"
            " ORDER BY f.id, l.b"
        )
    if shape == 2:
        # LATERAL with GROUP BY inside the derived table
        k = rng.randint(3, 8)
        agg = rng.choice(["count(*)", "sum(i.a)", "min(i.id)"])
        return (
            f"SELECT f.id, l.k2, l.c FROM fz f, LATERAL (SELECT i.s AS k2, {agg} AS c"
            f" FROM fz i WHERE i.id % {k} = f.id % {k} AND i.s IS NOT NULL GROUP BY i.s) l"
            " WHERE f.id < 15 ORDER BY f.id, l.k2, l.c"
        )
    if shape == 3:
        # bracketed PIVOT: random agg + random IN list
        agg = rng.choice(["count(a)", "sum(a)", "min(a)", "max(a)"])
        tags = rng.sample(["alpha", "beta", "gamma", "axe"], k=rng.randint(2, 3))
        inlist = ", ".join(f"'{t}'" for t in tags)
        where = f" AND {_gen_pred(rng)}" if rng.random() < 0.5 else ""
        cols = ", ".join(str(i + 1) for i in range(len(tags)))
        return (
            f"SELECT * FROM (SELECT s, a FROM fz WHERE s IS NOT NULL AND a IS NOT NULL{where}) p"
            f" PIVOT ({agg} FOR s IN ({inlist})) ORDER BY {cols}"
        )
    if shape == 4:
        # bracketed UNPIVOT (narrow melt, ANSI NULL-dropping in both)
        n = rng.randint(10, 60)
        return (
            f"SELECT * FROM (SELECT id, a, b FROM fz WHERE id < {n}) p"
            " UNPIVOT (v FOR col IN (a, b)) ORDER BY id, col"
        )
    # CTE feeding a set-op chain
    c1, c2 = rng.randint(-5, 5), rng.randint(-5, 5)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return (
        f"WITH big AS (SELECT a FROM fz WHERE a > {c1})"
        f" SELECT a FROM big {op} SELECT b AS a FROM fz WHERE b > {c2}"
        " ORDER BY a NULLS FIRST"
    )


def test_differential_corpus_v4(feng):
    e, con = feng
    rng = random.Random(41)
    failures = []
    for qi in range(30):
        q = _gen_query_v4(rng)
        spark_rows = sorted((tuple(r) for r in e.execute(q).collect()), key=repr)
        duck_rows = sorted((tuple(r) for r in con.execute(q).fetchall()), key=repr)
        if spark_rows != duck_rows:
            failures.append((q, spark_rows[:4], duck_rows[:4]))
    assert not failures, f"{len(failures)} mismatching v4 queries: {failures[:3]}"


def test_differential_corpus_v3(veng):
    e, con = veng
    rng = random.Random(31)
    failures = []
    for qi in range(30):
        q = _gen_query_v3(rng)
        spark_rows = sorted((tuple(r) for r in e.execute(q).collect()), key=repr)
        duck_rows = sorted((tuple(r) for r in con.execute(q).fetchall()), key=repr)
        if spark_rows != duck_rows:
            failures.append((q, spark_rows[:4], duck_rows[:4]))
    assert not failures, f"{len(failures)} mismatching v3 queries: {failures[:3]}"
