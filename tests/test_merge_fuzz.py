"""Randomized MERGE INTO property test against an independent python
reference interpreter of the ANSI semantics (DuckDB 1.0 has no MERGE to
differential-test against).

The reference model is written from the SEMANTICS — per target row, the
FIRST matching WHEN arm (in statement order) acts; NULL keys never
equality-match; source-only rows feed NOT MATCHED arms; a target row
with >1 matching source rows under any MATCHED arm is a cardinality
error — and shares no code with the engine's full-outer-join lowering.
Expressions are generated as (sql text, python closure) pairs so both
sides evaluate the same spec independently.
"""

from __future__ import annotations

import random

import pytest

from qlbridge_spark import Engine
from qlbridge_spark.engine import ExecError

N_CASES = 40


def _gen_expr(rng):
    """(sql, fn(t_row, s_row) -> value) — NULL-propagating arithmetic."""
    choice = rng.randint(0, 3)
    if choice == 0:
        c = rng.randint(-5, 99)
        return str(c), lambda t, s, c=c: c
    if choice == 1:
        return "s.v", lambda t, s: s["v"]
    if choice == 2:
        return "t.v + s.v", lambda t, s: None if t["v"] is None or s["v"] is None else t["v"] + s["v"]
    c = rng.randint(1, 4)
    return f"s.v * {c}", lambda t, s, c=c: None if s["v"] is None else s["v"] * c


def _gen_cond(rng, matched):
    """(sql, fn(t_row, s_row) -> bool) — three-valued: None ⇒ not true."""
    choice = rng.randint(0, 2)
    if choice == 0:
        return None, lambda t, s: True
    c = rng.randint(-10, 30)
    if choice == 1 or not matched:
        return f"s.v > {c}", lambda t, s, c=c: s["v"] is not None and s["v"] > c
    return f"t.v < {c}", lambda t, s, c=c: t["v"] is not None and t["v"] < c


def _gen_clauses(rng):
    clauses = []
    n = rng.randint(1, 3)
    kinds = rng.sample(["update", "delete", "insert"], k=min(n, 3))
    for kind in kinds:
        matched = kind != "insert"
        cond_sql, cond_fn = _gen_cond(rng, matched)
        head = "WHEN MATCHED" if matched else "WHEN NOT MATCHED"
        if cond_sql:
            head += f" AND {cond_sql}"
        if kind == "update":
            e_sql, e_fn = _gen_expr(rng)
            clauses.append((f"{head} THEN UPDATE SET v = {e_sql}", "update", cond_fn, e_fn))
        elif kind == "delete":
            clauses.append((f"{head} THEN DELETE", "delete", cond_fn, None))
        else:
            e_sql, e_fn = _gen_expr(rng)
            clauses.append(
                (f"{head} THEN INSERT (k, v) VALUES (s.k, {e_sql})", "insert", cond_fn, e_fn)
            )
    # put matched arms in their generated order but keep at least one arm
    return clauses


def _reference_merge(t_rows, s_rows, clauses):
    """Final multiset of (k, v) per the ANSI spec, or 'cardinality'.

    Cardinality is CONDITION-AWARE (ANSI 14.12 / Delta): a target row is
    an error only when MORE THAN ONE source row's first-matching arm
    would update or delete it — matching source rows whose conditions
    route them to no arm are harmless, and the single acting row (if
    any) wins."""
    by_key: dict = {}
    for s in s_rows:
        if s["k"] is not None:
            by_key.setdefault(s["k"], []).append(s)

    def first_arm(t, s):
        for _, kind, cond_fn, e_fn in clauses:
            if kind == "insert":
                continue
            if cond_fn(t, s):
                return (kind, e_fn)
        return None

    out = []
    for t in t_rows:
        matches = by_key.get(t["k"], []) if t["k"] is not None else []
        acting = [(s, a) for s in matches for a in [first_arm(t, s)] if a is not None]
        if len(acting) > 1:
            return "cardinality"
        if not acting:
            out.append((t["k"], t["v"]))
            continue
        s, (kind, e_fn) = acting[0]
        if kind == "update":
            out.append((t["k"], e_fn(t, s)))
        # delete: drop the row
    t_keys = {t["k"] for t in t_rows if t["k"] is not None}
    for s in s_rows:
        if s["k"] is not None and s["k"] in t_keys:
            continue
        for _, kind, cond_fn, e_fn in clauses:
            if kind != "insert":
                continue
            null_t = {"k": None, "v": None}
            if cond_fn(null_t, s):
                out.append((s["k"], e_fn(null_t, s)))
                break
    return sorted(out, key=repr)


def _gen_rows(rng, n, key_hi, null_frac=0.1, dup_frac=0.15):
    rows, used = [], []
    for _ in range(n):
        if used and rng.random() < dup_frac:
            k = rng.choice(used)
        else:
            k = None if rng.random() < null_frac else rng.randint(0, key_hi)
            if k is not None:
                used.append(k)
        v = None if rng.random() < 0.1 else rng.randint(-20, 120)
        rows.append({"k": k, "v": v})
    return rows


@pytest.fixture(scope="module")
def meng(spark):
    return Engine(spark, "merge-fuzz")


def test_merge_fuzz_matches_reference(meng, spark):
    rng = random.Random(20260814)
    failures = []
    for case in range(N_CASES):
        # unique target keys (a real table has a key); sources may dup
        t_rows = _gen_rows(rng, rng.randint(4, 10), 8, dup_frac=0.0)
        seen = set()
        t_rows = [r for r in t_rows if r["k"] is None or (r["k"] not in seen and not seen.add(r["k"]))]
        s_rows = _gen_rows(rng, rng.randint(3, 9), 11)
        clauses = _gen_clauses(rng)
        stmt = (
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            + " ".join(sql for sql, *_ in clauses)
        )
        meng.register_df("tgt", spark.createDataFrame([(r["k"], r["v"]) for r in t_rows], "k int, v int"))
        meng.register_df("src", spark.createDataFrame([(r["k"], r["v"]) for r in s_rows], "k int, v int"))
        want = _reference_merge(t_rows, s_rows, clauses)
        try:
            meng.execute(stmt)
            got = sorted(((r["k"], r["v"]) for r in meng.sql("SELECT k, v FROM tgt").collect()), key=repr)
        except ExecError as e:
            got = "cardinality" if "cardinality" in str(e) else f"error: {e}"
        if got != want:
            failures.append((case, stmt, t_rows, s_rows, want, got))
    assert not failures, f"{len(failures)} mismatching merges; first: {failures[0]}"


def test_merge_fuzz_native_lowering(spark):
    """The same randomized property corpus through the NATIVE sink
    lowering (merge_when protocol fake interpreting the lowered
    when-chains with F.expr, Delta-style) — every generated expression is
    ANSI-safe, so the native path must be taken each time and agree with
    the independent reference interpreter, including cardinality errors."""
    from test_merge_sink import NativeFakeMergeSink

    rng = random.Random(20260901)
    failures = []
    for case in range(20):
        t_rows = _gen_rows(rng, rng.randint(4, 10), 8, dup_frac=0.0)
        seen = set()
        t_rows = [r for r in t_rows if r["k"] is None or (r["k"] not in seen and not seen.add(r["k"]))]
        s_rows = _gen_rows(rng, rng.randint(3, 9), 11)
        clauses = _gen_clauses(rng)
        stmt = (
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            + " ".join(sql for sql, *_ in clauses)
        )
        e = Engine(spark, f"merge-fuzz-native-{case}")
        sink = NativeFakeMergeSink(
            spark.createDataFrame([(r["k"], r["v"]) for r in t_rows], "k int, v int"), key="k"
        )
        e.register_sink("tgt", sink)
        e.register_df("src", spark.createDataFrame([(r["k"], r["v"]) for r in s_rows], "k int, v int"))
        want = _reference_merge(t_rows, s_rows, clauses)
        try:
            e.execute(stmt)
            assert sink.calls == ["merge_when"], f"case {case}: generic fallback taken for {stmt}"
            got = sorted(((r["k"], r["v"]) for r in sink.df.collect()), key=repr)
        except Exception as ex:
            got = "cardinality" if "cardinality" in str(ex) else f"error: {ex}"
        if got != want:
            failures.append((case, stmt, t_rows, s_rows, want, got))
    assert not failures, f"{len(failures)} mismatching native merges; first: {failures[0]}"


def test_merge_fuzz_string_literals(spark):
    """Gnarly string literals (backslashes, quotes, control chars) through
    BOTH merge paths. The engine's lexer decodes C-style escapes, so the
    native lowering must RE-escape when rendering Spark SQL — Spark's
    default string parser interprets backslash escapes, and an unescaped
    'a\\b' silently became 'a<backspace>' on the native path only
    (NativeFakeMergeSink evaluates the rendered SQL with F.expr, sharing
    Delta's blind spot, so it proves the renderer not just the engine)."""
    from test_merge_sink import NativeFakeMergeSink

    values = [
        "a\\b",            # the ADVICE repro: backslash + 'b'
        "c:\\temp\\new",   # windows-path backslashes before escape letters
        "it's",            # embedded quote
        "tab\there",       # real tab
        "line\nbreak",     # real newline
        "cr\rhere",        # real carriage return
        "trailing\\",      # trailing backslash
        "double\\\\slash", # two literal backslashes
    ]
    for i, val in enumerate(values):
        lit = "'" + val.replace("\\", "\\\\").replace("'", "\\'") + "'"
        stmt = (
            f"MERGE INTO tgt t USING src s ON t.k = s.k "
            f"WHEN MATCHED AND s.name = {lit} THEN UPDATE SET name = {lit} "
            f"WHEN NOT MATCHED THEN INSERT (k, name) VALUES (s.k, {lit})"
        )
        src = [(1, val), (2, "zzz")]
        tgt = [(1, "old1"), (3, "keep")]
        want = sorted([(1, val), (2, val), (3, "keep")])

        gen = Engine(spark, f"merge-strlit-gen-{i}")
        gen.register_df("tgt", spark.createDataFrame(tgt, "k int, name string"))
        gen.register_df("src", spark.createDataFrame(src, "k int, name string"))
        gen.execute(stmt)
        got_gen = sorted((r["k"], r["name"]) for r in gen.sql("SELECT k, name FROM tgt").collect())

        nat = Engine(spark, f"merge-strlit-nat-{i}")
        sink = NativeFakeMergeSink(spark.createDataFrame(tgt, "k int, name string"), key="k")
        nat.register_sink("tgt", sink)
        nat.register_df("src", spark.createDataFrame(src, "k int, name string"))
        nat.execute(stmt)
        assert sink.calls == ["merge_when"], f"value {val!r}: generic fallback taken"
        got_nat = sorted((r["k"], r["name"]) for r in sink.df.collect())

        assert got_gen == want, f"generic path diverged for {val!r}: {got_gen}"
        assert got_nat == want, f"native path diverged for {val!r}: {got_nat}"


def test_merge_native_star_requires_source_coverage(spark):
    """ADVICE low: UPDATE SET * / INSERT * only lower natively when the
    source columns cover the target's (Delta's updateAll/insertAll
    requirement); otherwise the generic path's keep/NULL-fill semantics
    must win — same statement, same result, regardless of sink type."""
    from test_merge_sink import NativeFakeMergeSink

    stmt = (
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    # source missing target column 'extra' → native '*' lowering must NOT fire
    e = Engine(spark, "merge-star-cover-1")
    sink = NativeFakeMergeSink(
        spark.createDataFrame([(1, 10, "a"), (3, 30, "c")], "k int, v int, extra string"), key="k"
    )
    e.register_sink("tgt", sink)
    e.register_df("src", spark.createDataFrame([(1, 11), (2, 22)], "k int, v int"))
    e.execute(stmt)
    assert "merge_when" not in sink.calls, "native '*' lowering fired without source coverage"
    got = sorted((r["k"], r["v"], r["extra"]) for r in sink.df.collect())
    # generic semantics: update keeps target 'extra'; insert NULL-fills it
    assert got == [(1, 11, "a"), (2, 22, None), (3, 30, "c")]

    # source covers target → native path fires and agrees
    e2 = Engine(spark, "merge-star-cover-2")
    sink2 = NativeFakeMergeSink(
        spark.createDataFrame([(1, 10), (3, 30)], "k int, v int"), key="k"
    )
    e2.register_sink("tgt", sink2)
    e2.register_df("src", spark.createDataFrame([(1, 11), (2, 22)], "k int, v int"))
    e2.execute(stmt)
    assert sink2.calls == ["merge_when"]
    assert sorted((r["k"], r["v"]) for r in sink2.df.collect()) == [(1, 11), (2, 22), (3, 30)]


_GNARLY_STRINGS = ["a\\b", "it's", "tab\there", "nl\nx", "plain", "end\\", ""]


def _gen_str_expr(rng):
    """(engine-sql, fn(t_row, s_row) -> str|None) over a `name` column."""
    choice = rng.randint(0, 3)
    if choice == 0:
        v = rng.choice(_GNARLY_STRINGS)
        lit = "'" + v.replace("\\", "\\\\").replace("'", "\\'").replace("\n", "\\n").replace("\t", "\\t") + "'"
        return lit, lambda t, s, v=v: v
    if choice == 1:
        return "s.name", lambda t, s: s["name"]
    if choice == 2:
        return (
            "upper(s.name)",
            lambda t, s: None if s["name"] is None else s["name"].upper(),
        )
    return (
        "concat(t.name, s.name)",
        lambda t, s: None if t["name"] is None or s["name"] is None else t["name"] + s["name"],
    )


def test_merge_fuzz_string_column(spark):
    """Randomized MERGE corpus over a STRING value column (NULLs + gnarly
    literals) through BOTH the generic plan and the native merge_when
    lowering, each against the independent interpreter — the post-
    escaping-fix densification ADVICE asked for."""
    from test_merge_sink import NativeFakeMergeSink

    rng = random.Random(20261001)
    failures = []
    for case in range(16):
        t_rows, s_rows = [], []
        used = set()
        for _ in range(rng.randint(3, 7)):
            k = rng.randint(0, 7)
            if k in used:
                continue
            used.add(k)
            t_rows.append({"k": k, "name": None if rng.random() < 0.2 else rng.choice(_GNARLY_STRINGS)})
        for _ in range(rng.randint(3, 8)):
            k = None if rng.random() < 0.1 else rng.randint(0, 9)
            s_rows.append({"k": k, "name": None if rng.random() < 0.2 else rng.choice(_GNARLY_STRINGS)})
        # dedupe source keys: every arm here is unconditioned, so duplicate
        # source keys would be a cardinality error in every engine — the
        # cardinality domain is covered by test_merge_fuzz_multimatch_conditions
        seen = set()
        s_rows = [r for r in s_rows if r["k"] is None or (r["k"] not in seen and not seen.add(r["k"]))]
        clauses = []
        kinds = rng.sample(["update", "delete", "insert"], k=rng.randint(1, 3))
        for kind in kinds:
            if kind == "update":
                e_sql, e_fn = _gen_str_expr(rng)
                clauses.append((f"WHEN MATCHED THEN UPDATE SET name = {e_sql}", "update", lambda t, s: True, e_fn))
            elif kind == "delete":
                clauses.append(("WHEN MATCHED THEN DELETE", "delete", lambda t, s: True, None))
            else:
                e_sql, e_fn = _gen_str_expr(rng)
                clauses.append(
                    (f"WHEN NOT MATCHED THEN INSERT (k, name) VALUES (s.k, {e_sql})", "insert", lambda t, s: True, e_fn)
                )
        stmt = "MERGE INTO tgt t USING src s ON t.k = s.k " + " ".join(sql for sql, *_ in clauses)

        def ref():
            by_key = {}
            for s in s_rows:
                if s["k"] is not None:
                    by_key.setdefault(s["k"], []).append(s)
            out = []
            for t in t_rows:
                matches = by_key.get(t["k"], []) if t["k"] is not None else []
                if len(matches) > 1 and any(kind != "insert" for _, kind, _, _ in clauses):
                    return "cardinality"
                acted = False
                for s in matches:
                    for _, kind, _, e_fn in clauses:
                        if kind == "insert":
                            continue
                        acted = True
                        if kind == "update":
                            out.append((t["k"], e_fn(t, s)))
                        break  # first matching arm acts
                    break
                if not acted:
                    out.append((t["k"], t["name"]))
            t_keys = {t["k"] for t in t_rows}
            for s in s_rows:
                if s["k"] is None or s["k"] not in t_keys:
                    for _, kind, _, e_fn in clauses:
                        if kind == "insert":
                            out.append((s["k"], e_fn({"k": None, "name": None}, s)))
                            break
            return sorted(out, key=repr)

        want = ref()
        tgt_tuples = [(r["k"], r["name"]) for r in t_rows]
        src_tuples = [(r["k"], r["name"]) for r in s_rows]

        gen = Engine(spark, f"merge-strcol-gen-{case}")
        gen.register_df("tgt", spark.createDataFrame(tgt_tuples, "k int, name string"))
        gen.register_df("src", spark.createDataFrame(src_tuples, "k int, name string"))
        try:
            gen.execute(stmt)
            got_gen = sorted(((r["k"], r["name"]) for r in gen.sql("SELECT k, name FROM tgt").collect()), key=repr)
        except ExecError as e:
            got_gen = "cardinality" if "cardinality" in str(e) else f"error: {e}"

        nat = Engine(spark, f"merge-strcol-nat-{case}")
        sink = NativeFakeMergeSink(spark.createDataFrame(tgt_tuples, "k int, name string"), key="k")
        nat.register_sink("tgt", sink)
        nat.register_df("src", spark.createDataFrame(src_tuples, "k int, name string"))
        try:
            nat.execute(stmt)
            assert sink.calls == ["merge_when"], f"case {case}: generic fallback taken"
            got_nat = sorted(((r["k"], r["name"]) for r in sink.df.collect()), key=repr)
        except Exception as e:
            got_nat = "cardinality" if "cardinality" in str(e) else f"error: {e}"

        if got_gen != want or got_nat != want:
            failures.append((case, stmt, t_rows, s_rows, want, got_gen, got_nat))
    assert not failures, f"{len(failures)} mismatching string merges; first: {failures[0]}"


def test_merge_fuzz_multimatch_conditions(meng, spark):
    """Densified corpus for the condition-aware cardinality domain: tiny
    key space + heavy source duplication guarantees multi-matches, and
    every matched arm carries a condition — so cases split between
    'exactly one acting row applies' and 'two acting rows error', the
    distinction the round-9 rule introduced."""
    rng = random.Random(20260915)
    failures = []
    for case in range(20):
        t_rows = _gen_rows(rng, rng.randint(3, 6), 4, null_frac=0.05, dup_frac=0.0)
        seen = set()
        t_rows = [r for r in t_rows if r["k"] is None or (r["k"] not in seen and not seen.add(r["k"]))]
        s_rows = _gen_rows(rng, rng.randint(6, 12), 4, null_frac=0.05, dup_frac=0.5)
        clauses = []
        for kind in rng.sample(["update", "delete"], k=rng.randint(1, 2)):
            c = rng.randint(-10, 30)
            head = f"WHEN MATCHED AND s.v > {c}"
            cond_fn = lambda t, s, c=c: s["v"] is not None and s["v"] > c
            if kind == "update":
                e_sql, e_fn = _gen_expr(rng)
                clauses.append((f"{head} THEN UPDATE SET v = {e_sql}", "update", cond_fn, e_fn))
            else:
                clauses.append((f"{head} THEN DELETE", "delete", cond_fn, None))
        stmt = (
            "MERGE INTO tgt t USING src s ON t.k = s.k "
            + " ".join(sql for sql, *_ in clauses)
        )
        meng.register_df("tgt", spark.createDataFrame([(r["k"], r["v"]) for r in t_rows], "k int, v int"))
        meng.register_df("src", spark.createDataFrame([(r["k"], r["v"]) for r in s_rows], "k int, v int"))
        want = _reference_merge(t_rows, s_rows, clauses)
        try:
            meng.execute(stmt)
            got = sorted(((r["k"], r["v"]) for r in meng.sql("SELECT k, v FROM tgt").collect()), key=repr)
        except ExecError as e:
            got = "cardinality" if "cardinality" in str(e) else f"error: {e}"
        if got != want:
            failures.append((case, stmt, t_rows, s_rows, want, got))
    assert not failures, f"{len(failures)} mismatching multimatch merges; first: {failures[0]}"
