"""File-level data skipping for versioned parquet sinks.

Delta Lake keeps per-file column min/max/null-count statistics in its
transaction log and prunes non-matching files BEFORE the scan starts —
at 100 TB this is the difference between listing 8 files and listing
80,000. ``ParquetMergeSink`` gets the same design here: at commit time
the sink reads the just-written parquet FOOTERS (driver-side, metadata
only — no data pages touched) and persists a ``_stats.json`` sidecar in
the version directory; at scan time the engine hands the sink the
pushable WHERE conjuncts and only the files whose stats intersect them
are given to ``spark.read.parquet``.

This composes with ``OPTIMIZE t ZORDER BY (...)`` (datapipe/zorder.py):
the Morton layout makes per-file min/max ranges TIGHT on every clustered
column, and this module is what turns those tight ranges into files
never opened. ZORDER_r10.md measured the intersect counts; this makes
the engine act on them.

Correctness contract (the only rule that matters): pruning must be
CONSERVATIVE. A file is dropped only when its statistics PROVE no row
can satisfy a conjunct; on any doubt — missing stats, truncated or
absent min/max, a literal whose type class does not match the stored
stat type (the engine's cross-type coercion shims make mixed-type
comparisons legal, but pruning on them would be guessing) — the file is
kept. The engine always applies the full WHERE to the scanned frame
afterwards, so a kept-but-unneeded file costs I/O, never correctness.

Parquet min/max footnote: writers may TRUNCATE long string statistics,
but the spec requires the stored min to remain a valid lower bound and
the stored max a valid upper bound, so interval-intersection pruning
stays sound on truncated stats.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
from dataclasses import dataclass

from .nodes import (
    ArrayNode,
    BinaryNode,
    BoolNode,
    BooleanNode,
    IdentityNode,
    Node,
    NullNode,
    NumberNode,
    StringNode,
    TriNode,
)

STATS_FILE = "_stats.json"

# ---------------------------------------------------------------------------
# conjunct model — the neutral form the engine hands to the sink
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RangeConjunct:
    """``lo <(=) col <(=) hi`` — one bound may be None (unbounded)."""

    col: str  # lower-cased column name
    lo: object = None
    lo_inc: bool = True
    hi: object = None
    hi_inc: bool = True


@dataclass(frozen=True)
class InConjunct:
    """``col IN (v1, v2, ...)`` / ``col = v`` (a 1-element set)."""

    col: str
    values: tuple


@dataclass(frozen=True)
class NullConjunct:
    """``col IS [NOT] NULL``."""

    col: str
    is_null: bool


# ---------------------------------------------------------------------------
# extraction: WHERE AST → conjuncts this sink's files can be pruned with
# ---------------------------------------------------------------------------


def _literal_value(node: Node):
    """Python value of a literal node, or a no-match sentinel.

    Only shapes whose engine semantics are PLAIN comparison are accepted:
    numbers, strings, booleans. Everything else (subqueries, columns,
    datemath strings are still fine — they parse as str and simply fail
    type-compat later) returns the sentinel."""
    if isinstance(node, NumberNode):
        try:
            return int(node.text)
        except ValueError:
            try:
                return float(node.text)
            except ValueError:
                return _NO
    if isinstance(node, StringNode):
        return node.value
    if isinstance(node, BoolNode):
        return node.value
    return _NO


_NO = object()  # sentinel: not a usable literal


def _column_of(node: Node, refs: set[str], allow_bare: bool) -> str | None:
    """Lower-cased column name when ``node`` is a plain reference to the
    pruning target table; None otherwise. Qualified names must match one
    of ``refs`` (the source's alias/name); longer dotted paths are map
    traversals, never prunable; bare names are only safe when the SELECT
    has a single source (no ambiguity about which table owns them)."""
    if not isinstance(node, IdentityNode):
        return None
    parts = node.parts
    if len(parts) == 1:
        if parts[0] == "*" or not allow_bare:
            return None
        return parts[0].lower()
    if len(parts) == 2 and parts[0].lower() in refs:
        return parts[1].lower()
    return None


_FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}


def extract_conjuncts(where: Node | None, refs: set[str], allow_bare: bool) -> list:
    """Top-level AND conjuncts of ``where`` usable for file pruning.

    Handles ``col <op> literal`` (both orientations), ``col IN
    (literals)``, ``col IS [NOT] NULL`` and the engine's EXCLUSIVE
    ``BETWEEN``. Anything negated, disjunctive, or non-literal is
    ignored — it simply contributes no pruning."""
    out: list = []
    if where is None:
        return out
    stack = [where]
    while stack:
        n = stack.pop()
        if isinstance(n, BinaryNode) and n.op == "AND" and not n.negated:
            stack.append(n.left)
            stack.append(n.right)
            continue
        if isinstance(n, BooleanNode) and n.op == "AND" and not n.negated:
            stack.extend(n.args)
            continue
        c = _conjunct_of(n, refs, allow_bare)
        if c is not None:
            out.append(c)
    return out


def _conjunct_of(n: Node, refs: set[str], allow_bare: bool):
    if isinstance(n, TriNode) and n.op == "BETWEEN" and not n.negated:
        col = _column_of(n.args[0], refs, allow_bare)
        lo, hi = _literal_value(n.args[1]), _literal_value(n.args[2])
        if col is not None and lo is not _NO and hi is not _NO:
            # engine BETWEEN is exclusive on both bounds (vm/vm.go:868)
            return RangeConjunct(col, lo=lo, lo_inc=False, hi=hi, hi_inc=False)
        return None
    if not isinstance(n, BinaryNode):
        return None
    if n.op in ("IS", "ISNOT") and isinstance(n.right, NullNode):
        # IS NOT NULL parses as op=IS with negated=True
        col = _column_of(n.left, refs, allow_bare)
        if col is not None:
            return NullConjunct(col, is_null=(n.op == "IS") and not n.negated)
        return None
    if n.negated:
        return None
    if n.op == "IN" and isinstance(n.right, ArrayNode):
        col = _column_of(n.left, refs, allow_bare)
        if col is None:
            return None
        vals = [_literal_value(i) for i in n.right.items]
        if any(v is _NO for v in vals):
            return None
        return InConjunct(col, tuple(vals))
    if n.op not in ("=", "<", "<=", ">", ">="):
        return None
    col = _column_of(n.left, refs, allow_bare)
    op = n.op
    lit = _literal_value(n.right)
    if col is None:
        # literal <op> col — flip the comparison
        col = _column_of(n.right, refs, allow_bare)
        lit = _literal_value(n.left)
        op = _FLIP.get(op, op)
    if col is None or lit is _NO:
        return None
    if op == "=":
        return InConjunct(col, (lit,))
    if op == "<":
        return RangeConjunct(col, hi=lit, hi_inc=False)
    if op == "<=":
        return RangeConjunct(col, hi=lit, hi_inc=True)
    if op == ">":
        return RangeConjunct(col, lo=lit, lo_inc=False)
    return RangeConjunct(col, lo=lit, lo_inc=True)


# ---------------------------------------------------------------------------
# stats collection (commit time — parquet footers only)
# ---------------------------------------------------------------------------

_TAGGED = {
    "int": int,
    "float": float,
    "str": str,
    "bool": bool,
}


def _tag_value(v):
    """(tag, json-encodable value) for a pyarrow statistics value, or
    None when the type is not one we know how to compare safely."""
    if isinstance(v, bool):  # before int — bool is an int subclass
        return "bool", v
    if isinstance(v, int):
        return "int", v
    if isinstance(v, float):
        return "float", v
    if isinstance(v, str):
        return "str", v
    if isinstance(v, decimal.Decimal):
        return "dec", str(v)
    if isinstance(v, datetime.datetime):
        return "ts", v.isoformat()
    if isinstance(v, datetime.date):
        return "date", v.isoformat()
    return None


def _schema_tags(schema_json: str | None) -> dict:
    """column name → stat tag from a Spark schema JSON, for typing
    hive-partition directory values (which exist only as path strings).
    Unknown/complex types are absent → no partition entry → file kept."""
    if not schema_json:
        return {}
    try:
        fields = json.loads(schema_json).get("fields") or []
    except ValueError:
        return {}
    simple = {
        "byte": "int", "short": "int", "integer": "int", "long": "int",
        "float": "float", "double": "float", "string": "str",
        "boolean": "bool", "date": "date", "timestamp": "ts",
        "timestamp_ntz": "ts",
    }
    out = {}
    for f in fields:
        t = f.get("type")
        if isinstance(t, str):
            if t in simple:
                out[f["name"]] = simple[t]
            elif t.startswith("decimal"):
                out[f["name"]] = "dec"
    return out


def _partition_entries(rel: str, rows: int, tags: dict) -> dict:
    """Stat entries derived from a file's hive-partition path components
    (``col=value`` dirs): the column is constant across the file, so
    min = max = the decoded value — this is what makes partition pruning
    fall out of the ordinary file-skipping machinery, and what lets
    copy-on-write DML rewrite only the matching partitions. Undecodable
    components are skipped (conservative: no entry → file kept)."""
    import urllib.parse

    out: dict = {}
    for comp in rel.split(os.sep)[:-1]:
        if "=" not in comp:
            continue
        name, _, raw = comp.partition("=")
        if raw == "__HIVE_DEFAULT_PARTITION__":
            out[name] = {"nulls": rows}  # the whole file is NULL for this column
            continue
        tag = tags.get(name)
        if tag is None:
            continue
        v = urllib.parse.unquote(raw)
        try:
            if tag == "int":
                val = int(v)
            elif tag == "float":
                val = float(v)
            elif tag == "bool":
                if v.lower() not in ("true", "false"):
                    continue
                val = v.lower() == "true"
            elif tag == "date":
                datetime.date.fromisoformat(v)
                val = v
            elif tag == "ts":
                datetime.datetime.fromisoformat(v)
                val = v
            elif tag == "dec":
                decimal.Decimal(v)
                val = v
            else:
                val = v
        except (ValueError, decimal.InvalidOperation):
            continue
        out[name] = {"t": tag, "min": val, "max": val, "nulls": 0}
    return out


def collect_file_stats(version_dir: str, schema_json: str | None = None) -> dict:
    """Per-file column stats for every parquet data file under
    ``version_dir``, from footer metadata only (no data pages read).
    Hive-partition path components (``col=value``) contribute constant
    min=max entries for the partition columns, typed via ``schema_json``.

    Returns the sidecar dict: ``{"schema": ..., "files": {relpath:
    {"rows": n, "columns": {name: {"t": tag, "min": v, "max": v,
    "nulls": n}}}}}``. A column entry may lack min/max (stats absent)
    or nulls (null counts unavailable) — pruning treats absences as
    unknown and keeps the file."""
    import pyarrow.parquet as pq

    tags = _schema_tags(schema_json)
    files: dict = {}
    for root, _, names in os.walk(version_dir):
        for fn in sorted(names):
            if fn.startswith(("_", ".")) or not fn.endswith(".parquet"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, version_dir)
            md = pq.ParquetFile(path).metadata
            cols: dict = {}
            for j in range(md.num_columns):
                # aggregate row-group stats to file grain
                name = None
                mins, maxs, nulls = [], [], []
                have_minmax = have_nulls = True
                for i in range(md.num_row_groups):
                    cc = md.row_group(i).column(j)
                    name = cc.path_in_schema
                    if "." in name:  # nested — not prunable
                        name = None
                        break
                    st = cc.statistics
                    if st is None:
                        have_minmax = have_nulls = False
                        continue
                    if st.null_count is None:
                        have_nulls = False
                    else:
                        nulls.append(st.null_count)
                    if not st.has_min_max or st.min is None or st.max is None:
                        have_minmax = False
                        continue
                    mins.append(st.min)
                    maxs.append(st.max)
                if name is None:
                    continue
                entry: dict = {}
                if have_minmax and mins:
                    try:
                        lo, hi = min(mins), max(maxs)
                    except TypeError:  # mixed incomparable row-group stats
                        lo = hi = None
                    tl = _tag_value(lo) if lo is not None else None
                    th = _tag_value(hi) if hi is not None else None
                    if tl is not None and th is not None:
                        # int/float may mix across row groups; unify
                        tag = tl[0] if tl[0] == th[0] else (
                            "float" if {tl[0], th[0]} == {"int", "float"} else None
                        )
                        if tag is not None:
                            entry["t"] = tag
                            entry["min"] = float(tl[1]) if tag == "float" else tl[1]
                            entry["max"] = float(th[1]) if tag == "float" else th[1]
                if have_nulls:
                    entry["nulls"] = sum(nulls) if nulls else 0
                if entry:
                    cols[name] = entry
            cols.update(_partition_entries(rel, md.num_rows, tags))
            files[rel] = {"rows": md.num_rows, "columns": cols}
    out = {"files": files}
    if schema_json is not None:
        out["schema"] = schema_json
    return out


def write_stats_sidecar(version_dir: str, schema_json: str | None = None) -> None:
    """Collect and atomically persist the stats sidecar for a freshly
    committed snapshot dir. Best-effort by design: a failure here leaves
    the snapshot valid and simply disables pruning for it."""
    stats = collect_file_stats(version_dir, schema_json)
    tmp = os.path.join(version_dir, STATS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(version_dir, STATS_FILE))


def load_stats_sidecar(version_dir: str) -> dict | None:
    try:
        with open(os.path.join(version_dir, STATS_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


# ---------------------------------------------------------------------------
# pruning (scan time)
# ---------------------------------------------------------------------------


def _decode_stat(tag: str, v):
    if tag == "dec":
        return decimal.Decimal(v)
    if tag == "ts":
        return datetime.datetime.fromisoformat(v)
    if tag == "date":
        return datetime.date.fromisoformat(v)
    return v


def _coerce_literal(lit, tag: str):
    """``lit`` in the stat's comparison domain, or None when the type
    classes don't safely align (→ keep the file)."""
    if tag in ("int", "float", "dec"):
        if isinstance(lit, bool) or not isinstance(lit, (int, float)):
            return None
        # exact cross-domain compares: Decimal(str()) never rounds the way
        # a float() cast of a big int64 would (which could false-drop a
        # boundary file)
        return decimal.Decimal(str(lit))
    if tag == "str":
        return lit if isinstance(lit, str) else None
    if tag == "bool":
        return lit if isinstance(lit, bool) else None
    if tag == "ts":
        if not isinstance(lit, str):
            return None
        try:
            ts = datetime.datetime.fromisoformat(lit)
        except ValueError:
            return None
        return ts
    if tag == "date":
        if not isinstance(lit, str):
            return None
        try:
            return datetime.date.fromisoformat(lit)
        except ValueError:
            try:
                # a full timestamp literal against a date column: compare
                # on the date part, widening to keep the bound valid
                return datetime.datetime.fromisoformat(lit).date()
            except ValueError:
                return None
    return None


def _stat_bounds(entry: dict):
    tag = entry.get("t")
    if tag is None or "min" not in entry or "max" not in entry:
        return None
    try:
        lo = _decode_stat(tag, entry["min"])
        hi = _decode_stat(tag, entry["max"])
    except (ValueError, decimal.InvalidOperation):
        return None
    if tag in ("int", "float"):
        lo, hi = decimal.Decimal(str(lo)), decimal.Decimal(str(hi))
        tag = "dec"
    return tag, lo, hi


def _cmp_ready(a, b) -> bool:
    """Can ``a < b`` be evaluated without raising (naive/aware datetime
    mix is the real-world hazard)?"""
    try:
        a < b  # noqa: B015
    except TypeError:
        return False
    return True


def file_may_match(fstats: dict, conj, colmap: dict[str, str]) -> bool:
    """Could ANY row of this file satisfy ``conj``? Unknown → True."""
    actual = colmap.get(conj.col)
    entry = (fstats.get("columns") or {}).get(actual) if actual else None
    rows = fstats.get("rows")
    if isinstance(conj, NullConjunct):
        if entry is None or "nulls" not in entry:
            return True
        if conj.is_null:
            return entry["nulls"] > 0
        return rows is None or entry["nulls"] < rows
    # comparison conjuncts are null-rejecting: a file that is ALL nulls
    # for the column can never produce a matching row
    if entry is not None and "nulls" in entry and rows is not None and entry["nulls"] >= rows > 0:
        return False
    if entry is None:
        return True
    b = _stat_bounds(entry)
    if b is None:
        return True
    tag, lo, hi = b
    if isinstance(conj, InConjunct):
        for v in conj.values:
            cv = _coerce_literal(v, tag)
            if cv is None or not (_cmp_ready(cv, lo) and _cmp_ready(cv, hi)):
                return True  # un-compareable literal → can't prune on it
            if lo <= cv <= hi:
                return True
        return False
    if isinstance(conj, RangeConjunct):
        if conj.lo is not None:
            cv = _coerce_literal(conj.lo, tag)
            if cv is not None and _cmp_ready(cv, hi):
                if hi < cv or (not conj.lo_inc and hi == cv):
                    return False
        if conj.hi is not None:
            cv = _coerce_literal(conj.hi, tag)
            if cv is not None and _cmp_ready(cv, lo):
                if lo > cv or (not conj.hi_inc and lo == cv):
                    return False
        return True
    return True


def prune_files(stats: dict, conjuncts: list) -> tuple[list[str], int]:
    """(surviving relative paths, total file count). Column-name matching
    is case-insensitive but refuses ambiguous lower-case collisions."""
    files = stats.get("files") or {}
    total = len(files)
    if not conjuncts or not files:
        return sorted(files), total
    # one case-map across the snapshot (files share a write schema)
    seen: dict[str, str] = {}
    ambiguous: set[str] = set()
    for f in files.values():
        for name in f.get("columns") or {}:
            low = name.lower()
            if low in seen and seen[low] != name:
                ambiguous.add(low)
            seen[low] = name
    colmap = {k: v for k, v in seen.items() if k not in ambiguous}
    kept = [
        rel
        for rel, fstats in files.items()
        if all(file_may_match(fstats, c, colmap) for c in conjuncts)
    ]
    return sorted(kept), total
