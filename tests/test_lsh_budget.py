"""Boundary-miss budget for probabilistic LSH oracle entries
(scripts/check_oracle.py, round-7 directive #6): theory-predicted misses
at the banding decision boundary are accepted, anything else still FAILs.
Pure python — no Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracle import lsh_boundary_verdict  # noqa: E402

COLS = ["id_a", "id_b", "j_x1e4"]
NAME = "dp07_minhash_pairs"


def _rows(pairs):
    return [(a, b, j) for (a, b), j in pairs.items()]


def test_boundary_miss_within_budget_passes():
    # 200k-ish corpus: misses at j=0.615 have p=(1-j^2)^16 ≈ 5e-4 each
    want = {(i, i + 1): 6150 for i in range(0, 4000, 2)}
    got = dict(want)
    del got[(0, 1)], got[(2, 3)]  # two boundary misses
    ok, detail = lsh_boundary_verdict(NAME, _rows(got), COLS, _rows(want), COLS)
    assert ok and "2 miss(es)" in detail


def test_high_j_miss_rejected():
    # a j=0.95 pair has miss prob (1-0.9)^16 ≈ 1e-16 — cannot miss
    want = {(1, 2): 9500, (3, 4): 6150}
    got = {(3, 4): 6150}
    ok, detail = lsh_boundary_verdict(NAME, _rows(got), COLS, _rows(want), COLS)
    assert ok is None and "cannot miss" in detail


def test_extra_pair_rejected():
    want = {(1, 2): 6150}
    got = {(1, 2): 6150, (9, 10): 6150}
    ok, detail = lsh_boundary_verdict(NAME, _rows(got), COLS, _rows(want), COLS)
    assert ok is None and "not in oracle" in detail


def test_too_many_misses_rejected():
    want = {(i, i + 1): 6150 for i in range(0, 40, 2)}  # 20 pairs, expected ~0.01
    got = {k: v for k, v in list(want.items())[5:]}  # 5 misses >> budget
    ok, detail = lsh_boundary_verdict(NAME, _rows(got), COLS, _rows(want), COLS)
    assert ok is None and "exceed budget" in detail


def test_value_disagreement_rejected():
    want = {(1, 2): 6150, (3, 4): 7000}
    got = {(1, 2): 6150, (3, 4): 7001}
    ok, detail = lsh_boundary_verdict(NAME, _rows(got), COLS, _rows(want), COLS)
    assert ok is None and "differing jaccard" in detail
