"""Lucene SloppyPhraseMatcher semantics (query/sloppy.py) — hand-computed
goldens from SloppyPhraseMatcher.java traces, cross-implementation fuzz
against the independently-written oracle twin (oracle._sloppy_pf: min-scan
state machine vs the engine's heap), and the 2-term alternating-successor-
chain characterization that backs the DuckDB bm25_simple_nested oracle."""

from __future__ import annotations

import random

from apache___solr_spark.query.sloppy import sloppy_freq


class _FakeIdx:
    def __init__(self, positions):
        self.positions = positions


def _oracle_pf(terms, plists, slop):
    from apache___solr_spark.oracle import _sloppy_pf

    idx = _FakeIdx({t: {0: pl} for t, pl in zip(terms, plists)})
    return _sloppy_pf(idx, terms, 0, slop)


def test_sloppy_goldens_hand_computed():
    """Traces of the published algorithm (phrase "a b", offsets 0/1;
    adjusted positions = raw - offset)."""
    # doc "a x x x x b": one window, matchLength 4
    assert sloppy_freq([[0], [5]], 10, groups=[0, 1]) == 1.0 / 5.0
    # transposed "b a": matches at matchLength 2 (out-of-order cost) —
    # ordered-window counting would reject this entirely
    assert sloppy_freq([[1], [0]], 2, groups=[0, 1]) == 1.0 / 3.0
    assert sloppy_freq([[1], [0]], 1, groups=[0, 1]) == 0.0
    # "a ... b a": TWO matches — (a0,b5) len 5 and (b5,a6) len 1
    assert sloppy_freq([[0, 6], [6]], 10, groups=[0, 1]) == 1.0 / 6.0 + 0.5
    # exact adjacency weighs 1
    assert sloppy_freq([[0], [1]], 2, groups=[0, 1]) == 1.0
    # minimization consumes intermediate crossings: b at raw {1,2,3,6},
    # a at {4,16} -> ONE match of length 0 (b sweeps to raw 6/adj 5? no:
    # adj = raw-1 -> {0,1,2,5}; sweep ends at adj 5 > a's 4?  raw 5 ->
    # adj 4 == a: window closes at 0), not one per crossing
    assert sloppy_freq([[4, 16], [0, 1, 2, 5]], 5, groups=[0, 1]) == 1.0
    # absent term
    assert sloppy_freq([[0], []], 5, groups=[0, 1]) == 0.0
    # single-term phrase degenerates to tf
    assert sloppy_freq([[3, 7, 9]], 2) == 3.0


def test_sloppy_repeats_distinct_positions():
    """Repeated phrase terms hold distinct raw positions: "a a"~2 over a
    doc with a@{0,1} matches once at matchLength 0 (ptr0@0, ptr1@1 ->
    adjusted both 0), not twice."""
    assert sloppy_freq([[0, 1], [0, 1]], 2, groups=[0, 0]) == 1.0
    # only one occurrence: the second pointer has nowhere to sit
    assert sloppy_freq([[5], [5]], 4, groups=[0, 0]) == 0.0


def test_engine_vs_oracle_matcher_fuzz():
    """The heap-based engine matcher and the min-scan oracle twin are
    independent implementations of the same algorithm — 5k random cases
    incl. repeated terms must agree exactly."""
    rng = random.Random(42)
    for trial in range(5000):
        n = rng.randrange(2, 5)
        nterms = rng.randrange(1, n + 1)
        terms = [f"t{rng.randrange(nterms)}" for _ in range(n)]
        pos = {t: sorted(rng.sample(range(0, 15), rng.randrange(1, 6)))
               for t in set(terms)}
        slop = rng.randrange(0, 8)
        plists = [pos[t] for t in terms]
        g: dict[str, int] = {}
        groups = [g.setdefault(t, len(g)) for t in terms]
        a = sloppy_freq(plists, slop, groups)
        b = _oracle_pf(terms, plists, slop)
        assert abs(a - b) < 1e-12, (trial, terms, plists, slop, a, b)


def _chain_freq(A, B_adj, slop):
    """2-term alternating-successor-chain characterization — the exact
    shape of the recursive CTE in the DuckDB bm25_simple_nested oracle."""
    fa, fb = A[0], B_adj[0]
    e, side = max(fa, fb), (0 if fa > fb else 1)
    lists = (A, B_adj)
    freq = 0.0
    while True:
        other = lists[1 - side]
        pred = max(p for p in other if p <= e)
        ml = e - pred
        if ml <= slop:
            freq += 1.0 / (1.0 + ml)
        nxt = [p for p in other if p > e]
        if not nxt:
            return freq
        e, side = min(nxt), 1 - side


def test_two_term_chain_equals_matcher():
    """The recursive-chain formulation (used by the SQL oracle) equals the
    PQ matcher on 20k random 2-term cases across slops."""
    rng = random.Random(3)
    for trial in range(20000):
        A = sorted(rng.sample(range(0, 25), rng.randrange(1, 8)))
        B = sorted(rng.sample(range(0, 25), rng.randrange(1, 8)))
        slop = rng.randrange(1, 9)
        want = sloppy_freq([A, [b + 1 for b in B]], slop, groups=[0, 1])
        got = _chain_freq(A, B, slop)
        assert abs(got - want) < 1e-12, (trial, A, B, slop, got, want)
