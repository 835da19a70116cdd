"""Lucene SloppyPhraseMatcher-equivalent sloppy-phrase frequency.

The scorer the reference uses for sloppy phrases (``"a b"~N`` through the
classic parser — lucene/core/.../search/SloppyPhraseMatcher.java; Solr
builds PhraseQuery-with-slop in SolrQueryParserBase.getFieldQuery):

- each phrase term is a pointer into its position list with ADJUSTED
  positions ``raw - offset`` (offset = the term's index in the phrase);
- a priority queue repeatedly advances the minimal pointer, shrinking the
  window ``[min, end]`` (``end`` = max adjusted position ever reached);
  whenever advancing the minimal pointer would overtake the runner-up,
  the minimized window is checked against the slop;
- every match adds ``1 / (1 + matchLength)`` to the phrase frequency
  (``matchLength`` = minimized ``end - min``), and BM25 scores with this
  FRACTIONAL tf — tighter matches score higher.

Out-of-order occurrences match at transposition cost: ``"a b"~2`` matches
a doc containing ``b a`` with matchLength 2 (adjusted spread), which
ordered-window counting would reject.  ``slop=0`` is not handled here —
exact adjacency stays on the vectorized ExactPhraseMatcher-equivalent
path (integer tf, identical in both semantics).

Repeated phrase terms ("buffalo buffalo"): pointers of a repeated term
are kept on DISTINCT raw positions — the i-th pointer starts on the i-th
occurrence and a pointer that advances onto a position occupied by a
group sibling advances again (Lucene's advanceRpts collision rule).
Exotic multi-repeat interleavings may diverge from Lucene's full repeat
machinery (PhrasePositions.rptGroup bubbling) — documented edge; the
no-repeats algorithm is exact.
"""

from __future__ import annotations

import heapq

__all__ = ["sloppy_freq"]


def sloppy_freq(
    plists: list[list[int]],
    slop: int,
    groups: list[int] | None = None,
) -> float:
    """Sum of ``1/(1+matchLength)`` over SloppyPhraseMatcher matches.

    ``plists[i]`` = sorted raw positions (in one doc) of the phrase term
    at offset ``i``; ``groups[i]`` identifies repeated terms (same group
    == same term, defaults to grouping identical position lists).
    Returns 0.0 when any term is absent.
    """
    n = len(plists)
    if n == 0 or any(not pl for pl in plists):
        return 0.0
    if n == 1:
        # PhraseQuery with one term rewrites to TermQuery: tf = raw tf
        return float(len(plists[0]))
    if groups is None:
        seen_lists: dict[tuple, int] = {}
        groups = [
            seen_lists.setdefault(tuple(pl), len(seen_lists))
            for pl in plists
        ]
    has_rpts = len(set(groups)) < n

    idxs = [0] * n
    if has_rpts:
        # i-th pointer of a repeat group starts on the i-th occurrence
        taken: dict[int, int] = {}
        for i in range(n):
            j = taken.get(groups[i], -1) + 1
            if j >= len(plists[i]):
                return 0.0
            idxs[i] = j
            taken[groups[i]] = j
    adj = [plists[i][idxs[i]] - i for i in range(n)]
    end = max(adj)
    heap = [(adj[i], i) for i in range(n)]
    heapq.heapify(heap)

    def advance(i: int) -> bool:
        nonlocal end
        while True:
            idxs[i] += 1
            if idxs[i] >= len(plists[i]):
                return False
            raw = plists[i][idxs[i]]
            if has_rpts and any(
                k != i
                and groups[k] == groups[i]
                and idxs[k] < len(plists[k])
                and plists[k][idxs[k]] == raw
                for k in range(n)
            ):
                continue  # collision with a group sibling: advance past
            break
        adj[i] = raw - i
        if adj[i] > end:
            end = adj[i]
        return True

    freq = 0.0
    pos_i, i = heapq.heappop(heap)
    match_length = end - pos_i
    while True:
        next_pos = heap[0][0]
        if not advance(i):
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            return freq
        if adj[i] > next_pos:
            # done minimizing the current window
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            heapq.heappush(heap, (adj[i], i))
            pos_i, i = heapq.heappop(heap)
            match_length = end - pos_i
        else:
            ml2 = end - adj[i]
            if ml2 < match_length:
                match_length = ml2
