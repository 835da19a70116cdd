"""Nested span-query algebra: interval matching for surround's nested
distance operators (queryparser/surround/query/DistanceQuery.java nesting
SpanNearQuery trees, e.g. ``3W(2N(a, b), c)``).

A span tree is built from:

- ``("slot", i)`` — leaf: any position of slot ``i`` (a term, or the
  SpanOr of a truncation's dictionary expansions) as a width-1 interval
  ``(p, p+1)``.
- ``("seq", [children])`` — adjacency sequence (a multi-token analysis of
  one operand): children in order with zero gap.
- ``("near", dist, ordered, [children])`` — the distance operator:
  every child matches, combined so the sum of the gaps between chosen
  child intervals is ``<= dist - 1``.  ``ordered`` requires the children
  in order (W); unordered (N) allows any arrangement.

Match semantics (documented, shared verbatim by the independent oracle —
``oracle.oracle_span_tree``): a node's matches are DISTINCT ``(start,
end)`` intervals.  For ``near``:

- ordered: children's intervals chosen left-to-right, non-overlapping
  (``next.start >= prev.end``), ``sum(next.start - prev.end) <= dist-1``.
- unordered: one interval per child in ANY order, pairwise
  non-overlapping, same gap budget over the arrangement sorted by start.
  (Lucene's NearSpansUnordered permits overlap and weights matches by
  sloppyFreq; the flat path documents the same divergence.)

The matcher enumerates each node's interval set exactly with dominance
pruning (per start, Pareto frontier over (end, min-gap-used)); per-doc
position lists are post-gate and small, so this is the same cost class
as the flat per-doc matcher the complexphrase path uses.
"""

from __future__ import annotations


def leaf_slots(tree) -> list[int]:
    """Slot ids of every leaf, left-to-right."""
    kind = tree[0]
    if kind == "slot":
        return [tree[1]]
    children = tree[-1]
    out: list[int] = []
    for c in children:
        out.extend(leaf_slots(c))
    return out


def match_intervals(tree, pos_by_slot) -> list[tuple[int, int]]:
    """All distinct (start, end) intervals where ``tree`` matches, sorted.

    ``pos_by_slot`` maps slot id -> sorted iterable of int positions.
    """
    kind = tree[0]
    if kind == "slot":
        return [(int(p), int(p) + 1) for p in pos_by_slot.get(tree[1], ())]
    if kind == "seq":
        return _combine_ordered(
            [match_intervals(c, pos_by_slot) for c in tree[1]], slop=0
        )
    _, dist, ordered, children = tree
    child_ints = [match_intervals(c, pos_by_slot) for c in children]
    if any(not ci for ci in child_ints):
        return []
    slop = int(dist) - 1
    if ordered or len(children) == 1:
        return _combine_ordered(child_ints, slop)
    return _combine_unordered(child_ints, slop)


def _combine_ordered(lists, slop: int) -> list[tuple[int, int]]:
    """Intervals of an in-order, non-overlapping chain with total gap
    <= slop.  DP right-to-left: state per level = Pareto set of
    (min_start_allowed -> achievable (end, gap_used)); enumerate matches
    as distinct (start, end)."""
    if not lists:
        return []
    # states[j] = for child j..last: list of (start_j, end_last, gaps_after_j)
    # built right-to-left with dominance pruning
    last = [(s, e, 0) for (s, e) in lists[-1]]
    for j in range(len(lists) - 2, -1, -1):
        nxt = last
        cur: list[tuple[int, int, int]] = []
        for (s, e) in lists[j]:
            for (s2, e2, g2) in nxt:
                if s2 < e:
                    continue
                g = (s2 - e) + g2
                if g <= slop:
                    cur.append((s, e2, g))
        last = _prune(cur)
        if not last:
            return []
    return sorted({(s, e) for (s, e, g) in last if g <= slop})


def _combine_unordered(lists, slop: int) -> list[tuple[int, int]]:
    """Any-order arrangement: subset-DP chaining start-sorted choices.

    Only the arrangement whose chosen intervals are sorted by start can
    form a valid non-overlapping chain, so instead of permuting child
    order (n! redundant ordered-DP runs), grow chains left-to-right: a
    state is (used-children mask, chain start, chain end, gaps used) and
    extends with any UNUSED child's interval starting at/after the chain
    end — the chain is start-sorted by construction, and the union over
    permutations falls out exactly."""
    n = len(lists)
    cur: list[tuple[int, int, int, int]] = [
        (1 << i, s, e, 0) for i, li in enumerate(lists) for (s, e) in li
    ]
    cur = _prune_masked(cur)
    for _ in range(n - 1):
        nxt: list[tuple[int, int, int, int]] = []
        for (m, s, e, g) in cur:
            for i in range(n):
                if m & (1 << i):
                    continue
                for (s2, e2) in lists[i]:
                    if s2 < e:
                        continue
                    g2 = g + (s2 - e)
                    if g2 <= slop:
                        nxt.append((m | (1 << i), s, e2, g2))
        cur = _prune_masked(nxt)
        if not cur:
            return []
    return sorted({(s, e) for (_m, s, e, _g) in cur})


def _prune_masked(states):
    """Minimal gap per distinct (mask, start, end) — same dominance rule
    as _prune, keyed by the used-children set too."""
    best: dict[tuple[int, int, int], int] = {}
    for m, s, e, g in states:
        k = (m, s, e)
        if k not in best or g < best[k]:
            best[k] = g
    return [(m, s, e, g) for (m, s, e), g in best.items()]


def _prune(states):
    """Keep the minimal gap per distinct (start, end) — a feasible
    interval must never be dropped (the node's matches ARE its distinct
    (start, end) pairs, and a parent's end can come from any of them),
    so only the gap bookkeeping dedupes."""
    best: dict[tuple[int, int], int] = {}
    for s, e, g in states:
        k = (s, e)
        if k not in best or g < best[k]:
            best[k] = g
    return [(s, e, g) for (s, e), g in best.items()]
