"""Nested span interval algebra (query/spans.py) vs the exhaustive
oracle matcher (oracle._tree_matches_brute) — pure-Python fuzz, no
Spark.  Also pins the flat-counting equivalence the engine's root-sf
collapse relies on."""

from __future__ import annotations

import bisect
import random

from apache___solr_spark.oracle import _tree_matches_brute
from apache___solr_spark.query.spans import match_intervals


def test_match_intervals_fuzz_vs_brute():
    """Random trees over random position sets: the DP combiner must
    return exactly the brute-force enumeration's interval set."""
    rng = random.Random(3)
    for trial in range(800):
        nslots = rng.randrange(2, 5)
        pos = {
            i: sorted(rng.sample(range(0, 14), rng.randrange(0, 5)))
            for i in range(nslots)
        }

        def rnd_tree(depth, avail):
            if depth == 0 or len(avail) == 1:
                return ("slot", avail[0])
            cut = rng.randrange(1, len(avail))
            kids = [
                rnd_tree(depth - 1, ks) for ks in (avail[:cut], avail[cut:])
            ]
            if rng.random() < 0.2:
                return ("seq", kids)
            return ("near", rng.randrange(1, 5), rng.random() < 0.5, kids)

        tree = rnd_tree(2, list(range(nslots)))
        a = sorted(match_intervals(tree, pos))
        b = sorted(_tree_matches_brute(tree, pos))
        assert a == b, (trial, tree, pos)


def _flat_unordered_sf(plists, bound):
    merged = sorted(p for pl in plists for p in pl)
    ends = set()
    for s in merged:
        end = s
        ok = True
        for pl in plists:
            j = bisect.bisect_left(pl, s)
            if j >= len(pl):
                ok = False
                break
            end = max(end, pl[j])
        if ok and end - s <= bound:
            ends.add(end)
    return len(ends)


def _flat_ordered_sf(plists, slop):
    count = 0
    for p0 in plists[0]:
        cur = p0
        ok = True
        for pl in plists[1:]:
            j = bisect.bisect_right(pl, cur)
            if j >= len(pl):
                ok = False
                break
            cur = pl[j]
        if ok and cur - p0 <= len(plists) - 1 + slop:
            count += 1
    return count


def _root_sf(tree, pos, root_unordered):
    m = match_intervals(tree, pos)
    if not root_unordered:
        return len({s for s, _ in m})
    emin: dict[int, int] = {}
    for s, e in m:
        if s not in emin or e < emin[s]:
            emin[s] = e
    return len(set(emin.values()))


def test_root_counting_equals_flat_matchers():
    """On DISJOINT position lists (distinct terms never share a
    position) a flat near-tree's root sf — distinct starts (ordered) /
    min-end-per-start distinct (unordered) — equals the flat per-doc
    bisect matchers' counts, so span_tree of a flat spec scores exactly
    like span_near."""
    rng = random.Random(9)
    for trial in range(1500):
        k = rng.randrange(2, 4)
        universe = list(range(16))
        rng.shuffle(universe)
        pls, idx = [], 0
        for _ in range(k):
            sz = rng.randrange(1, 5)
            pls.append(sorted(universe[idx : idx + sz]))
            idx += sz
        dist = rng.randrange(1, 6)
        pos = {i: pls[i] for i in range(k)}
        tree_u = ("near", dist, False, [("slot", i) for i in range(k)])
        assert _root_sf(tree_u, pos, True) == _flat_unordered_sf(
            pls, k - 1 + dist - 1
        ), (trial, pls, dist)
        tree_o = ("near", dist, True, [("slot", i) for i in range(k)])
        assert _root_sf(tree_o, pos, False) == _flat_ordered_sf(
            pls, dist - 1
        ), (trial, pls, dist)
