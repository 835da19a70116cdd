"""BM25 top-k query engine with block-max pruning.

Reproduces the reference /select retrieval path
(solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:1633-1916:
filter -> score -> top-k priority queue; distributed merge in
handler/component/QueryComponent.java:970) as a DataFrame plan:

  postings blocks (bucket-pruned scan, term pushdown)
    -> [optional] block-max pruning against a threshold from a cheap pass
       (pure-SHOULD term queries only — MUST / phrases / expansions make
       the theta bound unsound, see the guard in search())
    -> vectorized decode + BM25 score (mapInPandas, numpy)
    -> unioned with phrase frames (position intersection) and
       dictionary-expansion frames (prefix/wildcard/fuzzy/range/synonym
       disjunction groups, each one clause)
    -> groupBy(doc_id) sum + boolean semantics (MUST clause count,
       MUST_NOT anti-join, liveDocs tombstone anti-join)
    -> orderBy(score desc, doc_id asc).limit(k)    [TakeOrderedAndProject]
    -> join docs for url (two-phase fetch).

Scoring: BM25 with k1=1.2, b=0.75
(search/similarities/BM25SimilarityFactory.java:41-51):
  idf  = ln(1 + (N - df + 0.5)/(df + 0.5))                 [float32]
  s_td = idf * tf / (tf + k1*((1-b) + b*dl/avgdl))          [float32]
  doc score = float32(sum_f64(s_td over query terms))
dl is the SmallFloat-quantized doc length (1-byte norms, decoded through the
256-entry table — FieldLengthFeature.java:74-88 semantics), exactly as
Lucene's BM25 length cache does.

Block-max pruning (Lucene block-max WAND capability, MaxScoreCollector.java:
45-58, adapted for a distributed batch engine): postings blocks are aligned
on global doc_id ranges, so for block b the quantity
  ub(b) = sum over query terms t of idf_t * max_impact(t, b)
upper-bounds every doc score in that range.  A cheap pass scores ONLY the
rarest term's postings; the k-th best partial score is a valid lower bound
theta on the final k-th best full score, and every block with ub(b) < theta
is skipped before decode.  Pruning never changes results (tested A/B).
"""

from __future__ import annotations

import json
import math
import os
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache___solr_spark.analysis.chain import analyzer_fn
from apache___solr_spark.config import DEFAULT_CONFIG, IndexConfig
from apache___solr_spark.index.builder import IndexPaths, _undelta_positions
from apache___solr_spark.index.codec import decode_vbyte, delta_decode
from apache___solr_spark.index.smallfloat import NORM_TABLE
from apache___solr_spark.query.parser import (
    BoolQuery,
    Clause,
    NotFlatQuery,
    ParsedQuery,
    PhraseNode,
    TermNode,
    lower_tree,
    parse_query_tree,
)


def _apply_synonyms(pq: ParsedQuery, synonyms: dict[str, list[str]]) -> ParsedQuery:
    """Rewrite term clauses whose term has synonyms into disjunction
    (expansion) clauses; MUST_NOT terms exclude every synonym.  Returns a
    copy — the caller's ParsedQuery is never mutated.  SINGLE-word
    synonyms only: string queries with multi-word synonyms route through
    the tree evaluator before reaching here (search() checks
    _tree_has_multiword_synonym); on a programmatic ParsedQuery a
    multi-word value is a non-dictionary term and silently matches
    nothing — use the string/tree path for phrase alternatives."""
    import copy

    from apache___solr_spark.query.parser import Clause

    pq = copy.deepcopy(pq)
    for occur, bucket in (("MUST", pq.must), ("SHOULD", pq.should)):
        for t in [t for t in bucket if t in synonyms]:
            bucket.remove(t)
            pq.expand.append(
                Clause(
                    occur=occur,
                    kind="synonym",
                    value=t,
                    boost=pq.boosts.pop(t, 1.0),
                )
            )
    for t in [t for t in pq.must_not if t in synonyms]:
        pq.must_not.extend(x for x in synonyms[t] if x not in pq.must_not)
    return pq


def phrase_label(ptoks: list[str]) -> str:
    """Clause label for a phrase in the scored stream (terms never contain
    spaces or quotes, so labels cannot collide with terms)."""
    return '"' + " ".join(ptoks) + '"'

def bm25_idf(n_docs: int, df: int, dtype=np.float32):
    return dtype(math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


# prohibited multi-term clauses enumerate matching dictionary terms into a
# literal predicate only up to this many terms (fast, bucket-pruned); past
# it the engine switches to the fully distributed postings⋈dictionary
# exclusion so the driver never holds an unbounded term list
_EXCLUDE_LITERAL_CAP = 1024


def _score_blocks(
    weight_by_term: dict[str, float],
    kernel,
    boost_by_term: dict[str, float] | None = None,
    dtype=np.float32,
):
    """mapInPandas fn: decode posting blocks -> (term, doc_id, score) rows.

    ``kernel`` is the similarity scoring closure (query/similarities.py)
    ``f(weight, boost, tfs, dl) -> scores``; ``weight_by_term`` carries the
    per-term statistic weight (idf / collection probability / 1), boosts
    travel separately because the LM similarities are not linear in the
    weight.  ``dtype`` is float32 by default (Lucene computes similarity
    scores in float); float64 backs the SQL-oracle-checked configuration."""
    norm_table_f32 = NORM_TABLE.astype(dtype)
    boosts = boost_by_term or {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_out: list[np.ndarray] = []
            docs_out: list[np.ndarray] = []
            scores_out: list[np.ndarray] = []
            # vectorized per (term, salt) row — numpy decode of the whole row
            for term, salt, n, gaps_bin, tfs_bin, norms_bin, salt_range in zip(
                pdf["term"],
                pdf["salt"],
                pdf["n_docs"],
                pdf["doc_gaps"],
                pdf["tfs"],
                pdf["norms"],
                pdf["salt_range"],
            ):
                base = int(salt) * int(salt_range)
                doc_ids = delta_decode(
                    decode_vbyte(gaps_bin, int(n)).astype(np.int64), base
                )
                tfs = decode_vbyte(tfs_bin, int(n)).astype(dtype)
                norms = np.frombuffer(norms_bin, dtype=np.uint8)
                dl = norm_table_f32[norms]
                score = kernel(
                    weight_by_term[term], boosts.get(term, 1.0), tfs, dl
                )
                terms_out.append(np.full(int(n), term, dtype=object))
                docs_out.append(doc_ids)
                scores_out.append(score)
            if docs_out:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms_out),
                        "doc_id": np.concatenate(docs_out),
                        "score": np.concatenate(scores_out),
                    }
                )

    return run


def _decode_docs_fn(salt_range: int):
    """mapInPandas fn: postings rows -> (term, doc_id) only — the
    lightest decode (doc_gaps vbyte, no tfs/norms/positions), for
    membership-shaped scans like {!significantTerms}."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_out: list[str] = []
            docs_out: list[np.ndarray] = []
            for term, salt, n, gaps_bin in zip(
                pdf["term"], pdf["salt"], pdf["n_docs"], pdf["doc_gaps"]
            ):
                ids = delta_decode(
                    decode_vbyte(gaps_bin, int(n)).astype(np.int64),
                    int(salt) * salt_range,
                )
                terms_out.extend([term] * int(n))
                docs_out.append(ids)
            if docs_out:
                yield pd.DataFrame(
                    {"term": terms_out, "doc_id": np.concatenate(docs_out)}
                )

    return run


def _decode_positions_fn(salt_range: int):
    """mapInPandas fn: postings rows -> (term, doc_id, norm, positions[])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_out, docs_out, norms_out, pos_out = [], [], [], []
            for term, salt, n, gaps_bin, tfs_bin, norms_bin, pos_bin, sum_tf in zip(
                pdf["term"],
                pdf["salt"],
                pdf["n_docs"],
                pdf["doc_gaps"],
                pdf["tfs"],
                pdf["norms"],
                pdf["positions"],
                pdf["sum_tf"],
            ):
                base = int(salt) * salt_range
                ids = delta_decode(
                    decode_vbyte(gaps_bin, int(n)).astype(np.int64), base
                )
                tfs = decode_vbyte(tfs_bin, int(n)).astype(np.int64)
                pgaps = decode_vbyte(pos_bin, int(sum_tf)).astype(np.int64)
                pos_abs = _undelta_positions(pgaps, tfs)
                splits = np.split(pos_abs, np.cumsum(tfs)[:-1])
                terms_out.extend([term] * int(n))
                docs_out.append(ids)
                norms_out.append(np.frombuffer(norms_bin, dtype=np.uint8))
                pos_out.extend(splits)
            if docs_out:
                yield pd.DataFrame(
                    {
                        "term": terms_out,
                        "doc_id": np.concatenate(docs_out),
                        "norm": np.concatenate(norms_out).astype(np.int32),
                        "positions": pos_out,
                    }
                )

    return run


def _payload_eval_fn(
    ptoks: list[str],
    sum_idf: float,
    k1: float,
    b: float,
    avgdl: float,
    dtype,
    func: str | None = None,
    include_span: bool = False,
    expected: list[float] | None = None,
    operator: str = "phrase",
    check_op: str = "eq",
):
    """mapInPandas fn over (doc_id, norm, plists, n, payloads):
    exact-adjacency spans of ``ptoks`` with their per-position payloads.

    ``func`` mode (PayloadScoreQuery): score = func over the payloads of
    every matched span position (min/max/average/sum), optionally times
    the span's BM25 (tf = span frequency).  Positions WITHOUT a payload
    (NaN in the stream) are skipped exactly like collectLeaf skips null
    payloads — they never feed min/average; a doc whose spans carry no
    payload at all scores 0.  ``expected`` mode (SpanPayloadCheckQuery):
    keep docs with >=1 span whose payloads satisfy ``check_op``
    (eq/gt/gte/lt/lte, PayloadCheckQParser's MatchOperation) against
    ``expected`` position by position; score = BM25 with tf = matching
    spans; a missing payload never satisfies any operation.

    ``operator="or"`` (PayloadScoreQParser operator=or -> SpanOrQuery):
    every occurrence of every query term is its own length-1 span
    instead of the exact-adjacency phrase.

    The whole batch evaluates vectorized — no per-doc Python loop on
    the hot path (the r2 phrase-scoring lesson applied from day one):
    payload vbyte streams decode in ONE call over the concatenated
    buffers (vbyte is self-delimiting), positions are encoded as
    row_idx*2^32+pos so adjacency runs as one np.isin per phrase term
    across every doc at once (adding i never crosses a row boundary),
    the payload gather is a single flat take, and per-doc func/tf
    reduction is a segmented ufunc.reduceat over the row-sorted spans."""
    from apache___solr_spark.analysis.payloads import decode_payloads

    m = len(ptoks)
    norm_table = NORM_TABLE.astype(dtype)
    k1f = dtype(k1)
    one_minus_b = dtype(1.0 - b)
    bf = dtype(b)
    avgdlf = dtype(avgdl)
    idff = dtype(sum_idf)
    or_mode = operator == "or"
    if or_mode:
        m = 1
    exp_arr = (
        np.asarray(expected, dtype=np.float32) if expected is not None else None
    )
    offs = np.arange(m, dtype=np.int64)
    shift = np.int64(32)
    mask = np.int64((1 << 32) - 1)
    # fmin/fmax skip NaN (missing payloads); sum folds nan_to_num
    reduce_ufunc = {
        "min": np.fmin,
        "max": np.fmax,
        "average": np.add,
        "avg": np.add,
        "sum": np.add,
        None: None,
    }[func]
    is_mean = func in ("average", "avg")
    cmp = {
        "eq": np.equal,
        "gt": np.greater,
        "gte": np.greater_equal,
        "lt": np.less,
        "lte": np.less_equal,
    }[check_op]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            # one decode over the concatenated payload streams
            ns = pdf["n"].to_numpy().astype(np.int64)
            pay = decode_payloads(
                decode_vbyte(
                    b"".join(pdf["payloads"]), int(ns.sum())
                ).astype(np.uint32)
            )
            pay_off = np.concatenate(([0], np.cumsum(ns)[:-1]))
            # encoded positions per term, all docs at once
            parts: dict[str, list[np.ndarray]] = {t: [] for t in set(ptoks)}
            for row_idx, plists in enumerate(pdf["plists"]):
                enc_row = np.int64(row_idx) << shift
                for r in plists:
                    if r["term"] in parts:
                        parts[r["term"]].append(
                            enc_row
                            + np.asarray(r["positions"], dtype=np.int64)
                        )
            enc = {
                t: (np.concatenate(v) if v else np.empty(0, dtype=np.int64))
                for t, v in parts.items()
            }
            if or_mode:
                allpos = [enc[t] for t in set(ptoks) if enc[t].size]
                starts = (
                    np.unique(np.concatenate(allpos))
                    if allpos
                    else np.empty(0, dtype=np.int64)
                )
            else:
                starts = enc[ptoks[0]]
                for i, t in enumerate(ptoks[1:], 1):
                    if starts.size == 0:
                        break
                    starts = starts[np.isin(starts + i, enc[t])]
            if starts.size == 0:
                continue
            rows = (starts >> shift).astype(np.int64)  # ascending
            pos0 = starts & mask
            gathered = pay[
                ((pay_off[rows] + pos0)[:, None] + offs).ravel()
            ].reshape(-1, m)
            if exp_arr is not None:
                # NaN (missing payload) fails every comparison op
                ok = cmp(gathered, exp_arr).all(axis=1)
                tf_all = np.bincount(rows[ok], minlength=nrows)
            else:
                tf_all = np.bincount(rows, minlength=nrows)
            hit = np.nonzero(tf_all)[0]
            if hit.size == 0:
                continue
            tf = tf_all[hit].astype(dtype)
            dl = norm_table[pdf["norm"].to_numpy()[hit].astype(np.uint8)]
            bm25 = idff * tf / (tf + k1f * (one_minus_b + bf * dl / avgdlf))
            if exp_arr is not None:
                score = bm25
            else:
                # segmented reduce over each doc's span payloads: spans
                # are row-sorted, so each hit row owns one contiguous
                # slab of tf[row]*m flat payload values.  NaN payloads
                # are skipped (fmin/fmax ignore them; sums fold 0 and
                # the mean divides by the SEEN count, like Lucene's
                # payloadsSeen); an all-missing slab scores 0.
                flat = gathered.ravel().astype(np.float64)
                seg = np.concatenate(
                    ([0], np.cumsum(tf_all[hit] * m)[:-1])
                )
                nseen = np.add.reduceat(
                    np.isfinite(flat).astype(np.float64), seg
                )
                if is_mean or reduce_ufunc is np.add:
                    vals = np.add.reduceat(np.nan_to_num(flat), seg)
                    if is_mean:
                        vals = np.divide(
                            vals,
                            nseen,
                            out=np.zeros_like(vals),
                            where=nseen > 0,
                        )
                else:
                    vals = np.where(
                        nseen > 0,
                        np.nan_to_num(reduce_ufunc.reduceat(flat, seg)),
                        0.0,
                    )
                score = vals.astype(dtype)
                if include_span:
                    score = score * bm25
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[hit],
                    "score": score.astype(dtype),
                }
            )

    return run


def _phrase_score_fn(
    ptoks: list[str],
    sum_idf: float,
    k1: float,
    b: float,
    avgdl: float,
    dtype,
    slop: int = 0,
    ordered: bool = True,
    slots: list[tuple[str, ...]] | None = None,
    lucene_sloppy: bool = False,
):
    """mapInPandas fn over (doc_id, norm, plists): phrase frequency, then
    BM25 with tf=pf and idf=sum of constituent idfs (Lucene PhraseQuery
    scoring: BM25Similarity sums idf over the phrase's term statistics).

    ``lucene_sloppy=True`` (classic sloppy phrases, slop>0): tf = the
    FRACTIONAL SloppyPhraseMatcher freq — sum of 1/(1+matchLength) over
    minimized windows, out-of-order matches at transposition cost
    (query/sloppy.py; lucene/core SloppyPhraseMatcher.java) — the
    reference's rank semantics for ``"a b"~N``.  Runs per doc on the
    already-gated candidate set (every term present), the span matchers'
    cost class.

    ``ordered=True`` otherwise (SpanNearQuery inOrder=true): pf =
    number of first-term positions starting an INCREASING position chain
    of the phrase terms whose span is <= len(ptoks)-1+slop; slop=0 is
    exact adjacency in both modes (ExactPhraseMatcher).

    ``ordered=False`` (SpanNearQuery inOrder=false — the surround
    parser's N operator, queryparser/surround/query/DistanceQuery.java):
    pf = number of MINIMAL windows containing at least one occurrence of
    every distinct term with span <= m-1+slop (m = #distinct terms).
    Each merged position is a candidate window start; its minimal cover
    is the earliest occurrence of every term at-or-after it, and windows
    are deduplicated by their end position so each minimal window counts
    once (unweighted, vs Lucene's 1/(1+slop-matchLength) sloppyFreq —
    same documented divergence as the ordered path).

    The check is batched across ALL docs of an Arrow batch: positions are
    encoded as row_idx*2^32+pos, so one vectorized searchsorted per phrase
    term advances every candidate chain in every doc at once — no per-doc
    Python loop on the hot path (high-df phrase terms stay numpy-bound).
    Greedy smallest-next is exact: it minimizes the chain end for each
    start, so a start matches iff its greedy chain satisfies the span bound.
    """
    norm_table = NORM_TABLE.astype(dtype)
    k1f = dtype(k1)
    one_minus_b = dtype(1.0 - b)
    bf = dtype(b)
    avgdlf = dtype(avgdl)
    idff = dtype(sum_idf)
    shift = np.int64(32)
    # ``slots`` generalizes each phrase position to a term SET
    # (ComplexPhraseQParserPlugin: a wildcard inside a phrase rewrites to
    # a SpanOr of its dictionary expansions — any member term satisfies
    # the slot).  The default is singleton slots == plain phrase terms.
    use_sloppy = (
        lucene_sloppy and ordered and slop > 0 and slots is None
        and len(ptoks) > 1
    )
    if slots is None:
        slots = [(t,) for t in (ptoks if ordered else sorted(set(ptoks)))]
    want = {t for s in slots for t in s}
    bound = np.int64(len(slots) - 1 + slop)

    if use_sloppy:
        from apache___solr_spark.query.sloppy import sloppy_freq

        g: dict[str, int] = {}
        groups = [g.setdefault(t, len(g)) for t in ptoks]

        def run_sloppy(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                docs: list[int] = []
                scores: list = []
                for doc_id, norm, plists in zip(
                    pdf["doc_id"], pdf["norm"], pdf["plists"]
                ):
                    pos_by_term = {
                        r["term"]: r["positions"] for r in plists
                    }
                    pls = []
                    ok = True
                    for t in ptoks:
                        p = pos_by_term.get(t)
                        if p is None or len(p) == 0:
                            ok = False
                            break
                        pls.append([int(x) for x in p])
                    if not ok:
                        continue
                    fr = sloppy_freq(pls, slop, groups)
                    if fr <= 0.0:
                        continue
                    dl = norm_table[int(norm)]
                    frf = dtype(fr)
                    cache = k1f * (one_minus_b + bf * dl / avgdlf)
                    docs.append(int(doc_id))
                    scores.append(dtype(idff * frf / (frf + cache)))
                if docs:
                    yield pd.DataFrame(
                        {
                            "doc_id": np.asarray(docs, dtype=np.int64),
                            "score": np.asarray(scores, dtype=dtype),
                        }
                    )

        return run_sloppy

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            parts: dict[str, list[np.ndarray]] = {t: [] for t in want}
            for row_idx, plists in enumerate(pdf["plists"]):
                enc_row = np.int64(row_idx) << shift
                for r in plists:
                    t = r["term"]
                    if t in parts:
                        parts[t].append(
                            enc_row + np.asarray(r["positions"], dtype=np.int64)
                        )
            enc = {
                t: (np.concatenate(v) if v else np.empty(0, dtype=np.int64))
                for t, v in parts.items()
            }
            def slot_arr(s: tuple) -> np.ndarray:
                if len(s) == 1:
                    return enc[s[0]]
                a = np.concatenate([enc[t] for t in s])
                a.sort()  # distinct terms never share (doc,pos): no dups
                return a

            if ordered:
                start = slot_arr(slots[0])
                cur = start
                alive = np.ones(start.shape, dtype=bool)
                for s in slots[1:]:
                    arr = slot_arr(s)
                    if arr.size == 0:
                        alive = np.zeros(start.shape, dtype=bool)
                        break
                    idx = np.searchsorted(arr, cur, side="right")
                    ok = idx < arr.size
                    nxt = arr[np.minimum(idx, arr.size - 1)]
                    ok &= (nxt >> shift) == (cur >> shift)  # same doc row
                    alive &= ok
                    cur = np.where(ok, nxt, cur)
                alive &= (cur - start) <= bound
                if not alive.any():
                    continue
                pf_all = np.bincount(
                    (start[alive] >> shift).astype(np.int64), minlength=nrows
                )
            else:
                arrs = [slot_arr(s) for s in slots]
                if any(a.size == 0 for a in arrs):
                    continue
                merged = np.sort(np.concatenate(arrs))
                row_of = merged >> shift
                valid = np.ones(merged.shape, dtype=bool)
                end_vals = merged.copy()
                for arr in arrs:
                    idx = np.searchsorted(arr, merged, side="left")
                    ok = idx < arr.size
                    nxt = arr[np.minimum(idx, arr.size - 1)]
                    ok &= (nxt >> shift) == row_of
                    valid &= ok
                    end_vals = np.maximum(
                        end_vals, np.where(ok, nxt, end_vals)
                    )
                match = valid & ((end_vals - merged) <= bound)
                if not match.any():
                    continue
                ends = np.unique(end_vals[match])
                pf_all = np.bincount(
                    (ends >> shift).astype(np.int64), minlength=nrows
                )
            hit = np.nonzero(pf_all)[0]
            pf = pf_all[hit].astype(dtype)
            dl = norm_table[pdf["norm"].to_numpy()[hit].astype(np.uint8)]
            cache = k1f * (one_minus_b + bf * dl / avgdlf)
            score = idff * pf / (pf + cache)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy()[hit], "score": score}
            )

    return run


def _span_tree_score_fn(
    tree,
    slots: list[tuple[str, ...]],
    sum_idf: float,
    k1: float,
    b: float,
    avgdl: float,
    dtype,
):
    """mapInPandas fn over (doc_id, norm, plists): nested-span frequency
    via query/spans.py interval algebra, then BM25 with tf = sf and
    idf = the summed slot-member idfs.  Root sf = distinct match STARTS
    when the root is ordered (or a seq/slot); when unordered, distinct
    MINIMAL ENDS (min end per match start, then distinct) — exactly the
    flat paths' counting on flat trees (fuzz-verified vs the per-doc
    bisect matchers), so a degenerate tree scores identically to
    span_near/complex_phrase."""
    norm_table = NORM_TABLE.astype(dtype)
    k1f = dtype(k1)
    one_minus_b = dtype(1.0 - b)
    bf = dtype(b)
    avgdlf = dtype(avgdl)
    idff = dtype(sum_idf)
    member_slots: dict[str, list[int]] = {}
    for i, s in enumerate(slots):
        for t in s:
            member_slots.setdefault(t, []).append(i)
    root_unordered = tree[0] == "near" and not tree[2]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from apache___solr_spark.query.spans import match_intervals

        for pdf in batches:
            docs: list[int] = []
            scores: list = []
            for doc_id, norm, plists in zip(
                pdf["doc_id"], pdf["norm"], pdf["plists"]
            ):
                acc: dict[int, list[int]] = {}
                for r in plists:
                    for si in member_slots.get(r["term"], ()):
                        acc.setdefault(si, []).extend(
                            int(p) for p in r["positions"]
                        )
                pos_by_slot = {i: sorted(v) for i, v in acc.items()}
                m = match_intervals(tree, pos_by_slot)
                if root_unordered:
                    emin: dict[int, int] = {}
                    for s, e in m:
                        if s not in emin or e < emin[s]:
                            emin[s] = e
                    sf = len(set(emin.values()))
                else:
                    sf = len({s for (s, _) in m})
                if not sf:
                    continue
                dl = norm_table[int(norm)]
                sff = dtype(sf)
                cache = k1f * (one_minus_b + bf * dl / avgdlf)
                docs.append(int(doc_id))
                scores.append(dtype(idff * sff / (sff + cache)))
            if docs:
                yield pd.DataFrame(
                    {
                        "doc_id": np.asarray(docs, dtype=np.int64),
                        "score": np.asarray(scores, dtype=dtype),
                    }
                )

    return run


class SearchEngine:
    """Query-side handle on a built index directory."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cfg: IndexConfig | None = None,
        synonyms: dict[str, list[str]] | None = None,
        similarity: str | object = "bm25",
        sloppy: str = "lucene",
    ) -> None:
        """``sloppy``: scoring semantics for CLASSIC sloppy phrases
        (``"a b"~N``): ``"lucene"`` (default) = SloppyPhraseMatcher —
        out-of-order matches at transposition cost, each match weighted
        1/(1+matchLength) into a fractional tf (query/sloppy.py), the
        reference's rank semantics; ``"window"`` = legacy ordered-window
        counting (integer tf).  Span/surround/complexphrase queries keep
        span-interval semantics in both modes (they are SpanNearQuery,
        not SloppyPhraseScorer, in the reference too).

        ``synonyms``: query-time synonym map (SynonymGraphFilter in the
        default schema's QUERY analyzer, managed-schema.xml:308-314) —
        analyzed lowercase term -> equivalent terms.  A query term with
        synonyms becomes one disjunction clause over the synonym set
        (divergence from Lucene's SynonymQuery blended statistics: each
        synonym scores with its own idf — documented).  A synonym value
        containing spaces is a MULTI-WORD mapping ("usa" -> "united
        states"): it becomes a phrase alternative (SynonymGraphFilter's
        multi-token graph), scored like the manually written phrase
        disjunction and excluded as a phrase under MUST_NOT.

        ``similarity``: a factory name ("bm25", "classic", "lmdirichlet",
        "lmjelinekmercer", "boolean") or a Similarity instance
        (query/similarities.py — the SchemaSimilarityFactory analog).
        Non-BM25 similarities score term queries only; phrase/span clauses
        raise, and block-max θ pruning is disabled (BM25 impacts)."""
        from apache___solr_spark.query.similarities import get_similarity

        self.spark = spark
        self.paths = IndexPaths(index_dir)
        with open(self.paths.stats) as f:
            self.stats = json.load(f)
        # the index's own config is authoritative: cfg=None loads it from
        # the stats file; an explicit cfg must MATCH the build (a mismatch
        # silently mis-prunes buckets/salts — fail loudly instead)
        stored = self.stats.get("config")
        if cfg is None:
            cfg = (
                IndexConfig.from_dict(stored) if stored else DEFAULT_CONFIG
            )
            if self.stats.get("config_digest") not in (None, cfg.digest()):
                raise ValueError(
                    "index predates stored configs and was not built with "
                    "DEFAULT_CONFIG — pass the build cfg explicitly"
                )
        elif self.stats.get("config_digest") not in (None, cfg.digest()):
            raise ValueError(
                "SearchEngine cfg does not match the index's build config "
                f"(digest {cfg.digest()} != {self.stats['config_digest']}); "
                "omit cfg to load the index's own config"
            )
        self.cfg = cfg
        self.postings = spark.read.parquet(self.paths.postings)
        self.dictionary = spark.read.parquet(self.paths.dictionary)
        self.docs = spark.read.parquet(self.paths.docs)
        self._dtype = np.float64 if cfg.score_dtype == "float64" else np.float32
        self._sql_t = "double" if cfg.score_dtype == "float64" else "float"
        self._analyze = analyzer_fn(cfg.analyzer)
        from apache___solr_spark.analysis.chain import multiterm_normalize_fn

        self._mt_normalize = multiterm_normalize_fn(cfg.analyzer)
        self.synonyms = synonyms or {}
        if sloppy not in ("lucene", "window"):
            raise ValueError(f"sloppy must be 'lucene' or 'window': {sloppy!r}")
        self._sloppy_lucene = sloppy == "lucene"
        self.sim = get_similarity(similarity, cfg)
        self._kernel = self.sim.kernel(self.stats["avgdl"], dtype=self._dtype)
        from apache___solr_spark.index.updates import load_deletes

        # tombstoned doc_ids (liveDocs mask) — None when never deleted
        self.deletes = load_deletes(spark, index_dir)
        # term -> aggregated dictionary row (or None for a vocabulary miss),
        # the in-memory term-dictionary analog of Lucene's mmapped FST: an
        # engine instance pins an index snapshot anyway (spark.read lists
        # files at read time; rebuild the engine after add/delete/optimize),
        # so repeated queries on seen terms skip the dictionary job.
        self._meta_cache: dict[str, dict | None] = {}

    # -- term metadata -----------------------------------------------------
    _META_COLS = ["term", "df", "cf", "max_impact", "bucket"]
    _META_CACHE_MAX = 1_000_000  # ~200 MB driver ceiling at 5 fields/term

    def _term_meta(self, terms: list[str]) -> pd.DataFrame:
        if not terms:
            return pd.DataFrame(columns=self._META_COLS)
        missing = sorted({t for t in terms if t not in self._meta_cache})
        if missing:
            buckets = self._buckets(missing)
            # a term may hold several dictionary rows after incremental
            # add_docs (one per appended segment) — aggregate them
            # (ExactStatsCache merge)
            fetched = (
                self.dictionary.filter(
                    F.col("bucket").isin(buckets) & F.col("term").isin(missing)
                )
                .groupBy("term")
                .agg(
                    F.sum("df").alias("df"),
                    F.sum("cf").alias("cf"),
                    F.max("max_impact").alias("max_impact"),
                    F.first("bucket").alias("bucket"),
                )
                .toPandas()
            )
            if len(self._meta_cache) + len(missing) > self._META_CACHE_MAX:
                # bound driver memory on long-lived engines: drop the oldest
                # quarter (dict preserves insertion order — FIFO eviction)
                drop = len(self._meta_cache) // 4 + len(missing)
                for t in list(self._meta_cache)[:drop]:
                    del self._meta_cache[t]
            for rec in fetched.to_dict("records"):
                self._meta_cache[rec["term"]] = rec
            for t in missing:  # cache vocabulary misses too
                self._meta_cache.setdefault(t, None)
        rows = [
            self._meta_cache[t]
            for t in dict.fromkeys(terms)
            if self._meta_cache[t] is not None
        ]
        if not rows:
            return pd.DataFrame(columns=self._META_COLS)
        return pd.DataFrame(rows, columns=self._META_COLS)

    def _buckets(self, terms: list[str]) -> list[int]:
        # driver-side XXH64 (index/xxhash.py) == Spark's xxhash64, so the
        # term->bucket map costs no Spark job (the term-dictionary-seek
        # analog; equality is asserted in tests/test_codec.py).
        from apache___solr_spark.index.xxhash import term_bucket

        return sorted({term_bucket(t, self.cfg.n_buckets) for t in terms})

    def _blocks_for(self, terms: list[str]) -> DataFrame:
        buckets = self._buckets(terms)
        # bucket predicate prunes the partitioned scan; term predicate pushes
        # down to parquet row groups.
        return self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    # -- scoring -----------------------------------------------------------
    def _weights(self, meta: pd.DataFrame) -> dict[str, float]:
        """Per-term similarity weights from the aggregated dictionary rows
        (TermStates/CollectionStatistics analog: df + cf + corpus totals)."""
        n_docs, total_len = self.stats["N"], self.stats["total_len"]
        return {
            r["term"]: self.sim.weight(
                n_docs, int(r["df"]), int(r["cf"]), total_len, dtype=self._dtype
            )
            for _, r in meta.iterrows()
        }

    def _scored(
        self,
        blocks: DataFrame,
        weight_by_term: dict[str, float],
        boost_by_term: dict[str, float] | None = None,
        kernel=None,
    ) -> DataFrame:
        fn = _score_blocks(
            weight_by_term,
            kernel if kernel is not None else self._kernel,
            boost_by_term,
            dtype=self._dtype,
        )
        cols = blocks.select(
            "term",
            "salt",
            "n_docs",
            "doc_gaps",
            "tfs",
            "norms",
            F.lit(self.cfg.salt_range).alias("salt_range"),
        )
        return cols.mapInPandas(
            fn, schema=f"term string, doc_id long, score {self._sql_t}"
        )

    def _theta(
        self,
        meta: pd.DataFrame,
        weight_by_term: dict[str, float],
        boost_by_term: dict[str, float],
        k: int,
    ) -> float:
        """Lower bound on the k-th best final score: fully score the rarest
        term alone; partial scores lower-bound full scores (sound because
        every similarity kernel is non-negative)."""
        scorable = meta[meta["df"] >= k]
        if scorable.empty:
            return 0.0
        rarest = scorable.sort_values(["df", "term"]).iloc[0]["term"]
        blocks = self._blocks_for([rarest])
        part = self._scored(
            blocks, {rarest: weight_by_term[rarest]}, boost_by_term
        )
        rows = part.orderBy(F.col("score").desc()).limit(k).collect()
        if len(rows) < k:
            return 0.0
        return float(rows[-1]["score"])

    def _expand_cond(self, cl):
        """Dictionary-filter Column for a prefix/wildcard/fuzzy/range clause
        (the FST-seek predicate), or ``None`` for the enumerable kinds
        (synonym/group/exact-fuzzy) whose members are already a small
        literal list."""
        import re as _re

        if cl.kind in ("synonym", "group"):
            return None
        # MultiTermAware normalization (Analyzer#normalize): fold the
        # CONSTANT parts of the pattern with the analyzer's multiterm
        # filters, so e.g. icu_folding's RÉSu* reaches the dictionary as
        # resu* (the parser already lowercased; this is idempotent there)
        norm = self._mt_normalize
        if cl.kind == "prefix":
            return F.col("term").startswith(norm(cl.value[:-1]))
        if cl.kind == "wildcard":
            regex = "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(norm(c))
                for c in cl.value
            ) + "$"
            return F.col("term").rlike(regex)
        if cl.kind == "fuzzy":
            fval = norm(cl.value)
            if cl.fuzz <= 0:
                return None
            return (
                F.abs(F.length("term") - F.lit(len(fval))) <= cl.fuzz
            ) & (F.levenshtein(F.col("term"), F.lit(fval)) <= cl.fuzz)
        if cl.kind == "range":
            cond = F.lit(True)
            if cl.lo is not None:
                lo = norm(cl.lo)
                cond = cond & (
                    F.col("term") >= lo if cl.inclusive else F.col("term") > lo
                )
            if cl.hi is not None:
                hi = norm(cl.hi)
                cond = cond & (
                    F.col("term") <= hi if cl.inclusive else F.col("term") < hi
                )
            return cond
        raise ValueError(f"unknown expansion kind {cl.kind!r}")

    def _expand_clause(
        self, cl, max_expansions: int | None = 128
    ) -> list[str] | None:
        """Resolve a prefix/wildcard/fuzzy/range clause against the term
        dictionary (the FST-seek analog: one scan of the small aggregated
        dictionary table, never the corpus), capped at ``max_expansions``
        terms by df desc (Lucene MultiTermQuery rewrite cap semantics;
        scoring divergence: each expansion scores with its own idf instead
        of the constant-score rewrite — documented).

        ``max_expansions=None`` disables the cap — REQUIRED for MUST_NOT
        clauses: Lucene's prohibited multi-term clauses use constant-score
        rewrite with no term cap, so exclusion must cover every matching
        term or prohibited docs would leak back into results.  To keep the
        driver safe on web-scale dictionaries (``-t*`` can match millions
        of terms), the uncapped path only materializes a literal list up to
        ``_EXCLUDE_LITERAL_CAP`` terms; past that it returns ``None`` and
        the caller must switch to the fully distributed exclusion
        (:meth:`_excluded_docs_df` — a postings⋈dictionary join that never
        ships terms through the driver)."""
        if cl.kind in ("synonym", "group"):
            cands = (
                list(cl.terms or [])
                if cl.kind == "group"
                else [cl.value] + list(self.synonyms.get(cl.value, []))
            )
            meta = self._term_meta(list(dict.fromkeys(cands)))
            return [t for t in cands if t in set(meta["term"])]
        if cl.kind == "fuzzy" and cl.fuzz <= 0:
            fval = self._mt_normalize(cl.value)
            return [fval] if not self._term_meta([fval]).empty else []
        cond = self._expand_cond(cl)
        matched = (
            self.dictionary.filter(cond)
            .groupBy("term")  # appended segments may duplicate a term's row
            .agg(F.sum("df").alias("df"))
            .orderBy(F.col("df").desc(), F.col("term").asc())
        )
        if max_expansions is not None:
            matched = matched.limit(max_expansions)
            return [r["term"] for r in matched.collect()]
        rows = matched.limit(_EXCLUDE_LITERAL_CAP + 1).collect()
        if len(rows) > _EXCLUDE_LITERAL_CAP:
            return None  # too many to enumerate — distributed path required
        return [r["term"] for r in rows]

    def _excluded_docs_df(
        self, cl, salts: list[int] | None = None
    ) -> DataFrame:
        """Distinct doc_ids matching ANY dictionary term of an expansion
        clause — the fully distributed prohibited-clause path (Lucene
        constant-score rewrite semantics, no term cap, no driver term
        list): dictionary predicate → postings join on term (AQE
        broadcasts the matched-term side when it fits) → lightest
        doc-gaps-only decode.  Used when :meth:`_expand_clause` overflows
        ``_EXCLUDE_LITERAL_CAP``."""
        cond = self._expand_cond(cl)
        tdf = self.dictionary.filter(cond).select("term").distinct()
        nb = self.postings.join(tdf, "term")
        if salts is not None:
            nb = nb.filter(F.col("salt").isin(salts))
        return (
            nb.select("term", "salt", "n_docs", "doc_gaps")
            .mapInPandas(
                _decode_docs_fn(self.cfg.salt_range),
                schema="term string, doc_id long",
            )
            .select("doc_id")
            .distinct()
        )

    def _phrase_frame(
        self,
        ptoks: list[str],
        idf_by_term: dict[str, float],
        boost: float = 1.0,
        slop: int = 0,
        salts: list[int] | None = None,
        ordered: bool = True,
        slots: list[tuple[str, ...]] | None = None,
        tree=None,
        lucene_sloppy: bool = False,
    ) -> DataFrame:
        """(doc_id, score) of docs matching the phrase (``slop=0``: exact
        adjacency; ``slop>0``: ordered window, or Lucene SloppyPhrase
        fractional freq when ``lucene_sloppy``; ``ordered=False``:
        unordered minimal-window — see _phrase_score_fn).  ``slots``
        switches to per-position term SETS (complexphrase): the salt/doc
        gates then require >=1 member of EVERY slot instead of every term.
        ``tree`` (a slot-level span tree, see span_tree/query/spans.py)
        swaps the final matcher for the nested-interval evaluator; the
        scan/gate/decode pipeline is shared.

        Scale shape: the scan prunes to the phrase terms' buckets AND to the
        salt ranges containing ALL constituent terms (one member per slot in
        slot mode) before any decode; the position intersection then runs
        only on docs passing that gate, which for a selective phrase is a
        tiny set.
        """
        if not self.cfg.store_positions:
            raise NotImplementedError(
                "index built with store_positions=False; phrase queries "
                "unavailable (rebuild with store_positions=True)"
            )
        uniq = sorted(set(ptoks))
        blocks = self._blocks_for(uniq)
        if salts is not None:
            blocks = blocks.filter(F.col("salt").isin(salts))
        if slots is None:
            slot_map = None
            n_gate = len(uniq)
        else:
            # term -> ARRAY of slot ids it can satisfy (a term may serve
            # several slots); the gate explodes that array and counts
            # covered SLOTS — a doc/salt passes iff every slot has >=1
            # member present.  The map is query-sized: it compiles to a
            # literal expression, no join.
            slot_ids: dict[str, list[int]] = {}
            for i, s in enumerate(slots):
                for t in s:
                    slot_ids.setdefault(t, []).append(i)
            slot_map = F.create_map(
                *[
                    x
                    for t, ids in sorted(slot_ids.items())
                    for x in (F.lit(t), F.array(*[F.lit(i) for i in ids]))
                ]
            )
            n_gate = len(slots)

        def _gate(df: DataFrame, key: str) -> DataFrame:
            """keys of df covering every gate unit (term / slot)."""
            if slot_map is None:
                unit = F.col("term")
                src = df.select(key, unit.alias("unit"))
            else:
                src = df.select(
                    key, F.explode(slot_map[F.col("term")]).alias("unit")
                )
            return (
                src.groupBy(key)
                .agg(F.count_distinct("unit").alias("nt"))
                .filter(F.col("nt") == n_gate)
                .select(key)
            )

        blocks = blocks.join(_gate(blocks, "salt"), "salt", "left_semi")
        decoded = blocks.select(
            "term", "salt", "n_docs", "doc_gaps", "tfs", "norms",
            "positions", "sum_tf",
        ).mapInPandas(
            _decode_positions_fn(self.cfg.salt_range),
            schema="term string, doc_id long, norm int, positions array<long>",
        )
        nt_expr = (
            F.count_distinct("term")
            if slot_map is None
            else F.size(
                F.array_distinct(
                    F.flatten(F.collect_list(slot_map[F.col("term")]))
                )
            )
        )
        grouped = (
            decoded.groupBy("doc_id")
            .agg(
                F.first("norm").alias("norm"),
                nt_expr.alias("nt"),
                F.collect_list(F.struct("term", "positions")).alias("plists"),
            )
            .filter(F.col("nt") == n_gate)
            .select("doc_id", "norm", "plists")
        )
        sum_idf = float(sum(idf_by_term[t] for t in ptoks)) * float(boost)
        if tree is not None:
            fn = _span_tree_score_fn(
                tree,
                slots,
                sum_idf,
                self.cfg.bm25_k1,
                self.cfg.bm25_b,
                self.stats["avgdl"],
                self._dtype,
            )
        else:
            fn = _phrase_score_fn(
                ptoks,
                sum_idf,
                self.cfg.bm25_k1,
                self.cfg.bm25_b,
                self.stats["avgdl"],
                self._dtype,
                slop=slop,
                ordered=ordered,
                slots=slots,
                lucene_sloppy=lucene_sloppy,
            )
        return grouped.mapInPandas(fn, schema=f"doc_id long, score {self._sql_t}")

    def span_near(
        self,
        words: list[str],
        dist: int = 1,
        ordered: bool = True,
        k: int = 10,
        with_url: bool = True,
    ) -> DataFrame:
        """Span-proximity top-k — the surround parser's ``<dist>W(...)``
        (ordered) / ``<dist>N(...)`` (unordered) distance operators
        (SurroundQParserPlugin.java; queryparser/surround/query/
        DistanceQuery.java builds SpanNearQuery(slop=dist-1, inOrder)).

        Each word is query-analyzed; a word that analyzes to several
        tokens contributes them in sequence (ordered) / to the distinct
        set (unordered).  All words are REQUIRED (span semantics).  Docs
        score BM25 with tf = span frequency and idf = summed constituent
        idfs, like phrases.  Returns (rank, doc_id[, url], score).
        """
        if dist < 1:
            raise ValueError("span distance must be >= 1")
        if not self.sim.supports_phrases:
            raise NotImplementedError(
                f"similarity {self.sim.name!r}: span queries need BM25"
            )
        toks: list[str] = []
        for w in words:
            toks.extend(self._analyze(w))
        if not ordered:
            toks = sorted(set(toks))
        schema = f"rank int, doc_id long, url string, score {self._sql_t}"
        if not toks:
            return self.spark.createDataFrame([], schema)
        meta = self._term_meta(sorted(set(toks)))
        found = set(meta["term"])
        if any(t not in found for t in toks):
            return self.spark.createDataFrame([], schema)
        n_docs = self.stats["N"]
        idf_by_term = {
            r["term"]: float(bm25_idf(n_docs, int(r["df"]), dtype=self._dtype))
            for _, r in meta.iterrows()
        }
        frame = self._phrase_frame(
            toks, idf_by_term, slop=dist - 1, ordered=ordered
        )
        if self.deletes is not None:
            frame = frame.join(self.deletes, "doc_id", "left_anti")
        return self._finalize(frame, k, with_url)

    def minhash_search(
        self,
        text: str,
        k: int = 10,
        sim: float | None = None,
        tp: float = 1.0,
        sep: str | None = None,
        with_url: bool = True,
    ) -> DataFrame:
        """``{!min_hash}`` (MinHashQParser.java) over an index built with
        ``analyzer="min_hash"`` (analysis/minhash.py): the query text runs
        through the same min-hash chain and each signature token becomes a
        constant-score term clause; a doc's score is its matched-token
        count normalized by the signature size — the Jaccard-similarity
        estimate (the reference reports the unnormalized constant-score
        sum; same ranking).

        ``sim``+``tp`` enable LSH banding (computeBandSize): candidates
        must match EVERY token of at least one band — the selectivity
        gate that keeps a high-similarity lookup from fanning out to
        every doc sharing a single hash.  The per-doc overlap count still
        scores all matched tokens, so banding changes the candidate set
        (by design), never a surviving doc's score.

        Scale shape: one bucket- and term-pruned postings scan through
        the shared vectorized decode (constant kernel), one
        groupBy(doc_id) count, top-k via _finalize; the band map is a
        <=512-row broadcast join.
        """
        if self.cfg.analyzer != "min_hash":
            raise NotImplementedError(
                "{!min_hash} needs an index built with analyzer='min_hash' "
                f"(this index: {self.cfg.analyzer!r})"
            )
        # sep= (MinHashQParser): the string is PRE-HASHED signature
        # tokens joined by sep (e.g. a stored signature queried back),
        # bypassing the analysis chain
        toks = (
            [t for t in text.split(sep) if t]
            if sep  # empty sep == analyze, like MinHashQParser
            else self._analyze(text)
        )
        n = len(toks)
        schema = f"rank int, doc_id long, url string, score {self._sql_t}"
        if not toks:
            return self.spark.createDataFrame([], schema)
        meta = self._term_meta(sorted(set(toks)))
        found = set(meta["term"])
        qtoks = [t for t in toks if t in found]
        if not qtoks:
            return self.spark.createDataFrame([], schema)
        dtype = self._dtype  # local capture: the kernel ships to executors
        ones = lambda w, b, tfs, dl: np.full(  # noqa: E731
            len(tfs), b, dtype=dtype
        )
        frame = self._scored(
            self._blocks_for(sorted(set(qtoks))),
            {t: 1.0 for t in set(qtoks)},
            kernel=ones,
        )
        if sim is not None and tp < 1.0:
            from apache___solr_spark.analysis.minhash import compute_band_size

            rows = compute_band_size(n, float(sim), float(tp))
            if rows > 1:
                # band = `rows` consecutive signature positions; a doc
                # qualifies when some band matches completely
                bands = [(t, i // rows) for i, t in enumerate(toks)]
                sizes: dict[int, int] = {}
                for _t, b in bands:
                    sizes[b] = sizes.get(b, 0) + 1
                bmap = F.broadcast(
                    self.spark.createDataFrame(
                        [(t, b, sizes[b]) for t, b in bands],
                        "term string, band int, band_n int",
                    )
                )
                ok = (
                    frame.join(bmap, "term")
                    .groupBy("doc_id", "band", "band_n")
                    .agg(F.count_distinct("term").alias("nt"))
                    .filter(F.col("nt") == F.col("band_n"))
                    .select("doc_id")
                    .distinct()
                )
                frame = frame.join(ok, "doc_id", "left_semi")
        scored = frame.groupBy("doc_id").agg(
            (F.count_distinct("term") / F.lit(float(n)))
            .cast(self._sql_t)
            .alias("score")
        )
        if self.deletes is not None:
            scored = scored.join(self.deletes, "doc_id", "left_anti")
        return self._finalize(scored, k, with_url)

    def _payload_candidates(
        self, ptoks: list[str], require_all: bool = True
    ) -> DataFrame | None:
        """(doc_id, norm, plists, n, payloads) for docs containing every
        query token (``require_all=False``, the SpanOr operator=or form:
        ANY token), with the per-doc payload stream joined in.  Same
        salt-gate + vectorized-decode shape as _phrase_frame; the payload
        side table is doc_id-range-partitioned so the join is a ranged
        sort-merge against a candidate set the postings already pruned."""
        import os

        pay_dir = self.paths.payloads
        if not os.path.isdir(pay_dir):
            raise NotImplementedError(
                "index has no payload side table — build with "
                "analyzer='whitespace_payload'"
            )
        if not self.cfg.store_positions:
            raise NotImplementedError(
                "payload queries need positions (store_positions=True)"
            )
        uniq = sorted(set(ptoks))
        meta = self._term_meta(uniq)
        found = set(meta["term"])
        if require_all:
            if len(found) < len(uniq):
                return None
        elif not found:
            return None
        blocks = self._blocks_for(sorted(found))
        if require_all:
            gate = (
                blocks.select("salt", "term")
                .groupBy("salt")
                .agg(F.count_distinct("term").alias("nt"))
                .filter(F.col("nt") == len(uniq))
                .select("salt")
            )
            blocks = blocks.join(gate, "salt", "left_semi")
        decoded = (
            blocks
            .select(
                "term", "salt", "n_docs", "doc_gaps", "tfs", "norms",
                "positions", "sum_tf",
            )
            .mapInPandas(
                _decode_positions_fn(self.cfg.salt_range),
                schema="term string, doc_id long, norm int, "
                "positions array<long>",
            )
        )
        grouped = (
            decoded.groupBy("doc_id")
            .agg(
                F.first("norm").alias("norm"),
                F.count_distinct("term").alias("nt"),
                F.collect_list(F.struct("term", "positions")).alias("plists"),
            )
            .filter(
                F.col("nt") == (len(uniq) if require_all else F.col("nt"))
            )
            .select("doc_id", "norm", "plists")
        )
        pay = self.spark.read.parquet(pay_dir)
        out = grouped.join(pay, "doc_id")
        if self.deletes is not None:
            out = out.join(self.deletes, "doc_id", "left_anti")
        return out

    def _payload_run(
        self, query_text: str, k: int, with_url: bool, mode_kw: dict
    ) -> DataFrame:
        toks = self._analyze(query_text)
        schema = f"rank int, doc_id long, url string, score {self._sql_t}"
        if not toks:
            return self.spark.createDataFrame([], schema)
        cands = self._payload_candidates(
            toks, require_all=mode_kw.get("operator", "phrase") != "or"
        )
        if cands is None:
            return self.spark.createDataFrame([], schema)
        meta = self._term_meta(sorted(set(toks)))
        idf_by_term = {
            r["term"]: float(
                bm25_idf(self.stats["N"], int(r["df"]), dtype=self._dtype)
            )
            for _, r in meta.iterrows()
        }
        # duplicates counted, like _phrase_frame's sum over ptoks
        sum_idf = float(sum(idf_by_term.get(t, 0.0) for t in toks))
        fn = _payload_eval_fn(
            toks,
            sum_idf,
            self.cfg.bm25_k1,
            self.cfg.bm25_b,
            self.stats["avgdl"],
            self._dtype,
            **mode_kw,
        )
        scored = cands.mapInPandas(
            fn, schema=f"doc_id long, score {self._sql_t}"
        )
        return self._finalize(scored, k, with_url)

    def payload_score(
        self,
        query_text: str,
        func: str = "max",
        include_span_score: bool = False,
        operator: str = "phrase",
        k: int = 10,
        with_url: bool = True,
    ) -> DataFrame:
        """``{!payload_score}`` (PayloadScoreQParser.java ->
        lucene/queries PayloadScoreQuery): the query tokens form an
        exact-adjacency span (a single token = a term span;
        ``operator="or"`` makes every term occurrence its own span —
        SpanOrQuery); each doc scores ``func`` (min/max/average/sum)
        over the payloads at every matched span position — positions
        without a payload are skipped, like collectLeaf skips null
        payloads — times the span's BM25 score when ``includeSpanScore``
        (tf = span frequency, idf summed over constituents with
        duplicates counted — the engine's phrase scoring)."""
        if func not in ("min", "max", "average", "avg", "sum"):
            raise ValueError(f"unknown payload func {func!r}")
        if operator not in ("phrase", "or"):
            raise ValueError(f"unknown payload operator {operator!r}")
        return self._payload_run(
            query_text,
            k,
            with_url,
            {
                "func": func,
                "include_span": include_span_score,
                "operator": operator,
            },
        )

    def payload_check(
        self,
        query_text: str,
        payloads: list[float],
        op: str = "eq",
        k: int = 10,
        with_url: bool = True,
    ) -> DataFrame:
        """``{!payload_check}`` (PayloadCheckQParser.java ->
        SpanPayloadCheckQuery): docs where at least one exact-adjacency
        occurrence of the query tokens carries payloads satisfying
        ``op`` (eq/gt/gte/lt/lte — the parser's MatchOperation) against
        the given values, position by position; a missing payload never
        satisfies any operation.  Matches score like the underlying
        span (BM25 with tf = matching-span frequency)."""
        if op not in ("eq", "gt", "gte", "lt", "lte"):
            raise ValueError(f"unknown payload_check op {op!r}")
        toks = self._analyze(query_text)
        if toks and len(payloads) != len(toks):
            raise ValueError(
                f"payloads count {len(payloads)} != query tokens {len(toks)}"
            )
        return self._payload_run(
            query_text,
            k,
            with_url,
            {"expected": list(payloads), "check_op": op},
        )

    def _resolve_span_operand(
        self, raw: str, max_expansions: int = 128
    ) -> list[tuple[str, ...]] | None:
        """One span operand -> its slot term-sets: a pattern (``jo*``,
        ``pag?``, ``term~N``) expands against the dictionary into ONE
        SpanOr slot; a plain token analyzes (multi-token analysis yields
        consecutive slots).  ``None`` == the operand can never match
        (a PATTERN with an empty dictionary expansion); ``[]`` == the
        token ANALYZED AWAY (e.g. a stopword) — Lucene's
        ComplexPhraseQueryParser drops such tokens and keeps matching
        the remaining slots, so callers must skip, not fail."""
        from apache___solr_spark.query.parser import Clause

        fm = re.fullmatch(r"(.+?)~(\d*)", raw)
        if "*" in raw or "?" in raw:
            kind = (
                "prefix"
                if raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw
                else "wildcard"
            )
            cl = Clause(occur="SHOULD", kind=kind, value=raw.lower())
            members = self._expand_clause(cl, max_expansions=max_expansions)
            return [tuple(sorted(members))] if members else None
        if fm:
            cl = Clause(
                occur="SHOULD",
                kind="fuzzy",
                value=fm.group(1).lower(),
                fuzz=int(fm.group(2) or 2),
            )
            members = self._expand_clause(cl, max_expansions=max_expansions)
            return [tuple(sorted(members))] if members else None
        toks = self._analyze(raw)
        return [(t,) for t in toks]

    def span_tree(
        self,
        spec,
        k: int = 10,
        with_url: bool = True,
        max_expansions: int = 128,
    ) -> DataFrame:
        """NESTED span-proximity query — surround's nested distance
        operators (queryparser/surround/query/DistanceQuery.java trees,
        ``3W(2N(a, b), c)`` -> SpanNear nesting SpanNear).

        ``spec`` is ``("near", dist, ordered, [children])`` with operand
        leaves ``("op", raw)``; operands resolve like complexphrase slots
        (patterns -> SpanOr of dictionary expansions, plain tokens
        analyze — multi-token analysis becomes an adjacency sequence).
        Interval semantics live in query/spans.py (shared verbatim with
        the independent oracle).  Scoring: BM25 with tf = the root's
        span frequency — distinct match STARTS when the root is ordered,
        distinct ENDS when unordered, so a tree that is secretly flat
        scores identically to span_near/complex_phrase — and idf = the
        summed idfs of every slot member (SpanWeight aggregation).

        Scale shape: identical to the flat path — bucket- and salt-gated
        scan, one positions decode, per-doc interval algebra inside the
        Arrow batch (candidates already passed the every-slot gate, so
        the per-doc Python matcher runs on the tiny qualifying set, like
        the complexphrase matcher before vectorization).
        """
        if not self.sim.supports_phrases:
            raise NotImplementedError(
                f"similarity {self.sim.name!r}: span queries need BM25"
            )
        schema = f"rank int, doc_id long, url string, score {self._sql_t}"
        slots: list[tuple[str, ...]] = []
        unmatchable = False

        def build(node):
            nonlocal unmatchable
            if node[0] == "near":
                _, dist, ordered, children = node
                built = [build(c) for c in children]
                # a child that analyzed away (stopword) is dropped, like
                # ComplexPhraseQueryParser; a near left with one child
                # collapses to that child, with none it vanishes too
                built = [b for b in built if b is not None]
                if not built:
                    return None
                if len(built) == 1:
                    return built[0]
                return ("near", int(dist), bool(ordered), built)
            groups = self._resolve_span_operand(node[1], max_expansions)
            if groups is None:
                unmatchable = True
                return ("slot", -1)
            if not groups:
                return None
            parts = []
            for g in groups:
                slots.append(tuple(g))
                parts.append(("slot", len(slots) - 1))
            return parts[0] if len(parts) == 1 else ("seq", parts)

        tree = build(spec)
        if unmatchable or not slots:
            return self.spark.createDataFrame([], schema)
        ptoks = [t for s in slots for t in s]
        meta = self._term_meta(sorted(set(ptoks)))
        found = set(meta["term"])
        slots = [tuple(t for t in s if t in found) for s in slots]
        if any(not s for s in slots):
            return self.spark.createDataFrame([], schema)
        ptoks = [t for s in slots for t in s]
        n_docs = self.stats["N"]
        idf_by_term = {
            r["term"]: float(bm25_idf(n_docs, int(r["df"]), dtype=self._dtype))
            for _, r in meta.iterrows()
        }
        frame = self._phrase_frame(
            ptoks, idf_by_term, slots=slots, tree=tree
        )
        if self.deletes is not None:
            frame = frame.join(self.deletes, "doc_id", "left_anti")
        return self._finalize(frame, k, with_url)

    def complex_phrase(
        self,
        phrase: str,
        slop: int = 0,
        ordered: bool = True,
        k: int = 10,
        with_url: bool = True,
        max_expansions: int = 128,
    ) -> DataFrame:
        """ComplexPhraseQParserPlugin: a phrase whose positions may be
        wildcard/prefix/fuzzy patterns — ``"jo* smith"``, ``"web pag?"~2``
        (ComplexPhraseQParserPlugin.java; Lucene ComplexPhraseQueryParser
        rewrites each pattern slot to a SpanOr of its dictionary
        expansions inside a SpanNear(slop, inOrder)).

        Each whitespace token becomes one slot: patterns (``*``/``?``)
        expand against the term dictionary (capped at ``max_expansions``
        by df desc, MultiTermQuery rewrite cap semantics); ``term~N``
        expands by Levenshtein; plain tokens analyze (a multi-token
        analysis contributes its tokens as consecutive slots).  Scoring:
        BM25 with tf = span frequency, idf = summed idfs of every slot
        member (SpanWeight aggregates the term statistics of ALL terms
        under the query — documented: the expansion cap bounds the sum).
        Returns (rank, doc_id[, url], score).
        """
        if not self.sim.supports_phrases:
            raise NotImplementedError(
                f"similarity {self.sim.name!r}: complex phrases need BM25"
            )
        slots: list[tuple[str, ...]] = []
        for raw in phrase.split():
            groups = self._resolve_span_operand(raw, max_expansions)
            if groups is None:
                return self.spark.createDataFrame(
                    [], f"rank int, doc_id long, url string, score {self._sql_t}"
                )
            slots.extend(groups)
        schema = f"rank int, doc_id long, url string, score {self._sql_t}"
        if not slots:
            return self.spark.createDataFrame([], schema)
        ptoks = [t for s in slots for t in s]
        meta = self._term_meta(sorted(set(ptoks)))
        found = set(meta["term"])
        # a slot member missing from the dictionary can never match; a
        # slot with NO present member makes the whole span unmatchable
        slots = tuple(
            tuple(t for t in s if t in found) for s in slots
        )
        if any(not s for s in slots):
            return self.spark.createDataFrame([], schema)
        ptoks = [t for s in slots for t in s]
        n_docs = self.stats["N"]
        idf_by_term = {
            r["term"]: float(bm25_idf(n_docs, int(r["df"]), dtype=self._dtype))
            for _, r in meta.iterrows()
        }
        frame = self._phrase_frame(
            ptoks,
            idf_by_term,
            slop=slop,
            ordered=ordered,
            slots=[tuple(s) for s in slots],
        )
        if self.deletes is not None:
            frame = frame.join(self.deletes, "doc_id", "left_anti")
        return self._finalize(frame, k, with_url)

    def search(
        self,
        query: str | ParsedQuery,
        k: int = 10,
        start: int = 0,
        prune: bool = True,
        with_url: bool = True,
        doc_filter: list[int] | None = None,
        bf: list | None = None,
        boost: list | None = None,
        default_op: str = "OR",
        fq: list | None = None,
        should_combine: str = "sum",
        tie: float = 0.0,
        _docset: bool | str = False,
        _filter_docset: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k docs for a query. Returns (rank, doc_id[, url], score).

        ``default_op``: Solr's q.op — with "AND", bare clauses bind as
        MUST (Lucene AND_OPERATOR promote/demote semantics).

        ``fq``: filter queries (SolrIndexSearcher.getProcessedFilter — the
        reference's most-used request param): each entry is a query whose
        full DocSet intersects the main query's matches BEFORE top-k
        without contributing score (ConstantScore filter semantics — a
        MUST clause would add its BM25 score; fq must not).  Theta
        pruning is disabled when a filter is present: theta bounds the
        global k-th best score, but top-k among the filtered subset can
        legitimately include docs below that bound.  Salt-level MUST
        pruning stays on (it only drops ranges that cannot match at all).

        ``doc_filter`` restricts scoring to an explicit (small) doc_id set —
        the rescoring path (ReRankQParserPlugin semantics): the postings scan
        is pruned to the salt ranges containing those ids and only their
        postings are decoded, so rescoring 100 docs never scans the corpus.

        ``bf``: additive function boosts (dismax bf param — each a Column
        over the docs-table fields, functions/registry.parse_func_query);
        ``boost``: multiplicative function boosts (edismax boost param /
        BoostQParserPlugin).  Both join the matching docs' function values
        BEFORE top-k, so the functions influence ranking like the
        reference's FunctionQuery clauses.
        """
        filter_docset = _filter_docset
        if fq:
            for f in fq:
                ds = self.docset(f)
                filter_docset = (
                    ds
                    if filter_docset is None
                    else filter_docset.join(ds, "doc_id", "left_semi")
                )
        if isinstance(query, str):
            tree = parse_query_tree(
                query, analyze_fn=self._analyze, default_op=default_op
            )
            if self.synonyms and self._tree_has_multiword_synonym(tree):
                # phrase alternatives need the recursive evaluator — the
                # flat path's expansion groups are term-only
                return self._search_tree(
                    tree,
                    k=k,
                    start=start,
                    with_url=with_url,
                    doc_filter=doc_filter,
                    bf=bf,
                    boost=boost,
                    _docset=_docset,
                    _filter_docset=filter_docset,
                    should_combine=should_combine,
                    tie=tie,
                )
            try:
                pq = lower_tree(tree)
            except NotFlatQuery:
                # nested boolean structure (BooleanQuery nesting,
                # QueryParser.jj:135-172 recursive Clause/Query productions)
                # -> the recursive evaluator
                return self._search_tree(
                    tree,
                    k=k,
                    start=start,
                    with_url=with_url,
                    doc_filter=doc_filter,
                    bf=bf,
                    boost=boost,
                    _docset=_docset,
                    _filter_docset=filter_docset,
                    should_combine=should_combine,
                    tie=tie,
                )
        elif isinstance(query, BoolQuery):
            # programmatic tree (dismax/edismax dispatch, mm support)
            return self._search_tree(
                query,
                k=k,
                start=start,
                with_url=with_url,
                doc_filter=doc_filter,
                bf=bf,
                boost=boost,
                _docset=_docset,
                _filter_docset=filter_docset,
                should_combine=should_combine,
                tie=tie,
            )
        else:
            pq = query
        spark = self.spark
        if pq.is_empty:
            schema = f"rank int, doc_id long, url string, score {self._sql_t}"
            return spark.createDataFrame([], schema)

        empty_schema = f"rank int, doc_id long, url string, score {self._sql_t}"
        if self.synonyms:
            pq = _apply_synonyms(pq, self.synonyms)
        # resolve dictionary-expanded clauses (prefix/wildcard/fuzzy/range)
        exp_groups: list[tuple[str, str, list[str], float]] = []
        exclude_exp_terms: list[str] = []
        exclude_exp_frames: list[DataFrame] = []
        for cl in pq.expand:
            matched = self._expand_clause(
                cl, max_expansions=None if cl.occur == "MUST_NOT" else 128
            )
            if cl.occur == "MUST_NOT":
                if matched is None:  # overflowed the literal cap
                    exclude_exp_frames.append(self._excluded_docs_df(cl))
                else:
                    exclude_exp_terms.extend(matched)
                continue
            if not matched:
                if cl.occur == "MUST":
                    return spark.createDataFrame([], empty_schema)
                continue
            exp_groups.append((cl.label, cl.occur, matched, cl.boost))

        terms = pq.scoring_terms
        phrase_terms = [
            t
            for ph in pq.scoring_phrases + pq.must_not_phrases
            for t in ph
            if t not in terms
        ]
        group_terms = [t for g in exp_groups for t in g[2]]
        meta = self._term_meta(
            list(dict.fromkeys(terms + phrase_terms + group_terms))
        )
        found = set(meta["term"])
        terms = [t for t in terms if t in found]
        must = [t for t in pq.must if t in found]
        scoring_phrases = [
            ph for ph in pq.scoring_phrases if all(t in found for t in ph)
        ]
        if pq.must and len(must) < len(pq.must):
            # a required term is absent from the corpus -> empty result
            return spark.createDataFrame([], empty_schema)
        if any(
            any(t not in found for t in ph) for ph in pq.must_phrases
        ):
            # a required phrase can never match
            return spark.createDataFrame([], empty_schema)
        if not terms and not scoring_phrases and not exp_groups:
            return spark.createDataFrame([], empty_schema)
        if not self.sim.supports_phrases and (
            scoring_phrases or pq.must_not_phrases
        ):
            raise NotImplementedError(
                f"similarity {self.sim.name!r} scores term queries only; "
                "phrase clauses need BM25 (see query/similarities.py)"
            )
        idf_by_term = self._weights(meta)
        # per-clause boosts travel separately from the statistic weight (the
        # kernel decides how they compose: multiplied into idf for BM25/
        # classic, a plain score multiplier for the LM family); the same
        # (weight, boost) pair feeds scoring AND theta/ub pruning.
        term_boosts = {
            t: float(pq.boosts.get(t, 1.0))
            for t in terms
            if pq.boosts.get(t, 1.0) != 1.0
        }

        blocks = self._blocks_for(terms) if terms else None

        if doc_filter is not None and blocks is not None:
            salts = sorted({int(d) // self.cfg.salt_range for d in doc_filter})
            blocks = blocks.filter(F.col("salt").isin(salts))
        if doc_filter is not None:
            prune = False  # the scan is already tiny; theta pass costs more
        if filter_docset is not None:
            # theta bounds the GLOBAL k-th best partial score; top-k among
            # the fq-filtered subset may include docs below that bound.
            prune = False
        if should_combine != "sum":
            # theta is a SUM-of-partials bound; unsound under dismax combine
            prune = False
        if _docset:
            # theta is a TOP-K bound (k-th best partial score); a DocSet
            # wants every match, so the pass is unsound here.  Salt-level
            # MUST pruning below stays on — it only drops ranges that
            # cannot contain a qualifying doc.
            prune = False

        # theta pruning is only sound for pure-SHOULD queries: theta is the
        # k-th best PARTIAL score over docs containing the rarest term, and
        # under MUST semantics those docs need not satisfy the other required
        # terms, so theta would overestimate the true qualifying threshold and
        # silently drop correct results (adversarial A/B fixture in
        # tests/test_index_query.py::test_must_prune_adversarial).  MUST
        # queries still get the salt-level pruning below, which is sound.
        # ... and phrase clauses are excluded from ub(salt), so any phrase
        # in the query also disables the theta pass.
        if (
            prune
            and self.sim.prunable  # ub(salt) is built from BM25 impacts
            and blocks is not None
            and not pq.must_not
            and not exclude_exp_terms
            and not exclude_exp_frames
            and not must
            and not scoring_phrases
            and not pq.must_not_phrases
            and not exp_groups
        ):
            term_meta = meta[meta["term"].isin(terms)]
            # θ must bound the COLLECTOR depth (start+k), not the page
            # size: offset paging returns ranks start+1..start+k, and a
            # k-deep bound would prune the very docs those ranks hold
            theta = self._theta(
                term_meta, idf_by_term, term_boosts, int(start) + k
            )
            if theta > 0.0:
                # per-term scores are float32-rounded, so a doc score can sit
                # one ulp ABOVE the float64 upper bound — prune with a small
                # relative slack so boundary ties are never dropped (the
                # prune-on == prune-off invariant is enforced by tests).
                cutoff = theta * (1.0 - 1e-4)
                idf_expr = F.create_map(
                    *[
                        x
                        for t in terms
                        for x in (
                            F.lit(t),
                            F.lit(
                                idf_by_term[t] * term_boosts.get(t, 1.0)
                            ),
                        )
                    ]
                )
                ub = (
                    blocks.select(
                        "salt",
                        (idf_expr[F.col("term")] * F.col("max_impact")).alias("ub"),
                    )
                    .groupBy("salt")
                    .agg(F.sum("ub").alias("ub"))
                    .filter(F.col("ub") >= cutoff)
                    .select("salt")
                )
                blocks = blocks.join(ub, "salt", "left_semi")

        if must and blocks is not None:
            # a doc range can only contain MUST-satisfying docs if every
            # MUST term has postings in that range — prune the rest up front.
            must_blocks = (
                blocks.filter(F.col("term").isin(must))
                .groupBy("salt")
                .agg(F.count_distinct("term").alias("nt"))
                .filter(F.col("nt") == len(must))
                .select("salt")
            )
            blocks = blocks.join(must_blocks, "salt", "left_semi")

        frames = []
        if blocks is not None:
            frames.append(self._scored(blocks, idf_by_term, term_boosts))
        for ph in scoring_phrases:
            frames.append(
                self._phrase_frame(
                    ph,
                    idf_by_term,
                    boost=float(pq.boosts.get(phrase_label(ph), 1.0)),
                    slop=int(pq.slops.get(phrase_label(ph), 0)),
                    lucene_sloppy=self._sloppy_lucene,
                ).select(F.lit(phrase_label(ph)).alias("term"), "doc_id", "score")
            )
        # NB: the loop variable must not shadow the ``boost`` parameter
        for label, _occur, matched, gboost in exp_groups:
            # one disjunction clause: any matching expansion term matches
            # the clause; its score is the sum of the matched terms' scores
            gb = self._blocks_for(matched)
            gscored = self._scored(
                gb, idf_by_term, {t: float(gboost) for t in matched}
            )
            frames.append(
                gscored.groupBy("doc_id")
                .agg(F.sum("score").cast(self._sql_t).alias("score"))
                .select(F.lit(label).alias("term"), "doc_id", "score")
            )
        scored = frames[0]
        for fr in frames[1:]:
            scored = scored.unionByName(fr)
        if doc_filter is not None:
            scored = scored.filter(F.col("doc_id").isin([int(d) for d in doc_filter]))
        must_labels = (
            must
            + [phrase_label(ph) for ph in pq.must_phrases]
            + [label for label, occ, _m, _b in exp_groups if occ == "MUST"]
        )
        if should_combine == "max":
            # MaxScoreQParserPlugin.java: optional (SHOULD) clauses combine
            # as DisjunctionMax(tie) — max + tie * sum(others) — while MUST
            # clauses keep their summed contribution
            is_must = (
                F.col("term").isin(must_labels)
                if must_labels
                else F.lit(False)
            )
            s_should = F.when(~is_must, F.col("score"))
            dismax = F.coalesce(
                F.max(s_should)
                + F.lit(float(tie)) * (F.sum(s_should) - F.max(s_should)),
                F.lit(0.0),
            )
            agg = scored.groupBy("doc_id").agg(
                (
                    F.coalesce(
                        F.sum(F.when(is_must, F.col("score"))), F.lit(0.0)
                    )
                    + dismax
                ).alias("_s"),
                F.count(
                    F.when(F.col("term").isin(must_labels), 1)
                ).alias("_nmust"),
            )
        elif should_combine != "sum":
            raise ValueError(f"unknown should_combine {should_combine!r}")
        else:
            agg = scored.groupBy("doc_id").agg(
                F.sum("score").alias("_s"),
                F.count(
                    F.when(F.col("term").isin(must_labels), 1)
                ).alias("_nmust"),
            )
        if must_labels:
            agg = agg.filter(F.col("_nmust") == len(must_labels))
        if self.deletes is not None:
            # liveDocs semantics: deleted docs remain in the postings but
            # never surface (DirectUpdateHandler2 deleteById -> tombstones)
            agg = agg.join(self.deletes, "doc_id", "left_anti")
        # must_not terms never enter meta; _blocks_for of an absent term is
        # just an empty scan, so no existence filter is needed here
        exclude_terms = list(pq.must_not) + exclude_exp_terms
        if exclude_terms:
            nb = self._blocks_for(exclude_terms)
            # exclusion only needs doc ids — the constant boolean kernel
            # sidesteps LM kernels dividing by a zero weight
            from apache___solr_spark.query.similarities import BooleanSimilarity

            excluded = self._scored(
                nb,
                {t: 0.0 for t in exclude_terms},
                kernel=BooleanSimilarity().kernel(
                    self.stats["avgdl"], dtype=self._dtype
                ),
            ).select("doc_id").distinct()
            agg = agg.join(excluded, "doc_id", "left_anti")
        for fr in exclude_exp_frames:
            # distributed prohibited-clause doc sets (literal-cap overflow)
            agg = agg.join(fr, "doc_id", "left_anti")
        for ph in pq.must_not_phrases:
            if any(t not in found for t in ph):
                continue  # phrase cannot match any doc -> excludes nothing
            agg = agg.join(
                self._phrase_frame(
                    ph,
                    idf_by_term,
                    slop=int(pq.slops.get(phrase_label(ph), 0)),
                    lucene_sloppy=self._sloppy_lucene,
                ).select("doc_id"),
                "doc_id",
                "left_anti",
            )

        if filter_docset is not None:
            agg = agg.join(filter_docset, "doc_id", "left_semi")
        if _docset == "scored":
            return agg.select(
                "doc_id", F.col("_s").cast(self._sql_t).alias("score")
            )
        if _docset:
            return agg.select("doc_id")
        return self._finalize(
            self._apply_funcs(
                agg.select(
                    "doc_id", F.col("_s").cast(self._sql_t).alias("score")
                ),
                bf,
                boost,
            ),
            k,
            with_url,
            start=start,
        )

    def docset(self, query: str | ParsedQuery) -> DataFrame:
        """Full matching DocSet (search/BitDocSet.java / fq DocSet analog):
        EVERY matching doc_id, no top-k, no scores, no two-phase fetch —
        the input SimpleFacets-style components aggregate over.  Same
        boolean/expansion/deletion semantics as search(); theta pruning is
        forced off (it is a top-k bound, unsound for a full DocSet)."""
        return self.search(query, prune=False, _docset=True).select("doc_id")

    def scored_docset(
        self, query, fq: list | None = None
    ) -> DataFrame:
        """Every matching (doc_id, score) — the full scored result set the
        CollapsingQParserPlugin collector sees (it needs scores for ALL
        matches to pick each group's best, not just the global top-k).
        Theta pruning forced off for the same reason as :meth:`docset`."""
        return self.search(query, prune=False, fq=fq, _docset="scored")

    def collapsed_search(
        self,
        query,
        by: str,
        k: int = 10,
        null_policy: str = "ignore",
        order_by=None,
        fq: list | None = None,
    ) -> DataFrame:
        """CollapsingQParserPlugin as USED in the reference — an fq
        postfilter over the main query (search/CollapsingQParserPlugin.java
        :121): score every match, keep the single best doc per group, THEN
        take the top k.  (Collapsing after top-k would be wrong: a group's
        head can sit below the global k-th score.)

        ``by`` is a SQL expression over the docs-table columns (a column
        name, or e.g. ``parse_url(url, 'HOST')`` — the reference collapses
        on a docValues field; our group key is any derivable column).
        ``order_by`` overrides the per-group head choice (default: highest
        score, ties to lowest doc_id — the reference's default
        max(score)); pass e.g. ``[F.col("doclen").desc()]`` for the
        ``max=field`` variant.  ``null_policy`` is the reference's
        nullPolicy (ignore / expand / collapse)."""
        from apache___solr_spark.operators.streams import collapse as _collapse

        sd = self.scored_docset(query, fq=fq)
        full = sd.join(self.docs, "doc_id").withColumn("_grp", F.expr(by))
        order = (
            list(order_by)
            if order_by is not None
            else [F.col("score").desc(), F.col("doc_id").asc()]
        )
        best = _collapse(full, "_grp", order, null_policy)
        return self._finalize(best.select("doc_id", "score"), k, with_url=True)

    def sorted_search(
        self,
        query,
        sort: str,
        k: int = 10,
        start: int = 0,
        fq: list | None = None,
    ) -> DataFrame:
        """The ``sort`` request param (SortSpecParsing.java lowering to a
        TopFieldCollector instead of TopScoreDocCollector): rank the FULL
        matching docset by the sort spec instead of relevance.

        Spec grammar: comma-separated ``<key> <asc|desc>`` where key is
        ``score``, a docs-table column (``doclen``, ``url``, ...), or a
        function query (FunctionQParser syntax, e.g.
        ``recip(doclen,1,1000,1)``) over docs columns — the reference's
        three sortable kinds.  Final tiebreak = doc_id asc (Lucene's
        internal-docid tiebreak).  ``score`` stays in the output (the
        reference returns it under field sort whenever fl asks).

        Scale shape: the sort+limit compiles to TakeOrderedAndProject
        (per-partition top-(start+k) then driver merge), never a full
        sort."""
        sd = self.scored_docset(query, fq=fq)
        full = sd.join(self.docs, "doc_id")
        # split sort keys on commas OUTSIDE parens (function queries carry
        # their own commas: "recip(doclen,1,1000,1) desc, score desc")
        parts: list[str] = []
        depth, cur = 0, []
        for ch in str(sort):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        order = []
        for part in parts:
            toks = part.strip().split()
            if not toks:
                continue
            key = toks[0]
            direction = (
                toks[1].lower()
                if len(toks) > 1
                else ("desc" if key == "score" else "asc")
            )
            if key == "score":
                col = F.col("score")
            elif key in full.columns:
                col = F.col(key)
            else:
                from apache___solr_spark.functions.registry import (
                    parse_func_query,
                )

                col = parse_func_query(key)
            order.append(col.desc() if direction == "desc" else col.asc())
        order.append(F.col("doc_id").asc())
        rows = (
            full.orderBy(*order)
            .limit(int(start) + int(k))
            .select("doc_id", "url", "score")
            .collect()
        )[int(start):]
        schema = f"rank int, doc_id long, url string, score {self._sql_t}"
        out = [
            {
                "rank": int(start) + i + 1,
                "doc_id": r["doc_id"],
                "url": r["url"],
                "score": r["score"],
            }
            for i, r in enumerate(rows)
        ]
        if not out:
            return self.spark.createDataFrame([], schema)
        return self.spark.createDataFrame(out, schema)

    def explain_scores(self, query: str | ParsedQuery, k: int = 10) -> DataFrame:
        """debugQuery=true explain analog (response debug component,
        Lucene Explanation tree): per-(doc, term) score contributions for
        the top-k hits of a FLAT term/boolean query, flattened to rows

            (rank, doc_id, term, weight, boost, contribution, score)

        where sum(contribution) over a doc's rows equals its score (float
        tolerance).  Dictionary-expanded clauses (prefix/wildcard/fuzzy/
        range) are explained per matched term.  A phrase clause is one row
        — term = the phrase label, contribution = its PhraseQuery-style
        score, weight = the summed constituent-term weights (the idf sum
        Lucene reports in its phrase Explanation); MUST_NOT phrases only
        exclude and so contribute no rows.  Nested-tree queries raise —
        a nested disjunction's contribution is not clause-separable in
        this flattened shape (honest subset; the reference emits a nested
        Explanation tree there)."""
        if isinstance(query, str):
            try:
                pq = lower_tree(
                    parse_query_tree(query, analyze_fn=self._analyze)
                )
            except NotFlatQuery as exc:
                raise NotImplementedError(
                    "explain_scores covers flat term/boolean/phrase "
                    "queries; use explain_scores_tree for nested boolean "
                    f"structure: {exc}"
                ) from exc
        else:
            pq = query
        hits = self.search(pq, k=k).select("rank", "doc_id", "score")
        doc_ids = [int(r["doc_id"]) for r in hits.collect()]
        empty = (
            "rank int, doc_id long, clause string, term string, "
            f"weight double, boost double, contribution {self._sql_t}, "
            f"score {self._sql_t}"
        )
        if not doc_ids:
            return self.spark.createDataFrame([], empty)
        if self.synonyms:
            pq = _apply_synonyms(pq, self.synonyms)
        # same clause resolution as the flat search path: each scoring term
        # and each expanded SHOULD/MUST group is its OWN clause — a term
        # matched both directly and via a wildcard group contributes twice,
        # exactly as search() scores it
        clauses: list[tuple[str, list[str], float]] = []
        for t in pq.scoring_terms:
            clauses.append((t, [t], float(pq.boosts.get(t, 1.0))))
        for cl in pq.expand:
            if cl.occur == "MUST_NOT":
                continue
            matched = self._expand_clause(cl)
            if matched:
                clauses.append((cl.label, matched, float(cl.boost)))
        phrase_terms = {t for ph in pq.scoring_phrases for t in ph}
        all_terms = sorted(
            {t for _, ts, _ in clauses for t in ts} | phrase_terms
        )
        if not all_terms:
            return self.spark.createDataFrame([], empty)
        meta = self._term_meta(all_terms)
        weights = self._weights(meta)
        found = set(meta["term"])
        salts = sorted({d // self.cfg.salt_range for d in doc_ids})
        parts = []
        winfo_rows = []
        for label, ts, boost in clauses:
            ts = [t for t in ts if t in found]
            if not ts:
                continue
            blocks = self._blocks_for(ts).filter(F.col("salt").isin(salts))
            scored = self._scored(
                blocks,
                weights,
                {t: boost for t in ts} if boost != 1.0 else None,
            ).filter(F.col("doc_id").isin(doc_ids))
            parts.append(scored.withColumn("clause", F.lit(label)))
            winfo_rows.extend(
                # composite weights (e.g. IB-H3's (lambda, p)) surface
                # their primary statistic
                (
                    label,
                    t,
                    float(
                        weights[t][0]
                        if isinstance(weights[t], tuple)
                        else weights[t]
                    ),
                    boost,
                )
                for t in ts
            )

        def _primary(w) -> float:
            return float(w[0] if isinstance(w, tuple) else w)

        # phrase clauses: one row each — exactly the per-phrase frame
        # search() sums (term = phrase label), scoped to the hit docs
        for ph in pq.scoring_phrases:
            if any(t not in found for t in ph):
                continue
            label = phrase_label(ph)
            pboost = float(pq.boosts.get(label, 1.0))
            pf = self._phrase_frame(
                ph,
                weights,
                boost=pboost,
                slop=int(pq.slops.get(label, 0)),
                salts=salts,
                lucene_sloppy=self._sloppy_lucene,
            ).filter(F.col("doc_id").isin(doc_ids))
            parts.append(
                pf.select(
                    F.lit(label).alias("term"), "doc_id", "score"
                ).withColumn("clause", F.lit(label))
            )
            winfo_rows.append(
                (
                    label,
                    label,
                    sum(_primary(weights[t]) for t in set(ph)),
                    pboost,
                )
            )
        if not parts:
            return self.spark.createDataFrame([], empty)
        scored_all = parts[0]
        for p in parts[1:]:
            scored_all = scored_all.unionByName(p)
        winfo = self.spark.createDataFrame(
            winfo_rows, "clause string, term string, weight double, boost double"
        )
        return (
            hits.join(
                scored_all.withColumnRenamed("score", "contribution"),
                "doc_id",
            )
            .join(F.broadcast(winfo), ["clause", "term"])
            .select(
                "rank", "doc_id", "clause", "term", "weight", "boost",
                "contribution", "score",
            )
            .orderBy("rank", "clause", "term")
        )

    def explain_scores_tree(
        self, query: str | BoolQuery, k: int = 10
    ) -> DataFrame:
        """debugQuery explain for ARBITRARY nested boolean queries — the
        tabular encoding of Lucene's nested Explanation tree (the shape the
        reference emits for `(a AND b) OR (c AND d)^2`; response debug
        component, Explanation#toString indentation == our ``path``).

        One row per (hit doc, matching node instance):

            (rank, doc_id, path, occur, kind, clause, weight, boost,
             contribution, score)

        ``path`` is the dotted child-index position of the node in the tree
        ("" = root, "0.2" = third child of the first child); ``kind`` is
        bool|term|phrase|prefix|wildcard|fuzzy|range|group|synonym.  A bool
        row's contribution is its subtree score (after its own boost) times
        every ancestor boost; a leaf row's contribution is the leaf score
        times every ancestor boost.  Invariants (tested): per doc, the root
        row's contribution equals the reported score, and the sum of LEAF
        contributions equals it too (float tolerance).  Nodes that did not
        match a doc (a failed AND group inside an OR) emit no rows for it —
        exactly Lucene's "no match on required clause" pruning of the
        Explanation tree.

        Scale shape: one _search_tree top-k, then every leaf frame is salt-
        pruned to the k hit docs before decode and all leaves union into a
        single collect of at most k rows per leaf; the recursive boolean
        gating runs driver-side over those <= k·|leaves| rows (explain is a
        k-docs debug tool in the reference too — DebugComponent explains
        each returned doc individually)."""
        if isinstance(query, str):
            tree = parse_query_tree(query, analyze_fn=self._analyze)
        else:
            tree = query
        empty = (
            "rank int, doc_id long, path string, occur string, kind string,"
            " clause string, weight double, boost double,"
            f" contribution double, score {self._sql_t}"
        )
        hits = self._search_tree(tree, k=k, with_url=False).select(
            "rank", "doc_id", "score"
        ).collect()
        if not hits:
            return self.spark.createDataFrame([], empty)
        doc_ids = [int(r["doc_id"]) for r in hits]
        rank_by_doc = {int(r["doc_id"]): int(r["rank"]) for r in hits}
        score_by_doc = {int(r["doc_id"]): float(r["score"]) for r in hits}
        if self.synonyms:
            tree = self._apply_synonyms_tree(tree)

        # resolve expansions + one dictionary lookup for every leaf term
        # (mirrors _search_tree's walk, including the MUST_NOT no-cap rule)
        resolved: dict[int, list[str]] = {}
        leaf_terms: set[str] = set()

        def walk(node, occur: str) -> None:
            if isinstance(node, TermNode):
                leaf_terms.add(node.term)
            elif isinstance(node, PhraseNode):
                leaf_terms.update(node.toks)
            elif isinstance(node, Clause):
                # a clause under ANY negated ancestor is effectively
                # prohibited: uncapped expansion (cap is perf-only, and
                # capping a prohibited clause silently under-excludes)
                cap = None if occur == "MUST_NOT" else 128
                resolved[id(node)] = self._expand_clause(
                    node, max_expansions=cap
                )
                if resolved[id(node)] is not None:
                    leaf_terms.update(resolved[id(node)])
            else:
                for c in node.children:
                    walk(
                        c.node,
                        "MUST_NOT" if occur == "MUST_NOT" else c.occur,
                    )

        walk(tree, "SHOULD")
        meta = self._term_meta(sorted(leaf_terms))
        found = set(meta["term"])
        weights = self._weights(meta)
        salts = sorted({d // self.cfg.salt_range for d in doc_ids})

        def _primary(w) -> float:
            return float(w[0] if isinstance(w, tuple) else w)

        # build one (path, doc_id, score) frame per matchable leaf, union,
        # single collect — every frame is salt- and hit-doc-pruned
        leaf_frames: list[DataFrame] = []
        # path -> (occur, kind, clause_label, weight, boost, matchable)
        node_info: dict[str, tuple] = {}

        def blocks_of(terms: list[str]) -> DataFrame:
            return self._blocks_for(terms).filter(F.col("salt").isin(salts))

        def _tag(fr: DataFrame, path: str) -> DataFrame:
            return fr.filter(F.col("doc_id").isin(doc_ids)).select(
                F.lit(path).alias("path"),
                "doc_id",
                F.col("score").cast("double").alias("score"),
            )

        def render(node) -> str:
            if isinstance(node, TermNode):
                return node.term + (
                    f"^{node.boost:g}" if node.boost != 1.0 else ""
                )
            if isinstance(node, PhraseNode):
                return node.label
            if isinstance(node, Clause):
                return node.label
            inner = []
            for c in node.children:
                pre = {"MUST": "+", "MUST_NOT": "-", "SHOULD": ""}[c.occur]
                inner.append(pre + render(c.node))
            s = "(" + " ".join(inner) + ")"
            return s + (f"^{node.boost:g}" if node.boost != 1.0 else "")

        def prepare(node, path: str, occur: str) -> None:
            if isinstance(node, TermNode):
                ok = node.term in found
                node_info[path] = (
                    occur, "term", render(node),
                    _primary(weights[node.term]) if ok else 0.0,
                    float(node.boost), ok,
                )
                if ok:
                    boosts = (
                        {node.term: float(node.boost)}
                        if node.boost != 1.0
                        else None
                    )
                    leaf_frames.append(
                        _tag(
                            self._scored(
                                blocks_of([node.term]), weights, boosts
                            ),
                            path,
                        )
                    )
            elif isinstance(node, PhraseNode):
                ok = all(t in found for t in node.toks)
                node_info[path] = (
                    occur, "phrase", node.label,
                    sum(_primary(weights[t]) for t in set(node.toks))
                    if ok
                    else 0.0,
                    float(node.boost), ok,
                )
                if ok:
                    leaf_frames.append(
                        _tag(
                            self._phrase_frame(
                                node.toks,
                                weights,
                                boost=float(node.boost),
                                slop=int(node.slop),
                                salts=salts,
                                lucene_sloppy=self._sloppy_lucene
                                and not node.window,
                            ),
                            path,
                        )
                    )
            elif isinstance(node, Clause):
                if resolved[id(node)] is None:
                    # literal-cap overflow (prohibited clause): constant-
                    # score rewrite reports no per-term weight; the frame
                    # is the distributed doc set restricted to the k docs
                    node_info[path] = (
                        occur, node.kind, node.label, 0.0,
                        float(node.boost), True,
                    )
                    leaf_frames.append(
                        _tag(
                            self._excluded_docs_df(
                                node, salts=salts
                            ).withColumn(
                                "score", F.lit(0.0).cast(self._sql_t)
                            ),
                            path,
                        )
                    )
                    return
                matched = [t for t in resolved[id(node)] if t in found]
                node_info[path] = (
                    occur, node.kind, node.label,
                    sum(_primary(weights[t]) for t in matched),
                    float(node.boost), bool(matched),
                )
                if matched:
                    g = self._scored(
                        blocks_of(matched),
                        weights,
                        {t: float(node.boost) for t in matched},
                    )
                    leaf_frames.append(
                        _tag(
                            g.groupBy("doc_id").agg(
                                F.sum("score").alias("score")
                            ),
                            path,
                        )
                    )
            else:
                node_info[path] = (
                    occur, "bool", render(node), None, float(node.boost),
                    True,
                )
                for i, c in enumerate(node.children):
                    prepare(c.node, f"{path}.{i}" if path else str(i), c.occur)

        prepare(tree, "", "SHOULD")
        leaf_scores: dict[str, dict[int, float]] = {}
        if leaf_frames:
            u = leaf_frames[0]
            for fr in leaf_frames[1:]:
                u = u.unionByName(fr)
            for row in u.collect():
                leaf_scores.setdefault(row["path"], {})[
                    int(row["doc_id"])
                ] = float(row["score"])

        # driver-side boolean gating over the k hit docs — same semantics
        # as _search_tree.ev (MUST all present, >=1 positive, mm, MUST_NOT)
        ev_cache: dict[str, dict[int, float] | None] = {}

        def ev(node, path: str) -> dict[int, float] | None:
            if path in ev_cache:
                return ev_cache[path]
            if not isinstance(node, BoolQuery):
                ok = node_info[path][5]
                res = leaf_scores.get(path, {}) if ok else None
            else:
                pos: list[tuple[dict[int, float], bool]] = []
                nots: list[dict[int, float]] = []
                n_must = 0
                res = {}
                dead = False
                for i, c in enumerate(node.children):
                    cpath = f"{path}.{i}" if path else str(i)
                    fr = ev(c.node, cpath)
                    if c.occur == "MUST_NOT":
                        if fr is not None:
                            nots.append(fr)
                        continue
                    if c.occur == "MUST":
                        if fr is None:
                            dead = True
                            break
                        n_must += 1
                        pos.append((fr, True))
                    elif fr is not None:
                        pos.append((fr, False))
                if dead or not pos:
                    res = None
                else:
                    mm = getattr(node, "mm", 0)
                    cand: set[int] = set()
                    for fr, _ in pos:
                        cand |= set(fr)
                    res = {}
                    for d in cand:
                        nm = sum(1 for fr, is_m in pos if is_m and d in fr)
                        np_ = sum(1 for fr, _ in pos if d in fr)
                        if nm < n_must:
                            continue
                        if mm and (np_ - nm) < mm:
                            continue
                        if any(d in nf for nf in nots):
                            continue
                        res[d] = (
                            sum(fr[d] for fr, _ in pos if d in fr)
                            * node.boost
                        )
                    if not res:
                        res = {} if cand else None
            ev_cache[path] = res
            return res

        ev(tree, "")
        rows_out: list[tuple] = []

        def emit(node, path: str, gate: set[int], cum_boost: float) -> None:
            sc = ev_cache.get(path)
            if not sc:
                return
            occur, kind, label, weight, boost, _ok = node_info[path]
            matched = [d for d in gate if d in sc]
            for d in matched:
                rows_out.append(
                    (
                        rank_by_doc[d], d, path, occur, kind, label,
                        weight, boost, sc[d] * cum_boost, score_by_doc[d],
                    )
                )
            if isinstance(node, BoolQuery) and matched:
                mset = set(matched)
                for i, c in enumerate(node.children):
                    if c.occur == "MUST_NOT":
                        continue
                    emit(
                        c.node,
                        f"{path}.{i}" if path else str(i),
                        mset,
                        cum_boost * node.boost,
                    )

        emit(tree, "", set(doc_ids), 1.0)
        return self.spark.createDataFrame(rows_out, empty).orderBy(
            "rank", "path"
        )

    def _apply_funcs(
        self, frame: DataFrame, bf: list | None, boost: list | None
    ) -> DataFrame:
        """Fold additive (dismax ``bf``) / multiplicative (edismax
        ``boost``) function values into the scored frame BEFORE top-k:
        final = (query_score + Σ bf_i(doc)) · Π boost_j(doc).

        Scale shape: the function columns project off the docs table and
        hash-join the (already query-pruned) scored frame on doc_id — one
        codegen'd projection plus one key join, no extra corpus pass."""
        if not bf and not boost:
            return frame
        cols = []
        if bf:
            add = bf[0]
            for c in bf[1:]:
                add = add + c
            cols.append(add.cast("double").alias("_bf"))
        if boost:
            mul = boost[0]
            for c in boost[1:]:
                mul = mul * c
            cols.append(mul.cast("double").alias("_mult"))
        vals = self.docs.select("doc_id", *cols)
        out = frame.join(vals, "doc_id", "left")
        score = F.col("score").cast("double")
        if bf:
            score = score + F.coalesce(F.col("_bf"), F.lit(0.0))
        if boost:
            score = score * F.coalesce(F.col("_mult"), F.lit(1.0))
        return out.select("doc_id", score.cast(self._sql_t).alias("score"))

    def terms_query(
        self, values: list[str], k: int = 10, with_url: bool = True
    ) -> DataFrame:
        """{!terms} (TermsQParserPlugin.java): set-membership filter over
        the indexed field — docs containing ANY of the RAW values (no
        analysis, matching the reference), constant score 1
        (ConstantScoreQuery).  The scan prunes to the values' buckets with
        the term predicate pushed down; intended for large IN lists where
        the classic grammar would be unwieldy."""
        vals = sorted({str(v) for v in values if v})
        if not vals:
            return self.spark.createDataFrame(
                [],
                "rank int, doc_id long"
                + (", url string" if with_url else "")
                + f", score {self._sql_t}",
            )
        from apache___solr_spark.query.similarities import BooleanSimilarity

        scored = self._scored(
            self._blocks_for(vals),
            {v: 1.0 for v in vals},
            kernel=BooleanSimilarity().kernel(
                self.stats["avgdl"], dtype=self._dtype
            ),
        )
        frame = scored.groupBy("doc_id").agg(
            F.lit(1.0).cast(self._sql_t).alias("score")
        )
        if self.deletes is not None:
            frame = frame.join(self.deletes, "doc_id", "left_anti")
        return self._finalize(frame, k, with_url)

    def _finalize(
        self, scored: DataFrame, k: int, with_url: bool, start: int = 0
    ) -> DataFrame:
        """Top-k + two-phase fields fetch (QueryComponent.java:1000): phase 1
        ranks on the narrow (doc_id, score) via TakeOrderedAndProject; phase 2
        fetches display fields for JUST the k winners — the isin predicate
        prunes the docs scan by parquet row-group stats instead of joining
        against the full table.

        ``start``: offset paging (the reference's start/rows params) — the
        collector depth is start+rows (SolrIndexSearcher buildTopDocs
        ``len = start + rows``), sliced driver-side like QueryComponent's
        response window.  Ranks stay GLOBAL (page 2 starts at rank
        start+1)."""
        topk_rows = (
            scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(int(start) + k)
            .collect()
        )[int(start):]
        schema = (
            "rank int, doc_id long"
            + (", url string" if with_url else "")
            + f", score {self._sql_t}"
        )
        if not topk_rows:
            return self.spark.createDataFrame([], schema)
        url_by_id: dict[int, str] = {}
        if with_url:
            ids = [r["doc_id"] for r in topk_rows]
            for r in (
                self.docs.filter(F.col("doc_id").isin(ids))
                .select("doc_id", "url")
                .collect()
            ):
                url_by_id[r["doc_id"]] = r["url"]
        out_rows = []
        for i, r in enumerate(topk_rows):
            row = {
                "rank": int(start) + i + 1,
                "doc_id": r["doc_id"],
                "score": r["score"],
            }
            if with_url:
                row["url"] = url_by_id[r["doc_id"]]
            out_rows.append(row)
        return self.spark.createDataFrame(out_rows, schema)

    def _apply_synonyms_tree(self, tree: BoolQuery) -> BoolQuery:
        """Tree-path analog of _apply_synonyms: a term with synonyms becomes
        a disjunction clause; under MUST_NOT the clause excludes every
        synonym (matching the flat path's exclusion extension).

        MULTI-WORD synonyms (SynonymGraphFilter's multi-token mappings,
        managed-schema.xml:312 — e.g. "usa" -> "united states"): the term
        rewrites to a nested bool — (group of the term + single-word
        synonyms) OR (one PhraseNode per multi-word synonym) — so the
        phrase alternative matches consecutive tokens exactly like the
        manually-written phrase disjunction; under MUST_NOT the nested
        bool's doc set (any alternative, incl. the phrase) is excluded."""
        import copy

        from apache___solr_spark.query.parser import BoolChild, PhraseNode

        tree = copy.deepcopy(tree)

        def rw(node: BoolQuery) -> None:
            for c in node.children:
                if isinstance(c.node, TermNode) and c.node.term in self.synonyms:
                    t, b = c.node.term, c.node.boost
                    phrases = [
                        s.split() for s in self.synonyms[t] if " " in s
                    ]
                    if not phrases:
                        c.node = Clause(
                            occur="", kind="synonym", value=t, boost=b
                        )
                    else:
                        singles = [
                            s for s in self.synonyms[t] if " " not in s
                        ]
                        c.node = BoolQuery(
                            children=[
                                BoolChild(
                                    "SHOULD",
                                    Clause(
                                        occur="",
                                        kind="group",
                                        terms=[t] + singles,
                                        boost=b,
                                    ),
                                ),
                                *[
                                    BoolChild(
                                        "SHOULD",
                                        PhraseNode(toks=ph, boost=b),
                                    )
                                    for ph in phrases
                                ],
                            ]
                        )
                elif isinstance(c.node, BoolQuery):
                    rw(c.node)

        rw(tree)
        return tree

    def _tree_has_multiword_synonym(self, tree) -> bool:
        """True when any term in the tree maps to a multi-word synonym —
        the flat path cannot score phrase alternatives, so search()
        routes such queries through the recursive evaluator."""

        def any_mw(node) -> bool:
            if isinstance(node, TermNode):
                return any(
                    " " in s for s in self.synonyms.get(node.term, ())
                )
            if isinstance(node, BoolQuery):
                return any(any_mw(c.node) for c in node.children)
            return False

        return any_mw(tree)

    def _ev_root_dismax(self, tree, ev, tie: float):
        """Top-level DisjunctionMax combine for ``_search_tree`` (the
        MaxScoreQParser rewrite): score = sum(MUST) + max(SHOULD) + tie *
        (sum(SHOULD) - max(SHOULD)); MUST children all required, MUST_NOT
        anti-joined, SHOULD subtrees evaluated with their own internal sum
        semantics.  Returns None when nothing can match."""
        must_frames: list[DataFrame] = []
        should_frames: list[DataFrame] = []
        not_frames: list[DataFrame] = []
        for c in tree.children:
            fr = ev(c.node)
            if c.occur == "MUST_NOT":
                if fr is not None:
                    not_frames.append(fr)
            elif c.occur == "MUST":
                if fr is None:
                    return None
                must_frames.append(fr)
            elif fr is not None:
                should_frames.append(fr)
        # the rewrite leaves ONE optional (the dismax) on the new bool;
        # mm > 1 can never be satisfied, mm == 1 makes the dismax required
        mm = getattr(tree, "mm", 0)
        if mm and (mm > 1 or not should_frames):
            return None
        parts = [
            fr.select(
                "doc_id",
                F.col("score").cast("double").alias("score"),
                F.lit(1).alias("is_must"),
            )
            for fr in must_frames
        ] + [
            fr.select(
                "doc_id",
                F.col("score").cast("double").alias("score"),
                F.lit(0).alias("is_must"),
            )
            for fr in should_frames
        ]
        if not parts:
            return None
        u = parts[0]
        for fr in parts[1:]:
            u = u.unionByName(fr)
        s_should = F.when(F.col("is_must") == 0, F.col("score"))
        dismax = F.coalesce(
            F.max(s_should)
            + F.lit(float(tie)) * (F.sum(s_should) - F.max(s_should)),
            F.lit(0.0),
        )
        agg = u.groupBy("doc_id").agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("is_must") == 1, F.col("score"))),
                    F.lit(0.0),
                )
                + dismax
            ).alias("score"),
            F.sum("is_must").alias("_nm"),
            F.count(F.lit(1)).alias("_np"),
        )
        if must_frames:
            agg = agg.filter(F.col("_nm") == len(must_frames))
        if mm:
            agg = agg.filter((F.col("_np") - F.col("_nm")) >= 1)
        agg = agg.select("doc_id", "score")
        for nf in not_frames:
            agg = agg.join(nf.select("doc_id").distinct(), "doc_id", "left_anti")
        if getattr(tree, "boost", 1.0) != 1.0:
            agg = agg.select(
                "doc_id", (F.col("score") * tree.boost).alias("score")
            )
        return agg

    def _search_tree(
        self,
        tree: BoolQuery,
        k: int = 10,
        start: int = 0,
        with_url: bool = True,
        doc_filter: list[int] | None = None,
        bf: list | None = None,
        boost: list | None = None,
        _docset: bool | str = False,
        _filter_docset: DataFrame | None = None,
        should_combine: str = "sum",
        tie: float = 0.0,
    ) -> DataFrame:
        """Recursive BooleanQuery evaluation (BooleanQuery nesting semantics,
        QueryParser.jj:135-172): each node yields a (doc_id, score) frame of
        MATCHING docs; a boolean node sums its matching positive children's
        scores, requires every MUST child, requires >=1 positive match, and
        anti-joins each MUST_NOT child.  A node whose MUST child can never
        match short-circuits to empty; a pure-negative node matches nothing
        (Lucene: a BooleanQuery with only prohibited clauses matches no
        docs).

        Scale shape: every leaf is a bucket- and term-pruned postings scan
        through the same vectorized decode as the flat path; combination is
        unions + groupBy(doc_id) (one shuffle per boolean level) + left_anti
        joins — no driver-side evaluation, no collects before top-k.  The
        flat path's theta pruning does not apply (MUST/nesting make it
        unsound); salt-level doc_filter pruning still does.
        """
        spark = self.spark
        empty_schema = (
            "rank int, doc_id long"
            + (", url string" if with_url else "")
            + f", score {self._sql_t}"
        )
        if self.synonyms:
            tree = self._apply_synonyms_tree(tree)

        # resolve expansion clauses + collect every concrete term, then one
        # dictionary lookup for all idfs
        resolved: dict[int, list[str]] = {}
        leaf_terms: set[str] = set()
        # terms scored WITHOUT a boost (TermNode boost==1 / unboosted
        # Clause members) — these share ONE postings scan + decode below
        # instead of one per leaf; boosted leaves keep the per-leaf path so
        # the float32 weight*boost rounding stays bit-identical
        shared_terms: set[str] = set()

        def walk(node, occur: str) -> None:
            if isinstance(node, TermNode):
                leaf_terms.add(node.term)
                if node.boost == 1.0:
                    shared_terms.add(node.term)
            elif isinstance(node, PhraseNode):
                leaf_terms.update(node.toks)
            elif isinstance(node, Clause):
                cap = None if occur == "MUST_NOT" else 128
                resolved[id(node)] = self._expand_clause(node, max_expansions=cap)
                if resolved[id(node)] is None:
                    return  # literal-cap overflow: distributed path in ev()
                leaf_terms.update(resolved[id(node)])
                if node.boost == 1.0:
                    shared_terms.update(resolved[id(node)])
            elif isinstance(node, BoolQuery):
                for c in node.children:
                    # negated scope propagates: clauses under a MUST_NOT
                    # ancestor expand uncapped (see the explain walker)
                    walk(
                        c.node,
                        "MUST_NOT" if occur == "MUST_NOT" else c.occur,
                    )

        walk(tree, "SHOULD")
        meta = self._term_meta(sorted(leaf_terms))
        found = set(meta["term"])
        idf_by_term = self._weights(meta)
        salts = (
            sorted({int(d) // self.cfg.salt_range for d in doc_filter})
            if doc_filter is not None
            else None
        )

        def blocks_of(terms: list[str]) -> DataFrame:
            b = self._blocks_for(terms)
            if salts is not None:
                b = b.filter(F.col("salt").isin(salts))
            return b

        # one bucket-pruned scan + vectorized decode for EVERY unboosted
        # leaf term in the tree; leaves slice it by term predicate.  persist
        # keeps the decode single-pass when several leaves (plan branches)
        # read it; unpersisted after _finalize materializes the top-k.
        shared_terms &= found
        shared: DataFrame | None = None
        if len(shared_terms) > 1:
            shared = self._scored(
                blocks_of(sorted(shared_terms)), idf_by_term
            ).persist()

        def ev(node) -> DataFrame | None:
            """(doc_id, score) of matching docs; None == matches nothing."""
            if isinstance(node, TermNode):
                if node.term not in found:
                    return None
                if shared is not None and node.boost == 1.0:
                    return shared.filter(F.col("term") == node.term).select(
                        "doc_id", "score"
                    )
                return self._scored(
                    blocks_of([node.term]),
                    idf_by_term,
                    {node.term: float(node.boost)},
                ).select("doc_id", "score")
            if isinstance(node, PhraseNode):
                if not self.sim.supports_phrases:
                    raise NotImplementedError(
                        f"similarity {self.sim.name!r} scores term queries "
                        "only; phrase clauses need BM25"
                    )
                if any(t not in found for t in node.toks):
                    return None
                return self._phrase_frame(
                    node.toks,
                    idf_by_term,
                    boost=node.boost,
                    slop=node.slop,
                    salts=salts,
                    lucene_sloppy=self._sloppy_lucene and not node.window,
                )
            if isinstance(node, Clause):
                if resolved[id(node)] is None:
                    # literal-cap overflow: only reachable under a MUST_NOT
                    # ancestor (positive clauses cap at 128) — the parent
                    # anti-joins this frame, so a constant score suffices
                    return self._excluded_docs_df(node, salts=salts).select(
                        "doc_id",
                        F.lit(0.0).cast(self._sql_t).alias("score"),
                    )
                matched = [t for t in resolved[id(node)] if t in found]
                if not matched:
                    return None
                if shared is not None and node.boost == 1.0:
                    g = shared.filter(F.col("term").isin(matched))
                else:
                    g = self._scored(
                        blocks_of(matched),
                        idf_by_term,
                        {t: float(node.boost) for t in matched},
                    )
                # accumulate in double; the final cast to the configured
                # score dtype happens once, just before top-k (mirrors the
                # oracle's f64 accumulation + single final rounding)
                return g.groupBy("doc_id").agg(F.sum("score").alias("score"))
            # BoolQuery
            pos_frames: list[DataFrame] = []
            not_frames: list[DataFrame] = []
            n_must = 0
            for c in node.children:
                fr = ev(c.node)
                if c.occur == "MUST_NOT":
                    if fr is not None:
                        not_frames.append(fr)
                    continue
                if c.occur == "MUST":
                    if fr is None:
                        return None  # a required child can never match
                    n_must += 1
                    pos_frames.append(
                        fr.select(
                            "doc_id",
                            F.col("score").cast("double").alias("score"),
                            F.lit(1).alias("is_must"),
                        )
                    )
                elif fr is not None:
                    pos_frames.append(
                        fr.select(
                            "doc_id",
                            F.col("score").cast("double").alias("score"),
                            F.lit(0).alias("is_must"),
                        )
                    )
            if not pos_frames:
                return None  # pure-negative / all-absent
            mm = getattr(node, "mm", 0)
            if mm:
                # minimumNumberShouldMatch: no doc can reach mm when fewer
                # matchable SHOULD children exist (Lucene matches nothing)
                n_should_matchable = len(pos_frames) - n_must
                if mm > n_should_matchable:
                    return None
            u = pos_frames[0]
            for fr in pos_frames[1:]:
                u = u.unionByName(fr)
            agg = u.groupBy("doc_id").agg(
                F.sum("score").alias("score"),
                F.sum("is_must").alias("_nm"),
                F.count(F.lit(1)).alias("_np"),
            )
            if n_must:
                agg = agg.filter(F.col("_nm") == n_must)
            if mm:
                # matched SHOULD children = positive rows minus MUST rows
                agg = agg.filter((F.col("_np") - F.col("_nm")) >= mm)
            agg = agg.select("doc_id", "score")
            for nf in not_frames:
                agg = agg.join(nf.select("doc_id").distinct(), "doc_id", "left_anti")
            if node.boost != 1.0:
                agg = agg.select(
                    "doc_id", (F.col("score") * node.boost).alias("score")
                )
            return agg

        if should_combine == "max" and isinstance(tree, BoolQuery):
            # {!maxscore tie=}: MaxScoreQParser.java rewrites only the TOP
            # BooleanQuery — its SHOULD clauses (arbitrary subtrees, each
            # keeping normal sum semantics internally) regroup into one
            # DisjunctionMaxQuery(tie); MUST/MUST_NOT pass through.
            res = self._ev_root_dismax(tree, ev, tie)
        elif should_combine == "max":
            res = ev(tree)  # single non-bool node: dismax of one == itself
        elif should_combine != "sum":
            raise ValueError(f"unknown should_combine {should_combine!r}")
        else:
            res = ev(tree)
        if res is None:
            if shared is not None:
                shared.unpersist()
            return spark.createDataFrame([], empty_schema)
        if doc_filter is not None:
            res = res.filter(F.col("doc_id").isin([int(d) for d in doc_filter]))
        if self.deletes is not None:
            res = res.join(self.deletes, "doc_id", "left_anti")
        if _filter_docset is not None:
            # fq DocSet intersection: constant-score, applied before top-k
            res = res.join(_filter_docset, "doc_id", "left_semi")
        if _docset == "scored":
            return res.select(
                "doc_id", F.col("score").cast(self._sql_t).alias("score")
            )
        if _docset:
            # NB: shared stays persisted only within this plan; Spark frees
            # it with the session — acceptable for the docset path, whose
            # caller aggregates immediately
            return res.select("doc_id")
        res = res.select("doc_id", F.col("score").cast(self._sql_t).alias("score"))
        out = self._finalize(
            self._apply_funcs(res, bf, boost), k, with_url, start=start
        )
        if shared is not None:
            shared.unpersist()  # _finalize materialized the top-k
        return out
