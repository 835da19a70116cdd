"""Min-hash analysis chain — ``analyzer="min_hash"``.

The reference's min-hash field type (sample schema in the Solr ref
guide's dedupe docs; filter at lucene/analysis/common/src/java/org/
apache/lucene/analysis/minhash/MinHashFilter.java with the
MinHashFilterFactory defaults hashCount=1, bucketCount=512,
hashSetSize=1, withRotation=true): 5-word shingles are hashed once,
the 64-bit hash space is split into 512 equal buckets, the MINIMUM
hash per bucket is kept, and empty buckets are filled by rotation
from the next non-empty bucket — so every document with at least one
shingle emits a fixed-size 512-token signature.  The expected overlap
between two signatures equals the Jaccard similarity of the underlying
shingle sets, which is what the ``{!min_hash}`` parser's score
estimates (MinHashQParser.java).

The token text is ``<bucket:3 hex><minhash:16 hex>`` — bucket-prefixed
so the 512 signature positions stay distinct terms even when rotation
copies one hash value into several buckets.  Index chain == query
chain (the estimate is only meaningful when both sides hash
identically), and the whole chain is deterministic pure Python so it
runs unchanged in the build's analysis UDF and at query time.
"""

from __future__ import annotations

import hashlib

from apache___solr_spark.analysis.chain import simple_analyze

import numpy as np

BUCKETS = 512
SHINGLE_WORDS = 5

_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)  # no-value sentinel (max hash)
# position-dependent odd multipliers for the polynomial shingle hash
_MULT = np.uint64(0x9E3779B185EBCA87)
_POWS = np.empty(SHINGLE_WORDS, dtype=np.uint64)
_POWS[-1] = np.uint64(1)
for _i in range(SHINGLE_WORDS - 2, -1, -1):
    with np.errstate(over="ignore"):
        _POWS[_i] = _POWS[_i + 1] * _MULT
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)  # splitmix64 finalizer constants
_MIX2 = np.uint64(0x94D049BB133111EB)

# per-executor word-hash memo: web vocabulary is heavy-tailed, so across
# an Arrow batch (and a task's many batches) most words repeat — hashing
# each DISTINCT word once makes the C-hash count ~vocab-sized instead of
# ~token-sized.  Bounded so a pathological vocabulary can't grow it.
_WORD_CACHE: dict[str, int] = {}
_WORD_CACHE_MAX = 1 << 20


def _hash64(s: str) -> int:
    h = _WORD_CACHE.get(s)
    if h is None:
        h = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
        )
        if len(_WORD_CACHE) >= _WORD_CACHE_MAX:
            _WORD_CACHE.clear()
        _WORD_CACHE[s] = h
    return h


def minhash_analyze(text: str | None, max_token_len: int = 255) -> list[str]:
    """Text -> fixed-size min-hash signature (<= BUCKETS tokens).

    Texts with fewer than SHINGLE_WORDS words yield no shingles and no
    tokens (ShingleFilter minShingleSize=maxShingleSize=5 without
    unigram output emits nothing) — such docs are unreachable through
    {!min_hash}, like the reference.

    The shingle hash is VECTORIZED (the 100 TB lesson from the dedup
    pipeline's round-2 review, applied here from the start): each
    distinct WORD hashes once through C-speed blake2b (memoized across
    docs), then every shingle's 64-bit hash is one numpy polynomial
    combination of its word hashes plus a splitmix64-style finalizer —
    no per-shingle Python loop, no per-shingle string join.
    """
    words = simple_analyze(text, max_token_len=max_token_len)
    n_sh = len(words) - SHINGLE_WORDS + 1
    if n_sh < 1:
        return []
    wh = np.fromiter(
        (_hash64(w) for w in words), dtype=np.uint64, count=len(words)
    )
    with np.errstate(over="ignore"):
        sh = np.zeros(n_sh, dtype=np.uint64)
        for j in range(SHINGLE_WORDS):
            sh += wh[j : j + n_sh] * _POWS[j]
        # splitmix64 finalizer: the plain polynomial is too linear for
        # uniform bucket occupancy
        sh ^= sh >> np.uint64(30)
        sh *= _MIX1
        sh ^= sh >> np.uint64(27)
        sh *= _MIX2
        sh ^= sh >> np.uint64(31)
    buckets = (sh >> np.uint64(64 - BUCKETS.bit_length() + 1)).astype(
        np.int64
    )
    mins = np.full(BUCKETS, _EMPTY, dtype=np.uint64)
    np.minimum.at(mins, buckets, sh)
    # withRotation: an empty bucket takes the next non-empty bucket's
    # value (circular forward scan), giving every doc the full
    # fixed-size signature the Jaccard estimate divides by
    empty = mins == _EMPTY
    if empty.any():
        nxt: int | None = None
        vals = mins.tolist()
        emp = empty.tolist()
        for i in range(2 * BUCKETS - 1, -1, -1):
            j = i % BUCKETS
            if not emp[j]:
                nxt = vals[j]
            elif nxt is not None:
                vals[j] = nxt
        mins = np.asarray(vals, dtype=np.uint64)
    return [f"{b:03x}{int(v):016x}" for b, v in enumerate(mins)]


def compute_band_size(num_hash: int, sim: float, tp: float) -> int:
    """LSH band size for a target true-positive rate
    (MinHashQParser.java computeBandSize — the standard banding bound
    1-(1-sim^rows)^bands from Mining of Massive Datasets ch.3): the
    fewest bands (widest rows-per-band, the most selective gate) whose
    probability of matching a truly sim-similar doc still exceeds tp."""
    for bands in range(1, num_hash + 1):
        rows = num_hash // bands
        if 1.0 - (1.0 - sim**rows) ** bands > tp:
            return rows
    return 1
