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

BUCKETS = 512
SHINGLE_WORDS = 5


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


def minhash_analyze(text: str | None, max_token_len: int = 255) -> list[str]:
    """Text -> fixed-size min-hash signature (<= BUCKETS tokens).

    Texts with fewer than SHINGLE_WORDS words yield no shingles and no
    tokens (ShingleFilter minShingleSize=maxShingleSize=5 without
    unigram output emits nothing) — such docs are unreachable through
    {!min_hash}, like the reference.
    """
    words = simple_analyze(text, max_token_len=max_token_len)
    if len(words) < SHINGLE_WORDS:
        return []
    mins: list[int | None] = [None] * BUCKETS
    seen: set[str] = set()
    for i in range(len(words) - SHINGLE_WORDS + 1):
        s = " ".join(words[i : i + SHINGLE_WORDS])
        if s in seen:
            continue
        seen.add(s)
        h = _hash64(s)
        b = (h * BUCKETS) >> 64
        if mins[b] is None or h < mins[b]:
            mins[b] = h
    # withRotation: an empty bucket takes the next non-empty bucket's
    # value (circular forward scan), giving every doc the full
    # fixed-size signature the Jaccard estimate divides by
    filled = list(mins)
    nxt: int | None = None
    for i in range(2 * BUCKETS - 1, -1, -1):
        j = i % BUCKETS
        if mins[j] is not None:
            nxt = mins[j]
        elif nxt is not None:
            filled[j] = nxt
    return [f"{b:03x}{v:016x}" for b, v in enumerate(filled)]


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
