"""Delimited-payload analysis — ``analyzer="whitespace_payload"``.

The reference's payload pipeline (lucene/analysis/common/src/java/org/
apache/lucene/analysis/payloads/DelimitedPayloadTokenFilter.java with
FloatEncoder; Solr wires it as WhitespaceTokenizer +
DelimitedPayloadTokenFilter in the payload fieldtypes the
{!payload_score}/{!payload_check} parsers query): each whitespace
token may carry ``term|payload``; the term part is indexed, the float
payload rides along at the token's position.

Here the TERM chain (:func:`payload_analyze`) is a normal analyzer —
whitespace split, strip the payload suffix, lowercase — so the whole
existing index pipeline (doclen, norms, positions, BM25) works
unchanged; the PAYLOAD chain (:func:`payload_values`) returns the
position-aligned float array, which the builder writes as a per-doc
side table (index/builder.py write_payloads).  Positions already index
the post-analysis token stream, so ``payloads[position]`` recovers any
occurrence's payload at query time — no postings-format change.

Index chain == query chain, and both are deterministic pure Python.
"""

from __future__ import annotations

import numpy as np

DELIMITER = "|"


def _split(text: str | None) -> list[tuple[str, float]]:
    # a token WITHOUT a payload carries NaN, not 0.0 — Lucene stores a
    # null payload there and PayloadScoreQuery.collectLeaf skips such
    # positions entirely (payloadsSeen not incremented), which only a
    # sentinel distinguishable from a real 0.0 payload can reproduce
    out: list[tuple[str, float]] = []
    for raw in (text or "").split():
        term, _, pay = raw.partition(DELIMITER)
        if not term:
            continue
        try:
            val = float(pay) if pay else float("nan")
        except ValueError:
            val = float("nan")  # FloatEncoder on garbage: no payload
        out.append((term.lower(), val))
    return out


def payload_analyze(text: str | None, max_token_len: int = 255) -> list[str]:
    """The term side of the chain: whitespace tokens, payload stripped,
    lowercased (positions in the index refer to THIS stream)."""
    return [t[:max_token_len] for t, _ in _split(text)]


def payload_values(text: str | None) -> np.ndarray:
    """The payload side: float32 per token position (0.0 = no payload),
    aligned 1:1 with :func:`payload_analyze`'s output."""
    return np.asarray([v for _, v in _split(text)], dtype=np.float32)


def encode_payloads(vals: np.ndarray) -> np.ndarray:
    """float32 payloads -> uint32 bit patterns (vbyte-friendly ints;
    exact round-trip, like Lucene's 4-byte float payload bytes)."""
    return np.ascontiguousarray(vals, dtype=np.float32).view(np.uint32)


def decode_payloads(bits: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(bits, dtype=np.uint32).view(np.float32)
