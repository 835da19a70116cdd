"""SmallFloat-style 1-byte doc-length quantization.

Reproduces the published semantics of Lucene's ``SmallFloat.intToByte4`` /
``byte4ToInt`` (order-preserving 4-significant-bit encoding of non-negative
ints into one byte).  Solr exposes the decode side as a 256-entry table in
solr/modules/ltr/src/java/org/apache/solr/ltr/feature/FieldLengthFeature.java:74-88;
Lucene's BM25Similarity precomputes a per-byte length cache the same way.

Implementation is from the published algorithm description (subnormal values
0..7 stored verbatim; otherwise 3 mantissa bits with implicit leading 1 plus
a shift), written fresh in Python/numpy.
"""

from __future__ import annotations

import numpy as np


def int_to_byte4(i: int) -> int:
    """Quantize a non-negative int to one byte, keeping 4 significant bits."""
    if i < 0:
        raise ValueError("only non-negative values supported")
    if i < 8:  # subnormal: stored verbatim, shift code 0
        return i
    num_bits = i.bit_length()
    shift = num_bits - 4
    mantissa = (i >> shift) & 0x07  # drop the implicit leading 1
    return mantissa | ((shift + 1) << 3)


def byte4_to_int(b: int) -> int:
    """Decode a byte produced by :func:`int_to_byte4` (lossy inverse)."""
    bits = b & 0x07
    shift = (b >> 3) - 1
    if shift == -1:  # subnormal
        return bits
    return (bits | 0x08) << shift


# 256-entry decode table (FieldLengthFeature.java:74-88 semantics).
NORM_TABLE: np.ndarray = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

_ENCODE_BOUNDARIES: np.ndarray = NORM_TABLE  # monotonically non-decreasing


def int_to_byte4_np(values: np.ndarray) -> np.ndarray:
    """Vectorized :func:`int_to_byte4` for int64 arrays (doc lengths)."""
    v = np.asarray(values, dtype=np.int64)
    if (v < 0).any():
        raise ValueError("only non-negative values supported")
    # NORM_TABLE is sorted ascending; the encoder rounds DOWN to the nearest
    # representable value, so the code for x is the last index with table<=x.
    codes = np.searchsorted(_ENCODE_BOUNDARIES, v, side="right") - 1
    return codes.astype(np.uint8)


def decode_norms(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized decode of quantized doc lengths (uint8 -> int64)."""
    return NORM_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]
