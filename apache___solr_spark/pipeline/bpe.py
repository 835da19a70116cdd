"""Byte-level BPE tokenizer over DataFrames — exact LLM token budgets.

``token_count`` (textqual.py) gives the GPT-2 PRE-token count and a chars/4
estimate; training-data budgeting at 100 TB needs the EXACT subword count
under a real merge table.  This module provides the full loop:

- :func:`train_bpe` — learn a byte-level merge table from a corpus.  The
  corpus-scale pass is ONE distributed job: JVM-side pre-tokenization
  (``regexp_extract_all`` with the same GPT-2 regex as token_count, so Java
  and Python never have to agree on a regex dialect) → explode → one
  groupBy shuffle to the distinct-pretoken frequency table.  That table is
  Zipf-bounded (vocabulary of the corpus, not its size) and further cut by
  ``min_count``, so it collects to the driver even when the corpus doesn't —
  the same word-frequency factoring Sennrich's reference trainer and every
  production BPE trainer use.  Merge selection then runs locally over
  (symbol-sequence, freq) pairs with an incrementally-maintained pair-count
  table: O(changed pairs) per merge, not a corpus rescan.

- :func:`bpe_token_count` / :func:`bpe_encode` — apply a merge table.
  Encoding is per-pretoken and pretokens repeat corpus-wide (Zipf again),
  so the expensive step runs on ``distinct(pretoken)`` ONLY — a table ~1e4×
  smaller than the corpus — via one Arrow-batched UDF, then a broadcast-
  able join maps every occurrence.  No per-row Python touches the corpus;
  the Python merge loop runs once per DISTINCT pretoken in the whole job.

Tokens are byte sequences (initial vocab = 256 single bytes; merge i
creates id 256+i), GPT-2 style, so any UTF-8 text round-trips with no OOV.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textqual import BPE_PRETOKEN_RE

__all__ = [
    "train_bpe",
    "bpe_token_count",
    "bpe_encode",
    "encode_pretoken",
    "merges_to_vocab",
]


def _pretokens(text_col: str) -> Column:
    return F.regexp_extract_all(text_col, F.lit(BPE_PRETOKEN_RE), F.lit(0))


# ---------------------------------------------------------------------------
# training


def train_bpe(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 512,
    min_count: int = 1,
    max_table: int = 2_000_000,
) -> list[tuple[bytes, bytes]]:
    """Learn ``vocab_size - 256`` byte-pair merges from the corpus.

    Returns the ordered merge list; pair (a, b) at index i merges into the
    single symbol a+b with token id 256+i.  Deterministic: ties in pair
    frequency break on the lexicographically smallest (a, b).

    DRIVER MEMORY BOUND: only the top ``max_table`` distinct pretokens by
    frequency are collected (ties at the cut break on the pretoken string,
    so truncation is reproducible).  At web scale the distinct-pretoken
    table is 1e7-1e9 rows; the default cap (2M rows x ~50 B ~= 100 MB)
    keeps the driver safe while Zipf makes the truncation loss negligible —
    the dropped tail is the long tail of hapax pretokens whose pair counts
    cannot influence the first ``vocab_size - 256`` merges in any corpus
    whose head mass dominates (the same word-frequency factoring Sennrich's
    trainer relies on).  Pass ``max_table=None`` to disable the cap."""
    n_merges = vocab_size - 256
    if n_merges <= 0:
        return []
    freq = (
        df.select(F.explode(_pretokens(text_col)).alias("pt"))
        .groupBy("pt")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
    if max_table is not None:
        # TakeOrderedAndProject: per-partition top-N + driver merge — the
        # driver never sees more than max_table rows
        freq = freq.orderBy(F.col("freq").desc(), F.col("pt")).limit(
            int(max_table)
        )
    freq_rows = freq.collect()
    # driver-local merge selection over the (small) frequency table
    words: list[tuple[list[bytes], int]] = [
        ([bytes([b]) for b in r["pt"].encode("utf-8")], int(r["freq"]))
        for r in freq_rows
        if r["pt"]
    ]
    # pair -> total freq, and pair -> set of word indexes containing it
    pair_freq: dict[tuple[bytes, bytes], int] = {}
    pair_words: dict[tuple[bytes, bytes], set[int]] = {}
    for wi, (syms, f) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_freq[(a, b)] = pair_freq.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < max(min_count, 1):
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        # rewrite only the words that contain the merged pair, maintaining
        # the pair tables incrementally
        for wi in list(pair_words.get(best, ())):
            syms, f = words[wi]
            out: list[bytes] = []
            i = 0
            changed = False
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(new_sym)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if not changed:
                continue
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] -= f
                if pair_freq[(a, b)] <= 0:
                    del pair_freq[(a, b)]
                    pair_words.pop((a, b), None)
                else:
                    s = pair_words.get((a, b))
                    if s is not None:
                        s.discard(wi)
            for a, b in zip(out, out[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(wi)
            words[wi] = (out, f)
        pair_freq.pop(best, None)
        pair_words.pop(best, None)
    return merges


def merges_to_vocab(merges: list[tuple[bytes, bytes]]) -> dict[bytes, int]:
    """Token byte-sequence -> id (256 single bytes, then one id per merge)."""
    vocab = {bytes([i]): i for i in range(256)}
    for i, (a, b) in enumerate(merges):
        vocab[a + b] = 256 + i
    return vocab


# ---------------------------------------------------------------------------
# encoding


def encode_pretoken(
    data: bytes, ranks: dict[tuple[bytes, bytes], int]
) -> list[bytes]:
    """GPT-2 greedy merge: repeatedly merge the lowest-rank adjacent pair."""
    syms = [bytes([b]) for b in data]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _encoded_distinct(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[bytes, bytes]],
    with_ids: bool,
):
    """(exploded (id, pos, pretoken) frame, distinct-pretoken encodings)."""
    spark = df.sparkSession
    exploded = df.select(
        F.col(id_col),
        F.posexplode(_pretokens(text_col)).alias("pos", "pt"),
    )
    distinct = exploded.select("pt").distinct()
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = merges_to_vocab(merges) if with_ids else None
    b_ranks = spark.sparkContext.broadcast((ranks, vocab))

    out_schema = (
        "pt string, n_bpe_tokens int"
        + (", token_ids array<int>" if with_ids else "")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk, vc = b_ranks.value
        for pdf in batches:
            toks = [
                encode_pretoken(pt.encode("utf-8"), rk) for pt in pdf["pt"]
            ]
            out = {"pt": pdf["pt"], "n_bpe_tokens": [len(t) for t in toks]}
            if with_ids:
                out["token_ids"] = [[vc[s] for s in t] for t in toks]
            yield pd.DataFrame(out)

    return exploded, distinct.mapInPandas(encode, out_schema)


def bpe_token_count(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[bytes, bytes]],
    broadcast_encodings: bool = True,
) -> DataFrame:
    """Exact BPE token count per doc: (id_col, n_bpe_tokens).

    Corpus side is JVM-only (pretokenize + explode + two shuffles); the
    Python merge loop runs once per DISTINCT pretoken corpus-wide.  Docs
    with no pretokens (empty/null text) count 0.  Set
    ``broadcast_encodings=False`` when the corpus vocabulary is too big to
    broadcast (≳1e7 distinct pretokens) — the join then shuffles on ``pt``
    and AQE picks the strategy.
    """
    exploded, encoded = _encoded_distinct(df, text_col, id_col, merges, False)
    if broadcast_encodings:
        encoded = F.broadcast(encoded)
    counts = (
        exploded.join(encoded, "pt")
        .groupBy(id_col)
        .agg(F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"))
    )
    return df.select(id_col).join(counts, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[bytes, bytes]],
    broadcast_encodings: bool = True,
) -> DataFrame:
    """Full token-id sequences per doc: (id_col, token_ids array<int>).

    Order is preserved by re-assembling pretoken encodings in ``pos`` order
    (posexplode → join on the distinct-encoding table → sorted collect).
    Heavier than :func:`bpe_token_count` — one extra shuffle for the
    ordered reassembly — so use the count variant when only budgets matter.
    Docs with no pretokens are absent from the result.
    """
    exploded, encoded = _encoded_distinct(df, text_col, id_col, merges, True)
    if broadcast_encodings:
        encoded = F.broadcast(encoded)
    return (
        exploded.join(encoded, "pt")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "token_ids"))
                ).getField("token_ids")
            ).alias("token_ids")
        )
    )
