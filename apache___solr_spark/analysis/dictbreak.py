"""Dictionary-based word break for scripts written without spaces.

ICUTokenizer delegates Thai / Lao / Khmer / Myanmar (and CJ) runs to
dictionary-based break engines (lucene/analysis/icu's ICUTokenizer →
ICU4J DictionaryBreakEngine; Solr exposes it via
solr.ICUTokenizerFactory).  UAX#29 alone keeps such a run as ONE token —
these scripts put no spaces between words — so a downstream consumer gets
sentence-length "words" unless a dictionary splits them.

This module implements the MECHANISM with a pluggable dictionary: the
caller supplies the word list (ICU bundles CLDR dictionaries of ~100k
entries; shipping those is out of scope and they are trivially loadable
here — any iterable of words).  Segmentation is least-cost dynamic
programming over each SEA-script run, minimizing (unknown characters,
word count) — the same objective family ICU's dictionary engines use
(fewest words, dictionary matches preferred) — with out-of-vocabulary
characters falling through as single-character tokens rather than being
dropped.

Composition mirrors Lucene: run the standard UAX#29 tokenizer first
(spaces/punct/latin handled as usual), then re-split any token that
contains a SEA-script run (``dictionary_break_tokens``).  The filter is a
pure token-list function, so it slots into the existing analysis chain
and its Arrow-batched UDF wrappers unchanged — per-doc cost is linear in
run length × max word length, no Spark-side shape change.
"""

from __future__ import annotations

from typing import Iterable, Sequence

# Script ranges that require dictionary breaks (no inter-word spaces).
_SEA_RANGES = (
    (0x0E00, 0x0E7F),  # Thai
    (0x0E80, 0x0EFF),  # Lao
    (0x1000, 0x109F),  # Myanmar
    (0x1780, 0x17FF),  # Khmer
)


def _is_sea(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _SEA_RANGES)


class BreakDictionary:
    """Compiled word list: set + max word length (the DP's lookback bound)."""

    def __init__(self, words: Iterable[str]):
        self.words = frozenset(w for w in words if w)
        if not self.words:
            raise ValueError("empty break dictionary")
        self.max_len = max(len(w) for w in self.words)

    def segment(self, run: str) -> list[str]:
        """Least-cost segmentation of one script run.

        cost = (# OOV chars, # words): dictionary coverage first, then
        fewest words — so the longest-match greedy answer wins unless a
        different split covers more of the run with real words.
        """
        n = len(run)
        INF = (n + 1, n + 1)
        # best[i] = cost of segmenting run[:i]; back[i] = start of last word
        best: list[tuple[int, int]] = [INF] * (n + 1)
        back = [0] * (n + 1)
        best[0] = (0, 0)
        for i in range(1, n + 1):
            # OOV single char fallback.
            cand = (best[i - 1][0] + 1, best[i - 1][1] + 1)
            best[i], back[i] = cand, i - 1
            for length in range(1, min(self.max_len, i) + 1):
                j = i - length
                if best[j] == INF:
                    continue
                if run[j:i] in self.words:
                    cand = (best[j][0], best[j][1] + 1)
                    if cand < best[i]:
                        best[i], back[i] = cand, j
        out: list[str] = []
        i = n
        while i > 0:
            j = back[i]
            out.append(run[j:i])
            i = j
        out.reverse()
        return out


def dictionary_break_tokens(
    tokens: Sequence[str], dictionary: BreakDictionary
) -> list[str]:
    """Token filter: re-split tokens containing SEA-script runs.

    Mixed tokens are handled run-wise (a Latin prefix glued to a Thai run
    splits at the script boundary, like ICU's per-script chunking); tokens
    with no SEA characters pass through untouched, so the filter is free
    for Latin corpora.
    """
    out: list[str] = []
    for tok in tokens:
        if not any(_is_sea(c) for c in tok):
            out.append(tok)
            continue
        run = []
        mode = None
        for ch in tok:
            m = _is_sea(ch)
            if mode is None or m == mode:
                run.append(ch)
                mode = m
            else:
                piece = "".join(run)
                out.extend(dictionary.segment(piece) if mode else [piece])
                run, mode = [ch], m
        if run:
            piece = "".join(run)
            out.extend(dictionary.segment(piece) if mode else [piece])
    return [t for t in out if t]


def make_sea_analyzer(words: Iterable[str], base_analyzer=None):
    """An analysis chain with dictionary breaks: UAX#29 (or the given
    chain) then SEA-run re-splitting — the ICUTokenizerFactory shape."""
    from apache___solr_spark.analysis.chain import analyze

    dictionary = BreakDictionary(words)
    base = base_analyzer or analyze

    def analyze_sea(text, *args, **kwargs):
        return dictionary_break_tokens(base(text, *args, **kwargs), dictionary)

    return analyze_sea
