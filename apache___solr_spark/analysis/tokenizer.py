"""StandardTokenizer-equivalent word tokenizer.

Reproduces the *shape* of Lucene's StandardTokenizer (UAX#29 word-break
rules, maxTokenLen=255) as configured by the reference default schema
(``<tokenizer name="standard"/>``, managed-schema.xml:301,310).

Implemented as a single compiled regex approximating the UAX#29 word rules
that matter for web text:

- a word is a run of letters/digits (any Unicode alphanumeric except ``_``),
- combining marks (categories Mn/Mc/Me) never break a word — UAX#29 rule
  WB4 (Extend × don't break), so decomposed ``résumé`` is ONE
  token exactly as Lucene's StandardTokenizer emits it,
- MidLetter/MidNumLet characters (``'``, U+2019, ``.``) glue two
  alphanumeric runs into one token (``don't``, ``3.14``, ``node.js``),
- everything else (punctuation, symbols, whitespace, ``_``) is a boundary,
- tokens longer than ``max_token_len`` are split into max_token_len chunks
  (Lucene emits the overlong run as successive clipped tokens).

This is a documented approximation, not a full ICU port; it is the single
source of truth for BOTH the distributed engine and the single-process
oracle, mirroring Solr's control-vs-distributed equivalence testing pattern
(solr/test-framework/.../BaseDistributedSearchTestCase.java:98).
"""

from __future__ import annotations

import re
import unicodedata


def _mark_class() -> str:
    """Regex character class of BMP combining marks (Mn/Mc/Me) — Python's
    ``\\w`` excludes them, but UAX#29 WB4 says they extend the preceding
    word character.  BMP-only: supplementary-plane marks (musical symbols,
    ...) are vanishingly rare in web text and documented out of scope."""
    ranges: list[tuple[int, int]] = []
    for cp in range(0x10000):
        if unicodedata.category(chr(cp)).startswith("M"):
            if ranges and ranges[-1][1] == cp - 1:
                ranges[-1] = (ranges[-1][0], cp)
            else:
                ranges.append((cp, cp))
    return "".join(
        f"\\u{lo:04x}-\\u{hi:04x}" if hi > lo else f"\\u{lo:04x}"
        for lo, hi in ranges
    )


_MARKS = _mark_class()
# [^\W_] == unicode alphanumeric minus underscore; each word char may be
# followed by combining marks (WB4); a token never starts with a mark
_RUN = rf"[^\W_](?:[^\W_]|[{_MARKS}])*"
_WORD = re.compile(rf"{_RUN}(?:['’.]{_RUN})*", re.UNICODE)

# Fast path: the per-character alternation in _RUN costs ~2x over a plain
# class repeat, and it only exists for WB4 (combining marks).  When a text
# contains NO marks, ``(?:[^\W_]|[M])*`` is provably equivalent to
# ``[^\W_]*``, so the mark-free pattern below produces IDENTICAL tokens.
# ``str.isascii()`` is an O(1) flag check (marks are all non-ASCII), and
# for other texts one C-level class scan decides.  This is the hottest
# loop of the 100 TB index build — the fast path is the common case for
# web text, the exact WB4 path is kept for anything carrying marks.
_WORD_NOMARK = re.compile(r"[^\W_]+(?:['’.][^\W_]+)*", re.UNICODE)
_HAS_MARK = re.compile(f"[{_MARKS}]")


def standard_tokenize(text: str | None, max_token_len: int = 255) -> list[str]:
    """Split text into UAX#29-style word tokens (case preserved)."""
    if not text:
        return []
    pat = (
        _WORD_NOMARK
        if text.isascii() or _HAS_MARK.search(text) is None
        else _WORD
    )
    # findall, not finditer: every group in the pattern is non-capturing, so
    # findall returns the matched strings directly — no Match objects, no
    # .group() calls in the hot loop.  Overlong tokens (rare) take the slow
    # splitting pass only when one is present.
    toks = pat.findall(text)
    if all(len(t) <= max_token_len for t in toks):
        return toks
    out: list[str] = []
    for tok in toks:
        if len(tok) <= max_token_len:
            out.append(tok)
        else:
            out.extend(
                tok[i : i + max_token_len] for i in range(0, len(tok), max_token_len)
            )
    return out
