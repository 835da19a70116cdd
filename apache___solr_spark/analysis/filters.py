"""Token filters from the reference's common schema chains.

Implements the filters a stock Solr schema reaches for beyond the
``text_general`` chain already in ``chain.py``:

- ``ascii_fold``       — ASCIIFoldingFilter
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/ASCIIFoldingFilter.java:57)
- ``word_delimiter``   — WordDelimiterGraphFilter, flattened
  (lucene/analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java:67)
- ``edge_ngrams``      — EdgeNGramTokenFilter
  (lucene/analysis/common/.../ngram/EdgeNGramTokenFilter.java:34)
- ``shingles``         — ShingleFilter word n-grams
  (lucene/analysis/common/.../shingle/ShingleFilter.java:54)

All are deterministic pure-Python token-list -> token-list functions: the
Spark layer runs them inside the same Arrow-batched analysis UDF as the rest
of the chain, so distributed output stays byte-identical to the
single-process oracle (the repo's control-vs-distributed invariant).

Graph note: Lucene's WordDelimiterGraphFilter emits a token *graph*
(stacked positions so both "wi fi" and "wifi" phrase-match).  A
bag-of-positions index can't hold two tokens at one position without
Lucene's posIncrement=0 convention, which ``index/builder.py`` does not
model; we emit the FLATTENED order (parts first, then catenations) and
document that phrase queries across catenated parts are approximate under
this analyzer — same trade-off the reference accepts at *query* time where
WDGF graphs are flattened too (WordDelimiterGraphFilter javadoc warns the
filter is for index time because flattening loses graph structure).
"""

from __future__ import annotations

import re
import unicodedata

# ---------------------------------------------------------------------------
# ASCIIFoldingFilter
# ---------------------------------------------------------------------------

# NFKD + strip-combining handles the accent block; these are the common
# non-decomposable mappings from ASCIIFoldingFilter.java's switch (the
# Latin-1/Extended-A letters web text actually contains).
_FOLD_MAP = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "ß": "ss", "ẞ": "SS",
    "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L",
    "ħ": "h", "Ħ": "H", "ŧ": "t", "Ŧ": "T",
    "ı": "i", "ĸ": "k", "ŋ": "n", "Ŋ": "N",
    "ﬁ": "fi", "ﬂ": "fl",
    "«": '"', "»": '"', "“": '"', "”": '"', "„": '"',
    "‘": "'", "’": "'", "‚": "'",
    "‐": "-", "‑": "-", "‒": "-", "–": "-", "—": "-",
}
_FOLD_TRANS = str.maketrans(_FOLD_MAP)


def ascii_fold(token: str) -> str:
    """Fold accented/ligature characters to their ASCII equivalents.

    ASCIIFoldingFilter.java:57 (foldToASCII): 'é'->'e', 'ñ'->'n',
    'æ'->'ae', 'ß'->'ss'.  Characters with no ASCII equivalent (CJK,
    Cyrillic, ...) pass through unchanged, as in the reference.
    """
    if token.isascii():
        return token
    token = token.translate(_FOLD_TRANS)
    if token.isascii():
        return token
    out = []
    for ch in token:
        if ord(ch) < 128:
            out.append(ch)
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in decomp if not unicodedata.combining(c))
        # keep the original when decomposition yields nothing ASCII-useful
        out.append(folded if folded.isascii() and folded else ch)
    return "".join(out)


def ascii_fold_tokens(tokens: list[str]) -> list[str]:
    return [ascii_fold(t) for t in tokens]


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter (flattened)
# ---------------------------------------------------------------------------

_POSSESSIVE_RE = re.compile(r"['’]s$")
# a subword part: letter-run or digit-run (case transition handled below)
_ALNUM_RUN = re.compile(r"[^\W\d_]+|\d+", re.UNICODE)
_CASE_SPLIT = re.compile(r".+?(?:(?<=[a-z])(?=[A-Z])|$)")


def _case_parts(run: str, split_on_case: bool) -> list[str]:
    """Split a letter run on lower->UPPER transitions: 'PowerShot' ->
    ['Power', 'Shot'];  'WiFi' -> ['Wi', 'Fi'];  'SHOUT' -> ['SHOUT'].
    WordDelimiterIterator.java isUpper/isLower transition rule."""
    if not split_on_case:
        return [run]
    return _CASE_SPLIT.findall(run)


def word_delimiter(
    tokens: list[str],
    *,
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
) -> list[str]:
    """WordDelimiterGraphFilter.java:67, flattened to a token list.

    For each input token: split on intra-word delimiters (non-alphanumerics,
    case transitions, letter<->digit boundaries), emit parts per the
    generate flags, then catenations per the catenate flags, then the
    original per preserve_original.  'PowerShot500-42s' with
    catenate_words -> ['Power', 'Shot', '500', '42s'... ] etc.

    Single-part tokens with no delimiters pass through unchanged regardless
    of flags (the reference emits the token itself).
    """
    out: list[str] = []
    for tok in tokens:
        t = _POSSESSIVE_RE.sub("", tok) if stem_english_possessive else tok
        runs: list[str] = []
        prev_end = -1
        for m in _ALNUM_RUN.finditer(t):
            if not split_on_numerics and runs and m.start() == prev_end:
                # letter<->digit boundary with no delimiter char between:
                # keep as one subword when splitOnNumerics=0
                runs[-1] += m.group(0)
            else:
                runs.append(m.group(0))
            prev_end = m.end()
        parts: list[str] = []
        for run in runs:
            if run.isdigit():
                parts.append(run)
            else:
                parts.extend(_case_parts(run, split_on_case_change))
        if not parts:
            continue  # all-delimiter token ("--"): WDF emits nothing
        if len(parts) == 1 and parts[0] == tok:
            out.append(tok)  # no delimiters at all: token passes through
            continue
        emitted: list[str] = []
        for p in parts:
            if p.isdigit():
                if generate_number_parts:
                    emitted.append(p)
            elif generate_word_parts:
                emitted.append(p)
        if catenate_words:
            word_parts = [p for p in parts if not p.isdigit()]
            if len(word_parts) > 1:
                emitted.append("".join(word_parts))
        if catenate_numbers:
            num_parts = [p for p in parts if p.isdigit()]
            if len(num_parts) > 1:
                emitted.append("".join(num_parts))
        if catenate_all and len(parts) > 1:
            cat = "".join(parts)
            if cat not in emitted:
                emitted.append(cat)
        if preserve_original and tok not in emitted:
            emitted.append(tok)
        out.extend(emitted)
    return out


# ---------------------------------------------------------------------------
# EdgeNGramTokenFilter
# ---------------------------------------------------------------------------


def edge_ngrams(
    tokens: list[str],
    min_gram: int = 1,
    max_gram: int = 10,
    preserve_original: bool = False,
) -> list[str]:
    """Front-edge n-grams per token: 'search' (1..3) -> s, se, sea.

    EdgeNGramTokenFilter.java:34; preserveOriginal keeps tokens shorter
    than min_gram / longer than max_gram as themselves (Lucene 8+ flag).
    """
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    out: list[str] = []
    for tok in tokens:
        n = len(tok)
        if n < min_gram:
            if preserve_original:
                out.append(tok)
            continue
        for g in range(min_gram, min(max_gram, n) + 1):
            out.append(tok[:g])
        if preserve_original and n > max_gram:
            out.append(tok)
    return out


# ---------------------------------------------------------------------------
# ShingleFilter
# ---------------------------------------------------------------------------


def shingles(
    tokens: list[str],
    min_shingle_size: int = 2,
    max_shingle_size: int = 2,
    output_unigrams: bool = True,
    token_separator: str = " ",
) -> list[str]:
    """Word n-grams in position order: [a, b, c] (2..2) ->
    [a, 'a b', b, 'b c', c] with unigrams, ['a b', 'b c'] without.

    ShingleFilter.java:54 emission order — at each position, the unigram
    (if output_unigrams) then each shingle size ascending.
    """
    if min_shingle_size < 2 or max_shingle_size < min_shingle_size:
        raise ValueError("need 2 <= min_shingle_size <= max_shingle_size")
    out: list[str] = []
    n = len(tokens)
    for i in range(n):
        if output_unigrams:
            out.append(tokens[i])
        for size in range(min_shingle_size, max_shingle_size + 1):
            if i + size <= n:
                out.append(token_separator.join(tokens[i : i + size]))
    if not out and not output_unigrams and n == 1:
        # ShingleFilter emits the lone token when no shingle is possible
        out = list(tokens)
    return out


# ---------------------------------------------------------------------------
# PhoneticFilter (soundex encoders)
# ---------------------------------------------------------------------------

# American Soundex code table (commons-codec Soundex.US_ENGLISH, the
# default encoder of solr.PhoneticFilterFactory —
# lucene/analysis/phonetic/.../PhoneticFilterFactory.java).
_SOUNDEX_CODE = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(token: str) -> str:
    """American Soundex (the Odell-Russell algorithm commons-codec
    implements): first letter + 3 digits; adjacent same-code letters
    collapse; H and W are transparent (letters either side of them merge
    if same-coded); vowels break runs.  Non-alpha tokens pass through
    unchanged, matching PhoneticFilter's leniency."""
    letters = [c for c in token.lower() if "a" <= c <= "z"]
    if not letters:
        return token
    first = letters[0]
    out = [first.upper()]
    prev_code = _SOUNDEX_CODE.get(first, "")
    for c in letters[1:]:
        if c in "hw":  # transparent: keep prev_code across it
            continue
        code = _SOUNDEX_CODE.get(c, "")
        if code and code != prev_code:
            out.append(code)
            if len(out) == 4:
                break
        prev_code = code
    return "".join(out).ljust(4, "0")


def phonetic_tokens(
    tokens: list[str], encoder=soundex, inject: bool = True
) -> list[str]:
    """PhoneticFilterFactory semantics: with ``inject=True`` (the factory
    default) each token is followed by its phonetic code at the same
    position (flattened here, like the WDGF note above); with
    ``inject=False`` codes replace the tokens."""
    out: list[str] = []
    for t in tokens:
        code = encoder(t)
        if inject:
            out.append(t)
            if code != t:
                out.append(code)
        else:
            out.append(code)
    return out
