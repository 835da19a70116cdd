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


# ---------------------------------------------------------------------------
# Additional phonetic encoders (PhoneticFilterFactory name= values beyond
# the Soundex default: Metaphone, Caverphone, Nysiis —
# lucene/analysis/phonetic/.../PhoneticFilterFactory.java:86 registry).
# Same contract as soundex(): pure token -> code, non-alpha tokens pass
# through unchanged, usable as phonetic_tokens(encoder=...).
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def metaphone(token: str, max_code_len: int = 4) -> str:
    """Classic Metaphone (Lawrence Philips, Computer Language 12/1990),
    the ``name="Metaphone"`` encoder of PhoneticFilterFactory.  Default
    ``max_code_len=4`` matches commons-codec's Metaphone default."""
    s = "".join(c for c in token.lower() if "a" <= c <= "z")
    if not s:
        return token
    # initial-pair exceptions
    if s[:2] in ("ae", "gn", "kn", "pn", "wr"):
        s = s[1:]
    elif s[0] == "x":
        s = "s" + s[1:]
    elif s[:2] == "wh":
        s = "w" + s[2:]
    out: list[str] = []
    n = len(s)
    i = 0
    while i < n and len(out) < max_code_len:
        c = s[i]
        nxt = s[i + 1] if i + 1 < n else ""
        nxt2 = s[i + 2] if i + 2 < n else ""
        prev = s[i - 1] if i > 0 else ""
        if c == prev and c != "c":  # collapse doubles (C exempt: "accept")
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and prev == "m"):  # silent -mb
                out.append("B")
        elif c == "c":
            if s[i : i + 3] == "cia":
                out.append("X")
            elif nxt == "h":
                out.append("K" if prev == "s" else "X")  # school vs church
            elif nxt and nxt in "iey":
                out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and nxt2 in "eyi":  # dge/dgy/dgi -> J
                out.append("J")
                i += 2
                continue
            out.append("T")
        elif c == "g":
            if nxt == "h" and not (nxt2 and nxt2 in _VOWELS):
                pass  # silent gh (night, dough)
            elif s[i + 1 :] in ("n", "ned"):
                pass  # silent in final -gn / -gned
            elif nxt and nxt in "iey" and prev != "g":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if prev and prev in "csptg":
                pass  # consumed by the ch/sh/ph/th/gh digraph rules
            elif prev and prev in _VOWELS and (not nxt or nxt not in _VOWELS):
                pass  # silent after vowel with no vowel following
            else:
                out.append("H")
        elif c == "k":
            if prev != "c":
                out.append("K")
        elif c == "p":
            out.append("F" if nxt == "h" else "P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h" or s[i + 1 : i + 3] in ("io", "ia"):
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if s[i + 1 : i + 3] in ("ia", "io"):
                out.append("X")
            elif nxt == "h":
                out.append("0")  # theta
            elif s[i + 1 : i + 3] == "ch":
                pass  # silent in -tch-
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w":
            if nxt and nxt in _VOWELS:
                out.append("W")
        elif c == "x":
            out.append("K")
            out.append("S")
        elif c == "y":
            if nxt and nxt in _VOWELS:
                out.append("Y")
        elif c == "z":
            out.append("S")
        else:  # f j l m n r
            out.append(c.upper())
        i += 1
    return "".join(out[:max_code_len])


_CAVERPHONE_RULES: list[tuple[str, str]] = [
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
]


def caverphone2(token: str) -> str:
    """Caverphone 2.0 (David Hood, "Caverphone Revisited", Caversham
    Project 2004) — the ``name="Caverphone"`` encoder of
    PhoneticFilterFactory.  Fixed-width 10-char code padded with '1'."""
    s = "".join(c for c in token.lower() if "a" <= c <= "z")
    if not s:
        return token
    for pat, rep in _CAVERPHONE_RULES:
        s = re.sub(pat, rep, s)
    return (s + "1" * 10)[:10]


def nysiis(token: str, strict: bool = True) -> str:
    """NYSIIS (Taft 1970, New York State Identification and Intelligence
    System) — the ``name="Nysiis"`` encoder of PhoneticFilterFactory.
    ``strict=True`` truncates to 6 chars (commons-codec default)."""
    s = "".join(c for c in token.lower() if "a" <= c <= "z")
    if not s:
        return token
    # first-character transcodes
    for pat, rep in (
        ("^mac", "mcc"),
        ("^kn", "nn"),
        ("^k", "c"),
        ("^(ph|pf)", "ff"),
        ("^sch", "sss"),
    ):
        s2 = re.sub(pat, rep, s)
        if s2 != s:
            s = s2
            break
    # last-character transcodes
    s = re.sub("(ee|ie)$", "y", s)
    s = re.sub("(dt|rt|rd|nt|nd)$", "d", s)
    key = [s[0]]
    i = 1
    n = len(s)
    while i < n:
        c = s[i]
        step = 1
        if s[i : i + 2] == "ev":
            c, step = "af", 2
        elif c in _VOWELS:
            c = "a"
        elif c == "q":
            c = "g"
        elif c == "z":
            c = "s"
        elif c == "m":
            c = "n"
        elif s[i : i + 2] == "kn":
            c, step = "n", 2
        elif c == "k":
            c = "c"
        elif s[i : i + 3] == "sch":
            c, step = "sss", 3
        elif s[i : i + 2] == "ph":
            c, step = "ff", 2
        elif c == "h":
            prev, nxt = s[i - 1], s[i + 1] if i + 1 < n else ""
            if prev not in _VOWELS or (nxt and nxt not in _VOWELS) or not nxt:
                c = prev
            if c in _VOWELS:
                c = "a"
        elif c == "w":
            if s[i - 1] in _VOWELS:
                c = "a"
        for ch in c:
            if ch != key[-1]:
                key.append(ch)
        i += step
    # terminal cleanups
    if key[-1] == "s" and len(key) > 1:
        key.pop()
    if len(key) >= 2 and key[-2:] == ["a", "y"]:
        key[-2:] = ["y"]
    if key[-1] == "a" and len(key) > 1:
        key.pop()
    code = "".join(key).upper()
    return code[:6] if strict else code


# ---------------------------------------------------------------------------
# CJKWidthFilter + CJKBigramFilter (the text_cjk chain,
# managed-schema.xml:608-616: standard -> CJKWidth -> lowercase -> CJKBigram)
# ---------------------------------------------------------------------------

# CJKWidthFilter.java folds exactly two ranges: fullwidth ASCII variants
# (FF01-FF5E) -> halfwidth, and halfwidth katakana (FF61-FF9F) ->
# fullwidth (combining half-width dakuten first, which NFKC performs).
_FW_ASCII = {chr(c): chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F)}
_FW_ASCII[chr(0x3000)] = " "  # ideographic space


def cjk_width(token: str) -> str:
    """CJKWidthFilter: fullwidth ASCII -> halfwidth; halfwidth katakana
    (incl. dakuten combining) -> fullwidth via NFKC on that range only —
    NFKC over the whole token would also fold unrelated compatibility
    forms the reference filter leaves alone."""
    out = []
    for ch in token:
        if ch in _FW_ASCII:
            out.append(_FW_ASCII[ch])
        elif 0xFF61 <= ord(ch) <= 0xFF9F:
            out.append(ch)  # normalized below with its neighbors
        else:
            out.append(ch)
    s = "".join(out)
    if any(0xFF61 <= ord(c) <= 0xFF9F for c in s):
        # normalize ONLY halfwidth-katakana spans (dakuten combine there)
        s = re.sub(
            "[｡-ﾟ]+",
            lambda m: unicodedata.normalize("NFKC", m.group(0)),
            s,
        )
    return s


def _is_cjk(ch: str) -> bool:
    """HAN + HIRAGANA + KATAKANA + HANGUL — the four scripts
    CJKBigramFilter bigrams by default (CJKBigramFilter.java flags)."""
    o = ord(ch)
    return (
        0x4E00 <= o <= 0x9FFF      # CJK Unified Ideographs
        or 0x3400 <= o <= 0x4DBF   # CJK Ext A
        or 0xF900 <= o <= 0xFAFF   # CJK Compat Ideographs
        or 0x3040 <= o <= 0x309F   # Hiragana
        or 0x30A0 <= o <= 0x30FF   # Katakana
        or 0x31F0 <= o <= 0x31FF   # Katakana Phonetic Ext
        or 0xAC00 <= o <= 0xD7AF   # Hangul Syllables
        or 0x1100 <= o <= 0x11FF   # Hangul Jamo
    )


def cjk_bigram_tokens(
    tokens: list[str], output_unigrams: bool = False
) -> list[str]:
    """CJKBigramFilter: overlapping character bigrams over runs of CJK
    text; a lone CJK character (run of length 1) emits its unigram;
    non-CJK text passes through untouched.

    Lucene's StandardTokenizer emits Han one char per token and this
    filter re-joins ADJACENT single-char tokens into bigram runs; our
    tokenizer keeps a CJK run as one token, so segmenting each token into
    CJK spans reproduces the same end-to-end output for running text
    (runs interrupted by punctuation/space are separate tokens in both).
    ``output_unigrams=True`` additionally emits every unigram alongside
    the bigrams (the filter's outputUnigrams flag — higher recall,
    fatter index)."""
    out: list[str] = []
    for tok in tokens:
        i = 0
        n = len(tok)
        while i < n:
            if _is_cjk(tok[i]):
                j = i
                while j < n and _is_cjk(tok[j]):
                    j += 1
                run = tok[i:j]
                if len(run) == 1:
                    out.append(run)
                else:
                    if output_unigrams:
                        bis = [run[k : k + 2] for k in range(len(run) - 1)]
                        # interleave: uni, bigram, uni, bigram, ... uni
                        for k, b in enumerate(bis):
                            out.append(run[k])
                            out.append(b)
                        out.append(run[-1])
                    else:
                        out.extend(
                            run[k : k + 2] for k in range(len(run) - 1)
                        )
                i = j
            else:
                j = i
                while j < n and not _is_cjk(tok[j]):
                    j += 1
                out.append(tok[i:j])
                i = j
    return out


# ---------------------------------------------------------------------------
# ICU filters (analysis-extras module)
# ---------------------------------------------------------------------------

# characters NFKC_Casefold removes (Default_Ignorable_Code_Point): the
# common format controls + variation selectors + Hangul fillers — the
# stdlib has no DICP property, so this enumerates the ranges that occur in
# real text (a documented subset of the full property)
_IGNORABLE_RANGES = (
    (0x00AD, 0x00AD),  # soft hyphen
    (0x034F, 0x034F),  # combining grapheme joiner
    (0x115F, 0x1160),  # Hangul fillers
    (0x17B4, 0x17B5),  # Khmer inherent vowels
    (0x180B, 0x180E),  # Mongolian FVS + vowel separator
    (0x200B, 0x200F),  # ZWSP/ZWNJ/ZWJ/LRM/RLM
    (0x202A, 0x202E),  # bidi embeddings
    (0x2060, 0x206F),  # word joiner + invisible operators
    (0x3164, 0x3164),  # Hangul filler
    (0xFE00, 0xFE0F),  # variation selectors
    (0xFEFF, 0xFEFF),  # ZWNBSP
    (0xFFA0, 0xFFA0),  # halfwidth Hangul filler
)


def _strip_ignorables(s: str) -> str:
    return "".join(
        ch
        for ch in s
        if not any(lo <= ord(ch) <= hi for lo, hi in _IGNORABLE_RANGES)
    )


def icu_normalize2(token: str) -> str:
    """ICUNormalizer2FilterFactory default mode (nfkc_cf): NFKC
    compatibility normalization + full Unicode case folding + removal of
    default-ignorable code points.

    Reference: schema-folding-extra.xml text_icunormalizer2 field type;
    goldens from TestFoldingMultitermExtrasQuery ('Ruß'->'russ',
    'ΜΆΪΟΣ' and 'Μάϊος' meet at 'μάϊοσ', 'résumé' composed == decomposed).
    Stdlib approximation: unicodedata NFKC + str.casefold + the enumerated
    ignorable ranges (full ICU consults the DICP property)."""
    s = unicodedata.normalize("NFKC", token)
    s = _strip_ignorables(s).casefold()
    # casefold can reintroduce decomposed sequences (İ -> i + U+0307)
    return unicodedata.normalize("NFKC", s)


def icu_fold(token: str) -> str:
    """ICUFoldingFilterFactory (UTR #30 folding): nfkc_cf PLUS diacritic
    removal — 'résumé'/'re\\u0301sume\\u0301' -> 'resume', 'ΜΆΪΟΣ'/'Μάϊος'
    -> 'μαιοσ', 'Ruß' -> 'russ', 'ELİF'/'eli\\u0307f' -> 'elif'
    (the TestFoldingMultitermExtrasQuery equivalence classes).

    Chain: NFKC -> case fold -> NFKD -> drop combining marks -> NFKC."""
    s = icu_normalize2(token)
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    return unicodedata.normalize("NFKC", s)


# ICU Cyrillic-Latin transliteration (ISO 9:1995 system, the table ICU's
# Cyrillic-Latin transform implements): one char -> one Latin char with
# diacritics, invertible.  Lowercase table; case is restored per char.
_CYR_LAT = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "ë",
    "ж": "ž", "з": "z", "и": "i", "й": "j", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "č", "ш": "š", "щ": "ŝ", "ъ": "ʺ",
    "ы": "y", "ь": "ʹ", "э": "è", "ю": "û", "я": "â",
    # Ukrainian / Belarusian extensions in the same ISO 9 table
    "є": "ê", "і": "ì", "ї": "ï", "ґ": "g̀", "ў": "ŭ",
}

# Greek-Latin (ISO 843 / ELOT 743 type 2 transcription subset — the plain
# letter table without the digraph context rules)
_GRK_LAT = {
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "ī",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "y",
    "φ": "f", "χ": "ch", "ψ": "ps", "ω": "ō",
}


def _translit(token: str, table: dict[str, str]) -> str:
    out = []
    for ch in token:
        low = ch.lower()
        rep = table.get(low)
        if rep is None:
            out.append(ch)
        elif ch == low:
            out.append(rep)
        else:
            # uppercase source: capitalize the first output char
            out.append(rep[0].upper() + rep[1:])
    return "".join(out)


_TRANSFORMS = {
    "Cyrillic-Latin": lambda t: _translit(t, _CYR_LAT),
    "Greek-Latin": lambda t: _translit(
        "".join(
            c
            for c in unicodedata.normalize("NFD", t)
            if not unicodedata.combining(c)
        ),
        _GRK_LAT,
    ),
    "Any-Lower": str.lower,
    "Any-Upper": str.upper,
}


def icu_transform(token: str, transform_id: str = "Cyrillic-Latin") -> str:
    """ICUTransformFilterFactory analog (schema-folding-extra.xml:39 uses
    id="Cyrillic-Latin"): apply a named transliteration.  Supported ids:
    Cyrillic-Latin (ISO 9 table — 'Российская' -> 'Rossijskaâ'),
    Greek-Latin (ISO 843 letter table, accents stripped first),
    Any-Lower / Any-Upper.  Unknown ids raise; arbitrary rule-language
    transforms (the engine behind ICU's system ids) run via
    analysis/transform_rules.py's Transliterator instead."""
    fn = _TRANSFORMS.get(transform_id)
    if fn is None:
        raise NotImplementedError(
            f"ICU transform {transform_id!r} not in the supported table "
            f"{sorted(_TRANSFORMS)}"
        )
    return fn(token)
