"""ICUCollationField analog: multi-level collation sort keys.

The reference's analysis-extras module exposes locale-sensitive sort and
range queries through collated binary sort keys
(solr/modules/analysis-extras/src/java/org/apache/solr/schema/
ICUCollationField.java:63-79: strength = primary | secondary | tertiary |
identical, caseLevel).  This module produces the same SHAPE of key — a
byte string whose unsigned lexicographic order implements the collation —
for the ROOT locale, approximated from stdlib Unicode data:

- level 1 (primary): base letters only — case, accents, and width folded
  away (``icu_fold``), so 'résumé' == 'Resume' == 'RESUME'.
- level 2 (secondary): the combining marks, in order of appearance, so
  accented forms sort AFTER their bases but adjacent to them
  ('cote' < 'coté' < 'côte' by mark position, the French-ish root order).
- level 3 (tertiary): case bits (lowercase before uppercase, the UCA root
  default), so 'peche' < 'Peche' only when levels 1-2 tie.
- identical: appends the exact NFC codepoints as the final tiebreak.

Levels are concatenated with 0x01 separators (0x00 is reserved below every
weight), exactly the layered-key construction real UCA implementations
use, which is what makes prefix truncation == strength reduction.

Per-locale tailorings are supported for the common Nordic/German cases
(ICUCollationField's locale= attribute): 'da' (æ ø å after z, aa == å,
ä==æ / ö==ø), 'sv' (å ä ö after z), 'no' (as da, without the ä/ö
equivalences), 'de_phonebook' (ä=ae, ö=oe, ü=ue, ß=ss at the primary
level).  Tailoring rewrites a casefolded copy of the text BEFORE the
primary fold, mapping tailored letters to post-'z' ASCII pseudo-letters
({ | }) so the byte order implements the tailored alphabet; other locales
fall back to root.  The full CLDR tailoring-rule engine stays out of
scope — inventoried.

Scale shape: `collation_key_col` is an Arrow-batched pandas UDF producing
a binary column; sorting on it is a plain Spark sort (range-partitioned
shuffle on byte keys), and collated range queries push down as binary
comparisons on that materialized column.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from apache___solr_spark.analysis.filters import icu_fold

_SEP = b"\x01"
_STRENGTHS = ("primary", "secondary", "tertiary", "identical")

# tailored letters -> post-'z' pseudo-letters; byte order of { | } gives
# the locale's alphabet order after z.  Applied to a casefolded copy.
_TAILORINGS: dict[str, tuple[tuple[str, str], ...]] = {
    # Danish/Norwegian order: ... z æ ø å; 'aa' == å; da also folds ä->æ, ö->ø
    "da": (("aa", "}"), ("æ", "{"), ("ä", "{"), ("ø", "|"), ("ö", "|"), ("å", "}")),
    "no": (("aa", "}"), ("æ", "{"), ("ø", "|"), ("å", "}")),
    # Swedish order: ... z å ä ö
    "sv": (("å", "{"), ("ä", "|"), ("ö", "}")),
    # German phonebook: umlauts expand, sorting with their base+e digraph
    "de_phonebook": (("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss")),
}


def _tailor(text: str, locale: str) -> str:
    rules = _TAILORINGS.get(locale)
    if rules is None:
        return text
    s = text.casefold()
    for src, dst in rules:
        s = s.replace(src, dst)
    return s


def _level2(s: str) -> bytes:
    """Secondary weights: one byte per position carrying the first
    combining mark's low byte (0x02 = no mark), after NFD."""
    out = bytearray()
    nfd = unicodedata.normalize("NFD", s)
    pending_base = False
    for ch in nfd:
        cc = unicodedata.combining(ch)
        if cc == 0:
            if pending_base:
                out.append(0x02)  # previous base had no mark
            pending_base = True
        else:
            if pending_base:
                out.append(0x03 + (ord(ch) & 0x7F))
                pending_base = False
            # further marks on the same base fold into the same byte slot
    if pending_base:
        out.append(0x02)
    return bytes(out)


def _level3(s: str) -> bytes:
    """Tertiary weights: case bit per cased char (lower=0x02 < upper=0x03,
    the UCA root default ordering)."""
    out = bytearray()
    for ch in unicodedata.normalize("NFD", s):
        if ch.isupper():
            out.append(0x03)
        elif ch.islower():
            out.append(0x02)
    return bytes(out)


def collation_key(
    text: str | None, strength: str = "tertiary", locale: str = "root"
) -> bytes:
    """Collation sort key; unsigned-lexicographic byte order == collation
    order at the given strength (ICUCollationField.java:172 strength
    mapping; 'quaternary' collapses to 'identical' here — no
    variable-weighting / shifted handling).  ``locale`` selects a
    tailoring (da/no/sv/de_phonebook, see module doc); unknown locales
    use root order."""
    if strength == "quaternary":
        strength = "identical"
    if strength not in _STRENGTHS:
        raise ValueError(
            f"invalid strength {strength!r} (ICUCollationField accepts "
            f"{_STRENGTHS + ('quaternary',)})"
        )
    if text is None:
        return b""
    key = icu_fold(_tailor(text, locale)).encode("utf-8")
    if strength == "primary":
        return key
    key += _SEP + _level2(text)
    if strength == "secondary":
        return key
    key += _SEP + _level3(text)
    if strength == "tertiary":
        return key
    return key + _SEP + unicodedata.normalize("NFC", text).encode("utf-8")


def collation_key_col(
    col: Column | str, strength: str = "tertiary", locale: str = "root"
) -> Column:
    """Binary sort-key column (Arrow-batched).  Use in orderBy for collated
    sort, or materialize + compare for collated range queries — the same
    two uses ICUCollationField serves (sort fields + TermRangeQuery)."""
    if strength not in _STRENGTHS + ("quaternary",):
        raise ValueError(f"invalid strength {strength!r}")

    @pandas_udf("binary")
    def _key(s: pd.Series) -> pd.Series:
        return s.map(lambda t: collation_key(t, strength, locale))

    return _key(F.col(col) if isinstance(col, str) else col)
