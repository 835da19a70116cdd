"""Custom collation tailoring rules: the ICUCollationField custom= path.

The reference accepts hand-written tailoring rules
(solr/modules/analysis-extras/.../ICUCollationField.java:118-131:
``custom="rules.txt"`` → ``new RuleBasedCollator(rules)``) using the ICU
collation-rule syntax.  This module implements the core of that syntax as
a small, deterministic mini-UCA:

    & anchor  <  x      x sorts primary-after anchor
              << y      y sorts secondary-after (primary-equal)
              <<< z     z sorts tertiary-after (primary+secondary-equal)
              =  w      w is equal to the last element at all levels
    'quoted'            literal text (e.g. '&' or spaces inside elements)
    # comment           to end of line

Multi-character left sides are contractions (``&c < ch``: 'ch' is ONE
collation element sorting after 'c'); a relation whose target's weights
come from a multi-char anchor is an expansion (``&ae = ä``), and the
explicit expansion operator ``&a << ä / e`` gives the target the
tailored step's weights FOLLOWED by the extension string's weights
(ICU: "x / y — x sorts as the tailored position followed by y").
Cased single-char tailorings auto-cover their case partner at the
tertiary level (tailoring 'å' places 'Å' too), matching how shared
primaries behave in ICU.  ``&[before n] anchor`` resets insert before
the anchor at level n: ``[before 1]`` rebases the primary just below
the anchor, ``[before 2]``/``[before 3]`` place elements in a reserved
weight band below the root secondary/tertiary base (so they sort after
every primary-smaller string but before the anchor and all its root
accent/case forms).  ``[reorder Grek Cyrl ...]`` script reordering is
supported: when present, every element's primary weight is prefixed
with a one-byte reorder-group weight — listed groups (ISO 15924 script
codes plus the special groups space/punct/symbol/currency/digit and
``others``) come first in the listed order, unlisted groups follow in
CLDR-root default order (at the position of ``others`` if listed);
``[reorder none]`` restores the default.  Scripts are identified by
compact codepoint-range tables (the common 17 scripts; everything else
is Zzzz).  ``[alternate shifted]`` makes variable elements (untailored
space/punctuation characters, ICU's default maxVariable=punct set)
ignorable at the primary-tertiary levels; they reappear as a
quaternary level (their primary weight, below the 0xFF non-variable
filler), so ``de luge < de-luge < deluge`` at quaternary strength while
all three tie at tertiary.  ``[alternate non-ignorable]`` names the
default.  ``[import <locale>]`` splices the bundled tailoring for
da/no/sv/de-u-co-phonebk (the same locales collation.py ships as remap
tables) into the rule text.  Any other bracket setting raises — never
silently mis-sorts.

Key construction mirrors analysis/collation.py's layered scheme — per
element: a primary byte string (root = icu_fold'ed UTF-8; tailored =
anchor primary + one 0x80+k step byte, so k primary steps stay below the
next root letter), a secondary byte (before-band 0x02+, root base 0x20,
accents 0x21+mark, tailored-after steps 0xA8+j — above every accent), a
tertiary byte (before-band 0x02+, lower 0x20 / upper 0x21, tailored-after
steps 0x28+m) — levels joined with 0x01 separators, identical-level NFC
bytes last.  Unsigned byte order of the key == tailored collation order,
so Spark sorts and range filters on the key column need no custom
comparator — identical scale shape to collation_key_col.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from apache___solr_spark.analysis.collation import _SEP, _STRENGTHS
from apache___solr_spark.analysis.filters import icu_fold

_UNSUPPORTED = re.compile(r"\[\s*(?!before\s*[123])[A-Za-z][^\]]*\]")
_BEFORE = re.compile(r"\[\s*before\s*([123])\s*\]")
_IMPORT = re.compile(r"\[\s*import\s+([A-Za-z0-9_-]+)\s*\]")

# [import <locale>]: canned tailoring rule text for the same locales
# analysis/collation.py ships as remap tables (ICU resolves imports from
# its bundled CLDR data; these are the in-tree equivalents).
_LOCALE_RULES = {
    "da": "&z < æ < ø < å  &å = aa  &æ = ä  &ø = ö",
    "no": "&z < æ < ø < å  &å = aa",
    "sv": "&z < å < ä < ö",
    "de-u-co-phonebk": "&ae = ä  &oe = ö  &ue = ü  &ss = ß",
}
_LOCALE_RULES["de_phonebook"] = _LOCALE_RULES["de-u-co-phonebk"]


def _splice_imports(rules: str) -> str:
    """Replace every [import <locale>] with that locale's tailoring rules
    (a textual splice — the imported chains participate exactly like
    hand-written ones).  Unknown locales raise."""

    def repl(m: re.Match) -> str:
        loc = m.group(1)
        body = _LOCALE_RULES.get(loc)
        if body is None:
            raise NotImplementedError(
                f"[import {loc}]: no bundled tailoring (available: "
                f"{sorted(set(_LOCALE_RULES))})"
            )
        return f" {body} "

    return _IMPORT.sub(repl, rules)
_REORDER = re.compile(r"\[\s*reorder((?:\s+[A-Za-z]+)*)\s*\]")
_ALTERNATE = re.compile(r"\[\s*alternate\s+([A-Za-z-]+)\s*\]")

# Codepoint ranges of the common scripts (ISO 15924 codes), checked in
# order.  Everything not matched (and not a special category group) is
# Zzzz.  Default group order = CLDR root: the five special groups, then
# scripts in their root-collation relative order.
_SCRIPT_RANGES: dict[str, tuple[tuple[int, int], ...]] = {
    "Latn": ((0x41, 0x5A), (0x61, 0x7A), (0xAA, 0xAA), (0xBA, 0xBA),
             (0xC0, 0x24F), (0x1E00, 0x1EFF), (0x2C60, 0x2C7F),
             (0xA720, 0xA7FF)),
    "Grek": ((0x370, 0x3FF), (0x1F00, 0x1FFF)),
    "Cyrl": ((0x400, 0x52F), (0x2DE0, 0x2DFF), (0xA640, 0xA69F)),
    "Geor": ((0x10A0, 0x10FF), (0x1C90, 0x1CBF)),
    "Armn": ((0x530, 0x58F),),
    "Hebr": ((0x590, 0x5FF),),
    "Arab": ((0x600, 0x6FF), (0x750, 0x77F), (0x8A0, 0x8FF)),
    "Deva": ((0x900, 0x97F),),
    "Beng": ((0x980, 0x9FF),),
    "Thai": ((0xE00, 0xE7F),),
    "Laoo": ((0xE80, 0xEFF),),
    "Mymr": ((0x1000, 0x109F),),
    "Khmr": ((0x1780, 0x17FF),),
    "Hang": ((0x1100, 0x11FF), (0x3130, 0x318F), (0xAC00, 0xD7AF)),
    "Hira": ((0x3040, 0x309F),),
    "Kana": ((0x30A0, 0x30FF), (0x31F0, 0x31FF)),
    "Hani": ((0x2E80, 0x2FDF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
             (0xF900, 0xFAFF)),
}
_SPECIAL_GROUPS = ("space", "punct", "symbol", "currency", "digit")
_DEFAULT_GROUPS = list(_SPECIAL_GROUPS) + list(_SCRIPT_RANGES) + ["Zzzz"]
_GROUP_BYTE_BASE = 0x04  # group weight bytes stay above the 0x01 separator


def _group_of(ch: str) -> str:
    """Reorder group of a character: special category group, script by
    codepoint range, else Zzzz."""
    cat = unicodedata.category(ch)
    if cat == "Zs" or (cat == "Cc" and ch.isspace()):
        return "space"
    if cat.startswith("P"):
        return "punct"
    if cat == "Sc":
        return "currency"
    if cat.startswith("S"):
        return "symbol"
    if cat == "Nd":
        return "digit"
    cp = ord(ch)
    for script, ranges in _SCRIPT_RANGES.items():
        for lo, hi in ranges:
            if lo <= cp <= hi:
                return script
    return "Zzzz"


def _resolve_reorder(codes: list[str]) -> dict[str, int] | None:
    """Turn a [reorder ...] code list into group -> weight byte, or None
    for the default order ([reorder none] / empty)."""
    if not codes or codes == ["none"]:
        return None
    listed: list[str] = []
    for c in codes:
        name = c if c in _DEFAULT_GROUPS else (
            "Zzzz" if c in ("others", "Zzzz") else c.lower()
            if c.lower() in _SPECIAL_GROUPS else c.capitalize()
        )
        if name not in _DEFAULT_GROUPS:
            raise NotImplementedError(
                f"[reorder] code {c!r} not in the supported group set "
                f"{_DEFAULT_GROUPS}"
            )
        if name in listed:
            raise ValueError(f"[reorder] lists {c!r} twice")
        listed.append(name)
    unlisted = [g for g in _DEFAULT_GROUPS if g not in listed]
    if "Zzzz" in listed:  # 'others' marks where every unlisted group goes
        at = listed.index("Zzzz")
        order = listed[:at] + unlisted + listed[at + 1 :]
    else:
        order = listed + unlisted
    return {g: _GROUP_BYTE_BASE + i for i, g in enumerate(order)}


def _extract_reorder(rules: str) -> tuple[list[str] | None, str]:
    """Pull [reorder ...] settings out of the rule text (last one wins,
    like ICU).  Returns (codes or None, rules with the settings removed)."""
    codes: list[str] | None = None
    for m in _REORDER.finditer(rules):
        codes = m.group(1).split()
        if not codes:
            raise ValueError("[reorder] needs at least one group code")
    return codes, _REORDER.sub(" ", rules)


def _extract_alternate(rules: str) -> tuple[bool, str]:
    """Pull [alternate shifted|non-ignorable] out of the rule text (last
    one wins).  Returns (shifted?, rules with the settings removed)."""
    shifted = False
    for m in _ALTERNATE.finditer(rules):
        mode = m.group(1).lower()
        if mode not in ("shifted", "non-ignorable"):
            raise ValueError(f"[alternate] mode {m.group(1)!r} unknown")
        shifted = mode == "shifted"
    return shifted, _ALTERNATE.sub(" ", rules)

# Relation operators, longest first so '<<<' wins over '<'.
_RELATIONS = (("<<<", 3), ("<<", 2), ("<", 1), ("=", 0))

# Weight bands (per level, one byte): SEP is 0x01; the [before n] band
# sits between SEP and the root base so before-tailored elements sort
# after every shorter/smaller string but before the anchor's root forms.
_SEC_BEFORE, _SEC_BASE, _SEC_ACCENT, _SEC_STEP = 0x02, 0x20, 0x21, 0xA8
_TER_BEFORE, _TER_LOWER, _TER_UPPER, _TER_STEP = 0x02, 0x20, 0x21, 0x28
_BEFORE_SLOTS = _SEC_BASE - _SEC_BEFORE  # 30 insertions per band


def _tokenize(rules: str) -> list[tuple[str, str]]:
    """Lex rules into ('&'|'<'|'<<'|'<<<'|'='|'TEXT', value) tokens."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(rules)
    while i < n:
        ch = rules[i]
        if ch == "#":  # comment to end of line
            nl = rules.find("\n", i)
            i = n if nl < 0 else nl + 1
            continue
        if ch.isspace():
            i += 1
            continue
        if ch == "&":
            out.append(("&", "&"))
            i += 1
            continue
        if ch == "[":
            m = _BEFORE.match(rules, i)
            if m:
                out.append(("BEFORE", m.group(1)))
                i = m.end()
                continue
        matched = False
        for op, _ in _RELATIONS:
            if rules.startswith(op, i):
                out.append((op, op))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if ch == "/":
            out.append(("/", "/"))
            i += 1
            continue
        if ch == "'":
            end = rules.find("'", i + 1)
            if end < 0:
                raise ValueError(f"unterminated quote at offset {i}")
            text = rules[i + 1 : end] or "'"  # '' is a literal apostrophe
            out.append(("TEXT", text))
            i = end + 1
            continue
        # Bare element text: run of chars that are not syntax.
        j = i
        while j < n and rules[j] not in "&<='#/" and not rules[j].isspace():
            j += 1
        out.append(("TEXT", rules[i:j]))
        i = j
    # Merge adjacent TEXT tokens (quoted + bare pieces form one element).
    merged: list[tuple[str, str]] = []
    for kind, val in out:
        if kind == "TEXT" and merged and merged[-1][0] == "TEXT":
            merged[-1] = ("TEXT", merged[-1][1] + val)
        else:
            merged.append((kind, val))
    return merged


def parse_collation_rules(
    rules: str,
) -> list[tuple[str, list[tuple[int, str, str]]]]:
    """Parse rules into chains
    ``[(anchor, [(level, element, extension), ...], before), ...]``.

    level: 1=primary-after, 2=secondary-after, 3=tertiary-after, 0=equal.
    ``extension`` is the string after a ``/`` expansion operator (usually
    empty).  ``before`` is n when the reset was ``&[before n] anchor``
    (relations place elements level-n-BEFORE the anchor), else 0; a
    [before n] chain only accepts level-n relations and '=' (ICU's other
    combinations raise NotImplementedError here).  ``[reorder ...]``
    settings are stripped here (RuleCollator reads them separately); a
    settings-only rule set parses to zero chains.  Raises ValueError on
    syntax errors and NotImplementedError on the documented out-of-scope
    constructs ([alternate], [import]) — never silently mis-sorts.
    """
    rules = _splice_imports(rules)
    reorder, rules = _extract_reorder(rules)
    shifted, rules = _extract_alternate(rules)
    bad = _UNSUPPORTED.search(rules)
    if bad:
        raise NotImplementedError(
            f"unsupported collation-rule setting {bad.group(0)!r} "
            "(only [before n]/[reorder]/[alternate]/[import] are "
            "implemented)"
        )
    tokens = _tokenize(rules)
    chains: list[tuple[str, list[tuple[int, str]]]] = []
    i = 0
    while i < len(tokens):
        if tokens[i][0] != "&":
            raise ValueError(f"expected '&' reset, got {tokens[i][1]!r}")
        i += 1
        before = 0
        if i < len(tokens) and tokens[i][0] == "BEFORE":
            before = int(tokens[i][1])
            i += 1
        if i >= len(tokens) or tokens[i][0] != "TEXT":
            raise ValueError("'&' must be followed by an anchor element")
        anchor = unicodedata.normalize("NFC", tokens[i][1])
        i += 1
        steps: list[tuple[int, str, str]] = []
        while i < len(tokens) and tokens[i][0] != "&":
            op = tokens[i][0]
            level = dict(_RELATIONS).get(op)
            if level is None:
                raise ValueError(f"expected relation, got {tokens[i][1]!r}")
            if i + 1 >= len(tokens) or tokens[i + 1][0] != "TEXT":
                raise ValueError(f"relation {op!r} missing target element")
            elem = unicodedata.normalize("NFC", tokens[i + 1][1])
            i += 2
            ext = ""
            if i < len(tokens) and tokens[i][0] == "/":
                if i + 1 >= len(tokens) or tokens[i + 1][0] != "TEXT":
                    raise ValueError("'/' expansion missing its extension")
                ext = unicodedata.normalize("NFC", tokens[i + 1][1])
                i += 2
            steps.append((level, elem, ext))
        if not steps:
            raise ValueError(f"reset &{anchor} has no relations")
        if before and any(lv not in (before, 0) for lv, _, _ in steps):
            raise NotImplementedError(
                f"[before {before}] chains accept only the "
                f"level-{before} relation and '=' (mixed-level "
                "before-chains are out of scope)"
            )
        chains.append((anchor, steps, before))
    if not chains and reorder is None and not shifted:
        raise ValueError("empty rule set")
    return chains


def _root_weights(ch: str) -> tuple[bytes, int, int]:
    """Root (untailored) per-char weights: (primary, secondary, tertiary)."""
    primary = icu_fold(ch).encode("utf-8")
    nfd = unicodedata.normalize("NFD", ch)
    secondary = _SEC_BASE
    for c in nfd:
        if unicodedata.combining(c):
            secondary = _SEC_ACCENT + (ord(c) & 0x7F)
            break
    tertiary = _TER_UPPER if ch.isupper() else _TER_LOWER
    return primary, secondary, tertiary


class RuleCollator:
    """Weights table + greedy segmenter compiled from tailoring rules."""

    def __init__(self, rules: str):
        self.rules = rules
        codes, _ = _extract_reorder(rules)
        # group name -> primary prefix byte when [reorder] is active
        self._groups = _resolve_reorder(codes) if codes else None
        self._shifted, _ = _extract_alternate(rules)
        # element text -> [(primary bytes, secondary int, tertiary int), …]
        # — one triple normally, several for '/'-expanded elements.
        self.table: dict[str, list[tuple[bytes, int, int]]] = {}
        for anchor, steps, before in parse_collation_rules(rules):
            # Anchor weights: tailored if a previous chain tailored it,
            # else root weights of the (possibly multi-char) anchor string.
            if anchor in self.table:
                anchor_triples = self.table[anchor]
            else:
                anchor_triples = [self._rw(c) for c in anchor]
            p = b"".join(tp for tp, _, _ in anchor_triples)
            if len(anchor_triples) == 1:
                s, t = anchor_triples[0][1], anchor_triples[0][2]
            elif anchor in self.table:
                s, t = anchor_triples[-1][1], anchor_triples[-1][2]
            else:
                s, t = 0x02, 0x02
            if before == 1:
                # &[before 1] anchor: relations insert primary-BEFORE the
                # anchor — rebase onto a synthetic weight just below it:
                # decrement the last primary byte and append 0xFF, which
                # sorts above every continuation of the decremented prefix
                # (no UTF-8 byte is 0xFF) yet below the anchor itself.
                if not p or p[-1] == 0:
                    raise ValueError(
                        f"[before 1] unsupported for anchor {anchor!r} "
                        "(primary weight has no predecessor)"
                    )
                p = p[:-1] + bytes([p[-1] - 1, 0xFF])
                s, t = _SEC_BASE, _TER_LOWER
            n_primary = n_secondary = n_tertiary = 0
            cur: tuple[bytes, int, int] | None = None
            for level, elem, ext in steps:
                if level == 0:  # '=' equal to the last element at all levels
                    if cur is None and before == 0:
                        # '=' directly on the anchor: inherit its FULL
                        # triple list, so '&ae = ä' makes ä byte-identical
                        # to the two-element 'ae' at every level.
                        ext_triples = []
                        for c in ext:
                            ext_triples += self.table.get(c, [self._rw(c)])
                        self.table[elem] = list(anchor_triples) + ext_triples
                        partner = elem.swapcase()
                        if (
                            len(elem) == 1
                            and partner != elem
                            and partner not in self.table
                        ):
                            first = anchor_triples[0]
                            self.table[partner] = [
                                (
                                    first[0],
                                    first[1],
                                    _TER_UPPER
                                    if partner.isupper()
                                    else _TER_LOWER,
                                )
                            ] + list(anchor_triples[1:]) + ext_triples
                        continue
                    ep, es, et = cur if cur is not None else (p, s, t)
                elif before == 2:
                    # secondary-BEFORE the anchor: anchor primary, a weight
                    # from the reserved band below the root secondary base
                    # (after every accentless root form's prefix, before
                    # the anchor's own and all its accented root forms).
                    n_secondary += 1
                    if n_secondary > _BEFORE_SLOTS:
                        raise ValueError("too many [before 2] insertions")
                    ep = p
                    es = _SEC_BEFORE + n_secondary - 1
                    et = _TER_LOWER
                elif before == 3:
                    # tertiary-BEFORE: anchor primary+secondary, tertiary
                    # from the band below the root lowercase weight.
                    n_tertiary += 1
                    if n_tertiary > _BEFORE_SLOTS:
                        raise ValueError("too many [before 3] insertions")
                    ep, es = p, s
                    et = _TER_BEFORE + n_tertiary - 1
                elif level == 1:
                    n_primary += 1
                    n_secondary = n_tertiary = 0
                    ep = p + bytes([0x80 + n_primary])
                    es, et = _SEC_BASE, _TER_LOWER
                elif level == 2:
                    n_secondary += 1
                    n_tertiary = 0
                    ep = p + (bytes([0x80 + n_primary]) if n_primary else b"")
                    es = _SEC_STEP + n_secondary
                    et = _TER_LOWER
                else:  # level == 3
                    n_tertiary += 1
                    ep = p + (bytes([0x80 + n_primary]) if n_primary else b"")
                    es = _SEC_STEP + n_secondary if n_secondary else s
                    et = _TER_STEP + n_tertiary
                cur = (ep, es, et)
                # '/' expansion: the element's weights are the tailored
                # step's weights followed by each extension char's weights
                # (tailored if the extension char is itself in the table).
                ext_triples: list[tuple[bytes, int, int]] = []
                for c in ext:
                    ext_triples += self.table.get(c, [self._rw(c)])
                self.table[elem] = [(ep, es, et)] + ext_triples
                # Auto-cover the case partner of cased single-char elements
                # at the tertiary level (shared primary, like ICU) — except
                # in [before 3] chains, where the tertiary weight IS the
                # tailoring and a root-style partner would escape the band.
                if before != 3 and len(elem) == 1 and elem.swapcase() != elem:
                    partner = elem.swapcase()
                    if partner not in self.table:
                        self.table[partner] = [
                            (
                                ep,
                                es,
                                _TER_UPPER if partner.isupper() else _TER_LOWER,
                            )
                        ] + ext_triples
        self._max_elem = max((len(e) for e in self.table), default=1)

    def _rw(self, ch: str) -> tuple[bytes, int, int]:
        """Root weights, with the [reorder] group prefix byte when script
        reordering is active (tailored primaries derive from anchor
        primaries, so they inherit the prefix automatically)."""
        p, s, t = _root_weights(ch)
        if self._groups is not None:
            p = bytes([self._groups[_group_of(ch)]]) + p
        return p, s, t

    def _segment(self, text: str) -> list[str]:
        """Greedy longest-match split into collation elements."""
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            for length in range(min(self._max_elem, n - i), 1, -1):
                if text[i : i + length] in self.table:
                    out.append(text[i : i + length])
                    i += length
                    break
            else:
                out.append(text[i])
                i += 1
        return out

    def key(self, text: str | None, strength: str = "tertiary") -> bytes:
        """Layered sort key under the tailoring (same contract as
        collation_key: unsigned byte order == collation order).  With
        [alternate shifted], variable elements (untailored single
        space/punctuation characters) drop out of the primary-tertiary
        levels and carry their primary weight on a quaternary level
        instead (non-variable elements fill with 0xFF there)."""
        if strength == "quaternary" and not self._shifted:
            strength = "identical"
        if strength not in _STRENGTHS and strength != "quaternary":
            raise ValueError(f"invalid strength {strength!r}")
        if text is None:
            return b""
        nfc = unicodedata.normalize("NFC", text)
        prim = bytearray()
        sec = bytearray()
        ter = bytearray()
        quat = bytearray()
        for elem in self._segment(nfc):
            if (
                self._shifted
                and len(elem) == 1
                and elem not in self.table
                and _group_of(elem) in ("space", "punct")
            ):
                quat += b"\x02" + self._rw(elem)[0]
                continue
            for p, s, t in self.table.get(elem) or [self._rw(elem)]:
                prim += p
                sec.append(s)
                ter.append(t)
            quat.append(0xFF)
        key = bytes(prim)
        if strength == "primary":
            return key
        key += _SEP + bytes(sec)
        if strength == "secondary":
            return key
        key += _SEP + bytes(ter)
        if strength == "tertiary":
            return key
        if self._shifted:
            key += _SEP + bytes(quat)
            if strength == "quaternary":
                return key
        return key + _SEP + nfc.encode("utf-8")


@lru_cache(maxsize=64)
def _collator(rules: str) -> RuleCollator:
    return RuleCollator(rules)


def custom_collation_key(
    text: str | None, rules: str, strength: str = "tertiary"
) -> bytes:
    """One-shot custom-rules key (compiled collator cached per rule set)."""
    return _collator(rules).key(text, strength)


def custom_collation_key_col(
    col: Column | str, rules: str, strength: str = "tertiary"
) -> Column:
    """Binary key column under custom tailoring rules — the Spark face of
    ICUCollationField custom= (Arrow-batched; the compiled collator is
    built once per executor via the lru_cache, not per batch)."""
    _collator(rules)  # validate rules on the driver, fail fast

    @pandas_udf("binary")
    def _key(s: pd.Series) -> pd.Series:
        c = _collator(rules)
        return s.map(lambda t: c.key(t, strength))

    return _key(F.col(col) if isinstance(col, str) else col)
