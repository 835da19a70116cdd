"""Lucene-syntax query parser: terms, boolean ops, phrases, multi-term.

Covers the classic Solr/Lucene grammar
(solr/core/src/java/org/apache/solr/parser/QueryParser.jj:135-172) that the
engine executes:

- bare terms (default operator OR, i.e. SHOULD)
- ``AND`` binding its ADJACENT clauses to MUST (Lucene conjunction
  semantics: ``a AND b c`` == ``+a +b c``), ``+term``, ``-term``/``NOT``
- quoted phrases ``"a b c"`` in any role
- field prefix ``text:term`` (the engine is single-text-field; any other
  field name raises)
- boosts ``term^2.5`` / ``"a b"^3`` (clause score multiplied)
- multi-term clauses expanded against the term dictionary at query time
  (SolrQueryParserBase.getWildcardQuery/getPrefixQuery/getFuzzyQuery/
  getRangeQuery; expansion itself happens in the engine, which owns the
  dictionary): ``pre*`` prefix, ``w?ld*rd`` wildcard, ``term~``/``term~1``
  fuzzy (levenshtein), ``[a TO b]`` / ``{a TO b}`` lexicographic term range
- single-level parenthesized OR groups of plain terms — ``(a b) AND c``,
  ``+(a b)``, ``-(x y)`` — one disjunction clause per group (the common
  grouped-boolean shape; nested parens or operators inside groups raise).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from apache___solr_spark.analysis.chain import analyze


@dataclass
class Clause:
    """A multi-term (dictionary-expanded) clause."""

    occur: str  # MUST | SHOULD | MUST_NOT
    kind: str  # prefix | wildcard | fuzzy | range
    value: str = ""  # pattern / base term
    terms: list[str] | None = None  # literal disjunction group "(a b c)"
    lo: str | None = None  # range bounds
    hi: str | None = None
    inclusive: bool = True
    fuzz: int = 2
    boost: float = 1.0

    @property
    def label(self) -> str:
        if self.kind == "group":
            return "(" + " ".join(self.terms or []) + ")"
        if self.kind == "range":
            br = "[]" if self.inclusive else "{}"
            return f"{br[0]}{self.lo} TO {self.hi}{br[1]}"
        if self.kind == "fuzzy":
            return f"{self.value}~{self.fuzz}"
        return self.value


@dataclass
class ParsedQuery:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    # phrases: analyzed token sequences (order kept, duplicates kept).
    # Positions are post-filter indices, so a stopword inside a standard-
    # chain phrase vanishes without a gap (see IndexConfig.store_positions).
    must_phrases: list[list[str]] = field(default_factory=list)
    should_phrases: list[list[str]] = field(default_factory=list)
    must_not_phrases: list[list[str]] = field(default_factory=list)
    # clause label (term or phrase label) -> score multiplier, only when != 1
    boosts: dict[str, float] = field(default_factory=dict)
    # dictionary-expanded clauses (prefix/wildcard/fuzzy/range)
    expand: list[Clause] = field(default_factory=list)

    @property
    def scoring_terms(self) -> list[str]:
        return self.must + self.should

    @property
    def scoring_phrases(self) -> list[list[str]]:
        return self.must_phrases + self.should_phrases

    @property
    def is_empty(self) -> bool:
        return not (
            self.must
            or self.should
            or self.must_phrases
            or self.should_phrases
            or self.expand
        )


_UNSUPPORTED: tuple = ()

# a token is either an optionally-signed quoted phrase (with optional ~slop
# and ^boost) or a bare word
_TOKEN_RE = re.compile(
    r'([+-]?)"([^"]*)"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?|(\S+)'
)
_WORD_RE = re.compile(
    r"^([+-]?)"  # sign
    r"(?:(\w+):)?"  # field
    r"(.+?)"  # body (lazy)
    r"(?:~(\d*))?"  # fuzzy
    r"(?:\^(\d+(?:\.\d+)?))?$"  # boost
)
_RANGE_RE = re.compile(r"^([\[{])(\S+) TO (\S+)([\]}])$")


def _dedup(xs: list[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def parse_query(q: str, analyze_fn=analyze, default_field: str = "text") -> ParsedQuery:
    """Parse ``q`` with the given query-time analysis function (defaults to
    the standard chain; the engine passes its index's configured analyzer so
    query analysis always matches index analysis)."""
    # single-level parenthesized OR groups: rewrite "(a b)" into one token
    # with \x01-joined members so tokenization keeps them together
    def _group_sub(m):
        toks = [t for t in m.group(2).split() if t not in ("OR", "||")]
        if not toks or any(
            t in ("AND", "&&", "NOT")
            or any(ch in t for ch in '()"+-~^:*?[]{}')
            for t in toks
        ):
            raise NotImplementedError(
                "only flat OR groups of plain terms are supported in parens"
            )
        return m.group(1) + "\x01".join(toks)

    q = re.sub(r"([+-]?)\(([^()]*)\)", _group_sub, q)
    if "(" in q or ")" in q:
        raise NotImplementedError(
            "nested parentheses are not supported (see SURVEY.md §2.2)"
        )
    # normalize range clauses so the whitespace in "[a TO b]" survives
    # tokenization: temporarily replace their inner spaces
    q = re.sub(
        r"([\[{])(\S+)\s+TO\s+(\S+)([\]}])",
        lambda m: f"{m.group(1)}{m.group(2)}\x00TO\x00{m.group(3)}{m.group(4)}",
        q,
    )
    # clause list: [occur, kind, payload, boost]
    clauses: list[list] = []
    pending_not = False
    conj: str | None = None

    def occur_of(sign: str) -> str:
        return (
            "MUST_NOT"
            if (pending_not or sign == "-")
            else ("MUST" if (sign == "+" or conj == "AND") else "SHOULD")
        )

    for m in _TOKEN_RE.finditer(q):
        sign, body, slop, pboost, word = m.groups()
        if word is not None:
            if word in ("AND", "&&"):
                if clauses and clauses[-1][0] == "SHOULD":
                    clauses[-1][0] = "MUST"
                conj = "AND"
                continue
            if word in ("OR", "||"):
                conj = "OR"
                continue
            if word == "NOT":
                pending_not = True
                continue
            word = word.replace("\x00", " ")
            if "\x01" in word:
                gsign = ""
                if word.startswith("-"):
                    gsign, word = "-", word[1:]
                elif word.startswith("+"):
                    gsign, word = "+", word[1:]
                gtoks = [
                    t for w in word.split("\x01") for t in analyze_fn(w)
                ]
                if gtoks:
                    clauses.append(
                        [
                            occur_of(gsign),
                            "expand",
                            Clause(occur="", kind="group", terms=gtoks),
                            1.0,
                        ]
                    )
                pending_not = False
                conj = None
                continue
            wm = _WORD_RE.match(word)
            if not wm:
                raise NotImplementedError(f"cannot parse token {word!r}")
            sign, fld, body_w, fuzz, boost = wm.groups()
            if fld is not None and fld != default_field:
                raise NotImplementedError(
                    f"unknown field {fld!r} (single-field engine; see SURVEY §1.3)"
                )
            boost_v = float(boost) if boost else 1.0
            rm = _RANGE_RE.match(body_w)
            if rm:
                lo, hi = rm.group(2).lower(), rm.group(3).lower()
                clauses.append(
                    [
                        occur_of(sign),
                        "expand",
                        Clause(
                            occur="",
                            kind="range",
                            lo=None if lo == "*" else lo,
                            hi=None if hi == "*" else hi,
                            inclusive=rm.group(1) == "[",
                            boost=boost_v,
                        ),
                        boost_v,
                    ]
                )
            elif fuzz is not None:
                base = body_w.lower()
                clauses.append(
                    [
                        occur_of(sign),
                        "expand",
                        Clause(
                            occur="",
                            kind="fuzzy",
                            value=base,
                            fuzz=int(fuzz) if fuzz else 2,
                            boost=boost_v,
                        ),
                        boost_v,
                    ]
                )
            elif "*" in body_w or "?" in body_w:
                kind = (
                    "prefix"
                    if body_w.endswith("*")
                    and "?" not in body_w
                    and "*" not in body_w[:-1]
                    else "wildcard"
                )
                clauses.append(
                    [
                        occur_of(sign),
                        "expand",
                        Clause(
                            occur="", kind=kind, value=body_w.lower(), boost=boost_v
                        ),
                        boost_v,
                    ]
                )
            else:
                toks = analyze_fn(body_w)
                if not toks:
                    pending_not = False
                    conj = None
                    continue
                for t in toks:
                    clauses.append([occur_of(sign), "term", t, boost_v])
        else:
            if slop and int(slop) > 0:
                raise NotImplementedError(
                    "phrase slop > 0 not supported (exact adjacency only)"
                )
            toks = analyze_fn(body)
            if not toks:
                pending_not = False
                conj = None
                continue
            boost_v = float(pboost) if pboost else 1.0
            kind = "phrase" if len(toks) > 1 else "term"
            clauses.append(
                [occur_of(sign), kind, toks if kind == "phrase" else toks[0], boost_v]
            )
        pending_not = False
        conj = None

    pq = ParsedQuery()
    for occur, kind, payload, boost in clauses:
        if kind == "term":
            {"MUST": pq.must, "SHOULD": pq.should, "MUST_NOT": pq.must_not}[
                occur
            ].append(payload)
            if boost != 1.0:
                pq.boosts[payload] = boost
        elif kind == "phrase":
            {
                "MUST": pq.must_phrases,
                "SHOULD": pq.should_phrases,
                "MUST_NOT": pq.must_not_phrases,
            }[occur].append(payload)
            if boost != 1.0:
                pq.boosts['"' + " ".join(payload) + '"'] = boost
        else:  # expand
            payload.occur = occur
            pq.expand.append(payload)
    pq.must = _dedup(pq.must)
    pq.should = _dedup(pq.should)
    pq.must_not = _dedup(pq.must_not)
    return pq
