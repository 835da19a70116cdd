"""Lucene-syntax query parser: terms, boolean operators, quoted phrases.

Covers the subset of the classic Solr/Lucene grammar
(solr/core/src/java/org/apache/solr/parser/QueryParser.jj:135-172) that the
engine executes: bare terms (default operator OR, i.e. SHOULD), ``AND``
binding its ADJACENT clauses to MUST (Lucene conjunction semantics:
``a AND b c`` == ``+a +b c``), ``+term`` (MUST), ``-term`` / ``NOT term``
(MUST_NOT), and quoted phrases ``"a b c"`` in any of those roles.  Query
text is run through the same analysis chain as indexing (the default schema
uses an equivalent query analyzer minus synonyms, managed-schema.xml:308-314).

Phrase slop (``"a b"~2``), fields, boosts, wildcards and fuzzy are
inventoried in SURVEY.md §2.2 and currently raise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from apache___solr_spark.analysis.chain import analyze


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

    @property
    def scoring_terms(self) -> list[str]:
        return self.must + self.should

    @property
    def scoring_phrases(self) -> list[list[str]]:
        return self.must_phrases + self.should_phrases

    @property
    def is_empty(self) -> bool:
        return not (
            self.must or self.should or self.must_phrases or self.should_phrases
        )


_UNSUPPORTED = ("~", "*", "?", "[", "]", "^", ":", "(", ")")

# a token is either an optionally-signed quoted phrase (with optional ~slop)
# or a bare word
_TOKEN_RE = re.compile(r'([+-]?)"([^"]*)"(?:~(\d+))?|(\S+)')


def _dedup(xs: list[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def parse_query(q: str, analyze_fn=analyze) -> ParsedQuery:
    """Parse ``q`` with the given query-time analysis function (defaults to
    the standard chain; the engine passes its index's configured analyzer so
    query analysis always matches index analysis)."""
    # clause list: [occur, kind, payload]; occur in MUST/SHOULD/MUST_NOT,
    # kind in term/phrase.  AND promotes the PREVIOUS should-clause and the
    # NEXT clause (QueryParser.jj conjunction handling).
    clauses: list[list] = []
    pending_not = False
    conj: str | None = None
    for m in _TOKEN_RE.finditer(q):
        sign, body, slop, word = m.group(1), m.group(2), m.group(3), m.group(4)
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
            sign = ""
            if word.startswith("-"):
                sign, word = "-", word[1:]
            elif word.startswith("+"):
                sign, word = "+", word[1:]
            for ch in _UNSUPPORTED + ('"',):
                if ch in word:
                    raise NotImplementedError(
                        f"query syntax {ch!r} not supported (see SURVEY.md §2.2)"
                    )
            toks = analyze_fn(word)
            kind = "term"
        else:
            if slop and int(slop) > 0:
                raise NotImplementedError(
                    "phrase slop > 0 not supported (exact adjacency only)"
                )
            toks = analyze_fn(body)
            kind = "phrase" if len(toks) > 1 else "term"
        if not toks:
            pending_not = False
            conj = None
            continue
        occur = (
            "MUST_NOT"
            if (pending_not or sign == "-")
            else ("MUST" if (sign == "+" or conj == "AND") else "SHOULD")
        )
        if kind == "term":
            for t in toks:
                clauses.append([occur, "term", t])
        else:
            clauses.append([occur, "phrase", toks])
        pending_not = False
        conj = None

    pq = ParsedQuery()
    for occur, kind, payload in clauses:
        if kind == "term":
            {"MUST": pq.must, "SHOULD": pq.should, "MUST_NOT": pq.must_not}[
                occur
            ].append(payload)
        else:
            {
                "MUST": pq.must_phrases,
                "SHOULD": pq.should_phrases,
                "MUST_NOT": pq.must_not_phrases,
            }[occur].append(payload)
    pq.must = _dedup(pq.must)
    pq.should = _dedup(pq.should)
    pq.must_not = _dedup(pq.must_not)
    return pq
