"""Minimal Lucene-syntax query parser.

Covers the subset of the classic Solr/Lucene grammar
(solr/core/src/java/org/apache/solr/parser/QueryParser.jj:135-172) that v1
executes: bare terms (default operator OR, i.e. SHOULD), explicit ``AND``
(all plain terms become MUST), ``+term`` (MUST), ``-term`` / ``NOT term``
(MUST_NOT).  Query text is run through the same analysis chain as indexing
(the default schema uses an equivalent query analyzer minus synonyms,
managed-schema.xml:308-314), so stopwords vanish from queries too.

Phrases / fields / boosts / wildcards / fuzzy are inventoried in SURVEY.md
§2.2 for later rounds and currently raise.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from apache___solr_spark.analysis.chain import analyze


@dataclass
class ParsedQuery:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)

    @property
    def scoring_terms(self) -> list[str]:
        return self.must + self.should

    @property
    def is_empty(self) -> bool:
        return not (self.must or self.should)


_UNSUPPORTED = ('"', "~", "*", "?", "[", "]", "^", ":", "(", ")")


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
    for ch in _UNSUPPORTED:
        if ch in q:
            raise NotImplementedError(
                f"query syntax {ch!r} not supported in v1 (see SURVEY.md §2.2)"
            )
    raw = q.split()
    has_and = any(tok == "AND" for tok in raw)
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    pending_not = False
    for tok in raw:
        if tok in ("AND", "OR", "&&", "||"):
            continue
        if tok == "NOT":
            pending_not = True
            continue
        neg, forced_must = pending_not, False
        pending_not = False
        if tok.startswith("-"):
            neg = True
            tok = tok[1:]
        elif tok.startswith("+"):
            forced_must = True
            tok = tok[1:]
        terms = analyze_fn(tok)  # query-time analysis (matches the index)
        if not terms:
            continue
        if neg:
            must_not.extend(terms)
        elif forced_must or has_and:
            must.extend(terms)
        else:
            should.extend(terms)
    return ParsedQuery(
        must=_dedup(must), should=_dedup(should), must_not=_dedup(must_not)
    )
