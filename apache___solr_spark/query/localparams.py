"""Local-params QParser dispatch: ``{!type k=v ...}rest`` query strings.

Reference surface: QParserPlugin registry
(solr/core/src/java/org/apache/solr/search/QParserPlugin.java standardPlugins
+ the per-plugin classes TermQParserPlugin.java, PrefixQParserPlugin.java,
FieldQParserPlugin.java, BoolQParserPlugin.java, BoostQParserPlugin.java,
LuceneQParserPlugin.java; local-params syntax parsed in QueryParsing.java).

The full-text-shaped parsers dispatch onto the engine here; the
table-shaped parsers already exist as DataFrame combinators and raise a
pointer to them rather than pretending (``{!join}`` ->
operators.streams.intersect, ``{!collapse}`` -> operators.streams.collapse,
``{!frange}`` -> functions.registry, ``{!knn}`` ->
pipeline.similarity / expr knnSearch).

Mechanics per plugin, mirroring reference semantics:

- ``{!lucene}``  classic grammar (the default) — engine.search unchanged.
- ``{!term f=F}value``  exact term, NO analysis (TermQParserPlugin.java:49
  constructs a TermQuery from the raw readable value).
- ``{!field f=F}value``  the value goes THROUGH the analyzer; multiple
  tokens become a phrase (FieldQParserPlugin.java:43 -> getFieldQuery).
- ``{!prefix f=F}pre``  raw prefix, no analysis (PrefixQParserPlugin.java:40).
- ``{!bool must=... should=... must_not=... filter=...}``  composes clause
  queries (BoolQParserPlugin.java:52-77); here each operand is a query
  string composed into the recursive grammar.
- ``{!boost b=N}q``  multiplies every scoring clause of q by N
  (BoostQParserPlugin.java — constant multiplier variant).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from apache___solr_spark.query.parser import ParsedQuery

_LP_RE = re.compile(r"^\s*\{!\s*([^}]*)\}(.*)$", re.DOTALL)
_KV_RE = re.compile(r"(\w+)=(\"[^\"]*\"|'[^']*'|\S+)|(\S+)")


def parse_local_params(q: str) -> tuple[str | None, dict[str, str], str]:
    """Split ``{!type k=v}rest`` -> (type, params, rest).

    Returns (None, {}, q) when q carries no local params.  A bare first
    token is the parser type (``{!term f=x}``); ``type=`` also works.
    ``$param`` references need a request context we don't have — raise.
    """
    m = _LP_RE.match(q)
    if not m:
        return None, {}, q
    body, rest = m.group(1).strip(), m.group(2).strip()
    ptype: str | None = None
    params: dict[str, str] = {}
    for kv in _KV_RE.finditer(body):
        if kv.group(3) is not None:
            if ptype is None:
                ptype = kv.group(3)
            continue
        k, v = kv.group(1), kv.group(2)
        if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
            v = v[1:-1]
        if v.startswith("$"):
            raise NotImplementedError(
                "$param references need a request-parameter context"
            )
        if k == "type":
            ptype = v
        else:
            params[k] = v
    return ptype or "lucene", params, rest


_TABLE_SHAPED = {
    "join": "operators.streams.intersect/score_join (DataFrame join)",
    "collapse": "operators.streams.collapse",
    "frange": "functions.registry (function-query exprs over columns)",
    "knn": "pipeline.similarity.cosine_topk_* / expr knnSearch",
    "graph": "operators.graph.gather_nodes/shortest_path",
    "parent": "operators.streams.block_join_parent",
    "child": "operators.streams.block_join_children",
    "terms": "Column.isin / broadcast semi-join",
}


def _check_field(params: dict[str, str]) -> None:
    f = params.get("f")
    if f not in (None, "text"):
        raise NotImplementedError(
            f"single-field index: f={f!r} unsupported (only 'text')"
        )


def dispatch_query(engine, q: str, k: int = 10, **kw) -> DataFrame:
    """Run a local-params query through ``engine`` (a SearchEngine)."""
    ptype, params, rest = parse_local_params(q)
    if ptype is None or ptype == "lucene":
        return engine.search(rest if ptype else q, k=k, **kw)

    if ptype == "term":
        _check_field(params)
        return engine.search(ParsedQuery(must=[rest]), k=k, **kw)

    if ptype == "field":
        _check_field(params)
        toks = engine._analyze(rest)
        if not toks:
            return engine.search(ParsedQuery(), k=k, **kw)
        if len(toks) == 1:
            return engine.search(ParsedQuery(must=[toks[0]]), k=k, **kw)
        return engine.search(ParsedQuery(must_phrases=[toks]), k=k, **kw)

    if ptype == "prefix":
        _check_field(params)
        # raw prefix -> classic grammar handles expansion + scoring
        return engine.search(f"{rest}*", k=k, **kw)

    if ptype == "bool":
        parts: list[str] = []
        occur_map = {"must": "+", "filter": "+", "should": "", "must_not": "-"}
        for key, sign in occur_map.items():
            v = params.get(key)
            if v:
                parts.append(f"{sign}({v})")
        if not parts:
            raise ValueError("{!bool} needs must/should/must_not/filter")
        return engine.search(" ".join(parts), k=k, **kw)

    if ptype == "boost":
        b = float(params.get("b", 1.0))
        return engine.search(f"({rest})^{b}", k=k, **kw)

    if ptype in _TABLE_SHAPED:
        raise NotImplementedError(
            f"{{!{ptype}}} is table-shaped here — use {_TABLE_SHAPED[ptype]}"
        )
    raise NotImplementedError(f"unknown query parser {ptype!r}")
