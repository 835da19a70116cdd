"""JSON Request API — the reference's JSON query DSL front door.

Reference surface: `solr/core/src/java/org/apache/solr/request/json/
RequestUtil.java` (merges the JSON body into request params: query ->
q, filter -> fq, limit/offset -> rows/start, sort/fields/params) and
`JsonQueryConverter.java` (lowers a JSON query object to a local-params
string, hoisting nested values into generated ``_tt<N>`` request
parameters referenced as ``$_ttN``) — which is exactly the
request-parameter macro machinery :func:`dispatch_query` already has,
so the whole API is a translation layer with ONE execution path.

Supported query forms (RequestUtil/JsonQueryConverter):

- a plain string — the classic grammar;
- ``{"param": "name"}`` — a reference to a request parameter;
- ``{"<parser>": "body"}`` / ``{"<parser>": {..params.., "query": sub}}``
  — any registered QParser; scalar params inline, unsafe/nested values
  hoist into generated ``_tt<N>`` params;
- ``{"bool": {"must": [...], "should": ..., "must_not": ...,
  "filter": ...}}`` with string (classic) operands — composed into the
  recursive classic grammar (``filter`` operands become real fq-style
  non-scoring MUSTs via the engine's fq list).  Parser OBJECTS inside
  bool clauses raise honestly (the one JsonQueryConverter form not
  modeled: arbitrary-parser sub-queries inside {!bool}).

Request keys: ``query``, ``filter`` (list), ``limit``/``offset``,
``sort`` (classic-string queries only — TopFieldCollector path),
``fields`` (projection), ``params`` (plain request params the macros
resolve against).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from apache___solr_spark.query.localparams import dispatch_query

_SAFE_VALUE = re.compile(r"[\w.,*\[\]\-+:]+\Z")


def _hoist(value, params: dict, counter: list) -> str:
    name = f"_tt{counter[0]}"
    counter[0] += 1
    params[name] = value
    return name


def convert_json_query(obj, params: dict, counter: list) -> str:
    """JsonQueryConverter.java analog: JSON query object -> local-params
    string, mutating ``params`` with hoisted ``_tt<N>`` values."""
    if isinstance(obj, str):
        return obj
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError(
            "a JSON query must be a string or a single-key parser object"
        )
    ((name, body),) = obj.items()
    if name == "param":
        return f"{{!query v=${body}}}"
    if name == "bool":
        return _convert_bool(body, params, counter)
    if isinstance(body, (str, int, float)) and not isinstance(body, bool):
        pname = _hoist(str(body), params, counter)
        return f"{{!{name} v=${pname}}}"
    if not isinstance(body, dict):
        raise ValueError(f"parser {name!r}: body must be a string or object")
    parts: list[str] = []
    for key, val in body.items():
        if key in ("query", "v"):
            if isinstance(val, dict):
                sub = convert_json_query(val, params, counter)
                pname = _hoist(sub, params, counter)
            else:
                pname = _hoist(str(val), params, counter)
            parts.append(f"v=${pname}")
            continue
        if isinstance(val, bool):
            parts.append(f"{key}={str(val).lower()}")
        elif isinstance(val, (int, float)):
            parts.append(f"{key}={val}")
        elif isinstance(val, str) and _SAFE_VALUE.fullmatch(val):
            parts.append(f"{key}={val}")
        elif isinstance(val, (str, list, tuple)):
            pname = _hoist(
                list(val) if isinstance(val, (list, tuple)) else val,
                params,
                counter,
            )
            parts.append(f"{key}=${pname}")
        else:
            raise ValueError(f"parser {name!r}: unsupported value for {key!r}")
    return "{!" + name + (" " + " ".join(parts) if parts else "") + "}"


def _convert_bool(body, params: dict, counter: list) -> str:
    """``{"bool": {...}}`` with classic-string operands -> one recursive
    classic-grammar string (BoolQParser occur composition: must ->
    ``+(q)``, must_not -> ``-(q)``, should -> ``(q)``, filter -> a
    non-scoring ``+(q)^0``  — constant-zero score, FILTER occur)."""
    if not isinstance(body, dict):
        raise ValueError("bool: body must be an object")
    parts: list[str] = []
    for key, sign, boost0 in (
        ("must", "+", False),
        ("filter", "+", True),
        ("should", "", False),
        ("must_not", "-", False),
    ):
        vals = body.get(key)
        if vals is None:
            continue
        if not isinstance(vals, (list, tuple)):
            vals = [vals]
        for v in vals:
            if isinstance(v, dict) and len(v) == 1 and "bool" in v:
                sub = _convert_bool(v["bool"], params, counter)
            elif isinstance(v, str):
                sub = v
            else:
                raise NotImplementedError(
                    "bool: parser-object sub-queries are not modeled "
                    "(classic-string and nested bool operands only)"
                )
            parts.append(
                f"{sign}({sub})^0" if boost0 else f"{sign}({sub})"
            )
    if not parts:
        raise ValueError("bool: no clauses")
    return " ".join(parts)


def json_request(engine, req: dict, request: dict | None = None, **kw) -> DataFrame:
    """Execute a JSON Request API body against a :class:`SearchEngine`.

    ``request`` seeds extra request parameters (merged under the body's
    own ``params``); ``kw`` passes through to :func:`dispatch_query`
    (``vectors_df=`` etc. for data-arg parsers).
    """
    if not isinstance(req, dict):
        raise ValueError("JSON request must be an object")
    known = {"query", "filter", "limit", "offset", "sort", "fields", "params"}
    unknown = set(req) - known
    if unknown:
        raise ValueError(f"unknown JSON request keys {sorted(unknown)}")
    params = dict(request or {})
    params.update(req.get("params") or {})
    counter = [0]
    q = convert_json_query(req.get("query", "*:*"), params, counter)
    filters = req.get("filter") or []
    if not isinstance(filters, (list, tuple)):
        filters = [filters]
    fq = [convert_json_query(f, params, counter) for f in filters]
    k = int(req.get("limit", 10))
    start = int(req.get("offset", 0))
    sort = req.get("sort")
    if q == "*:*":
        # MatchAllDocsQuery spelling accepted by RequestUtil's default;
        # offset pages by the global rank column like every other path
        from pyspark.sql import functions as F

        from apache___solr_spark.query.xmlparser import run_xml_query

        if fq or sort is not None:
            raise NotImplementedError("*:* with filter/sort: use a query")
        out = run_xml_query(engine, "<MatchAllDocsQuery/>", k=start + k)
        if start:
            out = out.filter(F.col("rank") > start)
    elif sort is not None:
        if q.lstrip().startswith("{!") or any(
            f.lstrip().startswith("{!") for f in fq
        ):
            # sorted_search's fq path parses classic strings only (no
            # local-params resolution) — a {!...} filter would silently
            # tokenize as literal terms, so refuse instead
            raise NotImplementedError(
                "sort with a parser-object query/filter is not modeled "
                "(classic-string queries and filters sort)"
            )
        out = engine.sorted_search(q, str(sort), k=k, start=start, fq=fq)
    else:
        # uniform offset paging: ask the dispatch for the collector depth
        # start+k and slice by the GLOBAL rank column — works for every
        # parser branch (many accept no start kwarg), and ranks stay
        # global like the reference's response window
        from pyspark.sql import functions as F

        out = dispatch_query(
            engine, q, k=start + k, fq=fq, request=params, **kw
        )
        if start:
            if "rank" not in out.columns:
                raise NotImplementedError(
                    "offset with a parser returning no rank column"
                )
            out = out.filter(F.col("rank") > start)
    fields = req.get("fields")
    if fields:
        if isinstance(fields, str):
            fields = [f.strip() for f in fields.split(",") if f.strip()]
        out = out.select(*fields)
    return out


def json_facet_request(
    engine, req: dict, request: dict | None = None
) -> dict:
    """The JSON Request API's ``facet`` section (RequestUtil merges it
    into a FacetModule request): facets evaluate over the DOMAIN of docs
    matching ``query`` + ``filter`` — here the docset semi-joined onto
    the docs table, handed to the JSON Facet DSL
    (operators/json_facet.py).  Returns facet path -> DataFrame.

    The query/filter entries must lower through the engine-shaped parser
    subset (classic strings, {!term}/{!field}/{!prefix}/{!bool}/...);
    exotic parsers raise like fq does.  Multi-select ``excludeTags``
    domains are not wired through this entrance (pass tagged predicates
    to ``json_facet`` directly for that) — documented gap.
    """
    from apache___solr_spark.operators.json_facet import json_facet
    from apache___solr_spark.query.localparams import _fq_query_obj

    if not isinstance(req, dict) or "facet" not in req:
        raise ValueError("json_facet_request needs a 'facet' section")
    params = dict(request or {})
    params.update(req.get("params") or {})
    counter = [0]
    q = convert_json_query(req.get("query", "*:*"), params, counter)
    filters = req.get("filter") or []
    if not isinstance(filters, (list, tuple)):
        filters = [filters]
    ds = None
    queries = ([] if q == "*:*" else [q]) + [
        convert_json_query(f, params, counter) for f in filters
    ]
    for qq in queries:
        d = engine.docset(_fq_query_obj(engine, qq, params))
        ds = d if ds is None else ds.join(d, "doc_id", "left_semi")
    domain = (
        engine.docs if ds is None else engine.docs.join(ds, "doc_id", "left_semi")
    )
    if engine.deletes is not None:
        domain = domain.join(engine.deletes, "doc_id", "left_anti")
    return json_facet(domain, req["facet"])
