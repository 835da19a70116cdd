"""Solr q-syntax over STRUCTURED columns -> Catalyst predicates.

The common subset of the classic syntax that appears in streaming
expressions and JSON Facet ``query``/``q`` params against non-text fields
(reference grammar: solr/core/src/java/org/apache/solr/parser/
QueryParser.jj; full-text queries go through
:mod:`apache___solr_spark.query.parser` + the BM25 engine instead):

  ``*:*`` | ``field:value`` | ``field:"quoted"`` | ``-clause`` |
  ``field:[a TO b]`` / ``{a TO b}`` (``*`` = open end) |
  ``field:(v1 v2)`` OR-groups | whitespace/AND conjunction

Lowering to Column expressions keeps these filters in whole-stage codegen
and eligible for parquet predicate pushdown — at 100 TB the q string
becomes a scan-level PushedFilter, never a UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def coerce_literal(v: str):
    """int -> float -> string, the order DuckDB/Spark literals bind."""
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


_TOKEN_RE = re.compile(
    r"(-?)([\w.]+):" r"(\"[^\"]*\"|\[[^\]]*\]|\{[^}]*\}|\([^)]*\)|\S+)"
)


def structured_q_predicate(q: str) -> Column | None:
    """Translate a structured-field q string to one Column predicate;
    ``None`` means match-all (``*:*`` or empty)."""
    q = q.strip()
    if q in ("", "*:*"):
        return None
    pred = None
    for neg, clause in _q_tokens(q):
        col = ~clause if neg else clause
        pred = col if pred is None else (pred & col)
    return pred


def _q_tokens(q: str) -> list[tuple[bool, Column]]:
    out = []
    for m in _TOKEN_RE.finditer(q):
        out.append((m.group(1) == "-", _q_clause(m.group(2), m.group(3))))
    leftover = _TOKEN_RE.sub("", q).replace("AND", "").strip()
    if leftover:
        raise ValueError(f"unsupported q syntax near {leftover!r} in {q!r}")
    return out


def _q_clause(fld: str, val: str) -> Column:
    c = F.col(fld)
    if val.startswith('"') and val.endswith('"'):
        return c == val[1:-1]
    if val[0] in "[{" and val[-1] in "]}":
        lo_inc, hi_inc = val[0] == "[", val[-1] == "]"
        m = re.match(r"^[\[{]\s*(\S+)\s+TO\s+(\S+)\s*[\]}]$", val)
        if not m:
            raise ValueError(f"bad range syntax: {fld}:{val}")
        lo, hi = m.group(1), m.group(2)
        pred = None
        if lo != "*":
            pred = c >= coerce_literal(lo) if lo_inc else c > coerce_literal(lo)
        if hi != "*":
            p = c <= coerce_literal(hi) if hi_inc else c < coerce_literal(hi)
            pred = p if pred is None else (pred & p)
        return pred if pred is not None else c.isNotNull()
    if val.startswith("(") and val.endswith(")"):
        opts = [coerce_literal(v.strip('"')) for v in val[1:-1].split() if v != "OR"]
        return c.isin(opts)
    return c == coerce_literal(val)
