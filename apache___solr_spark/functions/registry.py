"""Scalar function-query registry.

The reference registers 106 function-query parsers in
solr/core/src/java/org/apache/solr/search/ValueSourceParser.java (grep
``addParser(``).  Each maps to a pyspark.sql.functions expression; this
registry keeps the Solr names so a query layer can translate function-query
strings 1:1.  Ranking primitives (tf/idf/docfreq/norm/...) are not scalar
functions here — they are columns of the index tables (dictionary/docs/
postings), see index/builder.py.

Math-expression evaluators (the 249 stream evaluators in
solrj-streaming/.../io/eval/) are inventoried in SURVEY.md §2.8 for later
rounds; the scalar subset below covers the ValueSourceParser surface.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

FUNCTION_REGISTRY: dict[str, Callable[..., Column]] = {
    # arithmetic (ValueSourceParser.java: add/sub/product/div/mod/abs/...)
    "add": lambda *cs: _fold(lambda a, b: a + b, cs),
    "sub": lambda a, b: a - b,
    "product": lambda *cs: _fold(lambda a, b: a * b, cs),
    "mul": lambda *cs: _fold(lambda a, b: a * b, cs),
    "div": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "abs": F.abs,
    "ceil": F.ceil,
    "floor": F.floor,
    "rint": F.rint,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "pow": F.pow,
    "hypot": F.hypot,
    "exp": F.exp,
    "ln": F.log,
    "log": F.log10,
    # trig
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "atan2": F.atan2,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "rad": F.radians,
    "deg": F.degrees,
    "pi": lambda: F.lit(math.pi),
    "e": lambda: F.lit(math.e),
    # logic (and/or/not/xor/if/exists/isnan/eq/gt/gte/lt/lte/def/map)
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "not": lambda a: ~a,
    "xor": lambda a, b: a ^ b,
    "if": lambda c, t, f: F.when(c, t).otherwise(f),
    "exists": lambda a: a.isNotNull(),
    "isnan": F.isnan,
    "eq": lambda a, b: a == b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "def": lambda a, d: F.coalesce(a, d),
    "map": lambda v, lo, hi, target: F.when((v >= lo) & (v <= hi), target).otherwise(v),
    # multi-value / vector (max/min/sum/sqedist/dist — ValueSourceParser)
    "max": lambda *cs: F.greatest(*cs),
    "min": lambda *cs: F.least(*cs),
    "sum": lambda *cs: _fold(lambda a, b: a + b, cs),
    "sqedist": lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ),
    "dist": lambda p, a, b: F.pow(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: F.pow(F.abs(x - y), F.lit(float(p)))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        F.lit(1.0 / float(p)),
    ),
    "field": lambda name: F.col(name) if isinstance(name, str) else name,
    # strings (concat/strdist/literal)
    "concat": F.concat,
    "strdist": lambda a, b: F.levenshtein(a, b),
    "literal": F.lit,
    # ranking-adjacent scalars available without index tables
    "linear": lambda x, m, c: x * m + c,
    "recip": lambda x, m, a, b: a / (F.lit(m) * x + F.lit(b)),
    # time (ms) — epoch millis like Solr's ms()
    "ms": lambda ts: (F.unix_timestamp(ts) * 1000 + F.date_format(ts, "SSS").cast("long")),
    # spatial (GeoDistValueSourceParser.java / HaversineConstFunction.java)
    "geodist": lambda lat, lon, clat, clon: _geodist(lat, lon, clat, clon),
    # temporal evaluators (io/eval/TemporalEvaluator*.java — each extracts
    # one java.time field from a timestamp; Spark's functions implement the
    # same ISO fields: weekofyear IS WEEK_OF_WEEK_BASED_YEAR, quarter IS
    # QUARTER_OF_YEAR; epoch returns millis per TemporalEvaluatorEpoch:40)
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "dayOfYear": F.dayofyear,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "week": F.weekofyear,
    "quarter": F.quarter,
    "epoch": lambda ts: FUNCTION_REGISTRY["ms"](ts),  # same millis expr

    "dayOfQuarter": lambda ts: (
        F.dayofyear(ts) - F.dayofyear(F.trunc(ts, "quarter")) + 1
    ),
    # PrecisionEvaluator (io/eval): round to p decimal places; applies
    # elementwise to arrays like the reference's List branch
    "precision": lambda v, p: F.round(v, int(p)),
    "precisionArr": lambda arr, p: F.transform(
        arr, lambda x: F.round(x, int(p))
    ),
}


def _geodist(lat, lon, clat, clon) -> Column:
    from apache___solr_spark.functions.spatial import geodist

    return geodist(lat, lon, float(clat), float(clon))


def _fold(op, cols):
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


def _scale(x: Column, min_out: float, max_out: float, min_in: Column, max_in: Column) -> Column:
    """scale(field, min, max) needs the global min/max — caller supplies them
    (one agg pass), keeping the function itself shuffle-free."""
    return (x - min_in) / (max_in - min_in) * (max_out - min_out) + min_out


FUNCTION_REGISTRY["scale"] = _scale


def fn(name: str, *args) -> Column:
    """Look up a Solr function-query name and apply it."""
    try:
        f = FUNCTION_REGISTRY[name]
    except KeyError:
        raise NotImplementedError(
            f"function query {name!r} not implemented (see SURVEY.md §2.8)"
        ) from None
    return f(*args)


# ---------------------------------------------------------------------------
# Function-query STRING syntax (FunctionQParser.java parseValueSource):
# nested name(arg,...) calls, bare field references, numeric literals,
# quoted string literals.  Lowered to one Column expression — whole-stage
# codegen end to end, no UDFs.
# ---------------------------------------------------------------------------

import re as _re

_FQ_TOKEN = _re.compile(
    r"""\s*(?:
        (?P<num>[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)(?![\w.(])
      | (?P<name>[A-Za-z_][\w.]*)
      | (?P<str>"[^"]*"|'[^']*')
      | (?P<punc>[(),])
    )""",
    _re.VERBOSE,
)


def _fq_tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _FQ_TOKEN.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise ValueError(f"bad function-query syntax at {s[i:]!r}")
        i = m.end()
        for kind in ("num", "name", "str", "punc"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


def parse_func_query(s: str, resolve: Callable[[str], Column] = F.col) -> Column:
    """Parse Solr function-query syntax into ONE Column expression.

    ``recip(ms(fetched_at),3.16e-11,1,1)``, ``sum(doclen,10)``,
    ``if(gt(doclen,100),1,0)`` — names followed by ``(`` look up
    FUNCTION_REGISTRY; bare names resolve to columns via ``resolve``
    (default ``F.col``); numbers/quoted strings become literals.
    ``$param`` indirection needs request context and raises.
    """
    if "$" in s:
        raise NotImplementedError("$param references need a request context")
    toks = _fq_tokenize(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take(kind=None, val=None):
        nonlocal pos
        k, v = peek()
        if k is None or (kind and k != kind) or (val and v != val):
            raise ValueError(
                f"function-query parse error at token {pos} of {s!r}"
            )
        pos += 1
        return v

    def parse_arg() -> Column:
        k, v = peek()
        if k == "num":
            take()
            return F.lit(float(v) if _re.search(r"[.eE]", v) else int(v))
        if k == "str":
            take()
            return F.lit(v[1:-1])
        if k == "name":
            take()
            nk, nv = peek()
            if nk == "punc" and nv == "(":
                take("punc", "(")
                args = []
                while True:
                    ak, av = peek()
                    if ak == "punc" and av == ")":
                        take()
                        break
                    args.append(parse_arg())
                    ck, cv = peek()
                    if ck == "punc" and cv == ",":
                        take()
                return fn(v, *args)
            return resolve(v)
        raise ValueError(f"unexpected token in function query {s!r}")

    out = parse_arg()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in function query {s!r}")
    return out
