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
