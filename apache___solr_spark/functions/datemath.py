"""Solr date-math expressions as Column transforms.

Reference: solr/solrj/src/java/org/apache/solr/util/DateMathParser.java —
expressions like ``NOW/DAY+7DAYS-1HOUR`` anchored at NOW (or a column):
``/UNIT`` truncates, ``+N UNIT`` / ``-N UNIT`` shifts.  Spark-first this
compiles to date_trunc / make_interval arithmetic on a timestamp column;
``now`` must be passed explicitly (a batch engine wants a pinned snapshot
time, and tests need determinism).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT = {
    "YEAR": "year", "YEARS": "year", "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day",
    "HOUR": "hour", "HOURS": "hour", "MINUTE": "minute", "MINUTES": "minute",
    "SECOND": "second", "SECONDS": "second",
    "MILLI": "millisecond", "MILLIS": "millisecond",
    "MILLISECOND": "millisecond", "MILLISECONDS": "millisecond",
}

_TOKEN = re.compile(r"(/([A-Z]+))|([+-])(\d+)([A-Z]+)")


def _interval(unit: str, n: int) -> Column:
    kw = {
        "year": dict(years=F.lit(n)),
        "month": dict(months=F.lit(n)),
        "day": dict(days=F.lit(n)),
        "hour": dict(hours=F.lit(n)),
        "minute": dict(mins=F.lit(n)),
        "second": dict(secs=F.lit(n)),
        "millisecond": dict(secs=F.lit(n / 1000.0)),
    }[unit]
    return F.make_interval(**kw)


def date_math(anchor: Column, expr: str) -> Column:
    """Apply a Solr date-math suffix (everything after ``NOW``) to a
    timestamp column, e.g. ``date_math(col, "/DAY+7DAYS-1HOUR")``."""
    out = anchor
    pos = 0
    for m in _TOKEN.finditer(expr):
        if m.start() != pos:
            raise ValueError(f"bad date math at {expr[pos:]!r}")
        pos = m.end()
        if m.group(1):  # /UNIT truncation
            unit = _UNIT.get(m.group(2))
            if unit is None or unit == "millisecond":
                raise ValueError(f"cannot truncate to {m.group(2)}")
            out = F.date_trunc(unit, out)
        else:
            sign, n, u = m.group(3), int(m.group(4)), _UNIT.get(m.group(5))
            if u is None:
                raise ValueError(f"unknown unit {m.group(5)}")
            iv = _interval(u, n)
            out = out + iv if sign == "+" else out - iv
    if pos != len(expr):
        raise ValueError(f"bad date math at {expr[pos:]!r}")
    return out
