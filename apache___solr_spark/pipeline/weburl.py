"""URL canonicalization for web corpora.

The reference ships URL normalization as an update-processor concern
(URLClassifyProcessor — solr/core/src/java/org/apache/solr/update/
processor/URLClassifyProcessorFactory.java: computes url_length,
url_levels, canonical url, top-level-page / landing-page flags); web-scale
pipelines additionally need it as the key for URL-level dedup and
host-level aggregation.  This module is the Spark-native version: one
projection of built-in column expressions (regexp + array ops), no UDF,
no shuffle — a map-only pass that pipelines with downstream dedup.

Canonical form (documented contract, mirrored by the test oracle):

- scheme lowercased; ``http``/``https`` only recognized as web URLs —
  others pass through with scheme/host nulls.
- userinfo stripped; host lowercased, trailing dot removed.
- default ports stripped (``:80`` for http, ``:443`` for https); other
  ports kept.
- path: empty becomes ``/``; duplicate slashes collapsed; trailing
  ``index.html`` / ``index.htm`` / ``index.php`` removed (the
  URLClassifyProcessor canonicalization rule).
- query: tracking params dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``mc_eid``, ``igshid``, ``ref``, ``ref_src``), remaining
  params sorted bytewise; empty query drops the ``?``.
- fragment dropped.

Outputs per row: ``url_canon``, ``host``, ``domain`` (naive
last-two-labels registrable domain — documented approximation; a real
public-suffix list plugs in where precision matters), ``url_levels``
(path depth, URLClassifyProcessor's levels), ``is_top_page`` (landing
page: path ``/`` and no query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)="

_WEB_URL_RE = r"^([hH][tT][tT][pP][sS]?)://([^/?#]*)([^?#]*)(\?([^#]*))?"


def _canon_parts(url: Column):
    scheme = F.lower(F.regexp_extract(url, _WEB_URL_RE, 1))
    authority = F.regexp_extract(url, _WEB_URL_RE, 2)
    raw_path = F.regexp_extract(url, _WEB_URL_RE, 3)
    raw_query = F.regexp_extract(url, _WEB_URL_RE, 5)

    # userinfo off, then split host[:port]
    hostport = F.element_at(F.split(authority, "@"), -1)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"\.$", ""
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = F.when(scheme == "http", "80").otherwise("443")
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    path = F.regexp_replace(raw_path, r"/{2,}", "/")
    path = F.when(path == "", "/").otherwise(path)
    path = F.regexp_replace(path, r"/index\.(html?|php)$", "/")

    params = F.array_sort(
        F.filter(
            F.split(raw_query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(params, "&")
    query_part = F.when(query == "", "").otherwise(F.concat(F.lit("?"), query))
    return scheme, host, port_part, path, query, query_part


def canonicalize_urls(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """(id, url_canon, host, domain, url_levels, is_top_page) — see module
    contract.  Non-http(s) inputs yield url_canon = the input unchanged
    and null host/domain (callers filter or route them)."""
    url = F.trim(F.col(url_col))
    scheme, host, port_part, path, query, query_part = _canon_parts(url)
    is_web = scheme != ""
    canon = F.when(
        is_web,
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part),
    ).otherwise(url)
    labels = F.split(host, r"\.")
    domain = F.when(
        is_web & (F.size(labels) >= 2),
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(F.when(is_web, host))
    levels = F.when(
        is_web, F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    ).otherwise(F.lit(None).cast("int"))
    top = F.when(is_web, (path == "/") & (query == "")).otherwise(
        F.lit(None).cast("boolean")
    )
    return df.select(
        F.col(id_col),
        canon.alias("url_canon"),
        F.when(is_web, host).alias("host"),
        domain.alias("domain"),
        levels.alias("url_levels"),
        top.alias("is_top_page"),
    )


def url_dedup_key(url_col: str | Column) -> Column:
    """64-bit key for URL-level exact dedup: xxhash64 of the canonical
    form — pair with a groupBy or dropDuplicates on the key (8-byte
    shuffle, never the URL string)."""
    url = F.trim(F.col(url_col) if isinstance(url_col, str) else url_col)
    scheme, host, port_part, path, _, query_part = _canon_parts(url)
    canon = F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), host, port_part, path, query_part),
    ).otherwise(url)
    return F.xxhash64(canon)
