"""WARC / WET ingestion: Common-Crawl-style archives → the pages table.

The engine's canonical input is the Iceberg/parquet pages table
``(url, warc_ts, html, text, lang)`` (sources/loaders.py:PAGES_COLUMNS).
Upstream, that table is materialized from web crawls shipped as WARC
archives (ISO 28500 / IIPC WARC 1.1): ``*.warc.gz`` response captures and
``*.wet.gz`` extracted-text conversions, each ~1 GiB, gzipped one member
per record so readers can skip without decompressing the whole file.
This module closes the loop: it reads WARC/WET directly into the pages
schema so a crawl can be indexed without a separate ETL stack.

Scale shape: gzip is not splittable, so the parallel unit is the archive
FILE — exactly how Common Crawl shards its output (~100k files per crawl,
vastly more than any cluster's core count).  We scan with Spark's
``binaryFile`` source (one task per file), decode each archive inside an
Arrow-batched ``mapInPandas`` (per-file Python cost is amortized over
thousands of records), and emit pages rows.  No driver-side work, no
per-row Python UDFs downstream — the output feeds ``index.builder`` /
``pipeline.*`` unchanged.

The record parser implements the public WARC format only: CRLF header
block, ``Content-Length`` octet-counted body, ``\\r\\n\\r\\n`` trailer;
multi-member gzip via zlib (wbits=31) with ``unused_data`` chaining.
A deterministic writer (``build_warc``) exists for fixtures and as the
archival sink counterpart.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

#: Output schema — identical to sources.loaders.PAGES_COLUMNS so WARC input
#: drops into every pages-table consumer (index build, pipeline ops).
PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream to one byte blob.

    Common Crawl gzips each WARC record as its own member; Python's
    ``gzip.decompress`` handles that, but we chain ``decompressobj``
    explicitly so a trailing truncated member (a mid-upload file) yields
    the complete prefix instead of raising away the whole archive.
    """
    out = bytearray()
    buf = data
    while buf[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(buf)
            out += d.flush()
        except zlib.error:
            break
        buf = d.unused_data
        if not buf:
            break
    return bytes(out) if out else data


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"headers": {name: value}, "block": bytes}`` per WARC record.

    Header names are lower-cased (the spec says they are case-insensitive);
    the block is exactly ``Content-Length`` octets.  Malformed trailing
    garbage ends iteration rather than raising — robustness over strictness,
    matching how crawl consumers treat damaged archives.
    """
    data = gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # Skip inter-record CRLFs.
        while data[pos : pos + 2] == CRLF:
            pos += 2
        if not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(CRLF)[1:]:
            if b":" not in line:
                continue
            name, _, value = line.partition(b":")
            headers[name.strip().decode("ascii", "replace").lower()] = (
                value.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        block = data[body_start : body_start + length]
        if len(block) < length:  # truncated final record
            break
        yield {"headers": headers, "block": block}
        pos = body_start + length


def split_http_response(block: bytes) -> tuple[dict, bytes]:
    """Split a ``response`` record's HTTP message into (headers, body).

    Returns lower-cased header names plus ``":status"`` for the status
    code.  A block that is not an HTTP message comes back as
    ``({}, block)`` so raw captures still flow through as html bytes.
    """
    if not block.startswith(b"HTTP/"):
        return {}, block
    sep = block.find(CRLF + CRLF)
    if sep < 0:
        return {}, block
    lines = block[:sep].split(CRLF)
    headers: dict[str, str] = {}
    status_parts = lines[0].split(None, 2)
    if len(status_parts) >= 2:
        headers[":status"] = status_parts[1].decode("ascii", "replace")
    for line in lines[1:]:
        if b":" not in line:
            continue
        name, _, value = line.partition(b":")
        headers[name.strip().decode("ascii", "replace").lower()] = (
            value.strip().decode("utf-8", "replace")
        )
    return headers, block[sep + 4 :]


def _page_from_record(rec: dict) -> dict | None:
    """Map one WARC record to a pages row, or None if not page-shaped."""
    h = rec["headers"]
    rtype = h.get("warc-type", "")
    url = h.get("warc-target-uri")
    if not url:
        return None
    lang = h.get("warc-identified-content-language")
    if lang:
        lang = lang.split(",")[0].strip() or None
    ts = h.get("warc-date")
    if rtype == "response":
        _, body = split_http_response(rec["block"])
        return {"url": url, "warc_ts": ts, "html": body, "text": None,
                "lang": lang}
    if rtype == "conversion":  # WET extracted text
        return {"url": url, "warc_ts": ts, "html": None,
                "text": rec["block"].decode("utf-8", "replace"),
                "lang": lang}
    return None


def read_warc_pages(spark, path, record_types=("response", "conversion")):
    """Read WARC/WET archives at ``path`` into the canonical pages table.

    One Spark task per archive file (binaryFile scan — the scalable unit
    for non-splittable gzip); record parsing and the HTTP-header strip run
    Arrow-batched inside mapInPandas.  ``response`` records land in
    ``html`` (binary, HTTP headers removed), ``conversion`` records in
    ``text``; ``lang`` comes from WARC-Identified-Content-Language when
    the crawler recorded it.  The result is exactly the input_hint shape,
    ready for ``index.builder.build_index`` or any pipeline op.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    wanted = frozenset(record_types)
    raw = spark.read.format("binaryFile").load(path).select("content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("url", "warc_ts", "html", "text", "lang")
        for pdf in batches:
            rows: list[dict] = []
            for payload in pdf["content"]:
                for rec in parse_warc_records(bytes(payload)):
                    if rec["headers"].get("warc-type") not in wanted:
                        continue
                    page = _page_from_record(rec)
                    if page is not None:
                        rows.append(page)
            out = pd.DataFrame(rows, columns=cols)
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], utc=True, errors="coerce"
            ).dt.tz_localize(None)
            yield out

    return raw.mapInPandas(decode, schema=PAGES_SCHEMA).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    )


def build_warc(records: Iterable[dict], gzip_members: bool = False) -> bytes:
    """Serialize records (``headers`` map + ``block`` bytes) to WARC bytes.

    Deterministic (header order = insertion order, no clocks or uuids — the
    caller supplies WARC-Record-ID/WARC-Date), so fixtures hash stably.
    ``gzip_members=True`` produces the Common-Crawl one-gzip-member-per-
    record layout (mtime pinned to 0 for determinism).
    """
    import gzip as _gzip

    out = bytearray()
    for rec in records:
        headers = dict(rec["headers"])
        block = bytes(rec["block"])
        headers["Content-Length"] = str(len(block))
        buf = bytearray(b"WARC/1.1" + CRLF)
        for name, value in headers.items():
            buf += f"{name}: {value}".encode("utf-8") + CRLF
        buf += CRLF + block + CRLF + CRLF
        if gzip_members:
            buf = _gzip.compress(bytes(buf), mtime=0)
        out += buf
    return bytes(out)
