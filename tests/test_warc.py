"""WARC/WET ingestion: parser roundtrip + Spark read into the pages schema."""

from __future__ import annotations

import gzip

import pytest

from apache___solr_spark.sources.warc import (
    build_warc,
    gunzip_members,
    parse_warc_records,
    read_warc_pages,
    split_http_response,
)


def _response_record(url, ts, body, lang=None, status=200):
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    headers = {
        "WARC-Type": "response",
        "WARC-Record-ID": f"<urn:uuid:{abs(hash(url)) % 10**12}>",
        "WARC-Date": ts,
        "WARC-Target-URI": url,
        "Content-Type": "application/http;msgtype=response",
    }
    if lang:
        headers["WARC-Identified-Content-Language"] = lang
    return {"headers": headers, "block": http}


def _conversion_record(url, ts, text, lang=None):
    headers = {
        "WARC-Type": "conversion",
        "WARC-Record-ID": f"<urn:uuid:{abs(hash(url + 'wet')) % 10**12}>",
        "WARC-Date": ts,
        "WARC-Target-URI": url,
        "Content-Type": "text/plain",
    }
    if lang:
        headers["WARC-Identified-Content-Language"] = lang
    return {"headers": headers, "block": text.encode("utf-8")}


FIXTURE = [
    {
        "headers": {
            "WARC-Type": "warcinfo",
            "WARC-Record-ID": "<urn:uuid:1>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "Content-Type": "application/warc-fields",
        },
        "block": b"software: synthetic-crawler 1.0\r\n",
    },
    _response_record(
        "https://example.com/a",
        "2026-01-01T00:00:01Z",
        b"<html><body>alpha beta</body></html>",
        lang="en",
    ),
    _response_record(
        "https://example.org/b",
        "2026-01-01T00:00:02Z",
        b"<html><body>gamma</body></html>",
    ),
    _conversion_record(
        "https://example.com/a",
        "2026-01-01T00:00:03Z",
        "alpha beta",
        lang="en,fr",
    ),
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        blob = build_warc(FIXTURE, gzip_members=gz)
        recs = list(parse_warc_records(blob))
        assert len(recs) == 4
        assert [r["headers"]["warc-type"] for r in recs] == [
            "warcinfo", "response", "response", "conversion",
        ]
        # Blocks byte-identical through the roundtrip.
        for orig, rec in zip(FIXTURE, recs):
            assert rec["block"] == bytes(orig["block"])
        assert recs[1]["headers"]["warc-target-uri"] == "https://example.com/a"


def test_build_warc_deterministic():
    assert build_warc(FIXTURE, gzip_members=True) == build_warc(
        FIXTURE, gzip_members=True
    )


def test_gunzip_members_truncated_tail():
    blob = build_warc(FIXTURE[:2], gzip_members=True)
    # Chop the second gzip member mid-stream: first record must survive.
    first_len = len(gzip.compress(b"", mtime=0))  # not usable; compute split
    members = []
    pos = 0
    while pos < len(blob):
        nxt = blob.find(b"\x1f\x8b", pos + 2)
        members.append(blob[pos : nxt if nxt > 0 else len(blob)])
        if nxt < 0:
            break
        pos = nxt
    assert len(members) == 2
    truncated = members[0] + members[1][: len(members[1]) // 2]
    recs = list(parse_warc_records(truncated))
    assert len(recs) == 1
    assert recs[0]["headers"]["warc-type"] == "warcinfo"
    assert first_len >= 0


def test_split_http_response():
    headers, body = split_http_response(
        b"HTTP/1.1 301 Moved\r\nLocation: /x\r\n\r\npayload"
    )
    assert headers[":status"] == "301"
    assert headers["location"] == "/x"
    assert body == b"payload"
    # Non-HTTP block passes through untouched.
    h2, b2 = split_http_response(b"\x89PNGrawbytes")
    assert h2 == {} and b2 == b"\x89PNGrawbytes"


def test_read_warc_pages(spark, tmp_path):
    (tmp_path / "part-00000.warc.gz").write_bytes(
        build_warc(FIXTURE, gzip_members=True)
    )
    (tmp_path / "part-00001.warc").write_bytes(
        build_warc(
            [
                _response_record(
                    "https://example.net/c",
                    "2026-01-02T00:00:00Z",
                    "<html>ünïcode</html>".encode("utf-8"),
                    lang="de",
                )
            ]
        )
    )
    df = read_warc_pages(spark, str(tmp_path))
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = {
        (r["url"], r["warc_ts"].isoformat()): r
        for r in df.collect()
    }
    assert len(rows) == 4  # 2 responses + 1 conversion + 1 plain response
    a = rows[("https://example.com/a", "2026-01-01T00:00:01")]
    assert bytes(a["html"]) == b"<html><body>alpha beta</body></html>"
    assert a["text"] is None and a["lang"] == "en"
    wet = rows[("https://example.com/a", "2026-01-01T00:00:03")]
    assert wet["html"] is None and wet["text"] == "alpha beta"
    assert wet["lang"] == "en"  # first tag of "en,fr"
    c = rows[("https://example.net/c", "2026-01-02T00:00:00")]
    assert bytes(c["html"]).decode("utf-8") == "<html>ünïcode</html>"
    # warcinfo records are not pages.
    assert not any(u.endswith("warcinfo") for u, _ in rows)


def test_read_warc_pages_feeds_index_build(spark, tmp_path):
    """WARC output is pages-shaped: html-strip + tokenize runs on it."""
    from pyspark.sql import functions as F

    from apache___solr_spark.ingest.processors import html_strip_field

    (tmp_path / "crawl.warc.gz").write_bytes(
        build_warc(FIXTURE[:3], gzip_members=True)
    )
    df = read_warc_pages(spark, str(tmp_path), record_types=("response",))
    stripped = html_strip_field("html_str", "text")(
        df.select("url", F.col("html").cast("string").alias("html_str"))
    ).select("url", "text")
    got = {r["url"]: r["text"].strip() for r in stripped.collect()}
    assert got["https://example.com/a"] == "alpha beta"
    assert got["https://example.org/b"] == "gamma"


def test_record_type_filter(spark, tmp_path):
    (tmp_path / "crawl.warc.gz").write_bytes(
        build_warc(FIXTURE, gzip_members=True)
    )
    wet_only = read_warc_pages(spark, str(tmp_path), record_types=("conversion",))
    rows = wet_only.collect()
    assert len(rows) == 1 and rows[0]["text"] == "alpha beta"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
