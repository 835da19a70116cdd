"""JavaBin + CBOR codecs and loaders.

JavaBin golden bytes are hand-derived from the public tag table in
solr/solrj/src/java/org/apache/solr/common/util/JavaBinCodec.java
(version byte 2; STR/SINT/SLONG/ARR/maps pack tag+size; SOLRINPUTDOC is
vint-size + boost-float + extern-string field names).  CBOR vectors are
RFC 8949 Appendix A examples.
"""

from __future__ import annotations

import math

import pytest

from apache___solr_spark.sources.binformats import (
    JavaBinIterator,
    NamedList,
    SolrInputDoc,
    cbor_dumps,
    cbor_loads,
    javabin_dumps,
    javabin_extract_docs,
    javabin_loads,
    javabin_update_payload,
)
from apache___solr_spark.sources.loaders import (
    read_cbor_docs,
    read_javabin_docs,
)


# -- JavaBin golden bytes ----------------------------------------------------


def test_javabin_golden_primitives():
    # version 2, then STR tag (0x20) | len
    assert javabin_dumps("ab") == b"\x02\x22ab"
    # SINT tag 0x40 | small positive int
    assert javabin_dumps(5) == b"\x02\x45"
    # SINT with vint continuation: 100 = 0x64 -> low nibble 4, rest 6
    assert javabin_dumps(100) == b"\x02\x54\x06"
    assert javabin_dumps(None) == b"\x02\x00"
    assert javabin_dumps(True) == b"\x02\x01"
    assert javabin_dumps(False) == b"\x02\x02"
    # negative int falls back to fixed 4-byte INT tag 6
    assert javabin_dumps(-1) == b"\x02\x06\xff\xff\xff\xff"
    # ARR tag 0x80 | size
    assert javabin_dumps([1, 2]) == b"\x02\x82\x41\x42"


def test_javabin_golden_roundtrip_values():
    cases = [
        None,
        True,
        False,
        0,
        14,
        15,
        31,
        1000,
        2**40,
        -7,
        -(2**40),
        1.5,
        "",
        "héllo wörld",
        "x" * 40,  # STR size overflows the 5-bit tag field
        b"\x00\x01\xff",
        [1, "two", [3.0, None]],
        {"a": 1, "b": [True, False]},
    ]
    for v in cases:
        got = javabin_loads(javabin_dumps(v))
        assert got == v, (v, got)


def test_javabin_extern_string_backrefs():
    # repeated map keys encode as back-references and decode identically
    v = [{"k1": 1, "k2": 2}, {"k1": 3, "k2": 4}, {"k1": 5}]
    data = javabin_dumps(v)
    # 'k1' appears literally once in the payload
    assert data.count(b"k1") == 1
    assert javabin_loads(data) == v


def test_javabin_update_payload_roundtrip():
    docs = [
        {"id": "a", "title_s": "first", "n_i": 3},
        {"id": "b", "title_s": "second", "tags_ss": ["x", "y"]},
        {
            "id": "p",
            "title_s": "parent",
            "_childDocuments_": [{"id": "c1", "title_s": "child"}],
        },
    ]
    payload = javabin_update_payload(docs, params={"commit": "true"})
    obj = javabin_loads(payload)
    assert isinstance(obj, NamedList)
    assert obj.get("params").asdict() == {"commit": "true"}
    out = javabin_extract_docs(obj)
    assert out == docs


def test_javabin_named_list_and_iterator():
    nl = NamedList([("a", 1), ("a", 2), ("it", JavaBinIterator([1, 2, 3]))])
    back = javabin_loads(javabin_dumps(nl))
    assert [k for k, _ in back] == ["a", "a", "it"]
    assert back[2][1] == [1, 2, 3]


def test_javabin_version_check():
    with pytest.raises(ValueError, match="version"):
        javabin_loads(b"\x01\x00")


def test_javabin_truncated_solrdoc_raises():
    # SOLRDOC tag with no body: the decoder must fail, not hang or guess
    with pytest.raises((ValueError, IndexError)):
        javabin_loads(b"\x02\x0b")  # SOLRDOC tag 11, truncated


# -- CBOR: RFC 8949 Appendix A vectors ---------------------------------------

RFC_VECTORS = [
    (bytes.fromhex("00"), 0),
    (bytes.fromhex("17"), 23),
    (bytes.fromhex("1818"), 24),
    (bytes.fromhex("1903e8"), 1000),
    (bytes.fromhex("1a000f4240"), 1000000),
    (bytes.fromhex("1b000000e8d4a51000"), 1000000000000),
    (bytes.fromhex("20"), -1),
    (bytes.fromhex("3863"), -100),
    (bytes.fromhex("f90000"), 0.0),
    (bytes.fromhex("f93c00"), 1.0),
    (bytes.fromhex("fb3ff199999999999a"), 1.1),
    (bytes.fromhex("f97c00"), float("inf")),
    (bytes.fromhex("f4"), False),
    (bytes.fromhex("f5"), True),
    (bytes.fromhex("f6"), None),
    (bytes.fromhex("60"), ""),
    (bytes.fromhex("6161"), "a"),
    (bytes.fromhex("6449455446"), "IETF"),
    (bytes.fromhex("62225c"), '"\\'),
    (bytes.fromhex("62c3bc"), "ü"),
    (bytes.fromhex("80"), []),
    (bytes.fromhex("83010203"), [1, 2, 3]),
    (bytes.fromhex("8301820203820405"), [1, [2, 3], [4, 5]]),
    (bytes.fromhex("a0"), {}),
    (bytes.fromhex("a201020304"), {1: 2, 3: 4}),
    (bytes.fromhex("a26161016162820203"), {"a": 1, "b": [2, 3]}),
    # indefinite-length forms
    (bytes.fromhex("9fff"), []),
    (bytes.fromhex("9f018202039f0405ffff"), [1, [2, 3], [4, 5]]),
    (bytes.fromhex("bf61610161629f0203ffff"), {"a": 1, "b": [2, 3]}),
    (bytes.fromhex("7f657374726561646d696e67ff"), "streaming"),
]


@pytest.mark.parametrize("data,want", RFC_VECTORS)
def test_cbor_rfc8949_appendix_a(data, want):
    assert cbor_loads(data) == want


def test_cbor_nan():
    assert math.isnan(cbor_loads(bytes.fromhex("f97e00")))


def test_cbor_roundtrip():
    cases = [
        None,
        True,
        0,
        23,
        24,
        2**33,
        -1,
        -500,
        3.25,
        "doc",
        b"\x01\x02",
        [1, {"a": [True, None]}, "s"],
        {"id": "x", "n": 2, "vals": [1.5, 2.5]},
    ]
    for v in cases:
        assert cbor_loads(cbor_dumps(v)) == v


def test_cbor_stringref():
    # stringref namespace (tag 256) + reference (tag 25):
    # d90100           tag(256)
    #   82             array(2)
    #     63 726566    "ref" (recorded: len 3 >= threshold 3)
    #     d819 00      tag(25) -> table[0]
    data = bytes.fromhex("d9010082637265666444444444")
    # first build without a ref to sanity-check the scaffold
    assert cbor_loads(data) == ["ref", "DDDD"]
    data_ref = bytes.fromhex("d901008263726566d81900")
    assert cbor_loads(data_ref) == ["ref", "ref"]


def test_cbor_stream_mode():
    # two top-level maps back to back (CborLoader's sequence-of-docs form)
    data = cbor_dumps({"id": "a"}) + cbor_dumps({"id": "b"})
    assert cbor_loads(data, stream=True) == [{"id": "a"}, {"id": "b"}]


# -- Spark loaders ------------------------------------------------------------


def test_read_javabin_docs(spark, tmp_path):
    d = tmp_path / "jb"
    d.mkdir()
    (d / "u1.javabin").write_bytes(
        javabin_update_payload(
            [
                {"id": "a", "title_s": "first", "n_i": 1},
                {"id": "b", "title_s": "second", "n_i": 2},
            ]
        )
    )
    (d / "u2.javabin").write_bytes(
        javabin_update_payload([{"id": "b", "title_s": "updated", "n_i": 9}])
    )
    df = read_javabin_docs(spark, str(d))
    rows = {r["id"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["title_s"] == "first"
    # last-wins overwrite across payload files is order-dependent only
    # within a file; across files either version may win the tie on
    # monotonic ids — assert the duplicate collapsed to ONE row instead
    assert df.count() == 2


def test_read_cbor_docs(spark, tmp_path):
    d = tmp_path / "cb"
    d.mkdir()
    (d / "docs1.cbor").write_bytes(
        cbor_dumps(
            [
                {"id": "a", "title_s": "alpha"},
                {"id": "b", "title_s": "beta"},
                {},  # empty doc dropped (CborLoader.handleDoc guard)
            ]
        )
    )
    (d / "docs2.cbor").write_bytes(
        cbor_dumps({"id": "c", "title_s": "gamma"})
    )
    df = read_cbor_docs(spark, str(d))
    rows = {r["id"]: r["title_s"] for r in df.collect()}
    assert rows == {"a": "alpha", "b": "beta", "c": "gamma"}


def test_read_javabin_docs_last_wins_within_file(spark, tmp_path):
    d = tmp_path / "jb2"
    d.mkdir()
    (d / "u.javabin").write_bytes(
        javabin_update_payload(
            [
                {"id": "x", "v_i": 1},
                {"id": "x", "v_i": 2},
                {"id": "x", "v_i": 3},
            ]
        )
    )
    df = read_javabin_docs(spark, str(d))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["v_i"] == 3


def test_cbor_indefinite_int_rejected():
    with pytest.raises(ValueError, match="indefinite"):
        cbor_loads(bytes([0x1F]))
    with pytest.raises(ValueError, match="indefinite"):
        cbor_loads(bytes([0x3F]))


def test_solrdoc_response_roundtrip():
    from apache___solr_spark.sources.binformats import SolrDoc, SolrDocList

    # a query-response SolrDocumentList: header + docs, child docs nested
    docs = SolrDocList(
        [
            SolrDoc({"id": "a", "score": 1.5}),
            SolrDoc(
                {"id": "b"},
                children=[SolrDoc({"id": "b.1", "rank": 2})],
            ),
        ]
    )
    docs.num_found = 42
    docs.start = 10
    docs.max_score = 3.25
    out = javabin_loads(javabin_dumps(docs))
    assert isinstance(out, SolrDocList)
    assert out.num_found == 42 and out.start == 10
    assert out.max_score == 3.25 and out.num_found_exact is True
    assert [d.fields["id"] for d in out] == ["a", "b"]
    assert out[1].children[0].fields == {"id": "b.1", "rank": 2}

    # null maxScore (no scored fields requested) survives
    docs.max_score = None
    out2 = javabin_loads(javabin_dumps(docs))
    assert out2.max_score is None


def test_solrdoc_golden_bytes():
    from apache___solr_spark.sources.binformats import SolrDoc

    # SOLRDOC tag (0x0b) + ORDERED_MAP (0xa0|size) + extern-string name
    # (0xe0, first use writes the STR) + value
    raw = javabin_dumps(SolrDoc({"id": 5}))
    assert raw == bytes([2, 0x0B, 0xA1, 0xE0, 0x22]) + b"id" + bytes([0x45])


def test_extract_docs_from_query_response():
    from apache___solr_spark.sources.binformats import SolrDoc, SolrDocList

    docs = SolrDocList([SolrDoc({"id": "x", "v_i": 1})])
    docs.num_found = 1
    resp = NamedList(
        [
            ("responseHeader", NamedList([("status", 0), ("QTime", 3)])),
            ("response", docs),
        ]
    )
    out = javabin_extract_docs(javabin_loads(javabin_dumps(resp)))
    assert out == [{"id": "x", "v_i": 1}]
