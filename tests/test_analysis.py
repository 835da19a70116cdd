from apache___solr_spark.analysis import (
    ENGLISH_STOP_WORDS,
    analyze,
    extract_text,
    html_strip,
    standard_tokenize,
)


def test_stop_list_is_the_standard_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"a", "the", "with", "such", "into"} <= ENGLISH_STOP_WORDS
    assert "stopworda" not in ENGLISH_STOP_WORDS  # test-only words excluded


def test_html_strip_tags_and_entities():
    assert html_strip("<b>Hello</b> &amp; <i>World</i>").split() == [
        "Hello",
        "&",
        "World",
    ]
    assert "A" in html_strip("&#65; &#x42;") and "B" in html_strip("&#65; &#x42;")


def test_html_strip_script_style_comment_cdata():
    h = (
        "<script>var x = '<div>gone</div>';</script>keep1"
        "<style>.x{color:red}</style>keep2"
        "<!-- gone too -->keep3"
        "<![CDATA[kept cdata]]>"
    )
    out = html_strip(h)
    assert "gone" not in out
    for w in ("keep1", "keep2", "keep3", "kept", "cdata"):
        assert w in out


def test_html_strip_malformed():
    assert "6" in html_strip("5 < 6 but & unescaped")
    assert html_strip("<unclosed").strip() in ("<unclosed", "")  # deterministic
    assert html_strip(None) == ""
    assert "x" in html_strip(b"<p>x</p>")


def test_tokenizer_uax29ish():
    assert standard_tokenize("don't stop 3.14 node.js a_b") == [
        "don't",
        "stop",
        "3.14",
        "node.js",
        "a",
        "b",
    ]
    assert standard_tokenize("") == []
    assert standard_tokenize(None) == []
    toks = standard_tokenize("x" * 600)
    assert [len(t) for t in toks] == [255, 255, 90]


def test_analyze_chain_order():
    # stop filter is case-insensitive and runs before lowercase
    assert analyze("The QUICK Brown THE fox AND dog") == [
        "quick",
        "brown",
        "fox",
        "dog",
    ]


def test_extract_text_prefers_text_column():
    assert extract_text(b"<p>html wins?</p>", "no, text wins") == "no, text wins"
    assert extract_text(b"<p>from html</p>", None).strip() == "from html"
