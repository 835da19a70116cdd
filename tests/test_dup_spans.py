"""Cross-document exact substring dedup (duplicate_spans / strip)."""

from __future__ import annotations

import re

import pytest

from apache___solr_spark.pipeline.dedup import (
    duplicate_spans,
    strip_duplicate_spans,
)

PASSAGE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from a mossy stone bridge near the river"
)  # 22 tokens

DOCS = [
    ("a", f"alpha beta gamma {PASSAGE} delta epsilon"),
    ("b", f"{PASSAGE} zeta eta theta iota kappa lambda"),
    ("c", "unique text one two three four five six seven eight nine ten "
          "eleven twelve thirteen fourteen"),
    ("d", f"start filler words here {PASSAGE}"),
]


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _oracle_spans(docs, k, min_df):
    """Pure-Python reference: duplicated k-gram positions -> maximal runs."""
    grams = {}
    for did, text in docs:
        t = _toks(text)
        for i in range(len(t) - k + 1):
            grams.setdefault(" ".join(t[i : i + k]), set()).add(did)
    out = {}
    for did, text in docs:
        t = _toks(text)
        dup = [
            i
            for i in range(len(t) - k + 1)
            if len(grams[" ".join(t[i : i + k])]) >= min_df
        ]
        runs = []
        for p in dup:
            if runs and p == runs[-1][1] + 1:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        out[did] = {(s, e - s + 1 + k - 1) for s, e in runs}
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_duplicate_spans_match_oracle(docs_df):
    k = 8
    got = {}
    for r in duplicate_spans(docs_df, "text", "doc_id", k=k).collect():
        got.setdefault(r["id"], set()).add((r["span_start"], r["span_len"]))
        assert r["max_share"] == 3  # passage shared by a, b, d
    want = {d: s for d, s in _oracle_spans(DOCS, k, 2).items() if s}
    assert got == want
    # The span covers exactly the 22-token passage in every sharing doc.
    assert got["a"] == {(3, 22)}
    assert got["b"] == {(0, 22)}
    assert got["d"] == {(4, 22)}
    assert "c" not in got


def test_duplicate_spans_min_df(docs_df):
    # Require 4 sharers: the passage appears in only 3 docs -> nothing.
    assert duplicate_spans(docs_df, "text", "doc_id", k=8, min_df=4).count() == 0


def test_strip_duplicate_spans(docs_df):
    out = {
        r["id"]: r
        for r in strip_duplicate_spans(
            docs_df, "text", "doc_id", k=8
        ).collect()
    }
    assert out["a"]["text"] == "alpha beta gamma delta epsilon"
    assert out["a"]["n_removed_tokens"] == 22
    assert out["b"]["text"] == "zeta eta theta iota kappa lambda"
    assert out["d"]["text"] == "start filler words here"
    # Untouched doc survives verbatim (modulo tokenizer normalization).
    assert out["c"]["n_removed_tokens"] == 0
    assert out["c"]["text"].startswith("unique text one two")


def test_strip_min_span_keeps_short_repeats(docs_df):
    # min_span larger than the passage: nothing is removed anywhere.
    out = strip_duplicate_spans(
        docs_df, "text", "doc_id", k=8, min_span=50
    ).collect()
    assert all(r["n_removed_tokens"] == 0 for r in out)


def test_strip_handles_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [("e", ""), ("n", None), ("s", "too short"),
         ("x", "one two three four five six seven eight nine ten"),
         ("y", "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in
           strip_duplicate_spans(df, "text", "doc_id", k=8).collect()}
    assert out["e"]["text"] == "" and out["e"]["n_removed_tokens"] == 0
    assert out["n"]["text"] == "" and out["n"]["n_removed_tokens"] == 0
    assert out["s"]["text"] == "too short"
    # x and y are full duplicates of each other: everything removed.
    assert out["x"]["text"] == "" and out["x"]["n_removed_tokens"] == 10
    assert out["y"]["n_removed_tokens"] == 10


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
