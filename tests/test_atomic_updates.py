"""Atomic (partial-document) updates: AtomicUpdateDocumentMerger.java:67
merge semantics as column expressions, and the read-merge-reindex path
against a live index."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from apache___solr_spark.config import IndexConfig
from apache___solr_spark.corpus import generate_pages
from apache___solr_spark.index.builder import build_index
from apache___solr_spark.index.updates import atomic_merge, atomic_update
from apache___solr_spark.query.engine import SearchEngine

CFG = IndexConfig(block_range=32, salt_range=128, n_buckets=8)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10, ["x", "y", "x"]),
            (2, "beta", 20, ["y"]),
            (3, "gamma", 30, None),
        ],
        "id long, title string, views long, tags array<string>",
    )


def _by_id(df):
    return {r["id"]: r for r in df.collect()}


def test_set_and_inc(spark, docs):
    upd = spark.createDataFrame(
        [(1, "ALPHA", 5), (3, None, 100)],
        "id long, title string, views long",
    )
    out = _by_id(
        atomic_merge(docs, upd, "id", {"title": "set", "views": "inc"})
    )
    assert out[1]["title"] == "ALPHA" and out[1]["views"] == 15
    # NULL update cell = untouched field on an otherwise-updated doc
    assert out[3]["title"] == "gamma" and out[3]["views"] == 130
    assert out[2]["title"] == "beta" and out[2]["views"] == 20  # untouched


def test_add_and_add_distinct(spark, docs):
    upd = spark.createDataFrame([(1, "z"), (2, "y")], "id long, tags string")
    out = _by_id(atomic_merge(docs, upd, "id", {"tags": "add"}))
    assert out[1]["tags"] == ["x", "y", "x", "z"]
    assert out[2]["tags"] == ["y", "y"]  # plain add duplicates
    out = _by_id(atomic_merge(docs, upd, "id", {"tags": "add-distinct"}))
    assert out[2]["tags"] == ["y"]  # distinct skips the existing value
    # add onto a NULL array starts a fresh one
    upd3 = spark.createDataFrame([(3, "n")], "id long, tags string")
    out = _by_id(atomic_merge(docs, upd3, "id", {"tags": "add"}))
    assert out[3]["tags"] == ["n"]


def test_remove_keeps_other_duplicates(spark, docs):
    upd = spark.createDataFrame([(1, "x")], "id long, tags string")
    out = _by_id(atomic_merge(docs, upd, "id", {"tags": "remove"}))
    assert out[1]["tags"] == ["y"]  # both x occurrences dropped
    # array-valued remove drops every listed value
    upd2 = spark.createDataFrame(
        [(1, ["x", "y"])], "id long, tags array<string>"
    )
    out = _by_id(atomic_merge(docs, upd2, "id", {"tags": "remove"}))
    assert out[1]["tags"] == []


def test_removeregex_and_removefield(spark, docs):
    upd = spark.createDataFrame([(1, "^x$")], "id long, tags string")
    out = _by_id(atomic_merge(docs, upd, "id", {"tags": "removeregex"}))
    assert out[1]["tags"] == ["y"]
    upd2 = spark.createDataFrame([(2,)], "id long")
    out = _by_id(atomic_merge(docs, upd2, "id", {"title": "removefield"}))
    assert out[2]["title"] is None and out[1]["title"] == "alpha"


def test_unknown_op_raises(spark, docs):
    with pytest.raises(ValueError, match="unknown atomic op"):
        atomic_merge(docs, docs, "id", {"title": "replace"})


def test_atomic_update_reindexes_merged_doc(spark, tmp_path):
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(generate_pages(120, seed=11), pages_path)
    idx = str(tmp_path / "idx")
    build_index(spark, pages_path, idx, cfg=CFG)
    pages = spark.read.parquet(pages_path)
    target = pages.select("url").orderBy("url").limit(1).collect()[0]["url"]

    # plant a term unique to the OLD version first, so its disappearance
    # proves the tombstone (not just the new segment) is honored
    plant = spark.createDataFrame(
        [(target, "zzzoldmark zzzoldmark original body")],
        "url string, text string",
    )
    atomic_update(spark, idx, pages, plant, {"text": "set"}, key="url", cfg=CFG)
    eng = SearchEngine(spark, idx, cfg=CFG)
    assert [r["url"] for r in eng.search("zzzoldmark", k=5).collect()] == [
        target
    ]

    # second atomic set replaces the text again: the old unique term must
    # stop matching, the new one must match exactly this doc
    pages_v2 = atomic_merge(pages, plant, "url", {"text": "set"})
    upd = spark.createDataFrame(
        [(target, "zzzatomic zzzatomic update payload")],
        "url string, text string",
    )
    n = atomic_update(
        spark, idx, pages_v2, upd, {"text": "set"}, key="url", cfg=CFG
    )
    assert n == 1
    eng = SearchEngine(spark, idx, cfg=CFG)
    assert [r["url"] for r in eng.search("zzzatomic", k=5).collect()] == [
        target
    ]
    assert eng.search("zzzoldmark", k=5).count() == 0
    # untouched docs still searchable
    assert eng.search("web", k=5).count() > 0
