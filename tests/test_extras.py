"""Rerank / RRF / MoreLikeThis / date math."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from apache___solr_spark.config import IndexConfig
from apache___solr_spark.corpus import generate_pages
from apache___solr_spark.functions.datemath import date_math
from apache___solr_spark.index.builder import build_index
from apache___solr_spark.oracle import build_oracle_index, oracle_search
from apache___solr_spark.query.engine import SearchEngine
from apache___solr_spark.query.extras import (
    more_like_this,
    reciprocal_rank_fusion,
    rerank,
)

CFG = IndexConfig(block_range=32, salt_range=128, n_buckets=8)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("extras")
    path = str(d / "pages.parquet")
    table = generate_pages(300, seed=42)
    pq.write_table(table, path)
    out = str(d / "idx")
    build_index(spark, path, out, cfg=CFG)
    return out, table


def test_rerank_weight_zero_is_identity(spark, built):
    out, _ = built
    eng = SearchEngine(spark, out, cfg=CFG)
    base = [(r["doc_id"], r["score"]) for r in eng.search("web page", k=10).collect()]
    rr = [
        (r["doc_id"], r["score"])
        for r in rerank(eng, "web page", "data", k=10, rerank_weight=0.0).collect()
    ]
    assert [d for d, _ in rr] == [d for d, _ in base]
    for (_, a), (_, b) in zip(rr, base):
        assert a == pytest.approx(b, rel=1e-6)


def test_rerank_matches_oracle_combination(spark, built):
    out, table = built
    eng = SearchEngine(spark, out, cfg=CFG)
    idx = build_oracle_index(table.to_pylist())
    w, nd = 2.0, 50
    main = oracle_search(idx, "web page", k=nd)
    second = {h["doc_id"]: h["score"] for h in oracle_search(idx, "data", k=idx.n_docs)}
    fused = sorted(
        (
            (-(h["score"] + w * second.get(h["doc_id"], 0.0)), h["doc_id"])
            for h in main
        ),
    )[:10]
    want = [d for _, d in fused]
    got = [
        r["doc_id"]
        for r in rerank(eng, "web page", "data", k=10, rerank_docs=nd, rerank_weight=w).collect()
    ]
    assert got == want


def test_rrf(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id int, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)], "id int, rank int")
    out = {
        r["id"]: r["rrf_score"]
        for r in reciprocal_rank_fusion([a, b], "id", k=60, limit=10).collect()
    }
    assert out[1] == pytest.approx(round(1 / 61 + 1 / 62, 6))
    assert out[3] == pytest.approx(round(1 / 63 + 1 / 61, 6))
    assert out[4] == pytest.approx(round(1 / 63, 6))
    top = reciprocal_rank_fusion([a, b], "id", limit=2).collect()
    assert [r["id"] for r in top] == sorted(
        out, key=lambda i: (-out[i], i)
    )[:2]


def test_more_like_this(spark, built):
    out, _ = built
    eng = SearchEngine(spark, out, cfg=CFG)
    hits = more_like_this(eng, doc_id=5, k=5).collect()
    assert 0 < len(hits) <= 5
    assert all(r["doc_id"] != 5 for r in hits)
    assert [r["rank"] for r in hits] == list(range(1, len(hits) + 1))
    # unknown doc -> empty
    assert more_like_this(eng, doc_id=10**9, k=5).count() == 0


def test_date_math(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 15, 13, 45, 7),)], "ts timestamp"
    )
    got = df.select(
        date_math(F.col("ts"), "/DAY").alias("a"),
        date_math(F.col("ts"), "/DAY+7DAYS-1HOUR").alias("b"),
        date_math(F.col("ts"), "+1MONTH").alias("c"),
        date_math(F.col("ts"), "/HOUR+30MINUTES").alias("d"),
    ).collect()[0]
    assert got["a"] == datetime.datetime(2024, 3, 15, 0, 0)
    assert got["b"] == datetime.datetime(2024, 3, 21, 23, 0)
    assert got["c"] == datetime.datetime(2024, 4, 15, 13, 45, 7)
    assert got["d"] == datetime.datetime(2024, 3, 15, 13, 30)
    with pytest.raises(ValueError):
        date_math(F.col("ts"), "NOPE")
    with pytest.raises(ValueError):
        date_math(F.col("ts"), "/BOGUS")
