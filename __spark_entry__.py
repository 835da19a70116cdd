"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry maps a SURVEY.md §2 operator (or a
training-pipeline op) to a DataFrame callable; ``oracle_sql()`` carries the
DuckDB-equivalent SQL.  Conventions keeping the value-hash comparison sound:

- every computed column is aliased identically on both sides;
- money aggregates run in exact integer cents (double sums of 60k+ values
  are order-dependent in the last ulps — Spark shuffle order would flip the
  hash);
- ratio/double outputs are rounded (6dp) on both sides;
- integer outputs are BIGINT on both sides (F.size returns int -> cast);
- tokenization used by SQL-checked text ops is the SQL-expressible
  ``[a-z0-9]+`` regex, not the engine's UAX#29 chain (which backs the
  fulltext entries checked rows-only + by pytest goldens vs the oracle).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STOPWORDS_SQL_LIST = None  # filled lazily (import below)


def _prep(spark: SparkSession) -> None:
    from apache___solr_spark.session import ship_package

    ship_package(spark)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# fulltext index (built once per sf_dir over the documents table)
# --------------------------------------------------------------------------

_INDEX_CACHE: dict[tuple[str, str], str] = {}


def _docs_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.format_string("doc%09d", F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def _index_cfg(mode: str):
    from apache___solr_spark.config import DEFAULT_CONFIG, IndexConfig

    if mode == "simple":
        # ANSI-SQL-expressible analysis + double scoring: this index's BM25
        # results are value-hash-checked against the DuckDB oracle (the
        # standard chain's UAX#29 tokenizer is not SQL-expressible, so the
        # standard-mode entries are rows-only + pytest-golden checked).
        return IndexConfig(analyzer="simple", score_dtype="float64")
    return DEFAULT_CONFIG


def _fulltext_index(spark: SparkSession, sf_dir: str, mode: str = "standard") -> str:
    key = (os.path.abspath(sf_dir), mode)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    _prep(spark)
    from apache___solr_spark.index.builder import build_index

    suffix = "" if mode == "standard" else f"_{mode}"
    out = os.path.join(
        tempfile.gettempdir(),
        "solr_spark_idx_" + key[0].strip("/").replace("/", "_") + suffix,
    )
    build_index(spark, _docs_as_pages(spark, sf_dir), out, cfg=_index_cfg(mode))
    _INDEX_CACHE[key] = out
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the documents corpus at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    idx = _fulltext_index(spark, sf_dir)
    eng = _engine(spark, idx)
    return eng.search("table AND query", k=20)


# --------------------------------------------------------------------------
# shared SQL fragments
# --------------------------------------------------------------------------

_TOKS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"
# GPT-2 pre-tokenizer pattern shared with pipeline.textqual (kept inline so
# the oracle module has no import-order dependence on the package)
BPE_PRETOKEN_RE = r"""'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""
_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_DISC_PCT = "CAST(round(l_discount * 100) AS BIGINT)"

# Spark-side simple tokens matching _TOKS_SQL
def _toks(col):
    return F.array_remove(F.split(F.lower(col), "[^a-z0-9]+"), "")


def _stop_array():
    from apache___solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS

    return sorted(ENGLISH_STOP_WORDS)


def _stops_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in _stop_array()) + "]"


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _fulltext_index(spark, sf_dir)
    eng = _engine(spark, idx)
    return eng.search("table query merge", k=50)


def q_bm25_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _fulltext_index(spark, sf_dir)
    eng = _engine(spark, idx)
    return eng.search("spark AND window -error", k=50)


_ENGINE_CACHE: dict[tuple, object] = {}


def _engine(spark: SparkSession, idx: str, mode: str = "standard",
            similarity: str = "bm25"):
    """One SearchEngine per (session, index, similarity) — the server shape
    (an engine instance holds the term-meta cache and pins the index
    snapshot), instead of rebuilding per query entry."""
    from apache___solr_spark.query.engine import SearchEngine

    key = (id(spark), idx, mode, similarity)
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = SearchEngine(
            spark, idx, cfg=_index_cfg(mode), similarity=similarity
        )
    return _ENGINE_CACHE[key]


def _simple_engine(spark: SparkSession, sf_dir: str, similarity: str = "bm25"):
    idx = _fulltext_index(spark, sf_dir, "simple")
    return _engine(spark, idx, "simple", similarity)


def _rounded_hits(out: DataFrame) -> DataFrame:
    # deterministic comparable form: round to 6dp and order by the ROUNDED
    # score (ties broken by doc_id) so both engines sort identical values.
    return out.select("doc_id", F.round("score", 6).alias("score")).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )


def _stable_topk(out: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k for oracle comparison: the engine over-fetched
    (k + slack) at raw float precision; re-cut at ROUNDED (6dp) precision
    with a doc_id tiebreak, mirrored in the oracle's hits CTE.  Raw-ulp
    boundary ties are not stable across engines — or across Spark runs,
    whose partition-order float reassociation can flip the k-th doc (seen
    once on mlt_simple's 10-term score sum)."""
    return _rounded_hits(out).limit(k)


def q_bm25_simple_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k through the REAL index + engine (postings codec, SmallFloat
    norms, salted scan, block-max machinery) on the SQL-expressible analyzer
    — the driver value-hash-checks the engine's scoring itself."""
    eng = _simple_engine(spark, sf_dir)
    return _rounded_hits(eng.search("table query merge", k=50, with_url=False))


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic TF-IDF similarity (search/similarities/
    ClassicSimilarityFactory.java; Lucene TFIDFSimilarity: sqrt(tf) * idf^2
    / sqrt(dl), idf = 1+ln((N+1)/(df+1))) through the pluggable similarity
    registry on the real index — DuckDB-oracle-checked."""
    eng = _simple_engine(spark, sf_dir, similarity="classic")
    return _rounded_hits(eng.search("table query merge", k=50, with_url=False))


def q_lmdirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM Dirichlet similarity (LMDirichletSimilarityFactory.java, mu=2000:
    max(0, ln(1+tf/(mu*p)) + ln(mu/(dl+mu))), p = cf/total_len) through the
    pluggable registry — DuckDB-oracle-checked."""
    eng = _simple_engine(spark, sf_dir, similarity="lmdirichlet")
    return _rounded_hits(eng.search("table query merge", k=50, with_url=False))


def q_bm25_simple_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUST + MUST_NOT boolean retrieval with BM25 scores, oracle-checked."""
    eng = _simple_engine(spark, sf_dir)
    return _rounded_hits(eng.search("table AND query -merge", k=50, with_url=False))


def q_bm25_simple_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReRank (ReRankQParserPlugin): first-pass top-100, rescored by
    main + 2.0 * score(rerank query) — oracle-checked end to end."""
    eng = _simple_engine(spark, sf_dir)
    from apache___solr_spark.query.extras import rerank

    out = rerank(eng, "table query", "merge", k=20, rerank_docs=100)
    return _rounded_hits(out)


def q_bm25_simple_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested BooleanQuery through the recursive tree evaluator
    (QueryParser.jj:135-172 recursive Clause/Query productions): two MUST
    groups — one containing a SLOPPY phrase ("part filter"~2, ordered-window
    matching) OR'd with a term — plus a top-level MUST_NOT, all scored with
    BM25 and oracle-checked end to end."""
    eng = _simple_engine(spark, sf_dir)
    return _rounded_hits(
        eng.search(
            '+("part filter"~2 merge) +(table query) -scan', k=50, with_url=False
        )
    )


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-adjacency phrase query mixed with a SHOULD term (PhraseQuery
    semantics: tf=phrase freq, idf=sum of constituent idfs), through the
    real positions codec — oracle-checked."""
    eng = _simple_engine(spark, sf_dir)
    return _rounded_hits(eng.search('"part filter" merge', k=50, with_url=False))


def q_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{!surround} unordered span proximity (SurroundQParserPlugin,
    queryparser/surround DistanceQuery -> SpanNearQuery(inOrder=false)):
    4N(table, filter) — both terms within a 4-token window in either
    order, BM25 tf = minimal-window span frequency.  Rank+score-exact vs
    an independent bisect oracle in tests/test_index_query.py
    (test_span_near_matches_oracle) AND a full DuckDB positional oracle
    (minimal-window counting via per-start earliest-cover joins)."""
    eng = _simple_engine(spark, sf_dir)
    return _stable_topk(
        eng.span_near(["table", "filter"], dist=4, ordered=False, k=64,
                      with_url=False),
        50,
    )


def q_prefix_boost_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix expansion + boost through the real engine (SolrQueryParserBase
    getPrefixQuery + boost semantics): 's*' expands against the term
    dictionary (capped by df desc), 'merge' scores with a 2x boost —
    oracle-checked."""
    eng = _simple_engine(spark, sf_dir)
    return _rounded_hits(eng.search("s* merge^2", k=50, with_url=False))


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermsComponent capability (handler/component/TermsComponent.java:76):
    term dictionary with df/cf, top by df."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks(F.col("text"))).alias("term"))
    return (
        tok.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("cf"),
        )
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(50)
    )


def q_boolean_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean MUST retrieval (DocSet intersection semantics,
    search/BitDocSet.java:33) on the SQL-expressible tokenizer."""
    d = _t(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    return (
        d.select("doc_id", toks.alias("_t"))
        .filter(
            F.array_contains("_t", "table")
            & F.array_contains("_t", "query")
            & ~F.array_contains("_t", "error")
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache___solr_spark.pipeline.textqual import token_count

    d = _t(spark, sf_dir, "documents")
    out = token_count(d, "text", "doc_id")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_pretokens").cast("long").alias("n_pretokens"),
        F.col("n_subwords_est").cast("long").alias("n_subwords_est"),
    ).orderBy("doc_id")


def q_detect_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache___solr_spark.pipeline.textqual import detect_language

    d = _t(spark, sf_dir, "documents")
    return detect_language(d, "text", "doc_id").orderBy("doc_id")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache___solr_spark.pipeline.textqual import quality_score

    d = _t(spark, sf_dir, "documents")
    out = quality_score(d, "text", "doc_id")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_wordlen",
        "punct_ratio",
        "stop_ratio",
        "quality",
    ).orderBy("doc_id")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (SignatureUpdateProcessorFactory capability) —
    oracle-checkable on raw content equality.  The corpus is augmented with
    planted exact duplicates (doc_id+1000000 carrying the same text) so the
    expected output contains real duplicate groups at every SF — the raw
    synthetic table has no duplicate texts, which made the round-1 check
    vacuous (VERDICT.md)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(planted)
    canon = corpus.groupBy("text").agg(F.min("doc_id").alias("canonical_id"))
    return (
        corpus.join(canon, "text")
        .select(
            F.col("doc_id").alias("id"),
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        )
        .orderBy("id")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs over a corpus with PLANTED near
    duplicates (doc_id+100000 = same text minus its first 29 chars), so the
    threshold=0.5 output is non-empty and every planted pair must surface."""
    from apache___solr_spark.pipeline.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") < 80).select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 30)").alias("text"),
    )
    pairs = ngram_jaccard_pairs(
        base.unionByName(planted), "text", "doc_id", n=3, threshold=0.5
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates — hash family not SQL-expressible,
    checked rows-only here + by tests/test_pipeline.py against exact
    Jaccard."""
    _prep(spark)
    from apache___solr_spark.pipeline.dedup import minhash_lsh_candidates

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_lsh_candidates(d, "text", "doc_id").orderBy("id_a", "id_b")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from apache___solr_spark.pipeline.dedup import simhash_dedup_candidates

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_dedup_candidates(d, "text", "doc_id").orderBy("id_a", "id_b")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache___solr_spark.pipeline.similarity import cosine_topk_bruteforce

    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    out = cosine_topk_bruteforce(e.filter(F.col("vec_id") != 0), qvec, k=20)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


_ANN_CACHE: dict[str, str] = {}


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN over a PERSISTED bucket-partitioned index (the 100 TB
    path: probes prune the scan to a few partition dirs) — approximate by
    design, rows-only check; recall + pruning asserted in tests/."""
    from apache___solr_spark.pipeline.similarity import (
        build_ann_index,
        query_ann_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    key = os.path.abspath(sf_dir)
    if key not in _ANN_CACHE:
        out = os.path.join(
            tempfile.gettempdir(),
            "solr_spark_ann_" + key.strip("/").replace("/", "_"),
        )
        build_ann_index(e.filter(F.col("vec_id") != 0), out, dim=len(qvec))
        _ANN_CACHE[key] = out
    hits = query_ann_index(spark, _ANN_CACHE[key], qvec, k=20, multiprobe_hamming=2)
    return hits.select("vec_id", F.round("cosine", 6).alias("cosine"))


_IVF_CACHE: dict[str, str] = {}


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (spherical k-means coarse quantizer) ANN over a PERSISTED
    cell-partitioned index — the adaptive-centroid alternative to the LSH
    index (better recall at equal probe cost on clustered embeddings;
    upgrade path for DenseVectorField HNSW, schema/DenseVectorField.java:69).
    Approximate by design, rows-only check; recall >= 0.9 at <= 10% of
    partitions + partition pruning asserted in tests/test_pipeline.py."""
    from apache___solr_spark.pipeline.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    key = os.path.abspath(sf_dir)
    if key not in _IVF_CACHE:
        out = os.path.join(
            tempfile.gettempdir(),
            "solr_spark_ivf_" + key.strip("/").replace("/", "_"),
        )
        build_ivf_index(e.filter(F.col("vec_id") != 0), out, n_centroids=16)
        _IVF_CACHE[key] = out
    hits = query_ivf_index(spark, _IVF_CACHE[key], qvec, k=20, n_probes=3)
    return hits.select("vec_id", F.round("cosine", 6).alias("cosine"))


_GRAPH_ANN_CACHE: dict[str, str] = {}


def q_ann_graph_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph ANN (the HNSW-equivalent — schema/DenseVectorField.java:69,
    search/vector/KnnQParserPlugin.java): IVF cells for the distributed
    routing level, a navigable-small-world graph INSIDE each cell for
    sublinear intra-cell beam search.  Approximate by design, rows-only
    check; recall + sublinearity + partition pruning asserted in
    tests/test_pipeline.py."""
    from apache___solr_spark.pipeline.similarity import (
        build_graph_ann_index,
        query_graph_ann_index,
    )

    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    key = os.path.abspath(sf_dir)
    if key not in _GRAPH_ANN_CACHE:
        out = os.path.join(
            tempfile.gettempdir(),
            "solr_spark_gann_" + key.strip("/").replace("/", "_"),
        )
        build_graph_ann_index(e.filter(F.col("vec_id") != 0), out, n_centroids=16)
        _GRAPH_ANN_CACHE[key] = out
    hits = query_graph_ann_index(spark, _GRAPH_ANN_CACHE[key], qvec, k=20, n_probes=3)
    return hits.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs baseline on a capped
    subset with PLANTED near-duplicates: vec_id+100000 = embedding shifted
    by +0.05 per element) — the LSH bucket-join variant is the scale path,
    recall-tested in tests/."""
    from apache___solr_spark.pipeline.similarity import embedding_near_dup_pairs

    base = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 150)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    planted = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda v: v + F.lit(0.05)).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    out = embedding_near_dup_pairs(corpus, threshold=0.9, use_lsh=False)
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


def q_heatmap_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """heatmap facet (FacetHeatmap capability): 2D grid counts over
    (l_quantity, l_discount)."""
    from apache___solr_spark.operators import heatmap_facet

    li = _t(spark, sf_dir, "lineitem")
    return heatmap_facet(li, "l_quantity", "l_discount", 0.0, 10.0, 0.0, 0.02)


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup() stream / terms facet with stats (RollupStream.java:216):
    TPC-H Q1 shape, exact integer-cent arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents).alias("sum_price_cents"),
            F.sum(cents * (100 - disc)).alias("revenue_milli"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_inner_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """innerJoin() + rollup() (InnerJoinStream.java): revenue per market
    segment through orders->customer."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(cents).alias("total_cents"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("c_mktsegment")
    )


def q_hash_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashJoin() stream (HashJoinStream.java:46): broadcast the small part
    side into the lineitem probe."""
    from apache___solr_spark.operators import hash_join

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    j = hash_join(li, p, ["l_partkey"])
    return (
        j.groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("p_brand")
    )


def q_features_igain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """features() / {!igain} information-gain feature selection
    (IGainTermsQParserPlugin.java:162-188, FeaturesSelectionStream.java:375):
    top terms separating lang='en' documents.  One explode + one
    groupBy(term) shuffle + broadcast totals."""
    from apache___solr_spark.pipeline.textml import select_features_igain

    d = _t(spark, sf_dir, "documents")
    sel = select_features_igain(d, "text", "lang", "en", num_terms=25)
    return sel.select(
        "term",
        F.round("score", 6).alias("score"),
        "doc_freq",
        F.round("idf", 6).alias("idf"),
    )


def q_classify_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train() + classify() (TextLogisticRegressionQParserPlugin.java:150,
    ClassifyStream.java): batch-GD logistic regression on igain features,
    then score every doc.  Deterministic (zero init, fixed epochs): the
    driver hash-checks it against a fully-independent DuckDB oracle that
    unrolls the 3 GD epochs in SQL (_classify_logit_sql); train math is
    additionally numpy-oracled per epoch in tests/test_textml.py."""
    from apache___solr_spark.pipeline.textml import (
        predict_logit,
        select_features_igain,
        train_text_logit,
    )

    d = _t(spark, sf_dir, "documents")
    feats = [
        (r["term"], r["idf"])
        for r in select_features_igain(
            d, "text", "lang", "en", num_terms=10
        ).collect()
    ]
    iters = train_text_logit(
        d, "text", "lang", feats, positive_label="en",
        iterations=3, alpha=0.05, id_col="doc_id",
    )
    out = predict_logit(d, "text", feats, iters[-1]["weights"])
    return out.select(
        "doc_id", F.round("probability_d", 6).alias("prob"), "prediction"
    ).orderBy("doc_id")


def q_json_facet_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON Facet API (search/facet/FacetRequest.java DSL): nested
    terms->terms with per-parent limits and named stats, lowered to one
    groupBy per level (DuckDB-oracled: window top-N per parent)."""
    from apache___solr_spark.operators.json_facet import json_facet

    e = _t(spark, sf_dir, "events")
    out = json_facet(
        e,
        {
            "types": {
                "type": "terms",
                "field": "event_type",
                "limit": 3,
                "sort": "s desc",
                "facet": {
                    "s": "sum(value)",
                    "by_user": {"type": "terms", "field": "user_id", "limit": 2},
                },
            }
        },
    )["types.by_user"]
    return out.orderBy("event_type", F.col("count").desc(), "user_id")


def q_expr_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-expression LANGUAGE end to end (StreamExpressionParser.java
    + Lang.java registry): the exact string a reference user would send —
    leftOuterJoin -> rollup(metrics) -> having(gt) -> top(sort) ->
    select(as) — parsed and lowered to one Catalyst plan.  Subsumes the
    left_outer_join entry (the LOJ is inside the expression)."""
    from apache___solr_spark.expr import StreamFactory

    fac = StreamFactory(spark, sf_dir=sf_dir)
    out = fac.df(
        "select("
        "  top(n=20,"
        "    having("
        "      rollup("
        '        leftOuterJoin(search(customer, q="*:*", fl="c_custkey,c_nationkey"),'
        '                      search(orders, q="o_totalprice:[1000 TO *]",'
        '                             fl="o_custkey,o_totalprice"),'
        '                      on="c_custkey=o_custkey"),'
        '        over="c_nationkey", sum(o_totalprice), count(*)),'
        "      gt(count(*), 10)),"
        '    sort="sum(o_totalprice) desc, c_nationkey asc"),'
        '  "c_nationkey", "sum(o_totalprice) as sum_price", "count(*) as cnt")'
    )
    return out.select(
        "c_nationkey", F.round("sum_price", 2).alias("sum_price"), "cnt"
    )


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect() stream (IntersectStream.java): customers having orders."""
    from apache___solr_spark.operators import intersect

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return intersect(c, o, ["c_custkey"]).orderBy("c_custkey")


def q_complement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """complement() stream (ComplementStream.java): customers with no order
    above 300k.  (The round-1 customers-without-orders variant returned 0
    rows at every SF — vacuous; this one is non-empty at sf0.001 and sf0.01.)"""
    from apache___solr_spark.operators import complement

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return complement(c, big, ["c_custkey"]).orderBy("c_custkey")


def q_cartesian_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cartesianProduct() stream: unnest p_name words to tuples."""
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return (
        p.select("p_partkey", F.explode(words).alias("word"))
        .orderBy("p_partkey", "word")
    )


def q_range_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range facet (FacetRangeProcessor.java:51) over o_totalprice."""
    from apache___solr_spark.operators import range_facet

    o = _t(spark, sf_dir, "orders")
    out = range_facet(o, "o_totalprice", 0.0, 600000.0, 50000.0)
    return out.select(
        F.col("bucket_start").cast("long").alias("bucket_start"),
        F.col("count").alias("n"),
    )


def q_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timeseries() stream (TimeSeriesStream.java:53): daily event rollup."""
    from apache___solr_spark.operators import timeseries

    e = _t(spark, sf_dir, "events")
    out = timeseries(
        e,
        "ts",
        "1 day",
        {
            "n": F.count(F.lit(1)),
            "total_value": F.round(F.sum("value"), 4),
        },
    )
    return out


def q_facet_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms facet (FacetFieldProcessorByArrayDV.java:42): top event types
    with per-bucket stats."""
    from apache___solr_spark.operators import facet

    e = _t(spark, sf_dir, "events")
    return facet(
        e,
        "event_type",
        aggs={
            "count": F.count(F.lit(1)),
            "avg_value": F.round(F.avg("value"), 6),
            "n_users": F.countDistinct("user_id"),
        },
        limit=5,
    )


def q_facet2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet2D() stream (Facet2DStream.java): top nations x segments."""
    from apache___solr_spark.operators import facet2d

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = c.join(n, c.c_nationkey == n.n_nationkey)
    return facet2d(j, "n_name", "c_mktsegment", 5, 3).orderBy(
        "n_name", F.col("agg").desc(), "c_mktsegment"
    )


def q_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingQParserPlugin (CollapsingQParserPlugin.java:121): best
    order per customer by totalprice (tie: lowest orderkey)."""
    from apache___solr_spark.operators import collapse

    o = _t(spark, sf_dir, "orders")
    out = collapse(
        o, "o_custkey", [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
    ).orderBy("o_custkey")


def q_group_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result grouping group.limit=2 (search/Grouping.java:73)."""
    from apache___solr_spark.operators import group_top_n

    o = _t(spark, sf_dir, "orders")
    out = group_top_n(
        o, "o_custkey", [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 2
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("group_rank"),
    ).orderBy("o_custkey", "group_rank")


def q_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExpandComponent (ExpandComponent.java:110): two runners-up per
    collapsed customer group."""
    from apache___solr_spark.operators import collapse, expand

    o = _t(spark, sf_dir, "orders")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    heads = collapse(o, "o_custkey", order)
    out = expand(heads, o, "o_custkey", order, 2)
    return out.select("o_custkey", "o_orderkey").orderBy("o_custkey", "o_orderkey")


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top() stream / top-k collector (RankStream.java:54,
    SolrIndexSearcher.java:1894): compiles to TakeOrderedAndProject."""
    from apache___solr_spark.operators import top

    o = _t(spark, sf_dir, "orders")
    out = top(o, 25, F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return out.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


def q_cursor_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CursorMark keyset paging (search/CursorMark.java:46)."""
    from apache___solr_spark.operators import cursor_page

    o = _t(spark, sf_dir, "orders")
    out = cursor_page(
        o, "o_totalprice", "o_orderkey", 20, after=(100000.0, 0), ascending=True
    )
    return out.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


def q_merge_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge() + unique() streams (MergeStream.java, UniqueStream.java)."""
    from apache___solr_spark.operators import merge, unique

    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return unique(merge(a, b), ["user_id"]).orderBy("user_id")


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """having() stream (HavingStream.java): users with >= 5 error events."""
    from apache___solr_spark.operators import having, rollup

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    agg = rollup(e, ["user_id"], {"n_errors": F.count(F.lit(1))})
    return having(agg, F.col("n_errors") >= 5).orderBy("user_id")


def q_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats() stream / StatsComponent (StatsStream.java,
    StatsComponent.java:34): whole-table aggregates, exact + rounded."""
    from apache___solr_spark.operators import stats

    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return stats(
        li,
        {
            "n": F.count(F.lit(1)),
            "sum_qty": F.sum(F.col("l_quantity").cast("long")),
            "min_price_cents": F.min(cents),
            "max_price_cents": F.max(cents),
            "sum_price_cents": F.sum(cents),
            "n_parts": F.countDistinct("l_partkey"),
        },
    )


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significantTerms() stream (SignificantTermsStream.java): tokens
    over-represented in error-event docs... here: in non-'en' documents vs
    the whole corpus."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(_toks(F.col("text"))).alias("term"))
    # one tokenize pass: fg/bg per-term counts come out of a single shuffle,
    # and the global totals are an agg over the (small) per-term frame — the
    # round-1 version re-tokenized the corpus 4x (VERDICT.md wrong #6).
    counts = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("bg_count"),
        F.count(F.when(F.col("lang") != "en", F.lit(1))).alias("fg_count"),
    ).persist()
    totals = counts.agg(
        F.sum("bg_count").alias("n_bg"), F.sum("fg_count").alias("n_fg")
    ).collect()[0]
    n_fg, n_bg = int(totals["n_fg"]), int(totals["n_bg"])
    return (
        counts.filter(F.col("fg_count") > 0)
        .select("term", "fg_count", "bg_count")
        .withColumn(
            "score",
            F.round(
                (F.col("fg_count") / F.lit(float(n_fg)))
                / (F.col("bg_count") / F.lit(float(n_bg))),
                6,
            ),
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(20)
    )


def q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (ReciprocalRankFusion.java:37): fuse two
    rankings of orders (by totalprice, by recency)."""
    from apache___solr_spark.query.extras import reciprocal_rank_fusion

    o = _t(spark, sf_dir, "orders")
    w1 = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    w2 = Window.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
    a = o.select("o_orderkey", F.row_number().over(w1).alias("rank")).filter(
        F.col("rank") <= 100
    )
    b = o.select("o_orderkey", F.row_number().over(w2).alias("rank")).filter(
        F.col("rank") <= 100
    )
    return reciprocal_rank_fusion([a, b], "o_orderkey", k=60, limit=20)


def q_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rerank (ReRankQParserPlugin): rescore BM25 top-100 with a second
    query — fulltext, rows-only check (golden-tested in tests/)."""
    idx = _fulltext_index(spark, sf_dir)
    from apache___solr_spark.query.extras import rerank

    eng = _engine(spark, idx)
    return rerank(eng, "table query", "merge", k=20, rerank_docs=100)


def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoreLikeThis (MoreLikeThisHandler): docs similar to doc 0."""
    idx = _fulltext_index(spark, sf_dir)
    from apache___solr_spark.query.extras import more_like_this

    eng = _engine(spark, idx)
    return more_like_this(eng, doc_id=0, k=10)


def q_score_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{!join score=max} (ScoreJoinQParserPlugin.java:92): customers scored
    by their best order's totalprice."""
    from apache___solr_spark.operators import score_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    j = score_join(c, o, "c_custkey", "o_custkey", "o_totalprice", mode="max")
    return j.select(
        "c_custkey",
        "c_mktsegment",
        F.round("join_score", 2).alias("join_score"),
    ).orderBy("c_custkey")


def q_block_join_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{!parent which=...} (BlockJoinParentQParserPlugin.java): orders having
    a returned full-quantity line item."""
    from apache___solr_spark.operators import block_join_parent

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    out = block_join_parent(
        o, li, "o_orderkey", "l_orderkey",
        (F.col("l_quantity") >= 49) & (F.col("l_returnflag") == "R"),
    )
    return out.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    ).orderBy("o_orderkey")


def q_block_join_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{!child of=...} (BlockJoinChildQParserPlugin.java): line items of
    orders above 300k."""
    from apache___solr_spark.operators import block_join_children

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    out = block_join_children(
        o, li, "o_orderkey", "l_orderkey", F.col("o_totalprice") > 300000
    )
    return out.select("l_orderkey", "l_linenumber").orderBy(
        "l_orderkey", "l_linenumber"
    )


def q_unique_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqueBlock(_root_) (facet/UniqueBlockAgg.java): distinct parent
    orders per return flag."""
    from apache___solr_spark.operators import unique_block

    li = _t(spark, sf_dir, "lineitem")
    return unique_block(li, "l_returnflag", "l_orderkey").orderBy("l_returnflag")


def q_relatedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relatedness() agg (facet/RelatednessAgg.java:756): association of
    event types with a deterministic foreground user slice."""
    from apache___solr_spark.operators import relatedness_facet

    e = _t(spark, sf_dir, "events")
    out = relatedness_facet(
        e, "event_type", F.col("user_id") % 7 == 0, "event_id"
    )
    return out.select(
        "event_type",
        "fg_count",
        "bg_count",
        F.round("relatedness", 5).alias("relatedness"),
    )


def q_gather_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodes() graph expression (io/graph/GatherNodesStream.java): two-hop
    BFS over the order<->part bipartite graph from order 1 (parts offset by
    1e6 into a disjoint node-id space)."""
    from apache___solr_spark.operators import gather_nodes

    li = _t(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_orderkey").alias("src"),
        (F.col("l_partkey") + 1000000).alias("dst"),
    )
    edges = fwd.unionByName(
        li.select(
            (F.col("l_partkey") + 1000000).alias("src"),
            F.col("l_orderkey").alias("dst"),
        )
    )
    seeds = spark.createDataFrame([(1,)], "src long")
    out = gather_nodes(edges, seeds, "src", "dst", hops=2)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("depth").cast("int").alias("depth"),
    ).orderBy("depth", "node")


def q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spellcheck candidates (SpellCheckComponent.java:90): dictionary terms
    within levenshtein<=2 of the misspelling 'scon', ranked by df."""
    from apache___solr_spark.query.suggest import suggest_terms

    d = _t(spark, sf_dir, "documents")
    dictionary = (
        d.select(F.explode(_toks(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return suggest_terms(dictionary, "scon", freq_col="df", limit=10)


def q_range_facet_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range facet other=all (FacetRangeProcessor.java:51): gap buckets plus
    before/after/between."""
    from apache___solr_spark.operators import range_facet_other

    o = _t(spark, sf_dir, "orders")
    return range_facet_other(o, "o_totalprice", 100000.0, 400000.0, 100000.0)


def q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HighlightComponent (handler/component/HighlightComponent.java:55):
    top-10 BM25 hits with whole-word query-term occurrences marked."""
    from apache___solr_spark.query.extras import highlight

    eng = _simple_engine(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    out = highlight(eng, "table query", d, "doc_id", "text", k=10)
    return out.select(
        "doc_id", F.round("score", 6).alias("score"), "snippet"
    ).orderBy(F.col("score").desc(), "doc_id")


def q_pivot_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot facet (PivotFacetComponent): nation x mktsegment count tree,
    flattened with a level column."""
    from apache___solr_spark.operators import pivot_facet

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = c.join(n, c.c_nationkey == n.n_nationkey)
    out = pivot_facet(j, ["n_name", "c_mktsegment"])
    return out.select(
        "n_name", "c_mktsegment", "count", F.col("level").cast("int").alias("level")
    ).orderBy("level", "n_name", "c_mktsegment")


def q_query_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query facet (JSON Facet type=query, FacetQuery processor): named
    predicate buckets with sub-stats, computed in ONE conditional-agg pass
    over the scan — no per-bucket re-query."""
    o = _t(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 300000
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.agg(
        F.count(F.when(big, F.lit(1))).alias("big_count"),
        F.round(F.sum(F.when(big, F.col("o_totalprice"))), 2).alias("big_sum"),
        F.count(F.when(urgent, F.lit(1))).alias("urgent_count"),
        F.count(F.when(big & urgent, F.lit(1))).alias("big_urgent_count"),
    )


def q_mlt_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoreLikeThis through the real engine on the SQL-expressible analyzer:
    top tf*idf terms of doc 0 (min_df 2, max 10 terms) issued as an OR
    query, source doc dropped — fully oracle-checked.

    The top-10 cut happens at ROUNDED (6dp) precision with a doc_id
    tiebreak, mirrored in the oracle: the 10-term score sum is exactly the
    case where Spark's partition-order float reassociation can flip a
    raw-ulp-tied boundary doc run to run (observed once in the full suite),
    so fetch 20 and cut deterministically."""
    eng = _simple_engine(spark, sf_dir)
    from apache___solr_spark.query.extras import more_like_this

    out = more_like_this(eng, doc_id=0, k=20)
    return (
        _rounded_hits(out)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile agg (PercentileAgg.java — t-digest in the reference; we
    use Spark's exact percentile so DuckDB's quantile_cont matches)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def _tagged_union(frames: dict[str, DataFrame], tag: str) -> DataFrame:
    """Union same-schema case frames with a literal tag column — the driver
    value-hash-checks every case of a merged entry in one window slot."""
    out = None
    for name, df in frames.items():
        f = df.select(F.lit(name).alias(tag), "*")
        out = f if out is None else out.unionByName(f)
    return out


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pluggable similarity registry (search/similarities/*Factory.java) —
    the SAME query scored by BM25, classic TF-IDF and LM Dirichlet through
    the real index + engine, one tagged case per model; every case is
    value-hash-checked against its DuckDB scoring oracle (merged from the
    round-2 entries bm25_simple_topk / tfidf_topk / lmdirichlet_topk to fit
    the driver's 50-entry check window)."""
    frames = {}
    for sim in ("bm25", "classic", "lmdirichlet"):
        eng = _simple_engine(spark, sf_dir, similarity=sim)
        frames[sim] = _stable_topk(
            eng.search("table query merge", k=64, with_url=False), 50
        )
    return _tagged_union(frames, "sim").orderBy(
        "sim", F.col("score").desc(), "doc_id"
    )


def q_query_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic-parser surface in one tagged entry (merged from the round-2
    entries bm25_simple_and / bm25_simple_nested / phrase_search /
    prefix_boost_search): MUST+MUST_NOT boolean, nested groups with a sloppy
    phrase, exact-adjacency phrase, prefix-expansion+boost, a constant-score
    fq filter (fq=merge restricts membership WITHOUT touching the BM25
    scores — SolrIndexSearcher.getProcessedFilter semantics), and the sort=
    request param (sorted_search doclen asc: membership = the 50 shortest
    matching docs, scores still the query's BM25 values) — each case
    value-hash-checked against its DuckDB BM25 oracle."""
    eng = _simple_engine(spark, sf_dir)
    frames = {
        "must_not": _stable_topk(
            eng.search("table AND query -merge", k=64, with_url=False), 50
        ),
        "nested_sloppy": _stable_topk(
            eng.search(
                '+("part filter"~2 merge) +(table query) -scan',
                k=64,
                with_url=False,
            ),
            50,
        ),
        "phrase": _stable_topk(
            eng.search('"part filter" merge', k=64, with_url=False), 50
        ),
        "prefix_boost": _stable_topk(
            eng.search("s* merge^2", k=64, with_url=False), 50
        ),
        "fq": _stable_topk(
            eng.search("table query", k=64, with_url=False, fq=["merge"]),
            50,
        ),
        # integer sort keys -> the cut is exact; no rounded re-cut needed
        "sorted": eng.sorted_search(
            "table query", sort="doclen asc", k=50
        ).select("doc_id", F.round("score", 6).alias("score")),
    }
    return _tagged_union(frames, "qcase").orderBy(
        "qcase", F.col("score").desc(), "doc_id"
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline text metrics in one wide frame (merged from the
    round-2 entries token_count / detect_language / quality_score, plus the
    Gopher repetition filters): token and subword counts, stopword-ratio
    language id, the quality heuristic, and duplicate-line / top-n-gram /
    duplicate-n-gram fractions (Rae et al. 2021 §A1.1), joined per doc —
    every column oracle-checked."""
    from apache___solr_spark.pipeline.textqual import (
        c4_clean,
        gopher_filters,
        repetition_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    tc = q_token_count(spark, sf_dir)
    dl = q_detect_language(spark, sf_dir)
    qs = q_quality_score(spark, sf_dir).drop("n_tokens")
    rep = repetition_stats(docs, "text", "doc_id")
    gop = gopher_filters(docs, "text", "doc_id").select(
        "doc_id",
        "n_words",
        *[
            F.col(c).cast("int").alias(c)
            for c in (
                "ok_word_count",
                "ok_mean_wordlen",
                "ok_symbol_ratio",
                "ok_bullet_lines",
                "ok_ellipsis_lines",
                "ok_alpha_words",
                "ok_stop_words",
                "gopher_pass",
            )
        ],
    )
    c4 = c4_clean(docs, "text", "doc_id").select(
        "doc_id",
        "n_lines_kept",
        F.col("c4_keep").cast("int").alias("c4_keep"),
    )
    return (
        tc.join(dl, "doc_id")
        .join(qs, "doc_id")
        .join(rep, "doc_id")
        .join(gop, "doc_id")
        .join(c4, "doc_id")
        .orderBy("doc_id")
    )


def q_topk_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k collector + CursorMark keyset paging (RankStream.java:54,
    search/CursorMark.java:46) as tagged cases of one entry (merged from
    the round-2 entries topk_orders / cursor_page)."""
    frames = {
        "topk": q_topk_orders(spark, sf_dir),
        "cursor": q_cursor_page(spark, sf_dir),
    }
    return _tagged_union(frames, "page").orderBy("page", "o_orderkey")


INTERVALS = ["[*,100000)", "[50000,200000]", "(200000,400000)", "[400000,*]"]


def q_interval_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet.interval (request/IntervalFacets.java): overlapping arbitrary
    intervals over o_totalprice, one conditional-agg pass."""
    from apache___solr_spark.operators import interval_facet

    o = _t(spark, sf_dir, "orders")
    return interval_facet(o, "o_totalprice", INTERVALS)


def q_range_facet_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range facet gap buckets, other=all before/after/between buckets
    (FacetRangeProcessor.java:51), and facet.interval overlapping buckets
    (IntervalFacets.java) as tagged cases of one entry (merged from the
    round-2 entries range_facet / range_facet_other)."""
    gap = q_range_facet(spark, sf_dir).select(
        F.lit("gap").alias("fkind"),
        F.col("bucket_start").cast("string").alias("bucket"),
        F.col("n"),
    )
    other = q_range_facet_other(spark, sf_dir)
    cnt = [c for c in other.columns if c != "bucket"][0]
    other = other.select(
        F.lit("other").alias("fkind"),
        F.col("bucket").cast("string").alias("bucket"),
        F.col(cnt).alias("n"),
    )
    iv = q_interval_facet(spark, sf_dir).select(
        F.lit("interval").alias("fkind"),
        F.col("interval").alias("bucket"),
        F.col("n"),
    )
    return gap.unionByName(other).unionByName(iv).orderBy("fkind", "bucket")


def q_near_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH and SimHash near-dup candidates, HASH-CHECKABLE (r4
    VERDICT #4): each method's candidate set is intersected with the EXACT
    n-gram-Jaccard true-pair set (inverted shingle index — never a cross
    join), and the entry emits (method, id_a, id_b, exact jaccard).  The
    DuckDB oracle computes the exact expected set per method, so hash
    equality IS a 100%-recall assertion over each method's design regime
    (BaseDistributedSearchTestCase.java:98 control-vs-distributed):

    - minhash (64 hashes, 32 bands of 2): expected = ALL pairs with
      jaccard >= 0.5.  P(miss) at j=0.5 is (1-j^2)^32 ~= 1e-4 and falls
      super-exponentially in j; deterministic here (fixed seeds).
    - simhash (4x16-bit bands, catches hamming <= 3): the only pairs it
      deterministically guarantees are identical token streams (hamming
      0), so expected = pairs with jaccard = 1.0 — the planted verbatim
      copies.  Its near-dup (0.5..1.0) recall stays covered by the pytest
      recall oracle (tests/test_pipeline.py), as an honest approximation.

    Corpus: docs < 80 + two planted families per doc < 20 — a near dup
    (+100000, text minus its first 29 chars) and an exact dup (+200000,
    verbatim)."""
    from apache___solr_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash_dedup_candidates,
    )

    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") < 80).select("doc_id", "text")
    near = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 30)").alias("text"),
    )
    exact = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    corpus = base.unionByName(near).unionByName(exact)
    true_pairs = ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.5)
    cases = (
        ("minhash", minhash_lsh_candidates(corpus, "text", "doc_id", bands=32),
         F.lit(True)),
        ("simhash", simhash_dedup_candidates(corpus, "text", "doc_id"),
         F.col("jaccard") >= 0.999999),
    )
    out = None
    for method, cand, expected in cases:
        found = true_pairs.filter(expected).join(
            cand.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        )
        tagged = found.select(
            F.lit(method).alias("method"),
            "id_a",
            "id_b",
            F.round("jaccard", 6).alias("jaccard"),
        )
        out = tagged if out is None else out.unionByName(tagged)
    return out.orderBy("method", "id_a", "id_b")


def _ann_eval_corpus(spark: SparkSession, sf_dir: str):
    """(corpus_df, qvec) for the hash-checkable ANN entry: the full
    embeddings table PLUS 20 planted clusters of 30 satellites each —
    centers are the vec_id<20 embeddings, satellites perturb each element
    by an integer-mod expression ((c*31+j*37+i*11)%19-9)/200 that DuckDB
    reproduces bit-exactly (no transcendental, no RNG).  The query is
    vec_id 0's embedding, so the exact top-20 is oracle-computable and the
    clustered structure is the regime ANN indexes exist for (near-random
    vectors have no neighbors to find — probe-fraction-bound recall,
    documented in tests/test_pipeline.py)."""
    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    sats = (
        e.filter(F.col("vec_id") < 20)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .select(
            "vec_id",
            "v",
            F.explode(F.sequence(F.lit(1), F.lit(30))).alias("j"),
        )
        .select(
            (F.lit(1000000) + F.col("vec_id") * 100 + F.col("j")).alias("vec_id"),
            F.expr(
                "transform(v, (x, i) -> "
                "x + (((vec_id*31 + j*37 + (i+1)*11) % 19) - 9)/200.0)"
            ).alias("embedding"),
        )
    )
    corpus = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .unionByName(sats)
    )
    return corpus, qvec


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-nearest-neighbor top-k through ALL THREE persisted index
    shapes — random-hyperplane LSH buckets, the IVF spherical-k-means
    coarse quantizer, and the graph index (NSW beam search inside IVF
    cells, the HNSW-equivalent) — HASH-CHECKABLE (r4 VERDICT #4): the
    entry emits the EXACT cosine top-20 over a planted-cluster corpus
    (see :func:`_ann_eval_corpus`) plus a per-method ``recall_ok`` flag
    that is TRUE iff that method's ANN top-20 contains >= 18 of the exact
    top-20 (recall@20 >= 0.9).  The DuckDB oracle computes the same exact
    top-20 and expects recall_ok = TRUE, so hash equality verifies both
    the exact cosine path and every index's recall bound — the ANN result
    genuinely feeds the output through the flag."""
    from pyspark.sql import Window

    from apache___solr_spark.pipeline.similarity import (
        build_ann_index,
        build_graph_ann_index,
        build_ivf_index,
        cosine_topk_bruteforce,
        query_ann_index,
        query_graph_ann_index,
        query_ivf_index,
    )

    corpus, qvec = _ann_eval_corpus(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    if key not in _ANN_EVAL_CACHE:
        root = os.path.join(
            tempfile.gettempdir(),
            "solr_spark_anneval_" + key.strip("/").replace("/", "_"),
        )
        build_ann_index(corpus, os.path.join(root, "lsh"), dim=len(qvec))
        build_ivf_index(corpus, os.path.join(root, "ivf"), n_centroids=16)
        build_graph_ann_index(corpus, os.path.join(root, "graph"), n_centroids=16)
        _ANN_EVAL_CACHE[key] = root
    root = _ANN_EVAL_CACHE[key]
    exact = cosine_topk_bruteforce(corpus, qvec, k=20)
    hits = {
        "lsh": query_ann_index(
            spark, os.path.join(root, "lsh"), qvec, k=20, multiprobe_hamming=2
        ),
        "ivf": query_ivf_index(spark, os.path.join(root, "ivf"), qvec, k=20, n_probes=3),
        "graph": query_graph_ann_index(
            spark, os.path.join(root, "graph"), qvec, k=20, n_probes=3
        ),
    }
    w = Window.partitionBy()
    out = None
    for method, h in hits.items():
        t = (
            exact.join(h.select("vec_id", F.lit(1).alias("_hit")), "vec_id", "left")
            .select(
                F.lit(method).alias("method"),
                "vec_id",
                F.round("cosine", 6).alias("cosine"),
                (
                    F.coalesce(F.sum("_hit").over(w), F.lit(0)) >= F.lit(18)
                ).alias("recall_ok"),
            )
        )
        out = t if out is None else out.unionByName(t)
    return out.orderBy("method", F.col("cosine").desc(), "vec_id")


_ANN_EVAL_CACHE: dict[str, str] = {}


def q_simple_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet.field counts over the FULL DocSet of a query — the classic
    search+facet combo (handler/component/FacetComponent.java +
    request/SimpleFacets.java:483 getTermCounts): every matching doc
    counted, not just the returned page.  The DocSet comes from the real
    index's bucket-pruned postings scan (engine.docset()); field metadata
    rides a url-keyed side table."""
    from apache___solr_spark.query.extras import simple_facets

    eng = _simple_engine(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    meta = d.select(
        F.format_string("doc%09d", F.col("doc_id")).alias("url"),
        "lang",
        "source",
    )
    return simple_facets(eng, "table AND query", meta, ["lang", "source"])


def _bm25_sql_prefix() -> str:
    """Shared CTEs for the BM25 oracles: SQL tokens, corpus stats, the
    SmallFloat 256-entry norm table (index/smallfloat.py — encode rounds a
    doclen DOWN to the nearest representable value, i.e. max(v) <= doclen),
    and the quantized doc length per doc."""
    from apache___solr_spark.index.smallfloat import NORM_TABLE

    norm_vals = ", ".join(str(int(v)) for v in NORM_TABLE)
    return f"""
        toks AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        ), stats AS (
            SELECT (SELECT count(*) FROM documents) AS n,
                   (SELECT count(*) FROM toks) AS total_len
        ), norm AS (
            SELECT unnest([{norm_vals}]) AS v
        ), dl AS (
            SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id
        ), qdl AS (
            SELECT doc_id,
                   (SELECT max(v) FROM norm WHERE v <= doclen) AS dlq
            FROM dl
        )"""


def _bm25_scored_cte(name: str, terms: list[str], boost: float = 1.0) -> str:
    """BM25 (k1=1.2, b=0.75) per-doc score over ``terms`` — written with the
    exact operation nesting of query/engine.py so float64 results agree to
    the last ulps:  (idf*boost)*tf / (tf + k1*((1-b) + b*dlq/avgdl))."""
    tl = ", ".join(f"'{t}'" for t in terms)
    idf = f"ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))"
    if boost != 1.0:
        idf = f"({idf} * {boost!r})"
    return f""", tf_{name} AS (
            SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term IN ({tl}) GROUP BY doc_id, term
        ), df_{name} AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM toks
            WHERE term IN ({tl}) GROUP BY term
        ), scored_{name} AS (
            SELECT t.doc_id,
                   sum({idf}
                       * t.tf / (t.tf + 1.2 * ((1 - 0.75) + 0.75 * q.dlq
                                 / (CAST(s.total_len AS DOUBLE) / s.n)))) AS score
            FROM tf_{name} t
            JOIN df_{name} d USING (term)
            JOIN qdl q USING (doc_id)
            CROSS JOIN stats s
            GROUP BY t.doc_id
        )"""


def _classify_logit_sql(
    iters: int = 3, alpha: float = 0.05, k_feats: int = 10
) -> str:
    """Fully-independent DuckDB oracle for train()+classify(): igain top-k
    feature selection, ``iters`` UNROLLED full-batch GD epochs (one CTE
    chain per epoch — deterministic, fixed zero init), then per-doc
    scoring.  Float nesting mirrors pipeline/textml.py exactly:
    value = idf*(1+ln tf), w -= (alpha*g)/n, dot built feature-by-feature
    in igain-rank order with 0.0 for absent terms (predict_logit's chained
    column expression)."""

    def ent(p: str) -> str:
        return (
            f"(CASE WHEN {p} <= 0 OR {p} >= 1 THEN 0 "
            f"ELSE -({p})*ln({p}) - (1-({p}))*ln(1-({p})) END)"
        )

    score = (
        f"{ent('npos/n')} - ( (dfreq/n) * {ent('xc/dfreq')} "
        f"+ (1 - dfreq/n) * {ent('(npos-xc)/(n-dfreq+1)')} )"
    )
    a = repr(float(alpha))
    epochs = []
    # epoch 1 from zero weights: dot = 0, sigmoid(0) = 0.5
    epochs.append(f"""
        err1 AS (
            SELECT doc_id, 0.5 - y AS err
            FROM (SELECT DISTINCT doc_id, y FROM design)
        ),
        w1 AS (
            SELECT f.term, 0.0 - {a} * coalesce(g.g, 0.0) / nd.n AS w
            FROM feats f LEFT JOIN (
                SELECT d.term, sum(e.err * d.value) AS g
                FROM design d JOIN err1 e USING (doc_id) GROUP BY d.term
            ) g ON f.term = g.term CROSS JOIN nd
        ),
        b1 AS (
            SELECT 0.0 - {a} * (SELECT sum(err) FROM err1) / nd.n AS b
            FROM nd
        )""")
    for it in range(2, iters + 1):
        p = it - 1
        epochs.append(f"""
        dot{it} AS (
            SELECT d.doc_id, d.y,
                   (SELECT b FROM b{p}) + sum(w.w * d.value) AS dot
            FROM design d JOIN w{p} w ON d.term = w.term
            GROUP BY d.doc_id, d.y
        ),
        err{it} AS (
            SELECT doc_id, 1/(1+exp(-dot)) - y AS err FROM dot{it}
        ),
        w{it} AS (
            SELECT w{p}.term, w{p}.w - {a} * coalesce(g.g, 0.0) / nd.n AS w
            FROM w{p} LEFT JOIN (
                SELECT d.term, sum(e.err * d.value) AS g
                FROM design d JOIN err{it} e USING (doc_id) GROUP BY d.term
            ) g ON w{p}.term = g.term CROSS JOIN nd
        ),
        b{it} AS (
            SELECT (SELECT b FROM b{p})
                   - {a} * (SELECT sum(err) FROM err{it}) / nd.n AS b
            FROM nd
        )""")
    wf, bf = f"w{iters}", f"b{iters}"
    # dot chained in rank order, 0.0 when the doc lacks the term — each
    # sum(CASE WHEN rk=i ...) aggregates at most one row, so the float
    # addition order is exactly predict_logit's w0 + c1 + ... + ck
    chain = "".join(
        f"\n                   + coalesce(sum(CASE WHEN ct.rk = {i} "
        f"THEN ct.c END), 0.0)"
        for i in range(1, k_feats + 1)
    )
    return f"""
        WITH labeled AS (
            SELECT doc_id, text,
                   CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
            FROM documents
        ),
        totals AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(y) AS DOUBLE) AS npos
            FROM labeled
        ),
        per_term AS (
            SELECT term, CAST(count(*) AS DOUBLE) AS dfreq,
                   CAST(sum(y) AS DOUBLE) AS xc
            FROM (
                SELECT unnest(list_distinct(
                           regexp_extract_all(lower(text), '[a-z0-9]+')
                       )) AS term, y
                FROM labeled
            ) GROUP BY term
        ),
        feats AS (
            SELECT term, idf, row_number() OVER (
                       ORDER BY score DESC, term) AS rk
            FROM (
                SELECT term, {score} AS score, ln(n/(dfreq+1)) AS idf
                FROM per_term, totals
            ) QUALIFY rk <= {k_feats}
        ),
        design AS (
            SELECT tok.doc_id, tok.y, tok.term,
                   f.idf * (1 + ln(CAST(count(*) AS DOUBLE))) AS value
            FROM (
                SELECT doc_id, y,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS term
                FROM labeled
            ) tok JOIN feats f ON tok.term = f.term
            GROUP BY tok.doc_id, tok.y, tok.term, f.idf
        ),
        nd AS (
            SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM design
        ),{",".join(epochs)},
        alltf AS (
            SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
            FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS term
                FROM documents
            )
            WHERE term IN (SELECT term FROM feats)
            GROUP BY doc_id, term
        ),
        contrib AS (
            SELECT a.doc_id, f.rk, w.w * f.idf * (1 + ln(a.tf)) AS c
            FROM alltf a JOIN {wf} w ON a.term = w.term
            JOIN feats f ON a.term = f.term
        ),
        dots AS (
            SELECT d.doc_id,
                   (SELECT b FROM {bf}){chain} AS dot
            FROM documents d LEFT JOIN contrib ct ON ct.doc_id = d.doc_id
            GROUP BY d.doc_id
        )
        SELECT doc_id, round(1/(1+exp(-dot)), 6) AS prob,
               CASE WHEN 1/(1+exp(-dot)) >= 0.5 THEN 1 ELSE 0 END
                   AS prediction
        FROM dots ORDER BY doc_id
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the driver checks the FIRST 50, so EVERY entry
    is inside the window and ALL 50 are oracle-backed (hash-checkable);
    tests/test_entry_contract.py asserts the invariant.  Same-shape round-2
    entries are merged into tagged-union entries whose DuckDB oracles
    UNION ALL the per-case SQL, so every merged operator stays
    value-hash-checked:

    - similarity_topk = bm25_simple_topk + tfidf_topk + lmdirichlet_topk
      (tag ``sim``)
    - query_suite = fq-filtered + doclen-sorted cases
      + bm25_simple_and + bm25_simple_nested + phrase_search +
      prefix_boost_search (tag ``qcase``)
    - text_quality = token_count + detect_language + quality_score (joined)
    - topk_page = topk_orders + cursor_page (tag ``page``)
    - range_facet = range_facet + range_facet_other (tag ``fkind``)
    - near_dup_candidates = minhash + simhash (tag ``method``; since r5
      hash-checkable — exact-Jaccard expected set per method, see
      q_near_dup_candidates)
    - ann_topk = LSH + IVF + graph ANN (tag ``method``; since r5
      hash-checkable — exact top-20 + per-method recall_ok flag, see
      q_ann_topk)

    The redundant standard-analyzer duplicates of oracle-green entries
    (bm25_topk ~ similarity_topk's bm25 case, bm25_and_not ~ query_suite's
    must_not case, rerank ~ bm25_simple_rerank, more_like_this ~ mlt_simple)
    stay exported as library functions and bench headlines but are not
    registered twice."""
    return {
        # fulltext core, SQL-expressible analyzer: the REAL index + engine,
        # value-hash-checked against DuckDB scoring arithmetic end to end
        "similarity_topk": q_similarity_topk,
        "query_suite": q_query_suite,
        "bm25_simple_rerank": q_bm25_simple_rerank,
        # SQL-checkable text/search ops
        "term_stats": q_term_stats,
        "boolean_and_search": q_boolean_and_search,
        "simple_facets": q_simple_facets,
        # training-pipeline ops
        "text_quality": q_text_quality,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "cosine_topk": q_cosine_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "heatmap_facet": q_heatmap_facet,
        # relational operator layer (streaming expressions)
        "rollup_lineitem": q_rollup_lineitem,
        "inner_join_rollup": q_inner_join_rollup,
        "hash_join_parts": q_hash_join_parts,
        "expr_stream": q_expr_stream,
        "intersect": q_intersect,
        "complement": q_complement,
        "cartesian_product": q_cartesian_product,
        "range_facet": q_range_facet_all,
        "timeseries": q_timeseries,
        "facet_event_types": q_facet_event_types,
        "facet2d": q_facet2d,
        "collapse": q_collapse,
        "group_top_n": q_group_top_n,
        "expand": q_expand,
        "topk_page": q_topk_page,
        "merge_unique": q_merge_unique,
        "having": q_having,
        "stats_stream": q_stats_stream,
        "significant_terms": q_significant_terms,
        "score_join": q_score_join,
        "block_join_parent": q_block_join_parent,
        "block_join_children": q_block_join_children,
        "unique_block": q_unique_block,
        "relatedness": q_relatedness,
        "gather_nodes": q_gather_nodes,
        "suggest": q_suggest,
        "highlight": q_highlight,
        "pivot_facet": q_pivot_facet,
        "query_facet": q_query_facet,
        "mlt_simple": q_mlt_simple,
        "percentiles": q_percentiles,
        "rrf": q_rrf,
        "features_igain": q_features_igain,
        "json_facet_nested": q_json_facet_nested,
        # oracle-backed since round 4 (deterministic DuckDB twins: the GD
        # epoch unroll in SQL / the positions-export span-window oracle)
        "classify_logit": q_classify_logit,
        "span_near_unordered": q_span_near,
        # ---- rows-only tail (no SQL oracle; honestly-approximate ops,
        # each covered by pytest goldens): keep AFTER every oracle entry
        "near_dup_candidates": q_near_dup_candidates,
        "ann_topk": q_ann_topk,
    }


def _union_cases(tag: str, cases: dict[str, str], order: str) -> str:
    """Compose a merged-entry oracle: each component's oracle SQL, verbatim,
    as a tagged subquery (DuckDB allows WITH inside derived tables) — the
    per-case arithmetic stays byte-identical to the round-2 oracles."""
    parts = " UNION ALL ".join(
        f"SELECT '{name}' AS {tag}, * FROM ({sql})"
        for name, sql in cases.items()
    )
    return parts + f" ORDER BY {order}"


def oracle_sql() -> dict[str, str]:
    stops = _stops_sql()
    bm25 = _bm25_sql_prefix()
    d = {
        "bm25_simple_topk": f"""
            WITH {bm25}{_bm25_scored_cte("q", ["table", "query", "merge"])},
            hits AS (
                SELECT doc_id, score FROM scored_q
                ORDER BY score DESC, doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "bm25_simple_and": f"""
            WITH {bm25}{_bm25_scored_cte("m", ["table", "query"])},
            qual AS (
                SELECT doc_id FROM tf_m GROUP BY doc_id
                HAVING count(DISTINCT term) = 2
            ),
            hits AS (
                SELECT s.doc_id, s.score FROM scored_m s
                JOIN qual USING (doc_id)
                WHERE s.doc_id NOT IN (
                    SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')
                ORDER BY s.score DESC, s.doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "bm25_fq": f"""
            WITH {bm25}{_bm25_scored_cte("f", ["table", "query"])},
            hits AS (
                SELECT s.doc_id, s.score FROM scored_f s
                WHERE s.doc_id IN (
                    SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')
                ORDER BY s.score DESC, s.doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "bm25_sorted": f"""
            WITH {bm25}{_bm25_scored_cte("srt", ["table", "query"])},
            hits AS (
                SELECT s.doc_id, s.score FROM scored_srt s
                JOIN dl USING (doc_id)
                ORDER BY dl.doclen ASC, s.doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY doc_id ASC
        """,
        "bm25_simple_rerank": f"""
            WITH {bm25}{_bm25_scored_cte("m", ["table", "query"])}
                 {_bm25_scored_cte("r", ["merge"])},
            first AS (
                SELECT doc_id, score FROM scored_m
                ORDER BY score DESC, doc_id ASC LIMIT 100
            ),
            combined AS (
                SELECT f.doc_id, f.score + 2.0 * coalesce(r.score, 0.0) AS score
                FROM first f LEFT JOIN scored_r r USING (doc_id)
            ),
            top AS (
                SELECT doc_id, score FROM combined
                ORDER BY score DESC, doc_id ASC LIMIT 20
            )
            SELECT doc_id, round(score, 6) AS score FROM top
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "tfidf_topk": f"""
            WITH {bm25},
            tf_c AS (
                SELECT doc_id, term, count(*) AS tf FROM toks
                WHERE term IN ('table', 'query', 'merge') GROUP BY doc_id, term
            ), df_c AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM toks
                WHERE term IN ('table', 'query', 'merge') GROUP BY term
            ), scored_c AS (
                SELECT t.doc_id,
                       sum(((1 + ln((s.n + 1.0) / (d.df + 1.0)))
                            * (1 + ln((s.n + 1.0) / (d.df + 1.0))))
                           * sqrt(t.tf) / sqrt(greatest(q.dlq, 1))) AS score
                FROM tf_c t
                JOIN df_c d USING (term)
                JOIN qdl q USING (doc_id)
                CROSS JOIN stats s
                GROUP BY t.doc_id
            ),
            hits AS (
                SELECT doc_id, score FROM scored_c
                ORDER BY score DESC, doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "lmdirichlet_topk": f"""
            WITH {bm25},
            tf_l AS (
                SELECT doc_id, term, count(*) AS tf FROM toks
                WHERE term IN ('table', 'query', 'merge') GROUP BY doc_id, term
            ), cf_l AS (
                SELECT term, count(*) AS cf FROM toks
                WHERE term IN ('table', 'query', 'merge') GROUP BY term
            ), scored_l AS (
                SELECT t.doc_id,
                       sum(greatest(0.0,
                           ln(1 + t.tf / (2000.0
                               * (c.cf / CAST(s.total_len AS DOUBLE))))
                           + ln(2000.0 / (q.dlq + 2000.0)))) AS score
                FROM tf_l t
                JOIN cf_l c USING (term)
                JOIN qdl q USING (doc_id)
                CROSS JOIN stats s
                GROUP BY t.doc_id
            ),
            hits AS (
                SELECT doc_id, score FROM scored_l
                ORDER BY score DESC, doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "prefix_boost_search": f"""
            WITH {bm25}{_bm25_scored_cte("e", ["scan", "slow", "small", "sort", "spark", "stream"])}
                 {_bm25_scored_cte("m", ["merge"], boost=2.0)},
            gsum AS (
                SELECT doc_id, sum(score) AS score FROM scored_e GROUP BY doc_id
            ),
            allsc AS (
                SELECT doc_id, sum(score) AS score FROM (
                    SELECT doc_id, score FROM gsum
                    UNION ALL SELECT doc_id, score FROM scored_m
                ) GROUP BY doc_id
            ),
            hits AS (
                SELECT doc_id, score FROM allsc
                ORDER BY score DESC, doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "phrase_search": f"""
            WITH {bm25}{_bm25_scored_cte("m", ["merge"])},
            ptoks AS (
                SELECT doc_id, unnest(t) AS term,
                       unnest(range(1, len(t) + 1)) AS pos
                FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
            ),
            pf AS (
                SELECT a.doc_id, count(*) AS pf
                FROM ptoks a JOIN ptoks b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                WHERE a.term = 'part' AND b.term = 'filter'
                GROUP BY a.doc_id
            ),
            dfp AS (SELECT count(DISTINCT doc_id) AS df FROM toks
                    WHERE term = 'part'),
            dff AS (SELECT count(DISTINCT doc_id) AS df FROM toks
                    WHERE term = 'filter'),
            phsc AS (
                SELECT pf.doc_id,
                       (ln(1 + (s.n - dfp.df + 0.5) / (dfp.df + 0.5))
                        + ln(1 + (s.n - dff.df + 0.5) / (dff.df + 0.5)))
                       * pf.pf / (pf.pf + 1.2 * ((1 - 0.75) + 0.75 * q.dlq
                                  / (CAST(s.total_len AS DOUBLE) / s.n))) AS score
                FROM pf JOIN qdl q USING (doc_id)
                CROSS JOIN stats s CROSS JOIN dfp CROSS JOIN dff
            ),
            allsc AS (
                SELECT doc_id, sum(score) AS score FROM (
                    SELECT doc_id, score FROM scored_m
                    UNION ALL SELECT doc_id, score FROM phsc
                ) GROUP BY doc_id
            ),
            hits AS (
                SELECT doc_id, score FROM allsc
                ORDER BY score DESC, doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "bm25_simple_nested": f"""
            WITH RECURSIVE {bm25}{_bm25_scored_cte("m", ["merge"])}
                 {_bm25_scored_cte("tq", ["table", "query"])},
            ptoks AS (
                SELECT doc_id, unnest(t) AS term,
                       unnest(range(1, len(t) + 1)) AS pos
                FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
            ),
            -- Lucene SloppyPhraseMatcher freq for "part filter"~2
            -- (SloppyPhraseMatcher.java): ADJUSTED positions (raw -
            -- phrase offset), then the alternating successor chain of
            -- minimized windows — at each episode the stationary side
            -- sits at e and the window closes at the other side's
            -- predecessor <= e; matchLength = e - pred, each match
            -- weighs 1/(1+matchLength) into a FRACTIONAL tf.  This
            -- 2-term chain is fuzz-proven equivalent to the engine's
            -- priority-queue matcher (tests/test_sloppy.py).
            spm AS (
                SELECT doc_id, pos AS p, 0 AS src FROM ptoks
                WHERE term = 'part'
                UNION ALL
                SELECT doc_id, pos - 1 AS p, 1 AS src FROM ptoks
                WHERE term = 'filter'
            ),
            spf AS (
                SELECT doc_id,
                       min(CASE WHEN src = 0 THEN p END) AS f0,
                       min(CASE WHEN src = 1 THEN p END) AS f1
                FROM spm GROUP BY doc_id
                HAVING f0 IS NOT NULL AND f1 IS NOT NULL
            ),
            sprec AS (
                SELECT doc_id, greatest(f0, f1) AS e,
                       CASE WHEN f0 > f1 THEN 0 ELSE 1 END AS side
                FROM spf
                UNION ALL
                SELECT r.doc_id,
                       (SELECT min(p) FROM spm WHERE spm.doc_id = r.doc_id
                          AND spm.src = 1 - r.side AND spm.p > r.e),
                       1 - r.side
                FROM sprec r
                WHERE EXISTS (
                    SELECT 1 FROM spm WHERE spm.doc_id = r.doc_id
                      AND spm.src = 1 - r.side AND spm.p > r.e)
            ),
            pf AS (
                SELECT doc_id, sum(1.0 / (1 + ml)) AS pf FROM (
                    SELECT r.doc_id,
                           r.e - (SELECT max(p) FROM spm
                                    WHERE spm.doc_id = r.doc_id
                                      AND spm.src = 1 - r.side
                                      AND spm.p <= r.e) AS ml
                    FROM sprec r
                ) WHERE ml <= 2 GROUP BY doc_id
            ),
            dfp AS (SELECT count(DISTINCT doc_id) AS df FROM toks
                    WHERE term = 'part'),
            dff AS (SELECT count(DISTINCT doc_id) AS df FROM toks
                    WHERE term = 'filter'),
            phsc AS (
                SELECT pf.doc_id,
                       (ln(1 + (s.n - dfp.df + 0.5) / (dfp.df + 0.5))
                        + ln(1 + (s.n - dff.df + 0.5) / (dff.df + 0.5)))
                       * pf.pf / (pf.pf + 1.2 * ((1 - 0.75) + 0.75 * q.dlq
                                  / (CAST(s.total_len AS DOUBLE) / s.n))) AS score
                FROM pf JOIN qdl q USING (doc_id)
                CROSS JOIN stats s CROSS JOIN dfp CROSS JOIN dff
            ),
            -- MUST group 1: sloppy phrase OR 'merge' (sum of matching)
            g1 AS (
                SELECT doc_id, sum(score) AS score FROM (
                    SELECT doc_id, score FROM scored_m
                    UNION ALL SELECT doc_id, score FROM phsc
                ) GROUP BY doc_id
            ),
            -- MUST group 2: 'table' OR 'query' (scored_tq sums whichever
            -- of the two terms the doc contains)
            combined AS (
                SELECT g1.doc_id, g1.score + g2.score AS score
                FROM g1 JOIN scored_tq g2 USING (doc_id)
                WHERE g1.doc_id NOT IN (
                    SELECT DISTINCT doc_id FROM toks WHERE term = 'scan')
            ),
            hits AS (
                SELECT doc_id, score FROM combined
                ORDER BY score DESC, doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "span_near_unordered": f"""
            WITH {bm25},
            ptoks AS (
                SELECT doc_id, unnest(t) AS term,
                       unnest(range(1, len(t) + 1)) AS pos
                FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
            ),
            pa AS (SELECT doc_id, pos FROM ptoks WHERE term = 'table'),
            pb AS (SELECT doc_id, pos FROM ptoks WHERE term = 'filter'),
            -- SpanNearQuery(inOrder=false) minimal-window counting, the
            -- engine's _phrase_score_fn unordered path verbatim: every
            -- occurrence of either term is a candidate window START; its
            -- minimal cover ends at the MAX over terms of the earliest
            -- occurrence at-or-after the start; a window is a match when
            -- end - start <= m-1+slop = 4 (m=2 distinct terms, dist=4 =>
            -- slop=3); matches dedupe by END so each minimal window
            -- counts once -> sf
            starts AS (
                SELECT doc_id, pos AS s FROM pa
                UNION SELECT doc_id, pos FROM pb
            ),
            ea AS (
                SELECT st.doc_id, st.s, min(a.pos) AS e
                FROM starts st JOIN pa a
                  ON a.doc_id = st.doc_id AND a.pos >= st.s
                GROUP BY st.doc_id, st.s
            ),
            eb AS (
                SELECT st.doc_id, st.s, min(b.pos) AS e
                FROM starts st JOIN pb b
                  ON b.doc_id = st.doc_id AND b.pos >= st.s
                GROUP BY st.doc_id, st.s
            ),
            wnd AS (
                SELECT ea.doc_id, greatest(ea.e, eb.e) AS e
                FROM ea JOIN eb ON ea.doc_id = eb.doc_id AND ea.s = eb.s
                WHERE greatest(ea.e, eb.e) - ea.s <= 4
            ),
            sfreq AS (
                SELECT doc_id, count(DISTINCT e) AS sf FROM wnd
                GROUP BY doc_id
            ),
            dfa AS (SELECT count(DISTINCT doc_id) AS df FROM toks
                    WHERE term = 'table'),
            dfb AS (SELECT count(DISTINCT doc_id) AS df FROM toks
                    WHERE term = 'filter'),
            -- idf sums in the engine's sorted-token order (filter, table)
            scored AS (
                SELECT f.doc_id,
                       (ln(1 + (s.n - dfb.df + 0.5) / (dfb.df + 0.5))
                        + ln(1 + (s.n - dfa.df + 0.5) / (dfa.df + 0.5)))
                       * f.sf / (f.sf + 1.2 * ((1 - 0.75) + 0.75 * q.dlq
                                 / (CAST(s.total_len AS DOUBLE) / s.n))) AS score
                FROM sfreq f JOIN qdl q USING (doc_id)
                CROSS JOIN stats s CROSS JOIN dfa CROSS JOIN dfb
            ),
            hits AS (
                SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 50
            )
            SELECT doc_id, round(score, 6) AS score FROM hits
            ORDER BY round(score, 6) DESC, doc_id ASC
        """,
        "term_stats": f"""
            SELECT tok AS term,
                   count(DISTINCT doc_id) AS df,
                   count(*) AS cf
            FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents)
            GROUP BY tok
            ORDER BY df DESC, term ASC
            LIMIT 50
        """,
        "boolean_and_search": f"""
            SELECT doc_id FROM (
                SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            )
            WHERE list_contains(t, 'table') AND list_contains(t, 'query')
              AND NOT list_contains(t, 'error')
            ORDER BY doc_id
        """,
        "token_count": f"""
            SELECT doc_id,
                   len({_TOKS_SQL}) AS n_tokens,
                   len(regexp_extract_all(text,
                       '{BPE_PRETOKEN_RE.replace(chr(39), chr(39) * 2)}'
                   )) AS n_pretokens,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est
            FROM documents ORDER BY doc_id
        """,
        "detect_language": f"""
            WITH t AS (
                SELECT doc_id,
                       len(list_intersect(list_distinct({_TOKS_SQL}), {stops})) AS n_stop,
                       len(list_distinct({_TOKS_SQL})) AS n_distinct
                FROM documents
            )
            SELECT doc_id,
                   round(CASE WHEN n_distinct > 0
                              THEN n_stop / CAST(n_distinct AS DOUBLE)
                              ELSE 0.0 END, 6) AS stopword_ratio,
                   CASE WHEN (CASE WHEN n_distinct > 0
                              THEN n_stop / CAST(n_distinct AS DOUBLE)
                              ELSE 0.0 END) >= 0.08
                        THEN 'en' ELSE 'other' END AS lang_pred
            FROM t ORDER BY doc_id
        """,
        "quality_score": f"""
            WITH t AS (
                SELECT doc_id, text, {_TOKS_SQL} AS toks,
                       length(text) AS n_chars,
                       length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
                FROM documents
            ), m AS (
                SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_tokens,
                       CASE WHEN len(toks) > 0
                            THEN list_sum(list_transform(toks, x -> length(x))) / CAST(len(toks) AS DOUBLE)
                            ELSE 0.0 END AS mean_wordlen,
                       CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
                       CASE WHEN len(toks) > 0
                            THEN len(list_intersect(list_distinct(toks), {stops})) / CAST(len(list_distinct(toks)) AS DOUBLE)
                            ELSE 0.0 END AS stop_ratio
                FROM t
            )
            SELECT doc_id, n_tokens,
                   round(mean_wordlen, 6) AS mean_wordlen,
                   round(punct_ratio, 6) AS punct_ratio,
                   round(stop_ratio, 6) AS stop_ratio,
                   round(
                     (CASE WHEN n_tokens >= 20 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN mean_wordlen >= 3 AND mean_wordlen <= 10 THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN stop_ratio >= 0.05 THEN 0.25 ELSE 0.0 END), 2) AS quality
            FROM m ORDER BY doc_id
        """,
        "exact_dedup": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents
                WHERE doc_id < 50
            ), canon AS (
                SELECT text, min(doc_id) AS canonical_id FROM corpus GROUP BY text
            )
            SELECT d.doc_id AS id, c.canonical_id,
                   d.doc_id <> c.canonical_id AS is_duplicate
            FROM corpus d JOIN canon c ON d.text = c.text
            ORDER BY id
        """,
        "ngram_jaccard": f"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 80
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, substr(text, 30) AS text
                FROM documents WHERE doc_id < 20
            ), toks AS (
                SELECT doc_id, {_TOKS_SQL} AS t FROM corpus
            ), sh AS (
                SELECT doc_id,
                       list_distinct(
                         list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                                        i -> array_to_string(t[i:i+2], ' '))
                       ) AS shingles
                FROM toks
            ), ex AS (
                SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(count(*) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) AS jaccard
            FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
            HAVING count(*) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE) >= 0.5
            ORDER BY id_a, id_b
        """,
        "cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                CAST(qv AS DOUBLE[])), 6) AS cosine
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])) DESC,
                     vec_id ASC
            LIMIT 20
        """,
        "embedding_near_dup": """
            WITH corpus AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 150
                UNION ALL
                SELECT vec_id + 100000 AS vec_id,
                       list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x + 0.05) AS v
                FROM embeddings WHERE vec_id < 150
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.9
            ORDER BY id_a, id_b
        """,
        # hash-checkable LSH dedup (r4 VERDICT #4): exact expected set per
        # method — minhash must find EVERY pair >= 0.5, simhash every
        # identical-stream pair (jaccard 1.0).  Set equality with the Spark
        # side's (candidates INTERSECT exact-true-pairs) IS the recall
        # assertion.
        "near_dup_candidates": f"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 80
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, substr(text, 30) AS text
                FROM documents WHERE doc_id < 20
                UNION ALL
                SELECT doc_id + 200000 AS doc_id, text
                FROM documents WHERE doc_id < 20
            ), toks AS (
                SELECT doc_id, {_TOKS_SQL} AS t FROM corpus
            ), sh AS (
                SELECT doc_id,
                       list_distinct(
                         list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                                        i -> array_to_string(t[i:i+2], ' '))
                       ) AS shingles
                FROM toks
            ), ex AS (
                SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE) AS j
                FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
                HAVING count(*) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE) >= 0.5
            )
            SELECT m.method, p.id_a, p.id_b, round(p.j, 6) AS jaccard
            FROM pairs p, (VALUES ('minhash'), ('simhash')) m(method)
            WHERE m.method = 'minhash' OR p.j >= 0.999999
            ORDER BY m.method, p.id_a, p.id_b
        """,
        # hash-checkable ANN (r4 VERDICT #4): exact cosine top-20 over the
        # planted-cluster corpus (integer-mod satellite perturbation — both
        # engines compute identical doubles), expected recall_ok TRUE for
        # each of the three index shapes.
        "ann_topk": """
            WITH centers AS (
                SELECT vec_id AS c, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 20
            ), sats AS (
                SELECT 1000000 + c*100 + j AS vec_id,
                       list_transform(range(1, len(v) + 1),
                           i -> v[i] + (((c*31 + j*37 + i*11) % 19) - 9)/200.0) AS v
                FROM centers, (SELECT unnest(range(1, 31)) AS j)
            ), corpus AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id <> 0
                UNION ALL SELECT vec_id, v FROM sats
            ), q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id = 0
            ), topk AS (
                SELECT vec_id,
                       round(list_cosine_similarity(v, qv), 6) AS cosine
                FROM corpus, q
                ORDER BY list_cosine_similarity(v, qv) DESC, vec_id ASC
                LIMIT 20
            )
            SELECT m.method, t.vec_id, t.cosine, TRUE AS recall_ok
            FROM topk t, (VALUES ('lsh'), ('ivf'), ('graph')) m(method)
            ORDER BY m.method, t.cosine DESC, t.vec_id
        """,
        "heatmap_facet": """
            SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS x_bucket,
                   CAST(floor(l_discount / 0.02) AS BIGINT) AS y_bucket,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2 ORDER BY x_bucket, y_bucket
        """,
        "rollup_lineitem": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum({_CENTS}) AS BIGINT) AS sum_price_cents,
                   CAST(sum({_CENTS} * (100 - {_DISC_PCT})) AS BIGINT) AS revenue_milli,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "inner_join_rollup": """
            SELECT c_mktsegment,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "hash_join_parts": """
            SELECT p_brand,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   count(*) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "expr_stream": """
            WITH j AS (
                SELECT c.c_nationkey, o.o_totalprice
                FROM customer c LEFT JOIN (
                    SELECT o_custkey, o_totalprice FROM orders
                    WHERE o_totalprice >= 1000) o
                  ON c.c_custkey = o.o_custkey
            ), r AS (
                SELECT c_nationkey, sum(o_totalprice) AS sum_price,
                       count(*) AS cnt
                FROM j GROUP BY c_nationkey
            )
            SELECT c_nationkey, round(sum_price, 2) AS sum_price, cnt
            FROM r WHERE cnt > 10
            ORDER BY sum_price DESC, c_nationkey ASC LIMIT 20
        """,
        "intersect": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
        "complement": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
            ORDER BY c_custkey
        """,
        "cartesian_product": """
            SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
            FROM part ORDER BY p_partkey, word
        """,
        "range_facet": """
            SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_start,
                   count(*) AS n
            FROM orders
            WHERE o_totalprice >= 0 AND o_totalprice < 600000
            GROUP BY 1 ORDER BY 1
        """,
        "timeseries": """
            SELECT date_trunc('day', ts) AS window_start,
                   count(*) AS n,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "facet_event_types": """
            SELECT event_type, count(*) AS count,
                   round(avg(value), 6) AS avg_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
            ORDER BY count DESC, event_type ASC LIMIT 5
        """,
        "facet2d": """
            WITH counts AS (
                SELECT n_name, c_mktsegment, count(*) AS agg
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                GROUP BY n_name, c_mktsegment
            ), top_x AS (
                SELECT n_name FROM counts GROUP BY n_name
                ORDER BY sum(agg) DESC, n_name ASC LIMIT 5
            ), ranked AS (
                SELECT c.*, row_number() OVER (
                    PARTITION BY c.n_name ORDER BY c.agg DESC, c.c_mktsegment ASC
                ) AS rn
                FROM counts c WHERE c.n_name IN (SELECT n_name FROM top_x)
            )
            SELECT n_name, c_mktsegment, agg FROM ranked WHERE rn <= 3
            ORDER BY n_name, agg DESC, c_mktsegment
        """,
        "collapse": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn = 1 ORDER BY o_custkey
        """,
        "group_top_n": """
            SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS group_rank
            FROM (
                SELECT o_custkey, o_orderkey, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 2 ORDER BY o_custkey, group_rank
        """,
        "expand": """
            SELECT o_custkey, o_orderkey
            FROM (
                SELECT o_custkey, o_orderkey, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn > 1 AND rn <= 3 ORDER BY o_custkey, o_orderkey
        """,
        "topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
        """,
        "cursor_page": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            WHERE o_totalprice > 100000.0
               OR (o_totalprice = 100000.0 AND o_orderkey > 0)
            ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 20
        """,
        "merge_unique": """
            SELECT DISTINCT user_id FROM (
                SELECT user_id FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT user_id FROM events WHERE event_type = 'purchase'
            ) ORDER BY user_id
        """,
        "having": """
            SELECT user_id, count(*) AS n_errors
            FROM events WHERE event_type = 'error'
            GROUP BY user_id HAVING count(*) >= 5 ORDER BY user_id
        """,
        "stats_stream": """
            SELECT count(*) AS n,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_price_cents,
                   max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS max_price_cents,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   count(DISTINCT l_partkey) AS n_parts
            FROM lineitem
        """,
        "significant_terms": f"""
            WITH tok AS (
                SELECT lang, unnest({_TOKS_SQL}) AS term FROM documents
            ), fg AS (
                SELECT term, count(*) AS fg_count FROM tok WHERE lang <> 'en' GROUP BY term
            ), bg AS (
                SELECT term, count(*) AS bg_count FROM tok GROUP BY term
            ), n AS (
                SELECT (SELECT count(*) FROM tok WHERE lang <> 'en') AS n_fg,
                       (SELECT count(*) FROM tok) AS n_bg
            )
            SELECT fg.term, fg.fg_count, bg.bg_count,
                   round((fg.fg_count / CAST(n.n_fg AS DOUBLE))
                       / (bg.bg_count / CAST(n.n_bg AS DOUBLE)), 6) AS score
            FROM fg JOIN bg USING (term), n
            ORDER BY score DESC, term ASC LIMIT 20
        """,
        "score_join": """
            SELECT c.c_custkey, c.c_mktsegment,
                   round(max(o.o_totalprice), 2) AS join_score
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_mktsegment
            ORDER BY c.c_custkey
        """,
        "block_join_parent": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_quantity >= 49 AND l.l_returnflag = 'R')
            ORDER BY o_orderkey
        """,
        "block_join_children": """
            SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
            ORDER BY l_orderkey, l_linenumber
        """,
        "unique_block": """
            SELECT l_returnflag, count(DISTINCT l_orderkey) AS unique_block
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "relatedness": """
            WITH sizes AS (
                SELECT count(DISTINCT event_id) AS bg,
                       count(DISTINCT CASE WHEN user_id % 7 = 0
                                           THEN event_id END) AS fg
                FROM events
            ), counts AS (
                SELECT event_type,
                       count(DISTINCT CASE WHEN user_id % 7 = 0
                                           THEN event_id END) AS fg_count,
                       count(DISTINCT event_id) AS bg_count
                FROM events GROUP BY event_type
            ), calc AS (
                SELECT event_type, fg_count, bg_count,
                       (CAST(fg_count AS DOUBLE)
                        - CAST(s.fg AS DOUBLE)
                          * (CAST(bg_count AS DOUBLE) / CAST(s.bg AS DOUBLE)))
                       / (CASE WHEN sqrt(CAST(s.fg AS DOUBLE)
                                 * (CAST(bg_count AS DOUBLE) / CAST(s.bg AS DOUBLE))
                                 * (1.0 - CAST(bg_count AS DOUBLE) / CAST(s.bg AS DOUBLE))) = 0
                               THEN 1e-10
                               ELSE sqrt(CAST(s.fg AS DOUBLE)
                                 * (CAST(bg_count AS DOUBLE) / CAST(s.bg AS DOUBLE))
                                 * (1.0 - CAST(bg_count AS DOUBLE) / CAST(s.bg AS DOUBLE)))
                          END) AS z
                FROM counts CROSS JOIN sizes s
            )
            SELECT event_type, fg_count, bg_count,
                   round(round((0.2 * ((z + -80) / (50 + abs(z + -80)))
                              + 0.2 * ((z + -30) / (30 + abs(z + -30)))
                              + 0.2 * ((z + 0) / (30 + abs(z + 0)))
                              + 0.2 * ((z + 30) / (30 + abs(z + 30)))
                              + 0.2 * ((z + 80) / (50 + abs(z + 80)))) * 1e5)
                         / 1e5, 5) AS relatedness
            FROM calc
            ORDER BY relatedness DESC, event_type ASC
        """,
        "gather_nodes": """
            WITH edges AS (
                SELECT l_orderkey AS src, l_partkey + 1000000 AS dst
                FROM lineitem
                UNION ALL
                SELECT l_partkey + 1000000 AS src, l_orderkey AS dst
                FROM lineitem
            ), d1 AS (
                SELECT DISTINCT dst AS node FROM edges WHERE src = 1
            ), d2 AS (
                SELECT DISTINCT e.dst AS node
                FROM edges e JOIN d1 ON e.src = d1.node
                WHERE e.dst <> 1 AND e.dst NOT IN (SELECT node FROM d1)
            )
            SELECT CAST(node AS BIGINT) AS node, CAST(depth AS INT) AS depth
            FROM (
                SELECT 1 AS node, 0 AS depth
                UNION ALL SELECT node, 1 FROM d1
                UNION ALL SELECT node, 2 FROM d2
            ) ORDER BY depth, node
        """,
        "suggest": f"""
            WITH dict AS (
                SELECT tok AS term, count(*) AS df
                FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
                GROUP BY tok
            )
            SELECT term, df AS freq,
                   CAST(levenshtein(term, 'scon') AS INT) AS distance
            FROM dict
            WHERE abs(length(term) - 4) <= 2
              AND levenshtein(term, 'scon') <= 2 AND term <> 'scon'
            ORDER BY distance ASC, freq DESC, term ASC LIMIT 10
        """,
        "range_facet_other": """
            WITH g AS (
                SELECT CASE WHEN o_totalprice < 100000 THEN 'before'
                            WHEN o_totalprice >= 400000 THEN 'after'
                            ELSE CAST(CAST(100000 + floor((o_totalprice - 100000)
                                 / 100000) * 100000 AS BIGINT) AS VARCHAR)
                       END AS bucket,
                       count(*) AS n
                FROM orders GROUP BY 1
            )
            SELECT bucket, n FROM (
                SELECT bucket, n FROM g
                UNION ALL
                SELECT 'between',
                       CAST(coalesce(sum(n), 0) AS BIGINT) FROM g
                WHERE bucket NOT IN ('before', 'after')
            ) ORDER BY bucket
        """,
        "highlight": f"""
            WITH {bm25}{_bm25_scored_cte("m", ["table", "query"])},
            hits AS (
                SELECT doc_id, score FROM scored_m
                ORDER BY score DESC, doc_id ASC LIMIT 10
            )
            SELECT h.doc_id, round(h.score, 6) AS score,
                   regexp_replace(d.text, '(?i)\\b(query|table)\\b',
                                  '<em>\\1</em>', 'g') AS snippet
            FROM hits h JOIN documents d ON h.doc_id = d.doc_id
            ORDER BY round(h.score, 6) DESC, h.doc_id ASC
        """,
        "pivot_facet": """
            SELECT n_name, c_mktsegment, count(*) AS count,
                   CAST(2 - grouping(n_name) - grouping(c_mktsegment) AS INT)
                       AS level
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP(n_name, c_mktsegment)
            HAVING 2 - grouping(n_name) - grouping(c_mktsegment) > 0
            ORDER BY level, n_name, c_mktsegment NULLS FIRST
        """,
        "mlt_simple": f"""
            WITH {bm25},
            doc0 AS (
                SELECT term, count(*) AS tf FROM toks WHERE doc_id = 0
                GROUP BY term
            ),
            dfs AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM toks
                WHERE term IN (SELECT term FROM doc0) GROUP BY term
            ),
            weighted AS (
                SELECT d0.term,
                       ln(1 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5)) * d0.tf AS w
                FROM doc0 d0 JOIN dfs USING (term) CROSS JOIN stats s
                WHERE dfs.df >= 2
            ),
            qterms AS (SELECT term FROM weighted ORDER BY w DESC, term ASC LIMIT 10),
            tf_q AS (
                SELECT doc_id, term, count(*) AS tf FROM toks
                WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
            ),
            df_q AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM toks
                WHERE term IN (SELECT term FROM qterms) GROUP BY term
            ),
            scored_q AS (
                SELECT t.doc_id,
                       sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                           * t.tf / (t.tf + 1.2 * ((1 - 0.75) + 0.75 * q.dlq
                                     / (CAST(s.total_len AS DOUBLE) / s.n)))) AS score
                FROM tf_q t JOIN df_q d USING (term)
                JOIN qdl q USING (doc_id) CROSS JOIN stats s
                GROUP BY t.doc_id
            ),
            hits AS (
                -- cut at ROUNDED precision + doc_id tiebreak (see
                -- q_mlt_simple: raw-ulp boundary ties are not stable
                -- across engines or Spark partition orderings)
                SELECT doc_id, round(score, 6) AS score FROM scored_q
                WHERE doc_id <> 0
                ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10
            )
            SELECT doc_id, score FROM hits
            ORDER BY score DESC, doc_id ASC
        """,
        "query_facet": """
            SELECT count(CASE WHEN o_totalprice > 300000 THEN 1 END) AS big_count,
                   round(sum(CASE WHEN o_totalprice > 300000
                                  THEN o_totalprice END), 2) AS big_sum,
                   count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                       AS urgent_count,
                   count(CASE WHEN o_totalprice > 300000
                              AND o_orderpriority = '1-URGENT' THEN 1 END)
                       AS big_urgent_count
            FROM orders
        """,
        "percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.99), 6) AS p99
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "rrf": """
            WITH a AS (
                SELECT o_orderkey, row_number() OVER (
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
                FROM orders ORDER BY rank LIMIT 100
            ), b AS (
                SELECT o_orderkey, row_number() OVER (
                    ORDER BY o_orderdate DESC, o_orderkey ASC) AS rank
                FROM orders ORDER BY rank LIMIT 100
            ), u AS (
                SELECT o_orderkey, CAST(1.0 AS DOUBLE) / (60 + rank) AS c FROM a
                UNION ALL
                SELECT o_orderkey, CAST(1.0 AS DOUBLE) / (60 + rank) AS c FROM b
            )
            SELECT o_orderkey, round(sum(c), 6) AS rrf_score
            FROM u GROUP BY o_orderkey
            ORDER BY rrf_score DESC, o_orderkey ASC LIMIT 20
        """,
        "features_igain": """
            WITH labeled AS (
                SELECT text, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
                FROM documents
            ),
            totals AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(sum(pos) AS DOUBLE) AS npos FROM labeled
            ),
            per_term AS (
                SELECT term, CAST(count(*) AS DOUBLE) AS dfreq,
                       CAST(sum(pos) AS DOUBLE) AS xc
                FROM (
                    SELECT unnest(list_distinct(
                               regexp_extract_all(lower(text), '[a-z0-9]+')
                           )) AS term, pos
                    FROM labeled
                ) GROUP BY term
            ),
            scored AS (
                SELECT term,
                   (CASE WHEN npos/n <= 0 OR npos/n >= 1 THEN 0
                         ELSE -(npos/n)*ln(npos/n)
                              - (1-npos/n)*ln(1-npos/n) END)
                   - ( (dfreq/n) *
                       (CASE WHEN xc/dfreq <= 0 OR xc/dfreq >= 1 THEN 0
                             ELSE -(xc/dfreq)*ln(xc/dfreq)
                                  - (1-xc/dfreq)*ln(1-xc/dfreq) END)
                     + (1 - dfreq/n) *
                       (CASE WHEN (npos-xc)/(n-dfreq+1) <= 0
                                  OR (npos-xc)/(n-dfreq+1) >= 1 THEN 0
                             ELSE -((npos-xc)/(n-dfreq+1))
                                      *ln((npos-xc)/(n-dfreq+1))
                                  - (1-(npos-xc)/(n-dfreq+1))
                                      *ln(1-(npos-xc)/(n-dfreq+1)) END) )
                   AS raw_score,
                   CAST(dfreq AS BIGINT) AS doc_freq,
                   ln(n / (dfreq + 1)) AS raw_idf
                FROM per_term, totals
            )
            SELECT term, round(raw_score, 6) AS score, doc_freq,
                   round(raw_idf, 6) AS idf
            FROM scored
            ORDER BY raw_score DESC, term LIMIT 25
        """,
        "classify_logit": _classify_logit_sql(),
    }

    # ---- stable top-k cut (mirrors _stable_topk): over-fetch the raw-score
    # cut to 64, then re-cut at the ROUNDED (6dp) score + doc_id tiebreak —
    # raw-ulp boundary ties are not stable across engines or Spark runs.
    def _stable(sql: str) -> str:
        inner = sql.replace("LIMIT 50", "LIMIT 64")
        return (
            f"SELECT doc_id, score FROM ({inner}) "
            "ORDER BY score DESC, doc_id ASC LIMIT 50"
        )

    for k in (
        "bm25_simple_topk",
        "bm25_simple_and",
        "bm25_fq",
        "bm25_simple_nested",
        "phrase_search",
        "prefix_boost_search",
        "tfidf_topk",
        "lmdirichlet_topk",
        "span_near_unordered",
    ):
        d[k] = _stable(d[k])

    # ---- merged entries (see queries() docstring): compose each from the
    # component oracles verbatim so the per-case arithmetic is unchanged.
    d["similarity_topk"] = _union_cases(
        "sim",
        {
            "bm25": d.pop("bm25_simple_topk"),
            "classic": d.pop("tfidf_topk"),
            "lmdirichlet": d.pop("lmdirichlet_topk"),
        },
        "sim, score DESC, doc_id",
    )
    d["query_suite"] = _union_cases(
        "qcase",
        {
            "must_not": d.pop("bm25_simple_and"),
            "nested_sloppy": d.pop("bm25_simple_nested"),
            "phrase": d.pop("phrase_search"),
            "prefix_boost": d.pop("prefix_boost_search"),
            "fq": d.pop("bm25_fq"),
            "sorted": d.pop("bm25_sorted"),
        },
        "qcase, score DESC, doc_id",
    )
    _rep_sql = f"""
        WITH rbase AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(text, chr(10)),
                             s -> trim(s)), s -> s <> '') AS lines,
                 {_TOKS_SQL} AS toks
          FROM documents
        ), rg AS (
          SELECT doc_id, lines, toks, len(toks) AS n_tokens,
                 CASE WHEN len(toks) >= 2 THEN list_transform(
                   range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                 ELSE [] END AS g2,
                 CASE WHEN len(toks) >= 3 THEN list_transform(
                   range(1, len(toks)-1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                 ELSE [] END AS g3
          FROM rbase
        ), rtop2 AS (
          SELECT doc_id, max(cnt) AS top2_count FROM (
            SELECT doc_id, gram, count(*) AS cnt
            FROM rg, unnest(rg.g2) AS u(gram) GROUP BY doc_id, gram
          ) GROUP BY doc_id
        )
        SELECT rg.doc_id AS doc_id,
          len(lines) AS n_lines,
          round(CASE WHEN len(lines) > 0 THEN
            (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines)
            ELSE 0.0 END, 6) AS dup_line_frac,
          round(CASE WHEN list_sum(list_transform(lines, s -> length(s))) > 0
            THEN (list_sum(list_transform(lines, s -> length(s)))
                  - list_sum(list_transform(list_distinct(lines),
                                            s -> length(s)))) * 1.0
                 / list_sum(list_transform(lines, s -> length(s)))
            ELSE 0.0 END, 6) AS dup_line_char_frac,
          round(CASE WHEN n_tokens > 0 THEN
            least(coalesce(rtop2.top2_count, 0) * 2.0 / n_tokens, 1.0)
            ELSE 0.0 END, 6) AS top_2gram_frac,
          round(CASE WHEN len(g2) > 0 THEN
            (len(g2) - len(list_distinct(g2))) * 1.0 / len(g2)
            ELSE 0.0 END, 6) AS dup_2gram_frac,
          round(CASE WHEN len(g3) > 0 THEN
            (len(g3) - len(list_distinct(g3))) * 1.0 / len(g3)
            ELSE 0.0 END, 6) AS dup_3gram_frac
        FROM rg LEFT JOIN rtop2 USING (doc_id)
    """
    # Gopher A1.1 rules + C4 line cleaning (pipeline/textqual.py
    # gopher_filters/c4_clean), transcribed to DuckDB list lambdas; rule
    # booleans as 0/1 ints so both engines hash identically
    _gopher_sql = """
        WITH gb AS (
          SELECT doc_id, text,
            list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        w -> w <> '') AS words,
            string_split(text, chr(10)) AS lines
          FROM documents
        ), gm AS (
          SELECT doc_id, text, words, lines,
            len(words) AS n_words, len(lines) AS n_lines,
            CASE WHEN len(words) > 0 THEN
              coalesce(list_aggregate(
                list_transform(words, w -> length(w)), 'sum'), 0) * 1.0
              / len(words) ELSE 0.0 END AS mean_wl,
            length(text) - length(replace(text, '#', '')) AS n_hash,
            len(regexp_split_to_array(text, '\\.\\.\\.|…')) - 1 AS n_ell,
            len(list_filter(lines,
              l -> regexp_matches(trim(l), '^[•\\-\\*▪●]'))) AS bullet_ln,
            len(list_filter(lines,
              l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$'))) AS ell_ln,
            len(list_filter(words,
              w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_w,
            len(list_intersect(
              list_distinct(list_transform(words, w -> lower(w))),
              ['the','be','to','of','and','that','have','with'])) AS n_stop
          FROM gb
        )
        SELECT doc_id, n_words,
          CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
            AS ok_word_count,
          CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END
            AS ok_mean_wordlen,
          CASE WHEN (CASE WHEN n_words > 0 THEN n_hash * 1.0 / n_words
                     ELSE 0.0 END) <= 0.1
               AND (CASE WHEN n_words > 0 THEN n_ell * 1.0 / n_words
                    ELSE 0.0 END) <= 0.1 THEN 1 ELSE 0 END AS ok_symbol_ratio,
          CASE WHEN (CASE WHEN n_lines > 0 THEN bullet_ln * 1.0 / n_lines
                     ELSE 0.0 END) <= 0.9 THEN 1 ELSE 0 END AS ok_bullet_lines,
          CASE WHEN (CASE WHEN n_lines > 0 THEN ell_ln * 1.0 / n_lines
                     ELSE 0.0 END) <= 0.3 THEN 1 ELSE 0 END
            AS ok_ellipsis_lines,
          CASE WHEN (CASE WHEN n_words > 0 THEN alpha_w * 1.0 / n_words
                     ELSE 0.0 END) >= 0.8 THEN 1 ELSE 0 END AS ok_alpha_words,
          CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS ok_stop_words
        FROM gm
    """
    _c4_sql = """
        WITH cb AS (
          SELECT doc_id, text,
            list_filter(string_split(text, chr(10)),
              l -> regexp_matches(rtrim(l), '[.!?"]$')
                   AND len(list_filter(
                         regexp_split_to_array(trim(l), '\\s+'),
                         w -> w <> '')) >= 5
                   AND NOT regexp_matches(lower(l), 'javascript')) AS kept
          FROM documents
        )
        SELECT doc_id, len(kept) AS n_lines_kept,
          CASE WHEN len(kept) >= 3
               AND NOT contains(lower(text), 'lorem ipsum')
               AND NOT contains(text, chr(123))
               AND NOT contains(text, chr(125)) THEN 1 ELSE 0 END AS c4_keep
        FROM cb
    """
    d["text_quality"] = f"""
        SELECT t.doc_id AS doc_id, t.n_tokens, t.n_pretokens, t.n_subwords_est,
               l.stopword_ratio, l.lang_pred,
               q.mean_wordlen, q.punct_ratio, q.stop_ratio, q.quality,
               r.n_lines, r.dup_line_frac, r.dup_line_char_frac,
               r.top_2gram_frac, r.dup_2gram_frac, r.dup_3gram_frac,
               g.n_words, g.ok_word_count, g.ok_mean_wordlen,
               g.ok_symbol_ratio, g.ok_bullet_lines, g.ok_ellipsis_lines,
               g.ok_alpha_words, g.ok_stop_words,
               CASE WHEN g.ok_word_count + g.ok_mean_wordlen
                    + g.ok_symbol_ratio + g.ok_bullet_lines
                    + g.ok_ellipsis_lines + g.ok_alpha_words
                    + g.ok_stop_words = 7 THEN 1 ELSE 0 END AS gopher_pass,
               c.n_lines_kept, c.c4_keep
        FROM ({d.pop("token_count")}) t
        JOIN ({d.pop("detect_language")}) l ON t.doc_id = l.doc_id
        JOIN ({d.pop("quality_score")}) q ON t.doc_id = q.doc_id
        JOIN ({_rep_sql}) r ON t.doc_id = r.doc_id
        JOIN ({_gopher_sql}) g ON t.doc_id = g.doc_id
        JOIN ({_c4_sql}) c ON t.doc_id = c.doc_id
        ORDER BY doc_id
    """
    d["topk_page"] = _union_cases(
        "page",
        {"topk": d.pop("topk_orders"), "cursor": d.pop("cursor_page")},
        "page, o_orderkey",
    )
    gap, other = d.pop("range_facet"), d.pop("range_facet_other")
    iv_cases = " UNION ALL ".join(
        f"""SELECT '{spec}' AS bucket,
            count(*) FILTER (WHERE {cond}) AS n FROM orders"""
        for spec, cond in [
            ("[*,100000)", "o_totalprice < 100000"),
            ("[50000,200000]", "o_totalprice >= 50000 AND o_totalprice <= 200000"),
            ("(200000,400000)", "o_totalprice > 200000 AND o_totalprice < 400000"),
            ("[400000,*]", "o_totalprice >= 400000"),
        ]
    )
    d["range_facet"] = f"""
        SELECT 'gap' AS fkind, CAST(bucket_start AS VARCHAR) AS bucket, n
        FROM ({gap})
        UNION ALL
        SELECT 'other' AS fkind, CAST(bucket AS VARCHAR) AS bucket, n
        FROM ({other})
        UNION ALL
        SELECT 'interval' AS fkind, bucket, n FROM ({iv_cases})
        ORDER BY fkind, bucket
    """
    d["simple_facets"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        ), m AS (
            SELECT doc_id FROM toks WHERE term IN ('table', 'query')
            GROUP BY doc_id HAVING count(DISTINCT term) = 2
        ), j AS (
            SELECT d.lang, d.source FROM documents d JOIN m USING (doc_id)
        ), c AS (
            SELECT 'lang' AS field, lang AS value, count(*) AS count
            FROM j GROUP BY lang
            UNION ALL
            SELECT 'source' AS field, source AS value, count(*) AS count
            FROM j GROUP BY source
        )
        SELECT field, value, count FROM c
        QUALIFY row_number() OVER (
            PARTITION BY field ORDER BY count DESC, value ASC) <= 10
        ORDER BY field, count DESC, value
    """
    # json_facet nested terms->terms: parent top-3 event_types by sum(value)
    # desc (tie: event_type asc), child top-2 user_ids per parent by count
    # desc (tie: user_id asc) — the exact _sort_order/window-top-N semantics
    # of operators/json_facet.py.
    d["json_facet_nested"] = """
        WITH parents AS (
            SELECT event_type FROM (
                SELECT event_type, sum(value) AS s
                FROM events GROUP BY event_type
                ORDER BY s DESC, event_type ASC LIMIT 3
            )
        ), children AS (
            SELECT e.event_type, e.user_id, count(*) AS count
            FROM events e JOIN parents p ON e.event_type = p.event_type
            GROUP BY e.event_type, e.user_id
        )
        SELECT event_type, user_id, count FROM children
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY count DESC, user_id ASC) <= 2
        ORDER BY event_type, count DESC, user_id
    """
    return d
