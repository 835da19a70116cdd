"""Second-pass ranking operators: rerank, RRF, MoreLikeThis.

Reference surface:
- Rerank (search/ReRankQParserPlugin.java, AbstractReRankQuery.java):
  rescore the top-N docs of the main query by adding
  reRankWeight * score(reRankQuery).
- Reciprocal Rank Fusion (handler/component/combine/ReciprocalRankFusion.java:37):
  fuse ranked lists by sum of 1/(k + rank).
- MoreLikeThis (handler/MoreLikeThisHandler.java,
  component/MoreLikeThisComponent.java:63): build a query from the top
  tf-idf terms of a source document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from apache___solr_spark.query.engine import SearchEngine, bm25_idf
from apache___solr_spark.query.parser import ParsedQuery


def rerank(
    engine: SearchEngine,
    query: str,
    rerank_query: str,
    k: int = 10,
    rerank_docs: int = 100,
    rerank_weight: float = 2.0,
) -> DataFrame:
    """ReRankQParserPlugin semantics: first-pass top ``rerank_docs`` by the
    main query, rescored as main + weight * rerank-query score; docs outside
    the first pass are never promoted (matches the reference)."""
    first = engine.search(query, k=rerank_docs, prune=True, with_url=True)
    # second pass scores ONLY the first-pass winners: search() prunes the
    # postings scan to their salt ranges and filters decode to their ids, so
    # rescoring stays O(rerank_docs) regardless of corpus size (the k=N
    # full-corpus variant was a driver OOM at scale — VERDICT.md round 1 #2).
    ids = [r["doc_id"] for r in first.select("doc_id").collect()]
    if not ids:
        return first.select(
            F.lit(0).alias("rank"), "doc_id", "url", "score"
        ).limit(0)
    second = engine.search(
        rerank_query, k=len(ids), prune=False, with_url=False, doc_filter=ids
    )
    s2 = second.select("doc_id", F.col("score").alias("_rr"))
    out = (
        first.join(s2, "doc_id", "left_outer")
        .withColumn(
            "score",
            (
                F.col("score")
                + F.lit(float(rerank_weight)) * F.coalesce(F.col("_rr"), F.lit(0.0))
            ).cast(engine._sql_t),
        )
        .drop("_rr")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    return out.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())),
    ).select("rank", "doc_id", "url", "score")


def reciprocal_rank_fusion(
    ranked: list[DataFrame], id_col: str, k: int = 60, limit: int = 10
) -> DataFrame:
    """ReciprocalRankFusion.java:37: fused_score(d) = sum over lists of
    1/(k + rank_i(d)).  Each input must carry a ``rank`` column."""
    scored = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("_c"),
        )
        for df in ranked
    ]
    un = scored[0]
    for s in scored[1:]:
        un = un.unionByName(s)
    return (
        un.groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(limit)
    )


def _mlt_select_terms(
    engine: SearchEngine,
    tf_by_term: dict[str, int],
    max_query_terms: int,
    min_doc_freq: int,
    min_term_freq: int,
) -> list[str]:
    """Shared MLT term selection (MoreLikeThis.java createQueue): rank the
    source terms by tf*idf against the index statistics, window by mindf/
    mintf, keep the top maxqt.  Terms absent from the index can never
    match and are dropped regardless of mindf."""
    meta = engine._term_meta(sorted(tf_by_term))
    df_by_term = dict(zip(meta["term"], meta["df"]))
    n = engine.stats["N"]
    weighted = sorted(
        (
            (
                float(
                    bm25_idf(n, int(df_by_term[t]), dtype=engine._dtype)
                )
                * tf,
                t,
            )
            for t, tf in tf_by_term.items()
            if t in df_by_term
            and int(df_by_term[t]) >= min_doc_freq
            and int(tf) >= min_term_freq
        ),
        key=lambda x: (-x[0], x[1]),
    )
    return [t for _, t in weighted[:max_query_terms]]


def _term_vector_row(engine: "SearchEngine", doc_id: int) -> list:
    """The source doc's (terms, tfs) — Lucene term-vectors analog.

    Pre-fusion indexes carry a numbered ``analyzed`` checkpoint and read it
    directly (one pushed doc_id filter).  Fused builds (the default since
    round 4) keep no such table, so the lookup becomes two pushed-predicate
    point reads: doc_id -> url via the docs table, then url -> (terms, tfs)
    via the analyzed_raw checkpoint — same rows, no extra index state.

    The analyzed checkpoint is used only when its manifest digests match
    the live index's (engine.stats carries both): after an in-place
    rebuild with a changed config or input the fused build leaves the
    stale analyzed/ dir in place, and reading it would silently return
    stale terms and a stale doc_id->row mapping."""
    from apache___solr_spark.index import checkpoint as ckpt

    spark, paths = engine.spark, engine.paths
    if ckpt.stage_complete(
        paths.analyzed,
        engine.stats.get("config_digest"),
        engine.stats.get("input_digest"),
    ):
        return (
            spark.read.parquet(paths.analyzed)
            .filter(F.col("doc_id") == doc_id)
            .select("terms", "tfs")
            .collect()
        )
    urls = (
        spark.read.parquet(paths.docs)
        .filter(F.col("doc_id") == doc_id)
        .select("url")
        .collect()
    )
    if not urls:
        return []
    return (
        spark.read.parquet(paths.analyzed_raw)
        .filter(F.col("url") == urls[0]["url"])
        .select("terms", "tfs")
        .collect()
    )


def more_like_this(
    engine: SearchEngine,
    doc_id: int,
    k: int = 10,
    max_query_terms: int = 10,
    min_doc_freq: int = 2,
    min_term_freq: int = 1,
) -> DataFrame:
    """MoreLikeThisHandler capability: take the source doc's top tf*idf
    terms from the index's analyzed table, issue them as an OR query, and
    drop the source doc from the hits.

    ``min_term_freq`` mirrors MLT ``mintf`` (MoreLikeThis.java
    setMinTermFreq): source-doc terms with tf below it contribute no
    query term.  Default 1 = no filtering (the handler default is 2;
    the {!mlt} dispatch passes the param through)."""
    row = _term_vector_row(engine, doc_id)
    if not row:
        return engine.spark.createDataFrame(
            [], "rank int, doc_id long, url string, score float"
        )
    from apache___solr_spark.index.codec import decode_vbyte

    terms = row[0]["terms"]
    tfs = decode_vbyte(bytes(row[0]["tfs"]), len(terms)).astype(int)
    qterms = _mlt_select_terms(
        engine,
        dict(zip(terms, (int(x) for x in tfs))),
        max_query_terms,
        min_doc_freq,
        min_term_freq,
    )
    if not qterms:
        return engine.spark.createDataFrame(
            [], "rank int, doc_id long, url string, score float"
        )
    hits = engine.search(ParsedQuery(should=qterms), k=k + 1)
    hits = hits.filter(F.col("doc_id") != doc_id).limit(k)
    return hits.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())),
    )


def highlight_text(
    text_col: str,
    terms: list[str],
    pre: str = "<em>",
    post: str = "</em>",
) -> "Column":
    """Column expression wrapping every whole-word occurrence of ``terms``
    (case-insensitive) in pre/post markers — the HighlightComponent
    capability (handler/component/HighlightComponent.java:55) re-expressed
    as a JVM-side regexp over the stored text (the reference's default
    highlighter likewise re-analyzes the stored field at query time)."""
    import re as _re

    pat = "(?i)\\b(" + "|".join(_re.escape(t) for t in sorted(terms)) + ")\\b"
    return F.regexp_replace(F.col(text_col), pat, pre + "$1" + post)


def highlight(
    engine: SearchEngine,
    query: str,
    source: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Search + highlight: top-k hits joined back to the stored text with
    query terms marked.  The join input is k rows (driver-materialized by
    search), so Catalyst broadcasts it into the source scan; only the k
    winners' text is ever fetched."""
    from apache___solr_spark.query.parser import parse_query

    pq = parse_query(query, analyze_fn=engine._analyze)
    terms = pq.scoring_terms + [t for ph in pq.scoring_phrases for t in ph]
    hits = engine.search(query, k=k, with_url=False)
    src = source.select(
        F.col(id_col).alias("_hl_id"), F.col(text_col).alias("_hl_text")
    )
    return (
        hits.join(src, hits["doc_id"] == src["_hl_id"])
        .select(
            "rank",
            "doc_id",
            "score",
            highlight_text("_hl_text", terms, pre, post).alias("snippet"),
        )
        .orderBy("rank")
    )


def elevate(
    engine: SearchEngine,
    query: str,
    elevate_ids: list[int],
    exclude_ids: list[int] | None = None,
    k: int = 10,
) -> DataFrame:
    """QueryElevationComponent (handler/component/
    QueryElevationComponent.java, elevate.xml): editorially pin the
    configured docs to the top ranks IN CONFIG ORDER — whether or not
    they match the query (forceElevation) — drop excluded docs, and let
    the organic hits follow by score.  Adds the ``elevated`` boolean
    the reference exposes via the [elevated] transformer.

    Scale shape: the pinned/excluded id sets are editorial-sized (a few
    rows) — the pinned docs come from a broadcast-semi-joined docs-table
    lookup, the organic tail is the normal pruned top-k; no extra corpus
    scan.
    """
    exclude = [int(x) for x in (exclude_ids or [])]
    pin = [int(x) for x in elevate_ids if int(x) not in exclude]
    organic = engine.search(query, k=k + len(pin), with_url=True)
    drop = set(pin) | set(exclude)
    organic = organic.filter(~F.col("doc_id").isin([*drop]))
    order = {d: i for i, d in enumerate(pin)}
    pinned = (
        engine.docs.filter(F.col("doc_id").isin(pin))
        .select(
            "doc_id",
            "url",
            F.lit(None).cast(organic.schema["score"].dataType).alias("score"),
        )
        .withColumn(
            "_ord",
            F.coalesce(
                *[
                    F.when(F.col("doc_id") == d, F.lit(i))
                    for d, i in order.items()
                ],
                F.lit(len(pin)),
            )
            if order
            else F.lit(0),
        )
        .withColumn("elevated", F.lit(True))
    )
    tail = organic.select(
        "doc_id", "url", "score",
        (F.col("rank") + len(pin)).alias("_ord"),
        F.lit(False).alias("elevated"),
    )
    out = pinned.select("doc_id", "url", "score", "_ord", "elevated").unionByName(tail)
    w = Window.orderBy(F.col("_ord").asc(), F.col("doc_id").asc())
    return (
        out.select(
            F.row_number().over(w).alias("rank"),
            "doc_id", "url", "score", "elevated",
        )
        .orderBy("rank")
        .limit(k)
    )


def simple_facets(
    engine: SearchEngine,
    query: str,
    meta: DataFrame,
    fields: list[str],
    limit: int = 10,
    mincount: int = 1,
) -> DataFrame:
    """facet.field counts over the FULL DocSet of a query — the classic
    search+facet combo (handler/component/FacetComponent.java +
    request/SimpleFacets.java:483 getTermCounts: count each field value
    across every matching doc, not just the returned page).

    ``meta``: DataFrame carrying ``url`` plus the facet fields (the
    stored-fields/docValues analog; the index's docs table stores only
    url/doclen/norm, so facet metadata rides a url-keyed side table).

    Returns (field, value, count) — per field the top ``limit`` values with
    count >= ``mincount``, ordered count desc then value asc (facet.sort=
    count with index-order ties, SimpleFacets.java:520).

    Scale shape: the DocSet never leaves the cluster — docset() is a
    bucket-pruned postings scan + aggregation; the url join and the
    stack/groupBy are one shuffle each, all JVM expressions."""
    ids = engine.docset(query)
    hit_urls = engine.docs.join(ids, "doc_id", "left_semi").select("url")
    joined = hit_urls.join(meta, "url")
    pairs = ", ".join(f"'{f}', cast(`{f}` as string)" for f in fields)
    stacked = joined.select(
        F.expr(f"stack({len(fields)}, {pairs}) as (field, value)")
    )
    counts = (
        stacked.groupBy("field", "value")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= mincount)
    )
    w = Window.partitionBy("field").orderBy(
        F.col("count").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= limit)
        .select("field", "value", "count")
        .orderBy("field", F.col("count").desc(), "value")
    )


def mlt_like_content(
    engine: SearchEngine,
    content: str,
    k: int = 10,
    max_query_terms: int = 10,
    min_doc_freq: int = 2,
    min_term_freq: int = 1,
) -> DataFrame:
    """{!mlt_content} (mlt/MLTContentQParserPlugin.java:36 ->
    MoreLikeThis.like(field, Reader)): build the MLT query from FREE TEXT
    instead of a stored doc — analyze the content, rank its terms by
    tf*idf against the index statistics, and issue the top terms as an
    OR query.  Same term selection as :func:`more_like_this`, no source
    doc to exclude."""
    toks = engine._analyze(content)
    if not toks:
        return engine.spark.createDataFrame(
            [], f"rank int, doc_id long, url string, score {engine._sql_t}"
        )
    tf_by_term: dict[str, int] = {}
    for t in toks:
        tf_by_term[t] = tf_by_term.get(t, 0) + 1
    qterms = _mlt_select_terms(
        engine, tf_by_term, max_query_terms, min_doc_freq, min_term_freq
    )
    if not qterms:
        return engine.spark.createDataFrame(
            [], f"rank int, doc_id long, url string, score {engine._sql_t}"
        )
    return engine.search(ParsedQuery(should=qterms), k=k)


def significant_terms_index(
    engine: SearchEngine,
    query,
    num_terms: int = 20,
    min_doc_freq: float = 5.0,
    max_doc_freq: float = 0.3,
    min_term_length: int = 4,
    fq: list | None = None,
) -> DataFrame:
    """{!significantTerms} (SignificantTermsQParserPlugin.java:42,200-250)
    over the INDEX: terms over-represented in the docs matching ``query``
    (the foreground) vs the whole collection, scored exactly like the
    reference's collector —

        score = ln(queryDocFreq) * (ln((N+1)/(docFreq+1)) + 1)

    with the same min/max docFreq window (absolute when >= 1, a ratio of
    N when < 1) and minTermLength gate.  Returns (term, queryDocFreq,
    docFreq, score), top ``num_terms`` by score.

    Scale shape: the docFreq window and term-length gate filter the
    DICTIONARY first and restrict the postings scan by join (no driver
    term list); only doc_gaps decode (no tfs/norms/positions); the
    foreground intersection is one semi-join + groupBy(term).  The
    reference walks every term's postings per shard — this is the same
    scan expressed as one distributed job."""
    n_docs = engine.stats["N"]
    fg = engine.docset(query)
    for f in fq or []:
        # fq restricts the FOREGROUND, like the request's filter queries
        # restrict the result set the reference collects over
        fg = fg.join(engine.docset(f), "doc_id", "left_semi")
    lo = (
        float(min_doc_freq)
        if float(min_doc_freq) >= 1.0
        else float(min_doc_freq) * n_docs
    )
    hi = (
        float(max_doc_freq)
        if float(max_doc_freq) >= 1.0
        else float(max_doc_freq) * n_docs
    )
    cand = engine.dictionary.filter(
        (F.col("df") >= F.lit(lo))
        & (F.col("df") <= F.lit(hi))
        & (F.length("term") >= int(min_term_length))
    ).select("term", "df")

    from apache___solr_spark.query.engine import _decode_docs_fn

    pairs = (
        engine.postings.join(cand.select("term"), "term")
        .select("term", "salt", "n_docs", "doc_gaps")
        .mapInPandas(
            _decode_docs_fn(engine.cfg.salt_range),
            schema="term string, doc_id long",
        )
    )
    fg_tf = (
        pairs.join(fg, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("queryDocFreq"))
    )
    scored = (
        fg_tf.join(cand, "term")
        .withColumn(
            "score",
            (
                F.log(F.col("queryDocFreq").cast("double"))
                * (
                    F.log(
                        F.lit(float(n_docs + 1))
                        / (F.col("df").cast("double") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).cast("float"),
        )
        .select(
            "term",
            "queryDocFreq",
            F.col("df").alias("docFreq"),
            "score",
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("term").asc()).limit(
        int(num_terms)
    )
