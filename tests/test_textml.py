"""Text-ML streams: igain feature selection, logistic regression train/classify.

Oracles: DuckDB SQL replays the exact IGain entropy formula
(IGainTermsQParserPlugin.java:162-188); numpy replays the batch
gradient-descent epochs bit-for-bit on the collected design matrix.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from apache___solr_spark.pipeline.textml import (
    predict_logit,
    select_features_igain,
    train_text_logit,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_igain_matches_duckdb(spark, sf_dir, docs):
    got = (
        select_features_igain(
            docs, "text", "lang", positive_label="en", num_terms=15
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(
        """
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
        )
        SELECT term,
               (CASE WHEN npos/n <= 0 OR npos/n >= 1 THEN 0
                     ELSE -(npos/n)*ln(npos/n) - (1-npos/n)*ln(1-npos/n) END)
               - ( (dfreq/n) * (CASE WHEN xc/dfreq <= 0 OR xc/dfreq >= 1 THEN 0
                       ELSE -(xc/dfreq)*ln(xc/dfreq) - (1-xc/dfreq)*ln(1-xc/dfreq) END)
                 + (1 - dfreq/n) * (CASE WHEN (npos-xc)/(n-dfreq+1) <= 0 OR (npos-xc)/(n-dfreq+1) >= 1 THEN 0
                       ELSE -((npos-xc)/(n-dfreq+1))*ln((npos-xc)/(n-dfreq+1))
                            - (1-(npos-xc)/(n-dfreq+1))*ln(1-(npos-xc)/(n-dfreq+1)) END) )
               AS score,
               CAST(dfreq AS BIGINT) AS doc_freq,
               ln(n / (dfreq + 1)) AS idf
        FROM per_term, totals
        ORDER BY score DESC, term LIMIT 15
        """
    ).fetchall()
    assert len(got) == len(want) == 15
    for g, w in zip(got, want):
        assert g["term"] == w[0]
        assert abs(g["score"] - w[1]) < 1e-9
        assert g["doc_freq"] == w[2]
        assert abs(g["idf"] - w[3]) < 1e-9
    # scores are real information gains: positive, decreasing
    scores = [g["score"] for g in got]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0


def _numpy_epochs(X, y, iterations, alpha, threshold):
    """Reference batch GD matching train_text_logit's documented math."""
    w = np.zeros(X.shape[1])
    out = []
    for it in range(1, iterations + 1):
        dot = X @ w
        sig = 1.0 / (1.0 + np.exp(-dot))
        err = sig - y
        pred = (sig >= threshold).astype(int)
        total_err = np.abs(err).sum()
        tp = int(((y == 1) & (pred == 1)).sum())
        tn = int(((y == 0) & (pred == 0)).sum())
        fp = int(((y == 0) & (pred == 1)).sum())
        fn = int(((y == 1) & (pred == 0)).sum())
        w = w - alpha * (X.T @ err) / len(y)  # mean gradient (see textml.py)
        out.append((list(w), total_err, tp, tn, fp, fn))
    return out


def test_train_logit_matches_numpy(spark, docs):
    feats = [
        (r["term"], r["idf"])
        for r in select_features_igain(
            docs, "text", "lang", positive_label="en", num_terms=8
        ).collect()
    ]
    iters = train_text_logit(
        docs,
        "text",
        "lang",
        feats,
        positive_label="en",
        iterations=5,
        alpha=0.05,
        id_col="doc_id",
    )
    assert len(iters) == 5

    # rebuild the design matrix in numpy from raw text (independent path)
    rows = docs.select("doc_id", "text", "lang").collect()
    terms = [t for t, _ in feats]
    idfs = {t: i for t, i in feats}
    X_rows, y_rows = [], []
    import re

    for r in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        tf = {}
        for t in toks:
            if t in idfs:
                tf[t] = tf.get(t, 0) + 1
        if not tf:
            continue  # reference: docs w/o features excluded
        vec = [1.0] + [
            idfs[t] * (1.0 + math.log(tf[t])) if t in tf else 0.0
            for t in terms
        ]
        X_rows.append(vec)
        y_rows.append(1.0 if r["lang"] == "en" else 0.0)
    X = np.array(X_rows)
    y = np.array(y_rows)
    want = _numpy_epochs(X, y, 5, 0.05, 0.5)
    for got, (w_want, err_want, tp, tn, fp, fn) in zip(iters, want):
        np.testing.assert_allclose(got["weights"], w_want, rtol=1e-9, atol=1e-9)
        assert abs(got["error"] - err_want) < 1e-6
        assert (
            got["truePositive_i"],
            got["trueNegative_i"],
            got["falsePositive_i"],
            got["falseNegative_i"],
        ) == (tp, tn, fp, fn)
    # training converges: error decreases over epochs
    assert iters[-1]["error"] < iters[0]["error"]


def test_predict_logit_consistent_with_training(spark, docs):
    feats = [
        (r["term"], r["idf"])
        for r in select_features_igain(
            docs, "text", "lang", positive_label="en", num_terms=8
        ).collect()
    ]
    iters = train_text_logit(
        docs,
        "text",
        "lang",
        feats,
        positive_label="en",
        iterations=8,
        alpha=0.05,
        id_col="doc_id",
    )
    w = iters[-1]["weights"]
    scored = predict_logit(docs, "text", feats, w).select(
        "doc_id", "lang", "probability_d", "prediction"
    )
    rows = scored.collect()
    assert all(0.0 <= r["probability_d"] <= 1.0 for r in rows)
    # the trained model should separate en from the rest better than chance
    en = [r["probability_d"] for r in rows if r["lang"] == "en"]
    other = [r["probability_d"] for r in rows if r["lang"] != "en"]
    if en and other:
        assert sum(en) / len(en) > sum(other) / len(other)


def test_train_epoch_reuses_cached_partitioning(spark, docs):
    """The design matrix is cached pre-partitioned on the doc key, so the
    epoch's dot-product aggregation runs exchange-free over the cache
    (only the term-gradient aggregation may shuffle)."""
    from pyspark.sql import functions as F

    from apache___solr_spark.pipeline.textml import (
        _design_matrix,
        select_features_igain,
    )

    feats = [
        (r["term"], r["idf"])
        for r in select_features_igain(
            docs, "text", "lang", "en", num_terms=6
        ).collect()
    ]
    design = (
        _design_matrix(docs, "text", "lang", "en", feats, id_col="doc_id")
        .repartition("__doc")
        .persist()
    )
    try:
        design.count()
        per_doc = design.groupBy("__doc", "y").agg(
            F.sum(F.col("value")).alias("dot")
        )
        plan = per_doc._jdf.queryExecution().executedPlan().toString()
        # nothing between the final aggregate and the cache scan
        above_cache = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in above_cache
        assert "Exchange" not in above_cache, above_cache
    finally:
        design.unpersist()


def test_term_vectors_matches_reference_formula(spark):
    """term_vectors vs a direct driver-side recomputation of
    TermVectorsEvaluator's vocabulary pruning + sqrt(tf)*idf weights."""
    import math as m

    from apache___solr_spark.pipeline.textml import term_vectors

    texts = [
        "alpha beta gamma alpha",
        "beta gamma delta",
        "alpha epsilon zz",          # 'zz' pruned by min_term_length=3
        "gamma gamma gamma common",
        "delta epsilon common",
        "common words only here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    vecs, features, dfreqs = term_vectors(
        df, "id", "text", min_doc_freq=0.2, max_doc_freq=0.9
    )
    n = len(texts)
    lo, hi = int(n * 0.2), int(n * 0.9)

    # oracle vocabulary
    import collections

    docs = [[t for t in s.split() if len(t) >= 3] for s in texts]
    odf = collections.Counter(t for d in docs for t in set(d))
    vocab = sorted(t for t, c in odf.items() if lo <= c <= hi)
    assert features == vocab
    assert dfreqs == {t: odf[t] for t in vocab}

    got = {r["id"]: r["vector"] for r in vecs.collect()}
    assert set(got) == set(range(n))
    for i, d in enumerate(docs):
        tf = collections.Counter(t for t in d if t in odf and lo <= odf[t] <= hi)
        exp = [
            m.sqrt(tf.get(t, 0)) * (m.log((n + 1) / (odf[t] + 1)) + 1.0)
            for t in vocab
        ]
        assert got[i] == pytest.approx(exp, abs=1e-12), i


def test_top_features_orders_by_weight(spark):
    from apache___solr_spark.pipeline.textml import top_features

    feats = ["aa", "bb", "cc", "dd"]
    rows = [
        (0, [0.5, 2.0, 0.0, 1.0]),   # bb > dd > aa; cc (0) excluded
        (1, [0.0, 0.0, 0.0, 0.0]),   # all zero -> empty
    ]
    df = spark.createDataFrame(rows, "id long, vector array<double>")
    got = {
        r["id"]: r["top_features"]
        for r in top_features(df, feats, k=2).collect()
    }
    assert got[0] == ["bb", "dd"]
    assert got[1] == []
    got3 = {
        r["id"]: r["top_features"]
        for r in top_features(df, feats, k=10).collect()
    }
    assert got3[0] == ["bb", "dd", "aa"]  # only positive weights included
