"""Search-result clustering — the clustering module's ClusteringComponent
(solr/modules/clustering/src/java/org/apache/solr/handler/clustering/
ClusteringComponent.java:73): group the documents of ONE result page into
labeled topical clusters (Carrot2 Lingo/STC engines in the reference;
here tf-idf doc vectors over the result set + spherical k-means, with
cluster labels = the terms closest to each centroid — the same
"salient terms of the cluster" labeling idea Lingo uses).

Scale shape: clustering operates on a RESULT PAGE (k <= a few hundred
docs — EngineParameters docIdsLimit), not the corpus, so the right unit
is one bounded task: the page's (id, text, score) rows flow through a
single applyInPandas group where numpy does tf-idf + k-means.  The
corpus-scale analog (cluster everything) is
`functions/clustering.py:kmeans` over feature columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache___solr_spark.analysis.chain import analyze
from apache___solr_spark.pipeline.similarity import _spherical_kmeans

__all__ = ["cluster_results"]


def cluster_results(
    hits: DataFrame,
    source: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    n_clusters: int = 4,
    label_terms: int = 3,
    max_vocab: int = 128,
    seed: int = 7,
) -> DataFrame:
    """Cluster a result page into labeled groups.

    ``hits``: the page (id_col [+ score]); ``source``: stored-field table
    carrying ``text_col``.  Returns one row per cluster:
    (cluster_id, label, n_docs, doc_ids array) — deterministic under
    ``seed`` (doc vectors are built in sorted-id order).
    """
    page = hits.select(id_col).join(
        source.select(id_col, text_col), id_col
    )

    out_schema = (
        "cluster_id int, label string, n_docs int, "
        f"doc_ids array<string>"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        toks = [analyze(t or "") for t in pdf[text_col]]
        n = len(toks)
        if n == 0:
            return pd.DataFrame(
                columns=["cluster_id", "label", "n_docs", "doc_ids"]
            )
        # result-set tf-idf: df within the page; drop terms in >80% of the
        # page (stop-like here even if rare corpus-wide) or in only 1 doc
        df_counts: dict[str, int] = {}
        tfs: list[dict[str, int]] = []
        for ts in toks:
            tf: dict[str, int] = {}
            for t in ts:
                tf[t] = tf.get(t, 0) + 1
            tfs.append(tf)
            for t in tf:
                df_counts[t] = df_counts.get(t, 0) + 1
        vocab = [
            t
            for t, d in df_counts.items()
            if 2 <= d <= max(2, int(0.8 * n))
        ]
        if not vocab:
            vocab = list(df_counts)
        idf = {
            t: float(np.log(1.0 + n / df_counts[t])) for t in vocab
        }
        # keep the max_vocab terms with the largest total tf-idf mass
        mass = {
            t: idf[t] * sum(tf.get(t, 0) for tf in tfs) for t in vocab
        }
        vocab = sorted(
            vocab, key=lambda t: (-mass[t], t)
        )[:max_vocab]
        tindex = {t: i for i, t in enumerate(vocab)}
        mat = np.zeros((n, len(vocab)), dtype=np.float64)
        for i, tf in enumerate(tfs):
            for t, c in tf.items():
                j = tindex.get(t)
                if j is not None:
                    mat[i, j] = c * idf[t]
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        vn = mat / norms[:, None]
        k = min(n_clusters, n)
        cent = _spherical_kmeans(vn, k, seed=seed)
        assign = (vn @ cent.T).argmax(axis=1)
        rows = []
        for c in range(cent.shape[0]):
            members = np.where(assign == c)[0]
            if members.size == 0:
                continue
            top = np.argsort(-cent[c])[:label_terms]
            label = " ".join(
                vocab[j] for j in top if cent[c][j] > 0
            )
            rows.append(
                {
                    "cluster_id": int(c),
                    "label": label,
                    "n_docs": int(members.size),
                    "doc_ids": [str(pdf[id_col].iloc[i]) for i in members],
                }
            )
        return pd.DataFrame(rows)

    return (
        page.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda _, pdf: run(pdf.drop(columns=["__g"])), out_schema)
        .orderBy(F.col("n_docs").desc(), "cluster_id")
    )
