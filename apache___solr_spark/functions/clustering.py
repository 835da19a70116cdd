"""Clustering evaluators: distributed k-means over an embedding column.

Reference: solrj-streaming/.../io/eval/KmeansEvaluator.java (and
MultiKmeansEvaluator/FuzzyKmeansEvaluator): the math-expression kmeans
clusters a driver-side matrix with Commons-Math KMeans++.  That shape caps
out at driver memory; this implementation is the distributed analog —
Lloyd's iterations over a DataFrame ``array<double>`` column:

- assignment: one ``mapInPandas`` pass; each Arrow batch does a single
  (batch x k) numpy matmul (``|x|^2 - 2 x C^T + |c|^2``) — vectorized,
  no per-row Python.
- update: ``groupBy(cluster).agg(avg(vec[i]) ...)`` — dim aggregate
  expressions, so Spark's partial aggregation combines map-side and the
  shuffle moves only k x dim partials per task, never vectors.
- the k x dim centroid matrix is the only driver-side state.

Initialization is deterministic farthest-point traversal over a
hash-ordered sample (first seed = min ``xxhash64(id, seed)``, each next
seed = the sample point farthest from its nearest chosen seed) — the
deterministic analog of the reference's k-means++ spreading; naive
first-k-by-hash seeding was observed to drop two seeds into one blob and
converge to a 0.6-purity local minimum on well-separated clusters.
Runs are reproducible — unlike the reference's Commons-Math seeding.
Empty clusters keep their previous centroid (standard repair, same as the
IVF builder in pipeline/similarity.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans", "kmeans_init"]


def kmeans_init(
    df: DataFrame, vec_col: str, k: int, id_col: str, seed: int = 42
) -> np.ndarray:
    """Deterministic farthest-point seeding on a hash-ordered sample of
    up to max(1000, 50k) rows (driver-side numpy; the sample bound keeps
    this O(sample * k) regardless of corpus size)."""
    n_sample = max(1000, 50 * int(k))
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} but only {len(rows)} rows")
    S = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    chosen = [0]  # min-hash row seeds the traversal
    d2 = ((S - S[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(d2.argmax())
        chosen.append(nxt)
        d2 = np.minimum(d2, ((S - S[nxt]) ** 2).sum(axis=1))
    return S[chosen].copy()


def _assign_fn(centroids: np.ndarray, vec_col: str, id_col: str):
    c = centroids.astype(np.float64)
    c_norm2 = (c * c).sum(axis=1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy())
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + c_norm2[None, :]
            )
            cl = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": cl.astype(np.int32),
                    "dist2": np.maximum(
                        d2[np.arange(len(cl)), cl], 0.0
                    ),
                    vec_col: pdf[vec_col].to_numpy(),
                }
            )

    return run


def kmeans(
    df: DataFrame,
    vec_col: str,
    k: int,
    id_col: str,
    iters: int = 10,
    seed: int = 42,
):
    """Lloyd's k-means.  Returns ``(assignments, centroids, sse_history)``:
    assignments is a DataFrame (id_col, cluster, dist2), centroids a
    k x dim list-of-lists, sse_history the total within-cluster squared
    error per iteration (non-increasing — Lloyd's invariant)."""
    src = df.select(id_col, vec_col)
    dim = len(src.select(vec_col).first()[0])
    cent = kmeans_init(src, vec_col, int(k), id_col, seed=seed)

    schema = (
        f"{id_col} long, cluster int, dist2 double, "
        f"{vec_col} array<double>"
    )
    src = src.persist()
    sse_history: list[float] = []
    assigned = None
    try:
        for _ in range(int(iters)):
            assigned = src.mapInPandas(
                _assign_fn(cent, vec_col, id_col), schema
            )
            stats = (
                assigned.groupBy("cluster")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("dist2").alias("sse"),
                    *[
                        F.avg(F.col(vec_col)[i]).alias(f"c{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            sse_history.append(float(sum(r["sse"] for r in stats)))
            new_cent = cent.copy()  # empty clusters keep their centroid
            for r in stats:
                new_cent[r["cluster"]] = [r[f"c{i}"] for i in range(dim)]
            cent = new_cent
        final = src.mapInPandas(
            _assign_fn(cent, vec_col, id_col), schema
        ).select(id_col, "cluster", "dist2")
        return final, [[float(x) for x in row] for row in cent], sse_history
    finally:
        src.unpersist()
