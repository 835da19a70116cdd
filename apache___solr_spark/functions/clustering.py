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

__all__ = ["kmeans", "kmeans_init", "fuzzy_kmeans", "dbscan"]


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


def _fuzzy_partials_fn(
    centroids: np.ndarray, vec_col: str, fuzziness: float
):
    """Per-Arrow-batch partial reduction for fuzzy c-means: each batch
    yields k rows of (cluster, w = sum u^m, wx = sum u^m * x, obj partial)
    — the shuffle moves k x (dim+2) doubles per batch, never vectors."""
    c = centroids.astype(np.float64)
    c_norm2 = (c * c).sum(axis=1)
    k = len(c)
    expo = 2.0 / (fuzziness - 1.0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy())
            d2 = np.maximum(
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + c_norm2[None, :],
                0.0,
            )
            # u_ij = 1 / sum_l (d_ij / d_il)^(2/(m-1)); rows touching a
            # centroid exactly (d=0) get membership 1 there
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = d2 ** (-expo / 2.0)
                hit = ~np.isfinite(inv)
                any_hit = hit.any(axis=1)
                u = inv / inv.sum(axis=1, keepdims=True)
            if any_hit.any():
                u[any_hit] = hit[any_hit] / hit[any_hit].sum(
                    axis=1, keepdims=True
                )
            um = u ** fuzziness
            yield pd.DataFrame(
                {
                    "cluster": np.arange(k, dtype=np.int32),
                    "w": um.sum(axis=0),
                    "wx": list((um.T @ x)),
                    "obj": (um * d2).sum(axis=0),
                }
            )

    return run


def fuzzy_kmeans(
    df: DataFrame,
    vec_col: str,
    k: int,
    id_col: str,
    fuzziness: float = 1.2,
    iters: int = 20,
    seed: int = 42,
):
    """FuzzyKmeansEvaluator (io/eval/FuzzyKmeansEvaluator.java — Commons-Math
    FuzzyKMeansClusterer, default fuzziness 1.2 per :39): fuzzy c-means over
    a DataFrame vector column.  The reference clusters a driver matrix; this
    is the distributed analog — every row carries membership in ALL k
    clusters, so the centroid update sums u^m and u^m*x per cluster.  That
    sum is reduced per Arrow batch in numpy (k rows out per batch) and
    finished with one tiny groupBy, so the shuffle is k x (dim+2) doubles
    per batch regardless of corpus size.

    Returns ``(assignments, centroids, obj_history)``: assignments has
    (id_col, cluster = argmax membership = argmin distance, dist2),
    obj_history is the fuzzy objective J_m = sum_ij u_ij^m d_ij^2 per
    iteration."""
    if fuzziness <= 1.0:
        raise ValueError("fuzziness must be > 1 (1.2 is the reference default)")
    src = df.select(id_col, vec_col)
    dim = len(src.select(vec_col).first()[0])
    cent = kmeans_init(src, vec_col, int(k), id_col, seed=seed)

    partial_schema = "cluster int, w double, wx array<double>, obj double"
    src = src.persist()
    obj_history: list[float] = []
    try:
        for _ in range(int(iters)):
            stats = (
                src.mapInPandas(
                    _fuzzy_partials_fn(cent, vec_col, float(fuzziness)),
                    partial_schema,
                )
                .groupBy("cluster")
                .agg(
                    F.sum("w").alias("w"),
                    F.sum("obj").alias("obj"),
                    *[
                        F.sum(F.col("wx")[i]).alias(f"c{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            obj_history.append(float(sum(r["obj"] for r in stats)))
            new_cent = cent.copy()  # empty clusters keep their centroid
            for r in stats:
                if r["w"] and r["w"] > 0:
                    new_cent[r["cluster"]] = [
                        r[f"c{i}"] / r["w"] for i in range(dim)
                    ]
            cent = new_cent
        # hard assignment for output: argmax membership == argmin distance
        final = src.mapInPandas(
            _assign_fn(cent, vec_col, id_col),
            f"{id_col} long, cluster int, dist2 double, {vec_col} array<double>",
        ).select(id_col, "cluster", "dist2")
        return final, [[float(x) for x in row] for row in cent], obj_history
    finally:
        src.unpersist()


def dbscan(
    df: DataFrame,
    vec_col: str,
    eps: float,
    min_points: int,
    id_col: str,
    max_iters: int = 50,
):
    """DbscanEvaluator (io/eval/DbscanEvaluator.java — Commons-Math
    DBSCANClusterer, Euclidean): density clustering over a DataFrame vector
    column of dimension <= 3 (the evaluator's real use is 2-D zplot/spatial
    clustering).  The reference is O(n^2) driver-side; this is the
    distributed grid-cell formulation:

    - each point hashes to an eps-sized grid cell; candidate neighbor pairs
      come from a self-join on the 3^dim adjacent cells (a key-equi join —
      never a cartesian), filtered to true distance <= eps;
    - core points: neighbor count (excluding self) >= min_points, matching
      Commons-Math's getNeighbors/minPts contract;
    - clusters: connected components of the core-core adjacency graph via
      iterative min-label propagation (label = min point id in the
      component — deterministic), localCheckpoint'ed every 5 hops to bound
      lineage like operators/graph.py;
    - border points (non-core with a core neighbor) take the MIN core
      neighbor's cluster; Commons-Math assigns them to whichever cluster
      expands over them first (iteration-order-dependent) — documented
      divergence, deterministic here;
    - noise: cluster stays NULL (the reference simply omits noise from its
      cluster list).

    Returns (id_col, cluster bigint nullable, is_core boolean).

    Dimensions > 3 raise: grid neighbor enumeration is 3^dim and eps-balls
    lose meaning in high-d — use pipeline/similarity.py's LSH/IVF paths for
    embedding-scale neighbor problems."""
    dim = len(df.select(vec_col).first()[0])
    if dim > 3:
        raise NotImplementedError(
            "dbscan grid path supports dim <= 3; use LSH/IVF similarity for "
            "high-dimensional embeddings"
        )
    eps = float(eps)
    pts = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    for i in range(dim):
        pts = pts.withColumn(
            f"_c{i}", F.floor(F.col("_v")[i] / F.lit(eps)).cast("long")
        )
    cell = F.concat_ws(":", *[f"_c{i}" for i in range(dim)])
    pts = pts.withColumn("_cell", cell).persist()

    # one side explodes to its 3^dim neighbor cells; equi-join on the cell
    # key then exact distance filter.  a.id != b.id excludes self-pairs.
    shifts = [[0]]
    for _ in range(dim):
        shifts = [s + [d] for s in shifts for d in (-1, 0, 1)]
    shift_cols = [
        F.concat_ws(
            ":", *[F.col(f"_c{i}") + F.lit(s[i + 1]) for i in range(dim)]
        )
        for s in shifts
    ]
    left = pts.withColumn(
        "_probe", F.explode(F.array(*shift_cols))
    ).select("_id", "_v", "_probe")
    right = pts.select(
        F.col("_id").alias("_nid"),
        F.col("_v").alias("_nv"),
        F.col("_cell").alias("_probe"),
    )
    d2 = F.aggregate(
        F.zip_with("_v", "_nv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        left.join(right, "_probe")
        .where((F.col("_id") != F.col("_nid")) & (d2 <= F.lit(eps * eps)))
        .select("_id", "_nid")
        .persist()
    )

    core = (
        pairs.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .where(F.col("_deg") >= F.lit(int(min_points)))
        .select("_id")
        .persist()
    )

    # connected components over core-core edges: min-label propagation
    core_edges = (
        pairs.join(core, "_id")
        .join(core.select(F.col("_id").alias("_nid")), "_nid")
        .select("_id", "_nid")
        .persist()
    )
    labels = core.select("_id", F.col("_id").alias("_lbl")).persist()
    converged = False
    for it in range(int(max_iters)):
        nbr_min = (
            core_edges.join(
                labels.select(
                    F.col("_id").alias("_nid"), F.col("_lbl").alias("_nlbl")
                ),
                "_nid",
            )
            .groupBy("_id")
            .agg(F.min("_nlbl").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "_id", "left")
            .select(
                "_id",
                F.least(
                    F.col("_lbl"), F.coalesce(F.col("_nbr"), F.col("_lbl"))
                ).alias("_lbl"),
            )
        )
        if it % 5 == 4:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "_id")
            .where(F.col("n._lbl") != F.col("o._lbl"))
            .limit(1)
            .count()
        )
        old = labels
        labels = new_labels.persist()
        old.unpersist()
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dbscan label propagation did not converge in {max_iters} "
            "iterations (cluster-graph diameter exceeds max_iters); raise "
            "max_iters"
        )

    # border points: non-core with a core neighbor -> min core label
    border = (
        pairs.join(core.select(F.col("_id").alias("_nid")), "_nid")
        .join(core, "_id", "left_anti")
        .join(
            labels.select(F.col("_id").alias("_nid"), "_lbl"), "_nid"
        )
        .groupBy("_id")
        .agg(F.min("_lbl").alias("_lbl"))
    )
    out = (
        pts.select("_id")
        .join(
            labels.select("_id", "_lbl")
            .unionByName(border)
            .withColumnRenamed("_lbl", "cluster"),
            "_id",
            "left",
        )
        .join(
            core.select("_id", F.lit(True).alias("is_core")), "_id", "left"
        )
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.coalesce("is_core", F.lit(False)).alias("is_core"),
        )
    )
    # cut the result free of the cached intermediates (localCheckpoint
    # materializes it), then release every persist taken above
    out = out.localCheckpoint()
    for cached in (pts, pairs, core, core_edges, labels):
        cached.unpersist()
    return out
