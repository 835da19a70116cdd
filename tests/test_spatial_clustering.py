"""Spatial function queries (geodist/geofilt/bbox) and distributed k-means.

Oracles: pure-Python haversine with the reference's exact constants
(HaversineConstFunction.java:57-77); numpy Lloyd's replay from the same
deterministic initialization for k-means.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from apache___solr_spark.functions.clustering import kmeans
from apache___solr_spark.functions.spatial import (
    EARTH_MEAN_RADIUS_KM,
    bbox_predicate,
    geodist,
    geofilt,
)


def _haversine_km(lat1, lon1, lat2, lon2):
    d2r = math.pi / 180.0
    la1, lo1, la2, lo2 = lat1 * d2r, lon1 * d2r, lat2 * d2r, lon2 * d2r
    hx = math.sin((la1 - la2) * 0.5)
    hy = math.sin((lo1 - lo2) * 0.5)
    h = hx * hx + math.cos(la1) * math.cos(la2) * hy * hy
    return (
        2.0
        * EARTH_MEAN_RADIUS_KM
        * math.atan2(math.sqrt(h), math.sqrt(1.0 - h))
    )


@pytest.fixture(scope="module")
def points(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.uniform(-89.9, 89.9), rng.uniform(-180.0, 180.0))
        for i in range(800)
    ]
    # adversarial ring near the antimeridian and the poles
    rows += [(1000 + j, 40.0 + j * 0.01, 179.5 + j * 0.05) for j in range(20)]
    rows += [(1100 + j, 40.0 + j * 0.01, -179.5 - j * 0.05) for j in range(20)]
    rows += [(1200 + j, 89.0 + j * 0.04, j * 10.0 - 180.0) for j in range(20)]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_geodist_matches_reference_formula(spark, points):
    center = (48.8566, 2.3522)
    got = points.select(
        "id", "lat", "lon", geodist("lat", "lon", *center).alias("d")
    ).collect()
    for r in got:
        want = _haversine_km(r["lat"], r["lon"], *center)
        assert abs(r["d"] - want) < 1e-9 * max(1.0, want), r


@pytest.mark.parametrize(
    "center,d_km",
    [
        ((48.8566, 2.3522), 500.0),  # ordinary
        ((40.5, 179.9), 800.0),  # antimeridian crossing
        ((89.5, 0.0), 300.0),  # polar cap
        ((-33.9, 151.2), 2000.0),  # large radius southern hemisphere
    ],
)
def test_geofilt_equals_bruteforce(spark, points, center, d_km):
    got = sorted(
        r["id"]
        for r in geofilt(points, "lat", "lon", *center, d_km).collect()
    )
    want = sorted(
        r["id"]
        for r in points.collect()
        if _haversine_km(r["lat"], r["lon"], *center) <= d_km
    )
    assert got == want
    # bbox is a strict superset of the circle (prefilter soundness)
    boxed = {
        r["id"]
        for r in points.filter(
            bbox_predicate("lat", "lon", *center, d_km)
        ).collect()
    }
    assert set(want) <= boxed


def test_bbox_predicate_pushed_to_parquet(spark, points, tmp_path):
    p = str(tmp_path / "pts.parquet")
    points.write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        df.filter(bbox_predicate("lat", "lon", 48.8566, 2.3522, 500.0))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(lat" in plan


def test_kmeans_matches_numpy_lloyds(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cent, sse = kmeans(
        e, "embedding", k=6, id_col="vec_id", iters=5, seed=11
    )
    # Lloyd's invariant: SSE non-increasing
    assert all(b <= a + 1e-6 for a, b in zip(sse, sse[1:]))

    # numpy replay from the SAME deterministic initialization
    from apache___solr_spark.functions.clustering import kmeans_init

    rows = e.select("vec_id", "embedding").collect()
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    C = kmeans_init(e, "embedding", 6, "vec_id", seed=11)
    for _ in range(5):
        d2 = (
            (X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :]
        )
        cl = d2.argmin(1)
        newC = C.copy()
        for j in range(6):
            m = cl == j
            if m.any():
                newC[j] = X[m].mean(0)
        C = newC
    np.testing.assert_allclose(np.array(cent), C, rtol=1e-9, atol=1e-9)

    # final assignments are nearest-centroid under the returned centroids
    d2 = (X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :]
    want_cl = {int(i): int(c) for i, c in zip(ids, d2.argmin(1))}
    for r in assigned.collect():
        assert r["cluster"] == want_cl[r["vec_id"]]


def test_kmeans_separates_planted_blobs(spark):
    """Deterministic well-separated Gaussian blobs (the embeddings table's
    label column carries no geometric signal — verified 1-NN accuracy is
    at chance — so the blobs are planted here); k-means at k=#blobs must
    recover them nearly perfectly."""
    rng = np.random.default_rng(5)
    k, per, dim = 5, 120, 16
    centers = rng.normal(size=(k, dim)) * 10.0
    rows = []
    for b in range(k):
        pts = centers[b] + rng.normal(size=(per, dim))
        for i, p in enumerate(pts):
            rows.append((b * per + i, [float(x) for x in p], b))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, blob int"
    )
    assigned, _, sse = kmeans(
        df, "embedding", k=k, id_col="vec_id", iters=8, seed=3
    )
    assert all(b <= a + 1e-6 for a, b in zip(sse, sse[1:]))
    j = assigned.join(df.select("vec_id", "blob"), "vec_id")
    top = (
        j.groupBy("cluster", "blob")
        .count()
        .groupBy("cluster")
        .agg(F.max("count").alias("top"), F.sum("count").alias("n"))
        .agg(F.sum("top").alias("t"), F.sum("n").alias("n"))
        .collect()[0]
    )
    purity = top["t"] / top["n"]
    assert purity > 0.95, purity


def test_ols_regress_matches_numpy(spark, sf_dir):
    """OLSRegressionEvaluator: multivariate OLS via one distributed moment
    aggregation == numpy lstsq on the collected data."""
    from apache___solr_spark.functions.evaluators import (
        ols_predict,
        ols_regress,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    )
    xs = ["l_quantity", "l_discount", "l_tax"]
    model = ols_regress(li, xs, "l_extendedprice")

    pdf = li.toPandas()
    X = np.column_stack(
        [np.ones(len(pdf))] + [pdf[c].astype(float).to_numpy() for c in xs]
    )
    yv = pdf["l_extendedprice"].astype(float).to_numpy()
    want, *_ = np.linalg.lstsq(X, yv, rcond=None)
    np.testing.assert_allclose(model["coefficients"], want, rtol=1e-6)
    pred = yv - (X @ want)
    ss_res = float((pred**2).sum())
    ss_tot = float(((yv - yv.mean()) ** 2).sum())
    assert abs(model["rsquared"] - (1 - ss_res / ss_tot)) < 1e-6
    assert model["n"] == len(pdf)

    got_pred = (
        li.limit(5)
        .select(ols_predict(model["coefficients"], xs).alias("p"))
        .collect()
    )
    head = X[:5] @ want  # limit(5) preserves parquet order on one file
    for g, w in zip(got_pred, head):
        assert abs(g["p"] - w) < 1e-6 * max(1.0, abs(w))


def test_fuzzy_kmeans_matches_numpy_reference(spark):
    """fuzzy_kmeans vs a driver-side numpy fuzzy c-means from the SAME
    seeds: identical centroid trajectory and non-increasing objective."""
    import numpy as np
    from apache___solr_spark.functions.clustering import (
        fuzzy_kmeans,
        kmeans_init,
    )

    rng = np.random.RandomState(11)
    blobs = np.vstack(
        [
            rng.normal([0, 0], 0.4, (60, 2)),
            rng.normal([5, 5], 0.4, (60, 2)),
            rng.normal([0, 6], 0.4, (60, 2)),
        ]
    )
    rows = [(int(i), [float(a) for a in v]) for i, v in enumerate(blobs)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")

    k, m, iters = 3, 1.2, 8
    assigned, cent, obj = fuzzy_kmeans(
        df, "vec", k, "id", fuzziness=m, iters=iters, seed=7
    )

    # numpy reference from the same deterministic seeds
    c = kmeans_init(df, "vec", k, "id", seed=7).astype(np.float64)
    X = blobs
    expo = 2.0 / (m - 1.0)
    ref_obj = []
    for _ in range(iters):
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        d2 = np.maximum(d2, 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = d2 ** (-expo / 2.0)
            hit = ~np.isfinite(inv)
            u = inv / inv.sum(axis=1, keepdims=True)
        rows_hit = hit.any(axis=1)
        if rows_hit.any():
            u[rows_hit] = hit[rows_hit] / hit[rows_hit].sum(
                axis=1, keepdims=True
            )
        um = u**m
        ref_obj.append(float((um * d2).sum()))
        c = (um.T @ X) / um.sum(axis=0)[:, None]

    assert np.array(cent) == pytest.approx(c, rel=1e-9, abs=1e-9)
    assert obj == pytest.approx(ref_obj, rel=1e-9)
    # objective decreases (fuzzy c-means invariant on these well-separated blobs)
    assert all(b <= a + 1e-9 for a, b in zip(obj, obj[1:]))
    # hard assignments recover the three planted blobs (purity check)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    for lo in (0, 60, 120):
        labels = [got[i] for i in range(lo, lo + 60)]
        top = max(labels.count(l) for l in set(labels))
        assert top >= 58


def test_dbscan_matches_naive_oracle(spark):
    """Grid-cell distributed DBSCAN vs a naive O(n^2) oracle: identical
    core sets, identical cluster partitions (canonical min-id labels),
    identical noise.  Blobs are separated by >> 2*eps so border
    assignment is unambiguous and the Commons-Math order-dependence
    cannot bite."""
    import numpy as np
    from apache___solr_spark.functions.clustering import dbscan

    rng = np.random.RandomState(5)
    pts = np.vstack(
        [
            rng.normal([0, 0], 0.25, (50, 2)),
            rng.normal([10, 10], 0.25, (50, 2)),
            np.array([[5.0, 5.0], [-20.0, 3.0]]),  # isolated noise
        ]
    )
    eps, min_pts = 0.8, 4
    rows = [(int(i), [float(a) for a in v]) for i, v in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = {
        r["id"]: (r["cluster"], r["is_core"])
        for r in dbscan(df, "vec", eps, min_pts, "id").collect()
    }

    # naive oracle
    n = len(pts)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2))
    nbrs = [set(np.nonzero((d[i] <= eps))[0]) - {i} for i in range(n)]
    core = {i for i in range(n) if len(nbrs[i]) >= min_pts}
    # components over core-core adjacency
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in nbrs[i]:
                if j in core and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    border_lbl = {}
    for i in range(n):
        if i not in core:
            cn = [label[j] for j in nbrs[i] if j in core]
            if cn:
                border_lbl[i] = min(cn)

    for i in range(n):
        exp_core = i in core
        exp_lbl = label.get(i, border_lbl.get(i))
        assert got[i][1] == exp_core, f"core mismatch at {i}"
        assert got[i][0] == exp_lbl, f"label mismatch at {i}"


def test_dbscan_rejects_high_dim(spark):
    from apache___solr_spark.functions.clustering import dbscan

    df = spark.createDataFrame(
        [(0, [0.0] * 8)], "id long, vec array<double>"
    )
    with pytest.raises(NotImplementedError):
        dbscan(df, "vec", 0.5, 3, "id")


def test_geometry_evaluators(spark):
    """convexHull / getArea / getBoundarySize / getBaryCenter /
    projectToBorder / enclosingDisk (io/eval ConvexHullEvaluator,
    EnclosingDiskEvaluator + accessors) — exact-shape oracles."""
    from pyspark.sql import functions as F

    from apache___solr_spark.functions import geometry as G

    # unit square corners + interior/collinear points that must drop out
    pts = [
        [0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
        [0.5, 0.5], [0.5, 0.0], [0.25, 0.75],
    ]
    df = spark.createDataFrame([(pts,)], "pts array<array<double>>")
    hulled = df.select("pts", G.convex_hull(F.col("pts")).alias("hull"))
    row = hulled.select(
        "hull",
        G.polygon_area(F.col("hull")).alias("area"),
        G.polygon_boundary_size(F.col("hull")).alias("perim"),
        G.polygon_barycenter(F.col("hull")).alias("bc"),
    ).collect()[0]
    assert sorted(map(tuple, row["hull"])) == [
        (0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0),
    ]  # interior + collinear-midpoint dropped (includeCollinear=false)
    # CCW orientation: shoelace of the returned order is positive
    assert abs(row["area"] - 1.0) < 1e-12
    assert abs(row["perim"] - 4.0) < 1e-12
    assert abs(row["bc"][0] - 0.5) < 1e-12 and abs(row["bc"][1] - 0.5) < 1e-12

    # triangle barycenter = vertex mean (area centroid)
    tri = [[0.0, 0.0], [3.0, 0.0], [0.0, 3.0]]
    trow = (
        spark.createDataFrame([(tri,)], "pts array<array<double>>")
        .select(G.convex_hull(F.col("pts")).alias("h"))
        .select(G.polygon_barycenter(F.col("h")).alias("bc"),
                G.polygon_area(F.col("h")).alias("area"))
        .collect()[0]
    )
    assert abs(trow["area"] - 4.5) < 1e-12
    assert abs(trow["bc"][0] - 1.0) < 1e-12 and abs(trow["bc"][1] - 1.0) < 1e-12

    # projectToBorder: interior point goes to the nearest edge; outside
    # point lands on the closest boundary point
    qry = [[0.5, 0.1], [2.0, 0.5], [-1.0, -1.0]]
    prow = (
        spark.createDataFrame(
            [(qry, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])],
            "q array<array<double>>, hull array<array<double>>",
        )
        .select(G.project_to_border(F.col("q"), F.col("hull")).alias("p"))
        .collect()[0]["p"]
    )
    assert prow[0] == [0.5, 0.0]
    assert prow[1] == [1.0, 0.5]
    assert prow[2] == [0.0, 0.0]

    # enclosingDisk of the square: center (.5,.5), r = sqrt(2)/2, and the
    # support points sit on the boundary circle
    drow = (
        spark.createDataFrame(
            [([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.5, 0.5]],)],
            "pts array<array<double>>",
        )
        .select(G.enclosing_disk(F.col("pts")).alias("d"))
        .select("d.center", "d.radius", "d.support")
        .collect()[0]
    )
    assert abs(drow["center"][0] - 0.5) < 1e-9
    assert abs(drow["center"][1] - 0.5) < 1e-9
    assert abs(drow["radius"] - 0.5 ** 0.5) < 1e-9
    for s in drow["support"]:
        d = ((s[0] - 0.5) ** 2 + (s[1] - 0.5) ** 2) ** 0.5
        assert abs(d - drow["radius"]) < 1e-9
