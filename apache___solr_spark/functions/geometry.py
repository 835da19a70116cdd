"""2D computational-geometry stream evaluators.

Reference: solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/
eval/ConvexHullEvaluator.java (Commons Math MonotoneChain over a matrix of
2D points), GetVerticesEvaluator, GetAreaEvaluator, GetBoundarySizeEvaluator,
GetBaryCenterEvaluator, ProjectToBorderEvaluator, EnclosingDiskEvaluator
(WelzlEncloser), GetCenterEvaluator, GetRadiusEvaluator,
GetSupportPointsEvaluator.

Spark shape: a point set is an ``array<array<double>>`` column (rows =
points, 2 columns).  The hull itself is computed in an Arrow-batched
pandas UDF (numpy monotone chain — same algorithm the reference uses, a
per-value O(n log n) that has no distributed structure to exploit), and
every derived quantity (area, perimeter, barycenter) is a pure JVM fold
over the returned vertex matrix, so the expensive part runs once and the
geometry accessors stay inside codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "convex_hull",
    "polygon_area",
    "polygon_boundary_size",
    "polygon_barycenter",
    "project_to_border",
    "enclosing_disk",
]


def _hull_np(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain, strictly convex (collinear boundary points
    dropped — Commons Math MonotoneChain's default
    includeCollinearPoints=false).  Returns CCW vertices, first != last."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    n = len(pts)
    if n <= 2:
        return pts

    def half(iterable):
        out: list[np.ndarray] = []
        for p in iterable:
            while (
                len(out) >= 2
                and np.cross(out[-1] - out[-2], p - out[-2]) <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _hull_series(points: pd.Series) -> pd.Series:
    out = []
    for val in points:
        arr = np.array([list(p) for p in val], dtype=float)
        out.append([list(v) for v in _hull_np(arr)])
    return pd.Series(out)


def convex_hull(points: Column) -> Column:
    """ConvexHullEvaluator: CCW hull vertices of a 2D point matrix.

    The UDF is built at call time (driver-side, session active) — a
    module-level ``@pandas_udf`` would re-parse its DDL return type on
    executor import, where no SparkContext exists."""
    return pandas_udf(_hull_series, "array<array<double>>")(points)


def polygon_area(vertices: Column) -> Column:
    """GetAreaEvaluator (region size): shoelace |sum cross(v_i, v_{i+1})|/2
    as one JVM fold over the vertex matrix.  The vertex matrix is bound
    once per row (let_bind) so a composed vertices expression is not
    re-evaluated at every term."""
    from apache___solr_spark.functions.evaluators import let_bind

    def body(v: Column) -> Column:
        n = F.size(v)
        cross_terms = F.transform(
            F.sequence(F.lit(1), n), lambda i: _cross_at(v, i, n)
        )
        return (
            F.abs(
                F.aggregate(cross_terms, F.lit(0.0), lambda acc, x: acc + x)
            )
            / 2.0
        )

    return let_bind({"v": vertices}, body)


def _cross_at(vertices: Column, i: Column, n: Column) -> Column:
    a = F.element_at(vertices, i)
    b = F.element_at(vertices, F.when(i == n, 1).otherwise(i + 1))
    ax, ay = F.element_at(a, 1), F.element_at(a, 2)
    bx, by = F.element_at(b, 1), F.element_at(b, 2)
    return ax * by - bx * ay


def polygon_boundary_size(vertices: Column) -> Column:
    """GetBoundarySizeEvaluator: perimeter of the hull polygon."""
    from apache___solr_spark.functions.evaluators import let_bind

    def body(v: Column) -> Column:
        n = F.size(v)
        edges = F.transform(
            F.sequence(F.lit(1), n), lambda i: _edge_len(v, i, n)
        )
        return F.aggregate(edges, F.lit(0.0), lambda acc, x: acc + x)

    return let_bind({"v": vertices}, body)


def _edge_len(vertices: Column, i: Column, n: Column) -> Column:
    a = F.element_at(vertices, i)
    b = F.element_at(vertices, F.when(i == n, 1).otherwise(i + 1))
    dx = F.element_at(a, 1) - F.element_at(b, 1)
    dy = F.element_at(a, 2) - F.element_at(b, 2)
    return F.sqrt(dx * dx + dy * dy)


def polygon_barycenter(vertices: Column) -> Column:
    """GetBaryCenterEvaluator (Region.getBarycenter): area centroid
    C = (1/6A) * sum (v_i + v_{i+1}) * cross(v_i, v_{i+1}), signed A."""
    from apache___solr_spark.functions.evaluators import let_bind

    def body(v: Column) -> Column:
        n = F.size(v)
        idx = F.sequence(F.lit(1), n)
        signed_2a = F.aggregate(
            F.transform(idx, lambda i: _cross_at(v, i, n)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

        def moment(axis: int) -> Column:
            terms = F.transform(
                idx,
                lambda i: (
                    F.element_at(F.element_at(v, i), axis)
                    + F.element_at(
                        F.element_at(v, F.when(i == n, 1).otherwise(i + 1)),
                        axis,
                    )
                )
                * _cross_at(v, i, n),
            )
            return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)

        # signed_2a appears in both centroid components; bind it too so
        # the cross fold is not run twice per row.
        return let_bind(
            {"m1": moment(1), "m2": moment(2), "a2": signed_2a},
            lambda m1, m2, a2: F.array(m1 / (a2 * 3.0), m2 / (a2 * 3.0)),
        )

    return let_bind({"v": vertices}, body)


def _project_series(points: pd.Series, vertices: pd.Series) -> pd.Series:
    out = []
    for pts_val, verts_val in zip(points, vertices):
        pts = np.array([list(p) for p in pts_val], dtype=float)
        verts = np.array([list(v) for v in verts_val], dtype=float)
        m = len(verts)
        proj_rows = []
        for p in pts:
            best, best_d = None, np.inf
            for i in range(m):
                a, b = verts[i], verts[(i + 1) % m]
                ab = b - a
                denom = float(ab @ ab)
                t = 0.0 if denom == 0.0 else float(
                    np.clip((p - a) @ ab / denom, 0.0, 1.0)
                )
                q = a + t * ab
                d = float(np.linalg.norm(p - q))
                if d < best_d:
                    best, best_d = q, d
            proj_rows.append([float(best[0]), float(best[1])])
        out.append(proj_rows)
    return pd.Series(out)


def project_to_border(points: Column, vertices: Column) -> Column:
    """ProjectToBorderEvaluator: project each point onto the nearest
    point of the hull boundary (closest point on any edge segment)."""
    return pandas_udf(_project_series, "array<array<double>>")(
        points, vertices
    )


def _welzl(pts: np.ndarray) -> tuple[np.ndarray, float, list]:
    """Minimum enclosing disk — iterative Welzl in input order
    (deterministic: no shuffling, matching our no-RNG rule; the result
    disk is unique regardless of order).  Returns (center, r, support)."""

    def disk2(a, b):
        c = (a + b) / 2.0
        return c, float(np.linalg.norm(a - c)), [a, b]

    def disk3(a, b, c):
        # circumcenter
        d = 2.0 * (
            a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1])
        )
        if abs(d) < 1e-12:
            # collinear: widest pair
            pairs = [(a, b), (a, c), (b, c)]
            c0, r0, s0 = max(
                (disk2(x, y) for x, y in pairs), key=lambda t: t[1]
            )
            return c0, r0, s0
        ux = (
            (a @ a) * (b[1] - c[1])
            + (b @ b) * (c[1] - a[1])
            + (c @ c) * (a[1] - b[1])
        ) / d
        uy = (
            (a @ a) * (c[0] - b[0])
            + (b @ b) * (a[0] - c[0])
            + (c @ c) * (b[0] - a[0])
        ) / d
        ctr = np.array([ux, uy])
        return ctr, float(np.linalg.norm(a - ctr)), [a, b, c]

    def contains(ctr, r, p):
        return np.linalg.norm(p - ctr) <= r + 1e-9

    pts = np.unique(pts, axis=0)
    if len(pts) == 1:
        return pts[0], 0.0, [pts[0]]
    ctr, r, sup = disk2(pts[0], pts[1])
    for i in range(2, len(pts)):
        p = pts[i]
        if contains(ctr, r, p):
            continue
        # p on boundary; rebuild over prefix
        ctr, r, sup = disk2(pts[0], p)
        for j in range(1, i):
            q = pts[j]
            if contains(ctr, r, q):
                continue
            ctr, r, sup = disk2(p, q)
            for k in range(j):
                s = pts[k]
                if contains(ctr, r, s):
                    continue
                ctr, r, sup = disk3(p, q, s)
    return ctr, r, sup


def _disk_frame(points: pd.Series) -> pd.DataFrame:
    centers, radii, supports = [], [], []
    for val in points:
        arr = np.array([list(p) for p in val], dtype=float)
        ctr, r, sup = _welzl(arr)
        centers.append([float(ctr[0]), float(ctr[1])])
        radii.append(float(r))
        supports.append([[float(s[0]), float(s[1])] for s in sup])
    return pd.DataFrame(
        {"center": centers, "radius": radii, "support": supports}
    )


def enclosing_disk(points: Column) -> Column:
    """EnclosingDiskEvaluator (WelzlEncloser): the minimum enclosing disk
    as struct(center, radius, support) — GetCenter/GetRadius/
    GetSupportPoints are field accesses on it."""
    return pandas_udf(
        _disk_frame,
        "struct<center: array<double>, radius: double, "
        "support: array<array<double>>>",
    )(points)
