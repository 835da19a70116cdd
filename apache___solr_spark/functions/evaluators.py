"""Stream math-expression evaluators, Spark-first subset.

The reference ships 249 stream evaluators
(solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/eval/ —
AddEvaluator, CorrelationEvaluator, MovingAverageEvaluator, DescribeEvaluator,
PercentileEvaluator, SequenceEvaluator, CosineSimilarityEvaluator, ...).
They operate on numbers and numeric arrays flowing through tuples.  Here the
commonly-used statistical / array / similarity families map to DataFrame
column expressions (JVM-side, codegen) and aggregations; scalar arithmetic
lives in functions/registry.py.

Array-valued evaluators take ArrayType columns; aggregation-shaped ones
(corr, cov, describe, hist, percentile) are exposed as agg helpers so the
shuffle shape stays explicit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let_bind(bindings: dict[str, Column], body) -> Column:
    """Evaluate derived sub-expressions ONCE per row, then build ``body``
    over them as lambda variables.

    Spark column expressions have no let-binding: inlining a derived
    expression (an aggregate, array_min, a split chain) into a
    ``transform``/``aggregate`` lambda re-evaluates it at EVERY element —
    an O(n) expression inside an O(n) loop is O(n²) per row (measured 22×
    on the char-LM gram explode, BENCH/BASELINE.md).  This helper boxes
    the bound values in a one-element array of struct and transforms over
    it, so each binding is computed once and the body sees plain lambda
    variables.  Works for scalars and arrays alike; nest it when one
    binding must reference another.
    """
    names = list(bindings)
    cols = {
        k: (F.col(v) if isinstance(v, str) else v)
        for k, v in bindings.items()
    }
    boxed = F.array(F.struct(*[cols[k].alias(k) for k in names]))
    return F.element_at(
        F.transform(boxed, lambda s: body(**{k: s[k] for k in names})), 1
    )


# ---- array evaluators (ArrayEvaluator, AscEvaluator, ReverseEvaluator, ...)

def array_of(*cols: Column) -> Column:
    return F.array(*cols)


def asc_sort(arr: Column) -> Column:
    """AscEvaluator: sort an array ascending."""
    return F.array_sort(arr)


def rev(arr: Column) -> Column:
    """ReverseEvaluator."""
    return F.reverse(arr)


def copy_of_range(arr: Column, start: int, end: int) -> Column:
    """CopyOfRangeEvaluator (0-based [start, end))."""
    return F.slice(arr, start + 1, end - start)


def append_arr(arr: Column, value: Column) -> Column:
    """AppendEvaluator."""
    return F.concat(arr, F.array(value))


def sequence(length: int, start: int, stride: int) -> Column:
    """SequenceEvaluator: arithmetic sequence as an array column."""
    return F.sequence(
        F.lit(start), F.lit(start + (length - 1) * stride), F.lit(stride)
    )


def ebe_add(a: Column, b: Column) -> Column:
    """EBEAddEvaluator: element-by-element add (likewise sub/mul/div)."""
    return F.zip_with(a, b, lambda x, y: x + y)


def ebe_subtract(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x - y)


def ebe_multiply(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x * y)


def ebe_divide(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x / y)


def dot_product(a: Column, b: Column) -> Column:
    """DotProductEvaluator — JVM-side fold, no Python."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """CosineSimilarityEvaluator.java."""
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot_product(a, b) / (norm(a) * norm(b))


def euclidean_distance(a: Column, b: Column) -> Column:
    """EuclideanDistanceEvaluator."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def manhattan_distance(a: Column, b: Column) -> Column:
    """ManhattanDistanceEvaluator."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def chebyshev_distance(a: Column, b: Column) -> Column:
    """ChebyshevDistanceEvaluator (L-infinity)."""
    return F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def scale_arr(factor: Column | float, arr: Column) -> Column:
    """ScaleEvaluator: multiply every element."""
    f = F.lit(factor) if not isinstance(factor, Column) else factor
    return F.transform(arr, lambda x: x * f)


def normalize_sum(arr: Column) -> Column:
    """NormalizeSumEvaluator: scale so elements sum to 1."""
    return let_bind(
        {"total": F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)},
        lambda total: F.transform(arr, lambda x: x / total),
    )


def moving_avg(arr: Column, window: int) -> Column:
    """MovingAverageEvaluator: trailing mean over a window, emitted for
    every full window (length = len(arr) - window + 1); empty when the
    array is shorter than the window (_seq1 guard)."""
    # Bind arr: composed inputs (e.g. moving_avg(zscores(x), w)) would
    # otherwise re-evaluate the whole inner expression per window position.
    return let_bind(
        {"a": arr},
        lambda a: F.transform(
            _seq1(F.size(a) - F.lit(window - 1)),
            lambda i: F.aggregate(
                F.slice(a, i, window), F.lit(0.0), lambda acc, v: acc + v
            )
            / F.lit(float(window)),
        ),
    )


def cumulative_sum(arr: Column) -> Column:
    """CumulativeSumEvaluator — via aggregate with an array accumulator."""
    return F.aggregate(
        arr,
        F.array().cast("array<double>"),
        lambda acc, v: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + v
            ),
        ),
    )


# ---- aggregation-shaped evaluators ------------------------------------------

def describe(df: DataFrame, col: str) -> DataFrame:
    """DescribeEvaluator: n/mean/min/max/stddev/var/sum of a column."""
    return df.agg(
        F.count(col).alias("n"),
        F.avg(col).alias("mean"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.stddev_samp(col).alias("stddev"),
        F.var_samp(col).alias("var"),
        F.sum(col).alias("sum"),
    )


def correlation(df: DataFrame, a: str, b: str) -> DataFrame:
    """CorrelationEvaluator (Pearson)."""
    return df.agg(F.corr(a, b).alias("corr"))


def covariance(df: DataFrame, a: str, b: str) -> DataFrame:
    """CovarianceEvaluator (sample)."""
    return df.agg(F.covar_samp(a, b).alias("cov"))


def percentile_eval(df: DataFrame, col: str, p: float) -> DataFrame:
    """PercentileEvaluator (exact; approx_percentile is the sketch path)."""
    return df.agg(F.expr(f"percentile({col}, {p})").alias("percentile"))


def hist(df: DataFrame, col: str, bins: int, lo: float, hi: float) -> DataFrame:
    """HistogramEvaluator: fixed-width bins over [lo, hi)."""
    w = (hi - lo) / bins
    bucket = F.floor((F.col(col) - F.lit(lo)) / F.lit(w)).cast("int")
    return (
        df.filter((F.col(col) >= lo) & (F.col(col) < hi))
        .groupBy(bucket.alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bin")
    )


def regress(df: DataFrame, x: str, y: str) -> DataFrame:
    """RegressionEvaluator: OLS slope/intercept/r."""
    return df.agg(
        F.regr_slope(y, x).alias("slope"),
        F.regr_intercept(y, x).alias("intercept"),
        F.corr(x, y).alias("r"),
    )


def ols_regress(df: DataFrame, x_cols: list, y_col: str) -> dict:
    """OLSRegressionEvaluator (io/eval/OLSRegressionEvaluator.java):
    multivariate least squares.  The reference collects a driver-side
    matrix into Commons-Math OLSMultipleLinearRegression; here the normal
    equations' moment matrix (X'X, X'y with intercept) accumulates in ONE
    distributed aggregation — p(p+3)/2 + 3 sum expressions, all map-side
    combined — and only the (p+1)x(p+1) solve runs on the driver.

    Returns {"coefficients": [intercept, b1..bp], "rsquared": float,
    "n": int}."""
    import numpy as np

    p = len(x_cols)
    cols = [F.col(c).cast("double") for c in x_cols]
    yc = F.col(y_col).cast("double")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(yc).alias("sy"),
            F.sum(yc * yc).alias("syy")]
    for i in range(p):
        aggs.append(F.sum(cols[i]).alias(f"sx{i}"))
        aggs.append(F.sum(cols[i] * yc).alias(f"sxy{i}"))
        for j in range(i, p):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"sxx{i}_{j}"))
    r = df.agg(*aggs).collect()[0]
    n = float(r["n"])
    # moment matrix with the intercept column folded in
    A = np.zeros((p + 1, p + 1))
    b = np.zeros(p + 1)
    A[0, 0] = n
    b[0] = r["sy"]
    for i in range(p):
        A[0, i + 1] = A[i + 1, 0] = r[f"sx{i}"]
        b[i + 1] = r[f"sxy{i}"]
        for j in range(i, p):
            A[i + 1, j + 1] = A[j + 1, i + 1] = r[f"sxx{i}_{j}"]
    coef = np.linalg.solve(A, b)
    # R^2 from the same moments: SSE = y'y - coef'X'y, SST = y'y - n*ybar^2
    sse = float(r["syy"] - coef @ b)
    sst = float(r["syy"] - r["sy"] * r["sy"] / n)
    return {
        "coefficients": [float(c) for c in coef],
        "rsquared": 1.0 - sse / sst if sst > 0 else float("nan"),
        "n": int(n),
    }


def ols_predict(coefficients: list, x_cols: list) -> Column:
    """PredictEvaluator for an ols_regress model — a pure column expr."""
    out = F.lit(float(coefficients[0]))
    for c, w in zip(x_cols, coefficients[1:]):
        cc = F.col(c) if isinstance(c, str) else c
        out = out + cc.cast("double") * F.lit(float(w))
    return out


# ---- normalization / transform evaluators -----------------------------------

def zscores(arr: Column) -> Column:
    """ZScoresEvaluator (NormalizeEvaluator): (x - mean) / stddev over an
    array column.  Sample stddev (n-1), matching Commons-Math
    StandardDeviation used by the reference."""
    n = F.size(arr)
    mean = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x, lambda acc: acc / n
    )
    # Two nested let_binds keep both passes O(n): mean must be a bound
    # lambda variable inside the variance fold, and (mean, sd) inside the
    # final transform — inlined they re-evaluate per element (O(n²)).
    return let_bind(
        {"m": mean},
        lambda m: let_bind(
            {
                "sd": F.sqrt(
                    F.aggregate(
                        arr,
                        F.lit(0.0),
                        lambda acc, x: acc + (x - m) * (x - m),
                        lambda acc: acc / (n - F.lit(1)),
                    )
                )
            },
            lambda sd: F.transform(arr, lambda x: (x - m) / sd),
        ),
    )


def min_max_scale(arr: Column, lo: float = 0.0, hi: float = 1.0) -> Column:
    """MinMaxScaleEvaluator: rescale array values into [lo, hi]."""
    return let_bind(
        {"mn": F.array_min(arr), "mx": F.array_max(arr)},
        lambda mn, mx: F.transform(
            arr,
            lambda x: F.when(mx - mn == 0, F.lit(lo)).otherwise(
                (x - mn) / (mx - mn) * (F.lit(hi) - F.lit(lo)) + F.lit(lo)
            ),
        ),
    )


def unitize(arr: Column) -> Column:
    """UnitEvaluator: scale an array to unit L2 norm."""
    return let_bind(
        {
            "norm": F.sqrt(
                F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
            )
        },
        lambda norm: F.transform(arr, lambda x: x / norm),
    )


def log10_arr(arr: Column) -> Column:
    """Log10Evaluator over arrays."""
    return F.transform(arr, lambda x: F.log10(x))


def recip(arr: Column) -> Column:
    """RecipEvaluator: element-wise 1/x."""
    return F.transform(arr, lambda x: F.lit(1.0) / x)


def finite_diff(arr: Column) -> Column:
    """DiffEvaluator: first finite difference (len n-1)."""
    tail = F.slice(arr, 2, F.size(arr) - 1)
    head = F.slice(arr, 1, F.size(arr) - 1)
    return F.zip_with(tail, head, lambda a, b: a - b)


def spline_interp(df: DataFrame, xs: str, ys: str, probes: str) -> DataFrame:
    """SplineEvaluator (io/eval/SplineEvaluator.java — Commons-Math
    SplineInterpolator): NATURAL cubic spline through each row's (xs, ys)
    curve, evaluated at that row's probe points.  Adds an
    ``interpolated`` array<double> column.

    Vectorized pandas UDF: one Arrow batch in, each row's tridiagonal
    system solved in numpy (Thomas algorithm, O(n) per row) — the solve is
    inherently sequential per curve, but curves are rows, so the batch
    parallelism is the row parallelism.  Natural boundary (y''=0 at the
    ends) matches Commons-Math's SplineInterpolator."""
    import pyspark.sql.types as T

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _spline(xcol: pd.Series, ycol: pd.Series, pcol: pd.Series) -> pd.Series:
        out = []
        for xv, yv, pv in zip(xcol, ycol, pcol):
            x = np.asarray(xv, dtype=np.float64)
            y = np.asarray(yv, dtype=np.float64)
            p = np.asarray(pv, dtype=np.float64)
            n = len(x)
            if n < 3:
                out.append(list(np.interp(p, x, y)))
                continue
            h = np.diff(x)
            # natural spline: solve for second derivatives m (m0=mn=0)
            a = h[:-1].copy()
            b = 2.0 * (h[:-1] + h[1:])
            c = h[1:].copy()
            d = 6.0 * (np.diff(y[1:]) / h[1:] - np.diff(y[:-1]) / h[:-1])
            # Thomas algorithm (row i's sub-diagonal is h_i = a[i]: the
            # equation at interior knot k=i+1 couples M_k to M_{k-1} via
            # h_{k-1})
            for i in range(1, len(b)):
                w = a[i] / b[i - 1]
                b[i] -= w * c[i - 1]
                d[i] -= w * d[i - 1]
            m_in = np.zeros(len(b))
            m_in[-1] = d[-1] / b[-1]
            for i in range(len(b) - 2, -1, -1):
                m_in[i] = (d[i] - c[i] * m_in[i + 1]) / b[i]
            m = np.concatenate([[0.0], m_in, [0.0]])
            i = np.clip(np.searchsorted(x, p, side="right") - 1, 0, n - 2)
            dx = p - x[i]
            hi = h[i]
            out.append(
                list(
                    y[i]
                    + dx
                    * (
                        (y[i + 1] - y[i]) / hi
                        - hi * (2.0 * m[i] + m[i + 1]) / 6.0
                    )
                    + dx * dx * m[i] / 2.0
                    + dx * dx * dx * (m[i + 1] - m[i]) / (6.0 * hi)
                )
            )
        return pd.Series(out)

    return df.withColumn(
        "interpolated", _spline(F.col(xs), F.col(ys), F.col(probes))
    )


def lerp(xs: Column, ys: Column, points: Column) -> Column:
    """LerpEvaluator: piecewise-linear interpolation of each point against
    the (xs, ys) curve (xs ascending).  All JVM higher-order functions —
    for each query point, locate the bracketing segment and interpolate."""
    def one(bxs: Column, bys: Column, p: Column) -> Column:
        # rightmost index i with xs[i] <= p (1-based via filter+size)
        n = F.size(bxs)
        idx = F.size(F.filter(bxs, lambda x: x <= p))
        i = F.greatest(F.least(idx, n - F.lit(1)), F.lit(1))
        x0, x1 = F.element_at(bxs, i), F.element_at(bxs, i + 1)
        y0, y1 = F.element_at(bys, i), F.element_at(bys, i + 1)
        return y0 + (p - x0) * (y1 - y0) / (x1 - x0)

    # Bind the curve arrays once per row (per-point lambdas re-evaluate
    # captured expressions otherwise — see let_bind).
    return let_bind(
        {"xs": xs, "ys": ys},
        lambda xs, ys: F.transform(points, lambda p: one(xs, ys, p)),
    )


def harmonic_mean(arr: Column) -> Column:
    """HarmonicMeanEvaluator."""
    return F.size(arr) / F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + F.lit(1.0) / x
    )


def geometric_mean(arr: Column) -> Column:
    """GeometricMeanEvaluator (via mean of logs, Commons-Math semantics)."""
    return F.exp(
        F.aggregate(
            arr,
            F.lit(0.0),
            lambda acc, x: acc + F.log(x),
            lambda acc: acc / F.size(arr),
        )
    )


def exp_moving_avg(arr: Column, window: int) -> Column:
    """ExponentialMovingAverageEvaluator: EMA with alpha = 2/(window+1),
    seeded with the mean of the first `window` values (the reference's
    TradingView-style seeding), emitting len(arr) - window + 1 values."""
    alpha = 2.0 / (window + 1)
    seed = F.aggregate(
        F.slice(arr, 1, window), F.lit(0.0), lambda a, x: a + x
    ) / F.lit(float(window))
    rest = F.slice(arr, window + 1, F.greatest(F.size(arr) - window, F.lit(0)))
    return F.aggregate(
        rest,
        F.array(seed),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.element_at(acc, -1) * (1.0 - alpha) + x * F.lit(alpha)
            ),
        ),
    )


def rank_transform(arr: Column) -> Column:
    """RankEvaluator: 1-based ranks of array values (average-free, ties
    broken by first occurrence like Commons-Math NaturalRanking MINIMAL)."""
    return let_bind(
        {"a": arr},
        lambda a: F.transform(
            a, lambda x: F.size(F.filter(a, lambda y: y < x)) + F.lit(1)
        ),
    )


def outliers_iqr(df: DataFrame, col: str, k: float = 1.5) -> DataFrame:
    """OutliersEvaluator-shaped helper: rows outside [Q1-k*IQR, Q3+k*IQR].
    Quartiles come from one exact-percentile agg, broadcast into the scan."""
    q = df.agg(
        F.expr(f"percentile({col}, 0.25)").alias("q1"),
        F.expr(f"percentile({col}, 0.75)").alias("q3"),
    ).collect()[0]
    lo = q["q1"] - k * (q["q3"] - q["q1"])
    hi = q["q3"] + k * (q["q3"] - q["q1"])
    return df.filter((F.col(col) < lo) | (F.col(col) > hi))


# ---- probability distributions (the io/eval distribution family:
# NormalDistributionEvaluator, UniformDistributionEvaluator,
# PoissonDistributionEvaluator, BinomialDistributionEvaluator,
# CumulativeProbabilityEvaluator, ProbabilityEvaluator, SampleEvaluator).
# A distribution is a plain dict spec {"type": ..., params}; probability /
# cumulative_probability lower to pure column expressions (JVM codegen —
# the per-row hot path never leaves Tungsten), sample to rand/randn.


def normal_dist(mean: float, sd: float) -> dict:
    return {"type": "normal", "mean": float(mean), "sd": float(sd)}


def uniform_dist(lo: float, hi: float) -> dict:
    return {"type": "uniform", "lo": float(lo), "hi": float(hi)}


def poisson_dist(lam: float) -> dict:
    return {"type": "poisson", "lam": float(lam)}


def binomial_dist(n: int, p: float) -> dict:
    return {"type": "binomial", "n": int(n), "p": float(p)}


def _erf(x: Column) -> Column:
    """erf as a column expression — Abramowitz & Stegun 7.1.26 rational
    approximation (|error| <= 1.5e-7), odd-extended.  Spark has no erf
    builtin; this keeps the normal CDF inside codegen."""
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * ax)
    poly = t * (
        F.lit(0.254829592)
        + t
        * (
            F.lit(-0.284496736)
            + t
            * (
                F.lit(1.421413741)
                + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
            )
        )
    )
    pos = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.when(x < 0, -pos).otherwise(pos)


def _seq1(k: Column) -> Column:
    """[1..k] as an int array, EMPTY when k < 1.  Spark's sequence(1, k)
    is descending for k < 1 (sequence(1, 0) = [1, 0]) and the folds below
    divide by the element, so the guard must live in the array itself —
    an outer CASE does not reliably shield the fold from evaluation."""
    kk = k.cast("int")
    return F.when(kk >= 1, F.sequence(F.lit(1), kk)).otherwise(
        F.array().cast("array<int>")
    )


def _poisson_cdf_term_sum(k: Column, lam: float) -> Column:
    """sum_{i=0..k} lam^i / i! via a running-product fold over [1..k]
    (no factorial overflow, no Python)."""
    acc0 = F.struct(F.lit(1.0).alias("s"), F.lit(1.0).alias("term"))
    folded = F.aggregate(
        _seq1(k),
        acc0,
        lambda acc, i: F.struct(
            (acc["s"] + acc["term"] * F.lit(lam) / i).alias("s"),
            (acc["term"] * F.lit(lam) / i).alias("term"),
        ),
    )
    return F.when(k < 0, F.lit(0.0)).otherwise(folded["s"])


def _log_comb(n: int, k: Column) -> Column:
    """ln C(n, k) = sum_{i=1..k} ln((n-k+i)/i) — fold, exact enough in
    double for the n this evaluator family sees."""
    return F.aggregate(
        _seq1(k),
        F.lit(0.0),
        lambda acc, i: acc
        + F.log((F.lit(float(n)) - k.cast("double") + i) / i),
    )


def probability(dist: dict, x: Column) -> Column:
    """ProbabilityEvaluator: pmf for discrete / pdf for continuous."""
    t = dist["type"]
    xd = x.cast("double")
    if t == "normal":
        m, s = dist["mean"], dist["sd"]
        z = (xd - m) / s
        return F.exp(z * z * F.lit(-0.5)) / F.lit(
            s * math.sqrt(2.0 * math.pi)
        )
    if t == "uniform":
        lo, hi = dist["lo"], dist["hi"]
        return F.when(
            (xd >= lo) & (xd <= hi), F.lit(1.0 / (hi - lo))
        ).otherwise(F.lit(0.0))
    if t == "poisson":
        lam = dist["lam"]
        k = x.cast("int")
        # lam^k/k! = exp(k ln lam - sum ln i), folded to dodge overflow
        log_pk = k.cast("double") * F.lit(math.log(lam)) - F.aggregate(
            _seq1(k),
            F.lit(0.0),
            lambda acc, i: acc + F.log(i.cast("double")),
        )
        return F.when(k < 0, F.lit(0.0)).otherwise(
            F.exp(log_pk - F.lit(lam))
        )
    if t == "binomial":
        n, p = dist["n"], dist["p"]
        k = x.cast("int")
        logp = (
            _log_comb(n, k)
            + k.cast("double") * F.lit(math.log(p))
            + (F.lit(float(n)) - k.cast("double")) * F.lit(math.log1p(-p))
        )
        return F.when((k < 0) | (k > n), F.lit(0.0)).otherwise(F.exp(logp))
    return _probability_ext(dist, x)


def cumulative_probability(dist: dict, x: Column) -> Column:
    """CumulativeProbabilityEvaluator: P(X <= x)."""
    t = dist["type"]
    xd = x.cast("double")
    if t == "normal":
        m, s = dist["mean"], dist["sd"]
        return F.lit(0.5) * (
            F.lit(1.0) + _erf((xd - m) / F.lit(s * math.sqrt(2.0)))
        )
    if t == "uniform":
        lo, hi = dist["lo"], dist["hi"]
        return F.least(
            F.greatest((xd - lo) / F.lit(hi - lo), F.lit(0.0)), F.lit(1.0)
        )
    if t == "poisson":
        lam = dist["lam"]
        return F.least(
            F.exp(F.lit(-lam)) * _poisson_cdf_term_sum(x.cast("int"), lam),
            F.lit(1.0),
        )
    if t == "binomial":
        n, p = dist["n"], dist["p"]
        k = x.cast("int")
        # sum_{i=0..k} C(n,i) p^i q^(n-i): fold the pmf recurrence
        # pmf(i+1) = pmf(i) * (n-i)/(i+1) * p/q
        q0 = math.pow(1.0 - p, n)
        ratio = p / (1.0 - p)
        acc0 = F.struct(F.lit(q0).alias("s"), F.lit(q0).alias("term"))
        folded = F.aggregate(
            _seq1(F.least(k, F.lit(n))),
            acc0,
            lambda acc, i: F.struct(
                (
                    acc["s"]
                    + acc["term"]
                    * (F.lit(float(n)) - i.cast("double") + 1)
                    / i.cast("double")
                    * F.lit(ratio)
                ).alias("s"),
                (
                    acc["term"]
                    * (F.lit(float(n)) - i.cast("double") + 1)
                    / i.cast("double")
                    * F.lit(ratio)
                ).alias("term"),
            ),
        )
        out = F.when(k < 0, F.lit(0.0)).otherwise(
            F.least(folded["s"], F.lit(1.0))
        )
        return F.when(k >= n, F.lit(1.0)).otherwise(out)
    return _cumulative_ext(dist, x)


def sample_dist(
    spark, dist: dict, n: int, seed: int, col: str = "value"
) -> DataFrame:
    """SampleEvaluator for the continuous distributions: n draws as a
    DataFrame column, deterministic under a fixed seed, generated
    distributed (spark.range -> rand/randn; no driver-side arrays)."""
    base = spark.range(n)
    t = dist["type"]
    if t == "normal":
        c = F.randn(seed) * dist["sd"] + dist["mean"]
    elif t == "uniform":
        c = F.rand(seed) * (dist["hi"] - dist["lo"]) + dist["lo"]
    elif t in ("poisson", "binomial"):
        base = base.select(F.rand(seed).alias("_u"))
        c = _poisson_binomial_inv_cdf(dist, "_u")
    else:
        ext = _sample_ext(base, dist, seed)
        if ext is None:
            raise NotImplementedError(f"sample for {t!r} not modeled")
        if isinstance(ext, tuple):  # discrete inverse-CDF: materialize u
            base = base.select(F.rand(seed).alias("_u"))
            c = ext[1]
        else:
            c = ext
    return base.select(c.alias(col))


def _poisson_binomial_inv_cdf(dist: dict, u_name: str) -> Column:
    """Discrete inverse-CDF draw k = #{j : CDF(j-1) <= u} as a bounded
    fold over the support (Poisson truncated at lam + 12*sqrt(lam) + 16 —
    beyond any double-precision mass).  ``u_name`` MUST be a materialized
    uniform column: rand() is non-deterministic, so referencing it inside
    the fold lambda would re-draw a fresh u at every step (measured: the
    sample's variance collapses while its mean stays correct)."""
    t = dist["type"]
    u = F.col(u_name)
    if t == "poisson":
        lam = dist["lam"]
        kmax = int(lam + 12.0 * math.sqrt(lam) + 16)
        # pmf(0) = e^-lam; pmf(j) = pmf(j-1) * lam / j
        acc0 = F.struct(
            F.lit(0).alias("k"),
            F.lit(math.exp(-lam)).alias("cum"),
            F.lit(math.exp(-lam)).alias("pmf"),
        )
        step = lambda acc, j: F.struct(  # noqa: E731
            F.when(u > acc["cum"], acc["k"] + 1)
            .otherwise(acc["k"])
            .alias("k"),
            (acc["cum"] + acc["pmf"] * F.lit(lam) / j).alias("cum"),
            (acc["pmf"] * F.lit(lam) / j).alias("pmf"),
        )
    else:
        nn, p = dist["n"], dist["p"]
        kmax = int(nn)
        q0 = math.pow(1.0 - p, nn)
        ratio = p / (1.0 - p)
        acc0 = F.struct(
            F.lit(0).alias("k"),
            F.lit(q0).alias("cum"),
            F.lit(q0).alias("pmf"),
        )
        # pmf(j) = pmf(j-1) * (n-j+1)/j * p/q
        step = lambda acc, j: F.struct(  # noqa: E731
            F.when(u > acc["cum"], acc["k"] + 1)
            .otherwise(acc["k"])
            .alias("k"),
            (
                acc["cum"]
                + acc["pmf"]
                * (F.lit(float(nn)) - j.cast("double") + 1)
                / j.cast("double")
                * F.lit(ratio)
            ).alias("cum"),
            (
                acc["pmf"]
                * (F.lit(float(nn)) - j.cast("double") + 1)
                / j.cast("double")
                * F.lit(ratio)
            ).alias("pmf"),
        )
    folded = F.aggregate(_seq1(F.lit(kmax)), acc0, step)
    return folded["k"].cast("long")


def empirical_cdf(df: DataFrame, col: str, values: list[float]) -> DataFrame:
    """EmpiricalDistributionEvaluator + cumulativeProbability: for each
    probe value, the fraction of observations <= it — ONE conditional-agg
    pass over the scan regardless of how many probes."""
    aggs = [
        (
            F.sum((F.col(col) <= F.lit(float(v))).cast("long"))
            / F.count(F.lit(1))
        ).alias(f"p_{i}")
        for i, v in enumerate(values)
    ]
    row = df.agg(*aggs)
    picks = [
        F.struct(
            F.lit(float(v)).alias("value"), F.col(f"p_{i}").alias("cdf")
        )
        for i, v in enumerate(values)
    ]
    return row.select(F.explode(F.array(*picks)).alias("s")).select(
        "s.value", "s.cdf"
    )


# ---------------------------------------------------------------------------
# distribution long tail (io/eval *DistributionEvaluator.java) — parameter
# orders match the reference constructors exactly:
#   weibullDistribution(shape, scale)        WeibullDistributionEvaluator:55
#   logNormalDistribution(scale, shape)      LogNormalDistributionEvaluator:55
#     (Commons-Math: scale = mean of ln X, shape = sd of ln X)
#   triangularDistribution(low, mode, high)  TriangularDistributionEvaluator:46
#   geometricDistribution(p)                 GeometricDistributionEvaluator:47
#     (support k = 0, 1, ... — failures before first success)
#   uniformIntegerDistribution(lo, hi)       UniformIntegerDistributionEvaluator:55
#   zipFDistribution(size, exponent)         ZipFDistributionEvaluator:54
#   gammaDistribution(shape, scale)          GammaDistributionEvaluator:55
#   betaDistribution(shape1, shape2)         BetaDistributionEvaluator:54
#   enumeratedDistribution(values[, probs])  EnumeratedDistributionEvaluator:51,62
# pdf/pmf and the closed-form CDFs stay pure column expressions; the
# gamma/beta CDFs go through a VECTORIZED numpy incomplete-gamma/-beta
# (fixed-iteration series / Lentz continued fraction over the whole Arrow
# batch — no per-element Python loop).
# ---------------------------------------------------------------------------

def weibull_dist(shape: float, scale: float) -> dict:
    return {"type": "weibull", "k": float(shape), "lam": float(scale)}


def lognormal_dist(scale: float, shape: float) -> dict:
    return {"type": "lognormal", "mu": float(scale), "sigma": float(shape)}


def triangular_dist(low: float, mode: float, high: float) -> dict:
    return {"type": "triangular", "a": float(low), "c": float(mode), "b": float(high)}


def geometric_dist(p: float) -> dict:
    return {"type": "geometric", "p": float(p)}


def uniform_integer_dist(lo: int, hi: int) -> dict:
    return {"type": "uniform_int", "lo": int(lo), "hi": int(hi)}


def zipf_dist(size: int, exponent: float) -> dict:
    h = sum(1.0 / (i ** exponent) for i in range(1, int(size) + 1))
    return {"type": "zipf", "n": int(size), "s": float(exponent), "h": h}


def gamma_dist(shape: float, scale: float) -> dict:
    return {"type": "gamma", "k": float(shape), "theta": float(scale)}


def beta_dist(shape1: float, shape2: float) -> dict:
    return {"type": "beta", "a": float(shape1), "b": float(shape2)}


def enumerated_dist(values: list, probs: list | None = None) -> dict:
    """EnumeratedIntegerDistribution: from observed samples (uniform over
    occurrences) or explicit (value, prob) pairs; pmf aggregated and
    normalized here, driver-side over the tiny support list."""
    if probs is None:
        from collections import Counter

        cnt = Counter(int(v) for v in values)
        tot = sum(cnt.values())
        support = sorted(cnt)
        pmf = [cnt[v] / tot for v in support]
    else:
        tot = float(sum(probs))
        pairs = sorted(zip((int(v) for v in values), probs))
        support = [v for v, _ in pairs]
        pmf = [p / tot for _, p in pairs]
    cdf = []
    acc = 0.0
    for p in pmf:
        acc += p
        cdf.append(acc)
    return {"type": "enumerated", "support": support, "pmf": pmf, "cdf": cdf}


def _gammainc_lower_np(s: float, x):
    """Regularized lower incomplete gamma P(s, x), vectorized over a numpy
    array.  Split like the scalar textbook form: the power series ONLY for
    x < s+1 (there its terms decrease monotonically — no overflow at any
    x) and a fixed-budget vectorized Lentz continued fraction for Q(s, x)
    on x >= s+1 (the raw series overflows double near x ~ 740)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    lo = (x > 0) & (x < s + 1.0)
    hi = x >= s + 1.0

    xp = x[lo]
    if xp.size:
        term = np.full_like(xp, 1.0 / s)
        total = term.copy()
        ap = s
        for _ in range(500):
            ap += 1.0
            term = term * xp / ap
            total += term
            if term.max() < 1e-17 * total.min():
                break
        out[lo] = total * np.exp(-xp + s * np.log(xp) - math.lgamma(s))

    xq = x[hi]
    if xq.size:
        FPMIN = 1e-300
        b = xq + 1.0 - s
        c = np.full_like(xq, 1.0 / FPMIN)
        d = 1.0 / b
        h = d.copy()
        for i in range(1, 300):
            an = -i * (i - s)
            b = b + 2.0
            d = an * d + b
            d = np.where(np.abs(d) < FPMIN, FPMIN, d)
            c = b + an / c
            c = np.where(np.abs(c) < FPMIN, FPMIN, c)
            d = 1.0 / d
            h *= d * c
        q = h * np.exp(-xq + s * np.log(xq) - math.lgamma(s))
        out[hi] = 1.0 - q
    return np.clip(out, 0.0, 1.0)


def _betainc_np(a: float, b: float, x):
    """Regularized incomplete beta I_x(a, b), vectorized: Lentz continued
    fraction with a fixed 300-step budget, using the standard symmetry
    split (np.where per element, array ops throughout)."""
    import numpy as np

    x = np.clip(np.asarray(x, dtype=np.float64), 0.0, 1.0)

    def cf(aa, bb, xx):
        FPMIN = 1e-300
        qab, qap, qam = aa + bb, aa + 1.0, aa - 1.0
        c = np.ones_like(xx)
        d = 1.0 - qab * xx / qap
        d = np.where(np.abs(d) < FPMIN, FPMIN, d)
        d = 1.0 / d
        h = d.copy()
        for m in range(1, 300):
            m2 = 2 * m
            aa1 = m * (bb - m) * xx / ((qam + m2) * (aa + m2))
            d = 1.0 + aa1 * d
            d = np.where(np.abs(d) < FPMIN, FPMIN, d)
            c = 1.0 + aa1 / c
            c = np.where(np.abs(c) < FPMIN, FPMIN, c)
            d = 1.0 / d
            h *= d * c
            aa2 = -(aa + m) * (qab + m) * xx / ((aa + m2) * (qap + m2))
            d = 1.0 + aa2 * d
            d = np.where(np.abs(d) < FPMIN, FPMIN, d)
            c = 1.0 + aa2 / c
            c = np.where(np.abs(c) < FPMIN, FPMIN, c)
            d = 1.0 / d
            h *= d * c
        return h

    with np.errstate(divide="ignore", invalid="ignore"):
        ln_bt = (
            math.lgamma(a + b)
            - math.lgamma(a)
            - math.lgamma(b)
            + a * np.log(x)
            + b * np.log1p(-x)
        )
        bt = np.where((x > 0) & (x < 1), np.exp(ln_bt), 0.0)
        direct = bt * cf(a, b, np.clip(x, 1e-300, 1.0)) / a
        flipped = 1.0 - bt * cf(b, a, np.clip(1.0 - x, 1e-300, 1.0)) / b
    use_direct = x < (a + 1.0) / (a + b + 2.0)
    out = np.where(use_direct, direct, flipped)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x >= 1.0, 1.0, out)
    return np.clip(out, 0.0, 1.0)


def _probability_ext(dist: dict, x: Column) -> Column:
    t = dist["type"]
    xd = x.cast("double")
    if t == "weibull":
        k, lam = dist["k"], dist["lam"]
        z = xd / F.lit(lam)
        pdf = (
            F.lit(k / lam)
            * F.pow(z, F.lit(k - 1.0))
            * F.exp(-F.pow(z, F.lit(k)))
        )
        return F.when(xd < 0, F.lit(0.0)).otherwise(pdf)
    if t == "lognormal":
        mu, sg = dist["mu"], dist["sigma"]
        z = (F.log(xd) - mu) / sg
        pdf = F.exp(z * z * F.lit(-0.5)) / (
            xd * F.lit(sg * math.sqrt(2.0 * math.pi))
        )
        return F.when(xd <= 0, F.lit(0.0)).otherwise(pdf)
    if t == "triangular":
        a, c, b = dist["a"], dist["c"], dist["b"]
        up = F.lit(2.0) * (xd - a) / F.lit((b - a) * (c - a))
        down = F.lit(2.0) * (F.lit(b) - xd) / F.lit((b - a) * (b - c))
        return (
            F.when((xd < a) | (xd > b), F.lit(0.0))
            .when(xd <= c, up)
            .otherwise(down)
        )
    if t == "geometric":
        p = dist["p"]
        k = x.cast("int")
        pmf = F.lit(p) * F.pow(F.lit(1.0 - p), k.cast("double"))
        return F.when(k < 0, F.lit(0.0)).otherwise(pmf)
    if t == "uniform_int":
        lo, hi = dist["lo"], dist["hi"]
        k = x.cast("int")
        return F.when(
            (k >= lo) & (k <= hi), F.lit(1.0 / (hi - lo + 1))
        ).otherwise(F.lit(0.0))
    if t == "zipf":
        n, s, h = dist["n"], dist["s"], dist["h"]
        k = x.cast("int")
        return F.when(
            (k >= 1) & (k <= n),
            F.lit(1.0 / h) / F.pow(k.cast("double"), F.lit(s)),
        ).otherwise(F.lit(0.0))
    if t == "gamma":
        k, th = dist["k"], dist["theta"]
        ln_pdf = (
            F.lit(k - 1.0) * F.log(xd)
            - xd / F.lit(th)
            - F.lit(math.lgamma(k) + k * math.log(th))
        )
        return F.when(xd <= 0, F.lit(0.0)).otherwise(F.exp(ln_pdf))
    if t == "beta":
        a, b = dist["a"], dist["b"]
        ln_b = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
        ln_pdf = (
            F.lit(a - 1.0) * F.log(xd)
            + F.lit(b - 1.0) * F.log(F.lit(1.0) - xd)
            - F.lit(ln_b)
        )
        return F.when((xd <= 0) | (xd >= 1), F.lit(0.0)).otherwise(
            F.exp(ln_pdf)
        )
    if t == "enumerated":
        expr = F.lit(0.0)
        k = x.cast("int")
        for v, p in zip(dist["support"], dist["pmf"]):
            expr = F.when(k == v, F.lit(p)).otherwise(expr)
        return expr
    raise ValueError(f"unknown distribution {t!r}")


def _cumulative_ext(dist: dict, x: Column) -> Column:
    t = dist["type"]
    xd = x.cast("double")
    if t == "weibull":
        k, lam = dist["k"], dist["lam"]
        cdf = F.lit(1.0) - F.exp(-F.pow(xd / F.lit(lam), F.lit(k)))
        return F.when(xd < 0, F.lit(0.0)).otherwise(cdf)
    if t == "lognormal":
        mu, sg = dist["mu"], dist["sigma"]
        cdf = F.lit(0.5) * (
            F.lit(1.0) + _erf((F.log(xd) - mu) / F.lit(sg * math.sqrt(2.0)))
        )
        return F.when(xd <= 0, F.lit(0.0)).otherwise(cdf)
    if t == "triangular":
        a, c, b = dist["a"], dist["c"], dist["b"]
        up = (xd - a) * (xd - a) / F.lit((b - a) * (c - a))
        down = F.lit(1.0) - (F.lit(b) - xd) * (F.lit(b) - xd) / F.lit(
            (b - a) * (b - c)
        )
        return (
            F.when(xd < a, F.lit(0.0))
            .when(xd > b, F.lit(1.0))
            .when(xd <= c, up)
            .otherwise(down)
        )
    if t == "geometric":
        p = dist["p"]
        k = x.cast("int")
        cdf = F.lit(1.0) - F.pow(
            F.lit(1.0 - p), k.cast("double") + F.lit(1.0)
        )
        return F.when(k < 0, F.lit(0.0)).otherwise(cdf)
    if t == "uniform_int":
        lo, hi = dist["lo"], dist["hi"]
        k = x.cast("int")
        return (
            F.when(k < lo, F.lit(0.0))
            .when(k >= hi, F.lit(1.0))
            .otherwise(
                (k.cast("double") - lo + 1) / F.lit(float(hi - lo + 1))
            )
        )
    if t == "zipf":
        n, s, h = dist["n"], dist["s"], dist["h"]
        k = x.cast("int")
        partial = F.aggregate(
            _seq1(F.least(k, F.lit(n))),
            F.lit(0.0),
            lambda acc, i: acc
            + F.lit(1.0) / F.pow(i.cast("double"), F.lit(s)),
        )
        return (
            F.when(k < 1, F.lit(0.0))
            .when(k >= n, F.lit(1.0))
            .otherwise(partial / F.lit(h))
        )
    if t == "gamma":
        kk, th = dist["k"], dist["theta"]

        @F.pandas_udf("double")
        def _g(col: pd.Series) -> pd.Series:
            return pd.Series(
                _gammainc_lower_np(kk, col.to_numpy(dtype=np.float64) / th)
            )

        return _g(xd)
    if t == "beta":
        a, b = dist["a"], dist["b"]

        @F.pandas_udf("double")
        def _b(col: pd.Series) -> pd.Series:
            return pd.Series(
                _betainc_np(a, b, col.to_numpy(dtype=np.float64))
            )

        return _b(xd)
    if t == "enumerated":
        expr = F.lit(1.0)
        k = x.cast("int")
        for v, c in zip(
            reversed(dist["support"]), reversed([0.0] + dist["cdf"][:-1])
        ):
            expr = F.when(k < v, F.lit(c)).otherwise(expr)
        return expr
    raise ValueError(f"unknown distribution {t!r}")


def _sample_ext(base: DataFrame, dist: dict, seed: int, u_name: str = "_u"):
    t = dist["type"]
    u = F.rand(seed)
    if t == "weibull":
        k, lam = dist["k"], dist["lam"]
        return F.lit(lam) * F.pow(
            -F.log(F.lit(1.0) - u), F.lit(1.0 / k)
        )
    if t == "lognormal":
        return F.exp(F.randn(seed) * dist["sigma"] + dist["mu"])
    if t == "triangular":
        # u is referenced three times (condition + both branches): it MUST
        # be a materialized column, not F.rand itself — rand() is
        # non-deterministic and every reference would draw a fresh value
        a, c, b = dist["a"], dist["c"], dist["b"]
        fc = (c - a) / (b - a)
        uc = F.col(u_name)
        lo_branch = F.lit(a) + F.sqrt(uc * F.lit((b - a) * (c - a)))
        hi_branch = F.lit(b) - F.sqrt(
            (F.lit(1.0) - uc) * F.lit((b - a) * (b - c))
        )
        return ("needs_u", F.when(uc < fc, lo_branch).otherwise(hi_branch))
    if t == "geometric":
        p = dist["p"]
        return F.floor(
            F.log(F.lit(1.0) - u) / F.lit(math.log(1.0 - p))
        ).cast("long")
    if t == "uniform_int":
        lo, hi = dist["lo"], dist["hi"]
        return (F.floor(u * F.lit(float(hi - lo + 1))) + lo).cast("long")
    if t in ("gamma", "beta"):
        # continuous inverse-CDF draw: u -> F^{-1}(u) by vectorized
        # bisection against the same regularized incomplete-gamma/-beta
        # kernels the CDF evaluators use (GammaDistributionEvaluator:55 /
        # BetaDistributionEvaluator:54 sample via commons-math, which also
        # inverse-CDF samples its AbstractRealDistribution).  60 bisection
        # steps on a numpy batch = ~1e-18 of the bracket, far below the
        # sampling noise any consumer can observe.
        if t == "gamma":
            kk, th = dist["k"], dist["theta"]
            _cdf_np = lambda xs: _gammainc_lower_np(kk, xs / th)  # noqa: E731
            hi0 = th * (kk + 20.0 * math.sqrt(kk + 1.0) + 50.0)
        else:
            a, b = dist["a"], dist["b"]
            _cdf_np = lambda xs: _betainc_np(a, b, xs)  # noqa: E731
            hi0 = 1.0

        @F.pandas_udf("double")
        def _inv_cdf(u_ser: pd.Series) -> pd.Series:
            uu = u_ser.to_numpy(dtype=np.float64)
            lo = np.zeros_like(uu)
            hi = np.full_like(uu, hi0)
            if t == "gamma":  # expand the bracket for extreme-tail draws
                for _ in range(30):
                    short = _cdf_np(hi) < uu
                    if not short.any():
                        break
                    hi = np.where(short, hi * 2.0, hi)
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                below = _cdf_np(mid) < uu
                lo = np.where(below, mid, lo)
                hi = np.where(below, hi, mid)
            return pd.Series(0.5 * (lo + hi))

        return ("needs_u", _inv_cdf(F.col(u_name)))
    if t in ("zipf", "enumerated"):
        # discrete inverse-CDF fold over the bounded support, same pattern
        # (and the same rand-materialization requirement) as poisson above
        if t == "zipf":
            n, s, h = dist["n"], dist["s"], dist["h"]
            support = list(range(1, n + 1))
            cdf = []
            acc = 0.0
            for i in support:
                acc += (1.0 / (i**s)) / h
                cdf.append(acc)
        else:
            support = dist["support"]
            cdf = dist["cdf"]
        uc = F.col(u_name)
        expr = F.lit(support[-1]).cast("long")
        for v, c in zip(reversed(support[:-1]), reversed(cdf[:-1])):
            expr = F.when(uc <= c, F.lit(v).cast("long")).otherwise(expr)
        return ("needs_u", expr)
    return None


def moving_median(arr: Column, window: int) -> Column:
    """MovingMedianEvaluator: trailing median per full window — pure column
    expression (sort the slice, average the middle one or two).  Arrays
    shorter than the window yield an empty array (_seq1 guards the
    descending-sequence trap)."""
    n = F.size(arr)
    idx = _seq1(n - F.lit(window - 1))
    mid = window // 2
    if window % 2 == 1:
        pick = lambda s: F.element_at(s, mid + 1)  # noqa: E731
    else:
        pick = lambda s: (  # noqa: E731
            F.element_at(s, mid) + F.element_at(s, mid + 1)
        ) / F.lit(2.0)
    return F.transform(
        idx, lambda i: pick(F.array_sort(F.slice(arr, i, window)))
    )


def moving_mad(arr: Column, window: int) -> Column:
    """MovingMADEvaluator: trailing MEAN absolute deviation around the
    window mean (MovingMADEvaluator.java:75-78 — 'MAD' in the reference is
    mean, not median, absolute deviation)."""
    n = F.size(arr)
    idx = _seq1(n - F.lit(window - 1))

    def one(i):
        s = F.slice(arr, i, window)
        mean = (
            F.aggregate(s, F.lit(0.0), lambda acc, v: acc + v)
            / F.lit(float(window))
        )
        return F.aggregate(
            s, F.lit(0.0), lambda acc, v: acc + F.abs(v - mean)
        ) / F.lit(float(window))

    return F.transform(idx, one)


def mode_arr(arr: Column) -> Column:
    """ModeEvaluator (StatUtils.mode): ALL most-frequent values of the
    array, ascending — higher-order functions only."""
    distinct = F.array_distinct(arr)
    counts = F.transform(
        distinct, lambda v: F.size(F.filter(arr, lambda x: x == v))
    )
    top = F.array_max(counts)
    return F.array_sort(
        F.filter(
            distinct,
            lambda v: F.size(F.filter(arr, lambda x: x == v)) == top,
        )
    )


def frequency_table(df: DataFrame, col: str) -> DataFrame:
    """FrequencyTableEvaluator: one row per distinct value with count, pct,
    cumFreq, cumPct (FrequencyTableEvaluator.java:81-86) — a groupBy plus
    one cumulative window over the (tiny) distinct-value result."""
    from pyspark.sql import Window

    total = df.count()
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("pct", F.col("count") / F.lit(float(total)))
        .withColumn("cumFreq", F.sum("count").over(w))
        .withColumn("cumPct", F.col("cumFreq") / F.lit(float(total)))
        .orderBy(col)
    )


def markov_chain_sample(
    spark,
    transition: list[list[float]],
    steps: int,
    n_chains: int,
    seed: int = 42,
    state0: int | None = None,
) -> DataFrame:
    """MarkovChainEvaluator (io/eval/MarkovChainEvaluator.java:59-90 —
    square transition matrix, optional start state, sample() walks the
    chain through per-row EnumeratedIntegerDistributions).

    Distributed analog: ``n_chains`` independent walks of ``steps``
    transitions, one row per chain, as pure column expressions.  The
    per-step uniform is a HASH-based PRNG — u(chain, t) =
    xxhash64(chain_id, seed, t) mapped to [0, 1) — so every chain is
    deterministic under its seed, reproducible across partitionings, and
    needs no materialized rand columns.  Each transition is the inverse
    CDF of the current state's row, expanded to a k x k when-chain (k is
    the evaluator-sized state count; the fold over steps keeps the whole
    walk in one codegen'd expression).

    Returns (chain_id long, states array<int>) — states[0] is the start
    state, followed by ``steps`` sampled transitions.  When ``state0`` is
    None each chain starts at u-sampled uniform state (the reference
    seeds from Random().nextInt — ours is deterministic, documented)."""
    k = len(transition)
    for row in transition:
        if len(row) != k:
            raise ValueError("markovChain needs a square matrix")
        if abs(sum(row) - 1.0) > 1e-9:
            raise ValueError("each transition row must sum to 1")
    cdfs = []
    for row in transition:
        acc, cdf = 0.0, []
        for p in row:
            acc += p
            cdf.append(acc)
        cdfs.append(cdf)

    def uniform(t: Column) -> Column:
        h = F.xxhash64(F.col("chain_id"), F.lit(int(seed)), t)
        return (F.pmod(h, F.lit(1 << 40))).cast("double") / F.lit(
            float(1 << 40)
        )

    def next_state(cur: Column, u: Column) -> Column:
        # state-dependent inverse CDF: outer when over current state,
        # inner when-chain over that row's cumulative probabilities
        expr = F.lit(0)
        for s in range(k - 1, -1, -1):
            inner = F.lit(k - 1)
            for j in range(k - 2, -1, -1):
                inner = F.when(u < cdfs[s][j], F.lit(j)).otherwise(inner)
            expr = F.when(cur == s, inner).otherwise(expr)
        return expr

    base = spark.range(n_chains).select(F.col("id").alias("chain_id"))
    if state0 is None:
        start = F.floor(uniform(F.lit(0)) * k).cast("int")
    else:
        if not 0 <= int(state0) < k:
            raise ValueError(f"state0 must be in [0, {k})")
        start = F.lit(int(state0))
    walk = F.aggregate(
        _seq1(F.lit(int(steps))),  # steps=0 -> just the start state
        F.array(start),
        lambda acc, t: F.concat(
            acc,
            F.array(
                next_state(
                    F.element_at(acc, F.lit(-1)), uniform(t.cast("long"))
                )
            ),
        ),
    )
    return base.select("chain_id", walk.alias("states"))


def monte_carlo(
    spark,
    n: int,
    bindings: dict,
    expr_fn,
    seed: int = 42,
) -> DataFrame:
    """MonteCarloEvaluator (io/eval/MonteCarloEvaluator.java): evaluate an
    expression ``n`` times with named variables drawn fresh from their
    distributions each iteration — the reference loops driver-side; here
    every iteration is a row.

    ``bindings`` maps variable name -> a distribution dict from this
    module's constructors; ``expr_fn`` receives a DataFrame with one
    column per variable (plus ``iteration``) and must return a Column.
    Each binding gets an INDEPENDENT deterministic stream
    (seed offset by position; every multi-reference draw is materialized
    per-variable before use).  Returns (iteration long, result double)."""
    base = spark.range(int(n)).select(F.col("id").alias("iteration"))
    u_cols = {}
    # materialize one uniform per binding first (single select keeps every
    # rand() evaluated exactly once per row)
    rand_cols = []
    for i, name in enumerate(bindings):
        u_cols[name] = f"_u_{name}"
        rand_cols.append(F.rand(seed + 1000 * (i + 1)).alias(u_cols[name]))
    df = base.select("iteration", *rand_cols)

    value_cols = []
    for i, (name, dist) in enumerate(bindings.items()):
        s = seed + 1000 * (i + 1)
        t = dist["type"]
        if t == "normal":
            c = F.randn(s) * dist["sd"] + dist["mean"]
        elif t == "uniform":
            c = F.col(u_cols[name]) * (dist["hi"] - dist["lo"]) + dist["lo"]
        elif t in ("poisson", "binomial"):
            c = _poisson_binomial_inv_cdf(dist, u_cols[name])
        else:
            ext = _sample_ext(df, dist, s, u_name=u_cols[name])
            if ext is None:
                raise NotImplementedError(
                    f"monte_carlo cannot sample {t!r} (use the CDF evaluators)"
                )
            c = ext[1] if isinstance(ext, tuple) else ext
        value_cols.append(c.alias(name))
    df = df.select("iteration", *value_cols)
    return df.select(
        "iteration", expr_fn(df).cast("double").alias("result")
    )


# ---- vector / scalar long-tail evaluators (round 3 batch 2) ----------------
# io/eval: L1Norm-, LInfNorm-, CosineDistance-, Canberra-, EarthMovers-,
# MeanDifference-, SumDifference-, SumSq-, TimeDifferencing-, PairSort-,
# Repeat-, IndexOf-, Primes-, BinomialCoefficientEvaluator.java — all lowered
# to JVM column expressions (higher-order functions), zero Python per row.


def l1_norm(arr: Column) -> Column:
    """L1NormEvaluator: sum of absolute values."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + F.abs(v))


def linf_norm(arr: Column) -> Column:
    """LInfNormEvaluator: max absolute value."""
    return F.array_max(F.transform(arr, lambda v: F.abs(v)))


def cosine_distance(a: Column, b: Column) -> Column:
    """CosineDistanceEvaluator: 1 - cosine similarity."""
    return F.lit(1.0) - cosine_similarity(a, b)


def canberra_distance(a: Column, b: Column) -> Column:
    """CanberraEvaluator (Commons Math CanberraDistance): sum of
    |x-y| / (|x|+|y|) with the 0/0 term defined as 0."""
    term = F.zip_with(
        a,
        b,
        lambda x, y: F.when(
            F.abs(x - y) == 0.0, F.lit(0.0)
        ).otherwise(F.abs(x - y) / (F.abs(x) + F.abs(y))),
    )
    return F.aggregate(term, F.lit(0.0), lambda acc, v: acc + v)


def earth_movers_distance(a: Column, b: Column) -> Column:
    """EarthMoversEvaluator (Commons Math EarthMoversDistance): running
    flow ``f_i = a_i + f_{i-1} - b_i``; the distance is sum of |f_i|.
    Struct accumulator keeps (flow, total) through one JVM fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x - y),
        F.struct(F.lit(0.0).alias("flow"), F.lit(0.0).alias("total")),
        lambda acc, d: F.struct(
            (acc["flow"] + d).alias("flow"),
            (acc["total"] + F.abs(acc["flow"] + d)).alias("total"),
        ),
        lambda acc: acc["total"],
    )


def mean_difference(a: Column, b: Column) -> Column:
    """MeanDifferenceEvaluator (StatUtils.meanDifference): mean of a_i-b_i."""
    return sum_difference(a, b) / F.size(a)


def sum_difference(a: Column, b: Column) -> Column:
    """SumDifferenceEvaluator: sum of element-wise differences."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x - y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sum_sq(arr: Column) -> Column:
    """SumSqEvaluator (StatUtils.sumSq): sum of squares."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v * v)


def time_differencing(arr: Column, lag: int = 1) -> Column:
    """TimeDifferencingEvaluator.java:90-96: ``out_n = x[n] - x[n-lag]``
    for n in [lag, size), result length size-lag."""
    idx = F.sequence(F.lit(lag + 1), F.size(arr))  # 1-based positions
    return F.transform(
        idx, lambda i: F.element_at(arr, i) - F.element_at(arr, i - lag)
    )


def pair_sort(a: Column, b: Column) -> Column:
    """PairSortEvaluator: sort (a_i, b_i) pairs by a ascending (stable,
    like the reference's List.sort) and return the 2-row matrix
    [sorted_a, sorted_b] as array<array<double>>."""
    paired = F.array_sort(
        F.zip_with(
            a,
            F.sequence(F.lit(1), F.size(a)),
            lambda x, i: F.struct(
                x.alias("k"), F.element_at(b, i).alias("v"), i.alias("i")
            ),
        )
    )  # struct ordering (k, v, i) — the trailing index keeps ties stable
    return F.array(
        F.transform(paired, lambda s: s["k"]),
        F.transform(paired, lambda s: s["v"]),
    )


def repeat_value(value: Column | float, size: int) -> Column:
    """RepeatEvaluator: array of ``size`` copies of ``value``."""
    v = value if isinstance(value, Column) else F.lit(float(value))
    return F.array_repeat(v.cast("double"), size)


def index_of(arr: Column, value) -> Column:
    """IndexOfEvaluator: 0-based index of the first element whose string
    form equals the (quote-stripped) needle, -1 when absent.  The
    reference compares toString() — mirrored with string casts."""
    needle = (
        value.cast("string")
        if isinstance(value, Column)
        else F.lit(str(value).replace('"', ""))
    )
    return (
        F.array_position(
            F.transform(arr, lambda o: o.cast("string")), needle
        ).cast("int")
        - 1
    )


def primes(size: int, start: int) -> Column:
    """PrimesEvaluator.java:54-62: the first ``size`` primes >= ``start``
    (Commons Math Primes.nextPrime chain).  Number-typed args in the
    reference; computed driver-side, returned as a literal array."""
    out: list[int] = []
    n = max(int(start), 2)
    while len(out) < int(size):
        is_p = n >= 2 and all(n % d for d in range(2, int(n**0.5) + 1))
        if is_p:
            out.append(n)
        n += 1
    return F.array(*[F.lit(p) for p in out])


def binomial_coefficient(n, k) -> Column:
    """BinomialCoefficientEvaluator (CombinatoricsUtils.binomialCoefficient).
    Exact for int literals (math.comb); columns go through the existing
    lgamma identity with a final round."""
    if not isinstance(n, Column) and not isinstance(k, Column):
        return F.lit(float(math.comb(int(n), int(k))))
    nc = (n if isinstance(n, Column) else F.lit(n)).cast("double")
    kc = (k if isinstance(k, Column) else F.lit(k)).cast("long")
    log_c = F.aggregate(
        _seq1(kc),
        F.lit(0.0),
        lambda acc, i: acc + F.log((nc - kc.cast("double") + i) / i),
    )
    return F.round(F.exp(log_c), 0)
