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
    total = F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)
    return F.transform(arr, lambda x: x / total)


def moving_avg(arr: Column, window: int) -> Column:
    """MovingAverageEvaluator: trailing mean over a window, emitted for
    every full window (length = len(arr) - window + 1)."""
    n = F.size(arr)
    idx = F.sequence(F.lit(1), n - F.lit(window - 1))
    return F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(arr, i, window), F.lit(0.0), lambda acc, v: acc + v
        )
        / F.lit(float(window)),
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
    var = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc + (x - mean) * (x - mean),
        lambda acc: acc / (n - F.lit(1)),
    )
    sd = F.sqrt(var)
    return F.transform(arr, lambda x: (x - mean) / sd)


def min_max_scale(arr: Column, lo: float = 0.0, hi: float = 1.0) -> Column:
    """MinMaxScaleEvaluator: rescale array values into [lo, hi]."""
    mn, mx = F.array_min(arr), F.array_max(arr)
    span = mx - mn
    return F.transform(
        arr,
        lambda x: F.when(span == 0, F.lit(lo)).otherwise(
            (x - mn) / span * (F.lit(hi) - F.lit(lo)) + F.lit(lo)
        ),
    )


def unitize(arr: Column) -> Column:
    """UnitEvaluator: scale an array to unit L2 norm."""
    norm = F.sqrt(
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.transform(arr, lambda x: x / norm)


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
    n = F.size(xs)

    def one(p: Column) -> Column:
        # rightmost index i with xs[i] <= p (1-based via filter+size)
        idx = F.size(F.filter(xs, lambda x: x <= p))
        i = F.greatest(F.least(idx, n - F.lit(1)), F.lit(1))
        x0, x1 = F.element_at(xs, i), F.element_at(xs, i + 1)
        y0, y1 = F.element_at(ys, i), F.element_at(ys, i + 1)
        return y0 + (p - x0) * (y1 - y0) / (x1 - x0)

    return F.transform(points, one)


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
    return F.transform(
        arr, lambda x: F.size(F.filter(arr, lambda y: y < x)) + F.lit(1)
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
    raise ValueError(f"unknown distribution {t!r}")


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
    raise ValueError(f"unknown distribution {t!r}")


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
        # discrete inverse-CDF: k = #{j : CDF(j-1) <= u}, evaluated as a
        # bounded fold over the support (Poisson support truncated at
        # lam + 12*sqrt(lam) + 16 — beyond any double-precision mass).
        # u MUST be materialized as a column before the fold: rand() is
        # non-deterministic, so referencing it inside the lambda would
        # re-draw a fresh u at every fold step (measured: the sample's
        # variance collapses while its mean stays correct).
        base = base.select(F.rand(seed).alias("_u"))
        u = F.col("_u")
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
        c = folded["k"].cast("long")
    else:
        raise NotImplementedError(f"sample for {t!r} not modeled")
    return base.select(c.alias(col))


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
