"""Signal-processing evaluators (fft/ifft/convolve/findDelay/oscillate and
spline derivative/integral).

Oracles: an independent O(n^2) DFT sum for fft, exact hand loops for
convolution, constructed shifts for findDelay, direct trig for oscillate,
and dense finite differences / trapezoid sums over spline_interp's own
(already dense-solve-oracled) values for derivative/integral."""

from __future__ import annotations

import math

import numpy as np
import pytest
import pyspark.sql.functions as F

from apache___solr_spark.functions.evaluators import spline_interp
from apache___solr_spark.functions.signal import (
    convolve_arr,
    fft_arr,
    find_delay,
    ifft_arr,
    oscillate,
    spline_derivative,
    spline_integral,
)


def test_fft_matches_direct_dft_and_roundtrips(spark):
    rng = np.random.RandomState(8)
    sig = rng.uniform(-1, 1, 16)  # power of 2: the reference-compatible case
    df = spark.createDataFrame([([float(v) for v in sig],)], "a array<double>")
    mat = df.select(fft_arr(F.col("a")).alias("m")).first()["m"]
    re, im = np.array(mat[0]), np.array(mat[1])
    n = len(sig)
    # independent O(n^2) DFT sum
    ks = np.arange(n)
    W = np.exp(-2j * math.pi * np.outer(ks, ks) / n)
    exp = W @ sig
    assert re == pytest.approx(exp.real, abs=1e-10)
    assert im == pytest.approx(exp.imag, abs=1e-10)
    # ifft(fft(x)) == x
    back = (
        df.select(ifft_arr(fft_arr(F.col("a"))).alias("b")).first()["b"]
    )
    assert np.array(back) == pytest.approx(sig, abs=1e-12)


def test_convolution_full_length(spark):
    a = [1.0, 2.0, 3.0]
    b = [0.5, -1.0, 2.0, 1.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(convolve_arr(F.col("a"), F.col("b")).alias("c")).first()["c"]
    exp = [
        sum(
            a[i] * b[k - i]
            for i in range(len(a))
            if 0 <= k - i < len(b)
        )
        for k in range(len(a) + len(b) - 1)
    ]
    assert got == pytest.approx(exp, abs=1e-12)


def test_find_delay_recovers_shift(spark):
    rng = np.random.RandomState(9)
    base = rng.uniform(-1, 1, 40)
    for shift in (0, 3, 7):
        shifted = np.concatenate([np.zeros(shift), base])[:40]
        df = spark.createDataFrame(
            [([float(v) for v in shifted], [float(v) for v in base])],
            "a array<double>, b array<double>",
        )
        got = df.select(find_delay(F.col("a"), F.col("b")).alias("d")).first()["d"]
        assert got == float(shift), f"shift {shift} -> {got}"


def test_oscillate_is_sampled_cosine_in_codegen(spark):
    df = spark.range(1)
    got = df.select(oscillate(2.0, 0.3, 1.1).alias("o")).first()["o"]
    exp = [2.0 * math.cos(0.3 * i + 1.1) for i in range(128)]
    assert len(got) == 128
    assert got == pytest.approx(exp, abs=1e-12)
    # stays a column expression: no python UDF / ArrowEvalPython in the plan
    # the model struct carries the params for the accessor trio
    from apache___solr_spark.functions.signal import (
        get_amplitude,
        get_angular_frequency,
        get_phase,
        oscillate_model,
    )

    m = df.select(oscillate_model(2.0, 0.3, 1.1).alias("m")).select(
        get_amplitude(F.col("m")).alias("a"),
        get_angular_frequency(F.col("m")).alias("w"),
        get_phase(F.col("m")).alias("p"),
    ).first()
    assert (m["a"], m["w"], m["p"]) == (2.0, 0.3, 1.1)
    plan = df.select(oscillate(2.0, 0.3, 1.1).alias("o"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_spline_derivative_matches_finite_difference(spark):
    x = [float(v) for v in np.linspace(0, 10, 15)]
    y = [float(np.sin(v)) for v in x]
    probes = [float(v) for v in np.linspace(0.3, 9.7, 21)]
    eps = 1e-5
    df = spark.createDataFrame(
        [(x, y, probes, [p - eps for p in probes], [p + eps for p in probes])],
        "xs array<double>, ys array<double>, p array<double>, pm array<double>, pp array<double>",
    )
    d = np.array(
        spline_derivative(df, "xs", "ys", "p").first()["derivative"]
    )
    lo = np.array(spline_interp(df, "xs", "ys", "pm").first()["interpolated"])
    hi = np.array(spline_interp(df, "xs", "ys", "pp").first()["interpolated"])
    fd = (hi - lo) / (2 * eps)
    assert d == pytest.approx(fd, abs=1e-5)


def test_spline_integral_matches_dense_trapezoid(spark):
    x = [float(v) for v in np.linspace(0, 6, 13)]
    y = [float(v**2 - 2 * v) for v in x]
    # 4800 steps of 0.00125: every knot (multiples of 0.5) and both
    # integration bounds land exactly on the grid, so the trapezoid mask
    # doesn't truncate a sliver at the ends
    dense = [float(v) for v in np.linspace(0, 6, 4801)]
    df = spark.createDataFrame(
        [(x, y, dense)],
        "xs array<double>, ys array<double>, dense array<double>",
    )
    got = spline_integral(df, "xs", "ys", lo=0.5, hi=5.5).first()["integral"]
    vals = np.array(spline_interp(df, "xs", "ys", "dense").first()["interpolated"])
    g = np.array(dense)
    mask = (g >= 0.5) & (g <= 5.5)
    exp = np.trapz(vals[mask], g[mask])
    assert got == pytest.approx(exp, rel=1e-5)

    cum = np.array(
        spline_integral(df, "xs", "ys").first()["integral_cum"]
    )
    assert cum[0] == 0.0
    # cumulative at each knot matches dense trapezoid up to that knot
    for i, xi in enumerate(x):
        mask = g <= xi + 1e-12
        exp_i = np.trapz(vals[mask], g[mask]) if mask.sum() > 1 else 0.0
        assert cum[i] == pytest.approx(exp_i, rel=1e-4, abs=1e-6)


def test_moving_median_mad_mode_frequency(spark):
    from apache___solr_spark.functions.evaluators import (
        frequency_table,
        mode_arr,
        moving_mad,
        moving_median,
    )

    arr = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([(arr,)], "a array<double>")
    got = df.select(
        moving_median(F.col("a"), 3).alias("med3"),
        moving_median(F.col("a"), 4).alias("med4"),
        moving_mad(F.col("a"), 3).alias("mad3"),
        mode_arr(F.array(*[F.lit(v) for v in [2.0, 7.0, 2.0, 7.0, 1.0]])).alias("md"),
    ).first()
    exp_med3 = [float(np.median(arr[i : i + 3])) for i in range(6)]
    exp_med4 = [float(np.median(arr[i : i + 4])) for i in range(5)]
    exp_mad3 = [
        float(np.abs(np.array(arr[i : i + 3]) - np.mean(arr[i : i + 3])).mean())
        for i in range(6)
    ]
    assert got["med3"] == pytest.approx(exp_med3)
    assert got["med4"] == pytest.approx(exp_med4)
    assert got["mad3"] == pytest.approx(exp_mad3)
    assert got["md"] == [2.0, 7.0]  # both tied modes, ascending

    fdf = spark.createDataFrame(
        [(v,) for v in [1, 2, 2, 3, 3, 3]], "v int"
    )
    rows = frequency_table(fdf, "v").collect()
    assert [(r["v"], r["count"], r["cumFreq"]) for r in rows] == [
        (1, 1, 1),
        (2, 2, 3),
        (3, 3, 6),
    ]
    assert rows[1]["pct"] == pytest.approx(2 / 6)
    assert rows[2]["cumPct"] == pytest.approx(1.0)


def test_knn_regression_matches_numpy(spark):
    from apache___solr_spark.pipeline.similarity import knn_regression

    rng = np.random.RandomState(12)
    X = rng.uniform(-2, 2, (200, 3))
    y = X[:, 0] * 2.0 - X[:, 1] + 0.5 * X[:, 2]
    train = spark.createDataFrame(
        [
            ([float(a) for a in v], float(t))
            for v, t in zip(X, y)
        ],
        "vec array<double>, out double",
    )
    probes = [[0.5, 0.5, 0.0], [-1.0, 1.0, 1.0]]
    got = {
        r["probe_idx"]: r["prediction"]
        for r in knn_regression(train, "vec", "out", probes, k=7).collect()
    }
    got_rob = {
        r["probe_idx"]: r["prediction"]
        for r in knn_regression(
            train, "vec", "out", probes, k=7, robust=True
        ).collect()
    }
    for i, p in enumerate(probes):
        d = ((X - np.array(p)) ** 2).sum(axis=1)
        idx = np.argsort(d, kind="stable")[:7]
        assert got[i] == pytest.approx(float(y[idx].mean()), rel=1e-9)
        assert got_rob[i] == pytest.approx(float(np.median(y[idx])), rel=1e-9)
