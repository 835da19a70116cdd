"""Interpolation / curve-fit evaluators (io/eval long tail).

Oracle strategy: each fitter is checked against data where the true model
is known analytically (exact-reproduction invariants), plus an independent
dense/naive re-derivation where the algorithm has free parameters."""

from __future__ import annotations

import math

import numpy as np
import pytest

from apache___solr_spark.functions.interpolation import (
    akima_interp,
    gauss_fit,
    harmonic_fit,
    loess_smooth,
    poly_fit,
    poly_fit_derivative,
)


def _curve_df(spark, rows):
    rows = [
        (rid, [float(v) for v in xs], [float(v) for v in ys], [float(v) for v in ps])
        for rid, xs, ys, ps in rows
    ]
    return spark.createDataFrame(rows, "id long, xs array<double>, ys array<double>, probes array<double>")


def test_akima_reproduces_knots_and_lines(spark):
    x = [float(i) for i in range(8)]
    y_line = [2.0 * xi + 1.0 for xi in x]
    y_bump = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0]
    probes = [0.5, 1.5, 3.5, 6.75]
    df = _curve_df(
        spark,
        [(0, x, y_line, x), (1, x, y_bump, probes)],
    )
    got = {r["id"]: r["akima"] for r in akima_interp(df, "xs", "ys", "probes").collect()}
    # knots reproduce exactly on any input; a line reproduces everywhere
    assert got[0] == pytest.approx(y_line, abs=1e-12)
    # Akima's selling point: flat regions stay flat (no spline overshoot):
    # probes 1.5 / 3.5 sit inside the flat runs [0,0,0] / [1,1,1], where
    # both bracketing tangents are 0 -> the interpolant is exactly flat
    # (a natural cubic spline overshoots here)
    assert got[1][1] == pytest.approx(0.0, abs=1e-12)
    assert got[1][2] == pytest.approx(1.0, abs=1e-12)


def test_akima_matches_independent_construction(spark):
    rng = np.random.RandomState(7)
    x = np.sort(rng.uniform(0, 10, 9))
    y = rng.uniform(-1, 1, 9)
    probes = np.linspace(x[0], x[-1], 23)
    df = _curve_df(spark, [(0, list(x), list(y), list(probes))])
    got = np.array(akima_interp(df, "xs", "ys", "probes").first()["akima"])

    # independent scalar re-derivation (no shared code with the module)
    m = np.diff(y) / np.diff(x)
    ext = np.concatenate(
        [[2 * m[0] - m[1]], m, [2 * m[-1] - m[-2]]]
    )
    ext = np.concatenate([[2 * ext[0] - ext[1]], ext, [2 * ext[-1] - ext[-2]]])
    t = np.empty(len(x))
    for i in range(len(x)):
        m_im2, m_im1, m_i, m_ip1 = ext[i], ext[i + 1], ext[i + 2], ext[i + 3]
        w1, w2 = abs(m_ip1 - m_i), abs(m_im1 - m_im2)
        t[i] = (
            (w1 * m_im1 + w2 * m_i) / (w1 + w2)
            if w1 + w2 > 1e-12
            else 0.5 * (m_im1 + m_i)
        )
    exp = []
    for p in probes:
        i = min(max(np.searchsorted(x, p, side="right") - 1, 0), len(x) - 2)
        h = x[i + 1] - x[i]
        s = (p - x[i]) / h
        exp.append(
            (1 + 2 * s) * (1 - s) ** 2 * y[i]
            + s * (1 - s) ** 2 * h * t[i]
            + s * s * (3 - 2 * s) * y[i + 1]
            + s * s * (s - 1) * h * t[i + 1]
        )
    assert got == pytest.approx(exp, abs=1e-9)


def test_loess_smooths_noise_preserves_line(spark):
    n = 60
    x = [float(i) for i in range(n)]
    y_line = [0.5 * xi - 3.0 for xi in x]
    rng = np.random.RandomState(3)
    y_noisy = list(np.sin(np.array(x) / 6.0) + rng.normal(0, 0.15, n))
    df = _curve_df(spark, [(0, x, y_line, []), (1, x, y_noisy, [])])
    got = {r["id"]: np.array(r["loess"]) for r in loess_smooth(df, "xs", "ys").collect()}
    # local LINEAR regression reproduces a line exactly at every bandwidth
    assert got[0] == pytest.approx(y_line, abs=1e-9)
    # smoothing reduces distance to the true signal
    truth = np.sin(np.array(x) / 6.0)
    assert np.abs(got[1] - truth).mean() < np.abs(np.array(y_noisy) - truth).mean()


def test_loess_robust_iterations_resist_outlier(spark):
    n = 40
    x = [float(i) for i in range(n)]
    y = [0.1 * xi for xi in x]
    y[20] = 50.0  # gross outlier
    df = _curve_df(spark, [(0, x, y, [])])
    sm = np.array(loess_smooth(df, "xs", "ys").first()["loess"])
    # with bisquare reweighting the outlier barely moves its neighbors
    assert abs(sm[18] - 1.8) < 0.3
    assert abs(sm[22] - 2.2) < 0.3


def test_poly_fit_exact_on_cubic_and_derivative(spark):
    x = np.linspace(-2, 3, 12)
    y = 2.0 * x**3 - x**2 + 0.5 * x - 4.0
    dy = 6.0 * x**2 - 2.0 * x + 0.5
    df = _curve_df(spark, [(0, list(x), list(y), [])])
    import pyspark.sql.functions as F

    row = df.select(
        poly_fit(F.col("xs"), F.col("ys")).alias("fit"),
        poly_fit_derivative(F.col("xs"), F.col("ys")).alias("dfit"),
    ).first()
    assert np.array(row["fit"]) == pytest.approx(y, rel=1e-8, abs=1e-8)
    assert np.array(row["dfit"]) == pytest.approx(dy, rel=1e-6, abs=1e-6)


def test_gauss_fit_recovers_exact_gaussian(spark):
    x = np.linspace(-5, 9, 40)
    a, m, s = 3.0, 1.5, 1.2
    y = a * np.exp(-((x - m) ** 2) / (2 * s * s))
    df = _curve_df(spark, [(0, list(x), list(y), [])])
    import pyspark.sql.functions as F

    fit = np.array(
        df.select(gauss_fit(F.col("xs"), F.col("ys")).alias("f")).first()["f"]
    )
    assert fit == pytest.approx(y, abs=1e-8)


def test_harmonic_fit_recovers_exact_oscillator(spark):
    x = np.linspace(0, 12, 80)
    a, w, phi = 2.0, 1.7, 0.6
    y = a * np.cos(w * x + phi)
    df = _curve_df(spark, [(0, list(x), list(y), [])])
    import pyspark.sql.functions as F

    fit = np.array(
        df.select(harmonic_fit(F.col("xs"), F.col("ys")).alias("f")).first()["f"]
    )
    assert fit == pytest.approx(y, abs=1e-6)
    # reconstructed amplitude matches
    assert fit.max() == pytest.approx(a, abs=1e-4)


def test_harmonic_fit_params_recovers_model(spark):
    """harmonic_fit_params exposes (a, w, phi) — the reference's
    GetAmplitude/GetAngularFrequency/GetPhase accessors read these off
    the fitted VectorFunction."""
    import pyspark.sql.functions as F

    from apache___solr_spark.functions.interpolation import (
        harmonic_fit_params,
    )
    from apache___solr_spark.functions.signal import (
        get_amplitude,
        get_angular_frequency,
        get_phase,
    )

    x = np.linspace(0, 12, 80)
    a, w, phi = 2.0, 1.7, 0.6
    y = a * np.cos(w * x + phi)
    df = _curve_df(spark, [(0, list(x), list(y), [])])
    row = df.select(
        harmonic_fit_params(F.col("xs"), F.col("ys")).alias("m")
    ).select(
        get_amplitude(F.col("m")).alias("a"),
        get_angular_frequency(F.col("m")).alias("w"),
        get_phase(F.col("m")).alias("phi"),
        F.col("m.fit").alias("fit"),
    ).first()
    assert row["a"] == pytest.approx(a, abs=1e-4)
    assert row["w"] == pytest.approx(w, abs=1e-4)
    # phase is identifiable modulo 2*pi with sign coupled to amplitude>0
    assert (row["phi"] - phi) % (2 * np.pi) == pytest.approx(
        0.0, abs=1e-3
    ) or (row["phi"] - phi) % (2 * np.pi) == pytest.approx(
        2 * np.pi, abs=1e-3
    )
    assert np.array(row["fit"]) == pytest.approx(y, abs=1e-6)
