"""Hypothesis-test evaluators.

Oracle strategy: statistics are recomputed directly in numpy; p-values are
checked against independent NUMERICAL INTEGRATION of the corresponding
density (trapezoid over a fine grid) — no code shared with the
continued-fraction special functions under test."""

from __future__ import annotations

import math

import numpy as np
import pytest

from apache___solr_spark.functions.stattests import (
    anova_f,
    chi2_sf,
    chi_square_dataset,
    f_sf,
    g_test_dataset,
    ks_test_two_sample,
    mann_whitney_u,
    one_sample_ttest,
    paired_ttest,
    t_sf,
    welch_ttest,
    _kolmogorov_sf,
)


def _t_pdf(t, df):
    c = math.exp(
        math.lgamma((df + 1) / 2) - math.lgamma(df / 2)
    ) / math.sqrt(df * math.pi)
    return c * (1 + t * t / df) ** (-(df + 1) / 2)


def _t_sf_numeric(t, df):
    # linear grid near the point, log-spaced far tail (the low-df t tail is
    # polynomial and survives far beyond any fixed linear cutoff)
    hi = abs(t) + 60.0
    xs = np.linspace(abs(t), hi, 400_000)
    tail = np.logspace(math.log10(hi), 8, 200_000)
    core = np.trapz(_t_pdf(xs, df), xs)
    far = np.trapz(_t_pdf(tail, df), tail)
    return 2.0 * (core + far)


def _f_pdf(x, d1, d2):
    lnb = math.lgamma(d1 / 2) + math.lgamma(d2 / 2) - math.lgamma((d1 + d2) / 2)
    return np.exp(
        (d1 / 2) * math.log(d1 / d2)
        + (d1 / 2 - 1) * np.log(x)
        - ((d1 + d2) / 2) * np.log(1 + d1 * x / d2)
        - lnb
    )


def _f_sf_numeric(f, d1, d2):
    xs = np.linspace(f, f + 500.0, 400_000)
    return np.trapz(_f_pdf(xs, d1, d2), xs)


def _chi2_sf_numeric(x, df):
    xs = np.linspace(x, x + 400.0, 400_000)
    pdf = np.exp(
        (df / 2 - 1) * np.log(xs) - xs / 2 - math.lgamma(df / 2) - (df / 2) * math.log(2)
    )
    return np.trapz(pdf, xs)


def test_special_functions_vs_numerical_integration():
    for t, df in [(1.3, 4), (2.7, 11), (0.4, 29), (4.1, 7)]:
        assert t_sf(t, df) == pytest.approx(_t_sf_numeric(t, df), rel=1e-6)
    for f, d1, d2 in [(2.1, 3, 14), (0.7, 2, 9), (5.5, 4, 40)]:
        assert f_sf(f, d1, d2) == pytest.approx(_f_sf_numeric(f, d1, d2), rel=1e-5)
    for x, df in [(3.3, 2), (11.1, 5), (20.0, 12)]:
        assert chi2_sf(x, df) == pytest.approx(_chi2_sf_numeric(x, df), rel=1e-6)
    # Kolmogorov tail: the classic critical value Q(1.358) ~ 0.05
    assert _kolmogorov_sf(1.358) == pytest.approx(0.0503, abs=5e-4)


def test_one_sample_and_paired_ttest(spark):
    rng = np.random.RandomState(2)
    x = rng.normal(5.3, 1.0, 40)
    df = spark.createDataFrame([(float(v),) for v in x], "v double")
    row = one_sample_ttest(df, "v", 5.0).collect()[0]
    t_exp = (x.mean() - 5.0) / math.sqrt(x.var(ddof=1) / len(x))
    assert row["t_statistic"] == pytest.approx(t_exp, rel=1e-9)
    assert row["p_value"] == pytest.approx(_t_sf_numeric(t_exp, 39), rel=1e-6)

    y = x + rng.normal(0.3, 0.5, 40)
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    prow = paired_ttest(pdf, "x", "y").collect()[0]
    d = x - y
    t_exp = d.mean() / math.sqrt(d.var(ddof=1) / len(d))
    assert prow["t_statistic"] == pytest.approx(t_exp, rel=1e-9)
    assert prow["p_value"] == pytest.approx(_t_sf_numeric(t_exp, 39), rel=1e-6)


def test_welch_ttest_matches_numpy(spark):
    rng = np.random.RandomState(3)
    a = rng.normal(0.0, 1.0, 35)
    b = rng.normal(0.6, 2.0, 50)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    row = welch_ttest(df, "v", "g").collect()[0]
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / 35 + v2 / 50
    t_exp = (a.mean() - b.mean()) / math.sqrt(se2)
    df_exp = se2**2 / ((v1 / 35) ** 2 / 34 + (v2 / 50) ** 2 / 49)
    assert row["t_statistic"] == pytest.approx(t_exp, rel=1e-9)
    assert row["df"] == pytest.approx(df_exp, rel=1e-9)
    assert row["p_value"] == pytest.approx(_t_sf_numeric(t_exp, df_exp), rel=1e-6)


def test_anova_matches_numpy(spark):
    rng = np.random.RandomState(4)
    groups = {
        "a": rng.normal(0.0, 1.0, 20),
        "b": rng.normal(0.5, 1.0, 25),
        "c": rng.normal(1.1, 1.0, 30),
    }
    rows = [(g, float(v)) for g, xs in groups.items() for v in xs]
    df = spark.createDataFrame(rows, "g string, v double")
    row = anova_f(df, "v", "g").collect()[0]
    all_v = np.concatenate(list(groups.values()))
    grand = all_v.mean()
    ssb = sum(len(xs) * (xs.mean() - grand) ** 2 for xs in groups.values())
    ssw = sum(((xs - xs.mean()) ** 2).sum() for xs in groups.values())
    f_exp = (ssb / 2) / (ssw / (len(all_v) - 3))
    assert row["f_ratio"] == pytest.approx(f_exp, rel=1e-9)
    assert row["p_value"] == pytest.approx(
        _f_sf_numeric(f_exp, 2, len(all_v) - 3), rel=1e-5
    )


def test_mann_whitney_u_matches_direct(spark):
    rng = np.random.RandomState(5)
    a = rng.randint(0, 30, 18).astype(float)  # integer data -> real ties
    b = (rng.randint(0, 30, 22) + 4).astype(float)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    row = mann_whitney_u(df, "v", "g").collect()[0]

    # direct midrank computation
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    r1 = ranks[: len(a)].sum()
    u1 = r1 - len(a) * (len(a) + 1) / 2.0
    u2 = len(a) * len(b) - u1
    u_min = min(u1, u2)
    # Commons-Math reports max(U1,U2) as the statistic, p comes from Umin
    assert row["u_statistic"] == pytest.approx(max(u1, u2), abs=1e-9)
    mu = len(a) * len(b) / 2.0
    sig = math.sqrt(len(a) * len(b) * (len(a) + len(b) + 1) / 12.0)
    p_exp = min(1.0, 2.0 * 0.5 * math.erfc(-((u_min - mu) / sig) / math.sqrt(2)))
    assert row["p_value"] == pytest.approx(p_exp, rel=1e-9)


def test_ks_two_sample_matches_bruteforce(spark):
    rng = np.random.RandomState(6)
    a = rng.normal(0, 1, 60)
    b = rng.normal(0.5, 1.3, 45)
    d1 = spark.createDataFrame([(float(v),) for v in a], "x double")
    d2 = spark.createDataFrame([(float(v),) for v in b], "y double")
    row = ks_test_two_sample(d1, "x", d2, "y").collect()[0]
    grid = np.concatenate([a, b])
    ecdf1 = (a[None, :] <= grid[:, None]).mean(axis=1)
    ecdf2 = (b[None, :] <= grid[:, None]).mean(axis=1)
    d_exp = np.abs(ecdf1 - ecdf2).max()
    assert row["d_statistic"] == pytest.approx(d_exp, abs=1e-12)
    lam = math.sqrt(60 * 45 / 105) * d_exp
    assert row["p_value"] == pytest.approx(_kolmogorov_sf(lam), rel=1e-12)


def test_chi_square_and_gtest_dataset(spark):
    o1 = [43.0, 21.0, 25.0, 11.0]
    o2 = [28.0, 31.0, 17.0, 24.0]
    df = spark.createDataFrame(list(zip(o1, o2)), "o1 double, o2 double")

    row = chi_square_dataset(df, "o1", "o2").collect()[0]
    n1, n2 = sum(o1), sum(o2)
    kk = math.sqrt(n2 / n1)
    chi_exp = sum(
        (kk * a - b / kk) ** 2 / (a + b) for a, b in zip(o1, o2)
    )
    assert row["chisquare_statistic"] == pytest.approx(chi_exp, rel=1e-12)
    assert row["p_value"] == pytest.approx(_chi2_sf_numeric(chi_exp, 3), rel=1e-6)

    grow = g_test_dataset(df, "o1", "o2").collect()[0]
    # independent oracle: textbook 2xk G from expected counts e = margins/N
    n = n1 + n2
    g_exp = 0.0
    for a, b in zip(o1, o2):
        col = a + b
        for obs, rowtot in ((a, n1), (b, n2)):
            e = rowtot * col / n
            if obs > 0:
                g_exp += 2.0 * obs * math.log(obs / e)
    assert grow["g_statistic"] == pytest.approx(g_exp, rel=1e-10)
    assert grow["p_value"] == pytest.approx(_chi2_sf_numeric(g_exp, 3), rel=1e-6)
