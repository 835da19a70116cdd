"""Distribution long tail (weibull/lognormal/triangular/geometric/
uniform-integer/zipf/gamma/beta/enumerated).

Oracles: pdf/cdf closed forms recomputed directly in Python math at probe
points; gamma/beta CDFs against numerical integration of their densities;
samples checked for determinism, support bounds, and first two moments."""

from __future__ import annotations

import math

import numpy as np
import pytest
import pyspark.sql.functions as F

from apache___solr_spark.functions.evaluators import (
    beta_dist,
    cumulative_probability,
    enumerated_dist,
    gamma_dist,
    geometric_dist,
    lognormal_dist,
    probability,
    sample_dist,
    triangular_dist,
    uniform_integer_dist,
    weibull_dist,
    zipf_dist,
)


def _eval_at(spark, dist, xs, fn):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    return [
        r["v"] for r in df.select(fn(dist, F.col("x")).alias("v")).collect()
    ]


def test_weibull_lognormal_triangular_closed_forms(spark):
    w = weibull_dist(1.7, 2.0)
    xs = [-0.5, 0.3, 1.0, 2.5, 6.0]
    pdf = _eval_at(spark, w, xs, probability)
    cdf = _eval_at(spark, w, xs, cumulative_probability)
    for x, p, c in zip(xs, pdf, cdf):
        if x < 0:
            assert p == 0.0 and c == 0.0
        else:
            z = x / 2.0
            assert p == pytest.approx(
                (1.7 / 2.0) * z**0.7 * math.exp(-(z**1.7)), rel=1e-12
            )
            assert c == pytest.approx(1 - math.exp(-(z**1.7)), rel=1e-12)

    ln = lognormal_dist(0.5, 0.8)
    xs = [0.2, 1.0, 3.0]
    pdf = _eval_at(spark, ln, xs, probability)
    cdf = _eval_at(spark, ln, xs, cumulative_probability)
    for x, p, c in zip(xs, pdf, cdf):
        z = (math.log(x) - 0.5) / 0.8
        assert p == pytest.approx(
            math.exp(-z * z / 2) / (x * 0.8 * math.sqrt(2 * math.pi)),
            rel=1e-12,
        )
        # erf is the A&S 7.1.26 approximation: 1.5e-7 absolute
        assert c == pytest.approx(
            0.5 * (1 + math.erf(z / math.sqrt(2))), abs=2e-7
        )

    tr = triangular_dist(1.0, 3.0, 7.0)
    xs = [0.5, 2.0, 3.0, 5.0, 8.0]
    pdf = _eval_at(spark, tr, xs, probability)
    cdf = _eval_at(spark, tr, xs, cumulative_probability)
    exp_pdf = [0.0, 2 * 1 / (6 * 2), 2 / 6, 2 * 2 / (6 * 4), 0.0]
    exp_cdf = [0.0, 1 / (6 * 2), 4 / (6 * 2), 1 - 4 / (6 * 4), 1.0]
    assert pdf == pytest.approx(exp_pdf, rel=1e-12)
    assert cdf == pytest.approx(exp_cdf, rel=1e-12)


def test_discrete_distributions_closed_forms(spark):
    g = geometric_dist(0.3)
    xs = [-1, 0, 2, 5]
    pdf = _eval_at(spark, g, xs, probability)
    cdf = _eval_at(spark, g, xs, cumulative_probability)
    for x, p, c in zip(xs, pdf, cdf):
        if x < 0:
            assert p == 0.0 and c == 0.0
        else:
            assert p == pytest.approx(0.3 * 0.7**x, rel=1e-12)
            assert c == pytest.approx(1 - 0.7 ** (x + 1), rel=1e-12)

    ui = uniform_integer_dist(3, 9)
    assert _eval_at(spark, ui, [2, 3, 6, 9, 10], probability) == pytest.approx(
        [0.0, 1 / 7, 1 / 7, 1 / 7, 0.0]
    )
    assert _eval_at(spark, ui, [2, 4, 9, 12], cumulative_probability) == pytest.approx(
        [0.0, 2 / 7, 1.0, 1.0]
    )

    z = zipf_dist(20, 1.3)
    h = sum(1 / i**1.3 for i in range(1, 21))
    assert _eval_at(spark, z, [1, 5, 20, 25], probability) == pytest.approx(
        [1 / h, 1 / 5**1.3 / h, 1 / 20**1.3 / h, 0.0], rel=1e-12
    )
    assert _eval_at(spark, z, [0, 3, 20], cumulative_probability) == pytest.approx(
        [0.0, sum(1 / i**1.3 for i in (1, 2, 3)) / h, 1.0], rel=1e-12
    )

    en = enumerated_dist([1, 1, 2, 5, 5, 5])
    assert _eval_at(spark, en, [1, 2, 3, 5], probability) == pytest.approx(
        [2 / 6, 1 / 6, 0.0, 3 / 6]
    )
    assert _eval_at(spark, en, [0, 1, 2, 4, 5, 9], cumulative_probability) == pytest.approx(
        [0.0, 2 / 6, 3 / 6, 3 / 6, 1.0, 1.0]
    )


def test_gamma_beta_cdf_vs_numerical_integration(spark):
    gm = gamma_dist(2.3, 1.7)
    xs = [0.5, 2.0, 6.0, 15.0]
    cdf = _eval_at(spark, gm, xs, cumulative_probability)
    for x, c in zip(xs, cdf):
        g = np.linspace(1e-9, x, 400_000)
        pdf = np.exp(
            (2.3 - 1) * np.log(g)
            - g / 1.7
            - math.lgamma(2.3)
            - 2.3 * math.log(1.7)
        )
        assert c == pytest.approx(np.trapz(pdf, g), rel=1e-6), x
    # pdf closed form
    p = _eval_at(spark, gm, [2.0], probability)[0]
    assert p == pytest.approx(
        2.0**1.3 * math.exp(-2.0 / 1.7) / (math.gamma(2.3) * 1.7**2.3),
        rel=1e-12,
    )

    bt = beta_dist(2.5, 4.0)
    xs = [0.1, 0.4, 0.8]
    cdf = _eval_at(spark, bt, xs, cumulative_probability)
    lnb = math.lgamma(2.5) + math.lgamma(4.0) - math.lgamma(6.5)
    for x, c in zip(xs, cdf):
        g = np.linspace(1e-9, x, 400_000)
        pdf = np.exp((2.5 - 1) * np.log(g) + 3.0 * np.log1p(-g) - lnb)
        assert c == pytest.approx(np.trapz(pdf, g), rel=1e-6), x


def test_samples_deterministic_bounded_and_moment_matched(spark):
    n = 40_000
    cases = [
        (weibull_dist(1.5, 2.0), 2.0 * math.gamma(1 + 1 / 1.5), None),
        (lognormal_dist(0.2, 0.5), math.exp(0.2 + 0.125), None),
        (triangular_dist(1.0, 3.0, 7.0), (1 + 3 + 7) / 3.0, (1.0, 7.0)),
        (geometric_dist(0.25), 0.75 / 0.25, (0, None)),
        (uniform_integer_dist(2, 11), 6.5, (2, 11)),
    ]
    for dist, mean_exp, bounds in cases:
        df = sample_dist(spark, dist, n, seed=123)
        r = df.agg(
            F.avg("value").alias("m"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        ).collect()[0]
        assert r["m"] == pytest.approx(mean_exp, rel=0.05), dist["type"]
        if bounds:
            lo, hi = bounds
            if lo is not None:
                assert r["lo"] >= lo
            if hi is not None:
                assert r["hi"] <= hi
        # determinism under a fixed seed
        again = sample_dist(spark, dist, 50, seed=9).collect()
        third = sample_dist(spark, dist, 50, seed=9).collect()
        assert again == third

    # zipf + enumerated: frequencies track the pmf
    z = zipf_dist(10, 1.1)
    zf = sample_dist(spark, z, n, seed=5)
    top = zf.groupBy("value").count().orderBy("value").collect()
    h = sum(1 / i**1.1 for i in range(1, 11))
    for row in top[:3]:
        exp_p = (1 / row["value"] ** 1.1) / h
        assert row["count"] / n == pytest.approx(exp_p, rel=0.08)

    en = enumerated_dist([2, 7], [0.25, 0.75])
    ef = sample_dist(spark, en, n, seed=6)
    cnt = {r["value"]: r["count"] for r in ef.groupBy("value").count().collect()}
    assert set(cnt) == {2, 7}
    assert cnt[7] / n == pytest.approx(0.75, abs=0.02)


def test_gamma_beta_samples_inverse_cdf(spark):
    """gamma/beta sample(): draws are deterministic under a seed, live on
    the support, match the analytic first two moments, and — the sharp
    check — applying the analytic CDF to the draws yields Uniform(0,1)
    (probability integral transform), verified at the quartiles."""
    n = 40_000
    cases = [
        (gamma_dist(2.5, 1.5), 2.5 * 1.5, 2.5 * 1.5**2, (0.0, None)),
        (
            beta_dist(2.0, 5.0),
            2.0 / 7.0,
            (2.0 * 5.0) / (49.0 * 8.0),
            (0.0, 1.0),
        ),
    ]
    for dist, mean_exp, var_exp, (lo_b, hi_b) in cases:
        df = sample_dist(spark, dist, n, seed=123)
        r = df.agg(
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        ).collect()[0]
        assert r["m"] == pytest.approx(mean_exp, rel=0.05), dist["type"]
        assert r["v"] == pytest.approx(var_exp, rel=0.10), dist["type"]
        assert r["lo"] >= lo_b
        if hi_b is not None:
            assert r["hi"] <= hi_b
        # probability integral transform: CDF(draw) ~ U(0,1)
        u = df.select(
            cumulative_probability(dist, F.col("value")).alias("u")
        )
        qs = u.agg(
            *[
                F.avg((F.col("u") <= q).cast("double")).alias(f"q{int(q*100)}")
                for q in (0.25, 0.5, 0.75)
            ]
        ).collect()[0]
        for q in (0.25, 0.5, 0.75):
            assert qs[f"q{int(q*100)}"] == pytest.approx(q, abs=0.02), dist
        again = sample_dist(spark, dist, 50, seed=9).collect()
        third = sample_dist(spark, dist, 50, seed=9).collect()
        assert again == third


def test_markov_chain_stationary_and_deterministic(spark):
    """markovChain: long-run state frequencies converge to the stationary
    distribution of the transition matrix (computed independently by
    numpy eigendecomposition); walks are deterministic under a seed and
    every transition respects the matrix's support."""
    from apache___solr_spark.functions.evaluators import markov_chain_sample

    P = [
        [0.7, 0.3, 0.0],
        [0.2, 0.5, 0.3],
        [0.1, 0.4, 0.5],
    ]
    df = markov_chain_sample(spark, P, steps=300, n_chains=64, seed=17)
    rows = df.collect()
    assert len(rows) == 64
    # determinism
    again = markov_chain_sample(spark, P, steps=300, n_chains=64, seed=17)
    assert rows == again.collect()

    # forbidden transition 0 -> 2 (p = 0) never occurs
    counts = np.zeros(3)
    for r in rows:
        s = r["states"]
        for a, b in zip(s, s[1:]):
            assert not (a == 0 and b == 2)
        counts += np.bincount(s[50:], minlength=3)  # burn-in discarded
    freq = counts / counts.sum()

    # stationary distribution via left eigenvector
    w, v = np.linalg.eig(np.array(P).T)
    pi = np.real(v[:, np.argmax(np.real(w))])
    pi = pi / pi.sum()
    assert freq == pytest.approx(pi, abs=0.02)

    # fixed start state honored
    fixed = markov_chain_sample(spark, P, steps=3, n_chains=5, seed=1, state0=2)
    assert all(r["states"][0] == 2 for r in fixed.collect())


def test_review_fix_regressions(spark):
    """Edge cases from the round-3 self-review: gamma CDF far in the tail
    (the raw power series overflowed double near x ~ 740), moving windows
    over arrays shorter than the window, markov steps=0, and single-
    observation t-test inputs."""
    import pyspark.sql.functions as F

    from apache___solr_spark.functions.evaluators import (
        markov_chain_sample,
        moving_avg,
        moving_mad,
        moving_median,
    )
    from apache___solr_spark.functions.stattests import welch_ttest

    # gamma CDF at x >> 740: must be ~1.0, not NaN
    gm = gamma_dist(1.0, 1.0)
    vals = _eval_at(spark, gm, [700.0, 800.0, 5000.0], cumulative_probability)
    assert vals == pytest.approx([1.0, 1.0, 1.0], abs=1e-12)
    # and the continued-fraction branch agrees with the series at moderate x
    mid = _eval_at(spark, gamma_dist(3.0, 2.0), [3.9, 4.1], cumulative_probability)
    assert abs(mid[1] - mid[0]) < 0.03  # continuous across the x = s+1 split

    # short arrays -> empty results, not a slice crash
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "a array<double>")
    row = df.select(
        moving_median(F.col("a"), 5).alias("mm"),
        moving_mad(F.col("a"), 5).alias("md"),
        moving_avg(F.col("a"), 5).alias("ma"),
    ).first()
    assert row["mm"] == [] and row["md"] == [] and row["ma"] == []

    # steps=0 -> just the start state
    w = markov_chain_sample(
        spark, [[1.0, 0.0], [0.5, 0.5]], steps=0, n_chains=3, seed=2, state0=1
    )
    assert all(r["states"] == [1] for r in w.collect())

    # single observation -> clear error, not TypeError
    one = spark.createDataFrame([("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double")
    with pytest.raises(ValueError, match="2 observations"):
        welch_ttest(one, "v", "g")


def test_monte_carlo_estimates_known_expectation(spark):
    """monteCarlo: E[X*Y + Z] with X~U(0,2), Y~N(3,1), Z~Poisson(4)
    independent = 1*3 + 4 = 7; estimate converges, runs deterministically
    under a seed, and draws are independent across bindings."""
    import pyspark.sql.functions as F

    from apache___solr_spark.functions.evaluators import (
        monte_carlo,
        normal_dist,
        poisson_dist,
        uniform_dist,
    )

    bindings = {
        "x": uniform_dist(0.0, 2.0),
        "y": normal_dist(3.0, 1.0),
        "z": poisson_dist(4.0),
    }
    res = monte_carlo(
        spark, 60_000, bindings,
        lambda df: F.col("x") * F.col("y") + F.col("z"), seed=11,
    )
    m = res.agg(F.avg("result")).collect()[0][0]
    assert m == pytest.approx(7.0, rel=0.03)
    # determinism
    a = monte_carlo(spark, 20, bindings, lambda df: F.col("x") + F.col("z"), seed=3).collect()
    b = monte_carlo(spark, 20, bindings, lambda df: F.col("x") + F.col("z"), seed=3).collect()
    assert a == b
    # sample_dist regression after the refactor: poisson moments still hold
    ps = sample_dist(spark, poisson_dist(4.0), 40_000, seed=8)
    r = ps.agg(F.avg("value").alias("m"), F.var_samp("value").alias("v")).collect()[0]
    assert r["m"] == pytest.approx(4.0, rel=0.05)
    assert r["v"] == pytest.approx(4.0, rel=0.08)
