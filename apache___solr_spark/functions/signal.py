"""Signal-processing evaluators (io/eval DSP family).

Reference: solrj-streaming/.../io/eval/FFTEvaluator.java,
IFFTEvaluator.java, ConvolutionEvaluator.java, FindDelayEvaluator.java,
OscillateEvaluator.java, DerivativeEvaluator.java, IntegrateEvaluator.java.

Spark shape: per-tuple arrays -> Arrow-batched pandas UDFs (numpy FFT /
convolution per curve, rows are the parallel unit).  ``oscillate`` is a
pure JVM column expression (sequence + transform — stays in codegen).
Derivative/integral operate on the NATURAL CUBIC SPLINE of each row's
curve: the reference's DerivativeEvaluator differentiates whatever
function object it receives (most commonly ``derivative(spline(x, y))``)
and IntegrateEvaluator Romberg-integrates it; here the spline's piecewise
cubic is differentiated/integrated ANALYTICALLY (exact — Romberg on a
cubic converges to the same value).

Semantics mirrored exactly (tested):
- fft returns the 2-row [real, imag] shape of FFTEvaluator.java:71-77
  (STANDARD normalization, forward unscaled / inverse 1/N — numpy's
  default convention).  numpy lifts Commons-Math's power-of-2 length
  requirement; power-of-2 inputs match bit-for-bit.
- convolution is the full linear convolution (length n+m-1,
  MathArrays.convolve).
- find_delay cross-correlates first with REVERSED second and returns
  ``argmax|xcorr| + 1 - len(second)`` (FindDelayEvaluator.java:72-95).
- oscillate samples ``a*cos(w*i + phi)`` at i = 0..127
  (OscillateEvaluator.java:45-52).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as T

from apache___solr_spark.functions.interpolation import natural_spline_moments

__all__ = [
    "fft_arr",
    "ifft_arr",
    "convolve_arr",
    "find_delay",
    "oscillate",
    "oscillate_model",
    "get_amplitude",
    "get_angular_frequency",
    "get_phase",
    "spline_derivative",
    "spline_integral",
]

_ARR = T.ArrayType(T.DoubleType())
_MAT = T.ArrayType(T.ArrayType(T.DoubleType()))


def fft_arr(arr: Column) -> Column:
    """FFTEvaluator: forward DFT of a real array -> 2-row [real[], imag[]]."""

    @F.pandas_udf(_MAT)
    def _fft(col: pd.Series) -> pd.Series:
        out = []
        for v in col:
            c = np.fft.fft(np.asarray(v, dtype=np.float64))
            out.append([list(c.real), list(c.imag)])
        return pd.Series(out)

    return _fft(arr)


def ifft_arr(mat: Column) -> Column:
    """IFFTEvaluator: inverse DFT of a [real[], imag[]] matrix -> the real
    parts of the inverse transform (IFFTEvaluator.java:64-68)."""

    @F.pandas_udf(_ARR)
    def _ifft(col: pd.Series) -> pd.Series:
        out = []
        for m in col:
            c = np.asarray(m[0], dtype=np.float64) + 1j * np.asarray(
                m[1], dtype=np.float64
            )
            out.append(list(np.fft.ifft(c).real))
        return pd.Series(out)

    return _ifft(mat)


def convolve_arr(a: Column, b: Column) -> Column:
    """ConvolutionEvaluator: full linear convolution, length n+m-1."""

    @F.pandas_udf(_ARR)
    def _conv(ca: pd.Series, cb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                list(
                    np.convolve(
                        np.asarray(x, dtype=np.float64),
                        np.asarray(y, dtype=np.float64),
                        mode="full",
                    )
                )
                for x, y in zip(ca, cb)
            ]
        )

    return _conv(a, b)


def find_delay(a: Column, b: Column) -> Column:
    """FindDelayEvaluator: delay of ``b`` relative to ``a`` via the peak of
    |xcorr|: convolve(a, reverse(b)), return argmax+1 - len(b)."""

    @F.pandas_udf(T.DoubleType())
    def _fd(ca: pd.Series, cb: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(ca, cb):
            xa = np.asarray(x, dtype=np.float64)
            yb = np.asarray(y, dtype=np.float64)[::-1]
            conv = np.convolve(xa, yb, mode="full")
            out.append(float(np.abs(conv).argmax() + 1 - len(yb)))
        return pd.Series(out)

    return _fd(a, b)


def oscillate(amplitude: float, angular_freq: float, phase: float) -> Column:
    """OscillateEvaluator: ``a*cos(w*i + phi)`` sampled at i = 0..127 —
    a pure column expression (sequence + transform, stays in codegen)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(127)),
        lambda i: F.lit(float(amplitude))
        * F.cos(F.lit(float(angular_freq)) * i + F.lit(float(phase))),
    )


def oscillate_model(
    amplitude: float, angular_freq: float, phase: float
) -> Column:
    """The reference's oscillate() returns a VectorFunction with the
    sinusoid params attached, which GetAmplitudeEvaluator/
    GetAngularFrequencyEvaluator/GetPhaseEvaluator read back
    (io/eval/GetAmplitudeEvaluator.java:42-55 sibling trio).  Here the
    model is a struct column carrying the params plus the sampled wave —
    the same struct shape ``interpolation.harmonic_fit_params`` returns,
    so the accessors below work on either."""
    return F.struct(
        F.lit(float(amplitude)).alias("amplitude"),
        F.lit(float(angular_freq)).alias("angular_frequency"),
        F.lit(float(phase)).alias("phase"),
        oscillate(amplitude, angular_freq, phase).alias("fit"),
    )


def get_amplitude(model: Column) -> Column:
    """GetAmplitudeEvaluator: read ``a`` off an oscillate/harmonicFit model."""
    return model["amplitude"]


def get_angular_frequency(model: Column) -> Column:
    """GetAngularFrequencyEvaluator: read ``w`` off the model struct."""
    return model["angular_frequency"]


def get_phase(model: Column) -> Column:
    """GetPhaseEvaluator: read ``phi`` off the model struct."""
    return model["phase"]


def _spline_pieces(x: np.ndarray, y: np.ndarray):
    m = natural_spline_moments(x, y)
    h = np.diff(x)
    return m, h


def spline_derivative(df: DataFrame, xs: str, ys: str, probes: str) -> DataFrame:
    """DerivativeEvaluator over the natural cubic spline of each row's
    curve: exact analytic derivative at the row's probe points, added as a
    ``derivative`` array<double> column."""

    @F.pandas_udf(_ARR)
    def _der(xcol: pd.Series, ycol: pd.Series, pcol: pd.Series) -> pd.Series:
        out = []
        for xv, yv, pv in zip(xcol, ycol, pcol):
            x = np.asarray(xv, dtype=np.float64)
            y = np.asarray(yv, dtype=np.float64)
            p = np.asarray(pv, dtype=np.float64)
            n = len(x)
            if n < 3:
                slope = (
                    np.diff(y) / np.diff(x) if n == 2 else np.array([0.0])
                )
                i = np.clip(
                    np.searchsorted(x, p, side="right") - 1, 0, max(n - 2, 0)
                )
                out.append(list(slope[i]))
                continue
            m, h = _spline_pieces(x, y)
            i = np.clip(np.searchsorted(x, p, side="right") - 1, 0, n - 2)
            dx = p - x[i]
            hi = h[i]
            d = (
                (y[i + 1] - y[i]) / hi
                - hi * (2.0 * m[i] + m[i + 1]) / 6.0
                + dx * m[i]
                + dx * dx * (m[i + 1] - m[i]) / (2.0 * hi)
            )
            out.append(list(d))
        return pd.Series(out)

    return df.withColumn(
        "derivative", _der(F.col(xs), F.col(ys), F.col(probes))
    )


def spline_integral(
    df: DataFrame,
    xs: str,
    ys: str,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """IntegrateEvaluator over the natural cubic spline: with (lo, hi),
    the definite integral as a ``integral`` double column; without bounds,
    the reference's cumulative form (IntegrateEvaluator.java:74-84) —
    ``integral_cum`` array<double> with out[i] = integral from x[0] to
    x[i].  Piecewise-cubic antiderivative, evaluated exactly."""

    def _cum_at_knots(x, y, m, h):
        # exact integral of each cubic piece
        #  s_i(x) = y_i + dx*b_i + dx^2*m_i/2 + dx^3*(m_{i+1}-m_i)/(6h)
        b = np.diff(y) / h - h * (2.0 * m[:-1] + m[1:]) / 6.0
        piece = (
            y[:-1] * h
            + b * h * h / 2.0
            + m[:-1] * h**3 / 6.0
            + (m[1:] - m[:-1]) * h**3 / 24.0
        )
        return np.concatenate([[0.0], np.cumsum(piece)]), b

    def _value_at(x, y, m, h, b, cum, p):
        i = np.clip(np.searchsorted(x, p, side="right") - 1, 0, len(x) - 2)
        dx = p - x[i]
        return (
            cum[i]
            + y[i] * dx
            + b[i] * dx * dx / 2.0
            + m[i] * dx**3 / 6.0
            + (m[i + 1] - m[i]) * dx**4 / (24.0 * h[i])
        )

    if lo is None:

        @F.pandas_udf(_ARR)
        def _cum(xcol: pd.Series, ycol: pd.Series) -> pd.Series:
            out = []
            for xv, yv in zip(xcol, ycol):
                x = np.asarray(xv, dtype=np.float64)
                y = np.asarray(yv, dtype=np.float64)
                if len(x) < 3:
                    out.append(
                        list(
                            np.concatenate(
                                [
                                    [0.0],
                                    np.cumsum(
                                        np.diff(x) * (y[:-1] + y[1:]) / 2.0
                                    ),
                                ]
                            )
                        )
                    )
                    continue
                m, h = _spline_pieces(x, y)
                cum, _ = _cum_at_knots(x, y, m, h)
                out.append(list(cum))
            return pd.Series(out)

        return df.withColumn("integral_cum", _cum(F.col(xs), F.col(ys)))

    lo_f, hi_f = float(lo), float(hi)

    @F.pandas_udf(T.DoubleType())
    def _defint(xcol: pd.Series, ycol: pd.Series) -> pd.Series:
        out = []
        for xv, yv in zip(xcol, ycol):
            x = np.asarray(xv, dtype=np.float64)
            y = np.asarray(yv, dtype=np.float64)
            if len(x) < 3:
                g = np.linspace(lo_f, hi_f, 512)
                out.append(float(np.trapz(np.interp(g, x, y), g)))
                continue
            m, h = _spline_pieces(x, y)
            cum, b = _cum_at_knots(x, y, m, h)
            out.append(
                float(
                    _value_at(x, y, m, h, b, cum, hi_f)
                    - _value_at(x, y, m, h, b, cum, lo_f)
                )
            )
        return pd.Series(out)

    return df.withColumn("integral", _defint(F.col(xs), F.col(ys)))
