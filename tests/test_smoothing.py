"""Savitzky–Golay contracts (reference W9: savgol_filter(col, 21, 4),
core/data/preprocess.py:77-96). scipy is not available in this
environment; the filter is re-derived as a linear projection (numpy
pinv of the Vandermonde basis), so these tests pin the algebraic
properties that make it *the* SG filter, plus Arrow/native agreement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.smoothing import (
    savgol_kernel,
    savgol_np,
    savgol_projection,
    savgol_smooth,
    savgol_smooth_native,
)


def test_kernel_reproduces_known_quartic_taps():
    # published SG coefficients for w=5, p=2 (Savitzky & Golay 1964):
    # (-3, 12, 17, 12, -3)/35
    k = savgol_kernel(5, 2)
    np.testing.assert_allclose(k, np.array([-3, 12, 17, 12, -3]) / 35.0)


def test_polynomial_passthrough():
    # degree<=polyorder signals are reproduced exactly, edges included
    x = np.arange(60, dtype=float)
    y = 2.0 + 0.5 * x - 0.03 * x**2 + 1e-4 * x**3
    np.testing.assert_allclose(savgol_np(y, 21, 4), y, atol=1e-8)


def test_projection_is_symmetric_and_idempotent():
    p = savgol_projection(21, 4)
    np.testing.assert_allclose(p, p.T, atol=1e-12)
    np.testing.assert_allclose(p @ p, p, atol=1e-10)


def test_short_series_falls_back_to_global_polyfit():
    y = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
    out = savgol_np(y, 21, 4)
    assert len(out) == 5
    coef = np.polynomial.polynomial.polyfit(np.arange(5), y, 4)
    np.testing.assert_allclose(
        out, np.polynomial.polynomial.polyval(np.arange(5), coef), atol=1e-8
    )


def _series_df(spark, n=80, symbols=2):
    rng = np.random.default_rng(7)
    rows = []
    for s in range(symbols):
        vals = np.cumsum(rng.normal(0, 1, n)) + 100
        rows += [(s, int(i), float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "symbol int, time_idx int, close double")


def test_native_interior_matches_numpy_and_arrow_path(spark):
    df = _series_df(spark)
    native = (
        savgol_smooth_native(df, "close")
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    arrow = (
        savgol_smooth(df, ["close"])
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    for sym, g in native.groupby("symbol"):
        y = g["close"].to_numpy()
        expect = savgol_np(y, 21, 4)
        got = g["close_sg"].to_numpy()
        # edges: native emits NULL, arrow path emits polynomial fits
        assert np.isnan(got[:10]).all() and np.isnan(got[-10:]).all()
        np.testing.assert_allclose(got[10:-10], expect[10:-10], atol=1e-9)
        ga = arrow[arrow["symbol"] == sym]["close_sg"].to_numpy()
        np.testing.assert_allclose(ga, expect, atol=1e-9)
