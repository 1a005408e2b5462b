"""W12 recursive-base derived tail contracts: ppo/pvo signal + hist,
Keltner width/%B, StochRSI %K/%D, PSAR up/down splits + flip
indicators — add_indicators5 over recursive_battery_arrow, pinned
against pandas reference computations plus degenerate-input guards."""

from __future__ import annotations

import numpy as np
import pandas as pd

from big_data_stock_price_forecast_spark.operators.rolling import (
    add_indicators5,
    recursive_battery_arrow,
)


def _ohlcv_df(spark, n=90, seed=23):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(2):
        close = np.cumsum(rng.normal(0, 1, n)) + 100
        high = close + np.abs(rng.normal(0, 0.5, n))
        low = close - np.abs(rng.normal(0, 0.5, n))
        vol = rng.integers(1, 100, n).astype(float)
        rows += [
            (s, int(i), float(close[i]), float(high[i]), float(low[i]),
             float(vol[i]))
            for i in range(n)
        ]
    return spark.createDataFrame(
        rows,
        "symbol int, time_idx int, close double, high double, low double,"
        " volume double",
    )


def _assert_col(g, col, ref, atol=1e-8):
    gv = g[col].to_numpy()
    rv = np.asarray(ref, dtype=float)
    mask = ~np.isnan(gv)
    assert mask.any(), col
    np.testing.assert_allclose(gv[mask], rv[mask], atol=atol, err_msg=col)


def test_indicators5_match_pandas(spark):
    df = _ohlcv_df(spark)
    got = (
        add_indicators5(recursive_battery_arrow(df))
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    for _, g in got.groupby("symbol"):
        g = g.reset_index(drop=True)
        c, v = g["close"], g["volume"]
        e12 = c.ewm(alpha=2.0 / 13.0, adjust=False).mean()
        e26 = c.ewm(alpha=2.0 / 27.0, adjust=False).mean()
        ppo = 100.0 * (e12 - e26) / e26
        ppo_sig = ppo.ewm(alpha=2.0 / 10.0, adjust=False).mean()
        ev12 = v.ewm(alpha=2.0 / 13.0, adjust=False).mean()
        ev26 = v.ewm(alpha=2.0 / 27.0, adjust=False).mean()
        pvo = 100.0 * (ev12 - ev26) / ev26
        pvo_sig = pvo.ewm(alpha=2.0 / 10.0, adjust=False).mean()
        up, lb, mid = g["kelt_upper"], g["kelt_lower"], g["kelt_mid"]
        srk = g["stoch_rsi"].rolling(3).mean()
        srd = srk.rolling(3).mean()
        for col, ref in [
            ("ppo_signal", ppo_sig), ("ppo_hist", ppo - ppo_sig),
            ("pvo_signal", pvo_sig), ("pvo_hist", pvo - pvo_sig),
            ("kc_width", (up - lb) / mid * 100.0),
            ("kc_pband", (c - lb) / (up - lb)),
            ("stochrsi_k", srk), ("stochrsi_d", srd),
        ]:
            _assert_col(g, col, ref)


def test_derived_tail_matches_native_twin_bitwise(spark):
    """The in-pass ``derived_tail=True`` emission (one shuffle) and the
    composable native-Window twin ``add_indicators5`` must agree
    BITWISE — same fold order, same guards — so either path can serve
    the same oracle."""
    df = _ohlcv_df(spark, seed=37)
    cols = [
        "ppo_hist", "pvo_hist", "kc_width", "kc_pband",
        "stochrsi_k", "stochrsi_d", "psar_up", "psar_down",
        "psar_up_ind", "psar_down_ind",
    ]
    key = ["symbol", "time_idx"]
    inpass = (
        recursive_battery_arrow(df, derived_tail=True)
        .select(key + cols)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    native = (
        add_indicators5(recursive_battery_arrow(df))
        .select(key + cols)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    for col in cols:
        a, b = inpass[col].to_numpy(), native[col].to_numpy()
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=col)
        m = ~np.isnan(a)
        assert (a[m] == b[m]).all(), col  # bitwise, not approx


def test_indicators5_psar_splits(spark):
    df = _ohlcv_df(spark, seed=29)
    got = (
        add_indicators5(recursive_battery_arrow(df))
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    for _, g in got.groupby("symbol"):
        g = g.reset_index(drop=True)
        d = g["psar_dir"].to_numpy()
        up_mask = d == 1.0
        # value splits: psar_up populated exactly on uptrend bars
        assert (~np.isnan(g["psar_up"].to_numpy()) == up_mask).all()
        assert (~np.isnan(g["psar_down"].to_numpy()) == ~up_mask).all()
        np.testing.assert_allclose(
            g["psar_up"].to_numpy()[up_mask],
            g["psar"].to_numpy()[up_mask],
        )
        # flip indicators: 1.0 exactly where dir changes sign, 0.0 else
        flips_up = np.zeros(len(d))
        flips_dn = np.zeros(len(d))
        flips_up[1:] = (d[1:] == 1.0) & (d[:-1] == -1.0)
        flips_dn[1:] = (d[1:] == -1.0) & (d[:-1] == 1.0)
        np.testing.assert_array_equal(g["psar_up_ind"].to_numpy(), flips_up)
        np.testing.assert_array_equal(
            g["psar_down_ind"].to_numpy(), flips_dn
        )
        # a random walk must flip at least once each way
        assert flips_up.sum() >= 1 and flips_dn.sum() >= 1


def test_indicators5_degenerate_series(spark):
    """Flat price + zero volume: ppo defined (EMA26 of a positive
    constant is nonzero) and identically 0, pvo null (EMA26(volume)=0)
    with its signal riding the documented 0.0 fallback, Keltner width 0
    / %B null (zero-width channel), StochRSI chain all-null (flat RSI
    range), PSAR never flips (seeded uptrend holds)."""
    df = spark.createDataFrame(
        [(1, i, 5.0, 5.0, 5.0, 0.0) for i in range(40)],
        ["symbol", "time_idx", "close", "high", "low", "volume"],
    )
    g = (
        add_indicators5(recursive_battery_arrow(df))
        .toPandas()
        .sort_values("time_idx")
        .reset_index(drop=True)
    )
    assert (g["ppo_signal"] == 0.0).all()
    assert (g["ppo_hist"] == 0.0).all()
    assert g["pvo_hist"].isna().all()
    assert (g["pvo_signal"] == 0.0).all()
    assert (g["kc_width"] == 0.0).all()
    assert g["kc_pband"].isna().all()
    assert g["stochrsi_k"].isna().all()
    assert g["stochrsi_d"].isna().all()
    assert (g["psar_up_ind"] == 0.0).all()
    assert (g["psar_down_ind"] == 0.0).all()
    assert g["psar_down"].isna().all()
    assert not np.isinf(g.select_dtypes(float).to_numpy()).any()


def test_stochrsi_k_null_propagation(spark):
    """A mid-series flat-RSI hole (constant close run) nulls stoch_rsi;
    the 3-SMA count guard must null every frame containing the hole —
    pandas rolling(3).mean() NaN-propagation semantics."""
    rng = np.random.default_rng(31)
    close = list(np.cumsum(rng.normal(0, 1, 40)) + 100)
    close[20:34] = [close[20]] * 14  # 14 flat bars -> null stoch_rsi
    rows = [
        (1, i, float(close[i]), float(close[i]) + 0.5,
         float(close[i]) - 0.5, 10.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "symbol int, time_idx int, close double, high double, low double,"
        " volume double",
    )
    g = (
        add_indicators5(recursive_battery_arrow(df))
        .toPandas()
        .sort_values("time_idx")
        .reset_index(drop=True)
    )
    srk = g["stoch_rsi"].rolling(3).mean()
    got = g["stochrsi_k"].to_numpy()
    np.testing.assert_array_equal(np.isnan(got), srk.isna().to_numpy())
    mask = ~srk.isna().to_numpy()
    assert mask.any() and not mask.all()
    np.testing.assert_allclose(got[mask], srk.to_numpy()[mask], atol=1e-8)
