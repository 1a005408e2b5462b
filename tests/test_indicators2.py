"""Second indicator battery contracts: Stochastic/CCI/MFI/Ichimoku
(native frames) and TRIX/PPO/Keltner (Arrow chained recursions) pinned
against pandas reference computations."""

from __future__ import annotations

import numpy as np
import pandas as pd

from big_data_stock_price_forecast_spark.operators.rolling import (
    add_indicators2,
    trend_battery_arrow,
)


def _ohlcv_df(spark, n=80):
    rng = np.random.default_rng(5)
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


def test_stoch_cci_mfi_ichimoku_match_pandas(spark):
    df = _ohlcv_df(spark)
    got = (
        add_indicators2(df)
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    for sym, g in got.groupby("symbol"):
        g = g.reset_index(drop=True)
        h, lo, c, v = g["high"], g["low"], g["close"], g["volume"]
        hh14 = h.rolling(14).max()
        ll14 = lo.rolling(14).min()
        k = 100 * (c - ll14) / (hh14 - ll14)
        d = k.rolling(3).mean()
        tp = (h + lo + c) / 3
        sma_tp = tp.rolling(20).mean()
        mad = tp.rolling(20).apply(
            lambda w: np.abs(w - w.mean()).mean(), raw=True
        )
        cci = (tp - sma_tp) / (0.015 * mad)
        diff = tp.diff()
        pf = (tp * v).where(diff > 0, 0.0)
        nf = (tp * v).where(diff < 0, 0.0)
        # row 0 has no flow direction (no previous tp): the engine
        # counts 14 real flows, so the first MFI lands one row later
        pf.iloc[0] = np.nan
        nf.iloc[0] = np.nan
        mfi = 100 - 100 / (1 + pf.rolling(14).sum() / nf.rolling(14).sum())
        conv = (h.rolling(9).max() + lo.rolling(9).min()) / 2
        base = (h.rolling(26).max() + lo.rolling(26).min()) / 2
        for col, ref in [
            ("stoch_k", k), ("stoch_d", d), ("cci20", cci),
            ("mfi14", mfi), ("ichi_conv", conv), ("ichi_base", base),
        ]:
            gv = g[col].to_numpy()
            rv = ref.to_numpy()
            mask = ~np.isnan(gv)
            assert mask.any(), col
            np.testing.assert_allclose(
                gv[mask], rv[mask], atol=1e-8, err_msg=col
            )
            # null gating matches the pandas warmup NaNs
            assert np.isnan(rv[~mask]).all(), col


def test_trix_ppo_keltner_match_pandas(spark):
    df = _ohlcv_df(spark)
    got = (
        trend_battery_arrow(df)
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    for sym, g in got.groupby("symbol"):
        g = g.reset_index(drop=True)
        c, h, lo = g["close"], g["high"], g["low"]
        e1 = c.ewm(span=15, adjust=False).mean()
        e2 = e1.ewm(span=15, adjust=False).mean()
        e3 = e2.ewm(span=15, adjust=False).mean()
        trix = 100 * e3.diff() / e3.shift(1)
        ppo = (
            100
            * (c.ewm(span=12, adjust=False).mean()
               - c.ewm(span=26, adjust=False).mean())
            / c.ewm(span=26, adjust=False).mean()
        )
        tr = pd.concat(
            [h - lo, (h - c.shift(1)).abs(), (lo - c.shift(1)).abs()], axis=1
        ).max(axis=1)
        atr = tr.ewm(alpha=1.0 / 10, adjust=False).mean()
        mid = c.ewm(span=20, adjust=False).mean()
        for col, ref in [
            ("trix15", trix),
            ("ppo", ppo),
            ("kelt_mid", mid),
            ("kelt_upper", mid + 2 * atr),
            ("kelt_lower", mid - 2 * atr),
        ]:
            gv = g[col].to_numpy()
            rv = ref.to_numpy()
            mask = ~np.isnan(gv)
            assert mask.any(), col
            np.testing.assert_allclose(
                gv[mask], rv[mask], atol=1e-8, err_msg=col
            )


def test_apply_ta_battery_gate(spark):
    """Without the optional `ta` package the escape hatch must fail
    loudly at call time (and work when the package exists)."""
    import pytest

    from big_data_stock_price_forecast_spark.operators.rolling import (
        apply_ta_battery,
    )

    df = spark.createDataFrame(
        [(1, i, 1.0 + i, 2.0 + i, 0.5 + i, 1.5 + i, 100.0)
         for i in range(30)],
        ["symbol", "time_idx", "open", "high", "low", "close", "volume"],
    )
    try:
        import ta  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="ta"):
            apply_ta_battery(df, ["momentum_rsi"])
        return
    out = apply_ta_battery(df, ["momentum_rsi"])
    assert "momentum_rsi" in out.columns
    assert out.count() == 30
