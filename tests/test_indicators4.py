"""W12 derived-column tail contracts: add_indicators4 (band widths /
%B / band-cross indicators, Donchian analogues, Aroon and Vortex
differentials, raw EOM, percent returns) pinned against pandas
reference computations, mirroring the test_indicators3 protocol."""

from __future__ import annotations

import numpy as np

from big_data_stock_price_forecast_spark.operators.rolling import (
    add_indicators4,
)


def _ohlcv_df(spark, n=90, seed=17):
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


def test_indicators4_match_pandas(spark):
    df = _ohlcv_df(spark)
    got = (
        add_indicators4(df)
        .toPandas()
        .sort_values(["symbol", "time_idx"])
    )
    for _, g in got.groupby("symbol"):
        g = g.reset_index(drop=True)
        c, h, lo, v = g["close"], g["high"], g["low"], g["volume"]

        _assert_col(g, "dr", 100.0 * (c / c.shift() - 1.0))
        _assert_col(g, "dlr", 100.0 * np.log(c / c.shift()))

        midp = (h + lo) / 2.0
        em = (midp - midp.shift()) * (h - lo) / v
        _assert_col(g, "em", em)

        mid = c.rolling(20).mean()
        sd = c.rolling(20).std(ddof=0)
        up, lb = mid + 2 * sd, mid - 2 * sd
        _assert_col(g, "bb_width", (up - lb) / mid * 100.0)
        _assert_col(g, "bb_pband", (c - lb) / (up - lb))
        hi = (c > up).astype(float).where(~up.isna())
        li = (c < lb).astype(float).where(~lb.isna())
        _assert_col(g, "bb_hi", hi)
        _assert_col(g, "bb_li", li)

        du = h.rolling(20).max()
        dl = lo.rolling(20).min()
        _assert_col(g, "don_width", (du - dl) / ((du + dl) / 2.0) * 100.0)
        _assert_col(g, "don_pband", (c - dl) / (du - dl))

        hv, lv = h.to_numpy(), lo.to_numpy()
        n = len(hv)
        a_ind = np.full(n, np.nan)
        for i in range(24, n):
            wh, wl = hv[i - 24 : i + 1], lv[i - 24 : i + 1]
            a_up = 100.0 * int(np.argmax(wh)) / 24.0
            a_dn = 100.0 * int(np.argmin(wl)) / 24.0
            a_ind[i] = a_up - a_dn
        _assert_col(g, "aroon_ind", a_ind)

        pc = c.shift()
        tr = np.fmax(h - lo, np.fmax((h - pc).abs(), (lo - pc).abs()))
        vp = (h - lo.shift()).abs().fillna(0.0)
        vn = (lo - h.shift()).abs().fillna(0.0)
        trs = tr.rolling(14, min_periods=1).sum()
        vdiff = vp.rolling(14, min_periods=1).sum() / trs - vn.rolling(
            14, min_periods=1
        ).sum() / trs
        _assert_col(g, "vortex_diff", vdiff)


def test_indicators4_degenerate_inputs(spark):
    """Flat series + zero volume: band width 0, %B guarded to NULL
    (zero-width band), em NULL where volume is 0, no errors raised."""
    rows = [(0, i, 10.0, 10.0, 10.0, 0.0 if i == 30 else 5.0)
            for i in range(40)]
    df = spark.createDataFrame(
        rows,
        "symbol int, time_idx int, close double, high double, low double,"
        " volume double",
    )
    g = add_indicators4(df).toPandas().sort_values("time_idx")
    tail = g[g["time_idx"] >= 19]
    assert (tail["bb_width"] == 0.0).all()
    assert tail["bb_pband"].isna().all()  # zero-width band -> NULL
    assert (tail["bb_hi"] == 0.0).all() and (tail["bb_li"] == 0.0).all()
    assert g.loc[g["time_idx"] == 30, "em"].isna().all()  # volume 0
    assert (tail["don_width"] == 0.0).all()
    assert tail["don_pband"].isna().all()
