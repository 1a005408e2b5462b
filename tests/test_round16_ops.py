"""Round-16 optimization guards.

The Arrow/NumPy sliding-window build (windows.py ARROW_BUILD_MIN_WIDTH
routing) must be BITWISE-equal to the JVM collect_list path it
replaces: same windows kept/dropped, same center/scale doubles, same
xs/future arrays — including NULL handling (frame NULLs drop the
window, future NULLs compact the array) and odd group shapes (series
shorter than L, exactly L, unsorted arrival order, multi-column
grouping keys).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators import windows as W
from big_data_stock_price_forecast_spark.operators.windows import (
    sliding_windows,
)


def _series(seed: int, lengths: dict[int, int], nulls: dict[int, set[int]]):
    rng = random.Random(seed)
    rows = []
    for sym, n in lengths.items():
        for t in range(n):
            v = (
                None
                if t in nulls.get(sym, set())
                else round(rng.uniform(-5.0, 5.0), 6)
            )
            rows.append((sym, t, v))
    rng.shuffle(rows)  # the arrow path must sort by idx itself
    return rows


def _by_key(rows, *extra):
    return {tuple(getattr(r, c) for c in ("symbol", *extra, "window_id")): r
            for r in rows}


def _assert_bitwise(a_rows, j_rows, has_future, *extra):
    a, j = _by_key(a_rows, *extra), _by_key(j_rows, *extra)
    assert set(a) == set(j)
    assert len(a) > 0
    for k, ra in a.items():
        rj = j[k]
        # tuple equality on python floats is bitwise for finite doubles
        assert ra.center == rj.center, k
        assert ra.scale == rj.scale, k
        assert ra.xs == rj.xs, k
        if has_future:
            assert ra.future == rj.future, k


def test_arrow_window_build_bitwise_parity(spark, monkeypatch):
    # L=70/P=10 (width 80 -> arrow path). Symbol 1: NULL inside the
    # data (drops every window whose L-frame covers t=111; compacts
    # futures that cross it). Symbol 2: just over one window. Symbol
    # 3: shorter than L (the empty-group path). Symbol 4: exactly L.
    rows = _series(
        7,
        {1: 200, 2: 85, 3: 40, 4: 70},
        {1: {111}, 2: {3}},
    )
    df = spark.createDataFrame(
        rows, "symbol int, time_idx long, close double"
    )
    L, P = 70, 10
    assert L + P >= W.ARROW_BUILD_MIN_WIDTH
    arrow = sliding_windows(df, L=L, pred_window=P).collect()
    monkeypatch.setattr(W, "ARROW_BUILD_MIN_WIDTH", 10**9)
    jvm = sliding_windows(df, L=L, pred_window=P).collect()
    _assert_bitwise(arrow, jvm, has_future=True)
    # the NULL at sym1 t=111 must drop exactly windows 42..111 and
    # shorten the futures of windows 32..41
    kept1 = sorted(r.window_id for r in arrow if r.symbol == 1)
    assert kept1 == [*range(0, 42), *range(112, 200 - L + 1)]
    short = {r.window_id: len(r.future) for r in arrow if r.symbol == 1}
    assert all(short[w] == 9 for w in range(32, 42))
    assert short[0] == 10


def test_arrow_window_build_multipart_no_future(spark, monkeypatch):
    rows = [
        (s, sp, t, float((t * 13 + s * 7) % 17) / 3.0 + (0.01 * sp))
        for s in (1, 2)
        for sp in (0, 1)
        for t in range(90 if sp else 75)
    ]
    df = spark.createDataFrame(
        rows, "symbol int, split int, time_idx long, close double"
    )
    arrow = sliding_windows(
        df, L=70, pred_window=0, part_col=["symbol", "split"]
    ).collect()
    monkeypatch.setattr(W, "ARROW_BUILD_MIN_WIDTH", 10**9)
    jvm = sliding_windows(
        df, L=70, pred_window=0, part_col=["symbol", "split"]
    ).collect()
    assert "future" not in arrow[0].asDict()
    _assert_bitwise(arrow, jvm, False, "split")


def test_arrow_window_build_constant_series_eps(spark):
    # constant window -> scale 0 -> xs = (x-center)/eps path, both
    # engines; also proves the arrow path handles a single group
    df = spark.createDataFrame(
        [(1, t, 2.5) for t in range(80)],
        "symbol int, time_idx long, close double",
    )
    out = sliding_windows(df, L=72, pred_window=0).collect()
    assert len(out) == 9
    for r in out:
        assert r.center == 2.5 and r.scale == 0.0
        assert all(x == 0.0 for x in r.xs)
