"""Contracts: right-closed/right-labeled resample, gap fill + ffill,
timeframe inference (>=99% dominant delta), calendar conventions
(Mon=0 weekday, 2000-01-01 time_idx anchor)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.functions.calendar import (
    add_calendar,
    add_time_idx,
)
from big_data_stock_price_forecast_spark.operators.gapfill import (
    fill_missing_time_idx,
)
from big_data_stock_price_forecast_spark.operators.resample import resample_ohlcv
from big_data_stock_price_forecast_spark.operators.timeframe import infer_timeframe


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_resample_right_closed_right_labeled(spark):
    # pandas resample(closed='right', label='right'): a point exactly on
    # a boundary belongs to the bucket LABELED with that boundary
    df = spark.createDataFrame(
        [
            ("a", _ts(0), 1.0),    # 00:00 -> bucket labeled 00:00
            ("a", _ts(30), 2.0),   # 00:30 -> bucket labeled 01:00
            ("a", _ts(60), 3.0),   # 01:00 -> bucket labeled 01:00 (right-closed)
            ("a", _ts(61), 4.0),   # 01:01 -> bucket labeled 02:00
        ],
        "symbol string, datetime timestamp, close double",
    )
    out = resample_ohlcv(df, "1 hour").orderBy("datetime").collect()
    labels = [(r.datetime, r.open, r.close, r.high, r.low, r.n_rows) for r in out]
    assert labels == [
        (_ts(0), 1.0, 1.0, 1.0, 1.0, 1),
        (_ts(60), 2.0, 3.0, 3.0, 2.0, 2),
        (_ts(120), 4.0, 4.0, 4.0, 4.0, 1),
    ]


def test_resample_ohlcv_full(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(10), 10.0, 12.0, 9.0, 11.0, 5.0),
            ("a", _ts(20), 11.0, 15.0, 10.0, 14.0, 7.0),
        ],
        "symbol string, datetime timestamp, open double, high double,"
        " low double, close double, volume double",
    )
    r = resample_ohlcv(df, "1 hour").first()
    assert (r.open, r.high, r.low, r.close, r.volume) == (10.0, 15.0, 9.0, 14.0, 12.0)


def test_gap_fill_ffill(spark):
    df = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 103, 2.0), ("b", 200, 9.0)],
        "symbol string, time_idx long, close double",
    )
    out = fill_missing_time_idx(
        df, ts_col="__none__", fill_cols=["close"]
    ).orderBy("symbol", "time_idx")
    rows = [(r.symbol, r.time_idx, r.close, r.is_gap) for r in out.collect()]
    assert rows == [
        ("a", 100, 1.0, 0),
        ("a", 101, 1.0, 1),
        ("a", 102, 1.0, 1),
        ("a", 103, 2.0, 0),
        ("b", 200, 9.0, 0),
    ]


def test_gap_fill_reconstructs_datetime(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2000, 1, 1, 0), 1.0), ("a", dt.datetime(2000, 1, 1, 2), 2.0)],
        "symbol string, datetime timestamp, close double",
    )
    df = add_time_idx(df, "datetime", 3600)
    out = fill_missing_time_idx(df, step_seconds=3600, fill_cols=["close"])
    got = {r.time_idx: r.datetime for r in out.collect()}
    assert got[1] == dt.datetime(2000, 1, 1, 1)  # gap row gets a real ts


def test_infer_timeframe(spark):
    rows = [("a", _ts(60 * i)) for i in range(200)]
    df = spark.createDataFrame(rows, "symbol string, datetime timestamp")
    assert infer_timeframe(df) == 3600


def test_infer_timeframe_mismatch_raises(spark):
    rows = [("a", _ts(60 * i)) for i in range(10)] + [
        ("a", _ts(600 + 90 * i)) for i in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "symbol string, datetime timestamp")
    with pytest.raises(ValueError, match="Mismatch in dataset timeframe"):
        infer_timeframe(df)


def test_calendar_weekday_mon0_and_time_idx_anchor(spark):
    # 2024-01-01 is a Monday -> weekday 0 (pandas convention);
    # time_idx anchor is 2000-01-01 (preprocess.py:39)
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 5)), ("a", dt.datetime(2024, 1, 7, 0))],
        "symbol string, datetime timestamp",
    )
    out = add_calendar(add_time_idx(df)).orderBy("datetime").collect()
    assert out[0].dayofweek == 0 and out[1].dayofweek == 6
    assert out[0].hour == 5
    hours_2000_to_2024 = (dt.datetime(2024, 1, 1, 5) - dt.datetime(2000, 1, 1)).total_seconds() / 3600
    assert out[0].time_idx == int(hours_2000_to_2024)


def test_parse_timeframe_contract():
    """F1 (core/data/utils.py:7-22): count+unit, case-sensitive m/M,
    month=30d and year=365d approximations."""
    import pytest

    from big_data_stock_price_forecast_spark.functions.calendar import (
        parse_timeframe,
    )

    assert parse_timeframe("1m") == 60
    assert parse_timeframe("4h") == 4 * 3600
    assert parse_timeframe("1d") == 86400
    assert parse_timeframe("2w") == 14 * 86400
    assert parse_timeframe("1M") == 30 * 86400
    assert parse_timeframe("1y") == 365 * 86400
    for bad in ("1x", "h", "1.5h", "", "h1"):
        with pytest.raises(ValueError):
            parse_timeframe(bad)


def test_asof_join_matches_pandas_merge_asof(spark):
    """asof_join (union-tag single-shuffle plan) == pandas merge_asof
    backward-inclusive semantics, including the no-match NULL row and
    the at-same-timestamp inclusive pick."""
    import pandas as pd
    from pyspark.sql import functions as F

    from big_data_stock_price_forecast_spark.operators.asof import asof_join

    t0 = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3],
            "lts": [
                t0,                              # exact tie with right @t0
                t0 + pd.Timedelta(minutes=5),
                t0 + pd.Timedelta(minutes=30),
                t0 + pd.Timedelta(minutes=1),
                t0,                              # key with no right rows
            ],
            "lid": [10, 11, 12, 20, 30],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "rts": [t0, t0 + pd.Timedelta(minutes=10), t0 + pd.Timedelta(minutes=2)],
            "rv": [100.0, 200.0, 300.0],
            "rid": [1, 2, 3],
        }
    )
    for df, c in ((left, "lts"), (right, "rts")):
        df[c] = df[c].astype("datetime64[us]")
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on=["k"],
        left_ts="lts",
        right_ts="rts",
        right_tiebreak="rid",
    ).toPandas().sort_values("lid").reset_index(drop=True)

    expect = pd.merge_asof(
        left.sort_values("lts"),
        right.sort_values("rts"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)
    assert list(out["lid"]) == list(expect["lid"])
    for a, b in zip(out["rv"], expect["rv"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b
    for a, b in zip(out["rid"], expect["rid"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b
