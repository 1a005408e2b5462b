"""Contracts from SURVEY.md §2.2/§2.6: keep-last dedup, min+age time
filter, null-ratio pruning threshold, positional skip/split."""

import datetime as dt

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.cleaning import (
    dedup_keep_last,
    drop_nulls,
    null_ratio_prune,
    positional_skip_frac,
    positional_split,
    time_range_filter,
)


def _ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_dedup_keep_last(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(0), 1.0, 1),
            ("a", _ts(0), 2.0, 2),  # later arrival wins
            ("a", _ts(1), 3.0, 3),
            ("b", _ts(0), 4.0, 4),
        ],
        "symbol string, datetime timestamp, close double, arrival int",
    )
    out = dedup_keep_last(df, ["symbol", "datetime"], "arrival")
    rows = {(r.symbol, r.datetime): r.close for r in out.collect()}
    assert rows[("a", _ts(0))] == 2.0
    assert len(rows) == 3


def test_time_range_filter(spark):
    df = spark.createDataFrame(
        [("a", _ts(0)), ("a", _ts(5)), ("a", _ts(10)), ("b", _ts(100))],
        "symbol string, datetime timestamp",
    )
    out = time_range_filter(df, min_age="6 hours")
    got = {(r.symbol, r.datetime) for r in out.collect()}
    # per-symbol min + 6h: 'a' keeps hour 10 only; 'b' min is its own row
    # and min+6h > it, so 'b' keeps nothing
    assert got == {("a", _ts(10))}


def test_null_ratio_prune_threshold(spark):
    # 'sparse' is 70% null -> dropped at the reference's 0.85 threshold
    rows = [(i, 1.0 if i < 3 else None) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, sparse double")
    out = null_ratio_prune(df, threshold=0.85)
    assert out.columns == ["id"]
    # a column exactly at 85% non-null is also dropped (strict >)
    rows = [(i, 1.0 if i < 85 else None) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, edge double")
    assert null_ratio_prune(df, 0.85).columns == ["id"]


def test_drop_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None)], "id long, v double"
    )
    assert drop_nulls(df).count() == 1


def test_positional_skip_frac(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(25)], "symbol string, time_idx long"
    )
    out = positional_skip_frac(df, "symbol", "time_idx", 0.1)
    # floor(25*0.1)=2 rows dropped
    assert out.count() == 23
    assert out.agg(F.min("time_idx")).first()[0] == 2


def test_positional_split(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(20)], "symbol string, time_idx long"
    )
    train, val = positional_split(df, "symbol", "time_idx", 0.15)
    # val = floor(20*.15)=3 tail rows
    assert val.count() == 3
    assert train.count() == 17
    assert val.agg(F.min("time_idx")).first()[0] == 17
