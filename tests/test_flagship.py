"""End-to-end smoke + a hand-checkable miniature of forecast_evaluate."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.forecast import (
    error_summary,
    forecast_evaluate,
)
from big_data_stock_price_forecast_spark.operators.windows import sliding_windows
from big_data_stock_price_forecast_spark.plans import flagship_per_query_mae


def test_forecast_evaluate_hand_checked(spark):
    # one symbol, linear series: every window identical after z-score, so
    # nearest matches are everything; ensemble of top-2 by tie-break
    # (lowest window_id) predicts from the earliest windows
    vals = [float(i) for i in range(12)]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "symbol string, time_idx long, close double",
    )
    w = sliding_windows(df, L=4, pred_window=2)
    train = w.filter(F.col("window_id") <= 4)
    val = w.filter(F.col("window_id") == 6)
    out = forecast_evaluate(train, val, pred_window=2, k=5, ensemble=2).collect()
    assert len(out) == 1
    # all z-scored windows identical -> dist 0 -> picks window_id 0,1
    # match 0: future [4,5] -> z by (center=1.5, scale=std([0..3]))
    arr = np.arange(4.0)
    s = arr.std() + 1e-8
    pred0 = (np.array([4.0, 5.0]) - 1.5) / s
    pred1 = (np.array([5.0, 6.0]) - 2.5) / s
    pred = (pred0 + pred1) / 2
    target = (np.array([10.0, 11.0]) - 7.5) / s
    assert out[0].mae == pytest.approx(np.abs(pred - target).mean())


def test_flagship_smoke(spark, sf_dir):
    df = flagship_per_query_mae(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"symbol", "window_id", "mae"}
    assert all(r.mae >= 0 for r in rows)
    summ = error_summary(df).first()
    assert summ.n_queries == len(rows)
