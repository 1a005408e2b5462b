"""Contracts: window count = n-L+1, stddev_pop (ddof=0) + eps=1e-8
z-score, future array gather, distance functions vs numpy, kNN top-k
ordering and tie-breaks."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.functions.distance import (
    cos_sim,
    dist_l1,
    dist_l2,
    weighted_dist,
)
from big_data_stock_price_forecast_spark.operators.knn import (
    knn_bruteforce,
    knn_lsh,
)
from big_data_stock_price_forecast_spark.operators.windows import sliding_windows


def test_sliding_windows_zscore_contract(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "symbol string, time_idx long, close double",
    )
    out = sliding_windows(df, L=4, pred_window=2).orderBy("window_id").collect()
    # count = 6 - 4 + 1
    assert len(out) == 3
    w0 = out[0]
    arr = np.array(vals[:4])
    assert w0.center == pytest.approx(arr.mean())
    assert w0.scale == pytest.approx(arr.std())  # ddof=0 (population)
    expect = (arr - arr.mean()) / (arr.std() + 1e-8)
    assert np.allclose(w0.xs, expect)
    assert w0.future == [5.0, 6.0]
    assert out[1].future == [6.0]  # partial future at the tail
    assert out[2].future == []


def test_constant_window_eps(spark):
    df = spark.createDataFrame(
        [("a", i, 7.0) for i in range(4)],
        "symbol string, time_idx long, close double",
    )
    w = sliding_windows(df, L=4).first()
    assert w.scale == 0.0
    assert w.xs == [0.0] * 4  # 0/(0+1e-8), not NaN


def test_distances_vs_numpy(spark):
    a = [1.0, -2.0, 3.0, 0.5]
    b = [0.0, 1.0, -1.0, 2.0]
    df = spark.createDataFrame(
        [(a, b)], "a array<double>, b array<double>"
    )
    r = df.select(
        dist_l1("a", "b").alias("l1"),
        dist_l2("a", "b").alias("l2"),
        cos_sim("a", "b").alias("cos"),
        weighted_dist("a", "b", 2).alias("wd"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert r.l1 == pytest.approx(np.abs(na - nb).sum())
    assert r.l2 == pytest.approx(np.linalg.norm(na - nb))
    assert r.cos == pytest.approx(
        na.dot(nb) / (np.linalg.norm(na) * np.linalg.norm(nb))
    )
    assert r.wd == pytest.approx(
        np.linalg.norm(na[:2] - nb[:2]) + np.linalg.norm(na[2:] - nb[2:]) / 2
    )


def _vec_df(spark):
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),   # tie with 1 at distance 1 from origin
        (3, [2.0, 2.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, vec array<double>")


def test_knn_bruteforce_l2_with_ties(spark):
    vectors = _vec_df(spark)
    queries = spark.createDataFrame(
        [(100, [0.0, 0.0])], "q_id long, q_vec array<double>"
    )
    out = knn_bruteforce(vectors, queries, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [0, 1, 2]  # tie 1-vs-2 -> lower id first
    assert out[0].dist == 0.0
    assert out[1].dist == pytest.approx(1.0)


def test_knn_cosine_descending(spark):
    vectors = _vec_df(spark).filter("vec_id != 0")  # zero vector undefined
    queries = spark.createDataFrame(
        [(100, [1.0, 1.0])], "q_id long, q_vec array<double>"
    )
    out = knn_bruteforce(vectors, queries, k=3, metric="cosine").collect()
    assert out[0].vec_id == 3  # exactly parallel
    assert out[0].dist == pytest.approx(1.0)


def test_knn_lsh_recovers_exact_neighbors(spark):
    rng = np.random.default_rng(0)
    base = rng.normal(size=(200, 8))
    vectors = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(base)],
        "vec_id long, vec array<double>",
    )
    queries = spark.createDataFrame(
        [(0, base[17].tolist())], "q_id long, q_vec array<double>"
    )
    exact = knn_bruteforce(vectors, queries, k=3).collect()
    approx = knn_lsh(
        vectors, queries, k=3, bucket_length=4.0, num_hash_tables=6
    ).collect()
    assert approx[0].vec_id == 17 == exact[0].vec_id
