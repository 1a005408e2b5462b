"""Salted-join contract: identical results to the plain join on a
pathologically skewed key distribution, with the fact side's shuffle
spread across (key, salt) instead of one hot partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows share one key — the shape that melts a reducer
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(50)], ["k", "name"]
    )
    got = salted_join(fact, dim, "k", num_salts=8)
    plain = fact.join(dim, "k")
    assert got.count() == plain.count()
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0

    # outer flavor: fact rows without a dim match survive exactly once
    dim_partial = dim.filter(F.col("k") < 5)
    got_left = salted_join(fact, dim_partial, "k", how="left")
    plain_left = fact.join(dim_partial, "k", "left")
    assert got_left.count() == plain_left.count()
    assert got_left.exceptAll(plain_left).count() == 0


def test_salt_is_deterministic_across_runs(spark):
    fact = spark.range(500).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "x")], ["k", "name"])
    a = salted_join(fact, dim, "k").orderBy("payload").collect()
    b = salted_join(fact, dim, "k").orderBy("payload").collect()
    assert a == b


def test_salted_join_key_only_fact(spark):
    fact = spark.range(100).select((F.col("id") % 3).alias("k"))
    dim = spark.createDataFrame([(0, "a"), (1, "b")], ["k", "name"])
    got = salted_join(fact, dim, "k")
    plain = fact.join(dim, "k")
    assert got.count() == plain.count()
    assert got.exceptAll(plain).count() == 0


def test_salted_join_rejects_dim_preserving_how(spark):
    import pytest

    fact = spark.range(10).select((F.col("id") % 3).alias("k"))
    dim = spark.createDataFrame([(0, "a")], ["k", "name"])
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(fact, dim, "k", how=how)
    # semi/anti are fact-side-preserving and stay allowed
    assert salted_join(fact, dim, "k", how="left_semi").count() == 4
    assert salted_join(fact, dim, "k", how="left_anti").count() == 6
