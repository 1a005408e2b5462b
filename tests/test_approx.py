"""Approximate-aggregate swap-ins: the registry's exact quantile and
distinct-count queries document `percentile_approx` / HLL as their
100 TB replacements — verify the approximations actually land within
their error bounds on real data, so that claim is tested, not folklore.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_percentile_approx_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    row = ev.agg(
        F.expr("percentile(value, array(0.25D, 0.5D, 0.9D))").alias("exact"),
        F.percentile_approx(
            "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)), 10000
        ).alias("approx"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    spread = row["hi"] - row["lo"]
    for e, a in zip(row["exact"], row["approx"]):
        # accuracy=10000 -> rank error <= n/10000; translate loosely to
        # a value tolerance of 1% of the spread
        assert abs(e - a) <= 0.01 * spread, (e, a)


def test_hll_distinct_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(
        3, 0.05 * row["exact"]
    ), row
