"""Contracts for the two-phase bucketed prefix aggregate — it must be
bitwise-identical to the single-task global window it replaces, across
agg kinds, directions, strictness, and bucket-boundary ties."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.twophase import (
    log2_bucket,
    prefix_agg,
)


def _frame(spark):
    # values straddling log2 bucket boundaries (1, 2, 4, 8...) with
    # duplicates ON the boundary so bucket-edge ties are exercised
    vals = [0.5, 1.0, 1.0, 1.9, 2.0, 2.0, 3.5, 4.0, 7.9, 8.0, 8.0, 100.0]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["id", "x"]
    )


@pytest.mark.parametrize("agg", ["sum", "max", "count"])
@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("asc", [True, False])
def test_prefix_agg_matches_global_window(spark, agg, strict, asc):
    df = _frame(spark)
    order = [F.col("x").asc(), F.col("id").asc()] if asc else [
        F.col("x").desc(), F.col("id").asc()
    ]
    got = prefix_agg(
        df,
        F.col("x"),
        log2_bucket(F.col("x")),
        order,
        agg=agg,
        bucket_asc=asc,
        strict=strict,
        out_col="p",
    )
    end = -1 if strict else 0
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, end)
    aggf = {"sum": F.sum, "max": F.max, "count": F.count}[agg]
    v = F.lit(1) if agg == "count" else F.col("x")
    want = df.withColumn("p", aggf(v).over(w))
    g = {r["id"]: r["p"] for r in got.collect()}
    e = {r["id"]: r["p"] for r in want.collect()}
    assert g == e, f"agg={agg} strict={strict} asc={asc}: {g} != {e}"


def test_prefix_agg_has_no_unpartitioned_row_window(spark):
    # the scale contract: the plan's only unpartitioned window runs
    # over the bucket-total frame (bucket-count-sized), never over the
    # row frame — assert the row-frame window carries a partition key
    df = _frame(spark)
    out = prefix_agg(
        df,
        F.col("x"),
        log2_bucket(F.col("x")),
        [F.col("x").asc(), F.col("id").asc()],
        agg="max",
        out_col="p",
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    windows = re.findall(r"Window \[.*?\]", plan)
    # exactly one window may be unpartitioned — the bucket-level one,
    # identifiable by its input being an Aggregate over the bucket col
    unpart = [w for w in windows if "windowspecdefinition(" in w
              and "__tp_bucket" not in w.split("windowspecdefinition")[1][:200]]
    assert not unpart, f"row-frame window lost its partition key: {unpart}"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=40,
    )
)
def test_prefix_agg_randomized_matches_global_window(spark, xs):
    # randomized INTEGER frames incl. duplicates and bucket-boundary
    # values: the two-phase prefix must equal the single-task global
    # window exactly. (Association-exact types only — a raw DOUBLE sum
    # re-associates additions across the bucket combine and CAN differ
    # in the last ulp; hypothesis found the counterexample
    # [1.249…, 262144.076…, 262145.0, 0.0, 262144.0], which is why
    # prefix_agg's contract and every registry call site restrict
    # float sums to the snap-to-grid → DECIMAL form.)
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], ["id", "x"]
    )
    got = prefix_agg(
        df,
        F.col("x"),
        log2_bucket(F.col("x")),
        [F.col("x").asc(), F.col("id").asc()],
        agg="sum",
        strict=True,
        out_col="p",
    )
    w = Window.orderBy(F.col("x").asc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.withColumn("p", F.sum("x").over(w))
    g = {r["id"]: r["p"] for r in got.collect()}
    e = {r["id"]: r["p"] for r in want.collect()}
    assert g == e


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
def test_prefix_agg_randomized_float_max_matches(spark, xs):
    # max IS association-exact for floats — randomized check
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(xs)], ["id", "x"]
    )
    got = prefix_agg(
        df,
        F.col("x"),
        log2_bucket(F.col("x")),
        [F.col("x").asc(), F.col("id").asc()],
        agg="max",
        strict=True,
        out_col="p",
    )
    w = Window.orderBy(F.col("x").asc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.withColumn("p", F.max("x").over(w))
    g = {r["id"]: r["p"] for r in got.collect()}
    e = {r["id"]: r["p"] for r in want.collect()}
    assert g == e


from big_data_stock_price_forecast_spark.operators.twophase import (  # noqa: E402
    ntile_two_phase,
)


@pytest.mark.parametrize("buckets", [2, 5])
@pytest.mark.parametrize("asc", [True, False])
def test_ntile_two_phase_matches_global_ntile(spark, buckets, asc):
    df = _frame(spark)
    order = [F.col("x").asc(), F.col("id").asc()] if asc else [
        F.col("x").desc(), F.col("id").asc()
    ]
    got = ntile_two_phase(
        df,
        order,
        log2_bucket(F.col("x")),
        buckets,
        bucket_asc=asc,
        out_col="t",
    )
    want = df.withColumn(
        "t", F.ntile(buckets).over(Window.orderBy(*order))
    )
    g = {r["id"]: r["t"] for r in got.collect()}
    e = {r["id"]: r["t"] for r in want.collect()}
    assert g == e, f"buckets={buckets} asc={asc}: {g} != {e}"


def test_ntile_two_phase_fewer_rows_than_buckets(spark):
    # N < n: ntile gives each row its own bucket (rank itself); the
    # closed form's otherwise-branch (q=0 divisor) must never fire
    df = spark.createDataFrame([(0, 3.0), (1, 1.0)], ["id", "x"])
    got = ntile_two_phase(
        df,
        [F.col("x").asc(), F.col("id").asc()],
        log2_bucket(F.col("x")),
        5,
        out_col="t",
    )
    assert {r["id"]: r["t"] for r in got.collect()} == {0: 2, 1: 1}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_ntile_two_phase_randomized(spark, xs, buckets):
    # randomized incl. duplicate values (tie-broken by id) and
    # N % buckets != 0 splits — must equal the single-task ntile
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], ["id", "x"]
    )
    order = [F.col("x").asc(), F.col("id").asc()]
    got = ntile_two_phase(
        df, order, log2_bucket(F.col("x")), buckets, out_col="t"
    )
    want = df.withColumn(
        "t", F.ntile(buckets).over(Window.orderBy(*order))
    )
    g = {r["id"]: r["t"] for r in got.collect()}
    e = {r["id"]: r["t"] for r in want.collect()}
    assert g == e


def test_ntile_two_phase_has_no_unpartitioned_row_window(spark):
    # same scale contract as prefix_agg: the only unpartitioned
    # window may be the bucket-total one
    df = _frame(spark)
    out = ntile_two_phase(
        df,
        [F.col("x").asc(), F.col("id").asc()],
        log2_bucket(F.col("x")),
        5,
        out_col="t",
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    windows = re.findall(r"Window \[.*?\]", plan)
    unpart = [w for w in windows if "windowspecdefinition(" in w
              and "__tp_bucket" not in w.split("windowspecdefinition")[1][:200]]
    assert not unpart, f"row-frame window lost its partition key: {unpart}"
