"""Round-13 contracts: the flagship metric sweep (the reference's
headline dist_func_eval table), the fixed-budget anchor sampler, and
the fullscale-config oracle twin (added below as batches land)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _snap(x: float, n: int = 6) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s + 0.0


# ------------------------------------------------- metric sweep


def test_metric_sweep_l2_branch_equals_summary(spark):
    """The sweep's L2 row must be BITWISE the flagship_summary row
    (same pipeline, same scorer — the sweep only parameterizes the
    metric), and every scorer evaluates the SAME query panel."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        FLAGSHIP_SWEEP_METRICS,
        q_flagship_metric_sweep,
        q_flagship_summary,
    )

    sweep = {r["metric"]: r for r in
             q_flagship_metric_sweep(spark, SF).collect()}
    assert set(sweep) == set(FLAGSHIP_SWEEP_METRICS)
    summ = q_flagship_summary(spark, SF).collect()[0]
    l2 = sweep["l2"]
    assert l2["mae_mean"] == summ["mae_mean"]
    assert l2["mae_std"] == summ["mae_std"]
    assert l2["n_queries"] == summ["n_queries"]
    # the scorer changes WHICH matches are ensembled, never which
    # queries are evaluated: the panel size is scorer-independent
    for r in sweep.values():
        assert r["n_queries"] == summ["n_queries"]
        assert r["mae_mean"] is not None and r["mae_std"] is not None


def test_metric_sweep_scorers_differ(spark):
    """L1 and L2 rank differently on real data — identical rows for
    every scorer would mean the metric parameter is dead."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_flagship_metric_sweep,
    )

    sweep = {r["metric"]: r for r in
             q_flagship_metric_sweep(spark, SF).collect()}
    means = {m: r["mae_mean"] for m, r in sweep.items()}
    assert len(set(means.values())) >= 2


def test_forecast_cosine_zero_norm_guard(spark):
    """A constant (zero-norm after z-score) candidate window must rank
    LAST under the cosine scorer (the -2.0 sentinel), not error under
    ANSI division or float-NULL-order divergence."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.operators.forecast import (
        forecast_evaluate,
    )

    L, P = 4, 2

    def win(sym, wid, xs, future, center=0.0, scale=1.0):
        return (sym, wid, center, scale, xs, future)

    cols = ["symbol", "window_id", "center", "scale", "xs", "future"]
    train = spark.createDataFrame(
        pd.DataFrame(
            [
                # zero-norm candidate: cosine undefined -> sentinel
                win(1, 10, [0.0] * L, [1.0, 1.0]),
                # aligned candidate: cosine 1.0 -> must win
                win(1, 11, [1.0, -1.0, 1.0, -1.0], [2.0, 2.0]),
            ],
            columns=cols,
        )
    )
    val = spark.createDataFrame(
        pd.DataFrame(
            [win(1, 99, [1.0, -1.0, 1.0, -1.0], [0.0, 0.0])],
            columns=cols,
        )
    )
    steps = forecast_evaluate(
        train, val, pred_window=P, k=2, ensemble=1, metric="cosine",
        dim=L, return_steps=True,
    ).collect()
    # ensemble=1 and the zero-norm window ranked last -> every pred
    # step comes from window 11's future (2.0, 2.0), rescaled by its
    # own center/scale (0, 1) through the z-score eps: 2/(1+1e-8)
    assert len(steps) == P
    exp = 2.0 / (1.0 + 1e-8)
    assert all(r["pred"] == exp for r in steps)


# --------------------------------------------- anchor sampler


def test_anchor_sample_budget_and_determinism(spark):
    """anchor_sample keeps exactly `budget` rows when the corpus is
    larger, the WHOLE corpus when smaller, and the pick is the
    hash-order prefix: the budget-64 set is a subset of budget-256."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        anchor_sample,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    n = emb.count()
    small = {r["vec_id"] for r in anchor_sample(emb, 64).collect()}
    big = {r["vec_id"] for r in anchor_sample(emb, 256).collect()}
    assert len(small) == 64 and len(big) == 256
    assert small < big
    assert {r["vec_id"] for r in anchor_sample(emb, n + 100).collect()} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    # engine-twin: DuckDB's ORDER BY hash60, vec_id LIMIT k picks the
    # SAME rows (the cross-engine contract every budgeted eval card
    # rides on)
    import duckdb

    got = duckdb.sql(
        f"""SELECT vec_id FROM '{SF}/embeddings.parquet'
        ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                      AS BIGINT), vec_id
        LIMIT 64"""
    ).fetchall()
    assert {r[0] for r in got} == small
