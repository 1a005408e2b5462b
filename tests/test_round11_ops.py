"""Round-11 operator contracts: the segment-composed affine EMA scan
(parallel-prefix lift of the W4 per-symbol recursion constraint) and
the round's other additions."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.operators.rolling import ewm_smooth
from big_data_stock_price_forecast_spark.operators.twophase import (
    affine_ema_scan,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------- affine EMA scan


def test_affine_scan_matches_sequential_arrow_pass(spark):
    """The segment-composed scan must agree with the sequential
    ewm_smooth fold to <1e-8 on the real fixture series (divergence
    is ONLY the 1e-12 term-grid snap + per-segment reassociation).
    Multi-segment composition must actually exercise (seg_len=32 on a
    ~116-row series -> 4-segment chains incl. a partial tail)."""
    from big_data_stock_price_forecast_spark.plans.registry import _filled

    df = _filled(spark, SF).select("symbol", "time_idx", "close")
    scan = {
        r["symbol"]: (r["n"], r["n_seg"], r["ema_last"])
        for r in affine_ema_scan(
            df, "close", "symbol", "time_idx", alpha=0.5, seg_len=32
        ).collect()
    }
    assert scan and all(v[1] > 1 for v in scan.values())  # multi-segment
    seq = ewm_smooth(df, {"ema": ("close", 0.5)})
    w_last = (
        seq.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("symbol").orderBy(
                    F.col("time_idx").desc()
                )
            ),
        )
        .filter("rn = 1")
        .select("symbol", "ema")
    )
    last = {r["symbol"]: r["ema"] for r in w_last.collect()}
    for s, (n, n_seg, ema) in scan.items():
        assert abs(ema - last[s]) < 1e-8, (s, ema, last[s])


def test_affine_scan_python_replay_exact(spark):
    """Bit-level replay of the full two-phase algebra on a planted
    series long enough for 3 segments + partial tail, including the
    seed row's m=1 coefficient and the exact-power-of-two c^k path."""
    import pandas as pd

    ys = [100.0 + math.sin(i * 0.7) * 25.0 + (i % 7) for i in range(83)]
    pdf = pd.DataFrame(
        {"symbol": 1, "time_idx": range(83), "close": ys}
    )
    df = spark.createDataFrame(pdf)
    got = affine_ema_scan(
        df, "close", "symbol", "time_idx", alpha=0.5, seg_len=32
    ).collect()[0]
    assert (got["n"], got["n_seg"]) == (83, 3)

    # replay: per segment B = sum of snapped terms; fold across segs
    def seg_B(seg_ys, is_first):
        L = len(seg_ys)
        tot = 0
        for i, y in enumerate(seg_ys, start=1):
            m = 1.0 if (is_first and i == 1) else 0.5
            t = y * m * math.pow(0.5, L - i)
            tot += int(math.floor(t * 1e12 + 0.5))
        return tot / 1e12, L

    segs = [ys[k : k + 32] for k in range(0, 83, 32)]
    v, _ = seg_B(segs[0], True)
    for sgl in segs[1:]:
        B, L = seg_B(sgl, False)
        v = math.pow(0.5, L) * v + B
    assert got["ema_last"] == round(v, 8) or abs(got["ema_last"] - v) < 5e-9


def test_affine_scan_plan_has_no_python_and_bounded_exchanges(spark):
    """The scan's point is distribution: NO Arrow/Python stage (the
    sequential pass's applyInPandas), no per-symbol single-task
    collect of the raw series — the only data-sized shuffles are the
    symbol window + the (symbol, seg) aggregate."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_ema_scan,
    )

    plan = _plan(q_ts_ema_scan(spark, SF))
    assert "FlatMapGroupsInPandas" not in plan
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3
