"""Round-14 contracts: exact DECIMAL bar assignment above 2^53 cents
(batch == streaming-twin integer arithmetic at any cumulative),
tick-imbalance bars, the VPIN bucket-toxicity card, and the rolling
beta streaming twin (added below as batches land)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
BASE_TS = datetime(2024, 1, 1)


def _snap(x: float, n: int = 6) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s + 0.0


def _write_event_rows(spark, path: str, rows) -> None:
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{path}/events.parquet")


# ------------------------------------------- exact bar_id > 2^53


def test_volume_bar_id_exact_above_2pow53(spark, tmp_path):
    """r13 verdict item 1: the bar index must be EXACT integer floor
    division at any cumulative. This dataset is engineered so the old
    ``floor(cum::DOUBLE / T)`` form provably disagrees: after two
    ticks the cumulative is 24000000000099998 cents (> 2^53, not
    double-representable — ties-to-even rounds it UP to exactly
    240000000001 * T), so the double form puts tick 3 in bar
    240000000001 while exact floor division says 240000000000. The
    batch query must agree with the streaming twin's Python-int
    ``cum // T`` (streaming/ops.py) — the exact one."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        VOLBAR_T_CENTS,
        q_ts_volume_bars,
    )

    closes = [120000000000000.0, 120000000000999.98, 101.25, 99.5]
    rows = [
        (i, BASE_TS + timedelta(minutes=i), 7, "tick", c, "{}")
        for i, c in enumerate(closes)
    ]
    _write_event_rows(spark, str(tmp_path), rows)

    # replicate the engine's arithmetic with Python ints (the
    # streaming twin's state): vq from the SAME double ops, then
    # exact integer cumulative and floor division
    cum, expect = 0, {}
    for i, c in enumerate(closes):
        bid = cum // VOLBAR_T_CENTS
        expect.setdefault(bid, []).append((i, c))
        cum += int(math.floor(c * 100 + 0.5))
    assert cum > 2**53  # the regime the fix targets

    # the old double formula must actually disagree on this data —
    # otherwise the test guards nothing
    cum2, dbl = 0, {}
    for i, c in enumerate(closes):
        dbl.setdefault(int(math.floor(float(cum2) / VOLBAR_T_CENTS)),
                       []).append(i)
        cum2 += int(math.floor(c * 100 + 0.5))
    assert set(dbl) != set(expect)

    got = {r["bar_id"]: r for r in
           q_ts_volume_bars(spark, str(tmp_path)).collect()}
    assert set(got) == set(expect)
    for bid, seg in expect.items():
        r = got[bid]
        vals = [c for _, c in seg]
        assert r["n_events"] == len(seg)
        assert r["open"] == vals[0] and r["close"] == vals[-1]
        cents = sum(int(math.floor(c * 100 + 0.5)) for c in vals)
        assert r["notional"] == _snap(cents / 100.0, 6)
