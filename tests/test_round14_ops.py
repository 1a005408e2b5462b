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


# ------------------------------------------- imbalance bars


def _imb_replay(closes):
    """Pure-Python replica of operators/bars.py — the recursion spec."""
    e_t, e_b = 8.0, 1.0
    thr = e_t * abs(e_b)
    b, prev = 1, None
    bid, theta, t_cur = 0, 0, 0
    out = []  # per tick: (bar_id, b, thr_active)
    for x in closes:
        x = float(x)
        if prev is not None:
            if x > prev:
                b = 1
            elif x < prev:
                b = -1
        theta += b
        t_cur += 1
        out.append((bid, b, thr))
        if float(abs(theta)) >= thr:
            e_t = 0.5 * t_cur + 0.5 * e_t
            e_b = 0.5 * (theta / t_cur) + 0.5 * e_b
            thr = e_t * abs(e_b)
            bid += 1
            theta, t_cur = 0, 0
        prev = x
    return out


def test_imbalance_bars_replay(spark, tmp_path):
    """Bar boundaries, tick-rule carry-through-flats, and the
    EMA-calibrated threshold all replay exactly: a long one-sided run
    closes bar 0 at |theta| = 8, the recalibrated threshold then
    differs from the seed, and a flat tick inherits the prior sign."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_imbalance_bars,
    )

    # bar 0: a MIXED run (2 downs among 10 ups) so theta=8 closes at
    # T=12 with theta/T = 2/3 — the recalibrated thr (8.333...)
    # differs from the seed; then a flat (carries +1) and a steady
    # climb that closes bar 1 under the NEW threshold
    steps = [1, 1, -1, 1, 1, -1, 1, 1, 1, 1, 1, 1]
    closes = [100.0]
    for s in steps[1:]:
        closes.append(closes[-1] + s)
    closes += [closes[-1]]  # flat -> carries +1
    closes += [closes[-1] + 0.5 * (i + 1) for i in range(20)]
    rows = [
        (i, BASE_TS + timedelta(minutes=i), 3, "tick", c, "{}")
        for i, c in enumerate(closes)
    ]
    _write_event_rows(spark, str(tmp_path), rows)
    ticks = _imb_replay(closes)

    bars = {}
    for i, (bid, b, thr) in enumerate(ticks):
        bars.setdefault(bid, []).append((i, closes[i], b, thr))
    got = {r["bar_id"]: r for r in
           q_ts_imbalance_bars(spark, str(tmp_path)).collect()}
    assert set(got) == set(bars)
    for bid, seg in bars.items():
        r = got[bid]
        vals = [c for _, c, _, _ in seg]
        assert r["n_events"] == len(seg)
        assert r["open"] == vals[0] and r["close"] == vals[-1]
        assert r["high"] == max(vals) and r["low"] == min(vals)
        assert r["imbalance"] == sum(b for _, _, b, _ in seg)
        assert r["thr"] == _snap(seg[0][3], 6)
        assert r["span_us"] == (seg[-1][0] - seg[0][0]) * 60 * 1_000_000
    # the scenario is non-degenerate: >=2 bars, threshold adapted,
    # and the flat tick carried the prior sign
    assert len(bars) >= 3  # >=2 closed bars + the trailing partial
    assert ticks[11][0] == 0 and ticks[12][0] == 1  # bar 0 closed at T=12
    thrs = {seg[0][3] for seg in bars.values()}
    assert len(thrs) >= 2 and 8.0 in thrs
    assert ticks[12][1] == 1  # flat tick inherited +1


def test_vpin_replay(spark, tmp_path):
    """Buy/sell classification (tick rule with carry + seed),
    notional-bucket split, exact 1e9-grid toxicity, and the
    expanding-until-warm trailing average all replay in integers."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        VOLBAR_T_CENTS,
        VPIN_W,
        q_ts_vpin,
    )

    closes = [round(250.0 + ((7 * i) % 13) * 25.0, 2) for i in range(40)]
    closes[5] = closes[4]  # a flat tick (carries prior sign)
    rows = [
        (i, BASE_TS + timedelta(minutes=2 * i), 9, "tick", c, "{}")
        for i, c in enumerate(closes)
    ]
    _write_event_rows(spark, str(tmp_path), rows)

    cum, b, prev = 0, 1, None
    per_bar = {}
    for c in closes:
        vq = int(math.floor(c * 100 + 0.5))
        if prev is not None:
            if c > prev:
                b = 1
            elif c < prev:
                b = -1
        bid = cum // VOLBAR_T_CENTS
        buy, sell, n = per_bar.get(bid, (0, 0, 0))
        per_bar[bid] = (
            buy + (vq if b == 1 else 0),
            sell + (vq if b == -1 else 0),
            n + 1,
        )
        cum += vq
        prev = c
    toxqs = []
    expect = {}
    for bid in sorted(per_bar):
        buy, sell, n = per_bar[bid]
        toxq = abs(buy - sell) * 10**9 // (buy + sell)
        toxqs.append(toxq)
        nw = min(len(toxqs), VPIN_W)
        stox = sum(toxqs[-VPIN_W:])
        expect[bid] = (n, nw, buy, sell, toxq,
                       float(stox) / (float(nw) * 1e9))
    got = {r["bar_id"]: r for r in q_ts_vpin(spark, str(tmp_path)).collect()}
    assert set(got) == set(expect)
    for bid, (n, nw, buy, sell, toxq, vpin) in expect.items():
        r = got[bid]
        assert r["n_events"] == n and r["nw"] == nw
        assert r["buy_notional"] == _snap(buy / 100.0, 6)
        assert r["sell_notional"] == _snap(sell / 100.0, 6)
        assert r["tox"] == _snap(toxq / 1e9, 8)
        assert r["vpin"] == _snap(vpin, 8)
    # non-degenerate: several buckets, both sides traded somewhere,
    # and at least one warm (full-window) row
    assert len(expect) >= 3
    assert any(v[2] > 0 and v[3] > 0 for v in expect.values())
    assert any(v[1] == VPIN_W for v in expect.values())


def test_rolling_beta_stream_across_batches(spark, tmp_path):
    """Splitting the tick stream into two micro-batches equals the
    batch rolling beta minus each symbol's trailing grid bucket — the
    open bucket, gap-fill cursor and the 28-deep integer return ring
    all carry across the micro-batch boundary."""
    from pyspark.sql import Window as W

    from big_data_stock_price_forecast_spark.plans.registry import (
        ROLLBETA_W,
        q_ts_rolling_beta,
    )
    from big_data_stock_price_forecast_spark.plans.registry_common import (
        _filled,
    )
    from big_data_stock_price_forecast_spark.plans.registry_ts import (
        rollbeta_mkt_returns,
    )
    from big_data_stock_price_forecast_spark.sources.tables import (
        load_table,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        rolling_beta_stream,
        run_available_now,
    )

    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 5)
    pdf = ev.select("event_id", "ts", "user_id", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "p0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "p1.parquet", index=False)

    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    full = pdf.copy()
    full["event_type"] = "tick"
    full["props"] = "{}"
    spark.createDataFrame(
        full[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ).coalesce(1).write.parquet(f"{batch_dir}/events.parquet")

    # index calibrated from the SAME offline frame the batch query uses
    mkt_x = {
        int(r["time_idx"]): float(r["x"])
        for r in rollbeta_mkt_returns(
            _filled(spark, str(batch_dir))
        ).collect()
    }

    schema = spark.read.parquet(str(land)).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(land))
        .select(
            F.col("user_id").alias("symbol"),
            F.col("ts").cast("timestamp").alias("datetime"),
            F.col("value").alias("close"),
            "event_id",
        )
    )
    out = run_available_now(
        rolling_beta_stream(sdf, mkt_x, w=ROLLBETA_W), "append"
    )
    got = sorted(
        (r["symbol"], r["time_idx"], _snap(r["beta"], 8),
         _snap(r["corr"], 8))
        for r in out.collect()
    )
    beta = q_ts_rolling_beta(spark, str(batch_dir))
    complete = beta.withColumn(
        "__mx", F.max("time_idx").over(W.partitionBy("symbol"))
    ).filter(F.col("time_idx") < F.col("__mx")).drop("__mx")
    exp = sorted(
        (r["symbol"], r["time_idx"], r["beta"], r["corr"])
        for r in complete.collect()
    )
    assert got == exp and len(got) > 0
    # the state genuinely crossed the boundary: some symbol's first
    # half ends mid-ring (emissions exist on both sides of the cut)
    cut_us = int(pdf.iloc[half - 1]["ts"].value) // 1000
    anchor = 946_684_800 * 1_000_000
    cut_idx = (cut_us - anchor) // (6 * 3600 * 1_000_000)
    assert any(t <= cut_idx for _, t, _, _ in got)
    assert any(t > cut_idx for _, t, _, _ in got)
