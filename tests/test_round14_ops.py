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
    closed = set()
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
            closed.add(bid)
            e_t = 0.5 * t_cur + 0.5 * e_t
            e_b = 0.5 * (theta / t_cur) + 0.5 * e_b
            thr = e_t * abs(e_b)
            bid += 1
            theta, t_cur = 0, 0
        prev = x
    return out, closed


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
    ticks, _ = _imb_replay(closes)

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


def test_imbalance_bar_stream_across_batches(spark, tmp_path):
    """Splitting the tick stream into two micro-batches equals the
    batch imbalance bars restricted to CLOSED bars — the tick-rule
    sign, open-bar theta/OHLC and both EMA calibrations carry across
    the boundary. The expected closed set comes from the pure-Python
    replay (a bar is closed iff its last tick crossed the threshold —
    NOT 'bar_id < max': a feed whose final tick closes a bar has a
    closed max bar)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_imbalance_bars,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        imbalance_bar_stream,
        run_available_now,
    )

    # symbol 11: chop that closes several bars mid-stream; symbol 12:
    # a monotone run whose FINAL tick closes its bar (max-bar edge)
    closes_a = []
    v = 200.0
    for i in range(60):
        v += 1.0 if (i * 5) % 7 < 4 else -1.0
        closes_a.append(v)
    closes_b = [300.0 + i for i in range(8)]  # theta hits 8 on tick 8
    rows = [
        (i, BASE_TS + timedelta(minutes=3 * i), 11, "tick", c, "{}")
        for i, c in enumerate(closes_a)
    ] + [
        (1000 + i, BASE_TS + timedelta(minutes=5 * i), 12, "tick", c,
         "{}")
        for i, c in enumerate(closes_b)
    ]

    sdf_all = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    pdf = (
        sdf_all.select("event_id", "ts", "user_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "p0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "p1.parquet", index=False)

    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write_event_rows(spark, str(batch_dir), rows)

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
    out = run_available_now(imbalance_bar_stream(sdf), "append")
    got = sorted(map(tuple, out.collect()))

    _, closed_a = _imb_replay(closes_a)
    _, closed_b = _imb_replay(closes_b)
    closed = {11: closed_a, 12: closed_b}
    batch = q_ts_imbalance_bars(spark, str(batch_dir)).collect()
    exp = sorted(
        tuple(r) for r in batch if r["bar_id"] in closed[r["symbol"]]
    )
    assert got == exp and len(got) > 0
    # the max-bar edge case actually occurred: symbol 12's final tick
    # closed its (max) bar, so 'bar_id < max' would have dropped it
    mx12 = max(r["bar_id"] for r in batch if r["symbol"] == 12)
    assert mx12 in closed_b
    # and a bar spanned the micro-batch boundary for symbol 11
    n1 = int((pdf.iloc[:half]["user_id"] == 11).sum())
    ticks_a, _ = _imb_replay(closes_a)
    assert ticks_a[n1 - 1][0] == ticks_a[n1][0]


# ------------------------------------------- run bars


def _run_replay(closes):
    """Pure-Python replica of operators/bars.py run_bars."""
    e_t, e_p = 8.0, 0.5
    thr = e_t * max(e_p, 1.0 - e_p)
    b, prev = 1, None
    bid, n_up, n_dn = 0, 0, 0
    out = []  # per tick: (bar_id, b, thr_active)
    closed = set()
    for x in closes:
        x = float(x)
        if prev is not None:
            if x > prev:
                b = 1
            elif x < prev:
                b = -1
        if b == 1:
            n_up += 1
        else:
            n_dn += 1
        out.append((bid, b, thr))
        if float(max(n_up, n_dn)) >= thr:
            closed.add(bid)
            t_cur = n_up + n_dn
            e_t = 0.5 * t_cur + 0.5 * e_t
            e_p = 0.5 * (n_up / t_cur) + 0.5 * e_p
            thr = e_t * max(e_p, 1.0 - e_p)
            bid += 1
            n_up, n_dn = 0, 0
        prev = x
    return out, closed


def test_run_bars_replay(spark, tmp_path):
    """Run-bar boundaries replay exactly, the threshold adapts off
    the buy-fraction EMA, and the defining DIVERGENCE from imbalance
    bars is exercised: perfectly alternating (net-zero) chop closes
    run bars on gross same-side counts while the imbalance card's
    |theta| never leaves {0, 1}."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_imbalance_bars,
        q_ts_run_bars,
    )

    # alternating +1/-1 chop: theta oscillates 1,0,1,0,... (no
    # imbalance close under thr0=8) but n_up/n_dn both climb — run
    # bars close whenever the dominant side hits the threshold
    closes = [500.0]
    for i in range(39):
        closes.append(closes[-1] + (1.0 if i % 2 == 0 else -1.0))
    rows = [
        (i, BASE_TS + timedelta(minutes=i), 21, "tick", c, "{}")
        for i, c in enumerate(closes)
    ]
    _write_event_rows(spark, str(tmp_path), rows)
    ticks, _ = _run_replay(closes)

    bars = {}
    for i, (bid, b, thr) in enumerate(ticks):
        bars.setdefault(bid, []).append((i, closes[i], b, thr))
    got = {r["bar_id"]: r for r in
           q_ts_run_bars(spark, str(tmp_path)).collect()}
    assert set(got) == set(bars)
    for bid, seg in bars.items():
        r = got[bid]
        vals = [c for _, c, _, _ in seg]
        assert r["n_events"] == len(seg)
        assert r["open"] == vals[0] and r["close"] == vals[-1]
        assert r["high"] == max(vals) and r["low"] == min(vals)
        assert r["n_up"] == sum(1 for _, _, b, _ in seg if b == 1)
        assert r["n_dn"] == sum(1 for _, _, b, _ in seg if b == -1)
        assert r["thr"] == _snap(seg[0][3], 6)
        assert r["span_us"] == (seg[-1][0] - seg[0][0]) * 60 * 1_000_000
    # the divergence actually happened: several run bars closed while
    # the imbalance card sees ONE open bar on the same feed
    assert len(bars) >= 3
    thrs = [seg[0][3] for _, seg in sorted(bars.items())]
    assert len(set(thrs)) >= 2 and thrs[0] == 4.0
    imb = q_ts_imbalance_bars(spark, str(tmp_path)).collect()
    assert len(imb) == 1  # net-zero chop never crossed |theta| >= 8


def test_run_bar_stream_across_batches(spark, tmp_path):
    """Two micro-batches equal the batch run bars restricted to
    CLOSED bars — sign, gross counts, OHLC and both EMAs carry across
    the boundary (the imbalance-twin contract with the one-sided
    trigger)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_run_bars,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        run_bar_stream,
    )

    closes = [700.0]
    for i in range(50):
        closes.append(closes[-1] + (1.0 if (i * 3) % 5 < 3 else -1.0))
    rows = [
        (i, BASE_TS + timedelta(minutes=4 * i), 31, "tick", c, "{}")
        for i, c in enumerate(closes)
    ]
    sdf_all = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    pdf = (
        sdf_all.select("event_id", "ts", "user_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "p0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "p1.parquet", index=False)
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write_event_rows(spark, str(batch_dir), rows)

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
    out = run_available_now(run_bar_stream(sdf), "append")
    # the raw operator emits unrounded thr; the registry query wraps
    # it in _rne(6) — apply the same snap before comparing
    got = sorted(
        tuple(r)[:9] + (_snap(r["thr"], 6), r["span_us"])
        for r in out.collect()
    )
    _, closed = _run_replay(closes)
    batch = q_ts_run_bars(spark, str(batch_dir)).collect()
    exp = sorted(tuple(r) for r in batch if r["bar_id"] in closed)
    assert got == exp and len(got) >= 2
    # a bar genuinely spanned the boundary
    ticks, _ = _run_replay(closes)
    assert ticks[half - 1][0] == ticks[half][0]


def test_vpin_stream_across_batches(spark, tmp_path):
    """Two micro-batches equal the batch VPIN minus each symbol's
    trailing open bucket — the cents cumulative, tick-rule sign,
    open-bucket buy/sell split and the toxicity ring all carry across
    the micro-batch boundary."""
    from pyspark.sql import Window as W

    from big_data_stock_price_forecast_spark.plans.registry import (
        VOLBAR_T_CENTS,
        VPIN_W,
        q_ts_vpin,
    )
    from big_data_stock_price_forecast_spark.sources.tables import (
        load_table,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        vpin_stream,
    )

    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 8)
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
        vpin_stream(sdf, t_cents=VOLBAR_T_CENTS, w=VPIN_W), "append"
    )
    got = sorted(
        (r["symbol"], r["bar_id"], r["n_events"], r["nw"],
         _snap(r["buy_c"] / 100.0, 6), _snap(r["sell_c"] / 100.0, 6),
         None if r["toxq"] is None else _snap(r["toxq"] / 1e9, 8),
         None if r["stox"] is None
         else _snap(r["stox"] / (float(r["nw"]) * 1e9), 8))
        for r in out.collect()
    )
    vp = q_ts_vpin(spark, str(batch_dir))
    complete = vp.withColumn(
        "__mx", F.max("bar_id").over(W.partitionBy("symbol"))
    ).filter(F.col("bar_id") < F.col("__mx")).drop("__mx")
    exp = sorted(
        (r["symbol"], r["bar_id"], r["n_events"], r["nw"],
         r["buy_notional"], r["sell_notional"], r["tox"], r["vpin"])
        for r in complete.collect()
    )
    assert got == exp and len(got) > 0
    # a bucket genuinely spanned the boundary for some symbol: the
    # first half's last tick is mid-bucket
    import math as _m

    cum = {}
    for _, row in pdf.iloc[:half].iterrows():
        u = int(row["user_id"])
        cum[u] = cum.get(u, 0) + int(
            _m.floor(float(row["value"]) * 100 + 0.5)
        )
    assert any(c % VOLBAR_T_CENTS != 0 for c in cum.values())


def test_bar_family_plan_shapes(spark):
    """Pin the exchange counts of the information-driven bar family:
    imbalance/run bars are ONE exchange (in-pass dedup + recursion +
    OHLC fold — a JVM groupBy after per-tick emission would add a
    third shuffle because FlatMapGroupsInPandas doesn't propagate
    partitioning); the notional-clock queries are TWO (the keep-last
    dedup window on (symbol, datetime), then the symbol-keyed
    rank/cumulative windows + map-side aggregates)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_imbalance_bars,
        q_ts_run_bars,
        q_ts_vpin,
        q_ts_volume_bars,
    )

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange ")

    assert n_exchanges(q_ts_imbalance_bars(spark, SF)) == 1
    assert n_exchanges(q_ts_run_bars(spark, SF)) == 1
    assert n_exchanges(q_ts_vpin(spark, SF)) == 2
    assert n_exchanges(q_ts_volume_bars(spark, SF)) == 2
