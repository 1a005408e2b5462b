"""Round-15 contracts: the streaming bar/VPIN twins are
self-defending on duplicate ticks (in-batch P5 keep-last, matching
the batch twins — r14 verdict item 2: the driver testdata has ZERO
duplicate (symbol, ts) pairs, so only this pytest holds the line),
plus the CUSUM event filter and triple-barrier labeling added below.
"""

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


# ------------------------------------------- dup-tick streaming twins


def _imb_replay(closes):
    """Pure-Python replica of operators/bars.py imbalance recursion."""
    e_t, e_b = 8.0, 1.0
    thr = e_t * abs(e_b)
    b, prev = 1, None
    bid, theta, t_cur = 0, 0, 0
    bars, closed = [], set()
    for x in closes:
        x = float(x)
        if prev is not None:
            if x > prev:
                b = 1
            elif x < prev:
                b = -1
        theta += b
        t_cur += 1
        bars.append((bid, b, thr))
        if float(abs(theta)) >= thr:
            closed.add(bid)
            e_t = 0.5 * t_cur + 0.5 * e_t
            e_b = 0.5 * (theta / t_cur) + 0.5 * e_b
            thr = e_t * abs(e_b)
            bid += 1
            theta, t_cur = 0, 0
        prev = x
    return bars, closed


def _dup_feed():
    """A tick feed with in-batch duplicate (symbol, ts) pairs whose
    keep-last winner CHANGES the bar recursion (the duplicate carries
    a different price), so a twin that skips the dedup provably
    diverges. Returns (rows, effective_closes_by_symbol)."""
    rows = []
    eff = {31: [], 32: []}
    v = 200.0
    for i in range(60):
        v += 1.0 if (i * 5) % 7 < 4 else -1.0
        ts = BASE_TS + timedelta(minutes=3 * i)
        if i % 4 == 0:
            # superseded tick first (lower event_id), then the
            # keep-last winner at the SAME timestamp
            rows.append((i, ts, 31, "tick", v + 9.0, "{}"))
            rows.append((5000 + i, ts, 31, "tick", v, "{}"))
        else:
            rows.append((i, ts, 31, "tick", v, "{}"))
        eff[31].append(v)
    for i in range(12):
        c = 300.0 + i
        ts = BASE_TS + timedelta(minutes=5 * i)
        if i % 3 == 0:
            rows.append((1000 + i, ts, 32, "tick", c - 50.0, "{}"))
            rows.append((6000 + i, ts, 32, "tick", c, "{}"))
        else:
            rows.append((1000 + i, ts, 32, "tick", c, "{}"))
        eff[32].append(c)
    return rows, eff


def _land_and_batch(spark, tmp_path, rows):
    """Write rows as (a) two streaming landing files split at a ts
    boundary (duplicate pairs never straddle a micro-batch — the
    in-batch dedup contract) and (b) a batch events dir."""
    import pandas as pd

    pdf = pd.DataFrame(
        [(r[0], r[1], r[2], r[4]) for r in rows],
        columns=["event_id", "ts", "user_id", "value"],
    ).sort_values(["ts", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    while (
        half < len(pdf)
        and pdf.iloc[half - 1]["ts"] == pdf.iloc[half]["ts"]
    ):
        half += 1
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "p0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "p1.parquet", index=False)
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write_event_rows(spark, str(batch_dir), rows)
    return land, batch_dir


def _tick_stream(spark, land):
    schema = spark.read.parquet(str(land)).schema
    return (
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


def test_imbalance_stream_dedups_duplicate_ticks(spark, tmp_path):
    """A duplicate-bearing feed: stream == batch closed bars. The
    batch twin dedups in-line (operators/bars.py); without the r15
    in-batch drop_duplicates the stream would process both rows and
    diverge (asserted via the replay on the undeduped sequence)."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_imbalance_bars,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        imbalance_bar_stream,
        run_available_now,
    )

    rows, eff = _dup_feed()
    # the undeduped interleaved sequence yields a DIFFERENT bar walk
    # than the keep-last effective series — the test guards something
    raw31 = [r[4] for r in sorted(rows, key=lambda r: (r[1], r[0]))
             if r[2] == 31]
    assert _imb_replay(raw31)[0] != _imb_replay(eff[31])[0]

    land, batch_dir = _land_and_batch(spark, tmp_path, rows)
    out = run_available_now(
        imbalance_bar_stream(_tick_stream(spark, land)), "append"
    )
    # the raw operator emits unrounded thr; the registry query wraps
    # it in _rne(6) — apply the same snap before comparing
    got = sorted(
        tuple(r)[:8] + (_snap(r["thr"], 6), r["span_us"])
        for r in out.collect()
    )
    closed = {s: _imb_replay(eff[s])[1] for s in eff}
    batch = q_ts_imbalance_bars(spark, str(batch_dir)).collect()
    exp = sorted(
        tuple(r) for r in batch if r["bar_id"] in closed[r["symbol"]]
    )
    assert got == exp and len(got) > 0


def test_run_stream_dedups_duplicate_ticks(spark, tmp_path):
    """Same duplicate-bearing feed through the run-bar twins."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_run_bars,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        run_bar_stream,
    )

    rows, eff = _dup_feed()
    land, batch_dir = _land_and_batch(spark, tmp_path, rows)
    out = run_available_now(
        run_bar_stream(_tick_stream(spark, land)), "append"
    )
    got = sorted(
        tuple(r)[:9] + (_snap(r["thr"], 6), r["span_us"])
        for r in out.collect()
    )

    def _run_closed(closes):
        e_t, e_p = 8.0, 0.5
        thr = e_t * max(e_p, 1.0 - e_p)
        b, prev = 1, None
        bid, n_up, n_dn = 0, 0, 0
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
            if float(max(n_up, n_dn)) >= thr:
                closed.add(bid)
                t_cur = n_up + n_dn
                e_t = 0.5 * t_cur + 0.5 * e_t
                e_p = 0.5 * (n_up / t_cur) + 0.5 * e_p
                thr = e_t * max(e_p, 1.0 - e_p)
                bid += 1
                n_up, n_dn = 0, 0
            prev = x
        return closed

    closed = {s: _run_closed(eff[s]) for s in eff}
    batch = q_ts_run_bars(spark, str(batch_dir)).collect()
    exp = sorted(
        tuple(r) for r in batch if r["bar_id"] in closed[r["symbol"]]
    )
    assert got == exp and len(got) > 0


def test_vpin_stream_dedups_duplicate_ticks(spark, tmp_path):
    """Same duplicate-bearing feed through the VPIN twins: the
    duplicate rows must contribute NO cents to the cumulative (the
    dedup runs before accumulation), so stream == batch minus each
    symbol's trailing open bucket."""
    from pyspark.sql import Window as W

    from big_data_stock_price_forecast_spark.plans.registry import (
        VOLBAR_T_CENTS,
        VPIN_W,
        q_ts_vpin,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        vpin_stream,
    )

    rows, _ = _dup_feed()
    land, batch_dir = _land_and_batch(spark, tmp_path, rows)
    out = run_available_now(
        vpin_stream(
            _tick_stream(spark, land), t_cents=VOLBAR_T_CENTS, w=VPIN_W
        ),
        "append",
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


def test_tick_volume_streams_dedup_duplicate_ticks(spark, tmp_path):
    """The r13 clock twins get the same guard: tick/volume bar
    streams on the duplicate-bearing feed equal their batch twins
    (which read the keep-last deduped series)."""
    from pyspark.sql import Window as W

    from big_data_stock_price_forecast_spark.plans.registry import (
        TICK_BAR_N,
        VOLBAR_T_CENTS,
        q_ts_tick_bars,
        q_ts_volume_bars,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        tick_bar_stream,
        volume_bar_stream,
    )

    rows, _ = _dup_feed()
    land, batch_dir = _land_and_batch(spark, tmp_path, rows)

    out = run_available_now(
        tick_bar_stream(_tick_stream(spark, land), n_bar=TICK_BAR_N),
        "append",
    )
    got = sorted(map(tuple, out.collect()))
    exp = sorted(  # the stream emits FULL bars; batch keeps the
        # trailing partial (n_events < TICK_BAR_N)
        tuple(r)
        for r in q_ts_tick_bars(spark, str(batch_dir)).collect()
        if r["n_events"] == TICK_BAR_N
    )
    assert got == exp and len(got) > 0

    out = run_available_now(
        volume_bar_stream(
            _tick_stream(spark, land), t_cents=VOLBAR_T_CENTS
        ),
        "append",
    )
    gotv = sorted(
        (r["symbol"], r["bar_id"], r["n_events"], r["open"], r["high"],
         r["low"], r["close"], _snap(r["notional"], 6), r["span_us"])
        for r in out.collect()
    )
    vb = q_ts_volume_bars(spark, str(batch_dir))
    complete = vb.withColumn(
        "__mx", F.max("bar_id").over(W.partitionBy("symbol"))
    ).filter(F.col("bar_id") < F.col("__mx")).drop("__mx")
    expv = sorted(
        (r["symbol"], r["bar_id"], r["n_events"], r["open"], r["high"],
         r["low"], r["close"], r["notional"], r["span_us"])
        for r in complete.collect()
    )
    assert gotv == expv and len(gotv) > 0


# ------------------------------------------- CUSUM event filter


def _cusum_replay(closes, a=0.125, hm=4.0):
    """Pure-Python replica of operators/labeling.py cusum_events."""
    prev = None
    ema = None
    sp = sn = 0.0
    eid = 0
    out = []  # (row_idx, event_id, direction, stat, h, entry)
    for i, x in enumerate(closes):
        x = float(x)
        if prev is None:
            prev = x
            continue
        d = x - prev
        ema = abs(d) if ema is None else a * abs(d) + (1 - a) * ema
        h = hm * ema
        sp = sp + d
        sp = sp if sp > 0.0 else 0.0
        sn = sn + d
        sn = sn if sn < 0.0 else 0.0
        if sp > h:
            out.append((i, eid, "up", sp, h, x))
            eid += 1
            sp = 0.0
        elif sn < -h:
            out.append((i, eid, "down", sn, h, x))
            eid += 1
            sn = 0.0
        prev = x
    return out


def test_cusum_events_replay(spark):
    """Event boundaries, the on-line EMA threshold, the reset on
    trigger, and the seed row's can't-trigger property all replay
    exactly against the Arrow pass."""
    from big_data_stock_price_forecast_spark.operators.labeling import (
        cusum_events,
    )

    # symbol 1: calm drift (small EMA), then a jump (up event), more
    # chop, then a crash (down event); symbol 2: monotone grind whose
    # accumulated S+ crosses the shrinking-then-stable threshold
    c1 = [100.0, 100.5, 100.1, 100.4, 100.2, 110.0, 110.3, 109.9,
          110.1, 104.0, 103.8, 104.1, 96.0, 96.2]
    c2 = [50.0] + [50.0 + 0.7 * i for i in range(1, 20)]
    rows = [(1, i, v) for i, v in enumerate(c1)] + [
        (2, i, v) for i, v in enumerate(c2)
    ]
    df = spark.createDataFrame(
        rows, "symbol long, time_idx long, close double"
    )
    got = sorted(
        (r["symbol"], r["time_idx"], r["event_id"], r["direction"],
         r["stat"], r["h"], r["entry"])
        for r in cusum_events(df).collect()
    )
    exp = sorted(
        [(1,) + e for e in _cusum_replay(c1)]
        + [(2,) + e for e in _cusum_replay(c2)]
    )
    assert got == exp
    # the scenario exercises both directions and the reset: symbol 1
    # has an up AND a down event, and at least one symbol has >= 2
    # events (the second's accumulator restarted from 0)
    dirs1 = {e[2] for e in _cusum_replay(c1)}
    assert dirs1 == {"up", "down"}
    assert len(_cusum_replay(c1)) >= 2
    # the first diff row can never trigger (h = 4|d| >= |S|)
    assert all(e[0] >= 2 for e in _cusum_replay(c1))


def test_cusum_reset_distinguishes_from_alarms(spark):
    """The reset matters: replaying WITHOUT the reset yields a
    different event set on the same series (this is what separates
    ts_cusum_events from the closed-form ts_cusum_alarms)."""
    c = [100.0, 100.5, 100.1, 100.4, 100.2, 110.0, 110.5, 111.0,
         111.5, 112.0, 112.5, 113.0, 113.5, 114.0]

    def _no_reset(closes, a=0.125, hm=4.0):
        prev = ema = None
        sp = sn = 0.0
        out = []
        for i, x in enumerate(closes):
            if prev is None:
                prev = x
                continue
            d = x - prev
            ema = abs(d) if ema is None else a * abs(d) + (1 - a) * ema
            h = hm * ema
            sp = sp + d
            sp = sp if sp > 0.0 else 0.0
            sn = sn + d
            sn = sn if sn < 0.0 else 0.0
            if sp > h:
                out.append((i, "up"))
            elif sn < -h:
                out.append((i, "down"))
            prev = x
        return out

    with_reset = [(e[0], e[2]) for e in _cusum_replay(c)]
    assert with_reset != _no_reset(c)
    assert len(with_reset) >= 1


# ------------------------------------------- triple barrier


def test_triple_barrier_labels(spark):
    """Upper touch, lower touch, timeout, a truncated vertical
    barrier at series end, and the dropped no-exit event — each
    engineered explicitly and checked against hand-computed rows."""
    from big_data_stock_price_forecast_spark.operators.labeling import (
        triple_barrier,
    )

    closes = {i: 100.0 for i in range(32)}
    closes[3] = 101.0
    closes[4] = 102.5   # event@2 (h=1.0): up barrier 102 hit at off 2
    closes[11] = 99.0
    closes[13] = 97.5   # event@10 (h=1.0): dn barrier 98 hit at off 3
    closes[31] = 100.5
    # event@15 (h=5.0): barriers 110/90 never hit -> timeout at the
    # FULL vertical barrier t0+16 = 31 (exists; px there 100.5)
    # event@28 (h=9.0): vertical barrier t0+16 = 44 past series end ->
    # truncated exit at the last row 31
    # event@31: no row after -> dropped
    grid = spark.createDataFrame(
        [(1, i, closes[i]) for i in range(32)],
        "symbol long, time_idx long, close double",
    )
    events = spark.createDataFrame(
        [
            (1, 2, "up", 100.0, 1.0),
            (1, 10, "down", 100.0, 1.0),
            (1, 15, "up", 100.0, 5.0),
            (1, 28, "up", 100.0, 9.0),
            (1, 31, "up", 100.0, 1.0),
        ],
        "symbol long, time_idx long, direction string, entry double,"
        " h double",
    )
    got = sorted(
        (r["symbol"], r["time_idx"], r["direction"], r["entry"],
         r["label"], r["exit_idx"], r["exit_px"], r["ret"])
        for r in triple_barrier(grid, events).collect()
    )
    exp = [
        (1, 2, "up", 100.0, 1, 4, 102.5, 2.5),
        (1, 10, "down", 100.0, -1, 13, 97.5, -2.5),
        (1, 15, "up", 100.0, 0, 31, 100.5, 0.5),
        (1, 28, "up", 100.0, 0, 31, 100.5, 0.5),
    ]
    assert got == exp


def test_cusum_tb_plan_shapes(spark):
    """The event filter is ONE exchange beyond the shared ts-family
    symbol exchange (the applyInPandas re-cluster — its input is the
    gap-filled grid, FlatMapGroupsInPandas does not propagate the
    upstream hash(symbol) partitioning); triple-barrier adds only the
    small exploded-events shuffle, never a grid-side reshuffle or a
    per-symbol cross product."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_cusum_events,
        q_ts_triple_barrier,
    )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p1 = plan(q_ts_cusum_events(spark, SF))
    p2 = plan(q_ts_triple_barrier(spark, SF))
    # event filter: exactly the shared series exchange — the Arrow
    # pass rides the existing hash(symbol) partitioning
    assert p1.count("Exchange hashpartitioning") == 1
    # triple barrier: the two filled lineages (events + grid side;
    # AQE ReuseExchange collapses them at runtime), the join-side
    # exchange, and the event-count aggregate exchange — and NEVER a
    # per-symbol cross product (the explode keeps the join equi-keyed)
    assert p2.count("Exchange ") <= 4
    assert "CartesianProduct" not in p2 and "NestedLoop" not in p2


def test_cusum_event_stream_across_batches(spark, tmp_path):
    """Two micro-batches equal the batch CUSUM events strictly below
    each symbol's trailing in-flight grid bucket — the open-bucket
    cursor, the gap-fill carry, the EMA threshold and both
    accumulators all carry across the micro-batch boundary."""
    from big_data_stock_price_forecast_spark.plans.registry import (
        q_ts_cusum_events,
    )
    from big_data_stock_price_forecast_spark.plans.registry_common import (
        _filled,
    )
    from big_data_stock_price_forecast_spark.sources.tables import (
        load_table,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        cusum_event_stream,
        run_available_now,
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
        full[["event_id", "ts", "user_id", "event_type", "value",
              "props"]]
    ).coalesce(1).write.parquet(f"{batch_dir}/events.parquet")

    out = run_available_now(
        cusum_event_stream(_tick_stream(spark, land)), "append"
    )
    got = sorted(
        (r["symbol"], r["time_idx"], r["event_id"], r["direction"],
         _snap(r["stat"], 6), _snap(r["h"], 6), r["entry"])
        for r in out.collect()
    )
    batch = q_ts_cusum_events(spark, str(batch_dir))
    mx = _filled(spark, str(batch_dir)).groupBy("symbol").agg(
        F.max("time_idx").alias("mx")
    )
    exp = sorted(
        (r["symbol"], r["time_idx"], r["event_id"], r["direction"],
         r["stat"], r["h"], r["entry"])
        for r in batch.join(mx, "symbol")
        .filter(F.col("time_idx") < F.col("mx"))
        .collect()
    )
    assert got == exp and len(got) > 0
    # the boundary genuinely split a grid bucket mid-flight for some
    # symbol (otherwise the state-carry proof is vacuous)
    import pandas as _pd

    step = 6 * 3600 * 1_000_000
    t_last = int(
        _pd.Timestamp(pdf.iloc[half - 1]["ts"]).value // 1000
    )
    assert t_last % step != 0


def test_label_uniqueness_weights(spark):
    """Hand-computed overlap: two labels sharing half their spans
    each get uniqueness 0.75; a non-overlapping label gets 1.0; the
    snapped-reciprocal integer path is exact for these values."""
    from big_data_stock_price_forecast_spark.operators.labeling import (
        label_uniqueness,
    )

    labels = spark.createDataFrame(
        [(1, 0, 4), (1, 2, 6), (1, 10, 12)],
        "symbol long, time_idx long, exit_idx long",
    )
    got = sorted(
        (r["symbol"], r["time_idx"], r["n_span"], r["max_conc"],
         r["uniqueness"])
        for r in label_uniqueness(labels).collect()
    )
    # spans: A=(1..4), B=(3..6), C=(11..12); rows 3,4 have c=2
    exp = [
        (1, 0, 4, 2, 0.75),
        (1, 2, 4, 2, 0.75),
        (1, 10, 2, 1, 1.0),
    ]
    assert got == exp
