"""Structured Streaming surface (SURVEY.md §2.9): real incremental
plans (file source -> watermark -> stateful op -> memory sink) drained
with Trigger.AvailableNow and checked against their batch equivalents.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_stock_price_forecast_spark.sources.tables import load_table
from big_data_stock_price_forecast_spark.streaming import (
    distinct_keys_stream,
    ema_state_stream,
    resample_stream,
    run_available_now,
    stream_events,
)

SF = "/root/testdata/sf0.001"


def test_stream_dedup_matches_batch_distinct(spark):
    out = run_available_now(
        distinct_keys_stream(
            stream_events(spark, SF), ["symbol", "datetime"], "datetime"
        ),
        "append",
    )
    batch = (
        load_table(spark, SF, "events")
        .select(F.col("user_id").alias("symbol"), F.col("ts").alias("datetime"))
        .distinct()
    )
    assert out.count() == batch.count()
    assert out.exceptAll(batch).count() == 0


def test_stream_resample_append_emits_closed_buckets_only(spark):
    """Append mode + watermark: exactly the buckets whose end the final
    watermark passed — everything strictly before the bucket holding the
    global max event time (trailing partial bucket stays in state)."""
    out = run_available_now(
        resample_stream(stream_events(spark, SF), "6 hours"), "append"
    )
    ev = load_table(spark, SF, "events")
    bucket = F.window(
        F.col("ts") - F.expr("INTERVAL 1 MICROSECOND"), "6 hours"
    )["end"]
    batch = (
        ev.groupBy(F.col("user_id").alias("symbol"), bucket.alias("datetime"))
        .agg(
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    max_label = (
        ev.select(F.max(bucket).alias("m")).collect()[0]["m"]
    )
    closed = batch.filter(F.col("datetime") < F.lit(max_label))
    assert out.count() == closed.count()
    assert out.exceptAll(closed).count() == 0


def test_stream_ema_state_matches_pandas_ewm(spark):
    """The applyInPandasWithState EMA over the whole stream equals
    pandas ewm(span, adjust=False) on the (ts, event_id)-sorted series —
    the reference's W4 recursion (core/data/preprocess.py:52-54)."""
    out = (
        run_available_now(ema_state_stream(stream_events(spark, SF), span=12))
        .toPandas()
        .set_index("symbol")
        .sort_index()
    )
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for sym, g in ev.groupby("user_id"):
        expect = g["value"].ewm(span=12, adjust=False).mean().iloc[-1]
        assert abs(out.loc[sym, "ema"] - expect) < 1e-9
        assert out.loc[sym, "n_rows"] == len(g)


def test_stream_multi_batch_incremental(spark, tmp_path):
    """State carries across micro-batches: feeding the same rows in two
    files/batches (maxFilesPerTrigger=1) yields the same final EMA as
    one batch — the operator is genuinely incremental."""
    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 3)
    pdf = ev.select("event_id", "ts", "user_id", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    # micros, not pandas-default nanos: the session reads TIMESTAMP(NANOS)
    # as long (nanosAsLong), which is the testdata quirk, not this test's
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    # two files split by time so batch 1 strictly precedes batch 2
    pdf.iloc[:half].to_parquet(land / "events_page_0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "events_page_1.parquet", index=False)

    schema = spark.read.parquet(str(land)).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(land))
        .select(
            F.col("user_id").alias("symbol"),
            # parquet-from-pandas is TIMESTAMP_NTZ; watermarks need LTZ
            # (session TZ is pinned UTC so the instant is unchanged)
            F.col("ts").cast("timestamp").alias("datetime"),
            F.col("value").alias("close"),
            "event_id",
        )
    )
    out = run_available_now(ema_state_stream(sdf, span=12))
    # each symbol emits one row per micro-batch it appears in; the last
    # (max n_rows) row per symbol is the final running state
    final = (
        out.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("symbol").orderBy(F.col("n_rows").desc())
            ),
        )
        .filter("rk = 1")
        .toPandas()
        .set_index("symbol")
    )
    for sym, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        expect = g["value"].ewm(span=12, adjust=False).mean().iloc[-1]
        assert abs(final.loc[sym, "ema"] - expect) < 1e-9
        assert final.loc[sym, "n_rows"] == len(g)


def test_stream_sessionize_emits_closed_sessions_only(spark, tmp_path):
    """session_window semantics on crafted data: events within the gap
    merge; a session emits once the watermark (max event time after
    the drain) passes last_event + gap; the trailing open session
    stays in state."""
    import datetime as dt

    from big_data_stock_price_forecast_spark.streaming import (
        run_available_now,
        session_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # symbol 7: two events 10 min apart (one session), then a gap
        # of 50 min -> second session holding the global max ts
        (7, m(0), 1.0, 1),
        (7, m(10), 2.0, 2),
        (7, m(60), 3.0, 3),
        # symbol 8: single early event, closed by symbol 7's later data
        (8, m(1), 4.0, 4),
    ]
    src = str(tmp_path / "sess-src")
    spark.createDataFrame(
        rows, "symbol long, datetime timestamp, close double, event_id long"
    ).write.mode("overwrite").parquet(src)
    sdf = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = run_available_now(
        session_stream(sdf, "30 minutes"), "append"
    ).collect()
    got = {
        (r["symbol"], r["session_start"], r["session_end"], r["n_events"])
        for r in out
    }
    # watermark after drain = m(60); closed sessions have end <= m(60)
    assert got == {
        (7, m(0), m(40), 2),   # [0, 10] + 30min gap -> end 40
        (8, m(1), m(31), 1),
    }


def test_foreach_batch_gold_sink_matches_batch(spark, tmp_path):
    """Streaming S5 twin: drain the event stream through foreachBatch
    into an append-only parquet gold table (one deterministic file set
    per micro-batch id — the idempotent-on-retry layout), then verify
    the gold table equals the batch computation."""
    import os

    src = load_table(spark, SF, "events")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    sdf = stream_events(spark, SF, max_files_per_trigger=1)

    def sink(batch_df, batch_id: int):
        # partition dir keyed by batch id: a retried micro-batch
        # overwrites its own output instead of duplicating it
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(gold, f"batch_id={batch_id}")
            )
        )

    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = spark.read.option("basePath", gold).parquet(gold)
    assert back.count() == src.count()
    batch = src.select(
        F.col("user_id").alias("symbol"),
        F.col("ts").alias("datetime"),
        F.col("value").alias("close"),
        "event_id",
    )
    got = back.select("symbol", "datetime", "close", "event_id")
    assert got.exceptAll(
        batch.select(
            "symbol",
            F.col("datetime").cast("timestamp").alias("datetime"),
            "close",
            "event_id",
        )
    ).count() == 0


def test_stateful_stream_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once incremental resume: drain batch 1, stop, land a new
    file, restart with the SAME checkpoint — the second drain must
    process only the new file and fold it into the carried per-key
    state (EMA continues, n_rows accumulates), exactly as a 24/7
    pipeline restart would."""
    import datetime as dt
    import glob
    import os

    from big_data_stock_price_forecast_spark.streaming import (
        ema_state_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1)
    schema = "symbol long, datetime timestamp, close double, event_id long"

    def land(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / ("stage_" + name)))
        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*"))[0]
        os.rename(part, os.path.join(src, name + ".parquet"))

    out_dir = str(tmp_path / "out")

    def drain():
        # file sink, not memory: only fault-tolerant sinks support
        # recovering from a checkpoint — which is the point here
        sdf = spark.readStream.schema(schema).parquet(src)
        q = (
            ema_state_stream(sdf, span=3)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return spark.read.parquet(out_dir).collect()

    land(
        [(1, t0 + dt.timedelta(minutes=i), float(10 + i), i) for i in range(3)],
        "b0",
    )
    first = drain()
    assert {(r["symbol"], r["n_rows"]) for r in first} == {(1, 3)}

    land(
        [(1, t0 + dt.timedelta(minutes=3 + i), float(20 + i), 10 + i)
         for i in range(2)],
        "b1",
    )
    second = drain()
    # only the delta was processed, folded into carried state: the sink
    # now holds batch 1's emission (3 rows seen) plus the resumed
    # continuation (5 rows seen)
    assert {(r["symbol"], r["n_rows"]) for r in second} == {(1, 3), (1, 5)}

    # the resumed EMA equals one continuous fold over all 5 closes
    alpha = 2.0 / 4.0
    ema = None
    for x in [10.0, 11.0, 12.0, 20.0, 21.0]:
        ema = x if ema is None else (1.0 - alpha) * ema + alpha * x
    got = {r["ema"] for r in second if r["n_rows"] == 5}
    assert got == {ema}


def test_dedup_ingest_stream_folds_batches_into_index(spark, tmp_path):
    """Streaming incremental dedup: batch 1 must pair against the SEED
    corpus, and batch 2 — arriving after a stream restart from the same
    checkpoint — must pair against a batch-1 doc, proving each
    micro-batch's sketch was folded into the persisted index."""
    import glob
    import os

    from big_data_stock_price_forecast_spark.operators.dedup import (
        write_minhash_index,
    )
    from big_data_stock_price_forecast_spark.streaming import (
        dedup_ingest_stream,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely unrelated words that do not repeat")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "idx")
    write_minhash_index(corpus, idx)

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "doc_id long, text string"

    def land(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / ("stage_" + name)))
        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*"))[0]
        os.rename(part, os.path.join(src, name + ".parquet"))

    pairs_path = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        sdf = spark.readStream.schema(schema).parquet(src)
        q = dedup_ingest_stream(
            sdf, idx, pairs_path, ckpt, threshold=0.9
        )
        q.awaitTermination()
        q.stop()

    # batch 1: doc 10 duplicates seed doc 1; doc 11 is novel
    land([(10, base), (11, "eleven distinct tokens nothing shared here")],
         "b0")
    drain()
    got1 = {
        (r["id_i"], r["id_j"])
        for r in spark.read.parquet(pairs_path).collect()
    }
    assert got1 == {(1, 10)}

    # batch 2 (same checkpoint => resume): doc 20 duplicates BATCH-1
    # doc 11 — only findable if batch 1 was folded into the index
    land([(20, "eleven distinct tokens nothing shared here")], "b1")
    drain()
    got2 = {
        (r["id_i"], r["id_j"])
        for r in spark.read.parquet(pairs_path).collect()
    }
    assert got2 == {(1, 10), (11, 20)}


def test_interval_join_state_carries_across_micro_batches(spark, tmp_path):
    """Cross-batch matching: clicks arrive in micro-batch 1, purchases
    in micro-batch 2 (maxFilesPerTrigger=1). The buffered click state
    must survive into batch 2 and emit exactly the pairs the batch
    range join produces — including dropping the purchase outside the
    1-hour horizon."""
    import pandas as pd

    from big_data_stock_price_forecast_spark.streaming import (
        interval_join_stream,
        run_available_now,
    )

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    clicks = pd.DataFrame(
        {
            "user_id": [1, 2],
            "ts": [t0, t0 + pd.Timedelta(minutes=10)],
            "event_type": ["click", "click"],
            "event_id": [100, 101],
        }
    )
    purchases = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "ts": [
                t0 + pd.Timedelta(minutes=30),   # match (100, 200)
                t0 + pd.Timedelta(hours=2),      # outside horizon
                t0 + pd.Timedelta(minutes=50),   # match (101, 202)
                t0 + pd.Timedelta(minutes=5),    # no click for user 3
            ],
            "event_type": ["purchase"] * 4,
            "event_id": [200, 201, 202, 203],
        }
    )
    for df in (clicks, purchases):
        df["ts"] = df["ts"].astype("datetime64[us]")
    land = tmp_path / "land"
    land.mkdir()
    clicks.to_parquet(land / "page_0.parquet", index=False)
    purchases.to_parquet(land / "page_1.parquet", index=False)

    schema = spark.read.parquet(str(land)).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(land))
        .select(
            F.col("user_id").alias("symbol"),
            F.col("ts").cast("timestamp").alias("datetime"),
            "event_type",
            "event_id",
        )
    )
    c = sdf.filter(F.col("event_type") == "click").select(
        "symbol", "datetime", "event_id"
    )
    p = sdf.filter(F.col("event_type") == "purchase").select(
        "symbol", "datetime", "event_id"
    )
    out = run_available_now(
        interval_join_stream(c, p).select(
            F.col("l.event_id").alias("click_id"),
            F.col("r.event_id").alias("purchase_id"),
        ),
        "append",
    )
    pairs = sorted(map(tuple, out.collect()))
    assert pairs == [(100, 200), (101, 202)]


def test_attribution_state_carries_across_micro_batches(spark, tmp_path):
    """Last-touch state survives the batch boundary: a touch landing in
    micro-batch 1 credits a purchase that arrives in micro-batch 2, and
    feeding the split stream equals one continuous timeline."""
    from big_data_stock_price_forecast_spark.streaming import (
        attribution_state_stream,
    )

    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 5)
    pdf = ev.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "events_page_0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "events_page_1.parquet", index=False)
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
            "event_type",
        )
    )
    out = run_available_now(attribution_state_stream(sdf)).toPandas()
    # python replay over the continuous timeline
    expect = {}
    for sym, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        last = None
        for r in g.itertuples():
            if r.event_type == "purchase":
                expect[int(r.event_id)] = last or "none"
            if r.event_type in ("view", "click"):
                last = r.event_type
    got = dict(zip(out["event_id"].astype(int), out["channel"]))
    assert got == expect
    # at least one purchase must have been credited to a touch from the
    # EARLIER batch (the cross-boundary case this test exists for)
    batch1_touch_users = set(
        pdf.iloc[:half][
            pdf.iloc[:half]["event_type"].isin(["view", "click"])
        ]["user_id"]
    )
    batch2 = pdf.iloc[half:]
    crossers = batch2[
        (batch2["event_type"] == "purchase")
        & batch2["user_id"].isin(batch1_touch_users)
    ]
    assert len(crossers) > 0


def test_cusum_state_carries_across_micro_batches(spark, tmp_path):
    """The CUSUM statistic folds across the batch boundary: splitting
    the stream in two equals the single-batch run (alarm sets and
    statistics identical)."""
    from big_data_stock_price_forecast_spark.streaming import (
        cusum_state_stream,
    )

    ev = load_table(spark, SF, "events").filter(F.col("user_id") < 5)
    pdf = ev.select("event_id", "ts", "user_id", "value").toPandas()
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    land = tmp_path / "land"
    land.mkdir()
    pdf.iloc[:half].to_parquet(land / "events_page_0.parquet", index=False)
    pdf.iloc[half:].to_parquet(land / "events_page_1.parquet", index=False)
    schema = spark.read.parquet(str(land)).schema

    def stream():
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

    stats = spark.createDataFrame(
        [(int(u), 5.0, 2.0) for u in sorted(pdf["user_id"].unique())],
        ["symbol", "mu", "sigma"],
    )
    split = run_available_now(
        cusum_state_stream(stream(), stats)
    ).toPandas()
    # python replay over the continuous series with the same recursion
    expect = {}
    for sym, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        mu, sigma = 5.0, 2.0
        k, h = 0.5 * sigma, 4.0 * sigma
        s_up = s_dn = 0.0
        pup = pdn = None
        for r in g.itertuples():
            x = float(r.value)
            s_up = max(0.0, s_up + (x - mu - k))
            s_dn = max(0.0, s_dn + (mu - k - x))
            if s_up > h and (pup is None or pup <= h):
                expect[(int(r.event_id), "up")] = s_up / sigma
            if s_dn > h and (pdn is None or pdn <= h):
                expect[(int(r.event_id), "down")] = s_dn / sigma
            pup, pdn = s_up, s_dn
    got = {
        (int(r.event_id), r.direction): r.stat_sigmas
        for r in split.itertuples()
    }
    assert set(got) == set(expect)
    for key in got:
        assert abs(got[key] - expect[key]) < 1e-9


def test_gold_sink_idempotent_under_midbatch_crash(spark, tmp_path):
    """Exactly-once under failure injection (the one streaming failure
    mode the resume test doesn't exercise): the sink CRASHES between
    writing a micro-batch's output and Spark committing the batch to
    the offset log. On restart from the same checkpoint Spark replays
    that batch; because each batch overwrites its own batch_id=N
    directory, the replay replaces the orphaned files instead of
    duplicating them — the gold table still equals the batch
    computation exactly."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from big_data_stock_price_forecast_spark.streaming import stream_events

    src = load_table(spark, SF, "events")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    def make_sink(crash_on: set[int]):
        def sink(batch_df, batch_id: int):
            # write FIRST, then crash: simulates dying after the side
            # effect but before the checkpoint commit — the replayed
            # batch must overwrite these exact files
            batch_df.write.mode("overwrite").parquet(
                os.path.join(gold, f"batch_id={batch_id}")
            )
            if batch_id in crash_on:
                crash_on.remove(batch_id)
                raise RuntimeError("injected crash after write")

        return sink

    q = (
        stream_events(spark, SF, max_files_per_trigger=1)
        .writeStream.foreachBatch(make_sink({0}))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        raise AssertionError("injected crash did not propagate")
    except StreamingQueryException:
        pass  # batch 0's files are on disk but batch 0 is uncommitted

    # restart from the SAME checkpoint: batch 0 replays (overwriting
    # its orphaned output), the rest drains normally
    q2 = (
        stream_events(spark, SF, max_files_per_trigger=1)
        .writeStream.foreachBatch(make_sink(set()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    back = spark.read.option("basePath", gold).parquet(gold)
    assert back.count() == src.count()
    assert (
        back.groupBy("event_id").count().filter(F.col("count") > 1).count()
        == 0
    )


def _toy_emb(spark, n=80, seed=5):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.normal(0, 1, 64)], int(i % 4))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, label int"
    )


def _run_ann_ingest(spark, emb, root, n_files, on_batch_end=None,
                    resume=False):
    import os

    from big_data_stock_price_forecast_spark.operators.ivf import (
        write_ivf_stream_layout,
    )
    from big_data_stock_price_forecast_spark.streaming.ops import (
        ann_ingest_stream,
    )

    idx = os.path.join(root, "index")
    landing = os.path.join(root, "landing")
    if not resume:
        write_ivf_stream_layout(
            emb.filter(F.col("vec_id") % 10 != 7), idx
        )
        (
            emb.filter(F.col("vec_id") % 10 == 7)
            .repartition(n_files)
            .write.parquet(landing)
        )
    schema = spark.read.parquet(landing).schema
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .load(landing)
    )
    q = ann_ingest_stream(
        sdf, idx, os.path.join(root, "results"),
        os.path.join(root, "ckpt"), on_batch_end=on_batch_end,
    )
    q.awaitTermination()
    return (
        spark.read.option("basePath", os.path.join(root, "results"))
        .parquet(os.path.join(root, "results"))
    )


def _ann_rows(res_df):
    return sorted(
        (r["q_id"], r["vec_id"], round(r["dist"], 9), r["list_id"])
        for r in res_df.collect()
    )


def test_ann_ingest_batch_order_independent(spark, tmp_path):
    """The emitted candidate union must be identical whether the new
    vectors arrive in one micro-batch or three — the pair (q, c) is
    emitted exactly once by its LATER member's batch, so the read-time
    top-k cannot depend on how ingest was chunked."""
    emb = _toy_emb(spark)
    one = _run_ann_ingest(spark, emb, str(tmp_path / "one"), 1)
    three = _run_ann_ingest(spark, emb, str(tmp_path / "three"), 3)
    rows_one, rows_three = _ann_rows(one), _ann_rows(three)
    assert rows_one == rows_three
    # each (query, candidate) pair exactly once
    pairs = [(a, b) for a, b, _, _ in rows_three]
    assert len(pairs) == len(set(pairs))
    # every new vector queried, no self-pairs
    qids = {a for a, _ in pairs}
    assert qids == {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % 10 == 7).collect()
    }
    assert all(a != b for a, b in pairs)


def test_ann_ingest_idempotent_under_midbatch_crash(spark, tmp_path):
    """Crash injected AFTER batch 0's fold-in + probe writes but
    BEFORE the offset-log commit: the restart replays batch 0, whose
    batch=N-dir overwrites (and the probes batch != batch_id filter,
    which must ignore the crashed attempt's own probes) make the
    replay land identically — final result equals an uncrashed run."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    emb = _toy_emb(spark, seed=7)
    ref = _run_ann_ingest(spark, emb, str(tmp_path / "ref"), 3)

    crash_on = {0}

    def crasher(batch_id: int) -> None:
        if batch_id in crash_on:
            crash_on.remove(batch_id)
            raise RuntimeError("injected crash after writes")

    root = str(tmp_path / "crash")
    try:
        _run_ann_ingest(spark, emb, root, 3, on_batch_end=crasher)
        raise AssertionError("injected crash did not propagate")
    except StreamingQueryException:
        pass
    back = _run_ann_ingest(spark, emb, root, 3, resume=True)
    assert _ann_rows(back) == _ann_rows(ref)


def test_flagship_window_stream_resumes_and_dedups_across_batches(
    spark, tmp_path
):
    """Cross-batch contracts of the streaming flagship's window
    assembler (VERDICT r11 item 2): (1) a ring built in drain 1
    completes and emits in the resumed drain 2 (state carry through
    the checkpoint); (2) keep-last resample dedup spans batches (a
    later-ts row in drain 2 owns a bucket opened in drain 1; an
    equal-ts row with higher event_id wins); (3) gap fill + the eager
    fill-to-open-bucket emit exactly the windows strictly before the
    in-flight bucket."""
    import datetime as dt
    import glob
    import os

    from big_data_stock_price_forecast_spark.streaming import (
        flagship_window_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1)
    base = (1704067200 - 946684800) // 60  # bucket idx anchor (60s step)
    in_schema = "symbol long, datetime timestamp, close double, event_id long"
    out_schema = (
        "symbol long, window_id long, raw array<double>, "
        "future array<double>"
    )

    def land(rows, name):
        spark.createDataFrame(rows, in_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / ("stage_" + name)))
        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*"))[0]
        os.rename(part, os.path.join(src, name + ".parquet"))

    def drain():
        sdf = spark.readStream.schema(in_schema).parquet(src)
        q = (
            flagship_window_stream(
                sdf,
                {1: base + 2},  # deploy-time val cutoff: bucket 2 on
                L=3,
                pred_window=2,
                stride=2,
                step_seconds=60,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return spark.read.schema(out_schema).parquet(out_dir).collect()

    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    # chunk A: buckets 1,2,3, gap at 4, two ticks in bucket 5
    land(
        [
            (1, s(30), 10.0, 1),
            (1, s(90), 20.0, 2),
            (1, s(150), 30.0, 3),
            (1, s(270), 50.0, 4),
            (1, s(280), 50.5, 5),
        ],
        "b0",
    )
    assert drain() == []  # ring (need L+P=5) not yet full

    # chunk B: a LATER tick re-owns bucket 5 (cross-batch keep-last),
    # bucket 7 has an equal-ts event_id tie, gap at 8, open bucket 10
    land(
        [
            (1, s(290), 55.0, 6),
            (1, s(350), 60.0, 7),
            (1, s(410), 69.0, 8),
            (1, s(410), 70.0, 9),
            (1, s(530), 90.0, 10),
            (1, s(590), 99.0, 11),
        ],
        "b1",
    )
    got = {
        r["window_id"]: (list(r["raw"]), list(r["future"]))
        for r in drain()
    }
    # filled val series: b2=20 b3=30 b4=30(fill) b5=55 b6=60 b7=70
    # b8=70(fill) b9=90; b10 stays in-flight. strided cursor = b2, b4
    assert got == {
        base + 2: ([20.0, 30.0, 30.0], [55.0, 60.0]),
        base + 4: ([30.0, 55.0, 60.0], [70.0, 70.0]),
    }
