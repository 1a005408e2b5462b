"""Structured Streaming query domain (batch-oracle twins).

Split mechanically from the monolithic plans/registry.py (r12);
statement order and text preserved verbatim.
"""
from __future__ import annotations

from .registry_common import *  # noqa: F401,F403 — the
# original monolith's prelude + shared helpers; underscore
# names are imported explicitly below
from .registry_common import (  # noqa: F401
    CMS_STREAM_TOP,
    CUSUM_H_SIGMA,
    CUSUM_K_SIGMA,
    DataFrame,
    F,
    FlagshipParams,
    GARCH_ALPHA,
    GARCH_BETA,
    GARCH_OMEGA,
    IVF_NPROBE,
    KNN_K,
    NEAR_DUP_TAU,
    SLIDE_TOPN,
    SparkSession,
    Window,
    _emb,
    _incr_split_id,
    _minhash_index_path,
    _r6,
    _rne,
    _sql_ewm,
    _sql_ivf_base,
    _sql_l2,
    _sql_r6_wrap,
    _sql_rne,
    hash60,
    load_table,
    minhash_coeffs,
    require_utc,
    sql_hash60,
)
from .registry_common import _filled  # noqa: F401
from .registry_ts import (  # noqa: F401
    ROLLBETA_W,
    VPIN_W,
    _sql_ts_vpin,
    _sql_ts_imbalance_bars,
    _sql_ts_run_bars,
    TICK_BAR_N,
    VOLBAR_T_CENTS,
    _flagship_oracle_ctes,
    _sql_ts_cusum_events,
    _sql_ts_rolling_beta,
    _sql_ts_tick_bars,
    _sql_ts_volume_bars,
    rollbeta_mkt_returns,
)



def q_stream_flagship_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the flagship (VERDICT r11 item 2; the one
    reference-derived surface that had no streaming form — reference
    batch shape: notebooks/test.ipynb cell 20): candles append ->
    per-symbol stateful resample + val-suffix window assembly
    (streaming/ops.py flagship_window_stream; state bounded by
    symbols x (L+P)) -> each strided query window emits the moment its
    last future bucket closes -> AFTER the AvailableNow drain, plain
    batch expressions z-score the emissions with sliding_windows'
    exact fold and search the BATCH-BUILT train store (k-NN + top-2
    ensemble + renormalized MAE — the serving split a 24/7 deployment
    runs: store built offline, queries scored as they complete).

    ``val_starts`` is the deploy-time split cutoff collected when the
    train store is built (one row per symbol). The trailing in-flight
    bucket never finalizes (the reference's drop_ends trim), so
    queries touching a symbol's final val bucket are excluded — the
    oracle twin carries the same bound; everything else is bitwise
    the batch flagship's semantics."""
    from ..functions.normalize import zscore_array
    from ..operators.forecast import forecast_evaluate
    from ..streaming import (
        flagship_window_stream,
        run_available_now,
        stream_events,
    )
    from .flagship import flagship_train_store, flagship_val_starts

    p = FlagshipParams()
    val_starts = {
        int(r["symbol"]): int(r["val_start"])
        for r in flagship_val_starts(spark, sf_dir, p).collect()
    }
    out = run_available_now(
        flagship_window_stream(
            stream_events(spark, sf_dir),
            val_starts,
            L=p.L,
            pred_window=p.pred_window,
            stride=p.stride,
            step_seconds=p.step_seconds,
        ),
        "append",
        state_partitions=8,
    )
    # z-score with the SAME left-fold expressions as sliding_windows
    # (operators/windows.py) so streamed query windows are bitwise the
    # batch val windows
    L = float(p.L)
    val_w = out.withColumn(
        "center",
        F.aggregate("raw", F.lit(0.0), lambda a, x: a + x) / F.lit(L),
    )
    val_w = val_w.withColumn(
        "scale",
        F.sqrt(
            F.aggregate(
                "raw",
                F.lit(0.0),
                lambda a, x: a
                + (x - F.col("center")) * (x - F.col("center")),
            )
            / F.lit(L)
        ),
    )
    val_w = val_w.withColumn(
        "xs", zscore_array(F.col("raw"), F.col("center"), F.col("scale"))
    ).select("symbol", "window_id", "center", "scale", "xs", "future")
    res = forecast_evaluate(
        flagship_train_store(spark, sf_dir, p),
        val_w,
        pred_window=p.pred_window,
        k=p.k,
        ensemble=p.ensemble,
        metric=p.metric,
        within_symbol=True,
        dim=p.L,
    )
    return res.select("symbol", "window_id", _rne(F.col("mae"), "mae", 4))


def _sql_stream_flagship() -> str:
    # the batch flagship oracle with ONE extra bound: the stream's
    # trailing in-flight bucket never finalizes, so queries whose
    # [window, future] range touches the symbol's last val bucket are
    # excluded (w + L + P - 1 < max val time_idx)
    p = FlagshipParams()
    cut = p.L + p.pred_window - 1
    extra = (
        f" AND v.window_id + {cut} < "
        "(SELECT max(f.time_idx) FROM filled f "
        "WHERE f.split = 'val' AND f.symbol = v.symbol)"
    )
    return f"""{_flagship_oracle_ctes(p, val_extra=extra)}
SELECT q_symbol AS symbol, q_window_id AS window_id,
       {_sql_rne('avg(abs(pred - target))', 'mae', 4)}
FROM ens JOIN target_steps USING (q_symbol, q_window_id, step)
GROUP BY 1, 2"""


# --------------------------------------------------------------------------
# Structured Streaming queries (SURVEY.md §2.9) — each runs a REAL
# incremental streaming plan (file source -> watermarked stateful op ->
# memory sink) drained with Trigger.AvailableNow, so the result is
# finite and oracle-checkable while the execution path is the one a
# 24/7 deployment would use.
# --------------------------------------------------------------------------


def q_stream_resample_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import resample_stream, run_available_now, stream_events

    out = run_available_now(
        resample_stream(stream_events(spark, sf_dir), "6 hours"),
        "append",
        state_partitions=8,
    )
    # the stream watermarks on an LTZ event time (UTC session, see
    # stream_events); emit NTZ so the result matches DuckDB's naive read
    return out.select(
        "symbol",
        F.col("datetime").cast("timestamp_ntz").alias("datetime"),
        "high",
        "low",
        "n_rows",
    )


# append mode emits a bucket exactly when the watermark (max event time)
# passes its end: every right-labeled bucket strictly before the bucket
# holding the global max ts — the stream's trailing partial bucket stays
# open in state, the streaming analog of the reference's `drop_ends`
# trim (core/data/preprocess.py:118-119)
SQL_STREAM_RESAMPLE = """WITH b AS (
  SELECT user_id AS symbol,
         time_bucket(INTERVAL '6 hours', ts - INTERVAL '1 microsecond')
           + INTERVAL '6 hours' AS datetime,
         max(value) AS high, min(value) AS low, count(*) AS n_rows
  FROM events GROUP BY 1, 2
),
mx AS (
  SELECT time_bucket(INTERVAL '6 hours', max(ts) - INTERVAL '1 microsecond')
           + INTERVAL '6 hours' AS m
  FROM events
)
SELECT symbol, datetime, high, low, n_rows FROM b, mx WHERE b.datetime < mx.m"""


def q_stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import distinct_keys_stream, run_available_now, stream_events

    out = run_available_now(
        distinct_keys_stream(
            stream_events(spark, sf_dir), ["symbol", "datetime"], "datetime"
        ),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", F.col("datetime").cast("timestamp_ntz").alias("datetime")
    )


SQL_STREAM_DEDUP = "SELECT DISTINCT user_id AS symbol, ts AS datetime FROM events"


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import run_available_now, session_stream, stream_events

    out = run_available_now(
        session_stream(stream_events(spark, sf_dir), "30 minutes"),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


# a session's window is [first_event, last_event + gap); append mode
# emits it once the watermark (global max ts after the drain) passes
# its end — i.e. every session except the per-user trailing ones still
# inside their gap at end-of-data
SQL_STREAM_SESSIONS = """
WITH o AS (
  SELECT user_id AS symbol, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT symbol, ts,
         CAST(sum(is_new) OVER (PARTITION BY symbol ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM o
),
g AS (
  SELECT symbol, session_no, min(ts) AS session_start,
         max(ts) + INTERVAL 30 MINUTE AS session_end,
         count(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT symbol, session_start, session_end, n_events
FROM g WHERE session_end <= (SELECT max(ts) FROM events)"""


def q_stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the standard streaming pattern
    of joining arriving facts against a slowly-changing dimension. The
    static side (per-user lifetime stats, batch-computed) broadcasts
    into every micro-batch; the streaming side never shuffles for the
    join. Output: per event_type, how many events came from
    above-median-activity users vs not."""
    from ..streaming import run_available_now, stream_events

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.col("user_id").alias("symbol")).agg(
        F.count(F.lit(1)).alias("user_n")
    )
    med = counts.agg(
        F.expr("percentile(user_n, 0.5D)").alias("m")
    )
    static = counts.crossJoin(F.broadcast(med)).select(
        "symbol", (F.col("user_n") > F.col("m")).alias("heavy_user")
    )
    stream = stream_events(spark, sf_dir).join(F.broadcast(static), "symbol")
    # streaming state: exactly two groups — integer count/checksum
    # aggregates are order-free across micro-batches
    return run_available_now(
        stream.groupBy("heavy_user").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("event_id")).alias("event_id_checksum"),
        ),
        "complete",
        state_partitions=8,
    )


SQL_STREAM_ENRICH = """
WITH counts AS (
  SELECT user_id, count(*) AS user_n FROM events GROUP BY 1
),
med AS (SELECT quantile_cont(user_n, 0.5) AS m FROM counts),
static AS (
  SELECT user_id, user_n > m AS heavy_user FROM counts, med
)
SELECT heavy_user, count(*) AS n_events,
       CAST(sum(event_id) AS BIGINT) AS event_id_checksum
FROM events JOIN static USING (user_id)
GROUP BY 1"""


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution via stream-stream interval join: every purchase
    within 1 hour after a click by the same user, both sides live
    streams (see streaming/ops.py:interval_join_stream for the state
    bound). The pair set — ids and the exact microsecond delta —
    equals the batch range-join oracle."""
    from ..streaming import interval_join_stream, run_available_now, stream_events

    ev = stream_events(spark, sf_dir, keep_type=True)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "symbol", "datetime", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "symbol", "datetime", "event_id"
    )
    joined = interval_join_stream(clicks, purchases)
    out = run_available_now(
        joined.select(
            F.col("l.symbol").alias("symbol"),
            F.col("l.event_id").alias("click_event_id"),
            F.col("r.event_id").alias("purchase_event_id"),
            (
                F.unix_micros(F.col("r.datetime"))
                - F.unix_micros(F.col("l.datetime"))
            ).alias("delta_us"),
        ),
        "append",
        # 8 state partitions: a stream-stream join runs FOUR state
        # stores per partition and this stream's keyspace is tiny; at
        # production rate the same knob is sized to throughput (it is
        # checkpoint-persisted, deliberately not AQE's call)
        state_partitions=8,
    )
    return out


SQL_STREAM_INTERVAL_JOIN = """
SELECT c.user_id AS symbol,
       c.event_id AS click_event_id,
       p.event_id AS purchase_event_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'"""


def q_stream_ema_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import ema_state_stream, run_available_now, stream_events

    out = run_available_now(
        ema_state_stream(stream_events(spark, sf_dir), span=12),
        "append",
        state_partitions=8,
    )
    return out.select("symbol", "n_rows", _r6("ema"))


# same sequential fold as the stateful operator: rows sorted by
# (ts, event_id), y = (1-a)*y + a*x with a = 2/(span+1)
SQL_STREAM_EMA = _sql_r6_wrap(
    f"""WITH lst AS (
  SELECT user_id AS symbol, count(*) AS n_rows,
         list(value ORDER BY ts, event_id) AS vs
  FROM events GROUP BY 1
)
SELECT symbol, n_rows,
       {_sql_ewm('vs', '2.0/13.0')} AS ema
FROM lst""",
    ["symbol", "n_rows"],
    ["ema"],
)


def q_stream_tick_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_tick_bars: event-clock bars assembled in
    per-symbol state (see streaming/ops.py tick_bar_stream — O(1)
    state per symbol), each bar emitted the micro-batch its
    TICK_BAR_N-th tick lands. The oracle is the batch tick-bar query
    restricted to COMPLETE bars — exactly the stream's emission set
    (the trailing partial bar stays in state, the drop-trailing
    convention every streaming twin shares)."""
    from ..streaming import run_available_now, stream_events, tick_bar_stream

    out = run_available_now(
        tick_bar_stream(stream_events(spark, sf_dir), n_bar=TICK_BAR_N),
        "append",
        state_partitions=8,
    )
    return out


def _sql_stream_tick_bars() -> str:
    return (
        f"SELECT * FROM ({_sql_ts_tick_bars()})"
        f" WHERE n_events = {TICK_BAR_N}"
    )


def q_stream_volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_volume_bars: notional-clock bars closed in
    per-symbol state (streaming/ops.py volume_bar_stream — exact
    integer-cents cumulative, O(1) open-bar state), each bar emitted
    when a tick lands in a LATER bar index. Oracle = the batch
    notional bars minus each symbol's trailing (max bar_id) bar — the
    only bar the stream hasn't closed at end-of-data (bar indices may
    skip, so 'trailing' is the max id, not count-1)."""
    from ..streaming import run_available_now, stream_events, volume_bar_stream

    out = run_available_now(
        volume_bar_stream(
            stream_events(spark, sf_dir), t_cents=VOLBAR_T_CENTS
        ),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", "bar_id", "n_events", "open", "high", "low", "close",
        _rne(F.col("notional"), "notional", 6),
        "span_us",
    )


def _sql_stream_volume_bars() -> str:
    return f"""
SELECT * FROM ({_sql_ts_volume_bars()})
QUALIFY bar_id < max(bar_id) OVER (PARTITION BY symbol)"""


def q_stream_imbalance_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_imbalance_bars (streaming/ops.py
    imbalance_bar_stream): the closing tick emits its bar the moment
    |θ| crosses the EMA-calibrated threshold, so the emission set is
    exactly the batch query's CLOSED bars — the oracle reuses the
    batch recursive CTE and keeps the bars whose own recursion flag
    says they closed (no re-derivation from the rounded thr
    output)."""
    from ..streaming import (
        imbalance_bar_stream,
        run_available_now,
        stream_events,
    )

    out = run_available_now(
        imbalance_bar_stream(stream_events(spark, sf_dir)),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", "bar_id", "n_events", "open", "high", "low", "close",
        "imbalance",
        _rne(F.col("thr"), "thr", 6),
        "span_us",
    )


def _sql_stream_imbalance_bars() -> str:
    return _sql_ts_imbalance_bars(closed_only=True)


def q_stream_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_vpin (streaming/ops.py vpin_stream): the
    live flow-toxicity alarm — volume buckets close in per-symbol
    state, each emitting its 1e9-grid toxicity and the
    expanding-until-warm trailing-VPIN_W average the moment a later
    tick lands. Oracle = the batch VPIN minus each symbol's trailing
    (max bar_id) open bucket, the volume-bar twin's bound."""
    from ..streaming import run_available_now, stream_events, vpin_stream

    out = run_available_now(
        vpin_stream(
            stream_events(spark, sf_dir),
            t_cents=VOLBAR_T_CENTS,
            w=VPIN_W,
        ),
        "append",
        state_partitions=8,
    )
    denom = F.col("nw").cast("double") * F.lit(1.0e9)
    return out.select(
        "symbol", "bar_id", "n_events", "nw",
        _rne(F.col("buy_c").cast("double") / F.lit(100.0),
             "buy_notional", 6),
        _rne(F.col("sell_c").cast("double") / F.lit(100.0),
             "sell_notional", 6),
        _rne(F.col("toxq").cast("double") / F.lit(1.0e9), "tox", 8),
        _rne(F.col("stox").cast("double") / denom, "vpin", 8),
    )


def _sql_stream_vpin() -> str:
    return f"""
SELECT * FROM ({_sql_ts_vpin()})
QUALIFY bar_id < max(bar_id) OVER (PARTITION BY symbol)"""


def q_stream_run_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_run_bars (streaming/ops.py
    run_bar_stream) — the stream_imbalance_bars contract with the
    one-sided gross-count trigger: emissions are the batch query's
    CLOSED bars, read off the batch recursion's own closed flag."""
    from ..streaming import run_available_now, run_bar_stream, stream_events

    out = run_available_now(
        run_bar_stream(stream_events(spark, sf_dir)),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", "bar_id", "n_events", "open", "high", "low", "close",
        "n_up", "n_dn",
        _rne(F.col("thr"), "thr", 6),
        "span_us",
    )


def _sql_stream_run_bars() -> str:
    return _sql_ts_run_bars(closed_only=True)


def q_stream_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_rolling_beta — the two-input stream-static
    pattern: the equal-weight index return per grid bucket is
    BATCH-calibrated (rollbeta_mkt_returns over the offline filled
    frame — it needs every symbol, so it cannot be a per-key fold;
    the flagship train-store convention, bucket-count-sized driver
    dict like the val_starts precedent) and shipped into the stateful
    operator, while the per-symbol side streams: state resamples,
    gap-fills and keeps a ROLLBETA_W-deep ring of exact 1e9-snapped
    integer returns (streaming/ops.py rolling_beta_stream). Emissions
    are bitwise the batch rows strictly below each symbol's trailing
    in-flight bucket — the oracle's QUALIFY bound."""
    from ..streaming import (
        rolling_beta_stream,
        run_available_now,
        stream_events,
    )

    mkt_x = {
        int(r["time_idx"]): float(r["x"])
        for r in rollbeta_mkt_returns(_filled(spark, sf_dir)).collect()
    }
    out = run_available_now(
        rolling_beta_stream(
            stream_events(spark, sf_dir), mkt_x, w=ROLLBETA_W
        ),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", "time_idx",
        _rne(F.col("beta"), "beta", 8),
        _rne(F.col("corr"), "corr", 8),
    )


def _sql_stream_rolling_beta() -> str:
    return f"""
SELECT * FROM ({_sql_ts_rolling_beta()})
QUALIFY time_idx < max(time_idx) OVER (PARTITION BY symbol)"""


def q_stream_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_cusum_events — the live event sampler
    (events ARE alarms; a batch pass defeats them): per-symbol state
    resamples ticks into right-closed 6h buckets, gap-fills with the
    carried close, and walks each CLOSED bucket through the
    reset-on-trigger CUSUM recursion in the batch pass's exact float
    operand order (streaming/ops.py cusum_event_stream — the
    rolling-beta bucket device under the labeling.py recursion).
    Emissions are bitwise the batch events strictly below each
    symbol's trailing in-flight grid bucket — the oracle bound (the
    max filled time_idx is the one bucket the stream has not closed
    at end-of-data; unlike the sparse event output, that bound must
    come from the GRID, so the oracle joins the filled frame's
    per-symbol max rather than QUALIFYing the event rows)."""
    from ..streaming import (
        cusum_event_stream,
        run_available_now,
        stream_events,
    )

    out = run_available_now(
        cusum_event_stream(stream_events(spark, sf_dir)),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", "time_idx", "event_id", "direction",
        _rne(F.col("stat"), "stat", 6),
        _rne(F.col("h"), "h", 6),
        "entry",
    )


def _sql_stream_cusum_events() -> str:
    return _sql_ts_cusum_events(closed_only=True)


def q_stream_resume_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-resume delta reprocessing as a driver-checkable
    query — the 24/7-restart contract: chunk A of the event feed
    (event time below the 2/3 cut) lands and drains through the
    stateful EMA operator (streaming/ops.py ema_state_stream) into a
    parquet sink; then chunk B lands and a SECOND drain restarts from
    the SAME checkpoint — the file source's checkpoint proves only
    the delta is reprocessed, and the carried per-key state proves
    the resumed fold continues where drain 1 stopped. The sink then
    holds per symbol the drain-1 emission (fold over chunk A) and the
    drain-2 emission (fold over the FULL feed — bitwise equal to one
    continuous run, which is what the oracle computes two ways).
    Scale shape: state is one (count, ema) cell per key, chunks land
    as time-ordered files (the operator's documented arrival-order
    precondition), and the sink is append-only parquet."""
    import os
    import shutil
    import tempfile

    from ..streaming.ops import ema_state_stream

    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        require_utc(spark)
        ts = ts.cast("timestamp")
    norm = ev.select(
        F.col("user_id").alias("symbol"),
        ts.alias("datetime"),
        F.col("value").alias("close"),
        "event_id",
    )
    b = norm.agg(
        F.min(F.unix_micros("datetime")).alias("mn"),
        F.max(F.unix_micros("datetime")).alias("mx"),
    ).first()
    # positive integers: Python // matches DuckDB's // bitwise
    cut_us = int(b["mn"]) + (int(b["mx"]) - int(b["mn"])) * 2 // 3
    work = tempfile.mkdtemp(prefix="bdspf-resume-")
    try:
        landing = os.path.join(work, "landing")
        sink = os.path.join(work, "sink")
        ckpt = os.path.join(work, "ckpt")
        os.makedirs(landing)

        def land(df: DataFrame, name: str) -> None:
            stage = os.path.join(work, "stage_" + name)
            df.coalesce(1).write.parquet(stage)
            import glob

            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            os.rename(part, os.path.join(landing, name + ".parquet"))

        def drain() -> None:
            schema = spark.read.parquet(
                os.path.join(landing, "a.parquet")
            ).schema
            sdf = (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "*.parquet")
                .parquet(landing)
            )
            q = (
                ema_state_stream(sdf, span=12)
                .writeStream.format("parquet")
                .option("path", sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            q.stop()

        land(norm.filter(F.unix_micros("datetime") < cut_us), "a")
        drain()
        land(norm.filter(F.unix_micros("datetime") >= cut_us), "b")
        drain()
        # localCheckpoint(eager) truncates lineage before the scratch
        # dir is deleted (same hazard as q_stream_dedup_ingest)
        return (
            spark.read.parquet(sink)
            .select("symbol", "n_rows", _r6("ema"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# drain-1 rows = fold over chunk A (users active before the cut);
# drain-2 rows = fold over the FULL feed (users active after the cut)
# — the resumed recursion must equal one continuous fold
SQL_STREAM_RESUME_DELTA = _sql_r6_wrap(
    f"""WITH bnd AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
cut AS (SELECT mn + (mx - mn) * 2 // 3 AS c FROM bnd),
a_rows AS (
  SELECT user_id AS symbol, count(*) AS n_rows,
         list(value ORDER BY ts, event_id) AS vs
  FROM events, cut WHERE epoch_us(ts) < c GROUP BY 1),
all_rows AS (
  SELECT user_id AS symbol, count(*) AS n_rows,
         list(value ORDER BY ts, event_id) AS vs
  FROM events GROUP BY 1),
b_users AS (
  SELECT DISTINCT user_id AS symbol
  FROM events, cut WHERE epoch_us(ts) >= c)
SELECT symbol, n_rows, {_sql_ewm('vs', '2.0/13.0')} AS ema FROM a_rows
UNION ALL
SELECT r.symbol, r.n_rows, {_sql_ewm('vs', '2.0/13.0')} AS ema
FROM all_rows r JOIN b_users USING (symbol)""",
    ["symbol", "n_rows"],
    ["ema"],
)


def q_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HyperLogLog distinct-user counts per day — the
    mergeability property doing real work: registers are a
    max-aggregate, so a plain streaming groupBy MAX in complete mode
    maintains the sketch across micro-batches with (days × 64)-row
    state, and the estimate is computed once from the final register
    frame. The exact per-day distinct count joins in batch-side, so
    the approximation error stays a measured column (the sketch
    family's contract)."""
    from ..operators.sketch import (
        HLL_BUCKET_BITS,
        HLL_M,
        HLL_W_BITS,
        hll_estimate,
    )
    from ..streaming import run_available_now, stream_events

    sdf = stream_events(spark, sf_dir)
    h = hash60(F.col("symbol").cast("string"))
    w = F.shiftright(h, HLL_BUCKET_BITS)
    rank = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    regs_stream = (
        sdf.select(
            F.to_date("datetime").alias("day"),
            F.pmod(h, F.lit(HLL_M)).alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").alias("m_rank"))
    )
    regs = run_available_now(regs_stream, "complete", state_partitions=8)
    est = hll_estimate(regs, ["day"])
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return est.join(exact, "day").select(
        "day", "n_exact", _rne(F.col("hll_est"), "hll_est", 6)
    )


def _sql_stream_hll() -> str:
    from ..operators.sketch import (
        HLL_ALPHA,
        HLL_BUCKET_BITS,
        HLL_M,
        HLL_W_BITS,
    )

    p = HLL_W_BITS + 1
    return f"""
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         {sql_hash60('CAST(user_id AS VARCHAR)')} AS h
  FROM events),
br AS (
  SELECT day, h % {HLL_M} AS bucket,
         CASE WHEN (h >> {HLL_BUCKET_BITS}) = 0 THEN {p}
              ELSE {p} - length(bin(h >> {HLL_BUCKET_BITS})) END
           AS rank
  FROM h),
regs AS (
  SELECT day, bucket, max(rank) AS m_rank FROM br GROUP BY 1, 2),
agg AS (
  SELECT day, count(*) AS n_buckets,
         CAST(sum(CAST(power(2.0, {p} - m_rank) AS BIGINT)) AS BIGINT)
           AS s_present
  FROM regs GROUP BY 1),
est AS (
  SELECT day, n_buckets,
         {HLL_ALPHA * HLL_M * HLL_M!r} * {float(1 << p)!r}
           / (s_present + ({HLL_M} - n_buckets) * {1 << p}) AS raw,
         {HLL_M} - n_buckets AS v
  FROM agg),
fin AS (
  SELECT day,
         CASE WHEN raw <= {2.5 * HLL_M} AND v > 0
              THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
              ELSE raw END AS hll_est
  FROM est),
exact AS (
  SELECT CAST(ts AS DATE) AS day,
         count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1)
SELECT f.day, CAST(e.n_exact AS BIGINT) AS n_exact,
       {_sql_rne('f.hll_est', 'hll_est')}
FROM fin f JOIN exact e USING (day)"""


def q_stream_cms_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min maintenance — the sum-mergeable sketch
    beside the max-mergeable streaming HLL: per-micro-batch cell
    counts fold into (depth × width)-row state via a plain streaming
    groupBy SUM in complete mode; the top-10 heaviest users (exact
    counts from the batch side, the measured-error contract) probe the
    final sketch for their Count-Min upper bounds. At 100 TB the
    sketch state is KBs regardless of user cardinality — the entire
    point of maintaining the sketch instead of the counts."""
    from ..operators.dedup import MH_PRIME as P
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_estimate
    from ..streaming import run_available_now, stream_events

    a, b = minhash_coeffs(CMS_DEPTH)
    sdf = stream_events(spark, sf_dir)
    h = hash60(F.col("symbol").cast("string")) % F.lit(P)
    cells_stream = (
        sdf.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            F.pmod(
                                F.pmod(
                                    h * F.lit(a[d]) + F.lit(b[d]),
                                    F.lit(P),
                                ),
                                F.lit(CMS_WIDTH),
                            ).alias("cell"),
                        )
                        for d in range(CMS_DEPTH)
                    ]
                )
            ).alias("dc")
        )
        .groupBy("dc.d", "dc.cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cells = run_available_now(cells_stream, "complete", state_partitions=8)
    ev = load_table(spark, sf_dir, "events")
    top = (
        ev.groupBy(F.col("user_id").cast("string").alias("term"))
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("term").asc())
        .limit(CMS_STREAM_TOP)
    )
    est = cms_estimate(top.select("term"), cells)
    return top.join(est, "term").select(
        F.col("term").cast("long").alias("user_id"),
        "true_cnt",
        F.col("est_cnt").alias("cms_cnt"),
    )


def _sql_stream_cms() -> str:
    from ..operators.dedup import MH_PRIME as P
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH

    a, b = minhash_coeffs(CMS_DEPTH)
    coeff_rows = ", ".join(
        f"({d}, {a[d]}, {b[d]})" for d in range(CMS_DEPTH)
    )
    return f"""
WITH h AS (
  SELECT {sql_hash60('CAST(user_id AS VARCHAR)')} % {P} AS h,
         user_id
  FROM events),
coeff(d, a, b) AS (VALUES {coeff_rows}),
cells AS (
  SELECT c.d, ((h.h * c.a + c.b) % {P}) % {CMS_WIDTH} AS cell,
         count(*) AS cnt
  FROM h CROSS JOIN coeff c GROUP BY 1, 2),
top AS (
  SELECT user_id, any_value(h) AS h, count(*) AS true_cnt
  FROM h GROUP BY user_id
  ORDER BY true_cnt DESC, CAST(user_id AS VARCHAR) ASC
  LIMIT {CMS_STREAM_TOP}),
est AS (
  SELECT p.user_id, min(cells.cnt) AS est_cnt
  FROM (
    SELECT t.user_id, c.d,
           ((t.h * c.a + c.b) % {P}) % {CMS_WIDTH} AS cell
    FROM top t CROSS JOIN coeff c) p
  JOIN cells USING (d, cell) GROUP BY 1)
SELECT t.user_id, CAST(t.true_cnt AS BIGINT) AS true_cnt,
       CAST(e.est_cnt AS BIGINT) AS cms_cnt
FROM top t JOIN est e USING (user_id)"""


def q_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM change-point monitor (streaming/ops.py
    cusum_state_stream): per-symbol batch-calibrated (μ, σ) joined
    stream-static into the live event stream, the textbook recursion
    in four doubles of per-key state, alarms emitted exactly once at
    the crossing. The oracle is the closed window form over the same
    raw series — recursion and closed form agree to far below the
    1e-6 emission grid."""
    from ..streaming import cusum_state_stream, run_available_now, stream_events

    ev = load_table(spark, sf_dir, "events")
    grid = F.lit(1e6)
    snap = lambda c: F.floor(c * grid + F.lit(0.5)) / grid  # noqa: E731
    raw = ev.select(F.col("user_id").alias("symbol"), "value")
    stats = (
        raw.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(snap(F.col("value")).cast("decimal(18,6)")).alias("sx"),
            F.sum(
                snap(F.col("value") * F.col("value")).cast("decimal(18,6)")
            ).alias("sxx"),
        )
        .select(
            "symbol",
            (F.col("sx").cast("double") / F.col("n")).alias("mu"),
            F.sqrt(
                F.col("sxx").cast("double") / F.col("n")
                - (F.col("sx").cast("double") / F.col("n"))
                * (F.col("sx").cast("double") / F.col("n"))
            ).alias("sigma"),
        )
    )
    out = run_available_now(
        cusum_state_stream(
            stream_events(spark, sf_dir), stats,
            CUSUM_K_SIGMA, CUSUM_H_SIGMA,
        ),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", "event_id", "direction",
        _rne(F.col("stat_sigmas"), "stat_sigmas", 6),
    )


def _sql_stream_cusum() -> str:
    snap = lambda e: f"floor(({e}) * 1000000.0 + 0.5) / 1000000.0"  # noqa: E731
    return f"""WITH stats AS (
  SELECT user_id AS symbol,
         CAST(sum(CAST({snap('value')} AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) AS mu,
         sqrt(CAST(sum(CAST({snap('value * value')} AS DECIMAL(18,6)))
                AS DOUBLE) / count(*)
              - (CAST(sum(CAST({snap('value')} AS DECIMAL(18,6)))
                   AS DOUBLE) / count(*))
              * (CAST(sum(CAST({snap('value')} AS DECIMAL(18,6)))
                   AS DOUBLE) / count(*))) AS sigma
  FROM events GROUP BY 1),
q AS (
  SELECT e.user_id AS symbol, e.event_id, e.ts, s.sigma,
         sum(e.value - s.mu - {CUSUM_K_SIGMA} * s.sigma) OVER cum AS qup,
         sum(s.mu - {CUSUM_K_SIGMA} * s.sigma - e.value) OVER cum AS qdn
  FROM events e JOIN stats s ON e.user_id = s.symbol
  WINDOW cum AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                 ROWS UNBOUNDED PRECEDING)),
s AS (
  SELECT symbol, event_id, ts, sigma,
         qup - least(min(qup) OVER cum, 0.0) AS s_up,
         qdn - least(min(qdn) OVER cum, 0.0) AS s_dn
  FROM q
  WINDOW cum AS (PARTITION BY symbol ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)),
x AS (
  SELECT *, {CUSUM_H_SIGMA} * sigma AS h,
         lag(s_up) OVER w AS pup, lag(s_dn) OVER w AS pdn
  FROM s
  WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id))
SELECT symbol, event_id, 'up' AS direction,
       {_sql_rne('s_up / nullif(sigma, 0.0)', 'stat_sigmas')}
FROM x WHERE s_up > h AND coalesce(pup <= h, TRUE)
UNION ALL
SELECT symbol, event_id, 'down' AS direction,
       {_sql_rne('s_dn / nullif(sigma, 0.0)', 'stat_sigmas')}
FROM x WHERE s_dn > h AND coalesce(pdn <= h, TRUE)"""


def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming last-touch attribution (streaming/ops.py
    attribution_state_stream): per-purchase rows with the crediting
    channel, produced by the stateful per-user operator under
    AvailableNow — the second custom applyInPandasWithState operator
    beside the EMA state fold. The batch oracle is the same
    conditional-LAST window the batch attribution query uses, emitted
    per purchase instead of per channel."""
    from ..streaming import attribution_state_stream, run_available_now, stream_events

    out = run_available_now(
        attribution_state_stream(
            stream_events(spark, sf_dir, keep_type=True)
        ),
        "append",
        state_partitions=8,
    )
    return out.select(
        F.col("symbol").alias("user_id"), "event_id", "channel", "value"
    )


SQL_STREAM_ATTRIBUTION = """
WITH tagged AS (
  SELECT user_id, event_id, event_type, value,
         coalesce(last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  'none') AS channel
  FROM events)
SELECT user_id, event_id, channel, value
FROM tagged WHERE event_type = 'purchase'"""



def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-ingest STREAM as a driver-checkable query: the new
    batch (top tenth of the id space, the incremental-dedup split)
    lands as files and streams through streaming/ops.py
    ``dedup_ingest_stream`` in micro-batches — each one sketched once,
    checked against the persisted corpus index, and folded in so later
    micro-batches dedup against earlier ones. The union of per-batch
    pair outputs is EXACTLY the batch incremental run's pair set
    (every pair touches ≥1 new doc; the pair is emitted by the batch
    of its LATER member, once), so the oracle is the same
    new-touching filter of the full-run pairs as
    ``doc_incremental_dups``. The cached corpus index is COPIED to a
    scratch dir first — the stream mutates its index (that is the
    point), and the shared cache must stay pristine."""
    import os
    import shutil
    import tempfile

    from ..streaming.ops import dedup_ingest_stream

    docs = load_table(spark, sf_dir, "documents")
    split = _incr_split_id(spark, sf_dir)
    src_idx = _minhash_index_path(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="bdspf-sdi-")
    try:
        idx = os.path.join(work, "index")
        # hardlink clone (same filesystem): instant regardless of index
        # size; safe because the stream only ADDS batch=N dirs — the
        # seed partitions' files are never modified in place
        shutil.copytree(src_idx, idx, copy_function=os.link)
        landing = os.path.join(work, "landing")
        pairs_path = os.path.join(work, "pairs")
        ckpt = os.path.join(work, "ckpt")
        (
            docs.filter(F.col("doc_id") >= split)
            .select("doc_id", "text")
            .repartition(2)
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
        q = dedup_ingest_stream(
            sdf, idx, pairs_path, ckpt, threshold=NEAR_DUP_TAU
        )
        q.awaitTermination()
        # localCheckpoint(eager) truncates lineage — persist() alone
        # keeps a plan rooted at the scratch parquet that the finally
        # block deletes, so any cache eviction after return would
        # recompute from dead paths.
        return (
            spark.read.option("basePath", pairs_path)
            .parquet(pairs_path)
            .select("id_i", "id_j", _r6("jac"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous k-NN over a GROWING IVF index as a driver-checkable
    query: the new split (vec_id % 10 == 7) lands as files and streams
    through streaming/ops.py ``ann_ingest_stream`` in micro-batches —
    each batch emits candidate rows for earlier queries it could
    displace, folds into the layout's list dirs, then probes the grown
    index as queries. The emitted union is batch-order-independent
    (every (query, candidate) pair once, by its LATER member's batch),
    so the read-time top-k equals the batch IVF answer with queries =
    new split, candidates = everything, quantizer = SEED centroids —
    which is exactly the oracle."""
    import os
    import shutil
    import tempfile

    from ..operators.ivf import write_ivf_stream_layout
    from ..streaming.ops import ann_ingest_stream

    emb = _emb(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="bdspf-sai-")
    try:
        idx = os.path.join(work, "index")
        write_ivf_stream_layout(emb.filter(F.col("vec_id") % 10 != 7), idx)
        landing = os.path.join(work, "landing")
        (
            emb.filter(F.col("vec_id") % 10 == 7)
            .repartition(2)
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
        results = os.path.join(work, "results")
        ckpt = os.path.join(work, "ckpt")
        q = ann_ingest_stream(sdf, idx, results, ckpt, nprobe=IVF_NPROBE)
        q.awaitTermination()
        w = Window.partitionBy("q_id").orderBy(
            F.col("dist").asc(), F.col("vec_id").asc()
        )
        return (
            spark.read.option("basePath", results)
            .parquet(results)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= KNN_K)
            .select("q_id", "vec_id", "rank", _r6("dist"), "list_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _sql_stream_ann_ingest() -> str:
    l2_qc = _sql_l2("q.qv", "c.cvec")
    l2_aq = _sql_l2("a.v", "p.qv")
    base = _sql_ivf_base(
        cent_src="seed",
        pre="seed AS (SELECT * FROM emb WHERE vec_id % 10 <> 7),\n",
    )
    return f"""
WITH {base},
q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 10 = 7),
probes AS (
  SELECT q_id, qv, list_id FROM (
    SELECT q.q_id, q.qv, c.label AS list_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY {l2_qc} ASC, c.label ASC) AS rk
    FROM q CROSS JOIN cent c)
  WHERE rk <= {IVF_NPROBE}
),
cand AS (
  SELECT p.q_id, a.vec_id, a.list_id, {l2_aq} AS dist
  FROM assigned a JOIN probes p USING (list_id)
  WHERE a.vec_id <> p.q_id
),
ranked AS (
  SELECT q_id, vec_id, list_id, dist,
         CAST(row_number() OVER (PARTITION BY q_id
           ORDER BY dist ASC, vec_id ASC) AS INT) AS rank
  FROM cand
)
SELECT q_id, vec_id, rank,
       floor(dist * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS dist, list_id
FROM ranked WHERE rank <= {KNN_K}"""


def q_stream_gold_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch gold-table sink as a driver-checkable query:
    drain the event stream through a foreachBatch parquet sink writing
    one ``batch_id=N`` partition per micro-batch (overwrite — a
    replayed micro-batch lands idempotently, the at-least-once →
    exactly-once layout), then read the gold table back and aggregate
    per symbol. Money sums ride integer cents so the result is
    micro-batch-order-independent and engine-exact."""
    import os
    import shutil
    import tempfile

    from ..streaming.ops import stream_events

    work = tempfile.mkdtemp(prefix="bdspf-gold-")
    try:
        gold = os.path.join(work, "gold")
        ckpt = os.path.join(work, "ckpt")
        sdf = stream_events(spark, sf_dir, max_files_per_trigger=1)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(gold, f"batch_id={batch_id}")
            )

        q = (
            sdf.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        back = spark.read.option("basePath", gold).parquet(gold)
        # localCheckpoint(eager) truncates lineage — see
        # q_stream_dedup_ingest (same scratch-dir-deletion hazard).
        return (
            back.groupBy("symbol")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.floor(F.col("close") * 100 + F.lit(0.5)).cast("long")
                ).alias("cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_STREAM_GOLD_SINK = """
SELECT user_id AS symbol, count(*) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM events GROUP BY 1"""


def q_stream_garch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_garch_vol: the GARCH(1,1) recursion as a
    custom stateful operator (streaming/ops.py garch_state_stream,
    applyInPandasWithState) folding the RAW event feed per symbol —
    state is one (count, last close, variance) cell per key, emitted
    as the running vol after the AvailableNow drain. The oracle is
    the same fold expressed as a DuckDB list_reduce over the
    (ts, event_id)-ordered squared-return list: list_reduce's
    seed-with-first-element IS the recursion's seed-v-with-first-r²
    convention, so the two are bitwise equal given the grid-snapped
    r² inputs (snap 1e-12 before the fold, r8 on the final √)."""
    from ..streaming import garch_state_stream, run_available_now, stream_events

    out = run_available_now(
        garch_state_stream(
            stream_events(spark, sf_dir),
            omega=GARCH_OMEGA, alpha=GARCH_ALPHA, beta=GARCH_BETA,
        ),
        "append",
        state_partitions=8,
    )
    return out.select(
        "symbol", "n_rows", _rne(F.col("garch_vol"), "garch_vol", 8)
    )


def _sql_stream_garch_state() -> str:
    return f"""
WITH rr AS (
  SELECT user_id AS symbol, ts, event_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
r2s AS (
  SELECT symbol, ts, event_id,
         floor(pow(CASE WHEN value > 0 AND prev > 0
                        THEN ln(value / prev) ELSE 0.0 END, 2)
               * 1000000000000.0 + 0.5) / 1000000000000.0 AS r2
  FROM rr WHERE prev IS NOT NULL),
lst AS (
  SELECT symbol, list(r2 ORDER BY ts, event_id) AS rs FROM r2s GROUP BY 1),
cnt AS (
  SELECT user_id AS symbol, count(*) AS n_rows FROM events GROUP BY 1)
SELECT c.symbol, c.n_rows,
       {_sql_rne(
           "sqrt(list_reduce(l.rs, (acc, x) -> "
           f"{GARCH_OMEGA} + {GARCH_ALPHA} * x + {GARCH_BETA} * acc))",
           "garch_vol", 8)}
FROM cnt c LEFT JOIN lst l ON c.symbol = l.symbol"""


def q_stream_sliding_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window leaderboard over the live stream — per 24h
    window sliding every 6h, the top-3 most-active symbols: the
    dashboard query every ops/trading screen runs, and the one
    Structured Streaming WINDOW MODE the family didn't yet exercise
    (resample = tumbling, sessions = gap-based; sliding multiplies
    every event into duration/slide = 4 state rows — the state-cost
    tradeoff this query demonstrates). The stream emits each window
    exactly once when the watermark passes its end (AvailableNow
    drain ⇒ windows with end ≤ max event time — the oracle's bound);
    ranking runs AFTER the sink on the window-bounded emitted frame
    (append mode forbids a post-aggregate rank inside the stream) as
    a per-window WindowGroupLimit. Counts/extrema only —
    order-insensitive, bitwise deterministic under any micro-batch
    partitioning."""
    from ..streaming import run_available_now, sliding_count_stream, stream_events

    out = run_available_now(
        sliding_count_stream(
            stream_events(spark, sf_dir), "24 hours", "6 hours"
        ),
        "append",
        state_partitions=8,
    )
    wr = Window.partitionBy("window_end").orderBy(
        F.col("n_rows").desc(), F.col("symbol").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= SLIDE_TOPN)
        .select(
            F.col("window_end").cast("timestamp_ntz").alias("window_end"),
            F.col("rank").cast("long").alias("rank"),
            "symbol",
            "n_rows",
            _rne(F.col("high"), "high", 8),
            _rne(F.col("low"), "low", 8),
        )
    )


def _sql_stream_sliding_topn() -> str:
    # every event joins its 4 overlapping windows (k = 0..3 slides
    # back); append mode emits windows with end <= max(shifted event
    # time) — the same bound as the tumbling stream oracle
    return f"""
WITH e AS (
  SELECT user_id AS symbol, value AS close,
         ts - INTERVAL 1 MICROSECOND AS te
  FROM events),
asg AS (
  SELECT symbol, close,
         time_bucket(INTERVAL '6 hours', te)
           - k * INTERVAL '6 hours' + INTERVAL '24 hours' AS window_end
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)),
agg AS (
  SELECT symbol, window_end, count(*) AS n_rows,
         max(close) AS high, min(close) AS low
  FROM asg
  WHERE window_end <= (SELECT max(te) FROM e)
  GROUP BY 1, 2),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY window_end
             ORDER BY n_rows DESC, symbol) AS rank
  FROM agg QUALIFY rank <= {SLIDE_TOPN})
SELECT window_end, rank::BIGINT AS rank, symbol, n_rows,
       {_sql_rne('high', 'high', 8)},
       {_sql_rne('low', 'low', 8)}
FROM rk"""


def q_stream_jump_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ts_jump_test: realized variance and bipower
    variation accumulate per symbol as INTEGER-grid sums in stream
    state (streaming/ops.py jump_state_stream), so the drained totals
    are bitwise the batch fold's regardless of micro-batch
    partitioning — the RV/BV/relative-jump card a 24/7 risk monitor
    keeps current on the raw tick feed (the garch_state_stream
    convention: no resample, dedup folded into the event order). The
    oracle replays the same grid-snapped sums over the
    (ts, event_id)-ordered feed in exact DECIMAL."""
    from ..streaming.ops import (
        jump_state_stream,
        run_available_now,
        stream_events,
    )

    out = run_available_now(
        jump_state_stream(stream_events(spark, sf_dir)),
        "append",
        state_partitions=8,
    )
    rv = F.col("rv_q").cast("double") / F.lit(1e12)
    bv = F.lit(math.pi / 2.0) * F.col("bp_q").cast("double") / F.lit(1e12)
    return out.filter(F.col("n_rets") >= 3).select(
        "symbol",
        F.col("n_rets").cast("long").alias("n_rets"),
        _rne(rv, "rv", 10),
        _rne(bv, "bv", 10),
        _rne(F.when(rv > 0, (rv - bv) / rv), "rel_jump", 8),
    )


def _sql_stream_jump_state() -> str:
    return f"""
WITH rr AS (
  SELECT user_id AS symbol, ts, event_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
lr AS (
  SELECT symbol, ts, event_id,
         CASE WHEN value > 0 AND prev > 0
              THEN ln(value / prev) END AS r
  FROM rr WHERE prev IS NOT NULL),
lr2 AS (
  SELECT symbol, r,
         lag(r) OVER (PARTITION BY symbol ORDER BY ts, event_id) AS rp
  FROM (SELECT * FROM lr WHERE r IS NOT NULL)),
agg AS (
  SELECT symbol, count(*) AS n_rets,
         sum(CAST(floor(r * r * 1e12 + 0.5) AS DECIMAL(38,0))) AS rv_q,
         sum(CAST(floor(abs(r) * abs(rp) * 1e12 + 0.5)
                  AS DECIMAL(38,0))) AS bp_q
  FROM lr2 GROUP BY 1 HAVING count(*) >= 3)
SELECT symbol, n_rets::BIGINT AS n_rets,
       {_sql_rne('rv_q::DOUBLE / 1e12', 'rv', 10)},
       {_sql_rne('(pi() / 2.0) * coalesce(bp_q, 0)::DOUBLE / 1e12',
                 'bv', 10)},
       {_sql_rne(
           'CASE WHEN rv_q::DOUBLE / 1e12 > 0 THEN '
           '(rv_q::DOUBLE / 1e12 - (pi() / 2.0) * '
           'coalesce(bp_q, 0)::DOUBLE / 1e12) / (rv_q::DOUBLE / 1e12) END',
           'rel_jump', 8)}
FROM agg"""
