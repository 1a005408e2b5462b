"""Structured Streaming surface (SURVEY.md §2.9).

The reference has no streaming runtime; its incremental-ingest design
(core/data/cdd.py:101-110 — append new candles, dedup on datetime) and
event-time resample (core/data/preprocess.py:99-122) are the natural
streaming story. Implemented here as genuinely incremental plans:

- file source over the parquet landing dir (pagination ≈ one file per
  fetched page; ``maxFilesPerTrigger`` bounds micro-batch size),
- event-time watermark + windowed aggregation for the OHLCV resample
  (late candles within the watermark re-bucket correctly; append mode
  emits a bucket exactly once, when the watermark passes its end),
- ``dropDuplicatesWithinWatermark`` for the ingest dedup,
- ``applyInPandasWithState`` for sequential-recursive indicators (EMA)
  that row-frame window functions cannot express — per-symbol state
  carries the running value across micro-batches.

At 100 TB scale the same plans run unchanged against a real landing
bucket: state is partitioned by (symbol | key) across executors, the
watermark bounds state size, and RocksDB state store handles the rest.
Tests drive them with ``Trigger.AvailableNow`` so the result is a
finite, oracle-checkable DataFrame.
"""

from __future__ import annotations

import itertools
import math
import os
import shutil
import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import require_utc
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SINK_IDS = itertools.count()


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    keep_type: bool = False,
) -> DataFrame:
    """``events.parquet`` as a streaming source with the same schema
    normalization as the batch loader (sources/tables.py): nanos-as-long
    ``ts`` -> microsecond timestamp, series column names.
    """
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file stream source wants a directory to monitor (a landing dir
    # in production); scope it to the events file(s) with a glob filter
    reader = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    sdf = reader.load(sf_dir)
    if dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(sdf.dtypes).get("ts") == "timestamp_ntz":
        # event-time watermarks require an instant (LTZ) timestamp;
        # the NTZ->LTZ cast preserves the stored micros bitwise only
        # under UTC — asserted, not set (the session factory and the
        # __spark_entry__ wrappers own the pin; queries cast outputs
        # back to NTZ so results match the batch oracle's naive values)
        require_utc(spark)
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    cols = [
        F.col("user_id").alias("symbol"),
        F.col("ts").alias("datetime"),
        F.col("value").alias("close"),
        F.col("event_id"),
    ]
    if keep_type:
        cols.append(F.col("event_type"))
    return sdf.select(*cols)


def resample_stream(
    sdf: DataFrame, every: str = "6 hours", watermark: str = "0 seconds"
) -> DataFrame:
    """Event-time OHLCV-style resample over a stream — the streaming
    flavor of operators/resample.py (right-closed, right-labeled buckets
    per the reference's ``resample(label="right", closed="right")``,
    core/data/preprocess.py:110).

    Only order-insensitive aggregates (max / min / count) so the result
    is bitwise deterministic regardless of micro-batch partitioning.
    In append mode a bucket is emitted exactly once, when the watermark
    passes its end — i.e. the stream's trailing partial bucket stays in
    state, which is precisely the reference's ``drop_ends`` trim of the
    unfinished last bucket.
    """
    shifted = sdf.withColumn(
        "__evt", F.col("datetime") - F.expr("INTERVAL 1 MICROSECOND")
    ).withWatermark("__evt", watermark)
    return shifted.groupBy(
        F.col("symbol"), F.window(F.col("__evt"), every).alias("__w")
    ).agg(
        F.max("close").alias("high"),
        F.min("close").alias("low"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "symbol", F.col("__w.end").alias("datetime"), "high", "low", "n_rows"
    )


def sliding_count_stream(
    sdf: DataFrame,
    duration: str = "24 hours",
    slide: str = "6 hours",
    watermark: str = "0 seconds",
) -> DataFrame:
    """SLIDING-window per-symbol activity counts — the one windowing
    mode the streaming family didn't yet exercise (resample_stream is
    tumbling, session_stream is gap-based). Every event lands in
    duration/slide overlapping windows (4 here), each a separate state
    row; in append mode a window emits exactly once when the watermark
    passes its END — so after an AvailableNow drain exactly the windows
    with end <= max(event time) have fired, which is the batch oracle's
    bound. The right-closed −1µs shift matches resample_stream; only
    order-insensitive aggregates (count / max / min), so the emitted
    rows are bitwise deterministic under any micro-batch partitioning."""
    shifted = sdf.withColumn(
        "__evt", F.col("datetime") - F.expr("INTERVAL 1 MICROSECOND")
    ).withWatermark("__evt", watermark)
    return (
        shifted.groupBy(
            F.col("symbol"),
            F.window(F.col("__evt"), duration, slide).alias("__w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("close").alias("high"),
            F.min("close").alias("low"),
        )
        .select(
            "symbol",
            F.col("__w.end").alias("window_end"),
            "n_rows",
            "high",
            "low",
        )
    )


def session_stream(
    sdf: DataFrame, gap: str = "30 minutes", watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming sessionization with Spark's native ``session_window``
    — the streaming twin of the batch gap-based sessionize query.
    Events within ``gap`` of each other merge into one session whose
    window is [first_event, last_event + gap); state per (symbol,
    open session) lives in the state store and is emitted exactly once
    in append mode, when the watermark passes the session's end.

    Oracle equivalence: after an AvailableNow drain the watermark sits
    at the global max event time, so exactly the sessions with
    ``last_event + gap <= max(ts)`` have closed — the batch twin
    filters on the same bound. The trailing still-open sessions
    remaining in state are the streaming analog of the resample
    operator's unfinished last bucket.
    """
    return (
        sdf.withWatermark("datetime", watermark)
        .groupBy(
            F.col("symbol"),
            F.session_window(F.col("datetime"), gap).alias("__w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "symbol",
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            "n_events",
        )
    )


def distinct_keys_stream(
    sdf: DataFrame, keys: list[str], event_time: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming ingest dedup (reference S7, core/data/cdd.py:101-110):
    duplicate (symbol, datetime) arrivals within the watermark are
    dropped, state for keys older than the watermark is evicted. Emits
    key columns only so output is deterministic under any arrival order.

    Oracle-equivalence precondition: the batch oracle is a global
    SELECT DISTINCT, but this operator only dedups arrivals that land
    within the watermark of each other — a duplicate arriving after its
    key's state was evicted is re-emitted. The equivalence holds when
    the source delivers rows in (approximately) event-time order with
    duplicate arrivals separated by less than the watermark — true for
    the landing layout the engine's ingest writes (time-ordered files,
    duplicates adjacent by construction). For an out-of-order source,
    widen ``watermark`` to the source's duplicate-arrival horizon.
    """
    return (
        sdf.withWatermark(event_time, watermark)
        .select(*keys)
        .dropDuplicatesWithinWatermark(keys)
    )


_EMA_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("n_rows", LongType()),
        StructField("ema", DoubleType()),
    ]
)
_EMA_STATE = StructType(
    [StructField("n", LongType()), StructField("ema", DoubleType())]
)


def _ema_state_fn(span: int):
    alpha = 2.0 / (span + 1.0)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        n, ema = state.get if state.exists else (0, None)
        for x in pdf["close"].to_numpy():
            x = float(x)
            ema = x if ema is None else (1.0 - alpha) * ema + alpha * x
            n += 1
        state.update((n, ema))
        yield pd.DataFrame({"symbol": [key[0]], "n_rows": [n], "ema": [ema]})

    return fn


def ema_state_stream(sdf: DataFrame, span: int = 12) -> DataFrame:
    """Per-symbol EMA as a custom stateful streaming operator
    (``applyInPandasWithState``): the recursion y = (1-a)·y + a·x
    (reference W4, pandas ``ewm(span, adjust=False)``,
    core/data/preprocess.py:52-54) cannot be a row-frame window
    function; here the running (count, ema) lives in per-key state and
    each micro-batch folds its — deterministically (datetime, event_id)
    sorted — rows into it, emitting the updated running value.

    Oracle-equivalence precondition: rows are sorted within a
    micro-batch, but state folds batches in ARRIVAL order — the batch
    oracle (one global time-ordered fold per key) matches only when
    batches arrive in event-time order, as they do for the engine's
    time-ordered landing files (AvailableNow drains them in order). A
    late row spanning batches would fold out of order; unbounded exact
    ordering would need the raw rows kept in state until the watermark
    closes.
    """
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _ema_state_fn(span),
            outputStructType=_EMA_OUT,
            stateStructType=_EMA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TICKBAR_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("bar_id", LongType()),
        StructField("n_events", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("span_us", LongType()),
    ]
)
_TICKBAR_STATE = StructType(
    [
        StructField("n_total", LongType()),
        StructField("b_open", DoubleType()),
        StructField("b_high", DoubleType()),
        StructField("b_low", DoubleType()),
        StructField("b_close", DoubleType()),
        StructField("t_min", LongType()),
        StructField("t_max", LongType()),
    ]
)
_TICKBAR_COLS = [
    "symbol", "bar_id", "n_events", "open", "high", "low", "close",
    "span_us",
]


def _tick_bar_state_fn(n_bar: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        # P5 keep-last inside the micro-batch — same in-line dedup as
        # the batch family (operators/bars.py, SQL_SERIES); cross-batch
        # duplicates remain an upstream landing concern (append mode
        # cannot retract an already-emitted bar)
        pdf = pdf.drop_duplicates(subset="datetime", keep="last")
        if state.exists:
            n_total, o, h, lo, c, tmin, tmax = state.get
        else:
            n_total, o, h, lo, c, tmin, tmax = 0, None, None, None, None, None, None
        out: list[tuple] = []
        ts_ns = pdf["datetime"].to_numpy().astype("datetime64[ns]")
        for ts, x in zip(ts_ns.astype("int64"), pdf["close"].to_numpy()):
            t_us = int(ts) // 1000
            x = float(x)
            if n_total % n_bar == 0:
                o = h = lo = c = x
                tmin = tmax = t_us
            else:
                h = max(h, x)
                lo = min(lo, x)
                c = x
                tmax = t_us
            n_total += 1
            if n_total % n_bar == 0:
                out.append(
                    (
                        key[0],
                        n_total // n_bar - 1,
                        n_bar,
                        o,
                        h,
                        lo,
                        c,
                        tmax - tmin,
                    )
                )
        state.update((n_total, o, h, lo, c, tmin, tmax))
        yield pd.DataFrame(out, columns=_TICKBAR_COLS)

    return fn


_VOLBAR_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("bar_id", LongType()),
        StructField("n_events", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("notional", DoubleType()),
        StructField("span_us", LongType()),
    ]
)
_VOLBAR_STATE = StructType(
    [
        StructField("cum_cents", LongType()),
        StructField("bar_id", LongType()),
        StructField("n", LongType()),
        StructField("b_open", DoubleType()),
        StructField("b_high", DoubleType()),
        StructField("b_low", DoubleType()),
        StructField("b_close", DoubleType()),
        StructField("t_min", LongType()),
        StructField("t_max", LongType()),
        StructField("bar_cents", LongType()),
    ]
)
_VOLBAR_COLS = [
    "symbol", "bar_id", "n_events", "open", "high", "low", "close",
    "notional", "span_us",
]


def _volume_bar_state_fn(t_cents: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        # P5 keep-last inside the micro-batch (see _tick_bar_state_fn)
        pdf = pdf.drop_duplicates(subset="datetime", keep="last")
        if state.exists:
            cum, bid, n, o, h, lo, c, tmin, tmax, bc = state.get
        else:
            cum, bid, n = 0, -1, 0
            o = h = lo = c = None
            tmin = tmax = bc = None
        out: list[tuple] = []
        ts_ns = pdf["datetime"].to_numpy().astype("datetime64[ns]")
        for ts, x in zip(ts_ns.astype("int64"), pdf["close"].to_numpy()):
            t_us = int(ts) // 1000
            x = float(x)
            vq = int(math.floor(x * 100 + 0.5))
            nbid = cum // t_cents
            if nbid != bid:
                if bid >= 0:
                    out.append(
                        (key[0], bid, n, o, h, lo, c, bc / 100.0,
                         tmax - tmin)
                    )
                bid, n = nbid, 1
                o = h = lo = c = x
                tmin = tmax = t_us
                bc = vq
            else:
                n += 1
                h = max(h, x)
                lo = min(lo, x)
                c = x
                tmax = t_us
                bc += vq
            cum += vq
        state.update((cum, bid, n, o, h, lo, c, tmin, tmax, bc))
        yield pd.DataFrame(out, columns=_VOLBAR_COLS)

    return fn


def volume_bar_stream(sdf: DataFrame, t_cents: int = 100_000) -> DataFrame:
    """Notional-clock (dollar/volume) bars as a custom stateful
    streaming operator — the streaming twin of ``ts_volume_bars``:
    per-key state carries the exact integer-cents cumulative notional
    plus the OPEN bar's running OHLC/notional/time-range; a bar is
    emitted the moment a tick lands whose bar index
    (cum_cents_before // T) differs (bar indices may SKIP when one
    tick jumps the cumulative past several thresholds — same ids as
    the batch floor division). The trailing open bar stays in state,
    so the emission set is the batch query's bars minus each symbol's
    max bar_id. State is O(1) per symbol. Same arrival-order and
    in-batch-dedup contract as :func:`tick_bar_stream`."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _volume_bar_state_fn(int(t_cents)),
            outputStructType=_VOLBAR_OUT,
            stateStructType=_VOLBAR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tick_bar_stream(sdf: DataFrame, n_bar: int = 16) -> DataFrame:
    """Event-clock (tick) bars as a custom stateful streaming operator
    — the streaming twin of the batch ``ts_tick_bars`` query: per-key
    state carries the tick count and the OPEN bar's running
    OHLC/time-range; each micro-batch folds its (datetime, event_id)-
    sorted rows in and a bar is emitted the moment its ``n_bar``-th
    tick lands (the trailing partial bar stays in state — the same
    drop-trailing convention as the batch query's HAVING filter).
    State is O(1) per symbol regardless of uptime. Same arrival-order
    oracle-equivalence precondition as :func:`ema_state_stream`
    (time-ordered landing files); in-batch duplicate (symbol, ts)
    ticks are keep-last deduped (P5); cross-batch duplicates remain
    an upstream landing concern (append mode cannot retract)."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _tick_bar_state_fn(int(n_bar)),
            outputStructType=_TICKBAR_OUT,
            stateStructType=_TICKBAR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_GARCH_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("n_rows", LongType()),
        StructField("garch_vol", DoubleType()),
    ]
)
_GARCH_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("prev", DoubleType()),
        StructField("v", DoubleType()),
    ]
)


def _garch_state_fn(omega: float, alpha: float, beta: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        n, prev, v = state.get if state.exists else (0, None, None)
        for x in pdf["close"].to_numpy():
            x = float(x)
            if prev is not None:
                if x > 0 and prev > 0:
                    r = math.log(x / prev)
                else:
                    r = 0.0  # flat tick: recursion stays total
                r2 = math.floor(r * r * 1e12 + 0.5) / 1e12
                v = r2 if v is None else omega + alpha * r2 + beta * v
            prev = x
            n += 1
        state.update((n, prev, v))
        vol = math.sqrt(v) if v is not None else None
        yield pd.DataFrame(
            {"symbol": [key[0]], "n_rows": [n], "garch_vol": [vol]}
        )

    return fn


def garch_state_stream(
    sdf: DataFrame,
    omega: float = 1e-6,
    alpha: float = 0.05,
    beta: float = 0.90,
) -> DataFrame:
    """Per-symbol GARCH(1,1) variance as a custom stateful streaming
    operator — the streaming twin of the batch ``garch_filter``
    (operators/rolling.py): state carries (count, last close,
    conditional variance); each micro-batch folds its
    (datetime, event_id)-sorted rows through the same grid-snapped
    recursion v = ω + α·r² + β·v (seed v = first r², flat tick on
    non-positive closes) and emits the updated running vol. Same
    arrival-order oracle-equivalence precondition as
    :func:`ema_state_stream` (time-ordered landing files)."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _garch_state_fn(float(omega), float(alpha), float(beta)),
            outputStructType=_GARCH_OUT,
            stateStructType=_GARCH_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_ATTR_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("event_id", LongType()),
        StructField("channel", StringType()),
        StructField("value", DoubleType()),
    ]
)
_ATTR_STATE = StructType([StructField("last_touch", StringType())])


def _attrib_state_fn(touches: tuple[str, ...], purchase: str):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        (last,) = state.get if state.exists else (None,)
        ids: list[int] = []
        chans: list[str] = []
        vals: list[float] = []
        for r in pdf.itertuples():
            if r.event_type == purchase:
                ids.append(int(r.event_id))
                chans.append(last or "none")
                vals.append(float(r.close))
            if r.event_type in touches:
                last = r.event_type
        state.update((last,))
        if ids:
            yield pd.DataFrame(
                {
                    "symbol": [key[0]] * len(ids),
                    "event_id": ids,
                    "channel": chans,
                    "value": vals,
                }
            )

    return fn


def attribution_state_stream(
    sdf: DataFrame,
    touches: tuple[str, ...] = ("view", "click"),
    purchase: str = "purchase",
) -> DataFrame:
    """Streaming last-touch attribution as a custom stateful operator
    (``applyInPandasWithState``): per-user state carries the most
    recent touch (view/click) across micro-batches; each purchase is
    emitted exactly once, credited to the touch in effect when it
    happened — the 24/7 form of the batch ``events_attribution``
    window query. State is one string per user (bounded by the user
    population, not the event volume) and partitions by the group key
    across executors.

    Oracle-equivalence precondition: same as the EMA state fold —
    micro-batches fold in arrival order (rows within a batch sorted by
    (datetime, event_id)), matching the batch window oracle when the
    source delivers time-ordered files, as the engine's landing layout
    does.
    """
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _attrib_state_fn(tuple(touches), purchase),
            outputStructType=_ATTR_OUT,
            stateStructType=_ATTR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_CUSUM_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("event_id", LongType()),
        StructField("direction", StringType()),
        StructField("stat_sigmas", DoubleType()),
    ]
)
_CUSUM_STATE = StructType(
    [
        StructField("s_up", DoubleType()),
        StructField("s_dn", DoubleType()),
        StructField("pup", DoubleType()),
        StructField("pdn", DoubleType()),
    ]
)


def _cusum_state_fn(k_sigma: float, h_sigma: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        s_up, s_dn, pup, pdn = (
            state.get if state.exists else (0.0, 0.0, None, None)
        )
        mu = float(pdf["mu"].iloc[0])
        sigma = float(pdf["sigma"].iloc[0])
        k, h = k_sigma * sigma, h_sigma * sigma
        ids, dirs, stats = [], [], []
        for r in pdf.itertuples():
            x = float(r.close)
            s_up = max(0.0, s_up + (x - mu - k))
            s_dn = max(0.0, s_dn + (mu - k - x))
            if s_up > h and (pup is None or pup <= h):
                ids.append(int(r.event_id))
                dirs.append("up")
                stats.append(s_up / sigma if sigma else None)
            if s_dn > h and (pdn is None or pdn <= h):
                ids.append(int(r.event_id))
                dirs.append("down")
                stats.append(s_dn / sigma if sigma else None)
            pup, pdn = s_up, s_dn
        state.update((s_up, s_dn, pup, pdn))
        if ids:
            yield pd.DataFrame(
                {
                    "symbol": [key[0]] * len(ids),
                    "event_id": ids,
                    "direction": dirs,
                    "stat_sigmas": stats,
                }
            )

    return fn


def cusum_state_stream(
    sdf: DataFrame,
    stats: DataFrame,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Streaming CUSUM change-point monitor: the textbook recursion
    s_t = max(0, s_{t-1} + dev_t) lives in per-symbol state (four
    doubles — bounded by the symbol population), calibrated against a
    batch-computed per-symbol (μ, σ) baseline joined STREAM-STATIC
    into each micro-batch — the monitor shape a 24/7 deployment runs:
    calibrate on history, detect on the live stream. Alarm crossings
    emit exactly once (the previous-value guard spans micro-batches
    through state). The batch window-form query (ts_cusum_alarms) is
    the closed-form twin; this is its incremental form for data that
    arrives rather than sits."""
    enriched = sdf.join(F.broadcast(stats), "symbol")
    return (
        enriched.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _cusum_state_fn(k_sigma, h_sigma),
            outputStructType=_CUSUM_OUT,
            stateStructType=_CUSUM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_JUMP_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("n_rets", LongType()),
        StructField("rv_q", LongType()),
        StructField("bp_q", LongType()),
    ]
)
_JUMP_STATE = StructType(
    [
        StructField("n_rets", LongType()),
        StructField("prev", DoubleType()),
        StructField("prev_absr", DoubleType()),
        StructField("rv_q", LongType()),
        StructField("bp_q", LongType()),
    ]
)


def _jump_state_fn():
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        n, prev, prev_absr, rv_q, bp_q = (
            state.get if state.exists else (0, None, None, 0, 0)
        )
        for x in pdf["close"].to_numpy():
            x = float(x)
            if prev is not None and x > 0 and prev > 0:
                r = math.log(x / prev)
                rv_q += int(math.floor(r * r * 1e12 + 0.5))
                if prev_absr is not None:
                    bp_q += int(
                        math.floor(abs(r) * prev_absr * 1e12 + 0.5)
                    )
                prev_absr = abs(r)
                n += 1
            prev = x
        state.update((n, prev, prev_absr, rv_q, bp_q))
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "n_rets": [n],
                "rv_q": [rv_q],
                "bp_q": [bp_q],
            }
        )

    return fn


def jump_state_stream(sdf: DataFrame) -> DataFrame:
    """Per-symbol realized-variance / bipower-variation accumulators
    as a custom stateful streaming operator — the incremental form of
    ts_jump_test's BNS jump diagnostic, over the RAW event feed (the
    garch_state_stream convention): state carries (count, last close,
    last |r|, and the two INTEGER-GRID sums Σ⌊r²·10¹²⌉ and
    Σ⌊|r_t||r_{t−1}|·10¹²⌉), so every micro-batch folds its
    (datetime, event_id)-sorted rows with pure integer addition —
    bitwise equal to the batch oracle's DECIMAL sums by construction,
    with no float-accumulation drift no matter how many batches the
    feed arrives in. The caller derives RV/BV/relative-jump from the
    drained integer sums in one closed-form expression. Same
    arrival-order precondition as :func:`ema_state_stream`."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _jump_state_fn(),
            outputStructType=_JUMP_OUT,
            stateStructType=_JUMP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FLAGW_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("window_id", LongType()),
        StructField("raw", ArrayType(DoubleType())),
        StructField("future", ArrayType(DoubleType())),
    ]
)
_FLAGW_STATE = StructType(
    [
        StructField("cur_end", LongType()),  # open bucket end, epoch µs
        StructField("cur_dt", LongType()),  # keep-last cursor in bucket
        StructField("cur_eid", LongType()),
        StructField("cur_close", DoubleType()),
        StructField("last_idx", LongType()),  # last finalized val idx
        StructField("last_close", DoubleType()),
        StructField("ring", ArrayType(DoubleType())),  # last L+P closes
    ]
)


def _flagship_window_state_fn(
    val_starts: dict, L: int, P: int, stride: int, step_seconds: int
):
    need = L + P
    step_us = step_seconds * 1_000_000
    anchor_us = 946_684_800 * 1_000_000  # calendar.ANCHOR_EPOCH in µs

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        vs = val_starts.get(sym)
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        if state.exists:
            (cur_end, cur_dt, cur_eid, cur_close, last_idx, last_close,
             ring) = state.get
            ring = list(ring) if ring is not None else []
        else:
            cur_end = cur_dt = cur_eid = last_idx = None
            cur_close = last_close = None
            ring = []
        outs: list[tuple] = []

        def push(idx: int, close: float) -> None:
            # one gap-filled val bucket enters the ring; a query window
            # completes when its last future value (idx) lands on a
            # strided cursor position
            nonlocal ring
            ring.append(close)
            if len(ring) > need:
                ring = ring[-need:]
            w = idx - need + 1
            if len(ring) == need and w >= vs and (w - vs) % stride == 0:
                outs.append((sym, w, ring[:L], ring[L:]))

        def finalize(end_us: int, close: float) -> None:
            # a closed bucket: index it, keep only the val suffix, and
            # gap-fill (previous close) exactly like the batch
            # fill_missing_time_idx within the val split
            nonlocal last_idx, last_close
            idx = (end_us - anchor_us) // step_us
            if vs is None or idx < vs:
                return
            if last_idx is not None:
                for j in range(last_idx + 1, idx):
                    push(j, last_close)
            push(idx, close)
            last_idx, last_close = idx, close

        def fill_to(idx_excl: int) -> None:
            # eager gap fill: once a NEW bucket opens, every missing
            # bucket strictly before it is determined (ffill of the
            # last closed value) — emit those windows now instead of
            # waiting for the open bucket to close (lower latency, and
            # the emitted set becomes exactly "everything before the
            # in-flight bucket", which is what the oracle twin bounds)
            nonlocal last_idx
            if vs is None or last_idx is None:
                return
            for j in range(last_idx + 1, idx_excl):
                push(j, last_close)
                last_idx = j

        dt = pdf["datetime"]
        if getattr(dt.dtype, "tz", None) is not None:
            dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
        t_us = dt.to_numpy(dtype="datetime64[us]").astype("int64")
        eids = pdf["event_id"].to_numpy()
        closes = pdf["close"].to_numpy()
        for t, eid, x in zip(t_us, eids, closes):
            t, eid, x = int(t), int(eid), float(x)
            # right-closed, right-labeled bucket (reference resample
            # convention): end = floor((ts - 1µs)/every)*every + every
            b_end = ((t - 1) // step_us + 1) * step_us
            if cur_end is None or b_end > cur_end:
                if cur_end is not None:
                    finalize(cur_end, cur_close)
                fill_to((b_end - anchor_us) // step_us)
                cur_end, cur_dt, cur_eid, cur_close = b_end, t, eid, x
            elif b_end == cur_end:
                # dedup keep-last + bucket-last in one: the max
                # (datetime, event_id) row owns the bucket close
                if (t, eid) >= (cur_dt, cur_eid):
                    cur_dt, cur_eid, cur_close = t, eid, x
            # b_end < cur_end cannot happen under the documented
            # arrival-order precondition (time-ordered landing files)
        state.update(
            (cur_end, cur_dt, cur_eid, cur_close, last_idx, last_close,
             ring)
        )
        if outs:
            yield pd.DataFrame(
                outs, columns=["symbol", "window_id", "raw", "future"]
            )

    return fn


def flagship_window_stream(
    sdf: DataFrame,
    val_starts: dict,
    L: int = 8,
    pred_window: int = 4,
    stride: int = 2,
    step_seconds: int = 6 * 3600,
) -> DataFrame:
    """The streaming half of the flagship serving path (SURVEY.md §3.3
    as a 24/7 deployment; reference batch form: notebooks/test.ipynb
    cell 20): raw candles append -> per-symbol state resamples them
    into right-closed buckets (keep-last within bucket = the batch
    dedup-keep-last + close-of-bucket), keeps only the val suffix
    (``val_starts`` = the deploy-time split cutoffs computed when the
    batch train store was built — plans/flagship.py
    ``flagship_val_starts``), gap-fills missing buckets with the
    previous close, and emits each STRIDED query window the moment its
    last future bucket closes: (symbol, window_id, raw[L], future[P]).

    State per symbol = the open bucket + a ring of the last L+P
    gap-filled closes — bounded by symbols x (L+P) regardless of
    uptime. The trailing in-flight bucket never finalizes (exactly the
    reference's ``drop_ends`` trim of the unfinished last bucket), so
    windows touching a symbol's final bucket are not emitted; the
    batch oracle twin mirrors that bound. Same arrival-order
    precondition as :func:`ema_state_stream` (time-ordered landing
    files; AvailableNow drains them in order).

    The downstream half — z-score, k-NN against the batch-built train
    store, ensemble forecast — happens AFTER this operator in plain
    batch expressions over the drained emissions (plans/registry.py
    ``q_stream_flagship_forecast``), keeping every float op bitwise
    identical to the batch flagship.
    """
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _flagship_window_state_fn(
                dict(val_starts), L, pred_window, stride, step_seconds
            ),
            outputStructType=_FLAGW_OUT,
            stateStructType=_FLAGW_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_IMBBAR_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("bar_id", LongType()),
        StructField("n_events", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("imbalance", LongType()),
        StructField("thr", DoubleType()),
        StructField("span_us", LongType()),
    ]
)
_IMBBAR_STATE = StructType(
    [
        StructField("prev_close", DoubleType()),
        StructField("b", IntegerType()),  # last tick-rule sign
        StructField("theta", LongType()),  # signed flow, open bar
        StructField("t_cur", LongType()),  # ticks in open bar
        StructField("e_t", DoubleType()),  # EMA of closed-bar sizes
        StructField("e_b", DoubleType()),  # EMA of closed-bar theta/T
        StructField("thr", DoubleType()),  # active threshold
        StructField("bar_id", LongType()),
        StructField("o", DoubleType()),
        StructField("h", DoubleType()),
        StructField("lo", DoubleType()),
        StructField("c", DoubleType()),
        StructField("t_min", LongType()),
        StructField("t_max", LongType()),
    ]
)


def _imbalance_bar_state_fn():
    from ..operators.bars import IMB_SEED_EB, IMB_SEED_ET

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        # P5 keep-last inside the micro-batch — matches the batch
        # twin's in-line dedup (operators/bars.py:111) so a
        # duplicate-bearing feed no longer diverges silently
        pdf = pdf.drop_duplicates(subset="datetime", keep="last")
        if state.exists:
            (prev, b, theta, t_cur, e_t, e_b, thr, bid,
             o, h, lo, c, tmin, tmax) = state.get
        else:
            prev = None
            b, theta, t_cur, bid = 1, 0, 0, 0
            e_t, e_b = IMB_SEED_ET, IMB_SEED_EB
            thr = e_t * abs(e_b)
            o = h = lo = c = None
            tmin = tmax = None
        outs: list[tuple] = []
        ts_ns = pdf["datetime"].to_numpy().astype("datetime64[ns]")
        for ts, x in zip(ts_ns.astype("int64"), pdf["close"].to_numpy()):
            t_us = int(ts) // 1000
            x = float(x)
            if prev is not None:
                if x > prev:
                    b = 1
                elif x < prev:
                    b = -1
                # Δ == 0 carries the previous sign
            if t_cur == 0:
                o = h = lo = c = x
                tmin = tmax = t_us
            else:
                h = max(h, x)
                lo = min(lo, x)
                c = x
                tmax = t_us
            theta += b
            t_cur += 1
            if float(abs(theta)) >= thr:
                # the closing tick EMITS the bar immediately (unlike
                # the notional bars, whose closure is only known when
                # a later tick lands), then recalibrates — operand
                # order identical to operators/bars.py
                outs.append(
                    (sym, bid, t_cur, o, h, lo, c, theta, thr,
                     tmax - tmin)
                )
                e_t = 0.5 * t_cur + 0.5 * e_t
                e_b = 0.5 * (theta / t_cur) + 0.5 * e_b
                thr = e_t * abs(e_b)
                bid += 1
                theta, t_cur = 0, 0
            prev = x
        state.update(
            (prev, b, theta, t_cur, e_t, e_b, thr, bid,
             o, h, lo, c, tmin, tmax)
        )
        if outs:
            yield pd.DataFrame(outs, columns=[f.name for f in _IMBBAR_OUT])

    return fn


def imbalance_bar_stream(sdf: DataFrame) -> DataFrame:
    """Tick-imbalance bars as a custom stateful streaming operator —
    the streaming twin of ``ts_imbalance_bars`` and the natural HOME
    of the operator (the boundary recursion is already a per-key
    sequential fold, so streaming adds nothing but the state carry):
    per-symbol state holds the tick-rule sign, the open bar's signed
    flow θ / OHLC / time range, and the two bar-level EMA
    calibrations; a bar is emitted the MOMENT its closing tick lands
    (|θ| crosses the active threshold), then the threshold
    recalibrates — float operand order identical to the batch Arrow
    pass, so emissions are bitwise the batch query's CLOSED bars (the
    trailing partial stays in state; closure is |imbalance| ≥ thr,
    which the oracle reads off the recursion's own closed flag).
    State is O(1) per symbol. Arrival-order precondition as in
    :func:`ema_state_stream` (time-ordered landing files); duplicate
    (symbol, ts) ticks WITHIN a micro-batch are keep-last deduped
    in-line (P5, matching the batch twin); duplicates arriving in a
    LATER batch remain an upstream landing concern — append mode
    cannot retract an already-emitted bar."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _imbalance_bar_state_fn(),
            outputStructType=_IMBBAR_OUT,
            stateStructType=_IMBBAR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_VPIN_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("bar_id", LongType()),
        StructField("n_events", LongType()),
        StructField("nw", LongType()),
        StructField("buy_c", LongType()),
        StructField("sell_c", LongType()),
        StructField("toxq", LongType()),
        StructField("stox", LongType()),
    ]
)
_VPIN_STATE = StructType(
    [
        StructField("prev_close", DoubleType()),
        StructField("b", IntegerType()),  # tick-rule sign, carried
        StructField("cum", LongType()),  # exact cents cumulative
        StructField("bar_id", LongType()),  # open bucket index
        StructField("n", LongType()),  # open bucket tick count
        StructField("buy_c", LongType()),  # open bucket buy cents
        StructField("sell_c", LongType()),
        StructField("ring", ArrayType(LongType())),  # last W toxq
    ]
)


def _vpin_state_fn(t_cents: int, w: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        # P5 keep-last inside the micro-batch, BEFORE any cents
        # accumulate — matches ts_vpin's deduped series input
        pdf = pdf.drop_duplicates(subset="datetime", keep="last")
        if state.exists:
            prev, b, cum, bid, n, buy, sell, ring = state.get
            ring = list(ring) if ring is not None else []
        else:
            prev = None
            b, cum, bid, n, buy, sell = 1, 0, -1, 0, 0, 0
            ring = []
        outs: list[tuple] = []

        def close_bucket() -> None:
            # the bucket's toxicity joins the ring and the bucket
            # emits with the trailing average over min(seen, w)
            nonlocal ring
            vtot = buy + sell
            toxq = (
                abs(buy - sell) * 1_000_000_000 // vtot
                if vtot > 0
                else None
            )
            ring.append(toxq)
            if len(ring) > w:
                ring = ring[-w:]
            live = [x for x in ring if x is not None]
            stox = sum(live) if live else None
            outs.append(
                (sym, bid, n, len(ring), buy, sell, toxq, stox)
            )

        for x in pdf["close"].to_numpy():
            x = float(x)
            vq = int(math.floor(x * 100 + 0.5))
            if prev is not None:
                if x > prev:
                    b = 1
                elif x < prev:
                    b = -1
            nbid = cum // t_cents
            if nbid != bid:
                if bid >= 0:
                    close_bucket()
                bid, n, buy, sell = nbid, 0, 0, 0
            n += 1
            if b == 1:
                buy += vq
            else:
                sell += vq
            cum += vq
            prev = x
        state.update((prev, b, cum, bid, n, buy, sell, ring))
        if outs:
            yield pd.DataFrame(outs, columns=[f.name for f in _VPIN_OUT])

    return fn


def vpin_stream(
    sdf: DataFrame, t_cents: int = 100_000, w: int = 8
) -> DataFrame:
    """VPIN bucket toxicity as a custom stateful streaming operator —
    the streaming twin of ``ts_vpin`` and the form the monitor
    actually runs in production (flow toxicity is a live alarm, not a
    report): per-symbol state carries the exact integer-cents
    cumulative (the volume-bar clock), the tick-rule sign, the OPEN
    bucket's buy/sell cents split, and a ``w``-deep ring of
    1e9-grid toxicity integers; a bucket emits the moment a tick
    lands in a LATER bucket index, with the expanding-until-warm
    trailing sum — all integer arithmetic identical to the batch
    query's DECIMAL/HUGEINT divisions, so emissions are bitwise the
    batch rows minus each symbol's trailing (max bar_id) open bucket.
    (Bound: the streaming cents cumulative is int64 state — exact to
    2^63−1 cents ≈ $9.2e16, far beyond the pinned 2^53 regime but
    narrower than the batch twin's DECIMAL(38,0); past it the stream
    would wrap where batch stays exact.) State is O(w) per symbol.
    Arrival-order precondition as in :func:`ema_state_stream`;
    in-batch duplicate ticks are keep-last deduped BEFORE any cents
    accumulate (P5); cross-batch duplicates remain an upstream
    landing concern."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _vpin_state_fn(int(t_cents), int(w)),
            outputStructType=_VPIN_OUT,
            stateStructType=_VPIN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_RUNBAR_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("bar_id", LongType()),
        StructField("n_events", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("n_up", LongType()),
        StructField("n_dn", LongType()),
        StructField("thr", DoubleType()),
        StructField("span_us", LongType()),
    ]
)
_RUNBAR_STATE = StructType(
    [
        StructField("prev_close", DoubleType()),
        StructField("b", IntegerType()),
        StructField("n_up", LongType()),  # open bar up-count
        StructField("n_dn", LongType()),  # open bar down-count
        StructField("e_t", DoubleType()),
        StructField("e_p", DoubleType()),  # EMA of buy fraction
        StructField("thr", DoubleType()),
        StructField("bar_id", LongType()),
        StructField("o", DoubleType()),
        StructField("h", DoubleType()),
        StructField("lo", DoubleType()),
        StructField("c", DoubleType()),
        StructField("t_min", LongType()),
        StructField("t_max", LongType()),
    ]
)


def _run_bar_state_fn():
    from ..operators.bars import RUN_SEED_EP, RUN_SEED_ET

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        # P5 keep-last inside the micro-batch (see imbalance twin)
        pdf = pdf.drop_duplicates(subset="datetime", keep="last")
        if state.exists:
            (prev, b, n_up, n_dn, e_t, e_p, thr, bid,
             o, h, lo, c, tmin, tmax) = state.get
        else:
            prev = None
            b, n_up, n_dn, bid = 1, 0, 0, 0
            e_t, e_p = RUN_SEED_ET, RUN_SEED_EP
            thr = e_t * max(e_p, 1.0 - e_p)
            o = h = lo = c = None
            tmin = tmax = None
        outs: list[tuple] = []
        ts_ns = pdf["datetime"].to_numpy().astype("datetime64[ns]")
        for ts, x in zip(ts_ns.astype("int64"), pdf["close"].to_numpy()):
            t_us = int(ts) // 1000
            x = float(x)
            if prev is not None:
                if x > prev:
                    b = 1
                elif x < prev:
                    b = -1
            if n_up + n_dn == 0:
                o = h = lo = c = x
                tmin = tmax = t_us
            else:
                h = max(h, x)
                lo = min(lo, x)
                c = x
                tmax = t_us
            if b == 1:
                n_up += 1
            else:
                n_dn += 1
            if float(max(n_up, n_dn)) >= thr:
                outs.append(
                    (sym, bid, n_up + n_dn, o, h, lo, c, n_up, n_dn,
                     thr, tmax - tmin)
                )
                t_cur = n_up + n_dn
                e_t = 0.5 * t_cur + 0.5 * e_t
                e_p = 0.5 * (n_up / t_cur) + 0.5 * e_p
                thr = e_t * max(e_p, 1.0 - e_p)
                bid += 1
                n_up, n_dn = 0, 0
            prev = x
        state.update(
            (prev, b, n_up, n_dn, e_t, e_p, thr, bid,
             o, h, lo, c, tmin, tmax)
        )
        if outs:
            yield pd.DataFrame(outs, columns=[f.name for f in _RUNBAR_OUT])

    return fn


def run_bar_stream(sdf: DataFrame) -> DataFrame:
    """Tick-RUN bars as a custom stateful streaming operator — the
    one-sided sibling of :func:`imbalance_bar_stream` (gross dominant-
    side count vs net signed flow), identical contract: the closing
    tick emits its bar immediately, the trailing partial stays in
    state, float operand order matches the batch Arrow pass bitwise,
    state is O(1) per symbol, and the oracle reads closure off the
    batch recursion's own closed flag. Same arrival-order and
    in-batch-dedup contract as :func:`imbalance_bar_stream`."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _run_bar_state_fn(),
            outputStructType=_RUNBAR_OUT,
            stateStructType=_RUNBAR_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_CUSUMEVT_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("time_idx", LongType()),
        StructField("event_id", LongType()),
        StructField("direction", StringType()),
        StructField("stat", DoubleType()),
        StructField("h", DoubleType()),
        StructField("entry", DoubleType()),
    ]
)
_CUSUMEVT_STATE = StructType(
    [
        StructField("cur_end", LongType()),  # open bucket end, epoch µs
        StructField("cur_dt", LongType()),  # keep-last cursor in bucket
        StructField("cur_eid", LongType()),
        StructField("cur_close", DoubleType()),
        StructField("last_idx", LongType()),  # last closed grid idx
        StructField("last_close", DoubleType()),  # recursion's prev x
        StructField("ema", DoubleType()),  # EMA of |Δclose| (nullable)
        StructField("sp", DoubleType()),  # S+ accumulator
        StructField("sn", DoubleType()),  # S- accumulator
        StructField("eid", LongType()),  # events emitted so far
    ]
)


def _cusum_event_state_fn(step_seconds: int):
    from ..operators.labeling import CUSUM_EVT_ALPHA, CUSUM_EVT_H

    a, b, hm = CUSUM_EVT_ALPHA, 1.0 - CUSUM_EVT_ALPHA, CUSUM_EVT_H
    step_us = step_seconds * 1_000_000
    anchor_us = 946_684_800 * 1_000_000  # calendar.ANCHOR_EPOCH in µs

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        if state.exists:
            (cur_end, cur_dt, cur_eid, cur_close, last_idx, last_close,
             ema, sp, sn, eid) = state.get
        else:
            cur_end = cur_dt = cur_eid = last_idx = None
            cur_close = last_close = ema = None
            sp, sn, eid = 0.0, 0.0, 0
        outs: list[tuple] = []

        def push(idx: int, close: float) -> None:
            # one closed (gap-filled) grid bucket through the CUSUM
            # recursion — operand order identical to the batch Arrow
            # pass (operators/labeling.py cusum_events); gap buckets
            # arrive with the carried close (d = 0: the EMA decays,
            # the accumulators hold — same as the batch filled frame)
            nonlocal last_idx, last_close, ema, sp, sn, eid
            if last_close is not None:
                d = close - last_close
                ema = abs(d) if ema is None else a * abs(d) + b * ema
                h = hm * ema
                sp = sp + d
                sp = sp if sp > 0.0 else 0.0
                sn = sn + d
                sn = sn if sn < 0.0 else 0.0
                if sp > h:
                    outs.append((sym, idx, eid, "up", sp, h, close))
                    eid += 1
                    sp = 0.0
                elif sn < -h:
                    outs.append((sym, idx, eid, "down", sn, h, close))
                    eid += 1
                    sn = 0.0
            last_idx, last_close = idx, close

        dt = pdf["datetime"]
        if getattr(dt.dtype, "tz", None) is not None:
            dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
        t_us = dt.to_numpy(dtype="datetime64[us]").astype("int64")
        eids = pdf["event_id"].to_numpy()
        closes = pdf["close"].to_numpy()
        for t, tick_eid, x in zip(t_us, eids, closes):
            t, tick_eid, x = int(t), int(tick_eid), float(x)
            b_end = ((t - 1) // step_us + 1) * step_us
            if cur_end is None or b_end > cur_end:
                if cur_end is not None:
                    push((cur_end - anchor_us) // step_us, cur_close)
                    new_idx = (b_end - anchor_us) // step_us
                    for j in range(last_idx + 1, new_idx):
                        push(j, last_close)
                cur_end, cur_dt, cur_eid, cur_close = b_end, t, tick_eid, x
            elif b_end == cur_end:
                # dedup keep-last + bucket-last in one
                if (t, tick_eid) >= (cur_dt, cur_eid):
                    cur_dt, cur_eid, cur_close = t, tick_eid, x
        state.update(
            (cur_end, cur_dt, cur_eid, cur_close, last_idx, last_close,
             ema, sp, sn, eid)
        )
        if outs:
            yield pd.DataFrame(
                outs, columns=[f.name for f in _CUSUMEVT_OUT]
            )

    return fn


def cusum_event_stream(
    sdf: DataFrame, step_seconds: int = 6 * 3600
) -> DataFrame:
    """Reset-on-trigger symmetric CUSUM event filter as a custom
    stateful streaming operator — the streaming twin of
    ``ts_cusum_events`` and the form a live sampler runs (events ARE
    alarms; waiting for a batch pass defeats them): per-symbol state
    resamples raw ticks into right-closed grid buckets (keep-last
    within bucket — the rolling-beta device), gap-fills with the
    carried close, and walks each CLOSED bucket through the CUSUM
    recursion (EMA-calibrated threshold, UP-before-DOWN pinned
    priority, triggered side resets) in the batch pass's exact float
    operand order — emissions are bitwise the batch events strictly
    below each symbol's trailing in-flight bucket. State is O(1) per
    symbol (the open bucket + 4 doubles + 2 longs). Same
    arrival-order precondition as :func:`ema_state_stream`; in-bucket
    duplicate ticks resolve keep-last by (ts, event_id)."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _cusum_event_state_fn(int(step_seconds)),
            outputStructType=_CUSUMEVT_OUT,
            stateStructType=_CUSUMEVT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_ROLLBETA_OUT = StructType(
    [
        StructField("symbol", LongType()),
        StructField("time_idx", LongType()),
        StructField("beta", DoubleType()),
        StructField("corr", DoubleType()),
    ]
)
_ROLLBETA_STATE = StructType(
    [
        StructField("cur_end", LongType()),  # open bucket end, epoch µs
        StructField("cur_dt", LongType()),  # keep-last cursor in bucket
        StructField("cur_eid", LongType()),
        StructField("cur_close", DoubleType()),
        StructField("last_idx", LongType()),  # last closed grid idx
        StructField("last_close", DoubleType()),  # its (ffilled) close
        StructField("xring", ArrayType(LongType())),  # snapped index rets
        StructField("yring", ArrayType(LongType())),  # snapped own rets
    ]
)


def _rolling_beta_state_fn(mkt_x: dict, w: int, step_seconds: int):
    step_us = step_seconds * 1_000_000
    anchor_us = 946_684_800 * 1_000_000  # calendar.ANCHOR_EPOCH in µs

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym = key[0]
        pdf = pd.concat(list(pdfs)).sort_values(["datetime", "event_id"])
        if state.exists:
            (cur_end, cur_dt, cur_eid, cur_close, last_idx, last_close,
             xring, yring) = state.get
            xring = list(xring) if xring is not None else []
            yring = list(yring) if yring is not None else []
        else:
            cur_end = cur_dt = cur_eid = last_idx = None
            cur_close = last_close = None
            xring, yring = [], []
        outs: list[tuple] = []

        def push(idx: int, close: float) -> None:
            # one closed (gap-filled) grid bucket: form this bucket's
            # return against the previous grid close, pair it with the
            # batch-calibrated index return, and score the trailing-w
            # window from EXACT integer sums (the batch query's snap9
            # discipline — no float accumulation across buckets)
            nonlocal xring, yring, last_idx, last_close
            x = mkt_x.get(idx)
            y = None
            if last_close is not None and last_close != 0:
                y = close / last_close - 1
            if x is not None and y is not None:
                xring.append(int(math.floor(x * 1e9 + 0.5)))
                yring.append(int(math.floor(y * 1e9 + 0.5)))
                if len(xring) > w:
                    xring = xring[-w:]
                    yring = yring[-w:]
                if len(xring) == w:
                    sx, sy = sum(xring), sum(yring)
                    sxy = sum(a * b for a, b in zip(xring, yring))
                    sxx = sum(a * a for a in xring)
                    syy = sum(b * b for b in yring)
                    cov = float(w * sxy - sx * sy)
                    varx = float(w * sxx - sx * sx)
                    vary = float(w * syy - sy * sy)
                    beta = cov / varx if varx > 0 else None
                    corr = (
                        cov / math.sqrt(varx * vary)
                        if varx > 0 and vary > 0
                        else None
                    )
                    outs.append((sym, idx, beta, corr))
            last_idx, last_close = idx, close

        dt = pdf["datetime"]
        if getattr(dt.dtype, "tz", None) is not None:
            dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
        t_us = dt.to_numpy(dtype="datetime64[us]").astype("int64")
        eids = pdf["event_id"].to_numpy()
        closes = pdf["close"].to_numpy()
        for t, eid, x in zip(t_us, eids, closes):
            t, eid, x = int(t), int(eid), float(x)
            # right-closed, right-labeled bucket (the batch resample
            # convention): end = floor((ts - 1µs)/every)*every + every
            b_end = ((t - 1) // step_us + 1) * step_us
            if cur_end is None or b_end > cur_end:
                if cur_end is not None:
                    # close the open bucket, then ffill any gap
                    # buckets strictly before the new one (they are
                    # determined the moment a later tick lands)
                    push((cur_end - anchor_us) // step_us, cur_close)
                    new_idx = (b_end - anchor_us) // step_us
                    for j in range(last_idx + 1, new_idx):
                        push(j, last_close)
                cur_end, cur_dt, cur_eid, cur_close = b_end, t, eid, x
            elif b_end == cur_end:
                # dedup keep-last + bucket-last in one
                if (t, eid) >= (cur_dt, cur_eid):
                    cur_dt, cur_eid, cur_close = t, eid, x
        state.update(
            (cur_end, cur_dt, cur_eid, cur_close, last_idx, last_close,
             xring, yring)
        )
        if outs:
            yield pd.DataFrame(
                outs, columns=["symbol", "time_idx", "beta", "corr"]
            )

    return fn


def rolling_beta_stream(
    sdf: DataFrame,
    mkt_x: dict,
    w: int = 28,
    step_seconds: int = 6 * 3600,
) -> DataFrame:
    """Rolling market beta as a custom stateful streaming operator —
    the streaming twin of ``ts_rolling_beta`` in the two-input
    stream-static pattern: the cross-sectional index return per grid
    bucket (``mkt_x``: time_idx -> x) is BATCH-calibrated when the
    offline frame is built (the flagship train-store convention — the
    index needs every symbol, so it cannot be a per-key fold), while
    the per-symbol side streams: state resamples raw ticks into
    right-closed 6h buckets (keep-last within bucket), gap-fills with
    the previous close, and keeps a ``w``-deep ring of EXACT
    1e9-snapped integer returns — each closed bucket with a full ring
    emits OLS beta and correlation against the index from integer
    window sums, bitwise the batch query's values. State per symbol =
    the open bucket + 2w longs, O(1) regardless of uptime. The
    trailing in-flight bucket never closes, so the emission set is
    the batch rows below each symbol's final grid bucket — the oracle
    twin's QUALIFY bound. Same arrival-order precondition as
    :func:`ema_state_stream` (time-ordered landing files)."""
    return (
        sdf.withWatermark("datetime", "1 hour")
        .groupBy("symbol")
        .applyInPandasWithState(
            _rolling_beta_state_fn(dict(mkt_x), int(w), step_seconds),
            outputStructType=_ROLLBETA_OUT,
            stateStructType=_ROLLBETA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "symbol",
    time_col: str = "datetime",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream event-time INTERVAL join: pair each left row with
    the right rows for the same key whose event time falls in
    [left.t, left.t + horizon] — the attribution-window shape
    (click -> purchase within the hour) that a static range join
    cannot run 24/7.

    Both sides carry a watermark and the join condition bounds BOTH
    event times, so Spark derives a state-retention horizon: a buffered
    left row is dropped once the right watermark passes
    ``left.t + horizon``, a right row once the left watermark passes
    ``right.t``. State is therefore bounded by
    rate x (horizon + watermark) PER SIDE regardless of uptime —
    the property that makes this runnable against an unbounded stream,
    where the batch range join would need the full history resident.

    Determinism for the oracle comparison: an INNER interval join
    emits exactly the matched pairs; the watermark only evicts state
    AFTER the micro-batch that advanced it, so with an AvailableNow
    drain every cross-batch match within the horizon is emitted before
    eviction. The result set equals the batch SQL range join.
    """
    lw = left.withWatermark(time_col, watermark).alias("l")
    rw = right.withWatermark(time_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{time_col}") >= F.col(f"l.{time_col}"))
        & (
            F.col(f"r.{time_col}")
            <= F.col(f"l.{time_col}") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return lw.join(rw, cond, "inner")


def dedup_ingest_stream(
    docs_sdf: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    broadcast_batch: bool = True,
):
    """Streaming near-dup ingest over the persisted sketch index — the
    true daily-ingest shape: each micro-batch of new documents is
    (1) sketched ONCE (shingles + band rows, batch-sized work),
    (2) checked against the corpus index for pairs touching the batch
    (new x seen and new x new via operators/dedup.py
    ``_pairs_from_sketches``), and (3) folded INTO the index, so the
    next batch — in this run or after a checkpoint resume — dedups
    against everything that came before.

    Bootstrap the index with ``write_minhash_index`` over the seed
    corpus; ``index_path`` then grows by one ``batch=N`` partition per
    micro-batch. Both the pairs output and the index fold-in write
    ``batch=N`` partition dirs with overwrite, so a replayed micro-batch
    (foreachBatch's at-least-once contract) lands idempotently instead
    of duplicating rows. Returns the started StreamingQuery.
    """
    from ..operators.dedup import (
        _pairs_from_sketches,
        band_bucket,
        id_bucket,
        minhash_index,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        nb, new_sh = minhash_index(
            batch_df.select(id_col, text_col), id_col=id_col,
            text_col=text_col,
        )
        nb = nb.persist()
        new_sh = new_sh.persist()
        try:
            # the index is kb/ib-partitioned (write_minhash_index
            # layout): the probe join carries the partition column and
            # the batch side broadcasts, so the scans below prune to
            # the batch's matching bucket dirs (DPP) — per-micro-batch
            # cost O(batch x matching buckets), not O(corpus index)
            seen_bands = spark.read.parquet(f"{index_path}/bands")
            seen_sh = spark.read.parquet(f"{index_path}/shingles")
            pairs = _pairs_from_sketches(
                nb, new_sh, seen_bands, seen_sh, threshold, broadcast_batch
            )
            pairs.write.mode("overwrite").parquet(
                f"{pairs_path}/batch={batch_id}"
            )
            # fold-in writes keep the seed's partition layout so later
            # batches' probes prune over the grown index too
            # repartition by the partition column first: partitionBy
            # alone writes (tasks x dirs) files — up to 32x32 tiny
            # files per fold-in batch; repartitioned it is one file
            # per touched bucket dir
            (
                nb.withColumn("kb", band_bucket(F.col("band"), F.col("key")))
                .repartition("kb")
                .write.partitionBy("kb")
                .mode("overwrite")
                .parquet(f"{index_path}/bands/batch={batch_id}")
            )
            (
                new_sh.withColumn("ib", id_bucket(F.col("id")))
                .repartition("ib")
                .write.partitionBy("ib")
                .mode("overwrite")
                .parquet(f"{index_path}/shingles/batch={batch_id}")
            )
        finally:
            nb.unpersist()
            new_sh.unpersist()

    return (
        docs_sdf.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ann_ingest_stream(
    emb_sdf: DataFrame,
    index_path: str,
    results_path: str,
    checkpoint: str,
    nprobe: int = 2,
    on_batch_end=None,
):
    """Continuous k-NN ingest over a growing IVF layout — the vector-
    corpus twin of :func:`dedup_ingest_stream`: each micro-batch of
    new embeddings is

    1. joined (as CANDIDATES) against every EARLIER batch's persisted
       query probes — a later arrival can still displace an old
       query's neighbor, so its candidate row must be emitted,
    2. folded INTO the layout's ``lists/batch=N`` partition dirs
       (same append-only growth as the MinHash index), then
    3. probed (as QUERIES) against the grown index — seed + all folded
       batches INCLUDING its own (self-pairs excluded) — reading only
       its ``nprobe`` list directories, with the probe assignments
       saved to ``probes/batch=N`` for step 1 of later batches.

    The per-batch candidate rows are emitted UNRANKED: top-k is a
    read-time rank, because the final neighbor set of a query is only
    known once ingest stops. The union over batches is exactly
    {(q, c): q new, c in seed ∪ new, c ≠ q, list(c) ∈ q's nprobe
    lists} — each pair once, by the LATER member's batch — so the
    result is deterministic regardless of how arrivals split into
    micro-batches (the same batch-order-independence device as the
    dedup ingest's pair union). Replay-safe: every write is a
    ``batch=N``-dir overwrite, and step 1 filters out this batch's own
    probes left by a failed earlier attempt.

    Per-batch cost: O(batch × centroids) for quantization, plus scans
    of only the matched list/probe PARTITION DIRECTORIES — the probe
    history is partitioned by ``list_id`` inside each ``batch=N`` dir,
    so step 1 reads only the history rows whose list one of this
    batch's vectors landed in, and the join broadcasts the BOUNDED
    micro-batch side (the history side streams). Per-batch memory is
    O(batch); per-batch I/O grows only with the matched slice of the
    probe history, never the whole corpus of past queries.
    Bootstrap with ``write_ivf_stream_layout`` over the seed corpus.
    """
    from ..functions.distance import dist_l2_fixed
    from ..operators.ivf import (
        EMB_DIM,
        assign_lists,
        ivf_probe_candidates,
        ivf_query_probes,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cent = spark.read.parquet(f"{index_path}/centroids")
        # small (one micro-batch); pinned once, feeds steps 1-3
        assigned = assign_lists(batch_df, cent).localCheckpoint(eager=True)
        # (1) new vectors as candidates for EARLIER queries. Both
        # partition filters prune directories: batch != N drops this
        # batch's own probes if a failed attempt already wrote them,
        # and list_id ∈ (this batch's lists) — bounded by the
        # centroid count — skips every unmatched probe dir, so the
        # scan is the matched SLICE of the history, not all of it.
        # The explicit schema covers the seed's data-file-free
        # probes/batch=-1 dir.
        batch_lists = [
            r["list_id"]
            for r in assigned.select("list_id").distinct().collect()
        ]
        probes_prev = (
            spark.read.option("basePath", f"{index_path}/probes")
            .schema("q_id bigint, qv array<double>, list_id int, batch int")
            .parquet(f"{index_path}/probes")
            .filter(F.col("batch") != batch_id)
            .filter(F.col("list_id").isin(batch_lists))
            .select("q_id", "qv", "list_id")
        )
        # broadcast the BOUNDED side (one micro-batch); the probe
        # history grows for the stream's lifetime and must stream
        late = (
            probes_prev.join(
                F.broadcast(assigned.select("vec_id", "v", "list_id")),
                "list_id",
            )
            .filter(F.col("vec_id") != F.col("q_id"))
            .withColumn(
                "dist", dist_l2_fixed(F.col("v"), F.col("qv"), EMB_DIM)
            )
            .select("q_id", "vec_id", "dist", "list_id")
        )
        # (2) fold the batch into the layout BEFORE probing, so
        # same-batch neighbors surface in step 3 (not a second path)
        (
            assigned.repartition("list_id")
            .write.partitionBy("list_id")
            .mode("overwrite")
            .parquet(f"{index_path}/lists/batch={batch_id}")
        )
        # (3) new vectors as queries against the grown index
        probes_new = ivf_query_probes(
            cent,
            batch_df.select(
                F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
            ),
            nprobe,
        ).localCheckpoint(eager=True)
        (
            probes_new.repartition("list_id")
            .write.partitionBy("list_id")
            .mode("overwrite")
            .parquet(f"{index_path}/probes/batch={batch_id}")
        )
        fresh = ivf_probe_candidates(spark, index_path, probes_new)
        (
            fresh.unionByName(late)
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch={batch_id}")
        )
        if on_batch_end is not None:
            # failure-injection surface: called after the batch's side
            # effects but before Spark commits the offset log — a raise
            # here simulates the crash window the batch=N-overwrite
            # layout must survive (tests/test_streaming.py)
            on_batch_end(batch_id)

    return (
        emb_sdf.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "append",
    name: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame to completion (Trigger.AvailableNow)
    through a memory sink and return the materialized result. Finite
    answer, real incremental execution — micro-batches, state store,
    watermark advancement (including the final no-data flush batch that
    emits closed windows) all run exactly as they would 24/7.

    ``state_partitions`` sizes the stateful-operator partitioning for
    THIS query only. Unlike batch shuffles, streaming state
    partitioning is not AQE-tunable — it is fixed by the first run and
    persisted in the checkpoint — so it is a per-query capacity
    decision (Spark's own tuning guidance): a stream-stream join
    carries four state stores per partition, and a per-partition
    fixed cost times the default 32 dwarfs toy-scale data. The
    override rides the session clone StreamExecution takes at
    ``start()``; the caller's session conf is restored immediately,
    so concurrent/later batch plans never see it.
    """
    name = name or f"bdspf_stream_sink_{next(_SINK_IDS)}"
    ckpt = tempfile.mkdtemp(prefix="bdspf-ckpt-")
    spark = sdf.sparkSession
    shuffle_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(shuffle_key)
    if state_partitions is not None:
        spark.conf.set(shuffle_key, str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set(shuffle_key, prev)
    try:
        q.awaitTermination()
        # pin the result independently of the memory sink, then release
        # the per-run resources (sink registration + checkpoint dir) so
        # repeated driver calls don't accumulate them. localCheckpoint
        # (eager) rather than persist: the pinned blocks are
        # GC-reclaimed once the caller drops the frame — persist()ed
        # results accumulated in the CacheManager across driver calls.
        return spark.table(name).localCheckpoint(eager=True)
    finally:
        q.stop()
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
