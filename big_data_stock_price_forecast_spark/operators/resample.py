"""OHLCV time-bucket resampling (SURVEY.md §2.4 A1).

Reference: ``resample_ohlcv`` (core/data/preprocess.py:99-122) —
``open→first, high→max, low→min, close→last, volume→sum`` with
**right-closed, right-labeled** buckets (preprocess.py:116), optional
``drop_ends`` trimming the first and last (partial) bucket.

Spark mapping: a single ``groupBy(symbol, bucket)`` hash aggregate.
first/last are expressed with ``min_by/max_by(value, ts)`` so they're
deterministic under Spark's unordered aggregation (ties impossible
after timestamp dedup). Right-closed semantics: a point exactly on a
boundary t belongs to the bucket *labeled* t, i.e. bucket
``(t-Δ, t]`` — computed by shifting the timestamp back one microsecond
before the left-closed ``window()`` bucketing and labeling with the
bucket *end*.

One shuffle on (symbol, bucket); partial aggregation (map-side combine)
keeps the shuffle small at scale — this aggregates ~Δ/step rows into
one before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ohlcv(
    df: DataFrame,
    every: str = "1 hour",
    ts_col: str = "datetime",
    part_col: str = "symbol",
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    volume_col: str = "volume",
    drop_ends: bool = False,
) -> DataFrame:
    """Returns (symbol, datetime=bucket-end label, open, high, low,
    close, volume, n_rows). Input columns that are absent are skipped
    (the events-shaped series only has ``close``)."""
    ts = F.col(ts_col)
    bucket = F.window(ts - F.expr("INTERVAL 1 MICROSECOND"), every)
    cols = set(df.columns)
    aggs = []
    if open_col in cols:
        aggs.append(F.min_by(open_col, ts_col).alias("open"))
    if high_col in cols:
        aggs.append(F.max(high_col).alias("high"))
    if low_col in cols:
        aggs.append(F.min(low_col).alias("low"))
    if close_col in cols:
        # close of the bucket = value at the max timestamp
        aggs.append(F.max_by(close_col, ts_col).alias("close"))
        if open_col not in cols:  # single-value series: open from close
            aggs.append(F.min_by(close_col, ts_col).alias("open"))
        if high_col not in cols:
            aggs.append(F.max(close_col).alias("high"))
        if low_col not in cols:
            aggs.append(F.min(close_col).alias("low"))
    if volume_col in cols:
        aggs.append(F.sum(volume_col).alias("volume"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))

    out = (
        df.groupBy(F.col(part_col), bucket.alias("__b"))
        .agg(*aggs)
        .withColumn(ts_col, F.col("__b.end"))
        .drop("__b")
    )
    ordered = ["open", "high", "low", "close", "volume", "n_rows"]
    out = out.select(
        part_col, ts_col, *[c for c in ordered if c in out.columns]
    )
    if drop_ends:
        w = Window.partitionBy(part_col)
        out = (
            out.withColumn("__mn", F.min(ts_col).over(w))
            .withColumn("__mx", F.max(ts_col).over(w))
            .filter((F.col(ts_col) > F.col("__mn")) & (F.col(ts_col) < F.col("__mx")))
            .drop("__mn", "__mx")
        )
    return out
