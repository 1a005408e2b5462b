"""Row-level cleaning operators (SURVEY.md §2.2 P3-P7, §2.6 O3-O4).

Scale notes: the per-partition extrema/counts these operators need are
computed as small ``groupBy`` aggregates joined back broadcast — NOT as
unbounded window functions — so the big table is shuffled at most once
on the series key and the auxiliary aggregate stays tiny (one row per
symbol) no matter how many rows per symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_last(
    df: DataFrame,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """Drop duplicate ``keys`` rows keeping the one with the greatest
    ``order_col`` (arrival order). Reference: ``df[~df.datetime
    .duplicated(keep="last")]`` (core/data/preprocess.py:69) where
    "last" is last-in-file = latest arrival.

    max_by-style dedup via row_number keeps exactly one row per key and
    is a single hash shuffle on the key columns.

    Deliberately a window, NOT groupBy+max_by: the family plan holds a
    single up-front hash(symbol) exchange, and the window's clustering
    requirement (a superset of the partition column) reuses it, while
    the max_by aggregate was measured to re-exchange on the full key —
    exchange reuse beats map-side combine when duplicates are rare.
    The duplicate-heavy ingest path (sources/ingest.py silver merge)
    has its own keep-last with an explicit arrival tiebreaker.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def time_range_filter(
    df: DataFrame,
    ts_col: str = "datetime",
    part_col: str = "symbol",
    min_age: str = "90 days",
) -> DataFrame:
    """Keep rows with ``ts >= per-symbol min(ts) + min_age`` — the
    reference's noisy-early-history cut (core/data/preprocess.py:63-67).

    The per-symbol min is a tiny aggregate broadcast back onto the fact
    table, so no wide shuffle of the data itself is needed.
    """
    mins = df.groupBy(part_col).agg(F.min(ts_col).alias("__mn"))
    return (
        df.join(F.broadcast(mins), part_col)
        .filter(F.col(ts_col) >= F.col("__mn") + F.expr(f"INTERVAL {min_age}"))
        .drop("__mn")
    )


def null_ratio_prune(df: DataFrame, threshold: float = 0.85) -> DataFrame:
    """Keep columns whose non-null fraction exceeds ``threshold``
    (core/data/preprocess.py:71 ``df.loc[:, df.notnull().mean() > .85]``).

    Data-dependent schema: one aggregate pass over all columns (single
    job, one row back to the driver), then a static ``select`` that
    Catalyst prunes down to the parquet scan.
    """
    ratios = df.agg(
        *[
            F.avg(F.col(c).isNotNull().cast("double")).alias(c)
            for c in df.columns
        ]
    ).first()
    keep = [c for c in df.columns if (ratios[c] or 0.0) > threshold]
    return df.select(*keep)


def drop_nulls(df: DataFrame) -> DataFrame:
    """``df.dropna()`` (core/data/preprocess.py:73)."""
    return df.na.drop()


def _with_pos(
    df: DataFrame, part_col: str, order_col: str, use_window: bool = False
) -> DataFrame:
    """Attach per-partition row_number ``__rn`` (1-based) and count
    ``__cnt``.

    ``use_window=False`` (standalone use): the count is a tiny
    aggregate joined broadcast, so the big table is never shuffled
    beyond the row_number's own exchange.
    ``use_window=True`` (pipeline use): the count is a window function
    over the SAME partitioning as the row_number — when the plan is
    already hash-partitioned on ``part_col`` this adds NO exchange and
    no extra jobs, which matters when the flagship chains a dozen
    per-symbol operators.
    """
    w = Window.partitionBy(part_col).orderBy(order_col)
    if use_window:
        return df.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy(part_col))
        )
    cnts = df.groupBy(part_col).agg(F.count(F.lit(1)).alias("__cnt"))
    return df.withColumn("__rn", F.row_number().over(w)).join(
        F.broadcast(cnts), part_col
    )


def positional_skip_frac(
    df: DataFrame,
    part_col: str,
    order_col: str,
    frac: float = 0.1,
    use_window: bool = False,
) -> DataFrame:
    """Drop the first ``floor(n*frac)`` rows per partition — the
    reference's ``df.iloc[len(df)//10:]`` warmup skip (train.py:32)."""
    return (
        _with_pos(df, part_col, order_col, use_window)
        .filter(F.col("__rn") > F.floor(F.col("__cnt") * F.lit(frac)))
        .drop("__rn", "__cnt")
    )


def positional_split(
    df: DataFrame,
    part_col: str,
    order_col: str,
    val_ratio: float = 0.15,
    use_window: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Time-ordered tail split: val = last ``floor(n*val_ratio)`` rows
    per partition, train = the rest (train.py:35-38). NOT randomSplit —
    the split must respect time order."""
    pos = _with_pos(df, part_col, order_col, use_window)
    boundary = F.col("__cnt") - F.floor(F.col("__cnt") * F.lit(val_ratio))
    train = pos.filter(F.col("__rn") <= boundary).drop("__rn", "__cnt")
    val = pos.filter(F.col("__rn") > boundary).drop("__rn", "__cnt")
    return train, val


def positional_split_labeled(
    df: DataFrame,
    part_col: str,
    order_col: str,
    val_ratio: float = 0.15,
    use_window: bool = False,
) -> DataFrame:
    """Same split as :func:`positional_split` but as ONE DataFrame with
    a ``split`` label column ('train'/'val') — keeps downstream
    per-symbol pipelines single-branch (one scan, one lineage) until a
    consumer actually needs the two sides apart."""
    pos = _with_pos(df, part_col, order_col, use_window)
    boundary = F.col("__cnt") - F.floor(F.col("__cnt") * F.lit(val_ratio))
    return pos.withColumn(
        "split", F.when(F.col("__rn") <= boundary, "train").otherwise("val")
    ).drop("__rn", "__cnt")


def numeric_columns(df: DataFrame) -> list[str]:
    """P9 (reference core/data/dataset.py:9 ``select_dtypes("number")``):
    names of every numeric-typed column, in schema order. Pure schema
    reflection — metadata on the driver, no data movement."""
    from pyspark.sql.types import NumericType

    return [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, NumericType)
    ]


def select_numeric(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Project to the numeric columns (plus explicitly kept key
    columns) — the Spark form of the reference's dtype-driven feature
    projection. The projection prunes the scan down to the selected
    columns (check ReadSchema in .explain)."""
    keep = [c for c in (keep or []) if c in df.columns]
    nums = [c for c in numeric_columns(df) if c not in keep]
    return df.select(*keep, *nums)
