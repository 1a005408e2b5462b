"""Timeframe (grid step) inference from timestamp deltas.

Reference: ``infer_dataset_timeframe`` (core/data/preprocess.py:32-37) —
mode of ``datetime.diff()``; raises "Mismatch in dataset timeframe" if
the dominant delta accounts for < 99% of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lag_deltas(
    df: DataFrame, ts_col: str = "datetime", part_col: str = "symbol"
) -> DataFrame:
    """Seconds between consecutive rows per symbol (W5)."""
    w = Window.partitionBy(part_col).orderBy(ts_col)
    return df.withColumn(
        "delta_s",
        F.unix_timestamp(F.col(ts_col))
        - F.unix_timestamp(F.lag(ts_col).over(w)),
    )


def infer_timeframe(
    df: DataFrame,
    ts_col: str = "datetime",
    part_col: str = "symbol",
    min_share: float = 0.99,
) -> int:
    """Return the dominant delta in seconds; raise if its share of all
    deltas is below ``min_share`` (preprocess.py:34-35 contract).

    The histogram of deltas is tiny (distinct grid steps), so the
    aggregate collapses map-side and only counts cross the wire.
    """
    hist = (
        lag_deltas(df, ts_col, part_col)
        .filter(F.col("delta_s").isNotNull())
        .groupBy("delta_s")
        .count()
        .orderBy(F.col("count").desc())
        .limit(2)
        .collect()
    )
    if not hist:
        raise ValueError("Not enough rows to infer timeframe")
    total = sum(r["count"] for r in hist)
    # limit(2) undercounts the denominator; re-aggregate exactly.
    top = hist[0]
    n_all = (
        lag_deltas(df, ts_col, part_col)
        .filter(F.col("delta_s").isNotNull())
        .count()
    )
    share = top["count"] / n_all
    if share < min_share:
        raise ValueError(
            f"Mismatch in dataset timeframe: dominant delta {top['delta_s']}s "
            f"covers only {share:.2%} of rows"
        )
    return int(top["delta_s"])
