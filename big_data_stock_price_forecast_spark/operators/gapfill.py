"""Gap fill on the discrete time axis (SURVEY.md §2.3 J1 + §2.5 W6).

Reference: ``fill_missing_time_idx`` (core/data/dataset.py:32-43) —
outer-join the full ``[min, max]`` time_idx range per symbol onto the
data, sort, forward-fill every column. (The reference ffills the
``datetime`` column too, producing verbatim repeats; we reconstruct the
timestamp from ``time_idx`` instead, which is strictly more correct and
documented as a deliberate deviation.)

Spark shape: per-symbol ``sequence()`` + ``explode`` builds the dense
axis WITHOUT a driver-side loop (one row per symbol explodes to the full
grid on executors), left-join the observed rows, then
``last(col, ignorenulls=True)`` over an unbounded-preceding row frame
per symbol. Both the join and the window hash on the same key
(symbol), so AQE can reuse one exchange; rows-unbounded-preceding ffill
is a linear scan per partition — no amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.calendar import ANCHOR_EPOCH


def fill_missing_time_idx(
    df: DataFrame,
    part_col: str | list[str] = "symbol",
    idx_col: str = "time_idx",
    ts_col: str = "datetime",
    step_seconds: int = 3600,
    fill_cols: list[str] | None = None,
) -> DataFrame:
    """Densify ``idx_col`` to every integer in [min, max] per partition
    key and forward-fill ``fill_cols`` (default: all non-key columns).
    Adds ``is_gap`` (1 for synthesized rows)."""
    parts = [part_col] if isinstance(part_col, str) else list(part_col)
    if fill_cols is None:
        fill_cols = [
            c for c in df.columns if c not in (*parts, idx_col, ts_col)
        ]

    grid = (
        df.groupBy(*parts)
        .agg(F.min(idx_col).alias("__mn"), F.max(idx_col).alias("__mx"))
        .select(
            *parts,
            F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias(idx_col),
        )
    )
    joined = grid.join(df, [*parts, idx_col], "left").withColumn(
        "is_gap", F.col(fill_cols[0]).isNull().cast("int")
        if fill_cols
        else F.lit(0),
    )
    w = (
        Window.partitionBy(*parts)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in fill_cols}
    )
    if ts_col in df.columns:
        # reconstruct timestamp from the dense index (deviation from the
        # reference's ffill-the-timestamp; see module docstring)
        filled = filled.withColumn(
            ts_col,
            F.timestamp_seconds(
                F.col(idx_col) * F.lit(step_seconds) + F.lit(ANCHOR_EPOCH)
            ),
        )
    return filled
