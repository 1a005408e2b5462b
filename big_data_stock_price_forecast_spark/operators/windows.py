"""Sliding-window extraction + per-window z-score (SURVEY.md §2.5 W1/W2,
§2.4 A2) — the reference's "data point" builder (core/data/dataset.py:13-26).

Every row offset i yields the L-value forward window
``close[i : i+L]``; windows shorter than L (series tail) are dropped, so
window count per symbol = rows - L + 1. Each window is z-scored by its
OWN mean and population stddev with epsilon 1e-8 on the scale
(dataset.py:19-20 contract). ``window_id`` = the leading row's
``time_idx``. Optionally attaches the following P values
(``future``) — the forecast target/gather (notebooks/test.ipynb cell 20)
— from the SAME sort order, avoiding a separate as-of join.

Scale design: ``collect_list`` over a row frame amplifies data ~L×.
Mitigations baked in: (1) only the single value column is collected —
project before calling; (2) both the window frame and the future frame
share one Window spec → one shuffle + one sort per symbol; (3) for
strided evaluation, filter on ``window_id % stride`` BEFORE the
normalize/embed stages consume the arrays. At 100 TB the per-symbol
series is still modest (time × symbol layout); partition count scales
with symbols, and no symbol's series needs to fit anywhere but one
task's spill-able sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.normalize import EPS, zscore_array


def sliding_windows(
    df: DataFrame,
    value_col: str = "close",
    L: int = 256,
    pred_window: int = 0,
    part_col: str | list[str] = "symbol",
    idx_col: str = "time_idx",
    eps: float = EPS,
) -> DataFrame:
    """Returns (*part_cols, window_id, center, scale, xs[, future]).

    xs = z-scored L-length window (array<double>);
    center/scale = pre-normalization mean / stddev_pop;
    future = the P raw values following the window (if pred_window>0).
    """
    parts = [part_col] if isinstance(part_col, str) else list(part_col)
    base = Window.partitionBy(*parts).orderBy(idx_col)
    w_cur = base.rowsBetween(Window.currentRow, L - 1)
    v = F.col(value_col)

    out = df.select(
        *[F.col(c) for c in parts],
        F.col(idx_col).alias("window_id"),
        F.collect_list(v).over(w_cur).alias("__raw"),
        # window SUM rides the same frame in the same Window pass and
        # adds the frame's values in the same order the array fold
        # did (Sum's update is coalesce(sum, 0.0) + x per buffered
        # row, i.e. 0.0 + x1 + x2 + ... — bitwise the sequential left
        # fold), but runs as a codegen'd declarative aggregate instead
        # of an interpreted per-element lambda (guide §4.1). Rows
        # whose frame holds a NULL can't desync: collect_list drops
        # NULLs, so those rows fail the size == L guard below.
        F.sum(v).over(w_cur).alias("__s"),
        *(
            [
                F.collect_list(v)
                .over(base.rowsBetween(L, L + pred_window - 1))
                .alias("future")
            ]
            if pred_window
            else []
        ),
    ).filter(F.size("__raw") == L)

    mean = F.col("__s") / F.lit(float(L))
    out = out.withColumn("center", mean).drop("__s")
    var = (
        F.aggregate(
            "__raw",
            F.lit(0.0),
            lambda acc, x: acc + (x - F.col("center")) * (x - F.col("center")),
        )
        / F.lit(float(L))
    )
    out = out.withColumn("scale", F.sqrt(var))
    out = out.withColumn(
        "xs", zscore_array(F.col("__raw"), F.col("center"), F.col("scale"), eps)
    ).drop("__raw")
    cols = [*parts, "window_id", "center", "scale", "xs"]
    if pred_window:
        cols.append("future")
    return out.select(*cols)
