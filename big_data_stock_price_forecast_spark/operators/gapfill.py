"""Gap fill on the discrete time axis (SURVEY.md §2.3 J1 + §2.5 W6).

Reference: ``fill_missing_time_idx`` (core/data/dataset.py:32-43) —
outer-join the full ``[min, max]`` time_idx range per symbol onto the
data, sort, forward-fill every column. (The reference ffills the
``datetime`` column too, producing verbatim repeats; we reconstruct the
timestamp from ``time_idx`` instead, which is strictly more correct and
documented as a deliberate deviation.)

Spark shape — SINGLE-PASS, no self-join: each observed row looks at the
next observed index (``lead``) and explodes ``sequence(idx, next-1)``;
every synthesized row inherits the source row's values, which IS the
forward fill. Compared to the grid+left-join+last(ignorenulls)
formulation this reads the input once (the aggregate/grid branch would
otherwise duplicate the entire upstream lineage — dedup, resample —
because DataFrame reuse is plan-tree duplication, not a shared CTE),
performs no join, and needs one window (lead) over the same (key, idx)
sort the downstream operators already require. Row amplification equals
exactly the gap count; at 100 TB the explode streams — nothing is
buffered per key.
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
    key, forward-filling ``fill_cols`` (default: all non-key columns).
    Adds ``is_gap`` (1 for synthesized rows). Columns NOT in
    ``fill_cols`` (and not key/ts) are nulled on synthesized rows,
    matching the left-join formulation this replaces.

    Preconditions / deviations (deliberate, mirrored by the oracles):

    - ``idx_col`` is expected unique per key (the upstream resample or
      dedup guarantees it). Non-increasing neighbors (duplicate idx)
      are guarded: the sequence end is taken only when ``next > idx``,
      so duplicates pass through unchanged instead of synthesizing a
      bogus descending "gap" (Spark's ``sequence`` would auto-negate
      the step).
    - Only MISSING indices are synthesized; a null inside an observed
      row is NOT forward-filled (the reference's pandas ffill would
      fill it). Observed rows pass through verbatim.
    """
    parts = [part_col] if isinstance(part_col, str) else list(part_col)
    if fill_cols is None:
        fill_cols = [
            c for c in df.columns if c not in (*parts, idx_col, ts_col)
        ]
    other_cols = [
        c
        for c in df.columns
        if c not in (*parts, idx_col, ts_col) and c not in fill_cols
    ]

    w = Window.partitionBy(*parts).orderBy(idx_col)
    dense = df.withColumn("__nxt", F.lead(idx_col).over(w)).withColumn(
        "__idx2",
        F.explode(
            F.sequence(
                F.col(idx_col),
                F.coalesce(
                    F.when(
                        F.col("__nxt") > F.col(idx_col), F.col("__nxt") - 1
                    ),
                    F.col(idx_col),
                ),
            )
        ),
    ).drop("__nxt")
    is_gap = (F.col("__idx2") != F.col(idx_col)).cast("int")
    out = dense.withColumn("is_gap", is_gap)
    # synthesized rows: filled columns inherit the source row (= ffill);
    # all other payload columns go null, as an outer join would leave them
    for c in other_cols:
        out = out.withColumn(c, F.when(F.col("is_gap") == 0, F.col(c)))
    out = out.withColumn(idx_col, F.col("__idx2")).drop("__idx2")
    if ts_col in df.columns:
        # reconstruct timestamp from the dense index (deviation from the
        # reference's ffill-the-timestamp; see module docstring)
        out = out.withColumn(
            ts_col,
            F.timestamp_seconds(
                F.col(idx_col) * F.lit(step_seconds) + F.lit(ANCHOR_EPOCH)
            ),
        )
    return out
