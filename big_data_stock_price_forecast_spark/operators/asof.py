"""ASOF join: for each left row, attach the single most recent right
row with ``right_ts <= left_ts`` per key — pandas ``merge_asof`` /
kdb ``aj`` / QuestDB-TimescaleDB ``ASOF JOIN`` semantics. The
reference's future-gather (notebooks/test.ipynb cell 20) is the
forward-window cousin; this is the canonical backward point-lookup
every enrichment pipeline needs (last quote before the trade, last
profile update before the event).

Scale design — the union-tag plan: a naive theta-join
(``ON r.ts <= l.ts``, rank, keep rank 1) explodes to a per-key cross
product before the rank cuts it back. Instead both sides UNION into
one frame tagged by side, with the right payload packed into ONE
struct column; a single window per key ordered by
(ts, side, right-tiebreak) computes ``last(payload, ignorenulls)``
over the unbounded-preceding frame; left rows then carry exactly the
latest right struct at-or-before their timestamp. Cost: ONE shuffle on
the join keys and one in-partition sort — the same plan shape as any
keyed window, no candidate inflation at all, AQE skew-split applies.
The struct packing matters: ``last`` over separate columns would mix
rows when a legitimately-NULL right attribute gets skipped by
ignorenulls; the struct is row-atomic.

Determinism: the window ordering (ts, side, tiebreak) is total when
``right_tiebreak`` uniquely orders right rows within (key, ts);
callers that allow duplicate right timestamps get max-tiebreak wins
(dedup the right side first to match engines whose ASOF tie rule is
unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
) -> DataFrame:
    """Left outer ASOF join. Returns all ``left`` columns plus every
    non-key ``right`` column (NULL when no right row is at-or-before).
    ``right_tiebreak`` breaks right-side timestamp ties (max wins).
    """
    rpayload = [
        c for c in right.columns if c not in on and c != right_ts
    ]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).alias("__tb"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__r"),
    )
    l_cols = [c for c in left.columns]
    lf = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in l_cols]).alias("__l"),
    )
    unioned = r.withColumn(
        "__l", F.lit(None).cast(lf.schema["__l"].dataType)
    ).unionByName(lf)
    # rows frame: at equal ts the right row (side 0) sorts before the
    # left row, so <= semantics; __tb asc nulls_first keeps the max
    # tiebreak right row closest to the probe
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col("__l").getField(c).alias(c) for c in l_cols]
    out_cols += [
        F.col("__match").getField(c).alias(c) for c in rpayload
    ]
    return matched.select(*out_cols)
