"""Event-trigger sampling (symmetric CUSUM filter) and triple-barrier
labeling — the standard downstream consumers of the information-driven
bar family (operators/bars.py): the filter picks WHICH rows become
training events (sampling where the price path actually moved, instead
of every row), the barriers label each event by which boundary the
path touched first (profit-take / stop-loss / timeout).

Reference parity: the reference trains on every stride-1 window
(core/data/dataset.py __getitem__) and labels with the fixed-horizon
future window (notebooks/test.ipynb evaluate — the vertical-barrier
degenerate case of the triple barrier); these operators are the
extension members the event-sampling literature applies on top.

CUSUM filter (per symbol, rows in grid order; the RESET on trigger is
what makes this a true recursion — the non-reset one-sided CUSUM in
``ts_cusum_alarms`` has a closed window form, this one does not):

    d_t    = x_t − x_{t−1}
    ema_t  = |d_2|                       at the first diff
           = 0.125·|d_t| + 0.875·ema_{t−1}   after      (α = 1/8)
    h_t    = 4.0·ema_t                   (vol-calibrated threshold)
    S⁺_t   = (S⁺_{t−1} + d_t)  if > 0 else 0
    S⁻_t   = (S⁻_{t−1} + d_t)  if < 0 else 0
    event  : UP if S⁺_t > h_t, else DOWN if S⁻_t < −h_t
             (UP checked first — pinned priority for the pathological
             both-sides case); the triggered side resets to 0, the
             other side carries (the AFML getTEvents convention)

α and 1−α are exact binary fractions (1/8, 7/8) and every update is
a single mul/add in a pinned operand order, so the DuckDB
recursive-CTE oracle replays each double bitwise. The first diff
seeds the EMA at |d| (h = 4|d| ≥ any first-step S, so the seed row
can never trigger — no warm-up events). S⁺/S⁻ are materialized
through an explicit compare-else-0.0 (never max/min against 0.0), so
−0.0 cannot appear in state in either engine.

Scale: one Arrow pass per symbol over the grid (sequential per symbol
IS the semantics, parallel across symbols — the bars.py contract);
output is event-count, not row-count. Triple-barrier is pure
DataFrame algebra: each event explodes into at most ``v_steps``
(symbol, time_idx) probe keys and equi-joins back to the grid, so the
join traffic is O(events·V) — never a per-symbol cross product — and
the grid side keeps its hash(symbol) partitioning (subset of the
join key) so only the small exploded side shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CUSUM_EVT_ALPHA = 0.125  # EMA weight for |Δx| (exact binary 1/8)
CUSUM_EVT_H = 4.0  # threshold = CUSUM_EVT_H · ema|Δx|

TB_MULT = 2.0  # barrier half-width = TB_MULT · event h
TB_V = 16  # vertical barrier: grid steps after the event


def cusum_events(
    df: DataFrame,
    part_col: str = "symbol",
    idx_col: str = "time_idx",
    val_col: str = "close",
    alpha: float = CUSUM_EVT_ALPHA,
    h_mult: float = CUSUM_EVT_H,
) -> DataFrame:
    """Symmetric reset-on-trigger CUSUM event filter, one row per
    event. Input: one row per (``part_col``, ``idx_col``) grid cell
    with a double ``val_col``; rows need not arrive sorted (the pass
    sorts by ``idx_col``). Output: ``event_id`` (0-based per key),
    ``direction`` ('up'/'down'), ``stat`` (the triggering S, signed,
    unrounded), ``h`` (the active threshold, unrounded) and ``entry``
    (the value at the event row — the barrier anchor)."""
    out_schema = StructType(
        [
            StructField(part_col, df.schema[part_col].dataType),
            StructField(idx_col, LongType()),
            StructField("event_id", LongType()),
            StructField("direction", StringType()),
            StructField("stat", DoubleType()),
            StructField("h", DoubleType()),
            StructField("entry", DoubleType()),
        ]
    )
    a, b = float(alpha), 1.0 - float(alpha)
    hm = float(h_mult)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col)
        key = pdf[part_col].iloc[0]
        prev = None
        ema = None
        sp = sn = 0.0
        eid = 0
        out: list[tuple] = []
        for idx, x in zip(
            pdf[idx_col].to_numpy(), pdf[val_col].to_numpy()
        ):
            idx, x = int(idx), float(x)
            if prev is None:
                prev = x
                continue
            d = x - prev
            ema = abs(d) if ema is None else a * abs(d) + b * ema
            h = hm * ema
            sp = sp + d
            sp = sp if sp > 0.0 else 0.0
            sn = sn + d
            sn = sn if sn < 0.0 else 0.0
            if sp > h:
                out.append((key, idx, eid, "up", sp, h, x))
                eid += 1
                sp = 0.0
            elif sn < -h:
                out.append((key, idx, eid, "down", sn, h, x))
                eid += 1
                sn = 0.0
            prev = x
        return pd.DataFrame(out, columns=[f.name for f in out_schema])

    return df.groupBy(part_col).applyInPandas(fn, schema=out_schema)


def triple_barrier(
    grid: DataFrame,
    events: DataFrame,
    part_col: str = "symbol",
    idx_col: str = "time_idx",
    val_col: str = "close",
    mult: float = TB_MULT,
    v_steps: int = TB_V,
) -> DataFrame:
    """Triple-barrier labels for ``events`` (the :func:`cusum_events`
    output) against ``grid`` (the same frame the filter ran on): for
    each event at t0 with entry p0 and threshold h, the upper/lower
    horizontal barriers sit at p0 ± ``mult``·h and the vertical
    barrier ``v_steps`` grid rows after t0. The label is decided by
    the FIRST row in (t0, t0+V] to touch a horizontal barrier
    (+1 upper / −1 lower; a same-row double-touch resolves UP — the
    pinned priority); no touch → label 0 at the vertical barrier (or
    the symbol's last row if the series ends first). Events with no
    subsequent grid row are dropped (no exit exists).

    Shape (the J3 as-of/range device): events explode into at most
    ``v_steps`` probe offsets and equi-join the grid on
    (key, time_idx) — O(events·V) join rows, first-touch decided by
    conditional ``min``/``min_by`` aggregates in one pass."""
    up = F.col("entry") + F.lit(float(mult)) * F.col("h")
    dn = F.col("entry") - F.lit(float(mult)) * F.col("h")
    probes = (
        events.select(
            part_col,
            F.col(idx_col).alias("t0"),
            "direction",
            "entry",
            up.alias("up_b"),
            dn.alias("dn_b"),
        )
        .withColumn(
            "off", F.explode(F.sequence(F.lit(1), F.lit(int(v_steps))))
        )
        .withColumn(idx_col, F.col("t0") + F.col("off"))
    )
    j = probes.join(
        grid.select(part_col, idx_col, F.col(val_col).alias("px")),
        on=[part_col, idx_col],
        how="inner",
    )
    touch_up = F.when(F.col("px") >= F.col("up_b"), F.col("off"))
    touch_dn = F.when(F.col("px") <= F.col("dn_b"), F.col("off"))
    agg = j.groupBy(part_col, "t0", "direction", "entry").agg(
        F.min(touch_up).alias("up_off"),
        F.min(touch_dn).alias("dn_off"),
        F.min_by("px", touch_up).alias("up_px"),
        F.min_by("px", touch_dn).alias("dn_px"),
        F.max("off").alias("last_off"),
        F.max_by("px", F.col("off")).alias("last_px"),
    )
    label = (
        F.when(
            F.col("up_off").isNotNull()
            & (
                F.col("dn_off").isNull()
                | (F.col("up_off") <= F.col("dn_off"))
            ),
            F.lit(1),
        )
        .when(F.col("dn_off").isNotNull(), F.lit(-1))
        .otherwise(F.lit(0))
    )
    out = agg.withColumn("label", label)
    exit_off = (
        F.when(F.col("label") == 1, F.col("up_off"))
        .when(F.col("label") == -1, F.col("dn_off"))
        .otherwise(F.col("last_off"))
    )
    exit_px = (
        F.when(F.col("label") == 1, F.col("up_px"))
        .when(F.col("label") == -1, F.col("dn_px"))
        .otherwise(F.col("last_px"))
    )
    return out.select(
        part_col,
        F.col("t0").alias(idx_col),
        "direction",
        "entry",
        F.col("label").cast("int").alias("label"),
        (F.col("t0") + exit_off).cast("long").alias("exit_idx"),
        exit_px.alias("exit_px"),
        (exit_px - F.col("entry")).alias("ret"),
    )


def label_uniqueness(
    labels: DataFrame,
    part_col: str = "symbol",
    idx_col: str = "time_idx",
    v_steps: int = TB_V,
) -> DataFrame:
    """Average-uniqueness sample weights for triple-barrier labels
    (the AFML overlapping-outcomes correction): two labels whose
    spans (t0, exit] overlap share the same price path, so training
    on both double-counts it. For each grid row t in a label's span,
    the concurrency c_t is the number of labels covering t; the
    label's uniqueness is the mean of 1/c_t over its span — 1.0 for
    a label that shares no row, → 1/k under k-fold overlap.

    Exactness: each 1/c_t snaps to the 1e9 integer grid
    (floor(1e9/c + 0.5)) and sums as a long, so the per-label mean
    is independent of aggregation order in both engines; the final
    division is one float op rounded at emission by the caller.

    Shape: spans explode into ≤``v_steps`` (key, time_idx) rows
    (event-count·V, never series-sized), one groupBy counts
    concurrency per grid row, one join-back + groupBy folds the
    snapped reciprocals per label — all shuffles are event-sized,
    co-keyed on (key, time_idx) with the span frame reused for both
    sides."""
    spans = (
        labels.select(part_col, F.col(idx_col).alias("t0"), "exit_idx")
        .withColumn(
            "off", F.explode(F.sequence(F.lit(1), F.lit(int(v_steps))))
        )
        .withColumn(idx_col, F.col("t0") + F.col("off"))
        .filter(F.col(idx_col) <= F.col("exit_idx"))
        .select(part_col, "t0", idx_col)
        # two consumers (concurrency count + join-back): pin the
        # event-sized span frame once instead of replaying the
        # CUSUM/triple-barrier lineage per reference (r15)
        .localCheckpoint(eager=True)
    )
    conc = spans.groupBy(part_col, idx_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    j = spans.join(conc, on=[part_col, idx_col], how="inner")
    inv_q = F.floor(
        F.lit(1.0e9) / F.col("c").cast("double") + F.lit(0.5)
    ).cast("long")
    agg = j.groupBy(part_col, "t0").agg(
        F.count(F.lit(1)).alias("n_span"),
        F.sum(inv_q).alias("s_q"),
        F.max("c").alias("max_conc"),
    )
    return agg.select(
        part_col,
        F.col("t0").alias(idx_col),
        F.col("n_span").cast("long").alias("n_span"),
        F.col("max_conc").cast("long").alias("max_conc"),
        (
            F.col("s_q").cast("double")
            / (F.col("n_span").cast("double") * F.lit(1.0e9))
        ).alias("uniqueness"),
    )
