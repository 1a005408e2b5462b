"""Information-driven bar sampling: imbalance and run bars.

Completes the event-time bar family (tick bars / volume bars live as
pure DataFrame plans in plans/registry_ts.py — their bar index is a
closed-form function of a running rank/cumulative): IMBALANCE bars
close when the accumulated signed tick flow |θ| crosses an
EMA-calibrated expectation (RUN bars: the dominant side's gross
count), so the boundary depends on every prior bar's statistics — a
genuine per-symbol recursion that cannot be a window function. It
rides the engine's standard bounded-recursion device (one Arrow pass
per symbol, exactly like the EMA/Holt/Kalman family in rolling.py):
sequential within a symbol — which is the SEMANTICS, not a shortcut —
and embarrassingly parallel across symbols. The pass dedups
(P5 keep-last), runs the recursion, AND folds the per-bar OHLC in
one walk, emitting finished bars — so the whole operator is ONE
exchange on the symbol key with bar-count Arrow output, per-task
work linear in the symbol's tick count, no driver collection.

Reference parity: the reference samples on the wall clock only
(core/data/preprocess.py:99-122 resample); this operator is the
extension member the microstructure literature samples by (tick
rule + EMA-calibrated expectation — the standard tick-imbalance-bar
construction). Spec chosen for cross-engine exactness: integer θ and
tick counts, float ops confined to the two bar-level EMAs and the
threshold product, evaluated in a pinned operand order so the DuckDB
recursive-CTE oracle reproduces every double bitwise.

Recursion (per symbol, ticks in (datetime) order — the keep-last
deduped series makes that total):

    b_t   = +1 if Δclose>0, −1 if Δclose<0, else b_{t−1}   (b_1=+1)
    θ    += b_t ;  T_cur += 1          (tick joins the OPEN bar)
    close bar when  |θ| ≥ thr          (thr active since bar open)
    on close:  E_T := 0.5·T_cur + 0.5·E_T
               E_b := 0.5·(θ/T_cur) + 0.5·E_b
               thr := E_T·|E_b| ;  θ, T_cur := 0
    seeds: E_T=8.0, E_b=1.0, thr=8.0

A balanced-flow bar can drive E_b toward 0 and thr below 1; every
bar still holds ≥1 tick by construction (the close check runs after
the tick joins), so the recursion cannot stall and the calibration
self-heals (a 1-tick bar has |θ/T_cur| = 1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

IMB_SEED_ET = 8.0  # expected ticks per bar, seed
IMB_SEED_EB = 1.0  # expected signed-tick mean, seed
IMB_EMA_A = 0.5  # EMA weight for both bar-level calibrations

RUN_SEED_ET = 8.0  # run bars: expected ticks per bar, seed
RUN_SEED_EP = 0.5  # run bars: expected buy fraction, seed


def imbalance_bars(
    df: DataFrame,
    part_col: str = "symbol",
    ts_col: str = "t_us",
    close_col: str = "close",
    id_col: str = "event_id",
) -> DataFrame:
    """Tick-imbalance bars, one row per bar (trailing partial
    included).

    Input: one row per RAW tick with an epoch-microsecond ``ts_col``
    (int64), a double ``close_col`` and a tie-break ``id_col``. The
    pass implements the engine-wide P5 keep-last dedup in-line
    (sort by (ts, id), keep the last row per ts — identical to the
    dedup_keep_last window form) and folds the OHLC/imbalance
    aggregation into the SAME sequential walk the recursion already
    makes, so the whole operator is ONE exchange on the symbol key:
    FlatMapGroupsInPandas does not propagate the child partitioning,
    so a JVM-side groupBy(symbol, bar_id) after a per-tick emission
    would re-shuffle the full tick frame a second time (measured: a
    third exchange in the executed plan) AND ship per-tick rows back
    over Arrow — emitting finished bars ships bar-count rows and
    shuffles nothing.

    Output per bar: ``bar_id`` (0-based), ``n_events``, OHLC,
    ``imbalance`` (θ at the bar's last tick), ``thr`` (the threshold
    active for the bar — unrounded; callers round for display) and
    ``span_us``.
    """
    out_schema = StructType(
        [
            StructField(part_col, df.schema[part_col].dataType),
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

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        pdf = pdf.drop_duplicates(subset=ts_col, keep="last")
        key = pdf[part_col].iloc[0]
        e_t, e_b = IMB_SEED_ET, IMB_SEED_EB
        thr = e_t * abs(e_b)
        b, prev = 1, None
        bid, theta, t_cur = 0, 0, 0
        o = h = lo = c = None
        tmin = tmax = None
        out: list[tuple] = []
        for t_us, x in zip(
            pdf[ts_col].to_numpy(), pdf[close_col].to_numpy()
        ):
            t_us, x = int(t_us), float(x)
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
                out.append(
                    (key, bid, t_cur, o, h, lo, c, theta, thr,
                     tmax - tmin)
                )
                e_t = 0.5 * t_cur + 0.5 * e_t
                e_b = 0.5 * (theta / t_cur) + 0.5 * e_b
                thr = e_t * abs(e_b)
                bid += 1
                theta, t_cur = 0, 0
            prev = x
        if t_cur > 0:  # trailing partial bar
            out.append(
                (key, bid, t_cur, o, h, lo, c, theta, thr, tmax - tmin)
            )
        return pd.DataFrame(out, columns=[f.name for f in out_schema])

    return df.groupBy(part_col).applyInPandas(fn, schema=out_schema)


def run_bars(
    df: DataFrame,
    part_col: str = "symbol",
    ts_col: str = "t_us",
    close_col: str = "close",
    id_col: str = "event_id",
) -> DataFrame:
    """Tick-RUN bars, one row per bar — the imbalance family's
    one-sided member: where imbalance bars watch the NET signed flow
    |Σb|, run bars watch the DOMINANT side's gross count
    θ = max(n_up, n_down), closing when a run of same-side pressure
    exceeds the EMA-calibrated expectation
    thr = E_T · max(E_p, 1 − E_p) (E_T = EMA of closed-bar sizes,
    E_p = EMA of closed-bar buy fractions; α = 0.5, seeds
    E_T = 8.0, E_p = 0.5 → thr₀ = 4.0). Net-zero chop that never
    closes an imbalance bar DOES close run bars once either side's
    gross count accumulates — the two cards disagree exactly when
    flow is two-sided, which is the diagnostic pair the sampling
    literature uses. Same one-exchange contract and in-line P5
    keep-last as :func:`imbalance_bars`; same pinned operand order
    for the recursive-CTE oracle."""
    out_schema = StructType(
        [
            StructField(part_col, df.schema[part_col].dataType),
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

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        pdf = pdf.drop_duplicates(subset=ts_col, keep="last")
        key = pdf[part_col].iloc[0]
        e_t, e_p = RUN_SEED_ET, RUN_SEED_EP
        thr = e_t * max(e_p, 1.0 - e_p)
        b, prev = 1, None
        bid, n_up, n_dn = 0, 0, 0
        o = h = lo = c = None
        tmin = tmax = None
        out: list[tuple] = []
        for t_us, x in zip(
            pdf[ts_col].to_numpy(), pdf[close_col].to_numpy()
        ):
            t_us, x = int(t_us), float(x)
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
                out.append(
                    (key, bid, n_up + n_dn, o, h, lo, c, n_up, n_dn,
                     thr, tmax - tmin)
                )
                t_cur = n_up + n_dn
                e_t = 0.5 * t_cur + 0.5 * e_t
                e_p = 0.5 * (n_up / t_cur) + 0.5 * e_p
                thr = e_t * max(e_p, 1.0 - e_p)
                bid += 1
                n_up, n_dn = 0, 0
            prev = x
        if n_up + n_dn > 0:  # trailing partial bar
            out.append(
                (key, bid, n_up + n_dn, o, h, lo, c, n_up, n_dn, thr,
                 tmax - tmin)
            )
        return pd.DataFrame(out, columns=[f.name for f in out_schema])

    return df.groupBy(part_col).applyInPandas(fn, schema=out_schema)
