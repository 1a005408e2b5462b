"""Information-driven bar sampling: tick-imbalance bar assignment.

Completes the event-time bar family (tick bars / volume bars live as
pure DataFrame plans in plans/registry_ts.py — their bar index is a
closed-form function of a running rank/cumulative): IMBALANCE bars
close when the accumulated signed tick flow |θ| crosses an
EMA-calibrated expectation, so the boundary depends on every prior
bar's statistics — a genuine per-symbol recursion that cannot be a
window function. It rides the engine's standard bounded-recursion
device (one Arrow pass per symbol, exactly like the EMA/Holt/Kalman
family in rolling.py): sequential within a symbol — which is the
SEMANTICS, not a shortcut — and embarrassingly parallel across
symbols, so the 100 TB posture is the same as every stateful ts
operator: one exchange on the symbol key, per-task work linear in
the symbol's tick count, no driver collection.

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
    IntegerType,
    LongType,
    StructField,
    StructType,
)

IMB_SEED_ET = 8.0  # expected ticks per bar, seed
IMB_SEED_EB = 1.0  # expected signed-tick mean, seed
IMB_EMA_A = 0.5  # EMA weight for both bar-level calibrations

RUN_SEED_ET = 8.0  # run bars: expected ticks per bar, seed
RUN_SEED_EP = 0.5  # run bars: expected buy fraction, seed


def imbalance_bar_ticks(
    df: DataFrame,
    part_col: str = "symbol",
    ts_col: str = "t_us",
    close_col: str = "close",
) -> DataFrame:
    """Assign every tick its imbalance-bar index.

    Input: one row per tick with an epoch-microsecond ``ts_col``
    (int64, unique per symbol) and a double ``close_col``. Output:
    the same rows plus ``rn`` (1-based tick rank), ``bar_id``
    (0-based), ``b`` (the tick-rule sign, ±1) and ``thr`` (the
    threshold active for the tick's bar — constant within a bar).
    Bar OHLC/imbalance aggregation stays JVM-side in the caller
    (groupBy on the emitted assignment), so the Python pass carries
    only the state the recursion genuinely needs.
    """
    out_schema = StructType(
        [
            StructField(part_col, df.schema[part_col].dataType),
            StructField("rn", LongType()),
            StructField(ts_col, LongType()),
            StructField(close_col, DoubleType()),
            StructField("bar_id", LongType()),
            StructField("b", IntegerType()),
            StructField("thr", DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        closes = pdf[close_col].to_numpy()
        n = len(closes)
        bids = [0] * n
        bs = [0] * n
        thrs = [0.0] * n
        e_t, e_b = IMB_SEED_ET, IMB_SEED_EB
        thr = e_t * abs(e_b)
        b, prev = 1, None
        bid, theta, t_cur = 0, 0, 0
        for i in range(n):
            x = float(closes[i])
            if prev is not None:
                if x > prev:
                    b = 1
                elif x < prev:
                    b = -1
                # Δ == 0 carries the previous sign
            theta += b
            t_cur += 1
            bids[i], bs[i], thrs[i] = bid, b, thr
            if float(abs(theta)) >= thr:
                e_t = 0.5 * t_cur + 0.5 * e_t
                e_b = 0.5 * (theta / t_cur) + 0.5 * e_b
                thr = e_t * abs(e_b)
                bid += 1
                theta, t_cur = 0, 0
            prev = x
        return pd.DataFrame(
            {
                part_col: pdf[part_col].to_numpy(),
                "rn": range(1, n + 1),
                ts_col: pdf[ts_col].to_numpy(),
                close_col: closes,
                "bar_id": bids,
                "b": bs,
                "thr": thrs,
            }
        )

    return df.groupBy(part_col).applyInPandas(fn, schema=out_schema)


def run_bar_ticks(
    df: DataFrame,
    part_col: str = "symbol",
    ts_col: str = "t_us",
    close_col: str = "close",
) -> DataFrame:
    """Assign every tick its RUN-bar index — the imbalance family's
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
    literature uses. Same recursion device, same per-tick emission
    contract (``rn``, ``bar_id``, ``b``, ``thr``) plus the open
    bar's running ``n_up``/``n_dn``; same pinned operand order for
    the recursive-CTE oracle.
    """
    out_schema = StructType(
        [
            StructField(part_col, df.schema[part_col].dataType),
            StructField("rn", LongType()),
            StructField(ts_col, LongType()),
            StructField(close_col, DoubleType()),
            StructField("bar_id", LongType()),
            StructField("b", IntegerType()),
            StructField("thr", DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        closes = pdf[close_col].to_numpy()
        n = len(closes)
        bids = [0] * n
        bs = [0] * n
        thrs = [0.0] * n
        e_t, e_p = RUN_SEED_ET, RUN_SEED_EP
        thr = e_t * max(e_p, 1.0 - e_p)
        b, prev = 1, None
        bid, n_up, n_dn = 0, 0, 0
        for i in range(n):
            x = float(closes[i])
            if prev is not None:
                if x > prev:
                    b = 1
                elif x < prev:
                    b = -1
            if b == 1:
                n_up += 1
            else:
                n_dn += 1
            bids[i], bs[i], thrs[i] = bid, b, thr
            if float(max(n_up, n_dn)) >= thr:
                t_cur = n_up + n_dn
                e_t = 0.5 * t_cur + 0.5 * e_t
                e_p = 0.5 * (n_up / t_cur) + 0.5 * e_p
                thr = e_t * max(e_p, 1.0 - e_p)
                bid += 1
                n_up, n_dn = 0, 0
            prev = x
        return pd.DataFrame(
            {
                part_col: pdf[part_col].to_numpy(),
                "rn": range(1, n + 1),
                ts_col: pdf[ts_col].to_numpy(),
                close_col: closes,
                "bar_id": bids,
                "b": bs,
                "thr": thrs,
            }
        )

    return df.groupBy(part_col).applyInPandas(fn, schema=out_schema)
